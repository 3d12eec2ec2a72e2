package graft

import org.apache.spark.sql.functions._

class RelationalSpec extends SparkTestBase {

  // queries whose empty result is correct on this data (anti-join/except
  // find nothing at sf0.001: every part ships, every customer orders;
  // 1000 events over 30 days → no ±60s cross-user range-join pairs)
  private val mayBeEmpty = Set("q16_join_anti", "q28_except", "q67_range_join")

  test("every declared query runs and returns rows at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
    }
  }

  // The one query legitimately without a DuckDB oracle: q48 is
  // approximate BY CONSTRUCTION (IVF probe pruning) — its quality
  // contract is the spec-checked recall vs hash-oracled q47. q32/q56
  // graduated to full hash oracles in round 2; q49 AND q50 in round 4
  // (md5-derived engine-neutral hash families).
  private val rowsOnly = Set("q48_knn_ivf")

  test("every query has an oracle or is explicitly rows-only") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing == rowsOnly,
      s"oracle coverage drift: missing=$missing expected=$rowsOnly")
  }

  test("count_star matches raw parquet count") {
    val expected = Tables.load(spark, sfDir, "lineitem").count()
    val got = SparkEntry.queries("q01_count_star")(spark, sfDir)
      .head().getLong(0)
    assert(got === expected)
  }

  test("group_topk aggregates are consistent with global count") {
    val rows = SparkEntry.queries("q05_group_topk")(spark, sfDir).collect()
    val total = rows.map(_.getAs[Long]("cnt")).sum
    assert(total === Tables.load(spark, sfDir, "lineitem").count())
    // sorted desc by sum_qty
    val sums = rows.map(_.getAs[Double]("sum_qty"))
    assert(sums.sameElements(sums.sorted(Ordering[Double].reverse)))
  }

  test("filter_range only returns rows in the predicate range") {
    val df = SparkEntry.queries("q08_filter_range")(spark, sfDir)
    val bad = df.filter(col("l_discount") < 0.05 || col("l_discount") > 0.07).count()
    assert(bad === 0)
  }

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
