package graft

import org.apache.spark.sql.functions._

class RelationalSpec extends SparkTestBase {

  test("every declared query runs and returns rows at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }

  test("every query has an oracle or is explicitly rows-only") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // non-SQL-expressible ops are allowed to omit; relational ones must not
    val relational = missing.filter(_.startsWith("q"))
    assert(relational.isEmpty, s"relational queries missing oracle: $relational")
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
