package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Specs for the extension query surface (joins, windows, set ops,
  * grouping, scalar functions) on sf0.001, including plan-shape checks —
  * the 100 TB story depends on the *plan*, not just the answer.
  */
class ExtendedRelationalSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): SparkPlan = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.collect() // force AQE to finalize
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }

  /** Full traversal incl. through AQE query-stage leaf wrappers. */
  private def allNodes(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        Seq(q.plan)
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case other => other.children
    }
    p +: kids.flatMap(allNodes)
  }

  test("every extension query runs and returns rows on sf0.001") {
    val expectEmpty = Set("q16_join_anti", "q28_except", "q67_range_join")
    for (name <- SparkEntry.queries.keys if name >= "q13") {
      val n = SparkEntry.queries(name)(spark, sf).count()
      if (expectEmpty(name)) assert(n >= 0, name)
      else assert(n > 0, s"$name returned no rows")
    }
  }

  test("q13 dim join is a broadcast hash join (no lineitem shuffle)") {
    val p = plan("q13_join_broadcast")
    val s = p.toString
    assert(s.contains("BroadcastHashJoin"), s"expected broadcast join:\n$s")
    // the only shuffles should be for the final group-by, not the join
    val joinShuffles = p.collect {
      case e: ShuffleExchangeExec if e.toString.contains("l_partkey") => e
    }
    assert(joinShuffles.isEmpty, "lineitem should not shuffle for a dim join")
  }

  test("q19 tpch q5 broadcasts nation/region") {
    val s = plan("q19_tpch_q5").toString
    assert(s.contains("BroadcastHashJoin"))
  }

  test("top-k fuses into TakeOrderedAndProject (no global sort)") {
    val s = plan("q18_tpch_q3").toString
    assert(s.contains("TakeOrderedAndProject"), s)
  }

  test("semi/anti joins use the dedicated join types") {
    assert(plan("q15_join_semi").toString.contains("LeftSemi"))
    assert(plan("q16_join_anti").toString.contains("LeftAnti"))
  }

  test("filters and projections push into the parquet scan") {
    val df = SparkEntry.queries("q08_filter_range")(spark, sf)
    val scan = df.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PushedFilters") && scan.contains("l_discount"),
      s"expected pushed filters in scan:\n$scan")
  }

  test("whole surface is codegen-friendly (no non-codegen expressions)") {
    // every extension query's final plan should contain WholeStageCodegen
    for (name <- Seq("q13_join_broadcast", "q20_window_rank", "q29_rollup",
        "q35_math_funcs")) {
      val spans = allNodes(plan(name)).collect {
        case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
      }
      assert(spans.nonEmpty, s"$name lacks codegen")
    }
  }

  test("approx_count_distinct is within 5% of exact (asserted in-query)") {
    val rows = SparkEntry.queries("q32_approx_distinct")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getBoolean(2),
      s"${r.getString(0)}: sketch landed outside 5% of exact"))
    val exact = SparkEntry.queries("q31_distinct_agg")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach(r => assert(r.getLong(1) === exact(r.getString(0))))
  }

  test("window rank matches hand computation") {
    val rows = SparkEntry.queries("q20_window_rank")(spark, sf).collect()
    val byStatus = rows.groupBy(_.getString(0))
    byStatus.foreach { case (_, rs) =>
      assert(rs.map(_.getInt(1)).toSeq.sorted === (1 to rs.length))
      // prices non-increasing within a status
      val prices = rs.sortBy(_.getInt(1)).map(_.getDouble(4))
      assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
    }
  }

  test("rollup includes grand total equal to table count") {
    val rows = SparkEntry.queries("q29_rollup")(spark, sf).collect()
    val total = rows.filter(r => r.getString(0) == "ALL" && r.getString(1) == "ALL")
    assert(total.length === 1)
    assert(total.head.getLong(2) ===
      Tables.load(spark, sf, "lineitem").count())
  }
}
