package graft

import graft.queries.Components

/** The shared connected-components keeper ([[Components]]): the driver
  * union-find fast path and the distributed min-label-propagation
  * fallback must produce IDENTICAL labelings — the fallback normally
  * runs only past the 100k-edge cap, so the cap is forced down here to
  * exercise it on a small, hand-checkable graph.
  */
class ComponentsSpec extends SparkTestBase {

  // two chains, one triangle, one isolated edge; min ids 1, 10, 20, 30
  private val edges = Seq(
    (2L, 1L), (2L, 3L), (3L, 4L),            // chain rooted at 1
    (10L, 11L), (11L, 12L),                   // chain rooted at 10
    (20L, 21L), (21L, 22L), (22L, 20L),       // triangle rooted at 20
    (30L, 31L))                               // edge rooted at 30
  private val expected = Seq(
    (1L, 1L, true), (2L, 1L, false), (3L, 1L, false), (4L, 1L, false),
    (10L, 10L, true), (11L, 10L, false), (12L, 10L, false),
    (20L, 20L, true), (21L, 20L, false), (22L, 20L, false),
    (30L, 30L, true), (31L, 30L, false))

  private def pairsDf = {
    import spark.implicits._
    edges.toDF("id_a", "id_b").repartition(5) // several partitions
  }

  test("driver union-find labels components by min id") {
    val got = Components.roots(pairsDf, "doc_id")(spark)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    assert(got === expected)
  }

  test("distributed min-label fallback (forced by a tiny cap) matches " +
      "the driver path exactly") {
    System.setProperty("graft.cc.driverCap", "1")
    try {
      val got = Components.roots(pairsDf, "doc_id")(spark)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
      assert(got === expected)
    } finally System.clearProperty("graft.cc.driverCap")
  }

  test("fallback converges on a diameter-25 chain (past the old 20-round " +
      "cap) instead of returning partial labels") {
    import spark.implicits._
    // a single path 0-1-2-...-25: min-label needs 25 pure-propagation
    // rounds; the pre-fix loop stopped at 20 and silently returned
    // label 5 for node 25. Pointer doubling converges it in ~6.
    val chain = (0L until 25L).map(i => (i, i + 1)).toDF("id_a", "id_b")
      .repartition(4)
    System.setProperty("graft.cc.driverCap", "1")
    try {
      val got = Components.roots(chain, "doc_id")(spark)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      assert(got.length === 26)
      got.foreach { case (id, root, canon) =>
        assert(root === 0L, s"node $id labeled $root, expected 0")
        assert(canon === (id == 0L))
      }
    } finally System.clearProperty("graft.cc.driverCap")
  }

  test("fallback plan audit: no global window, and single-partition " +
      "shuffles only above aggregated partials") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.util.QueryExecutionListener
    val plans = scala.collection.mutable.ArrayBuffer.empty[SparkPlan]
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = plans.synchronized { plans += qe.executedPlan }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    def nodes(p: SparkPlan): Seq[SparkPlan] = {
      val kids = p match {
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          Seq(a.executedPlan)
        case other => other.children
      }
      p +: kids.flatMap(nodes)
    }
    spark.listenerManager.register(listener)
    System.setProperty("graft.cc.driverCap", "1")
    try {
      Components.roots(pairsDf, "doc_id")(spark).collect()
      // listenerManager delivery is async — poll until the plan count
      // stabilizes (every localCheckpoint/count/collect fires one)
      var last = -1
      var stable = 0
      while (stable < 3) {
        Thread.sleep(100)
        val n = plans.synchronized(plans.length)
        if (n == last) stable += 1 else { stable = 0; last = n }
      }
      val all = plans.synchronized(plans.toVector)
      assert(all.nonEmpty)
      for (p <- all; n <- nodes(p)) n match {
        case w: org.apache.spark.sql.execution.window.WindowExec =>
          assert(w.partitionSpec.nonEmpty, s"global window in CC fallback: $w")
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
            if e.outputPartitioning.numPartitions == 1 =>
          // the only legal 1-partition shuffle moves per-partition
          // aggregate partials (the `changed` count), never label rows
          val aggBelow = nodes(e.child).exists {
            case _: org.apache.spark.sql.execution.aggregate.HashAggregateExec => true
            case _: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec => true
            case _: org.apache.spark.sql.execution.aggregate.SortAggregateExec => true
            case _ => false
          }
          assert(aggBelow,
            s"CC fallback funnels unaggregated rows to one partition: ${e.child.nodeName}")
        case _ => ()
      }
    } finally {
      System.clearProperty("graft.cc.driverCap")
      spark.listenerManager.unregister(listener)
    }
  }
}
