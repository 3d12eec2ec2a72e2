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
}
