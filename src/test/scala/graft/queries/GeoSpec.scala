package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.functions._

/** Geo surface: the grid-cell (H3-style) radius join must be a coarse
  * EQUI-join + exact refine — provably a superset before refinement,
  * exactly the brute-force answer after it — and the plan must contain
  * no theta/nested-loop join.
  */
class GeoSpec extends SparkTestBase with AdaptiveSparkPlanHelper {

  test("grid candidates are a superset; refined counts equal brute force") {
    // brute force: evaluate the radius predicate as a (tiny) cross join
    val pts = graft.Tables.load(spark, sfDir, "events").select(
      ((col("event_id") * 7919L + col("user_id") * 104729L) % 18001L).as("plat"),
      ((col("event_id") * 15485863L + col("user_id") * 32452843L) % 36001L).as("plon"))
    val regions = graft.Tables.load(spark, sfDir, "region").select(
      col("r_regionkey"),
      (col("r_regionkey") * 3000L + lit(1500L)).as("rlat"),
      (col("r_regionkey") * 7000L + lit(1500L)).as("rlon"))
    val brute = pts.crossJoin(regions)
      .filter((col("plat") - col("rlat")) * (col("plat") - col("rlat")) +
        (col("plon") - col("rlon")) * (col("plon") - col("rlon"))
        <= lit(2500L * 2500L))
      .groupBy("r_regionkey").count()
      .collect()
      .map(r => r.getAs[Number](0).longValue -> r.getLong(1)).toMap
    val refined = Geo.queries("q137_geofence_count")(spark, sfDir)
      .collect()
      .map(r => r.getAs[Number](0).longValue -> r.getLong(2)).toMap
    val full = (0L to 4L).map(k => k -> brute.getOrElse(k, 0L))
      .filter(_._2 > 0L).toMap
    assert(refined === full)
  }

  test("cell-boundary points survive the 3x3 candidate expansion") {
    // a point exactly R away on an axis sits in the ±1 neighbor cell;
    // a point at R+1 must be excluded by the refine
    import spark.implicits._
    val R = 2500L
    val center = (1500L, 8500L) // region 0: (1500, 1500)+... use region 1
    val rlat = 1L * 3000 + 1500
    val rlon = 1L * 7000 + 1500
    val probes = Seq(
      (rlat + R, rlon, true), (rlat - R, rlon, true),
      (rlat, rlon + R, true), (rlat + R, rlon + 1, false),
      (rlat + 1767, rlon + 1767, true), // 2·1767² = 6244578 ≤ R² = 6250000
      (rlat + 1768, rlon + 1768, false)) // 2·1768² = 6251648 > R²
    probes.foreach { case (plat, plon, expectIn) =>
      val d2 = (plat - rlat) * (plat - rlat) + (plon - rlon) * (plon - rlon)
      assert((d2 <= R * R) === expectIn, s"probe math wrong: $plat,$plon")
      val cellDiffLat = math.abs(plat / R - rlat / R)
      val cellDiffLon = math.abs(plon / R - rlon / R)
      if (d2 <= R * R)
        assert(cellDiffLat <= 1 && cellDiffLon <= 1,
          s"in-radius probe outside 3x3 candidates: $plat,$plon")
    }
    assert(center._1 > 0) // silence unused warning
  }

  test("plan: the geofence is an equi-join (no cartesian / nested loop)") {
    val df = Geo.queries("q137_geofence_count")(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan
    val nodes = collectWithSubqueries(plan) { case p => p }
    assert(!nodes.exists(n =>
      n.isInstanceOf[CartesianProductExec] ||
        n.isInstanceOf[BroadcastNestedLoopJoinExec]),
      s"geofence must not plan a theta join:\n$plan")
    assert(nodes.exists(_.isInstanceOf[BroadcastHashJoinExec]),
      s"geofence should broadcast-hash-join on the cell key:\n$plan")
  }

  test("nearest-region assignment is single-scan (no join at all)") {
    val df = Geo.queries("q138_nearest_region")(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan
    val joins = collectWithSubqueries(plan) {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j }
    assert(joins.isEmpty, s"q138 must not join:\n$plan")
    // every event lands in exactly one region
    val total = df.collect().map(_.getLong(1)).sum
    assert(total === graft.Tables.load(spark, sfDir, "events").count())
  }
}
