package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Geospatial surface: the Spark-native analog of Pinot's geo family
  * (ST_POINT/ST_DISTANCE/ST_WITHIN + the H3 geo index that turns radius
  * predicates into coarse cell lookups refined by an exact check).
  *
  * Coordinates are synthesized DETERMINISTICALLY from event/user ids in
  * centi-degree INTEGER space (0..18000 × 0..36000), and distances are
  * exact integer squared-Euclidean in that space — every value is a
  * small-integer product, so the DuckDB oracle reproduces the arithmetic
  * bit-for-bit (no trig, no float rounding hazard; a haversine swap-in
  * only changes the distance expression, not the plan shape).
  *
  * The scale story mirrors the H3 index: q137 never evaluates the radius
  * predicate as a theta join — points bucket into radius-sized grid
  * cells, each region expands to its 3×3 candidate-cell neighborhood
  * (radius = cell size ⇒ any in-radius point is within one cell in each
  * axis), and the join is a broadcast EQUI-join on the cell key followed
  * by the exact refine. q138's nearest-region assignment is pure row
  * arithmetic over the 5 fixed centers (an inline array fold — no join
  * at all), then one aggregate.
  */
object Geo {

  private def ev(s: SparkSession, d: String) = Tables.load(s, d, "events")

  /** Radius (and grid-cell size), centi-degrees. */
  private val R = 2500L

  // synthesized point, 0..18000 × 0..36000 (centi-degrees, bias-free
  // integer mixes; both engines compute `%` on non-negative longs)
  private def latC = (col("event_id") * 7919L + col("user_id") * 104729L) % 18001L
  private def lonC = (col("event_id") * 15485863L + col("user_id") * 32452843L) % 36001L

  // region centers: 5 fixed points spread across the space
  private def regLatC = col("r_regionkey") * 3000L + lit(1500L)
  private def regLonC = col("r_regionkey") * 7000L + lit(1500L)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Geofence: events within R of each region center — grid-cell
    // equi-join (H3-index pattern) + exact integer refine.
    "q137_geofence_count" -> ((s, d) => {
      val pts = ev(s, d).select(
        latC.as("plat"), lonC.as("plon"), col("event_type"))
        .withColumn("cell_lat", col("plat") / lit(R) cast "long")
        .withColumn("cell_lon", col("plon") / lit(R) cast "long")
      val regions = Tables.load(s, d, "region")
        .select(col("r_regionkey"), col("r_name"),
          regLatC.as("rlat"), regLonC.as("rlon"))
      val cells = regions
        .withColumn("dlat", explode(array((-1 to 1).map(lit): _*)))
        .withColumn("dlon", explode(array((-1 to 1).map(lit): _*)))
        .select(col("r_regionkey"), col("r_name"), col("rlat"), col("rlon"),
          ((col("rlat") / lit(R)).cast("long") + col("dlat")).as("cell_lat"),
          ((col("rlon") / lit(R)).cast("long") + col("dlon")).as("cell_lon"))
      pts.join(broadcast(cells), Seq("cell_lat", "cell_lon"))
        .filter(
          (col("plat") - col("rlat")) * (col("plat") - col("rlat")) +
            (col("plon") - col("rlon")) * (col("plon") - col("rlon"))
            <= lit(R * R))
        .groupBy("r_regionkey", "r_name")
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("event_type")).as("n_types"))
        .orderBy("r_regionkey")
    }),

    // Nearest-region assignment: per-row argmin over the 5 fixed centers
    // as an inline array fold (packed (d2, key) min — deterministic
    // tie-break on the smaller region key), then one aggregate.
    "q138_nearest_region" -> ((s, d) =>
      ev(s, d)
        .select(latC.as("plat"), lonC.as("plon"))
        .withColumn("packed", expr(
          """array_min(transform(sequence(0, 4), r ->
            |  ((plat - (r * 3000 + 1500)) * (plat - (r * 3000 + 1500)) +
            |   (plon - (r * 7000 + 1500)) * (plon - (r * 7000 + 1500))) * 8
            |  + r))""".stripMargin.replace("\n", " ")))
        .select((col("packed") % 8L).as("r_regionkey"),
          (col("packed") / 8L cast "long").as("d2"))
        .groupBy("r_regionkey")
        .agg(count(lit(1)).as("n_events"),
          min("d2").as("min_d2"), max("d2").as("max_d2"))
        .orderBy("r_regionkey"))
  )

  val oracleSql: Map[String, String] = Map(
    "q137_geofence_count" ->
      """WITH p AS (
        |  SELECT (event_id * 7919 + user_id * 104729) % 18001 AS plat,
        |         (event_id * 15485863 + user_id * 32452843) % 36001 AS plon,
        |         event_type
        |  FROM events),
        |r AS (SELECT r_regionkey, r_name,
        |        r_regionkey * 3000 + 1500 AS rlat,
        |        r_regionkey * 7000 + 1500 AS rlon
        |      FROM region)
        |SELECT r_regionkey, r_name,
        |  count(*) AS n_events,
        |  count(DISTINCT event_type) AS n_types
        |FROM p JOIN r
        |  ON (plat - rlat) * (plat - rlat)
        |   + (plon - rlon) * (plon - rlon) <= 2500 * 2500
        |GROUP BY 1, 2 ORDER BY r_regionkey""".stripMargin,

    "q138_nearest_region" ->
      """WITH p AS (
        |  SELECT event_id,
        |         (event_id * 7919 + user_id * 104729) % 18001 AS plat,
        |         (event_id * 15485863 + user_id * 32452843) % 36001 AS plon
        |  FROM events),
        |d AS (
        |  SELECT min(((plat - (r * 3000 + 1500)) * (plat - (r * 3000 + 1500))
        |            + (plon - (r * 7000 + 1500)) * (plon - (r * 7000 + 1500)))
        |            * 8 + r) AS packed
        |  FROM p, (SELECT unnest(range(0, 5)) AS r) s
        |  GROUP BY event_id)
        |SELECT packed % 8 AS r_regionkey,
        |  count(*) AS n_events,
        |  CAST(min(packed // 8) AS BIGINT) AS min_d2,
        |  CAST(max(packed // 8) AS BIGINT) AS max_d2
        |FROM d GROUP BY 1 ORDER BY r_regionkey""".stripMargin
  )
}
