package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Advanced operator shapes the reference engine lacks entirely: as-of
  * join, exact interpolated percentiles, pivot.
  *
  * The as-of join uses the union + carry-forward-window pattern: tag both
  * sides, union, and for each right row take the last left row at-or-
  * before it within the key partition. One shuffle on (key), no range
  * explosion — the scalable formulation (a naive range join is O(n·m)
  * per key). DuckDB's native ASOF JOIN is the oracle.
  */
object Advanced {

  private def ev(s: SparkSession, d: String) = Tables.load(s, d, "events")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // For each 'click', the most recent 'view' at-or-before it (per user).
    "q62_asof_join" -> ((s, d) => {
      val e = ev(s, d)
      val views = e.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("event_id").as("view_id"))
        .withColumn("tag", lit(0))
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
        .withColumn("tag", lit(1))
      val unioned = views.select(col("user_id"), col("ts"), col("tag"),
          col("view_id"), lit(null).cast("long").as("click_id"))
        .unionAll(clicks.select(col("user_id"), col("ts"), col("tag"),
          lit(null).cast("long").as("view_id"), col("click_id")))
      // views sort before clicks at equal ts (tag 0 < 1) → ts >= semantics
      val w = Window.partitionBy("user_id")
        .orderBy(asc("ts"), asc("tag"), asc_nulls_last("view_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      unioned
        .withColumn("asof_view", last("view_id", ignoreNulls = true).over(w))
        .filter(col("click_id").isNotNull && col("asof_view").isNotNull)
        .select(col("user_id"), col("click_id"),
          col("asof_view").as("view_id"))
        .orderBy("user_id", "click_id")
    }),

    // Interval (range) join, bucketized: count PURCHASE events within
    // ±60s of each ERROR event by a DIFFERENT user. The scalable pattern:
    // truncate ts to 1-minute buckets, explode each error to its
    // {-1, 0, +1} neighbor buckets, equi-join on the bucket, then apply
    // the exact |Δt| <= 60s residual — turns an O(n·m) theta join into a
    // hash join + cheap filter.
    "q67_range_join" -> ((s, d) => {
      val e = ev(s, d)
      val errors = e.filter(col("event_type") === "error")
        .select(col("event_id").as("err_id"), col("user_id").as("err_user"),
          col("ts").as("err_ts"))
        .withColumn("bkt", explode(array(
          (unix_timestamp(col("err_ts")) / 60).cast("long") - 1,
          (unix_timestamp(col("err_ts")) / 60).cast("long"),
          (unix_timestamp(col("err_ts")) / 60).cast("long") + 1)))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
          col("ts").as("p_ts"))
        .withColumn("bkt", (unix_timestamp(col("p_ts")) / 60).cast("long"))
      errors.join(purchases, Seq("bkt"))
        .filter(col("p_user") =!= col("err_user"))
        .filter(abs(unix_timestamp(col("p_ts")) - unix_timestamp(col("err_ts"))) <= 60)
        .select("err_id", "p_id").distinct()
        .groupBy("err_id")
        .agg(count(lit(1)).as("nearby_purchases"))
        .orderBy("err_id")
    }),

    // Exact interpolated percentiles per event type.
    "q63_percentiles" -> ((s, d) =>
      ev(s, d)
        .groupBy("event_type")
        .agg(
          round(expr("percentile(value, 0.5)"), 4).as("p50"),
          round(expr("percentile(value, 0.9)"), 4).as("p90"),
          round(expr("percentile(value, 0.99)"), 4).as("p99"),
          count(lit(1)).as("cnt"))
        .orderBy("event_type")),

    // Pivot: users × event_type count matrix (first 10 users).
    "q64_pivot" -> ((s, d) =>
      ev(s, d)
        .filter(col("user_id") < 10)
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy("user_id"))
  )

  val oracleSql: Map[String, String] = Map(
    "q62_asof_join" ->
      """WITH views AS (
        |  SELECT user_id, ts, event_id AS view_id FROM events
        |  WHERE event_type = 'view'),
        |clicks AS (
        |  SELECT user_id, ts, event_id AS click_id FROM events
        |  WHERE event_type = 'click')
        |SELECT c.user_id AS user_id, c.click_id, v.view_id
        |FROM clicks c ASOF JOIN views v
        |  ON c.user_id = v.user_id AND c.ts >= v.ts
        |ORDER BY c.user_id, click_id""".stripMargin,

    "q67_range_join" ->
      """WITH e AS (SELECT event_id, user_id, ts FROM events
        |           WHERE event_type = 'error'),
        |p AS (SELECT event_id, user_id, ts FROM events
        |      WHERE event_type = 'purchase')
        |SELECT e.event_id AS err_id, count(*) AS nearby_purchases
        |FROM e JOIN p
        |  ON p.user_id <> e.user_id
        |  AND abs(CAST(floor(epoch(p.ts)) AS BIGINT) - CAST(floor(epoch(e.ts)) AS BIGINT))
        |    <= 60
        |GROUP BY err_id ORDER BY err_id""".stripMargin,

    "q63_percentiles" ->
      """SELECT event_type,
        |  round(quantile_cont(value, 0.5), 4) AS p50,
        |  round(quantile_cont(value, 0.9), 4) AS p90,
        |  round(quantile_cont(value, 0.99), 4) AS p99,
        |  count(*) AS cnt
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q64_pivot" ->
      """SELECT user_id,
        |  count(*) FILTER (event_type = 'click') AS "click",
        |  count(*) FILTER (event_type = 'error') AS "error",
        |  count(*) FILTER (event_type = 'purchase') AS "purchase",
        |  count(*) FILTER (event_type = 'signup') AS "signup",
        |  count(*) FILTER (event_type = 'view') AS "view"
        |FROM events WHERE user_id < 10
        |GROUP BY user_id ORDER BY user_id""".stripMargin
  )
}
