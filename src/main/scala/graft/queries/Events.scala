package graft.queries

import graft.Tables
import graft.streaming.EventPipelines
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Event/time-series surface: the EventPipelines streaming transforms run
  * here in BATCH mode over the events table (Spark's unified model), each
  * with a DuckDB oracle.
  */
object Events {

  private def ev(s: SparkSession, d: String) = Tables.load(s, d, "events")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q51_events_hourly" -> ((s, d) =>
      EventPipelines.hourlyByType(ev(s, d))
        .orderBy("hour_start", "event_type")),

    "q52_events_sliding" -> ((s, d) =>
      EventPipelines.slidingCounts(ev(s, d))
        .orderBy("win_start", "cnt")),

    "q53_events_sessions" -> ((s, d) =>
      EventPipelines.sessionize(ev(s, d))
        .orderBy("user_id", "session_start")),

    // stream-stream interval join (attribution), run in batch for the
    // oracle; StreamingSpec drives the same code stream-stream with
    // watermark-bounded state
    "q83_attribution" -> ((s, d) =>
      EventPipelines.attribution(ev(s, d))
        .groupBy("user_id")
        .agg(count(lit(1)).as("attributions"),
          min("latency_ms").as("min_latency_ms"),
          max("latency_ms").as("max_latency_ms"))
        .orderBy("user_id")),

    // event-type transition matrix via window lag (stream-analytics shape)
    "q54_events_transitions" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(asc("ts"), asc("event_id"))
      ev(s, d)
        .withColumn("prev_type", lag("event_type", 1).over(w))
        .filter(col("prev_type").isNotNull)
        .groupBy("prev_type", "event_type")
        .agg(count(lit(1)).as("cnt"))
        .orderBy("prev_type", "event_type")
    }),

    // Upsert-table view (Pinot upsert semantics: primary key = user_id,
    // comparison column = ts, tie-break event_id): the latest version of
    // each key wins. Implemented as a map-side-combinable max_by
    // aggregate — one shuffle of (key, small struct) — NOT a window sort
    // over the full history; at 100 TB of versions the partial aggregate
    // keeps one candidate per key per partition.
    "q87_upsert_latest" -> ((s, d) =>
      ev(s, d)
        .groupBy("user_id")
        .agg(
          count(lit(1)).as("n_versions"),
          max_by(struct(col("event_type"), col("value")),
            struct(col("ts"), col("event_id"))).as("last"),
          max("ts").as("last_ts"))
        .select(col("user_id"), col("n_versions"),
          date_format(col("last_ts"), "yyyy-MM-dd HH:mm:ss").as("last_ts"),
          col("last.event_type").as("last_type"),
          round(col("last.value"), 2).as("last_value"))
        .orderBy("user_id")),

    // Partial upsert (Pinot's partialUpsertStrategies): per primary key,
    // each column merges by its declared strategy — OVERWRITE takes the
    // latest version's value, INCREMENT accumulates, MAX keeps the
    // largest, APPEND unions (order-normalized). One map-side-combinable
    // aggregate; the strategies are exactly Pinot's column configs.
    "q101_partial_upsert" -> ((s, d) =>
      ev(s, d)
        .groupBy("user_id")
        .agg(
          count(lit(1)).as("n_versions"),
          // OVERWRITE: value of the latest (ts, event_id) version
          max_by(col("event_type"), struct(col("ts"), col("event_id")))
            .as("last_type"),
          // INCREMENT: running total across versions
          round(sum("value"), 2).as("total_value"),
          // MAX: high-water mark
          date_format(max("ts"), "yyyy-MM-dd HH:mm:ss").as("max_ts"),
          // APPEND: set-union of observed types, normalized for hashing
          array_join(array_sort(collect_set("event_type")), ",")
            .as("seen_types"))
        .orderBy("user_id")),

    // Time-series gap-fill + downsample (Pinot's GapFill FILL(PREVIOUS)):
    // hourly buckets per event_type over the full observed range; empty
    // buckets appear with cnt=0 and carry the previous bucket's value
    // forward. The bucket aggregate is map-side combinable; the spine is
    // O(hours × types) — tiny and independent of event volume — and the
    // carry-forward window runs over the SPINE, never the raw events.
    "q88_gapfill" -> ((s, d) => {
      val e = ev(s, d)
      val buck = e
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
        .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("sum_value"))
      val bounds = e.agg(date_trunc("hour", min("ts")).as("h0"),
        date_trunc("hour", max("ts")).as("h1"))
      val spine = bounds
        .select(explode(expr("sequence(h0, h1, interval 1 hour)")).as("h"))
        .crossJoin(e.select("event_type").distinct())
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("h")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      spine.join(buck, Seq("event_type", "h"), "left")
        .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
        .withColumn("gap", col("sum_value").isNull)
        .withColumn("sum_value_filled",
          last("sum_value", ignoreNulls = true).over(w))
        .select(col("event_type"),
          date_format(col("h"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
          col("cnt"), col("gap"), col("sum_value_filled"))
        .orderBy("event_type", "hour_start")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q51_events_hourly" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
        |    AS hour_start,
        |  event_type, count(*) AS cnt, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY hour_start, event_type""".stripMargin,

    // every event belongs to exactly 4 sliding windows whose starts are
    // floor15(ts) - k*15min, k=0..3 (epoch-aligned, same as Spark window())
    "q52_events_sliding" ->
      """WITH f AS (
        |  SELECT date_trunc('minute', ts)
        |    - (INTERVAL 1 MINUTE) *
        |      (CAST(date_part('minute', ts) AS INTEGER) % 15) AS f15
        |  FROM events),
        |w AS (
        |  SELECT f15 - (INTERVAL 15 MINUTE) * k AS win_start
        |  FROM f, (SELECT unnest(range(0, 4)) AS k) s)
        |SELECT strftime(win_start, '%Y-%m-%d %H:%M:%S') AS win_start,
        |  count(*) AS cnt
        |FROM w GROUP BY win_start ORDER BY win_start, cnt""".stripMargin,

    "q53_events_sessions" ->
      """WITH x AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
        |        ORDER BY ts, event_id) >= INTERVAL 30 MINUTE
        |      THEN 1 ELSE 0 END AS new_s
        |  FROM events),
        |y AS (
        |  SELECT user_id, ts, value,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM x)
        |SELECT user_id,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  count(*) AS n_events, round(sum(value), 2) AS sum_value
        |FROM y GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,

    // interval boundaries in integer MICROSECONDS on both engines:
    // epoch_us(ns timestamp) truncates exactly like Spark's
    // timestamp_micros(ns div 1000) load, so no float/precision hazard
    "q83_attribution" ->
      """WITH v AS (SELECT user_id, epoch_us(ts) AS vus FROM events
        |           WHERE event_type = 'view'),
        |p AS (SELECT user_id, epoch_us(ts) AS pus FROM events
        |      WHERE event_type = 'purchase'),
        |j AS (SELECT v.user_id, (pus - vus) // 1000 AS latency_ms
        |      FROM v JOIN p ON v.user_id = p.user_id
        |       AND pus >= vus AND pus < vus + 1800000000)
        |SELECT user_id, count(*) AS attributions,
        |  CAST(min(latency_ms) AS BIGINT) AS min_latency_ms,
        |  CAST(max(latency_ms) AS BIGINT) AS max_latency_ms
        |FROM j GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q54_events_transitions" ->
      """WITH x AS (
        |  SELECT event_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev_type
        |  FROM events)
        |SELECT prev_type, event_type, count(*) AS cnt
        |FROM x WHERE prev_type IS NOT NULL
        |GROUP BY prev_type, event_type
        |ORDER BY prev_type, event_type""".stripMargin,

    "q87_upsert_latest" ->
      """WITH r AS (
        |  SELECT user_id, ts, event_type, value,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts DESC, event_id DESC) AS rn,
        |    count(*) OVER (PARTITION BY user_id) AS n_versions
        |  FROM events)
        |SELECT user_id, n_versions,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS last_ts,
        |  event_type AS last_type, round(value, 2) AS last_value
        |FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin,

    "q101_partial_upsert" ->
      """WITH r AS (
        |  SELECT user_id, ts, event_id, event_type, value,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events)
        |SELECT user_id,
        |  count(*) AS n_versions,
        |  max(CASE WHEN rn = 1 THEN event_type END) AS last_type,
        |  round(sum(value), 2) AS total_value,
        |  strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS max_ts,
        |  array_to_string(list_sort(list_distinct(list(event_type))), ',')
        |    AS seen_types
        |FROM r GROUP BY user_id ORDER BY user_id""".stripMargin,

    // carry-forward without IGNORE NULLS (portable): grp = running count
    // of non-null buckets; within each grp only its FIRST row is
    // non-null, so max() over (type, grp) is exactly "previous value"
    "q88_gapfill" ->
      """WITH b AS (
        |  SELECT event_type, date_trunc('hour', ts) AS h,
        |    count(*) AS cnt, round(sum(value), 2) AS sum_value
        |  FROM events GROUP BY 1, 2),
        |bounds AS (SELECT date_trunc('hour', min(ts)) AS h0,
        |                  date_trunc('hour', max(ts)) AS h1 FROM events),
        |spine AS (
        |  SELECT t.event_type, g.h
        |  FROM (SELECT DISTINCT event_type FROM events) t,
        |       (SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
        |        FROM bounds) g),
        |j AS (
        |  SELECT s.event_type, s.h, coalesce(b.cnt, 0) AS cnt,
        |    b.sum_value IS NULL AS gap, b.sum_value,
        |    count(b.sum_value) OVER (PARTITION BY s.event_type
        |      ORDER BY s.h) AS grp
        |  FROM spine s LEFT JOIN b
        |    ON s.event_type = b.event_type AND s.h = b.h)
        |SELECT event_type, strftime(h, '%Y-%m-%d %H:%M:%S') AS hour_start,
        |  CAST(cnt AS BIGINT) AS cnt, gap,
        |  max(sum_value) OVER (PARTITION BY event_type, grp)
        |    AS sum_value_filled
        |FROM j ORDER BY event_type, hour_start""".stripMargin
  )
}
