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
        |ORDER BY prev_type, event_type""".stripMargin
  )
}
