package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Reference-parity query surface (SURVEY.md §2B, B1–B15).
  *
  * Each entry mirrors a query shape the reference declares/tests/benches
  * (reference: datafusion-pinot/examples/benchmark_cases.rs:9-45,
  * tests/query_tests.rs, README "Supported SQL Queries") re-expressed on
  * the driver's TPC-H-ish testdata. Every query carries a deterministic
  * total ORDER BY (unique key tie-break) so the DuckDB-oracle hash compare
  * is order-stable, and aggregate columns are aliased identically on both
  * sides.
  *
  * Scale notes (100 TB design): every shape below is a single scan →
  * (optional shuffle) pipeline. Aggregations are partial+final hash aggs
  * (map-side combine), top-k fuses into TakeOrderedAndProject (no global
  * sort), and filters/projections push into the parquet scan.
  */
object Relational {

  private def li(s: SparkSession, d: String) = Tables.load(s, d, "lineitem")
  private def ord(s: SparkSession, d: String) = Tables.load(s, d, "orders")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // B3/A3: COUNT(*) — empty projection; parquet answers from row-group
    // metadata (reference: exec.rs:92-95 count-only scan).
    "q01_count_star" -> ((s, d) =>
      li(s, d).agg(count(lit(1)).as("cnt"))),

    // B1/B2: projection full scan (dictionary-ish narrow columns).
    "q02_projection" -> ((s, d) =>
      li(s, d)
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity")),

    // B1: scan including string columns (reference bench case 2/3 reads
    // dict + RAW string cols).
    "q03_scan_strings" -> ((s, d) =>
      li(s, d)
        .select("l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus")
        .orderBy("l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus")),

    // B4–B6/B11: global SUM/AVG/MAX/MIN with aliases (bench case 4).
    "q04_agg_global" -> ((s, d) =>
      li(s, d).agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(avg("l_extendedprice"), 4).as("avg_price"),
        max("l_quantity").as("max_qty"),
        min("l_quantity").as("min_qty"),
        count(lit(1)).as("cnt"))),

    // B7/B8/B9/B10: GROUP BY low-card keys + ORDER BY agg DESC LIMIT
    // (bench case 5). Tie-break on group keys for determinism.
    "q05_group_topk" -> ((s, d) =>
      li(s, d)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          count(lit(1)).as("cnt"),
          round(sum("l_quantity"), 2).as("sum_qty"))
        .orderBy(desc("sum_qty"), asc("l_returnflag"), asc("l_linestatus"))
        .limit(10)),

    // B8 high-cardinality group key (bench case 6: GROUP BY raw playerID).
    "q06_group_highcard" -> ((s, d) =>
      li(s, d)
        .groupBy("l_partkey")
        .agg(
          round(avg("l_extendedprice"), 4).as("avg_price"),
          count(lit(1)).as("cnt"))
        .orderBy(desc("avg_price"), asc("l_partkey"))
        .limit(10)),

    // B10: projection + LIMIT via unique-key top-k (bench case 7);
    // Spark fuses into TakeOrderedAndProject — no full sort at scale.
    "q07_limit" -> ((s, d) =>
      li(s, d)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber", "l_extendedprice")
        .limit(10)),

    // B15: predicate on timestamp + numeric range; pushed to parquet scan.
    "q08_filter_range" -> ((s, d) =>
      li(s, d)
        .filter(col("l_shipdate") < lit("1995-06-01").cast("timestamp"))
        .filter(col("l_discount") >= 0.05 && col("l_discount") <= 0.07)
        .select("l_orderkey", "l_linenumber", "l_discount", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber", "l_discount", "l_extendedprice")),

    // B15: string-equality predicate + aggregate above the filter.
    "q09_filter_string" -> ((s, d) =>
      li(s, d)
        .filter(col("l_returnflag") === "R")
        .groupBy("l_linestatus")
        .agg(
          count(lit(1)).as("cnt"),
          round(sum("l_extendedprice"), 2).as("sum_price"))
        .orderBy("l_linestatus")),

    // B8/B20: group by a derived (scalar-function) key — year(timestamp).
    "q10_group_year" -> ((s, d) =>
      li(s, d)
        .groupBy(year(col("l_shipdate")).as("ship_year"))
        .agg(
          count(lit(1)).as("cnt"),
          round(sum("l_quantity"), 2).as("sum_qty"))
        .orderBy("ship_year")),

    // B14: second table in the same session (multi-table surface).
    "q11_orders_agg" -> ((s, d) =>
      ord(s, d)
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(
          count(lit(1)).as("cnt"),
          round(sum("o_totalprice"), 2).as("sum_total"))
        .orderBy("o_orderstatus", "o_orderpriority")),

    // TPC-H Q1 shape — the canonical agg battery over lineitem.
    "q12_tpch_q1" -> ((s, d) =>
      li(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          round(avg("l_extendedprice"), 4).as("avg_price"),
          round(avg("l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus"))
  )

  val oracleSql: Map[String, String] = Map(
    "q01_count_star" ->
      "SELECT count(*) AS cnt FROM lineitem",

    "q02_projection" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_quantity""".stripMargin,

    "q03_scan_strings" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_returnflag, l_linestatus""".stripMargin,

    "q04_agg_global" ->
      """SELECT round(sum(l_quantity), 2) AS sum_qty,
        |round(avg(l_extendedprice), 4) AS avg_price,
        |max(l_quantity) AS max_qty, min(l_quantity) AS min_qty,
        |count(*) AS cnt FROM lineitem""".stripMargin,

    "q05_group_topk" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt,
        |round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY sum_qty DESC, l_returnflag ASC, l_linestatus ASC
        |LIMIT 10""".stripMargin,

    "q06_group_highcard" ->
      """SELECT l_partkey, round(avg(l_extendedprice), 4) AS avg_price,
        |count(*) AS cnt
        |FROM lineitem GROUP BY l_partkey
        |ORDER BY avg_price DESC, l_partkey ASC LIMIT 10""".stripMargin,

    "q07_limit" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_extendedprice LIMIT 10""".stripMargin,

    "q08_filter_range" ->
      """SELECT l_orderkey, l_linenumber, l_discount, l_extendedprice
        |FROM lineitem
        |WHERE l_shipdate < TIMESTAMP '1995-06-01'
        |AND l_discount >= 0.05 AND l_discount <= 0.07
        |ORDER BY l_orderkey, l_linenumber, l_discount, l_extendedprice""".stripMargin,

    "q09_filter_string" ->
      """SELECT l_linestatus, count(*) AS cnt,
        |round(sum(l_extendedprice), 2) AS sum_price
        |FROM lineitem WHERE l_returnflag = 'R'
        |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,

    "q10_group_year" ->
      """SELECT CAST(year(l_shipdate) AS INTEGER) AS ship_year, count(*) AS cnt,
        |round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem GROUP BY 1 ORDER BY ship_year""".stripMargin,

    "q11_orders_agg" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS cnt,
        |round(sum(o_totalprice), 2) AS sum_total
        |FROM orders GROUP BY o_orderstatus, o_orderpriority
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin,

    "q12_tpch_q1" ->
      """SELECT l_returnflag, l_linestatus,
        |round(sum(l_quantity), 2) AS sum_qty,
        |round(sum(l_extendedprice), 2) AS sum_base_price,
        |round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
        |round(avg(l_quantity), 4) AS avg_qty,
        |round(avg(l_extendedprice), 4) AS avg_price,
        |round(avg(l_discount), 4) AS avg_disc,
        |count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
  )
}
