package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Join surface (SURVEY.md §2B B16 — latent in the reference's DataFusion
  * engine, first-class here).
  *
  * Scale notes (100 TB): every dimension-side join below broadcasts
  * explicitly (`broadcast(dim)`) — region/nation/customer/supplier/part
  * stay small relative to the fact tables, so no shuffle of lineitem is
  * ever needed for them. The one genuinely large-large join
  * (orders ⋈ lineitem) shuffles on the join key, which is the minimal
  * possible data movement; AQE handles skew at runtime.
  */
object Joins {

  private def t(s: SparkSession, d: String, n: String) = Tables.load(s, d, n)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Broadcast hash join: fact ⋈ small dim — zero shuffle of lineitem.
    "q13_join_broadcast" -> ((s, d) =>
      t(s, d, "lineitem")
        .join(broadcast(t(s, d, "part")), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(
          count(lit(1)).as("cnt"),
          round(sum("l_quantity"), 2).as("sum_qty"))
        .orderBy("p_brand")),

    // Multi-way snowflake: customer → nation → region, all dims broadcast.
    "q14_join_multiway" -> ((s, d) =>
      t(s, d, "customer")
        .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
          count(lit(1)).as("cnt"),
          round(sum("c_acctbal"), 2).as("sum_bal"))
        .orderBy("r_name", "n_name")),

    // Left-semi: orders that have at least one high-quantity line.
    "q15_join_semi" -> ((s, d) =>
      t(s, d, "orders")
        .join(
          t(s, d, "lineitem").filter(col("l_quantity") > 45),
          col("o_orderkey") === col("l_orderkey"), "left_semi")
        .agg(
          count(lit(1)).as("cnt"),
          round(sum("o_totalprice"), 2).as("sum_total"))),

    // Left-anti: customers with no orders at all.
    "q16_join_anti" -> ((s, d) =>
      t(s, d, "customer")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")),

    // Left-outer: per-nation customer counts including customer-less rows.
    // Scale-safe plan: AGGREGATE the fact side FIRST — map-side combine
    // means each scan task emits ≤|nations| partial rows, so the only
    // shuffle carries ~25 tiny partials instead of the full customer
    // table hashed onto 25 skewed keys — then broadcast the 25-row
    // aggregate to nation, preserving customer-less nations. (The naive
    // form, broadcast(nation).join(customer, "left_outer"), hints
    // broadcast on the build-left side, which Spark cannot honor for a
    // left outer: the hint is silently dropped and the whole fact table
    // shuffles on n_nationkey.)
    "q17_join_outer" -> ((s, d) => {
      val perNation = t(s, d, "customer")
        .groupBy("c_nationkey")
        .agg(count(col("c_custkey")).as("cnt_raw"),
          sum("c_acctbal").as("sb_raw"))
      t(s, d, "nation")
        .join(broadcast(perNation),
          col("n_nationkey") === col("c_nationkey"), "left_outer")
        .select(col("n_name"),
          coalesce(col("cnt_raw"), lit(0L)).as("cnt"),
          round(coalesce(col("sb_raw"), lit(0.0)), 2).as("sum_bal"))
        .orderBy("n_name")
    }),

    // TPC-H Q3 shape: two fact joins (shuffle on the keys) + top-k revenue.
    "q18_tpch_q3" -> ((s, d) =>
      t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"))
        .join(t(s, d, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .filter(col("o_orderdate") < lit("1995-03-15").cast("timestamp"))
        .filter(col("l_shipdate") > lit("1995-03-15").cast("timestamp"))
        .groupBy("o_orderkey", "o_orderdate")
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
        .select(col("o_orderkey"), col("revenue"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"))
        .orderBy(desc("revenue"), asc("o_orderkey"))
        .limit(10)),

    // TPC-H Q5 shape: 6-table join; dims broadcast, facts shuffle once.
    "q19_tpch_q5" -> ((s, d) =>
      t(s, d, "customer")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"))
        .join(t(s, d, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .join(t(s, d, "supplier"),
          col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(t(s, d, "nation")), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
        .filter(col("o_orderdate") >= lit("1994-01-01").cast("timestamp"))
        .filter(col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
        .groupBy("n_name")
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
        .orderBy(desc("revenue"), asc("n_name")))
  )

  val extraQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q10 shape: returned-item revenue per customer, 4-way join
    // (two fact shuffles, nation broadcast), top-20.
    "q68_tpch_q10" -> ((s, d) =>
      t(s, d, "customer")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"))
        .join(t(s, d, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .filter(col("l_returnflag") === "R")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp"))
        .filter(col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
        .orderBy(desc("revenue"), asc("c_custkey"))
        .limit(20)),

    // Histogram binning: order-value distribution in 25k buckets.
    "q69_histogram" -> ((s, d) =>
      t(s, d, "orders")
        .withColumn("bucket", expr(
          "CAST(floor(o_totalprice / 25000) AS BIGINT)"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("cnt"),
          round(avg("o_totalprice"), 2).as("avg_price"))
        .orderBy("bucket")),

    // TPC-H Q4 shape (adapted: EXISTS probes lineitems shipped after the
    // order date — the testdata has no commit/receipt dates): priority
    // counts over a half-year window via a left-semi join. The semi join
    // shuffles both sides on the order key once; no row multiplication.
    "q98_tpch_q4" -> ((s, d) => {
      val o = t(s, d, "orders")
        .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp"))
        .filter(col("o_orderdate") < lit("1995-07-01").cast("timestamp"))
      o.join(t(s, d, "lineitem"),
          col("o_orderkey") === col("l_orderkey") &&
            col("l_shipdate") > col("o_orderdate"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    }),

    // TPC-H Q6: the scan-dominated filter-aggregate — every predicate
    // pushes to the parquet scan, the aggregate is a 1-row partial+final.
    "q99_tpch_q6" -> ((s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp"))
        .filter(col("l_shipdate") < lit("1996-01-01").cast("timestamp"))
        .filter(col("l_discount") >= 0.05 && col("l_discount") <= 0.07)
        .filter(col("l_quantity") < 24)
        .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2)
          .as("revenue")))
  )

  val extraOracleSql: Map[String, String] = Map(
    "q68_tpch_q10" ->
      """SELECT c_custkey, c_name, n_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |AND o_orderdate >= TIMESTAMP '1996-01-01'
        |AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue DESC, c_custkey ASC LIMIT 20""".stripMargin,

    "q69_histogram" ->
      """SELECT CAST(floor(o_totalprice / 25000) AS BIGINT) AS bucket,
        |  count(*) AS cnt, round(avg(o_totalprice), 2) AS avg_price
        |FROM orders GROUP BY bucket ORDER BY bucket""".stripMargin,

    "q98_tpch_q4" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders o
        |WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        |AND o_orderdate < TIMESTAMP '1995-07-01'
        |AND EXISTS (SELECT 1 FROM lineitem l
        |  WHERE l.l_orderkey = o.o_orderkey
        |  AND l.l_shipdate > o.o_orderdate)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q99_tpch_q6" ->
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01'
        |AND l_shipdate < TIMESTAMP '1996-01-01'
        |AND l_discount >= 0.05 AND l_discount <= 0.07
        |AND l_quantity < 24""".stripMargin
  )

  val oracleSql: Map[String, String] = Map(
    "q13_join_broadcast" ->
      """SELECT p_brand, count(*) AS cnt, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "q14_join_multiway" ->
      """SELECT r_name, n_name, count(*) AS cnt, round(sum(c_acctbal), 2) AS sum_bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,

    "q15_join_semi" ->
      """SELECT count(*) AS cnt, round(sum(o_totalprice), 2) AS sum_total
        |FROM orders WHERE EXISTS (
        |  SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey AND l_quantity > 45)""".stripMargin,

    "q16_join_anti" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q17_join_outer" ->
      """SELECT n_name, count(c_custkey) AS cnt,
        |round(coalesce(sum(c_acctbal), 0), 2) AS sum_bal
        |FROM nation LEFT JOIN customer ON n_nationkey = c_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q18_tpch_q3" ->
      """SELECT o_orderkey,
        |round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |AND o_orderdate < TIMESTAMP '1995-03-15'
        |AND l_shipdate > TIMESTAMP '1995-03-15'
        |GROUP BY o_orderkey, o_orderdate
        |ORDER BY revenue DESC, o_orderkey ASC LIMIT 10""".stripMargin,

    "q19_tpch_q5" ->
      """SELECT n_name,
        |round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE o_orderdate >= TIMESTAMP '1994-01-01'
        |AND o_orderdate < TIMESTAMP '1996-01-01'
        |GROUP BY n_name ORDER BY revenue DESC, n_name ASC""".stripMargin
  )
}
