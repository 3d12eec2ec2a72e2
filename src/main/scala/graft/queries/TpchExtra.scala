package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-9 TPC-H widening (B16/B20 depth): every remaining TPC-H query
  * expressible over the driver's reduced star schema (no partsupp table
  * and no comment/container/shipmode/commit/receipt columns, so
  * Q2/Q9/Q11/Q12/Q16/Q19/Q20/Q21 are out of reach and Q13/Q17/Q22 run
  * in adapted form — noted per query). Together with Q1/Q3/Q4/Q5/Q6/Q10
  * from earlier rounds this covers every join/subquery shape the suite
  * exercises: fact-fact shuffles, snowflake broadcasts, correlated
  * scalar subqueries, HAVING-IN, NOT EXISTS + scalar subquery, windowed
  * max-equality.
  *
  * Scale notes (100 TB): dims (supplier/part/nation/region) broadcast
  * explicitly; lineitem-orders-customer chains shuffle on their join
  * keys once each — the minimal movement; AQE re-plans skew at runtime.
  */
object TpchExtra {

  private def t(s: SparkSession, d: String, n: String) = Tables.load(s, d, n)

  private def rev = round(sum(col("l_extendedprice") *
    (lit(1) - col("l_discount"))), 2)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q7: volume shipping between two nations, by year. Fact chain
    // shuffles; supplier + both nation sides broadcast.
    "q119_tpch_q7" -> ((s, d) => {
      val n1 = broadcast(t(s, d, "nation")
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation")))
      val n2 = broadcast(t(s, d, "nation")
        .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation")))
      t(s, d, "lineitem")
        .join(broadcast(t(s, d, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .join(t(s, d, "orders"), col("o_orderkey") === col("l_orderkey"))
        .join(t(s, d, "customer"), col("c_custkey") === col("o_custkey"))
        .join(n1, col("s_nationkey") === col("s_nk"))
        .join(n2, col("c_nationkey") === col("c_nk"))
        .filter(
          (col("supp_nation") === "NATION_20" && col("cust_nation") === "NATION_11") ||
          (col("supp_nation") === "NATION_11" && col("cust_nation") === "NATION_20"))
        .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp"))
        .filter(col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(rev.as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    }),

    // TPC-H Q8: national market share within a region for one part type.
    "q120_tpch_q8" -> ((s, d) => {
      val nC = broadcast(t(s, d, "nation")
        .select(col("n_nationkey").as("cn_nk"), col("n_regionkey").as("cn_rk")))
      val nS = broadcast(t(s, d, "nation")
        .select(col("n_nationkey").as("sn_nk"), col("n_name").as("nation")))
      val vol = col("l_extendedprice") * (lit(1) - col("l_discount"))
      t(s, d, "lineitem")
        .join(broadcast(t(s, d, "part").filter(col("p_type") === "STANDARD")),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(t(s, d, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(nC, col("c_nationkey") === col("cn_nk"))
        .join(broadcast(t(s, d, "region").filter(col("r_name") === "ASIA")),
          col("cn_rk") === col("r_regionkey"))
        .join(nS, col("s_nationkey") === col("sn_nk"))
        .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp"))
        .filter(col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(round(
          sum(when(col("nation") === "NATION_3", vol).otherwise(lit(0.0))) /
            sum(vol), 4).as("mkt_share"))
        .orderBy("o_year")
    }),

    // TPC-H Q13 (adapted: the schema has no o_comment to exclude):
    // customer distribution by order count, including zero-order
    // customers via the left outer join.
    "q121_tpch_q13" -> ((s, d) =>
      t(s, d, "customer")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"),
          "left_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(desc("custdist"), desc("c_count"))),

    // TPC-H Q14: promo revenue share in one month.
    "q122_tpch_q14" -> ((s, d) => {
      val vol = col("l_extendedprice") * (lit(1) - col("l_discount"))
      t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1995-09-01").cast("timestamp"))
        .filter(col("l_shipdate") < lit("1995-10-01").cast("timestamp"))
        .join(broadcast(t(s, d, "part")), col("l_partkey") === col("p_partkey"))
        .agg(round(lit(100.0) *
          sum(when(col("p_type") === "PROMO", vol).otherwise(lit(0.0))) /
          sum(vol), 2).as("promo_revenue"))
    }),

    // TPC-H Q15: top supplier by quarterly revenue (the view expressed
    // as a CTE; max-equality via a broadcast scalar).
    "q123_tpch_q15" -> ((s, d) => {
      val revenue = t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp"))
        .filter(col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .groupBy(col("l_suppkey").as("supplier_no"))
        .agg(rev.as("total_revenue"))
      val top = revenue.agg(max("total_revenue").as("m"))
      t(s, d, "supplier")
        .join(revenue, col("s_suppkey") === col("supplier_no"))
        .join(broadcast(top), col("total_revenue") === col("m"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    }),

    // TPC-H Q17 (adapted: brand-only predicate — the schema has no
    // p_container): revenue impact of small-quantity orders, correlated
    // scalar subquery expressed as a per-part average joined back.
    "q124_tpch_q17" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      val perPart = li.groupBy(col("l_partkey").as("pk"))
        .agg((avg("l_quantity") * 0.2).as("qty_cut"))
      li.join(broadcast(t(s, d, "part").filter(col("p_brand") === "Brand#3")),
          col("l_partkey") === col("p_partkey"))
        .join(perPart, col("l_partkey") === col("pk"))
        .filter(col("l_quantity") < col("qty_cut"))
        .agg(round(sum("l_extendedprice") / 7.0, 2).as("avg_yearly"))
    }),

    // TPC-H Q18: large-volume customers (HAVING-IN over the fact table).
    "q125_tpch_q18" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      val bigOrders = li.groupBy("l_orderkey")
        .agg(sum("l_quantity").as("oq"))
        .filter(col("oq") > 160)
        .select(col("l_orderkey").as("bk"))
      t(s, d, "customer")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"))
        .join(bigOrders, col("o_orderkey") === col("bk"), "left_semi")
        .join(li, col("o_orderkey") === col("l_orderkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate",
          "o_totalprice")
        .agg(round(sum("l_quantity"), 2).as("sum_qty"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
          round(col("o_totalprice"), 2).as("o_totalprice"), col("sum_qty"))
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
        .limit(100)
    }),

    // TPC-H Q22 (adapted: the schema has no c_phone country code —
    // grouped by market segment — and "no orders at all" is empty in the
    // synthetic data, so the anti join excludes RECENT orders instead):
    // wealthy dormant customers; NOT EXISTS anti join with a pushed-down
    // date filter + scalar-subquery threshold.
    "q126_tpch_q22" -> ((s, d) => {
      val cust = t(s, d, "customer")
      val cut = cust.filter(col("c_acctbal") > 0)
        .agg(avg("c_acctbal").as("cut"))
      val recent = t(s, d, "orders")
        .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
      cust
        .join(broadcast(cut))
        .filter(col("c_acctbal") > col("cut"))
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment").as("cntrygrp"))
        .agg(count(lit(1)).as("numcust"),
          round(sum("c_acctbal"), 2).as("totacctbal"))
        .orderBy("cntrygrp")
    }),

    // TPC-H Q21 (adapted: "kept waiting" = shipped >60 days after the
    // order date — the schema has no commit/receipt dates; no
    // nation/status narrowing so the smallest SF keeps rows): suppliers
    // who were the SOLE late supplier on a multi-supplier order. The
    // correlated EXISTS / NOT EXISTS pair decorrelates into two
    // per-order aggregates joined back — supplier breadth ≥ 2 and
    // distinct-late-supplier count = 1 — so the fact table is scanned
    // thrice but never nested-loop probed.
    "q127_tpch_q21" -> ((s, d) => {
      // ONE pass over lineitem: join orders once, collapse to
      // (order, supplier, late-line count), then read supplier breadth
      // and the distinct-late count off an order-partitioned window —
      // no self-join, no second fact scan. numwait = Σ late lines of
      // the sole-late supplier on multi-supplier orders.
      // (l_orderkey, l_suppkey) is ~unique in lineitem (598,807 groups
      // from 600,000 rows at sf0.1), so a map-side partial aggregate
      // combines nothing and just pays a full hash build of the fact
      // table (measured 1.4 s of q127's 2.4 s). Exchanging by
      // l_orderkey FIRST makes the aggregate run in ONE complete pass
      // (hash(l_orderkey) clusters every (l_orderkey, l_suppkey)
      // group) AND hands the window below its required partitioning —
      // two exchanges collapse to one, no partial agg (guide §2.4).
      val perOS = t(s, d, "lineitem")
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .repartition(col("l_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(sum(when(col("l_shipdate") >
          col("o_orderdate") + expr("INTERVAL 60 DAYS"), 1L)
          .otherwise(0L)).as("lateLines"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("l_orderkey")
      perOS
        .withColumn("nsupp", count(lit(1)).over(w))
        .withColumn("nlate",
          sum(when(col("lateLines") > 0, 1L).otherwise(0L)).over(w))
        .filter(col("lateLines") > 0 && col("nsupp") >= 2 &&
          col("nlate") === 1)
        .join(broadcast(t(s, d, "supplier")),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_name")
        .agg(sum("lateLines").as("numwait"))
        .orderBy(desc("numwait"), asc("s_name"))
        .limit(100)
    }))

  val oracleSql: Map[String, String] = Map(
    "q119_tpch_q7" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(year(l_shipdate) AS INTEGER) AS l_year,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN customer ON c_custkey = o_custkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE ((n1.n_name = 'NATION_20' AND n2.n_name = 'NATION_11')
        |    OR (n1.n_name = 'NATION_11' AND n2.n_name = 'NATION_20'))
        |AND l_shipdate >= TIMESTAMP '1995-01-01'
        |AND l_shipdate < TIMESTAMP '1997-01-01'
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    "q120_tpch_q8" ->
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
        |  round(sum(CASE WHEN n2.n_name = 'NATION_3'
        |      THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
        |    / sum(l_extendedprice * (1 - l_discount)), 4) AS mkt_share
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |JOIN region ON n1.n_regionkey = r_regionkey
        |JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |WHERE r_name = 'ASIA' AND p_type = 'STANDARD'
        |AND o_orderdate >= TIMESTAMP '1995-01-01'
        |AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q121_tpch_q13" ->
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
        |  GROUP BY c_custkey) t
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q122_tpch_q14" ->
      """SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
        |    THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
        |  / sum(l_extendedprice * (1 - l_discount)), 2) AS promo_revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1995-09-01'
        |AND l_shipdate < TIMESTAMP '1995-10-01'""".stripMargin,

    "q123_tpch_q15" ->
      """WITH revenue AS (
        |  SELECT l_suppkey AS supplier_no,
        |    round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM supplier JOIN revenue ON s_suppkey = supplier_no
        |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
        |ORDER BY s_suppkey""".stripMargin,

    "q124_tpch_q17" ->
      """SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
        |FROM lineitem
        |JOIN part ON p_partkey = l_partkey
        |JOIN (SELECT l_partkey AS pk, 0.2 * avg(l_quantity) AS qty_cut
        |      FROM lineitem GROUP BY l_partkey) pp ON l_partkey = pp.pk
        |WHERE p_brand = 'Brand#3' AND l_quantity < qty_cut""".stripMargin,

    "q125_tpch_q18" ->
      """SELECT c_name, c_custkey, o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
        |  round(o_totalprice, 2) AS o_totalprice,
        |  round(sum(l_quantity), 2) AS sum_qty
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderkey IN (
        |  SELECT l_orderkey FROM lineitem
        |  GROUP BY l_orderkey HAVING sum(l_quantity) > 160)
        |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        |ORDER BY round(o_totalprice, 2) DESC, o_orderkey ASC
        |LIMIT 100""".stripMargin,

    "q126_tpch_q22" ->
      """SELECT c_mktsegment AS cntrygrp, count(*) AS numcust,
        |  round(sum(c_acctbal), 2) AS totacctbal
        |FROM customer
        |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
        |                   WHERE c_acctbal > 0)
        |AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                AND o_orderdate >= TIMESTAMP '2000-01-01')
        |GROUP BY c_mktsegment ORDER BY cntrygrp""".stripMargin,

    "q127_tpch_q21" ->
      """SELECT s_name, count(*) AS numwait
        |FROM supplier
        |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        |JOIN orders ON o_orderkey = l1.l_orderkey
        |WHERE l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
        |AND EXISTS (SELECT 1 FROM lineitem l2
        |  WHERE l2.l_orderkey = l1.l_orderkey
        |  AND l2.l_suppkey <> l1.l_suppkey)
        |AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |  WHERE l3.l_orderkey = l1.l_orderkey
        |  AND l3.l_suppkey <> l1.l_suppkey
        |  AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY s_name ORDER BY numwait DESC, s_name ASC
        |LIMIT 100""".stripMargin)
}
