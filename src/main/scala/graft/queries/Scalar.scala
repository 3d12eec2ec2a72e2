package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar-function surface (SURVEY.md §2B B20): string, date/time, math,
  * conditional, and JSON functions — all `org.apache.spark.sql.functions`
  * built-ins, fully inside whole-stage codegen (no UDFs in the hot path).
  */
object Scalar {

  private def t(s: SparkSession, d: String, n: String) = Tables.load(s, d, n)

  // Function-scan cores without the oracle-determinism ORDER BY — the
  // `queries` entries wrap these with a total sort (the driver's compare
  // is row-order-sensitive); `Bench` times the cores, since a full sort
  // of the whole output is verification scaffolding, not the operation.
  private[graft] def q33Core(s: SparkSession, d: String): DataFrame =
    t(s, d, "part")
      .select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_upper"),
        lower(col("p_type")).as("type_lower"),
        length(col("p_name")).as("name_len"),
        substring(col("p_name"), 1, 5).as("name_pfx"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        regexp_replace(col("p_name"), "[aeiou]", "_").as("name_novowel"),
        trim(col("p_name")).as("name_trim"))

  private[graft] def q34Core(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("dom"),
        quarter(col("o_orderdate")).as("qtr"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("iso_date"),
        datediff(lit("1999-01-01").cast("date"), col("o_orderdate").cast("date"))
          .as("days_to_1999"))

  private[graft] def q35Core(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .select(
        col("l_orderkey"), col("l_linenumber"),
        round(abs(col("l_discount") - 0.05), 4).as("abs_disc"),
        ceil(col("l_quantity")).as("ceil_qty"),
        floor(col("l_extendedprice")).as("floor_price"),
        round(sqrt(col("l_quantity")), 4).as("sqrt_qty"),
        round(ln(col("l_extendedprice") + 1), 4).as("ln_price"),
        round(pow(col("l_tax") + 1, 2), 4).as("tax_sq"),
        pmod(col("l_partkey"), lit(97)).as("pk_mod"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // String functions over part names.
    "q33_string_funcs" -> ((s, d) => q33Core(s, d).orderBy("p_partkey")),

    // Date/time functions over order dates.
    "q34_date_funcs" -> ((s, d) => q34Core(s, d).orderBy("o_orderkey")),

    // Math functions over lineitem numerics.
    "q35_math_funcs" -> ((s, d) =>
      q35Core(s, d)
        // (l_orderkey, l_linenumber) is NOT unique in the synthetic data —
        // total order needs every output column
        .orderBy("l_orderkey", "l_linenumber", "abs_disc", "ceil_qty",
          "floor_price", "sqrt_qty", "ln_price", "tax_sq", "pk_mod")),

    // CASE WHEN / conditional logic + greatest/least.
    "q36_case_expr" -> ((s, d) =>
      t(s, d, "orders")
        .select(
          col("o_orderkey"),
          when(col("o_totalprice") > 300000, "high")
            .when(col("o_totalprice") > 100000, "mid")
            .otherwise("low").as("price_band"),
          greatest(col("o_totalprice"), lit(50000.0)).as("floor_50k"),
          least(col("o_totalprice"), lit(400000.0)).as("cap_400k"))
        .groupBy("price_band")
        .agg(
          count(lit(1)).as("cnt"),
          round(sum("floor_50k"), 2).as("sum_floor"),
          round(sum("cap_400k"), 2).as("sum_cap"))
        .orderBy("price_band")),

    // JSON extraction from the events.props payload.
    "q37_json_funcs" -> ((s, d) =>
      t(s, d, "events")
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .groupBy(pmod(col("k"), lit(10)).as("k_bucket"))
        .agg(count(lit(1)).as("cnt"), sum("k").as("sum_k"))
        .orderBy("k_bucket"))
  )

  val oracleSql: Map[String, String] = Map(
    "q33_string_funcs" ->
      """SELECT p_partkey,
        |upper(p_brand) AS brand_upper, lower(p_type) AS type_lower,
        |CAST(length(p_name) AS INTEGER) AS name_len,
        |substring(p_name, 1, 5) AS name_pfx,
        |concat_ws('|', p_brand, p_type) AS brand_type,
        |regexp_replace(p_name, '[aeiou]', '_', 'g') AS name_novowel,
        |trim(p_name) AS name_trim
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q34_date_funcs" ->
      """SELECT o_orderkey,
        |CAST(year(o_orderdate) AS INTEGER) AS yr,
        |CAST(month(o_orderdate) AS INTEGER) AS mo,
        |CAST(day(o_orderdate) AS INTEGER) AS dom,
        |CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
        |strftime(o_orderdate, '%Y-%m-%d') AS iso_date,
        |CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1999-01-01')
        |  AS INTEGER) AS days_to_1999
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q35_math_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        |round(abs(l_discount - 0.05), 4) AS abs_disc,
        |CAST(ceil(l_quantity) AS BIGINT) AS ceil_qty,
        |CAST(floor(l_extendedprice) AS BIGINT) AS floor_price,
        |round(sqrt(l_quantity), 4) AS sqrt_qty,
        |round(ln(l_extendedprice + 1), 4) AS ln_price,
        |round(pow(l_tax + 1, 2), 4) AS tax_sq,
        |l_partkey % 97 AS pk_mod
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, abs_disc,
        |ceil_qty, floor_price, sqrt_qty, ln_price, tax_sq, pk_mod""".stripMargin,

    "q36_case_expr" ->
      """SELECT price_band, count(*) AS cnt,
        |round(sum(floor_50k), 2) AS sum_floor,
        |round(sum(cap_400k), 2) AS sum_cap FROM (
        |  SELECT o_orderkey,
        |    CASE WHEN o_totalprice > 300000 THEN 'high'
        |         WHEN o_totalprice > 100000 THEN 'mid'
        |         ELSE 'low' END AS price_band,
        |    greatest(o_totalprice, 50000.0) AS floor_50k,
        |    least(o_totalprice, 400000.0) AS cap_400k
        |  FROM orders)
        |GROUP BY price_band ORDER BY price_band""".stripMargin,

    "q37_json_funcs" ->
      """SELECT k % 10 AS k_bucket, count(*) AS cnt,
        |CAST(sum(k) AS BIGINT) AS sum_k FROM (
        |  SELECT event_id,
        |    CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
        |  FROM events)
        |GROUP BY k_bucket ORDER BY k_bucket""".stripMargin
  )
}
