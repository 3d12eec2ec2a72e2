package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Complex-type functions (arrays/structs/lambdas), explode/re-aggregate
  * round-trips, and the SQL entry point (CTE / HAVING / correlated and
  * scalar subqueries) — SURVEY §2B B20 beyond scalars.
  */
object Complex {

  private def t(s: SparkSession, d: String, n: String) = Tables.load(s, d, n)

  /** SQL entry point: same text runs in Spark (over temp views) and in
    * DuckDB (over the parquet files) — dialect-shared subset.
    */
  private def sql(s: SparkSession, d: String, query: String): DataFrame = {
    Tables.registerAll(s, d)
    s.sql(query)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Array functions over the embedding vectors (quantized to int64 so
    // every value compares exactly across engines).
    "q57_array_funcs" -> ((s, d) =>
      t(s, d, "embeddings")
        .withColumn("qvec", expr(
          "transform(embedding, x -> CAST(floor(x * 1000) AS BIGINT))"))
        .select(
          col("vec_id"),
          size(col("qvec")).as("dim"),
          expr("array_max(qvec)").as("vmax"),
          expr("array_min(qvec)").as("vmin"),
          expr("size(filter(qvec, x -> x > 0))").as("n_pos"),
          expr("aggregate(qvec, 0L, (a, x) -> a + abs(x))").as("l1_norm"),
          expr("array_join(transform(slice(sort_array(qvec, false), 1, 3), " +
            "x -> CAST(x AS STRING)), ',')").as("top3"))
        .orderBy("vec_id")),

    // Struct building + array-of-struct sort + lambda flattening: per
    // returnflag, an ordered "linestatus:count" digest string.
    "q58_struct_digest" -> ((s, d) =>
      t(s, d, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("cnt"))
        .groupBy("l_returnflag")
        .agg(expr(
          "array_join(transform(sort_array(collect_list(" +
            "struct(l_linestatus, cnt))), " +
            "s -> concat(s.l_linestatus, ':', CAST(s.cnt AS STRING))), ',')")
          .as("status_digest"))
        .orderBy("l_returnflag")),

    // Explode / re-aggregate round-trip: global top-10 words by frequency.
    "q59_explode_words" -> ((s, d) =>
      t(s, d, "documents")
        .select(explode(split(col("text"), " ")).as("word"))
        .filter(length(col("word")) > 0)
        .groupBy("word")
        .agg(count(lit(1)).as("cnt"))
        .orderBy(desc("cnt"), asc("word"))
        .limit(10)),

    // Custom Generator (UDTF): tokenize fans out rows inside the scan
    // stage; re-aggregate positions + boundary tokens per document. A
    // zero-token document (e.g. whitespace-only text) emits no generator
    // rows, so the aggregate is left-joined back to `documents` and
    // count/chars coalesce to 0 — the doc row survives, matching the
    // oracle (which emits len=0 / NULL boundary tokens for it).
    "q66_tokenize_udtf" -> ((s, d) => {
      val toks = t(s, d, "documents")
        .select(col("doc_id"),
          graft.functions.Tokenize.tokenize(col("text")).as(Seq("pos", "token")))
        .groupBy("doc_id")
        .agg(
          count(lit(1)).as("tok_n"),
          min(expr("IF(pos = 0, token, NULL)")).as("first_token"),
          max(expr("struct(pos, token)")).getField("token").as("last_token"),
          sum(length(col("token"))).as("tok_chars"))
      t(s, d, "documents").select(col("doc_id"))
        .join(toks, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("tok_n"), lit(0L)).as("n_tokens"),
          col("first_token"), col("last_token"),
          coalesce(col("tok_chars"), lit(0L)).as("token_chars"))
        .orderBy("doc_id")
    }),

    // SQL entry: CTE + HAVING + scalar subquery.
    "q60_cte_having" -> ((s, d) => sql(s, d,
      """WITH brand_stats AS (
        |  SELECT p_brand, avg(p_retailprice) AS avg_price,
        |         count(*) AS n_parts
        |  FROM part GROUP BY p_brand
        |)
        |SELECT p_brand, round(avg_price, 2) AS avg_price, n_parts
        |FROM brand_stats
        |WHERE avg_price > (SELECT avg(p_retailprice) FROM part)
        |ORDER BY p_brand""".stripMargin)),

    // SQL entry: correlated EXISTS + NOT EXISTS.
    "q61_exists_correlated" -> ((s, d) => sql(s, d,
      """SELECT c_custkey, c_name
        |FROM customer
        |WHERE EXISTS (
        |    SELECT 1 FROM orders
        |    WHERE o_custkey = c_custkey AND o_totalprice > 300000)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM orders
        |    WHERE o_custkey = c_custkey AND o_orderstatus = 'F'
        |      AND o_totalprice < 50000)
        |ORDER BY c_custkey""".stripMargin))
  )

  val oracleSql: Map[String, String] = Map(
    "q57_array_funcs" ->
      """WITH q AS (SELECT vec_id,
        |  list_transform(embedding, x -> CAST(floor(x * 1000) AS BIGINT))
        |    AS qvec FROM embeddings)
        |SELECT vec_id,
        |  CAST(len(qvec) AS INTEGER) AS dim,
        |  list_max(qvec) AS vmax,
        |  list_min(qvec) AS vmin,
        |  CAST(len(list_filter(qvec, x -> x > 0)) AS INTEGER) AS n_pos,
        |  CAST(list_sum(list_transform(qvec, x -> abs(x))) AS BIGINT)
        |    AS l1_norm,
        |  array_to_string(list_transform(
        |    list_slice(list_reverse_sort(qvec), 1, 3),
        |    x -> CAST(x AS VARCHAR)), ',') AS top3
        |FROM q ORDER BY vec_id""".stripMargin,

    "q58_struct_digest" ->
      """WITH c AS (
        |  SELECT l_returnflag, l_linestatus, count(*) AS cnt
        |  FROM lineitem GROUP BY l_returnflag, l_linestatus)
        |SELECT l_returnflag,
        |  string_agg(l_linestatus || ':' || CAST(cnt AS VARCHAR), ','
        |    ORDER BY l_linestatus) AS status_digest
        |FROM c GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q59_explode_words" ->
      """SELECT word, count(*) AS cnt FROM (
        |  SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |WHERE length(word) > 0
        |GROUP BY word ORDER BY cnt DESC, word ASC LIMIT 10""".stripMargin,

    "q66_tokenize_udtf" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |    regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')
        |      AS tokens
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(tokens) AS BIGINT) AS n_tokens,
        |  tokens[1] AS first_token,
        |  tokens[-1] AS last_token,
        |  COALESCE(CAST(list_sum(list_transform(tokens, t -> length(t)))
        |    AS BIGINT), 0) AS token_chars
        |FROM tok ORDER BY doc_id""".stripMargin,

    "q60_cte_having" ->
      """WITH brand_stats AS (
        |  SELECT p_brand, avg(p_retailprice) AS avg_price,
        |         count(*) AS n_parts
        |  FROM part GROUP BY p_brand
        |)
        |SELECT p_brand, round(avg_price, 2) AS avg_price, n_parts
        |FROM brand_stats
        |WHERE avg_price > (SELECT avg(p_retailprice) FROM part)
        |ORDER BY p_brand""".stripMargin,

    "q61_exists_correlated" ->
      """SELECT c_custkey, c_name
        |FROM customer
        |WHERE EXISTS (
        |    SELECT 1 FROM orders
        |    WHERE o_custkey = c_custkey AND o_totalprice > 300000)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM orders
        |    WHERE o_custkey = c_custkey AND o_orderstatus = 'F'
        |      AND o_totalprice < 50000)
        |ORDER BY c_custkey""".stripMargin
  )
}
