package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** LLM-training-data text pipeline: deduplication and text analysis over
  * the `documents` table.
  *
  * All queries here are pure `functions._`/lambda expressions (no UDFs) so
  * they stay inside whole-stage codegen, and every one has a DuckDB oracle.
  *
  * Scale notes (100 TB):
  * - exact dedup is a single hash shuffle on the text digest (not the full
  *   text) — group keys stay 16 bytes regardless of document size;
  * - n-gram Jaccard explodes shingles and self-joins on the shingle — the
  *   canonical inverted-index join; the shingle shuffle dominates but
  *   partitions by shingle hash, so it parallelizes linearly and AQE
  *   handles hot shingles (stopword runs) via skew-join splitting. The
  *   `groupBy(shingle)` pair-count is map-side combinable.
  * - thresholds compare as exact integer arithmetic (inter*10 >= union*8)
  *   so engine float rounding can never flip a pair in or out.
  */
object TextOps {

  private def docs(s: SparkSession, d: String) = Tables.load(s, d, "documents")

  /** doc_id + distinct word-3-gram shingle set, one row per shingle. */
  private[queries] def shingles(s: SparkSession, d: String): DataFrame =
    docs(s, d)
      .withColumn("words", split(col("text"), " "))
      .filter(size(col("words")) >= 3)
      .withColumn("shingle", explode(array_distinct(expr(
        "transform(sequence(0, size(words)-3)," +
          " i -> concat_ws(' ', slice(words, i+1, 3)))"))))
      .select("doc_id", "shingle")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact dedup: group by content digest, keep the smallest doc_id as
    // the canonical representative (16-byte keys — never shuffles text).
    "q40_dedup_exact" -> ((s, d) =>
      docs(s, d)
        .groupBy(md5(col("text")).as("digest"))
        .agg(min("doc_id").as("keep_id"), count(lit(1)).as("copies"))
        .select("keep_id", "copies")
        .orderBy("keep_id")),

    // N-gram Jaccard near-dup pairs: inverted-index self-join on 3-gram
    // shingles, exact |A∩B| / |A∪B| >= 0.8 by integer arithmetic.
    //
    // Scale hardening (both deterministic, both mirrored in the oracle /
    // value-neutral):
    // 1. DOCUMENT-FREQUENCY CUTOFF: shingles present in more than
    //    max(50, N/10) documents (stopword runs, boilerplate) carry ~no
    //    similarity signal at J>=0.8 but dominate the pair blowup —
    //    dropping them from the shingle universe bounds candidate pairs
    //    at |shingles|·(N/10)²/2 instead of unbounded. The Jaccard is
    //    exact over the filtered universe, and the SAME filter runs in
    //    DuckDB, so the hash check stays authoritative.
    // 2. DENSE INT SHINGLE IDS: the DF aggregate (needed anyway) doubles
    //    as a dictionary; the self-join then shuffles (doc_id, sid int)
    //    rows — ~2.5× fewer shuffle bytes than string shingles. The
    //    row_number dictionary is fine at this dictionary size; a
    //    100 TB corpus would zipWithIndex the dictionary instead of a
    //    global-order window.
    "q41_dedup_ngram_jaccard" -> ((s, d) => {
      val sh0 = shingles(s, d)
      // threshold resolved up front (a parquet-stats count, one tiny job)
      // so the main plan filters on a literal — no scalar join node
      val tau = math.max(50L, docs(s, d).count() / 10)
      val keep = sh0.groupBy("shingle").agg(count(lit(1)).as("df"))
        .filter(col("df") <= lit(tau))
        .withColumn("sid", row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy("shingle")))
        .select("shingle", "sid")
      val sh = sh0.join(keep, "shingle").select(col("doc_id"), col("sid"))
      val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val pairs = sh.as("a")
        .join(sh.as("b"),
          col("a.sid") === col("b.sid") &&
            col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
        .agg(count(lit(1)).as("inter"))
      pairs
        .join(sizes.as("za"), col("id_a") === col("za.doc_id"))
        .join(sizes.as("zb"), col("id_b") === col("zb.doc_id"))
        .withColumn("un", col("za.n") + col("zb.n") - col("inter"))
        .filter(col("inter") * 10 >= col("un") * 8) // J >= 0.8, exact
        .select(col("id_a"), col("id_b"),
          round(col("inter").cast("double") / col("un"), 4).as("jaccard"))
        .orderBy("id_a", "id_b")
    }),

    // Language ID: stopword-marker n-gram heuristic (argmax of per-language
    // marker-word hit counts; 'und' when nothing matches).
    "q42_lang_id" -> ((s, d) =>
      docs(s, d)
        .withColumn("words", split(col("text"), " "))
        .withColumn("en_hits", expr(
          "size(filter(words, w -> w IN ('the','a','of','and','to')))"))
        .withColumn("es_hits", expr(
          "size(filter(words, w -> w IN ('el','la','de','y','que')))"))
        .withColumn("de_hits", expr(
          "size(filter(words, w -> w IN ('der','die','das','und','ist')))"))
        .withColumn("pred_lang",
          when(col("en_hits") >= col("es_hits") &&
               col("en_hits") >= col("de_hits") && col("en_hits") > 0, "en")
          .when(col("es_hits") >= col("de_hits") && col("es_hits") > 0, "es")
          .when(col("de_hits") > 0, "de")
          .otherwise("und"))
        .groupBy("pred_lang", "lang")
        .agg(count(lit(1)).as("cnt"))
        .orderBy("pred_lang", "lang")),

    // Quality scoring: length / word stats / stopword ratio → score.
    // The score is computed in scaled INTEGER arithmetic (×10000, integer
    // div) — float rounding at a .5 tie must never flip the 4th decimal
    // between engines.
    "q43_text_quality" -> ((s, d) =>
      docs(s, d)
        .withColumn("words", split(col("text"), " "))
        .withColumn("n_words", size(col("words")))
        .withColumn("n_stop", expr(
          "size(filter(words, w -> w IN " +
            "('the','a','of','and','to','in','is')))"))
        .withColumn("chars", length(col("text")))
        .withColumn("n_digit", col("chars") -
          length(regexp_replace(col("text"), "[0-9]", "")))
        .withColumn("avg_word_len", round(
          expr("aggregate(words, 0L, (a, w) -> a + length(w))")
            .cast("double") / col("n_words"), 4))
        .withColumn("stop_ratio", round(
          col("n_stop").cast("double") / col("n_words"), 4))
        .withColumn("digit_ratio", round(
          col("n_digit").cast("double") / col("chars"), 4))
        .withColumn("quality_score", expr(
          "CAST(40 * least(n_words, 100)" +
            " + (3000 * (n_words - n_stop)) div n_words" +
            " + (3000 * (chars - n_digit)) div chars AS DOUBLE)" +
            " / CAST(10000 AS DOUBLE)"))
        .select("doc_id", "n_words", "avg_word_len", "stop_ratio",
          "digit_ratio", "quality_score")
        .orderBy("doc_id")),

    // Token counting: whitespace tokens + BPE-ish regex tokens.
    "q44_token_count" -> ((s, d) =>
      docs(s, d)
        .select(
          col("doc_id"),
          size(split(col("text"), " ")).as("ws_tokens"),
          size(regexp_extract_all(col("text"),
            lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))).as("bpe_tokens"),
          length(col("text")).as("chars"))
        .orderBy("doc_id")),

    // TF-IDF: corpus-wide document frequencies (one small aggregate,
    // broadcast back) + per-doc term frequencies → top-scored term per
    // document. ln() on identical doubles is IEEE-deterministic, so the
    // oracle matches bit-for-bit.
    "q46b_tfidf_top_term" -> ((s, d) => {
      val words = docs(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
        .filter(length(col("word")) > 0)
      val n = docs(s, d).count()
      val dfreq = words.select("doc_id", "word").distinct()
        .groupBy("word").agg(count(lit(1)).as("df"))
      val tf = words.groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy(desc("score"), asc("word"))
      tf.join(broadcast(dfreq), "word")
        .withColumn("score",
          col("tf") * log(lit(n.toDouble) / col("df")))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("word").as("top_word"),
          round(col("score"), 4).as("tfidf"))
        .orderBy("doc_id")
    }),

    // Document fingerprint: rolling polynomial hash over words
    // (order-sensitive, mod 1e9+7 each step so i64 never overflows).
    "q45_fingerprint" -> ((s, d) =>
      docs(s, d)
        .withColumn("words", split(col("text"), " "))
        .withColumn("fp", expr(
          "aggregate(words, 0L, (acc, w) -> " +
            "pmod(acc * 31 + length(w) * 7 + ascii(substring(w, 1, 1)), " +
            "1000000007L))"))
        .groupBy("source")
        .agg(
          count(lit(1)).as("cnt"),
          countDistinct(col("fp")).as("distinct_fp"),
          min("fp").as("min_fp"))
        .orderBy("source"))
  )

  val oracleSql: Map[String, String] = Map(
    "q40_dedup_exact" ->
      """SELECT min(doc_id) AS keep_id, count(*) AS copies
        |FROM documents GROUP BY md5(text) ORDER BY keep_id""".stripMargin,

    "q41_dedup_ngram_jaccard" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS words
        |           FROM documents),
        |sh AS (SELECT doc_id, list_distinct(list_transform(
        |         range(1, len(words) - 1),
        |         i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]))
        |         AS shingles
        |       FROM w WHERE len(words) >= 3),
        |e0 AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
        |tau AS (SELECT greatest(50, count(*) // 10) AS tau FROM w),
        |df AS (SELECT shingle, count(*) AS df FROM e0 GROUP BY 1),
        |e AS (SELECT e0.doc_id, e0.shingle FROM e0
        |      JOIN df ON df.shingle = e0.shingle, tau
        |      WHERE df.df <= tau.tau),
        |sz AS (SELECT doc_id, count(*) AS n FROM e GROUP BY 1),
        |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        |      FROM e a JOIN e b
        |      ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |      GROUP BY 1, 2)
        |SELECT id_a, id_b,
        |  round(inter * 1.0 / (za.n + zb.n - inter), 4) AS jaccard
        |FROM p JOIN sz za ON za.doc_id = id_a
        |JOIN sz zb ON zb.doc_id = id_b
        |WHERE inter * 10 >= (za.n + zb.n - inter) * 8
        |ORDER BY id_a, id_b""".stripMargin,

    "q42_lang_id" ->
      """WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS words
        |           FROM documents),
        |h AS (SELECT doc_id, lang,
        |  len(list_filter(words,
        |    w -> list_contains(['the','a','of','and','to'], w))) AS en_hits,
        |  len(list_filter(words,
        |    w -> list_contains(['el','la','de','y','que'], w))) AS es_hits,
        |  len(list_filter(words,
        |    w -> list_contains(['der','die','das','und','ist'], w))) AS de_hits
        |  FROM t)
        |SELECT CASE
        |    WHEN en_hits >= es_hits AND en_hits >= de_hits AND en_hits > 0
        |      THEN 'en'
        |    WHEN es_hits >= de_hits AND es_hits > 0 THEN 'es'
        |    WHEN de_hits > 0 THEN 'de'
        |    ELSE 'und' END AS pred_lang,
        |  lang, count(*) AS cnt
        |FROM h GROUP BY pred_lang, lang ORDER BY pred_lang, lang""".stripMargin,

    "q43_text_quality" ->
      """WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS words
        |           FROM documents),
        |m AS (SELECT doc_id, text, words,
        |  CAST(len(words) AS INTEGER) AS n_words,
        |  CAST(len(list_filter(words, w -> list_contains(
        |    ['the','a','of','and','to','in','is'], w))) AS BIGINT) AS n_stop,
        |  CAST(length(text) AS BIGINT) AS chars,
        |  CAST(length(text) -
        |    length(regexp_replace(text, '[0-9]', '', 'g')) AS BIGINT)
        |    AS n_digit,
        |  round(CAST(list_sum(list_transform(words, w -> length(w)))
        |    AS DOUBLE) / len(words), 4) AS avg_word_len
        |  FROM t)
        |SELECT doc_id, n_words, avg_word_len,
        |  round(CAST(n_stop AS DOUBLE) / n_words, 4) AS stop_ratio,
        |  round(CAST(n_digit AS DOUBLE) / chars, 4) AS digit_ratio,
        |  CAST(40 * least(n_words, 100)
        |    + (3000 * (n_words - n_stop)) // n_words
        |    + (3000 * (chars - n_digit)) // chars AS DOUBLE) / 10000.0
        |    AS quality_score
        |FROM m ORDER BY doc_id""".stripMargin,

    "q44_token_count" ->
      """SELECT doc_id,
        |CAST(len(string_split(text, ' ')) AS INTEGER) AS ws_tokens,
        |CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))
        |  AS INTEGER) AS bpe_tokens,
        |CAST(length(text) AS INTEGER) AS chars
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q46b_tfidf_top_term" ->
      """WITH words AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS word
        |  FROM documents),
        |w2 AS (SELECT doc_id, word FROM words WHERE length(word) > 0),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |dfreq AS (
        |  SELECT word, count(*) AS df
        |  FROM (SELECT DISTINCT doc_id, word FROM w2) GROUP BY word),
        |tf AS (SELECT doc_id, word, count(*) AS tf FROM w2 GROUP BY 1, 2),
        |scored AS (
        |  SELECT tf.doc_id, tf.word,
        |    tf.tf * ln(CAST(n.n_docs AS DOUBLE) / dfreq.df) AS score
        |  FROM tf JOIN dfreq USING (word) CROSS JOIN n),
        |ranked AS (
        |  SELECT doc_id, word, score, row_number() OVER (
        |    PARTITION BY doc_id ORDER BY score DESC, word ASC) AS rn
        |  FROM scored)
        |SELECT doc_id, word AS top_word, round(score, 4) AS tfidf
        |FROM ranked WHERE rn = 1 ORDER BY doc_id""".stripMargin,

    "q45_fingerprint" ->
      """WITH f AS (SELECT doc_id, source,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(string_split(text, ' '),
        |      w -> CAST(length(w) * 7 + ascii(substring(w, 1, 1)) AS BIGINT))),
        |    (acc, t) -> (acc * 31 + t) % 1000000007) AS fp
        |  FROM documents)
        |SELECT source, count(*) AS cnt,
        |  count(DISTINCT fp) AS distinct_fp, min(fp) AS min_fp
        |FROM f GROUP BY source ORDER BY source""".stripMargin
  )
}
