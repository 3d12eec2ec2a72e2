package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-corpus curation operators beyond dedup/quality (q40–q50):
  * deterministic split assignment, benchmark decontamination, domain
  * mixture capping, and DF-based stopword scrubbing.
  *
  * All four are pure `functions._` plans (whole-stage codegen, no UDFs)
  * with exact DuckDB oracles. Scale notes per query in the comments —
  * the common theme: the document TEXT shuffles at most once, and every
  * corpus-wide statistic (stopword set, eval shingle set) is a small
  * aggregate broadcast back, never a driver collect.
  */
object CurationOps {

  private def docs(s: SparkSession, d: String) = Tables.load(s, d, "documents")

  /** Distributed global prefix sum over `order` — the two-pass form a
    * single-partition `Window.orderBy` demo collapses to at scale:
    * (1) per-bucket subtotals (≤ bucket-count rows, collected and turned
    * into running offsets), (2) a PARTITIONED window within each bucket
    * plus the broadcast bucket offset. The bucket is a PURE FUNCTION of
    * the ordering key (not `spark_partition_id` after a sampled range
    * shuffle), so both passes see identical assignment by construction
    * and the plan carries no single-partition WindowExec.
    *
    * `bucket` must be monotone in `order` (bucket boundaries respect the
    * global order) and Int-typed; `value` must be Long-typed.
    */
  private[queries] def prefixSumByBucket(df: DataFrame, bucket: org.apache.spark.sql.Column,
      order: String, value: org.apache.spark.sql.Column, out: String): DataFrame = {
    val s = df.sparkSession
    val withB = df.withColumn("_bkt", bucket)
    val subs = withB.groupBy("_bkt").agg(sum(value).as("_t"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offs = subs.map { case (b, t) => val o = acc; acc += t; (b, o) }
    val offDf = s.createDataFrame(
      java.util.Arrays.asList(offs.map(p => org.apache.spark.sql.Row(p._1, p._2)): _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("_bkt",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("_off",
          org.apache.spark.sql.types.LongType, nullable = false))))
    val w = Window.partitionBy("_bkt").orderBy(order)
      .rowsBetween(Window.unboundedPreceding, -1)
    withB.join(broadcast(offDf), Seq("_bkt"))
      .withColumn(out, coalesce(sum(value).over(w), lit(0L)) + col("_off"))
      .drop("_bkt", "_off")
  }

  /** Per-doc quality ×10000 in pure integer math — the q43/q74 formula. */
  private def withQInt(df: DataFrame): DataFrame = df
    .withColumn("words", split(col("text"), " "))
    .withColumn("n_words", size(col("words")))
    .withColumn("n_stop", expr(
      "size(filter(words, w -> w IN ('the','a','of','and','to','in','is')))"))
    .withColumn("chars", length(col("text")))
    .withColumn("n_digit", col("chars") -
      length(regexp_replace(col("text"), "[0-9]", "")))
    .withColumn("q_int", expr(
      "CAST(40 * least(n_words, 100)" +
        " + (3000 * (n_words - n_stop)) div n_words" +
        " + (3000 * (chars - n_digit)) div chars AS BIGINT)"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Deterministic train/val/test assignment: bucket 0..99 derived from
    // md5(doc_id) — content-independent, stable across runs/engines, and
    // embarrassingly parallel (a pure per-row expression; the only
    // shuffle is the tiny per-(split, source) report). This is how a
    // 100 TB corpus gets split: no RNG state, no global sort, any
    // executor can re-derive any row's split.
    "q76_split_assign" -> ((s, d) =>
      docs(s, d)
        .withColumn("h", md5(col("doc_id").cast("string")))
        .withColumn("bucket", pmod(
          ascii(substring(col("h"), 1, 1)) * 31 +
            ascii(substring(col("h"), 2, 1)), lit(100)))
        .withColumn("split",
          when(col("bucket") < 80, "train")
            .when(col("bucket") < 90, "val")
            .otherwise("test"))
        .withColumn("n_words", size(split(col("text"), " ")))
        .groupBy("split", "source")
        .agg(count(lit(1)).as("docs"),
          sum(col("n_words").cast("long")).as("total_words"))
        .orderBy("split", "source")),

    // Benchmark decontamination: flag training documents sharing 3-gram
    // shingles with a held-out eval set (doc_id % 20 == 0 stands in for
    // the benchmark). The eval shingle set is DISTINCT'd and broadcast —
    // eval sets are small by construction (thousands of docs), so a
    // 100 TB training corpus is checked in ONE scan + map-side hash
    // probe; no self-join, no shuffle of the corpus shingles beyond the
    // per-doc overlap count. Threshold is exact integer arithmetic.
    "q77_decontam" -> ((s, d) => {
      val sh = TextOps.shingles(s, d)
      val evalSh = sh.filter(col("doc_id") % 20 === 0)
        .select("shingle").distinct()
      val train = sh.filter(col("doc_id") % 20 =!= 0)
      val sizes = train.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
      val shared = train.join(broadcast(evalSh), "shingle")
        .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
      sizes.join(shared, Seq("doc_id"), "left")
        .withColumn("n_shared", coalesce(col("n_shared"), lit(0L)))
        .withColumn("contaminated", col("n_shared") * 5 >= col("n_sh"))
        .select("doc_id", "n_sh", "n_shared", "contaminated")
        .orderBy("doc_id")
    }),

    // Domain mixture capping: keep the top-8 documents per (lang, source)
    // domain by quality score, deterministic tie-break on doc_id — the
    // "cap each domain's contribution" step of corpus mixing. The window
    // shuffles by domain key; at 100 TB with a mega-domain the same
    // result comes from a partial top-K aggregate (bounded heap per
    // partition, then merge) — rank output here keeps the oracle exact.
    "q78_domain_cap" -> ((s, d) => {
      val w = Window.partitionBy("lang", "source")
        .orderBy(desc("q_int"), asc("doc_id"))
      withQInt(docs(s, d))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 8)
        .withColumn("quality", round(
          col("q_int").cast("double") / lit(10000).cast("double"), 4))
        .select("lang", "source", "rnk", "doc_id", "quality")
        .orderBy("lang", "source", "rnk")
    }),

    // Sequence packing (training-prep): concatenate the corpus in stable
    // doc_id order and assign each document to the 4096-token training
    // sequence its first token lands in — the bookkeeping a packed-
    // pretraining dataloader needs. Runs as a two-pass distributed
    // prefix sum: doc_id range buckets (from one min/max stats job) →
    // per-bucket subtotals → partitioned window + broadcast offsets.
    // No single-partition WindowExec anywhere in the plan.
    "q85_sequence_packing" -> ((s, d) => {
      val t = docs(s, d)
        .withColumn("tokens", size(split(col("text"), " ")).cast("long"))
      val r = t.agg(min("doc_id"), max("doc_id")).head
      // empty corpus: null bounds — any bucket constant keeps the plan
      // valid and the result correctly empty (the old global-window form
      // also returned empty)
      val (lo, hi) =
        if (r.isNullAt(0)) (0L, 0L) else (r.getLong(0), r.getLong(1))
      // span in BigInt: hi - lo + 1 overflows Long for full-range ids
      val spanBig = (BigInt(hi) - BigInt(lo) + 1).max(1)
      // bucket count scales with the cluster, not a constant: a fixed 32
      // would cap the window stage at 32 tasks on a 1000-executor
      // cluster. Offsets stay driver-tiny (one row per bucket).
      val nb = spanBig.min(BigInt(
        math.max(32, s.sparkContext.defaultParallelism * 2L))).toInt
      // divide FIRST: width = ceil(span/nb), bucket = (doc_id-lo) div
      // width. The old (doc_id-lo)*nb/span form overflowed Long for
      // snowflake/hash-style id spans (span > 2^63/nb) and went through
      // a double division (53-bit mantissa) — both silently non-monotone.
      val width = ((spanBig + nb - 1) / nb).max(1)
      // lo == Long.MinValue must take the decimal branch even when the
      // span fits in Long: the interpolated "-9223372036854775808L" is
      // tokenized by Spark's parser as unary minus + an overflowing
      // bigint literal and fails at parse time (oversized bare integral
      // literals in the decimal branch parse as decimal and are exact).
      val bucket =
        if (spanBig <= BigInt(Long.MaxValue) && lo != Long.MinValue)
          least(lit(nb - 1),
            expr(s"int((doc_id - (${lo}L)) div ${width.toLong}L)"))
        else // full 64-bit span: even the subtraction wraps — exact in
          // decimal(38,0), still a pure per-row expression
          least(lit(nb - 1), expr(
            s"int(floor((cast(doc_id as decimal(38,0)) - (${lo})) / ${width}))"))
      prefixSumByBucket(t, bucket, "doc_id", col("tokens"), "cum_before")
        .withColumn("seq_id", expr("cum_before div 4096"))
        .groupBy("seq_id")
        .agg(count(lit(1)).as("docs"), sum("tokens").as("tokens"),
          min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
        .orderBy("seq_id")
    }),

    // Repetition detection (the C4/Gopher "most repeated n-gram" quality
    // gate): per document, the fraction of 3-gram occurrences taken by
    // the single most repeated 3-gram, in scaled-integer arithmetic.
    // One explode + two map-side-combinable aggregates — a single pass
    // over the corpus at any scale, partitioned by doc.
    "q82_repetition" -> ((s, d) =>
      docs(s, d)
        // single-pass generator (no interpreted transform/concat_ws
        // lambda chain), duplicates kept — q82 measures them
        .select(col("doc_id"),
          graft.functions.ShingleGen.shinglesAll(col("text")).as(Seq("sh")))
        // both aggregates are keyed by doc_id (the second strictly
        // coarser): exchanging by doc_id ONCE lets both run complete —
        // the old shape paid two exchanges and a map-side partial that
        // combined ~nothing (within-doc repeats are rare by
        // construction; repetitive docs are the anomaly this query
        // hunts) — guide §2.4 "share one exchange"
        .repartition(col("doc_id"))
        .groupBy("doc_id", "sh").agg(count(lit(1)).as("c"))
        .groupBy("doc_id")
        .agg(sum("c").as("n_sh"), max("c").as("max_c"))
        .withColumn("rep_e4", expr("(max_c * 10000) div n_sh"))
        .withColumn("repetitive", col("rep_e4") >= 2000)
        .select("doc_id", "n_sh", "max_c", "rep_e4", "repetitive")
        .orderBy("doc_id")),

    // DF-based stopword scrub: infer the top-5 corpus-frequency words,
    // remove them from every document, and rebuild the text ORDER-
    // PRESERVING (posexplode → anti-join → sort_array(struct(pos, w)) →
    // array_join). The stopword set is a two-stage count aggregate
    // (map-side combinable) broadcast into an anti-join; the rebuild
    // shuffles each document's kept words exactly once, keyed by doc_id.
    // Output hashes the rebuilt text, so the oracle proves byte equality.
    "q79_stopword_scrub" -> ((s, d) => {
      val pw = docs(s, d).select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "word")))
      val top5 = pw.groupBy("word").agg(count(lit(1)).as("cnt"))
        .orderBy(desc("cnt"), asc("word")).limit(5).select("word")
      val rebuilt = pw.join(broadcast(top5), Seq("word"), "left_anti")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("kept_words"),
          expr("array_join(transform(array_sort(collect_list(" +
            "struct(pos, word))), x -> x.word), ' ')").as("clean"))
      docs(s, d)
        .select(col("doc_id"),
          size(split(col("text"), " ")).as("orig_words"))
        .join(rebuilt, Seq("doc_id"), "left")
        .select(col("doc_id"), col("orig_words"),
          coalesce(col("kept_words"), lit(0L)).as("kept_words"),
          md5(coalesce(col("clean"), lit(""))).as("clean_digest"))
        .orderBy("doc_id")
    }),

    // Deterministic per-epoch training shuffle: each document's position
    // for epoch E is md5("epochE:" + doc_id) — content-independent,
    // reproducible on any engine, and different every epoch. The hash's
    // first byte is a UNIFORM, order-preserving bucket (hex strings of
    // equal length sort lexicographically = numerically), so the global
    // row_number runs as the distributed two-pass prefix COUNT — no
    // single-partition sort, no skew at any scale.
    "q89_epoch_shuffle" -> ((s, d) => {
      val t = docs(s, d)
        .withColumn("pos_hash",
          md5(concat(lit("epoch7:"), col("doc_id").cast("string"))))
        .withColumn("tokens", size(split(col("text"), " ")).cast("long"))
      val bucket = conv(substring(col("pos_hash"), 1, 2), 16, 10).cast("int")
      prefixSumByBucket(t, bucket, "pos_hash", lit(1L), "rn0")
        .withColumn("rn", col("rn0") + 1)
        .withColumn("batch_id", expr("CAST((rn - 1) div 64 AS BIGINT)"))
        .groupBy("batch_id")
        .agg(count(lit(1)).as("docs"), sum("tokens").as("tokens"),
          min("pos_hash").as("first_hash"), max("pos_hash").as("last_hash"))
        .orderBy("batch_id")
    }),

    // PII scrubbing: redact digit runs and email-shaped tokens, count
    // the redactions, digest the scrubbed text so the oracle proves byte
    // equality. Pure per-row regex expressions — embarrassingly
    // parallel, single scan, no shuffle beyond the final tiny sort.
    "q91_pii_scrub" -> ((s, d) =>
      docs(s, d)
        .select(col("doc_id"),
          size(expr(
            "regexp_extract_all(text, '[A-Za-z0-9._]+@[A-Za-z0-9.]+', 0)"))
            .as("n_email"),
          size(expr("regexp_extract_all(text, '[0-9]+', 0)")).as("n_num"),
          md5(regexp_replace(
            regexp_replace(col("text"),
              "[A-Za-z0-9._]+@[A-Za-z0-9.]+", "<EMAIL>"),
            "[0-9]+", "<NUM>")).as("redacted_digest"))
        .orderBy("doc_id")),

    // Unigram-frequency "surprisal" scoring (the cheap LM-free proxy for
    // informativeness): per document, the mean corpus frequency of its
    // tokens and the fraction of rare tokens — all exact integers. The
    // frequency table is a two-stage count aggregate; per-token lookup is
    // a shuffle join on the token (at 100 TB the frequency table of a
    // natural-language vocab is small enough to BROADCAST, making this a
    // single corpus scan — kept as a plain join here so the oracle plan
    // is engine-neutral).
    "q96_surprisal" -> ((s, d) => {
      val tok = docs(s, d).select(col("doc_id"),
        explode(split(col("text"), " ")).as("w"))
      val freq = tok.groupBy("w").agg(count(lit(1)).as("f"))
      tok.join(freq, "w")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"),
          expr("CAST(sum(f) div count(1) AS BIGINT)").as("mean_freq"),
          expr("CAST(sum(CASE WHEN f * 20 <= 600 THEN 1 ELSE 0 END) " +
            "AS BIGINT)").as("rare_tokens"))
        .orderBy("doc_id")
    }),

    // Sliding-window document chunking (the RAG/embedding-prep step:
    // 64-token windows at stride 48, ragged tail kept): one explode per
    // doc, chunk identity proven by digest. Pure per-row expressions —
    // the corpus chunks in a single scan, no shuffle beyond the ordered
    // output; at 100 TB each chunk row carries only (ids, digest), the
    // chunk text itself flows straight into the downstream embedder.
    // Deterministic TRAINING-MIX sampling: per-language keep rates
    // applied by hashing each doc_id against a fixed-seed md5 threshold
    // (first 4 hex chars compared lexicographically = numerically for
    // equal-length hex) — the reproducible, engine-neutral way a data
    // mix is downsampled for a training run ("30% of non-English"):
    // re-running on any engine, any partitioning, any day keeps the
    // SAME documents. Embarrassingly parallel (one scan, per-row hash,
    // one map-side-combinable aggregate); the per-stratum kept-id sum /
    // hash extrema prove the exact membership, not just the rate.
    "q170_training_mix_sample" -> ((s, d) => {
      val rate = when(col("lang") === "en", lit("cccc")) // ~80%
        .otherwise(lit("4ccc")) // ~30%
      docs(s, d)
        .withColumn("h4", substring(
          md5(concat(lit("mix42:"), col("doc_id").cast("string"))), 1, 4))
        .withColumn("kept", (col("h4") < rate).cast("long"))
        .groupBy("lang", "source")
        .agg(count(lit(1)).as("total"), sum("kept").as("kept"),
          sum(when(col("kept") === 1, col("doc_id"))).as("kept_id_sum"),
          min(when(col("kept") === 1, col("h4"))).as("min_kept_h4"),
          max(when(col("kept") === 1, col("h4"))).as("max_kept_h4"))
        .orderBy("lang", "source")
    }),

    "q104_chunking" -> ((s, d) =>
      docs(s, d)
        .withColumn("words", split(col("text"), " "))
        .withColumn("n", size(col("words")))
        .select(col("doc_id"), posexplode(expr(
          "transform(sequence(0, (n - 1) div 48), " +
            "k -> slice(words, k * 48 + 1, 64))")).as(Seq("chunk_id", "chunk")))
        .select(col("doc_id"), col("chunk_id"),
          size(col("chunk")).as("chunk_tokens"),
          md5(concat_ws(" ", col("chunk"))).as("chunk_digest"))
        .orderBy("doc_id", "chunk_id")),

    // Mixture reweighting manifest: per-(lang, source) sampling weight
    // that flattens the corpus toward a uniform domain mix —
    // weight_e6 = round(1e6 × target_share / actual_share) in integer
    // arithmetic. One tiny two-level aggregate; the manifest drives the
    // sampler, the corpus itself never shuffles.
    "q97_mixture_weights" -> ((s, d) => {
      val by = docs(s, d).groupBy("lang", "source")
        .agg(count(lit(1)).as("docs"))
      val tot = by.agg(sum("docs").as("total"), count(lit(1)).as("k"))
      by.crossJoin(tot)
        .withColumn("weight_e6",
          expr("CAST((1000000 * total) div (k * docs) AS BIGINT)"))
        .select("lang", "source", "docs", "weight_e6")
        .orderBy("lang", "source")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q76_split_assign" ->
      """WITH b AS (SELECT source, md5(CAST(doc_id AS VARCHAR)) AS h,
        |  len(string_split(text, ' ')) AS nw FROM documents),
        |c AS (SELECT source, nw,
        |  (ascii(substring(h, 1, 1)) * 31 + ascii(substring(h, 2, 1))) % 100
        |    AS bucket FROM b)
        |SELECT CASE WHEN bucket < 80 THEN 'train'
        |            WHEN bucket < 90 THEN 'val'
        |            ELSE 'test' END AS split,
        |  source, count(*) AS docs, CAST(sum(nw) AS BIGINT) AS total_words
        |FROM c GROUP BY split, source ORDER BY split, source""".stripMargin,

    "q77_decontam" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS words
        |           FROM documents),
        |sh AS (SELECT doc_id, list_distinct(list_transform(
        |         range(1, len(words) - 1),
        |         i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]))
        |         AS shingles
        |       FROM w WHERE len(words) >= 3),
        |e AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
        |ev AS (SELECT DISTINCT shingle FROM e WHERE doc_id % 20 = 0),
        |tr AS (SELECT doc_id, shingle FROM e WHERE doc_id % 20 <> 0),
        |sz AS (SELECT doc_id, count(*) AS n_sh FROM tr GROUP BY 1),
        |shd AS (SELECT tr.doc_id, count(*) AS n_shared
        |        FROM tr JOIN ev USING (shingle) GROUP BY 1)
        |SELECT sz.doc_id, sz.n_sh,
        |  CAST(coalesce(shd.n_shared, 0) AS BIGINT) AS n_shared,
        |  coalesce(shd.n_shared, 0) * 5 >= sz.n_sh AS contaminated
        |FROM sz LEFT JOIN shd ON sz.doc_id = shd.doc_id
        |ORDER BY sz.doc_id""".stripMargin,

    "q78_domain_cap" ->
      """WITH t AS (SELECT doc_id, lang, source, text,
        |            string_split(text, ' ') AS words FROM documents),
        |m AS (SELECT doc_id, lang, source,
        |  CAST(len(words) AS INTEGER) AS n_words,
        |  CAST(len(list_filter(words, w -> list_contains(
        |    ['the','a','of','and','to','in','is'], w))) AS BIGINT) AS n_stop,
        |  CAST(length(text) AS BIGINT) AS chars,
        |  CAST(length(text) -
        |    length(regexp_replace(text, '[0-9]', '', 'g')) AS BIGINT)
        |    AS n_digit
        |  FROM t),
        |f AS (SELECT doc_id, lang, source,
        |  CAST(40 * least(n_words, 100)
        |    + (3000 * (n_words - n_stop)) // n_words
        |    + (3000 * (chars - n_digit)) // chars AS BIGINT) AS q_int
        |  FROM m),
        |r AS (SELECT lang, source, doc_id, q_int, row_number() OVER (
        |        PARTITION BY lang, source
        |        ORDER BY q_int DESC, doc_id ASC) AS rnk
        |      FROM f)
        |SELECT lang, source, CAST(rnk AS INTEGER) AS rnk, doc_id,
        |  round(CAST(q_int AS DOUBLE) / CAST(10000 AS DOUBLE), 4) AS quality
        |FROM r WHERE rnk <= 8 ORDER BY lang, source, rnk""".stripMargin,

    "q85_sequence_packing" ->
      """WITH t AS (SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens
        |  FROM documents),
        |c AS (SELECT doc_id, tokens,
        |    coalesce(sum(tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS cum_before
        |  FROM t)
        |SELECT CAST(cum_before // 4096 AS BIGINT) AS seq_id,
        |  count(*) AS docs,
        |  CAST(sum(tokens) AS BIGINT) AS tokens,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM c GROUP BY 1 ORDER BY seq_id""".stripMargin,

    "q82_repetition" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS words
        |           FROM documents),
        |g AS (SELECT doc_id, unnest(list_transform(
        |        range(1, len(words) - 1),
        |        i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]))
        |        AS sh
        |      FROM w WHERE len(words) >= 3),
        |c AS (SELECT doc_id, sh, count(*) AS c FROM g GROUP BY 1, 2),
        |a AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_sh,
        |        CAST(max(c) AS BIGINT) AS max_c
        |      FROM c GROUP BY 1)
        |SELECT doc_id, n_sh, max_c,
        |  (max_c * 10000) // n_sh AS rep_e4,
        |  (max_c * 10000) // n_sh >= 2000 AS repetitive
        |FROM a ORDER BY doc_id""".stripMargin,

    "q79_stopword_scrub" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS words
        |           FROM documents),
        |pw AS (SELECT doc_id,
        |         unnest(generate_series(1, len(words))) AS pos, words
        |       FROM w),
        |pw2 AS (SELECT doc_id, pos, words[pos] AS word FROM pw),
        |top5 AS (SELECT word FROM (
        |  SELECT word, count(*) AS c FROM pw2 GROUP BY 1
        |  ORDER BY c DESC, word ASC LIMIT 5)),
        |kept AS (SELECT doc_id, pos, word FROM pw2
        |         WHERE word NOT IN (SELECT word FROM top5)),
        |reb AS (SELECT doc_id, count(*) AS kept_words,
        |          string_agg(word, ' ' ORDER BY pos) AS clean
        |        FROM kept GROUP BY 1)
        |SELECT d.doc_id,
        |  CAST(len(string_split(d.text, ' ')) AS INTEGER) AS orig_words,
        |  CAST(coalesce(reb.kept_words, 0) AS BIGINT) AS kept_words,
        |  md5(coalesce(reb.clean, '')) AS clean_digest
        |FROM documents d LEFT JOIN reb ON d.doc_id = reb.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    "q89_epoch_shuffle" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    md5('epoch7:' || CAST(doc_id AS VARCHAR)) AS pos_hash,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens
        |  FROM documents),
        |r AS (SELECT *, row_number() OVER (ORDER BY pos_hash) AS rn FROM h)
        |SELECT (rn - 1) // 64 AS batch_id, count(*) AS docs,
        |  CAST(sum(tokens) AS BIGINT) AS tokens,
        |  min(pos_hash) AS first_hash, max(pos_hash) AS last_hash
        |FROM r GROUP BY 1 ORDER BY batch_id""".stripMargin,

    "q91_pii_scrub" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text,
        |    '[A-Za-z0-9._]+@[A-Za-z0-9.]+')) AS INTEGER) AS n_email,
        |  CAST(len(regexp_extract_all(text, '[0-9]+')) AS INTEGER) AS n_num,
        |  md5(regexp_replace(regexp_replace(text,
        |    '[A-Za-z0-9._]+@[A-Za-z0-9.]+', '<EMAIL>', 'g'),
        |    '[0-9]+', '<NUM>', 'g')) AS redacted_digest
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q96_surprisal" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |  FROM documents),
        |freq AS (SELECT w, count(*) AS f FROM tok GROUP BY w)
        |SELECT doc_id, count(*) AS n_tokens,
        |  CAST(sum(f) // count(*) AS BIGINT) AS mean_freq,
        |  CAST(sum(CASE WHEN f * 20 <= 600 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS rare_tokens
        |FROM tok JOIN freq USING (w)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q170_training_mix_sample" ->
      """WITH s AS (
        |  SELECT lang, source, doc_id,
        |    substr(md5('mix42:' || CAST(doc_id AS VARCHAR)), 1, 4) AS h4,
        |    CASE WHEN lang = 'en' THEN 'cccc' ELSE '4ccc' END AS rate
        |  FROM documents)
        |SELECT lang, source, CAST(count(*) AS BIGINT) AS total,
        |  CAST(sum(CASE WHEN h4 < rate THEN 1 ELSE 0 END) AS BIGINT) AS kept,
        |  CAST(sum(CASE WHEN h4 < rate THEN doc_id END) AS BIGINT)
        |    AS kept_id_sum,
        |  min(CASE WHEN h4 < rate THEN h4 END) AS min_kept_h4,
        |  max(CASE WHEN h4 < rate THEN h4 END) AS max_kept_h4
        |FROM s GROUP BY lang, source
        |ORDER BY lang, source""".stripMargin,

    "q104_chunking" ->
      """WITH w AS (
        |  SELECT doc_id, string_split(text, ' ') AS words,
        |    len(string_split(text, ' ')) AS n
        |  FROM documents),
        |k AS (SELECT doc_id, words,
        |    unnest(range(0, ((n - 1) // 48) + 1)) AS cid
        |  FROM w),
        |c AS (SELECT doc_id, CAST(cid AS INTEGER) AS chunk_id,
        |    list_slice(words, cid * 48 + 1, cid * 48 + 64) AS chunk
        |  FROM k)
        |SELECT doc_id, chunk_id, CAST(len(chunk) AS INTEGER) AS chunk_tokens,
        |  md5(array_to_string(chunk, ' ')) AS chunk_digest
        |FROM c ORDER BY doc_id, chunk_id""".stripMargin,

    "q97_mixture_weights" ->
      """WITH by_d AS (
        |  SELECT lang, source, count(*) AS docs
        |  FROM documents GROUP BY lang, source),
        |tot AS (SELECT CAST(sum(docs) AS BIGINT) AS total,
        |               count(*) AS k FROM by_d)
        |SELECT lang, source, docs,
        |  CAST((1000000 * total) // (k * docs) AS BIGINT) AS weight_e6
        |FROM by_d, tot ORDER BY lang, source""".stripMargin
  )
}
