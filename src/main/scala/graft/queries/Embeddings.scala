package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.dotq

/** Similarity search over the `embeddings` table (`Array[Float]` column).
  *
  * Numeric determinism for the DuckDB oracle: floats quantize to int64
  * (`floor(x*1000)`) and thresholds/rankings compare in EXACT integer or
  * IEEE-deterministic double arithmetic derived from those integers, so
  * both engines produce bit-identical results (float accumulation order
  * never matters). 64-dim · |x|≲10 keeps every product < 2^63.
  *
  * Scale notes (100 TB): exact pair enumeration is quadratic COMPUTE by
  * nature, so every declared pair query runs the BLOCKED pair-scan
  * ([[blockedPairsRaw]]: B² block tasks, shuffle volume B·corpus, never
  * n² join rows); the naive all-pairs join survives only as the
  * spec-only differential twin. Approximate paths for larger corpora:
  * q48 (IVF: route each query to nprobe nearest centroids, search only
  * those partitions — the centroid table broadcasts) and the LSH
  * variants in SketchDedup. The query side of q47 is a small broadcast
  * against the big side, so KNN is one scan of the corpus with a
  * per-query top-k, no full shuffle of candidates.
  */
object Embeddings {

  private def emb(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "embeddings")
      // int64 quantization: floor() is exact + engine-independent.
      // Exactness bound (ENFORCED): |x| <= 3 ⇒ |q| <= 3000 ⇒ over 64 dims
      // dot <= 64·3000² = 5.76e8, so dot²·25 <= 8.3e18 < 2^63 and
      // dotself_a·dotself_b·4 <= 1.33e18 < 2^63 — no silent wrap in the
      // squared-threshold compare. Inputs beyond the bound fail loudly
      // instead of flipping pair membership.
      .withColumn("qvec", expr(
        "transform(embedding, x -> CAST(floor(x * 1000) AS BIGINT) + " +
          "ifnull(CAST(assert_true(abs(x) <= 3.0D, " +
          "'quantized cosine compare requires |x| <= 3 for int64 exactness') " +
          "AS BIGINT), 0))"))
      .withColumn("dotself", dotq(col("qvec"), col("qvec")))

  /** Exact brute-force cosine top-5 per query (queries = vec_id < 10):
    * the query side broadcasts, candidates rank per-query. Shared by q47
    * (direct output) and q48b (recall gate's ground truth).
    */
  private def knnExact(s: SparkSession, d: String): DataFrame = {
    val e = emb(s, d)
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("qvec").as("q_vec"),
        col("dotself").as("q_self"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(desc("cos_sim"), asc("n_id"))
    broadcast(q)
      .join(e.select(col("vec_id").as("n_id"), col("qvec").as("n_vec"),
        col("dotself").as("n_self")), col("q_id") =!= col("n_id"))
      .withColumn("dot", dotq(col("q_vec"), col("n_vec")))
      .withColumn("cos_sim",
        col("dot").cast("double") /
          sqrt(col("q_self").cast("double") * col("n_self").cast("double")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("q_id"), col("rank"), col("n_id"),
        round(col("cos_sim"), 4).as("cos_sim"))
  }

  /** Exact near-dup pair scan (cos >= 0.4, decided as 25·dot² >= 4·na·nb
    * in int64 — no float threshold can flip a pair), executed as a
    * BLOCKED pair-scan: vectors pack into ~48 dense blocks, block PAIRS
    * join (B² small rows moving block payloads, never n² rows), and each
    * task runs the dot products as tight int64 loops over packed arrays —
    * no per-pair row dematerialization, no n²-row join output feeding a
    * filter. At cos >= 0.4 no sketch family can prune (a random 90° pair
    * passes ~64% of hyperplane-LSH bands tuned for 0.4 recall), so the
    * honest scale path for EXACT pair enumeration is making the quadratic
    * compute cheap and distributable: B² block tasks saturate any
    * cluster, shuffle volume is B·corpus (each block is copied B times),
    * and per-task memory is two blocks. This single plan backs q46, q112
    * AND q128's edge feed; the naive all-pairs join survives only as the
    * spec-only differential twin [[quadraticPairsRaw]] (240 s vs ~6 s at
    * sf1 for identical output).
    *
    * Returns (id_a, id_b, dot, sa, sb) for the surviving pairs.
    */
  private[queries] def blockedPairsRaw(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val e = emb(s, d).select(col("vec_id"), col("qvec"), col("dotself"))
    val n = Tables.load(s, d, "embeddings").count()
    require(n <= 2000000L,
      s"exact pair enumeration is O(n^2) COMPUTE (distributed over block " +
        s"pairs) and refuses $n vectors (max 2M); above that use the " +
        "sketch paths (q48/q49/q50) or raise the threshold")
    val blockSize = math.max(1024L, (n + 47) / 48)
    val blocks = e
      .withColumn("bid", (col("vec_id") / lit(blockSize)).cast("int"))
      .select("bid", "vec_id", "dotself", "qvec")
      .as[(Int, Long, Long, Array[Long])]
      .groupByKey(_._1)
      .mapGroups { (bid, it) =>
        val rows = it.toArray.sortBy(_._2)
        val k = rows.length
        val dim = if (k > 0) rows(0)._4.length else 0
        val vecs = new Array[Long](k * dim)
        var i = 0
        while (i < k) {
          System.arraycopy(rows(i)._4, 0, vecs, i * dim, dim); i += 1
        }
        (bid, rows.map(_._2), rows.map(_._3), vecs)
      }
    blocks.as("x")
      .joinWith(blocks.as("y"), col("x._1") <= col("y._1"))
      .flatMap { case ((ba, idsA, selfA, vecsA), (bb, idsB, selfB, vecsB)) =>
        val ka = idsA.length
        val kb = idsB.length
        val dim = if (ka > 0) vecsA.length / ka else 0
        val out = scala.collection.mutable.ArrayBuffer
          .empty[(Long, Long, Long, Long, Long)]
        var i = 0
        while (i < ka) {
          // same block: strictly-upper pairs; cross block: all pairs
          // (bid order ⇒ every a-id < every b-id — vec_ids are dense)
          var j = if (ba == bb) i + 1 else 0
          val sa = selfA(i)
          val baseA = i * dim
          while (j < kb) {
            var dot = 0L
            var t = 0
            val baseB = j * dim
            while (t < dim) {
              dot += vecsA(baseA + t) * vecsB(baseB + t); t += 1
            }
            if (dot > 0 && dot * dot * 25 >= sa * selfB(j) * 4)
              out += ((idsA(i), idsB(j), dot, sa, selfB(j)))
            j += 1
          }
          i += 1
        }
        out
      }
      .toDF("id_a", "id_b", "dot", "sa", "sb")
  }

  /** The naive all-pairs join twin of [[blockedPairsRaw]] — O(n²) ROWS
    * through the join, kept ONLY as the differential oracle for specs
    * (PipelineOpsSpec proves blocked === quadratic). Never declared as a
    * query; refuses corpora over 100k vectors at plan-build time.
    */
  private[graft] def quadraticPairsRaw(s: SparkSession, d: String): DataFrame = {
    val n = Tables.load(s, d, "embeddings").count()
    require(n <= 100000L,
      s"the all-pairs differential twin refuses $n vectors (max 100000); " +
        "every declared query runs the blocked pair-scan instead")
    val e = emb(s, d)
    e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .withColumn("dot", dotq(col("a.qvec"), col("b.qvec")))
      .filter(col("dot") > 0 &&
        col("dot") * col("dot") * 25 >= col("a.dotself") * col("b.dotself") * 4)
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        col("dot"), col("a.dotself").as("sa"), col("b.dotself").as("sb"))
  }

  /** Shared post-math for the pair queries: cosine from the integer raw
    * columns, identical in q46 and q112 so the shared oracle hash-matches.
    */
  private def pairsWithCosine(raw: DataFrame): DataFrame =
    raw.select(col("id_a"), col("id_b"),
        round(col("dot").cast("double") /
          sqrt(col("sa").cast("double") * col("sb").cast("double")),
          4).as("cos_sim"))
      .orderBy("id_a", "id_b")

  /** IVF ANN top-5 over the persisted index ([[IvfIndex]]): probe-rank
    * against the broadcast centroid table, search only the probed
    * clusters (literal partition pruning on disk). Shared by q48 and the
    * q48b recall gate.
    */
  private def knnIvf(s: SparkSession, d: String,
      nProbe: Int = IvfIndex.NProbe): DataFrame = {
    val idx = IvfIndex.ensure(s, d, emb(s, d))
    val cent = IvfIndex.centroids(s, idx)
    val corpus = IvfIndex.assignments(s, idx)
    val q = emb(s, d).filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("qvec").as("q_vec"),
        col("dotself").as("q_self"))
    val wProbe = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(desc("c_sim"), asc("cluster"))
    val probes = q.crossJoin(broadcast(cent))
      .withColumn("c_sim", graft.functions.DoubleDotProduct.dotd(
        col("q_vec").cast("array<double>"), col("centroid")))
      .withColumn("probe_rank", row_number().over(wProbe))
      .filter(col("probe_rank") <= nProbe)
      .select("q_id", "cluster")
    val wK = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(desc("cos_sim"), asc("n_id"))
    probes
      .join(q, "q_id")
      .join(corpus.select(col("vec_id").as("n_id"), col("qvec").as("n_vec"),
        col("dotself").as("n_self"), col("cluster")), Seq("cluster"))
      .filter(col("q_id") =!= col("n_id"))
      // multi-assignment stores a vector in several clusters; a candidate
      // reachable through 2+ probed clusters must rank once, not twice
      .dropDuplicates("q_id", "n_id")
      .withColumn("dot", dotq(col("q_vec"), col("n_vec")))
      .withColumn("cos_sim",
        col("dot").cast("double") /
          sqrt(col("q_self").cast("double") * col("n_self").cast("double")))
      .withColumn("rank", row_number().over(wK))
      .filter(col("rank") <= 5)
      .select(col("q_id"), col("rank"), col("n_id"),
        round(col("cos_sim"), 4).as("cos_sim"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Near-dup pairs by cosine >= 0.4 via the BLOCKED exact pair-scan
    // ([[blockedPairsRaw]]) — the scalable plan IS the declared query
    // (r10 verdict: the old all-pairs join cost 240 s at sf1 for output
    // q112 produces in ~6 s; the quadratic twin survives only as the
    // spec-only differential [[quadraticPairsRaw]]).
    "q46_cosine_pairs" -> ((s, d) => pairsWithCosine(blockedPairsRaw(s, d))),

    // Brute-force cosine top-5 per query (queries = vec_id < 10). The
    // query side broadcasts; candidates rank per-query via row_number.
    "q47_knn_brute" -> ((s, d) => knnExact(s, d).orderBy("q_id", "rank")),

    // IVF ANN over the PERSISTED index ([[IvfIndex]]): centroids +
    // cluster-partitioned assignments build ONCE per corpus fingerprint;
    // the query path is probe-ranking against the broadcast centroid
    // table, then a search of only the probed clusters — the partitionBy
    // layout makes that literal partition pruning on disk. No k-means
    // job runs per query. Approximate by construction → spec-checked
    // recall vs q47 instead of a SQL oracle.
    "q48_knn_ivf" -> ((s, d) => knnIvf(s, d).orderBy("q_id", "rank")),

    // The IVF read path in an EXACT regime: nprobe = nlist (every
    // cluster probed) makes IVF brute-force by construction, so the
    // persisted-index machinery — centroid probe-ranking, the
    // cluster-partitioned read, multi-assignment dedup — gets a
    // hash-green DuckDB row against q47's exact oracle. q48 keeps the
    // approximate operating point (recall-gated via q48b); this row
    // pins that the index itself stores/reads every vector faithfully.
    "q48c_knn_ivf_fullprobe" -> ((s, d) =>
      knnIvf(s, d, nProbe = Int.MaxValue).orderBy("q_id", "rank")),

    // RECALL GATE for the approximate path (q48's one blind spot in the
    // driver artifact: ANN has no SQL oracle by construction). This
    // companion computes recall@5 of the IVF result against the EXACT
    // top-k IN-QUERY as pure integer counting, hard-asserts
    // recall >= 0.95 (a dip throws, turning the CORRECTNESS row red via
    // `err`), and emits a row whose every value is oracle-predictable
    // when healthy — so the driver's hash compare now gates ANN quality,
    // not just ScalaTest.
    "q48b_ivf_recall" -> ((s, d) => {
      val exact = knnExact(s, d).select(col("q_id"), col("n_id"))
      val approx = knnIvf(s, d).select(col("q_id"), col("n_id"))
        .withColumn("hit", lit(1L))
      // one aggregate over exact ⟕ approx: (q_id, n_id) is unique on
      // both sides, so multiplicity is preserved and total_hits counts
      // the intersection
      exact.join(approx, Seq("q_id", "n_id"), "left_outer")
        .agg(
          countDistinct(col("q_id")).as("n_queries"),
          count(lit(1)).as("total_expected"),
          sum(coalesce(col("hit"), lit(0L))).as("total_hits"))
        .filter(expr("ifnull(assert_true(" +
          "total_hits * 100 >= total_expected * 95, " +
          "'q48 IVF recall@5 fell below 0.95 vs the exact top-k'), true)"))
        .select(col("n_queries"), lit(5).as("k"), col("total_expected"),
          (col("total_hits") * 100 >= col("total_expected") * 95)
            .as("recall_ge_95"))
    }),

    // Int8 symmetric quantization + quantized-dot top-k: each vector
    // quantizes independently (scale 127/max|x|) to int8 range, then
    // similarity ranks by the INTEGER quantized dot product — the
    // compressed-corpus ANN path (4× less IO/memory than float32; at
    // 100 TB the quantized corpus is what the scan reads). Quantization
    // is round(double) on identical float32 inputs in both engines and
    // ranking is pure int64, so the oracle hash-matches exactly.
    // |q|<=127 over 64 dims → |dot| <= 64·127² ≈ 1.03e6, no overflow.
    "q90_quantized_ann" -> ((s, d) => {
      val e = Tables.load(s, d, "embeddings")
        .withColumn("mx", expr("aggregate(embedding, CAST(0.0 AS DOUBLE), " +
          "(acc, x) -> greatest(acc, abs(CAST(x AS DOUBLE))))"))
        .withColumn("q8", expr(
          "transform(embedding, x -> IF(mx = 0.0D, CAST(0 AS BIGINT), " +
            "CAST(round(CAST(x AS DOUBLE) * 127.0D / mx) AS BIGINT)))"))
        .select(col("vec_id"), col("q8"))
      val q = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("q8").as("q_q8"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("q_id").orderBy(desc("qdot"), asc("n_id"))
      broadcast(q)
        .join(e.select(col("vec_id").as("n_id"), col("q8").as("n_q8")),
          col("q_id") =!= col("n_id"))
        .withColumn("qdot", dotq(col("q_q8"), col("n_q8")))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 5)
        .select("q_id", "rnk", "n_id", "qdot")
        .orderBy("q_id", "rnk")
    }),

    // Blocked exact pair-scan under its historical name — identical plan
    // and output to q46 since r11 (the blocked plan became the declared
    // q46; the name stays so the scaling table keeps its history).
    "q112_cosine_pairs_blocked" -> ((s, d) =>
      pairsWithCosine(blockedPairsRaw(s, d))),

    // SemDeDup-style EXACT semantic dedup keeper: embedding-cosine
    // near-dup pairs (cos >= 0.4 — EXACTLY q46's quantized compare; the
    // int64 exactness bound caps threshold denominators at 5, and the
    // synthetic corpus tops out at cos 0.51) -> connected components
    // -> keep the min vec_id per component. Output covers pair
    // endpoints: dropped rows are is_canonical=false with their keeper
    // in component_root. The edge feed is the BLOCKED pair-scan (r11:
    // the keeper no longer rides a quadratic join; the 2M-vector guard
    // comes from [[blockedPairsRaw]]).
    "q128_semdedup_keeper" -> ((s, d) => {
      val pairs = blockedPairsRaw(s, d).select("id_a", "id_b")
      Components.roots(pairs, "vec_id")(s)
    }),

    // Product-quantization compressed search (the third ANN family next
    // to IVF q48 and int8 q90): 8 subspaces × 8 dims, K=32 codewords per
    // subspace sampled DETERMINISTICALLY from the corpus (the first 32
    // vectors' subvectors), candidates ranked by integer ADC distance to
    // each vector's codeword RECONSTRUCTION, over-fetched
    // max(100, n/20) deep, then exact-cosine re-ranked to top-5 — the
    // standard compressed-scan + re-rank production pipeline. Every step
    // is exact integer/deterministic, so unlike IVF (k-means seeding →
    // no_oracle) the WHOLE pipeline hash-oracles in DuckDB. At 100 TB
    // the scan reads 8 bytes of codes per vector instead of 256 bytes of
    // floats; recall is corpus-dependent (this corpus is deliberately
    // isotropic — the adversarial case for every pruning ANN; PqAnnSpec
    // records the measured candidate recall).
    "q140_knn_pq" -> ((s, d) => {
      val K = 32
      val e = emb(s, d).select("vec_id", "qvec", "dotself")
      val n = Tables.load(s, d, "embeddings").count()
      val fetch = math.max(100L, n / 20)
      val cb = e.filter(col("vec_id") < K)
        .agg(collect_list(struct(col("vec_id"), col("qvec"))).as("cbs"))
        .select(expr("transform(array_sort(cbs), c -> c.qvec)").as("cb"))
      val enc = e.crossJoin(broadcast(cb))
        .withColumn("recon", graft.functions.PqReconstruct
          .pqReconstruct(col("qvec"), col("cb"), 8))
        .select(col("vec_id").as("n_id"), col("qvec").as("n_vec"),
          col("dotself").as("n_self"), col("recon"),
          // reconstruction self-product, once per CANDIDATE, so the
          // per-(query, candidate) ADC below is pure codegen'd dot math
          dotq(col("recon"), col("recon")).as("n_rself"))
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("qvec").as("q_vec"),
          col("dotself").as("q_self"))
      val wAdc = org.apache.spark.sql.expressions.Window
        .partitionBy("q_id").orderBy(asc("adc"), asc("n_id"))
      val wCos = org.apache.spark.sql.expressions.Window
        .partitionBy("q_id").orderBy(desc("cos_sim"), asc("n_id"))
      broadcast(q).join(enc, col("q_id") =!= col("n_id"))
        // L2²(q, recon) = q·q + recon·recon − 2·q·recon — three codegen
        // dot products instead of an interpreted 64-term lambda on the
        // O(queries × corpus) hot path
        .withColumn("adc", col("q_self") + col("n_rself")
          - lit(2L) * dotq(col("q_vec"), col("recon")))
        .withColumn("crank", row_number().over(wAdc))
        .filter(col("crank") <= fetch)
        .withColumn("dot", dotq(col("q_vec"), col("n_vec")))
        .withColumn("cos_sim", col("dot").cast("double") /
          sqrt(col("q_self").cast("double") * col("n_self").cast("double")))
        .withColumn("rank", row_number().over(wCos))
        .filter(col("rank") <= 5)
        .select(col("q_id"), col("rank"), col("n_id"),
          round(col("cos_sim"), 4).as("cos_sim"))
        .orderBy("q_id", "rank")
    })
  )

  // Shared quantization CTE for the DuckDB side (1-based list indexing).
  private val qvecCte =
    """WITH E AS (SELECT vec_id,
      |  list_transform(embedding, x -> CAST(floor(x * 1000) AS BIGINT))
      |    AS qvec FROM embeddings),
      |S AS (SELECT vec_id, qvec,
      |  list_sum(list_transform(range(1, len(qvec) + 1),
      |    i -> qvec[i] * qvec[i])) AS dotself FROM E)""".stripMargin

  /** Exact cosine top-5 in DuckDB — the oracle for q47 (brute force)
    * AND q48c (full-probe IVF, which is brute force by construction).
    */
  private val knnBruteSql = qvecCte +
    """
      |, J AS (
      |  SELECT q.vec_id AS q_id, n.vec_id AS n_id,
      |    list_sum(list_transform(range(1, len(q.qvec) + 1),
      |      i -> q.qvec[i] * n.qvec[i])) AS dot,
      |    q.dotself AS q_self, n.dotself AS n_self
      |  FROM S q JOIN S n ON q.vec_id < 10 AND q.vec_id <> n.vec_id),
      |R AS (
      |  SELECT q_id, n_id,
      |    dot / sqrt(CAST(q_self AS DOUBLE) * n_self) AS cos_sim,
      |    row_number() OVER (PARTITION BY q_id
      |      ORDER BY dot / sqrt(CAST(q_self AS DOUBLE) * n_self) DESC,
      |        n_id ASC) AS rank
      |  FROM J)
      |SELECT q_id, CAST(rank AS INTEGER) AS rank, n_id,
      |  round(cos_sim, 4) AS cos_sim
      |FROM R WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q46_cosine_pairs" -> (qvecCte +
      """
        |SELECT id_a, id_b,
        |  round(dot / sqrt(CAST(sa AS DOUBLE) * sb), 4) AS cos_sim
        |FROM (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |    a.dotself AS sa, b.dotself AS sb,
        |    list_sum(list_transform(range(1, len(a.qvec) + 1),
        |      i -> a.qvec[i] * b.qvec[i])) AS dot
        |  FROM S a JOIN S b ON a.vec_id < b.vec_id)
        |WHERE dot > 0 AND dot * dot * 25 >= sa * sb * 4
        |ORDER BY id_a, id_b""".stripMargin),

    "q47_knn_brute" -> knnBruteSql,

    // full-probe IVF ≡ brute force: the same exact oracle gates the
    // index read path (q48 proper stays recall-gated via q48b)
    "q48c_knn_ivf_fullprobe" -> knnBruteSql,

    // q48b emits a constant-when-healthy row: every output value is
    // derivable from the corpus alone PROVIDED recall@5 >= 0.95, and the
    // query both computes the recall boolean from data (hash-gated) and
    // assert_true's it (a dip turns the row red via `err` too). The
    // oracle grounds n_queries/total_expected in the corpus rather than
    // hard-coding them.
    "q48b_ivf_recall" ->
      """SELECT count(DISTINCT vec_id) AS n_queries,
        |  CAST(5 AS INTEGER) AS k,
        |  count(DISTINCT vec_id) * 5 AS total_expected,
        |  true AS recall_ge_95
        |FROM embeddings WHERE vec_id < 10""".stripMargin,

    "q90_quantized_ann" ->
      """WITH v AS (SELECT vec_id, embedding,
        |    list_aggregate(list_transform(embedding,
        |      x -> abs(CAST(x AS DOUBLE))), 'max') AS mx
        |  FROM embeddings),
        |q8 AS (SELECT vec_id,
        |    CASE WHEN mx = 0 THEN
        |      list_transform(embedding, x -> CAST(0 AS BIGINT))
        |    ELSE list_transform(embedding,
        |      x -> CAST(round(CAST(x AS DOUBLE) * 127.0 / mx) AS BIGINT))
        |    END AS q8
        |  FROM v),
        |p AS (SELECT a.vec_id AS q_id, b.vec_id AS n_id,
        |    CAST(list_sum(list_transform(range(1, len(a.q8) + 1),
        |      i -> a.q8[i] * b.q8[i])) AS BIGINT) AS qdot
        |  FROM q8 a JOIN q8 b ON a.vec_id < 5 AND a.vec_id <> b.vec_id),
        |r AS (SELECT *, row_number() OVER (PARTITION BY q_id
        |        ORDER BY qdot DESC, n_id ASC) AS rnk FROM p)
        |SELECT q_id, CAST(rnk AS INTEGER) AS rnk, n_id, qdot
        |FROM r WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin,

    // q112 emits EXACTLY q46's pair set (blocked execution is a plan
    // change, not a semantics change) — same oracle.
    "q112_cosine_pairs_blocked" -> (qvecCte +
      """
        |SELECT id_a, id_b,
        |  round(dot / sqrt(CAST(sa AS DOUBLE) * sb), 4) AS cos_sim
        |FROM (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |    a.dotself AS sa, b.dotself AS sb,
        |    list_sum(list_transform(range(1, len(a.qvec) + 1),
        |      i -> a.qvec[i] * b.qvec[i])) AS dot
        |  FROM S a JOIN S b ON a.vec_id < b.vec_id)
        |WHERE dot > 0 AND dot * dot * 25 >= sa * sb * 4
        |ORDER BY id_a, id_b""".stripMargin),

    // same quantized pair math at cos >= 0.4, then recursive-CTE
    // transitive closure -> min-id component roots (mirrors q73's CC).
    // Standalone WITH RECURSIVE (the shared qvecCte is non-recursive).
    "q128_semdedup_keeper" ->
      """WITH RECURSIVE E AS (SELECT vec_id,
        |  list_transform(embedding, x -> CAST(floor(x * 1000) AS BIGINT))
        |    AS qvec FROM embeddings),
        |S AS (SELECT vec_id, qvec,
        |  list_sum(list_transform(range(1, len(qvec) + 1),
        |    i -> qvec[i] * qvec[i])) AS dotself FROM E),
        |p AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |    a.dotself AS sa, b.dotself AS sb,
        |    list_sum(list_transform(range(1, len(a.qvec) + 1),
        |      i -> a.qvec[i] * b.qvec[i])) AS dot
        |  FROM S a JOIN S b ON a.vec_id < b.vec_id),
        |pairs AS (SELECT id_a, id_b FROM p
        |          WHERE dot > 0 AND dot * dot * 25 >= sa * sb * 4),
        |edges AS (SELECT id_a AS u, id_b AS v FROM pairs
        |          UNION ALL SELECT id_b, id_a FROM pairs),
        |reach(u, v) AS (
        |  SELECT u, u FROM (SELECT DISTINCT u FROM edges)
        |  UNION
        |  SELECT r.u, e2.v FROM reach r JOIN edges e2 ON r.v = e2.u)
        |SELECT u AS vec_id, min(v) AS component_root,
        |  (u = min(v)) AS is_canonical
        |FROM reach GROUP BY u ORDER BY vec_id""".stripMargin,

    // full PQ pipeline: deterministic sampled codebook -> per-subspace
    // argmin encode (packed (dist, k) min for the tie-break) -> codeword
    // reconstruction -> integer ADC over-fetch -> exact-cosine re-rank
    "q140_knn_pq" -> (qvecCte +
      """
        |, CB AS (SELECT list(qvec ORDER BY vec_id) AS cb FROM E
        |         WHERE vec_id < 32),
        |ENC AS (
        |  SELECT vec_id, qvec, dotself,
        |    flatten(list_transform(range(0, 8), m ->
        |      list_slice(cb[1 + CAST(list_min(list_transform(range(0, 32),
        |          k -> list_sum(list_transform(range(1, 9), i ->
        |            (qvec[m*8+i] - cb[k+1][m*8+i])
        |            * (qvec[m*8+i] - cb[k+1][m*8+i])))
        |          * 32 + k)) % 32 AS INTEGER)],
        |        m*8+1, m*8+8))) AS recon
        |  FROM S CROSS JOIN CB),
        |J AS (
        |  SELECT q.vec_id AS q_id, n.vec_id AS n_id,
        |    list_sum(list_transform(range(1, 65), i ->
        |      (q.qvec[i] - n.recon[i]) * (q.qvec[i] - n.recon[i]))) AS adc,
        |    list_sum(list_transform(range(1, 65),
        |      i -> q.qvec[i] * n.qvec[i])) AS dot,
        |    q.dotself AS q_self, n.dotself AS n_self
        |  FROM S q JOIN ENC n ON q.vec_id < 10 AND q.vec_id <> n.vec_id),
        |C AS (
        |  SELECT q_id, n_id, dot, q_self, n_self,
        |    row_number() OVER (PARTITION BY q_id
        |      ORDER BY adc ASC, n_id ASC) AS crank
        |  FROM J),
        |R AS (
        |  SELECT q_id, n_id,
        |    dot / sqrt(CAST(q_self AS DOUBLE) * n_self) AS cos_sim,
        |    row_number() OVER (PARTITION BY q_id
        |      ORDER BY dot / sqrt(CAST(q_self AS DOUBLE) * n_self) DESC,
        |        n_id ASC) AS rank
        |  FROM C
        |  WHERE crank <= (SELECT greatest(100, count(*) // 20)
        |                  FROM embeddings))
        |SELECT q_id, CAST(rank AS INTEGER) AS rank, n_id,
        |  round(cos_sim, 4) AS cos_sim
        |FROM R WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin)
  )
}
