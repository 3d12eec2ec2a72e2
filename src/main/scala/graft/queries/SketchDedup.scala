package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sketch-based near-duplicate detection: MinHash+LSH and SimHash.
  *
  * BOTH pipelines are hash-oracled end-to-end in DuckDB via
  * engine-neutral md5-derived hash families:
  * - q49 (MinHash+LSH): one md5 per shingle → x mod p (p = 2^31−1),
  *   then the Carter–Wegman affine family h_i = (A_i·x + B_i) mod p
  *   ([[graft.functions.Md5MinHashPerms]] documents the constants and
  *   the overflow-safety argument) and an md5 band signature. The
  *   permutations are INDEPENDENT — an earlier linear-in-i family
  *   (a·(2i+3)+b) produced correlated band minima and a 68× LSH
  *   candidate blowup.
  * - q50 (SimHash): md5 token hashes split into two 32-bit halves
  *   ([[graft.functions.Md5Hash64]]).
  * The xxhash64 families (`MinHashPerms`, `xxhash64`) remain the
  * documented fast paths; SketchDedupSpec proves both families
  * reproduce the exact n-gram-Jaccard pair set (q41).
  *
  * Scale notes (100 TB): this is the path that replaces q41's quadratic
  * shingle self-join. Work per stage:
  * - signatures: explode(shingle × 64 perms) → groupBy(doc, perm).min —
  *   map-side combinable, shuffles (doc, perm) pairs only;
  * - banding: groupBy(doc, band) with a sorted-struct hash → one small
  *   row per (doc, band);
  * - bucket join: self-join on (band, signature) — only docs sharing a
  *   band signature meet, so the join output is ~candidates, not n²;
  * - verification: shingle sets are re-joined ONLY for docs that appear
  *   in some candidate pair (semi-join first), keeping the exact-Jaccard
  *   check linear in candidates.
  */
object SketchDedup {

  private val NumPerms = 64
  private val Bands = 16 // 16 bands × 4 rows → s-curve threshold ≈ 0.5
  private val RowsPerBand = NumPerms / Bands

  /** Per-doc 64-perm MinHash signature as ONE array row: each shingle
    * yields its 64 permutation hashes as an array; the custom
    * element-wise-min aggregate (map-side combinable) folds them — no 64×
    * posexplode, no (doc, perm) shuffle blowup. `neutral` picks the
    * md5-derived DuckDB-expressible family (the oracled default) vs the
    * xxhash64 fast path — identical pipeline shape either way.
    */
  private[queries] def signatures(s: SparkSession, d: String,
      neutral: Boolean = true): DataFrame =
    TextOps.shingles(s, d)
      // native expression = one call per shingle; the inner loop is
      // plain JVM code, not an interpreted lambda chain
      .withColumn("perms",
        if (neutral)
          graft.functions.SketchExprs.md5MinhashPerms(col("shingle"), NumPerms)
        else
          graft.functions.SketchExprs.minhashPerms(col("shingle"), NumPerms))
      .groupBy("doc_id")
      .agg(graft.functions.ArrayLongReduceAgg.arrayMinAgg(col("perms"))
        .as("sig_vec"))

  /** The full MinHash+LSH pipeline (banding → bucket join → exact
    * verification at J>=0.8); `neutral` selects the hash family.
    */
  private[graft] def lshPairs(s: SparkSession, d: String,
      neutral: Boolean): DataFrame = {
      val bandSigs = signatures(s, d, neutral)
        .withColumn("band", explode(expr(s"sequence(0, ${Bands - 1})")))
        // md5 of the comma-joined band slice: engine-neutral (DuckDB:
        // md5(string_agg(mv, ',' ORDER BY i))), still one small value
        // per (doc, band)
        .withColumn("sig", md5(concat_ws(",", expr(
          s"transform(slice(sig_vec, band * $RowsPerBand + 1, $RowsPerBand)," +
            " x -> CAST(x AS STRING))"))))
        .select("doc_id", "band", "sig")
      // The candidate set is REUSED three times below (both endpoint
      // projections of candDocs + the final left-semi), and each use
      // re-ran the banding self-join + distinct (~0.2 s apiece at
      // sf0.1 — exchange reuse only saves the signature partials, not
      // the band/md5/join work above them). Candidates are tiny by
      // construction (LSH survivors), so materialize ONCE and let all
      // three consumers read the cached blocks; localCheckpoint also
      // truncates the 40-node lineage the three plans each re-optimized
      // (guide §5 / §3.3 on materializing reused intermediates).
      val cand = bandSigs.as("a")
        .join(bandSigs.as("b"),
          col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
        .distinct()
        .localCheckpoint()
      // verify candidates with exact Jaccard over shingles of ONLY the
      // docs that appear in candidates
      val candDocs = cand.select(col("id_a").as("doc_id"))
        .union(cand.select(col("id_b").as("doc_id"))).distinct()
      val sh = TextOps.shingles(s, d)
        .join(candDocs, Seq("doc_id"), "left_semi")
      val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      sh.as("a")
        .join(sh.as("b"),
          col("a.shingle") === col("b.shingle") &&
            col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
        .agg(count(lit(1)).as("inter"))
        .join(cand, Seq("id_a", "id_b"), "left_semi")
        .join(sizes.as("za"), col("id_a") === col("za.doc_id"))
        .join(sizes.as("zb"), col("id_b") === col("zb.doc_id"))
        .withColumn("un", col("za.n") + col("zb.n") - col("inter"))
        .filter(col("inter") * 10 >= col("un") * 8)
        .select(col("id_a"), col("id_b"),
          round(col("inter").cast("double") / col("un"), 4).as("jaccard"))
        .orderBy("id_a", "id_b")
  }

  /** Per-DOC-ROW band signatures — the STATELESS twin of
    * [[signatures]]+banding: the whole shingle→minhash→band pipeline
    * runs inside one projection over each doc row (shingle array,
    * element-wise min-fold of the md5 permutation family, 16 band md5s),
    * so a STREAM of documents computes its bands with no stateful
    * aggregation, no watermark, and no shuffle. Values are bit-identical
    * to the batch path (the min over a doc's shingles is the same fold;
    * StreamNearDupSpec pins the equality, and the q172 DuckDB oracle
    * recomputes the family independently), so stream-side bands join
    * corpus-side stored buckets meaningfully. Docs under 3 words have no shingles
    * and produce no bands (same rule as [[graft.functions.ShingleGen]]).
    */
  private[graft] def bandsOver(docs: DataFrame): DataFrame =
    docs
      .filter(size(split(col("text"), " ")) >= 3)
      .withColumn("shingles", expr(
        "transform(sequence(0, size(split(text, ' ')) - 3), " +
          "i -> concat_ws(' ', slice(split(text, ' '), i + 1, 3)))"))
      .withColumn("sig_vec", aggregate(
        col("shingles"),
        array_repeat(lit(Long.MaxValue), NumPerms),
        (acc, sh) => zip_with(acc,
          graft.functions.SketchExprs.md5MinhashPerms(sh, NumPerms),
          (a, b) => least(a, b))))
      .withColumn("band", explode(expr(s"sequence(0, ${Bands - 1})")))
      .withColumn("sig", md5(concat_ws(",", expr(
        s"transform(slice(sig_vec, band * $RowsPerBand + 1, $RowsPerBand)," +
          " x -> CAST(x AS STRING))"))))
      .select(col("doc_id"), col("band"), col("sig"))

  /** The per-batch candidate check, INVERTED so the corpus-sized side
    * never shuffles: the corpus bucket scan (band, sig only — column
    * pruning keeps doc payloads out of the read) streams straight into a
    * BroadcastHashJoin whose BUILD side is the micro-batch's bands — a
    * few KB per trigger. No exchange, no sort on the corpus side; the
    * only shuffle in the per-batch job is the distinct over the flagged
    * doc ids (≤ batch-size rows). StreamNearDupSpec pins this plan.
    * A left-semi join the other way round (batch side left) could only
    * broadcast the CORPUS, so at 100 TB every micro-batch would
    * re-shuffle the corpus-sized static side — the shape r15 shipped.
    * If a micro-batch ever outgrew broadcast, the fallback is the
    * bucketed/sorted corpus layout, not a corpus shuffle.
    */
  private[graft] def flaggedAgainst(buckets: DataFrame,
      batchBands: DataFrame): DataFrame =
    buckets.select("band", "sig")
      .join(broadcast(batchBands.select("doc_id", "band", "sig")),
        Seq("band", "sig"))
      .select("doc_id")
      .distinct()

  /** Drains one AvailableNow pass of the near-dup stream: incoming docs
    * are banded STATELESSLY in the streaming query ([[bandsOver]]);
    * each micro-batch's bands are checked against the standing bucket
    * table ([[flaggedAgainst]]) and the flagged ids appended to
    * `flaggedDir`. With `grow = true` the batch ALSO appends its
    * non-duplicate docs' bands to the bucket table as an
    * `ingest_batch=<id>` partition — the corpus grows as the crawl
    * lands, so later docs dedup against earlier SURVIVORS, not just the
    * seed corpus. Crash-retry safety: the bucket read prunes to
    * `ingest_batch < batchId`, so a half-written partition from a
    * failed attempt of the SAME batch can never flag a doc against its
    * own bands; the partition write is mode-overwrite on a
    * batchId-keyed directory, so the retry replaces it byte-for-byte.
    * (Flag re-appends on retry only duplicate rows — the reader
    * distincts.) Long-running ingest accretes one partition dir per
    * batch; production bounds that by periodically folding the
    * `ingest_batch>=0` partitions into the seed partition between
    * stream runs (a plain parquet rewrite while no stream holds the
    * table) — the read path is layout-agnostic either way.
    */
  private[graft] def runNearDup(s: SparkSession, inDir: String,
      incomingSchema: org.apache.spark.sql.types.StructType,
      bucketRoot: String, ckptDir: String, flaggedDir: String,
      grow: Boolean, timeoutMs: Long = 300000,
      maxFilesPerTrigger: Option[Int] = None): Unit = {
    // Batch granularity is a THROUGHPUT knob, not a semantics knob,
    // unless grow = true: growing runs must see one ingest wave per
    // batch (wave k dedups against survivors of waves < k), so they
    // pass maxFilesPerTrigger = 1. Non-growing runs flag against a
    // FIXED corpus — the flag set is identical at any batch split —
    // so they drain everything available in ONE batch and pay the
    // micro-batch machinery (offset log, commit log, per-batch planning
    // + broadcast + parquet commit) once instead of once per file
    // (guide §1.2: remove passes that compute nothing new).
    val reader = s.readStream.schema(incomingSchema)
    maxFilesPerTrigger.foreach(n =>
      reader.option("maxFilesPerTrigger", n.toString))
    val q = bandsOver(reader.parquet(inDir))
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", ckptDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (bands0: DataFrame, batchId: Long) =>
        // Growing batches consume `bands` twice (the broadcast build
        // and the survivor append) — persist the micro-batch-sized
        // frame so the shingle→minhash→band projection runs once per
        // batch, not once per consumer (guide §5: cache only reused
        // AND expensive-to-recompute frames; a micro-batch is both).
        val bands = if (grow) bands0.persist() else bands0
        val buckets = s.read.parquet(bucketRoot)
          .filter(col("ingest_batch") < batchId)
        val flagged = flaggedAgainst(buckets, bands).persist()
        try {
          flagged.write.mode("append").parquet(flaggedDir)
          if (grow) {
            bands.join(flagged, Seq("doc_id"), "left_anti")
              .select("doc_id", "band", "sig")
              .write.mode("overwrite")
              .parquet(s"$bucketRoot/ingest_batch=$batchId")
          }
        } finally {
          flagged.unpersist()
          if (grow) bands.unpersist()
        }
        ()
      }
      .start()
    require(q.awaitTermination(timeoutMs),
      "near-dup: the AvailableNow stream did not terminate")
  }

  /** The standing near-dup fixture, cached per source dir: the corpus's
    * band buckets as the bucket table's `ingest_batch=-1` seed
    * partition, the incoming docs landed as 4 parquet files (the
    * micro-batch feed), and the SAME incoming docs split into 4 WAVE
    * files by `doc_id % 4` with strictly increasing mtimes — file-source
    * streaming orders files by modification time, so with
    * maxFilesPerTrigger=1 wave k IS batch k deterministically, which is
    * what lets the growing regime (q175) carry a sequential DuckDB
    * oracle. Reuse is gated on a completion SENTINEL written last (not
    * on the root dir, which exists from the first write onward): a
    * crash mid-build leaves no sentinel, and the next run wipes the
    * partial cache and rebuilds instead of silently under-flagging.
    */
  private def fixture(s: SparkSession, d: String, docs: DataFrame,
      incoming: DataFrame): (String, String, String) = synchronized {
    val key = java.nio.file.Paths.get(d).toAbsolutePath.toString
      .replaceAll("[^a-zA-Z0-9]", "_")
    val root = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), s"graft_neardup_v3$key")
    val sentinel = root.resolve("_graft_cache_complete")
    val b = root.resolve("corpus_buckets")
    val in = root.resolve("incoming")
    val waves = root.resolve("incoming_waves")
    if (!java.nio.file.Files.exists(sentinel)) {
      if (java.nio.file.Files.exists(root)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(root).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.delete)
      }
      val corpus = docs.filter(col("doc_id") % 10 < 8)
      bandsOver(corpus).write.mode("overwrite")
        .parquet(b.resolve("ingest_batch=-1").toString)
      incoming.repartition(4).write.mode("overwrite").parquet(in.toString)
      java.nio.file.Files.createDirectories(waves)
      val t0 = java.nio.file.Files.getLastModifiedTime(in).toMillis
      (0 until 4).foreach { k =>
        val stage = root.resolve(s"wave_stage_$k")
        incoming.filter(col("doc_id") % 4 === k).coalesce(1)
          .write.mode("overwrite").parquet(stage.toString)
        val part = {
          import scala.jdk.CollectionConverters._
          val ls = java.nio.file.Files.list(stage)
          try ls.iterator().asScala
            .find(_.getFileName.toString.endsWith(".parquet")).get
          finally ls.close()
        }
        val dest = waves.resolve(f"wave_$k%02d.parquet")
        java.nio.file.Files.move(part, dest)
        java.nio.file.Files.setLastModifiedTime(dest,
          java.nio.file.attribute.FileTime.fromMillis(t0 + k * 2000L))
        graft.pinot.PinotCompact.deleteRecursively(stage)
      }
      java.nio.file.Files.createFile(sentinel)
    }
    (b.toString, in.toString, waves.toString)
  }

  /** Copy the seed bucket partition into a run-private bucket table —
    * the growing regime MUTATES its table, so runs must not share it.
    * Hardlinks where the filesystem allows (the seed's parquet files
    * are immutable — grow only ADDS partition dirs), byte copy as the
    * cross-device fallback.
    */
  private def copySeedBuckets(base: String, dest: java.nio.file.Path): Unit = {
    val src = java.nio.file.Paths.get(base)
    import scala.jdk.CollectionConverters._
    val walk = java.nio.file.Files.walk(src)
    try walk.iterator().asScala.foreach { p =>
      val to = dest.resolve(src.relativize(p).toString)
      if (java.nio.file.Files.isDirectory(p))
        java.nio.file.Files.createDirectories(to)
      else
        try java.nio.file.Files.createLink(to, p)
        catch { case _: java.io.IOException =>
          java.nio.file.Files.copy(p, to); ()
        }
      ()
    } finally walk.close()
  }

  /** STREAMING near-dup with the GROWING corpus (the production ingest
    * regime; q172's fixed-corpus twin): each wave's survivors join the
    * bucket table before the next wave arrives, so wave k dedups
    * against the seed corpus PLUS the survivors of waves < k — and
    * nothing else (flagged docs never enter the table; docs within one
    * wave never see each other). Wave→batch order is deterministic (see
    * [[fixture]]), so the DuckDB oracle replays the same four-step
    * sequence with chained CTEs. The bucket table is copied per run
    * from the cached seed (the run mutates it); the stream itself is
    * the same checkpointed AvailableNow pipeline as q172 with
    * `grow = true`.
    */
  private[graft] def streamNearDupGrow(s: SparkSession, d: String): DataFrame = {
    val docs = graft.Tables.load(s, d, "documents")
    val incoming = docs.filter(col("doc_id") % 10 >= 8)
      .select(col("doc_id"), col("text"))
    val (seedBuckets, _, wavesDir) = fixture(s, d, docs, incoming)
    val work = java.nio.file.Files.createTempDirectory("q175_neardup")
    val bucketRoot = work.resolve("buckets")
    copySeedBuckets(seedBuckets, bucketRoot)
    val flaggedDir = work.resolve("flagged").toString
    incoming.select("doc_id").limit(0).write.parquet(flaggedDir) // schema seed
    runNearDup(s, wavesDir, incoming.schema, bucketRoot.toString,
      work.resolve("ckpt").toString, flaggedDir, grow = true,
      maxFilesPerTrigger = Some(1)) // wave k IS batch k — see [[fixture]]
    val flagged = s.read.parquet(flaggedDir).distinct()
      .withColumnRenamed("doc_id", "f_id")
    incoming.select(col("doc_id"))
      .join(flagged, col("doc_id") === col("f_id"), "left")
      .select(col("doc_id"), col("f_id").isNotNull.as("near_dup"))
      .orderBy("doc_id")
  }

  /** STREAMING near-dup against a stored corpus — the production
    * LLM-pipeline shape batch q49 does not cover: "flag each INCOMING
    * crawl doc that near-duplicates the EXISTING corpus". The corpus's
    * LSH band buckets are persisted once as the `ingest_batch=-1` seed
    * partition of the bucket table (and, with [[runNearDup]]'s
    * `grow = true` ingest mode, grow per-batch as surviving docs land);
    * each micro-batch of incoming docs computes its bands statelessly
    * ([[bandsOver]]) and its (band, sig) pairs BROADCAST into a join
    * the corpus-sized bucket scan streams through ([[flaggedAgainst]])
    * — a doc sharing any band bucket with the corpus is a candidate
    * duplicate, and the corpus side crosses no exchange at any scale.
    * State: NONE (the join is per-batch against the standing table, the
    * banding per-row) — restart- and grow-proven in StreamNearDupSpec.
    * This query runs the non-growing regime so the DuckDB oracle
    * (incoming vs the fixed corpus) stays exact.
    */
  private[graft] def streamNearDup(s: SparkSession, d: String): DataFrame = {
    val docs = graft.Tables.load(s, d, "documents")
    val incoming = docs.filter(col("doc_id") % 10 >= 8)
      .select(col("doc_id"), col("text"))
    // the persisted corpus bucket table + the landed incoming files are
    // the STANDING state of this op in production (the bucket table is
    // maintained by ingest) — cache them per source dir like the pinot
    // fixtures, so repeated runs measure the stream dedup itself, not a
    // corpus rebuild; checkpoint + flag output stay fresh per run.
    // Reuse is gated on a completion SENTINEL written last (not on the
    // root dir, which exists from the first write onward): a crash
    // mid-build leaves no sentinel, and the next run wipes the partial
    // cache and rebuilds instead of silently under-flagging.
    val (bucketRoot, inDir, _) = fixture(s, d, docs, incoming)
    val work = java.nio.file.Files.createTempDirectory("q172_neardup")
    val flaggedDir = work.resolve("flagged").toString
    incoming.select("doc_id").limit(0).write.parquet(flaggedDir) // schema seed
    runNearDup(s, inDir, incoming.schema, bucketRoot,
      work.resolve("ckpt").toString, flaggedDir, grow = false)
    val flagged = s.read.parquet(flaggedDir).distinct()
      .withColumnRenamed("doc_id", "f_id")
    incoming.select(col("doc_id"))
      .join(flagged, col("doc_id") === col("f_id"), "left")
      .select(col("doc_id"), col("f_id").isNotNull.as("near_dup"))
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // MinHash + LSH banding + bucket join + exact verification at J>=0.8,
    // over the md5-derived engine-neutral permutation family (oracled).
    "q49_dedup_minhash_lsh" -> ((s, d) => lshPairs(s, d, neutral = true)),

    // Streaming near-dup of the incoming crawl (doc_id % 10 >= 8)
    // against the stored corpus bucket table (doc_id % 10 < 8): every
    // incoming doc flagged iff it shares an LSH band bucket with some
    // corpus doc — stateless banding per micro-batch + a stream-static
    // left-semi join, drained AvailableNow. The DuckDB oracle recomputes
    // the same md5 permutation family over both sides.
    "q172_stream_neardup_corpus" -> ((s, d) => streamNearDup(s, d)),

    // The GROWING-corpus regime (production ingest): four deterministic
    // incoming waves drain through the same checkpointed stream with
    // grow = true — wave k is flagged against the seed corpus plus the
    // SURVIVORS of waves < k; the oracle replays the sequence in DuckDB.
    "q175_stream_neardup_grow" -> ((s, d) => streamNearDupGrow(s, d)),

    // SimHash: 64-bit sign-aggregated token hash; banded bucket join;
    // near-dups = hamming distance <= 7. Token hashes come from the
    // md5-derived engine-neutral family (oracled); xxhash64 fast path
    // via simhashPairs(neutral = false).
    "q50_dedup_simhash" -> ((s, d) => simhashPairs(s, d, neutral = true))
  )

  /** The full SimHash pipeline; `neutral` selects the token-hash family. */
  private[graft] def simhashPairs(s: SparkSession, d: String,
      neutral: Boolean): DataFrame = {
      val docs = graft.Tables.load(s, d, "documents")
      // Weighted-by-count ±1 bit arrays folded by the element-wise-sum
      // aggregate (map-side combinable — replaces a 64× posexplode
      // shuffle). Tokens collapse to (doc, hash, count) FIRST so the
      // 64-element bit expansion runs once per distinct token, not once
      // per occurrence — 10× fewer lambda evaluations on repetitive text.
      val sims = docs
        .withColumn("word", explode(split(col("text"), " ")))
        .withColumn("h",
          if (neutral) graft.functions.SketchExprs.md5Hash64(col("word"))
          else xxhash64(col("word")))
        .groupBy("doc_id", "h")
        .agg(count(lit(1)).as("c"))
        .withColumn("bits",
          graft.functions.SketchExprs.simhashContrib(col("h"), col("c")))
        .groupBy("doc_id")
        .agg(graft.functions.ArrayLongReduceAgg.arraySumAgg(col("bits"))
          .as("tally"))
        .withColumn("simhash", graft.functions.SketchExprs.signBits(col("tally")))
      // 8 bands × 8 bits: by pigeonhole, any pair within hamming 7 shares
      // at least one clean band → banding loses nothing below threshold.
      val banded = sims
        .withColumn("k", explode(expr("sequence(0, 7)")))
        .withColumn("band_val", expr("(simhash >> (8 * k)) & 255"))
      // hamming is row-local on the join output, so FILTER BEFORE the
      // dedup: distinct-then-filter hashed every candidate band
      // collision (118k rows, 32-byte keys — 1.1 s at sf0.1, the whole
      // query's hot spot) to then discard 99% of it; filter-then-
      // distinct dedups only true near-dup pairs (~1k rows). Identical
      // result — the predicate commutes with duplicate elimination.
      banded.as("a")
        .join(banded.as("b"),
          col("a.k") === col("b.k") && col("a.band_val") === col("b.band_val")
            && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
          expr("bit_count(a.simhash ^ b.simhash)").as("hamming"))
        .filter(col("hamming") <= 7)
        .distinct()
        .orderBy("id_a", "id_b")
  }

  // Both sketch pipelines hash-oracle in DuckDB: q49 via the md5
  // permutation family, q50 via md5-derived 64-bit token hashes
  // reconstructed as two 32-bit halves (a 16-hex-char unsigned value
  // cannot cast to DuckDB's signed BIGINT, but its halves can — bit j
  // reads from the lo half for j<32, hi otherwise, and hamming is the
  // sum of the halves' bit_counts).
  val oracleSql: Map[String, String] = Map(
    // the same md5 permutation family over both sides: an incoming doc
    // (doc_id % 10 >= 8) is near_dup iff it shares a band signature
    // with some corpus doc (doc_id % 10 < 8)
    "q172_stream_neardup_corpus" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS words
        |           FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
        |         range(1, len(words) - 1),
        |         i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])))
        |         AS shingle
        |       FROM w WHERE len(words) >= 3),
        |ab AS (SELECT doc_id, shingle,
        |         (CAST(concat('0x', substr(md5(shingle), 1, 13)) AS BIGINT)
        |          + CAST(concat('0x', substr(md5(shingle), 14, 13)) AS BIGINT))
        |           % 2147483647 AS x
        |       FROM sh),
        |pm AS (SELECT doc_id, i,
        |         min(((1 + ((i + 1) * 1013904223) % 2147483646) * x
        |              + (i * 2654435761) % 2147483647) % 2147483647) AS mv
        |       FROM ab CROSS JOIN range(64) t(i) GROUP BY 1, 2),
        |bd AS (SELECT doc_id, i // 4 AS band,
        |         md5(string_agg(CAST(mv AS VARCHAR), ',' ORDER BY i)) AS sig
        |       FROM pm GROUP BY doc_id, i // 4),
        |flag AS (SELECT DISTINCT a.doc_id FROM bd a JOIN bd c
        |         ON a.band = c.band AND a.sig = c.sig
        |         WHERE a.doc_id % 10 >= 8 AND c.doc_id % 10 < 8)
        |SELECT d.doc_id, (f.doc_id IS NOT NULL) AS near_dup
        |FROM documents d LEFT JOIN flag f ON d.doc_id = f.doc_id
        |WHERE d.doc_id % 10 >= 8
        |ORDER BY d.doc_id""".stripMargin,

    // the growing regime replayed sequentially: wave k (doc_id % 4 = k
    // of the incoming docs) flags against corpus bands ∪ the bands of
    // SURVIVING docs of waves < k — four chained steps, matching the
    // deterministic wave→batch order of the fixture
    "q175_stream_neardup_grow" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS words
        |           FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
        |         range(1, len(words) - 1),
        |         i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])))
        |         AS shingle
        |       FROM w WHERE len(words) >= 3),
        |ab AS (SELECT doc_id, shingle,
        |         (CAST(concat('0x', substr(md5(shingle), 1, 13)) AS BIGINT)
        |          + CAST(concat('0x', substr(md5(shingle), 14, 13)) AS BIGINT))
        |           % 2147483647 AS x
        |       FROM sh),
        |pm AS (SELECT doc_id, i,
        |         min(((1 + ((i + 1) * 1013904223) % 2147483646) * x
        |              + (i * 2654435761) % 2147483647) % 2147483647) AS mv
        |       FROM ab CROSS JOIN range(64) t(i) GROUP BY 1, 2),
        |bd AS (SELECT doc_id, i // 4 AS band,
        |         md5(string_agg(CAST(mv AS VARCHAR), ',' ORDER BY i)) AS sig
        |       FROM pm GROUP BY doc_id, i // 4),
        |inc AS (SELECT doc_id, band, sig FROM bd WHERE doc_id % 10 >= 8),
        |b0 AS (SELECT band, sig FROM bd WHERE doc_id % 10 < 8),
        |f0 AS (SELECT DISTINCT i.doc_id FROM inc i JOIN b0 USING (band, sig)
        |       WHERE i.doc_id % 4 = 0),
        |b1 AS (SELECT band, sig FROM b0 UNION ALL
        |       SELECT band, sig FROM inc WHERE doc_id % 4 = 0
        |         AND doc_id NOT IN (SELECT doc_id FROM f0)),
        |f1 AS (SELECT DISTINCT i.doc_id FROM inc i JOIN b1 USING (band, sig)
        |       WHERE i.doc_id % 4 = 1),
        |b2 AS (SELECT band, sig FROM b1 UNION ALL
        |       SELECT band, sig FROM inc WHERE doc_id % 4 = 1
        |         AND doc_id NOT IN (SELECT doc_id FROM f1)),
        |f2 AS (SELECT DISTINCT i.doc_id FROM inc i JOIN b2 USING (band, sig)
        |       WHERE i.doc_id % 4 = 2),
        |b3 AS (SELECT band, sig FROM b2 UNION ALL
        |       SELECT band, sig FROM inc WHERE doc_id % 4 = 2
        |         AND doc_id NOT IN (SELECT doc_id FROM f2)),
        |f3 AS (SELECT DISTINCT i.doc_id FROM inc i JOIN b3 USING (band, sig)
        |       WHERE i.doc_id % 4 = 3),
        |flag AS (SELECT doc_id FROM f0 UNION SELECT doc_id FROM f1
        |         UNION SELECT doc_id FROM f2 UNION SELECT doc_id FROM f3)
        |SELECT d.doc_id, (f.doc_id IS NOT NULL) AS near_dup
        |FROM documents d LEFT JOIN flag f ON d.doc_id = f.doc_id
        |WHERE d.doc_id % 10 >= 8
        |ORDER BY d.doc_id""".stripMargin,

    "q50_dedup_simhash" ->
      """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
        |           FROM documents),
        |tc AS (SELECT doc_id, word, count(*) AS c FROM w GROUP BY 1, 2),
        |hh AS (SELECT doc_id, c,
        |         CAST(concat('0x', substr(md5(word), 1, 8)) AS BIGINT) AS hi,
        |         CAST(concat('0x', substr(md5(word), 9, 8)) AS BIGINT) AS lo
        |       FROM tc),
        |tl AS (SELECT doc_id, j,
        |         sum(c * (2 * ((CASE WHEN j < 32 THEN lo >> j
        |                        ELSE hi >> (j - 32) END) & 1) - 1)) AS s
        |       FROM hh CROSS JOIN range(64) t(j) GROUP BY 1, 2),
        |sh AS (SELECT doc_id,
        |         CAST(sum(CASE WHEN j < 32 AND s > 0
        |           THEN CAST(1 AS BIGINT) << CAST(j AS INTEGER)
        |           ELSE 0 END) AS BIGINT) AS lo_b,
        |         CAST(sum(CASE WHEN j >= 32 AND s > 0
        |           THEN CAST(1 AS BIGINT) << CAST(j - 32 AS INTEGER)
        |           ELSE 0 END) AS BIGINT) AS hi_b
        |       FROM tl GROUP BY 1),
        |bd AS (SELECT doc_id, lo_b, hi_b, k,
        |         CASE WHEN k < 4
        |           THEN (lo_b >> CAST(8 * k AS INTEGER)) & 255
        |           ELSE (hi_b >> CAST(8 * (k - 4) AS INTEGER)) & 255
        |         END AS band_val
        |       FROM sh CROSS JOIN range(8) t(k)),
        |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
        |           a.lo_b AS lo_a, a.hi_b AS hi_a,
        |           b.lo_b AS lo_z, b.hi_b AS hi_z
        |         FROM bd a JOIN bd b
        |         ON a.k = b.k AND a.band_val = b.band_val
        |           AND a.doc_id < b.doc_id)
        |SELECT id_a, id_b,
        |  CAST(bit_count(xor(lo_a, lo_z)) + bit_count(xor(hi_a, hi_z))
        |    AS INTEGER) AS hamming
        |FROM cand
        |WHERE bit_count(xor(lo_a, lo_z)) + bit_count(xor(hi_a, hi_z)) <= 7
        |ORDER BY id_a, id_b""".stripMargin,
    "q49_dedup_minhash_lsh" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS words
        |           FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
        |         range(1, len(words) - 1),
        |         i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])))
        |         AS shingle
        |       FROM w WHERE len(words) >= 3),
        |ab AS (SELECT doc_id, shingle,
        |         (CAST(concat('0x', substr(md5(shingle), 1, 13)) AS BIGINT)
        |          + CAST(concat('0x', substr(md5(shingle), 14, 13)) AS BIGINT))
        |           % 2147483647 AS x
        |       FROM sh),
        |pm AS (SELECT doc_id, i,
        |         min(((1 + ((i + 1) * 1013904223) % 2147483646) * x
        |              + (i * 2654435761) % 2147483647) % 2147483647) AS mv
        |       FROM ab CROSS JOIN range(64) t(i) GROUP BY 1, 2),
        |bd AS (SELECT doc_id, i // 4 AS band,
        |         md5(string_agg(CAST(mv AS VARCHAR), ',' ORDER BY i)) AS sig
        |       FROM pm GROUP BY doc_id, i // 4),
        |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |         FROM bd a JOIN bd b
        |         ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
        |cd AS (SELECT id_a AS doc_id FROM cand
        |       UNION SELECT id_b FROM cand),
        |e AS (SELECT sh.doc_id, sh.shingle FROM sh
        |      JOIN cd ON cd.doc_id = sh.doc_id),
        |sz AS (SELECT doc_id, count(*) AS n FROM e GROUP BY 1),
        |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        |      FROM e a JOIN e b
        |      ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |      GROUP BY 1, 2),
        |v AS (SELECT p.id_a, p.id_b, p.inter FROM p
        |      JOIN cand ON cand.id_a = p.id_a AND cand.id_b = p.id_b)
        |SELECT id_a, id_b,
        |  round(inter * 1.0 / (za.n + zb.n - inter), 4) AS jaccard
        |FROM v JOIN sz za ON za.doc_id = id_a
        |JOIN sz zb ON zb.doc_id = id_b
        |WHERE inter * 10 >= (za.n + zb.n - inter) * 8
        |ORDER BY id_a, id_b""".stripMargin
  )
}
