package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sketch-based near-duplicate detection: MinHash+LSH and SimHash.
  *
  * Both sketches use fixed-seed `xxhash64` so results are fully
  * deterministic run-to-run, but the hash family is engine-specific →
  * no SQL oracle; SketchDedupSpec instead proves q49 reproduces the exact
  * n-gram-Jaccard pair set (q41) and q50 covers it.
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
    * posexplode, no (doc, perm) shuffle blowup.
    */
  private def signatures(s: SparkSession, d: String): DataFrame =
    TextOps.shingles(s, d)
      // native expression = one call per shingle; the 64-hash inner loop
      // is plain JVM code, not an interpreted lambda (same family as the
      // previous xxhash64(shingle, i) fold)
      .withColumn("perms",
        graft.functions.SketchExprs.minhashPerms(col("shingle"), NumPerms))
      .groupBy("doc_id")
      .agg(graft.functions.ArrayLongReduceAgg.arrayMinAgg(col("perms"))
        .as("sig_vec"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // MinHash + LSH banding + bucket join + exact verification at J>=0.8.
    "q49_dedup_minhash_lsh" -> ((s, d) => {
      val bandSigs = signatures(s, d)
        .withColumn("band", explode(expr(s"sequence(0, ${Bands - 1})")))
        .withColumn("sig", hash(expr(
          s"slice(sig_vec, band * $RowsPerBand + 1, $RowsPerBand)")))
        .select("doc_id", "band", "sig")
      val cand = bandSigs.as("a")
        .join(bandSigs.as("b"),
          col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
        .distinct()
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
    }),

    // SimHash: 64-bit sign-aggregated token hash; banded bucket join;
    // near-dups = hamming distance <= 3.
    "q50_dedup_simhash" -> ((s, d) => {
      val docs = graft.Tables.load(s, d, "documents")
      // Weighted-by-count ±1 bit arrays folded by the element-wise-sum
      // aggregate (map-side combinable — replaces a 64× posexplode
      // shuffle). Tokens collapse to (doc, hash, count) FIRST so the
      // 64-element bit expansion runs once per distinct token, not once
      // per occurrence — 10× fewer lambda evaluations on repetitive text.
      val sims = docs
        .withColumn("word", explode(split(col("text"), " ")))
        .withColumn("h", xxhash64(col("word")))
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
      banded.as("a")
        .join(banded.as("b"),
          col("a.k") === col("b.k") && col("a.band_val") === col("b.band_val")
            && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
          col("a.simhash").as("sh_a"), col("b.simhash").as("sh_b"))
        .distinct()
        .withColumn("hamming", expr("bit_count(sh_a ^ sh_b)"))
        .filter(col("hamming") <= 7)
        .select("id_a", "id_b", "hamming")
        .orderBy("id_a", "id_b")
    })
  )

  // Engine-specific hash family → no SQL oracle (driver records the
  // weaker rows-only check); determinism + recall proven in SketchDedupSpec.
  val oracleSql: Map[String, String] = Map.empty
}
