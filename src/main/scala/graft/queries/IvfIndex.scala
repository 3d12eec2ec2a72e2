package graft.queries

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted IVF (inverted-file) ANN index over the `embeddings` table
  * (EXTENSION — no reference counterpart; the pattern is FAISS's
  * IVF-flat, built once and queried many times).
  *
  * BUILD (once per corpus version): seed centroids from the label
  * column, one Lloyd iteration so cluster geometry follows the metric,
  * then write
  *   - `centroids/`  — (cluster, centroid) — tiny, broadcast at query;
  *   - `assignments/` — (vec_id, qvec, dotself) PARTITIONED BY cluster,
  * so the on-disk layout IS the inverted file: a probe of nprobe
  * clusters reads only those clusters' files (Spark partition pruning),
  * never the rest of the corpus. At 100 TB this is the difference
  * between scanning everything per query and reading nprobe/k of it.
  *
  * The index is keyed by a CORPUS FINGERPRINT (embedding parquet file
  * names + sizes + mtimes): a changed corpus gets a fresh build, an
  * unchanged one reuses the cached index across sessions. Builds land
  * in a tmp dir and rename in atomically — concurrent builders race
  * benignly (same content, first rename wins).
  */
object IvfIndex {

  /** Query-side fanout: each query searches its NProbe nearest clusters.
    * Storage-side fanout: each vector is stored in its MultiAssign
    * nearest clusters (FAISS-style multi-assignment / spilling).
    *
    * Operating point honesty: this corpus is ISOTROPIC (within-label
    * cosine ≈ 0.002 — no cluster structure), the adversarial case for
    * any partition-pruning ANN. Measured recall@5 at m=1/nprobe=3: 0.62.
    * The committed point (m=3, nprobe=5) measures 0.98 on every sf
    * fixture — chosen to meet the ≥0.95 recall gate (q48b) on this
    * data; a real clustered corpus runs the SAME machinery at m=1,
    * nprobe ≪ k, reading nprobe/k of the corpus per query.
    * Recall-vs-IO is a per-corpus SLO knob, not a constant of the
    * engine.
    */
  val NProbe = 5
  val MultiAssign = 3

  // per-user cache dir: a shared tmpdir root would hit permission
  // failures across OS users and trust any pre-existing _SUCCESS dir
  // regardless of who wrote it
  private[graft] def cacheRoot: Path =
    Paths.get(sys.props("java.io.tmpdir"),
      s"graft_ivf_cache_${sys.props.getOrElse("user.name", "unknown")}")

  /** Reuse only index dirs this user owns (or ownership is unreadable on
    * this filesystem — the per-user path already isolates in that case).
    */
  private def ownedByUs(dir: Path): Boolean =
    try {
      val owner = Files.getOwner(dir).getName
      owner == sys.props.getOrElse("user.name", owner)
    } catch { case _: Exception => true }

  /** Corpus version key from file metadata (immutable-file convention,
    * same basis as the driver's parquet fixtures): names, sizes, mtimes.
    */
  private def fingerprint(sfDir: String): String = {
    val src = Paths.get(sfDir, "embeddings.parquet")
    val parts: Seq[String] =
      if (Files.isDirectory(src)) {
        val listing = Files.list(src)
        try listing.iterator().asScala.map(p =>
          s"${p.getFileName}:${Files.size(p)}:" +
            s"${Files.getLastModifiedTime(p).toMillis}").toSeq.sorted
        finally listing.close()
      } else Seq(s"${Files.size(src)}:${Files.getLastModifiedTime(src).toMillis}")
    val md = java.security.MessageDigest.getInstance("MD5")
    // format-version salt: a layout change (e.g. multi-assignment) must
    // not reuse an index built under the old layout for the same corpus
    md.update(s"ivf_v2_m${MultiAssign}_".getBytes("UTF-8"))
    md.update(src.toAbsolutePath.toString.getBytes("UTF-8"))
    parts.foreach(p => md.update(p.getBytes("UTF-8")))
    md.digest().map(b => f"$b%02x").mkString
  }

  /** The index directory for `sfDir`'s embeddings, building it if this
    * corpus version has none yet. Thread-safe within a JVM; across
    * processes the atomic rename arbitrates.
    */
  def ensure(s: SparkSession, d: String, emb: DataFrame): Path = synchronized {
    val dir = cacheRoot.resolve(fingerprint(d))
    if (Files.exists(dir.resolve("_SUCCESS")) && ownedByUs(dir)) return dir
    Files.createDirectories(cacheRoot)
    val tmp = Files.createTempDirectory(cacheRoot, "build_")
    try buildInto(s, emb, tmp, dir)
    catch { case e: Throwable => deleteRecursively(tmp); throw e }
  }

  private def buildInto(s: SparkSession, emb: DataFrame, tmp: Path,
      dir: Path): Path = {

    def centroidsOf(assigned: DataFrame, key: String): DataFrame = assigned
      .select(col(key), posexplode(col("qvec")).as(Seq("pos", "v")))
      .groupBy(key, "pos").agg(avg(col("v")).as("c"))
      .groupBy(key).agg(expr(
        "transform(array_sort(collect_list(struct(pos, c))), s -> s.c)")
        .as("centroid"))

    def assign(cents: DataFrame, m: Int): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("vec_id").orderBy(desc("a_sim"), asc("cluster"))
      emb.crossJoin(broadcast(cents))
        .withColumn("a_sim", graft.functions.DoubleDotProduct.dotd(
          col("qvec").cast("array<double>"), col("centroid")) /
          sqrt(col("dotself").cast("double")))
        .withColumn("r", row_number().over(w))
        .filter(col("r") <= m)
        .select(col("vec_id"), col("qvec"), col("dotself"), col("cluster"))
    }

    // seed from labels, one Lloyd iteration (same construction the
    // inline q48 ran per query before the index was persisted). Centroid
    // geometry comes from PRIMARY assignments only; the final inverted
    // file stores each vector in its MultiAssign nearest clusters.
    val seeds = centroidsOf(emb, "label").withColumnRenamed("label", "cluster")
    val assigned = assign(seeds, 1)
    val cent = centroidsOf(assigned, "cluster")
    val clustered = assign(cent, MultiAssign)

    cent.coalesce(1).write.mode("overwrite")
      .parquet(tmp.resolve("centroids").toString)
    clustered.write.mode("overwrite").partitionBy("cluster")
      .parquet(tmp.resolve("assignments").toString)
    Files.writeString(tmp.resolve("_SUCCESS"), "")
    try Files.move(tmp, dir, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    catch {
      case _: java.nio.file.FileAlreadyExistsException
           | _: java.nio.file.DirectoryNotEmptyException =>
        deleteRecursively(tmp) // another builder won the race — same content
    }
    dir
  }

  def centroids(s: SparkSession, dir: Path): DataFrame =
    s.read.parquet(dir.resolve("centroids").toString)

  def assignments(s: SparkSession, dir: Path): DataFrame =
    s.read.parquet(dir.resolve("assignments").toString)

  private def deleteRecursively(p: Path): Unit =
    graft.pinot.PinotCompact.deleteRecursively(p)
}
