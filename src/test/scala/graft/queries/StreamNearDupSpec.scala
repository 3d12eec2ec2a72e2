package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.functions._

/** The streaming near-dup path (q172): incoming docs' LSH bands against
  * the persisted corpus bucket table.
  *
  *  - The per-ROW band computation ([[SketchDedup.bandsOver]]) must be
  *    bit-identical to the batch signature path ([[SketchDedup]]'s
  *    aggregate-based `signatures` + banding) — otherwise stream-side
  *    bands silently never match corpus-side stored buckets and every
  *    incoming doc reads as unique.
  *  - The per-batch join must keep the corpus-sized bucket side
  *    exchange-free (it streams through a BroadcastHashJoin built from
  *    the micro-batch's bands) — the 100 TB property; a plan test pins
  *    it so a lost broadcast hint or a join-side flip fails loudly.
  *  - The stream is stateless (banding per row + a per-batch join
  *    against the standing table), but its OFFSETS must survive a
  *    checkpointed restart: a re-read double-flags (harmless here)
  *    while a LOST offset skips a wave of incoming docs entirely — the
  *    restart proof lands incoming docs in two waves around a full
  *    stop/restart.
  *  - With `grow = true` (the production ingest mode) surviving docs'
  *    bands join the bucket table per batch, so wave-2 docs must dedup
  *    against wave-1 SURVIVORS — and only survivors — across a restart.
  */
class StreamNearDupSpec extends SparkTestBase {

  import spark.implicits._

  private def allNodes(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case other => other.children
    }
    p +: kids.flatMap(allNodes)
  }

  test("stream-side bands are bit-identical to the batch signature path") {
    val batch = SketchDedup.signatures(spark, sfDir, neutral = true)
      .withColumn("band", explode(expr("sequence(0, 15)")))
      .withColumn("sig", md5(concat_ws(",", expr(
        "transform(slice(sig_vec, band * 4 + 1, 4), x -> CAST(x AS STRING))"))))
      .select("doc_id", "band", "sig")
      .as[(Long, Int, String)].collect().toSet
    val perRow = SketchDedup.bandsOver(
      graft.Tables.load(spark, sfDir, "documents"))
      .as[(Long, Int, String)].collect().toSet
    assert(perRow === batch,
      "per-row banding diverged from the batch signature path")
  }

  test("per-batch join: corpus bucket side crosses NO exchange; " +
      "the micro-batch bands broadcast") {
    val work = java.nio.file.Files.createTempDirectory("neardup_plan")
    val bucketRoot = work.resolve("buckets").toString
    val corpus = Seq((1L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    SketchDedup.bandsOver(corpus).write
      .parquet(s"$bucketRoot/ingest_batch=-1")
    // the same read + prune runNearDup's foreachBatch performs
    val buckets = spark.read.parquet(bucketRoot)
      .filter(col("ingest_batch") < 0L)
    val bands = SketchDedup.bandsOver(
      Seq((100L, "alpha beta gamma delta epsilon zeta"),
        (101L, "one two three four five six")).toDF("doc_id", "text"))
    val flagged = SketchDedup.flaggedAgainst(buckets, bands)
    assert(flagged.as[Long].collect().toSet === Set(100L))
    val plan = flagged.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val nodes = allNodes(plan)
    assert(nodes.exists(_.isInstanceOf[BroadcastHashJoinExec]),
      s"expected a BroadcastHashJoin (micro-batch bands built), got:\n$plan")
    assert(!nodes.exists(_.isInstanceOf[SortMergeJoinExec]),
      s"corpus side must not sort-merge:\n$plan")
    // the join's whole subtree (corpus scan included) is exchange-free:
    // the only shuffle in the per-batch job is the distinct ABOVE it
    val joinSubtree = nodes.collectFirst {
      case j: BroadcastHashJoinExec => allNodes(j)
    }.get
    assert(!joinSubtree.exists(_.isInstanceOf[ShuffleExchangeLike]),
      s"corpus bucket side must cross no exchange:\n$plan")
    // column pruning: the corpus scan reads (band, sig) only — no doc
    // payloads cross the 100 TB read
    val scans = joinSubtree.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    scans.foreach { s =>
      val out = s.output.map(_.name).toSet
      assert(out.subsetOf(Set("band", "sig", "ingest_batch")),
        s"corpus scan must prune to (band, sig), read: $out")
    }
  }

  test("near-dup flags survive a checkpointed restart between incoming waves") {
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val corpus = docs.filter(col("doc_id") % 10 < 8)
    val incoming = docs.filter(col("doc_id") % 10 >= 8)
      .select(col("doc_id"), col("text"))
    val work = java.nio.file.Files.createTempDirectory("neardup_restart")
    val bucketRoot = work.resolve("buckets").toString
    SketchDedup.bandsOver(corpus).write
      .parquet(s"$bucketRoot/ingest_batch=-1")
    val inDir = work.resolve("incoming")
    java.nio.file.Files.createDirectories(inDir)
    val flaggedDir = work.resolve("flagged").toString
    incoming.select("doc_id").limit(0).write.parquet(flaggedDir)
    def runOnce(): Unit = SketchDedup.runNearDup(spark, inDir.toString,
      incoming.schema, bucketRoot, work.resolve("ckpt").toString,
      flaggedDir, grow = false, timeoutMs = 120000)
    // wave 1: half the incoming docs land; full drain; stop
    incoming.filter(col("doc_id") % 20 >= 18).coalesce(1)
      .write.mode("append").parquet(inDir.toString)
    runOnce()
    // wave 2 (RESTART from the checkpoint): the other half lands — a
    // lost offset would skip it, a re-read of wave 1 only double-flags
    incoming.filter(col("doc_id") % 20 < 18).coalesce(1)
      .write.mode("append").parquet(inDir.toString)
    runOnce()
    val streamed = spark.read.parquet(flaggedDir)
      .as[Long].collect().toSet
    val buckets = spark.read.parquet(bucketRoot)
    val batchTwin = SketchDedup.bandsOver(incoming)
      .join(buckets, Seq("band", "sig"), "left_semi")
      .select("doc_id").as[Long].collect().toSet
    assert(streamed === batchTwin,
      "flag set after the restart differs from the batch twin")
  }

  test("grow mode: wave-2 docs dedup against wave-1 SURVIVORS across a " +
      "restart; flagged docs never join the bucket table") {
    val work = java.nio.file.Files.createTempDirectory("neardup_grow")
    val bucketRoot = work.resolve("buckets").toString
    val corpusText = "alpha beta gamma delta epsilon zeta eta theta"
    val noveltyText = "red orange yellow green blue indigo violet pink"
    SketchDedup.bandsOver(Seq((1L, corpusText)).toDF("doc_id", "text"))
      .write.parquet(s"$bucketRoot/ingest_batch=-1")
    val inDir = work.resolve("incoming")
    java.nio.file.Files.createDirectories(inDir)
    val flaggedDir = work.resolve("flagged").toString
    val schema = Seq((0L, "")).toDF("doc_id", "text").schema
    Seq.empty[Long].toDF("doc_id").write.parquet(flaggedDir)
    def runOnce(): Unit = SketchDedup.runNearDup(spark, inDir.toString,
      schema, bucketRoot, work.resolve("ckpt").toString,
      flaggedDir, grow = true, timeoutMs = 120000)
    // wave 1 (batch 0): doc 100 is novel (survives), doc 101 duplicates
    // the corpus (flagged — its bands must NOT be appended)
    Seq((100L, noveltyText), (101L, corpusText)).toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(inDir.toString)
    runOnce()
    // wave 2 (batch 1, after a RESTART): doc 200 duplicates wave-1
    // SURVIVOR 100 (must be flagged — only possible if 100's bands were
    // appended), doc 201 is novel (survives)
    Seq((200L, noveltyText),
      (201L, "sun moon star cloud rain snow wind storm"))
      .toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(inDir.toString)
    runOnce()
    val flagged = spark.read.parquet(flaggedDir).as[Long].collect().toSet
    assert(flagged === Set(101L, 200L),
      s"expected {101 (vs corpus), 200 (vs wave-1 survivor)}, got $flagged")
    // the bucket table grew by exactly the survivors, batch by batch
    val buckets = spark.read.parquet(bucketRoot)
      .select(col("ingest_batch").cast("long"), col("doc_id"))
      .distinct().as[(Long, Long)].collect().toSet
    assert(buckets === Set((-1L, 1L), (0L, 100L), (1L, 201L)),
      s"bucket table partitions diverged: $buckets")
  }
}
