package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The streaming near-dup path (q172): incoming docs' LSH bands against
  * the persisted corpus bucket table.
  *
  *  - The per-ROW band computation ([[SketchDedup.bandsOver]]) must be
  *    bit-identical to the batch signature path ([[SketchDedup]]'s
  *    aggregate-based `signatures` + banding) — otherwise stream-side
  *    bands silently never match corpus-side stored buckets and every
  *    incoming doc reads as unique.
  *  - The stream is stateless (banding per row + stream-static semi
  *    join), but its OFFSETS must survive a checkpointed restart: a
  *    re-read double-flags (harmless here) while a LOST offset skips a
  *    wave of incoming docs entirely — the restart proof lands incoming
  *    docs in two waves around a full stop/restart.
  */
class StreamNearDupSpec extends SparkTestBase {

  import spark.implicits._

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

  test("near-dup flags survive a checkpointed restart between incoming waves") {
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val corpus = docs.filter(col("doc_id") % 10 < 8)
    val incoming = docs.filter(col("doc_id") % 10 >= 8)
      .select(col("doc_id"), col("text"))
    val work = java.nio.file.Files.createTempDirectory("neardup_restart")
    val bucketDir = work.resolve("buckets").toString
    SketchDedup.bandsOver(corpus).write.parquet(bucketDir)
    val buckets = spark.read.parquet(bucketDir)
    val inDir = work.resolve("incoming")
    java.nio.file.Files.createDirectories(inDir)
    val flaggedDir = work.resolve("flagged").toString
    incoming.select("doc_id").limit(0).write.parquet(flaggedDir)
    def runOnce(): Unit = {
      val q = SketchDedup.bandsOver(
        spark.readStream.schema(incoming.schema)
          .option("maxFilesPerTrigger", "1").parquet(inDir.toString))
        .join(buckets, Seq("band", "sig"), "left_semi")
        .select("doc_id")
        .writeStream
        .outputMode("append")
        .option("checkpointLocation", work.resolve("ckpt").toString)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.write.mode("append").parquet(flaggedDir)
        }
        .start()
      assert(q.awaitTermination(120000), "near-dup stream did not end")
    }
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
    val batchTwin = SketchDedup.bandsOver(incoming)
      .join(buckets, Seq("band", "sig"), "left_semi")
      .select("doc_id").as[Long].collect().toSet
    assert(streamed === batchTwin,
      "flag set after the restart differs from the batch twin")
  }
}
