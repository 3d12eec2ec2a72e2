package graft
import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pinot.{SegmentWriter, VarByteChunkV4}
object TopNProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = 2000000
    val root = Files.createTempDirectory("topn_probe")
    val t = root.resolve("p_OFFLINE")
    val score = Array.tabulate(n)(i => i * 2654435761L % 1000000007L)
    val body = Array.tabulate(n)(i => s"payload-$i-" + ("x" * 40))
    SegmentWriter.write(t.resolve("seg0"), "p", "seg0", Seq(
      SegmentWriter.LongRawCol("score", score),
      SegmentWriter.StringRawCol("body", body,
        VarByteChunkV4.Lz4LengthPrefixed, 65536)))
    def q = spark.read.format("pinot").load(t.toString)
      .orderBy(desc("score")).limit(20)
    def noop(df: org.apache.spark.sql.DataFrame) =
      df.write.mode("overwrite").format("noop").save()
    def time(label: String)(f: => Unit): Unit = {
      (1 to 2).foreach(_ => f)
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6 }.sorted
      println(f"$label%-12s median ${ts(2)}%7.1f ms  min ${ts.head}%7.1f ms")
    }
    println(q.queryExecution.executedPlan.collectLeaves().head.toString.take(300))
    time("topn ON") { noop(q) }
    System.setProperty("graft.pinot.disableTopNPush", "true")
    time("topn OFF") { noop(q) }
    System.clearProperty("graft.pinot.disableTopNPush")
    // interleaved confirmation
    val on = collection.mutable.ArrayBuffer.empty[Double]
    val off = collection.mutable.ArrayBuffer.empty[Double]
    (1 to 7).foreach { _ =>
      System.clearProperty("graft.pinot.disableTopNPush")
      var t0 = System.nanoTime(); noop(q); on += (System.nanoTime() - t0) / 1e6
      System.setProperty("graft.pinot.disableTopNPush", "true")
      t0 = System.nanoTime(); noop(q); off += (System.nanoTime() - t0) / 1e6
    }
    System.clearProperty("graft.pinot.disableTopNPush")
    println(f"interleaved ON ${on.sorted.apply(3)}%7.1f OFF ${off.sorted.apply(3)}%7.1f ms")
    spark.stop()
  }
}
