package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pinot.{SegmentWriter, VarByteChunkV4}

/** Dev-only SAME-JVM interleaved A/B for the r8 pushdowns (top-N into
  * the aggregate scan, metadata-answered global SUM/AVG): rep-by-rep
  * alternation of the kill-switch system properties inside one JVM, so
  * box drift cancels and the deltas are attributable. Not part of the
  * driver contract.
  */
object ABPush {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val n = 97889
    val rnd = new scala.util.Random(42)
    val root = Files.createTempDirectory("ab_push")
    val tableDir = root.resolve("baseballStats_OFFLINE")
    SegmentWriter.write(tableDir.resolve("seg0"), "baseballStats", "seg0", Seq(
      SegmentWriter.IntCol("hits", Array.fill(n)(rnd.nextInt(263))),
      SegmentWriter.IntCol("homeRuns", Array.fill(n)(rnd.nextInt(60))),
      SegmentWriter.IntCol("strikeouts", Array.fill(n)(rnd.nextInt(200))),
      SegmentWriter.StringDictCol("teamID",
        Array.fill(n)(s"T${rnd.nextInt(30)}")),
      SegmentWriter.StringRawCol("playerID",
        Array.tabulate(n)(i => f"player$i%06d"),
        VarByteChunkV4.Lz4LengthPrefixed, 4096)))
    def table: DataFrame = spark.read.format("pinot").load(tableDir.toString)

    val shapes: Seq[(String, String, () => DataFrame)] = Seq(
      ("agg_sum_avg_max", "graft.pinot.disableMetaAgg", () => table.agg(
        sum("hits"), avg("homeRuns"), max("strikeouts"))),
      ("group_topk_dict", "graft.pinot.disableTopNPush", () => table
        .groupBy("teamID")
        .agg(count(lit(1)).as("games"), sum("hits").as("total_hits"))
        .orderBy(desc("total_hits")).limit(10)),
      ("group_topk_raw", "graft.pinot.disableTopNPush", () => table
        .groupBy("playerID").agg(avg("hits").as("avg_hits"))
        .orderBy(desc("avg_hits")).limit(10)))

    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    // warm both variants of every shape
    (1 to 2).foreach { _ =>
      shapes.foreach { case (_, prop, mk) =>
        System.clearProperty(prop); noop(mk())
        System.setProperty(prop, "true"); noop(mk())
        System.clearProperty(prop)
      }
    }

    val reps = 15
    for ((name, prop, mk) <- shapes) {
      val on = collection.mutable.ArrayBuffer.empty[Double]
      val off = collection.mutable.ArrayBuffer.empty[Double]
      (1 to reps).foreach { _ =>
        System.clearProperty(prop)
        var t0 = System.nanoTime(); noop(mk())
        on += (System.nanoTime() - t0) / 1e6
        System.setProperty(prop, "true")
        t0 = System.nanoTime(); noop(mk())
        off += (System.nanoTime() - t0) / 1e6
        System.clearProperty(prop)
      }
      def stats(xs: Seq[Double]) = {
        val s = xs.sorted; (s(s.length / 2), s.head)
      }
      val (onMed, onMin) = stats(on.toSeq)
      val (offMed, offMin) = stats(off.toSeq)
      println(f"$name%-18s ON med $onMed%6.1f min $onMin%6.1f | " +
        f"OFF med $offMed%6.1f min $offMin%6.1f | " +
        f"delta med ${offMed - onMed}%+6.1f min ${offMin - onMin}%+6.1f ms")
    }
    spark.stop()
  }
}
