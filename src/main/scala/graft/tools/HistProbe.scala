package graft.tools

import java.nio.file.Files

import graft.pinot.{SegmentWriter, VarByteChunkV4}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe for the group-topk DSv2 marginal (not part of the driver
  * contract): prints the executed plan and per-stage timings of the
  * PinotBench group shapes.
  */
object HistProbe {
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
    val root = Files.createTempDirectory("hist_probe")
    val tableDir = root.resolve("b_OFFLINE")
    SegmentWriter.write(tableDir.resolve("seg0"), "b", "seg0", Seq(
      SegmentWriter.IntCol("hits", Array.fill(n)(rnd.nextInt(263))),
      SegmentWriter.StringDictCol("teamID", Array.fill(n)(s"T${rnd.nextInt(30)}")),
      SegmentWriter.StringRawCol("playerID",
        Array.tabulate(n)(i => f"player$i%06d"),
        VarByteChunkV4.Lz4LengthPrefixed, 4096)))
    def table: DataFrame = spark.read.format("pinot").load(tableDir.toString)

    val dict = table.groupBy("teamID")
      .agg(count(lit(1)).as("games"), sum("hits").as("total_hits"))
      .orderBy(desc("total_hits")).limit(10)
    println("=== group_topk_dict executed plan ===")
    dict.collect()
    println(dict.queryExecution.executedPlan.toString.take(2000))

    def time(label: String, mk: () => DataFrame, write: Boolean): Unit = {
      (1 to 3).foreach(_ => if (write) mk().write.mode("overwrite").format("noop").save() else mk().collect())
      val ts = (1 to 7).map { _ =>
        val t0 = System.nanoTime()
        if (write) mk().write.mode("overwrite").format("noop").save() else mk().collect()
        (System.nanoTime() - t0) / 1e6
      }.sorted
      println(f"$label%-28s median=${ts(3)}%8.2f ms  min=${ts.head}%8.2f")
    }
    def mkDict() = table.groupBy("teamID")
      .agg(count(lit(1)).as("games"), sum("hits").as("total_hits"))
      .orderBy(desc("total_hits")).limit(10)
    time("dict collect", () => mkDict(), write = false)
    time("dict noop-write", () => mkDict(), write = true)
    time("count_star", () => table.agg(count(lit(1)).as("c")), write = true)
    time("plan-only (reuse df)", () => dict, write = false)
    // split planning from execution for a fresh dict-group query
    (1 to 3).foreach(_ => mkDict().queryExecution.executedPlan)
    val pts = (1 to 7).map { _ =>
      val df = mkDict()
      val t0 = System.nanoTime()
      df.queryExecution.executedPlan
      (System.nanoTime() - t0) / 1e6
    }.sorted
    println(f"dict plan-build only          median=${pts(3)}%8.2f ms")
    val ets = (1 to 7).map { _ =>
      val df = mkDict()
      df.queryExecution.executedPlan
      val t0 = System.nanoTime()
      df.collect()
      (System.nanoTime() - t0) / 1e6
    }.sorted
    println(f"dict exec-after-plan          median=${ets(3)}%8.2f ms")

    val raw = () => table.groupBy("playerID").agg(avg("hits").as("a"))
      .orderBy(desc("a")).limit(10)
    raw().collect()
    println("=== group_topk_raw leaf ===")
    println(raw().queryExecution.executedPlan.collectLeaves().head.toString.take(400))
    time("raw collect", raw, write = false)
    spark.stop()
  }
}
