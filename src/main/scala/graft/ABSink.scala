package graft

import java.nio.file.Files

import graft.pinot.{SegmentWriter, VarByteChunkV4}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only SAME-JVM interleaved A/B of the bench EXECUTION PROTOCOL:
  * `noop` DSv2 write vs `executedPlan.executeCollect()`. The reference
  * times `ctx.sql(...)` + `df.collect()` (benchmark.rs:24-27) — collect
  * of Arrow batches, no write path — so executeCollect (InternalRows,
  * no external-Row conversion) is the like-for-like Spark analog, and
  * the noop write's V2 commit machinery is cost the reference never
  * pays. Rep-by-rep alternation inside one JVM so box drift cancels.
  */
object ABSink {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "8192")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val n = 97889
    val rnd = new scala.util.Random(42)
    val root = Files.createTempDirectory("ab_sink")
    val tableDir = root.resolve("baseballStats_OFFLINE")
    SegmentWriter.write(tableDir.resolve("seg0"), "baseballStats", "seg0", Seq(
      SegmentWriter.IntCol("hits", Array.fill(n)(rnd.nextInt(263))),
      SegmentWriter.IntCol("homeRuns", Array.fill(n)(rnd.nextInt(60))),
      SegmentWriter.IntCol("strikeouts", Array.fill(n)(rnd.nextInt(200))),
      SegmentWriter.StringDictCol("teamID",
        Array.fill(n)(s"T${rnd.nextInt(30)}")),
      SegmentWriter.StringDictCol("playerName",
        Array.fill(n)(s"name${rnd.nextInt(5000)}")),
      SegmentWriter.StringRawCol("playerID",
        Array.tabulate(n)(i => f"player$i%06d"),
        VarByteChunkV4.Lz4LengthPrefixed, 4096)))
    def table: DataFrame = spark.read.format("pinot").load(tableDir.toString)

    val shapes: Seq[(String, () => DataFrame)] = Seq(
      "count_star" -> (() => table.agg(count(lit(1)).as("c"))),
      "scan_dict_cols" -> (() => table.select("playerName", "hits", "homeRuns")),
      "scan_raw_col" -> (() => table.select("playerID", "hits", "homeRuns")),
      "agg_sum_avg_max" -> (() => table.agg(
        sum("hits"), avg("homeRuns"), max("strikeouts"))),
      "group_topk_dict" -> (() => table.groupBy("teamID")
        .agg(count(lit(1)).as("games"), sum("hits").as("total_hits"))
        .orderBy(desc("total_hits")).limit(10)),
      "group_topk_raw" -> (() => table.groupBy("playerID")
        .agg(avg("hits").as("avg_hits"))
        .orderBy(desc("avg_hits")).limit(10)),
      "projection_limit" -> (() => table.select("playerID", "hits").limit(10)))

    def runNoop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    var sink = 0L
    def runCollect(df: DataFrame): Unit =
      sink += df.queryExecution.executedPlan.executeCollect().length

    // warm both protocols on every shape
    (1 to 2).foreach { _ =>
      shapes.foreach { case (_, mk) => runNoop(mk()); runCollect(mk()) }
    }

    val reps = 9
    val res = shapes.map { case (name, mk) =>
      val a = new Array[Double](reps) // noop
      val b = new Array[Double](reps) // collect
      (0 until reps).foreach { r =>
        // alternate order within the pair each rep to cancel drift
        val t0 = System.nanoTime()
        if (r % 2 == 0) runNoop(mk()) else runCollect(mk())
        val t1 = System.nanoTime()
        if (r % 2 == 0) runCollect(mk()) else runNoop(mk())
        val t2 = System.nanoTime()
        val (tn, tc) =
          if (r % 2 == 0) ((t1 - t0) / 1e9, (t2 - t1) / 1e9)
          else (((t2 - t1) / 1e9, (t1 - t0) / 1e9))
        a(r) = tn; b(r) = tc
      }
      val am = a.sorted.apply(reps / 2); val bm = b.sorted.apply(reps / 2)
      println(f"$name%-18s noop=${am * 1000}%7.1f ms  collect=${bm * 1000}%7.1f ms  delta=${(am - bm) * 1000}%+6.1f ms")
      (name, am, bm)
    }
    val at = res.map(_._2).sum; val bt = res.map(_._3).sum
    println(f"TOTAL              noop=${at * 1000}%7.1f ms  collect=${bt * 1000}%7.1f ms  delta=${(at - bt) * 1000}%+6.1f ms")
    if (sink == Long.MinValue) println("") // defeat DCE
    spark.stop()
  }
}
