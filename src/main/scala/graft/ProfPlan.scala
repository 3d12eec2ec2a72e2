package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pinot.{SegmentWriter, VarByteChunkV4}

/** Dev-only planning-vs-execution attribution for the PinotBench shapes:
  * times (a) Catalyst analysis+optimization+physical planning alone and
  * (b) execution of a pre-built physical plan, for the top-marginal
  * shapes, so optimization effort goes where the milliseconds are.
  * Not part of the driver contract.
  */
object ProfPlan {
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
    val root = Files.createTempDirectory("prof_plan")
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
      "agg_sum_avg_max" -> (() => table.agg(
        sum("hits"), avg("homeRuns"), max("strikeouts"))),
      "group_topk_dict" -> (() => table.groupBy("teamID")
        .agg(count(lit(1)).as("games"), sum("hits").as("total_hits"))
        .orderBy(desc("total_hits")).limit(10)),
      "group_topk_raw" -> (() => table.groupBy("playerID")
        .agg(avg("hits").as("avg_hits"))
        .orderBy(desc("avg_hits")).limit(10)))

    def time(label: String)(f: => Unit): Unit = {
      (1 to 3).foreach(_ => f)
      val ts = (1 to 7).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
      }.sorted
      println(f"$label%-34s median ${ts(3)}%7.2f ms  min ${ts.head}%7.2f ms  all ${ts.map(t => f"$t%.1f").mkString(",")}")
    }

    // capture the ACTUAL executed plan of each noop write (it can differ
    // from df.queryExecution.executedPlan: the write re-plans)
    @volatile var lastWritePlan: String = ""
    spark.listenerManager.register(
      new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            durationNs: Long): Unit =
          lastWritePlan = qe.executedPlan.toString
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            exception: Exception): Unit = ()
      })

    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    // global warm
    (1 to 2).foreach(_ => shapes.foreach { case (_, mk) => noop(mk()) })

    for ((name, mk) <- shapes) {
      time(s"$name plan-only") {
        mk().queryExecution.executedPlan
      }
      val planned = mk()
      planned.queryExecution.executedPlan // force once
      time(s"$name exec-preplanned") {
        planned.queryExecution.executedPlan.executeCollect()
      }
      time(s"$name full-noop") { noop(mk()) }
      Thread.sleep(200) // let the listener bus drain
      println("write-side executed plan:")
      println(lastWritePlan.linesIterator.take(10).mkString("\n"))
      println("---")
    }
    spark.stop()
  }
}
