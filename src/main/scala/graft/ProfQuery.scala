package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dev-only single-query profiler (r16 optimization round): runs one
  * declared query at the given SF through the noop sink (guide §1.4),
  * then dumps the EXECUTED plan tree of the final run with each
  * operator's SQL metrics (rows, time in exchange/aggregate/sort,
  * spill) — the per-operator attribution the Spark UI would show,
  * without a UI. Not part of the driver contract.
  *
  * Usage: runMain graft.ProfQuery <sfDir> <queryName> [reps]
  */
object ProfQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // dev-only A/B hook: SPARK_GRAFT_EXTRA_CONF="k=v;k2=v2"
    val extra = sys.env.get("SPARK_GRAFT_EXTRA_CONF").toSeq
      .flatMap(_.split(';')).map(_.trim).filter(_.contains("="))
      .map { kv => val Array(k, v) = kv.split("=", 2); (k, v) }
    val spark0 = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "2m")
      .config("spark.sql.files.openCostInBytes", "262144")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2m")
      .config("spark.sql.codegen.cache.maxEntries", "8192")
    val spark = extra.foldLeft(spark0) { case (b, (k, v)) => b.config(k, v) }
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    @volatile var lastPlan: org.apache.spark.sql.execution.SparkPlan = null
    spark.listenerManager.register(
      new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            durationNs: Long): Unit = lastPlan = qe.executedPlan
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            exception: Exception): Unit = ()
      })

    val fn = SparkEntry.queries(name)
    def run(): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    run() // warm
    val times = (1 to reps).map(_ => run())
    println(f"[prof] $name times: ${times.map(t => f"$t%.3f").mkString(", ")} s")
    Thread.sleep(500) // listener bus drain
    // Dump the executed plan with per-node metrics, depth-indented.
    def walk(p: org.apache.spark.sql.execution.SparkPlan, depth: Int): Unit = {
      val ms = p.metrics.toSeq
        .map { case (k, m) => s"$k=${m.value}" }
        .filter(!_.endsWith("=0"))
        .mkString(", ")
      println(("  " * depth) + p.nodeName +
        (if (ms.nonEmpty) s"  [$ms]" else ""))
      p.children.foreach(walk(_, depth + 1))
      p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          walk(a.executedPlan, depth + 1)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          walk(q.plan, depth + 1)
        case r: org.apache.spark.sql.execution.ReusedSubqueryExec =>
          walk(r.child, depth + 1)
        case _ =>
      }
      p.subqueries.foreach { sq => println(("  " * (depth + 1)) + "<subquery>")
        walk(sq, depth + 2) }
    }
    if (lastPlan != null) walk(lastPlan, 0)
    spark.stop()
  }
}
