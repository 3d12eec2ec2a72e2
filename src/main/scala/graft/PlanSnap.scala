package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Dev tool (r16 optimization round): dump explain("formatted") for the
  * named queries into plans/<tag>/<query>_<suffix>.txt — the before/after
  * plan evidence the optimization deliverable requires. Unlike PlanDump
  * (curated PLANS.md), this writes one file per query so a diff shows
  * exactly what an optimization changed.
  *
  * Usage: runMain graft.PlanSnap <sfDir> <outDir> <suffix> <q1,q2,...|all>
  */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = Paths.get(args(1))
    val suffix = args(2)
    val names =
      if (args(3) == "all") SparkEntry.queries.keys.toSeq.sorted
      else args(3).split(',').map(_.trim).filter(_.nonEmpty).toSeq
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(outDir)
    for (name <- names) {
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(outDir.resolve(s"${name}_$suffix.txt"), plan)
        println(s"[plansnap] $name ok")
      } catch { case e: Throwable =>
        println(s"[plansnap] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
