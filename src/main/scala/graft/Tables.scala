package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet testdata (TESTDATA.md).
  *
  * A table is a single parquet file under `sfDir`; Spark's built-in
  * parquet DataSource V2 gives column pruning + predicate pushdown for
  * free, mirroring how the reference delegates its scan to DataFusion
  * (reference: datafusion-pinot/src/table.rs:158-170).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark 4 refuses
      // ([PARQUET_TYPE_ILLEGAL]). Read nanos as long and rebuild a
      // microsecond timestamp. Integer `div` (not `/`) — ns-since-epoch
      // exceeds double's 53-bit mantissa, float division would corrupt it.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$sfDir/$name.parquet")
        .withColumn("ts", org.apache.spark.sql.functions.expr(
          "timestamp_micros(ts div 1000)"))
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }
  }

  /** Register every table as a temp view for SQL entry points. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
