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
      // The generator has shipped events.ts as either parquet
      // TIMESTAMP(NANOS) (which Spark 4 only reads via the nanosAsLong
      // legacy flag, as a long) or plain timestamp[us]. Branch on the
      // type Spark actually loaded rather than assuming either vintage:
      //  - LongType           → nanos: rebuild a microsecond timestamp.
      //    Integer `div` (not `/`) — ns-since-epoch exceeds double's
      //    53-bit mantissa, float division would corrupt it.
      //  - TimestampNTZType   → cast to session-local TimestampType
      //    (sessions pin UTC, so the instant is unchanged); downstream
      //    window/watermark code and the DuckDB oracle expect LTZ.
      //  - TimestampType      → already what we want.
      import org.apache.spark.sql.functions.{col, expr}
      import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$sfDir/$name.parquet")
      raw.schema("ts").dataType match {
        case LongType         => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
        case TimestampType    => raw
        case other            =>
          // Fail HERE with a named message: an unrecognized vintage
          // passed through silently would surface as a DATATYPE_MISMATCH
          // deep inside some window expression instead (the r6 outage
          // mode). SchemaDriftSpec turns this into one red test.
          throw new IllegalStateException(
            s"events.ts loaded as $other — testdata regenerated with a new " +
              "vintage; teach Tables.load to normalize it to TimestampType")
      }
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }
  }

  /** Register every table as a temp view for SQL entry points. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
