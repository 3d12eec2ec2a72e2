package graft.queries

import graft.Tables
import graft.operators.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal query surface over the synthesized media table. */
object Media {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Binary + metadata plumbing, SQL-side only → oracle-checked: per-
    // format size stats over the payload bytes.
    "q55_media_meta" -> ((s, d) =>
      Multimodal.mediaTable(Tables.load(s, d, "documents"))
        .groupBy("fmt")
        .agg(
          count(lit(1)).as("cnt"),
          sum(octet_length(col("payload"))).as("total_bytes"),
          max("width").as("max_w"), max("height").as("max_h"))
        .orderBy("fmt")),

    // Full decode path (mapPartitions stub): deterministic features →
    // relational aggregation. JVM-side decode → rows-only for the driver;
    // MultimodalSpec asserts exact values.
    "q56_media_features" -> ((s, d) =>
      Multimodal.features(s, Tables.load(s, d, "documents")).toDF()
        .groupBy("fmt")
        .agg(
          count(lit(1)).as("cnt"),
          round(avg("brightness"), 4).as("avg_brightness"),
          countDistinct(col("checksum")).as("distinct_payloads"))
        .orderBy("fmt"))
  )

  val oracleSql: Map[String, String] = Map(
    "q55_media_meta" ->
      """SELECT fmt, count(*) AS cnt,
        |  CAST(sum(octet_length(payload)) AS BIGINT) AS total_bytes,
        |  max(width) AS max_w, max(height) AS max_h
        |FROM (
        |  SELECT doc_id,
        |    ['png', 'jpeg', 'webp'][CAST(doc_id % 3 AS INTEGER) + 1] AS fmt,
        |    CAST(doc_id % 16 * 64 + 256 AS INTEGER) AS width,
        |    CAST(doc_id % 9 * 64 + 256 AS INTEGER) AS height,
        |    encode(text) AS payload
        |  FROM documents)
        |GROUP BY fmt ORDER BY fmt""".stripMargin
  )
}
