package graft.queries

import java.nio.file.{Files, Paths}
import java.time.ZoneOffset
import java.time.format.DateTimeFormatter

import graft.Tables
import graft.pinot.{SegmentWriter, VarByteChunkV4}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Puts the Pinot connector INSIDE the DuckDB-oracle gate: lineitem data
  * is written to Pinot v3 segments (dictionary longs/ints/doubles, dict
  * strings, RAW+LZ4 strings — every codec path), read back through
  * `spark.read.format("pinot")`, and aggregated; the oracle runs the same
  * aggregation over the original parquet. A mismatch anywhere in
  * metadata/dictionary/fixed-bit/VarByte encode→decode breaks the hash.
  */
object PinotRoundtrip {

  // fixed-width microsecond ISO format — matches DuckDB strftime '%f'
  private val TsFmt = DateTimeFormatter
    .ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'")
    .withZone(ZoneOffset.UTC)

  /** Build (once per sf dir) a 3-segment Pinot table from the first
    * 30,000 lineitem rows, ordered for determinism.
    */
  // bump when the subset/columns change — keys the /tmp cache so a stale
  // layout from an earlier build is never reused
  private val LayoutVersion = 1

  private def segmentTable(s: SparkSession, d: String): String = synchronized {
    val key = Paths.get(d).toAbsolutePath.toString.replaceAll("[^a-zA-Z0-9]", "_")
    val root = Paths.get(sys.props("java.io.tmpdir"),
      s"graft_pinot_rt_v$LayoutVersion$key")
    val tableDir = root.resolve("lineitemPinot_OFFLINE")
    if (!Files.exists(tableDir)) {
      val rows = Tables.load(s, d, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity",
          "l_extendedprice", "l_returnflag", "l_shipdate")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .limit(30000)
        .collect()
      val orderkey = rows.map(_.getLong(0))
      val linenumber = rows.map(_.getInt(1))
      val quantity = rows.map(_.getDouble(2))
      val price = rows.map(_.getDouble(3))
      val flag = rows.map(_.getString(4))
      val ship = rows.map(_.getAs[Any](5) match {
        case t: java.sql.Timestamp => TsFmt.format(t.toInstant)
        case i: java.time.Instant => TsFmt.format(i)
        case l: java.time.LocalDateTime => // TIMESTAMP_NTZ: wall-clock
          TsFmt.format(l.toInstant(ZoneOffset.UTC))
        case other => throw new IllegalStateException(
          s"unexpected timestamp class ${other.getClass}")
      })
      val n = rows.length
      val per = (n + 2) / 3
      for (seg <- 0 until 3) {
        val from = seg * per
        val to = math.min(n, (seg + 1) * per)
        if (from < to) {
          SegmentWriter.write(tableDir.resolve(f"seg$seg%04d"),
            "lineitemPinot", f"seg$seg%04d", Seq(
              SegmentWriter.LongCol("l_orderkey", orderkey.slice(from, to)),
              SegmentWriter.IntCol("l_linenumber", linenumber.slice(from, to)),
              SegmentWriter.DoubleCol("l_quantity", quantity.slice(from, to)),
              SegmentWriter.DoubleCol("l_extendedprice", price.slice(from, to)),
              SegmentWriter.StringDictCol("l_returnflag", flag.slice(from, to)),
              SegmentWriter.StringRawCol("l_shipdate", ship.slice(from, to),
                VarByteChunkV4.Lz4LengthPrefixed, 4096)))
        }
      }
    }
    tableDir.toString
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Aggregate over the segment-encoded copy; oracle aggregates the
    // original parquet — byte-exact decode or the hashes differ.
    "q65_pinot_roundtrip" -> ((s, d) => {
      val pinot = s.read.format("pinot").load(segmentTable(s, d))
      pinot
        .groupBy("l_returnflag")
        .agg(
          count(lit(1)).as("cnt"),
          sum("l_orderkey").as("sum_okey"),
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_price"),
          min("l_shipdate").as("min_ship"),
          max("l_shipdate").as("max_ship"))
        .orderBy("l_returnflag")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q65_pinot_roundtrip" ->
      """WITH subset AS (
        |  SELECT l_orderkey, l_quantity, l_extendedprice, l_returnflag,
        |    strftime(l_shipdate, '%Y-%m-%dT%H:%M:%S.%f') || 'Z' AS ship_s
        |  FROM (
        |    SELECT * FROM lineitem
        |    ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |    LIMIT 30000))
        |SELECT l_returnflag, count(*) AS cnt,
        |  CAST(sum(l_orderkey) AS BIGINT) AS sum_okey,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_price,
        |  min(ship_s) AS min_ship, max(ship_s) AS max_ship
        |FROM subset GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  )
}
