package graft.sources.pinot

import java.nio.file.{Files, Paths}

import graft.pinot.{PinotFormatException, PinotType}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hybrid OFFLINE + REALTIME table reads with Pinot's time-boundary
  * semantics (EXTENSION — the reference only falls back OFFLINE →
  * REALTIME, controller.rs:75-142; a real Pinot broker MERGES them):
  * offline segments answer `timeCol <= boundary`, realtime segments
  * answer `timeCol > boundary`, where the boundary is the maximum time
  * recorded across offline segments. Rows that were ingested into both
  * (the usual realtime/offline overlap while compaction catches up) are
  * therefore counted exactly once.
  *
  * Spark-first by construction: the result is `union` of two filtered
  * scans, so Catalyst pushes each side's boundary filter into the DSv2
  * scan where it drives min/max segment pruning (a realtime segment
  * entirely below the boundary never decodes) and sorted sub-segment
  * ranging on the straddling segment; the residual filter keeps row
  * exactness. At 100 TB nothing here is driver-heavy: the boundary
  * comes from cached segment metadata only.
  */
object PinotHybrid {

  /** Load `<root>/<table>_OFFLINE` ∪ `<table>_REALTIME` with
    * time-boundary dedup. Falls back to the single existing side when
    * the other is absent (reference behavior).
    */
  def load(spark: SparkSession, rootDir: String, table: String): DataFrame = {
    // IO-routed (r8): `rootDir` may be a URI — hybrid reads work over
    // remote tables the same as local ones
    val io = graft.pinot.SegmentIO.forPath(rootDir)
    val offDir = io.resolve(rootDir, s"${table}_OFFLINE")
    val rtDir = io.resolve(rootDir, s"${table}_REALTIME")
    val hasOff = io.isDirectory(offDir)
    val hasRt = io.isDirectory(rtDir)
    (hasOff, hasRt) match {
      case (true, false) => spark.read.format("pinot").load(offDir)
      case (false, true) => spark.read.format("pinot").load(rtDir)
      case (false, false) => throw new PinotFormatException(
        s"No ${table}_OFFLINE or ${table}_REALTIME under $rootDir")
      case (true, true) =>
        val off = spark.read.format("pinot").load(offDir)
        val rt = spark.read.format("pinot").load(rtDir)
        // reuse the table-open's (cached) discovery + prefetched
        // metadata — no second listing, no per-segment reads
        val segs = PinotSegmentTable.open(offDir).segmentDirs
        val metas = segs.map(PinotScan.segmentMeta)
        if (metas.exists(_ == null)) throw new PinotFormatException(
          s"Unreadable offline segment metadata under $offDir")
        val timeCol = metas.head.timeColumn.getOrElse(
          throw new PinotFormatException(
            s"Hybrid read of $table needs segment.time.column.name " +
              "(write with .option(\"timeColumn\", ...))"))
        val cm = metas.head.columns.getOrElse(timeCol,
          throw new PinotFormatException(s"Missing time column $timeCol"))
        // boundary = max recorded time across OFFLINE segments, from
        // cached metadata only (Pinot's broker time boundary)
        val bounds = metas.map(_.columns.get(timeCol).flatMap(_.maxValue))
        if (bounds.exists(_.isEmpty)) throw new PinotFormatException(
          s"Offline segments lack recorded max for time column $timeCol")
        val boundary = bounds.flatten.map(_.toLong).max
        val bLit = cm.dataType match {
          // stored epoch millis → the scan surfaces TimestampType micros
          case PinotType.PTimestamp =>
            timestamp_micros(lit(Math.multiplyExact(boundary, 1000L)))
          case PinotType.PInt => lit(boundary.toInt)
          case PinotType.PLong => lit(boundary)
          case other => throw new PinotFormatException(
            s"Unsupported time column type ${other.name}")
        }
        off.filter(col(timeCol) <= bLit)
          .unionByName(rt.filter(col(timeCol) > bLit))
    }
  }
}
