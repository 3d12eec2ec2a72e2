package graft.sources.pinot

import graft.functions.{BitmapMergeAgg, KmvSketchAgg}
import graft.pinot.{PinotFormatException, SegmentIO, SegmentReader, SketchSection}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Query-time merge of SEGMENT-STORED distinct sketches (written via
  * `.option("sketchColumns", ...)` — see [[graft.pinot.SketchSection]]):
  * the analog of Pinot answering DISTINCT_COUNT_THETA_SKETCH /
  * DISTINCT_COUNT_BITMAP from ingestion-time sketches by merging stored
  * summaries, never re-scanning raw rows.
  *
  * Plan shape at 100 TB: ONE task per segment opens the segment's
  * metadata + index map and range-reads ONLY the few-KB sketch section
  * (the forward index — the petabyte part — is never touched;
  * SketchSectionSpec counts the IO to prove it), then a single partial
  * aggregate merges: one bitmap / one ≤k hash array per partition
  * crosses the wire. Against a year of segments this is KBs of IO per
  * segment instead of a full-column scan.
  */
object PinotSketches {

  private def segDirs(tableDir: String): Seq[String] = {
    val dirs = PinotSegments.discoverDirs(tableDir, SegmentIO.forPath(tableDir))
    if (dirs.isEmpty)
      throw new PinotFormatException(s"no segments under $tableDir")
    dirs
  }

  /** Per-segment stored sketch payloads for `column`, one row per
    * segment: (segment, sketch bytes). Fails loudly if any segment lacks
    * the sketch — a silent partial merge would under-count.
    */
  def segmentSketches(s: SparkSession, tableDir: String,
      column: String): DataFrame =
    sketchesOf(s, segDirs(tableDir), column)

  private def sketchesOf(s: SparkSession, dirs: Seq[String],
      column: String): DataFrame = {
    import s.implicits._
    val slices = math.max(1, math.min(dirs.size,
      4 * s.sparkContext.defaultParallelism))
    s.sparkContext.parallelize(dirs, slices)
      .map { dir =>
        val r = SegmentReader.open(dir, SegmentIO.forPath(dir))
        try {
          val bytes = r.sketchBytes(column).getOrElse(
            throw new PinotFormatException(
              s"segment $dir has no stored sketch for column $column"))
          (dir, bytes)
        } finally r.close()
      }
      .toDF("segment", "sketch")
  }

  /** Segment classification against an inclusive time slice on an
    * integral time column, from METADATA alone (min/max recorded per
    * column at write time — no column data touched):
    * (fully-inside dirs, boundary dirs, total docs of the inside set).
    */
  private def classifyByTime(tableDir: String, timeCol: String,
      loMs: Long, hiMs: Long): (Seq[String], Seq[String], Long) = {
    var insideDocs = 0L
    val inside = Seq.newBuilder[String]
    val boundary = Seq.newBuilder[String]
    segDirs(tableDir).foreach { dir =>
      val r = SegmentReader.open(dir, SegmentIO.forPath(dir))
      try {
        val cm = r.metadata.column(timeCol)
        val (mn, mx) = (for {
          a <- cm.minValue; b <- cm.maxValue
          al <- a.toLongOption; bl <- b.toLongOption
        } yield (al, bl)).getOrElse(throw new PinotFormatException(
          s"time slice: segment $dir has no integral min/max metadata " +
            s"for $timeCol (integral time columns only)"))
        if (mn >= loMs && mx <= hiMs) {
          inside += dir
          insideDocs += r.metadata.totalDocs
        } else if (mx >= loMs && mn <= hiMs) {
          boundary += dir
        } // else: fully outside — pruned from metadata alone
      } finally r.close()
    }
    (inside.result(), boundary.result(), insideDocs)
  }

  /** TIME-SLICED lambda merge (the production read path for "DISTINCT
    * over the last N days" against a year of segments): exact distinct
    * count of `column` over rows with `timeCol` ∈ [loMs, hiMs], where
    *
    *  - segments fully INSIDE the slice answer from their stored BITMAP
    *    sketch sections (KB-scale reads, zero forward-index IO — the
    *    q145/q150 path) and contribute their metadata `totalDocs` to the
    *    row count without any IO at all;
    *  - segments fully OUTSIDE prune from min/max metadata alone;
    *  - only BOUNDARY segments scan rows — through the normal DSv2 read
    *    with the time filter PUSHED (min/max + sorted pruning apply
    *    inside the segment), folded into a query-time
    *    [[graft.functions.SketchBuildAgg]] payload.
    *
    * One merge aggregate folds stored and query-time payloads (the
    * xxhash64-seed-42 contract); output: (`as`, `rowsAs`) — exact
    * distinct + exact row count over the slice. At 100 TB with daily
    * segments, a 30-day slice reads 30 sketch sections, scans at most
    * 2 boundary segments, and never touches the other 335 days.
    */
  def timeSlicedBitmapDistinct(s: SparkSession, tableDir: String,
      column: String, timeCol: String, loMs: Long, hiMs: Long,
      as: String = "distinct_count", rowsAs: String = "slice_rows"): DataFrame = {
    val (payloads, boundaryRows, insideDocs) = timeSlicedPayloads(
      s, tableDir, column, "bitmap", timeCol, loMs, hiMs)
    payloads match {
      case None =>
        // every segment pruned from metadata: the slice is empty — the
        // EXACT answer is zero of each, no IO at all
        s.range(1).select(lit(0L).as(as), lit(0L).as(rowsAs))
      case Some(p) =>
        val distinct = p
          .agg(BitmapMergeAgg.bitmapMergeDistinct(col("sketch")).as(as))
        val rows = boundaryRows match {
          case Some(b) => b.agg((count(lit(1)) + lit(insideDocs)).as(rowsAs))
          case None => s.range(1).select(lit(insideDocs).as(rowsAs))
        }
        distinct.crossJoin(rows)
    }
  }

  /** Time-sliced PERCENTILE_KLL ("p99 over the last N days"): quantiles
    * of `column` over rows with `timeCol` ∈ [loMs, hiMs], through the
    * same inside-sections / metadata-prune / boundary-scan split as
    * [[timeSlicedBitmapDistinct]]. Exact nearest-rank while the merged
    * sketch (inside sections + the boundary query-time sketch) stays
    * below k. NULL quantile elements when the slice is empty.
    */
  def timeSlicedKllQuantiles(s: SparkSession, tableDir: String,
      column: String, timeCol: String, loMs: Long, hiMs: Long,
      k: Int, qs: Seq[Double], as: String = "quantiles"): DataFrame = {
    val (payloads, _, _) = timeSlicedPayloads(
      s, tableDir, column, s"kll$k", timeCol, loMs, hiMs)
    payloads
      // an all-pruned slice still answers (NULL elements) through the
      // same aggregate over zero payload rows
      .getOrElse(s.range(0).select(lit(Array.empty[Byte]).as("sketch")))
      .agg(graft.functions.KllMergeAgg
        .kllMergeQuantiles(col("sketch"), k, qs).as(as))
  }

  /** The time-sliced payload stream shared by the public readers:
    * stored sections of fully-inside segments ∪ one query-time
    * [[graft.functions.SketchBuildAgg]] payload over the boundary
    * segments' sliced rows. Returns (payloads — None when the slice
    * matches nothing, boundary row stream, inside-docs count).
    */
  private def timeSlicedPayloads(s: SparkSession, tableDir: String,
      column: String, spec: String, timeCol: String, loMs: Long,
      hiMs: Long): (Option[DataFrame], Option[DataFrame], Long) = {
    require(loMs <= hiMs, s"time slice: lo $loMs > hi $hiMs")
    val (inside, boundary, insideDocs) = classifyByTime(
      tableDir, timeCol, loMs, hiMs)
    val storedPayloads =
      if (inside.isEmpty) None
      else Some(sketchesOf(s, inside, column).select(col("sketch")))
    val boundaryRows = boundary
      .map(d => s.read.format("pinot").load(d)
        .filter(col(timeCol) >= loMs && col(timeCol) <= hiMs))
      .reduceOption(_ union _)
    val deltaPayload = boundaryRows.map(_.agg(
      graft.functions.SketchBuildAgg.sketchBuild(col(column), spec)
        .as("sketch")))
    val payloads = (storedPayloads, deltaPayload) match {
      case (Some(a), Some(b)) => Some(a.union(b))
      case (a, b) => a.orElse(b)
    }
    (payloads, boundaryRows, insideDocs)
  }

  /** Exact distinct count of `column` from stored BITMAP sketches: one
    * OR-merge over per-segment Roaring64 bitmaps.
    */
  def bitmapDistinct(s: SparkSession, tableDir: String, column: String,
      as: String = "distinct_count"): DataFrame =
    segmentSketches(s, tableDir, column)
      .agg(BitmapMergeAgg.bitmapMergeDistinct(col("sketch")).as(as))

  /** Quantile estimates of `column` from stored KLL sketches (exact
    * nearest-rank while the merged sketch is unsaturated): per-segment
    * summaries merge through [[graft.functions.KllMergeAgg]] — the
    * PERCENTILE_KLL-over-stored-sketches path; the raw column never
    * re-reads.
    */
  def kllQuantiles(s: SparkSession, tableDir: String, column: String,
      k: Int, qs: Seq[Double], as: String = "quantiles"): DataFrame =
    segmentSketches(s, tableDir, column)
      .agg(graft.functions.KllMergeAgg
        .kllMergeQuantiles(col("sketch"), k, qs).as(as))

  /** Distinct count of `column` from stored HLL sketches (exact while
    * every section and the merged result stay SPARSE — ≤ 2^p/4 distinct;
    * ~1.04/√2^p standard error dense): the DISTINCT_COUNT_HLL stored-
    * sketch path, same hash contract as the query-time
    * [[graft.functions.HllDistinctAgg]], so stored and delta sketches
    * compose (the lambda merge).
    */
  def hllDistinct(s: SparkSession, tableDir: String, column: String, p: Int,
      as: String = "distinct_count"): DataFrame =
    segmentSketches(s, tableDir, column)
      .agg(graft.functions.HllMergeAgg
        .hllMergeEstimate(col("sketch"), p).as(as))

  /** Distinct count of `column` from stored KMV sketches (exact while
    * every segment's sketch is unsaturated — the bottom-k of a union of
    * bottom-k summaries is the union's bottom-k): stored hash arrays
    * re-aggregate through the SAME query-time [[KmvSketchAgg]], so
    * stored sketches also compose with ad-hoc `kmv_sketch(xxhash64(x))`
    * cohorts for union/intersection estimates.
    */
  def kmvDistinct(s: SparkSession, tableDir: String, column: String, k: Int,
      as: String = "distinct_count"): DataFrame = {
    import s.implicits._
    val dirs = segDirs(tableDir)
    val slices = math.max(1, math.min(dirs.size,
      4 * s.sparkContext.defaultParallelism))
    val hashes = s.sparkContext.parallelize(dirs, slices)
      .flatMap { dir =>
        val r = SegmentReader.open(dir, SegmentIO.forPath(dir))
        try {
          val bytes = r.sketchBytes(column).getOrElse(
            throw new PinotFormatException(
              s"segment $dir has no stored sketch for column $column"))
          val sk = SketchSection.deserialize(bytes)
          sk.spec match {
            case SketchSection.KmvSpec(sk2) if sk2 == k => sk.kmvHashes
            case SketchSection.KmvSpec(other) =>
              throw new PinotFormatException(
                s"segment $dir stores kmv$other for $column, expected kmv$k")
            case _ => throw new PinotFormatException(
              s"segment $dir stores a bitmap sketch for $column, expected kmv$k")
          }
        } finally r.close()
      }
      .toDF("hash")
    hashes
      .agg(KmvSketchAgg.kmvSketch(col("hash"), k).as("sk"))
      .select(KmvSketchAgg.distinctEstimate(col("sk"), k).as(as))
  }
}
