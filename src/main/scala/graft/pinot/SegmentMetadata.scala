package graft.pinot

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}
import scala.collection.immutable.ListMap

/** Per-column metadata from `metadata.properties`
  * (reference: pinot-segment/src/metadata.rs:32-42,139-183).
  */
final case class ColumnMetadata(
    name: String,
    dataType: PinotType,
    cardinality: Int,
    totalDocs: Int,
    bitsPerElement: Int,
    hasDictionary: Boolean,
    isSorted: Boolean,
    lengthOfEachEntry: Int,
    /** Pinot's `isSingleValue` flag: false = multi-value (array) column —
      * an EXTENSION; MV is a reference non-goal (README.md:310).
      */
    isSingleValue: Boolean = true,
    /** Total flattened value count across docs for MV columns
      * (`totalNumberOfEntries` in Pinot metadata); == totalDocs for SV.
      */
    totalEntries: Int = 0,
    /** Pinot's per-column `minValue`/`maxValue` metadata (stringly-typed
      * as on disk; absent when the writer could not record them safely).
      * Drives segment-level range pruning without touching column data.
      */
    minValue: Option[String] = None,
    maxValue: Option[String] = None,
    /** Writer-recorded EXACT column sum (beyond-Pinot EXTENSION; absent
      * on segments from other writers, on nullable columns, and on
      * non-integral types): lets global SUM/AVG answer from metadata
      * alone. Stored as a decimal big-integer string — parse failures
      * surface as absence, never as a wrong sum.
      */
    sumValue: Option[BigInt] = None,
    /** Pinot's `hasInvertedIndex` flag: a per-dictId docId bitmap section
      * exists for this column (EXTENSION — the reference ignores all
      * secondary indexes).
      */
    hasInvertedIndex: Boolean = false,
    /** Null-value vector present (EXTENSION — the reference rejects
      * nullable columns): null docs hold a default in the forward index
      * and their docIds in a `nullvalue_vector` RoaringBitmap section.
      */
    hasNullVector: Boolean = false,
    /** Exact null-doc count when a null vector exists (feeds CBO
      * nullCount statistics without opening the segment).
      */
    nullCount: Int = 0,
    /** Bloom-filter section present (EXTENSION — Pinot's
      * `bloomFilterColumns`): equality probes can prune this segment
      * from a few KB of index without forward-index IO.
      */
    hasBloomFilter: Boolean = false,
    /** Range-index section present (EXTENSION — Pinot's
      * `rangeIndexColumns`): range predicates on this (unsorted) numeric
      * column resolve to doc-bucket bitmaps for window skipping.
      */
    hasRangeIndex: Boolean = false,
    /** Text-index section present (EXTENSION — Pinot's
      * `textIndexColumns` capability): substring predicates resolve to
      * token-posting bitmaps for window skipping.
      */
    hasTextIndex: Boolean = false,
    /** JSON-index section present (EXTENSION — Pinot's
      * `jsonIndexColumns` capability): pushed json-path equality
      * probes resolve to flattened path=value posting bitmaps.
      */
    hasJsonIndex: Boolean = false,
    /** Stored distinct-sketch spec (`kmv<k>` / `bitmap`; EXTENSION —
      * the capability of Pinot's ingestion-time sketch columns): a
      * [[SketchSection]] exists for this column, mergeable at query
      * time without forward-index IO.
      */
    sketchSpec: Option[String] = None)

/** Segment-level metadata parsed from the Java-properties file
  * `metadata.properties` (reference: pinot-segment/src/metadata.rs:44-239).
  *
  * Columns are kept in **insertion order** (ListMap), fixing the reference's
  * latent HashMap-iteration-order hazard flagged in SURVEY.md §2A: projection
  * resolution downstream is by name, never by positional index.
  */
final case class SegmentMetadata(
    segmentName: String,
    tableName: String,
    totalDocs: Int,
    columns: ListMap[String, ColumnMetadata],
    /** Pinot's `segment.time.column.name` — the table's declared time
      * column; drives hybrid OFFLINE/REALTIME time-boundary reads.
      */
    timeColumn: Option[String] = None,
    /** Star-tree pre-aggregated index declaration (EXTENSION): dimension
      * split order and `FUNC__column` metric pairs (Pinot's
      * `functionColumnPairs` spelling). Empty when the segment has no
      * star-tree. The records live in the `__startree__.startree` section.
      */
    starTreeDims: Seq[String] = Seq.empty,
    starTreeMetrics: Seq[String] = Seq.empty) {

  def column(name: String): ColumnMetadata =
    columns.getOrElse(name,
      throw new PinotFormatException(s"Column not found: $name"))
}

object SegmentMetadata {

  def fromFile(path: Path): SegmentMetadata =
    parse(new String(Files.readAllBytes(path), StandardCharsets.UTF_8))

  def parse(content: String): SegmentMetadata = {
    val props = scala.collection.mutable.LinkedHashMap.empty[String, String]
    content.linesIterator.foreach { raw =>
      val line = raw.trim
      if (line.nonEmpty && !line.startsWith("#")) {
        val idx = line.indexOf('=')
        if (idx >= 0) {
          val key = line.substring(0, idx).trim
          val value = decodeJavaString(line.substring(idx + 1).trim)
          props(key) = value
        }
      }
    }

    def required(key: String): String =
      props.getOrElse(key, throw new PinotFormatException(s"Missing $key"))

    val segmentName = required("segment.name")
    val tableName = required("segment.table.name")
    val totalDocs = required("segment.total.docs").toInt

    // Column discovery unions the flat `columns` list with the v3 role lists
    // (reference: metadata.rs:106-119) — dimension/metric/datetime roles are
    // flattened into one column set, deduped, insertion-ordered.
    val listKeys = Seq("columns", "segment.dimension.column.names",
      "segment.metric.column.names", "segment.datetime.column.names")
    val names = listKeys.flatMap(props.get)
      .flatMap(_.split(',').map(_.trim))
      .filter(_.nonEmpty)
      .distinct

    val cols = names.map { n =>
      def prop(suffix: String): Option[String] = props.get(s"column.$n.$suffix")
      val dt = PinotType.fromString(prop("dataType").getOrElse(
        throw new PinotFormatException(s"Missing dataType for column $n")))
      n -> ColumnMetadata(
        name = n,
        dataType = dt,
        cardinality = prop("cardinality").flatMap(_.toIntOption).getOrElse(0),
        totalDocs = totalDocs,
        bitsPerElement = prop("bitsPerElement").flatMap(_.toIntOption).getOrElse(0),
        hasDictionary = prop("hasDictionary").contains("true"),
        isSorted = prop("isSorted").contains("true"),
        lengthOfEachEntry = prop("lengthOfEachEntry").flatMap(_.toIntOption).getOrElse(0),
        isSingleValue = !prop("isSingleValue").contains("false"),
        totalEntries = prop("totalNumberOfEntries").flatMap(_.toIntOption)
          .getOrElse(totalDocs),
        minValue = prop("minValue"),
        maxValue = prop("maxValue"),
        sumValue = prop("sumValue").flatMap(s =>
          scala.util.Try(BigInt(s)).toOption),
        hasInvertedIndex = prop("hasInvertedIndex").contains("true"),
        hasNullVector = prop("hasNullValueVector").contains("true"),
        nullCount = prop("nullValueCount").flatMap(_.toIntOption).getOrElse(0),
        hasBloomFilter = prop("hasBloomFilter").contains("true"),
        hasRangeIndex = prop("hasRangeIndex").contains("true"),
        hasTextIndex = prop("hasTextIndex").contains("true"),
        hasJsonIndex = prop("hasJsonIndex").contains("true"),
        sketchSpec = prop("sketch").filter(_.nonEmpty))
    }

    def csv(key: String): Seq[String] = props.get(key).toSeq
      .flatMap(_.split(',').map(_.trim)).filter(_.nonEmpty)

    SegmentMetadata(segmentName, tableName, totalDocs, ListMap(cols: _*),
      timeColumn = props.get("segment.time.column.name").filter(_.nonEmpty),
      starTreeDims = csv("startree.dimensions"),
      starTreeMetrics = csv("startree.metrics"))
  }

  /** Decode Java-properties escapes: \\uXXXX, \t, \n, \r, \\\\
    * (reference: metadata.rs:186-239 — invalid \\u sequences pass through
    * verbatim, unknown escapes keep the backslash).
    */
  def decodeJavaString(s: String): String = {
    val out = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'u' =>
            val hex = s.substring(math.min(i + 2, s.length), math.min(i + 6, s.length))
            val code = try Some(Integer.parseInt(hex, 16)) catch { case _: Exception => None }
            code.filter(c => Character.isValidCodePoint(c)) match {
              case Some(cp) => out.appendAll(Character.toChars(cp)); i += 2 + hex.length
              case None => out.append("\\u").append(hex); i += 2 + hex.length
            }
          case 't' => out.append('\t'); i += 2
          case 'n' => out.append('\n'); i += 2
          case 'r' => out.append('\r'); i += 2
          case '\\' => out.append('\\'); i += 2
          case _ => out.append(c); i += 1
        }
      } else { out.append(c); i += 1 }
    }
    out.toString
  }
}
