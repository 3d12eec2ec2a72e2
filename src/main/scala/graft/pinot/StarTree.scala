package graft.pinot

import java.nio.ByteBuffer

/** Star-tree-style pre-aggregated index (EXTENSION — Apache Pinot's
  * star-tree is explicitly out of scope for the reference,
  * `README.md:311-313`; this brings the capability to the Spark engine).
  *
  * Layout simplification vs Pinot: we store the LEAF records only — one
  * record per distinct dimension combination, dimensions as dict ids in
  * split order, metrics pre-aggregated — and roll star-node subsets up in
  * the reader task. That keeps the asymptotic win (a GROUP BY over any
  * subset of the tree dimensions reads |combos| records instead of
  * |docs| forward-index rows) without Pinot's exponential star-row
  * materialization; the rollup itself is O(|combos|) per segment and runs
  * distributed, one task per segment.
  *
  * Metric value model: every metric serializes as 8 bytes BE. COUNT and
  * SUM/MIN/MAX over INT/LONG store a long; SUM/MIN/MAX over FLOAT/DOUBLE
  * store `doubleToLongBits`. The reader recovers the interpretation from
  * the metric's function + column type (`Metric.isDouble`).
  *
  * Section: pseudo-column `__startree__`, index type `startree`:
  * {{{
  *   8B  magic (0xDEADBEEFDEAFBEAD, BE — same marker as dictionaries)
  *   i32 BE version = 1
  *   i32 BE numRows | i32 BE numDims | i32 BE numMetrics
  *   numRows × (numDims × i32 BE dictId, numMetrics × i64 BE valueBits)
  * }}}
  * Dimension/metric names live in `metadata.properties`
  * (`startree.dimensions`, `startree.metrics` — function__column pairs in
  * Pinot's `functionColumnPairs` spelling, e.g. `SUM__hits`, `COUNT__*`).
  */
object StarTree {

  val SectionColumn = "__startree__"
  val SectionType = "startree"
  val Version = 1

  /** A pre-aggregated metric: `func` ∈ COUNT/SUM/MIN/MAX, `column` empty
    * for COUNT (spelled `COUNT__*` on disk).
    */
  final case class Metric(func: String, column: String) {
    require(Set("COUNT", "SUM", "MIN", "MAX")(func), s"bad star-tree func $func")
    require(func == "COUNT" || column.nonEmpty, "non-COUNT metric needs a column")
    def key: String = s"${func}__${if (column.isEmpty) "*" else column}"
  }

  object Metric {
    def parse(s: String): Metric = {
      val i = s.indexOf("__")
      if (i <= 0) throw new PinotFormatException(s"bad star-tree metric '$s'")
      val c = s.substring(i + 2)
      Metric(s.substring(0, i), if (c == "*") "" else c)
    }
  }

  /** Writer-side config: dimension split order + metrics to pre-aggregate.
    * COUNT is always included (rollups need it regardless).
    */
  final case class Spec(dims: Seq[String], metrics: Seq[Metric]) {
    require(dims.nonEmpty, "star-tree needs at least one dimension")
    def withCount: Spec =
      if (metrics.exists(_.func == "COUNT")) this
      else copy(metrics = Metric("COUNT", "") +: metrics)
  }

  /** Parse the DSv2 writer option: `"dim1,dim2:SUM(m1),MIN(m2)"` —
    * dimensions in split order, then function(column) metric pairs
    * (COUNT is implicit; `"dim1,dim2"` alone builds a COUNT-only tree).
    */
  def parseSpec(s: String): Spec = {
    val i = s.indexOf(':')
    val (dimPart, metPart) = if (i < 0) (s, "") else (s.substring(0, i), s.substring(i + 1))
    val dims = dimPart.split(',').map(_.trim).filter(_.nonEmpty).toSeq
    if (dims.isEmpty)
      throw new PinotFormatException(s"starTree option '$s': no dimensions")
    val mets = metPart.split(',').map(_.trim).filter(_.nonEmpty).toSeq.map { m =>
      val p = m.indexOf('(')
      if (p <= 0 || !m.endsWith(")"))
        throw new PinotFormatException(
          s"starTree metric '$m': expected FUNC(column)")
      val col = m.substring(p + 1, m.length - 1).trim
      Metric(m.substring(0, p).trim.toUpperCase, if (col == "*") "" else col)
    }
    Spec(dims, mets).withCount
  }

  /** Decoded records of one segment's star-tree. `values` holds raw
    * 8-byte bit patterns; interpret per metric via `isDouble`.
    */
  final case class Records(dims: Array[String], metrics: Array[Metric],
      dimIds: Array[Array[Int]], values: Array[Array[Long]])

  /** True when the metric aggregates in double space (float/double
    * column); COUNT and int/long metrics aggregate in long space.
    */
  def isDouble(m: Metric, columnType: String => PinotType): Boolean =
    m.func != "COUNT" && (columnType(m.column) match {
      case PinotType.PFloat | PinotType.PDouble => true
      case _ => false
    })

  /** Build leaf records from per-doc dim ids + metric accessors, sorted
    * lexicographically by dim ids (deterministic bytes for equal input).
    * `metricLong`/`metricDouble`: per-metric-index doc accessor — exactly
    * one is consulted per metric, per `isDouble`.
    */
  def build(totalDocs: Int, dimIds: Array[Array[Int]],
      metrics: Array[Metric], metricIsDouble: Array[Boolean],
      metricLong: Array[Int => Long], metricDouble: Array[Int => Double])
      : (Array[Array[Int]], Array[Array[Long]]) = {
    val acc = scala.collection.mutable.LinkedHashMap
      .empty[scala.collection.immutable.ArraySeq[Int], Array[Long]]
    var d = 0
    while (d < totalDocs) {
      val key = scala.collection.immutable.ArraySeq.unsafeWrapArray(
        Array.tabulate(dimIds.length)(i => dimIds(i)(d)))
      val cur = acc.getOrElseUpdate(key,
        Array.tabulate(metrics.length)(i => initBit(metrics(i), metricIsDouble(i))))
      var mi = 0
      while (mi < metrics.length) {
        cur(mi) = mergeDoc(metrics(mi), metricIsDouble(mi), cur(mi),
          if (metricIsDouble(mi)) java.lang.Double.doubleToLongBits(
            metricDouble(mi)(d)) else metricLong(mi)(d))
        mi += 1
      }
      d += 1
    }
    val rows = acc.toArray.sortWith { case ((a, _), (b, _)) =>
      lexLt(a, b)
    }
    (rows.map(_._1.toArray), rows.map(_._2))
  }

  private def lexLt(a: Seq[Int], b: Seq[Int]): Boolean = {
    var i = 0
    while (i < a.length) {
      if (a(i) != b(i)) return a(i) < b(i)
      i += 1
    }
    false
  }

  private def initBit(m: Metric, dbl: Boolean): Long = m.func match {
    case "COUNT" | "SUM" =>
      if (dbl) java.lang.Double.doubleToLongBits(0d) else 0L
    case "MIN" =>
      if (dbl) java.lang.Double.doubleToLongBits(Double.PositiveInfinity)
      else Long.MaxValue
    case "MAX" =>
      if (dbl) java.lang.Double.doubleToLongBits(Double.NegativeInfinity)
      else Long.MinValue
  }

  /** Merge one doc's value bits into the accumulator (write-side) — the
    * same algebra the reader uses to merge records during rollup.
    */
  def mergeDoc(m: Metric, dbl: Boolean, accBits: Long, docBits: Long): Long =
    m.func match {
      case "COUNT" => accBits + 1L
      case _ => mergeBits(m, dbl, accBits, docBits)
    }

  /** Merge two already-aggregated bit patterns (reader-side rollup). */
  def mergeBits(m: Metric, dbl: Boolean, a: Long, b: Long): Long = m.func match {
    case "COUNT" => a + b
    case "SUM" =>
      if (dbl) java.lang.Double.doubleToLongBits(
        java.lang.Double.longBitsToDouble(a) + java.lang.Double.longBitsToDouble(b))
      else a + b
    case "MIN" =>
      if (dbl) {
        val x = java.lang.Double.longBitsToDouble(a)
        val y = java.lang.Double.longBitsToDouble(b)
        // Spark/Java compare semantics: NaN largest, so MIN prefers non-NaN
        if (java.lang.Double.compare(x, y) <= 0) a else b
      } else math.min(a, b)
    case "MAX" =>
      if (dbl) {
        val x = java.lang.Double.longBitsToDouble(a)
        val y = java.lang.Double.longBitsToDouble(b)
        if (java.lang.Double.compare(x, y) >= 0) a else b
      } else math.max(a, b)
  }

  def serialize(dimCount: Int, metricCount: Int,
      rows: Array[Array[Int]], values: Array[Array[Long]]): Array[Byte] = {
    val n = rows.length
    val buf = ByteBuffer.allocate(8 + 16 + n * (4 * dimCount + 8 * metricCount))
    buf.putLong(PinotDictionary.MagicMarker)
    buf.putInt(Version)
    buf.putInt(n)
    buf.putInt(dimCount)
    buf.putInt(metricCount)
    var r = 0
    while (r < n) {
      rows(r).foreach(buf.putInt)
      values(r).foreach(buf.putLong)
      r += 1
    }
    buf.array()
  }

  def deserialize(bytes: Array[Byte], dims: Array[String],
      metrics: Array[Metric]): Records = {
    val buf = ByteBuffer.wrap(bytes)
    if (bytes.length < 24 || buf.getLong() != PinotDictionary.MagicMarker)
      throw new PinotFormatException("star-tree section: bad magic")
    val version = buf.getInt()
    if (version != Version)
      throw new PinotFormatException(s"star-tree section: version $version")
    val n = buf.getInt()
    val nd = buf.getInt()
    val nm = buf.getInt()
    if (nd != dims.length || nm != metrics.length)
      throw new PinotFormatException(
        s"star-tree section: $nd dims/$nm metrics vs metadata " +
          s"${dims.length}/${metrics.length}")
    val need = 24L + n.toLong * (4L * nd + 8L * nm)
    if (n < 0 || need != bytes.length)
      throw new PinotFormatException("star-tree section: truncated")
    val dimIds = Array.ofDim[Array[Int]](n)
    val values = Array.ofDim[Array[Long]](n)
    var r = 0
    while (r < n) {
      dimIds(r) = Array.fill(nd)(buf.getInt())
      values(r) = Array.fill(nm)(buf.getLong())
      r += 1
    }
    Records(dims, metrics, dimIds, values)
  }
}
