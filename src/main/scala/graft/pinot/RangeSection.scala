package graft.pinot

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer

/** Range-index section (EXTENSION — Apache Pinot's `rangeIndexColumns`;
  * the reference ignores secondary indexes entirely, README.md:311-313).
  *
  * Purpose at scale: range predicates on UNSORTED numeric columns.
  * Min/max metadata prunes whole segments and sorted-column ranging
  * clamps doc ranges, but a selective `x > v` on an unsorted
  * high-cardinality metric still decodes every window. The range index
  * chunks the segment's docs into buckets by VALUE order and stores each
  * bucket's exact [min, max] plus the RoaringBitmap of its docIds —
  * buckets whose interval misses the predicate drop out, and the OR of
  * the surviving bitmaps is a SUPERSET of the matching docs that drives
  * segment pruning, doc-range clamping, and 8,192-row window skipping
  * (the same consumption path as the inverted index). Residual filters
  * keep exactness.
  *
  * Numeric domain: LONG bits for INT/LONG/TIMESTAMP(millis), DOUBLE bits
  * for FLOAT/DOUBLE. Double bounds canonicalize -0.0 → 0.0 and compare
  * via `Double.compare`, which orders NaN above everything — exactly
  * Spark's double comparison semantics, so bucket selection can never
  * drop a row Spark would keep.
  *
  * Section (`{column}.range_index` in the index map; `.bitmap.range`
  * file in the v1 layout):
  * {{{
  *   8B  magic | i32 version=1 | i32 numRanges | i32 isDouble(0/1)
  *   numRanges × (i64 minBits, i64 maxBits)
  *   (numRanges+1) × i32 offsets (absolute in section) | RoaringBitmaps
  * }}}
  */
final class RangeSection(
    val isDouble: Boolean,
    minBits: Array[Long],
    maxBits: Array[Long],
    raw: Array[Byte],
    offsets: Array[Int]) {

  def numRanges: Int = minBits.length

  def bitmap(i: Int): org.roaringbitmap.buffer.ImmutableRoaringBitmap =
    new org.roaringbitmap.buffer.ImmutableRoaringBitmap(
      ByteBuffer.wrap(raw, offsets(i), offsets(i + 1) - offsets(i)).slice())

  private def cmp(aBits: Long, bBits: Long): Int =
    if (isDouble)
      java.lang.Double.compare(
        java.lang.Double.longBitsToDouble(aBits),
        java.lang.Double.longBitsToDouble(bBits))
    else java.lang.Long.compare(aBits, bBits)

  /** Indices of buckets whose [min, max] intersects the probe interval.
    * `loBits`/`hiBits` = None means unbounded on that side.
    */
  def candidates(loBits: Option[Long], loInc: Boolean,
      hiBits: Option[Long], hiInc: Boolean): Seq[Int] =
    (0 until numRanges).filter { i =>
      val aboveLo = loBits.forall { lo =>
        val c = cmp(maxBits(i), lo)
        c > 0 || (c == 0 && loInc)
      }
      val belowHi = hiBits.forall { hi =>
        val c = cmp(minBits(i), hi)
        c < 0 || (c == 0 && hiInc)
      }
      aboveLo && belowHi
    }

  /** OR of the candidate buckets' doc bitmaps — a superset of the docs
    * matching the probe interval. Empty bitmap = segment cannot match.
    */
  def matchBitmap(loBits: Option[Long], loInc: Boolean,
      hiBits: Option[Long], hiInc: Boolean)
      : org.roaringbitmap.buffer.MutableRoaringBitmap = {
    val acc = new org.roaringbitmap.buffer.MutableRoaringBitmap
    candidates(loBits, loInc, hiBits, hiInc).foreach(i => acc.or(bitmap(i)))
    acc
  }
}

object RangeSection {

  val Version = 1
  val IndexType = "range_index"

  /** Canonical double bits under Spark comparison semantics. */
  def doubleBits(x: Double): Long =
    java.lang.Double.doubleToLongBits(if (x == 0d) 0d else x)

  /** Build over doc-order values: sort (value, doc) by value, chunk into
    * ~equal-doc buckets, record exact per-bucket bounds + doc bitmaps.
    * `targetRanges <= 0` auto-sizes: ~1k docs per bucket, 16–256 buckets
    * — a selective probe then admits ≲ (matching + one boundary) buckets
    * of docs, a 1/256..1/16 slice of the segment before window skipping.
    */
  def build(longs: Either[Array[Long], Array[Double]],
      targetRanges: Int = 0): Array[Byte] = {
    val (bits, isDouble) = longs match {
      case Left(ls) => (ls, false)
      case Right(ds) => (ds.map(doubleBits), true)
    }
    val n = bits.length
    require(n > 0, "range index over an empty column")
    // doc ids in value order; TotalOrdering puts NaN last (canonical
    // -0.0 is already folded into the bits)
    val sorted: Array[Int] =
      if (isDouble)
        (0 until n).toArray.sortBy(d =>
          java.lang.Double.longBitsToDouble(bits(d)))(
          Ordering.Double.TotalOrdering)
      else (0 until n).toArray.sortBy(bits(_))
    val target =
      if (targetRanges > 0) targetRanges
      else math.max(16, math.min(256, n / 1024))
    val ranges = math.max(1, math.min(target, n))
    val per = (n + ranges - 1) / ranges
    def num(d: Int): Double =
      if (isDouble) java.lang.Double.longBitsToDouble(bits(d)) else bits(d).toDouble
    // Equal-doc chunking, then split any bucket at a DOMINANT internal
    // value gap (gap > half the bucket's span): a bucket straddling the
    // void between a dense value mass and an outlier cluster would
    // otherwise admit its scattered low-value docs to every probe aimed
    // at the cluster — exactly the boundary-bucket leak that erases the
    // window-skipping win. One split level bounds bucket count at 2×.
    val buckets = sorted.grouped(per).toArray.flatMap { b =>
      if (b.length < 8) Seq(b) // tiny buckets can't leak enough to matter
      else {
        var gapAt = -1
        var gap = 0d
        var i = 1
        while (i < b.length) {
          val g = num(b(i)) - num(b(i - 1))
          if (g > gap) { gap = g; gapAt = i }
          i += 1
        }
        val span = num(b(b.length - 1)) - num(b(0))
        if (gapAt > 0 && gap * 2 > span && span > 0)
          Seq(b.slice(0, gapAt), b.slice(gapAt, b.length))
        else Seq(b)
      }
    }
    val mins = buckets.map(b => bits(b.head))
    val maxs = buckets.map(b => bits(b.last))
    val body = new ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(body)
    val header = 8 + 4 + 4 + 4 + buckets.length * 16 + 4 * (buckets.length + 1)
    val offsets = new Array[Int](buckets.length + 1)
    offsets(0) = header
    buckets.zipWithIndex.foreach { case (docs, i) =>
      val bm = new org.roaringbitmap.RoaringBitmap
      docs.foreach(bm.add)
      bm.runOptimize()
      bm.serialize(out)
      offsets(i + 1) = header + body.size()
    }
    val buf = ByteBuffer.allocate(header + body.size())
    buf.putLong(PinotDictionary.MagicMarker)
    buf.putInt(Version)
    buf.putInt(buckets.length)
    buf.putInt(if (isDouble) 1 else 0)
    var i = 0
    while (i < buckets.length) { buf.putLong(mins(i)); buf.putLong(maxs(i)); i += 1 }
    offsets.foreach(buf.putInt)
    buf.put(body.toByteArray)
    buf.array()
  }

  def deserialize(bytes: Array[Byte]): RangeSection = {
    val buf = ByteBuffer.wrap(bytes)
    val magic = buf.getLong
    if (magic != PinotDictionary.MagicMarker)
      throw new PinotFormatException(f"range_index section: bad magic 0x$magic%x")
    val version = buf.getInt
    if (version != Version)
      throw new PinotFormatException(s"range_index: unsupported version $version")
    val nr = buf.getInt
    val isDouble = buf.getInt == 1
    // Long arithmetic: a corrupt nr like 0x20000000 overflows the Int
    // form of nr*16 + 4*(nr+1) to a small/negative value, passing the
    // check and then dying in allocation instead of as a format error
    if (nr < 1 || bytes.length < 8L + 12L + nr * 16L + 4L * (nr + 1L))
      throw new PinotFormatException("range_index section: corrupt header")
    val mins = new Array[Long](nr)
    val maxs = new Array[Long](nr)
    var i = 0
    while (i < nr) { mins(i) = buf.getLong; maxs(i) = buf.getLong; i += 1 }
    val offsets = new Array[Int](nr + 1)
    i = 0
    while (i <= nr) { offsets(i) = buf.getInt; i += 1 }
    new RangeSection(isDouble, mins, maxs, bytes, offsets)
  }
}
