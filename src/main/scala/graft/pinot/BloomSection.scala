package graft.pinot

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** Bloom-filter index section (EXTENSION — Apache Pinot's
  * `bloomFilterColumns`; the reference ignores secondary indexes
  * entirely, README.md:311-313).
  *
  * Purpose at scale: EQUALITY/IN pruning on columns where the existing
  * pruning paths cannot answer. Dictionary pruning needs a dictionary
  * (RAW/noDictionary columns have none) and min/max range pruning keeps
  * any in-range probe; a bloom filter over the column's distinct values
  * prunes a 1 GB segment on a point lookup with a few KB of index reads
  * and NO forward-index IO. False positives only cost a wasted scan —
  * Spark's residual filter stays authoritative — while a "definitely
  * absent" answer is exact, so pruning can never drop rows.
  *
  * Values hash by a CANONICAL string form shared between writer and
  * probe so equality semantics match Spark's: -0.0 canonicalizes to 0.0
  * (Spark treats them equal) and every NaN to the one "NaN" spelling
  * (Spark EqualTo NaN = NaN is true). TIMESTAMP columns store epoch
  * millis and canonicalize the probe's micros when millisecond-aligned.
  *
  * Section (`{column}.bloom_filter` in the index map):
  * {{{
  *   8B  magic (0xDEADBEEFDEAFBEAD BE — same marker as dictionaries)
  *   i32 BE version = 1
  *   i32 BE k (hash functions) | i32 BE numLongs
  *   numLongs × i64 BE bit words
  * }}}
  * Double hashing g_i = h1 + i·h2 over the MD5 of the canonical UTF-8
  * bytes — deterministic across JVMs, no seed state.
  */
final class BloomSection(val k: Int, bits: Array[Long]) {

  private val numBits = bits.length * 64L

  private[pinot] def add(canonical: String): Unit = {
    val (h1, h2) = BloomSection.hash(canonical)
    var i = 0
    while (i < k) {
      val idx = java.lang.Long.remainderUnsigned(h1 + i * h2, numBits)
      bits((idx >>> 6).toInt) |= 1L << (idx & 63)
      i += 1
    }
  }

  /** false = DEFINITELY absent (safe to prune); true = maybe present. */
  def mightContain(canonical: String): Boolean = {
    val (h1, h2) = BloomSection.hash(canonical)
    var i = 0
    while (i < k) {
      val idx = java.lang.Long.remainderUnsigned(h1 + i * h2, numBits)
      if ((bits((idx >>> 6).toInt) & (1L << (idx & 63))) == 0L) return false
      i += 1
    }
    true
  }

  def serialize(): Array[Byte] = {
    val buf = ByteBuffer.allocate(8 + 4 + 4 + 4 + bits.length * 8)
    buf.putLong(PinotDictionary.MagicMarker)
    buf.putInt(BloomSection.Version)
    buf.putInt(k)
    buf.putInt(bits.length)
    bits.foreach(buf.putLong)
    buf.array()
  }
}

object BloomSection {

  val Version = 1

  /** Sized for ~3% false positives at `n` distinct values (the classic
    * m = -n·ln p / ln²2, k = (m/n)·ln 2 formulas), floor 64 bits.
    */
  def build(distinct: Iterable[String], fpp: Double = 0.03): BloomSection = {
    val n = math.max(1, distinct.size)
    val m = math.max(64L,
      math.ceil(-n * math.log(fpp) / (math.log(2) * math.log(2))).toLong)
    val numLongs = ((m + 63) / 64).toInt
    val k = math.max(1, math.min(10,
      math.round(numLongs * 64.0 / n * math.log(2)).toInt))
    val bf = new BloomSection(k, new Array[Long](numLongs))
    distinct.foreach(bf.add)
    bf
  }

  def deserialize(bytes: Array[Byte]): BloomSection = {
    val buf = ByteBuffer.wrap(bytes)
    val magic = buf.getLong
    if (magic != PinotDictionary.MagicMarker)
      throw new PinotFormatException(
        f"bloom_filter section: bad magic 0x$magic%x")
    val version = buf.getInt
    if (version != Version)
      throw new PinotFormatException(
        s"bloom_filter section: unsupported version $version")
    val k = buf.getInt
    val numLongs = buf.getInt
    if (k < 1 || k > 64 || numLongs < 1 ||
        bytes.length < 8L + 12L + numLongs * 8L)
      throw new PinotFormatException("bloom_filter section: corrupt header")
    val bits = new Array[Long](numLongs)
    var i = 0
    while (i < numLongs) { bits(i) = buf.getLong; i += 1 }
    new BloomSection(k, bits)
  }

  private def hash(canonical: String): (Long, Long) = {
    val d = MessageDigest.getInstance("MD5")
      .digest(canonical.getBytes(StandardCharsets.UTF_8))
    val bb = ByteBuffer.wrap(d)
    (bb.getLong, bb.getLong)
  }

  /** Canonical spelling under SPARK equality: -0.0 → "0.0", any NaN →
    * "NaN", everything else `String.valueOf`. The writer canonicalizes
    * stored values and the scan canonicalizes probe values with the SAME
    * function, so bloom membership decides Spark-equality soundly.
    */
  def canonicalFloat(x: Float): String =
    if (x.isNaN) "NaN" else if (x == 0f) "0.0" else String.valueOf(x)

  def canonicalDouble(x: Double): String =
    if (x.isNaN) "NaN" else if (x == 0d) "0.0" else String.valueOf(x)
}
