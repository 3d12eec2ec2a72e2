package graft.pinot

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/** Reader for the VarByteChunk **V4** RAW forward index used by
  * non-dictionary STRING/BYTES columns
  * (reference: pinot-segment/src/forward_index/var_byte.rs:29-434).
  *
  * Section layout (offsets relative to the section's start):
  *   - optional 8-byte magic beginning `DE AD BE EF` (var_byte.rs:45-55)
  *   - 16-byte **big-endian** header: version(=4), targetDecompressedChunkSize,
  *     compressionType, chunksStartOffset (var_byte.rs:57-73)
  *   - chunk-metadata entries, 8 bytes **little-endian** each:
  *     `docIdOffset` (low 31 bits; bit 31 = "huge value" flag) and
  *     `chunkOffset` relative to the chunk region (var_byte.rs:6,110,137-141)
  *   - chunk region at `chunksStartOffset` (+8 when magic present); a chunk
  *     ends at the next chunk's offset, with `0xFFFFFFFF` as a last-chunk
  *     sentinel (var_byte.rs:151-166)
  *
  * Each decompressed regular chunk is `{numDocs: u32 LE; offsets[numDocs]:
  * u32 LE (start of each value); bytes}` — the last value runs to the chunk
  * end (var_byte.rs:187-252). A "huge" chunk is one value spanning the whole
  * chunk (var_byte.rs:141,183-185).
  *
  * Compression codes (var_byte.rs:9-13): PASS_THROUGH=0, SNAPPY=1,
  * ZSTANDARD=2, LZ4=3, LZ4_LENGTH_PREFIXED=4. The reference implements only
  * pass-through + LZ4 variants; we additionally decode Snappy and Zstd
  * (extension — the JVM codecs ship with Spark).
  */
final class VarByteChunkV4(section: Array[Byte], totalDocs: Int) {
  import VarByteChunkV4._

  private val hasMagic =
    section.length >= 4 &&
      (section(0) & 0xFF) == 0xDE && (section(1) & 0xFF) == 0xAD &&
      (section(2) & 0xFF) == 0xBE && (section(3) & 0xFF) == 0xEF

  private val base = if (hasMagic) 8 else 0

  private val header = {
    val b = ByteBuffer.wrap(section, base, 16)
    (b.getInt, b.getInt, b.getInt, b.getInt)
  }
  val version: Int = header._1
  val targetDecompressedChunkSize: Int = header._2
  val compressionType: Int = header._3
  private val chunksStartOffset: Int = header._4

  if (version != 4)
    throw new PinotFormatException(s"Expected V4 format, got version $version")

  private val metadataOffset = base + 16
  private val metadataSize = chunksStartOffset - 16
  private val numEntries = metadataSize / MetadataEntrySize
  private val chunkRegionStart = base + chunksStartOffset
  private val chunkRegionLen = section.length - chunkRegionStart

  private def entry(i: Int): (Int, Boolean, Long) = {
    val b = ByteBuffer.wrap(section, metadataOffset + i * MetadataEntrySize, 8)
      .order(ByteOrder.LITTLE_ENDIAN)
    val raw = b.getInt
    val docIdOffset = raw & 0x7FFFFFFF
    val huge = (raw & 0x80000000) != 0
    val chunkOffset = b.getInt & 0xFFFFFFFFL
    (docIdOffset, huge, chunkOffset)
  }

  /** End of chunk `i` relative to the chunk region. */
  private def chunkLimit(i: Int): Long =
    if (i + 1 < numEntries) {
      val (_, _, nextOff) = entry(i + 1)
      if (nextOff == 0xFFFFFFFFL) chunkRegionLen.toLong else nextOff
    } else chunkRegionLen.toLong

  private def decompressed(i: Int): Array[Byte] = {
    val (_, _, off) = entry(i)
    val limit = chunkLimit(i)
    val len = (limit - off).toInt
    val start = chunkRegionStart + off.toInt
    decompress(section, start, len, compressionType, targetDecompressedChunkSize)
  }

  /** Decode every value, decompressing each chunk exactly once
    * (≙ read_all_strings_chunked, var_byte.rs:333-434).
    */
  def readAllBytes(): Array[Array[Byte]] = {
    val out = Array.newBuilder[Array[Byte]]
    out.sizeHint(totalDocs)
    var i = 0
    while (i < numEntries) {
      val (_, huge, _) = entry(i)
      val chunk = decompressed(i)
      if (huge) out += chunk
      else {
        val b = ByteBuffer.wrap(chunk).order(ByteOrder.LITTLE_ENDIAN)
        val numDocs = b.getInt(0)
        var d = 0
        while (d < numDocs) {
          val valueOff = b.getInt(4 + d * 4)
          val valueEnd = if (d == numDocs - 1) chunk.length else b.getInt(4 + (d + 1) * 4)
          out += java.util.Arrays.copyOfRange(chunk, valueOff, valueEnd)
          d += 1
        }
      }
      i += 1
    }
    out.result()
  }

  def readAllStrings(): Array[String] =
    readAllBytes().map(new String(_, StandardCharsets.UTF_8))

  /** Decode docs [start, start + count) only, decompressing just the
    * chunks that overlap the range (chunk located by binary search over
    * the doc-id offsets). Powers sorted-column range scans: a time-range
    * query over a sorted segment touches a contiguous slice of chunks.
    */
  def readRangeBytes(start: Int, count: Int): Array[Array[Byte]] = {
    if (count == 0) return Array.empty
    var lo = 0
    var hi = numEntries - 1
    var found = -1
    while (lo <= hi && found < 0) {
      val mid = (lo + hi) >>> 1
      val (docOff, _, _) = entry(mid)
      if (docOff < start) lo = mid + 1
      else if (docOff > start) hi = mid - 1
      else found = mid
    }
    var ci = if (found >= 0) found else math.max(lo - 1, 0)
    val out = new Array[Array[Byte]](count)
    var filled = 0
    while (filled < count && ci < numEntries) {
      val (docIdOffset, huge, _) = entry(ci)
      val chunk = decompressed(ci)
      if (huge) {
        if (docIdOffset >= start) { out(filled) = chunk; filled += 1 }
      } else {
        val b = ByteBuffer.wrap(chunk).order(ByteOrder.LITTLE_ENDIAN)
        val numDocs = b.getInt(0)
        var d = math.max(0, start - docIdOffset)
        while (d < numDocs && filled < count) {
          val valueOff = b.getInt(4 + d * 4)
          val valueEnd = if (d == numDocs - 1) chunk.length else b.getInt(4 + (d + 1) * 4)
          out(filled) = java.util.Arrays.copyOfRange(chunk, valueOff, valueEnd)
          filled += 1
          d += 1
        }
      }
      ci += 1
    }
    if (filled != count)
      throw new PinotFormatException(
        s"range [$start, ${start + count}) exceeds the stored doc count")
    out
  }

  /** Visit docs `[start, start + count)` as `(buffer, offset, length)`
    * slices of each decompressed chunk — the zero-copy sibling of
    * [[readRangeBytes]] for consumers that hash/compare in place (the
    * histogram GROUP BY slot path): no per-value `copyOfRange`, one
    * chunk decompression per overlapped chunk. `f` must not retain the
    * buffer reference past the call.
    */
  def foreachRange(start: Int, count: Int)(
      f: (Array[Byte], Int, Int) => Unit): Unit = {
    if (count == 0) return
    var lo = 0
    var hi = numEntries - 1
    var found = -1
    while (lo <= hi && found < 0) {
      val mid = (lo + hi) >>> 1
      val (docOff, _, _) = entry(mid)
      if (docOff < start) lo = mid + 1
      else if (docOff > start) hi = mid - 1
      else found = mid
    }
    var ci = if (found >= 0) found else math.max(lo - 1, 0)
    var filled = 0
    while (filled < count && ci < numEntries) {
      val (docIdOffset, huge, _) = entry(ci)
      val chunk = decompressed(ci)
      if (huge) {
        if (docIdOffset >= start) { f(chunk, 0, chunk.length); filled += 1 }
      } else {
        val b = ByteBuffer.wrap(chunk).order(ByteOrder.LITTLE_ENDIAN)
        val numDocs = b.getInt(0)
        var d = math.max(0, start - docIdOffset)
        while (d < numDocs && filled < count) {
          val valueOff = b.getInt(4 + d * 4)
          val valueEnd = if (d == numDocs - 1) chunk.length else b.getInt(4 + (d + 1) * 4)
          f(chunk, valueOff, valueEnd - valueOff)
          filled += 1
          d += 1
        }
      }
      ci += 1
    }
    if (filled != count)
      throw new PinotFormatException(
        s"range [$start, ${start + count}) exceeds the stored doc count")
  }

  /** Random access for one doc (binary search over chunk metadata,
    * ≙ var_byte.rs:95-123 + get_bytes).
    */
  def getBytes(docId: Int): Array[Byte] = {
    var lo = 0
    var hi = numEntries - 1
    var found = -1
    while (lo <= hi && found < 0) {
      val mid = (lo + hi) >>> 1
      val (docOff, _, _) = entry(mid)
      if (docOff < docId) lo = mid + 1
      else if (docOff > docId) hi = mid - 1
      else found = mid
    }
    val idx = if (found >= 0) found else math.max(lo - 1, 0)
    val (docIdOffset, huge, _) = entry(idx)
    val chunk = decompressed(idx)
    if (huge) chunk
    else {
      val b = ByteBuffer.wrap(chunk).order(ByteOrder.LITTLE_ENDIAN)
      val numDocs = b.getInt(0)
      val d = docId - docIdOffset
      if (d < 0 || d >= numDocs)
        throw new PinotFormatException(
          s"doc_id $docId not in chunk (chunk starts at $docIdOffset, has $numDocs docs)")
      val valueOff = b.getInt(4 + d * 4)
      val valueEnd = if (d == numDocs - 1) chunk.length else b.getInt(4 + (d + 1) * 4)
      java.util.Arrays.copyOfRange(chunk, valueOff, valueEnd)
    }
  }

  def getString(docId: Int): String =
    new String(getBytes(docId), StandardCharsets.UTF_8)
}

object VarByteChunkV4 {
  val MetadataEntrySize = 8

  // ChunkCompressionType codes (public Apache Pinot format).
  val PassThrough = 0
  val Snappy = 1
  val Zstandard = 2
  val Lz4 = 3
  val Lz4LengthPrefixed = 4

  private lazy val lz4Factory = net.jpountz.lz4.LZ4Factory.fastestInstance()

  /** Compress one chunk payload (inverse of [[decompress]]; shared by the
    * var-byte and fixed-byte segment writers).
    */
  def compressChunk(payload: Array[Byte], compression: Int): Array[Byte] =
    compression match {
      case PassThrough => payload
      case Lz4LengthPrefixed =>
        val comp = net.jpountz.lz4.LZ4Factory.fastestInstance()
          .fastCompressor().compress(payload)
        ByteBuffer.allocate(4 + comp.length).order(ByteOrder.LITTLE_ENDIAN)
          .putInt(payload.length).put(comp).array()
      case Lz4 =>
        net.jpountz.lz4.LZ4Factory.fastestInstance().fastCompressor().compress(payload)
      case Snappy =>
        org.xerial.snappy.Snappy.compress(payload)
      case Zstandard =>
        com.github.luben.zstd.Zstd.compress(payload)
      case other =>
        throw new PinotFormatException(s"Unknown compression type: $other")
    }

  def decompress(buf: Array[Byte], off: Int, len: Int, compressionType: Int,
      targetChunkSize: Int): Array[Byte] = compressionType match {
    case PassThrough =>
      java.util.Arrays.copyOfRange(buf, off, off + len)
    case Lz4LengthPrefixed =>
      // 4-byte LE decompressed-size prefix, then an LZ4 block
      // (var_byte.rs:273-285).
      if (len < 4)
        throw new PinotFormatException("LZ4_LENGTH_PREFIXED data too short for length prefix")
      val size = ByteBuffer.wrap(buf, off, 4).order(ByteOrder.LITTLE_ENDIAN).getInt
      val dst = new Array[Byte](size)
      lz4Factory.fastDecompressor().decompress(buf, off + 4, dst, 0, size)
      dst
    case Lz4 =>
      // Plain LZ4 block; decompressed size bounded by the header's target
      // chunk size (var_byte.rs:287-296).
      val dst = new Array[Byte](targetChunkSize)
      val n = lz4Factory.safeDecompressor().decompress(buf, off, len, dst, 0)
      if (n == targetChunkSize) dst else java.util.Arrays.copyOf(dst, n)
    case Snappy =>
      org.xerial.snappy.Snappy.uncompress(
        java.util.Arrays.copyOfRange(buf, off, off + len))
    case Zstandard =>
      val src = java.util.Arrays.copyOfRange(buf, off, off + len)
      val sz = com.github.luben.zstd.Zstd.getFrameContentSize(src)
      val bound = if (sz > 0) sz.toInt else targetChunkSize
      com.github.luben.zstd.Zstd.decompress(src, bound)
    case other =>
      throw new PinotFormatException(s"Unknown compression type: $other")
  }
}
