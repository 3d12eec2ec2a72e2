package graft.pinot

import java.nio.{ByteBuffer, ByteOrder}

/** Fixed-byte chunked RAW forward index for no-dictionary NUMERIC columns
  * — EXTENSION: the reference rejects RAW numerics outright
  * (segment_reader.rs readers are dictionary-only for INT/LONG/FLOAT/
  * DOUBLE), while real Pinot tables routinely store high-cardinality
  * metrics without a dictionary.
  *
  * Container: the same section frame as [[VarByteChunkV4]] (optional
  * magic, 16-byte BE header {version=4, targetDecompressedChunkSize,
  * compressionType, chunksStartOffset}, 8-byte LE chunk-metadata entries
  * {docIdOffset, chunkOffset}), but each decompressed chunk is simply
  * `numDocs × width` little-endian values with NO offsets array — doc
  * position inside a chunk is `(doc − docIdOffset) × width`.
  */
final class FixedByteChunkV4(section: Array[Byte], totalDocs: Int, width: Int) {
  import VarByteChunkV4.MetadataEntrySize

  private val hasMagic =
    section.length >= 4 &&
      (section(0) & 0xFF) == 0xDE && (section(1) & 0xFF) == 0xAD &&
      (section(2) & 0xFF) == 0xBE && (section(3) & 0xFF) == 0xEF

  private val base = if (hasMagic) 8 else 0

  private val header = {
    val b = ByteBuffer.wrap(section, base, 16)
    (b.getInt, b.getInt, b.getInt, b.getInt)
  }
  if (header._1 != 4)
    throw new PinotFormatException(s"Expected V4 format, got version ${header._1}")
  private val targetChunkSize = header._2
  private val compressionType = header._3
  private val chunksStartOffset = header._4

  private val metadataOffset = base + 16
  private val numEntries = (chunksStartOffset - 16) / MetadataEntrySize
  private val chunkRegionStart = base + chunksStartOffset
  private val chunkRegionLen = section.length - chunkRegionStart

  private def entry(i: Int): (Int, Long) = {
    val b = ByteBuffer.wrap(section, metadataOffset + i * MetadataEntrySize, 8)
      .order(ByteOrder.LITTLE_ENDIAN)
    (b.getInt & 0x7FFFFFFF, b.getInt & 0xFFFFFFFFL)
  }

  private def chunkLimit(i: Int): Long =
    if (i + 1 < numEntries) {
      val (_, nextOff) = entry(i + 1)
      if (nextOff == 0xFFFFFFFFL) chunkRegionLen.toLong else nextOff
    } else chunkRegionLen.toLong

  private def decompressed(i: Int): Array[Byte] = {
    val (_, off) = entry(i)
    val len = (chunkLimit(i) - off).toInt
    VarByteChunkV4.decompress(section, chunkRegionStart + off.toInt, len,
      compressionType, targetChunkSize)
  }

  /** Raw little-endian bytes for docs [start, start + count), touching
    * only overlapping chunks.
    */
  def readRangeRaw(start: Int, count: Int): Array[Byte] = {
    val out = new Array[Byte](count * width)
    if (count == 0) return out
    var lo = 0
    var hi = numEntries - 1
    var found = -1
    while (lo <= hi && found < 0) {
      val mid = (lo + hi) >>> 1
      val (docOff, _) = entry(mid)
      if (docOff < start) lo = mid + 1
      else if (docOff > start) hi = mid - 1
      else found = mid
    }
    var ci = if (found >= 0) found else math.max(lo - 1, 0)
    var filled = 0
    while (filled < count && ci < numEntries) {
      val (docIdOffset, _) = entry(ci)
      val chunk = decompressed(ci)
      val chunkDocs = chunk.length / width
      val from = math.max(0, start - docIdOffset)
      val take = math.min(chunkDocs - from, count - filled)
      if (take > 0) {
        System.arraycopy(chunk, from * width, out, filled * width, take * width)
        filled += take
      }
      ci += 1
    }
    if (filled != count)
      throw new PinotFormatException(
        s"range [$start, ${start + count}) exceeds the stored doc count")
    out
  }

  def readRangeInts(start: Int, count: Int): Array[Int] = {
    val b = ByteBuffer.wrap(readRangeRaw(start, count)).order(ByteOrder.LITTLE_ENDIAN)
    Array.fill(count)(b.getInt)
  }
  def readRangeLongs(start: Int, count: Int): Array[Long] = {
    val b = ByteBuffer.wrap(readRangeRaw(start, count)).order(ByteOrder.LITTLE_ENDIAN)
    Array.fill(count)(b.getLong)
  }
  def readRangeFloats(start: Int, count: Int): Array[Float] = {
    val b = ByteBuffer.wrap(readRangeRaw(start, count)).order(ByteOrder.LITTLE_ENDIAN)
    Array.fill(count)(b.getFloat)
  }
  def readRangeDoubles(start: Int, count: Int): Array[Double] = {
    val b = ByteBuffer.wrap(readRangeRaw(start, count)).order(ByteOrder.LITTLE_ENDIAN)
    Array.fill(count)(b.getDouble)
  }
}

object FixedByteChunkV4 {

  def widthOf(t: PinotType): Int = t match {
    case PinotType.PInt | PinotType.PFloat => 4
    case PinotType.PLong | PinotType.PDouble | PinotType.PTimestamp => 8
    case other => throw new PinotFormatException(
      s"fixed-byte RAW encoding does not apply to ${other.name}")
  }

  /** Assemble a fixed-byte V4 section from little-endian value bytes. */
  def write(valueBytes: Array[Byte], width: Int, compression: Int,
      targetChunkSize: Int): Array[Byte] = {
    val docsPerChunk = math.max(1, targetChunkSize / width)
    val totalDocs = valueBytes.length / width
    val chunks = Iterator.range(0, totalDocs, docsPerChunk).map { from =>
      val until = math.min(from + docsPerChunk, totalDocs)
      (from, java.util.Arrays.copyOfRange(valueBytes, from * width, until * width))
    }.toVector

    val compressed = chunks.map { case (docOff, payload) =>
      (docOff, VarByteChunkV4.compressChunk(payload, compression))
    }
    val metaSize = chunks.length * VarByteChunkV4.MetadataEntrySize
    val chunksStartOffset = 16 + metaSize
    val out = ByteBuffer.allocate(
      8 + chunksStartOffset + compressed.map(_._2.length).sum)
    out.putLong(PinotDictionary.MagicMarker) // 0xDEADBEEF... magic frame
    out.putInt(4)
    out.putInt(targetChunkSize)
    out.putInt(compression)
    out.putInt(chunksStartOffset)
    var chunkOff = 0
    compressed.foreach { case (docOff, payload) =>
      out.order(ByteOrder.LITTLE_ENDIAN).putInt(docOff).putInt(chunkOff)
      out.order(ByteOrder.BIG_ENDIAN)
      chunkOff += payload.length
    }
    compressed.foreach { case (_, payload) => out.put(payload) }
    out.array()
  }
}
