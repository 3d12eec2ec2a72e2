package graft.pinot

/** Fixed-bit-width unpacker for dictionary-id forward indexes.
  *
  * Values are packed MSB-first ("big-endian bit order"): the value for doc
  * `d` starts at absolute bit `d * bitsPerValue`
  * (reference: pinot-segment/src/forward_index/fixed_bit.rs:8-103, itself
  * based on Apache Pinot's public PinotDataBitSet.java).
  *
  * The payload starts at `buffer(byteBase)`: callers may pass the raw
  * unstripped section with `byteBase = 8` (skipping the magic marker) so
  * concurrent sub-segment slices can share one cached section array, or a
  * pre-stripped payload with the default `byteBase = 0`.
  */
final class FixedBitReader(buffer: Array[Byte], bitsPerValue: Int,
    numValues: Int, byteBase: Int = 0) {
  require(bitsPerValue > 0 && bitsPerValue <= 31,
    s"bitsPerValue must be in [1,31], got $bitsPerValue")

  def length: Int = numValues

  /** Random access for one doc id. */
  def get(docId: Int): Int = {
    if (docId < 0 || docId >= numValues)
      throw new PinotFormatException(s"doc_id $docId out of range (numValues=$numValues)")
    val bitOffset = docId.toLong * bitsPerValue
    var byteOffset = byteBase + (bitOffset / 8).toInt
    val bitInFirst = (bitOffset % 8).toInt
    var value = (buffer(byteOffset) & (0xFF >>> bitInFirst))
    var bitsLeft = bitsPerValue - (8 - bitInFirst)
    if (bitsLeft <= 0) value >>> (-bitsLeft)
    else {
      byteOffset += 1
      while (bitsLeft > 8) {
        value = (value << 8) | (buffer(byteOffset) & 0xFF)
        bitsLeft -= 8
        byteOffset += 1
      }
      (value << bitsLeft) | ((buffer(byteOffset) & 0xFF) >>> (8 - bitsLeft))
    }
  }

  /** Decode every dict id in one sequential pass (single rolling bit
    * accumulator — same result as per-doc `get`, ~bitsPerValue× fewer
    * byte loads than the reference's per-doc loop, fixed_bit.rs:106-112).
    */
  def readAll(): Array[Int] = readRange(0, numValues)

  /** Decode dict ids for docs [start, start + count) only — values are
    * position-addressable (doc d begins at bit d·bits), so a sub-range
    * decode touches just its own bytes. Powers sorted-column range scans.
    */
  def readRange(start: Int, count: Int): Array[Int] = {
    require(start >= 0 && count >= 0 && start + count <= numValues,
      s"range [$start, ${start + count}) out of [0, $numValues)")
    val out = new Array[Int](count)
    val startBit = start.toLong * bitsPerValue
    var byteIdx = byteBase + (startBit / 8).toInt
    var acc = 0L       // bit accumulator, most-recent bits in the low end
    var accBits = 0    // number of valid bits in acc
    val skewBits = (startBit % 8).toInt
    if (skewBits > 0) { // preload the partial leading byte
      acc = buffer(byteIdx) & ((1L << (8 - skewBits)) - 1)
      accBits = 8 - skewBits
      byteIdx += 1
    }
    var i = 0
    while (i < count) {
      while (accBits < bitsPerValue) {
        acc = (acc << 8) | (buffer(byteIdx) & 0xFFL)
        accBits += 8
        byteIdx += 1
      }
      out(i) = ((acc >>> (accBits - bitsPerValue)) & ((1L << bitsPerValue) - 1)).toInt
      accBits -= bitsPerValue
      i += 1
    }
    out
  }
}

object FixedBitReader {

  /** Pack values MSB-first at `bitsPerValue` bits each — the exact inverse of
    * [[FixedBitReader.get]]; used by the test-only segment writer and the
    * ScalaCheck round-trip specs.
    */
  def pack(values: Array[Int], bitsPerValue: Int): Array[Byte] = {
    val totalBits = values.length.toLong * bitsPerValue
    val out = new Array[Byte](((totalBits + 7) / 8).toInt)
    var bitPos = 0L
    values.foreach { v =>
      require(v >= 0 && (bitsPerValue == 31 || v < (1 << bitsPerValue)),
        s"value $v does not fit in $bitsPerValue bits")
      var bitsLeft = bitsPerValue
      while (bitsLeft > 0) {
        val byteIdx = (bitPos / 8).toInt
        val bitInByte = (bitPos % 8).toInt
        val take = math.min(8 - bitInByte, bitsLeft)
        val shifted = (v >>> (bitsLeft - take)) & ((1 << take) - 1)
        out(byteIdx) = (out(byteIdx) | (shifted << (8 - bitInByte - take))).toByte
        bitPos += take
        bitsLeft -= take
      }
    }
    out
  }
}
