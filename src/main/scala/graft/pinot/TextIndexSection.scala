package graft.pinot

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

/** Text-index section (EXTENSION — the capability of Apache Pinot's
  * `textIndexColumns`, re-expressed without the Lucene dependency; the
  * reference ignores all secondary indexes, README.md:311-313).
  *
  * Structure: the column's WHITESPACE-TOKEN vocabulary (sorted, unique)
  * plus a RoaringBitmap of docIds per token. Substring predicates
  * (`contains`, `startsWith`, `endsWith` — Spark pushes all three as
  * source filters on string columns) resolve by scanning the vocabulary
  * for tokens containing the probe and OR-ing their postings.
  *
  * Soundness of the superset: text is tokens joined by whitespace, so a
  * probe containing NO whitespace character that occurs anywhere in the
  * text must lie entirely inside one token — hence the probed docs are
  * always a superset of the true matches (probes with whitespace simply
  * never consult the index), and Spark's residual filter keeps
  * exactness. `startsWith`/`endsWith` matches are `contains` matches, so
  * the same candidate set covers them.
  *
  * Section (`{column}.text_index`; `.text.inv` file in the v1 layout):
  * {{{
  *   8B magic | i32 version=1 | i32 numTokens
  *   numTokens × (i32 len, utf8 bytes)        // sorted unique tokens
  *   (numTokens+1) × i32 offsets (absolute)   | RoaringBitmaps
  * }}}
  */
final class TextIndexSection(
    val tokens: Array[String],
    raw: Array[Byte],
    offsets: Array[Int]) {

  def numTokens: Int = tokens.length

  private def bitmap(i: Int): org.roaringbitmap.buffer.ImmutableRoaringBitmap =
    new org.roaringbitmap.buffer.ImmutableRoaringBitmap(
      ByteBuffer.wrap(raw, offsets(i), offsets(i + 1) - offsets(i)).slice())

  /** Docs whose text may contain `probe` as a substring — the OR of the
    * postings of every vocabulary token containing it. None when the
    * probe has whitespace (could straddle tokens: index must not answer).
    */
  def matchBitmap(probe: String)
      : Option[org.roaringbitmap.buffer.MutableRoaringBitmap] = {
    if (probe.isEmpty || probe.exists(_.isWhitespace)) return None
    val acc = new org.roaringbitmap.buffer.MutableRoaringBitmap
    var i = 0
    while (i < tokens.length) {
      if (tokens(i).contains(probe)) acc.or(bitmap(i))
      i += 1
    }
    Some(acc)
  }
}

object TextIndexSection {

  val Version = 1
  val IndexType = "text_index"

  /** Writer/probe tokenizer — MUST stay in sync with the whitespace
    * check in [[TextIndexSection.matchBitmap]].
    */
  def tokenize(text: String): Array[String] =
    text.split("\\s+").filter(_.nonEmpty)

  def build(values: Iterator[String]): Array[Byte] = {
    val postings = scala.collection.mutable.HashMap
      .empty[String, org.roaringbitmap.RoaringBitmap]
    var doc = 0
    values.foreach { v =>
      tokenize(v).distinct.foreach { t =>
        postings.getOrElseUpdate(t, new org.roaringbitmap.RoaringBitmap)
          .add(doc)
      }
      doc += 1
    }
    val tokens = postings.keys.toArray.sorted
    val encoded = tokens.map(_.getBytes(StandardCharsets.UTF_8))
    val dictBytes = encoded.map(_.length + 4).sum
    val header = 8 + 4 + 4 + dictBytes + 4 * (tokens.length + 1)
    val body = new ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(body)
    val offsets = new Array[Int](tokens.length + 1)
    offsets(0) = header
    tokens.zipWithIndex.foreach { case (t, i) =>
      val bm = postings(t)
      bm.runOptimize()
      bm.serialize(out)
      offsets(i + 1) = header + body.size()
    }
    val buf = ByteBuffer.allocate(header + body.size())
    buf.putLong(PinotDictionary.MagicMarker)
    buf.putInt(Version)
    buf.putInt(tokens.length)
    encoded.foreach { e => buf.putInt(e.length); buf.put(e) }
    offsets.foreach(buf.putInt)
    buf.put(body.toByteArray)
    buf.array()
  }

  def deserialize(bytes: Array[Byte]): TextIndexSection = {
    val buf = ByteBuffer.wrap(bytes)
    val magic = buf.getLong
    if (magic != PinotDictionary.MagicMarker)
      throw new PinotFormatException(f"text_index section: bad magic 0x$magic%x")
    val version = buf.getInt
    if (version != Version)
      throw new PinotFormatException(s"text_index: unsupported version $version")
    val nt = buf.getInt
    // each token needs ≥4 length bytes and the offset table another
    // 4*(nt+1): bound nt against what the buffer can actually hold so a
    // corrupt count fails as a format error, not an OOM
    if (nt < 0 || bytes.length < 8L + 8L + nt * 4L + 4L * (nt + 1L))
      throw new PinotFormatException("text_index: corrupt header")
    val tokens = Array.fill(nt) {
      val len = buf.getInt
      if (len < 0 || len > buf.remaining)
        throw new PinotFormatException("text_index: corrupt token length")
      val b = new Array[Byte](len)
      buf.get(b)
      new String(b, StandardCharsets.UTF_8)
    }
    val offsets = new Array[Int](nt + 1)
    var i = 0
    while (i <= nt) { offsets(i) = buf.getInt; i += 1 }
    new TextIndexSection(tokens, bytes, offsets)
  }
}
