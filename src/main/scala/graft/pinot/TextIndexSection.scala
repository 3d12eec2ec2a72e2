package graft.pinot

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

/** Text-index section (EXTENSION — the capability of Apache Pinot's
  * `textIndexColumns`, re-expressed without the Lucene dependency; the
  * reference ignores all secondary indexes, README.md:311-313).
  *
  * Structure: the column's token vocabulary (sorted, unique) plus a
  * RoaringBitmap of docIds per token, under a recorded ANALYZER that the
  * writer and the probe side must agree on:
  *
  *  - `AnalyzerStandard` (v2 sections, default): maximal runs of Unicode
  *    letters/digits, char-wise lowercased — the shape of Lucene's
  *    StandardAnalyzer (Pinot's default for `textIndexColumns`), minus
  *    stop-words and stemming. Char-wise folding (per-char
  *    `Character.toLowerCase`, never locale/special casing) keeps the
  *    mapping positionwise, which the superset proof below relies on.
  *  - `AnalyzerStandardStop`: standard analysis plus Lucene's classic
  *    English stop set dropped from the vocabulary — full Lucene
  *    `StandardAnalyzer` parity (Pinot's actual default). The probe side
  *    refuses any probe that is a substring of a stop word (see
  *    `matchBitmap`), which restores the superset invariant.
  *  - `AnalyzerWhitespace` (all v1 sections): whitespace-delimited,
  *    case-exact tokens — retained so pre-upgrade segments keep serving.
  *
  * Substring predicates (`contains`, `startsWith`, `endsWith` — Spark
  * pushes all three as source filters on string columns) resolve by
  * scanning the vocabulary for tokens containing the (analyzer-folded)
  * probe and OR-ing their postings.
  *
  * Soundness of the superset, per analyzer:
  *  - whitespace: text is tokens joined by whitespace, so a probe with
  *    NO whitespace lies entirely inside one token.
  *  - standard: tokens are MAXIMAL letter/digit runs, so a probe that is
  *    all letters/digits lies inside one run; and because folding is
  *    positionwise (`fold(text) contains fold(p)` whenever
  *    `text contains p`), the folded-vocabulary scan over the folded
  *    probe covers every case variant.
  *  Probes outside the analyzer's alphabet never consult the index, and
  *  Spark's residual filter keeps exactness either way.
  *  `startsWith`/`endsWith` matches are `contains` matches, so the same
  *  candidate set covers them.
  *
  * Section (`{column}.text_index`; `.text.inv` file in the v1 layout):
  * {{{
  *   8B magic | i32 version | [i32 analyzer  (version ≥ 2 only)]
  *   i32 numTokens
  *   numTokens × (i32 len, utf8 bytes)        // sorted unique tokens
  *   (numTokens+1) × i32 offsets (absolute)   | RoaringBitmaps
  * }}}
  */
final class TextIndexSection(
    val tokens: Array[String],
    raw: Array[Byte],
    offsets: Array[Int],
    val analyzer: Int) {

  import TextIndexSection._

  def numTokens: Int = tokens.length

  private def bitmap(i: Int): org.roaringbitmap.buffer.ImmutableRoaringBitmap =
    new org.roaringbitmap.buffer.ImmutableRoaringBitmap(
      ByteBuffer.wrap(raw, offsets(i), offsets(i + 1) - offsets(i)).slice())

  /** Docs whose text may contain `probe` as a substring — the OR of the
    * postings of every vocabulary token containing the analyzer-folded
    * probe. None when the probe could straddle tokens (whitespace under
    * the whitespace analyzer; any non-letter/digit under standard):
    * the index must not answer then.
    */
  def matchBitmap(probe: String)
      : Option[org.roaringbitmap.buffer.MutableRoaringBitmap] = {
    if (probe.isEmpty) return None
    val folded = analyzer match {
      case AnalyzerStandard =>
        if (!probe.forall(Character.isLetterOrDigit)) return None
        foldChars(probe)
      case AnalyzerStandardStop =>
        if (!probe.forall(Character.isLetterOrDigit)) return None
        val f = foldChars(probe)
        // Only stop-word TOKENS are absent from the vocabulary (tokens
        // merely CONTAINING a stop word — "theory" ⊇ "the" — are still
        // indexed). So the superset proof fails exactly when the folded
        // probe could sit inside a dropped token, i.e. when it is a
        // substring of some stop word: refuse, and the scan stays
        // authoritative. Any longer/other probe keeps the standard-
        // analyzer argument verbatim.
        if (StopWords.exists(_.contains(f))) return None
        f
      case _ =>
        if (probe.exists(_.isWhitespace)) return None
        probe
    }
    val acc = new org.roaringbitmap.buffer.MutableRoaringBitmap
    var i = 0
    while (i < tokens.length) {
      if (tokens(i).contains(folded)) acc.or(bitmap(i))
      i += 1
    }
    Some(acc)
  }
}

object TextIndexSection {

  val Version = 2
  val IndexType = "text_index"

  /** v1 sections' implicit analyzer: whitespace split, case-exact. */
  val AnalyzerWhitespace = 0

  /** Default since v2: letter/digit runs, char-wise lowercased. */
  val AnalyzerStandard = 1

  /** Standard analysis + Lucene's classic English stop set dropped from
    * the vocabulary — the full shape of Lucene's `StandardAnalyzer`,
    * which is what Apache Pinot's `textIndexColumns` runs by default.
    * (Lucene's StandardAnalyzer does NOT stem — stemming would need
    * EnglishAnalyzer, which Pinot does not default to — so stop handling
    * closes the Lucene-parity gap; see the soundness note in
    * [[TextIndexSection.matchBitmap]].) Stop postings are the largest
    * bitmaps in a text index (highest document frequency), so dropping
    * them is also the main size lever.
    */
  val AnalyzerStandardStop = 2

  /** Lucene `EnglishAnalyzer.ENGLISH_STOP_WORDS_SET` (the classic 33). */
  val StopWords: Set[String] = Set(
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "if",
    "in", "into", "is", "it", "no", "not", "of", "on", "or", "such",
    "that", "the", "their", "then", "there", "these", "they", "this",
    "to", "was", "will", "with")

  /** Positionwise case fold — per-char `Character.toLowerCase`, so
    * `fold(text).contains(fold(p))` holds whenever `text.contains(p)`
    * (String.toLowerCase would not guarantee this: special casing can
    * change lengths).
    */
  private[pinot] def foldChars(s: String): String = {
    val a = s.toCharArray
    var i = 0
    while (i < a.length) { a(i) = Character.toLowerCase(a(i)); i += 1 }
    new String(a)
  }

  /** Writer/probe tokenizer for `analyzer` — MUST stay in sync with the
    * probe eligibility checks in [[TextIndexSection.matchBitmap]].
    */
  def tokenize(text: String, analyzer: Int = AnalyzerStandard): Array[String] =
    analyzer match {
      case AnalyzerStandard | AnalyzerStandardStop =>
        val out = Array.newBuilder[String]
        val n = text.length
        var i = 0
        while (i < n) {
          while (i < n && !Character.isLetterOrDigit(text.charAt(i))) i += 1
          val start = i
          while (i < n && Character.isLetterOrDigit(text.charAt(i))) i += 1
          if (i > start) {
            val t = foldChars(text.substring(start, i))
            if (analyzer == AnalyzerStandard || !StopWords.contains(t))
              out += t
          }
        }
        out.result()
      case _ => text.split("\\s+").filter(_.nonEmpty)
    }

  def build(values: Iterator[String],
      analyzer: Int = AnalyzerStandard): Array[Byte] = {
    val postings = scala.collection.mutable.HashMap
      .empty[String, org.roaringbitmap.RoaringBitmap]
    var doc = 0
    values.foreach { v =>
      tokenize(v, analyzer).distinct.foreach { t =>
        postings.getOrElseUpdate(t, new org.roaringbitmap.RoaringBitmap)
          .add(doc)
      }
      doc += 1
    }
    val tokens = postings.keys.toArray.sorted
    val encoded = tokens.map(_.getBytes(StandardCharsets.UTF_8))
    val dictBytes = encoded.map(_.length + 4).sum
    val header = 8 + 4 + 4 + 4 + dictBytes + 4 * (tokens.length + 1)
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
    buf.putInt(analyzer)
    buf.putInt(tokens.length)
    encoded.foreach { e => buf.putInt(e.length); buf.put(e) }
    offsets.foreach(buf.putInt)
    buf.put(body.toByteArray)
    buf.array()
  }

  /** Analyzer id from the section header alone (no vocabulary decode).
    * Same validation as [[deserialize]] for the fields it touches.
    */
  def analyzerOf(bytes: Array[Byte]): Int = {
    if (bytes.length < 16)
      throw new PinotFormatException(
        s"text_index section: truncated header (${bytes.length} bytes)")
    val buf = ByteBuffer.wrap(bytes)
    val magic = buf.getLong
    if (magic != PinotDictionary.MagicMarker)
      throw new PinotFormatException(f"text_index section: bad magic 0x$magic%x")
    val version = buf.getInt
    if (version < 1 || version > Version)
      throw new PinotFormatException(s"text_index: unsupported version $version")
    val analyzer = if (version >= 2) buf.getInt else AnalyzerWhitespace
    if (analyzer != AnalyzerWhitespace && analyzer != AnalyzerStandard &&
        analyzer != AnalyzerStandardStop)
      throw new PinotFormatException(s"text_index: unknown analyzer $analyzer")
    analyzer
  }

  def deserialize(bytes: Array[Byte]): TextIndexSection = {
    val buf = ByteBuffer.wrap(bytes)
    val magic = buf.getLong
    if (magic != PinotDictionary.MagicMarker)
      throw new PinotFormatException(f"text_index section: bad magic 0x$magic%x")
    val version = buf.getInt
    if (version < 1 || version > Version)
      throw new PinotFormatException(s"text_index: unsupported version $version")
    // v1 sections carry no analyzer field: they were written under the
    // whitespace analyzer and keep serving under it
    val analyzer = if (version >= 2) buf.getInt else AnalyzerWhitespace
    if (version >= 2 && analyzer != AnalyzerWhitespace &&
        analyzer != AnalyzerStandard && analyzer != AnalyzerStandardStop)
      throw new PinotFormatException(s"text_index: unknown analyzer $analyzer")
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
    new TextIndexSection(tokens, bytes, offsets, analyzer)
  }
}
