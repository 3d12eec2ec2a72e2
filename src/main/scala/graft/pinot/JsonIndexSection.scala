package graft.pinot

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8

/** JSON-index section (EXTENSION — the capability of Apache Pinot's
  * `jsonIndexColumns`; the reference ignores all secondary indexes,
  * README.md:311-313).
  *
  * Structure: postings of flattened `pathvalue` keys — one
  * RoaringBitmap of docIds per (json path, scalar leaf value) pair —
  * serving pushed `get_json_object(col, '$.a.b') = 'v'` equality
  * probes as an ADVISORY doc superset (segment prune + window skip;
  * Spark's residual filter stays authoritative, like every other graft
  * index).
  *
  * Soundness contract (no false negatives — a wrong "no docs" would
  * drop rows, so every case the index cannot decide REFUSES instead):
  *
  *  - Values index VERBATIM as `get_json_object` would render them:
  *    strings escape-decoded, numbers as their literal source text
  *    (`1.0` stays `"1.0"`, never canonicalized), booleans
  *    `true`/`false`. Equality against the probe string is then exactly
  *    Spark's string equality on the function's result.
  *  - A path whose value is EVER an object or an array (in any doc) is
  *    recorded in `refusedPaths`: `get_json_object` returns the nested
  *    JSON text there, which this index does not model.
  *  - Docs the flattener cannot vouch for — malformed JSON, duplicate
  *    keys in one object (Jackson's first-match vs our last-write),
  *    nesting deeper than [[JsonIndexSection.MaxDepth]], keys outside
  *    `[A-Za-z0-9_]+` (ambiguous under dotted-path addressing) — land
  *    in `oddDocs`, which ORs into EVERY answer.
  *  - Probe eligibility: only simple dotted paths (`$.k` / `$.k1.k2`,
  *    same alphabet), values ≤ [[JsonIndexSection.MaxValueLen]] chars
  *    (longer leaves are not indexed), and never the string "null"
  *    (JSON null rendering differs across engines). Anything else →
  *    `None`, scan decodes normally.
  *  - IN-list probes ([[matchAnyBitmap]]) union the postings of each
  *    value; ONE ineligible value refuses the whole probe (a doc
  *    matching that value would have no posting to find it by).
  *  - Path-EXISTS probes ([[existsBitmap]], serving pushed
  *    `get_json_object(col, path) IS NOT NULL`) union every posting
  *    under the path. Sound only when every leaf ever seen at the path
  *    was posted, so v2 records `unpostedLeafPaths` — paths where some
  *    doc holds a leaf skipped at build time (string/number literal
  *    > MaxValueLen, or an explicit JSON null, whose rendering is
  *    engine-delicate) — and exists refuses those, plus every v1
  *    section (the set is unknown there).
  *
  * Section (`{column}.json_index`):
  * {{{
  *   8B magic | i32 version
  *   i32 numRefusedPaths | each (i32 len, utf8)
  *   i32 numUnpostedLeafPaths | each (i32 len, utf8)   // version ≥ 2
  *   i32 oddBytes | serialized RoaringBitmap (oddDocs)
  *   i32 numKeys | each (i32 len, utf8)       // sorted `pathvalue`
  *   (numKeys+1) × i32 offsets (absolute) | RoaringBitmaps
  * }}}
  */
final class JsonIndexSection(
    val keys: Array[String],
    raw: Array[Byte],
    offsets: Array[Int],
    refusedPaths: Set[String],
    oddDocs: org.roaringbitmap.buffer.ImmutableRoaringBitmap,
    unpostedLeafPaths: Option[Set[String]]) {

  import JsonIndexSection._

  def numKeys: Int = keys.length
  def numOddDocs: Int = oddDocs.getCardinality

  private def bitmap(i: Int): org.roaringbitmap.buffer.ImmutableRoaringBitmap =
    new org.roaringbitmap.buffer.ImmutableRoaringBitmap(
      ByteBuffer.wrap(raw, offsets(i), offsets(i + 1) - offsets(i)).slice())

  /** Docs where `get_json_object(col, path)` may equal `value` — the
    * exact posting for the flattened pair, OR'd with the odd-doc set.
    * None whenever the index cannot be sound for this probe (see class
    * doc); the caller must then not prune.
    */
  def matchBitmap(path: String, value: String)
      : Option[org.roaringbitmap.buffer.MutableRoaringBitmap] =
    matchAnyBitmap(path, Seq(value))

  /** Docs where `get_json_object(col, path)` may equal ANY of `values`
    * (a pushed IN-list): the union of each value's posting, OR'd with
    * the odd-doc set. One ineligible value refuses the whole probe —
    * its matches would have no posting, so pruning on the rest would
    * drop rows. An EMPTY value list is a valid probe (IN () matches
    * nothing): only the odd docs stay candidates.
    */
  def matchAnyBitmap(path: String, values: Seq[String])
      : Option[org.roaringbitmap.buffer.MutableRoaringBitmap] = {
    if (values.exists(v =>
        v == null || v == "null" || v.length > MaxValueLen)) return None
    if (!isSimplePath(path)) return None
    if (refusedPaths.contains(path)) return None
    val acc = new org.roaringbitmap.buffer.MutableRoaringBitmap
    values.foreach { v =>
      val i = java.util.Arrays.binarySearch(
        keys.asInstanceOf[Array[AnyRef]], path + Sep + v)
      if (i >= 0) acc.or(bitmap(i))
    }
    acc.or(oddDocs)
    Some(acc)
  }

  /** Docs where `get_json_object(col, path)` may be non-null (a pushed
    * `IS NOT NULL` probe): the union of every posting under the path,
    * OR'd with the odd-doc set. Refuses on v1 sections (no
    * unposted-leaf record), on paths that ever held an unposted leaf
    * (long literal / explicit JSON null — such docs have no posting
    * yet the engine may render a value), and on refused paths (object/
    * array leaves render as JSON text, which postings do not model).
    */
  def existsBitmap(path: String)
      : Option[org.roaringbitmap.buffer.MutableRoaringBitmap] =
    postedPathUnion(path, _ => true)

  /** Docs where `get_json_object(col, path)` may fall inside the
    * string range `(lo, hi)` with the given bound inclusivities
    * (serving pushed `>` / `>=` / `<` / `<=` against a string
    * literal): the union of the path's postings whose rendered value
    * lies in the range under EXACTLY Spark's string ordering —
    * `UTF8String` comparison is unsigned lexicographic over UTF-8
    * bytes, which [[JsonIndexSection.utf8Compare]] reproduces. Same
    * refusal set as exists: a doc whose leaf was not posted (long
    * literal) could satisfy the range invisibly — JSON nulls also land
    * there, conservatively (a null never satisfies a comparison, but
    * one shared set keeps the format small).
    */
  def rangeBitmap(path: String, lo: Option[String], loInc: Boolean,
      hi: Option[String], hiInc: Boolean)
      : Option[org.roaringbitmap.buffer.MutableRoaringBitmap] =
    postedPathUnion(path, { v =>
      lo.forall { b =>
        val c = utf8Compare(v, b)
        if (loInc) c >= 0 else c > 0
      } && hi.forall { b =>
        val c = utf8Compare(v, b)
        if (hiInc) c <= 0 else c < 0
      }
    })

  /** Docs PROVABLY non-null at the path — the union of every posting
    * under it, with no odd-doc OR (serving pushed
    * `get_json_object(col, path) IS NULL`: the caller complements this
    * over the segment's doc range). Sound with NO refusal cases: a
    * posted pair means the flattener vouched for the doc and placed a
    * scalar at exactly this path, so `get_json_object` returns it —
    * while docs with refused, unposted, odd, or absent leaves are
    * simply NOT in the union and stay IS-NULL candidates. An
    * over-approximation of the candidate set (e.g. a nested-object
    * leaf, which renders non-null but is never posted) only costs
    * decode work, never rows.
    */
  def notNullBitmap(path: String)
      : org.roaringbitmap.buffer.MutableRoaringBitmap = {
    val acc = new org.roaringbitmap.buffer.MutableRoaringBitmap
    val prefix = path + Sep
    var i = java.util.Arrays.binarySearch(
      keys.asInstanceOf[Array[AnyRef]], prefix)
    if (i < 0) i = -i - 1
    while (i < keys.length && keys(i).startsWith(prefix)) {
      acc.or(bitmap(i))
      i += 1
    }
    acc
  }

  /** Union of the path's postings whose VALUE satisfies `keep`, OR'd
    * with the odd docs; refuses (None) whenever some leaf at the path
    * may be missing from the postings — not simple / refused (object
    * or array leaves render as JSON text) / unposted-leaf recorded /
    * v1 section (unposted set unknown).
    */
  private def postedPathUnion(path: String, keep: String => Boolean)
      : Option[org.roaringbitmap.buffer.MutableRoaringBitmap] = {
    if (!isSimplePath(path)) return None
    if (refusedPaths.contains(path)) return None
    unpostedLeafPaths match {
      case Some(unposted) if !unposted.contains(path) =>
        val acc = new org.roaringbitmap.buffer.MutableRoaringBitmap
        val prefix = path + Sep
        var i = java.util.Arrays.binarySearch(
          keys.asInstanceOf[Array[AnyRef]], prefix)
        if (i < 0) i = -i - 1 // first key ≥ prefix (Sep sorts below all values)
        while (i < keys.length && keys(i).startsWith(prefix)) {
          if (keep(keys(i).substring(prefix.length))) acc.or(bitmap(i))
          i += 1
        }
        acc.or(oddDocs)
        Some(acc)
      case _ => None
    }
  }
}

object JsonIndexSection {

  val Version = 2 // v2: adds unpostedLeafPaths (exists-probe soundness)
  val IndexType = "json_index"
  val Sep = '\u0001'

  /** Values longer than this are not indexed (vocabulary size guard);
    * probes above it refuse symmetrically.
    */
  val MaxValueLen = 256

  /** Flattening depth cap — deeper docs go to `oddDocs` wholesale. */
  val MaxDepth = 10

  private def keyOk(k: String): Boolean =
    k.nonEmpty && k.forall(c => c == '_' ||
      (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9'))

  /** Spark's string ordering: unsigned lexicographic comparison of the
    * UTF-8 encodings (`UTF8String.compareTo`). Java's `String.compareTo`
    * differs on supplementary characters (UTF-16 surrogates order below
    * some BMP code points), so comparisons go through bytes.
    */
  def utf8Compare(a: String, b: String): Int = {
    val x = a.getBytes(UTF_8)
    val y = b.getBytes(UTF_8)
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    x.length - y.length
  }

  /** `$.k1.k2...` with every step in the indexable key alphabet. */
  def isSimplePath(p: String): Boolean = {
    if (p.length < 3 || p.charAt(0) != '$' || p.charAt(1) != '.') return false
    p.substring(2).split('.') match {
      case steps if steps.nonEmpty => steps.forall(keyOk)
      case _ => false
    }
  }

  // ---- flattener: a tiny JSON parser that keeps number literals
  // verbatim (Jackson-compatible rendering) and reports every case it
  // cannot vouch for ------------------------------------------------

  private final class OddDoc extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  private final class Parser(s: String) {
    private var i = 0
    private def odd(): Nothing = throw new OddDoc
    private def ws(): Unit =
      while (i < s.length && (s.charAt(i) == ' ' || s.charAt(i) == '\t' ||
        s.charAt(i) == '\n' || s.charAt(i) == '\r')) i += 1
    private def expect(c: Char): Unit = {
      if (i >= s.length || s.charAt(i) != c) odd()
      i += 1
    }

    /** Decoded string literal at the cursor. */
    private def stringLit(): String = {
      expect('"')
      val sb = new StringBuilder
      while (i < s.length && s.charAt(i) != '"') {
        val c = s.charAt(i)
        if (c == '\\') {
          if (i + 1 >= s.length) odd()
          s.charAt(i + 1) match {
            case '"' => sb += '"'; i += 2
            case '\\' => sb += '\\'; i += 2
            case '/' => sb += '/'; i += 2
            case 'b' => sb += '\b'; i += 2
            case 'f' => sb += '\f'; i += 2
            case 'n' => sb += '\n'; i += 2
            case 'r' => sb += '\r'; i += 2
            case 't' => sb += '\t'; i += 2
            case 'u' =>
              if (i + 6 > s.length) odd()
              val h = s.substring(i + 2, i + 6)
              val cp = try Integer.parseInt(h, 16)
                catch { case _: NumberFormatException => odd() }
              sb += cp.toChar; i += 6
            case _ => odd()
          }
        } else { sb += c; i += 1 }
      }
      expect('"')
      sb.result()
    }

    /** Verbatim number/true/false literal text at the cursor. */
    private def bareLit(): String = {
      val start = i
      while (i < s.length && {
        val c = s.charAt(i)
        c == '-' || c == '+' || c == '.' || c == 'e' || c == 'E' ||
          (c >= '0' && c <= '9') ||
          (c >= 'a' && c <= 'z') // true/false/null and nothing else valid
      }) i += 1
      if (i == start) odd()
      s.substring(start, i)
    }

    /** Walks one value at `path`, emitting leaf pairs / refusals;
      * `unposted` reports a leaf legitimately skipped from the postings
      * (long literal, explicit JSON null) so exists-probes can refuse.
      */
    private def value(path: String, depth: Int,
        emit: (String, String) => Unit, refuse: String => Unit,
        unposted: String => Unit): Unit = {
      if (depth > MaxDepth) odd()
      ws()
      if (i >= s.length) odd()
      s.charAt(i) match {
        case '{' =>
          if (path.nonEmpty) refuse(path) // object leaf for this path
          i += 1
          ws()
          val seen = scala.collection.mutable.HashSet.empty[String]
          if (i < s.length && s.charAt(i) == '}') { i += 1 }
          else {
            var more = true
            while (more) {
              ws()
              val k = stringLit()
              if (!keyOk(k)) odd()
              if (!seen.add(k)) odd() // duplicate key: rendering ambiguous
              ws(); expect(':')
              val childPath = if (path.isEmpty) "$." + k else path + "." + k
              value(childPath, depth + 1, emit, refuse, unposted)
              ws()
              if (i < s.length && s.charAt(i) == ',') i += 1
              else { expect('}'); more = false }
            }
          }
        case '[' =>
          if (path.nonEmpty) refuse(path) // arrays: not modeled, refuse path
          // skip the array body without emitting (balanced, string-aware)
          var depthB = 0
          var done = false
          while (!done) {
            if (i >= s.length) odd()
            s.charAt(i) match {
              case '"' => stringLit()
              case '[' => depthB += 1; i += 1
              case ']' => depthB -= 1; i += 1; if (depthB == 0) done = true
              case _ => i += 1
            }
          }
          if (path.isEmpty) odd() // top-level array: nothing to index
        case '"' =>
          val v = stringLit()
          if (path.isEmpty) odd()
          if (v.length <= MaxValueLen) emit(path, v) else unposted(path)
        case _ =>
          val lit = bareLit()
          if (path.isEmpty) odd()
          // explicit JSON null: never indexed (equality probes refuse
          // "null"; exists-probes refuse the path — rendering is
          // engine-delicate)
          if (lit == "null") unposted(path)
          else if (lit == "true" || lit == "false") emit(path, lit)
          else {
            // verbatim number literal; sanity-check it parses so stray
            // garbage lands in oddDocs instead of the vocabulary
            try { java.lang.Double.parseDouble(lit); () }
            catch { case _: NumberFormatException => odd() }
            if (lit.length <= MaxValueLen) emit(path, lit) else unposted(path)
          }
      }
    }

    def parseDoc(emit: (String, String) => Unit,
        refuse: String => Unit, unposted: String => Unit): Unit = {
      value("", 0, emit, refuse, unposted)
      ws()
      if (i != s.length) odd() // trailing garbage
    }
  }

  def build(values: Iterator[String]): Array[Byte] = {
    val postings = scala.collection.mutable.HashMap
      .empty[String, org.roaringbitmap.RoaringBitmap]
    val refused = scala.collection.mutable.HashSet.empty[String]
    val unposted = scala.collection.mutable.HashSet.empty[String]
    val odd = new org.roaringbitmap.RoaringBitmap
    var doc = 0
    values.foreach { v =>
      if (v == null) () // absent doc: no postings, nothing can match
      else {
        val pairs = scala.collection.mutable.HashSet.empty[(String, String)]
        try {
          new Parser(v).parseDoc(
            (p, lit) => pairs += ((p, lit)),
            p => { refused += p; () },
            p => { unposted += p; () })
          pairs.foreach { case (p, lit) =>
            postings.getOrElseUpdate(p + Sep + lit,
              new org.roaringbitmap.RoaringBitmap).add(doc)
          }
        } catch { case _: OddDoc => odd.add(doc) }
      }
      doc += 1
    }
    val keys = postings.keys.toArray.sorted
    val refusedArr = refused.toArray.sorted
    val unpostedArr = unposted.toArray.sorted
    val oddBytes = {
      odd.runOptimize()
      val bos = new ByteArrayOutputStream()
      odd.serialize(new java.io.DataOutputStream(bos))
      bos.toByteArray
    }
    val keyBytes = keys.map(_.getBytes(UTF_8))
    val refusedBytes = refusedArr.map(_.getBytes(UTF_8))
    val unpostedBytes = unpostedArr.map(_.getBytes(UTF_8))
    val header = 8 + 4 +
      4 + refusedBytes.map(_.length + 4).sum +
      4 + unpostedBytes.map(_.length + 4).sum +
      4 + oddBytes.length +
      4 + keyBytes.map(_.length + 4).sum +
      4 * (keys.length + 1)
    val body = new ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(body)
    val offsets = new Array[Int](keys.length + 1)
    offsets(0) = header
    keys.zipWithIndex.foreach { case (k, i) =>
      val bm = postings(k)
      bm.runOptimize()
      bm.serialize(out)
      offsets(i + 1) = header + body.size()
    }
    val buf = ByteBuffer.allocate(header + body.size())
    buf.putLong(PinotDictionary.MagicMarker)
    buf.putInt(Version)
    buf.putInt(refusedBytes.length)
    refusedBytes.foreach { b => buf.putInt(b.length); buf.put(b) }
    buf.putInt(unpostedBytes.length)
    unpostedBytes.foreach { b => buf.putInt(b.length); buf.put(b) }
    buf.putInt(oddBytes.length)
    buf.put(oddBytes)
    buf.putInt(keys.length)
    keyBytes.foreach { b => buf.putInt(b.length); buf.put(b) }
    offsets.foreach(buf.putInt)
    buf.put(body.toByteArray)
    buf.array()
  }

  def deserialize(bytes: Array[Byte]): JsonIndexSection = {
    val buf = ByteBuffer.wrap(bytes)
    val magic = buf.getLong
    if (magic != PinotDictionary.MagicMarker)
      throw new PinotFormatException(f"json_index section: bad magic 0x$magic%x")
    val version = buf.getInt
    if (version < 1 || version > Version)
      throw new PinotFormatException(s"json_index: unsupported version $version")
    def str(): String = {
      val len = buf.getInt
      if (len < 0 || len > buf.remaining)
        throw new PinotFormatException("json_index: corrupt string length")
      val b = new Array[Byte](len)
      buf.get(b)
      new String(b, UTF_8)
    }
    val nRefused = buf.getInt
    if (nRefused < 0 || nRefused.toLong * 4 > buf.remaining)
      throw new PinotFormatException("json_index: corrupt refused count")
    val refused = (0 until nRefused).map(_ => str()).toSet
    val unposted: Option[Set[String]] =
      if (version < 2) None // v1: unknown → exists-probes refuse
      else {
        val n = buf.getInt
        if (n < 0 || n.toLong * 4 > buf.remaining)
          throw new PinotFormatException("json_index: corrupt unposted count")
        Some((0 until n).map(_ => str()).toSet)
      }
    val oddLen = buf.getInt
    if (oddLen < 0 || oddLen > buf.remaining)
      throw new PinotFormatException("json_index: corrupt odd-doc length")
    val oddSlice = buf.slice()
    oddSlice.limit(oddLen)
    val odd = new org.roaringbitmap.buffer.ImmutableRoaringBitmap(oddSlice)
    buf.position(buf.position() + oddLen)
    val nk = buf.getInt
    if (nk < 0 || nk.toLong * 4 + 4L * (nk + 1L) > buf.remaining)
      throw new PinotFormatException("json_index: corrupt key count")
    val keys = Array.fill(nk)(str())
    val offsets = new Array[Int](nk + 1)
    var i = 0
    while (i <= nk) { offsets(i) = buf.getInt; i += 1 }
    new JsonIndexSection(keys, bytes, offsets, refused, odd, unposted)
  }
}
