package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType}

/** HyperLogLog distinct-count sketch — the Spark-native analog of Pinot's
  * DISTINCT_COUNT_HLL aggregation (Pinot's most commonly used approximate
  * distinct function; the reference delegates all aggregation to its host
  * engine and has no sketch support at all, table.rs:162).
  *
  * Two phases, the standard sparse→dense design (as in the public
  * DataSketches HLL, which stays in an exact LIST/SET mode at low
  * cardinality):
  *
  *  - SPARSE: a sorted set of the raw 64-bit input hashes, EXACT while
  *    the set holds ≤ m/4 values (m = 2^p registers). This is the
  *    oracle-checkable regime, mirroring the repo's other sketches
  *    (KMV below k, KLL below k) — and it keeps small groups exact at a
  *    fraction of dense-register memory.
  *  - DENSE: m byte registers, register j = max rank of the first 1-bit
  *    over hashes bucketed to j. Estimate = bias-corrected harmonic mean
  *    (Flajolet α_m), with linear counting below 2.5·m — standard error
  *    ~1.04/√m, property-tested in HllSketchSpec.
  *
  * Merges are lossless in every direction (sparse∪sparse stays exact
  * until the limit; anything into dense takes register maxima), so
  * per-partition summaries, per-segment STORED sections
  * ([[graft.pinot.SketchSection]] kind `hll<p>`), and rollup sketch
  * metrics all COMPOSE — the hash contract is Spark `xxhash64` seed 42
  * throughout, the same as every other sketch in the repo.
  *
  * At 100 TB: one ≤(m/4·8B sparse | m·1B dense) summary per group per
  * partition crosses the wire (map-side combine), vs count(distinct)'s
  * every-(group,value)-pair shuffle.
  */
final class HllSketch(val p: Int) {
  require(p >= 4 && p <= 18, s"hll p must be in [4, 18], got $p")

  val m: Int = 1 << p
  private val sparseLimit: Int = m / 4

  // exactly one of these is live: sparse set until > sparseLimit, then
  // dense registers forever. The sparse phase is a PRIMITIVE
  // open-addressing hash set ([[HllSketch.LongHashSet]]): ~11 B/entry
  // at peak vs ~40 B/entry for a boxed TreeSet — the buffer that
  // matters in grouped aggregations holding thousands of sparse
  // sketches at once. Serialization sorts (signed ascending, exactly
  // the old TreeSet iteration order), so merge results stay
  // byte-for-byte deterministic and stored sections are unchanged.
  private[graft] var sparse: HllSketch.LongHashSet =
    new HllSketch.LongHashSet()
  private[graft] var regs: Array[Byte] = null

  def isSparse: Boolean = regs == null

  private def toDense(): Unit = {
    regs = new Array[Byte](m)
    sparse.foreachValue(addToRegs)
    sparse = null
  }

  private def addToRegs(h: Long): Unit = {
    val idx = (h >>> (64 - p)).toInt
    val w = h << p
    // rank of the first 1-bit among the remaining 64-p bits (1-based);
    // all-zero suffix ranks 64-p+1. Max 61 for p ≥ 4, so 1L << r is safe.
    val r = if (w == 0L) (64 - p + 1) else (java.lang.Long.numberOfLeadingZeros(w) + 1)
    if (r > regs(idx)) regs(idx) = r.toByte
  }

  def addHash(h: Long): Unit =
    if (isSparse) {
      sparse.add(h)
      if (sparse.size > sparseLimit) toDense()
    } else addToRegs(h)

  def mergeIn(b: HllSketch): Unit = {
    require(b.p == p, s"hll merge across p: $p vs ${b.p}")
    if (b.isSparse) {
      b.sparse.foreachValue(addHash)
    } else {
      if (isSparse) toDense()
      var i = 0
      while (i < m) {
        if (b.regs(i) > regs(i)) regs(i) = b.regs(i)
        i += 1
      }
    }
  }

  private def alpha: Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _ => 0.7213 / (1.0 + 1.079 / m)
  }

  /** Exact count in sparse phase; bias-corrected HLL estimate (linear
    * counting below 2.5·m) in dense phase. 64-bit hashes need no
    * large-range correction.
    */
  def estimate: Long =
    if (isSparse) sparse.size.toLong
    else {
      var sum = 0.0
      var zeros = 0
      var i = 0
      while (i < m) {
        val r = regs(i)
        if (r == 0) zeros += 1
        sum += 1.0 / (1L << r).toDouble
        i += 1
      }
      val e = alpha * m.toDouble * m.toDouble / sum
      val corrected =
        if (e <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
        else e
      math.round(corrected)
    }

  /** Body bytes (no [[graft.pinot.SketchSection]] frame): mode byte
    * (0 = sparse, 1 = dense), then int n + n hash longs, or m registers.
    */
  def serializeBody(): Array[Byte] =
    if (isSparse) {
      val sorted = sparse.toSortedArray // signed ascending: the byte
      val bb = ByteBuffer.allocate(1 + 4 + 8 * sorted.length) // contract
      bb.put(0.toByte).putInt(sorted.length)
      var i = 0
      while (i < sorted.length) { bb.putLong(sorted(i)); i += 1 }
      bb.array()
    } else {
      val bb = ByteBuffer.allocate(1 + m)
      bb.put(1.toByte).put(regs)
      bb.array()
    }
}

object HllSketch {

  /** Primitive open-addressing set of 64-bit hashes for the sparse
    * phase: an 8 B/slot long table at ≤ 5/8 load + a zero flag (the
    * empty-slot sentinel is 0, so the value 0 is tracked out of band),
    * linear probing, golden-ratio multiplicative spread of the already-
    * well-mixed xxhash64 inputs. No boxing, no per-entry nodes — the
    * TreeSet it replaces cost ~40 B/entry in grouped aggregation
    * buffers. Insert order does not matter: consumers sort on exit
    * ([[toSortedArray]]) to keep serialized bytes deterministic.
    */
  final class LongHashSet {
    private var table = new Array[Long](32)
    private var mask = 31
    private var n = 0 // non-zero entries
    private var hasZero = false

    def size: Int = n + (if (hasZero) 1 else 0)

    def add(v: Long): Unit = {
      if (v == 0L) { hasZero = true; return }
      var i = (java.lang.Long.reverse(v * -0x61c8864680b583ebL).toInt
        & mask)
      while (true) {
        val cur = table(i)
        if (cur == v) return
        if (cur == 0L) {
          table(i) = v
          n += 1
          if (n * 8 > table.length * 5) grow()
          return
        }
        i = (i + 1) & mask
      }
    }

    private def grow(): Unit = {
      val old = table
      table = new Array[Long](old.length << 1)
      mask = table.length - 1
      n = 0
      var j = 0
      while (j < old.length) {
        if (old(j) != 0L) add(old(j))
        j += 1
      }
    }

    def foreachValue(f: Long => Unit): Unit = {
      if (hasZero) f(0L)
      var j = 0
      while (j < table.length) {
        if (table(j) != 0L) f(table(j))
        j += 1
      }
    }

    /** Entries in SIGNED ascending order — the serialization contract
      * (identical to the TreeSet ordering of prior rounds' stored
      * sections).
      */
    def toSortedArray: Array[Long] = {
      val out = new Array[Long](size)
      var k = 0
      if (hasZero) { out(k) = 0L; k += 1 }
      var j = 0
      while (j < table.length) {
        if (table(j) != 0L) { out(k) = table(j); k += 1 }
        j += 1
      }
      java.util.Arrays.sort(out)
      out
    }
  }

  def deserializeBody(p: Int, body: Array[Byte]): HllSketch = {
    val h = new HllSketch(p)
    val bb = ByteBuffer.wrap(body)
    bb.get() match {
      case 0 =>
        val n = bb.getInt
        var i = 0
        while (i < n) { h.addHash(bb.getLong); i += 1 }
      case 1 =>
        val regs = new Array[Byte](h.m)
        bb.get(regs)
        // splice the registers in directly — they ARE the state
        h.regs = regs
        h.sparse = null
      case other =>
        throw new IllegalArgumentException(s"hll body: unknown mode $other")
    }
    h
  }
}

/** DISTINCT_COUNT_HLL over a pre-hashed bigint column (feed
  * `xxhash64(col)` — seed 42, the repo-wide sketch hash contract).
  * Exact while every merged buffer stays sparse (≤ 2^p/4 distinct).
  */
case class HllDistinctAgg(
    child: Expression,
    p: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[HllSketch] {

  require(p >= 4 && p <= 18, s"hll_distinct p must be in [4, 18], got $p")

  override def children: Seq[Expression] = Seq(child)

  override def nullable: Boolean = false

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hll_distinct requires a pre-hashed bigint input, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): HllSketch = new HllSketch(p)

  override def update(buf: HllSketch, input: InternalRow): HllSketch = {
    val v = child.eval(input)
    if (v != null) buf.addHash(v.asInstanceOf[Long])
    buf
  }

  override def merge(a: HllSketch, b: HllSketch): HllSketch = {
    a.mergeIn(b)
    a
  }

  override def eval(buf: HllSketch): Any = buf.estimate

  override def serialize(buf: HllSketch): Array[Byte] = buf.serializeBody()

  override def deserialize(bytes: Array[Byte]): HllSketch =
    HllSketch.deserializeBody(p, bytes)

  override def withNewMutableAggBufferOffset(offset: Int): HllDistinctAgg =
    copy(mutableAggBufferOffset = offset)

  override def withNewInputAggBufferOffset(offset: Int): HllDistinctAgg =
    copy(inputAggBufferOffset = offset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  override def prettyName: String = "hll_distinct"
}

object HllDistinctAgg {

  /** HLL distinct estimate of a pre-hashed bigint column (use
    * `xxhash64(col)`); exact while sparse (≤ 2^p/4 distinct).
    */
  def hllDistinct(c: Column, p: Int): Column =
    GraftSqlBridge.toColumn(
      HllDistinctAgg(GraftSqlBridge.toExpression(c), p)
        .toAggregateExpression())
}

/** Merge of PRE-BUILT HLL sketches (binary [[graft.pinot.SketchSection]]
  * payloads of kind `hll<p>` — per-segment stored sections, rollup sketch
  * metrics, or [[SketchBuildAgg]] query-time payloads) into a distinct
  * estimate: the DISTINCT_COUNT_HLL-over-stored-sketches path. Exact
  * while every input and the merged result stay sparse.
  */
case class HllMergeAgg(
    child: Expression,
    p: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[HllSketch] {

  require(p >= 4 && p <= 18, s"hll_merge_estimate p must be in [4, 18], got $p")

  override def children: Seq[Expression] = Seq(child)

  override def nullable: Boolean = false

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hll_merge_estimate requires binary sketch payloads, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): HllSketch = new HllSketch(p)

  override def update(buf: HllSketch, input: InternalRow): HllSketch = {
    val v = child.eval(input)
    if (v != null) {
      val sk = graft.pinot.SketchSection.deserialize(v.asInstanceOf[Array[Byte]])
      sk.spec match {
        case graft.pinot.SketchSection.HllSpec(p2) =>
          require(p2 == p, s"hll_merge_estimate(p=$p) fed an hll$p2 sketch")
          buf.mergeIn(sk.hll)
        case _ => throw new IllegalArgumentException(
          "hll_merge_estimate: section is not an hll sketch")
      }
    }
    buf
  }

  override def merge(a: HllSketch, b: HllSketch): HllSketch = {
    a.mergeIn(b)
    a
  }

  override def eval(buf: HllSketch): Any = buf.estimate

  override def serialize(buf: HllSketch): Array[Byte] = buf.serializeBody()

  override def deserialize(bytes: Array[Byte]): HllSketch =
    HllSketch.deserializeBody(p, bytes)

  override def withNewMutableAggBufferOffset(offset: Int): HllMergeAgg =
    copy(mutableAggBufferOffset = offset)

  override def withNewInputAggBufferOffset(offset: Int): HllMergeAgg =
    copy(inputAggBufferOffset = offset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  override def prettyName: String = "hll_merge_estimate"
}

object HllMergeAgg {

  /** Distinct estimate from pre-built hll<p> sketch payloads. */
  def hllMergeEstimate(c: Column, p: Int): Column =
    GraftSqlBridge.toColumn(
      HllMergeAgg(GraftSqlBridge.toExpression(c), p)
        .toAggregateExpression())
}
