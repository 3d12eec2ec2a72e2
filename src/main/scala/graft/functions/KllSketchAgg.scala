package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** KLL-style mergeable quantile sketch — the Spark-native analog of
  * Pinot's PERCENTILE_KLL / PERCENTILE_EST aggregations (a bounded-size
  * summary per group per partition that merges across segments, where
  * Spark's built-ins offer either exact `percentile` — a full sort's
  * worth of state — or `percentile_approx`, whose internal summary is
  * not exposed for cross-cohort reuse).
  *
  * Structure (Karnin–Lang–Liberty, simplified as in the public
  * DataSketches design): levels of buffers, level i items carrying
  * weight 2^i; when total size exceeds the capacity schedule
  * c_i = max(2, ⌊k·(2/3)^(H−i)⌋), the lowest over-capacity level sorts
  * and keeps every second item (alternating offset — the deterministic
  * variant; an odd item stays at the level), promoting survivors to
  * level i+1.
  *
  * Exactness regimes, mirroring the repo's other sketches:
  *  - n ≤ k: nothing ever compacts — quantiles are EXACT nearest-rank
  *    (smallest value whose cumulative weight ≥ ⌈q·n⌉), and the oracle
  *    hash-checks them (q148).
  *  - saturated: standard KLL rank error, O(1/k) of n; property-tested
  *    with a generous 5·n/k bound (KllSketchSpec) across partitioned
  *    merges.
  *
  * At 100 TB: one ≤O(k)-value summary per group per partition crosses
  * the wire (map-side combine), vs `percentile`'s every-value shuffle.
  */
case class KllSketchAgg(
    child: Expression,
    k: Int,
    qs: Seq[Double],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllSketchAgg.Buf] {

  require(k >= 8, s"kll_quantiles k must be >= 8, got $k")
  require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
    s"kll_quantiles fractions must be in [0, 1]: $qs")

  override def children: Seq[Expression] = Seq(child)

  override def nullable: Boolean = false

  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kll_quantiles requires a double input, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): KllSketchAgg.Buf =
    new KllSketchAgg.Buf(k)

  override def update(buf: KllSketchAgg.Buf, input: InternalRow): KllSketchAgg.Buf = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[Double])
    buf
  }

  override def merge(a: KllSketchAgg.Buf, b: KllSketchAgg.Buf): KllSketchAgg.Buf = {
    a.mergeIn(b)
    a
  }

  override def eval(buf: KllSketchAgg.Buf): Any = {
    val out = new Array[Any](qs.length)
    val est = buf.quantiles(qs)
    var i = 0
    while (i < qs.length) {
      out(i) = if (est == null) null else java.lang.Double.valueOf(est(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: KllSketchAgg.Buf): Array[Byte] = buf.serialize()

  override def deserialize(bytes: Array[Byte]): KllSketchAgg.Buf =
    KllSketchAgg.Buf.deserialize(bytes)

  override def withNewMutableAggBufferOffset(offset: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = offset)

  override def withNewInputAggBufferOffset(offset: Int): KllSketchAgg =
    copy(inputAggBufferOffset = offset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  override def prettyName: String = "kll_quantiles"
}

/** Merge of PRE-BUILT KLL sketches (binary [[graft.pinot.SketchSection]]
  * payloads of kind `kll<k>` — per-segment stored sketches or the
  * per-group sketch column a rollup with `sketchMetrics` stores) into
  * quantile estimates: the PERCENTILE_KLL-over-stored-sketches path.
  * Each input row is one bounded summary, never raw data.
  */
case class KllMergeAgg(
    child: Expression,
    k: Int,
    qs: Seq[Double],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllSketchAgg.Buf] {

  require(k >= 8, s"kll_merge_quantiles k must be >= 8, got $k")
  require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
    s"kll_merge_quantiles fractions must be in [0, 1]: $qs")

  override def children: Seq[Expression] = Seq(child)

  override def nullable: Boolean = false

  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kll_merge_quantiles requires binary sketch payloads, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): KllSketchAgg.Buf =
    new KllSketchAgg.Buf(k)

  override def update(buf: KllSketchAgg.Buf, input: InternalRow): KllSketchAgg.Buf = {
    val v = child.eval(input)
    if (v != null) {
      val sk = graft.pinot.SketchSection.deserialize(v.asInstanceOf[Array[Byte]])
      sk.spec match {
        case graft.pinot.SketchSection.KllSpec(sk2) =>
          require(sk2 == k,
            s"kll_merge_quantiles(k=$k) fed a kll$sk2 sketch")
          buf.mergeIn(sk.kll)
        case _ => throw new IllegalArgumentException(
          "kll_merge_quantiles: section is not a kll sketch")
      }
    }
    buf
  }

  override def merge(a: KllSketchAgg.Buf, b: KllSketchAgg.Buf): KllSketchAgg.Buf = {
    a.mergeIn(b)
    a
  }

  override def eval(buf: KllSketchAgg.Buf): Any = {
    val est = buf.quantiles(qs)
    val out = new Array[Any](qs.length)
    var i = 0
    while (i < qs.length) {
      out(i) = if (est == null) null else java.lang.Double.valueOf(est(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: KllSketchAgg.Buf): Array[Byte] = buf.serialize()

  override def deserialize(bytes: Array[Byte]): KllSketchAgg.Buf =
    KllSketchAgg.Buf.deserialize(bytes)

  override def withNewMutableAggBufferOffset(offset: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = offset)

  override def withNewInputAggBufferOffset(offset: Int): KllMergeAgg =
    copy(inputAggBufferOffset = offset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  override def prettyName: String = "kll_merge_quantiles"
}

object KllMergeAgg {

  /** Quantile estimates from pre-built kll<k> sketch payloads. */
  def kllMergeQuantiles(c: Column, k: Int, qs: Seq[Double]): Column =
    GraftSqlBridge.toColumn(
      KllMergeAgg(GraftSqlBridge.toExpression(c), k, qs)
        .toAggregateExpression())
}

object KllSketchAgg {

  /** Quantile estimates of a double column at the given fractions, as
    * `array<double>` aligned with `qs`; NULL elements for an empty group.
    */
  def kllQuantiles(c: Column, k: Int, qs: Seq[Double]): Column =
    GraftSqlBridge.toColumn(
      KllSketchAgg(GraftSqlBridge.toExpression(c), k, qs)
        .toAggregateExpression())

  /** KLL compactor stack. Mutable, single-threaded per aggregation
    * buffer (Spark's TypedImperativeAggregate contract).
    */
  final class Buf(val k: Int) {
    var n: Long = 0L
    var compactions: Long = 0L
    val levels: ArrayBuffer[ArrayBuffer[Double]] =
      ArrayBuffer(ArrayBuffer.empty[Double])

    private def cap(i: Int): Int = {
      val h = levels.length - 1
      math.max(2, math.floor(k * math.pow(2.0 / 3.0, (h - i).toDouble)).toInt)
    }

    private def totalCap: Int = {
      var s = 0
      var i = 0
      while (i < levels.length) { s += cap(i); i += 1 }
      s
    }

    private def totalSize: Int = {
      var s = 0
      var i = 0
      while (i < levels.length) { s += levels(i).size; i += 1 }
      s
    }

    def insert(v: Double): Unit = {
      levels(0) += v
      n += 1
      compress()
    }

    def mergeIn(b: Buf): Unit = {
      require(b.k == k, s"kll merge across k: $k vs ${b.k}")
      var i = 0
      while (i < b.levels.length) {
        while (levels.length <= i) levels += ArrayBuffer.empty[Double]
        levels(i) ++= b.levels(i)
        i += 1
      }
      n += b.n
      compactions += b.compactions
      compress()
    }

    private def compress(): Unit = {
      while (totalSize > totalCap) {
        // lowest level at-or-over its capacity; guaranteed to exist when
        // total > totalCap (else every level is under cap, so total < cap)
        var l = 0
        while (l < levels.length && levels(l).size < cap(l)) l += 1
        if (l >= levels.length) return // defensive: nothing to compact
        if (l == levels.length - 1) levels += ArrayBuffer.empty[Double]
        compactLevel(l)
      }
    }

    private def compactLevel(l: Int): Unit = {
      val arr = levels(l).toArray
      java.util.Arrays.sort(arr)
      val odd = arr.length % 2 == 1
      val start = if (odd) 1 else 0
      val offset = (compactions & 1L).toInt
      compactions += 1
      val kept = ArrayBuffer.empty[Double]
      var j = start + offset
      while (j < arr.length) { kept += arr(j); j += 2 }
      levels(l) =
        if (odd) ArrayBuffer(arr(0)) else ArrayBuffer.empty[Double]
      levels(l + 1) ++= kept
    }

    /** Nearest-rank quantiles: smallest value whose cumulative weight
      * ≥ max(1, ⌈q·n⌉). Null for an empty sketch.
      */
    def quantiles(qs: Seq[Double]): Array[Double] = {
      if (n == 0) return null
      var m = 0
      var i = 0
      while (i < levels.length) { m += levels(i).size; i += 1 }
      val vs = new Array[Double](m)
      val ws = new Array[Long](m)
      var p = 0
      i = 0
      while (i < levels.length) {
        val w = 1L << i
        val lv = levels(i)
        var j = 0
        while (j < lv.size) { vs(p) = lv(j); ws(p) = w; p += 1; j += 1 }
        i += 1
      }
      // sort pairs by value
      val idx = (0 until m).toArray.map(Integer.valueOf)
      java.util.Arrays.sort(idx, (a: Integer, b: Integer) =>
        java.lang.Double.compare(vs(a), vs(b)))
      val out = new Array[Double](qs.length)
      var qi = 0
      while (qi < qs.length) {
        val target = math.max(1L, math.ceil(qs(qi) * n).toLong)
        var cum = 0L
        var r = 0
        var res = vs(idx(m - 1))
        var found = false
        while (!found && r < m) {
          cum += ws(idx(r))
          if (cum >= target) { res = vs(idx(r)); found = true }
          r += 1
        }
        out(qi) = res
        qi += 1
      }
      out
    }

    def serialize(): Array[Byte] = {
      var m = 0
      levels.foreach(m += _.size)
      val bb = ByteBuffer.allocate(4 + 8 + 8 + 4 + levels.length * 4 + m * 8)
      bb.putInt(k).putLong(n).putLong(compactions).putInt(levels.length)
      levels.foreach { lv =>
        bb.putInt(lv.size)
        lv.foreach(bb.putDouble)
      }
      bb.array()
    }
  }

  object Buf {
    def deserialize(bytes: Array[Byte]): Buf = {
      val bb = ByteBuffer.wrap(bytes)
      val buf = new Buf(bb.getInt)
      buf.n = bb.getLong
      buf.compactions = bb.getLong
      val nl = bb.getInt
      buf.levels.clear()
      var i = 0
      while (i < nl) {
        val sz = bb.getInt
        val lv = new ArrayBuffer[Double](sz)
        var j = 0
        while (j < sz) { lv += bb.getDouble; j += 1 }
        buf.levels += lv
        i += 1
      }
      if (buf.levels.isEmpty) buf.levels += ArrayBuffer.empty[Double]
      buf
    }
  }
}
