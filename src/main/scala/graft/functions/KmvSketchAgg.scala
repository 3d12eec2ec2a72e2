package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** KMV (bottom-k / "K-Minimum Values") distinct sketch — the Spark-native
  * analog of Pinot's DISTINCT_COUNT_THETA_SKETCH family, including the
  * theta-sketch set operations (union / intersection estimates across
  * independently-built sketches) that no Spark built-in provides
  * (approx_count_distinct's HLL cannot intersect).
  *
  * The aggregate keeps the k smallest DISTINCT pre-hashed values (feed it
  * `xxhash64(col)` so the hashing stays in whole-stage codegen) in SIGNED
  * order, which is monotone in the normalized coordinate
  * `norm(h) = h · 2⁻⁶⁴ + ½ ∈ [0,1)`. The result is the sorted hash array;
  * estimators are plain column expressions over those arrays
  * ([[KmvSketchAgg.distinctEstimate]] etc.), so sketches compose with
  * array_union/array_intersect and stay inside codegen.
  *
  * Estimator (theta-sketch form): θ = norm of the k-th smallest value
  * when saturated, else 1.0; estimate = |{values < θ}| / θ. Below
  * saturation the sketch holds EVERY distinct hash, so all estimates —
  * including union and intersection — are exact (modulo 64-bit hash
  * collisions, ~n²/2⁶⁵). Saturated relative error is ~1/√(k−2).
  *
  * At 100 TB: one ≤k-long array per group per partition crosses the wire
  * (map-side combine), and set ops between arbitrary cohorts run on the
  * collapsed sketches — no re-scan of the raw data.
  */
case class KmvSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  require(k >= 8, s"kmv_sketch k must be >= 8, got $k")

  override def children: Seq[Expression] = Seq(child)

  override def nullable: Boolean = false

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kmv_sketch requires a bigint (pre-hashed) input, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def offer(buf: java.util.TreeSet[java.lang.Long], h: Long): Unit = {
    if (buf.size < k) { buf.add(h); () }
    else if (h < buf.last()) { if (buf.add(h)) buf.pollLast(); () }
  }

  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) offer(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(
      a: java.util.TreeSet[java.lang.Long],
      b: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b.iterator()
    while (it.hasNext) offer(a, it.next())
    a
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size)
    var i = 0
    val it = buf.iterator()
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = offset)

  override def withNewInputAggBufferOffset(offset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = offset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  override def prettyName: String = "kmv_sketch"
}

/** Merge of PRE-BUILT KMV sketches (binary [[graft.pinot.SketchSection]]
  * payloads of kind `kmv<k>`, e.g. the per-group sketch column a
  * [[graft.pinot.PinotCompact.rollup]] with `sketchMetrics` stores) into
  * a distinct-count estimate — exact while the merged sketch stays
  * unsaturated (the bottom-k of a union of bottom-k summaries IS the
  * union's bottom-k). Each input row is a ≤k-hash summary, never raw
  * data, and one merged buffer per partition crosses the wire.
  */
case class KmvMergeAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  require(k >= 8, s"kmv_merge_estimate k must be >= 8, got $k")

  override def children: Seq[Expression] = Seq(child)

  override def nullable: Boolean = false

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kmv_merge_estimate requires binary sketch payloads, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def offer(buf: java.util.TreeSet[java.lang.Long], h: Long): Unit = {
    if (buf.size < k) { buf.add(h); () }
    else if (h < buf.last()) { if (buf.add(h)) buf.pollLast(); () }
  }

  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val sk = graft.pinot.SketchSection.deserialize(v.asInstanceOf[Array[Byte]])
      val stored = sk.spec match {
        case graft.pinot.SketchSection.KmvSpec(sk2) =>
          require(sk2 == k,
            s"kmv_merge_estimate(k=$k) fed a kmv$sk2 sketch"); sk.kmvHashes
        case _ => throw new IllegalArgumentException(
          "kmv_merge_estimate: section is not a kmv sketch")
      }
      var i = 0
      while (i < stored.length) { offer(buf, stored(i)); i += 1 }
    }
    buf
  }

  override def merge(
      a: java.util.TreeSet[java.lang.Long],
      b: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b.iterator()
    while (it.hasNext) offer(a, it.next())
    a
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    // same estimator as KmvSketchAgg.distinctEstimate, computed directly:
    // unsaturated => exact count; saturated => (k-1) / norm(k-th)
    if (buf.size < k) buf.size.toLong
    else {
      val cut = buf.last().longValue()
      val below = buf.size - 1
      val norm = math.min(
        cut.toDouble / math.pow(2.0, 64) + 0.5, Math.nextDown(1.0))
      math.round(below.toDouble / norm)
    }
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): KmvMergeAgg =
    copy(mutableAggBufferOffset = offset)

  override def withNewInputAggBufferOffset(offset: Int): KmvMergeAgg =
    copy(inputAggBufferOffset = offset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  override def prettyName: String = "kmv_merge_estimate"
}

object KmvMergeAgg {

  /** Distinct-count estimate from pre-built kmv<k> sketch payloads. */
  def kmvMergeEstimate(c: Column, k: Int): Column =
    GraftSqlBridge.toColumn(
      KmvMergeAgg(GraftSqlBridge.toExpression(c), k)
        .toAggregateExpression())
}

object KmvSketchAgg {

  /** Bottom-k sketch of a pre-hashed bigint column (use `xxhash64(col)`),
    * as a signed-ascending `array<bigint>` of ≤ k distinct hash values.
    */
  def kmvSketch(c: Column, k: Int): Column =
    GraftSqlBridge.toColumn(
      KmvSketchAgg(GraftSqlBridge.toExpression(c), k)
        .toAggregateExpression())

  private val two64 = math.pow(2.0, 64)

  /** Normalized coordinate of a signed 64-bit hash, for SCALING (1/θ)
    * only — the below-θ CUT always compares raw hashes in signed-long
    * space, because the double map rounds hashes within ~2¹⁰ of
    * Long.MaxValue up to exactly 1.0, which would exclude a value from
    * its own sketch even in the exact (unsaturated) regime. Clamped to
    * nextDown(1.0) so the same rounding can't zero-inflate 1/θ.
    */
  private def norm(h: Column): Column =
    least(h.cast("double") / lit(two64) + lit(0.5), lit(Math.nextDown(1.0)))

  /** The cut value in LONG space: the k-th (largest kept) hash when
    * saturated, else NULL meaning "no cut — the sketch is exact".
    */
  private def cutLong(sketch: Column, k: Int): Column =
    when(size(sketch) < k, lit(null).cast("long"))
      .otherwise(element_at(sketch, k))

  /** Count of hashes strictly below the long-space cut (all of them
    * when the cut is NULL / the sketch unsaturated).
    */
  private def below(arr: Column, cut: Column): Column =
    when(cut.isNull, size(arr))
      .otherwise(size(filter(arr, h => h < cut)))

  private def scaleOf(cut: Column): Column =
    when(cut.isNull, lit(1.0)).otherwise(norm(cut))

  /** θ of one sketch: norm of its k-th (largest kept) value when
    * saturated, else 1.0 (the sketch holds every distinct hash).
    */
  def theta(sketch: Column, k: Int): Column = scaleOf(cutLong(sketch, k))

  /** Distinct-count estimate of one sketch (exact below saturation). */
  def distinctEstimate(sketch: Column, k: Int): Column = {
    val cut = cutLong(sketch, k)
    round(below(sketch, cut).cast("double") / scaleOf(cut)).cast("long")
  }

  /** Theta-sketch union estimate: cut both to min(θa, θb), count the
    * combined distinct survivors, scale by 1/θ. `least` skips NULLs, so
    * an unsaturated side contributes no cut — exactly the θ=1 case.
    */
  def unionEstimate(a: Column, b: Column, k: Int): Column = {
    val cut = least(cutLong(a, k), cutLong(b, k))
    round(below(array_union(a, b), cut).cast("double") / scaleOf(cut))
      .cast("long")
  }

  /** Theta-sketch intersection estimate: common hashes below min-θ,
    * scaled by 1/θ. Exact when both sketches are unsaturated.
    */
  def intersectEstimate(a: Column, b: Column, k: Int): Column = {
    val cut = least(cutLong(a, k), cutLong(b, k))
    round(below(array_intersect(a, b), cut).cast("double") / scaleOf(cut))
      .cast("long")
  }
}
