package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

/** Bounded-memory frequent-items (heavy hitters) aggregate over a string
  * column — the Spark-native analog of Pinot's FREQUENT_STRINGS_SKETCH
  * (Apache DataSketches frequent-items; the reference connector exposes
  * no sketch aggregates at all).
  *
  * Algorithm: Misra–Gries with `capacity` counters, using the mergeable
  * formulation of Agarwal et al., "Mergeable Summaries" (PODS'12):
  *   - update: increment if tracked; insert if a slot is free; otherwise
  *     decrement every counter by 1 (dropping zeros) — the classic MG step;
  *   - merge: sum counters pairwise, then if more than `capacity` survive,
  *     subtract the (capacity+1)-th largest count from all and drop the
  *     non-positive ones.
  * Guarantees: estimate ∈ [true − n/(capacity+1), true], and EXACT counts
  * whenever the global distinct cardinality never exceeds `capacity`
  * (no decrement ever fires, in update or merge).
  *
  * Why not groupBy+count? At 100 TB with unbounded key cardinality
  * (URLs, n-grams) the exact groupBy shuffles every distinct key; this
  * aggregate ships ONE ≤`capacity`-entry summary per partition (map-side
  * combine), so the shuffle is O(partitions × capacity) regardless of
  * cardinality — the whole point of the sketch at scale.
  */
case class FreqItemsAgg(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(capacity > 0, s"freq_items capacity must be positive, got $capacity")

  override def children: Seq[Expression] = Seq(child)

  override def nullable: Boolean = false

  override def dataType: DataType = FreqItemsAgg.OutType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"freq_items requires string input, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(
      buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    FreqItemsAgg.mgAdd(buf, v.asInstanceOf[UTF8String].toString, capacity)
    buf
  }

  override def merge(
      a: mutable.HashMap[String, Long],
      b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    FreqItemsAgg.mgMergeInto(a, b, capacity)
    a
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any =
    FreqItemsAgg.evalRows(buf)

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val entries = buf.toArray
    val payload = entries.map { case (k, _) => k.getBytes(StandardCharsets.UTF_8) }
    val size = 4 + payload.map(_.length + 12).sum
    val bb = ByteBuffer.allocate(size)
    bb.putInt(entries.length)
    entries.zip(payload).foreach { case ((_, c), kb) =>
      bb.putInt(kb.length); bb.put(kb); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](bb.getInt)
      bb.get(kb)
      buf.update(new String(kb, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): FreqItemsAgg =
    copy(mutableAggBufferOffset = offset)

  override def withNewInputAggBufferOffset(offset: Int): FreqItemsAgg =
    copy(inputAggBufferOffset = offset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  override def prettyName: String = "freq_items"
}

object FreqItemsAgg {

  /** The items/counts output schema shared by [[FreqItemsAgg]] and
    * [[FreqMergeAgg]].
    */
  val OutType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)

  /** One Misra–Gries arrival: increment if tracked; insert if a slot is
    * free; otherwise the decrement tick — every tracked counter pays 1
    * for the untracked arrival, zeros free their slots.
    */
  def mgAdd(buf: mutable.HashMap[String, Long], item: String,
      capacity: Int): Unit =
    buf.get(item) match {
      case Some(c) => buf.update(item, c + 1L)
      case None if buf.size < capacity => buf.update(item, 1L)
      case None =>
        val dead = mutable.ArrayBuffer.empty[String]
        buf.keysIterator.foreach { k =>
          val c = buf(k) - 1L
          if (c <= 0L) dead += k else buf.update(k, c)
        }
        dead.foreach(buf.remove)
    }

  /** Mergeable-summaries merge (Agarwal et al., PODS'12): sum counters
    * pairwise, then if more than `capacity` survive, subtract the
    * (capacity+1)-th largest count so at most `capacity` strictly-
    * positive remain. Exact when the union's distinct count ≤ capacity.
    */
  def mgMergeInto(a: mutable.HashMap[String, Long],
      b: IterableOnce[(String, Long)], capacity: Int): Unit = {
    b.iterator.foreach { case (k, c) => a.update(k, a.getOrElse(k, 0L) + c) }
    if (a.size > capacity) {
      val counts = a.values.toArray
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - capacity - 1)
      val dead = mutable.ArrayBuffer.empty[String]
      a.keysIterator.foreach { k =>
        val c = a(k) - cut
        if (c <= 0L) dead += k else a.update(k, c)
      }
      dead.foreach(a.remove)
    }
  }

  private[functions] def evalRows(buf: mutable.HashMap[String, Long]): Any = {
    val sorted = buf.toArray.sortBy { case (item, cnt) => (-cnt, item) }
    new GenericArrayData(sorted.map { case (item, cnt) =>
      InternalRow(UTF8String.fromString(item), cnt)
    })
  }

  /** Heavy-hitters summary of a string column: up to `capacity` entries
    * `struct<item, cnt>` sorted by (cnt desc, item asc). Exact while the
    * column's global distinct count stays ≤ `capacity`.
    */
  def freqItems(c: Column, capacity: Int): Column =
    GraftSqlBridge.toColumn(
      FreqItemsAgg(GraftSqlBridge.toExpression(c), capacity)
        .toAggregateExpression())
}

/** Merge of PRE-BUILT Misra–Gries summaries (binary
  * [[graft.pinot.SketchSection]] payloads of kind `freq<c>` — per-segment
  * stored sections, rollup sketch metrics, or [[SketchBuildAgg]]
  * query-time payloads) into the heavy-hitters list: the
  * FREQUENT_STRINGS-over-stored-sketches path. "Top pages last N days"
  * reads one ≤c-entry summary per cold segment instead of the raw
  * column; counts are EXACT while the union's distinct cardinality stays
  * ≤ capacity, and carry the mergeable-summaries bound (estimate ∈
  * [true − n/(c+1), true]) beyond it.
  */
case class FreqMergeAgg(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(capacity > 0,
    s"freq_merge_items capacity must be positive, got $capacity")

  override def children: Seq[Expression] = Seq(child)

  override def nullable: Boolean = false

  override def dataType: DataType = FreqItemsAgg.OutType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"freq_merge_items requires binary sketch payloads, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(
      buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val sk = graft.pinot.SketchSection
        .deserialize(v.asInstanceOf[Array[Byte]])
      sk.spec match {
        case graft.pinot.SketchSection.FreqSpec(c2) =>
          require(c2 == capacity,
            s"freq_merge_items(capacity=$capacity) fed a freq$c2 sketch")
          FreqItemsAgg.mgMergeInto(buf, sk.freq, capacity)
        case _ => throw new IllegalArgumentException(
          "freq_merge_items: section is not a freq sketch")
      }
    }
    buf
  }

  override def merge(
      a: mutable.HashMap[String, Long],
      b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    FreqItemsAgg.mgMergeInto(a, b, capacity)
    a
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any =
    FreqItemsAgg.evalRows(buf)

  // buffer serde rides the framed freq<c> SketchSection payload — the
  // same bytes the stored sections and sketch_build emit
  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] =
    graft.pinot.SketchSection.serializeFreq(buf, capacity)

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val sk = graft.pinot.SketchSection.deserialize(bytes)
    // same loud contract as update(): a foreign payload kind or a
    // capacity mismatch must name itself, not NPE downstream
    sk.spec match {
      case graft.pinot.SketchSection.FreqSpec(c2) =>
        require(c2 == capacity,
          s"freq_merge_items(capacity=$capacity) buffer holds a freq$c2 sketch")
        mutable.HashMap.from(sk.freq)
      case other => throw new IllegalArgumentException(
        s"freq_merge_items: buffer payload is a ${other} section, not freq")
    }
  }

  override def withNewMutableAggBufferOffset(offset: Int): FreqMergeAgg =
    copy(mutableAggBufferOffset = offset)

  override def withNewInputAggBufferOffset(offset: Int): FreqMergeAgg =
    copy(inputAggBufferOffset = offset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  override def prettyName: String = "freq_merge_items"
}

object FreqMergeAgg {

  /** Heavy-hitters list from pre-built freq<c> sketch payloads: up to
    * `capacity` entries `struct<item, cnt>` sorted (cnt desc, item asc).
    */
  def freqMergeItems(c: Column, capacity: Int): Column =
    GraftSqlBridge.toColumn(
      FreqMergeAgg(GraftSqlBridge.toExpression(c), capacity)
        .toAggregateExpression())
}
