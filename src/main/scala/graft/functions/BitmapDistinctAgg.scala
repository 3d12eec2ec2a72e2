package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType}
import org.roaringbitmap.longlong.Roaring64Bitmap

/** Exact distinct count over a bigint key via a Roaring64 bitmap — the
  * Spark-native analog of Pinot's DISTINCT_COUNT_BITMAP aggregation
  * (Pinot keeps a RoaringBitmap of raw values / dictionary ids per
  * group and merges them across segments).
  *
  * vs `count(distinct x)`: Spark's exact distinct rewrites into a
  * two-level aggregate that shuffles EVERY distinct (group, value) pair;
  * this aggregate ships ONE compressed bitmap per group per partition
  * (map-side combine, like every TypedImperativeAggregate here), which
  * for dense/clustered key spaces — ids, dictionary codes, day numbers —
  * is orders of magnitude less shuffle at 100 TB. vs HLL
  * (`approx_count_distinct`): exact, at the price of bitmap memory on
  * sparse 64-bit keys (that's the documented Pinot trade-off too; feed
  * dictionary ids or naturally dense keys).
  */
case class BitmapDistinctAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Roaring64Bitmap] {

  override def children: Seq[Expression] = Seq(child)

  override def nullable: Boolean = false

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bitmap_distinct requires a bigint input, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): Roaring64Bitmap = new Roaring64Bitmap()

  override def update(buf: Roaring64Bitmap, input: InternalRow): Roaring64Bitmap = {
    val v = child.eval(input)
    if (v != null) buf.addLong(v.asInstanceOf[Long])
    buf
  }

  override def merge(a: Roaring64Bitmap, b: Roaring64Bitmap): Roaring64Bitmap = {
    a.or(b)
    a
  }

  override def eval(buf: Roaring64Bitmap): Any = buf.getLongCardinality

  override def serialize(buf: Roaring64Bitmap): Array[Byte] = {
    buf.runOptimize()
    val bos = new ByteArrayOutputStream()
    val dos = new DataOutputStream(bos)
    buf.serialize(dos)
    dos.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Roaring64Bitmap = {
    val buf = new Roaring64Bitmap()
    buf.deserialize(new DataInputStream(new ByteArrayInputStream(bytes)))
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): BitmapDistinctAgg =
    copy(mutableAggBufferOffset = offset)

  override def withNewInputAggBufferOffset(offset: Int): BitmapDistinctAgg =
    copy(inputAggBufferOffset = offset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  override def prettyName: String = "bitmap_distinct"
}

object BitmapDistinctAgg {

  /** Exact distinct count of a bigint column via Roaring64 bitmaps. */
  def bitmapDistinct(c: Column): Column =
    GraftSqlBridge.toColumn(
      BitmapDistinctAgg(GraftSqlBridge.toExpression(c))
        .toAggregateExpression())
}

/** Merge of PRE-BUILT bitmap sketches (binary
  * [[graft.pinot.SketchSection]] payloads of kind `bitmap`, one per
  * segment) into an exact distinct count — the query-time half of
  * Pinot's stored-sketch DISTINCT path: the input rows are a few KB of
  * sketch each, never the raw column, and only one OR-ed bitmap per
  * partition crosses the wire.
  */
case class BitmapMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Roaring64Bitmap] {

  override def children: Seq[Expression] = Seq(child)

  override def nullable: Boolean = false

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bitmap_merge_distinct requires binary sketch payloads, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): Roaring64Bitmap = new Roaring64Bitmap()

  override def update(buf: Roaring64Bitmap, input: InternalRow): Roaring64Bitmap = {
    val v = child.eval(input)
    if (v != null) {
      val sk = graft.pinot.SketchSection.deserialize(v.asInstanceOf[Array[Byte]])
      require(sk.bitmap != null,
        "bitmap_merge_distinct: section is not a bitmap sketch")
      buf.or(sk.bitmap)
    }
    buf
  }

  override def merge(a: Roaring64Bitmap, b: Roaring64Bitmap): Roaring64Bitmap = {
    a.or(b)
    a
  }

  override def eval(buf: Roaring64Bitmap): Any = buf.getLongCardinality

  override def serialize(buf: Roaring64Bitmap): Array[Byte] = {
    buf.runOptimize()
    val bos = new ByteArrayOutputStream()
    val dos = new DataOutputStream(bos)
    buf.serialize(dos)
    dos.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Roaring64Bitmap = {
    val buf = new Roaring64Bitmap()
    buf.deserialize(new DataInputStream(new ByteArrayInputStream(bytes)))
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): BitmapMergeAgg =
    copy(mutableAggBufferOffset = offset)

  override def withNewInputAggBufferOffset(offset: Int): BitmapMergeAgg =
    copy(inputAggBufferOffset = offset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  override def prettyName: String = "bitmap_merge_distinct"
}

object BitmapMergeAgg {

  /** Exact distinct count from per-segment stored bitmap sketches. */
  def bitmapMergeDistinct(c: Column): Column =
    GraftSqlBridge.toColumn(
      BitmapMergeAgg(GraftSqlBridge.toExpression(c))
        .toAggregateExpression())
}
