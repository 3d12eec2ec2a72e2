package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Element-wise reduction aggregate over `array<bigint>` rows:
  * `array_reduce_agg(vec, op)` folds every input array into one array by
  * applying `op` (min | sum) per position.
  *
  * This is the scalable signature-aggregation path for sketches:
  * MinHash = element-wise MIN over per-shingle permutation arrays,
  * SimHash = element-wise SUM over per-token ±1 bit arrays. Without it
  * those pipelines must posexplode ×64 (one row per signature position)
  * before a (key, position) shuffle — 64× the shuffle volume. As a
  * TypedImperativeAggregate it combines map-side (partial aggregation),
  * so only one small array per group crosses the wire.
  */
case class ArrayLongReduceAgg(
    child: Expression,
    op: ArrayLongReduceAgg.Op,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)

  override def nullable: Boolean = true

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"array_reduce_agg requires array<bigint>, got ${other.simpleString}")
  }

  // `null` is the uninitialized-buffer sentinel — NOT Array.empty, so a
  // legal zero-length input array participates in the ragged-length check
  // and round-trips to an empty array instead of a null result.
  override def createAggregationBuffer(): Array[Long] = null

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buffer
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (buffer == null) {
      val fresh = new Array[Long](n)
      var i = 0
      while (i < n) { fresh(i) = arr.getLong(i); i += 1 }
      fresh
    } else {
      require(buffer.length == n,
        s"array_reduce_agg: ragged input (${buffer.length} vs $n)")
      var i = 0
      while (i < n) { buffer(i) = op.combine(buffer(i), arr.getLong(i)); i += 1 }
      buffer
    }
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (a == null) return b
    if (b == null) return a
    require(a.length == b.length,
      s"array_reduce_agg: ragged partials (${a.length} vs ${b.length})")
    var i = 0
    while (i < a.length) { a(i) = op.combine(a(i), b(i)); i += 1 }
    a
  }

  override def eval(buffer: Array[Long]): Any =
    if (buffer == null) null else new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    if (buffer == null) return ByteBuffer.allocate(4).putInt(-1).array()
    val bb = ByteBuffer.allocate(4 + 8 * buffer.length)
    bb.putInt(buffer.length)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    if (n < 0) null else Array.fill(n)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(offset: Int): ArrayLongReduceAgg =
    copy(mutableAggBufferOffset = offset)

  override def withNewInputAggBufferOffset(offset: Int): ArrayLongReduceAgg =
    copy(inputAggBufferOffset = offset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  override def prettyName: String = s"array_${op.name}_agg"
}

object ArrayLongReduceAgg {

  sealed trait Op extends Serializable {
    def name: String
    def combine(a: Long, b: Long): Long
  }
  case object MinOp extends Op {
    val name = "min"
    def combine(a: Long, b: Long): Long = math.min(a, b)
  }
  case object SumOp extends Op {
    val name = "sum"
    def combine(a: Long, b: Long): Long = a + b
  }

  private def agg(c: Column, op: Op): Column =
    GraftSqlBridge.toColumn(
      ArrayLongReduceAgg(GraftSqlBridge.toExpression(c), op)
        .toAggregateExpression())

  /** Element-wise min of array<bigint> rows (MinHash signatures). */
  def arrayMinAgg(c: Column): Column = agg(c, MinOp)

  /** Element-wise sum of array<bigint> rows (SimHash bit tallies). */
  def arraySumAgg(c: Column): Column = agg(c, SumOp)
}
