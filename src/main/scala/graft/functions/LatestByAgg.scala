package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StructField, StructType}

/** `latest_by(value, cmp)` / `earliest_by(value, cmp)` — the value at
  * the greatest (least) comparison key, plus the evidence a caller
  * needs to decide whether that winner is WELL-DEFINED:
  * `STRUCT<v: valueType, ties: BIGINT, null_cmp: BOOLEAN>` where `ties`
  * counts the rows AT the winning comparison value and `null_cmp`
  * reports whether any row's comparison value was NULL.
  *
  * This is the single-pass upsert winner monoid
  * ([[graft.sources.pinot.PinotUpsert]]): unlike Spark's `max_by` —
  * which silently picks an arbitrary row under a comparison tie and
  * silently skips NULL keys — the struct output lets the view layer
  * reject ties and NULL comparison values LOUDLY without a second
  * pass. Replaces both the FULL-mode rank window (exchange + SORT) and
  * the PARTIAL-mode `count_distinct` tie guard (a second distinct
  * expand exchange): state is O(1) per group — (best, count-at-best,
  * winner value) — associative, and combines map-side, so ONE hash
  * exchange of one small row per (group, partition) is the whole
  * shuffle story at 100 TB.
  *
  * SQL callers, note: nothing FORCES you to look at the evidence — a
  * bare `latest_by(v, cmp).v` under a comparison tie returns a
  * partition-order-dependent winner, exactly like Spark's own `max_by`
  * (strictly better only in that the evidence EXISTS here). Before
  * trusting `.v`, apply the guard idiom the upsert view uses:
  * {{{
  *   SELECT k, CASE WHEN w.null_cmp THEN raise_error('NULL cmp')
  *                  WHEN w.ties > 1 THEN raise_error('tie: undefined')
  *                  ELSE w.v END AS v
  *   FROM (SELECT k, latest_by(v, cmp) AS w FROM t GROUP BY k)
  * }}}
  * or prove your comparison column unique per key (q169's event_id is).
  *
  * A TypedImperativeAggregate (not Declarative) so the planner picks
  * ObjectHashAggregateExec even when the value type is non-primitive
  * (a struct of the table's columns) — a declarative buffer with
  * string/struct fields would fall back to SortAggregate, rebuilding
  * the very sort this aggregate removes.
  */
case class LatestByAgg(
    valueExpr: Expression,
    cmpExpr: Expression,
    pickMax: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[LatestByAgg.State] {

  override def children: Seq[Expression] = Seq(valueExpr, cmpExpr)

  override def nullable: Boolean = false

  override def dataType: DataType = StructType(Seq(
    StructField("v", valueExpr.dataType, nullable = true),
    StructField("ties", LongType, nullable = false),
    StructField("null_cmp", BooleanType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (org.apache.spark.sql.catalyst.expressions.RowOrdering
        .isOrderable(cmpExpr.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"${prettyName}: comparison type ${cmpExpr.dataType.simpleString} " +
        "is not orderable")

  @transient private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(cmpExpr.dataType)

  override def createAggregationBuffer(): LatestByAgg.State =
    new LatestByAgg.State(null, 0L, false, null)

  override def update(s: LatestByAgg.State, input: InternalRow): LatestByAgg.State = {
    val c = cmpExpr.eval(input)
    if (c == null) { s.nullCmp = true; return s }
    if (s.best == null) {
      s.best = InternalRow.copyValue(c)
      s.ties = 1L
      s.v = InternalRow.copyValue(valueExpr.eval(input))
    } else {
      val cd = ordering.compare(c, s.best)
      if (if (pickMax) cd > 0 else cd < 0) {
        s.best = InternalRow.copyValue(c)
        s.ties = 1L
        s.v = InternalRow.copyValue(valueExpr.eval(input))
      } else if (cd == 0) s.ties += 1L
    }
    s
  }

  override def merge(a: LatestByAgg.State, b: LatestByAgg.State): LatestByAgg.State = {
    a.nullCmp = a.nullCmp || b.nullCmp
    if (b.best != null) {
      if (a.best == null) { a.best = b.best; a.ties = b.ties; a.v = b.v }
      else {
        val cd = ordering.compare(b.best, a.best)
        if (if (pickMax) cd > 0 else cd < 0) {
          a.best = b.best; a.ties = b.ties; a.v = b.v
        } else if (cd == 0) a.ties += b.ties
      }
    }
    a
  }

  override def eval(s: LatestByAgg.State): Any =
    new GenericInternalRow(Array[Any](s.v, s.ties, s.nullCmp))

  // generic serde over (cmpType, long, boolean, valueType): one
  // UnsafeProjection handles every (value, cmp) type pair without
  // per-type code
  @transient private lazy val serde: UnsafeProjection =
    UnsafeProjection.create(
      Array[DataType](cmpExpr.dataType, LongType, BooleanType,
        valueExpr.dataType))

  override def serialize(s: LatestByAgg.State): Array[Byte] = {
    val row = serde(new GenericInternalRow(
      Array[Any](s.best, s.ties, s.nullCmp, s.v)))
    // the projection reuses its buffer across calls — detach
    row.getBytes.clone()
  }

  override def deserialize(bytes: Array[Byte]): LatestByAgg.State = {
    val row = new UnsafeRow(4)
    row.pointTo(bytes, bytes.length)
    new LatestByAgg.State(
      if (row.isNullAt(0)) null
      else InternalRow.copyValue(row.get(0, cmpExpr.dataType)),
      row.getLong(1),
      row.getBoolean(2),
      if (row.isNullAt(3)) null
      else InternalRow.copyValue(row.get(3, valueExpr.dataType)))
  }

  override def withNewMutableAggBufferOffset(offset: Int): LatestByAgg =
    copy(mutableAggBufferOffset = offset)

  override def withNewInputAggBufferOffset(offset: Int): LatestByAgg =
    copy(inputAggBufferOffset = offset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(valueExpr = newChildren.head, cmpExpr = newChildren(1))

  override def prettyName: String = if (pickMax) "latest_by" else "earliest_by"
}

object LatestByAgg {

  /** (best cmp seen, rows at best, any NULL cmp seen, value at best).
    * `best == null` ⇔ no non-null comparison value yet.
    */
  final class State(var best: Any, var ties: Long, var nullCmp: Boolean,
      var v: Any)

  /** `STRUCT<v, ties, null_cmp>` of the value at the GREATEST cmp. */
  def latestBy(value: Column, cmp: Column): Column =
    GraftSqlBridge.toColumn(LatestByAgg(
      GraftSqlBridge.toExpression(value), GraftSqlBridge.toExpression(cmp),
      pickMax = true).toAggregateExpression())

  /** `STRUCT<v, ties, null_cmp>` of the value at the LEAST cmp. */
  def earliestBy(value: Column, cmp: Column): Column =
    GraftSqlBridge.toColumn(LatestByAgg(
      GraftSqlBridge.toExpression(value), GraftSqlBridge.toExpression(cmp),
      pickMax = false).toAggregateExpression())
}
