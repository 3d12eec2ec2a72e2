package graft.plans

import graft.sources.pinot.{PinotScan, PinotSegmentTable}
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo, Expression, GetJsonObject, Literal, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.StringType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Routes `get_json_object(col, '$.path') = 'value'` equality predicates
  * over a Pinot relation into the scan (EXTENSION — the pushdown half of
  * Pinot's `jsonIndexColumns` capability; see
  * [[graft.pinot.JsonIndexSection]]).
  *
  * V1 source filters cannot carry an embedded function call, so the
  * probes travel as a relation OPTION ([[PinotScan.JsonEqOptionKey]])
  * that `newScanBuilder` decodes. The Filter node is LEFT IN PLACE —
  * the index only ever prunes segments and skips decode windows
  * (advisory superset, like every other graft index); Spark's residual
  * evaluation stays authoritative, so running without this rule (or
  * without the index) changes performance, never results.
  *
  * Registered through `graft.functions.GraftExtensions`
  * (injectOptimizerRule → operator-optimization batch, which runs
  * before V2 scan pushdown builds the scan).
  */
object JsonIndexRule extends Rule[LogicalPlan] with PredicateHelper {

  private def triplesOf(cond: Expression): Seq[(String, String, String)] =
    splitConjunctivePredicates(cond).collect {
      case EqualTo(GetJsonObject(a: AttributeReference,
          Literal(p: UTF8String, StringType)),
          Literal(v: UTF8String, StringType)) if v != null =>
        (a.name, p.toString, v.toString)
      case EqualTo(Literal(v: UTF8String, StringType),
          GetJsonObject(a: AttributeReference,
            Literal(p: UTF8String, StringType))) if v != null =>
        (a.name, p.toString, v.toString)
    }.distinct

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, rel: DataSourceV2Relation)
        if rel.table.isInstanceOf[PinotSegmentTable] =>
      val triples = triplesOf(cond)
        .filter { case (c, _, _) => rel.output.exists(_.name == c) }
      if (triples.isEmpty) f
      else {
        val encoded = PinotScan.encodeJsonEq(triples)
        if (encoded == rel.options.get(PinotScan.JsonEqOptionKey)) f // fixed point
        else {
          val m = new java.util.HashMap[String, String](
            rel.options.asCaseSensitiveMap())
          m.put(PinotScan.JsonEqOptionKey, encoded)
          f.copy(child = rel.copy(options = new CaseInsensitiveStringMap(m)))
        }
      }
  }
}
