package graft.plans

import graft.sources.pinot.{PinotScan, PinotSegmentTable}
import graft.sources.pinot.PinotScan.{JsonEqProbe, JsonExistsProbe, JsonNullProbe, JsonRangeProbe}
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualNullSafe, EqualTo, Expression, GetJsonObject, GreaterThan, GreaterThanOrEqual, In, InSet, IsNotNull, IsNull, LessThan, LessThanOrEqual, Literal, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.StringType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Routes `get_json_object(col, '$.path')` probes — `= 'value'`,
  * `IN ('a','b',…)`, `<=> 'value'`, `IS NOT NULL`, `IS NULL`, and
  * string ranges
  * (`>` / `>=` / `<` / `<=` against a literal, e.g.
  * `get_json_object(c, '$.date') >= '2024-01-01'`) — over a Pinot
  * relation into the scan (EXTENSION — the pushdown half of Pinot's
  * `jsonIndexColumns` capability; see
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
  * Soundness of each probe form:
  *  - `= v` / `<=> v` (non-null v): candidates = docs that may render
  *    v at the path.
  *  - `IN (v1…vn)`: null literals are DROPPED from the list before
  *    encoding — `x IN (null, …)` is never TRUE via the null, so the
  *    candidate set of the non-null values is a superset of the rows
  *    the filter keeps. An all-null / empty list is not pushed.
  *  - `IS NOT NULL`: candidates = docs where the path may yield any
  *    value ([[graft.pinot.JsonIndexSection.existsBitmap]]).
  *  - `IS NULL`: candidates = complement of the docs the index PROVES
  *    non-null ([[graft.pinot.JsonIndexSection.notNullBitmap]]; always
  *    answerable — a posting is a proof, everything else stays a
  *    candidate).
  *  - Ranges: candidates = docs whose rendered value may lie in the
  *    bound interval under Spark's own UTF8String byte order
  *    ([[graft.pinot.JsonIndexSection.rangeBitmap]]; a NULL rendering
  *    never satisfies a comparison, so exists-grade refusal keeps the
  *    superset sound).
  *
  * Registered through `graft.functions.GraftExtensions`
  * (injectOptimizerRule → operator-optimization batch, which runs
  * before V2 scan pushdown builds the scan).
  */
object JsonIndexRule extends Rule[LogicalPlan] with PredicateHelper {

  private object Probe {
    def unapply(e: Expression): Option[(AttributeReference, String)] =
      e match {
        case GetJsonObject(a: AttributeReference,
            Literal(p: UTF8String, StringType)) => Some((a, p.toString))
        case _ => None
      }
  }

  private def probesOf(cond: Expression): Seq[PinotScan.JsonProbe] =
    splitConjunctivePredicates(cond).collect {
      case EqualTo(Probe(a, p), Literal(v: UTF8String, StringType))
          if v != null =>
        JsonEqProbe(a.name, p, Seq(v.toString))
      case EqualTo(Literal(v: UTF8String, StringType), Probe(a, p))
          if v != null =>
        JsonEqProbe(a.name, p, Seq(v.toString))
      case EqualNullSafe(Probe(a, p), Literal(v: UTF8String, StringType))
          if v != null =>
        JsonEqProbe(a.name, p, Seq(v.toString))
      case EqualNullSafe(Literal(v: UTF8String, StringType), Probe(a, p))
          if v != null =>
        JsonEqProbe(a.name, p, Seq(v.toString))
      case In(Probe(a, p), list)
          if list.nonEmpty && list.forall {
            case Literal(_, StringType) => true
            case _ => false
          } && list.exists { case Literal(v, _) => v != null } =>
        val vs = list.collect {
          case Literal(v: UTF8String, StringType) if v != null => v.toString
        }.distinct.sorted
        JsonEqProbe(a.name, p, vs)
      case InSet(Probe(a, p), hset) if hset.exists(_ != null) =>
        val vs = hset.iterator.collect {
          case v: UTF8String => v.toString
        }.toSeq.distinct.sorted
        JsonEqProbe(a.name, p, vs)
      case IsNotNull(Probe(a, p)) =>
        JsonExistsProbe(a.name, p)
      case IsNull(Probe(a, p)) =>
        JsonNullProbe(a.name, p)
      // string ranges, both operand orders (`lit > probe` ≡ `probe < lit`)
      case GreaterThan(Probe(a, p), Literal(v: UTF8String, StringType))
          if v != null =>
        JsonRangeProbe(a.name, p, Some(v.toString), loInc = false, None,
          hiInc = false)
      case GreaterThan(Literal(v: UTF8String, StringType), Probe(a, p))
          if v != null =>
        JsonRangeProbe(a.name, p, None, loInc = false, Some(v.toString),
          hiInc = false)
      case GreaterThanOrEqual(Probe(a, p),
          Literal(v: UTF8String, StringType)) if v != null =>
        JsonRangeProbe(a.name, p, Some(v.toString), loInc = true, None,
          hiInc = false)
      case GreaterThanOrEqual(Literal(v: UTF8String, StringType),
          Probe(a, p)) if v != null =>
        JsonRangeProbe(a.name, p, None, loInc = false, Some(v.toString),
          hiInc = true)
      case LessThan(Probe(a, p), Literal(v: UTF8String, StringType))
          if v != null =>
        JsonRangeProbe(a.name, p, None, loInc = false, Some(v.toString),
          hiInc = false)
      case LessThan(Literal(v: UTF8String, StringType), Probe(a, p))
          if v != null =>
        JsonRangeProbe(a.name, p, Some(v.toString), loInc = false, None,
          hiInc = false)
      case LessThanOrEqual(Probe(a, p), Literal(v: UTF8String, StringType))
          if v != null =>
        JsonRangeProbe(a.name, p, None, loInc = false, Some(v.toString),
          hiInc = true)
      case LessThanOrEqual(Literal(v: UTF8String, StringType), Probe(a, p))
          if v != null =>
        JsonRangeProbe(a.name, p, Some(v.toString), loInc = true, None,
          hiInc = false)
    }.distinct

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, rel: DataSourceV2Relation)
        if rel.table.isInstanceOf[PinotSegmentTable] =>
      val probes = probesOf(cond)
        .filter(pr => rel.output.exists(_.name == pr.col))
      if (probes.isEmpty) f
      else {
        val encoded = PinotScan.encodeJsonProbes(probes)
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
