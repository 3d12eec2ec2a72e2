package graft.plans

import graft.pinot.PinotFormatException
import graft.sources.pinot.{PinotSegmentTable, PinotUpsert}
import org.apache.spark.sql.{GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.objects.AssertNotNull
import org.apache.spark.sql.catalyst.plans.logical.{InsertIntoStatement, LogicalPlan, Project, V2WriteCommand}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Makes a PLAIN read of an upsert-configured Pinot table return the
  * upsert VIEW — `spark.read.format("pinot").load(dir)` and catalog SQL
  * (`SELECT * FROM pinot.default.t`) see only the latest record per
  * key, exactly like a Pinot query over an upsert REALTIME table
  * (EXTENSION — the reference reads segments raw and surfaces every
  * superseded version, table.rs:162). Without this rule a SQL user who
  * knows the table is "upsert-enabled" silently gets every superseded
  * version plus deleted rows; segment-level inspection of those raw
  * versions is still available behind the EXPLICIT
  * `.option("upsertView", "raw")` escape hatch.
  *
  * Mechanics: an analyzer resolution rule. A [[DataSourceV2Relation]]
  * whose [[PinotSegmentTable]] carries an `upsert.properties` config
  * rewrites to [[PinotUpsert.viewOver]]'s plan over the SAME relation
  * re-marked `upsertView=raw` (so the rewrite is idempotent across
  * fixpoint iterations), capped by a Project that restores the
  * relation's public face — names, exprIds, order, types — so parent
  * operators' attribute references keep binding. The view cannot
  * produce NULL where the raw schema says non-nullable (groups that
  * could — all-NULL comparison values — reject loudly first), which
  * [[AssertNotNull]] both declares and enforces.
  *
  * Guards:
  *  - WRITE targets never rewrite (appending to an upsert table writes
  *    raw version rows; the view is a read-time concept).
  *  - Type-WIDENING partial strategies (scalar UNION/APPEND → array)
  *    cannot hide behind an unchanged relation schema, so the
  *    transparent path rejects them LOUDLY and points at
  *    [[PinotUpsert.latest]] — never silently raw, never silently
  *    mis-typed.
  *  - Streaming reads (`readStream`) plan through StreamingRelationV2,
  *    which this rule does not touch; the streaming upsert view is
  *    [[PinotUpsert.latestStream]].
  *
  * At 100 TB the rewrite inherits [[PinotUpsert.viewOver]]'s shape: ONE
  * map-side-combinable hash aggregate on the key columns — and because
  * it happens at analysis, every later phase (filter pushdown on key
  * columns above the aggregate, AQE skew handling on the key exchange)
  * applies to the view like any hand-written aggregate.
  */
object UpsertViewRule extends Rule[LogicalPlan] {

  private val OptionKey = "upsertView"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // relations in WRITE position keep their raw identity. SQL
    // `INSERT INTO` reaches the analyzer as InsertIntoStatement and
    // only converts to a V2WriteCommand in a LATER pass
    // (ResolveInsertInto runs before injected resolution rules within a
    // batch iteration, but sees the resolved relation one fixpoint
    // iteration after ResolveRelations) — rewriting the target in the
    // gap would leave ResolveInsertInto nothing to match and fail every
    // SQL insert into an upsert table, so both write shapes exempt.
    val writeTargets = plan.collect {
      case w: V2WriteCommand =>
        w.table.collect { case r: DataSourceV2Relation => r }
      case i: InsertIntoStatement =>
        i.table.collect { case r: DataSourceV2Relation => r }
    }.flatten.toSet
    plan.resolveOperatorsUp {
      case r: DataSourceV2Relation if eligible(r) && !writeTargets(r) =>
        rewrite(r)
    }
  }

  private def eligible(r: DataSourceV2Relation): Boolean = r.table match {
    case t: PinotSegmentTable =>
      t.upsertConfig.isDefined && t.dir.isDefined &&
        !"raw".equalsIgnoreCase(r.options.get(OptionKey))
    case _ => false
  }

  private def rewrite(r: DataSourceV2Relation): LogicalPlan = {
    val table = r.table.asInstanceOf[PinotSegmentTable]
    val cfg = table.upsertConfig.get
    val dir = table.dir.get
    val widening = cfg.typeWidening(table.schema())
    if (widening.nonEmpty)
      throw new PinotFormatException(
        s"upsert table $dir: partial strategies on ${widening.mkString(",")} " +
          "widen scalar columns to arrays, which a transparent read cannot " +
          "express in the table schema — read the view with " +
          "PinotUpsert.latest, or the raw segments with " +
          s""".option("$OptionKey", "raw")""")
    // the SAME relation (schema, attributes), re-marked raw: the view's
    // input scan, and the fixpoint-idempotence marker in one
    val opts = new java.util.HashMap[String, String](r.options)
    opts.put(OptionKey, "raw")
    val raw = r.copy(options = new CaseInsensitiveStringMap(opts))
    val spark = SparkSession.active
    val view = PinotUpsert.viewOver(GraftSqlBridge.ofRows(spark, raw),
      dir, cfg)
    val analyzed = GraftSqlBridge.analyzed(view)
    // restore the relation's public face: match the view's output (same
    // column NAMES, possibly fresh exprIds from the aggregate) back to
    // the original attributes parents still reference
    val byName = analyzed.output.map(a => a.name.toLowerCase -> a).toMap
    val restored: Seq[NamedExpression] = r.output.map { orig =>
      val a = byName.getOrElse(orig.name.toLowerCase,
        throw new PinotFormatException(
          s"upsert table $dir: view lost column ${orig.name} — bug"))
      if (a.exprId == orig.exprId && a.nullable == orig.nullable) a
      else {
        val child = if (!orig.nullable && a.nullable) AssertNotNull(a) else a
        Alias(child, orig.name)(exprId = orig.exprId)
      }
    }
    Project(restored, analyzed)
  }
}
