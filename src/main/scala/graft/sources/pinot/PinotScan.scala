package graft.sources.pinot

import graft.pinot.{PinotDictionary, PinotType, SegmentReader}
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, Avg, Count, CountStar, Max, Min, Sum}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, IsNotNull, IsNull, LessThan, LessThanOrEqual, StringContains, StringEndsWith, StringStartsWith}
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarBatch}
import org.apache.spark.sql.execution.vectorized.{Dictionary, OnHeapColumnVector}
import org.apache.spark.unsafe.types.UTF8String

/** Scan pipeline: the segment is the base unit of parallelism
  * (reference: exec.rs:41,52), refined by sub-segment task planning —
  * large segments split into window-aligned doc-range slices, tiny
  * segments group into shared tasks ([[PinotScan.planSplits]]; SURVEY
  * §4's "per-segment splits grouped into tasks"). Column pruning pushes
  * down (reference accepts projection indices, table.rs:161), and an
  * empty projection takes a row-count path for `COUNT(*)`
  * (reference: exec.rs:92-95,157-162).
  *
  * Scale note: at 100 TB a table is many thousands of segments; Spark
  * schedules the split/grouped partitions across executors, so the design
  * parallelizes linearly in data volume AND saturates a cluster even when
  * segment sizes are skewed — no driver-side materialization anywhere.
  */
class PinotScanBuilder(segmentPaths: Seq[String], fullSchema: StructType,
    tableDir: Option[String] = None,
    splitTargetBytes: Long = PinotScan.DefaultSplitTargetBytes,
    jsonEq: Seq[PinotScan.JsonProbe] = Nil,
    rawUpsertView: Boolean = false)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters with SupportsPushDownLimit
    with SupportsPushDownTopN with SupportsPushDownOffset
    with SupportsPushDownAggregates {

  private var projected: StructType = fullSchema
  private var skipFilters: Array[Filter] = Array.empty
  private var sawFilters = false
  private var limit: Option[Int] = None
  private var pushedAgg: Option[Aggregation] = None
  private var aggComplete = false
  private var useStarTree = false
  private var useHistogram = false
  private var histFinal = false
  // single-segment single-col DISTINCT accepted as COMPLETE (dictionary
  // is the final answer) — tracked so the plan description is truthful
  private var distinctFinal = false
  // pushed ORDER BY ... LIMIT over a complete histogram aggregate:
  // (sort keys over the scan's output layout, limit)
  private var topN: Option[(Array[TopNKey], Int)] = None
  // pushed ORDER BY ... LIMIT over a PLAIN scan: sorted mode slices the
  // partition's first/last k docs; value mode decodes the sort column,
  // bounded-heap-selects k docs, and decodes everything else for those
  // k only
  private var scanTopN: Option[ScanTopN] = None
  // pushed OFFSET (pagination): rows [offset, pushedLimit) come back —
  // the chained single partition skips whole segments via metadata doc
  // counts, so OFFSET 1e9 over a 100 TB table opens no forward index
  // before the target segment
  private var offset: Option[Int] = None

  // Catalyst's ColumnPruning hands us the required columns; we keep their
  // names and decode only those (≙ SupportsPushDownRequiredColumns).
  override def pruneColumns(requiredSchema: StructType): Unit =
    if (pushedAgg.isEmpty) projected = requiredSchema

  /** Equality/IN/range filters are accepted as ADVISORY: each partition
    * consults the segment's per-column dictionary (equality/IN) and its
    * metadata `minValue`/`maxValue` (ranges — extends A4's dictionary
    * pruning with the min/max the writer records, ≙ the `isSorted`/range
    * metadata the reference parses and drops, metadata.rs:166-168) and
    * skips the whole segment when no row can match. Every filter is also
    * returned as residual, so Spark still evaluates it — pruning can only
    * skip, never change results.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    sawFilters = filters.nonEmpty
    skipFilters = filters.filter {
      case _: EqualTo | _: In => true
      case _: GreaterThan | _: GreaterThanOrEqual |
           _: LessThan | _: LessThanOrEqual => true
      // prefix filters prune by [min,max] too: LIKE 'abc%' can only
      // match inside [abc, abd)
      case _: StringStartsWith => true
      // substring predicates: text-index token postings (advisory — a
      // column without a text index simply ignores them)
      case _: StringContains | _: StringEndsWith => true
      case _ => false
    }
    filters // all residual: engine-side FilterExec remains authoritative
  }

  override def pushedFilters(): Array[Filter] = skipFilters

  /** Limit pushdown. With no filters in play the limit is FULLY pushed
    * (`isPartiallyPushed = false` — Spark drops its Limit nodes
    * entirely): the scan plans ONE partition that chains segments until
    * the limit fills, so a bare `LIMIT 10` over a 100 TB table is a
    * single task reading one window of one segment — no per-segment
    * tasks, no CollectLimit shuffle stage (Pinot's selection
    * short-circuit). With filters the cap stays per-partition advisory
    * and Spark's Limit remains authoritative above the residual Filter.
    *
    * REFUSED outright when an aggregation was already pushed: Spark
    * 4.1.2's pushDownLimit has no pushedAggregate guard, so accepting
    * here (with `isPartiallyPushed = false`) would make Spark DELETE its
    * Limit node above a complete aggregate scan — e.g.
    * `distinct().limit(2)` returning every distinct value. Aggregate
    * pushdown runs before limit pushdown, so `pushedAgg` is final here.
    */
  override def pushLimit(l: Int): Boolean = {
    if (pushedAgg.isDefined) return false
    limit = Some(l)
    true
  }

  // shared by SupportsPushDownLimit and SupportsPushDownTopN: a pushed
  // limit is FULL only with no filters in play; a pushed top-N is ALWAYS
  // partial — each partition emits its local top-k and Spark's
  // TakeOrderedAndProject stays authoritative over ≤ k×partitions rows
  // (correct under sub-segment slicing and ties, and exactly the shape
  // that scales: a 1000-segment ORDER BY ... LIMIT 10 moves 10 rows per
  // task instead of each task's whole histogram)
  override def isPartiallyPushed(): Boolean =
    sawFilters || topN.isDefined || scanTopN.isDefined

  /** OFFSET pushdown (Spark offers it only after a FULLY pushed limit,
    * or bare): accepted on the plain filterless scan, where the chained
    * single partition emits exactly rows [offset, pushedLimit) in
    * deterministic segment-chain order — whole segments before the
    * target skip via metadata doc counts alone. Refused with a top-N in
    * play (per-partition top-k and a global row skip don't compose).
    */
  override def pushOffset(o: Int): Boolean = {
    if (o <= 0 || sawFilters || pushedAgg.isDefined ||
        topN.isDefined || scanTopN.isDefined) return false
    offset = Some(o)
    true
  }

  /** ORDER BY + LIMIT over a COMPLETE histogram aggregate: the reader
    * bounded-heap-selects its top `limit` groups instead of emitting the
    * whole histogram. Accepted only when every sort key is one of the
    * scan's own output columns (group columns by name, aggregates as
    * `agg_i`) — Spark rewrites the Sort's expressions into exactly those
    * names through the Project it collapsed. Sort keys are non-nullable
    * by construction on this path (group columns refuse null vectors;
    * aggregates of occupied groups are never null), so null-ordering is
    * vacuous. Filtered queries never reach here: Spark only attempts a
    * top-N push with no Filter above the scan, and every graft filter is
    * residual.
    */
  override def pushTopN(
      orders: Array[org.apache.spark.sql.connector.expressions.SortOrder],
      l: Int): Boolean = {
    if (java.lang.Boolean.getBoolean("graft.pinot.disableTopNPush"))
      return false // kill switch (A/B + operational escape hatch)
    if (l <= 0 || l > PinotScan.TopNPushCap) return false
    // PLAIN scan, single sort key on a column every segment stores
    // SORTED (non-nullable, single-value): the partition's top-k is its
    // first (ASC) or last (DESC) k docs — a doc-range slice, decoding
    // NOTHING for the sort itself (Pinot's selection-order
    // short-circuit; `ORDER BY ts LIMIT k` over a 100 TB time-ordered
    // table reads k docs per task). Partial push only, so ties at the
    // boundary stay Spark's arbitrary choice exactly as unpushed — the
    // first/last-k value MULTISET is exact for a single key, which is
    // why multi-key orders must refuse (a key2 tie-break could prefer a
    // doc outside the first k of key1 ties).
    if (pushedAgg.isEmpty) {
      if (sawFilters || limit.isDefined || orders.length != 1) return false
      val o = orders(0)
      val colName = o.expression() match {
        case nr: NamedReference if nr.fieldNames().length == 1 =>
          nr.fieldNames()(0)
        case _ => return false
      }
      val desc = o.direction() ==
        org.apache.spark.sql.connector.expressions.SortDirection.DESCENDING
      val metas = segmentPaths.map(PinotScan.segmentMeta)
      if (metas.isEmpty || metas.exists(_ == null)) return false
      def everywhere(p: graft.pinot.ColumnMetadata => Boolean): Boolean =
        metas.forall(_.columns.get(colName).exists(cm =>
          cm.isSingleValue && !cm.hasNullVector && p(cm)))
      // sorted mode: numeric/boolean/timestamp only — the writer's
      // isSorted uses JVM orderings, which agree with Spark's for these
      // types; STRING is excluded (UTF-16 vs UTF8-byte order can
      // disagree off-ASCII)
      val sortedEverywhere = everywhere(cm => cm.isSorted &&
        (cm.dataType match {
          case PinotType.PInt | PinotType.PLong | PinotType.PFloat |
               PinotType.PDouble | PinotType.PBoolean |
               PinotType.PTimestamp => true
          case _ => false
        }))
      // value mode: any orderable single-value non-null column — the
      // reader compares DECODED values with Spark's own orderings, so
      // STRING is safe here (UTF8String.compareTo IS Spark's order)
      val valueOrderable = everywhere(cm => cm.dataType match {
        case PinotType.PInt | PinotType.PLong | PinotType.PFloat |
             PinotType.PDouble | PinotType.PBoolean |
             PinotType.PTimestamp | PinotType.PString => true
        case _ => false
      })
      if (!sortedEverywhere && !valueOrderable) return false
      scanTopN = Some(ScanTopN(colName, desc, l, sorted = sortedEverywhere))
      return true
    }
    if (!(useHistogram && histFinal)) return false
    val agg = pushedAgg.getOrElse(return false)
    val groupCols = agg.groupByExpressions.flatMap(fieldName)
    if (groupCols.length != agg.groupByExpressions.length) return false
    // Spark rewrites sort attributes over a pushed aggregate back into
    // the TRANSLATED aggregate expression (pushedAggOutputMap), so an
    // ORDER BY on an aggregate output arrives as e.g. `SUM(hits)` — match
    // it against the pushed function list by canonical form. Duplicate
    // identical functions resolve to the first slot: their output
    // columns are value-identical, so sorting by either is the same.
    val aggSlots: Map[String, Int] = agg.aggregateExpressions.zipWithIndex
      .foldLeft(Map.empty[String, Int]) { case (m, (f, i)) =>
        // first-wins: duplicate functions are value-identical, keep slot 0
        if (m.contains(f.toString)) m
        else m + (f.toString -> (groupCols.length + i))
      }
    val keys = new Array[TopNKey](orders.length)
    var i = 0
    while (i < orders.length) {
      val o = orders(i)
      val outIdx = o.expression() match {
        case nr: NamedReference if nr.fieldNames().length == 1 &&
            groupCols.contains(nr.fieldNames()(0)) =>
          groupCols.indexOf(nr.fieldNames()(0))
        case e => aggSlots.getOrElse(e.toString, return false)
      }
      keys(i) = TopNKey(outIdx,
        o.direction() ==
          org.apache.spark.sql.connector.expressions.SortDirection.DESCENDING)
      i += 1
    }
    topN = Some((keys, l))
    true
  }

  /** COUNT-only global aggregations are answered COMPLETELY from segment
    * metadata (`segment.total.docs` + per-column `nullValueCount`, cached
    * on the driver): no tasks touch any column data, and a single row
    * comes back — Spark plans no final aggregate. `COUNT(col)` =
    * totalDocs − nullCount, exact even for nullable columns because the
    * writer records the null-vector cardinality.
    */
  override def supportCompletePushDown(agg: Aggregation): Boolean = {
    val ok = agg.groupByExpressions.isEmpty && !sawFilters &&
      agg.aggregateExpressions.forall {
        case _: CountStar => true
        case c: Count => !c.isDistinct &&
          fieldName(c.column()).exists(metaCountable)
        // SUM/AVG from writer-recorded exact sums, MIN/MAX from the
        // min/max metadata (integral, non-nullable, every segment) —
        // a filterless global aggregate then never reads column data.
        // -Dgraft.pinot.disableMetaAgg=true is the A/B + escape hatch.
        case s: Sum => !metaAggDisabled && !s.isDistinct &&
          fieldName(s.column()).exists(c =>
            metaSummable(c) && metaSumTotalFits(c))
        case a: Avg => !metaAggDisabled && !a.isDistinct &&
          fieldName(a.column()).exists(metaAvgExact)
        case m: Min => !metaAggDisabled &&
          fieldName(m.column()).exists(metaMinMaxable)
        case m: Max => !metaAggDisabled &&
          fieldName(m.column()).exists(metaMinMaxable)
        case _ => false
      }
    if (ok) { aggComplete = true; return true }
    // Single-segment dict group-by: the per-segment histogram IS the
    // final answer (exactly how a lone Pinot server answers a group-by)
    // — Spark plans NO final aggregate and NO exchange, so the query is
    // one stage: scan → top-k. Complete pushdown also receives AVG
    // un-rewritten; the histogram answers it as sum/count at emit.
    // Multi-segment tables fall back to parallel per-segment partials.
    val gOpt = agg.groupByExpressions.map(fieldName(_))
    if (gOpt.exists(_.isEmpty) || segmentPaths.length != 1 || sawFilters)
      return false
    val groupCols = gOpt.flatten
    // Complete histogram paths read the lone segment's FORWARD INDEXES
    // in ONE task (no final aggregate exists to merge slices). Past
    // `completeAggMaxDocs` AND when groups are much fewer than rows,
    // partial mode + doc-range slices win despite the extra merge
    // stage — refuse so pushAggregation takes over and
    // planInputPartitions slices. High-cardinality keys stay complete:
    // each slice would emit ~cardinality partial rows into a shuffle,
    // costing more than the saved decode. The dictionary-only
    // single-col DISTINCT below stays size-independent.
    def loneTooBigToFinal(groupCols: Array[String]): Boolean =
      splitTargetBytes > 0 && {
        val m = PinotScan.segmentMeta(segmentPaths.head)
        m != null && m.totalDocs > PinotScan.CompleteAggMaxDocs && {
          val cap = 1L << 20
          val prod = groupCols.foldLeft(1L) { (acc, c) =>
            val card = math.max(1,
              m.columns.get(c).fold(Int.MaxValue.toLong)(_.cardinality.toLong))
            if (acc > cap) acc else acc * card
          }
          prod <= m.totalDocs / 4
        }
      }
    // single-segment DISTINCT is final by construction: the dictionary
    // (single col) / the occupied composite-id set (multi col) each
    // emit every present key exactly once — Spark plans no dedup
    if (agg.aggregateExpressions.isEmpty && groupCols.nonEmpty) {
      if (groupCols.length == 1 && isDictDistinctable(groupCols.head)) {
        distinctFinal = true
        return true
      }
      // composite-id / RAW-slot histogram: occupied keys are final
      if (!loneTooBigToFinal(groupCols) &&
          groupCols.forall(c =>
            isDictDistinctable(c) || isRawStringGroupable(c)) &&
          cardProductOk(groupCols)) {
        histFinal = true
        return true
      }
      return false
    }
    if (!loneTooBigToFinal(groupCols) &&
        histCovers(groupCols, agg.aggregateExpressions, allowAvg = true)) {
      // an empty segment emits NO partial rows, but a GLOBAL aggregate
      // must still return its mandatory single row (SUM = NULL,
      // COUNT = 0) — only Spark's final aggregate can produce it, so
      // complete pushdown refuses and the partial path takes over.
      // (Group-by over an empty segment is correctly empty either way.)
      if (groupCols.isEmpty &&
          Option(PinotScan.segmentMeta(segmentPaths.head))
            .forall(_.totalDocs == 0)) return false
      histFinal = true
      return true
    }
    false
  }

  /** Π segment cardinalities of `cols` stays within the per-task
    * histogram array cap in EVERY segment (1M entries ≈ 8 MB). The fold
    * saturates at the cap instead of multiplying on — a 3×2^21 product
    * must not wrap Long into accidental acceptance.
    */
  private def cardProductOk(cols: Array[String]): Boolean = {
    val cap = 1L << 20
    val metas = segmentPaths.map(PinotScan.segmentMeta)
    metas.nonEmpty && !metas.exists(_ == null) && metas.forall { m =>
      cols.foldLeft(1L) { (acc, c) =>
        val card = math.max(1, m.columns.get(c).fold(Int.MaxValue)(_.cardinality))
        if (acc > cap) acc else acc * card
      } <= cap
    }
  }

  /** COUNT(col) answerable from metadata alone: every segment's metadata
    * is readable and carries the column (nullCount is then exact — zero
    * without a null vector, the recorded bitmap cardinality with one).
    */
  private def metaAggDisabled: Boolean =
    java.lang.Boolean.getBoolean("graft.pinot.disableMetaAgg")

  private def metaCountable(col: String): Boolean = {
    val metas = segmentPaths.map(PinotScan.segmentMeta)
    metas.nonEmpty && !metas.exists(_ == null) &&
      metas.forall(_.columns.contains(col))
  }

  /** SUM(col) answerable from metadata alone: every non-empty segment
    * recorded an exact writer sum, fitting in a long, for a non-nullable
    * single-value INTEGRAL column. (Float/double sums are
    * order-dependent in Spark's double accumulation — excluded so
    * results stay bit-identical with the unpushed plan. A per-segment
    * sum outside the long range refuses too: the partial row is typed
    * long, and the session's own overflow semantics — ANSI throw or
    * legacy wrap — must come from Spark's execution, not a silent
    * metadata wrap.)
    */
  private def metaSummable(col: String): Boolean = {
    // ANSI parity for TRANSIENT overflow too: an unpushed ANSI Sum can
    // throw when a running row-order sum leaves the long range even
    // though the total fits. A same-sign segment (min ≥ 0 or max ≤ 0)
    // is monotone — its running sum is bounded by the fitting total and
    // can never transiently overflow; mixed signs additionally require
    // Σ|v| ≤ rows × max(|min|,|max|) to fit, which bounds every prefix.
    def noTransientOverflow(cm: graft.pinot.ColumnMetadata,
        rows: Int): Boolean = {
      val bnds = for (
        mn <- cm.minValue.flatMap(v => scala.util.Try(BigInt(v)).toOption);
        mx <- cm.maxValue.flatMap(v => scala.util.Try(BigInt(v)).toOption))
      yield (mn, mx)
      bnds.exists { case (mn, mx) =>
        mn.signum >= 0 || mx.signum <= 0 ||
          (mn.abs.max(mx.abs) * rows).isValidLong
      }
    }
    val metas = segmentPaths.map(PinotScan.segmentMeta)
    metas.nonEmpty && !metas.exists(_ == null) &&
      metas.forall(m => m.totalDocs == 0 ||
        m.columns.get(col).exists(cm => cm.isSingleValue &&
          !cm.hasNullVector && cm.sumValue.exists(_.isValidLong) &&
          noTransientOverflow(cm, m.totalDocs) &&
          (cm.dataType == PinotType.PInt || cm.dataType == PinotType.PLong)))
  }

  /** The exact TOTAL sum fits in a long — required for the COMPLETE
    * metadata answer (the overflowing case defers to execution so ANSI
    * mode throws exactly as an unpushed plan would).
    */
  private def metaSumTotalFits(col: String): Boolean = {
    val metas = segmentPaths.map(PinotScan.segmentMeta)
    metas.foldLeft(BigInt(0)) { (acc, m) =>
      if (m == null || m.totalDocs == 0) acc
      else acc + m.columns.get(col).flatMap(_.sumValue).getOrElse(BigInt(0))
    }.isValidLong
  }

  /** AVG(col) from metadata is exact only while Spark's own
    * double-accumulated sum is exact: every running partial sum must
    * stay within 2^53. `rows × max(|min|,|max|)` bounds every partial,
    * so the gate is conservative — outside it the histogram path
    * answers instead (bit-identical by construction, just not free).
    */
  private def metaAvgExact(col: String): Boolean = metaSummable(col) && {
    val metas = segmentPaths.map(PinotScan.segmentMeta)
    val bound = metas.foldLeft(BigInt(0)) { (acc, m) =>
      if (m.totalDocs == 0) acc
      else m.columns.get(col).flatMap(cm =>
        for (mn <- cm.minValue.flatMap(v => scala.util.Try(BigInt(v)).toOption);
             mx <- cm.maxValue.flatMap(v => scala.util.Try(BigInt(v)).toOption))
        yield acc + mn.abs.max(mx.abs) * m.totalDocs)
        .getOrElse(acc + BigInt(2).pow(60))
    }
    bound <= BigInt(2).pow(53)
  }

  /** MIN/MAX(col) answerable from metadata bounds alone: numeric or
    * timestamp, non-nullable, min/max recorded in every non-empty
    * segment. Float/double are safe here (unlike SUM): the writer's
    * TotalOrdering bounds match Spark's NaN-largest compare, and
    * `toString → parse` is a lossless roundtrip. STRING stays excluded
    * (the writer's `safe()` filter can drop bounds, and UTF-16 ordering
    * diverges from UTF8 bytes off-ASCII).
    */
  private def metaMinMaxable(col: String): Boolean = {
    val metas = segmentPaths.map(PinotScan.segmentMeta)
    // Bounds must PARSE in the column's type (and fit its range) before
    // the complete push is accepted: a foreign writer recording e.g.
    // "1.0" for an INT column would otherwise pass planning here and
    // throw NumberFormatException at execution instead of falling back
    // to the partial path. Same try-parse discipline metaSummable uses.
    def parsable(cm: graft.pinot.ColumnMetadata, v: String): Boolean =
      cm.dataType match {
        case PinotType.PInt =>
          scala.util.Try(BigInt(v)).toOption.exists(_.isValidInt)
        case PinotType.PLong =>
          scala.util.Try(BigInt(v)).toOption.exists(_.isValidLong)
        case PinotType.PFloat => scala.util.Try(v.toFloat).isSuccess
        case PinotType.PDouble => scala.util.Try(v.toDouble).isSuccess
        case PinotType.PTimestamp => scala.util.Try(v.toLong).toOption
          // stored millis surface as micros via multiplyExact(…, 1000)
          .exists(l => l >= Long.MinValue / 1000 && l <= Long.MaxValue / 1000)
        case _ => false
      }
    metas.nonEmpty && !metas.exists(_ == null) &&
      metas.forall(m => m.totalDocs == 0 ||
        m.columns.get(col).exists(cm => cm.isSingleValue &&
          !cm.hasNullVector &&
          cm.minValue.exists(parsable(cm, _)) &&
          cm.maxValue.exists(parsable(cm, _)) &&
          (cm.dataType match {
            case PinotType.PInt | PinotType.PLong | PinotType.PFloat |
                 PinotType.PDouble | PinotType.PTimestamp => true
            case _ => false
          })))
  }

  /** Partial pushdown for global COUNT/MIN/MAX: each task answers from its
    * own segment's metadata + dictionary (cardinality entries, never the
    * forward index), and Spark merges the per-segment rows. Distributed —
    * at 100 TB the tiny dictionary reads happen on executors, not the
    * driver. MIN/MAX limited to dictionary-encoded numeric columns
    * (string ordering semantics and RAW decode costs stay engine-side).
    *
    * GROUP BY pushes down too when every group column is KEY-PURE (each
    * segment's metadata records min == max — how partitionBy-written
    * ingest lands): each segment task emits ONE (key…, partials) row
    * straight from metadata/dictionaries, and Spark's final aggregate
    * merges. A per-tenant COUNT over a key-partitioned 100 TB table
    * becomes a metadata-only query — no forward index is ever read.
    */
  override def pushAggregation(agg: Aggregation): Boolean = {
    if (sawFilters || limit.isDefined) return false
    val groupColsOpt = agg.groupByExpressions.map(fieldName)
    if (groupColsOpt.exists(_.isEmpty)) return false
    val groupCols = groupColsOpt.flatten
    // metadata-complete global aggregate, validated by
    // supportCompletePushDown just before this call (SUM/AVG would fail
    // the per-segment partial checks below — they are answered on the
    // DRIVER from cached metadata, not by tasks)
    if (groupCols.isEmpty && aggComplete) {
      pushedAgg = Some(agg)
      return true
    }
    // DISTINCT pushdown (no aggregate functions, one dict group column):
    // each segment's dictionary IS its distinct value set, so the scan
    // emits cardinality rows per segment — SELECT DISTINCT col over a
    // 100 TB table reads dictionaries only, never a forward index
    if (agg.aggregateExpressions.isEmpty) {
      if (groupCols.length == 1 && isDictDistinctable(groupCols.head)) {
        pushedAgg = Some(agg)
        return true
      }
      // multi-column or RAW DISTINCT: dictionaries alone cannot answer
      // it (a key PAIR must actually co-occur; RAW columns have no
      // dictionary), but the composite-id/slot histogram can — each
      // segment emits its occupied key set and Spark dedups the merge
      if (groupCols.nonEmpty &&
          groupCols.forall(c =>
            isDictDistinctable(c) || isRawStringGroupable(c)) &&
          cardProductOk(groupCols)) {
        pushedAgg = Some(agg)
        useHistogram = true
        return true
      }
      return false
    }
    val keyPureOk = groupCols.forall(isKeyPure) &&
      agg.aggregateExpressions.forall {
        // COUNT(col) = docs − nullCount per segment (exact from metadata);
        // MIN/MAX refuse nullable columns — their dictionaries hold the
        // stored DEFAULT at null docs
        case _: CountStar => true
        case c: Count => !c.isDistinct &&
          fieldName(c.column()).exists(metaCountable)
        case m: Min => fieldName(m.column()).exists(n =>
          isMinMaxPushable(n) && !mayHaveNulls(n))
        case m: Max => fieldName(m.column()).exists(n =>
          isMinMaxPushable(n) && !mayHaveNulls(n))
        // partial SUM straight from each segment's writer-recorded sum
        // (integral, non-nullable) — Spark's final aggregate merges;
        // AVG arrives here already rewritten to SUM+COUNT by Spark's
        // partial-pushdown translation, so key-pure AVG rides along.
        // The SAME kill switch as the complete path gates it: the
        // escape hatch must disable every metadata-sourced sum
        case s: Sum => !metaAggDisabled && !s.isDistinct &&
          fieldName(s.column()).exists(metaSummable)
        case _ => false
      }
    if (keyPureOk) { pushedAgg = Some(agg); return true }
    // Star-tree fallback: when EVERY segment carries a star-tree whose
    // dims cover the group columns and whose metrics cover every
    // aggregate (COUNT/SUM/MIN/MAX incl. SUM, which no other pushdown
    // path answers), each task rolls its pre-aggregated records up to
    // the requested dims — a GROUP BY over a 100 TB table reads
    // |combos| records per segment instead of the forward index.
    if (starTreeCovers(groupCols, agg.aggregateExpressions)) {
      pushedAgg = Some(agg)
      useStarTree = true
      return true
    }
    // Dictionary-id histogram fallback: GROUP BY one dict-encoded column
    // with COUNT/SUM/MIN/MAX over numeric columns — each segment task
    // aggregates over packed ids in one pass (cardinality-sized arrays,
    // the id IS the hash slot) and emits per-key partials. Reads forward
    // indexes (unlike key-pure/star-tree) but never materializes per-row
    // keys, and only |dictionary| rows cross the scan boundary.
    if (histCovers(groupCols, agg.aggregateExpressions,
        allowAvg = histFinal)) {
      pushedAgg = Some(agg)
      useHistogram = true
      return true
    }
    false
  }

  /** Histogram-aggregable: at most one dict group column (same
    * preconditions as DISTINCT pushdown) with a bounded cardinality (the
    * per-task arrays are O(card × aggs); 1M entries ≈ 8 MB — fine at any
    * segment size), and every aggregate a COUNT over non-nullable data
    * or SUM/MIN/MAX of a non-nullable single-value numeric column (dict
    * or RAW fixed-byte). An EMPTY group list is the global-aggregate
    * case: one synthetic group, one partial row per segment — this is
    * what pushes global SUM/AVG (metadata can only ever answer
    * COUNT/MIN/MAX). Nullable metrics refuse: the forward index holds
    * stored DEFAULTS at null docs, which must not enter partials.
    */
  private def histCovers(groupCols: Array[String],
      funcs: Array[AggregateFunc], allowAvg: Boolean = false): Boolean = {
    if (funcs.isEmpty) return false
    val metas = segmentPaths.map(PinotScan.segmentMeta)
    if (metas.isEmpty || metas.exists(_ == null)) return false
    // Group columns compose into one id key by stride arithmetic. Each
    // may be dict-encoded (ids off the packed stream) OR a RAW string
    // with a writer-recorded exact cardinality (per-SEGMENT slot map
    // over decoded values — partial rows carry the VALUES, so slots
    // merge correctly across segments in Spark's final aggregate).
    val groupOk = groupCols.forall(c =>
      isDictDistinctable(c) || isRawStringGroupable(c))
    if (!groupOk) return false
    // per-task arrays are O(Π cardinalities × aggs): cap the PRODUCT in
    // every segment (1M entries ≈ 8 MB)
    if (groupCols.nonEmpty && !cardProductOk(groupCols)) return false
    def numericReadable(col: String): Boolean = metas.forall { m =>
      m.columns.get(col).exists(cm => cm.isSingleValue && !cm.hasNullVector &&
        (cm.dataType match {
          case PinotType.PInt | PinotType.PLong | PinotType.PFloat |
               PinotType.PDouble => true
          case _ => false
        }))
    }
    funcs.forall {
      case _: CountStar => true
      case c: Count => !c.isDistinct && fieldName(c.column()).exists(n =>
        metaCountable(n) && !mayHaveNulls(n))
      case s: Sum => !s.isDistinct &&
        fieldName(s.column()).exists(numericReadable)
      case m: Min => fieldName(m.column()).exists(numericReadable)
      case m: Max => fieldName(m.column()).exists(numericReadable)
      case a: Avg => allowAvg && !a.isDistinct &&
        fieldName(a.column()).exists(numericReadable)
      case _ => false
    }
  }

  /** Every segment has a star-tree covering the requested group columns
    * (as dims, dict-encoded non-nullable) and every aggregate function
    * (as `FUNC__column` metrics; COUNT(col) maps to COUNT__* only for
    * provably non-nullable columns).
    */
  private def starTreeCovers(groupCols: Array[String],
      funcs: Array[AggregateFunc]): Boolean = {
    val metas = segmentPaths.map(PinotScan.segmentMeta)
    metas.nonEmpty && !metas.exists(_ == null) && metas.forall { m =>
      val mets = m.starTreeMetrics.toSet
      m.starTreeDims.nonEmpty &&
        groupCols.forall(c => m.starTreeDims.contains(c) &&
          m.columns.get(c).exists(cm => cm.hasDictionary &&
            cm.isSingleValue && !cm.hasNullVector)) &&
        funcs.forall {
          case _: CountStar => mets.contains("COUNT__*")
          case c: Count => !c.isDistinct && mets.contains("COUNT__*") &&
            fieldName(c.column()).exists(col =>
              m.columns.get(col).exists(!_.hasNullVector))
          case s: Sum => !s.isDistinct && fieldName(s.column()).exists(col =>
            mets.contains(s"SUM__$col"))
          case mn: Min => fieldName(mn.column()).exists(col =>
            mets.contains(s"MIN__$col"))
          case mx: Max => fieldName(mx.column()).exists(col =>
            mets.contains(s"MAX__$col"))
          case _ => false
        }
    }
  }

  /** RAW (dictionary-less) single-value non-nullable STRING column with
    * a writer-recorded exact cardinality in EVERY segment — the
    * preconditions for the per-segment slot-map group path.
    */
  private def isRawStringGroupable(col: String): Boolean = {
    val metas = segmentPaths.map(PinotScan.segmentMeta)
    metas.nonEmpty && !metas.exists(_ == null) && metas.forall(
      _.columns.get(col).exists(cm =>
        !cm.hasDictionary && cm.isSingleValue && !cm.hasNullVector &&
          cm.dataType == PinotType.PString && cm.cardinality > 0))
  }

  /** Dictionary-encoded single-value non-nullable column of a scalar type
    * in EVERY segment — the preconditions for dictionary-as-distinct-set.
    * (A null vector breaks it: the stored default sits in the dictionary
    * whether or not any non-null row carries it.)
    */
  private def isDictDistinctable(col: String): Boolean = {
    val metas = segmentPaths.map(PinotScan.segmentMeta)
    metas.nonEmpty && !metas.exists(_ == null) && metas.forall { m =>
      m.columns.get(col).exists(cm =>
        cm.hasDictionary && cm.isSingleValue && !cm.hasNullVector &&
          (cm.dataType match {
            case PinotType.PInt | PinotType.PLong | PinotType.PFloat |
                 PinotType.PDouble | PinotType.PString |
                 PinotType.PBoolean | PinotType.PTimestamp => true
            case _ => false
          }))
    }
  }

  /** Any segment records a null-value vector for this column (unreadable
    * metadata counts as "may" — refusal is always safe).
    */
  private def mayHaveNulls(col: String): Boolean =
    segmentPaths.exists { p =>
      val m = PinotScan.segmentMeta(p)
      m == null || m.columns.get(col).exists(_.hasNullVector)
    }

  /** min == max recorded in EVERY segment, with a typed key form. */
  private def isKeyPure(col: String): Boolean = {
    val metas = segmentPaths.map(PinotScan.segmentMeta)
    metas.nonEmpty && !metas.exists(_ == null) && metas.forall { m =>
      m.columns.get(col).exists(cm =>
        !cm.hasNullVector &&
          cm.isSingleValue && cm.minValue.isDefined &&
          cm.minValue == cm.maxValue &&
          (cm.dataType match {
            case PinotType.PInt | PinotType.PLong | PinotType.PString => true
            case _ => false
          }))
    }
  }

  private def fieldName(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
    e match {
      case nr: NamedReference if nr.fieldNames().length == 1 =>
        Some(nr.fieldNames()(0))
      case _ => None
    }

  /** MIN/MAX answerable without a forward-index read in EVERY segment:
    * numeric with a dictionary (sorted entries), or RAW numeric whose
    * writer-recorded metadata min/max both survived (r3 — Pinot answers
    * these from column metadata the same way).
    */
  private def isMinMaxPushable(col: String): Boolean = {
    val metas = segmentPaths.map(PinotScan.segmentMeta)
    metas.nonEmpty && !metas.exists(_ == null) && metas.forall { m =>
      m.columns.get(col).exists(cm => cm.isSingleValue &&
        (cm.dataType match {
          case PinotType.PInt | PinotType.PLong | PinotType.PFloat |
               PinotType.PDouble => true
          case _ => false
        }) &&
        (cm.hasDictionary ||
          (cm.minValue.isDefined && cm.maxValue.isDefined)))
    }
  }

  override def build(): Scan = pushedAgg match {
    case Some(agg) =>
      new PinotAggScan(segmentPaths, agg, aggComplete, fullSchema, useStarTree,
        useHistogram, histFinal, distinctFinal, splitTargetBytes, topN)
    case None =>
      new PinotScan(segmentPaths, projected, skipFilters, limit, tableDir,
        fullLimit = (limit.isDefined || offset.isDefined) && !sawFilters,
        splitTargetBytes = splitTargetBytes, scanTopN = scanTopN,
        offset = offset, jsonEq = jsonEq, rawUpsertView = rawUpsertView)
  }
}

class PinotScan(segmentPaths: Seq[String], projected: StructType,
    skipFilters: Array[Filter], limit: Option[Int],
    tableDir: Option[String] = None, fullLimit: Boolean = false,
    splitTargetBytes: Long = PinotScan.DefaultSplitTargetBytes,
    scanTopN: Option[ScanTopN] = None, offset: Option[Int] = None,
    jsonEq: Seq[PinotScan.JsonProbe] = Nil,
    rawUpsertView: Boolean = false)
    extends Scan with Batch with SupportsReportStatistics
    with SupportsReportPartitioning with SupportsRuntimeFiltering {

  override def readSchema(): StructType = projected

  /** Runtime (dynamic-partition-pruning) filters: Spark hands the scan
    * the build side's join-key values after planning — whole segments
    * whose metadata [min,max] excludes every value are dropped before a
    * single task launches. At 100 TB this is the difference between
    * scanning thousands of segments and the handful a selective dim
    * join actually touches. Driver cost is one cached
    * metadata.properties read per segment (no dictionary/column IO).
    * Sound by construction: pruning can only skip segments that
    * provably contain no matching rows — the join itself remains
    * authoritative for row-level filtering.
    */
  @volatile private var runtimeFilters: Array[Filter] = Array.empty

  override def filterAttributes(): Array[NamedReference] =
    // a fully-pushed limit opts out of runtime filtering: Spark removed
    // its Limit node, so the chained single partition must answer the
    // query alone, unrestricted by join-side pruning
    if (fullLimit) Array.empty
    else projected.fieldNames.map(
      org.apache.spark.sql.connector.expressions.Expressions.column)

  override def filter(filters: Array[Filter]): Unit = {
    runtimeFilters = filters
  }

  /** Segments surviving runtime pruning. The storage-partitioned (keyed)
    * case is left unpruned: KeyGroupedPartitioning's key list is fixed at
    * planning, and SPJ tables are already co-located by the join key.
    */
  private def effectiveSegments: Seq[String] =
    if (runtimeFilters.isEmpty || partitionInfo.isDefined) segmentPaths
    else segmentPaths.filter { p =>
      val m = PinotScan.segmentMeta(p)
      m == null || runtimeFilters.forall(PinotScan.metaMayMatch(m, _))
    }

  /** Streaming read: tail the table directory for newly-committed
    * segments — each micro-batch processes exactly the segments that
    * appeared since the last offset (segments are immutable, so a
    * segment list IS a consistent offset). This is how a _REALTIME
    * table's ingest is consumed incrementally; the reference is
    * batch-only.
    */
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream = {
    val dir = tableDir.getOrElse(throw new graft.pinot.PinotFormatException(
      "streaming read requires a table directory path"))
    // upsert tables: a plain readStream would silently surface every
    // superseded version — the same trap UpsertViewRule closes for
    // batch reads. The streaming view is PinotUpsert.latestStream
    // (which reads the raw tail explicitly); segment-level tails need
    // the same explicit escape hatch as batch raw reads.
    if (!rawUpsertView &&
        PinotUpsert.tryConfig(dir, graft.pinot.SegmentIO.forPath(dir))
          .isDefined)
      throw new graft.pinot.PinotFormatException(
        s"$dir is an upsert table: a raw stream would surface superseded " +
          "versions. Use PinotUpsert.latestStream for the upsert view, " +
          """or .option("upsertView", "raw") for the raw segment tail""")
    new PinotMicroBatchStream(dir, projected.fieldNames, skipFilters, limit)
  }

  /** Segment-aligned partition column: a projected dict SV column whose
    * metadata records min == max in EVERY segment — i.e. each segment
    * holds exactly one value of it (how key-partitioned ingest lands).
    * Reported as [[KeyGroupedPartitioning]] so an equi-join of two such
    * tables on that column becomes a storage-partitioned join with NO
    * Exchange on either side. Detection is metadata-only and cached per
    * segment path.
    */
  private lazy val partitionInfo: Option[(String, Array[Any])] = {
    val metas = segmentPaths.map(PinotScan.segmentMeta)
    if (metas.isEmpty || metas.exists(_ == null)) None
    else {
      val candidates = metas.head.columns.values.toSeq.filter { cm =>
        cm.hasDictionary && cm.isSingleValue &&
          projected.fieldNames.contains(cm.name) &&
          (cm.dataType match {
            case PinotType.PInt | PinotType.PLong | PinotType.PString => true
            case _ => false
          })
      }
      candidates.view.flatMap { cm =>
        val perSeg = metas.map { m =>
          m.columns.get(cm.name).filter(c =>
            c.minValue.isDefined && c.minValue == c.maxValue)
            .flatMap(c => typedKey(cm.dataType, c.minValue.get))
        }
        if (perSeg.forall(_.isDefined))
          Some(cm.name -> perSeg.map(_.get).toArray)
        else None
      }.headOption
    }
  }

  private def typedKey(tpe: PinotType, v: String): Option[Any] = tpe match {
    case PinotType.PInt => v.toIntOption
    case PinotType.PLong => v.toLongOption
    case PinotType.PString => Some(UTF8String.fromString(v))
    case _ => None
  }

  override def outputPartitioning()
      : org.apache.spark.sql.connector.read.partitioning.Partitioning =
    if (fullLimit)
      new org.apache.spark.sql.connector.read.partitioning.UnknownPartitioning(1)
    else partitionInfo match {
      case Some((col, _)) =>
        new org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning(
          Array(org.apache.spark.sql.connector.expressions.Expressions.identity(col)),
          segmentPaths.length)
      case None =>
        new org.apache.spark.sql.connector.read.partitioning.UnknownPartitioning(
          segmentPaths.length)
    }

  /** Row counts come free from segment metadata (`segment.total.docs`) —
    * feeds Catalyst's CBO (e.g. auto-broadcast decisions) without
    * touching column data. Totals are cached per segment path (segments
    * are immutable), so repeated queries over a many-thousand-segment
    * table do not re-read metadata on the driver each time.
    *
    * Per-COLUMN statistics (min/max/distinct/null) also come from the
    * same cached metadata: distinctCount = max per-segment dictionary
    * cardinality (a sound lower bound), min/max folded across segments
    * in the column's own type, nullCount = 0 (Pinot columns are
    * non-nullable). With CBO enabled these flow into Catalyst
    * `ColumnStat` via `transformV2Stats` and sharpen join-size and
    * filter-selectivity estimates — all driver-side metadata, no IO.
    */
  override def estimateStatistics(): Statistics = new Statistics {
    private lazy val rows: Long = segmentPaths.map(PinotScan.segmentDocs).sum
    private lazy val width: Long = projected.fields.map(_.dataType match {
      case org.apache.spark.sql.types.StringType => 24L
      case dt => math.max(dt.defaultSize.toLong, 4L)
    }).sum.max(8L)
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(rows * width)
    override def numRows(): java.util.OptionalLong =
      java.util.OptionalLong.of(rows)
    override def columnStats(): java.util.Map[NamedReference,
        org.apache.spark.sql.connector.read.colstats.ColumnStatistics] = {
      val out = new java.util.HashMap[NamedReference,
        org.apache.spark.sql.connector.read.colstats.ColumnStatistics]()
      val metas = segmentPaths.map(PinotScan.segmentMeta)
      if (metas.nonEmpty && !metas.exists(_ == null)) {
        projected.fieldNames.foreach { name =>
          val cms = metas.flatMap(_.columns.get(name))
          if (cms.length == metas.length && cms.forall(_.isSingleValue)) {
            val tpe = cms.head.dataType
            val distinct = cms.map(_.cardinality.toLong).max
            def fold(pick: graft.pinot.ColumnMetadata => Option[String],
                wantMin: Boolean): Option[Object] = {
              val bounds = cms.map(pick)
              if (bounds.exists(_.isEmpty)) None
              else bounds.flatten.reduceOption { (a, b) =>
                PinotScan.statCompare(tpe, a, b) match {
                  case Some(c) => if ((c <= 0) == wantMin) a else b
                  case None => a
                }
              }.flatMap(s => PinotScan.typedStatValue(tpe, s))
            }
            val minV = fold(_.minValue, wantMin = true)
            val maxV = fold(_.maxValue, wantMin = false)
            // exact: segments without a null vector have zero nulls;
            // those with one record the bitmap cardinality in metadata
            val nulls = cms.map(_.nullCount.toLong).sum
            out.put(
              org.apache.spark.sql.connector.expressions.Expressions.column(name),
              new org.apache.spark.sql.connector.read.colstats.ColumnStatistics {
                override def distinctCount(): java.util.OptionalLong =
                  java.util.OptionalLong.of(distinct)
                override def nullCount(): java.util.OptionalLong =
                  java.util.OptionalLong.of(nulls)
                override def min(): java.util.Optional[Object] =
                  minV.fold(java.util.Optional.empty[Object]())(
                    java.util.Optional.of[Object])
                override def max(): java.util.Optional[Object] =
                  maxV.fold(java.util.Optional.empty[Object]())(
                    java.util.Optional.of[Object])
              })
          }
        }
      }
      out
    }
  }
  override def toBatch: Batch = this
  override def description(): String =
    s"PinotScan(segments=${segmentPaths.length}, " +
      s"columns=${projected.fieldNames.mkString(",")}, " +
      s"skipFilters=[${skipFilters.mkString(",")}], " +
      s"limit=${limit.getOrElse(-1)}, splitTarget=$splitTargetBytes" +
      (if (jsonEq.isEmpty) ""
       else ", jsonEq=[" + jsonEq.map {
         case PinotScan.JsonEqProbe(c, p, Seq(v)) => s"$c $p=$v"
         case PinotScan.JsonEqProbe(c, p, vs) =>
           s"$c $p in(${vs.mkString(",")})"
         case PinotScan.JsonExistsProbe(c, p) => s"$c $p exists"
         case PinotScan.JsonNullProbe(c, p) => s"$c $p isnull"
         case PinotScan.JsonRangeProbe(c, p, lo, loInc, hi, hiInc) =>
           val l = lo.fold("")(v => if (loInc) s">=$v" else s">$v")
           val h = hi.fold("")(v => if (hiInc) s"<=$v" else s"<$v")
           s"$c $p$l$h"
       }.mkString(",") + "]") +
      offset.fold("")(o => s", pushedOffset=$o") +
      scanTopN.fold("")(t =>
        s", pushedTopN=[${if (t.sorted) "sorted" else "value"} ${t.column}" +
          s" ${if (t.descending) "DESC" else "ASC"} limit=${t.limit}]") +
      ")"

  override def planInputPartitions(): Array[InputPartition] =
    if (fullLimit)
      Array(PinotChainPartition(segmentPaths))
    else partitionInfo match {
      case Some((_, keys)) =>
        // storage-partitioned join: the 1-segment == 1-key contract is
        // load-bearing (HasPartitionKey) — never split or group here
        segmentPaths.zip(keys).map { case (p, k) =>
          PinotKeyedPartition(p,
            new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
              Array(k))): InputPartition
        }.toArray
      case None =>
        PinotScan.planSplits(effectiveSegments, splitTargetBytes)
    }

  override def createReaderFactory(): PartitionReaderFactory =
    new PinotReaderFactory(projected.fieldNames, skipFilters, limit,
      PinotScan.expectedTypes(projected), scanTopN, offset, jsonEq)
}

/** Scan for a pushed-down global COUNT/MIN/MAX aggregation.
  *
  * `complete = true` (COUNT-only shapes): one partition emits the final
  * single row, computed from the driver's cached per-segment doc totals —
  * zero column I/O, no final aggregate in the plan.
  *
  * `complete = false`: one partition per segment; each task emits one
  * partial row — counts from segment metadata, MIN/MAX from the segment's
  * dictionary (cardinality entries; the forward index is never read).
  * Spark's final aggregate merges the per-segment rows.
  */
class PinotAggScan(segmentPaths: Seq[String], agg: Aggregation,
    complete: Boolean, fullSchema: StructType,
    starTree: Boolean = false, histogram: Boolean = false,
    histFinal: Boolean = false, distinctFinal: Boolean = false,
    splitTargetBytes: Long = PinotScan.DefaultSplitTargetBytes,
    topN: Option[(Array[TopNKey], Int)] = None)
    extends Scan with Batch {

  private val funcs: Array[AggregateFunc] = agg.aggregateExpressions()
  // group-by pushdown: key-pure columns, validated by the builder
  private val groupCols: Array[String] = agg.groupByExpressions().map(
    _.asInstanceOf[NamedReference].fieldNames()(0))

  // SUM partials carry Spark's sum result type (long for integral
  // columns, double for fractional) so the final merge is type-exact
  private def sumType(e: org.apache.spark.sql.connector.expressions.Expression) =
    colType(e) match {
      case org.apache.spark.sql.types.FloatType |
           org.apache.spark.sql.types.DoubleType =>
        org.apache.spark.sql.types.DoubleType
      case _ => LongType
    }

  // per the SupportsPushDownAggregates contract, group columns lead
  override def readSchema(): StructType = StructType(
    groupCols.map(c => StructField(c, fullSchema(c).dataType, nullable = false))
      ++ funcs.zipWithIndex.map {
    case (_: CountStar, i) => StructField(s"agg_$i", LongType, nullable = false)
    case (_: Count, i) => StructField(s"agg_$i", LongType, nullable = false)
    case (m: Min, i) => StructField(s"agg_$i", colType(m.column()), nullable = true)
    case (m: Max, i) => StructField(s"agg_$i", colType(m.column()), nullable = true)
    case (s: Sum, i) => StructField(s"agg_$i", sumType(s.column()), nullable = true)
    case (_: Avg, i) => // complete pushdown only (histFinal)
      StructField(s"agg_$i", org.apache.spark.sql.types.DoubleType, nullable = true)
    case (f, _) => throw new IllegalStateException(s"unexpected pushed agg $f")
  })

  private def colName(e: org.apache.spark.sql.connector.expressions.Expression): String =
    e.asInstanceOf[NamedReference].fieldNames()(0)

  private def colType(e: org.apache.spark.sql.connector.expressions.Expression) =
    fullSchema(colName(e)).dataType

  override def toBatch: Batch = this

  // "complete" in the description means ANY path Spark planned with no
  // final aggregate above the scan (metadata COUNT, histFinal histogram,
  // single-segment single-col DISTINCT) — truthful for plan audits
  override def description(): String =
    s"PinotAggScan(complete=${complete || histFinal || distinctFinal}, " +
      s"metaComplete=$complete, starTree=$starTree, " +
      s"histogram=$histogram, histFinal=$histFinal, " +
      s"funcs=[${funcs.mkString(", ")}], segments=${segmentPaths.length}" +
      topN.fold("")(t => s", pushedTopN=[limit=${t._2}, keys=" +
        t._1.map(k => s"${k.outIdx}${if (k.descending) " DESC" else ""}")
          .mkString(",") + "]") + ")"

  /** Histogram PARTIAL tasks read forward indexes, so they slice into
    * doc ranges like the plain scan (each slice emits its own partials;
    * Spark's final aggregate merges) — a huge lone-segment GROUP BY
    * saturates the cluster instead of decoding on one core. The
    * complete paths (metadata COUNT, histFinal, distinctFinal) plan no
    * final aggregate, so normally they must stay one task —
    * EXCEPT when the single group column is row-unique in the segment
    * (writer-recorded exact cardinality == totalDocs, the GROUP BY
    * doc-id / dedup-key shape): then no group can span two doc-range
    * slices, every slice's histogram rows are already final (the emit
    * loop skips zero-count slots), and the union of slices IS the
    * answer — so the merge-free plan parallelizes too. Metadata/
    * dictionary/star-tree paths never read the forward index — nothing
    * to slice.
    */
  override def planInputPartitions(): Array[InputPartition] =
    if (complete) Array(PinotAggPartition(null))
    else if (histogram && !histFinal && splitTargetBytes > 0)
      PinotScan.planAggSlices(segmentPaths)
    else if (histogram && histFinal && splitTargetBytes > 0 &&
        uniqueKeyGroups &&
        // With a pushed top-N, >1 slice makes Spark's
        // TakeOrderedAndProject SHUFFLE the survivors into one partition
        // — a whole extra stage with on-disk shuffle files. Below the
        // measured extra-stage crossover (completeAggMaxDocs, the same
        // constant that prices partial-vs-complete) one task decoding
        // the lone segment is strictly faster; past it, parallel slice
        // decode amortizes the stage (each slice emits ≤ k rows).
        (topN.isEmpty || segmentPaths.exists(p =>
          PinotScan.segmentDocs(p) > PinotScan.CompleteAggMaxDocs)))
      PinotScan.planAggSlices(segmentPaths)
    else segmentPaths.map(p => PinotAggPartition(p): InputPartition).toArray

  /** The lone group column's values are pairwise-distinct in every
    * segment, so doc-range slices partition the GROUPS as well as the
    * docs. (Multi-column keys are excluded: per-column cardinalities
    * can't establish composite uniqueness without a scan. Float/Double
    * keys are excluded too: the writer's distinct count uses boxed
    * equality where -0.0 != 0.0, while Spark normalizes both zeros into
    * one group — a segment holding both would pass the cardinality gate
    * yet need a merge for that group.)
    */
  private def uniqueKeyGroups: Boolean =
    groupCols.length == 1 && segmentPaths.forall { p =>
      val m = PinotScan.segmentMeta(p)
      m != null && m.totalDocs > 0 &&
        m.columns.get(groupCols.head).exists { cm =>
          cm.cardinality == m.totalDocs &&
            cm.dataType != graft.pinot.PinotType.PFloat &&
            cm.dataType != graft.pinot.PinotType.PDouble
        }
    }

  override def createReaderFactory(): PartitionReaderFactory = {
    if (starTree) {
      val specs = funcs.map {
        case _: CountStar => StarAggSpec("COUNT", "")
        case c: Count => StarAggSpec("COUNT", "") // non-nullable ⇒ = COUNT(*)
        case s: Sum => StarAggSpec("SUM", colName(s.column()))
        case m: Min => StarAggSpec("MIN", colName(m.column()))
        case m: Max => StarAggSpec("MAX", colName(m.column()))
        case f => throw new IllegalStateException(s"unexpected star agg $f")
      }
      return new PinotStarTreeReaderFactory(groupCols, specs)
    }
    if (histogram) {
      val specs: Array[HistAggSpec] = funcs.map {
        case _: CountStar => HistAggSpec.HCount
        case _: Count => HistAggSpec.HCount // builder-validated non-null
        case s: Sum => HistAggSpec.HSum(colName(s.column()))
        case m: Min => HistAggSpec.HMin(colName(m.column()))
        case m: Max => HistAggSpec.HMax(colName(m.column()))
        case a: Avg => HistAggSpec.HAvg(colName(a.column())) // histFinal only
        case f => throw new IllegalStateException(s"unexpected hist agg $f")
      }
      return new PinotHistAggReaderFactory(groupCols, specs, topN,
        ansi = org.apache.spark.sql.internal.SQLConf.get.ansiEnabled)
    }
    // complete mode: the whole answer resolves on the DRIVER from cached
    // metadata — COUNT(*) = Σ docs, COUNT(col) = Σ (docs − nullCount),
    // SUM/AVG from writer-recorded exact sums (builder-gated to
    // non-nullable integral columns whose exact totals FIT IN LONG, so
    // `.longValue` below never wraps — overflowing totals refused the
    // push and keep Spark's own ANSI/legacy overflow semantics),
    // MIN/MAX from the per-segment bounds.
    if (complete) {
      val metas = segmentPaths.map(PinotScan.segmentMeta)
      val live = metas.filter(m => m != null && m.totalDocs > 0)
      val docsTotal = metas.map(m => if (m == null) 0L else m.totalDocs.toLong).sum
      def sumBig(c: String): BigInt =
        live.foldLeft(BigInt(0))((acc, m) => acc + m.columns(c).sumValue.get)
      def bound(c: String, isMin: Boolean): Any =
        if (live.isEmpty) null
        else {
          val raw = live.map { m =>
            val cm = m.columns(c)
            if (isMin) cm.minValue.get else cm.maxValue.get
          }
          // typed reduce: float/double fold with java compare (NaN
          // largest, matching Spark); timestamps are stored millis and
          // surface as Catalyst micros
          fullSchema(c).dataType match {
            case org.apache.spark.sql.types.IntegerType =>
              val vs = raw.map(BigInt(_))
              (if (isMin) vs.min else vs.max).toInt
            case org.apache.spark.sql.types.FloatType =>
              raw.map(_.toFloat).reduce((a, b) =>
                if ((java.lang.Float.compare(a, b) <= 0) == isMin) a else b)
            case org.apache.spark.sql.types.DoubleType =>
              raw.map(_.toDouble).reduce((a, b) =>
                if ((java.lang.Double.compare(a, b) <= 0) == isMin) a else b)
            case org.apache.spark.sql.types.TimestampType =>
              val vs = raw.map(_.toLong)
              Math.multiplyExact(if (isMin) vs.min else vs.max, 1000L)
            case _ =>
              val vs = raw.map(BigInt(_))
              (if (isMin) vs.min else vs.max).toLong
          }
        }
      val row: Array[Any] = funcs.map {
        case _: CountStar => docsTotal: Any
        case c: Count =>
          val col = colName(c.column())
          metas.map(m => if (m == null) 0L
            else (m.totalDocs - m.columns.get(col).fold(0)(_.nullCount)).toLong)
            .sum: Any
        case s: Sum =>
          if (live.isEmpty) null else sumBig(colName(s.column())).longValue: Any
        case a: Avg =>
          if (live.isEmpty) null
          else sumBig(colName(a.column())).toDouble / docsTotal: Any
        case m: Min => bound(colName(m.column()), isMin = true)
        case m: Max => bound(colName(m.column()), isMin = false)
        case f => throw new IllegalStateException(s"unexpected complete agg $f")
      }
      return new PinotAggReaderFactory(Array.empty, complete = true, row,
        groupCols)
    }
    val specs: Array[AggSpec] = funcs.map {
      case _: CountStar => AggSpec("", isCount = true, isMin = false)
      case c: Count => AggSpec(colName(c.column()), isCount = true, isMin = false)
      case m: Min => AggSpec(colName(m.column()), isCount = false, isMin = true)
      case m: Max => AggSpec(colName(m.column()), isCount = false, isMin = false)
      case s: Sum => AggSpec(colName(s.column()), isCount = false,
        isMin = false, isSum = true)
      case f => throw new IllegalStateException(s"unexpected partial agg $f")
    }
    new PinotAggReaderFactory(specs, complete = false, Array.empty, groupCols)
  }
}

case class PinotAggPartition(segmentPath: String) extends InputPartition

/** One pushed sort key over the aggregate scan's output layout:
  * `outIdx` indexes the (group columns ++ aggregates) row. Nullability
  * is impossible on the accepting path, so only direction is carried.
  */
case class TopNKey(outIdx: Int, descending: Boolean)

/** A pushed single-key ORDER BY + LIMIT over a plain scan. `sorted` —
  * the column is stored sorted in every segment, so the partition's
  * top-k is a doc-range slice (no sort-column decode); otherwise the
  * reader decodes the sort column, heap-selects the k best docs, and
  * decodes the remaining columns only for those.
  */
case class ScanTopN(column: String, descending: Boolean, limit: Int,
    sorted: Boolean)

/** Doc range `[startDoc, endDoc)` of one segment for a sliced histogram
  * partial task — window-aligned start, exclusive end.
  */
case class PinotAggSlicePartition(segmentPath: String, startDoc: Int,
    endDoc: Int) extends InputPartition

case class AggSpec(column: String, isCount: Boolean, isMin: Boolean,
    isSum: Boolean = false)

class PinotAggReaderFactory(specs: Array[AggSpec], complete: Boolean,
    completeVals: Array[Any], groupCols: Array[String] = Array.empty)
    extends PartitionReaderFactory {

  override def createReader(partition: InputPartition)
      : PartitionReader[org.apache.spark.sql.catalyst.InternalRow] = {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow

    val rows: Iterator[InternalRow] = if (complete) {
      Iterator.single(new GenericInternalRow(completeVals.clone()))
    } else {
      val path = partition.asInstanceOf[PinotAggPartition].segmentPath
      val reader = SegmentReader.open(path)
      val docs = reader.metadata.totalDocs
      // every branch below materializes eagerly (dictionary arrays,
      // metadata scalars), so the channel can be released before the
      // iterator is handed to Spark — no fd outlives createReader
      try if (groupCols.nonEmpty && specs.isEmpty) {
        // DISTINCT pushdown: the segment's dictionary IS its distinct
        // value set (Pinot builds dictionaries from the segment's own
        // values) — emit one row per entry, never touch the forward
        // index; Spark's final aggregate dedups across segments
        if (docs == 0) Iterator.empty
        else dictDistinctValues(reader, groupCols(0)).iterator
          .map(v => new GenericInternalRow(Array(v)): InternalRow)
      } else if (docs == 0 && groupCols.nonEmpty) {
        Iterator.empty // no key → no group row
      } else {
        // key-pure group columns: the segment's single key value comes
        // straight from metadata (min == max, builder-validated)
        val keys: Array[Any] = groupCols.map { c =>
          val cm = reader.metadata.column(c)
          val v = cm.minValue.get
          cm.dataType match {
            case graft.pinot.PinotType.PInt => v.toInt
            case graft.pinot.PinotType.PLong => v.toLong
            case _ => UTF8String.fromString(v)
          }
        }
        val values: Array[Any] = specs.map { s =>
          if (s.isCount) {
            // COUNT(col) on a nullable column: docs − nullCount (exact)
            if (s.column.isEmpty) docs.toLong
            else (docs - reader.metadata.columns
              .get(s.column).fold(0)(_.nullCount)).toLong
          }
          else if (docs == 0) null
          else if (s.isSum)
            // writer-recorded exact sum, builder-gated to integral
            // columns whose per-segment sums fit in long — Spark's
            // final merge owns any cross-segment overflow semantics
            reader.metadata.column(s.column).sumValue.getOrElse(
              throw new graft.pinot.PinotFormatException(
                s"SUM pushdown without recorded sum for ${s.column}"))
              .longValue
          else dictMinMax(reader, s.column, s.isMin)
        }
        Iterator.single(new GenericInternalRow(keys ++ values))
      } finally reader.close()
    }

    new PartitionReader[InternalRow] {
      private var cur: InternalRow = null
      override def next(): Boolean = {
        if (rows.hasNext) { cur = rows.next(); true } else false
      }
      override def get(): InternalRow = cur
      override def close(): Unit = ()
    }
  }

  /** The dictionary entries as Catalyst values (builder guarantees: dict,
    * single-value, no null vector, supported type). TIMESTAMP dictionaries
    * store epoch millis → Catalyst micros; BOOLEAN stores int 0/1.
    */
  private def dictDistinctValues(reader: SegmentReader, col: String): Array[Any] = {
    val cm = reader.metadata.column(col)
    (reader.dictionary(col), cm.dataType) match {
      case (PinotDictionary.Ints(v), PinotType.PBoolean) =>
        v.map(i => (i != 0): Any)
      case (PinotDictionary.Ints(v), _) => v.map(x => x: Any)
      case (PinotDictionary.Longs(v), PinotType.PTimestamp) =>
        v.map(ms => Math.multiplyExact(ms, 1000L): Any)
      case (PinotDictionary.Longs(v), _) => v.map(x => x: Any)
      case (PinotDictionary.Floats(v), _) => v.map(x => x: Any)
      case (PinotDictionary.Doubles(v), _) => v.map(x => x: Any)
      case (PinotDictionary.Strings(v), _) =>
        v.map(s => UTF8String.fromString(s): Any)
      case (other, _) => throw new graft.pinot.PinotFormatException(
        s"DISTINCT pushdown on unsupported dictionary $other")
    }
  }

  /** MIN/MAX over the segment's dictionary values (all dictionary entries
    * are present in the column — Pinot builds dictionaries from the
    * segment's own values). Falls back to a full column decode only if a
    * segment unexpectedly lacks the dictionary. Float/double use
    * `j.l.{Float,Double}.compare`, matching Spark's NaN-is-largest order.
    */
  private def dictMinMax(reader: SegmentReader, col: String, isMin: Boolean): Any = {
    val cm = reader.metadata.column(col)
    def reduceI(a: Array[Int]) = if (isMin) a.min else a.max
    def reduceL(a: Array[Long]) = if (isMin) a.min else a.max
    def reduceF(a: Array[Float]) =
      a.reduce((x, y) => if ((java.lang.Float.compare(x, y) <= 0) == isMin) x else y)
    def reduceD(a: Array[Double]) =
      a.reduce((x, y) => if ((java.lang.Double.compare(x, y) <= 0) == isMin) x else y)
    if (cm.hasDictionary) reader.dictionary(col) match {
      case PinotDictionary.Ints(v) => reduceI(v)
      case PinotDictionary.Longs(v) => reduceL(v)
      case PinotDictionary.Floats(v) => reduceF(v)
      case PinotDictionary.Doubles(v) => reduceD(v)
      case other => throw new graft.pinot.PinotFormatException(
        s"MIN/MAX pushdown on unsupported dictionary $other")
    } else {
      // RAW numeric: writer-recorded metadata bounds answer exactly
      // (String.valueOf → parse is a lossless roundtrip for numerics);
      // a full decode is only the defensive fallback
      val bound = if (isMin) cm.minValue else cm.maxValue
      (bound, cm.dataType) match {
        case (Some(b), PinotType.PInt) => b.toInt
        case (Some(b), PinotType.PLong) => b.toLong
        case (Some(b), PinotType.PFloat) => b.toFloat
        case (Some(b), PinotType.PDouble) => b.toDouble
        case (None, PinotType.PInt) => reduceI(reader.readIntColumn(col))
        case (None, PinotType.PLong) => reduceL(reader.readLongColumn(col))
        case (None, PinotType.PFloat) => reduceF(reader.readFloatColumn(col))
        case (None, PinotType.PDouble) => reduceD(reader.readDoubleColumn(col))
        case (_, other) => throw new graft.pinot.PinotFormatException(
          s"MIN/MAX pushdown on RAW ${other.name} column $col")
      }
    }
  }
}

/** One pushed aggregate resolved against star-tree metrics: func ∈
  * COUNT/SUM/MIN/MAX, column empty for COUNT.
  */
case class StarAggSpec(func: String, column: String) {
  def metricKey: String = s"${func}__${if (column.isEmpty) "*" else column}"
}

/** Per-segment star-tree rollup: reads the pre-aggregated records, folds
  * them to the requested group columns (dims not grouped roll up — the
  * star-node semantics, executed in the task instead of materialized on
  * disk), translates dict ids through the dims' dictionaries, and emits
  * one partial row per surviving combo. Spark's final aggregate merges
  * across segments. The forward index is NEVER read.
  */
class PinotStarTreeReaderFactory(groupCols: Array[String],
    specs: Array[StarAggSpec]) extends PartitionReaderFactory {

  import graft.pinot.StarTree

  override def createReader(partition: InputPartition)
      : PartitionReader[org.apache.spark.sql.catalyst.InternalRow] = {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow

    val path = partition.asInstanceOf[PinotAggPartition].segmentPath
    val reader = SegmentReader.open(path)
    // the star-tree sections and dim dictionaries are fully materialized
    // below (keyLookup closes over decoded arrays), so the channel is
    // released before the lazy row iterator escapes
    val rows: Iterator[InternalRow] =
      try if (reader.metadata.totalDocs == 0) Iterator.empty
      else {
        val tree = reader.starTree.getOrElse(
          throw new graft.pinot.PinotFormatException(
            s"segment $path lost its star-tree after planning"))
        val colType: String => PinotType =
          c => reader.metadata.column(c).dataType
        val treeDbl = tree.metrics.map(StarTree.isDouble(_, colType))
        val dimIdx = groupCols.map { c =>
          val i = tree.dims.indexOf(c)
          if (i < 0) throw new graft.pinot.PinotFormatException(
            s"star-tree of $path lacks dim $c")
          i
        }
        val metricIdx = specs.map { s =>
          val i = tree.metrics.indexWhere(_.key == s.metricKey)
          if (i < 0) throw new graft.pinot.PinotFormatException(
            s"star-tree of $path lacks metric ${s.metricKey}")
          i
        }
        // roll leaf records up to the requested dims
        val acc = scala.collection.mutable.LinkedHashMap
          .empty[scala.collection.immutable.ArraySeq[Int], Array[Long]]
        var r = 0
        while (r < tree.dimIds.length) {
          val key = scala.collection.immutable.ArraySeq.unsafeWrapArray(
            dimIdx.map(tree.dimIds(r)(_)))
          acc.get(key) match {
            case None => acc(key) = metricIdx.map(tree.values(r)(_))
            case Some(cur) =>
              var i = 0
              while (i < cur.length) {
                val mi = metricIdx(i)
                cur(i) = StarTree.mergeBits(tree.metrics(mi), treeDbl(mi),
                  cur(i), tree.values(r)(mi))
                i += 1
              }
          }
          r += 1
        }
        // dict id → Catalyst value, per group column
        val keyLookup: Array[Int => Any] = groupCols.map { c =>
          val cm = reader.metadata.column(c)
          (reader.dictionary(c), cm.dataType) match {
            case (PinotDictionary.Ints(v), PinotType.PBoolean) =>
              (id: Int) => (v(id) != 0): Any
            case (PinotDictionary.Ints(v), _) => (id: Int) => v(id): Any
            case (PinotDictionary.Longs(v), PinotType.PTimestamp) =>
              (id: Int) => Math.multiplyExact(v(id), 1000L): Any
            case (PinotDictionary.Longs(v), _) => (id: Int) => v(id): Any
            case (PinotDictionary.Strings(v), _) =>
              (id: Int) => UTF8String.fromString(v(id)): Any
            case (other, _) => throw new graft.pinot.PinotFormatException(
              s"star-tree dim $c: unsupported dictionary $other")
          }
        }
        // metric bits → Catalyst value in the readSchema's field type
        val valLookup: Array[Long => Any] = specs.zip(metricIdx).map {
          case (s, mi) =>
            val dbl = treeDbl(mi)
            s.func match {
              case "COUNT" => (bits: Long) => bits: Any
              case "SUM" =>
                if (dbl) (bits: Long) => java.lang.Double.longBitsToDouble(bits): Any
                else (bits: Long) => bits: Any
              case _ => // MIN/MAX surface in the column's own type
                colType(s.column) match {
                  case PinotType.PInt => (bits: Long) => bits.toInt: Any
                  case PinotType.PLong => (bits: Long) => bits: Any
                  case PinotType.PFloat =>
                    (bits: Long) => java.lang.Double.longBitsToDouble(bits).toFloat: Any
                  case PinotType.PDouble =>
                    (bits: Long) => java.lang.Double.longBitsToDouble(bits): Any
                  case other => throw new graft.pinot.PinotFormatException(
                    s"star-tree MIN/MAX over ${other.name} column ${s.column}")
                }
            }
        }
        acc.iterator.map { case (key, vals) =>
          val out = new Array[Any](key.length + vals.length)
          var i = 0
          while (i < key.length) { out(i) = keyLookup(i)(key(i)); i += 1 }
          var j = 0
          while (j < vals.length) { out(key.length + j) = valLookup(j)(vals(j)); j += 1 }
          new GenericInternalRow(out): InternalRow
        }
      } finally reader.close()

    new PartitionReader[InternalRow] {
      private var cur: InternalRow = null
      override def next(): Boolean =
        if (rows.hasNext) { cur = rows.next(); true } else false
      override def get(): InternalRow = cur
      override def close(): Unit = ()
    }
  }
}

object PinotScan {

  /** Compare a metadata bound (string form) against a filter value.
    * Some(sign) when comparable; None → cannot prune on this filter.
    * Primitive == short-circuits first: Float/Double.compare orders
    * -0.0 < 0.0, but Spark comparison semantics treat them as equal —
    * a segment whose recorded max is "-0.0" must not be pruned for
    * `x >= 0.0`.
    */
  private[pinot] def cmpBound(bound: String, value: Any): Option[Int] =
    value match {
      case x: Int => bound.toIntOption.map(Integer.compare(_, x))
      case x: Long => bound.toLongOption.map(java.lang.Long.compare(_, x))
      case x: Float =>
        bound.toFloatOption.map(b =>
          if (b == x) 0 else java.lang.Float.compare(b, x))
      case x: Double =>
        bound.toDoubleOption.map(b =>
          if (b == x) 0 else java.lang.Double.compare(b, x))
      case x: String => Some(bound.compareTo(x))
      case x: UTF8String => Some(bound.compareTo(x.toString))
      // TIMESTAMP bounds are epoch millis; compare in MICROS so a
      // sub-millisecond filter value never rounds across the boundary
      case _ =>
        timestampMicros(value).flatMap(us =>
          bound.toLongOption.map(ms =>
            java.lang.Long.compare(Math.multiplyExact(ms, 1000L), us)))
    }

  /** Epoch micros of a pushed timestamp filter value (both the legacy
    * java.sql.Timestamp and the Java-8 Instant API forms). */
  /** Spark field types → (Pinot storage type, isSingleValue) for
    * schema-evolution defaults (the reverse of PinotType.sparkType).
    * Arrays map to the element's storage type with isSingleValue=false
    * (default = empty array); DecimalType to BIG_DECIMAL (default = 0).
    */
  private[pinot] def expectedTypes(schema: org.apache.spark.sql.types.StructType)
      : Map[String, (PinotType, Boolean)] = {
    def scalar(dt: org.apache.spark.sql.types.DataType): Option[PinotType] =
      dt match {
        case org.apache.spark.sql.types.IntegerType => Some(PinotType.PInt)
        case org.apache.spark.sql.types.LongType => Some(PinotType.PLong)
        case org.apache.spark.sql.types.FloatType => Some(PinotType.PFloat)
        case org.apache.spark.sql.types.DoubleType => Some(PinotType.PDouble)
        case org.apache.spark.sql.types.StringType => Some(PinotType.PString)
        case org.apache.spark.sql.types.BooleanType => Some(PinotType.PBoolean)
        case org.apache.spark.sql.types.TimestampType => Some(PinotType.PTimestamp)
        case org.apache.spark.sql.types.BinaryType => Some(PinotType.PBytes)
        case _: org.apache.spark.sql.types.DecimalType => Some(PinotType.PBigDecimal)
        case _ => None
      }
    schema.fields.flatMap { f =>
      f.dataType match {
        case org.apache.spark.sql.types.ArrayType(et, _) =>
          scalar(et).map(t => f.name -> (t, false))
        case dt => scalar(dt).map(t => f.name -> (t, true))
      }
    }.toMap
  }

  private[pinot] def timestampMicros(v: Any): Option[Long] = v match {
    case t: java.sql.Timestamp =>
      Some(Math.addExact(Math.multiplyExact(t.getTime, 1000L),
        (t.getNanos / 1000L) % 1000L))
    case i: java.time.Instant =>
      Some(Math.addExact(Math.multiplyExact(i.getEpochSecond, 1000000L),
        i.getNano / 1000L))
    case _ => None
  }

  /** Catalyst-typed value for a metadata bound string — what CBO column
    * statistics carry (boxed primitives / UTF8String; timestamps to
    * epoch micros). None when unparsable or the type has no stat form.
    */
  private[pinot] def typedStatValue(tpe: graft.pinot.PinotType,
      s: String): Option[Object] = tpe match {
    case graft.pinot.PinotType.PInt => s.toIntOption.map(Int.box)
    case graft.pinot.PinotType.PLong => s.toLongOption.map(Long.box)
    case graft.pinot.PinotType.PFloat => s.toFloatOption.map(Float.box)
    case graft.pinot.PinotType.PDouble => s.toDoubleOption.map(Double.box)
    case graft.pinot.PinotType.PString => Some(UTF8String.fromString(s))
    case graft.pinot.PinotType.PTimestamp =>
      s.toLongOption.map(ms => Long.box(Math.multiplyExact(ms, 1000L)))
    case _ => None
  }

  /** Compare two metadata bound strings in the column's own type. */
  private[pinot] def statCompare(tpe: graft.pinot.PinotType,
      a: String, b: String): Option[Int] = tpe match {
    case graft.pinot.PinotType.PString => Some(a.compareTo(b))
    case graft.pinot.PinotType.PInt | graft.pinot.PinotType.PLong |
         graft.pinot.PinotType.PTimestamp =>
      for (x <- a.toLongOption; y <- b.toLongOption)
        yield java.lang.Long.compare(x, y)
    case graft.pinot.PinotType.PFloat | graft.pinot.PinotType.PDouble =>
      for (x <- a.toDoubleOption; y <- b.toDoubleOption)
        yield (if (x == y) 0 else java.lang.Double.compare(x, y))
    case _ => None
  }

  /** Smallest string strictly greater than every string with prefix `p`
    * (last non-maximal char incremented, suffix dropped); None when all
    * chars are maximal (no finite upper bound).
    */
  private[pinot] def prefixNext(p: String): Option[String] = {
    val cs = p.toCharArray
    var i = cs.length - 1
    while (i >= 0) {
      if (cs(i) < Char.MaxValue) {
        cs(i) = (cs(i) + 1).toChar
        return Some(new String(cs, 0, i + 1))
      }
      i -= 1
    }
    None
  }

  /** Driver-side may-match from cached metadata min/max ONLY — used by
    * runtime (DPP) filtering, where opening segment dictionaries on the
    * driver for thousands of segments would be a metadata stampede.
    * Sound: unknown columns/bounds/types never prune.
    */
  private[pinot] def metaMayMatch(meta: graft.pinot.SegmentMetadata,
      f: Filter): Boolean = f match {
    case EqualTo(attr, v) => withinMinMax(meta, attr, v)
    case In(attr, values) => values.exists(v => withinMinMax(meta, attr, v))
    case _ => true
  }

  private def withinMinMax(meta: graft.pinot.SegmentMetadata, attr: String,
      v: Any): Boolean =
    meta.columns.get(attr) match {
      case Some(cm) if cm.isSingleValue =>
        val lo = cm.minValue.flatMap(cmpBound(_, v)).forall(_ <= 0)
        val hi = cm.maxValue.flatMap(cmpBound(_, v)).forall(_ >= 0)
        lo && hi
      case _ => true
    }

  def segmentDocs(path: String): Long = {
    val m = segmentMeta(path)
    if (m == null) 0L else m.totalDocs.toLong
  }

  /** Doc count that REFUSES an unreadable segment instead of reporting
    * 0. The execution-side pushdowns (offset skips, sorted/value top-N
    * ranges) size their doc windows from this — treating a transient
    * metadata failure as an empty segment would silently shift or drop
    * pushed rows, where the pre-pushdown behavior was a loud open
    * failure. Planning-time ESTIMATES keep the lenient 0.
    */
  def segmentDocsStrict(path: String): Long = {
    val m = segmentMeta(path)
    if (m == null) throw new graft.pinot.PinotFormatException(
      s"unreadable segment metadata for $path (doc count required by a " +
        "pushed offset/top-N)")
    m.totalDocs.toLong
  }

  // Parsed metadata.properties per segment path (immutable → cacheable;
  // new segments arrive under new paths). LRU-BOUNDED: a long-lived
  // session planning over many ephemeral table dirs must not grow the
  // map without bound — eviction only costs a cheap re-parse.
  private val metaCache = new LruCache[String, graft.pinot.SegmentMetadata](65536)
  private val MetaMiss: graft.pinot.SegmentMetadata = null

  /** Parsed metadata.properties per segment path (immutable → cacheable);
    * null when unreadable.
    */
  def segmentMeta(path: String): graft.pinot.SegmentMetadata =
    segmentMetaVia(path, null)

  /** Same cache, caller-supplied IO: remote opens prefetch through the
    * table's own IO; custom (test) IOs never route through `forPath`.
    */
  def segmentMetaVia(path: String, io: graft.pinot.SegmentIO): graft.pinot.SegmentMetadata =
    metaCache.getOrCompute(path, p => {
      try metaFetch(p,
        if (io == null) graft.pinot.SegmentIO.forPath(p) else io)
      catch { case _: Throwable => MetaMiss }
    })

  /** One GET, no existence probe: read `<dir>/metadata.properties`
    * directly (discovery hands the meta dir itself), falling back to the
    * `v3/` spelling only when that read fails — on object stores the
    * old exists()+read pair was two round trips per segment.
    */
  private def metaFetch(p: String,
      io: graft.pinot.SegmentIO): graft.pinot.SegmentMetadata = {
    def read(f: String) = graft.pinot.SegmentMetadata.parse(new String(
      io.readFully(f), java.nio.charset.StandardCharsets.UTF_8))
    try read(io.resolve(p, "metadata.properties"))
    catch { case _: Throwable =>
      read(io.resolve(io.resolve(p, "v3"), "metadata.properties"))
    }
  }

  /** Driver-side BULK metadata fetch for a cold table open: all missing
    * segments' `metadata.properties` load CONCURRENTLY (bounded pool)
    * into the plan-time cache, so schema inference and min/max pruning
    * afterwards hit memory. Cold-opening a 10k-segment object-store
    * table costs one listing + 10k PARALLEL GETs (~10k/32 round-trip
    * latencies of wall time) instead of ~20-30k sequential ones.
    * Fetches run OUTSIDE the cache lock (LruCache serializes computes);
    * a racing duplicate fetch is harmless (immutable value, last wins).
    */
  /** Evict a table's segment entries — the table-open path calls this on
    * a catalog-cache fingerprint MISS, where cached per-segment metadata
    * may be stale for an IN-PLACE overwrite (same path, new content).
    */
  def invalidateMetas(paths: Seq[String]): Unit = paths.foreach(metaCache.remove)

  /** Seed the plan-time cache from an already-validated source (the
    * table manifest): later segmentMeta/prefetch calls hit memory.
    */
  def cacheMeta(path: String, m: graft.pinot.SegmentMetadata): Unit =
    metaCache.put(path, m)

  def prefetchMetas(paths: Seq[String], io: graft.pinot.SegmentIO): Unit = {
    // eviction is the CALLER's decision (PinotSegmentTable.open evicts
    // on a fingerprint miss BEFORE seeding from the manifest) — an
    // invalidation entry point here would race the manifest seeding
    val missing = paths.filter(p => metaCache.get(p).isEmpty)
    if (missing.isEmpty) return
    val par = math.min(32, missing.length)
    if (par <= 1 || (io eq graft.pinot.LocalSegmentIO)) {
      // local nio is latency-free; a pool would only add overhead
      missing.foreach(segmentMetaVia(_, io))
      return
    }
    missing.map { p =>
      p -> prefetchPool.submit(new Runnable {
        override def run(): Unit = {
          val m = try metaFetch(p, io) catch { case _: Throwable => MetaMiss }
          metaCache.put(p, m)
        }
      })
    }.foreach { case (p, f) =>
      // a wedged remote GET must not hang table open: degrade this
      // segment to MetaMiss (planning falls back to stat-based sizing)
      // and move on. A late completion overwrites the miss harmlessly.
      try f.get(prefetchTimeoutMs, java.util.concurrent.TimeUnit.MILLISECONDS)
      catch { case _: java.util.concurrent.TimeoutException =>
        f.cancel(true)
        if (metaCache.get(p).isEmpty) metaCache.put(p, MetaMiss)
      }
    }
  }

  /** Shared daemon pool for metadata prefetch — table opens are
    * driver-side and bursty; creating/tearing down 32 threads per cold
    * open (r9) wasted ~ms and risked unbounded thread churn under
    * concurrent opens.
    */
  private lazy val prefetchPool: java.util.concurrent.ExecutorService =
    java.util.concurrent.Executors.newFixedThreadPool(32,
      new java.util.concurrent.ThreadFactory {
        private val n = new java.util.concurrent.atomic.AtomicInteger()
        override def newThread(r: Runnable): Thread = {
          val t = new Thread(r, s"graft-meta-prefetch-${n.incrementAndGet()}")
          t.setDaemon(true); t
        }
      })

  /** Per-segment metadata fetch timeout during prefetch (ms). */
  private def prefetchTimeoutMs: Long =
    java.lang.Long.getLong("graft.pinot.metaFetchTimeoutMs", 30000L)

  /** One pushed `get_json_object(col, path)` probe; the index answers
    * each with an advisory candidate superset (residual authoritative).
    */
  sealed trait JsonProbe extends Serializable {
    def col: String
    def path: String
  }
  /** `= v` / `<=> v` / `IN (v1…vn)` — candidates may equal ANY of
    * `values` (never empty; the rule drops degenerate lists).
    */
  final case class JsonEqProbe(col: String, path: String,
      values: Seq[String]) extends JsonProbe
  /** `IS NOT NULL` — candidates where the path may yield any value. */
  final case class JsonExistsProbe(col: String, path: String)
      extends JsonProbe
  /** `> / >= / < / <=` against a string literal — candidates whose
    * rendered value may fall inside `(lo, hi)` with the given bound
    * inclusivities, in Spark's UTF8String (unsigned UTF-8 byte) order.
    */
  final case class JsonRangeProbe(col: String, path: String,
      lo: Option[String], loInc: Boolean,
      hi: Option[String], hiInc: Boolean) extends JsonProbe
  /** `IS NULL` — candidates are everything except the docs the index
    * PROVES non-null at the path (complemented scan-side over the
    * segment's doc range); always answerable, no refusal cases.
    */
  final case class JsonNullProbe(col: String, path: String)
      extends JsonProbe

  /** Read-option key carrying pushed `get_json_object` probes
    * (equality / IN-list / IS NOT NULL / string range) from the
    * [[graft.plans.JsonIndexRule]] optimizer rule into the scan (V1
    * source filters cannot express them). Value: comma-joined probes of
    * colon-joined url-base64 fields, tagged by kind:
    * `e:col:path:v1[:v2…]` equality/IN, `x:col:path` exists,
    * `z:col:path` is-null,
    * `r:col:path:loTag:lo:hiTag:hi` range (`loTag`/`hiTag` one of
    * `i` inclusive / `s` strict / `n` none; absent bound encodes "").
    */
  val JsonEqOptionKey = "graft.jsonEqFilters"

  def encodeJsonProbes(probes: Seq[JsonProbe]): String = {
    val enc = java.util.Base64.getUrlEncoder.withoutPadding
    def b64(s: String) =
      enc.encodeToString(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    def tag(b: Option[String], inc: Boolean) =
      if (b.isEmpty) "n" else if (inc) "i" else "s"
    probes.map {
      case JsonEqProbe(c, p, vs) =>
        (Seq("e", b64(c), b64(p)) ++ vs.map(b64)).mkString(":")
      case JsonExistsProbe(c, p) => s"x:${b64(c)}:${b64(p)}"
      case JsonNullProbe(c, p) => s"z:${b64(c)}:${b64(p)}"
      case JsonRangeProbe(c, p, lo, loInc, hi, hiInc) =>
        Seq("r", b64(c), b64(p), tag(lo, loInc), b64(lo.getOrElse("")),
          tag(hi, hiInc), b64(hi.getOrElse(""))).mkString(":")
    }.mkString(",")
  }

  def decodeJsonProbes(s: String): Seq[JsonProbe] =
    if (s == null || s.isEmpty) Nil
    else s.split(',').toSeq.flatMap { t =>
      def un(x: String) = new String(
        java.util.Base64.getUrlDecoder.decode(x),
        java.nio.charset.StandardCharsets.UTF_8)
      def bound(tag: String, v: String): Option[(Option[String], Boolean)] =
        tag match {
          case "n" => Some((None, false))
          case "i" => Some((Some(un(v)), true))
          case "s" => Some((Some(un(v)), false))
          case _ => None
        }
      try {
        // limit -1: keep trailing empty fields (b64 of "" is empty —
        // an absent range bound or an empty-string equality value)
        t.split(":", -1) match {
          case a if a.length > 3 && a(0) == "e" =>
            Some(JsonEqProbe(un(a(1)), un(a(2)), a.drop(3).toSeq.map(un)))
          case Array("x", c, p) => Some(JsonExistsProbe(un(c), un(p)))
          case Array("z", c, p) => Some(JsonNullProbe(un(c), un(p)))
          case Array("r", c, p, lt, lv, ht, hv) =>
            for ((lo, loInc) <- bound(lt, lv); (hi, hiInc) <- bound(ht, hv))
              yield JsonRangeProbe(un(c), un(p), lo, loInc, hi, hiInc)
          case _ => None
        }
      } catch { case _: IllegalArgumentException => None }
    }

  /** Default task sizing target (Spark's files.maxPartitionBytes). Set
    * the `splitTargetBytes` read option to 0 to force the legacy strict
    * 1-task == 1-segment planning.
    */
  val DefaultSplitTargetBytes: Long = 128L << 20

  /** Largest LIMIT a pushed top-N will honor: the per-task bounded heap
    * is O(limit); past this a full sort in Spark is the better plan.
    */
  val TopNPushCap: Int = 1 << 16

  /** Rows per decode window — split boundaries align to it. */
  private[pinot] val WindowRows = 8192

  /** Lone-segment doc count past which the COMPLETE histogram pushdown
    * (one task, no final aggregate) yields to partial mode + doc-range
    * slices (low-cardinality keys only — see loneTooBigToFinal).
    * Measured on the 97,889-row PinotBench segment: partial mode's
    * extra merge stage + shuffle costs MORE than the saved decode
    * (~2× slower), and the post-optimization decode rate (~0.5 µs/row)
    * puts the crossover against ~60-90 ms of extra-stage cost at
    * ~200-300k rows — 32 windows ≈ 262k. A `def` so tests can override
    * the sys prop per-case.
    */
  private[pinot] def CompleteAggMaxDocs: Int =
    Integer.getInteger("graft.pinot.completeAggMaxDocs", 32 * WindowRows)

  /** Minimum rows per sliced histogram-aggregate task. Aggregate tasks
    * emit only O(cardinality) partial rows however many docs they scan,
    * so slices can be finer than plain-scan splits (2 windows ≈ 16k
    * rows ≈ the point where decode cost clears task-launch overhead).
    */
  private[pinot] def AggSliceRows: Int =
    Integer.getInteger("graft.pinot.aggSliceRows", 2 * WindowRows)

  /** Doc-range slices for forward-index-reading aggregate (histogram)
    * partial tasks. Row-targeted only — on-disk bytes are irrelevant
    * because these tasks read just the group/metric columns and their
    * cost is decode CPU per row. ~3 task waves per core when the table
    * is large enough; the `AggSliceRows` floor keeps small segments to
    * one task each.
    */
  def planAggSlices(segs: Seq[String]): Array[InputPartition] = {
    val infos = segs.map(p => (p, segmentMeta(p)))
    val totalRows = infos.map { case (_, m) =>
      if (m == null) 0L else m.totalDocs.toLong }.sum
    val parallelism =
      try org.apache.spark.sql.SparkSession.active.sparkContext.defaultParallelism
      catch { case _: Throwable => 8 }
    val target = math.max(AggSliceRows.toLong,
      totalRows / math.max(1L, 3L * parallelism))
    val out = Array.newBuilder[InputPartition]
    infos.foreach { case (p, m) =>
      val docs = if (m == null) 0 else m.totalDocs
      val nSplits =
        if (docs <= WindowRows) 1
        else math.min((docs.toLong + target - 1) / target,
          (docs.toLong + WindowRows - 1) / WindowRows).toInt
      if (nSplits <= 1) out += PinotAggPartition(p)
      else {
        val rowsRaw = (docs.toLong + nSplits - 1) / nSplits
        val rows = ((rowsRaw + WindowRows - 1) / WindowRows) * WindowRows
        var s0 = 0L
        while (s0 < docs) {
          out += PinotAggSlicePartition(p, s0.toInt,
            math.min(docs.toLong, s0 + rows).toInt)
          s0 += rows
        }
      }
    }
    out.result()
  }

  private val sizeCache = new LruCache[String, java.lang.Long](65536)

  /** Total on-disk bytes of a segment dir (immutable → cacheable).
    * Discovery hands the LEAF dir (v3/ or a v1 segment root), whose
    * index files sit directly in it — one listing per segment, any IO.
    */
  def segmentBytes(path: String): Long =
    sizeCache.getOrCompute(path, p => {
      try {
        val io = graft.pinot.SegmentIO.forPath(p)
        io.listFiles(p).map(f =>
          try io.size(f) catch { case _: Throwable => 0L }).sum
      } catch { case _: Throwable => 0L }
    })

  /** Sub-segment task planning (SURVEY §4's 100 TB mapping: "per-segment
    * splits grouped into tasks"). Large segments split into doc-range
    * slices on window boundaries so one huge segment saturates the
    * cluster instead of running as ONE task; tiny segments group into
    * shared tasks so a million-segment table doesn't pay a million task
    * launches. The effective per-task size target adapts downward (to
    * ≥1 MB) when the table is small relative to the cluster, so a
    * single 16 MB segment still fans out across idle cores; it never
    * exceeds `targetBytes`. All sizing inputs are driver-cached
    * metadata — no column IO at planning time.
    */
  def planSplits(segs: Seq[String], targetBytes: Long): Array[InputPartition] = {
    if (targetBytes <= 0 || segs.isEmpty)
      return segs.map(p => PinotInputPartition(p): InputPartition).toArray
    val infos = segs.map(p => (p, segmentMeta(p), segmentBytes(p)))
    val totalBytes = infos.map(_._3).sum
    val totalRows = infos.map { case (_, m, _) =>
      if (m == null) 0L else m.totalDocs.toLong }.sum
    val parallelism =
      try org.apache.spark.sql.SparkSession.active.sparkContext.defaultParallelism
      catch { case _: Throwable => 8 }
    // ~3 task waves per core when data allows; floor 1 MB keeps tiny
    // tables from shattering into window-sized tasks
    val effTarget = math.max(1L << 20,
      math.min(targetBytes, totalBytes / math.max(1L, 3L * parallelism)))
    // decode cost scales with ROWS, not on-disk bytes (bit-packed dict
    // ids compress a 2M-row segment to ~2 MB) — a rows target keeps
    // CPU-bound scans parallel even when the bytes look tiny. Floor of
    // 16 windows (~131k rows ≈ a few ms of decode) keeps each task's
    // work well above launch overhead.
    val effRowTarget = math.max(16L * WindowRows,
      totalRows / math.max(1L, 3L * parallelism))
    val out = Array.newBuilder[InputPartition]
    val group = scala.collection.mutable.ArrayBuffer.empty[String]
    var groupBytes = 0L
    var groupRows = 0L
    def flush(): Unit = {
      if (group.length == 1) out += PinotInputPartition(group.head)
      else if (group.nonEmpty) out += PinotGroupPartition(group.toList)
      group.clear(); groupBytes = 0L; groupRows = 0L
    }
    infos.foreach { case (p, m, bytes) =>
      val docs = if (m == null) 0 else m.totalDocs
      val nSplits =
        if (m == null || docs <= WindowRows) 1
        else math.min(
          math.max((bytes + effTarget - 1) / effTarget,
            (docs + effRowTarget - 1) / effRowTarget),
          (docs.toLong + WindowRows - 1) / WindowRows).toInt
      if (nSplits > 1) {
        flush()
        // Long arithmetic throughout: docs near Int.MaxValue would wrap
        // the +nSplits-1 rounding (and s0+rows) in Int, making `rows`
        // non-positive and the loop spin or mis-slice.
        val rowsRaw = (docs.toLong + nSplits - 1) / nSplits
        val rows = ((rowsRaw + WindowRows - 1) / WindowRows) * WindowRows
        var s0 = 0L
        while (s0 < docs) {
          out += PinotSlicePartition(p, s0.toInt,
            math.min(docs.toLong, s0 + rows).toInt)
          s0 += rows
        }
      } else {
        if (group.nonEmpty &&
            (groupBytes + bytes > effTarget ||
             groupRows + docs > effRowTarget)) flush()
        group += p
        groupBytes += bytes
        groupRows += docs
      }
    }
    flush()
    out.result()
  }
}

/** Minimal synchronized LRU (access-order LinkedHashMap). Driver/executor
  * metadata caches sit on IO-dominated paths, so a lock beats unbounded
  * growth; values must tolerate recompute-after-evict.
  */
private[pinot] final class LruCache[K, V](max: Int) {
  private val m = new java.util.LinkedHashMap[K, V](64, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[K, V]): Boolean =
      size() > max
  }
  def getOrCompute(k: K, f: K => V): V = synchronized {
    if (m.containsKey(k)) m.get(k)
    else { val v = f(k); m.put(k, v); v }
  }
  def get(k: K): Option[V] = synchronized(Option(m.get(k)))
  def put(k: K, v: V): Unit = synchronized { m.put(k, v); () }
  def remove(k: K): Unit = synchronized { m.remove(k); () }
}

case class PinotInputPartition(segmentPath: String) extends InputPartition

/** A doc-range SLICE of one segment (sub-segment parallelism): several
  * tasks scan disjoint `[start, end)` windows of the same large segment
  * concurrently. Boundaries are multiples of the 8,192-row batch window,
  * and every decode path is position-addressable (fixed-bit ids, raw
  * chunks, MV offsets), so a slice reads only its own windows.
  */
case class PinotSlicePartition(segmentPath: String, start: Int, end: Int)
    extends InputPartition

/** Several TINY segments share one task (small-segment grouping): the
  * reader chains full per-segment readers, each still applying its own
  * pruning/index logic. At 100 TB a table with millions of small
  * segments must not pay one task launch per segment.
  */
case class PinotGroupPartition(segmentPaths: Seq[String]) extends InputPartition

/** Fully-pushed limit: ONE partition chaining segments until the limit
  * fills (Spark planned no Limit node above).
  */
case class PinotChainPartition(segmentPaths: Seq[String]) extends InputPartition

/** One segment holding exactly one partition-key value — feeds Spark's
  * storage-partitioned join (HasPartitionKey).
  */
case class PinotKeyedPartition(segmentPath: String,
    key: org.apache.spark.sql.catalyst.InternalRow)
    extends InputPartition with HasPartitionKey {
  override def partitionKey(): org.apache.spark.sql.catalyst.InternalRow = key
}

class PinotReaderFactory(columns: Array[String], skipFilters: Array[Filter],
    limit: Option[Int],
    expectedTypes: Map[String, (PinotType, Boolean)] = Map.empty,
    scanTopN: Option[ScanTopN] = None, offset: Option[Int] = None,
    jsonEq: Seq[PinotScan.JsonProbe] = Nil)
    extends PartitionReaderFactory {

  override def supportColumnarReads(partition: InputPartition): Boolean = true

  override def createReader(partition: InputPartition): PartitionReader[org.apache.spark.sql.catalyst.InternalRow] =
    throw new UnsupportedOperationException("columnar-only reader")

  /** A sorted-column top-N restricts a partition's doc range to its
    * first (ASC) or last (DESC) k docs — the rest can never reach the
    * top-k, so they are never decoded. Returns the slice `[lo, hi)`.
    */
  private def topSlice(totalLo: Int, totalHi: Int): (Int, Int) = {
    val t = scanTopN.get
    if (t.descending) (math.max(totalLo, totalHi - t.limit), totalHi)
    else (totalLo, math.min(totalHi, totalLo + t.limit))
  }

  /** The per-partition top-N reader for a doc range of one segment:
    * sorted mode = a slice; value mode = heap-select then decode-k.
    */
  private def topNReader(path: String, lo: Int, hi: Int)
      : PartitionReader[ColumnarBatch] = {
    val t = scanTopN.get
    if (t.sorted) {
      val (s, e) = topSlice(lo, hi)
      new PinotColumnarReader(path, columns, skipFilters, limit,
        expectedTypes, slice = Some((s, e)), jsonEq = jsonEq)
    } else
      new PinotValueTopNReader(path, columns, t, expectedTypes, lo, hi)
  }

  override def createColumnarReader(partition: InputPartition): PartitionReader[ColumnarBatch] = {
    val path = partition match {
      case PinotInputPartition(p) => p
      case PinotKeyedPartition(p, _) => p
      case PinotSlicePartition(p, s, e) =>
        return if (scanTopN.isDefined) topNReader(p, s, e)
        else new PinotColumnarReader(p, columns, skipFilters, limit,
          expectedTypes, slice = Some((s, e)), jsonEq = jsonEq)
      case PinotGroupPartition(paths) =>
        return new PinotSegmentChainReader(paths, columns, skipFilters,
          limit, expectedTypes, scanTopN, jsonEq)
      case PinotChainPartition(paths) =>
        // pushed rows are [offset, pushedLimit): the emission budget is
        // their difference (Spark pushed limit = user limit + offset)
        val skip = offset.getOrElse(0)
        val budget = limit.fold(Int.MaxValue)(l => math.max(0, l - skip))
        return new PinotChainedLimitReader(paths, columns, budget,
          expectedTypes, skip)
      case other => throw new IllegalArgumentException(s"unexpected $other")
    }
    scanTopN match {
      case Some(_) =>
        topNReader(path, 0, PinotScan.segmentDocsStrict(path).toInt)
      case None =>
        new PinotColumnarReader(path, columns, skipFilters, limit,
          expectedTypes, jsonEq = jsonEq)
    }
  }
}

/** Value-mode top-N over one segment's doc range `[lo, hi)`: pass 1
  * decodes ONLY the sort column (windowed, through the standard
  * columnar reader) and bounded-heap-selects the k best doc ids; pass 2
  * decodes the projected columns for just those docs, as slice readers
  * over each contiguous winner run. At 100 TB the non-sort columns of a
  * wide projection decode for k docs per task, not the whole segment.
  * Partial-push contract: any k docs carrying the best k sort values
  * are a correct partition answer (single key ⇒ the value multiset is
  * exact; Spark's TakeOrderedAndProject settles ties exactly as it
  * would unpushed).
  */
class PinotValueTopNReader(path: String, columns: Array[String],
    topN: ScanTopN, expectedTypes: Map[String, (PinotType, Boolean)],
    lo: Int, hi: Int)
    extends PartitionReader[ColumnarBatch] {

  import org.apache.spark.unsafe.types.UTF8String

  /** Per-type top-k selector over the probe batches. The hot loop is a
    * PRIMITIVE threshold check per row (the heap's current worst, cached
    * unboxed) — only genuine improvements touch the boxed heap, so a
    * 100M-row partition pays ~2 ns/row, not a boxing + virtual-compare
    * tax (measured 4× the whole unpushed query at 2M rows before this).
    */
  private sealed trait Selector {
    def consider(vec: org.apache.spark.sql.vectorized.ColumnVector,
        i: Int, doc: Int): Unit
    def docs: Array[Int]
  }

  /** Anything whose Spark ordering embeds into long: int/long/timestamp
    * directly, boolean as 0/1, float/double via the IEEE total-order
    * bit trick (sign-flip mapping; NaN maps above +Inf — exactly
    * java.lang.{Float,Double}.compare, which is Spark's order).
    */
  private abstract class LongRankSelector(
      desc: Boolean, k: Int) extends Selector {
    /** Primitive-returning abstract method (NOT a Function2 — a generic
      * lambda would box the long on every row).
      */
    protected def read(vec: org.apache.spark.sql.vectorized.ColumnVector,
        i: Int): Long
    private val heapV = new Array[Long](k)
    private val heapD = new Array[Int](k)
    private var size = 0
    private def worse(a: Long, b: Long): Boolean = if (desc) a < b else a > b
    private def siftDown(i0: Int): Unit = {
      var i = i0
      while (true) {
        val l = 2 * i + 1; val r = l + 1
        var w = i
        if (l < size && worse(heapV(l), heapV(w))) w = l
        if (r < size && worse(heapV(r), heapV(w))) w = r
        if (w == i) return
        val tv = heapV(i); heapV(i) = heapV(w); heapV(w) = tv
        val td = heapD(i); heapD(i) = heapD(w); heapD(w) = td
        i = w
      }
    }
    def consider(vec: org.apache.spark.sql.vectorized.ColumnVector,
        i: Int, doc: Int): Unit = {
      val v = read(vec, i)
      if (size < k) {
        heapV(size) = v; heapD(size) = doc; size += 1
        if (size == k) { // heapify once full (root = worst kept)
          var j = size / 2 - 1
          while (j >= 0) { siftDown(j); j -= 1 }
        }
      } else if (worse(heapV(0), v)) {
        heapV(0) = v; heapD(0) = doc; siftDown(0)
      }
    }
    def docs: Array[Int] = java.util.Arrays.copyOf(heapD, size)
  }

  /** Strings: UTF8String.compareTo IS Spark's order; the threshold is
    * the heap root, compared per row without boxing (vector accessors
    * hand out transient UTF8Strings; clones happen only on insert).
    */
  private final class StringSelector(desc: Boolean, k: Int)
      extends Selector {
    private val heapV = new Array[UTF8String](k)
    private val heapD = new Array[Int](k)
    private var size = 0
    private def worse(a: UTF8String, b: UTF8String): Boolean =
      if (desc) a.compareTo(b) < 0 else a.compareTo(b) > 0
    private def siftDown(i0: Int): Unit = {
      var i = i0
      while (true) {
        val l = 2 * i + 1; val r = l + 1
        var w = i
        if (l < size && worse(heapV(l), heapV(w))) w = l
        if (r < size && worse(heapV(r), heapV(w))) w = r
        if (w == i) return
        val tv = heapV(i); heapV(i) = heapV(w); heapV(w) = tv
        val td = heapD(i); heapD(i) = heapD(w); heapD(w) = td
        i = w
      }
    }
    def consider(vec: org.apache.spark.sql.vectorized.ColumnVector,
        i: Int, doc: Int): Unit = {
      val v = vec.getUTF8String(i)
      if (size < k) {
        heapV(size) = v.clone(); heapD(size) = doc; size += 1
        if (size == k) {
          var j = size / 2 - 1
          while (j >= 0) { siftDown(j); j -= 1 }
        }
      } else if (worse(heapV(0), v)) {
        heapV(0) = v.clone(); heapD(0) = doc; siftDown(0)
      }
    }
    def docs: Array[Int] = java.util.Arrays.copyOf(heapD, size)
  }

  /** The pass-1 hot loop lives in its own SMALL method: inside the big
    * `runReaders` initializer the JVM refuses to JIT it
    * (DontCompileHugeMethods) and the interpreted loop ran ~40× slower
    * than the same code compiled.
    */
  private def drainProbe(probe: PinotColumnarReader, sel: Selector): Unit = {
    var absBase = lo
    while (probe.next()) {
      val batch = probe.get()
      val vec = batch.column(0)
      val n = batch.numRows()
      var i = 0
      while (i < n) { sel.consider(vec, i, absBase + i); i += 1 }
      absBase += n
    }
  }

  private lazy val runReaders: Iterator[PinotColumnarReader] = {
    val tpe = expectedTypes.get(topN.column).map(_._1).getOrElse(
      PinotScan.segmentMeta(path).columns(topN.column).dataType)
    // pass 1: sort column only
    val probe = new PinotColumnarReader(path, Array(topN.column),
      Array.empty, None, expectedTypes, slice = Some((lo, hi)))
    val k = topN.limit
    // IEEE bits → order-embedded integer (flip the magnitude bits of
    // negatives): the exact transform inside java.lang.Float.compare /
    // Double.compare, so the embedded order IS Spark's (-Inf < -0.0 <
    // +0.0 < +Inf < NaN)
    def rankF(bits: Int): Long =
      (bits ^ ((bits >> 31) & 0x7fffffff)).toLong
    def rankD(bits: Long): Long =
      bits ^ ((bits >> 63) & 0x7fffffffffffffffL)
    import org.apache.spark.sql.vectorized.ColumnVector
    val sel: Selector = tpe match {
      case PinotType.PInt =>
        new LongRankSelector(topN.descending, k) {
          protected def read(v: ColumnVector, i: Int): Long = v.getInt(i).toLong
        }
      case PinotType.PLong | PinotType.PTimestamp =>
        new LongRankSelector(topN.descending, k) {
          protected def read(v: ColumnVector, i: Int): Long = v.getLong(i)
        }
      case PinotType.PBoolean =>
        new LongRankSelector(topN.descending, k) {
          protected def read(v: ColumnVector, i: Int): Long =
            if (v.getBoolean(i)) 1L else 0L
        }
      case PinotType.PFloat =>
        new LongRankSelector(topN.descending, k) {
          protected def read(v: ColumnVector, i: Int): Long =
            rankF(java.lang.Float.floatToIntBits(v.getFloat(i)))
        }
      case PinotType.PDouble =>
        new LongRankSelector(topN.descending, k) {
          protected def read(v: ColumnVector, i: Int): Long =
            rankD(java.lang.Double.doubleToLongBits(v.getDouble(i)))
        }
      case PinotType.PString => new StringSelector(topN.descending, k)
      case other => throw new graft.pinot.PinotFormatException(
        s"value top-N on unsupported type $other")
    }
    try drainProbe(probe, sel)
    finally probe.close()
    // pass 2: contiguous winner runs, ascending doc order
    val docs = sel.docs.sorted
    val runs = collection.mutable.ArrayBuffer.empty[(Int, Int)]
    docs.foreach { d =>
      if (runs.nonEmpty && runs.last._2 == d) {
        val (s, _) = runs.remove(runs.length - 1)
        runs += ((s, d + 1))
      } else runs += ((d, d + 1))
    }
    runs.iterator.map { case (s, e) =>
      new PinotColumnarReader(path, columns, Array.empty, None,
        expectedTypes, slice = Some((s, e)))
    }
  }

  private var cur: PinotColumnarReader = null
  private var batch: ColumnarBatch = null

  @scala.annotation.tailrec
  final override def next(): Boolean =
    if (cur == null) {
      if (!runReaders.hasNext) false
      else { cur = runReaders.next(); next() }
    } else if (cur.next()) { batch = cur.get(); true }
    else { cur.close(); cur = null; next() }

  override def get(): ColumnarBatch = batch

  override def close(): Unit = if (cur != null) { cur.close(); cur = null }
}

/** Chains full per-segment readers for a [[PinotGroupPartition]]. Each
  * sub-reader runs its own segment pruning / sorted-ranging / index
  * logic and applies the same per-partition advisory limit it would
  * have applied as its own partition.
  */
class PinotSegmentChainReader(paths: Seq[String], columns: Array[String],
    skipFilters: Array[Filter], limit: Option[Int],
    expectedTypes: Map[String, (PinotType, Boolean)],
    scanTopN: Option[ScanTopN] = None,
    jsonEq: Seq[PinotScan.JsonProbe] = Nil)
    extends PartitionReader[ColumnarBatch] {

  private var idx = 0
  private var cur: PartitionReader[ColumnarBatch] = null
  private var batch: ColumnarBatch = null

  // plain-scan top-N: EACH segment contributes its own top-k (segments
  // are independent; sorted mode means sorted WITHIN each segment);
  // Spark's TakeOrderedAndProject merges the k×segments survivors
  private def readerOf(path: String): PartitionReader[ColumnarBatch] =
    scanTopN match {
      case Some(t) if t.sorted =>
        val docs = PinotScan.segmentDocsStrict(path).toInt
        val sl = if (t.descending) (math.max(0, docs - t.limit), docs)
        else (0, math.min(docs, t.limit))
        new PinotColumnarReader(path, columns, skipFilters, limit,
          expectedTypes, slice = Some(sl))
      case Some(t) =>
        new PinotValueTopNReader(path, columns, t, expectedTypes,
          0, PinotScan.segmentDocsStrict(path).toInt)
      case None =>
        new PinotColumnarReader(path, columns, skipFilters, limit,
          expectedTypes, jsonEq = jsonEq)
    }

  @scala.annotation.tailrec
  final override def next(): Boolean =
    if (cur == null) {
      if (idx >= paths.length) false
      else {
        cur = readerOf(paths(idx))
        idx += 1
        next()
      }
    } else if (cur.next()) { batch = cur.get(); true }
    else { cur.close(); cur = null; next() }

  override def get(): ColumnarBatch = batch

  override def close(): Unit = if (cur != null) { cur.close(); cur = null }
}

/** Chains per-segment readers until `limit` rows have been emitted —
  * the execution side of the fully-pushed limit. Each segment reader is
  * capped at the REMAINING budget, so the global total is exact and a
  * small limit touches one window of one segment.
  */
class PinotChainedLimitReader(paths: Seq[String], columns: Array[String],
    limit: Int, expectedTypes: Map[String, (PinotType, Boolean)],
    skip: Int = 0)
    extends PartitionReader[ColumnarBatch] {

  private var idx = 0
  private var remaining = limit
  // pushed OFFSET: doc budget still to skip before the first emitted
  // row; whole segments skip on metadata doc counts alone (no open),
  // the boundary segment starts mid-segment via a doc-range slice
  private var toSkip = skip
  private var cur: PinotColumnarReader = null
  private var batch: ColumnarBatch = null

  @scala.annotation.tailrec
  final override def next(): Boolean =
    if (remaining <= 0) false
    else if (cur == null) {
      if (idx >= paths.length) false
      else {
        val docs = PinotScan.segmentDocsStrict(paths(idx)).toInt
        if (toSkip >= docs) {
          toSkip -= docs
          idx += 1
          next()
        } else {
          val slice = if (toSkip > 0) Some((toSkip, docs)) else None
          toSkip = 0
          cur = new PinotColumnarReader(paths(idx), columns, Array.empty,
            Some(remaining), expectedTypes, slice = slice)
          idx += 1
          next()
        }
      }
    } else if (cur.next()) {
      batch = cur.get()
      remaining -= batch.numRows()
      true
    } else {
      cur.close()
      cur = null
      next()
    }

  override def get(): ColumnarBatch = batch

  override def close(): Unit = if (cur != null) { cur.close(); cur = null }
}

/** Reads one segment: decodes each projected column **once** into primitive
  * arrays (≙ read_columns_once, exec.rs:66-148), then emits 8,192-row
  * `ColumnarBatch`es (BATCH_SIZE, exec.rs:24). An empty projection decodes
  * nothing and emits row-count-only batches.
  */
class PinotColumnarReader(segmentPath: String, columns: Array[String],
    skipFilters: Array[Filter] = Array.empty, limit: Option[Int] = None,
    expectedTypes: Map[String, (PinotType, Boolean)] = Map.empty,
    slice: Option[(Int, Int)] = None,
    jsonEq: Seq[PinotScan.JsonProbe] = Nil)
    extends PartitionReader[ColumnarBatch] {

  private val BatchSize = 8192

  private lazy val reader = SegmentReader.open(segmentPath)

  /** Dictionary-based segment pruning: a pushed equality/IN filter on a
    * dictionary-encoded column whose dictionary lacks every candidate
    * value proves the segment contributes no rows — skip it without
    * decoding any forward index (dictionaries are tiny vs columns).
    */
  private lazy val segmentCanMatch: Boolean = jsonCanMatch && skipFilters.forall {
    case EqualTo(attr, value) =>
      dictMayContain(attr, Seq(value)) &&
        bloomMayContain(attr, Seq(value)) &&
        rangeOpen(attr, maxSide = true, value, strict = false) && // max >= v
        rangeOpen(attr, maxSide = false, value, strict = false) // min <= v
    case In(attr, values) =>
      dictMayContain(attr, values.toSeq) &&
        bloomMayContain(attr, values.toSeq)
    case GreaterThan(attr, value) =>
      rangeOpen(attr, maxSide = true, value, strict = true)
    case GreaterThanOrEqual(attr, value) =>
      rangeOpen(attr, maxSide = true, value, strict = false)
    case LessThan(attr, value) =>
      rangeOpen(attr, maxSide = false, value, strict = true)
    case LessThanOrEqual(attr, value) =>
      rangeOpen(attr, maxSide = false, value, strict = false)
    case StringStartsWith(attr, prefix) =>
      // every match lies in [prefix, next(prefix)): keep iff max >= prefix
      // and min < next(prefix); next(prefix) = None means no upper bound
      rangeOpen(attr, maxSide = true, prefix, strict = false) &&
        PinotScan.prefixNext(prefix).forall(np =>
          rangeOpen(attr, maxSide = false, np, strict = true))
    // null-vector metadata answers IS [NOT] NULL exactly: a column
    // without a null vector has zero null rows; one whose vector covers
    // every doc has zero non-null rows
    case IsNull(attr) => colMeta(attr).forall(cm =>
      cm.hasNullVector && cm.nullCount > 0)
    case IsNotNull(attr) => colMeta(attr).forall(cm =>
      !cm.hasNullVector || cm.nullCount < reader.metadata.totalDocs)
    case _ => true
  }

  private def colMeta(attr: String): Option[graft.pinot.ColumnMetadata] =
    try Some(reader.metadata.column(attr)) catch { case _: Throwable => None }

  /** JSON-index candidate set (EXTENSION — the capability of Pinot's
    * `jsonIndexColumns`; see [[graft.pinot.JsonIndexSection]]): AND
    * across the pushed `get_json_object` probes (equality / IN-list /
    * IS NOT NULL) the column's index can answer soundly. None when no
    * probe is index-answerable (no index / refused path / odd probe) —
    * the scan then decodes normally and the residual filter decides.
    */
  private lazy val jsonEqBitmap
      : Option[org.roaringbitmap.buffer.MutableRoaringBitmap] = {
    var acc: org.roaringbitmap.buffer.MutableRoaringBitmap = null
    jsonEq.foreach { probe =>
      if (colMeta(probe.col).exists(m => m.isSingleValue && m.hasJsonIndex)) {
        val ji = try reader.jsonIndex(probe.col)
          catch { case _: Throwable => None }
        ji.flatMap { sec =>
          probe match {
            case PinotScan.JsonEqProbe(_, p, values) =>
              sec.matchAnyBitmap(p, values)
            case PinotScan.JsonExistsProbe(_, p) => sec.existsBitmap(p)
            case PinotScan.JsonRangeProbe(_, p, lo, loInc, hi, hiInc) =>
              sec.rangeBitmap(p, lo, loInc, hi, hiInc)
            case PinotScan.JsonNullProbe(_, p) =>
              // candidates = complement of the provably-non-null docs
              val nn = sec.notNullBitmap(p)
              nn.flip(0L, reader.metadata.totalDocs.toLong)
              Some(nn)
          }
        }.foreach { m =>
          if (acc == null) acc = m.clone() else acc.and(m)
        }
      }
    }
    Option(acc)
  }

  /** Empty JSON candidate set proves the segment contributes no rows. */
  private lazy val jsonCanMatch: Boolean = jsonEqBitmap.forall(!_.isEmpty)

  /** `col > v` can match only if segment max > v (maxSide), `col < v`
    * only if segment min < v. Unknown metadata or unsupported types →
    * never prune. Comparisons are exact (BigDecimal for numerics; string
    * compare is sound because recorded min/max are ASCII-only).
    */
  private def rangeOpen(attr: String, maxSide: Boolean, value: Any,
      strict: Boolean): Boolean = {
    val cm = try reader.metadata.column(attr)
      catch { case _: Throwable => return true }
    if (!cm.isSingleValue) return true
    val bound = if (maxSide) cm.maxValue else cm.minValue
    bound match {
      case Some(b) => cmp(b, value) match {
        case Some(c) =>
          if (maxSide) { if (strict) c > 0 else c >= 0 }
          else { if (strict) c < 0 else c <= 0 }
        case None => true
      }
      case None => true
    }
  }

  /** Compare a metadata bound (string form) against a pushed filter value.
    * Some(sign) when comparable; None → cannot prune on this filter.
    * (Shared with driver-side runtime pruning — see PinotScan.cmpBound.)
    */
  private def cmp(bound: String, value: Any): Option[Int] =
    PinotScan.cmpBound(bound, value)

  private def dictMayContain(attr: String, values: Seq[Any]): Boolean = {
    val cm = try reader.metadata.column(attr)
      catch { case _: Throwable => return true }
    if (!cm.hasDictionary) return true // RAW column: cannot prune
    if (!cm.isSingleValue) return true // MV equality has array semantics
    val dict = reader.dictionary(attr)
    values.exists(v => dictContains(dict, v))
  }

  private def dictContains(dict: PinotDictionary, v: Any): Boolean =
    (dict, v) match {
      case (PinotDictionary.Ints(a), x: Int) => a.contains(x)
      case (PinotDictionary.Longs(a), x: Long) => a.contains(x)
      // NaN needs an explicit probe (primitive NaN != NaN would always
      // prune, while Spark's EqualTo treats NaN = NaN as true); plain ==
      // also makes -0.0 match 0.0, aligning with Spark equality
      case (PinotDictionary.Floats(a), x: Float) =>
        if (x.isNaN) a.exists(_.isNaN) else a.exists(_ == x)
      case (PinotDictionary.Doubles(a), x: Double) =>
        if (x.isNaN) a.exists(_.isNaN) else a.exists(_ == x)
      case (PinotDictionary.Strings(a), x: String) => a.contains(x)
      case (PinotDictionary.Strings(a), x: UTF8String) => a.contains(x.toString)
      // TIMESTAMP equality: dict holds epoch millis, probe in micros
      case (PinotDictionary.Longs(a), x)
          if PinotScan.timestampMicros(x).isDefined =>
        val us = PinotScan.timestampMicros(x).get
        a.exists(ms => Math.multiplyExact(ms, 1000L) == us)
      case _ => true // unexpected type pairing: never prune on a guess
    }

  /** Bloom-filter pruning (EXTENSION — Pinot's `bloomFilterColumns`):
    * EqualTo/In where the bloom answers "definitely absent" for EVERY
    * candidate value proves the segment contributes no rows — the point-
    * lookup pruning path for RAW (no-dictionary) columns, where
    * [[dictMayContain]] cannot decide and min/max keeps any in-range
    * probe. False positives only keep the segment (residual filter
    * decides); "absent" is exact under Spark equality because writer and
    * probe share one canonical spelling (see [[graft.pinot.BloomSection]]).
    */
  private def bloomMayContain(attr: String, values: Seq[Any]): Boolean = {
    val cm = colMeta(attr) match {
      case Some(m) if m.isSingleValue => m
      case _ => return true
    }
    val bf = try reader.bloomFilter(attr) catch { case _: Throwable => None }
    bf match {
      case None => true
      case Some(b) => values.exists(v => bloomProbe(cm.dataType.name, v) match {
        case Some(c) => b.mightContain(c)
        case None => true // type pairing we can't canonicalize: never prune
      })
    }
  }

  /** Probe value → the writer's canonical spelling, ONLY when the
    * probe's runtime type matches the column's stored type (a cross-
    * typed literal — e.g. a double probe against a FLOAT column — can
    * be Spark-equal under widening while spelling differently, so it
    * must never reach the bloom). TIMESTAMP columns store epoch millis;
    * a sub-millisecond probe can equal no stored value, so it maps to a
    * spelling no TIMESTAMP writer emits (digit strings only) and prunes.
    */
  private def bloomProbe(dataType: String, v: Any): Option[String] =
    (dataType, v) match {
      case (_, null) => None
      case ("INT", x: Int) => Some(String.valueOf(x))
      case ("LONG", x: Long) => Some(String.valueOf(x))
      case ("STRING" | "JSON", x: String) => Some(x)
      case ("STRING" | "JSON", x: UTF8String) => Some(x.toString)
      case ("FLOAT", x: Float) =>
        Some(graft.pinot.BloomSection.canonicalFloat(x))
      case ("DOUBLE", x: Double) =>
        Some(graft.pinot.BloomSection.canonicalDouble(x))
      case ("BOOLEAN", x: Boolean) => Some(String.valueOf(x))
      case ("TIMESTAMP", x) if PinotScan.timestampMicros(x).isDefined =>
        val us = PinotScan.timestampMicros(x).get
        if (us % 1000L == 0) Some(String.valueOf(us / 1000L))
        else Some("ts:sub-milli") // not a digit string → definitely absent
      case _ => None
    }

  /** Bitmap inverted-index match set (EXTENSION — Pinot's
    * `invertedIndexColumns`; the reference ignores secondary indexes):
    * for pushed EqualTo/In filters on single-value dict columns carrying
    * an `inverted_index` section, OR the posting bitmaps of the matching
    * dictIds per filter and AND across filters. The result is EXACTLY
    * the matching doc set for those filters — used to (a) prune the
    * segment when empty, (b) clamp the scan doc range, and (c) skip
    * 8,192-row windows containing no match. Always a superset of the
    * final rows (other filters stay residual), so Spark's re-evaluation
    * keeps correctness.
    */
  private lazy val invBitmap
      : Option[org.roaringbitmap.buffer.MutableRoaringBitmap] = {
    // limit pushdown only happens with no residual filters, so the two
    // never coexist — but skipping docs under a limit cap would change
    // WHICH rows count toward it, so guard anyway
    if (limit.isDefined || (skipFilters.isEmpty && jsonEq.isEmpty)) None
    else {
      var acc: org.roaringbitmap.buffer.MutableRoaringBitmap = null
      skipFilters.foreach { f =>
        val fb = f match {
          case EqualTo(a, v) => filterBitmap(a, Seq(v))
            .orElse(rangeIdxBitmap(a, Some(v), loInc = true, Some(v), hiInc = true))
          case In(a, vs) => filterBitmap(a, vs.toSeq)
          // null-value vectors are exact doc sets too: IS NULL matches
          // the bitmap, IS NOT NULL its complement over [0, totalDocs)
          case IsNull(a) => nullFilterBitmap(a, wantNull = true)
          case IsNotNull(a) => nullFilterBitmap(a, wantNull = false)
          // text index: substring predicates → token-posting OR
          case StringContains(a, v) => textBitmap(a, v)
          case StringStartsWith(a, v) => textBitmap(a, v)
          case StringEndsWith(a, v) => textBitmap(a, v)
          // range index (unsorted numeric columns): candidate-bucket OR
          case GreaterThan(a, v) =>
            rangeIdxBitmap(a, Some(v), loInc = false, None, hiInc = false)
          case GreaterThanOrEqual(a, v) =>
            rangeIdxBitmap(a, Some(v), loInc = true, None, hiInc = false)
          case LessThan(a, v) =>
            rangeIdxBitmap(a, None, loInc = false, Some(v), hiInc = false)
          case LessThanOrEqual(a, v) =>
            rangeIdxBitmap(a, None, loInc = false, Some(v), hiInc = true)
          case _ => None
        }
        fb.foreach { m => if (acc == null) acc = m else acc.and(m) }
      }
      // pushed get_json_object equality probes: json-index candidate AND
      jsonEqBitmap.foreach { m =>
        if (acc == null) acc = m.clone() else acc.and(m)
      }
      Option(acc)
    }
  }

  /** Text-index match superset (EXTENSION — Pinot's `textIndexColumns`
    * capability; see [[graft.pinot.TextIndexSection]]): for a pushed
    * contains/startsWith/endsWith probe, the OR of the postings of every
    * vocabulary token containing the probe. Sound because a
    * whitespace-free substring of the text must lie inside one token; a
    * probe with whitespace never consults the index. startsWith/endsWith
    * matches are contains matches, so one candidate set covers all
    * three. Residual filters keep exactness.
    */
  private def textBitmap(attr: String, probe: Any)
      : Option[org.roaringbitmap.buffer.MutableRoaringBitmap] = {
    val ok = colMeta(attr).exists(m => m.isSingleValue && m.hasTextIndex)
    if (!ok) return None
    val p = probe match {
      case s: String => s
      case s: UTF8String => s.toString
      case _ => return None
    }
    val ti = try reader.textIndex(attr) catch { case _: Throwable => None }
    ti.flatMap(_.matchBitmap(p))
  }

  /** Range-index match superset (EXTENSION — Pinot's `rangeIndexColumns`;
    * see [[graft.pinot.RangeSection]]): OR of the doc buckets whose
    * exact [min, max] intersects the probe interval. Bounds compare in
    * the column's stored domain — LONG for INT/LONG, canonical-double
    * bits for FLOAT/DOUBLE (Double.compare ≙ Spark's NaN-high ordering),
    * and for TIMESTAMP the micros probe maps onto the stored-millis grid
    * with floor-division inclusivity so no representable match is lost.
    * A cross-typed probe never consults the index.
    */
  private def rangeIdxBitmap(attr: String, lo: Option[Any], loInc: Boolean,
      hi: Option[Any], hiInc: Boolean)
      : Option[org.roaringbitmap.buffer.MutableRoaringBitmap] = {
    val cm = colMeta(attr) match {
      case Some(m) if m.isSingleValue && m.hasRangeIndex => m
      case _ => return None
    }
    val ri = try reader.rangeIndex(attr) catch { case _: Throwable => None }
    ri.flatMap { idx =>
      val tpe = cm.dataType.name
      def plain(v: Any): Option[Long] = (tpe, v) match {
        case ("INT", x: Int) => Some(x.toLong)
        case ("LONG", x: Long) => Some(x)
        case ("FLOAT", x: Float) =>
          Some(graft.pinot.RangeSection.doubleBits(x.toDouble))
        case ("DOUBLE", x: Double) =>
          Some(graft.pinot.RangeSection.doubleBits(x))
        case _ => None
      }
      // per-bound conversion; Left = unconvertible (do not use index)
      def loBound: Either[Unit, (Option[Long], Boolean)] = lo match {
        case None => Right((None, false))
        case Some(v) if tpe == "TIMESTAMP" =>
          PinotScan.timestampMicros(v) match {
            case Some(us) =>
              if (us % 1000L == 0) Right((Some(us / 1000L), loInc))
              else Right((Some(Math.floorDiv(us, 1000L)), false)) // strict
            case None => Left(())
          }
        case Some(v) => plain(v) match {
          case Some(b) => Right((Some(b), loInc))
          case None => Left(())
        }
      }
      def hiBound: Either[Unit, (Option[Long], Boolean)] = hi match {
        case None => Right((None, false))
        case Some(v) if tpe == "TIMESTAMP" =>
          PinotScan.timestampMicros(v) match {
            case Some(us) =>
              if (us % 1000L == 0) Right((Some(us / 1000L), hiInc))
              else Right((Some(Math.floorDiv(us, 1000L)), true)) // inclusive
            case None => Left(())
          }
        case Some(v) => plain(v) match {
          case Some(b) => Right((Some(b), hiInc))
          case None => Left(())
        }
      }
      (loBound, hiBound) match {
        case (Right((lb, li)), Right((hb, hi2))) =>
          Some(idx.matchBitmap(lb, li, hb, hi2))
        case _ => None
      }
    }
  }

  private def nullFilterBitmap(attr: String, wantNull: Boolean)
      : Option[org.roaringbitmap.buffer.MutableRoaringBitmap] = {
    val cm = try reader.metadata.column(attr)
      catch { case _: Throwable => return None }
    if (!cm.hasNullVector) return None // no nulls: IsNotNull is all-docs
    reader.nullVector(attr).map { nv =>
      val m = new org.roaringbitmap.buffer.MutableRoaringBitmap
      m.or(nv)
      if (!wantNull) m.flip(0L, reader.totalDocs.toLong)
      m
    }
  }

  private def filterBitmap(attr: String, values: Seq[Any])
      : Option[org.roaringbitmap.buffer.MutableRoaringBitmap] = {
    val cm = try reader.metadata.column(attr)
      catch { case _: Throwable => return None }
    if (!cm.hasDictionary || !cm.isSingleValue || !cm.hasInvertedIndex)
      return None
    reader.invertedIndex(attr).flatMap { postings =>
      matchingDictIds(reader.dictionary(attr), values).map { ids =>
        val acc = new org.roaringbitmap.buffer.MutableRoaringBitmap
        ids.foreach(id => acc.or(postings(id)))
        acc
      }
    }
  }

  /** DictIds equal to any candidate value under SPARK equality (-0.0 ==
    * 0.0, NaN = NaN true — same care as [[dictContains]]). None when any
    * value has an unexpected type pairing: the index must then not be
    * used for this filter at all (a wrong "no matches" would drop rows).
    */
  private def matchingDictIds(dict: PinotDictionary, values: Seq[Any])
      : Option[Seq[Int]] = {
    val perValue = values.map { v =>
      (dict, v) match {
        case (PinotDictionary.Ints(a), x: Int) =>
          Some(a.indices.filter(a(_) == x))
        case (PinotDictionary.Longs(a), x: Long) =>
          Some(a.indices.filter(a(_) == x))
        case (PinotDictionary.Floats(a), x: Float) =>
          Some(if (x.isNaN) a.indices.filter(a(_).isNaN)
               else a.indices.filter(a(_) == x))
        case (PinotDictionary.Doubles(a), x: Double) =>
          Some(if (x.isNaN) a.indices.filter(a(_).isNaN)
               else a.indices.filter(a(_) == x))
        case (PinotDictionary.Strings(a), x: String) =>
          Some(a.indices.filter(a(_) == x))
        case (PinotDictionary.Strings(a), x: UTF8String) =>
          val s = x.toString
          Some(a.indices.filter(a(_) == s))
        case (PinotDictionary.Longs(a), x)
            if PinotScan.timestampMicros(x).isDefined =>
          val us = PinotScan.timestampMicros(x).get
          Some(a.indices.filter(i => Math.multiplyExact(a(i), 1000L) == us))
        case _ => None
      }
    }
    if (perValue.exists(_.isEmpty)) None
    else Some(perValue.flatMap(_.get).distinct)
  }

  /** Sub-segment range for SORTED columns (extension; the reference
    * parses `isSorted` and drops it, metadata.rs:166-168): when a pushed
    * range/equality filter targets a sorted numeric dict column, binary
    * search bounds the matching doc interval and ONLY that slice of every
    * projected column decodes (fixed-bit ids and VarByte chunks are both
    * position-addressable). Always a superset of the matching rows —
    * Spark's residual filter stays authoritative. The inverted-index
    * match set (when present) clamps the range further.
    */
  private lazy val docRange: (Int, Int) = {
    val n = if (segmentCanMatch) reader.totalDocs else 0
    if (n == 0) (0, 0)
    else {
      val hasMV = columns.exists { c =>
        try !reader.metadata.column(c).isSingleValue
        catch { case _: Throwable => false }
      }
      val sortedCol =
        if (hasMV || skipFilters.isEmpty) None
        else skipFilters.iterator.flatMap(filterAttr).distinct.find { c =>
          val cm = try reader.metadata.column(c) catch { case _: Throwable => null }
          cm != null && cm.isSorted && cm.isSingleValue &&
            (cm.dataType match {
              case PinotType.PInt | PinotType.PLong | PinotType.PFloat |
                   PinotType.PDouble | PinotType.PTimestamp => true
              // sorted STRING columns (e.g. time-ordered ids) range the
              // same way via the dictionary; RAW strings lack a cheap
              // per-doc accessor, so dict-encoded only
              case PinotType.PString => cm.hasDictionary
              case _ => false
            })
        }
      val base = sortedCol.fold((0, n))(sortedDocRange)
      val ranged = invBitmap match {
        case Some(bm) =>
          if (bm.isEmpty) (0, 0)
          // MV window skipping in next() still applies (it advances pos
          // relative to docStart; decode indexes offsets absolutely)
          else if (hasMV) base
          else {
            val lo = math.max(base._1, bm.first())
            val hi = math.min(base._2, bm.last() + 1)
            if (lo >= hi) (0, 0) else (lo, hi)
          }
        case None => base
      }
      // sub-segment slice: intersect with this task's doc window
      slice.fold(ranged) { case (s, e) =>
        val lo = math.max(ranged._1, s)
        val hi = math.min(ranged._2, math.min(e, n))
        if (lo >= hi) (0, 0) else (lo, hi)
      }
    }
  }

  private def filterAttr(f: Filter): Option[String] = f match {
    case GreaterThan(a, _) => Some(a)
    case GreaterThanOrEqual(a, _) => Some(a)
    case LessThan(a, _) => Some(a)
    case LessThanOrEqual(a, _) => Some(a)
    case EqualTo(a, _) => Some(a)
    case StringStartsWith(a, _) => Some(a)
    case _ => None
  }

  private def sortedDocRange(c: String): (Int, Int) = {
    val n = reader.totalDocs
    val cm = reader.metadata.column(c)
    // value accessor: dict columns random-access the packed id stream
    // per binary-search probe (O(log n) bit reads — a full id-stream
    // decode per task would defeat sub-segment slicing); RAW numerics
    // random-access the fixed-byte index the same way
    val valueAt: Int => Any =
      if (cm.hasDictionary) {
        val fbr = reader.dictIdReader(c)
        reader.dictionary(c) match {
          case PinotDictionary.Ints(d) => doc => d(fbr.get(doc))
          case PinotDictionary.Longs(d) => doc => d(fbr.get(doc))
          case PinotDictionary.Floats(d) => doc => d(fbr.get(doc))
          case PinotDictionary.Doubles(d) => doc => d(fbr.get(doc))
          case PinotDictionary.Strings(d) => doc => d(fbr.get(doc))
          case _ => _ => null
        }
      } else {
        val fb = reader.fixedByteReader(c)
        cm.dataType match {
          case PinotType.PInt => doc => fb.readRangeInts(doc, 1)(0)
          case PinotType.PLong | PinotType.PTimestamp =>
            doc => fb.readRangeLongs(doc, 1)(0)
          case PinotType.PFloat => doc => fb.readRangeFloats(doc, 1)(0)
          case PinotType.PDouble => doc => fb.readRangeDoubles(doc, 1)(0)
          case _ => _ => null
        }
      }
    // ±0.0 compares equal (Spark semantics); NaN == NaN and sorts last —
    // both match the writer's total order, keeping the predicate monotone
    def valCmp(doc: Int, v: Any): Option[Int] = (valueAt(doc), v) match {
      case (a: Int, x: Int) => Some(Integer.compare(a, x))
      case (a: Long, x: Long) => Some(java.lang.Long.compare(a, x))
      case (a: Float, x: Float) =>
        Some(if (a == x) 0 else java.lang.Float.compare(a, x))
      case (a: Double, x: Double) =>
        Some(if (a == x) 0 else java.lang.Double.compare(a, x))
      // sound only for ASCII bounds/probes (UTF-16 order == UTF-8 byte
      // order there); non-ASCII probes fall back to no ranging
      case (a: String, x: String)
          if x.forall(ch => ch >= 0x20 && ch < 0x7f) =>
        Some(a.compareTo(x))
      case (a: String, x: UTF8String) =>
        val s = x.toString
        if (s.forall(ch => ch >= 0x20 && ch < 0x7f)) Some(a.compareTo(s))
        else None
      // sorted TIMESTAMP column: doc value is epoch millis (Long from
      // the dict/raw accessor), probe converts to micros
      case (a: Long, x) if PinotScan.timestampMicros(x).isDefined =>
        Some(java.lang.Long.compare(Math.multiplyExact(a, 1000L),
          PinotScan.timestampMicros(x).get))
      case _ => None
    }
    // first doc where the monotone predicate flips false→true
    def firstWhere(p: Int => Boolean): Int = {
      var lo = 0
      var hi = n
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (p(mid)) hi = mid else lo = mid + 1
      }
      lo
    }
    var lo = 0
    var hi = n
    def comparable(v: Any): Boolean = valCmp(0, v).isDefined
    skipFilters.foreach {
      case GreaterThan(a, v) if a == c && comparable(v) =>
        lo = math.max(lo, firstWhere(d => valCmp(d, v).exists(_ > 0)))
      case GreaterThanOrEqual(a, v) if a == c && comparable(v) =>
        lo = math.max(lo, firstWhere(d => valCmp(d, v).exists(_ >= 0)))
      case EqualTo(a, v) if a == c && comparable(v) =>
        lo = math.max(lo, firstWhere(d => valCmp(d, v).exists(_ >= 0)))
        hi = math.min(hi, firstWhere(d => valCmp(d, v).exists(_ > 0)))
      case LessThan(a, v) if a == c && comparable(v) =>
        hi = math.min(hi, firstWhere(d => valCmp(d, v).exists(_ >= 0)))
      case LessThanOrEqual(a, v) if a == c && comparable(v) =>
        hi = math.min(hi, firstWhere(d => valCmp(d, v).exists(_ > 0)))
      case StringStartsWith(a, prefix) if a == c && comparable(prefix) =>
        // matches live in [prefix, next(prefix)) of the sorted order
        lo = math.max(lo, firstWhere(d => valCmp(d, prefix).exists(_ >= 0)))
        PinotScan.prefixNext(prefix).foreach { np =>
          if (comparable(np))
            hi = math.min(hi, firstWhere(d => valCmp(d, np).exists(_ >= 0)))
        }
      case _ => ()
    }
    if (lo >= hi) (0, 0) else (lo, hi)
  }

  private lazy val docStart: Int = docRange._1

  private lazy val totalDocs: Int = {
    val n = docRange._2 - docRange._1
    limit.fold(n)(math.min(n, _)) // per-partition limit cap
  }

  /** Window-local identity ids for RAW columns (value i ↔ row i of the
    * current batch); shared across batches and RAW columns.
    */
  private lazy val identityWindow: Array[Int] = Array.tabulate(BatchSize)(i => i)

  /** Per projected column: a [[Dictionary]] over the decoded distinct
    * values and the per-doc id stream. Dict columns reuse Pinot's own
    * dictionary (decoded once — string entries to UTF-8 bytes once per
    * DISTINCT value, not per row); RAW string/bytes columns expose their
    * decoded values through an identity-id dictionary. Spark's
    * ColumnVector then serves every read through `Dictionary.decodeTo*`
    * with zero per-row copying in the scan. BOOLEAN is the one direct-fill
    * exception: Spark's `getBoolean` never consults a dictionary.
    * TIMESTAMP converts millis→micros once at dictionary decode.
    */
  // Every plan decodes PER WINDOW from a cached compact form (packed id
  // bits / compressed var-byte sections) — per-task heap is O(window +
  // dictionaries), not O(segment), which is what lets 1 GB segments scan
  // under executor memory.
  private sealed trait ColPlan { def sparkType: org.apache.spark.sql.types.DataType }
  private final case class DictBacked(tpe: PinotType, dict: Dictionary,
      idReader: graft.pinot.FixedBitReader) extends ColPlan {
    def sparkType = tpe.sparkType
  }
  private final case class BoolDirect(dictInts: Array[Int],
      idReader: graft.pinot.FixedBitReader) extends ColPlan {
    def sparkType = org.apache.spark.sql.types.BooleanType
  }
  /** RAW var-byte column: one window of values materializes at a time (a
    * chunk straddling a window boundary decompresses at most twice).
    */
  private final class RawWindowed(val tpe: PinotType,
      val v4: graft.pinot.VarByteChunkV4) extends ColPlan {
    def sparkType = tpe.sparkType
  }
  /** RAW fixed-byte NUMERIC column (extension — the reference rejects
    * these): windows bulk-copy straight into the vector's primitive
    * arrays, no dictionary at all.
    */
  private final class NumRawWindowed(val tpe: PinotType,
      val fb: graft.pinot.FixedByteChunkV4) extends ColPlan {
    def sparkType = tpe.sparkType
  }
  /** Multi-value column: the full offsets array (4 bytes/doc) + windowed
    * entry-id decode into a dictionary-backed CHILD vector.
    */
  private final case class MVBacked(tpe: PinotType, dict: Dictionary,
      idReader: graft.pinot.FixedBitReader, offsets: Array[Int]) extends ColPlan {
    def sparkType =
      org.apache.spark.sql.types.ArrayType(tpe.sparkType, containsNull = false)
  }

  private lazy val decoded: Array[ColPlan] =
    columns.map { name =>
      // SCHEMA EVOLUTION: a column this (older) segment does not carry
      // serves its TYPE DEFAULT for every doc — a single-entry
      // dictionary over an all-zero id stream reuses the normal decode
      // path untouched (Pinot's defaultNullValue backfill semantics)
      if (!reader.metadata.columns.contains(name)) {
        val (tpe, isSV) = expectedTypes.getOrElse(name,
          throw new graft.pinot.PinotFormatException(
            s"Column not found: $name"))
        val zeroIds = new graft.pinot.FixedBitReader(
          new Array[Byte](reader.totalDocs / 8 + 16), 1, reader.totalDocs)
        if (!isSV) {
          // evolved MV column: every doc serves the empty array — an
          // all-zero offsets table with no entries to decode
          val dict = tpe match {
            case PinotType.PInt => ArrayDictionary.ofInts(Array(0))
            case PinotType.PLong => ArrayDictionary.ofLongs(Array(0L))
            case PinotType.PDouble => ArrayDictionary.ofDoubles(Array(0d))
            case PinotType.PString =>
              ArrayDictionary.ofBinary(Array(Array.emptyByteArray))
            case other => throw new graft.pinot.PinotFormatException(
              s"schema evolution: no MV default for ${other.name} column $name")
          }
          MVBacked(tpe, dict, zeroIds, new Array[Int](reader.totalDocs + 1))
        } else tpe match {
          case PinotType.PBoolean => BoolDirect(Array(0), zeroIds)
          case PinotType.PInt =>
            DictBacked(tpe, ArrayDictionary.ofInts(Array(0)), zeroIds)
          case PinotType.PLong | PinotType.PTimestamp =>
            DictBacked(tpe, ArrayDictionary.ofLongs(Array(0L)), zeroIds)
          case PinotType.PFloat =>
            DictBacked(tpe, ArrayDictionary.ofFloats(Array(0f)), zeroIds)
          case PinotType.PDouble =>
            DictBacked(tpe, ArrayDictionary.ofDoubles(Array(0d)), zeroIds)
          case PinotType.PString | PinotType.PJson =>
            DictBacked(PinotType.PString,
              ArrayDictionary.ofBinary(Array(Array.emptyByteArray)), zeroIds)
          case PinotType.PBytes =>
            DictBacked(tpe,
              ArrayDictionary.ofBinary(Array(Array.emptyByteArray)), zeroIds)
          case PinotType.PBigDecimal =>
            // 0 at the schema's fixed scale 18, in the unscaled-bytes
            // form getDecimal(_, 38, 18) reads from a binary dictionary
            DictBacked(tpe, ArrayDictionary.ofBinary(Array(
              java.math.BigDecimal.ZERO.setScale(18).unscaledValue.toByteArray)),
              zeroIds)
          case other => throw new graft.pinot.PinotFormatException(
            s"schema evolution: no default for ${other.name} column $name")
        }
      } else {
      val cm = reader.metadata.column(name)
      if (!cm.isSingleValue) {
        // MV columns disable sorted sub-ranging (docRange is full there)
        val (offsets, fbr) = reader.mvReaders(name)
        val dict = reader.dictionary(name) match {
          case PinotDictionary.Ints(v) => ArrayDictionary.ofInts(v)
          case PinotDictionary.Longs(v) => ArrayDictionary.ofLongs(v)
          case PinotDictionary.Floats(v) => ArrayDictionary.ofFloats(v)
          case PinotDictionary.Doubles(v) => ArrayDictionary.ofDoubles(v)
          case PinotDictionary.Strings(v) =>
            ArrayDictionary.ofBinary(v.map(
              _.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
          case other => throw new graft.pinot.PinotFormatException(
            s"Unsupported MV dictionary for $name: $other")
        }
        MVBacked(cm.dataType, dict, fbr, offsets)
      } else if (cm.hasDictionary) {
        lazy val fbr = reader.dictIdReader(name)
        (reader.dictionary(name), cm.dataType) match {
          case (PinotDictionary.Ints(v), PinotType.PBoolean) =>
            BoolDirect(v, fbr)
          case (PinotDictionary.Ints(v), _) =>
            DictBacked(cm.dataType, ArrayDictionary.ofInts(v), fbr)
          case (PinotDictionary.Longs(v), PinotType.PTimestamp) =>
            DictBacked(cm.dataType,
              ArrayDictionary.ofLongs(v.map(Math.multiplyExact(_, 1000L))), fbr)
          case (PinotDictionary.Longs(v), _) =>
            DictBacked(cm.dataType, ArrayDictionary.ofLongs(v), fbr)
          case (PinotDictionary.Floats(v), _) =>
            DictBacked(cm.dataType, ArrayDictionary.ofFloats(v), fbr)
          case (PinotDictionary.Doubles(v), _) =>
            DictBacked(cm.dataType, ArrayDictionary.ofDoubles(v), fbr)
          case (PinotDictionary.Strings(v), _) =>
            DictBacked(cm.dataType, ArrayDictionary.ofBinary(v.map(
              _.getBytes(java.nio.charset.StandardCharsets.UTF_8))), fbr)
          case (PinotDictionary.Bytes(v), _) =>
            DictBacked(cm.dataType, ArrayDictionary.ofBinary(v), fbr)
        }
      } else cm.dataType match {
        // JSON shares STRING storage; BIG_DECIMAL values transform to
        // fixed-scale unscaled bytes per window (see next())
        case PinotType.PString | PinotType.PBytes | PinotType.PJson |
             PinotType.PBigDecimal =>
          new RawWindowed(cm.dataType, reader.rawChunkReader(name))
        case PinotType.PInt | PinotType.PLong | PinotType.PFloat |
             PinotType.PDouble | PinotType.PTimestamp =>
          new NumRawWindowed(cm.dataType, reader.fixedByteReader(name))
        case other => throw new graft.pinot.PinotFormatException(
          s"Unsupported RAW column type for scan: ${other.name}")
      }
      }
    }

  /** Null-value vector per projected column (null = column never null).
    * Decode overlays NULL bits per window after the value fill — null
    * docs hold a stored default in the forward index (Pinot's model), so
    * every decode path stays untouched and the bitmap is the only truth
    * about nullness.
    */
  private lazy val nullVectors
      : Array[org.roaringbitmap.buffer.ImmutableRoaringBitmap] =
    columns.map { c =>
      val cm = try reader.metadata.column(c) catch { case _: Throwable => null }
      if (cm != null && cm.hasNullVector) reader.nullVector(c).orNull else null
    }

  // Vectors and the batch are allocated ONCE and refilled per 8,192-row
  // window — only the int dict-ids move per batch (bulk System.arraycopy).
  private lazy val vectors: Array[OnHeapColumnVector] =
    decoded.map { plan =>
      val v = new OnHeapColumnVector(BatchSize, plan.sparkType)
      plan match {
        case DictBacked(_, dict, _) => v.setDictionary(dict)
        case MVBacked(_, dict, _, _) => v.arrayData().setDictionary(dict)
        case _: BoolDirect => ()
        case _: RawWindowed => () // dictionary swapped in per window
        case _: NumRawWindowed => () // primitive fill, no dictionary
      }
      v
    }
  private lazy val batch: ColumnarBatch =
    new ColumnarBatch(vectors.map(v => v: ColumnVector), 0)

  private var pos = 0
  private var started = false

  override def next(): Boolean = {
    if (pos >= totalDocs) return false
    // inverted-index window skip: jump straight to the next matching doc
    // (windows are relative to pos, so the next batch STARTS at a match;
    // runs of non-matching windows never decode)
    invBitmap.foreach { bm =>
      val nxt = bm.nextValue(docStart + pos)
      if (nxt < 0 || nxt >= docStart + totalDocs) { pos = totalDocs; return false }
      pos = math.max(pos, (nxt - docStart).toInt)
    }
    started = true
    val n = math.min(BatchSize, totalDocs - pos)
    if (columns.nonEmpty) {
      var c = 0
      while (c < decoded.length) {
        decoded(c) match {
          case DictBacked(_, _, fbr) =>
            val ids = fbr.readRange(docStart + pos, n)
            vectors(c).reserveDictionaryIds(n).putInts(0, n, ids, 0)
          case MVBacked(_, _, fbr, offsets) =>
            val vec = vectors(c)
            // offsets are indexed by ABSOLUTE doc id — docStart-aware so
            // sub-segment slices decode only their own windows
            val abs = docStart + pos
            val base = offsets(abs)
            val entries = offsets(abs + n) - base
            val ids = fbr.readRange(base, entries)
            val child = vec.arrayData()
            // grow the child's own arrays (incl. nulls — isNullAt reads
            // them even though we only ever fill dictionary ids)
            child.reserve(entries)
            child.reserveDictionaryIds(entries).putInts(0, entries, ids, 0)
            var i = 0
            while (i < n) {
              vec.putArray(i, offsets(abs + i) - base,
                offsets(abs + i + 1) - offsets(abs + i))
              i += 1
            }
          case BoolDirect(dictInts, fbr) =>
            val vec = vectors(c)
            val ids = fbr.readRange(docStart + pos, n)
            var i = 0
            while (i < n) { vec.putBoolean(i, dictInts(ids(i)) != 0); i += 1 }
          case rw: RawWindowed =>
            val vec = vectors(c)
            val raw = rw.v4.readRangeBytes(docStart + pos, n)
            // BIG_DECIMAL: Spark's getDecimal(_, 38, 18) reads BINARY =
            // unscaled bytes at the schema scale — convert the serialized
            // (scale, unscaled) form once per window
            val values =
              if (rw.tpe == PinotType.PBigDecimal)
                raw.map(graft.pinot.PinotBigDecimal.toUnscaled18)
              else raw
            vec.setDictionary(ArrayDictionary.ofBinary(values))
            vec.reserveDictionaryIds(n).putInts(0, n, identityWindow, 0)
          case nr: NumRawWindowed =>
            val vec = vectors(c)
            nr.tpe match {
              case PinotType.PInt =>
                vec.putInts(0, n, nr.fb.readRangeInts(docStart + pos, n), 0)
              case PinotType.PLong =>
                vec.putLongs(0, n, nr.fb.readRangeLongs(docStart + pos, n), 0)
              case PinotType.PFloat =>
                vec.putFloats(0, n, nr.fb.readRangeFloats(docStart + pos, n), 0)
              case PinotType.PDouble =>
                vec.putDoubles(0, n, nr.fb.readRangeDoubles(docStart + pos, n), 0)
              case PinotType.PTimestamp =>
                val ms = nr.fb.readRangeLongs(docStart + pos, n)
                var i = 0
                while (i < n) {
                  vec.putLong(i, Math.multiplyExact(ms(i), 1000L)); i += 1
                }
              case _ => ()
            }
        }
        val nv = nullVectors(c)
        if (nv != null) {
          // reused vectors: clear stale null bits, then overlay this
          // window's nulls straight off the bitmap (advanceIfNeeded is a
          // container-level skip — cost tracks nulls in window, not docs)
          val vec = vectors(c)
          vec.putNotNulls(0, n)
          val start = docStart + pos
          val end = start + n
          val it = nv.getIntIterator
          it.advanceIfNeeded(start)
          while (it.hasNext && it.peekNext() < end) vec.putNull(it.next() - start)
        }
        c += 1
      }
    }
    batch.setNumRows(n) // empty projection: rows-only batch for COUNT(*)
    pos += n
    true
  }

  override def get(): ColumnarBatch = batch

  override def close(): Unit = {
    try reader.close() catch { case _: Throwable => () }
    if (started) batch.close()
  }
}

/** Spark [[Dictionary]] over decoded Pinot values: the bridge that lets
  * `OnHeapColumnVector` serve reads straight from the segment's decoded
  * dictionary (or RAW value array) without materializing rows.
  */
final class ArrayDictionary private (
    ints: Array[Int], longs: Array[Long], floats: Array[Float],
    doubles: Array[Double], bins: Array[Array[Byte]]) extends Dictionary {
  override def decodeToInt(id: Int): Int = ints(id)
  override def decodeToLong(id: Int): Long = longs(id)
  override def decodeToFloat(id: Int): Float = floats(id)
  override def decodeToDouble(id: Int): Double = doubles(id)
  override def decodeToBinary(id: Int): Array[Byte] = bins(id)
}

object ArrayDictionary {
  def ofInts(v: Array[Int]) = new ArrayDictionary(v, null, null, null, null)
  def ofLongs(v: Array[Long]) = new ArrayDictionary(null, v, null, null, null)
  def ofFloats(v: Array[Float]) = new ArrayDictionary(null, null, v, null, null)
  def ofDoubles(v: Array[Double]) = new ArrayDictionary(null, null, null, v, null)
  def ofBinary(v: Array[Array[Byte]]) = new ArrayDictionary(null, null, null, null, v)
}
