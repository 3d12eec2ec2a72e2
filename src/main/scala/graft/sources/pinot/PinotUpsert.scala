package graft.sources.pinot

import graft.functions.LatestByAgg
import graft.pinot.{PinotFormatException, SegmentIO}
import org.apache.spark.sql.{Column, DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.{ArrayType, BooleanType, StructField, StructType}

/** UPSERT tables (EXTENSION — the capability of Pinot's upsert-enabled
  * REALTIME tables, `upsertConfig.mode=FULL|PARTIAL`: queries see only
  * the LATEST record per primary key, ranked by a comparison column;
  * the reference connector reads segments raw and would surface every
  * superseded version, table.rs:162).
  *
  * The table-level config lives in `upsert.properties` at the table
  * root — table-level like Pinot's table config, NOT per-segment
  * (segments of an upsert table are ordinary segments; only the READ
  * view changes). The discovery walk keys off `metadata.properties`
  * files, so the config file is invisible to segment listing.
  *
  * A PLAIN read of a configured table — `spark.read.format("pinot")
  * .load(dir)`, or catalog SQL — returns the upsert VIEW by default
  * ([[graft.plans.UpsertViewRule]]), exactly like a Pinot query over an
  * upsert table; segment-level inspection of the raw versions needs the
  * explicit `.option("upsertView", "raw")` escape hatch. This API
  * ([[latest]]) is the same view for callers who want it by name.
  *
  * Read semantics = ONE hash aggregate on the key columns, in BOTH
  * modes: [[graft.functions.LatestByAgg]] carries (best cmp, rows at
  * best, winner values) as O(1) associative state, so partials combine
  * map-side and one small row per (group, partition) crosses the wire —
  * no rank window (exchange + SORT), no `count_distinct` tie guard
  * (distinct-expand exchange), and no per-server in-memory key map to
  * blow up, which is exactly the scale limit Pinot's upsert metadata
  * map has. AQE handles skewed keys.
  *
  * LOUD contracts (identical in FULL and PARTIAL mode):
  *  - TIES: Pinot breaks equal comparison values by ingestion order,
  *    which a parallel batch scan cannot reproduce deterministically —
  *    a tie that makes any configured merge undefined REJECTS at
  *    evaluation instead of silently picking a winner (an undefined
  *    answer must never hash-match an oracle by luck). FULL: a tie on
  *    (key, max cmp). PARTIAL: a tie at max for OVERWRITE columns, at
  *    min for IGNORE columns, any duplicate cmp for APPEND columns;
  *    tie-INSENSITIVE strategies (INCREMENT/MAX/MIN/UNION) are
  *    well-defined under duplicates and do not reject.
  *  - NULL comparison values REJECT in both modes (Pinot's comparison
  *    column is a time/sequence column and is never null; silently
  *    ranking NULL first or last would invent an ingestion order).
  *
  * Filters on VALUE columns must stay above the aggregate (pushed below
  * they could delete the winning version and resurrect a superseded
  * one) — and do, because they reference aggregate output. Filters on
  * KEY columns reference only grouping expressions, so Catalyst pushes
  * them below the aggregate and V2 pushdown lands them in the scan: a
  * point lookup on an upsert table reads only the key's segments
  * (pinned in UpsertViewRuleSpec).
  */
object PinotUpsert {

  private val ConfigFile = "upsert.properties"

  /** The per-column merge strategies of Pinot's PARTIAL upsert mode
    * (`partialUpsertStrategies`). Versions of a key merge COLUMN-WISE:
    */
  sealed trait Strategy
  /** value of the LATEST version (max comparison) — Pinot's default. */
  case object Overwrite extends Strategy
  /** value of the FIRST version (min comparison) — Pinot's IGNORE
    * ("ignore new values").
    */
  case object Ignore extends Strategy
  /** sum across versions (numeric). */
  case object Increment extends Strategy
  /** max across versions (numeric). */
  case object Max extends Strategy
  /** min across versions (numeric). */
  case object Min extends Strategy
  /** distinct values across versions, sorted for determinism. On an
    * ARRAY (Pinot multi-value) column this is Pinot's UNION —
    * type-preserving; on a scalar column it is a graft extension whose
    * result type WIDENS to an array, so the transparent read path
    * rejects it loudly (see [[graft.plans.UpsertViewRule]]) and callers
    * use [[latest]].
    */
  case object Union extends Strategy
  /** all values in comparison order; array-in/array-out on MV columns
    * (Pinot's APPEND), type-widening on scalars like [[Union]].
    */
  case object Append extends Strategy

  /** Parsed `upsert.properties`. */
  final case class UpsertConfig(mode: String, keys: Seq[String],
      cmp: String, strategies: Map[String, Strategy],
      deleteCol: Option[String]) {
    /** Columns whose configured merge widens the column type (scalar
      * UNION/APPEND → array): the transparent read path refuses these
      * because a DSv2 relation cannot change its schema.
      */
    def typeWidening(schema: org.apache.spark.sql.types.StructType): Seq[String] =
      if (mode != "PARTIAL") Seq.empty
      else strategies.collect {
        case (c, Union | Append)
            if schema.fields.find(_.name == c)
              .exists(!_.dataType.isInstanceOf[ArrayType]) => c
      }.toSeq.sorted
  }

  private def parseStrategy(s: String): Strategy = s.trim.toUpperCase match {
    case "OVERWRITE" => Overwrite
    case "IGNORE" => Ignore
    case "INCREMENT" => Increment
    case "MAX" => Max
    case "MIN" => Min
    case "UNION" => Union
    case "APPEND" => Append
    case other => throw new PinotFormatException(
      s"upsert: unknown partial strategy '$other' (OVERWRITE, IGNORE, " +
        "INCREMENT, MAX, MIN, UNION, APPEND)")
  }

  /** Declare (tableDir, keys, compareCol) as a FULL-mode upsert table —
    * the analog of setting `upsertConfig` in Pinot's table config.
    * `deleteCol` models Pinot's `deleteRecordColumn`: a BOOLEAN column
    * where true marks the record as a DELETE of its key — if the
    * winning (latest) record of a key is a delete, the key is invisible
    * to queries (a delete superseded by a later re-insert is not).
    */
  def configure(tableDir: String, keys: Seq[String],
      compareCol: String, deleteCol: Option[String] = None): Unit = {
    deleteCol.foreach { dc =>
      require(!keys.contains(dc) && dc != compareCol,
        s"upsert: delete column $dc cannot be a key or comparison column")
    }
    writeConfig(tableDir, "FULL", keys, compareCol, Map.empty, deleteCol)
  }

  /** Declare a PARTIAL-mode upsert table: non-key columns merge per
    * `strategies` (unlisted columns default to OVERWRITE, like Pinot).
    * `deleteCol` models Pinot's `deleteRecordColumn` combined with
    * partial upsert: a winning delete hides its key, and records
    * arriving AFTER a delete merge FROM SCRATCH (Pinot's revive
    * semantics — the pre-delete history is discarded).
    */
  def configurePartial(tableDir: String, keys: Seq[String],
      compareCol: String, strategies: Map[String, String],
      deleteCol: Option[String] = None): Unit = {
    strategies.values.foreach(parseStrategy) // validate before writing
    require(strategies.keySet.intersect(keys.toSet).isEmpty,
      "upsert: key columns cannot carry a partial strategy")
    require(!strategies.contains(compareCol),
      "upsert: the comparison column cannot carry a partial strategy")
    deleteCol.foreach { dc =>
      require(!keys.contains(dc) && dc != compareCol,
        s"upsert: delete column $dc cannot be a key or comparison column")
      require(!strategies.contains(dc),
        s"upsert: delete column $dc cannot carry a partial strategy")
    }
    writeConfig(tableDir, "PARTIAL", keys, compareCol, strategies, deleteCol)
  }

  private def writeConfig(tableDir: String, mode: String, keys: Seq[String],
      compareCol: String, strategies: Map[String, String],
      deleteCol: Option[String]): Unit = {
    require(keys.nonEmpty, "upsert: at least one key column required")
    require(!keys.contains(compareCol),
      s"upsert: comparison column $compareCol cannot be a key column")
    val strat =
      if (strategies.isEmpty) ""
      else "upsert.partial.strategies=" + strategies.toSeq.sorted
        .map { case (c, s) => s"$c:${s.trim.toUpperCase}" }
        .mkString(",") + "\n"
    val del = deleteCol.map(dc => s"upsert.delete.column=$dc\n").getOrElse("")
    val body =
      s"""upsert.mode=$mode
         |upsert.key.columns=${keys.mkString(",")}
         |upsert.comparison.column=$compareCol
         |$strat$del""".stripMargin
    // same IO routing as the read side: hdfs://-hosted tables configure
    // through the Hadoop stack, local paths through NIO
    val io = SegmentIO.forPath(tableDir)
    io.writeFully(io.resolve(tableDir, ConfigFile),
      body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // the table cache fingerprints upsert.properties; a same-millisecond
    // reconfigure still invalidates through the size/content stamp
  }

  /** The declared upsert config of `tableDir`, or a loud failure: a raw
    * read of an upsert table is a different (versioned) relation, so the
    * caller must know which one it wants.
    */
  def config(tableDir: String): UpsertConfig =
    tryConfig(tableDir, SegmentIO.forPath(tableDir)).getOrElse(
      throw new PinotFormatException(
        s"$tableDir is not an upsert table (no $ConfigFile — declare one " +
          "with PinotUpsert.configure)"))

  /** [[tryConfig]] from a recursive listing the caller ALREADY holds
    * (the table-open paths list once for discovery + cache
    * fingerprints): presence resolves from the listing, so a non-upsert
    * open pays ZERO extra round trips and an upsert open pays exactly
    * one GET — the cold-open IO budgets (SegmentIOSpec,
    * PinotControllerSpec) stay intact. Callers without a listing fall
    * back to the probing [[tryConfig]].
    */
  def tryConfigIn(tableDir: String, io: SegmentIO,
      listing: Option[Seq[SegmentIO.FileEntry]]): Option[UpsertConfig] =
    listing match {
      case None => tryConfig(tableDir, io)
      case Some(entries) =>
        val root = io.parent(io.resolve(tableDir, "x"))
        entries.find(e => io.fileName(e.path) == ConfigFile &&
            io.parent(e.path) == root)
          .flatMap(e => tryConfigAt(e.path, io))
    }

  /** `Some(config)` if `tableDir` carries `upsert.properties`, `None`
    * if not; a PRESENT-but-malformed config fails loudly (a table the
    * user declared as upsert must never silently read raw).
    */
  def tryConfig(tableDir: String, io: SegmentIO): Option[UpsertConfig] = {
    val p = io.resolve(tableDir, ConfigFile)
    if (!io.exists(p)) return None
    tryConfigAt(p, io)
  }

  private def tryConfigAt(p: String, io: SegmentIO): Option[UpsertConfig] = {
    val props = new String(io.readFully(p),
      java.nio.charset.StandardCharsets.UTF_8)
      .linesIterator.filter(_.contains('='))
      .map { l => val i = l.indexOf('='); l.take(i) -> l.drop(i + 1) }
      .toMap
    val keys = props.getOrElse("upsert.key.columns",
      throw new PinotFormatException(
        s"$p: missing upsert.key.columns")).split(',').map(_.trim).toSeq
    val cmp = props.getOrElse("upsert.comparison.column",
      throw new PinotFormatException(s"$p: missing upsert.comparison.column"))
    val mode = props.getOrElse("upsert.mode", "FULL")
    val strategies = props.get("upsert.partial.strategies")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).map { ent =>
        ent.split(":") match {
          case Array(c, s) => c.trim -> parseStrategy(s)
          case _ => throw new PinotFormatException(
            s"$p: bad partial strategy entry '$ent' (<column>:<STRATEGY>)")
        }
      }.toMap)
      .getOrElse(Map.empty[String, Strategy])
    Some(UpsertConfig(mode, keys, cmp, strategies,
      props.get("upsert.delete.column")))
  }

  /** The upsert VIEW of `tableDir` — what a Pinot query over an upsert
    * REALTIME table returns (see object doc for the mode semantics and
    * loud contracts). Columns come back in the table's schema order;
    * the delete-marker column stays visible (it is an ordinary Pinot
    * column — every surviving row carries false).
    */
  def latest(s: SparkSession, tableDir: String): DataFrame = {
    val cfg = config(tableDir)
    // raw: the view applies HERE — the transparent-read rule must not
    // wrap the scan a second time
    val df = s.read.format("pinot").option("upsertView", "raw").load(tableDir)
    viewOver(df, tableDir, cfg)
  }

  /** The view transformation over an already-loaded RAW frame — shared
    * by [[latest]] and [[graft.plans.UpsertViewRule]] (the transparent
    * read path).
    */
  private[graft] def viewOver(df: DataFrame, tableDir: String,
      cfg: UpsertConfig): DataFrame = {
    val missing = (cfg.keys :+ cfg.cmp).filterNot(df.columns.contains) ++
      cfg.strategies.keys.filterNot(df.columns.contains) ++
      cfg.deleteCol.filterNot(df.columns.contains)
    if (missing.nonEmpty)
      throw new PinotFormatException(
        s"upsert table $tableDir: configured columns ${missing.mkString(",")} " +
          "not present in the segment schema")
    cfg.mode match {
      case "FULL" =>
        val winners = latestFull(df, tableDir, cfg.keys, cfg.cmp)
        // deleteRecordColumn semantics: the filter applies to the
        // WINNER — a delete superseded by a later re-insert stays
        // visible, a winning delete hides its key
        cfg.deleteCol.fold(winners)(dc =>
          // NULL delete markers count as not-deleted (Pinot's column is
          // non-null boolean; nullable readers shouldn't hide keys)
          winners.filter(!coalesce(col(dc), lit(false))))
      case "PARTIAL" =>
        latestPartial(df, tableDir, cfg.keys, cfg.cmp, cfg.strategies,
          cfg.deleteCol)
      case other => throw new PinotFormatException(
        s"upsert table $tableDir: unknown mode $other")
    }
  }

  private def keyDesc(keys: Seq[String]): Column =
    concat_ws(",", keys.map(col): _*)

  /** Upsert COMPACTION (EXTENSION — the capability of Pinot's
    * UpsertCompactionTask): rewrite the table's segments keeping only
    * each key's CURRENT face, so storage stops growing with version
    * count and a raw scan of the compacted table equals the view.
    *
    *  - FULL mode keeps the winning row per key — INCLUDING winning
    *    delete markers (Pinot's deletedKeysTTL=∞ behavior): dropping a
    *    tombstone would let a late arrival OLDER than the delete win a
    *    key the user deleted. The view filters them, exactly as before.
    *  - PARTIAL mode writes the merged row per live key, plus each dead
    *    key's winning tombstone ROW (its own values — no NULL backfill,
    *    no schema change) for the same late-arrival protection.
    *    Type-widening strategies (scalar UNION/APPEND) cannot rewrite in
    *    place and reject loudly.
    *
    * Idempotent: compacting a compacted table is a no-op rewrite (every
    * key already has one row). The view stays correct THROUGHOUT — it
    * never assumed one-version-per-key. Index/nullable/time configs
    * survive when every source segment agrees (the same unanimity rule
    * as [[graft.pinot.PinotCompact.compact]]); the swap is minion-style
    * single-process like all graft maintenance ops.
    */
  def compact(s: SparkSession, tableDir: String): Unit = {
    // remote-capable (r16): the Spark rewrite always lands in a LOCAL
    // staging table (the DSv2 writer is local by design); for a
    // URI-schemed table the verified staging segments then upload
    // through the SegmentIO seam and swap in under the same marker
    // protocol — the pre-r16 loud reject is gone
    val cfg = config(tableDir)
    val raw = s.read.format("pinot").option("upsertView", "raw")
      .load(tableDir)
    val widening = cfg.typeWidening(raw.schema)
    if (widening.nonEmpty)
      throw new PinotFormatException(
        s"upsert compaction of $tableDir: partial strategies on " +
          s"${widening.mkString(",")} widen scalar columns to arrays — " +
          "the merged rows cannot rewrite into the table's own schema")
    val kept: DataFrame = cfg.mode match {
      case "FULL" => latestFull(raw, tableDir, cfg.keys, cfg.cmp)
      case "PARTIAL" =>
        val live = latestPartial(raw, tableDir, cfg.keys, cfg.cmp,
          cfg.strategies, cfg.deleteCol)
        cfg.deleteCol match {
          case None => live
          case Some(dc) =>
            val isDel = coalesce(col(dc), lit(false))
            // dead keys (no revival past their newest tombstone) keep
            // the tombstone row itself; ties delete-vs-live already
            // reject inside the live computation
            val tombAll = latestFull(raw.filter(isDel), tableDir,
              cfg.keys, cfg.cmp)
            val lastLive = raw.filter(!isDel)
              .groupBy(cfg.keys.map(col): _*)
              .agg(max(col(cfg.cmp)).as("_live_cmp"))
            val tomb = tombAll.join(lastLive, cfg.keys, "left")
              .filter(col("_live_cmp").isNull ||
                col("_live_cmp") < col(cfg.cmp))
              .drop("_live_cmp")
            live.unionByName(tomb)
        }
      case other => throw new PinotFormatException(
        s"upsert table $tableDir: unknown mode $other")
    }

    // index/nullable/time configs survive on per-column unanimity
    val io = SegmentIO.forPath(tableDir)
    val segs = PinotSegments.discoverDirs(tableDir, io)
    val metas = segs.map(PinotSegments.metaOf(_, io))
    val colNames = raw.columns.toSeq
    def unanimous(p: graft.pinot.ColumnMetadata => Boolean): Seq[String] =
      colNames.filter(c => metas.forall(m =>
        m.columns.get(c).exists(p)))
    def opt(w: org.apache.spark.sql.DataFrameWriter[Row], key: String,
        cols: Seq[String]): Unit =
      if (cols.nonEmpty) { w.option(key, cols.mkString(",")); () }
    val sketchCols = colNames.flatMap { c =>
      metas.flatMap(_.columns.get(c).flatMap(_.sketchSpec)).distinct match {
        case Seq(sp) if metas.forall(_.columns.get(c)
            .exists(_.sketchSpec.isDefined)) => Some(s"$c:$sp")
        case _ => None
      }
    }

    val expect = kept.count()
    val remote = io ne graft.pinot.LocalSegmentIO
    // the rewrite ALWAYS lands in a local staging table first (the DSv2
    // writer is local); for a local table that staging doubles as the
    // swap-in tmp sibling, for a remote one it is a temp dir whose
    // verified segments upload through the seam
    val tmpTable =
      if (remote)
        java.nio.file.Files.createTempDirectory("upsert_compact_remote")
          .resolve(io.fileName(tableDir))
      else {
        val root = java.nio.file.Paths.get(tableDir)
        root.resolveSibling(root.getFileName.toString + ".upsert_compact_tmp")
      }
    graft.pinot.PinotCompact.deleteRecursively(tmpTable)
    val w = kept.write.format("pinot").mode("append")
    opt(w, "invertedIndexColumns", unanimous(_.hasInvertedIndex))
    opt(w, "bloomFilterColumns", unanimous(_.hasBloomFilter))
    opt(w, "rangeIndexColumns", unanimous(_.hasRangeIndex))
    opt(w, "textIndexColumns", unanimous(_.hasTextIndex))
    opt(w, "jsonIndexColumns", unanimous(_.hasJsonIndex))
    opt(w, "nullableColumns", unanimous(_.hasNullVector))
    if (sketchCols.nonEmpty) w.option("sketchColumns", sketchCols.mkString(","))
    metas.head.timeColumn.foreach(tc => w.option("timeColumn", tc))
    w.save(tmpTable.toString)
    val written = PinotSegments
      .discoverDirs(tmpTable.toString, graft.pinot.LocalSegmentIO)
      .map(d => PinotSegments.metaOf(d, graft.pinot.LocalSegmentIO)
        .totalDocs.toLong).sum
    require(written == expect,
      s"upsert compaction of $tableDir: wrote $written rows, expected " +
        s"$expect — aborting before the swap")
    if (remote) {
      try remoteUpsertSwap(tableDir, io, tmpTable, segs, expect)
      finally graft.pinot.PinotCompact.deleteRecursively(tmpTable.getParent)
    } else {
      val root = java.nio.file.Paths.get(tableDir)
      // minion-style swap: old segments out, compacted segments in;
      // upsert.properties stays (the table remains upsert-configured).
      // Marker-guarded: a crash inside the window fails the NEXT open
      // loudly instead of serving partial segments (rows recoverable
      // from the tmp table)
      graft.pinot.PinotCompact.writeSwapMarker(root, "upsert-compact",
        tmpTable)
      segs.map(p => java.nio.file.Paths.get(p))
        .map(p => if (p.getFileName.toString == "v3") p.getParent else p)
        .foreach(graft.pinot.PinotCompact.deleteRecursively)
      java.nio.file.Files.list(tmpTable).forEach { child =>
        if (java.nio.file.Files.isDirectory(child)) {
          java.nio.file.Files.move(child,
            root.resolve(child.getFileName.toString))
          ()
        }
      }
      // tmp-table cleanup BEFORE the marker clears: a crash between the
      // two leaves the marker, so the next open fails loudly and names the
      // already-completed swap — whereas clearing first could strand a
      // full sibling copy of the table on disk with no signal, reclaimed
      // only if another compaction of the same table ever runs
      graft.pinot.PinotCompact.deleteRecursively(tmpTable)
      graft.pinot.PinotCompact.clearSwapMarker(root)
      graft.pinot.TableManifest.refresh(root)
    }
  }

  /** Upload the locally staged compacted table and swap it into a
    * REMOTE upsert table: every staged segment dir lands under ONE
    * discovery-invisible `tmp_upsert_compact` remote dir, the total doc
    * count is re-verified THROUGH the remote stack, and only then does
    * the marker-guarded swap delete the old segments and rename the new
    * ones in. `upsert.properties` at the table root is never touched.
    */
  private def remoteUpsertSwap(tableDir: String, io: SegmentIO,
      staging: java.nio.file.Path, oldSegs: Seq[String],
      expect: Long): Unit = {
    val remoteTmp = io.resolve(tableDir, "tmp_upsert_compact")
    io.deleteRecursively(remoteTmp)
    val stagedSegs = {
      import scala.jdk.CollectionConverters._
      val ls = java.nio.file.Files.list(staging)
      try ls.iterator().asScala
        .filter(java.nio.file.Files.isDirectory(_)).toSeq
      finally ls.close()
    }
    stagedSegs.foreach { d =>
      graft.pinot.PinotCompact.uploadTree(d,
        io.resolve(remoteTmp, d.getFileName.toString), io)
    }
    // read-back verification THROUGH the remote stack before any delete
    val readBack = PinotSegments.discoverDirs(remoteTmp, io)
      .map(d => PinotSegments.metaOf(d, io).totalDocs.toLong).sum
    require(readBack == expect,
      s"upsert compaction of $tableDir: remote read-back saw $readBack " +
        s"rows, expected $expect — aborting before the swap")
    graft.pinot.PinotCompact.writeSwapMarker(tableDir, "upsert-compact",
      remoteTmp, io)
    oldSegs.map(p => if (io.fileName(p) == "v3") io.parent(p) else p)
      .foreach(io.deleteRecursively)
    io.listAll(remoteTmp).filter(io.isDirectory).foreach { child =>
      io.rename(child, io.resolve(tableDir, io.fileName(child)))
    }
    io.deleteRecursively(
      io.resolve(tableDir, graft.pinot.TableManifest.FileName))
    io.deleteRecursively(remoteTmp)
    graft.pinot.PinotCompact.clearSwapMarker(tableDir, io)
  }

  /** The STREAMING upsert view over the Pinot tail — how Pinot's
    * REALTIME upsert behaves in production: `readStream("pinot")` on
    * the table directory, with latest-per-key state driven by the SAME
    * `upsert.properties` the batch view reads (keys, comparison column,
    * FULL/PARTIAL strategies, delete markers). Every micro-batch emits
    * each TOUCHED key's current merged row (update-mode semantics), so
    * an update sink materializes the view incrementally; state is ONE
    * small row per live key — the bound Pinot's primary-key metadata
    * map carries, here spread across executors and checkpointed.
    *
    * Delete markers EMIT (they are the retraction signal a sink needs):
    * FULL mode emits the winning row with its marker column true;
    * PARTIAL mode emits a tombstone row — keys + marker true + the
    * tombstone's comparison value, merged columns NULL. Consumers
    * filter `!delete` exactly like the batch view does internally.
    *
    * Loud contracts, same as batch: NULL comparison values and
    * strategy-undefining ties reject. Two extra contracts streaming
    * adds: APPEND is batch-only (its total order needs the full version
    * history, which bounded state cannot keep), and a LATE delete
    * marker — older than versions already merged into PARTIAL state —
    * rejects (merged history cannot be retracted; Pinot's in-order
    * Kafka partitions never produce this, a replayed tail could).
    */
  def latestStream(s: SparkSession, tableDir: String): DataFrame = {
    val cfg = config(tableDir)
    // raw: the stateful view applies HERE — the scan's raw-stream guard
    // must let this tail through
    latestStreamOver(
      s.readStream.format("pinot").option("upsertView", "raw")
        .load(tableDir), tableDir, cfg)
  }

  /** The stateful view over an already-loaded stream — split from
    * [[latestStream]] so specs can drive it from MemoryStream too.
    */
  private[graft] def latestStreamOver(df: DataFrame, tableDir: String,
      cfg: UpsertConfig): DataFrame = {
    val schema = df.schema
    val missing = (cfg.keys :+ cfg.cmp).filterNot(schema.fieldNames.contains) ++
      cfg.strategies.keys.filterNot(schema.fieldNames.contains) ++
      cfg.deleteCol.filterNot(schema.fieldNames.contains)
    if (missing.nonEmpty)
      throw new PinotFormatException(
        s"upsert table $tableDir: configured columns ${missing.mkString(",")} " +
          "not present in the segment schema")
    val partial = cfg.mode match {
      case "FULL" => false
      case "PARTIAL" => true
      case other => throw new PinotFormatException(
        s"upsert table $tableDir: unknown mode $other")
    }
    if (partial && cfg.strategies.values.exists(_ == Append))
      throw new PinotFormatException(
        s"upsert table $tableDir: the APPEND strategy needs the full " +
          "version history and is batch-only — use PinotUpsert.latest")

    val keys = cfg.keys
    val cmp = cfg.cmp
    val cmpIdx = schema.fieldIndex(cmp)
    val keyIdx = keys.map(schema.fieldIndex).toArray
    val delIdx = cfg.deleteCol.map(schema.fieldIndex).getOrElse(-1)
    def stratOf(i: Int): Strategy = {
      val n = schema.fields(i).name
      if (!partial || keys.contains(n) || n == cmp) Overwrite
      else if (cfg.deleteCol.contains(n)) Overwrite
      else cfg.strategies.getOrElse(n, Overwrite)
    }
    val strat: Array[Strategy] = schema.fields.indices.map(stratOf).toArray
    val valueIdx = schema.fields.indices
      .filterNot(i => keyIdx.contains(i) || i == cmpIdx).toArray
    val anyOverwrite = valueIdx.exists(i => strat(i) == Overwrite)
    val anyIgnore = valueIdx.exists(i => strat(i) == Ignore)

    // output = the view schema: scalar UNION widens to an array exactly
    // like the batch view; everything nullable (tombstones carry NULLs)
    val outSchema = StructType(schema.fields.map { f =>
      val dt =
        if (partial && cfg.strategies.get(f.name).contains(Union) &&
            !f.dataType.isInstanceOf[ArrayType])
          ArrayType(f.dataType, containsNull = false)
        else f.dataType
      StructField(f.name, dt, nullable = true)
    })
    val n = outSchema.length
    // state = the merged row + (min cmp for IGNORE, latest tombstone
    // cmp, dead = tombstoned with no revival yet)
    val stateSchema = StructType(outSchema.fields ++ Seq(
      StructField("_min_cmp", schema(cmp).dataType, nullable = true),
      StructField("_del_cmp", schema(cmp).dataType, nullable = true),
      StructField("_dead", BooleanType, nullable = false)))
    val keySchema = StructType(keyIdx.toSeq.map(i =>
      schema.fields(i).copy(nullable = true)))

    def ord(a: Any, b: Any): Int =
      a.asInstanceOf[Comparable[Any]].compareTo(b)
    def nullCmpError() = throw new PinotFormatException(
      s"upsert table $tableDir: NULL $cmp — the comparison column must " +
        "never be null")
    def tieError(what: String) = throw new PinotFormatException(
      s"upsert table $tableDir: duplicate $cmp — $what is undefined " +
        "under a tie")
    def addNum(a: Any, b: Any): Any = (a, b) match {
      case (null, x) => x
      case (x, null) => x
      case (x: Long, y: Long) => x + y
      case (x: Int, y: Int) => x + y
      case (x: Double, y: Double) => x + y
      case (x: Float, y: Float) => x + y
      case (x: Short, y: Short) => (x + y).toShort
      case (x: java.math.BigDecimal, y: java.math.BigDecimal) => x.add(y)
      case other => throw new PinotFormatException(
        s"upsert INCREMENT: non-numeric values $other")
    }
    // Row array columns surface as scala.collection.Seq (ArraySeq) —
    // normalize before merging
    def asSeq(v: Any): Seq[Any] = v match {
      case null => Seq.empty
      case s: scala.collection.Seq[_] => s.toSeq.asInstanceOf[Seq[Any]]
      case other => Seq(other)
    }
    // NULL elements of an MV column survive the merge (one distinct
    // null, sorted first) — exactly the batch view's
    // array_distinct(flatten(collect_list()))/sort_array semantics, so
    // latest and latestStream answer identically on MV UNION columns
    // (r14 ADVICE). Scalar-widened UNION never sees nulls here (a null
    // scalar contributes an empty Seq via asSeq), matching batch
    // collect_set, which drops them.
    def ordNullsFirst(a: Any, b: Any): Int =
      if (a == null && b == null) 0
      else if (a == null) -1
      else if (b == null) 1
      else ord(a, b)
    def unionMerge(cur: Any, add: Seq[Any]): Any =
      (asSeq(cur) ++ add).distinct
        .sortWith((a, b) => ordNullsFirst(a, b) < 0)

    val fn = (key: Row, it: Iterator[Row], gs: GroupState[Row]) => {
      var vals: Array[Any] = null
      var minCmp: Any = null
      var delCmp: Any = null
      var dead = false
      gs.getOption.foreach { st =>
        minCmp = st.get(n)
        delCmp = st.get(n + 1)
        dead = st.getBoolean(n + 2)
        if (!dead) vals = Array.tabulate(n)(st.get)
      }
      // fold the batch in comparison order: within a batch this IS the
      // ingestion order Pinot would apply
      val rows = it.toArray
      rows.foreach(r => if (r.get(cmpIdx) == null) nullCmpError())
      java.util.Arrays.sort(rows.asInstanceOf[Array[Object]],
        (a: Object, b: Object) => ord(a.asInstanceOf[Row].get(cmpIdx),
          b.asInstanceOf[Row].get(cmpIdx)))
      rows.foreach { r =>
        val c = r.get(cmpIdx)
        val isDel = delIdx >= 0 && r.get(delIdx) == true
        if (!partial) {
          // FULL: keep the winning raw row (marker column included)
          if (vals == null || ord(c, vals(cmpIdx)) > 0)
            vals = Array.tabulate(n)(r.get)
          else if (ord(c, vals(cmpIdx)) == 0) tieError("the latest record")
        } else if (isDel) {
          if (vals != null) {
            val d = ord(c, vals(cmpIdx))
            if (d < 0) throw new PinotFormatException(
              s"upsert table $tableDir: late delete marker at $cmp=$c " +
                "is older than already-merged versions — merged history " +
                "cannot be retracted")
            if (d == 0) tieError("whether the latest record was deleted")
          }
          if (delCmp == null || ord(c, delCmp) > 0) delCmp = c
          vals = null; minCmp = null; dead = true
        } else {
          if (delCmp != null) {
            val d = ord(c, delCmp)
            if (d == 0) tieError("whether this record was deleted")
            if (d < 0) () // pre-delete history: discarded (revive-from-scratch)
          }
          if (delCmp == null || ord(c, delCmp) > 0) {
            if (vals == null) {
              dead = false
              vals = new Array[Any](n)
              keyIdx.foreach(i => vals(i) = r.get(i))
              vals(cmpIdx) = c
              minCmp = c
              valueIdx.foreach { i =>
                vals(i) = strat(i) match {
                  case Union => unionMerge(null, asSeq(r.get(i)))
                  case _ => r.get(i)
                }
              }
            } else {
              val d = ord(c, vals(cmpIdx))
              if (d == 0 && anyOverwrite) tieError("the OVERWRITE winner")
              val dMin = ord(c, minCmp)
              if (dMin == 0 && anyIgnore) tieError("the IGNORE winner")
              valueIdx.foreach { i =>
                strat(i) match {
                  case Overwrite => if (d > 0) vals(i) = r.get(i)
                  case Ignore => if (dMin < 0) vals(i) = r.get(i)
                  case Increment => vals(i) = addNum(vals(i), r.get(i))
                  case Max =>
                    val v = r.get(i)
                    if (v != null && (vals(i) == null || ord(v, vals(i)) > 0))
                      vals(i) = v
                  case Min =>
                    val v = r.get(i)
                    if (v != null && (vals(i) == null || ord(v, vals(i)) < 0))
                      vals(i) = v
                  case Union => vals(i) = unionMerge(vals(i), asSeq(r.get(i)))
                  case Append => () // rejected above
                }
              }
              if (d > 0) vals(cmpIdx) = c
              if (dMin < 0) minCmp = c
            }
          }
        }
      }
      // persist + emit the touched key's current face
      val stateVals: Array[Any] =
        (if (vals == null) new Array[Any](n) else vals.clone()) ++
          Array[Any](minCmp, delCmp, dead)
      gs.update(new org.apache.spark.sql.catalyst.expressions.GenericRow(
        stateVals).asInstanceOf[Row])
      if (vals != null) {
        Iterator.single(Row.fromSeq(vals.toIndexedSeq))
      } else if (dead) {
        // PARTIAL tombstone: the retraction row a sink applies
        val out = new Array[Any](n)
        keyIdx.foreach(i => out(i) = key.get(keyIdx.indexOf(i)))
        out(cmpIdx) = delCmp
        if (delIdx >= 0) out(delIdx) = true
        Iterator.single(Row.fromSeq(out.toIndexedSeq))
      } else Iterator.empty
    }

    df.groupByKey(r => Row.fromSeq(keyIdx.toIndexedSeq.map(r.get)))(
      Encoders.row(keySchema))
      .flatMapGroupsWithState[Row, Row](
        OutputMode.Update, GroupStateTimeout.NoTimeout)(fn)(
        Encoders.row(stateSchema), Encoders.row(outSchema))
  }

  /** FULL mode: ONE hash aggregate — [[LatestByAgg]] carries the whole
    * winning row as its O(1) state, so there is no window, no sort, and
    * no second exchange; the loud tie / NULL-cmp contracts evaluate on
    * the aggregated evidence (`ties`, `null_cmp`).
    */
  private def latestFull(df: DataFrame, tableDir: String,
      keys: Seq[String], cmp: String): DataFrame = {
    val others = df.columns.toSeq.filterNot(keys.contains)
    val agg = df.groupBy(keys.map(col): _*)
      .agg(LatestByAgg.latestBy(struct(others.map(col): _*), col(cmp))
        .as("_w"))
    val guard = when(col("_w").getField("null_cmp"), raise_error(concat(
      lit(s"upsert table $tableDir: NULL $cmp within ("), keyDesc(keys),
      lit(") — the comparison column must never be null; an ingestion " +
        "order for NULL cannot be reconstructed"))))
      .when(col("_w").getField("ties") > 1, raise_error(concat(
        lit(s"upsert table $tableDir: tie on ("), keyDesc(keys),
        lit(s") at the max $cmp — latest record is undefined; " +
          "Pinot breaks this by ingestion order, which a parallel " +
          "batch scan cannot reproduce"))))
    agg
      .withColumn("_upsert_guard", guard)
      .where(col("_upsert_guard").isNull)
      .select(df.columns.toSeq.map { c =>
        if (keys.contains(c)) col(c)
        else col("_w").getField("v").getField(c).as(c)
      }: _*)
  }

  /** PARTIAL mode: versions of a key merge COLUMN-WISE per the declared
    * strategies (unlisted non-key columns OVERWRITE) — ONE hash
    * aggregate on the key with map-side partials. OVERWRITE/IGNORE ride
    * [[LatestByAgg]] (winner + tie evidence in one state); INCREMENT/
    * MAX/MIN/UNION are plain tie-insensitive aggregates; APPEND collects
    * (cmp, value) pairs and proves its total order from the collected
    * list itself. NULL-cmp detection is `count(*) != count(cmp)` — two
    * cheap counters in the SAME aggregate, not a distinct expand.
    *
    * With a delete column, records merge FROM SCRATCH after a key's
    * latest delete (Pinot's revive semantics). That needs the last
    * delete per key BEFORE merging — one extra aggregate whose scan
    * reads ONLY tombstone rows (the delete filter pushes into the Pinot
    * scan) and whose result BROADCASTS back over the table (dead keys ≪
    * rows, so the main side never shuffles for the join; plan pinned in
    * PlanAuditSpec). The one shape in the upsert family that costs a
    * second aggregate; the deleteless path stays single-aggregate.
    */
  private def latestPartial(df: DataFrame, tableDir: String,
      keys: Seq[String], cmp: String,
      strategies: Map[String, Strategy],
      deleteCol: Option[String]): DataFrame = {
    val base = deleteCol match {
      case None => df
      case Some(dc) =>
        val isDel = coalesce(col(dc), lit(false))
        // NULL-cmp rejection as its OWN single-expression filter BEFORE
        // the revive machinery: inside the revive filter's conjunction a
        // NULL cmp nulls the `cmp > _del_cmp` conjunct, and conjunct
        // splitting/reordering could silently DROP the row instead of
        // rejecting it (r14 ADVICE). A CASE expression cannot be split.
        val checkedNull = df.where(
          when(col(cmp).isNull, raise_error(concat(
            lit(s"upsert table $tableDir: NULL $cmp within ("),
            keyDesc(keys),
            lit(") — the comparison column must never be null"))))
            .otherwise(lit(true)))
        // per-key latest delete marker (cmp of the newest tombstone)
        val lastDel = checkedNull.filter(isDel)
          .groupBy(keys.map(col): _*)
          .agg(max(col(cmp)).as("_del_cmp"))
        // revive-from-scratch: only versions NEWER than the latest
        // delete merge; a key whose newest record IS the delete keeps
        // no rows and disappears. The delete-marker TIE rejection rides
        // the same single expression (a non-delete record at exactly the
        // tombstone's cmp is undefined — the guard branch evaluates
        // before the comparison can discard the row).
        checkedNull.join(lastDel, keys, "left")
          .where(col("_del_cmp").isNull ||
            when(col(cmp) === col("_del_cmp") && !isDel,
              raise_error(concat(
                lit(s"upsert table $tableDir: a record ties its key's " +
                  s"delete marker on $cmp ("), keyDesc(keys),
                lit(") — whether it was deleted is undefined"))))
              .otherwise(col(cmp) > col("_del_cmp")))
          .drop("_del_cmp")
    }

    val valueCols = df.columns.toSeq.filterNot(c =>
      keys.contains(c) || c == cmp)
    def stratOf(c: String): Strategy =
      if (deleteCol.contains(c)) Overwrite
      else strategies.getOrElse(c, Overwrite)
    def isArray(c: String): Boolean =
      df.schema(c).dataType.isInstanceOf[ArrayType]
    val merged = valueCols.map { c =>
      (stratOf(c) match {
        case Overwrite => LatestByAgg.latestBy(col(c), col(cmp))
        case Ignore => LatestByAgg.earliestBy(col(c), col(cmp))
        // sum widens (int → bigint, decimal precision); cast back so the
        // view preserves the table schema (Pinot's INCREMENT keeps the
        // column type)
        case Increment => sum(col(c)).cast(df.schema(c).dataType)
        case Max => max(col(c))
        case Min => min(col(c))
        case Union =>
          if (isArray(c))
            // Pinot's UNION on a multi-value column: distinct elements
            // across versions, type-preserving
            sort_array(array_distinct(flatten(collect_list(col(c)))))
          else sort_array(collect_set(col(c)))
        case Append =>
          // the raw (cmp, value) pairs, sorted by cmp — the dup-cmp
          // guard proves the total order from this list and the final
          // select projects the values out
          sort_array(collect_list(struct(col(cmp).as("_c"), col(c).as("_x"))))
      }).as(s"_m_$c")
    }
    val counters = Seq(
      count(lit(1)).as("_n"),
      count(col(cmp)).as("_n_cmp"), // non-null count: no distinct expand
      max(col(cmp)).as("_m_cmp"))
    val agg = base.groupBy(keys.map(col): _*)
      .agg((merged ++ counters).head, (merged ++ counters).tail: _*)

    // loud contracts on the aggregated evidence — one WHEN chain, no
    // second pass. All OVERWRITE columns share (key, cmp), so checking
    // the first of each strategy class covers them all.
    val firstOw = valueCols.find(c => stratOf(c) == Overwrite)
    val firstIg = valueCols.find(c => stratOf(c) == Ignore)
    val firstAp = valueCols.find(c => stratOf(c) == Append)
    def tieErr(what: String) = raise_error(concat(
      lit(s"upsert table $tableDir: duplicate $cmp within ("),
      keyDesc(keys),
      lit(s") — $what is undefined under a tie")))
    var guard = when(col("_n") =!= col("_n_cmp"), raise_error(concat(
      lit(s"upsert table $tableDir: NULL $cmp within ("), keyDesc(keys),
      lit(") — the comparison column must never be null"))))
    firstOw.foreach { c =>
      guard = guard.when(
        col(s"_m_$c").getField("ties") > 1, tieErr("the OVERWRITE winner"))
    }
    firstIg.foreach { c =>
      guard = guard.when(
        col(s"_m_$c").getField("ties") > 1, tieErr("the IGNORE winner"))
    }
    firstAp.foreach { c =>
      val cmps = transform(col(s"_m_$c"), p => p.getField("_c"))
      guard = guard.when(
        size(array_distinct(cmps)) =!= size(cmps), tieErr("APPEND order"))
    }

    agg
      .withColumn("_upsert_guard", guard)
      .where(col("_upsert_guard").isNull)
      .select(df.columns.toSeq.map { c =>
        if (keys.contains(c)) col(c)
        else if (c == cmp) col("_m_cmp").as(cmp)
        else stratOf(c) match {
          case Overwrite | Ignore =>
            col(s"_m_$c").getField("v").as(c)
          case Append =>
            val vals = transform(col(s"_m_$c"), p => p.getField("_x"))
            (if (isArray(c)) flatten(vals) else vals).as(c)
          case _ => col(s"_m_$c").as(c)
        }
      }: _*)
  }
}
