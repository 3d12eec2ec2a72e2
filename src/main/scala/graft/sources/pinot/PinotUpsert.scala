package graft.sources.pinot

import graft.pinot.{PinotFormatException, SegmentIO}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** UPSERT tables (EXTENSION — the capability of Pinot's upsert-enabled
  * REALTIME tables, `upsertConfig.mode=FULL`: queries see only the
  * LATEST record per primary key, ranked by a comparison column; the
  * reference connector reads segments raw and would surface every
  * superseded version, table.rs:162).
  *
  * The table-level config lives in `upsert.properties` at the table
  * root — table-level like Pinot's table config, NOT per-segment
  * (segments of an upsert table are ordinary segments; only the READ
  * view changes). The discovery walk keys off `metadata.properties`
  * files, so the config file is invisible to segment listing.
  *
  * Read semantics = one declarative window: rank per key by comparison
  * value DESCENDING, keep rank 1. At 100 TB that is ONE hash exchange
  * on the key columns (AQE handles skewed keys) — no per-server
  * in-memory key map to blow up, which is exactly the scale limit
  * Pinot's upsert metadata map has.
  *
  * TIES: Pinot breaks equal comparison values by ingestion order,
  * which a parallel batch scan cannot reproduce deterministically —
  * so a tie on (key, max comparison value) REJECTS LOUDLY at
  * evaluation instead of silently picking an arbitrary winner
  * (an undefined answer must never hash-match an oracle by luck).
  *
  * Filters on the RESULT must stay above the window (a filter pushed
  * below rank() could delete the winning version and resurrect a
  * superseded one); filters that only touch the key columns are safe
  * to push, which Spark does not infer — callers filter after
  * [[latest]], trading pushdown for correctness.
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
  /** distinct values across versions, sorted for determinism. */
  case object Union extends Strategy
  /** all values in comparison order. */
  case object Append extends Strategy

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
    */
  def configurePartial(tableDir: String, keys: Seq[String],
      compareCol: String, strategies: Map[String, String]): Unit = {
    strategies.values.foreach(parseStrategy) // validate before writing
    require(strategies.keySet.intersect(keys.toSet).isEmpty,
      "upsert: key columns cannot carry a partial strategy")
    require(!strategies.contains(compareCol),
      "upsert: the comparison column cannot carry a partial strategy")
    writeConfig(tableDir, "PARTIAL", keys, compareCol, strategies, None)
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
    java.nio.file.Files.write(
      java.nio.file.Paths.get(tableDir).resolve(ConfigFile),
      body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ()
  }

  /** The declared upsert config of `tableDir` — (mode, keys, comparison
    * column, partial strategies) — or a loud failure: a raw read of an
    * upsert table is a different (versioned) relation, so the caller
    * must know which one it wants.
    */
  def config(tableDir: String)
      : (String, Seq[String], String, Map[String, Strategy], Option[String]) = {
    val io = SegmentIO.forPath(tableDir)
    val p = io.resolve(tableDir, ConfigFile)
    if (!io.exists(p))
      throw new PinotFormatException(
        s"$tableDir is not an upsert table (no $ConfigFile — declare one " +
          "with PinotUpsert.configure)")
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
    (mode, keys, cmp, strategies, props.get("upsert.delete.column"))
  }

  /** The upsert VIEW of `tableDir` — what a Pinot query over an upsert
    * REALTIME table returns:
    *
    *  - FULL mode: only the latest record per key (greatest comparison
    *    value) is visible. Ties on (key, max comparison) reject loudly
    *    (see class doc).
    *  - PARTIAL mode: versions of a key merge COLUMN-WISE per the
    *    declared strategies (unlisted non-key columns OVERWRITE) — ONE
    *    hash aggregate on the key, with map-side partials, which at
    *    100 TB beats even the FULL window (no sort). Comparison ties
    *    reject loudly for the same reason: OVERWRITE/IGNORE pick "the
    *    value at the max/min comparison", undefined under a tie.
    */
  def latest(s: SparkSession, tableDir: String): DataFrame = {
    val (mode, keys, cmp, strategies, deleteCol) = config(tableDir)
    val df = s.read.format("pinot").load(tableDir)
    val missing = (keys :+ cmp).filterNot(df.columns.contains) ++
      strategies.keys.filterNot(df.columns.contains) ++
      deleteCol.filterNot(df.columns.contains)
    if (missing.nonEmpty)
      throw new PinotFormatException(
        s"upsert table $tableDir: configured columns ${missing.mkString(",")} " +
          "not present in the segment schema")
    mode match {
      case "FULL" =>
        val winners = latestFull(df, tableDir, keys, cmp)
        // deleteRecordColumn semantics: the filter applies to the
        // WINNER — a delete superseded by a later re-insert stays
        // visible, a winning delete hides its key
        deleteCol.fold(winners)(dc =>
          // NULL delete markers count as not-deleted (Pinot's column is
          // non-null boolean; nullable readers shouldn't hide keys)
          winners.filter(!coalesce(col(dc), lit(false))).drop(dc))
      case "PARTIAL" => latestPartial(df, tableDir, keys, cmp, strategies)
      case other => throw new PinotFormatException(
        s"upsert table $tableDir: unknown mode $other")
    }
  }

  private def latestFull(df: DataFrame, tableDir: String,
      keys: Seq[String], cmp: String): DataFrame = {
    val byKey = Window.partitionBy(keys.map(col): _*)
    val ranked = df
      .withColumn("_upsert_rnk", rank().over(byKey.orderBy(col(cmp).desc)))
      .filter(col("_upsert_rnk") === 1)
      // rank() keeps ALL tied top versions: >1 row per key here means
      // the winner is undefined — fail at evaluation, never guess
      .withColumn("_upsert_ties", count(lit(1)).over(byKey))
    ranked
      .where(when(col("_upsert_ties") > 1, raise_error(concat(
        lit(s"upsert table $tableDir: tie on ("),
        concat_ws(",", keys.map(col): _*),
        lit(s") at the max $cmp — latest record is undefined; " +
          "Pinot breaks this by ingestion order, which a parallel " +
          "batch scan cannot reproduce")))).isNull)
      .drop("_upsert_rnk", "_upsert_ties")
  }

  private def latestPartial(df: DataFrame, tableDir: String,
      keys: Seq[String], cmp: String,
      strategies: Map[String, Strategy]): DataFrame = {
    val valueCols = df.columns.toSeq.filterNot(c =>
      keys.contains(c) || c == cmp)
    val merged = valueCols.map { c =>
      (strategies.getOrElse(c, Overwrite) match {
        case Overwrite => max_by(col(c), col(cmp))
        case Ignore => min_by(col(c), col(cmp))
        case Increment => sum(col(c))
        case Max => max(col(c))
        case Min => min(col(c))
        case Union => sort_array(collect_set(col(c)))
        case Append =>
          // values ordered by the comparison column, determinism via
          // the tie guard below
          transform(
            sort_array(collect_list(struct(col(cmp), col(c)))),
            p => p.getField(c))
      }).as(c)
    }
    // max_by/min_by under a comparison tie are nondeterministic — the
    // same loud contract as FULL mode, checked in the SAME aggregate
    val guard = when(
      count(lit(1)) =!= count_distinct(col(cmp)),
      raise_error(concat(
        lit(s"upsert table $tableDir: duplicate $cmp within ("),
        concat_ws(",", keys.map(col): _*),
        lit(") — partial-merge winners are undefined under a tie"))))
      .as("_upsert_guard")
    val aggs = (max(col(cmp)).as(cmp) +: merged) :+ guard
    df.groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .where(col("_upsert_guard").isNull)
      .drop("_upsert_guard")
      // present columns in the source order: keys, cmp, values
      .select(((keys :+ cmp) ++ valueCols).map(col): _*)
  }
}
