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

  /** Declare (tableDir, keys, compareCol) as an upsert table — the
    * analog of setting `upsertConfig` in Pinot's table config.
    */
  def configure(tableDir: String, keys: Seq[String],
      compareCol: String): Unit = {
    require(keys.nonEmpty, "upsert: at least one key column required")
    require(!keys.contains(compareCol),
      s"upsert: comparison column $compareCol cannot be a key column")
    val body =
      s"""upsert.mode=FULL
         |upsert.key.columns=${keys.mkString(",")}
         |upsert.comparison.column=$compareCol
         |""".stripMargin
    java.nio.file.Files.write(
      java.nio.file.Paths.get(tableDir).resolve(ConfigFile),
      body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ()
  }

  /** The declared upsert config of `tableDir`, or a loud failure — a
    * raw read of an upsert table is a different (versioned) relation,
    * so the caller must know which one it wants.
    */
  def config(tableDir: String): (Seq[String], String) = {
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
    (keys, cmp)
  }

  /** The upsert VIEW of `tableDir`: only the latest record per key
    * (greatest comparison value) is visible — what a Pinot query over
    * an upsert REALTIME table returns. Ties on (key, max comparison)
    * reject loudly (see class doc).
    */
  def latest(s: SparkSession, tableDir: String): DataFrame = {
    val (keys, cmp) = config(tableDir)
    val df = s.read.format("pinot").load(tableDir)
    val missing = (keys :+ cmp).filterNot(df.columns.contains)
    if (missing.nonEmpty)
      throw new PinotFormatException(
        s"upsert table $tableDir: configured columns ${missing.mkString(",")} " +
          "not present in the segment schema")
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
}
