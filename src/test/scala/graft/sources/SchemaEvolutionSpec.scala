package graft.sources

import java.nio.file.Files

import graft.SparkTestBase
import graft.pinot.SegmentWriter
import org.apache.spark.sql.functions._

/** Schema evolution (EXTENSION — Apache Pinot's add-a-column model; the
  * reference takes the first segment's schema as authoritative): the
  * table schema is the union of all segments' columns, and old segments
  * missing a later-added column serve its TYPE DEFAULT (Pinot's
  * defaultNullValue backfill).
  */
class SchemaEvolutionSpec extends SparkTestBase {

  private def mixedTable(): String = {
    val root = Files.createTempDirectory("pinot_evo")
    val tdir = root.resolve("players_OFFLINE")
    // old segment: written before `score`/`team` existed
    SegmentWriter.write(tdir.resolve("seg0"), "players", "seg0", Seq(
      SegmentWriter.LongCol("id", Array.tabulate(1000)(_.toLong)),
      SegmentWriter.StringDictCol("name", Array.tabulate(1000)(i => s"p$i"))))
    // new segment: post-evolution, two added columns
    SegmentWriter.write(tdir.resolve("seg1"), "players", "seg1", Seq(
      SegmentWriter.LongCol("id", Array.tabulate(500)(i => 1000L + i)),
      SegmentWriter.StringDictCol("name", Array.tabulate(500)(i => s"q$i")),
      SegmentWriter.DoubleCol("score", Array.tabulate(500)(_ * 1.5)),
      SegmentWriter.StringDictCol("team", Array.tabulate(500)(i => s"T${i % 4}"))))
    tdir.toString
  }

  test("union schema; old segments serve type defaults for added columns") {
    val df = spark.read.format("pinot").load(mixedTable())
    assert(df.schema.fieldNames.toSeq === Seq("id", "name", "score", "team"))
    assert(df.count() === 1500)
    // old rows carry the defaults, new rows their stored values
    assert(df.filter(col("id") < 1000).agg(sum("score")).head.getDouble(0) === 0.0)
    assert(df.filter(col("id") < 1000 && col("team") =!= "").count() === 0)
    assert(df.filter(col("id") === 1002).select("score", "team").head.toSeq
      === Seq(3.0, "T2"))
    // filters on the evolved column behave as if backfilled: defaults
    // participate (score = 0 matches old rows), positives only new rows
    assert(df.filter(col("score") === 0.0).count() === 1000 + 1)
    assert(df.filter(col("score") > 0.0).count() === 499)
    // grouping across the boundary
    val byTeam = df.groupBy("team").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byTeam("") === 1000)
    assert(byTeam.filterNot(_._1.isEmpty).values.sum === 500)
    // aggregate pushdown must REFUSE evolved columns (a pushed MIN would
    // miss the old segments' defaults) — answer comes from the full scan
    assert(df.agg(min("score")).head.getDouble(0) === 0.0)
    assert(df.agg(count(col("team"))).head.getLong(0) === 1500)
  }

  test("conflicting types across segments fail loudly") {
    val root = Files.createTempDirectory("pinot_evo_bad")
    val tdir = root.resolve("bad_OFFLINE")
    SegmentWriter.write(tdir.resolve("seg0"), "bad", "seg0", Seq(
      SegmentWriter.LongCol("k", Array(1L))))
    SegmentWriter.write(tdir.resolve("seg1"), "bad", "seg1", Seq(
      SegmentWriter.StringDictCol("k", Array("x"))))
    val err = intercept[Exception] {
      spark.read.format("pinot").load(tdir.toString).collect()
    }
    assert(err.getMessage.contains("conflicting") ||
      (err.getCause != null && err.getCause.getMessage.contains("conflicting")))
  }
}
