package graft.sources

import java.nio.file.Files

import graft.SparkTestBase
import graft.pinot.{JsonIndexSection, SegmentWriter, VarByteChunkV4}
import org.apache.spark.sql.functions._

/** JSON index (EXTENSION — the capability of Pinot's `jsonIndexColumns`):
  * flattened path=value postings serving pushed `get_json_object`
  * equality probes as an advisory superset (segment prune + window
  * skip; residual filter authoritative).
  */
class JsonIndexSpec extends SparkTestBase {

  test("section: verbatim literals, nested paths, refusals, odd docs") {
    val docs = Array(
      """{"k": 42, "cat": "red"}""",                    // 0
      """{"k": 42.0, "cat": "blue"}""",                 // 1: distinct literal
      """{"k": 7, "meta": {"region": "EU", "tier": 2}}""", // 2: nested
      """{"cat": "red", "flag": true}""",               // 3
      """{"esc": "a\"b\nc"}""",                         // 4: escapes decode
      """{"k": null}""",                                // 5: null never indexed
      """{"arr": [1, 2, 3], "k": 42}""",                // 6: array path refused
      """not json at all""",                            // 7: odd
      """{"dup": 1, "dup": 2}""",                       // 8: odd (dup key)
      """{"weird key!": 1}""",                          // 9: odd (key alphabet)
      null)                                             // 10: absent
    val sec = JsonIndexSection.deserialize(JsonIndexSection.build(docs.iterator))
    assert(sec.numOddDocs === 3)
    val odd = Seq(7, 8, 9)
    def m(path: String, v: String): Seq[Int] =
      sec.matchBitmap(path, v).get.toArray.toSeq
    // number literals verbatim: 42 and 42.0 are different keys
    assert(m("$.k", "42") === (Seq(0, 6) ++ odd).sorted)
    assert(m("$.k", "42.0") === (Seq(1) ++ odd).sorted)
    assert(m("$.cat", "red") === (Seq(0, 3) ++ odd).sorted)
    // nested dotted path
    assert(m("$.meta.region", "EU") === (Seq(2) ++ odd).sorted)
    assert(m("$.meta.tier", "2") === (Seq(2) ++ odd).sorted)
    assert(m("$.flag", "true") === (Seq(3) ++ odd).sorted)
    // escapes decode to the rendered string
    assert(m("$.esc", "a\"b\nc") === (Seq(4) ++ odd).sorted)
    // absent pair: only the odd docs remain candidates
    assert(m("$.k", "9999") === odd)
    assert(m("$.nosuch", "1") === odd)
    // refusals (None = index must not answer)
    assert(sec.matchBitmap("$.meta", "x").isEmpty, "object leaf refuses")
    assert(sec.matchBitmap("$.arr", "x").isEmpty, "array leaf refuses")
    assert(sec.matchBitmap("$.arr[0]", "1").isEmpty, "bracket path refuses")
    assert(sec.matchBitmap("$.k", "null").isEmpty, "probe 'null' refuses")
    assert(sec.matchBitmap("$", "x").isEmpty)
    assert(sec.matchBitmap("k", "x").isEmpty)
    assert(sec.matchBitmap("$.k", "x" * 300).isEmpty, "long value refuses")
  }

  test("candidate superset covers every Spark get_json_object match") {
    // soundness against the engine the predicate actually runs on:
    // whatever Spark says matches MUST be in the index's candidate set
    val docs = Array(
      """{"k": 1}""", """{"k": 1.0}""", """{"k": "1"}""",
      """{"k": {"j": 1}}""", """{"k": [1]}""", """{"k": true}""",
      """{"k": 1e2}""", """{"k": -0.5}""", """{"x": 3}""", """broken{""")
    val sec = JsonIndexSection.deserialize(JsonIndexSection.build(docs.iterator))
    import spark.implicits._
    val df = docs.toSeq.toDF("j")
    for (probe <- Seq("1", "1.0", "true", "1e2", "-0.5", "100", "3")) {
      val sparkMatches = df.withColumn("i", monotonically_increasing_id())
        .filter(get_json_object(col("j"), "$.k") === probe)
        .collect().map(_.getLong(1).toInt).toSet
      sec.matchBitmap("$.k", probe).foreach { bm =>
        val cand = bm.toArray.toSet
        assert(sparkMatches.subsetOf(cand),
          s"probe $probe: spark matches $sparkMatches not in candidates $cand")
      }
    }
  }

  test("json equality probes decode only windows holding candidates") {
    val root = Files.createTempDirectory("pinot_json")
    val tdir = root.resolve("docs_OFFLINE")
    val docs = 40000
    val needleAt = Set(3, 20001, 39998)
    val js = Array.tabulate(docs)(i =>
      if (needleAt(i)) s"""{"k": $i, "cat": "needle"}"""
      else s"""{"k": $i, "cat": "common${i % 911}"}""")
    SegmentWriter.write(tdir.resolve("seg0"), "docs", "seg0", Seq(
      SegmentWriter.StringRawCol("props", js,
        VarByteChunkV4.Lz4LengthPrefixed, 4096),
      SegmentWriter.IntCol("id", Array.tabulate(docs)(identity))),
      jsonIdxCols = Set("props"))
    def decodedRows(jsonEq: Seq[(String, String, String)]): Int = {
      val r = new graft.sources.pinot.PinotColumnarReader(
        s"$tdir/seg0/v3", Array("props", "id"), Array.empty, None,
        jsonEq = jsonEq)
      var rows = 0
      while (r.next()) rows += r.get().numRows()
      rows
    }
    // 3 scattered candidate docs → ≤3 windows decode
    val hits = decodedRows(Seq(("props", "$.cat", "needle")))
    assert(hits <= 3 * 8192, s"expected ≤3 windows, decoded $hits rows")
    // absent value → segment pruned outright
    assert(decodedRows(Seq(("props", "$.cat", "nosuchvalue"))) === 0)
    // refused probe (bracket path) → full decode, still correct
    assert(decodedRows(Seq(("props", "$.cat[0]", "x"))) === docs)

    // e2e through the optimizer rule: predicate stays residual (exact
    // rows), scan description shows the routed probe
    val df = spark.read.format("pinot").load(tdir.toString)
      .filter(get_json_object(col("props"), "$.cat") === "needle")
    assert(df.count() === 3)
    assert(df.select(sum("id")).collect()(0).getLong(0) ===
      needleAt.map(_.toLong).sum)
    val leaf = df.queryExecution.executedPlan.collectLeaves().head.toString
    assert(leaf.contains("jsonEq=[props $.cat=needle]"),
      s"json probe not routed into the scan:\n$leaf")
    // reversed operand order routes too
    val df2 = spark.read.format("pinot").load(tdir.toString)
      .filter(lit("needle") === get_json_object(col("props"), "$.cat"))
    assert(df2.count() === 3)
  }

  test("index absent: probes route but never prune (full decode, exact)") {
    val root = Files.createTempDirectory("pinot_json_plain")
    val tdir = root.resolve("docs_OFFLINE")
    val js = Array.tabulate(1000)(i => s"""{"k": ${i % 10}}""")
    SegmentWriter.write(tdir.resolve("seg0"), "docs", "seg0", Seq(
      SegmentWriter.StringRawCol("props", js,
        VarByteChunkV4.Lz4LengthPrefixed, 4096),
      SegmentWriter.IntCol("id", Array.tabulate(1000)(identity))))
    val df = spark.read.format("pinot").load(tdir.toString)
      .filter(get_json_object(col("props"), "$.k") === "7")
    assert(df.count() === 100)
  }
}
