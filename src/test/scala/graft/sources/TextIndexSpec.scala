package graft.sources

import java.nio.file.Files

import graft.SparkTestBase
import graft.pinot.{SegmentReader, SegmentWriter, TextIndexSection, VarByteChunkV4}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{StringContains, StringEndsWith, StringStartsWith}

/** Text index (EXTENSION — the capability of Pinot's `textIndexColumns`,
  * sans Lucene): token-vocabulary postings serving substring predicates
  * on document columns.
  */
class TextIndexSpec extends SparkTestBase {

  test("section: postings exact per token; whitespace probes refuse") {
    val docs = Array("alpha beta gamma", "beta delta", "gamma alpha", "epsilon")
    val sec = TextIndexSection.deserialize(TextIndexSection.build(docs.iterator))
    assert(sec.tokens.toSeq === Seq("alpha", "beta", "delta", "epsilon", "gamma"))
    assert(sec.matchBitmap("beta").get.toArray.toSeq === Seq(0, 1))
    assert(sec.matchBitmap("alph").get.toArray.toSeq === Seq(0, 2)) // substring
    assert(sec.matchBitmap("zeta").get.isEmpty)
    assert(sec.matchBitmap("a bet").isEmpty, "whitespace probe must refuse")
    assert(sec.matchBitmap("").isEmpty)
  }

  test("substring filters decode only windows holding candidate tokens") {
    val root = Files.createTempDirectory("pinot_text")
    val tdir = root.resolve("docs_OFFLINE")
    val docs = 40000
    val needleAt = Set(3, 20001, 39998)
    val text = Array.tabulate(docs)(i =>
      if (needleAt(i)) s"common words here zebrafish$i trailing"
      else "common words here filler trailing")
    SegmentWriter.write(tdir.resolve("seg0"), "docs", "seg0", Seq(
      SegmentWriter.StringRawCol("body", text,
        VarByteChunkV4.Lz4LengthPrefixed, 4096),
      SegmentWriter.IntCol("id", Array.tabulate(docs)(identity))),
      textCols = Set("body"))
    def decodedRows(filters: Array[org.apache.spark.sql.sources.Filter]): Int = {
      val r = new graft.sources.pinot.PinotColumnarReader(
        s"$tdir/seg0/v3", Array("body", "id"), filters, None)
      var rows = 0
      while (r.next()) rows += r.get().numRows()
      rows
    }
    // 'zebrafish' occurs in 3 scattered docs → ≤3 windows decode
    val hits = decodedRows(Array(StringContains("body", "zebrafish")))
    assert(hits <= 3 * 8192, s"expected ≤3 windows, decoded $hits rows")
    assert(decodedRows(Array(StringContains("body", "nosuchtoken"))) === 0)
    // a whitespace probe cannot use the index → full decode, still correct
    assert(decodedRows(Array(StringContains("body", "words here"))) === docs)
    // e2e: exact results through the source (residual filter decides)
    val df = spark.read.format("pinot").load(tdir.toString)
    assert(df.filter(col("body").contains("zebrafish")).count() === 3)
    assert(df.filter(col("body").contains("zebrafish20001")).count() === 1)
    assert(df.filter(col("body").startsWith("common")).count() === docs)
    assert(df.filter(col("body").endsWith("trailing")).count() === docs)
    assert(df.filter(col("body").contains("words here")).count() === docs)
  }

  test("DSv2 option + metadata flag + v1 file + compaction carry it") {
    val root = Files.createTempDirectory("pinot_text_e2e")
    val dir = root.resolve("d_OFFLINE").toString
    import spark.implicits._
    (0 until 5000).map(i =>
      (i, s"tok${i % 997} filler words tok${(i * 31) % 997}"))
      .toDF("id", "body")
      .repartition(2)
      .write.format("pinot").option("textIndexColumns", "body")
      .mode("append").save(dir)
    val seg = Files.list(java.nio.file.Paths.get(dir)).iterator().next()
    assert(SegmentReader.open(seg).metadata.columns("body").hasTextIndex)
    assert(SegmentReader.open(seg).textIndex("body").isDefined)
    val back = spark.read.format("pinot").load(dir)
    val expect = (0 until 5000).count(i =>
      i % 997 == 42 || (i * 31) % 997 == 42)
    assert(back.filter(col("body").contains("tok42 ") ||
      col("body").endsWith("tok42")).count() === expect)
    val v1 = root.resolve("v1seg")
    graft.pinot.PinotCompact.convert(seg.toString, v1.toString, 1)
    assert(Files.exists(v1.resolve("body.text.inv")))
    assert(SegmentReader.open(v1).textIndex("body").isDefined)
    val merged = graft.pinot.PinotCompact.compact(dir)
    assert(SegmentReader.open(merged).textIndex("body").isDefined)
  }
}
