package graft.sources

import java.nio.file.Files

import graft.SparkTestBase
import graft.pinot.{SegmentWriter, VarByteChunkV4}
import graft.sources.pinot.{PinotGroupPartition, PinotInputPartition, PinotScan, PinotSlicePartition}
import org.apache.spark.sql.functions._

/** Sub-segment task planning: large segments split into window-aligned
  * doc-range slices; tiny segments group into shared tasks (SURVEY §4's
  * 100 TB mapping — "per-segment splits grouped into tasks"). Exercises
  * every decode family across slice boundaries: dict ids, RAW numerics,
  * RAW strings (chunked), MV arrays (absolute offset indexing), null
  * vectors, and sorted-range + slice intersection.
  */
class SubSegmentSplitSpec extends SparkTestBase {

  private val n = 200000
  private val rnd = new scala.util.Random(11)
  private val k = Array.tabulate(n)(i => i.toLong) // sorted
  private val v = Array.fill(n)(rnd.nextInt(1000))
  private val name = Array.tabulate(n)(i => f"user$i%06d")
  private val bal = Array.fill(n)(rnd.nextLong() % 1000000)
  private val tagVals = Array.tabulate(n)(i => Array.tabulate(1 + i % 3)(j => i % 50 + j))

  /** One ~2.8 MB segment (big enough to split under the 1 MB floor). */
  private lazy val bigDir: String = {
    val root = Files.createTempDirectory("pinot_split_big")
    val t = root.resolve("big_OFFLINE")
    SegmentWriter.write(t.resolve("seg0"), "big", "seg0", Seq(
      SegmentWriter.LongCol("k", k),
      SegmentWriter.IntCol("v", v),
      SegmentWriter.StringRawCol("name", name,
        VarByteChunkV4.Lz4LengthPrefixed, 4096),
      SegmentWriter.LongRawCol("bal", bal),
      SegmentWriter.IntMVCol("tags", tagVals)))
    t.toString
  }

  /** Six KB-sized segments → grouped tasks. */
  private lazy val tinyDir: String = {
    val root = Files.createTempDirectory("pinot_split_tiny")
    val t = root.resolve("tiny_OFFLINE")
    (0 until 6).foreach { s =>
      SegmentWriter.write(t.resolve(s"seg$s"), "tiny", s"seg$s", Seq(
        SegmentWriter.IntCol("x", Array.tabulate(500)(i => s * 1000 + i))))
    }
    t.toString
  }

  test("planSplits slices large segments on window boundaries") {
    val parts = PinotScan.planSplits(Seq(s"$bigDir/seg0"), 1L << 20)
    assert(parts.length > 1, s"expected slices, got ${parts.toSeq}")
    val slices = parts.collect { case s: PinotSlicePartition => s }
    assert(slices.length === parts.length, "all partitions should be slices")
    // contiguous cover of [0, n) with window-aligned starts
    assert(slices.head.start === 0)
    assert(slices.last.end === n)
    slices.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.end === b.start, "slices must tile contiguously")
        assert(a.start % 8192 === 0, "window-aligned")
      case _ => ()
    }
  }

  test("planSplits groups tiny segments and honors the 0 escape hatch") {
    val segs = (0 until 6).map(s => s"$tinyDir/seg$s")
    val parts = PinotScan.planSplits(segs, PinotScan.DefaultSplitTargetBytes)
    assert(parts.length < 6, s"tiny segments should group: ${parts.length}")
    val covered = parts.flatMap {
      case PinotGroupPartition(ps) => ps
      case PinotInputPartition(p) => Seq(p)
      case other => fail(s"unexpected $other")
    }
    assert(covered.toSet === segs.toSet, "grouping must cover every segment")
    val strict = PinotScan.planSplits(segs, 0)
    assert(strict.length === 6)
    assert(strict.forall(_.isInstanceOf[PinotInputPartition]))
  }

  test("sliced scan preserves full fidelity across every decode family") {
    val df = spark.read.format("pinot").load(bigDir)
    assert(df.rdd.getNumPartitions > 1, "the 2.8 MB segment should split")
    assert(df.count() === n)
    // every decode family, hashed over all rows: dict long, dict int,
    // RAW string, RAW long, MV int array
    val got = df.select("k", "v", "name", "bal", "tags").collect()
    assert(got.length === n)
    val byK = got.map(r => r.getLong(0) -> r).toMap
    assert(byK.size === n, "no row lost or duplicated across slices")
    for (i <- Seq(0, 8191, 8192, n / 2, n - 1)) {
      val r = byK(k(i))
      assert(r.getInt(1) === v(i), s"v at $i")
      assert(r.getString(2) === name(i), s"name at $i")
      assert(r.getLong(3) === bal(i), s"bal at $i")
      assert(r.getSeq[Int](4).toArray === tagVals(i), s"tags at $i")
    }
    // aggregates agree with direct computation through the split scan
    val s = df.agg(sum("bal"), count(lit(1))).head
    assert(s.getLong(0) === bal.sum)
    assert(s.getLong(1) === n.toLong)
  }

  test("sorted-range filters intersect with slices (no phantom or lost rows)") {
    val df = spark.read.format("pinot").load(bigDir)
    // range lands inside ONE slice's doc window for most slices — the
    // others must produce nothing, not garbage
    val hit = df.filter(col("k") >= 100000L && col("k") < 108192L)
    assert(hit.count() === 8192)
    assert(hit.agg(sum("v")).head.getLong(0) ===
      (100000 until 108192).map(v(_).toLong).sum)
    // equality probe
    assert(df.filter(col("k") === 54321L).select("name").head.getString(0)
      === name(54321))
  }

  test("grouped tiny segments keep per-segment pruning and full results") {
    val df = spark.read.format("pinot").load(tinyDir)
    assert(df.rdd.getNumPartitions < 6, "tiny segments should share tasks")
    assert(df.count() === 3000)
    assert(df.agg(sum("x")).head.getLong(0) ===
      (0 until 6).flatMap(s => (0 until 500).map(i => (s * 1000 + i).toLong)).sum)
    // a filter matching one segment's range still answers correctly
    // through the grouped reader (per-sub-reader pruning applies)
    assert(df.filter(col("x") >= 3000 && col("x") < 3500).count() === 500)
  }
}
