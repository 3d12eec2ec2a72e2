package graft

import java.nio.file.Files

import graft.pinot.{SegmentReader, SegmentWriter, VarByteChunkV4}

/** Dev-only phase profiler for the PinotBench group_topk_raw shape:
  * times each engine phase (RAW chunk decode + slot interning, fixed-bit
  * metric decode, accumulation, row emission) in isolation, outside
  * Spark, to attribute the shape's marginal cost. Not part of the driver
  * contract.
  */
object ProfHist {
  def main(args: Array[String]): Unit = {
    val n = 97889
    val rnd = new scala.util.Random(42)
    val root = Files.createTempDirectory("prof_hist")
    val hits = Array.fill(n)(rnd.nextInt(263))
    SegmentWriter.write(root.resolve("seg0"), "t", "seg0", Seq(
      SegmentWriter.IntCol("hits", hits),
      SegmentWriter.StringRawCol("playerID",
        Array.tabulate(n)(i => f"player$i%06d"),
        VarByteChunkV4.Lz4LengthPrefixed, 4096)))
    val r = SegmentReader.open(root.resolve("seg0"))

    def time(label: String)(f: => Unit): Unit = {
      (1 to 3).foreach(_ => f) // warm
      val ts = (1 to 7).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
      }.sorted
      println(f"$label%-28s median ${ts(3)}%7.2f ms  min ${ts.head}%7.2f ms")
    }

    time("raw chunk decode only") {
      val chunk = r.rawChunkReader("playerID")
      var c = 0
      chunk.foreachRange(0, n) { (_, _, len) => c += len }
      if (c == -1) println("")
    }
    time("raw decode + slot intern") {
      val chunk = r.rawChunkReader("playerID")
      val tcap = Integer.highestOneBit(math.max(4, n * 2 - 1)) << 1
      val mask = tcap - 1
      val slotAt = new Array[Int](tcap)
      val hashAt = new Array[Int](tcap)
      val keyAt = new Array[Array[Byte]](tcap)
      val keys = new Array[org.apache.spark.unsafe.types.UTF8String](n)
      var next = 0
      val ids = new Array[Int](n)
      var i = 0
      chunk.foreachRange(0, n) { (buf, off, len) =>
        var h = -2128831035
        var j = off
        val end = off + len
        while (j < end) { h = (h ^ buf(j)) * 16777619; j += 1 }
        var pos = h & mask
        var slot = -1
        while (slot < 0) {
          val s = slotAt(pos)
          if (s == 0) {
            val copy = java.util.Arrays.copyOfRange(buf, off, end)
            slotAt(pos) = next + 1; hashAt(pos) = h; keyAt(pos) = copy
            keys(next) = org.apache.spark.unsafe.types.UTF8String.fromBytes(copy)
            next += 1; slot = next - 1
          } else if (hashAt(pos) == h && keyAt(pos).length == len &&
              java.util.Arrays.equals(keyAt(pos), 0, len, buf, off, end)) {
            slot = s - 1
          } else pos = (pos + 1) & mask
        }
        ids(i) = slot; i += 1
      }
      if (next == -1) println("")
    }
    time("raw decode + doc-pos slots") {
      val chunk = r.rawChunkReader("playerID")
      val keys = new Array[org.apache.spark.unsafe.types.UTF8String](n)
      val ids = new Array[Int](n)
      var i = 0
      chunk.foreachRange(0, n) { (buf, off, len) =>
        if (keys(i) == null)
          keys(i) = org.apache.spark.unsafe.types.UTF8String.fromBytes(
            java.util.Arrays.copyOfRange(buf, off, off + len))
        ids(i) = i
        i += 1
      }
      if (ids(0) == -1) println("")
    }
    time("raw decode + blob slots") {
      val chunk = r.rawChunkReader("playerID")
      var blob = new Array[Byte](n * 16)
      val offs = new Array[Int](n + 1)
      val ids = new Array[Int](n)
      var i = 0
      chunk.foreachRange(0, n) { (buf, off, len) =>
        val end = offs(i) + len
        if (end > blob.length)
          blob = java.util.Arrays.copyOf(blob, math.max(end, blob.length * 2))
        System.arraycopy(buf, off, blob, offs(i), len)
        offs(i + 1) = end
        ids(i) = i
        i += 1
      }
      // emission-side wrappers (zero-copy slices of the blob)
      var s = 0L
      var g = 0
      while (g < n) {
        s += org.apache.spark.unsafe.types.UTF8String.fromBytes(
          blob, offs(g), offs(g + 1) - offs(g)).numBytes()
        g += 1
      }
      if (s == -1) println("")
    }
    time("fixed-bit hits decode") {
      val fbr = r.dictIdReader("hits")
      val ids = fbr.readRange(0, n)
      if (ids(0) == -1) println("")
    }
    time("accumulate sum+count") {
      val fbr = r.dictIdReader("hits")
      val ids = fbr.readRange(0, n)
      val sums = new Array[Long](n)
      val counts = new Array[Long](n)
      var i = 0
      while (i < n) { sums(i % n) += ids(i); counts(i % n) += 1; i += 1 }
      if (sums(0) == -1) println("")
    }
    r.close()

    // Drain the DSv2 agg reader directly (createReader + iterate all
    // rows) — everything the engine does for the shape, minus Spark's
    // planning/scheduling/TakeOrdered.
    {
      import graft.sources.pinot.{HistAggSpec, PinotHistAggReaderFactory,
        PinotAggPartition}
      val factory = new PinotHistAggReaderFactory(Array("playerID"),
        Array(HistAggSpec.HAvg("hits")))
      time("DSv2 reader drain (full)") {
        val rd = factory.createReader(
          PinotAggPartition(root.resolve("seg0").toString))
        var c = 0L
        while (rd.next()) { c += rd.get().numFields }
        rd.close()
        if (c == -1) println("")
      }
    }

    // Same-JVM interleaved A/B of the FULL group_topk_raw query with the
    // unique-slot fast path on/off — box drift cancels out because the
    // two arms alternate rep by rep.
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tableDir = root.resolve("t_OFFLINE")
    Files.createDirectories(tableDir)
    Files.move(root.resolve("seg0"), tableDir.resolve("seg0"))
    import org.apache.spark.sql.functions._
    def q() = spark.read.format("pinot").load(tableDir.toString)
      .groupBy("playerID").agg(avg("hits").as("avg_hits"))
      .orderBy(desc("avg_hits")).limit(10)
    def run(): Double = {
      val t0 = System.nanoTime()
      q().write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e6
    }
    (1 to 4).foreach(_ => run()) // warm both JIT and plans
    val on = scala.collection.mutable.ArrayBuffer[Double]()
    val off = scala.collection.mutable.ArrayBuffer[Double]()
    (1 to 9).foreach { i =>
      System.setProperty("graft.pinot.disableUniqueSlotFastPath",
        (i % 2 == 0).toString)
      val t = run()
      if (i % 2 == 0) off += t else on += t
    }
    def stats(x: Seq[Double]) =
      f"median ${x.sorted.apply(x.length / 2)}%6.1f ms  min ${x.min}%6.1f ms"
    println(s"group_topk_raw FULL, fast path ON : ${stats(on.toSeq)}")
    println(s"group_topk_raw FULL, fast path OFF: ${stats(off.toSeq)}")
    spark.stop()
  }
}
