package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Buffer-memory/wall evidence harness for the HLL sparse phase
  * (dev-only, like [[FunnelHotKeyProbe]]): r12 replaced the sparse
  * set's boxed `TreeSet[java.lang.Long]` with a primitive
  * open-addressing long table ([[graft.functions.HllSketch.LongHashSet]]).
  * This probe records the reading the swap claims:
  *
  *  - `structure`: insert `sets × entries` longs into both structures
  *    and report wall + measured heap (GC-settled deltas) — the
  *    per-group buffer cost a grouped aggregation pays at high p;
  *  - `grouped_agg`: the q152 shape — grouped `hll_distinct(p=18)`
  *    with every group near the sparse limit — end-to-end wall.
  *
  * Usage: runMain graft.queries.HllSparseProbe [groups] [distinctPerGroup]
  * (defaults 64 × 60000 — just under hll18's 65536 sparse limit).
  */
object HllSparseProbe {

  private def settledHeap(): Long = {
    val rt = Runtime.getRuntime
    var last = Long.MaxValue
    var cur = rt.totalMemory - rt.freeMemory
    var i = 0
    while (i < 8 && cur < last) {
      last = cur; System.gc(); Thread.sleep(50)
      cur = rt.totalMemory - rt.freeMemory
      i += 1
    }
    cur
  }

  def main(args: Array[String]): Unit = {
    val groups = args.headOption.map(_.toInt).getOrElse(64)
    val perGroup = args.drop(1).headOption.map(_.toInt).getOrElse(60000)

    // --- structure-level: boxed TreeSet vs primitive open addressing ---
    val sets = 16
    def fill[T <: AnyRef](mk: () => T)(add: (T, Long) => Unit): (Double, Long, Array[AnyRef]) = {
      val before = settledHeap()
      val t0 = System.nanoTime()
      val out = Array.fill[AnyRef](sets)(mk())
      var s = 0
      while (s < sets) {
        var i = 0L
        while (i < perGroup) {
          add(out(s).asInstanceOf[T], i * 2654435761L + s)
          i += 1
        }
        s += 1
      }
      val wall = (System.nanoTime() - t0) / 1e9
      val after = settledHeap()
      (wall, after - before, out)
    }
    val (boxedWall, boxedHeap, boxedKeep) =
      fill(() => new java.util.TreeSet[java.lang.Long]())((t, v) => { t.add(v); () })
    val (primWall, primHeap, primKeep) =
      fill(() => new graft.functions.HllSketch.LongHashSet)((t, v) => t.add(v))
    println(f"""{"probe":"structure","sets":$sets,"entries":$perGroup,""" +
      f""""boxed_sec":$boxedWall%.2f,"boxed_mb":${boxedHeap / 1e6}%.1f,""" +
      f""""prim_sec":$primWall%.2f,"prim_mb":${primHeap / 1e6}%.1f}""")
    // keep both populations alive through the measurement prints
    require(boxedKeep.length + primKeep.length == 2 * sets)

    // --- grouped-aggregate wall: the q152 shape at the sparse limit ---
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.range(0, groups.toLong * perGroup, 1, 32).select(
      (col("id") % groups).as("g"),
      xxhash64(col("id")).as("h"))
    def once(): Unit = df.groupBy("g")
      .agg(graft.functions.HllDistinctAgg.hllDistinct(col("h"), 18).as("d"))
      .write.mode("overwrite").format("noop").save()
    once() // warm
    val t0 = System.nanoTime()
    once()
    val aggSec = (System.nanoTime() - t0) / 1e9
    println(f"""{"probe":"grouped_agg","groups":$groups,""" +
      f""""distinct_per_group":$perGroup,"p":18,"sec":$aggSec%.2f}""")
    spark.stop()
  }
}
