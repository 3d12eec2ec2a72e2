package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Benchmark main (driver contract): runs the query surface on
  * `SPARK_GRAFT_SF_DIR`, prints ONE JSON line.
  *
  * Protocol (BASELINE.md): the 7 headline shapes mirror the reference's
  * benchmark_cases.rs 1:1 (q01 count*, q02/q03 scans, q04 global agg,
  * q05/q06 group+topk, q07 limit) and are timed warm — 1 untimed warm-up,
  * then median of >=3 CLEAN reps (contended/outlier reps are discarded
  * and REPLACED, see median_protocol in BENCH_DETAIL.json) — because the
  * reference also benches a warm catalog. Results sink to the noop
  * writer: full plan execution without driver-side collect cost.
  */
object Bench {

  private val Headline = Seq(
    "q01_count_star", "q02_projection", "q03_scan_strings", "q04_agg_global",
    "q05_group_topk", "q06_group_highcard", "q07_limit")

  /** Bench-time variants of the headline shapes. The `queries` versions
    * append a total ORDER BY that exists only so the DuckDB-oracle compare
    * is row-order-deterministic; the reference's benchmark shapes
    * (benchmark_cases.rs 2,3,7) have no such sort, so benching it would
    * charge us for work the baseline doesn't do. Aggregation/top-k shapes
    * keep their ORDER BY — the reference has it too.
    */
  private val headlineVariant: Map[String, (SparkSession, String) => DataFrame] = {
    import org.apache.spark.sql.functions.col
    Map(
      "q02_projection" -> ((s, d) => Tables.load(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))),
      "q03_scan_strings" -> ((s, d) => Tables.load(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_returnflag"), col("l_linestatus"))),
      "q07_limit" -> ((s, d) => Tables.load(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
        .limit(10)),
      // full-output function scans: same rule — the trailing total ORDER BY
      // exists only for the row-order-sensitive oracle compare
      "q33_string_funcs" -> (queries.Scalar.q33Core _),
      "q34_date_funcs" -> (queries.Scalar.q34Core _),
      "q35_math_funcs" -> (queries.Scalar.q35Core _))
  }

  private def execute(df: DataFrame): Unit =
    df.write.mode("overwrite").format("noop").save()

  private def calibrate(): Double = Calibrate.run()

  private def timed(df: => DataFrame): Double = {
    val t0 = System.nanoTime()
    execute(df)
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      // shuffle partitions TRACK the core count (the driver also runs
      // this bench at a lower SPARK_GRAFT_CPUS to measure scaling; a
      // constant 32 would make the low-core run schedule 4× more tasks
      // per exchange than it has cores, charging it pure task-dispatch
      // overhead — guide §2.2: partitions sized to the execution, with
      // AQE coalescing below). At 32 CPUs this is byte-identical to the
      // r8–r15 configuration, so cross-round comparisons stand.
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))
      // sized for the local SF: the biggest table is ~11 MB, so the 128 MB
      // defaults would serialize every scan into one task and let AQE
      // coalesce every shuffle to one partition. (At 100 TB the defaults
      // are right; partition sizing must track the data scale.)
      .config("spark.sql.files.maxPartitionBytes", "2m")
      .config("spark.sql.files.openCostInBytes", "262144")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2m")
      // The surface's ~119 queries compile well over 500 generated
      // classes; the default 100-entry codegen class cache thrashes
      // across the three SHUFFLED passes (each pass a different order →
      // near-zero LRU reuse), so heavy queries re-Janino-compile and
      // re-JIT their whole-stage code on random reps. r8's pass-1
      // outliers (q49 16 s vs 2.4 s steady, clean probes, no GC) are
      // exactly this: the size must cover the whole surface so a rep
      // times the PLAN, not the compiler. Sized for the bench process
      // only — a production session runs few distinct plan shapes and
      // the default is fine.
      .config("spark.sql.codegen.cache.maxEntries", "8192")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    calibrate() // JIT warm-up for the probe itself
    val calBefore = calibrate()
    val nProbeThreads = Runtime.getRuntime.availableProcessors()
    val calMtBefore = Calibrate.runParallel(nProbeThreads)

    // The full surface in declared order: headline first, rest sorted.
    val fullSurface: Seq[(String, (SparkSession, String) => DataFrame)] =
      Headline.map(n =>
        n -> headlineVariant.getOrElse(n, SparkEntry.queries(n))) ++
        SparkEntry.queries.toSeq.sortBy(_._1)
          .filterNot { case (n, _) => Headline.contains(n) }
          .map { case (n, f) => n -> headlineVariant.getOrElse(n, f) }
    // Dev-only subset filter for profiling single queries
    // (SPARK_GRAFT_ONLY=q113_png_resize,q114_png_frames); the driver
    // never sets it, so driver artifacts always cover the whole surface.
    val surface = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
      .fold(fullSurface)(only => fullSurface.filter(p => only(p._1)))

    val sweepT0 = System.nanoTime()
    // Interleaved contention probes: the same fixed-work single-thread
    // loop as the before/after calibration pair, run every `ProbeEvery`
    // executed reps. A probe that runs slow localizes external CPU
    // contention to the reps between it and its neighbors.
    val ProbeEvery = 16
    val probes = scala.collection.mutable.ArrayBuffer[(Double, Double)]()
    // Saturating probes ride along every other probe point: r8's two hot
    // single-thread probes proved EXTERNAL load exists on this box, but a
    // clean single-thread probe coexists with multi-core contention
    // (r4) — the MT probe is the instrument that catches it mid-sweep,
    // not just in the before/after pair.
    val probesMt = scala.collection.mutable.ArrayBuffer[(Double, Double)]()
    var probeN = 0
    def probe(): Unit = {
      probes += (((System.nanoTime() - sweepT0) / 1e9, Calibrate.run()))
      probeN += 1
      if (probeN % 2 == 0)
        probesMt += (((System.nanoTime() - sweepT0) / 1e9,
          Calibrate.runParallel(Runtime.getRuntime.availableProcessors())))
    }
    var benched = 0
    val gcBeans = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.toSeq
    }
    def gcMs(): Long = gcBeans.map(_.getCollectionTime.max(0L)).sum
    // Cumulative count of whole-stage/expression codegen COMPILATIONS
    // (Janino invocations): a rep whose compile_n > 0 paid compiler +
    // cold-JIT cost that is not the plan's steady-state — with the
    // cache sized to the surface above, only each query's first-ever
    // execution (warm-up pass) should show nonzero deltas.
    def compileCount(): Long =
      org.apache.spark.metrics.source.CodegenMetrics
        .METRIC_COMPILATION_TIME.getCount
    // Cumulative JVM JIT compilation time (ms): compile_n only counts
    // Spark CODEGEN compiles; r9's q114 12.2 s first rep had compile_n
    // 0 because the cost was HotSpot C2 compiling the PNG codec paths.
    // The per-rep delta makes that attributable from the artifact.
    val jitBean = java.lang.management.ManagementFactory.getCompilationMXBean
    def jitMs(): Long =
      if (jitBean != null && jitBean.isCompilationTimeMonitoringSupported)
        jitBean.getTotalCompilationTime
      else 0L

    // Per-rep record: (pass, start offset sec, duration sec, GC ms spent
    // during the rep). r7's q42 anomaly (3.3 s on a 5 k-row single-scan
    // aggregate, clean probes) was unattributable because reps ran
    // back-to-back in a fixed order and the artifact kept only the
    // median: a GC debt inherited from the previous query's sweep
    // position inflated all three reps identically. Now (a) each timed
    // pass runs the whole surface in a DIFFERENT seeded-shuffle order,
    // so no query has a fixed predecessor, and (b) every rep records
    // its own GC time, so residency effects show up as gc_ms instead
    // of vanishing into the median.
    final case class Rep(pass: Int, startSec: Double, sec: Double, gcMs: Long,
        compileN: Long, jitMs: Long)
    val reps = scala.collection.mutable.LinkedHashMap[String,
      scala.collection.mutable.ArrayBuffer[Rep]]()
    val failed = scala.collection.mutable.Set[String]()

    // pass 0: untimed warm-up (file listing, schema, JIT) in declared
    // order — no number in the output is a single cold sample. The
    // codec-bound media queries warm TWICE: one pass leaves the PNG
    // encode/decode hot paths still interpreting, and the JIT debt then
    // lands on the first timed rep (r9's unattributed q114 12.2 s).
    val codecWarm = Set("q55_media_meta", "q56_media_features",
      "q71_media_resize", "q72_frame_sample", "q111_png_roundtrip",
      "q113_png_resize", "q114_png_frames")
    for ((name, fn) <- surface) {
      try {
        if (benched % ProbeEvery == 0) probe()
        benched += 1
        execute(fn(spark, sfDir))
        if (codecWarm(name)) execute(fn(spark, sfDir))
        reps(name) = scala.collection.mutable.ArrayBuffer.empty[Rep]
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        failed += name
      }
    }
    def runRep(pass: Int, name: String,
        fn: (SparkSession, String) => DataFrame): Unit = {
      try {
        if (benched % ProbeEvery == 0) probe()
        benched += 1
        val start = (System.nanoTime() - sweepT0) / 1e9
        val g0 = gcMs()
        val c0 = compileCount()
        val j0 = jitMs()
        val sec = timed(fn(spark, sfDir))
        reps(name) += Rep(pass, start, sec, gcMs() - g0, compileCount() - c0,
          jitMs() - j0)
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed in pass $pass: ${e.getMessage}")
        failed += name
      }
    }
    // passes 1..3: each pass covers the whole surface once, in a
    // per-pass seeded-shuffle order (deterministic across runs)
    for (pass <- 1 to 3) {
      val order = new scala.util.Random(0xC0FFEE + pass).shuffle(surface)
      for ((name, fn) <- order if !failed(name)) runRep(pass, name, fn)
    }
    probe() // close the last full pass's window

    // A rep more than 3x its query's min is suspect EVEN WITH quiet
    // probes: r10's q19 published 8.49 s off a 16 s rep the probes
    // missed (host-level stall; the calibration drifted 25% across the
    // run) when steady state is ~1.0 s. The absolute floor keeps normal
    // variance on sub-second queries from tripping the 3x ratio.
    def outlierRep(r: Rep, mn: Double): Boolean =
      r.sec > 3 * mn && r.sec - mn > 0.3
    def cleanOf(rs: Seq[Rep]): Seq[Rep] = {
      val mn = rs.map(_.sec).min
      rs.filterNot(r => contendedRep(r) || outlierRep(r, mn))
    }
    // Replacement reps: discarding a contended/outlier rep from 3 leaves
    // a 2-rep MEAN masquerading as a median (r10: 63/143 queries) — so
    // any query with fewer than 3 clean reps gets fresh reps until it
    // has 3, bounded at 6 total reps across 2 extra rounds.
    for (round <- 4 to 5) {
      val deficit = surface.filter { case (name, _) =>
        !failed(name) && reps.get(name).exists(rs =>
          rs.nonEmpty && cleanOf(rs.toSeq).length < 3 && rs.length < 6)
      }
      for ((name, fn) <- new scala.util.Random(0xC0FFEE + round)
          .shuffle(deficit) if !failed(name)) runRep(round, name, fn)
      if (deficit.nonEmpty) probe() // close this round's window
    }
    probe() // close the final window

    // Contention marking, per rep, over the rep's FULL INTERVAL
    // [start, start+sec]: probes LANDING INSIDE the interval plus the
    // nearest one on each side. (r8's predicate keyed on start only, so
    // a rep that began before a hot window and ran through it read two
    // clean bracketing probes and was never flagged.) Both probe kinds
    // vote — a clean single-thread probe coexists with multi-core
    // contention, which only the saturating probe sees.
    def contendedRep(r: Rep): Boolean = {
      val s = r.startSec; val e = r.startSec + r.sec
      def hot(ps: Seq[(Double, Double)], tol: Double): Boolean =
        ps.nonEmpty && {
          val best = ps.map(_._2).min
          val inside = ps.filter(p => p._1 >= s && p._1 <= e)
          val before = ps.filter(_._1 < s).lastOption
          val after = ps.find(_._1 > e)
          (inside ++ before ++ after).exists(_._2 > best * tol)
        }
      // the MT probe is noisier by construction (scheduler jitter across
      // 32 threads), so it gets a looser threshold
      hot(probes.toSeq, 1.3) || hot(probesMt.toSeq, 1.5)
    }

    // Per-query medians DISCARD reps with demonstrated external
    // interference when at least two clean reps remain — the raw rep
    // set (with its contended flags) stays in BENCH_DETAIL.json, so
    // nothing is hidden; the headline just stops averaging someone
    // else's CPU usage into our plan cost.
    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    val resultsMin = scala.collection.mutable.LinkedHashMap[String, Double]()
    val starts = scala.collection.mutable.LinkedHashMap[String, Double]()
    for ((name, _) <- surface) {
      val rs = reps.getOrElse(name,
        scala.collection.mutable.ArrayBuffer.empty[Rep])
      if (failed(name) || rs.isEmpty) {
        results(name) = -1.0; resultsMin(name) = -1.0
      } else {
        val clean = cleanOf(rs.toSeq)
        // Degraded-box fallback (r13 protocol fix): when contention
        // probes flag nearly every rep, fewer than 2 "clean" reps remain
        // and the old fallback published the raw median — which let a
        // 3x-outlier become the headline (r13 q32: 5.91 s published from
        // a rep set spanning 1.52-42.99 s whose clean reps read ~1.5 s).
        // A ratio-outlier must NEVER become the published median: fall
        // back to the non-outlier reps (contended-but-plausible), and
        // only then to the raw set.
        val use =
          if (clean.length >= 2) clean
          else {
            val mn = rs.map(_.sec).min
            val noOutlier = rs.toSeq.filterNot(r => outlierRep(r, mn))
            if (noOutlier.nonEmpty) noOutlier else rs.toSeq
          }
        val ts = use.map(_.sec).sorted
        // true median: even-count rep sets (one rep discarded as
        // contended) average the middle two instead of taking the upper,
        // which upper-biased every 2-clean-rep query on a loaded box
        results(name) =
          if (ts.length % 2 == 1) ts(ts.length / 2)
          else (ts(ts.length / 2 - 1) + ts(ts.length / 2)) / 2.0
        resultsMin(name) = ts.head
        starts(name) = rs.head.startSec
      }
    }

    val headlineTotal = Headline.filter(results.contains)
      .map(results(_)).filter(_ >= 0).sum
    // The driver captures only the TAIL of the run output; round 2's
    // full-name 4-decimal line (+jvm block) outgrew that window and the
    // JSON never parsed. The printed line uses short `qNN` keys (the
    // prefix of each query name, unique across the surface) at 3
    // decimals to stay well inside the capture window; the full-name map
    // is written to BENCH_DETAIL.json alongside.
    val qs = results.map { case (k, v) =>
      "\"" + k.takeWhile(_ != '_') + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val fullQs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.4f" }
      .mkString("{", ",", "}")
    val total = f"$headlineTotal%.4f"
    // JVM diagnostics make environment-induced outliers attributable
    // (e.g. a constrained heap or CPU set shows up right here).
    val calAfter = calibrate()
    val calMtAfter = Calibrate.runParallel(nProbeThreads)
    val rt = Runtime.getRuntime
    val env = s""""jvm":{"maxHeapMb":${rt.maxMemory() / (1 << 20)},""" +
      s""""cpus":${rt.availableProcessors()},"master":"local[$cpus]"},""" +
      f""""calibration":{"before_sec":$calBefore%.3f,"after_sec":$calAfter%.3f,""" +
      f""""mt_before_sec":$calMtBefore%.3f,"mt_after_sec":$calMtAfter%.3f,""" +
      s""""mt_threads":$nProbeThreads,""" +
      s""""work":"${Calibrate.WorkDescription}"}"""
    val startsJson = starts.map { case (k, v) =>
      "\"" + k + "\":" + f"$v%.2f" }.mkString("{", ",", "}")
    // A QUERY is suspect when a MAJORITY of its reps were contended —
    // then even the clean-rep median above had at most one sample.
    val suspects = reps.collect { case (name, rs)
      if rs.nonEmpty && rs.count(contendedRep) * 2 > rs.length =>
        name }.toSeq
    val probesJson = probes.map { case (off, sec) =>
      f"""{"offset_sec":$off%.1f,"probe_sec":$sec%.3f}""" }
      .mkString("[", ",", "]")
    val probesMtJson = probesMt.map { case (off, sec) =>
      f"""{"offset_sec":$off%.1f,"probe_sec":$sec%.3f}""" }
      .mkString("[", ",", "]")
    val suspectsJson = suspects.map("\"" + _ + "\"").mkString("[", ",", "]")
    val fullQsMin = resultsMin.map { case (k, v) => "\"" + k + "\":" + f"$v%.4f" }
      .mkString("{", ",", "}")
    // full per-rep dump: lets a reader separate "slow plan" (all reps
    // slow, low gc, clean probes) from "one bad rep" (median>>min) from
    // "GC residency" (gc_ms >> sibling reps) for every query
    val repsJson = reps.map { case (k, rs) =>
      val mn = if (rs.isEmpty) 0.0 else rs.map(_.sec).min
      "\"" + k + "\":" + rs.map(r =>
        f"""{"pass":${r.pass},"start_sec":${r.startSec}%.2f,""" +
          f""""sec":${r.sec}%.4f,"gc_ms":${r.gcMs},""" +
          f""""compile_n":${r.compileN},""" +
          f""""jit_ms":${r.jitMs},""" +
          s""""contended":${contendedRep(r)},""" +
          s""""outlier":${outlierRep(r, mn)}}""").mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_DETAIL.json"),
      (s"""{"metric":"headline_total","value":$total,"unit":"sec","queries":$fullQs,""" +
        s""""queries_min":$fullQsMin,""" +
        s""""median_protocol":"median over clean reps: a rep is discarded when its [start,end] interval overlaps a hot probe (ST >1.3x / MT >1.5x best) OR it exceeds 3x the query's min by >0.3s (probes can miss host stalls); every discard triggers replacement reps (rounds 4-5, max 6 reps) until 3 clean remain; even-count sets average the middle two; fewer than 2 clean reps fall back to the NON-OUTLIER reps (r14: a 3x-outlier never becomes the published median, even when probes flag everything), then to all reps",""" +
        s""""query_start_offsets_sec":$startsJson,""" +
        s""""query_reps":$repsJson,""" +
        s""""contention_probes":$probesJson,""" +
        s""""contention_probes_mt":$probesMtJson,""" +
        s""""contention_suspects":$suspectsJson,"sf":"$sfDir",$env}""").getBytes("UTF-8"))
    val fullLine =
      s"""{"metric":"headline_total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir",$env}"""
    // The PRINTED line must fit the driver's capture: it keeps only the
    // LAST 2000 chars of stdout and sbt appends ~75 chars of its own
    // after us, so anything over ~1900 chars loses its head — seconds
    // at 3 decimals overflowed that window from r12 on (BENCH_r12–r14
    // parsed null / dropped the first ~36 queries). Integer
    // MILLISECONDS ("unit":"ms") + a short sf tag keep the whole
    // 174-query map inside the window; the full-precision seconds line
    // lands in BENCH_LINE.json and the per-rep dump in
    // BENCH_DETAIL.json.
    // keys keep the "qNN" prefix the driver's parser expects (r15's
    // prefix-free "01" keys saved 175 chars but parsed null driver-side);
    // integer ms keeps the q-prefixed 175-query map at ~1.9k chars —
    // inside the ~1,925-char effective window (2000-char tail capture
    // minus sbt's ~75-char [success] epilogue)
    // toSeq FIRST: mapping the LinkedHashMap directly would collapse
    // colliding compacted keys before the size check could see them
    val compactKeyed = results.toSeq.map { case (k, v) =>
      k.takeWhile(_ != '_') -> math.round(v * 1000) }
    require(compactKeyed.toMap.size == results.size,
      "bench: compacted query keys collide — two queries share a number " +
        "prefix, the printed per-query map would silently drop one")
    val qsMs = compactKeyed.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val sfTag = sfDir.split('/').filter(_.nonEmpty)
      .lastOption.getOrElse(sfDir)
    // "total" not "headline_total": the 9 chars matter — at 177
    // q-prefixed queries the line sits ~5 chars under the capture
    // window, and per-query values gaining a digit on a slow box is
    // exactly the margin this buys back
    val fullHeadline =
      s"""{"metric":"total","value":${math.round(headlineTotal * 1000)},"unit":"ms","queries":$qsMs,"sf":"$sfTag"}"""
    // effective window: the 2000-char stdout tail minus sbt's ~76-char
    // [success] epilogue. When the ms-unit line cannot fit (slow-box
    // values gain digits: at 2× this box's speed the ms render measures
    // 1,959 chars and would lose its head), fall back to the SAME
    // contract shape in integer CENTISECONDS ("unit":"cs") — one digit
    // shorter per slow query, self-describing, and full-precision
    // seconds stay in BENCH_LINE.json / BENCH_DETAIL.json either way.
    val qsCs = compactKeyed.map { case (k, v) =>
      "\"" + k + "\":" + math.round(v / 10.0) }
      .mkString("{", ",", "}")
    val csHeadline =
      s"""{"metric":"total","value":${math.round(headlineTotal * 100)},"unit":"cs","queries":$qsCs,"sf":"$sfTag"}"""
    val headlineLine =
      if (fullHeadline.length <= 1924) fullHeadline
      else if (csHeadline.length <= 1924) csHeadline
      else
        s"""{"value":${math.round(headlineTotal * 100)},"queries":$qsCs,"sf":"$sfTag"}"""
    if (headlineLine.length > 1924)
      System.err.println(s"[bench] WARNING: printed line is " +
        s"${headlineLine.length} chars even after the fallback renders — " +
        "overflows the driver's 2000-char tail capture")
    // Belt and braces for the driver handoff (r7's BENCH_r07.json had
    // "parsed": null despite a well-formed line in the captured tail):
    // the full line is persisted as a file, and the compact line is
    // printed LAST — after spark.stop() — so no shutdown chatter can
    // land between it and process exit, with an explicit flush.
    java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_LINE.json"),
      (fullLine + "\n").getBytes("UTF-8"))
    spark.stop()
    println(headlineLine)
    System.out.flush()
  }
}
