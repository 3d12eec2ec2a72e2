package graft

/** Fixed-work CPU calibration probe shared by [[Bench]] and
  * [[PinotBench]]: a deterministic 64-bit mixing loop whose wall time
  * depends only on single-core CPU availability — data-independent,
  * allocation-free, JIT-warmed by its first run. Timed before and after
  * a benchmark sweep; on an idle box both land in a tight band (~0.5 s
  * on current x86), so an elevated or skewed pair marks the RUN as
  * contended, making environment noise attributable from the artifact
  * alone instead of by re-measurement. One shared implementation keeps
  * the two artifacts' calibration numbers comparable.
  */
object Calibrate {

  val WorkDescription = "200M-iter 64-bit mix loop, single thread"

  private def mix(): Long = {
    var h = 0x9e3779b97f4a7c15L
    var i = 0
    while (i < 200000000) {
      h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
      h ^= h >>> 29; h += i
      i += 1
    }
    h
  }

  def run(): Double = {
    val t0 = System.nanoTime()
    val h = mix()
    if (h == 42L) System.err.println("") // defeat dead-code elimination
    (System.nanoTime() - t0) / 1e9
  }

  /** Standalone probe main: prints one JSON line with two single-thread
    * readings and one saturating reading — the cheap way to poll the
    * box's basal state between benchmark attempts (the PinotBench gate
    * is only decidable near the 0.508 s clean floor, so sessions poll
    * for a clean window before burning a full battery run).
    */
  def main(args: Array[String]): Unit = {
    run() // JIT warm-up
    val a = run(); val b = run()
    val mt = runParallel(Runtime.getRuntime.availableProcessors())
    println(f"""{"st1_sec":$a%.3f,"st2_sec":$b%.3f,"mt_sec":$mt%.3f}""")
  }

  /** SATURATING probe: the same fixed work on every core at once. A
    * single-thread probe provably misses multi-core contention (r4: a
    * clean 0.52/0.55 pair coexisted with 4-6× per-query inflation) —
    * when all cores run the loop simultaneously, any external load MUST
    * steal cycles from some thread and the max-thread wall time
    * stretches. Idle box: ≈ the single-thread time (each core runs its
    * own loop); contended: proportionally elevated.
    */
  def runParallel(threads: Int): Double = {
    val t0 = System.nanoTime()
    val sink = new java.util.concurrent.atomic.AtomicLong()
    val ts = (1 to threads).map { _ =>
      val t = new Thread(() => { sink.addAndGet(mix()); () })
      t.start()
      t
    }
    ts.foreach(_.join())
    if (sink.get() == 42L) System.err.println("") // defeat DCE
    (System.nanoTime() - t0) / 1e9
  }
}
