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

  def run(): Double = {
    val t0 = System.nanoTime()
    var h = 0x9e3779b97f4a7c15L
    var i = 0
    while (i < 200000000) {
      h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
      h ^= h >>> 29; h += i
      i += 1
    }
    if (h == 42L) System.err.println("") // defeat dead-code elimination
    (System.nanoTime() - t0) / 1e9
  }
}
