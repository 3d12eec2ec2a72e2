package graft.queries

import scala.util.Random

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Implementation-diversity differential for the ordered windowed funnel:
  * the production window-chain plan vs an independent per-user sort+fold
  * (groupByKey → mapGroups state machine, the "obviously correct but
  * unscalable" formulation), across seeded-random step sequences and
  * window sizes over the real events table. Any divergence is a
  * semantics bug in one of the two — the fold is too simple to be wrong
  * the same way the window chain would be.
  */
class FunnelDifferentialSpec extends SparkTestBase {

  private val eventTypes =
    Seq("signup", "view", "purchase", "click", "error")

  /** Production shape: stacked whole-partition windows (mirrors
    * Funnel.perUserStepTimes for an arbitrary step list/window).
    */
  private def windowChain(steps: Seq[String], windowMs: Long,
      strict: Boolean): Map[Long, Int] = {
    val w = Window.partitionBy("user_id")
    val e = Tables.load(spark, sfDir, "events")
      .filter(col("event_type").isin(steps: _*))
      .select("user_id", "ts", "event_type")
    var df = e.withColumn(
      "t1", min(when(col("event_type") === steps.head, col("ts"))).over(w))
    val deadline = expr(s"t1 + make_dt_interval(0, 0, 0, $windowMs / 1000.0)")
    for (k <- 1 until steps.length) {
      val prev = col(s"t$k")
      val ok = if (strict) col("ts") > prev else col("ts") >= prev
      df = df.withColumn(s"t${k + 1}",
        min(when(col("event_type") === steps(k) &&
          ok && col("ts") <= deadline,
          col("ts"))).over(w))
    }
    val tCols = (1 to steps.length).map(k => min(s"t$k").as(s"t$k"))
    df.groupBy("user_id").agg(tCols.head, tCols.tail: _*)
      .collect()
      .map { r =>
        val maxStep = (steps.length to 1 by -1)
          .find(k => !r.isNullAt(k)).getOrElse(0)
        r.getLong(0) -> maxStep
      }.toMap
  }

  /** Independent oracle: per-user chronological fold. */
  private def sortFold(steps: Seq[String], windowMs: Long,
      strict: Boolean): Map[Long, Int] = {
    import spark.implicits._
    val stepIdx = steps.zipWithIndex.toMap
    Tables.load(spark, sfDir, "events")
      .filter(col("event_type").isin(steps: _*))
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_type"))
      .as[(Long, Long, String)]
      .groupByKey(_._1)
      .mapGroups { (uid, rows) =>
        // everything in MICROSECONDS: t1 = min ts of step-0 events, then
        // scan forward for the first step-k strictly after t_{k-1}, all
        // within t1 + window
        val sorted = rows.toSeq.map { case (_, us, ty) => (us, ty) }
          .sortBy(_._1)
        val t1 = sorted.collectFirst {
          case (us, ty) if stepIdx(ty) == 0 => us }
        t1 match {
          case None => uid -> 0
          case Some(anchor) =>
            val deadline = anchor + windowMs * 1000L
            var reached = 1
            var lastTs = anchor
            var done = false
            while (!done && reached < steps.length) {
              sorted.find { case (us, ty) =>
                stepIdx(ty) == reached && us <= deadline &&
                  (if (strict) us > lastTs else us >= lastTs)
              } match {
                case Some((us, _)) => lastTs = us; reached += 1
                case None => done = true
              }
            }
            uid -> reached
        }
      }
      .collect().toMap
  }

  test("random funnel configs: window-chain matches the per-user fold") {
    val rnd = new Random(20260815L)
    for (i <- 1 to 12) {
      val len = 2 + rnd.nextInt(4) // 2- to 5-step funnels (N-step engine)
      val steps = rnd.shuffle(eventTypes).take(len)
      val windowMs = (1L + rnd.nextInt(96)) * 3600 * 1000
      val strict = rnd.nextBoolean()
      val a = windowChain(steps, windowMs, strict)
      val b = sortFold(steps, windowMs, strict)
      assert(a === b,
        s"draw $i: steps=$steps windowMs=$windowMs strict=$strict diverged " +
          s"(chain=${a.toSeq.sorted.take(5)}... fold=${b.toSeq.sorted.take(5)}...)")
    }
  }

  /** Independent session oracle: per-user sort → gap-split → chain-fold
    * each session. Returns (user, session_idx) -> max_step.
    */
  private def sessionSortFold(steps: Seq[String], gapMs: Long,
      windowMs: Long, strict: Boolean): Map[(Long, Long), Int] = {
    import spark.implicits._
    val stepIdx = steps.zipWithIndex.toMap
    Tables.load(spark, sfDir, "events")
      .filter(col("event_type").isin(steps: _*))
      .select(col("user_id"), unix_millis(col("ts")).as("ms"),
        col("event_type"))
      .as[(Long, Long, String)]
      .collect().groupBy(_._1).toSeq
      .flatMap { case (uid, rows) =>
        val sorted = rows.map { case (_, ms, ty) => (ms, ty) }.sortBy(_._1)
        // gap-split into sessions (ties share a session by construction)
        val sessions = scala.collection.mutable.ListBuffer
          .empty[Vector[(Long, String)]]
        sorted.foreach { e =>
          if (sessions.nonEmpty && e._1 - sessions.last.last._1 <= gapMs)
            sessions(sessions.length - 1) = sessions.last :+ e
          else sessions += Vector(e)
        }
        sessions.zipWithIndex.map { case (es, i) =>
          val t1 = es.collectFirst { case (ms, ty) if stepIdx(ty) == 0 => ms }
          val maxStep = t1 match {
            case None => 0
            case Some(anchor) =>
              val deadline = anchor + windowMs
              var reached = 1
              var lastTs = anchor
              var done = false
              while (!done && reached < steps.length) {
                es.find { case (ms, ty) =>
                  stepIdx(ty) == reached && ms <= deadline &&
                    (if (strict) ms > lastTs else ms >= lastTs)
                } match {
                  case Some((ms, _)) => lastTs = ms; reached += 1
                  case None => done = true
                }
              }
              reached
          }
          (uid, (i + 1).toLong) -> maxStep
        }
      }.toMap
  }

  test("random session-funnel configs: the q144 engine matches the gap-split fold") {
    val rnd = new Random(77110815L)
    for (i <- 1 to 8) {
      val len = 2 + rnd.nextInt(3)
      val steps = rnd.shuffle(eventTypes).take(len)
      val gapMs = (10L + rnd.nextInt(50)) * 60 * 1000 // 10-60 min
      val windowMs = (1L + rnd.nextInt(4)) * 3600 * 1000 // 1-4 h
      val strict = rnd.nextBoolean()
      val prod = Funnel.perSessionStepTimes(
          Tables.load(spark, sfDir, "events"), steps, gapMs,
          s"INTERVAL ${windowMs / 1000} SECONDS", strict)
        .collect().map { r =>
          val maxStep = (len + 1 to 2 by -1)
            .find(c => !r.isNullAt(c)).map(_ - 1).getOrElse(0)
          (r.getLong(0), r.getLong(1)) -> maxStep
        }.toMap
      val fold = sessionSortFold(steps, gapMs, windowMs, strict)
      assert(prod === fold,
        s"draw $i: steps=$steps gap=${gapMs / 60000}m window=${windowMs / 3600000}h strict=$strict diverged")
    }
  }

  test("the declared q133/q134 config agrees between both implementations") {
    val a = windowChain(Seq("signup", "view", "purchase"), 48L * 3600 * 1000,
      strict = true)
    val b = sortFold(Seq("signup", "view", "purchase"), 48L * 3600 * 1000,
      strict = true)
    assert(a === b)
    val q134 = Funnel.queries("q134_funnel_max_step")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a === q134)
  }
}
