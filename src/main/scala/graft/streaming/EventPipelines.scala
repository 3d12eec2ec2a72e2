package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming pipelines over the `events` table schema
  * (event_id, ts, user_id, event_type, value, props).
  *
  * Every transform is written against a plain DataFrame so the SAME code
  * runs in batch (oracle-checked via graft.queries.Events) and under
  * `readStream` (watermark/late-data behavior tested in StreamingSpec) —
  * Spark's unified model, in contrast to the reference which has no
  * streaming execution at all (REALTIME segments are read as batch;
  * reference: exec.rs:53-54, metadata_provider.rs:143-149).
  *
  * Scale notes: all stateful ops key by (window/session, event_type or
  * user_id) so state partitions across executors; watermarks bound state
  * size — nothing accumulates unboundedly at 100 TB/day event volumes.
  */
object EventPipelines {

  /** Tumbling 1-hour windows per event_type with a 10-minute watermark. */
  def hourlyByType(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("cnt"),
        round(sum("value"), 2).as("sum_value"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        col("event_type"), col("cnt"), col("sum_value"))

  /** Sliding 1-hour windows every 15 minutes (global, watermarked). */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"))
      .agg(count(lit(1)).as("cnt"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        col("cnt"))

  /** Gap-based sessionization: session_window with a 30-minute gap. */
  def sessionize(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes").as("s"), col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("sum_value"))
      .select(
        col("user_id"),
        date_format(col("s.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        col("n_events"), col("sum_value"))

  /** Streaming exact dedup on event_id: `dropDuplicatesWithinWatermark`
    * keeps per-key state only until the watermark passes the key's event
    * time — the streaming counterpart of the batch digest dedup (q40),
    * with state bounded by the watermark horizon instead of the corpus
    * size. An at-least-once ingest (e.g. a replayed Kafka batch) becomes
    * exactly-once content downstream.
    */
  def dedupByEventId(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream interval join: attribute each purchase to every view
    * by the same user within the preceding 30 minutes. Both sides carry
    * watermarks, so under streaming execution Spark bounds the join
    * state to interval + watermark horizon and emits in append mode as
    * the watermark passes — the canonical streaming attribution shape
    * (the reference has no streaming execution at all). The same code
    * runs in batch, where q83's DuckDB oracle hash-checks it; interval
    * boundaries compare at Spark's microsecond timestamp grain, matched
    * exactly by epoch_us in the oracle.
    */
  def attribution(events: DataFrame): DataFrame = {
    val v = events.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("vts"),
        col("event_id").as("view_id"))
      .withWatermark("vts", "10 minutes")
    val p = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("pts"),
        col("event_id").as("purchase_id"))
      .withWatermark("pts", "10 minutes")
    v.join(p,
      col("v_user") === col("p_user") &&
        col("pts") >= col("vts") &&
        col("pts") < col("vts") + expr("INTERVAL 30 MINUTES"))
      .select(col("v_user").as("user_id"), col("view_id"),
        col("purchase_id"),
        expr("(unix_micros(pts) - unix_micros(vts)) div 1000")
          .as("latency_ms"))
  }

  // ---- custom stateful operator (flatMapGroupsWithState) ----

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)
  case class SessionState(start: Long, last: Long, n: Int, sum: Double)
  case class SessionOut(user_id: Long, start_ms: Long, end_ms: Long,
      n_events: Int, sum_value: Double)

  /** Custom sessionizer via flatMapGroupsWithState: emits a session row
    * when 30 minutes pass with no events for the user (event-time timeout
    * driven by the watermark). Demonstrates arbitrary stateful processing
    * beyond built-in session_window.
    */
  def statefulSessionize(events: Dataset[Event]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapMs = 30L * 60 * 1000
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(userId, s.start, s.last, s.n, s.sum))
          } else {
            val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var out = List.empty[SessionOut]
            var cur = state.getOption
            for (e <- sorted) {
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= gapMs =>
                  // a cross-batch out-of-order event may precede s.last
                  // by up to the watermark delay; extending with min/max
                  // (not blind last := t) keeps the session's true span —
                  // a shrunk `last` made the NEXT gap check split
                  // sessions that the totally-ordered fold keeps whole.
                  // Correct because gap (30 min) > lateness (10 min): an
                  // admitted event can never belong to a PRIOR session.
                  cur = Some(SessionState(math.min(s.start, t),
                    math.max(s.last, t), s.n + 1, s.sum + e.value))
                case Some(s) =>
                  out ::= SessionOut(userId, s.start, s.last, s.n, s.sum)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapMs)
            }
            out.reverseIterator
          }
      }
  }

  case class FunnelState(t1: Long, pending: List[(Long, Int)])
  case class FunnelOut(user_id: Long, max_step: Int, step1_ms: Long)

  /** Streaming ordered-windowed funnel — q133/q134's batch semantics
    * (steps in order — strictly after the previous by default, at-or-
    * after under `strictIncrease = false` to mirror q139's default
    * Pinot mode — all within `windowMs` of the FIRST step-1 event)
    * resolved continuously: each user's funnel emits exactly when
    * the watermark passes `t1 + windowMs`, at which point every event
    * that could legally affect the outcome has either arrived or been
    * dropped as late — so the emitted row equals the batch fold over the
    * watermark-respecting history.
    *
    * State per user is (min step-1 ts, pending later-step events), with
    * two pruning rules that keep it bounded without losing exactness:
    * a step-1 arrival only ever LOWERS t1 (it's a min), so later-step
    * events past the CURRENT deadline can never qualify and are dropped;
    * pre-t1 later-step events are kept because an earlier signup may yet
    * make them eligible. Users with no step-1 anchor age out SILENTLY
    * one window past their latest event — emitting a step-0 verdict
    * there would be claiming "never signs up" about an unbounded future
    * (and a later signup would contradict it with a second row); q134's
    * step-0 rows exist only because batch sees a closed world. The
    * silent removal is exact for users who DO sign up later: everything
    * it discards is below the watermark, and a future anchor must sit
    * above it, so nothing discarded could ever have qualified.
    *
    * RE-ENTRY: a step-1 event arriving after the user's previous funnel
    * window has resolved starts a NEW funnel (one output row per entry,
    * keyed by `step1_ms`). The batch q134 anchors once at the user's
    * global min step-1 ts; its row corresponds to the stream's
    * FIRST-entry row (min `step1_ms` per user), which is exact because
    * the first resolution sees every watermark-respecting event inside
    * its window. Continuous funnels genuinely re-enter (that's the
    * point of running them on a stream); collapse to q134 by taking
    * each user's min-`step1_ms` row.
    */
  def statefulFunnel(
      events: Dataset[Event],
      steps: Seq[String] = Seq("signup", "view", "purchase"),
      windowMs: Long = 48L * 3600 * 1000,
      strictIncrease: Boolean = true): Dataset[FunnelOut] = {
    import events.sparkSession.implicits._
    val stepIdx = steps.zipWithIndex.toMap
    val None1 = Long.MaxValue

    def after(t: Long, prev: Long): Boolean =
      if (strictIncrease) t > prev else t >= prev

    def resolve(uid: Long, s: FunnelState): FunnelOut = {
      if (s.t1 == None1) return FunnelOut(uid, 0, -1L)
      val deadline = s.t1 + windowMs
      val inWin = s.pending.filter { case (t, _) =>
        after(t, s.t1) && t <= deadline }
      val t2 = inWin.collect { case (t, 1) => t }
        .minOption.getOrElse(None1)
      val t3 = inWin.collect { case (t, 2) if after(t, t2) => t }
        .minOption.getOrElse(None1)
      val maxStep = if (t3 != None1) 3 else if (t2 != None1) 2 else 1
      FunnelOut(uid, maxStep, s.t1)
    }

    events
      .filter(e => stepIdx.contains(e.event_type))
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, rows: Iterator[Event], state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            // no anchor by the GC horizon → age out silently (see
            // Scaladoc: a step-0 verdict about an open future would be
            // wrong the moment a signup arrives)
            if (s.t1 == None1) Iterator.empty
            else Iterator.single(resolve(uid, s))
          } else {
            val prev = state.getOption.getOrElse(FunnelState(None1, Nil))
            var t1 = prev.t1
            var pending = prev.pending
            rows.foreach { e =>
              val t = e.ts.getTime
              stepIdx(e.event_type) match {
                case 0 => if (t < t1) t1 = t
                case k => pending = (t, k) :: pending
              }
            }
            val wm = state.getCurrentWatermarkMs()
            if (t1 != None1) pending =
              pending.filter { case (t, _) => t <= t1 + windowMs }
            else pending = pending.filter { case (t, _) => t > wm }
            // the else-branch prune is exactness-preserving: with no
            // step-1 anchor yet, a pending event at ts v can only ever
            // qualify under a FUTURE step-1 with t1 < v; future arrivals
            // sit above the watermark (later ones are dropped as late),
            // so t1 > wm ≥ v is impossible to satisfy — v is dead. This
            // bounds a never-signing-up spammer's state to the lateness
            // horizon instead of its whole history.
            if (t1 != None1 && t1 + windowMs <= wm) {
              // the window already closed under the watermark (deep-late
              // step 1): resolve immediately instead of scheduling a
              // timeout in the past
              state.remove()
              Iterator.single(resolve(uid, FunnelState(t1, pending)))
            } else {
              state.update(FunnelState(t1, pending))
              // GC horizon for never-signed-up users anchors at their
              // latest EVENT time (the watermark can still be 0 in the
              // first micro-batch; an epoch-relative timeout would fire
              // immediately and drop the buffered events)
              val lastSeen = pending.foldLeft(wm) {
                case (m, (t, _)) => math.max(m, t) }
              state.setTimeoutTimestamp(
                if (t1 != None1) t1 + windowMs else lastSeen + windowMs)
              Iterator.empty
            }
          }
      }
  }

  case class LatestOut(user_id: Long, last_ms: Long, last_id: Long,
      last_type: String, last_value: Double, n_versions: Long)

  /** Streaming upsert view (Pinot upsert-table semantics in motion —
    * q87's batch aggregate as continuously-maintained state): per
    * primary key, keep only the LATEST version by (comparison column,
    * tie-break id); every micro-batch emits each touched key's current
    * winner, so an update-mode sink materializes the upsert view
    * incrementally. State is ONE small row per live key — the bound a
    * Pinot upsert server's primary-key metadata carries.
    */
  def latestWins(events: Dataset[Event]): Dataset[LatestOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[LatestOut, LatestOut](GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[LatestOut]) =>
          val batch = rows.toSeq
          val b = batch.maxBy(e => (e.ts.getTime, e.event_id))
          val versions = state.getOption.map(_.n_versions).getOrElse(0L)
          val incoming = LatestOut(userId, b.ts.getTime, b.event_id,
            b.event_type, b.value, 0L)
          val winner = state.getOption match {
            case Some(cur) if cur.last_ms > incoming.last_ms ||
                (cur.last_ms == incoming.last_ms &&
                  cur.last_id >= incoming.last_id) => cur
            case _ => incoming
          }
          // n_versions counts every ingested version, winner or not
          val next = winner.copy(n_versions = versions + batch.size)
          state.update(next)
          next
      }
  }
}
