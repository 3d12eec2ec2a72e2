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
  case class SessionsState(open: List[SessionState])
  case class SessionOut(user_id: Long, start_ms: Long, end_ms: Long,
      n_events: Int, sum_value: Double)

  /** Custom sessionizer via flatMapGroupsWithState: emits a session row
    * once the watermark passes 30 minutes beyond the session's last
    * event. Demonstrates arbitrary stateful processing beyond built-in
    * session_window.
    *
    * State is the user's set of still-OPEN sessions (usually one; more
    * when the global watermark lags the user's own events — a laggard
    * co-source — so an admitted event can open a distinct EARLIER
    * session behind the current one). Every invocation runs the same
    * drain: fold the new events into the open set with a gap-tolerant
    * interval merge (which also handles out-of-order arrivals inside a
    * session and events that BRIDGE two open sessions), then emit
    * exactly the sessions the watermark has closed (`wm > last + gap` —
    * at `wm == last + gap` an admissible event at `t == wm` could still
    * extend, so equality keeps the session open). Nothing emits before
    * its close is final, which is what makes the stream equal the batch
    * gap-fold over the watermark-respecting history: any event that
    * could change an emitted row is below the watermark, hence dropped
    * as late.
    *
    * NOTE (state format): the state schema changed from a single
    * SessionState to SessionsState(open: List[...]) — restart streams
    * from a FRESH checkpoint after upgrading; an old checkpoint's state
    * rows do not decode.
    *
    * Pass `applyWatermark = false` when the caller already watermarked
    * the input — e.g. a union of independently-lagging sources, where
    * per-source watermarks (min-combined by Spark) admit events far
    * behind the fastest source; Spark disallows re-watermarking there.
    */
  def statefulSessionize(
      events: Dataset[Event],
      applyWatermark: Boolean = true): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapMs = 30L * 60 * 1000
    (if (applyWatermark) events.withWatermark("ts", "10 minutes") else events)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionsState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionsState]) =>
          // timeout firings and data batches run the SAME drain (rows is
          // simply empty on timeout)
          val prevOpen = state.getOption.map(_.open).getOrElse(Nil)
          val items = (prevOpen ++ rows.map(e =>
            SessionState(e.ts.getTime, e.ts.getTime, 1, e.value)))
            .sortBy(s => (s.start, s.last))
          // gap-tolerant interval merge over (open sessions + events):
          // subsumes the old straggler / out-of-order special cases and
          // merges sessions a new event bridges
          var merged = List.empty[SessionState] // reverse start order
          items.foreach { it =>
            merged = merged match {
              case h :: t if it.start - h.last <= gapMs =>
                SessionState(h.start, math.max(h.last, it.last),
                  h.n + it.n, h.sum + it.sum) :: t
              case other => it :: other
            }
          }
          val wm = state.getCurrentWatermarkMs()
          val (open, closed) = merged.partition(_.last + gapMs >= wm)
          if (open.isEmpty) {
            if (state.exists) state.remove()
          } else {
            state.update(SessionsState(open))
            // fire when the watermark passes the EARLIEST open deadline;
            // Spark requires the timestamp strictly above the watermark
            // (deadline == wm happens when only a t == wm event could
            // still extend — re-check one tick later)
            val firstDeadline = open.map(_.last + gapMs).min
            state.setTimeoutTimestamp(math.max(firstDeadline, wm + 1))
          }
          closed.reverseIterator.map(s =>
            SessionOut(userId, s.start, s.last, s.n, s.sum))
      }
  }

  case class FunnelState(t1: Long, pending: List[(Long, Int)],
      anchors: List[Long])
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
    * RE-ENTRY: a step-1 event PAST the current funnel's window starts a
    * NEW funnel (one output row per entry, keyed by `step1_ms`). Entry
    * anchors form the greedy chain over the user's step-1 times: the
    * first anchor is the global min; each next anchor is the min step-1
    * time strictly past the previous anchor's deadline. Step-1 events
    * INSIDE an entry's window are absorbed (they can never anchor: for
    * an absorbed s ≤ a + windowMs to resurrect, a future lower anchor
    * a' < s − windowMs would have to arrive, but future arrivals sit at
    * or above the watermark and every stored time is ≤ wm + lateness
    * < wm + windowMs — impossible while windowMs exceeds the lateness
    * horizon, which the `require` below enforces). Anchors are carried
    * in state, so a signup arriving in the same batch as — or before —
    * the prior funnel's resolution re-seeds the state instead of being
    * dropped with it. The batch q134 anchors once at the user's global
    * min step-1 ts; its row corresponds to the stream's FIRST-entry row
    * (min `step1_ms` per user). Collapse to q134 by taking each user's
    * min-`step1_ms` row.
    *
    * NOTE (state format): FunnelState gained the `anchors` field when
    * re-entry landed — a checkpoint written by the pre-anchor version
    * does not decode under this code. Restart upgraded streams from a
    * FRESH checkpoint (same policy as statefulSessionize's
    * SessionsState change).
    */
  def statefulFunnel(
      events: Dataset[Event],
      steps: Seq[String] = Seq("signup", "view", "purchase"),
      windowMs: Long = 48L * 3600 * 1000,
      strictIncrease: Boolean = true): Dataset[FunnelOut] = {
    import events.sparkSession.implicits._
    val stepIdx = steps.zipWithIndex.toMap
    val None1 = Long.MaxValue
    // the anchor-chain compression and the anchorless prune are exact
    // only while an admitted event can never sit a full window below a
    // future arrival; Spark admits events down to the watermark, so the
    // window must exceed the 10-minute lateness horizon set below
    require(windowMs > 10L * 60 * 1000,
      s"funnel windowMs ($windowMs) must exceed the 10-minute lateness horizon")

    def after(t: Long, prev: Long): Boolean =
      if (strictIncrease) t > prev else t >= prev

    def resolve(uid: Long, t1: Long, pending: List[(Long, Int)]): FunnelOut = {
      // fold the chain over ANY number of steps (batch parity:
      // Funnel.perKeyStepTimes generalizes the same way)
      val deadline = t1 + windowMs
      val inWin = pending.filter { case (t, _) =>
        after(t, t1) && t <= deadline }
      var prev = t1
      var maxStep = 1
      var k = 1
      var chained = true
      while (chained && k < steps.length) {
        inWin.collect { case (t, kk) if kk == k && after(t, prev) => t }
          .minOption match {
          case Some(t) => prev = t; k += 1; maxStep = k
          case None => chained = false
        }
      }
      FunnelOut(uid, maxStep, t1)
    }

    /** Greedy entry chain over all known step-1 times: head anchors the
      * current funnel, tail are future-entry anchors past its deadline.
      */
    def chainOf(step1s: Seq[Long]): List[Long] = {
      var chain = List.empty[Long]
      step1s.sorted.foreach { s =>
        if (chain.isEmpty || s > chain.head + windowMs) chain ::= s
      }
      chain.reverse
    }

    events
      .filter(e => stepIdx.contains(e.event_type))
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, rows: Iterator[Event], state: GroupState[FunnelState]) =>
          // timeout firings and data batches run the SAME drain: fold new
          // events (none on timeout) into the state, then resolve every
          // entry whose window the watermark has closed
          val prev = state.getOption.getOrElse(FunnelState(None1, Nil, Nil))
          var step1s = List.empty[Long]
          if (prev.t1 != None1) step1s ::= prev.t1
          step1s = prev.anchors reverse_::: step1s
          var pending = prev.pending
          rows.foreach { e =>
            val t = e.ts.getTime
            stepIdx(e.event_type) match {
              case 0 => step1s ::= t
              case k => pending = (t, k) :: pending
            }
          }
          // duplicate (t, k) pairs are inert (resolve only takes minima
          // over distinct times per step), so dedup bounds a replay-storm
          // bot's state at the distinct pairs inside the lateness horizon
          // instead of its raw event count — the streaming analog of the
          // batch engine's collapseDuplicates
          pending = pending.distinct
          step1s = step1s.distinct
          var chain = chainOf(step1s)
          var t1 = chain.headOption.getOrElse(None1)
          if (chain.nonEmpty) chain = chain.tail
          val wm = state.getCurrentWatermarkMs()
          // keep a pending event iff it can still qualify: inside the
          // current entry's window, inside a KNOWN future anchor's window
          // (once the watermark passes the current deadline — a timeout
          // firing — an event for the next entry can sit at or below wm,
          // so the anchor clause is load-bearing, not belt-and-braces),
          // or above the watermark, where a yet-unseen step-1 anchor
          // a ≥ wm may still claim it (at t == wm only in non-strict
          // mode, where t >= a chains). With no anchor at all only the
          // above-watermark clause applies, which bounds a never-
          // signing-up spammer's state to the lateness horizon.
          def keep(t: Long): Boolean =
            (t1 != None1 && t <= t1 + windowMs) ||
              chain.exists(a => after(t, a) && t <= a + windowMs) ||
              (if (strictIncrease) t > wm else t >= wm)
          pending = pending.filter { case (t, _) => keep(t) }
          // drain every entry already closed under the watermark — a
          // deep-late step 1, or a timeout firing; re-seed from the next
          // anchor instead of dropping it with the resolved entry
          var out = List.empty[FunnelOut]
          while (t1 != None1 && t1 + windowMs <= wm) {
            out ::= resolve(uid, t1, pending)
            t1 = chain.headOption.getOrElse(None1)
            if (chain.nonEmpty) chain = chain.tail
            pending = pending.filter { case (t, _) => keep(t) }
          }
          if (t1 == None1 && pending.isEmpty) {
            // nothing live: anchorless users age out SILENTLY (see
            // Scaladoc: a step-0 verdict about an open future would be
            // wrong the moment a signup arrives)
            if (state.exists) state.remove()
          } else {
            state.update(FunnelState(t1, pending, chain))
            // GC horizon for never-signed-up users anchors at their
            // latest EVENT time (the watermark can still be 0 in the
            // first micro-batch; an epoch-relative timeout would fire
            // immediately and drop the buffered events)
            val lastSeen = pending.foldLeft(wm) {
              case (m, (t, _)) => math.max(m, t) }
            state.setTimeoutTimestamp(
              if (t1 != None1) t1 + windowMs else lastSeen + windowMs)
          }
          out.reverseIterator
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
