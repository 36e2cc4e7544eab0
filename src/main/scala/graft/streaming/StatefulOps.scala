package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import java.sql.Timestamp

/** Stateful streaming operators — the engine surface beyond the
  * reference's stateless hourly reruns (SURVEY.md §2.9 notes the
  * reference needs none; a complete engine still exposes them):
  *
  *  - watermarked tumbling-window aggregation (late data dropped after
  *    the watermark, state bounded by window retention), and
  *  - session windows via `flatMapGroupsWithState` with processing-time
  *    timeouts (the custom-state escape hatch for semantics windows
  *    can't express).
  *
  * State scale: both shapes key state by (user/window), so state size is
  * O(active keys), shuffled once by key — the standard design for
  * billions-of-events streams; nothing is buffered unbounded.
  */
object StatefulOps {

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class SessionSummary(user_id: Long, n_events: Int,
      total_value: Double, started: Timestamp, ended: Timestamp)

  /** Per-user in-flight session (must stay public: the state encoder's
    * generated code constructs/reads it from another classloader).
    */
  final case class SessionState(n: Int, total: Double,
      started: Long, lastSeen: Long)

  /** Tumbling per-hour event counts with a watermark: rows later than
    * `watermark` behind the max seen event time are dropped, letting
    * Spark discard window state once the watermark passes.
    */
  def hourlyCounts(events: DataFrame, watermark: String = "2 hours")
      : DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(12,2)")).cast("double").as("total_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Per-window top-k events by value: the bounded-state `top_k`
    * aggregate (functions.TopKAgg) inside a watermarked streaming
    * aggregation. Stream state per window is the k-pair BUFFER — the
    * state store checkpoints the serialized buffer and merges new
    * micro-batches into it incrementally — never the window's full
    * event set, which is what a rank-window formulation would have to
    * retain. Emitted on watermark close (append mode): one row per
    * (window, rank ≤ k), best first, ties to the smaller event_id.
    */
  def windowTopK(events: DataFrame, k: Int = 3,
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"))
      .agg(graft.functions.TopKAgg.top_k(
        col("value"), col("event_id"), k).as("top"))
      .select(col("window.start").as("hour_start"),
        posexplode(col("top")).as(Seq("pos", "sc")))
      .select(col("hour_start"), (col("pos") + 1).cast("int").as("rank"),
        col("sc.id").as("event_id"), col("sc.score").as("value"))

  /** Stream-stream interval join: each click enriched with the errors of
    * the same user in the preceding `intervalMinutes`. Watermarks on
    * BOTH inputs plus the time-range predicate are what let Spark expire
    * join state — without them a stream-stream join buffers forever.
    * State is keyed by user and bounded by watermark + interval.
    */
  def clickErrorIntervalJoin(clicks: Dataset[Event], errors: Dataset[Event],
      intervalMinutes: Int = 10, watermark: String = "30 minutes"): DataFrame = {
    val c = clicks.toDF().withWatermark("ts", watermark).alias("c")
    val e = errors.toDF().withWatermark("ts", watermark).alias("e")
    c.join(e,
      expr(s"""c.user_id = e.user_id AND
              |e.ts BETWEEN c.ts - INTERVAL $intervalMinutes MINUTES AND c.ts
              |""".stripMargin))
      .select(col("c.event_id").as("click_id"), col("c.user_id").as("user_id"),
        col("c.ts").as("click_ts"), col("e.event_id").as("error_id"),
        col("e.ts").as("error_ts"), col("e.value").as("error_value"))
  }

  /** Gap sessionization via Spark's NATIVE session_window — the
    * declarative counterpart of [[sessionize]]'s custom
    * flatMapGroupsWithState: windows merge as events arrive, close after
    * `gap` silence, and state expires with the watermark. Prefer this
    * form when per-session output is plain aggregates (Catalyst plans
    * the merge); drop to flatMapGroupsWithState only for custom state
    * semantics — the same built-in-before-custom rule as everywhere.
    */
  def sessionWindowCounts(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(12,2)")).cast("double").as("total_value"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("total_value"))

  /** Streaming exactly-once-per-key dedup with bounded state: duplicate
    * event_ids arriving within the watermark horizon are dropped, and —
    * unlike plain `dropDuplicates`, whose key state grows forever — the
    * per-key state is evicted once the event-time watermark passes it.
    * The streaming face of the batch dedup family in operators.Dedup:
    * at-least-once sources (replayed HTTP fetches, kafka redeliveries)
    * become effectively-once downstream.
    */
  def dedupWithinWatermark(events: DataFrame, watermark: String = "30 minutes")
      : DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Per-user error history for [[asofEnrich]] (ascending ts; public for
    * the state encoder). `maxSeen` drives pruning and idle-state GC.
    */
  final case class ErrEntry(ts: Long, value: Double)
  final case class AsOfState(errors: List[ErrEntry], maxSeen: Long)
  final case class AsOfEnriched(event_id: Long, user_id: Long,
      click_ts: Timestamp, click_value: Double,
      err_ts: Timestamp, err_value: Double)

  /** Streaming as-of enrichment — the streaming face of
    * `plans.AsOfJoin` / `q_asof_native`: every click is enriched with
    * the latest error of the same user at or before it (inclusive,
    * inner). A stream-stream interval join can't express this ("latest
    * within an interval" ≠ "latest ever"), so this is the
    * flatMapGroupsWithState escape hatch, with state designed to stay
    * bounded:
    *
    *  - per user, errors are kept in event-time order; everything older
    *    than `pruneMillis` behind the user's max seen event time is
    *    dropped EXCEPT the newest such error — which must survive
    *    indefinitely, because it stays the as-of match until a newer
    *    error arrives. State is O(errors in the prune horizon) + 1.
    *  - idle users' state is removed by an event-time timeout two prune
    *    horizons after their last activity; late clicks after that
    *    enrich nothing (streaming as-of is forward-looking — no
    *    retro-correction, same trade every streaming enrichment makes).
    *
    * Within a micro-batch, rows process in (ts, event_id) order, so
    * out-of-order arrivals inside the watermark enrich exactly like the
    * batch operator; equal-ts errors resolve last-writer-wins (the batch
    * form dedups (user, ts) upstream instead).
    */
  def asofEnrich(events: Dataset[Event], watermark: String = "1 hour",
      pruneMillis: Long = 60 * 60 * 1000L): Dataset[AsOfEnriched] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[AsOfState, AsOfEnriched](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[AsOfState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var errors = state.getOption.map(_.errors).getOrElse(Nil)
            var maxSeen = state.getOption.map(_.maxSeen).getOrElse(Long.MinValue)
            val out = Seq.newBuilder[AsOfEnriched]
            sorted.foreach { e =>
              val t = e.ts.getTime
              maxSeen = math.max(maxSeen, t)
              e.event_type match {
                case "error" =>
                  // ordered insert (out-of-order errors within the
                  // watermark land in their event-time position)
                  val (before, after) = errors.partition(_.ts <= t)
                  errors = before ::: ErrEntry(t, e.value) :: after
                case "click" =>
                  errors.takeWhile(_.ts <= t).lastOption.foreach { err =>
                    out += AsOfEnriched(e.event_id, userId, e.ts, e.value,
                      new Timestamp(err.ts), err.value)
                  }
                case _ => // other event types pass through state untouched
              }
            }
            val horizon = maxSeen - pruneMillis
            val (old, recent) = errors.partition(_.ts <= horizon)
            state.update(AsOfState(old.lastOption.toList ::: recent, maxSeen))
            state.setTimeoutTimestamp(math.max(maxSeen + 2 * pruneMillis,
              state.getCurrentWatermarkMs + pruneMillis))
            out.result().iterator
          }
      }
  }

  // t1..t3: -1 = unset; maxSeen tracks the committed event-time
  // high-water mark per user, which is what makes cross-batch
  // out-of-order arrivals DETECTABLE (see funnelTrack).
  final case class FunnelState(t1: Long, t2: Long, t3: Long, maxSeen: Long)
  // stage 1..3 = funnel transition; stage 0 = late-event signal (an
  // event that arrived below the user's committed high-water mark —
  // `at` is the late event's own timestamp)
  final case class FunnelHit(user_id: Long, stage: Int, at: Timestamp)

  /** Streaming analogue of the batch `q_funnel`: a per-user state
    * machine over the ordered view → click → purchase sequence,
    * emitting one row per stage TRANSITION as it happens (Append
    * mode) — the live funnel dashboard feed. State per user is three
    * timestamps plus a high-water mark, bounded forever, so no timeout
    * is needed (a funnel never expires here; add one knob if business
    * rules cap the journey window). Correctness contract: with
    * in-order delivery (sorted within each micro-batch — the fold
    * sorts — and watermark-monotonic across batches), the first view
    * seen IS the earliest view, so the incremental fold equals the
    * batch min-cascade exactly; `StatefulOpsSpec` pins parity against
    * `q_funnel` on the same events split across batches.
    *
    * Out-of-order input across batches is DETECTED, not silently
    * folded: an event older than the user's committed high-water mark
    * cannot be honored by an Append-mode cascade (its stage rows are
    * already emitted), so it is EXCLUDED from the cascade — the
    * in-order remainder folds exactly as if the late event never
    * arrived — and surfaces as a STAGE-0 OUTPUT ROW carrying the late
    * event's own timestamp, the operator's the-contract-was-violated
    * signal a deployment alarms on. Late counts ride the result stream
    * as data, so they inherit the sink's exactly-once batchId
    * handling; a driver-side accumulator here would re-add under task
    * retry/replay and report at-least-once counts. Consumers filter
    * `stage >= 1` for the funnel itself.
    */
  def funnelTrack(events: Dataset[Event]): Dataset[FunnelHit] = {
    import events.sparkSession.implicits._
    // micros-precision fold (getTime is millis; the batch oracle
    // compares micros-formatted timestamps, so the state machine must
    // order and strictly-compare at the same resolution)
    def us(t: Timestamp): Long =
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
    def tsOf(u: Long): Timestamp = {
      val t = new Timestamp(Math.floorDiv(u, 1000000L) * 1000L)
      t.setNanos((Math.floorMod(u, 1000000L) * 1000L).toInt)
      t
    }
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelHit](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[FunnelState]) =>
          var s = state.getOption
            .getOrElse(FunnelState(-1L, -1L, -1L, Long.MinValue))
          val committedMax = s.maxSeen
          val hits = Seq.newBuilder[FunnelHit]
          rows.toSeq.sortBy(e => (us(e.ts), e.event_id)).foreach { e =>
            val t = us(e.ts)
            if (t < committedMax) {
              // below the committed high-water mark: emit the late
              // signal and keep the event OUT of the cascade (folding
              // it could claim an unclaimed stage out of order)
              hits += FunnelHit(userId, 0, tsOf(t))
            } else {
              s = s.copy(maxSeen = math.max(s.maxSeen, t))
              if (s.t1 < 0 && e.event_type == "view") {
                s = s.copy(t1 = t); hits += FunnelHit(userId, 1, tsOf(t))
              } else if (s.t1 >= 0 && s.t2 < 0 && e.event_type == "click" && t > s.t1) {
                s = s.copy(t2 = t); hits += FunnelHit(userId, 2, tsOf(t))
              } else if (s.t2 >= 0 && s.t3 < 0 && e.event_type == "purchase" && t > s.t2) {
                s = s.copy(t3 = t); hits += FunnelHit(userId, 3, tsOf(t))
              }
            }
          }
          state.update(s)
          hits.result().iterator
      }
  }

  /** Event sessionization: events of a user belong to one session while
    * gaps stay under `gapMillis`; sessions flush either when a later
    * event of the same user opens a new one, or when the event-time
    * watermark passes the gap (event-time timeout — data-driven, unlike
    * processing-time timeouts which busy-loop empty micro-batches in
    * low-traffic streams).
    */
  def sessionize(events: Dataset[Event], gapMillis: Long = 30 * 60 * 1000L,
      watermark: String = "1 hour"): Dataset[SessionSummary] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionSummary](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionSummary(userId, s.n, s.total,
              new Timestamp(s.started), new Timestamp(s.lastSeen)))
          } else {
            val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var cur = state.getOption
            val closed = Seq.newBuilder[SessionSummary]
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.lastSeen <= gapMillis =>
                  cur = Some(s.copy(n = s.n + 1, total = s.total + e.value,
                    lastSeen = t))
                case Some(s) => // gap exceeded: close previous session
                  closed += SessionSummary(userId, s.n, s.total,
                    new Timestamp(s.started), new Timestamp(s.lastSeen))
                  cur = Some(SessionState(1, e.value, t, t))
                case None =>
                  cur = Some(SessionState(1, e.value, t, t))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastSeen + gapMillis)
            }
            closed.result().iterator
          }
      }
  }
}
