package graft

import graft.streaming.StatefulOps
import graft.streaming.StatefulOps.{Event, SessionSummary}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.date_format
import org.apache.spark.sql.streaming.OutputMode

import java.sql.Timestamp

class StatefulOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2026-08-12 09:$minute%02d:00")

  test("watermarked hourly counts aggregate by tumbling window") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[Event]
    val q = StatefulOps.hourlyCounts(in.toDF())
      .writeStream.format("memory").queryName("hourly")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(
        Event(1, ts(5), 1, "click", 1.0),
        Event(2, ts(10), 2, "click", 2.0),
        Event(3, ts(20), 1, "error", 5.0))
      q.processAllAvailable()
      // watermark still open → append emits nothing yet; advance it far
      // past the window end with a late-hour event
      in.addData(Event(9, Timestamp.valueOf("2026-08-12 13:00:00"), 9, "click", 0.0))
      q.processAllAvailable()
      val rows = spark.table("hourly")
        .select($"event_type", $"n", $"total_value")
        .as[(String, Long, Double)].collect().toSet
      assert(rows.contains(("click", 2L, 3.0)))
      assert(rows.contains(("error", 1L, 5.0)))
    } finally q.stop()
  }

  test("windowTopK: the custom top_k aggregate merges incrementally " +
    "across micro-batches in the state store; ranks reflect ALL batches") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[Event]
    val q = StatefulOps.windowTopK(in.toDF(), k = 3)
      .writeStream.format("memory").queryName("wtopk")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: two events in the 09:00 window
      in.addData(
        Event(1, ts(5), 1, "click", 5.0),
        Event(2, ts(10), 2, "click", 1.0))
      q.processAllAvailable()
      // batch 2: two MORE events in the same window — one outranks both
      in.addData(
        Event(3, ts(20), 1, "click", 9.0),
        Event(4, ts(25), 2, "click", 0.5))
      q.processAllAvailable()
      // advance the watermark past the window end to emit it
      in.addData(Event(9, Timestamp.valueOf("2026-08-12 13:00:00"), 9, "x", 0.0))
      q.processAllAvailable()
      val rows = spark.table("wtopk")
        .select($"rank", $"event_id", $"value")
        .as[(Int, Long, Double)].collect().sortBy(_._1).toSeq
      // top-3 across BOTH batches: 9.0 (batch 2), 5.0 (batch 1), 1.0
      assert(rows == Seq((1, 3L, 9.0), (2, 1L, 5.0), (3, 2L, 1.0)), rows)
    } finally q.stop()
  }

  test("dedup within watermark: duplicate event_ids drop, state is bounded") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[Event]
    val q = StatefulOps.dedupWithinWatermark(in.toDF())
      .writeStream.format("memory").queryName("dedupww")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(
        Event(1, ts(5), 1, "click", 1.0),
        Event(1, ts(5), 1, "click", 1.0), // same-batch duplicate
        Event(2, ts(10), 2, "click", 2.0))
      q.processAllAvailable()
      in.addData(Event(1, ts(6), 1, "click", 1.0)) // redelivery, next batch
      q.processAllAvailable()
      val ids = spark.table("dedupww").select($"event_id")
        .as[Long].collect().toSeq
      assert(ids.sorted == Seq(1L, 2L))
    } finally q.stop()
  }

  test("asofEnrich: clicks pick the latest error at or before, across " +
    "micro-batches, state pruned but the last old error survives") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[Event]
    // prune horizon 10 min so the test exercises pruning
    val q = StatefulOps.asofEnrich(in.toDS(), watermark = "5 minutes",
        pruneMillis = 10 * 60 * 1000L)
      .writeStream.format("memory").queryName("asofenrich")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(
        Event(1, ts(1), 1, "click", 10.0),  // before any error → dropped
        Event(2, ts(2), 1, "error", 1.0),
        Event(3, ts(2), 1, "click", 11.0),  // equal ts → inclusive (1.0)
        Event(4, ts(4), 1, "click", 12.0),  // latest ≤ 09:04 → 1.0
        Event(5, ts(3), 2, "error", 9.0))   // other user's error
      q.processAllAvailable()
      in.addData(
        Event(6, ts(30), 1, "click", 13.0), // 28 min later: err(2) is far
                                            // outside the prune horizon but
                                            // survives as the newest old one
        Event(7, ts(31), 2, "click", 14.0)) // user 2 → 9.0, never user 1's
      q.processAllAvailable()
      val rows = spark.table("asofenrich")
        .select($"event_id", $"err_value")
        .as[(Long, Double)].collect().toMap
      assert(rows == Map(3L -> 1.0, 4L -> 1.0, 6L -> 1.0, 7L -> 9.0))
    } finally q.stop()
  }

  test("asofEnrich agrees with the batch AsOfJoin on the same events") {
    implicit val sc = spark.sqlContext
    val events = Seq(
      Event(1, ts(2), 1, "error", 1.0), Event(2, ts(5), 1, "click", 10.0),
      Event(3, ts(7), 1, "error", 2.0), Event(4, ts(8), 1, "click", 11.0),
      Event(5, ts(1), 2, "click", 12.0), Event(6, ts(3), 2, "error", 3.0),
      Event(7, ts(9), 2, "click", 13.0), Event(8, ts(9), 3, "click", 14.0))
    val in = MemoryStream[Event]
    val q = StatefulOps.asofEnrich(in.toDS())
      .writeStream.format("memory").queryName("asofparity")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(events: _*)
      q.processAllAvailable()
      val streamed = spark.table("asofparity")
        .select($"event_id", $"err_value").as[(Long, Double)]
        .collect().toSet
      val df = events.toDF()
      val clicks = df.filter($"event_type" === "click")
        .select($"event_id", $"user_id", $"ts", $"value")
      val errors = df.filter($"event_type" === "error")
        .select($"user_id", $"ts".as("err_ts"), $"value".as("err_value"))
      val batch = graft.plans.AsOfJoin
        .asof(clicks, errors, Seq("user_id"), "ts", "err_ts")
        .select($"event_id", $"err_value").as[(Long, Double)]
        .collect().toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("stream-stream interval join: only errors within the window join") {
    implicit val sc = spark.sqlContext
    val clicks = MemoryStream[Event]
    val errors = MemoryStream[Event]
    val q = StatefulOps.clickErrorIntervalJoin(clicks.toDS(), errors.toDS())
      .writeStream.format("memory").queryName("cejoin")
      .outputMode(OutputMode.Append()).start()
    try {
      errors.addData(
        Event(100, ts(0), 1, "error", 7.0), // 30 min before click: outside
        Event(101, ts(25), 1, "error", 8.0), // 5 min before: inside
        Event(102, ts(25), 2, "error", 9.0)) // other user
      clicks.addData(Event(1, ts(30), 1, "click", 1.0))
      q.processAllAvailable()
      val rows = spark.table("cejoin")
        .select($"click_id", $"error_id").as[(Long, Long)].collect().toSet
      assert(rows == Set((1L, 101L)))
    } finally q.stop()
  }

  test("native session_window: gap merges and closes sessions like the " +
    "custom-state sessionizer") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[Event]
    val q = StatefulOps.sessionWindowCounts(in.toDF(), gap = "10 minutes",
      watermark = "10 minutes")
      .writeStream.format("memory").queryName("swsessions")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(
        Event(1, ts(0), 1, "click", 1.0),
        Event(2, ts(5), 1, "click", 2.0)) // merges into one session
      q.processAllAvailable()
      // advance the watermark far past the session end to flush it
      in.addData(Event(9, Timestamp.valueOf("2026-08-12 11:00:00"), 2, "click", 0.0))
      q.processAllAvailable()
      val rows = spark.table("swsessions")
        .select($"user_id", $"n_events", $"total_value")
        .as[(Long, Long, Double)].collect().toSet
      assert(rows == Set((1L, 2L, 3.0)))
    } finally q.stop()
  }

  test("sessionize: gap closes a session; totals and bounds are exact") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[Event]
    val q = StatefulOps.sessionize(in.toDS(), gapMillis = 10 * 60 * 1000L)
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append()).start()
    try {
      // user 1: events at 09:00, 09:05 (one session), then 09:30 (new one)
      in.addData(
        Event(1, ts(0), 1, "click", 1.0),
        Event(2, ts(5), 1, "click", 2.0))
      q.processAllAvailable()
      in.addData(Event(3, ts(30), 1, "click", 4.0))
      q.processAllAvailable()
      val sessions = spark.table("sessions").as[SessionSummary].collect()
      assert(sessions.length == 1) // first session closed by the gap
      val s = sessions.head
      assert(s.user_id == 1L && s.n_events == 2 && s.total_value == 3.0)
      assert(s.started == ts(0) && s.ended == ts(5))
    } finally q.stop()
  }

  test("funnelTrack: cross-batch out-of-order events surface as " +
    "stage-0 DATA rows (exactly-once through the sink, unlike an " +
    "accumulator), are excluded from the cascade, and can never claim " +
    "an unclaimed stage") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[Event]
    val q = StatefulOps.funnelTrack(in.toDS())
      .writeStream.format("memory").queryName("funnellate")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: in-order view for user 1, then a non-stage event that
      // advances the high-water mark to 09:20 WITHOUT claiming a stage
      in.addData(Event(1, ts(10), 1L, "view", 1.0),
        Event(2, ts(20), 1L, "other", 1.0))
      q.processAllAvailable()
      def hits() = spark.table("funnellate")
        .select($"stage", date_format($"at", "HH:mm").as("at"))
        .as[(Int, String)].collect().toSet
      assert(hits() == Set((1, "09:10")),
        "in-order input must emit no stage-0 rows")
      // batch 2: a click at 09:15 — BELOW the committed high-water
      // mark (09:20) but AFTER the committed t1 (09:10). Folding it
      // would claim stage 2 out of order (the old fold-anyway bug);
      // it must instead surface as a stage-0 row and leave t2 unset.
      // The regressed view at 09:05 is a second late signal. The
      // in-order click at 09:30 then claims stage 2 legitimately.
      in.addData(Event(3, ts(15), 1L, "click", 1.0),
        Event(4, ts(5), 1L, "view", 1.0),
        Event(5, ts(30), 1L, "click", 1.0))
      q.processAllAvailable()
      assert(hits() == Set((1, "09:10"), (0, "09:05"), (0, "09:15"),
        (2, "09:30")),
        s"each late event yields exactly one stage-0 row and no stage " +
          s"claim: ${hits()}")
      // the cascade over the in-order remainder is exactly as if the
      // late events never arrived: a purchase after the honored click
      // completes the funnel
      in.addData(Event(6, ts(40), 1L, "purchase", 1.0))
      q.processAllAvailable()
      assert(hits().contains((3, "09:40")))
    } finally q.stop()
  }

  test("funnelTrack: stage transitions across micro-batches reproduce " +
    "the batch q_funnel cascade exactly (stages AND timestamps)") {
    implicit val sc = spark.sqlContext
    val evs = Tables.events(spark, sf0001).as[Event].collect()
      .sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id)) // in-order delivery
    val in = MemoryStream[Event]
    val q = StatefulOps.funnelTrack(in.toDS())
      .writeStream.format("memory").queryName("funnelhits")
      .outputMode(OutputMode.Append()).start()
    try {
      evs.grouped(evs.length / 3 + 1).foreach { chunk =>
        in.addData(chunk.toSeq: _*); q.processAllAvailable()
      }
      val hits = spark.table("funnelhits")
        .select($"user_id", $"stage",
          date_format($"at", "yyyy-MM-dd HH:mm:ss.SSSSSS").as("at"))
        .as[(Long, Int, String)].collect()
      // at most one transition per stage per user, stages contiguous
      hits.groupBy(_._1).foreach { case (u, rows) =>
        val stages = rows.map(_._2).sorted
        assert(stages.distinct.length == stages.length, s"user $u dup stage")
        assert(stages.toSeq == (1 to stages.length).toSeq, s"user $u gap")
      }
      val streamed = hits.groupBy(_._1).map { case (u, rows) =>
        val byStage = rows.map(r => r._2 -> r._3).toMap
        (u, rows.map(_._2).max.toLong,
          byStage.get(1), byStage.get(2), byStage.get(3))
      }.toSet
      val batch = SparkEntry.queries("q_funnel")(spark, sf0001)
        .filter($"stage" > 0) // stage-0 users emit no streaming rows
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2)),
          Option(r.getString(3)), Option(r.getString(4))))
        .toSet
      assert(streamed == batch)
    } finally q.stop()
  }
}
