package graft

import graft.operators.TimeTravel
import org.apache.spark.sql.functions._

/** Table-level time travel: horizon-exact replay against an
  * independent recompute, keyed-upsert resolution, delete scoping, and
  * the ledger's exactly-once replay behavior.
  */
class TimeTravelSpec extends SparkSpec {
  import spark.implicits._

  test("readEventsAsOf replays every horizon exactly (independent " +
    "recompute): inserts appear at their commit, the upsert flips " +
    "values at horizon 2, the delete hides at horizon 3 only") {
    val root = TimeTravel.ensureLedgeredEvents(spark, sf0001)
    val raw = Tables.events(spark, sf0001)
      .select($"event_id", $"event_type", $"value")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    def expected(h: Int): Set[(Long, String, Double)] =
      raw.filter { case (id, _, _) =>
        id % 3 <= math.min(h, 2) && !(h >= 3 && id % 5 == 0)
      }.map { case (id, t, v) =>
        (id, t, if (h >= 2 && id % 6 == 0) v + 100.0 else v)
      }.toSet
    for (h <- 0 to 3) {
      val got = TimeTravel.readEventsAsOf(spark, root, h)
        .select($"event_id", $"event_type", $"value")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
        .toSet
      assert(got == expected(h), s"horizon $h diverged")
    }
    // the upsert is load-bearing: horizon 2 differs from horizon 1 on
    // the updated keys, and each key resolves to exactly ONE version
    assert(expected(2).exists { case (id, _, _) => id % 6 == 0 })
    val dup = TimeTravel.readEventsAsOf(spark, root, 3)
      .groupBy($"event_id").count().filter($"count" > 1).count()
    assert(dup == 0, "per-key resolution must yield one version")
  }

  test("streamed appends land as ledgered commits: every micro-batch " +
    "is an as-of horizon, a re-emitted key upserts, and a replayed " +
    "commit no-ops") {
    implicit val sc = spark.sqlContext
    import graft.streaming.StreamingTimeTravel
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val ev = Tables.events(spark, sf0001)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[(Long, java.sql.Timestamp, Long, String, Double)].collect()
    def df(rows: Seq[(Long, java.sql.Timestamp, Long, String, Double)]) =
      rows.toDF("event_id", "ts", "user_id", "event_type", "value")
    val root = tmpDir("ttl-stream")
    val seed = ev.take(10).toSeq
    TimeTravel.initLedgeredTable(df(seed), root)
    val wave1 = ev.slice(10, 20).toSeq
    // wave 2 re-emits two seed keys with bumped values — an UPSERT —
    // plus five fresh inserts
    val wave2 = seed.take(2).map(r => r.copy(_5 = r._5 + 1000.0)) ++
      ev.slice(20, 25).toSeq
    val in =
      MemoryStream[(Long, java.sql.Timestamp, Long, String, Double)]
    val q = StreamingTimeTravel.startAppend(
      in.toDF().toDF("event_id", "ts", "user_id", "event_type", "value"),
      root, tmpDir("ttl-stream-ckpt"))
    try {
      in.addData(wave1: _*); q.processAllAvailable()
      in.addData(wave2: _*); q.processAllAvailable()
    } finally q.stop()
    val commits = TimeTravel.protocol(root).foldedBatches().toSeq.sorted
    assert(commits.length == 2 && commits.head > 0L,
      s"epoch-minted commit ids must clear the seed's 0: $commits")
    def read(h: Long): Map[Long, Double] =
      TimeTravel.readEventsAsOf(spark, root, h)
        .select($"event_id", $"value")
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(read(0L) == seed.map(r => r._1 -> r._5).toMap,
      "horizon 0 must see the seed only")
    assert(read(commits(0)) == (seed ++ wave1).map(r => r._1 -> r._5).toMap)
    val want2 = ((seed ++ wave1).map(r => r._1 -> r._5) ++
      wave2.map(r => r._1 -> r._5)).toMap // later pairs win = upsert
    assert(read(commits(1)) == want2,
      "the re-emitted keys must serve their upserted values")
    // replayed commit ids are committed no-ops
    assert(!TimeTravel.appendCommit(df(wave1), root, commits(0)))
    // the change feed between the two STREAMED horizons is exactly
    // wave 2's net effect: re-emitted seed keys as update pre/post
    // pairs against the earlier horizon's values, fresh keys as
    // inserts — epoch-minted ledger ids window the same as ordinals
    val feed = TimeTravel.changesBetween(spark, root, commits(0), commits(1))
      .select($"event_id", $"_change_type", $"value")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .toSet
    val want = seed.take(2).flatMap(r => Seq(
        (r._1, "update_preimage", r._5),
        (r._1, "update_postimage", r._5 + 1000.0))).toSet ++
      ev.slice(20, 25).map(r => (r._1, "insert", r._5)).toSet
    assert(feed == want)
  }

  test("vacuum: surviving horizons read identically, below-floor " +
    "horizons refuse, and a replayed vacuum is a committed no-op") {
    val ev = Tables.events(spark, sf0001)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
    val root = tmpDir("ttl-vacuum")
    TimeTravel.initLedgeredTable(ev.filter($"event_id" % 3 === 0), root)
    TimeTravel.appendCommit(ev.filter($"event_id" % 3 === 1), root, 1L)
    TimeTravel.appendCommit(ev.filter($"event_id" % 3 === 2)
      .unionByName(ev.filter($"event_id" % 6 === 0)
        .withColumn("value", $"value" + 100.0)), root, 2L)
    TimeTravel.deleteCommit(ev.filter($"event_id" % 5 === 0), root, 3L)
    def read(h: Long): Set[(Long, String, Double)] =
      TimeTravel.readEventsAsOf(spark, root, h)
        .select($"event_id", $"event_type", $"value")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
        .toSet
    val pre = (2 to 3).map(h => h -> read(h.toLong)).toMap
    assert(TimeTravel.vacuum(spark, root, 2L),
      "first vacuum must report work done")
    // surviving horizons are value-identical to the pre-vacuum reads
    for (h <- 2 to 3)
      assert(read(h.toLong) == pre(h), s"horizon $h changed under vacuum")
    // reclaimed horizons REFUSE (the compaction honesty guard) instead
    // of serving a partial or resolved-forward lie
    for (h <- 0 to 1)
      assertThrows[IllegalArgumentException](read(h.toLong))
    // physical reclamation actually happened: seed and b-dirs <= floor
    // are gone, one resolved c2 dir serves in their place, and the
    // absorbed tombstone batch is purged
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dataNames = fs.listStatus(new org.apache.hadoop.fs.Path(
        TimeTravel.protocol(root).dir("data")))
      .filter(_.isDirectory).map(_.getPath.getName).toSet
    assert(dataNames == Set("c2"), s"unexpected data dirs: $dataNames")
    // d3 is ABOVE the floor: horizon 3 still needs it, so it survives
    assert(fs.exists(new org.apache.hadoop.fs.Path(root, "tombstones/d3")))
    // replay: the same floor is now a committed no-op; the ledger
    // itself is untouched so replayed commit ids keep short-circuiting
    assert(!TimeTravel.vacuum(spark, root, 2L))
    assert(!TimeTravel.appendCommit(ev.limit(1), root, 1L))
    assert(read(3L) == pre(3))
    // a second vacuum at floor 3 absorbs d3 into c3 and purges it;
    // horizon 3 is now the retained floor and 2 refuses
    assert(TimeTravel.vacuum(spark, root, 3L))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(root, "tombstones/d3")))
    assert(read(3L) == pre(3), "horizon 3 must survive the second vacuum")
    assertThrows[IllegalArgumentException](read(2L))
    // the table stays writable: a NEW commit above the floor lands on
    // top of the resolved c-dir — % 30 = 0 keys are upserts of c2 rows
    // (and, being % 5 = 0, also re-ingests of d3's victims: their new
    // fold order outranks the tombstone's high-water mark)
    TimeTravel.appendCommit(
      ev.filter($"event_id" % 30 === 0)
        .withColumn("value", lit(-1.0)), root, 4L)
    val grown = read(4L)
    val bumped = grown.filter(_._3 == -1.0).map(_._1)
    val wantBumped = ev.filter($"event_id" % 30 === 0)
      .select($"event_id").collect().map(_.getLong(0)).toSet
    assert(bumped == wantBumped, "the post-vacuum append must serve")
    assert(grown.filterNot(t => t._1 % 30 == 0) ==
      pre(3).filterNot(t => t._1 % 30 == 0),
      "untouched keys must survive the post-vacuum append unchanged")
  }

  test("schema evolution: add-column commits widen later horizons " +
    "only, upserts fill the new column, and dropping a committed " +
    "column is refused") {
    val ev = Tables.events(spark, sf0001)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
    val root = tmpDir("ttl-evolve")
    TimeTravel.initLedgeredTable(ev.filter($"event_id" % 3 === 0), root)
    TimeTravel.appendCommitEvolved(
      ev.filter($"event_id" % 3 === 1)
        .unionByName(ev.filter($"event_id" % 6 === 0))
        .withColumn("score", $"value" * 2.0), root, 1L)
    val h0 = TimeTravel.readEventsAsOf(spark, root, 0L)
    assert(!h0.columns.contains("score"),
      "pre-change horizons must serve the old shape")
    val h1 = TimeTravel.readEventsAsOf(spark, root, 1L)
    assert(h1.columns.contains("score"))
    val scored = h1.filter($"score".isNotNull)
      .select($"event_id").collect().map(_.getLong(0)).toSet
    val wantScored = ev.filter($"event_id" % 3 === 1 ||
        $"event_id" % 6 === 0)
      .select($"event_id").collect().map(_.getLong(0)).toSet
    assert(scored == wantScored,
      "exactly the evolved commit's inserts+upserts carry the column")
    // add-column ONLY: a commit missing a previously committed column
    // is refused before anything stages
    assertThrows[IllegalArgumentException](
      TimeTravel.appendCommitEvolved(
        ev.filter($"event_id" % 3 === 2).drop("value"), root, 2L))
    assert(!TimeTravel.protocol(root).foldedBatches().contains(2L))
  }

  test("column mapping: a drop serves old horizons unchanged and hides " +
    "the column above; rename refuses the key, collisions and unknown " +
    "columns; rename composes with vacuum (physical bytes survive)") {
    val ev = Tables.events(spark, sf0001)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
    val root = tmpDir("ttl-colmap")
    TimeTravel.initLedgeredTable(ev.filter($"event_id" % 3 === 0), root)
    TimeTravel.appendCommit(ev.filter($"event_id" % 3 === 1), root, 1L)
    // DROP user_id at commit 2: horizons >= 2 hide it, horizons below
    // keep serving it from the same bytes — no refusal needed, nothing
    // a surviving horizon needs is destroyed
    assert(TimeTravel.dropColumnCommit(spark, root, "user_id", 2L))
    assert(TimeTravel.readEventsAsOf(spark, root, 1L)
      .columns.contains("user_id"))
    assert(!TimeTravel.readEventsAsOf(spark, root, 2L)
      .columns.contains("user_id"))
    // a replayed mapping commit no-ops
    assert(!TimeTravel.dropColumnCommit(spark, root, "value", 2L))
    assert(TimeTravel.readEventsAsOf(spark, root, 2L)
      .columns.contains("value"))
    // rename value -> reading at commit 3; plain appendCommit's FIXED
    // physical shape still lands (commit 4) and serves as `reading`
    assert(TimeTravel.renameColumnCommit(spark, root,
      "value", "reading", 3L))
    TimeTravel.appendCommit(ev.filter($"event_id" % 3 === 2), root, 4L)
    val h4 = TimeTravel.readEventsAsOf(spark, root, 4L)
    assert(h4.columns.contains("reading") && !h4.columns.contains("value"))
    assert(h4.count() ==
      TimeTravel.readEventsAsOf(spark, root, 1L).count() +
        ev.filter($"event_id" % 3 === 2).count())
    // refusals: the key, an unknown source, a collision with a served
    // name, and a rename of the dropped (no longer served) column
    assertThrows[IllegalArgumentException](
      TimeTravel.renameColumnCommit(spark, root, "event_id", "id", 5L))
    assertThrows[IllegalArgumentException](
      TimeTravel.renameColumnCommit(spark, root, "value", "v2", 5L))
    assertThrows[IllegalArgumentException](
      TimeTravel.renameColumnCommit(spark, root, "reading", "ts", 5L))
    assertThrows[IllegalArgumentException](
      TimeTravel.renameColumnCommit(spark, root, "user_id", "uid", 5L))
    assertThrows[IllegalArgumentException](
      TimeTravel.dropColumnCommit(spark, root, "event_id", 5L))
    // vacuum at floor 3 (the rename commit): the c-dir stages PHYSICAL
    // names, so the surviving horizons keep their mapped views — and
    // the pre-rename horizon is gone with its history
    val pre4 = h4.select($"event_id", $"reading")
      .as[(Long, Double)].collect().toMap
    assert(TimeTravel.vacuum(spark, root, 3L))
    val post = TimeTravel.readEventsAsOf(spark, root, 4L)
    assert(post.columns.contains("reading"))
    assert(post.select($"event_id", $"reading")
      .as[(Long, Double)].collect().toMap == pre4,
      "renamed values must survive the vacuum byte-for-byte")
    val h3 = TimeTravel.readEventsAsOf(spark, root, 3L)
    assert(h3.columns.contains("reading") &&
      !h3.columns.contains("user_id"))
    assertThrows[IllegalArgumentException](
      TimeTravel.readEventsAsOf(spark, root, 1L))
  }

  test("deletes staged AFTER a vacuum still hide the resolved rows " +
    "(ledger-wide high-water stamps), and a legacy fold-only mark " +
    "below the floor makes vacuum refuse") {
    val ev = Tables.events(spark, sf0001)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
    val root = tmpDir("ttl-vac-hw")
    TimeTravel.initLedgeredTable(ev.filter($"event_id" % 3 === 0), root)
    TimeTravel.appendCommit(ev.filter($"event_id" % 3 === 1), root, 1L)
    TimeTravel.deleteCommit(ev.filter($"event_id" % 5 === 0), root, 2L)
    // floor 2 is a DELETE id: the resolved c2 outranks every fold, so
    // a post-vacuum delete's high-water mark must clear it
    assert(TimeTravel.vacuum(spark, root, 2L))
    TimeTravel.deleteCommit(ev.filter($"event_id" % 7 === 0), root, 3L)
    val got = TimeTravel.readEventsAsOf(spark, root, 3L)
      .select($"event_id").as[Long].collect().toSet
    assert(got.nonEmpty && got.forall(_ % 7 != 0),
      "a delete staged after the vacuum must hide the c-dir's rows")
    // legacy guard: a surviving tombstone whose stamp predates the
    // ledger-wide convention (fold-only hw below the floor) makes the
    // NEXT vacuum refuse rather than detach it
    val p = TimeTravel.protocol(root)
    ev.filter($"event_id" % 11 === 0).select($"event_id").distinct()
      .withColumn("hw", lit(1L))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$root/tombstones/d4")
    p.commit("d4")
    assertThrows[IllegalArgumentException](
      TimeTravel.vacuum(spark, root, 3L))
  }

  test("vacuum composes with schema evolution: the resolved c-dir " +
    "carries the floor horizon's shape, and evolution above the floor " +
    "keeps widening") {
    val ev = Tables.events(spark, sf0001)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
    val root = tmpDir("ttl-vac-evolve")
    TimeTravel.initLedgeredTable(ev.filter($"event_id" % 3 === 0), root)
    TimeTravel.appendCommit(ev.filter($"event_id" % 3 === 1), root, 1L)
    // vacuum at floor 1 collapses the OLD-shape history into c1
    assert(TimeTravel.vacuum(spark, root, 1L))
    val h1 = TimeTravel.readEventsAsOf(spark, root, 1L)
    assert(!h1.columns.contains("score"), "c1 must keep the old shape")
    // the add-column commit lands ON TOP of the vacuumed c-dir
    TimeTravel.appendCommitEvolved(
      ev.filter($"event_id" % 3 === 2)
        .withColumn("score", $"value" * 2.0), root, 2L)
    val h2 = TimeTravel.readEventsAsOf(spark, root, 2L)
    assert(h2.columns.contains("score"),
      "the horizon above the evolution must serve the widened shape")
    val n2 = h2.count()
    // ... and a second vacuum AT the evolved horizon resolves into a
    // WIDENED c2 (the newest-dir schema travels into the c-dir)
    assert(TimeTravel.vacuum(spark, root, 2L))
    val h2v = TimeTravel.readEventsAsOf(spark, root, 2L)
    assert(h2v.columns.contains("score") && h2v.count() == n2)
    val scored = h2v.filter($"score".isNotNull).count()
    val wantScored = ev.filter($"event_id" % 3 === 2).count()
    assert(scored == wantScored,
      "NULL-backfilled old rows and scored new rows must survive the " +
        "widened vacuum exactly")
  }

  test("a NARROW plain append after an evolved commit cannot drop the " +
    "added column: later horizons still serve it (union-schema probe) " +
    "and a vacuum preserves its values below the floor") {
    val ev = Tables.events(spark, sf0001)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
    val root = tmpDir("ttl-narrow-after-evolve")
    TimeTravel.initLedgeredTable(ev.filter($"event_id" % 3 === 0), root)
    TimeTravel.appendCommitEvolved(
      ev.filter($"event_id" % 3 === 1)
        .withColumn("score", $"value" * 2.0), root, 1L)
    // the hazard: a plain appendCommit lands the FIXED 5-column shape,
    // making a NARROWER dir the newest committed one
    TimeTravel.appendCommit(ev.filter($"event_id" % 3 === 2), root, 2L)
    val h2 = TimeTravel.readEventsAsOf(spark, root, 2L)
    assert(h2.columns.contains("score"),
      "the union-schema probe must keep the evolved column visible")
    val scoredPre = h2.filter($"score".isNotNull)
      .select($"event_id", $"score").as[(Long, Double)].collect().toMap
    val want = ev.filter($"event_id" % 3 === 1)
      .select($"event_id", $"value" * 2.0).as[(Long, Double)]
      .collect().toMap
    assert(scoredPre == want,
      "exactly the evolved commit's rows carry their scores")
    // ... and a vacuum at the narrow commit's floor stages the UNION
    // shape into c2: the evolved values survive below the floor
    assert(TimeTravel.vacuum(spark, root, 2L))
    val h2v = TimeTravel.readEventsAsOf(spark, root, 2L)
    val scoredPost = h2v.filter($"score".isNotNull)
      .select($"event_id", $"score").as[(Long, Double)].collect().toMap
    assert(scoredPost == scoredPre,
      "the vacuumed c-dir must preserve the evolved column's values")
  }

  test("retained streaming ingest: the as-of window stays bounded — " +
    "recent horizons serve exactly, horizons past the retention " +
    "window refuse, and the stream keeps committing") {
    implicit val sc = spark.sqlContext
    import graft.streaming.StreamingTimeTravel
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val ev = Tables.events(spark, sf0001)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[(Long, java.sql.Timestamp, Long, String, Double)].collect()
    val root = tmpDir("ttl-retained")
    TimeTravel.initLedgeredTable(
      ev.take(5).toSeq
        .toDF("event_id", "ts", "user_id", "event_type", "value"), root)
    val in = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double)]
    // vacuumEvery = 1 so the retention fires each batch in this spec
    val q = StreamingTimeTravel.startAppendRetained(
      in.toDF().toDF("event_id", "ts", "user_id", "event_type", "value"),
      root, tmpDir("ttl-retained-ckpt"), retainCommits = 2,
      vacuumEvery = 1)
    try {
      for (b <- 0 until 3) {
        in.addData(ev.slice(5 + 5 * b, 10 + 5 * b).toSeq: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val ids = TimeTravel.protocol(root).foldedBatches().toSeq.sorted
    assert(ids.length == 3)
    def count(h: Long): Long =
      TimeTravel.readEventsAsOf(spark, root, h).count()
    // the two newest commits stay exactly as-of-readable
    assert(count(ids(1)) == 15 && count(ids(2)) == 20)
    // the oldest horizon (and the pre-stream seed horizon) refused
    assertThrows[IllegalArgumentException](count(ids(0)))
    assertThrows[IllegalArgumentException](count(0L))
    // the dir count is bounded: one resolved c-dir + the window's tail
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dataNames = fs.listStatus(new org.apache.hadoop.fs.Path(
        TimeTravel.protocol(root).dir("data")))
      .filter(_.isDirectory).map(_.getPath.getName).toSet
    assert(dataNames == Set(s"c${ids(1)}", s"b${ids(2)}"),
      s"unexpected data dirs: $dataNames")
  }

  test("streamed EVOLVED appends: a widened-schema stream commits " +
    "through the ledger, old horizons keep the old shape, and the " +
    "add-column guard travels to the stream") {
    implicit val sc = spark.sqlContext
    import graft.streaming.StreamingTimeTravel
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val ev = Tables.events(spark, sf0001)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[(Long, java.sql.Timestamp, Long, String, Double)].collect()
    val root = tmpDir("ttl-evolve-stream")
    TimeTravel.initLedgeredTable(
      ev.take(10).toSeq
        .toDF("event_id", "ts", "user_id", "event_type", "value"), root)
    // the stream carries the WIDENED shape: (base columns, score)
    val in = MemoryStream[(Long, java.sql.Timestamp, Long, String,
      Double, Double)]
    val q = StreamingTimeTravel.startAppendEvolved(
      in.toDF().toDF("event_id", "ts", "user_id", "event_type",
        "value", "score"),
      root, tmpDir("ttl-evolve-stream-ckpt"))
    try {
      in.addData(ev.slice(10, 15).toSeq.map(r =>
        (r._1, r._2, r._3, r._4, r._5, r._5 * 2.0)): _*)
      q.processAllAvailable()
    } finally q.stop()
    val commits = TimeTravel.protocol(root).foldedBatches().toSeq.sorted
    assert(commits.length == 1 && commits.head > 0L)
    val h0 = TimeTravel.readEventsAsOf(spark, root, 0L)
    assert(!h0.columns.contains("score"),
      "the pre-stream horizon must keep the old shape")
    val h1 = TimeTravel.readEventsAsOf(spark, root, commits.head)
    assert(h1.columns.contains("score"))
    assert(h1.filter($"score".isNotNull).count() == 5 &&
      h1.count() == 15)
  }

  test("the ledger is exactly-once and build-once: replayed folds and " +
    "deletes no-op, and a second ensure serves identical horizons") {
    val root = TimeTravel.ensureLedgeredEvents(spark, sf0001)
    val p = TimeTravel.protocol(root)
    assert(p.foldedBatches() == Set(1L, 2L))
    assert(p.deletedBatches() == Set(3L))
    // a replayed commit against the PUBLISHED root is a committed no-op
    assert(!p.fold(1L, Seq("data")) {
      fail("a committed fold must not re-stage")
    })
    assert(!p.delete(3L) {
      fail("a committed delete must not re-stage")
    })
    val before = TimeTravel.readEventsAsOf(spark, root, 3)
      .agg(count(lit(1)), sum($"value".cast("decimal(12,2)")))
      .as[(Long, java.math.BigDecimal)].head()
    val again = TimeTravel.ensureLedgeredEvents(spark, sf0001)
    val after = TimeTravel.readEventsAsOf(spark, again, 3)
      .agg(count(lit(1)), sum($"value".cast("decimal(12,2)")))
      .as[(Long, java.math.BigDecimal)].head()
    assert(root == again && before == after)
  }

  test("changesBetween nets intra-window churn: insert-then-delete " +
    "emits nothing, delete-then-readd emits an update (or an insert " +
    "when invisible at the window start), a tombstone for a key that " +
    "never existed emits nothing, and applying the feed to the start " +
    "state reproduces the end state exactly") {
    val ts = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    def df(rows: (Long, Double)*) =
      rows.toSeq.toDF("event_id", "value")
        .withColumn("ts", lit(ts))
        .withColumn("user_id", lit(1L))
        .withColumn("event_type", lit("click"))
        .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
    val root = tmpDir("cdf-churn")
    TimeTravel.initLedgeredTable(df(1L -> 10.0, 2L -> 20.0), root)
    // b1: insert 3; d2: delete {2, 3}; b3: re-add 2 (visible at the
    // window start -> update) and 3 (born-and-killed-and-reborn inside
    // the window -> insert), plus a fresh 4; d4: delete 1 (-> delete)
    // and 5 (never existed -> nothing)
    TimeTravel.appendCommit(df(3L -> 30.0), root, 1L)
    TimeTravel.deleteCommit(Seq(2L, 3L).toDF("event_id"), root, 2L)
    TimeTravel.appendCommit(
      df(2L -> 22.0, 3L -> 33.0, 4L -> 40.0), root, 3L)
    TimeTravel.deleteCommit(Seq(1L, 5L).toDF("event_id"), root, 4L)
    val ch = TimeTravel.changesBetween(spark, root, 0L, 4L)
      .select($"event_id", $"_change_type", $"value")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .toSet
    assert(ch == Set(
      (1L, "delete", 10.0),
      (2L, "update_preimage", 20.0),
      (2L, "update_postimage", 22.0),
      (3L, "insert", 33.0),
      (4L, "insert", 40.0)))
    // replay identity: start state + feed == end state
    def state(h: Long) = TimeTravel.readEventsAsOf(spark, root, h)
      .select($"event_id", $"value")
      .as[(Long, Double)].collect().toMap
    val removed = ch.collect {
      case (id, ct, _) if ct == "delete" || ct == "update_preimage" => id
    }
    val added = ch.collect {
      case (id, ct, v) if ct == "insert" || ct == "update_postimage" =>
        id -> v
    }.toMap
    assert((state(0L) -- removed) ++ added == state(4L))
    // a key-slice window: (2, 3] sees only the re-adds, as inserts or
    // updates against the post-delete horizon-2 state
    val mid = TimeTravel.changesBetween(spark, root, 2L, 3L)
      .select($"event_id", $"_change_type", $"value")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .toSet
    assert(mid == Set(
      (2L, "insert", 22.0), (3L, "insert", 33.0), (4L, "insert", 40.0)))
  }

  test("changesBetween composes with vacuum: a window above the floor " +
    "serves the unvacuumed feed unchanged, a window starting below it " +
    "refuses through the compaction honesty guard, and an empty " +
    "window serves zero changes") {
    val rootA = TimeTravel.ensureLedgeredEvents(spark, sf0001)
    val rootV = TimeTravel.ensureVacuumedEvents(spark, sf0001) // floor 2
    def feed(root: String, f: Long, t: Long) =
      TimeTravel.changesBetween(spark, root, f, t)
        .select($"event_id", $"_change_type", $"value")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
        .toSet
    val surviving = feed(rootV, 2L, 3L)
    assert(surviving == feed(rootA, 2L, 3L) && surviving.nonEmpty)
    val e = intercept[IllegalArgumentException] {
      TimeTravel.changesBetween(spark, rootV, 1L, 3L)
    }
    assert(e.getMessage.contains("compaction"))
    assert(TimeTravel.changesBetween(spark, rootA, 3L, 3L).count() == 0)
  }

  test("branching: fork refusals (uncommitted horizon, duplicate " +
    "branch, commit at-or-below fork), base isolation from branch " +
    "writes, delete-then-readd above a branch delete, and the honesty " +
    "refusal once a base vacuum passes the fork point") {
    val ts = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    def df(rows: (Long, Double)*) =
      rows.toSeq.toDF("event_id", "value")
        .withColumn("ts", lit(ts))
        .withColumn("user_id", lit(1L))
        .withColumn("event_type", lit("click"))
        .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
    val parent = tmpDir("branch-edges")
    val base = s"$parent/base"
    val br = s"$parent/b1"
    TimeTravel.initLedgeredTable(df(1L -> 10.0, 2L -> 20.0), base)
    TimeTravel.appendCommit(df(3L -> 30.0), base, 1L)
    intercept[IllegalArgumentException] {
      TimeTravel.createBranch(spark, "base", s"$parent/bad", 7L)
    }
    TimeTravel.createBranch(spark, "base", br, 1L)
    intercept[IllegalArgumentException] {
      TimeTravel.createBranch(spark, "base", br, 0L)
    }
    intercept[IllegalArgumentException] {
      TimeTravel.appendCommitBranch(df(9L -> 90.0), br, 1L)
    }
    // branch: delete key 2 at commit 2, re-add it at commit 3 — the
    // re-added version outranks the tombstone; key 1 stays deleted
    assert(TimeTravel.deleteCommitBranch(
      Seq(1L, 2L).toDF("event_id"), br, 2L))
    assert(TimeTravel.appendCommitBranch(df(2L -> 22.0), br, 3L))
    def state(h: Long) = TimeTravel.readEventsAsOfBranch(spark, br, h)
      .select($"event_id", $"value").as[(Long, Double)].collect().toMap
    assert(state(1L) == Map(1L -> 10.0, 2L -> 20.0, 3L -> 30.0))
    assert(state(2L) == Map(3L -> 30.0))
    assert(state(3L) == Map(2L -> 22.0, 3L -> 30.0))
    // the base never saw any of it
    assert(TimeTravel.readEventsAsOf(spark, base, 1L)
      .select($"event_id", $"value").as[(Long, Double)].collect().toMap ==
      Map(1L -> 10.0, 2L -> 20.0, 3L -> 30.0))
    // base moves on and vacuums past the fork: branch reads refuse
    TimeTravel.appendCommit(df(4L -> 40.0), base, 2L)
    TimeTravel.vacuum(spark, base, 2L)
    val e2 = intercept[IllegalArgumentException] {
      TimeTravel.readEventsAsOfBranch(spark, br, 3L)
    }
    assert(e2.getMessage.contains("compaction"))
  }

  test("mirrorCommits: incremental resume applies only the commits " +
    "the replica lacks, a replayed call is a no-op, a vacuumed source " +
    "refuses, and a diverged base refuses the fast-forward merge") {
    val ts = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    def df(rows: (Long, Double)*) =
      rows.toSeq.toDF("event_id", "value")
        .withColumn("ts", lit(ts))
        .withColumn("user_id", lit(1L))
        .withColumn("event_type", lit("click"))
        .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
    val parent = tmpDir("mirror-edges")
    val src = s"$parent/src"
    val dst = s"$parent/dst"
    TimeTravel.initLedgeredTable(df(1L -> 10.0), src)
    TimeTravel.appendCommit(df(2L -> 20.0), src, 1L)
    // first sync: seed + commit 1
    assert(TimeTravel.mirrorCommits(spark, src, dst) == 2)
    // source advances; the resume applies ONLY the new commits
    TimeTravel.appendCommit(df(3L -> 30.0), src, 2L)
    TimeTravel.deleteCommit(Seq(1L).toDF("event_id"), src, 3L)
    assert(TimeTravel.mirrorCommits(spark, src, dst) == 2)
    assert(TimeTravel.mirrorCommits(spark, src, dst) == 0)
    def state(root: String, h: Long) =
      TimeTravel.readEventsAsOf(spark, root, h)
        .select($"event_id", $"value").as[(Long, Double)].collect().toMap
    for (h <- 0L to 3L)
      assert(state(dst, h) == state(src, h), s"replica horizon $h diverged")
    // a source vacuumed past history the replica lacks refuses
    val dst2 = s"$parent/dst2"
    TimeTravel.vacuum(spark, src, 2L)
    val e = intercept[IllegalArgumentException] {
      TimeTravel.mirrorCommits(spark, src, dst2)
    }
    assert(e.getMessage.contains("vacuum"))
    // ...but the ALREADY-SYNCED replica is an archive: it keeps
    // serving the horizons the source just reclaimed
    intercept[IllegalArgumentException] {
      TimeTravel.readEventsAsOf(spark, src, 0L)
    }
    assert(state(dst, 0L) == Map(1L -> 10.0))
    assert(state(dst, 1L) == Map(1L -> 10.0, 2L -> 20.0))
    // diverged-base merge refusal: fork, advance BOTH, try to merge
    val base2 = s"$parent/base2"
    val br2 = s"$parent/br2"
    TimeTravel.initLedgeredTable(df(1L -> 10.0), base2)
    TimeTravel.createBranch(spark, "base2", br2, 0L)
    assert(TimeTravel.appendCommitBranch(df(2L -> 20.0), br2, 1L))
    TimeTravel.appendCommit(df(9L -> 90.0), base2, 2L)
    val e3 = intercept[IllegalArgumentException] {
      TimeTravel.mergeBranchFF(spark, br2)
    }
    assert(e3.getMessage.contains("fast-forward refused"))
  }

  test("startAppendMirrored: the replica catches up per micro-batch — " +
    "every streamed source horizon is a replica horizon, values " +
    "identical, and a post-stream batch mirror call is a no-op") {
    implicit val sc = spark.sqlContext
    import graft.streaming.StreamingTimeTravel
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val ev = Tables.events(spark, sf0001)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[(Long, java.sql.Timestamp, Long, String, Double)].collect()
    def df(rows: Seq[(Long, java.sql.Timestamp, Long, String, Double)]) =
      rows.toDF("event_id", "ts", "user_id", "event_type", "value")
    val parent = tmpDir("ttl-mirror-stream")
    val root = s"$parent/src"
    val replica = s"$parent/rep"
    TimeTravel.initLedgeredTable(df(ev.take(10).toSeq), root)
    val in =
      MemoryStream[(Long, java.sql.Timestamp, Long, String, Double)]
    val q = StreamingTimeTravel.startAppendMirrored(
      in.toDF().toDF("event_id", "ts", "user_id", "event_type", "value"),
      root, replica, s"$parent/ckpt")
    try {
      in.addData(ev.slice(10, 20).toSeq: _*); q.processAllAvailable()
      in.addData(ev.slice(20, 25).toSeq: _*); q.processAllAvailable()
    } finally q.stop()
    val commits = TimeTravel.protocol(root).foldedBatches().toSeq.sorted
    assert(commits.length == 2)
    def state(r: String, h: Long) =
      TimeTravel.readEventsAsOf(spark, r, h)
        .select($"event_id", $"value").as[(Long, Double)].collect().toMap
    for (h <- 0L +: commits)
      assert(state(replica, h) == state(root, h),
        s"replica horizon $h diverged")
    assert(TimeTravel.mirrorCommits(spark, root, replica) == 0)
  }
}
