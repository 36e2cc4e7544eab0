package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** The persisted IVF-PQ index — structural halves of the
  * `sim_ivfpq_recall` gate: the coded frame stores exactly M small ints
  * per vector (the ≈16 B/vector representation), serving composes the
  * cell prune with ADC + exact re-rank, and the index runs the same
  * fold/delete lifecycle as the float IVF index (frozen centroids AND
  * frozen codebook across appends; tombstones hide served candidates).
  */
class IvfPqSpec extends SparkSpec {
  import spark.implicits._

  private def corpus() = Tables.embeddings(spark, sf0001)
    .select($"vec_id", $"embedding".as("v"))

  private def queries() = Tables.embeddings(spark, sf0001)
    .filter($"vec_id" < 20)
    .select($"vec_id".as("query_id"), $"embedding".as("qv"))

  test("writeIvfPqIndex: every vector lands as exactly M code ids in " +
    "one cell; codebook is the fixed-cap artifact; nothing stores " +
    "float vectors") {
    val root = Similarity.ensureIvfPqIndex(spark, sf0001)
    val coded = Similarity.indexCodes(spark, root)
    assert(coded.count() == corpus().count(),
      "every corpus vector must be encoded exactly once")
    val widths = coded.select(size($"codes")).distinct().as[Int].collect()
    assert(widths.sameElements(Array(16)),
      s"every vector must carry exactly M=16 code ids, got ${widths.toSeq}")
    assert(!coded.columns.contains("v"),
      "the coded frame must not carry float vectors — codes are the point")
    val cb = spark.read.parquet(
      Similarity.protocol(root).dir("codebook"))
    assert(cb.select($"m").distinct().count() == 16,
      "one codebook per subspace")
    // per-subspace code count is the fixed-cap sample size, constant in
    // the corpus (PqCodeCap/25 candidates at most)
    val perM = cb.groupBy($"m").count().select($"count").distinct()
      .as[Long].collect()
    assert(perM.length == 1 && perM.head <= 256,
      s"codebook size must be capped per subspace, got ${perM.toSeq}")
  }

  test("sim_ivfpq_recall: the ADC + exact-re-rank serve clears the " +
    "recall floor and never exceeds the exact top-k size") {
    val rows = SparkEntry.queries("sim_ivfpq_recall")(spark, sf0001)
      .select($"query_id", $"n_common").as[(Long, Long)].collect()
    assert(rows.length == 20, "one recall row per gate query")
    assert(rows.forall(r => r._2 >= 0 && r._2 <= 5),
      "per-query overlap is bounded by k")
    // IVF-PQ compounds two approximations (cell prune + quantization);
    // the exact re-rank claws ranking fidelity back inside the
    // shortlist. The value-level gate is the oracle hash match — this
    // floor pins that the composition stays USEFUL (≫ the ~1% random
    // baseline) on the no-cluster-structure synthetic corpus.
    val total = rows.map(_._2).sum
    assert(total >= 15,
      s"aggregate recall@5 must clear 15% on the gate corpus, got $total/100")
  }

  test("writeIvfPqIndex at the targetK knob: centroid frame is exactly " +
    "targetK rows however large the input — the bounded-K property " +
    "that caps the map-side centroid array AND the probe-cell driver " +
    "collect at constants, at a second gated K") {
    val root = Similarity.ensureFixedKIvfPqIndex(spark, sf0001)
    val cents = spark.read.parquet(Similarity.protocol(root).dir("cents"))
    assert(cents.count() == Similarity.FixedKWide,
      s"knob build must persist exactly ${Similarity.FixedKWide} centroids")
    val dims = cents.select(size($"cv")).distinct().as[Int].collect()
    assert(dims.sameElements(Array(64)),
      s"every centroid must be the full 64-dim mean, got ${dims.toSeq}")
    // codes and assignment stay total: same coded-frame contract as the
    // default build, just homed into the FixedK cells
    val coded = Similarity.indexCodes(spark, root)
    assert(coded.count() == corpus().count(),
      "every corpus vector must be encoded exactly once")
    val cellIds = cents.select($"cent_id").as[Long].collect().toSet
    val homed = coded.select($"cent_id").distinct().as[Long].collect()
    assert(homed.forall(cellIds), "codes reference only built cells")
  }

  test("sim_ivfpq_fixedk_recall: the targetK-knob build (FixedKWide) " +
    "clears the recall floor and never exceeds the exact top-k size") {
    val rows = SparkEntry.queries("sim_ivfpq_fixedk_recall")(spark, sf0001)
      .select($"query_id", $"n_common").as[(Long, Long)].collect()
    assert(rows.length == 20, "one recall row per gate query")
    assert(rows.forall(r => r._2 >= 0 && r._2 <= 5),
      "per-query overlap is bounded by k")
    // K=48 + nprobe=4 probes 1/12 of the corpus AND PQ compounds
    // quantization noise on top; the value-level gate is the oracle
    // hash match, not this floor
    val total = rows.map(_._2).sum
    assert(total >= 10,
      s"aggregate recall@5 must clear 10% on the gate corpus, got $total/100")
  }

  test("sim_ivfpq_fixedk_grown_recall: the knob survives the fold " +
    "lifecycle — history-trained FixedKWide artifacts stay frozen " +
    "across the append, recall floor holds") {
    val rows = SparkEntry.queries("sim_ivfpq_fixedk_grown_recall")(
      spark, sf0001)
      .select($"query_id", $"n_common").as[(Long, Long)].collect()
    assert(rows.length == 20, "one recall row per gate query")
    assert(rows.forall(r => r._2 >= 0 && r._2 <= 5),
      "per-query overlap is bounded by k")
    assert(rows.map(_._2).sum >= 10,
      s"aggregate recall@5 must clear 10%, got ${rows.map(_._2).sum}/100")
    // structural half: the grown fixture's centroid frame is exactly
    // the knob's K — the fold must not have grown it
    val root = Similarity.ensureFixedKGrownIvfPqIndex(spark, sf0001)
    val p = Similarity.protocol(root)
    assert(spark.read.parquet(p.dir("cents")).count() ==
      Similarity.FixedKWide,
      "the fold must not grow the knob-K centroid frame")
    assert(p.foldedBatches() == Set(1L), "the wave's fold is ledgered")
  }

  test("bounded-K PQ root composes with the fold lifecycle: appends " +
    "(the startPqIngest per-batch call) encode against the FROZEN " +
    "FixedK centroids — the centroid frame never grows past targetK") {
    val idx = tmpDir("ivfpq-fixedk-life")
    val e = corpus()
    Similarity.writeIvfPqIndexFixedK(e.filter($"vec_id" % 5 =!= 4), idx)
    val p = Similarity.protocol(idx)
    assert(spark.read.parquet(p.dir("cents")).count() == Similarity.FixedK)
    assert(Similarity.appendToIvfPqIndex(
      e.filter($"vec_id" % 5 === 4), idx, 1L))
    assert(spark.read.parquet(p.dir("cents")).count() == Similarity.FixedK,
      "a fold must not grow the bounded centroid frame")
    assert(Similarity.indexCodes(spark, idx).count() == e.count(),
      "fold must add exactly the wave")
    val perQ = Similarity.ivfPqTopK(spark, idx, queries(), e)
      .groupBy($"query_id").count().select($"count").distinct()
      .as[Long].collect()
    assert(perQ.sameElements(Array(5L)),
      s"grown bounded-K index serves k rows per query, got ${perQ.toSeq}")
  }

  test("sim_ivfpq_filtered: every served neighbor satisfies the " +
    "metadata predicate, and the slice-recall floor holds") {
    val allowed = Tables.embeddings(spark, sf0001)
      .filter($"label".isin(0, 2, 4, 6, 8)).select($"vec_id")
    val served = Similarity.ivfPqTopK(spark,
      Similarity.ensureIvfPqIndex(spark, sf0001), queries(), corpus(),
      allowed = Some(allowed))
    assert(served.join(allowed,
        served("neighbor_id") === allowed("vec_id"), "left_anti")
      .count() == 0,
      "a disallowed vec_id must never be served as a neighbor")
    val rows = SparkEntry.queries("sim_ivfpq_filtered")(spark, sf0001)
      .select($"query_id", $"n_common").as[(Long, Long)].collect()
    assert(rows.length == 20, "one recall row per gate query")
    assert(rows.forall(r => r._2 >= 0 && r._2 <= 5),
      "per-query slice overlap is bounded by k")
    assert(rows.map(_._2).sum >= 15,
      "the filtered composition must stay useful within the slice")
  }

  test("sim_ivfpq_refreshed: the sidecar-trained coarse re-cluster " +
    "wins back recall lost to frozen-cell growth under the shift, and " +
    "the refresh protocol is drift-gated, ledgered and coverage-guarded") {
    val rows = SparkEntry.queries("sim_ivfpq_refreshed")(spark, sf0001)
      .select($"query_id", $"frozen_common", $"refreshed_common")
      .as[(Long, Long, Long)].collect()
    assert(rows.length == 40, "20 original + 20 shifted queries")
    assert(rows.map(_._3).sum > rows.map(_._2).sum,
      "refreshed recall must beat frozen on the drift scenario overall")
    val shifted = rows.filter(_._1 >= 100000L)
    assert(shifted.map(_._3).sum > shifted.map(_._2).sum,
      "refresh must strictly improve shifted-query recall")

    // protocol half on a scratch index: drift gate commits without
    // rewriting, refreshIds are exactly-once, a sidecar that misses
    // live index rows fails BEFORE publish, and a real refresh keeps
    // exactly one code row per vector.
    val idx = tmpDir("ivfpq-refresh")
    val e = corpus()
    Similarity.writeIvfPqIndex(e, idx)
    assert(!Similarity.refreshIvfPqIndex(spark, idx, 0L, e,
      minDrift = 10.0), "impossible drift bar must skip the rewrite")
    assert(!Similarity.refreshIvfPqIndex(spark, idx, 0L, e),
      "replayed refreshId is a committed no-op even when it skipped")
    val before = Similarity.ivfPqTopK(spark, idx, queries(), e)
      .as[(Long, Long, Int)].collect().toSeq
    intercept[IllegalStateException] {
      Similarity.refreshIvfPqIndex(spark, idx, 1L,
        e.filter($"vec_id" % 2 === 0))
    }
    assert(Similarity.ivfPqTopK(spark, idx, queries(), e)
      .as[(Long, Long, Int)].collect().toSeq == before,
      "a failed coverage guard must leave the served index untouched")
    assert(Similarity.refreshIvfPqIndex(spark, idx, 2L, e))
    assert(!Similarity.refreshIvfPqIndex(spark, idx, 2L, e))
    val codes = Similarity.indexCodes(spark, idx)
    assert(codes.count() == e.count(), "re-bin keeps every vector")
    assert(codes.groupBy($"vec_id").count().filter($"count" > 1)
      .count() == 0, "refresh must not duplicate vectors")
  }

  test("writeIvfPqIndexSeedEvery (legacy mode): K grows as N/seedEvery " +
    "— the documented reason bounded-K is the default — and the built " +
    "index still serves k rows per query through the same path") {
    val idx = tmpDir("ivfpq-seedevery")
    val e = corpus()
    Similarity.writeIvfPqIndexSeedEvery(e, idx)
    val p = Similarity.protocol(idx)
    val cents = spark.read.parquet(p.dir("cents")).count()
    val expected = e.filter($"vec_id" % 25 === 0).count()
    assert(cents == expected,
      s"legacy mode must seed every 25th vector: $cents vs $expected")
    assert(cents != Similarity.FixedK,
      "the legacy K is corpus-proportional, not the bounded constant")
    val perQ = Similarity.ivfPqTopK(spark, idx, queries(), e)
      .groupBy($"query_id").count().select($"count").distinct()
      .as[Long].collect()
    assert(perQ.sameElements(Array(5L)),
      s"legacy index serves k rows per query, got ${perQ.toSeq}")
  }

  test("IVF-PQ fold/delete lifecycle: appends encode against the FROZEN " +
    "centroids and codebook, replays short-circuit, tombstones hide " +
    "served candidates") {
    val idx = tmpDir("ivfpq-life")
    val e = corpus()
    val history = e.filter($"vec_id" % 5 =!= 4)
    val wave = e.filter($"vec_id" % 5 === 4)
    Similarity.writeIvfPqIndex(history, idx)
    val p = Similarity.protocol(idx)
    val centsBefore = spark.read.parquet(p.dir("cents"))
      .orderBy($"cent_id").collect().map(_.toString).toSeq
    val cbBefore = spark.read.parquet(p.dir("codebook"))
      .orderBy($"m", $"code_id").collect().map(_.toString).toSeq

    assert(Similarity.appendToIvfPqIndex(wave, idx, 1L))
    assert(Similarity.indexCodes(spark, idx).count() == e.count(),
      "fold must add exactly the wave")
    assert(spark.read.parquet(p.dir("cents"))
      .orderBy($"cent_id").collect().map(_.toString).toSeq == centsBefore,
      "append must not touch the centroid frame")
    assert(spark.read.parquet(p.dir("codebook"))
      .orderBy($"m", $"code_id").collect().map(_.toString).toSeq == cbBefore,
      "append must not touch the codebook")
    assert(!Similarity.appendToIvfPqIndex(wave, idx, 1L),
      "replayed fold is a committed no-op")

    // serve sanity on the grown index: k rows per query, no self-match
    val served = Similarity.ivfPqTopK(spark, idx, queries(), e)
    val perQ = served.groupBy($"query_id").count()
      .select($"count").distinct().as[Long].collect()
    assert(perQ.sameElements(Array(5L)), s"5 rows per query, got ${perQ.toSeq}")
    assert(served.filter($"query_id" === $"neighbor_id").isEmpty,
      "no self-matches")

    // tombstone a victim set overlapping current results: victims stop
    // serving; survivors' relative order is preserved (the candidate
    // set shrinks, nothing is re-scored)
    // pin the victim set driver-side first: a limit over an unordered
    // distinct is nondeterministic, so the staged tombstones and the
    // spec's expectation must come from ONE evaluation
    val victimIds = served.select($"neighbor_id").distinct().limit(10)
      .as[Long].collect().toSet
    val victims = victimIds.toSeq.toDF("vec_id")
    assert(Similarity.deleteFromIvfPqIndex(victims, idx, 2L))
    val after = Similarity.ivfPqTopK(spark, idx, queries(), e)
    val afterIds = after.select($"neighbor_id").as[Long].collect().toSet
    assert(afterIds.intersect(victimIds).isEmpty,
      "tombstoned vectors must not serve as neighbors")
    assert(!Similarity.deleteFromIvfPqIndex(victims, idx, 2L),
      "replayed delete is a committed no-op")
  }

  test("IVF-PQ compaction: serve is byte-identical, fold/delete dirs " +
    "purge physically, replays still short-circuit, fsck audits clean") {
    val idx = tmpDir("ivfpq-compact")
    val e = corpus()
    Similarity.writeIvfPqIndex(e.filter($"vec_id" % 5 =!= 4), idx)
    assert(Similarity.appendToIvfPqIndex(
      e.filter($"vec_id" % 5 === 4), idx, 1L))
    assert(Similarity.deleteFromIvfPqIndex(
      Seq(3L, 7L, 11L).toDF("vec_id"), idx, 2L))
    val before = Similarity.ivfPqTopK(spark, idx, queries(), e)
      .collect().map(_.toString).toSet

    Similarity.compactIvfPqIndex(spark, idx)
    val p = Similarity.protocol(idx)
    val vecDir = new java.io.File(
      p.dir("vectors").stripPrefix("file:"))
    val subdirs = vecDir.listFiles().filter(_.isDirectory).map(_.getName)
    assert(subdirs.forall(n => n.matches("c\\d+") || n.startsWith("cent_id=")),
      s"b/d sub-roots must purge physically, got ${subdirs.toSeq}")
    val after = Similarity.ivfPqTopK(spark, idx, queries(), e)
      .collect().map(_.toString).toSet
    assert(after == before, "compaction must not move a single result")
    assert(!Similarity.appendToIvfPqIndex(
      e.filter($"vec_id" % 5 === 4), idx, 1L),
      "ledger survives compaction: replayed fold still short-circuits")
    assert(!Similarity.deleteFromIvfPqIndex(
      Seq(3L).toDF("vec_id"), idx, 2L),
      "replayed delete still short-circuits")
    assert(p.fsck(Seq("cents", "codebook", "vectors", "tombstones")).clean)
  }
}
