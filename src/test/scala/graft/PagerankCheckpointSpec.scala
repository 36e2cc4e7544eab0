package graft

import graft.operators.Curation
import org.apache.spark.sql.functions._

/** Ledgered score checkpoints for incremental PageRank: resume from
  * the NEWEST checkpoint equals the phased from-scratch recompute,
  * replays are exactly-once, and checkpoint vacuum preserves the
  * resume state (value parity with DuckDB is the driver gate's job —
  * `q_pagerank_checkpointed`; these pin the lifecycle).
  */
class PagerankCheckpointSpec extends SparkSpec {
  import spark.implicits._

  private val Formulas = Seq((31L, 7L), (17L, 3L), (13L, 11L))
  private val Scale = 1000000000L

  test("checkpointRescore: each growth event's re-score resumes from " +
    "the newest ledgered checkpoint and the chain equals the phased " +
    "from-scratch recurrence; replays no-op; vacuum keeps the state") {
    val docs = Tables.documents(spark, sf0001)
    val n = docs.count()

    // independent in-memory 3-phase recompute: phase k runs 10 rounds
    // over the first k formulas' distinct planted edges, resuming from
    // the previous phase's final state
    def edgesUpTo(k: Int): Seq[(Long, Long)] =
      (0L until n).flatMap { id =>
        Formulas.take(k).map { case (a, b) => (id, (id * a + b) % n) }
      }.distinct.filterNot { case (s, d) => s == d }
    val base = (Scale / n) * 15 / 100
    var r = (0L until n).map(_ -> Scale / n).toMap
    for (phase <- 1 to 3) {
      val es = edgesUpTo(phase)
      val deg = es.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      for (_ <- 1 to 10) {
        val c = es.groupBy(_._2).view
          .mapValues(_.map { case (s, _) => r(s) / deg(s) }.sum).toMap
        r = (0L until n).map(v =>
          v -> (base + 85 * c.getOrElse(v, 0L) / 100)).toMap
      }
    }
    val expected = r.toSeq.sortBy { case (id, sc) => (-sc, id) }.take(20)

    // the engine lifecycle on a fresh root: seed (formula 1) → growth 1
    // → checkpoint → growth 2 → checkpoint
    def formulaEdges(a: Long, b: Long) =
      docs.select($"doc_id".as("src"), (($"doc_id" * a + b) % n).as("dst"))
        .filter($"dst" =!= $"src").distinct()
    val root = tmpDir("pr-ckpt")
    Curation.initGraphLedger(spark, docs, root, seedFormulas = 1)
    Curation.appendEdgesCommit(formulaEdges(17L, 3L), root, 1L)
    assert(Curation.checkpointRescore(spark, root, docs) == 1L,
      "the checkpoint id must be the edge ledger's high-water mark")
    Curation.appendEdgesCommit(formulaEdges(13L, 11L), root, 2L)
    assert(Curation.checkpointRescore(spark, root, docs) == 2L)
    val sp = Curation.scoresProtocol(root)
    assert(sp.foldedBatches() == Set(1L, 2L))

    // the newest checkpoint IS the 3-phase fixed point — bit-exact
    def top20(path: String): Seq[(Long, Long)] =
      spark.read.parquet(path).select($"id", $"r")
        .orderBy($"r".desc, $"id").limit(20)
        .as[(Long, Long)].collect().toSeq
    assert(top20(s"$root/scores/b2") == expected,
      "checkpoint chain must equal the phased from-scratch recompute")

    // replay exactly-once: a second rescore at the same edge hw no-ops
    // (the ledger does not grow and the checkpoint set is unchanged)
    assert(Curation.checkpointRescore(spark, root, docs) == 2L)
    assert(sp.foldedBatches() == Set(1L, 2L))

    // a further warm-start READ resumes from b2 (one more PrIters pass
    // over the full graph) — pin it, then prove vacuum preserves it
    val wsPre = Curation.pagerankWarmStart(spark, root, docs)
      .as[(Long, Long)].collect().toSeq
    assert(Curation.vacuumScoreCheckpoints(spark, root, 2L),
      "first checkpoint vacuum must report work done")
    val wsPost = Curation.pagerankWarmStart(spark, root, docs)
      .as[(Long, Long)].collect().toSeq
    assert(wsPost == wsPre,
      "vacuum must preserve the newest checkpoint's resume state")
    assert(top20(s"$root/scores/c2") == expected,
      "the resolved c2 dir must carry the newest checkpoint's content")
    // the reclaimed checkpoint horizon refuses (honesty guard), the
    // surviving one serves, and the replayed vacuum is a committed no-op
    assertThrows[IllegalArgumentException](
      sp.committedDirsAsOf("scores", 1L))
    assert(sp.committedDirsAsOf("scores", 2L).nonEmpty)
    assert(!Curation.vacuumScoreCheckpoints(spark, root, 2L))
    // the EDGE ledger is untouched by a scores vacuum
    assert(Curation.graphProtocol(root).foldedBatches() == Set(1L, 2L))
  }

  test("checkpointRescore refuses on a growth-less root (the seed " +
    "state is already the checkpoint), and the gate fixture resumes " +
    "from the NEWEST checkpoint, not the original seed") {
    val docs = Tables.documents(spark, sf0001)
    val root = tmpDir("pr-ckpt-empty")
    Curation.initGraphLedger(spark, docs, root, seedFormulas = 1)
    assertThrows[IllegalArgumentException](
      Curation.checkpointRescore(spark, root, docs))
    // fixture shape: edges folded twice, ONE checkpoint (at hw 1) —
    // so the gate's own re-score is the third phase
    val froot = Curation.ensureCheckpointedPagerank(spark, sf0001)
    assert(Curation.graphProtocol(froot).foldedBatches() == Set(1L, 2L))
    assert(Curation.scoresProtocol(froot).foldedBatches() == Set(1L))
  }
}
