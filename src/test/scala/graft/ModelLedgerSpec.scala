package graft

import graft.index.ModelLedger
import org.apache.spark.sql.functions._

/** The family-generic full-state model version ledger: newest-version
  * as-of reads, exactly-once replay, floor-bounded vacuum with the
  * compaction honesty refusal — the dialect NB / PageRank checkpoints
  * / the BPE tokenizer ledger all speak, pinned once on synthetic
  * states.
  */
class ModelLedgerSpec extends SparkSpec {
  import spark.implicits._

  test("full-state version ledger: readSideAsOf serves the newest " +
    "version <= each horizon on every side, a replayed commit no-ops, " +
    "and vacuum keeps surviving horizons while refusing reclaimed " +
    "ones") {
    val root = tmpDir("model-ledger")
    def v(n: Int) = Seq((1L, s"v$n"), (2L, s"v$n")).toDF("id", "tag")
    def aux(n: Int) = Seq((n.toLong, "aux")).toDF("k", "side")
    ModelLedger.initSeed(root, Seq("model" -> v(0), "aux" -> aux(0)))
    assert(ModelLedger.commitVersion(root, 1L,
      Seq("model" -> v(1), "aux" -> aux(1))))
    assert(ModelLedger.commitVersion(root, 2L,
      Seq("model" -> v(2), "aux" -> aux(2))))
    // a committed version id is a replay no-op: the frames must NOT
    // be overwritten
    assert(!ModelLedger.commitVersion(root, 1L,
      Seq("model" -> v(99), "aux" -> aux(99))))
    def tagAt(h: Long) = ModelLedger.readSideAsOf(spark, root, "model", h)
      .select($"tag").distinct().as[String].collect().toSeq
    assert(tagAt(0L) == Seq("v0") && tagAt(1L) == Seq("v1") &&
      tagAt(2L) == Seq("v2") && tagAt(Long.MaxValue) == Seq("v2"))
    assert(ModelLedger.readSideAsOf(spark, root, "aux", 1L)
      .select($"k").as[Long].head() == 1L)
    // vacuum floor 1: the seed version reclaimed on BOTH sides,
    // horizons 1..2 serving unchanged, horizon 0 refusing honestly
    assert(ModelLedger.vacuum(spark, root, Seq("model", "aux"), 1L))
    assert(tagAt(1L) == Seq("v1") && tagAt(2L) == Seq("v2"))
    assert(ModelLedger.readSideAsOf(spark, root, "aux", 1L)
      .select($"k").as[Long].head() == 1L)
    val e = intercept[IllegalArgumentException] {
      ModelLedger.readSideAsOf(spark, root, "model", 0L)
    }
    assert(e.getMessage.contains("compaction"))
    // a replayed vacuum at the same floor is a committed no-op
    assert(!ModelLedger.vacuum(spark, root, Seq("model", "aux"), 1L))
  }
}
