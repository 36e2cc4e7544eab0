package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Full-state model version ledger — the score-checkpoint dialect
  * (PageRank checkpoints, NB model versions) factored family-generic.
  *
  * A MODEL version is a complete state, not a delta: `<kind>/seed`
  * holds the initial fit (commit 0, no ledger entry — the protocol's
  * seed convention), each [[commitVersion]] lands the full model
  * frames as `<kind>/b<id>` dirs under ONE ledger commit across every
  * side, and the as-of read is simply the newest committed dir ≤ the
  * horizon per side — one driver-side listing, no replay, no
  * struct-max resolution. This is what closes the reproducibility gap
  * for model families: a training run can pin not just the corpus
  * index it read (`readCommittedStrippedAsOf`) but the exact frozen
  * model — classifier, tokenizer, codebook — that scored it.
  *
  * How a family produces a version's frames is the family's business:
  * NB grows algebraically from the previous version (exact, cost ∝
  * increment), tokenizers RE-FIT on the cumulative slice (BPE/unigram
  * merges are corpus-global elections with no exact increment — the
  * honest version is a fresh fit), PageRank warm-starts. The ledger
  * only guarantees versions land exactly-once, serve per-horizon, and
  * reclaim floor-bounded.
  *
  * Scale: a version is model-sized (vocab × langs, merge table,
  * centroid grid) — kilobytes-to-megabytes against a 100 TB corpus —
  * so keeping a bounded window of versions is cheap; [[vacuum]] holds
  * the window with the same surviving-horizon guarantees as every
  * other ledgered family (below-floor reads REFUSE through
  * `committedDirsAsOf`'s compaction honesty guard rather than serving
  * a newer model as an older one).
  */
object ModelLedger {

  /** Every model family shares the ledger file name; families sharing
    * one ROOT with another ledgered kind must keep their own ledger
    * (the `_scores_ledger` lesson: interleaved ids in one ledger break
    * fsck's per-kind missing-fold-dir check).
    */
  def protocol(path: String) = new FoldProtocol(path, "_model_ledger")

  private val Overwrite = org.apache.spark.sql.SaveMode.Overwrite

  /** Seed version: the initial fit's frames land as `<kind>/seed`
    * (commit 0 — visible at every horizon, no ledger entry).
    */
  def initSeed(root: String, sides: Seq[(String, DataFrame)]): Unit = {
    val p = protocol(root)
    sides.foreach { case (kind, df) =>
      df.write.mode(Overwrite).parquet(s"${p.dir(kind)}/seed")
    }
  }

  /** Land a FULL model state as one ledgered version commit, EXACTLY
    * ONCE under replay (a ledgered commitId is a committed no-op; the
    * b-dir writes carry overwrite semantics so a replay after a
    * mid-write crash rewrites the same dirs; the atomic ledger replace
    * is the commit point, covering every side at once).
    */
  def commitVersion(root: String, commitId: Long,
      sides: Seq[(String, DataFrame)]): Boolean = {
    val p = protocol(root)
    p.fold(commitId, sides.map(_._1)) {
      sides.foreach { case (kind, df) =>
        df.write.mode(Overwrite).parquet(s"${p.dir(kind)}/b$commitId")
      }
    }
  }

  /** The side's newest committed version ≤ the horizon — versions are
    * full states, so the as-of read is one dir pick. Honesty guards
    * are [[FoldProtocol.committedDirsAsOf]]'s: a vacuum that reclaimed
    * the horizon refuses rather than lying.
    */
  def readSideAsOf(s: SparkSession, root: String, kind: String,
      asOf: Long): DataFrame = {
    val p = protocol(root)
    val dirs = p.committedDirsAsOf(kind, asOf)
    s.read.parquet(
      dirs.maxBy(d => p.dirOrd(d.substring(d.lastIndexOf('/') + 1))))
  }

  /** Floor-bounded retention — [[FoldProtocol.vacuumKinds]] with the
    * full-state resolution: `c<floor>` = the newest version ≤ floor
    * per side (no merge, no re-aggregation — a version IS the state).
    */
  def vacuum(s: SparkSession, root: String, kinds: Seq[String],
      floorRequested: Long): Boolean = {
    val p = protocol(root)
    p.vacuumKinds(s, floorRequested, kinds.map(kind =>
      kind -> ((floor: Long, staging: String) =>
        readSideAsOf(s, root, kind, floor)
          .write.mode(Overwrite).parquet(staging))))
  }
}
