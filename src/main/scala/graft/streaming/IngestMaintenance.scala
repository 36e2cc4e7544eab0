package graft.streaming

import graft.index.FoldProtocol

/** The shared maintenance step of every streaming INDEX ingest —
  * ledger-gated, cadence-bounded, replay-idempotent:
  *
  *   - `retainCommits == 0` (the default): COMPACT-ALL, the round-17
  *     behavior — one dir, O(every) listing, but every as-of horizon
  *     is traded away (compaction collapses the per-fold history).
  *   - `retainCommits >= 1`: floor-bounded VACUUM at the
  *     `retainCommits`-th newest ledger id — the dir count stays
  *     bounded at O(every + retainCommits) AND the newest
  *     `retainCommits` commits stay exactly as-of-readable, so a
  *     long-running ingest holds a bounded reproducibility window
  *     instead of choosing between unbounded dirs and no history
  *     (the `StreamingTimeTravel.startAppendRetained` contract,
  *     generalized to every index kind).
  *
  * Gated on the batch's own fold being ledgered (committed by this
  * invocation or a pre-crash one): both ops are committed no-ops under
  * replay, so re-running on a redelivered batchId is safe and covers
  * the crash window between the fold's commit and the maintenance.
  * The cadence matters at scale: each vacuum/compaction rewrites the
  * resolved state once, so per-batch runs would make ingest O(index)
  * per micro-batch.
  */
private[streaming] object IngestMaintenance {

  def run(p: FoldProtocol, batchId: Long, every: Int,
      retainCommits: Int)(compact: => Unit)(
      vacuum: Long => Unit): Unit =
    if (every > 0 && batchId % every == every - 1 &&
        p.foldedBatches().contains(batchId)) {
      if (retainCommits <= 0) compact
      else {
        val ids = p.allLedgerIds().toSeq.sorted(Ordering[Long].reverse)
        if (ids.length > retainCommits) vacuum(ids(retainCommits - 1))
      }
    }
}
