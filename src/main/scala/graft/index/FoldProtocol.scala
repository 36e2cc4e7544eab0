package graft.index

import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** The staged-commit state machine shared by graft's three persisted
  * indexes (dedup shingle/hash index, BM25 postings index, IVF vector
  * index). One instance wraps one index root and its batch ledger and
  * provides every filesystem-protocol primitive the indexes need, so
  * the exactly-once semantics live in ONE place:
  *
  *   - '''ledger''' — the set of committed batch entries, one per line.
  *     Plain numeric entries (`7`) are committed APPEND folds; `d`-
  *     prefixed entries (`d7`) are committed DELETE batches. The ledger
  *     file is replaced atomically (staging write + atomic rename), so
  *     a crash leaves either the old or the new committed set, never a
  *     partial one.
  *   - '''sub-dirs''' — an index frame directory (`vectors/`,
  *     `postings/`, `shingles/`, …) holds only sub-directories: build
  *     outputs (`seed/`, `compact/`), per-fold `b<batchId>/` dirs and
  *     per-delete `d<deleteId>/` dirs. [[committedDirs]] resolves the
  *     readable set: every non-batch dir plus exactly the LEDGERED
  *     b/d-dirs — orphans from a crashed fold stay invisible until
  *     their replay commits.
  *   - '''fold''' — stage (overwrite-mode writes into the batch's own
  *     sub-dirs, so a replay after a mid-write crash rewrites the same
  *     dirs instead of double-appending), then commit (one atomic
  *     ledger replace). A ledgered batchId short-circuits to a no-op,
  *     which is what makes replays exactly-once.
  *   - '''tombstones''' — a delete batch stages its victim ids under
  *     `tombstones/d<deleteId>/` and commits through the same ledger.
  *     Readers [[stripTombstoned]] (anti-join) every committed frame;
  *     compaction rewrites the stripped frames and then
  *     [[clearTombstones]] — the physical purge. The clear is safe to
  *     crash out of: stale tombstones over already-purged data
  *     anti-join nothing. Contract note: tombstones hide an id from
  *     ALL committed data, including folds committed AFTER the
  *     delete — re-appending a deleted id serves only once a
  *     compaction has purged the tombstone. Takedowns are terminal
  *     per id within a compaction epoch; re-ingest under the same id
  *     is not a supported sequence (use a fresh id).
  *   - '''publish''' — [[replaceDir]] swaps a fully-staged directory
  *     into place (rename live aside, rename staging in, drop the old
  *     data), so concurrent readers see the previous complete state or
  *     the new complete state, never a mid-write directory.
  *
  * All filesystem access goes through the Hadoop `FileSystem` /
  * `FileContext` APIs resolved from the ACTIVE session's Hadoop conf —
  * the ledger and listings work wherever the parquet writes work
  * (local, HDFS). Atomic replacing renames use
  * `FileContext.rename(…, Options.Rename.OVERWRITE)`, the same
  * primitive Spark's own `CheckpointFileManager` treats as the atomic
  * commit on HDFS-like filesystems; a pure object-store deployment
  * (S3/GCS, no atomic rename) publishes staged dirs via a metadata
  * layer instead — the stage/commit split here is exactly the shape
  * those protocols need, only the publish step differs. Single-writer
  * per index, like every Layout publish.
  *
  * Reference framing: the reference pipeline appends to BigQuery
  * tables and never manages index state
  * (`deployment_function.py:188`); this protocol is the engine-side
  * machinery a 100-TB self-managed index needs for the same
  * "ingest keeps running, readers never see partial state" contract.
  */
final class FoldProtocol(val root: String, ledgerRel: String) {

  private val rootPath = new Path(root)
  private def conf =
    SparkSession.active.sparkContext.hadoopConfiguration
  private def fs: FileSystem = rootPath.getFileSystem(conf)
  private def ledgerPath = new Path(rootPath, ledgerRel)

  // ---- ledger ----

  /** Raw committed ledger entries (numeric = fold, `d<n>` = delete). */
  def entries(): Set[String] = {
    val f = fs
    if (!f.exists(ledgerPath)) Set.empty
    else {
      val in = f.open(ledgerPath)
      try scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().map(_.trim).filter(_.nonEmpty).toSet
      finally in.close()
    }
  }

  /** BatchIds whose APPEND fold is fully committed. */
  def foldedBatches(): Set[Long] =
    entries().filter(_.forall(_.isDigit)).map(_.toLong)

  /** DeleteIds whose tombstone batch is fully committed. */
  def deletedBatches(): Set[Long] =
    entries().collect { case e if e.matches("d\\d+") => e.drop(1).toLong }

  private def renderLedger(extra: Seq[String]): Array[Byte] =
    (entries() ++ extra).toSeq.sorted.mkString("\n").getBytes("UTF-8")

  /** Publish the grown ledger via one atomic file replace — the commit
    * point of a fold or delete.
    */
  def commit(extra: String*): Unit = {
    val tmp = new Path(ledgerPath.getParent, s".${ledgerPath.getName}.staging")
    val out = fs.create(tmp, true)
    try out.write(renderLedger(extra)) finally out.close()
    atomicReplace(tmp, ledgerPath)
  }

  /** Write the grown ledger INTO a staged directory (for indexes whose
    * ledger rides a directory swap — the swap is then both the data
    * publish and the commit point, see `Dedup.commitBatchFold`).
    */
  def writeLedgerInto(dirRel: String, extra: String*): Unit = {
    val dest = new Path(new Path(rootPath, dirRel), ledgerPath.getName)
    val out = fs.create(dest, true)
    try out.write(renderLedger(extra)) finally out.close()
  }

  /** Run an append fold exactly once: a ledgered batchId is a committed
    * no-op (returns false); otherwise stage (overwrite-mode b-dir
    * writes) then commit atomically.
    */
  def fold(batchId: Long)(stage: => Unit): Boolean =
    if (foldedBatches().contains(batchId)) false
    else { stage; commit(batchId.toString); true }

  /** Run a delete batch exactly once — same shape as [[fold]] with a
    * `d`-prefixed ledger entry.
    */
  def delete(deleteId: Long)(stage: => Unit): Boolean =
    if (deletedBatches().contains(deleteId)) false
    else { stage; commit(s"d$deleteId"); true }

  // ---- committed sub-dirs ----

  /** The committed sub-dirs under `<root>/<kind>`: every non-batch dir
    * (seed, compact) plus exactly the ledgered b/d-dirs. Empty when the
    * kind directory does not exist.
    */
  def committedDirsOrEmpty(kind: String): Seq[String] = {
    val f = fs
    val kindPath = new Path(rootPath, kind)
    if (!f.exists(kindPath)) Seq.empty
    else {
      val folded = foldedBatches()
      val deleted = deletedBatches()
      f.listStatus(kindPath).toSeq
        .filter(_.isDirectory)
        .map(_.getPath.getName)
        .filter(n => !n.startsWith(".") && (
          if (n.matches("b\\d+")) folded.contains(n.drop(1).toLong)
          else if (n.matches("d\\d+")) deleted.contains(n.drop(1).toLong)
          else true))
        .map(n => s"$root/$kind/$n").sorted
    }
  }

  /** [[committedDirsOrEmpty]], required non-empty (an index must have a
    * seed or compact dir to be readable).
    */
  def committedDirs(kind: String): Seq[String] = {
    val dirs = committedDirsOrEmpty(kind)
    require(dirs.nonEmpty, s"index at $root has no committed $kind dirs")
    dirs
  }

  // ---- tombstones ----

  /** Stage a delete batch's victim-id frame (single id column) under
    * `tombstones/d<deleteId>/` with overwrite semantics (replay-safe).
    */
  def stageTombstones(ids: DataFrame, idCol: String, deleteId: Long): Unit =
    ids.select(col(idCol)).distinct()
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$root/tombstones/d$deleteId")

  /** All committed tombstoned ids, or None when no delete has ever
    * committed (the common case — readers skip the anti-join
    * entirely).
    */
  def tombstones(s: SparkSession): Option[DataFrame] = {
    val dirs = committedDirsOrEmpty("tombstones")
    if (dirs.isEmpty) None else Some(s.read.parquet(dirs: _*))
  }

  /** Serve-side view of an index frame: anti-join away committed
    * tombstoned ids. No-op (same frame, no extra plan nodes) when the
    * index has no committed deletes.
    */
  def stripTombstoned(frame: DataFrame, idCol: String): DataFrame =
    tombstones(frame.sparkSession).fold(frame)(t =>
      frame.join(t.select(col(idCol)), Seq(idCol), "left_anti"))

  /** Physical-purge step run AFTER compaction swapped in tombstone-
    * stripped data: drop the tombstone dirs (their ledger entries stay,
    * so replayed deletes keep short-circuiting). Crash-safe: stale
    * tombstones over already-purged frames anti-join nothing.
    */
  def clearTombstones(): Unit =
    fs.delete(new Path(rootPath, "tombstones"), true)

  // ---- publish ----

  /** Publish `<root>/<stagingRel>` at `<root>/<targetRel>`: rename the
    * live dir aside, rename staging into place, then delete the old
    * data — no window where the target is mid-write (which plain
    * overwrite-mode saves expose for the full write duration).
    */
  def replaceDir(stagingRel: String, targetRel: String): Unit =
    FoldProtocol.replaceDir(conf, new Path(rootPath, stagingRel),
      new Path(rootPath, targetRel), new Path(rootPath, s".$targetRel.old"))

  private def atomicReplace(src: Path, dst: Path): Unit =
    FoldProtocol.atomicReplace(conf, src, dst)
}

/** The filesystem publish primitives, usable outside an index root
  * (Layout's date-partition compaction and snapshot publishes share
  * them).
  */
object FoldProtocol {

  /** Atomic replacing rename (`FileContext.rename` with
    * `Options.Rename.OVERWRITE` — atomic on local/HDFS-like
    * filesystems, the same primitive Spark's checkpoint managers use).
    * A pure object-store deployment (no atomic rename) publishes
    * staged dirs via a metadata layer instead.
    */
  def atomicReplace(conf: org.apache.hadoop.conf.Configuration,
      src: Path, dst: Path): Unit = {
    val f = src.getFileSystem(conf)
    val fc = FileContext.getFileContext(f.getUri, conf)
    fc.rename(f.makeQualified(src), f.makeQualified(dst),
      Options.Rename.OVERWRITE)
  }

  /** Publish `staging` at `target`: rename the live dir aside, rename
    * staging into place, then delete the old data — readers see the
    * previous complete state or the new complete one, never a
    * mid-write directory.
    */
  def replaceDir(conf: org.apache.hadoop.conf.Configuration,
      staging: Path, target: Path, trash: Path): Unit = {
    val f = target.getFileSystem(conf)
    if (f.exists(trash)) f.delete(trash, true)
    if (f.exists(target)) atomicReplace(conf, target, trash)
    atomicReplace(conf, staging, target)
    f.delete(trash, true)
  }
}
