package graft.operators

import org.apache.spark.sql.DataFrame

/** Conditional fan-out for corpus scans.
  *
  * The dedup/similarity/text operators all start from a narrow corpus
  * scan whose per-row compute (shingle explode, hashing, SRP
  * projections) dwarfs the scan itself. The driver's bench files are a
  * single parquet split, which would pin that compute to ONE task — so
  * the operators historically injected an unconditional
  * `repartition(defaultParallelism)`. Correct at bench scale, but at
  * multi-TB scale the scan already yields thousands of splits and the
  * unconditional form becomes a gratuitous full-corpus exchange before
  * any filtering.
  *
  * `fanOut` makes the exchange conditional on the actual split count:
  * it plans the frame (no job — a scan-only plan has no query stages,
  * so AQE materializes nothing) and injects the repartition ONLY when
  * the scan yields fewer splits than the session's parallelism. On a
  * wide scan the frame is returned untouched and the plan carries no
  * exchange at all (pinned by PlanSpec "fanOut is a no-op on wide
  * scans").
  */
object Par {
  /** Build `f(item)` for every item on a small thread pool, preserving
    * order. For multi-horizon / multi-window serves whose CONSTRUCTION
    * runs small driver-side jobs (probe-cell collects, ledger listings,
    * shortlist micro-batches): built sequentially those jobs serialize
    * even though the horizons are independent — guide §2.6, actions are
    * only sequential because the driver calls them sequentially. The
    * returned frames are then combined (union) and executed as one
    * query exactly as before; only the construction overlaps. Failures
    * propagate like the sequential form (first exception rethrown).
    */
  def buildAll[A, B](items: Seq[A], parallelism: Int = 4)(f: A => B): Seq[B] = {
    if (items.size <= 1) return items.map(f)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(parallelism, items.size))
    try {
      val futures = items.map(a => pool.submit(
        new java.util.concurrent.Callable[B] { def call(): B = f(a) }))
      futures.map { fut =>
        try fut.get()
        catch { case e: java.util.concurrent.ExecutionException =>
          throw e.getCause }
      }
    } finally pool.shutdown()
  }

  // The narrow/wide verdict is pure function of (file set, parallelism,
  // split conf): memoize it so repeated query builds over the same
  // table (bench passes, multi-query jobs) don't re-pay the physical
  // planning that computes the split count. Keyed by the scan's file
  // NAMES — parquet part files are UUID-named, so any rewrite of the
  // table changes the key and re-derives the verdict.
  private val decisions =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()

  def fanOut(df: DataFrame): DataFrame = {
    val parallelism = df.sparkSession.sparkContext.defaultParallelism
    // Split count of the frame as planned: for the file scans this is
    // applied to, the partition count is decided at planning time
    // (file listing × maxPartitionBytes packing) — reading it runs no
    // Spark job.
    def narrow: Boolean = df.queryExecution.toRdd.getNumPartitions < parallelism
    val files = df.inputFiles
    val isNarrow: Boolean =
      if (files.length >= 4 * parallelism)
        // Many-file short-circuit: FilePartitions pack to
        // maxSplitBytes = min(maxPartitionBytes, max(openCost,
        // totalBytes/parallelism)), so a scan with ≥4× parallelism
        // files always yields ≥ parallelism splits — wide by
        // construction, and the multi-million-file production case
        // never pays the per-name memo key below.
        false
      else if (files.isEmpty) narrow // non-file frame: nothing stable to key on
      else decisions.computeIfAbsent(
        s"${System.identityHashCode(df.sparkSession)}:$parallelism:" +
          s"${files.length}:${files.sorted.mkString("\n").hashCode}",
        _ => narrow).booleanValue()
    if (isNarrow) df.repartition(parallelism) else df
  }
}
