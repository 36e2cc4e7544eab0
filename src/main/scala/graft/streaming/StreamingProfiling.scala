package graft.streaming

import graft.functions.HllAgg
import graft.operators.Layout
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming distinct-count sketch: a HyperLogLog register table
  * maintained across micro-batches — the continuously-updated
  * "how many distinct users/URLs/keys has this stream carried" readout
  * a 100-TB ingest keeps without ever storing (or shuffling) the key
  * set itself.
  *
  * Exactly-once WITHOUT a ledger, by algebra instead of bookkeeping:
  * bytewise-max registers are MONOTONE and IDEMPOTENT (max(x, x) = x),
  * so a crash-replayed micro-batch folds to a no-op and fold order is
  * irrelevant — the one property the fold ledgers elsewhere exist to
  * manufacture, here native to the sketch. Each fold computes the
  * batch's own ≤ 2^p register rows ([[graft.functions.HllAgg]] — the
  * same aggregate `q_hll_distinct` value-gates), full-outer-maxes them
  * against the published table, and republishes via the staged-swap
  * ([[Layout.publishOverwrite]]) so readers never see a partial state.
  * State is ≤ 2^p rows at any stream length; per-batch cost is one
  * 1 KiB-state aggregate over the batch plus a ≤ 2^p-row merge.
  */
object StreamingProfiling {

  /** md5-derived 64-bit hash of a string key — the same cross-engine
    * fingerprint contract as `q_checksum` / `q_hll_distinct`.
    */
  def md5Hash64(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.functions.Md5Long.md5_num(c)

  /** Registers of one key frame (column `k`, string): ≤ 2^p rows of
    * (register, max_rho).
    */
  def registersOf(keys: DataFrame, p: Int = 10): DataFrame =
    keys.select(md5Hash64(col("k")).as("h"))
      .agg(HllAgg.hll_registers(col("h"), p).as("rs"))
      .select(explode(col("rs")).as("r"))
      .select(col("r.register").as("register"),
        col("r.max_rho").as("max_rho"))

  /** Fold one batch of keys into the published register table at
    * `outPath/registers` — idempotent (replay-safe) and
    * order-independent by the max algebra.
    */
  def foldRegisters(batch: DataFrame, outPath: String,
      p: Int = 10): Unit = {
    val s = batch.sparkSession
    val fresh = registersOf(batch, p)
    val merged = readRegisters(s, outPath)
      .unionByName(fresh)
      .groupBy(col("register"))
      .agg(max(col("max_rho")).as("max_rho"))
    // the merge READS the published dir, so materialize before the
    // swap replaces it (the staged write itself is that materialization
    // — publishOverwrite stages to a sibling and renames)
    Layout.publishOverwrite(merged, s"$outPath/registers")
  }

  /** The published register table (empty frame before the first fold). */
  def readRegisters(s: SparkSession, outPath: String): DataFrame = {
    val path = new org.apache.hadoop.fs.Path(s"$outPath/registers")
    val fs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(path)) s.read.parquet(path.toString)
    else s.range(0).select(col("id").cast("int").as("register"),
      col("id").cast("int").as("max_rho"))
  }

  /** The stream's distinct-count estimate so far — one driver-side
    * formula over the ≤ 2^p published rows.
    */
  def estimate(s: SparkSession, outPath: String, p: Int = 10): Double = {
    val occupied = readRegisters(s, outPath)
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    HllAgg.estimate(occupied, p)
  }

  /** Stream a key column (`k` string) into the register table. Empty
    * batches are suppressed (K3).
    */
  def startHllIngest(keys: DataFrame, outPath: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    keys.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) foldRegisters(batch, outPath)
        ()
      }
      .start()

  // ---- streaming heavy hitters ----
  // The Misra-Gries contrast to the HLL table above: MG summaries
  // merge by SUM, which is monotone but NOT idempotent — re-folding a
  // replayed batch would inflate counts — so the stream persists one
  // summary PER micro-batch under a batchId-keyed overwrite dir
  // (replay rewrites the same ≤ c rows wholesale; deterministic given
  // the batch), and the cumulative summary is a read-time
  // mergeable-summaries fold over the O(batches) × c persisted rows.
  // The exactly-once story is the StreamingMeter convention, where
  // the HLL table needed no convention at all — the algebra decides
  // the bookkeeping.

  /** One batch's (k, cnt, n) summary rows: ≤ c keys plus the batch's
    * total stream length on every row (denormalized so the readout
    * needs no second artifact).
    */
  def batchSummary(batch: DataFrame, c: Int): DataFrame =
    batch
      .agg(graft.functions.MisraGriesAgg
        .misra_gries_counts(col("k"), c).as("s"),
        count(lit(1)).as("n"))
      .select(explode(col("s")).as("e"), col("n"))
      .select(col("e.k").as("k"), col("e.cnt").as("cnt"), col("n"))

  /** Stream a key column (`k` string) into per-batch MG summaries at
    * `outPath/s<batchId>`. Empty batches are suppressed (K3).
    */
  def startHotKeys(keys: DataFrame, outPath: String, checkpoint: String,
      c: Int = 8): org.apache.spark.sql.streaming.StreamingQuery =
    keys.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          batchSummary(batch, c).coalesce(1)
            .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
            .parquet(s"$outPath/s$batchId")
        ()
      }
      .start()

  /** The stream's heavy-hitter CANDIDATES so far — a driver-side
    * mergeable-summaries fold over the committed per-batch summaries
    * (batch order; O(batches) small reads, ≤ c keys of state) — plus
    * the total stream length. Guaranteed superset of every key above
    * N/(c+1) of the whole stream; the exact re-count is one batch job
    * over the landed corpus restricted to the ≤ c candidates.
    */
  def hotKeyCandidates(s: SparkSession, outPath: String,
      c: Int = 8): (Map[String, Long], Long) = {
    val root = new org.apache.hadoop.fs.Path(outPath)
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return (Map.empty, 0L)
    val dirs = fs.listStatus(root)
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("s"))
      .map(_.getPath)
      // only COMMITTED summaries: a readout concurrent with a crashed
      // or in-flight batch write must skip the partial dir (the batch
      // replays and completes it) rather than fail or double-read
      .filter(p => fs.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS")))
      .sortBy(_.getName.drop(1).toLong)
    var total = 0L
    val waves = dirs.toSeq.map { p =>
      val rows = s.read.parquet(p.toString)
        .select(col("k"), col("cnt"), col("n"))
        .collect()
      if (rows.nonEmpty) total += rows.head.getLong(2)
      rows.map(r => r.getString(0) -> r.getLong(1)).toSeq
    }
    (graft.functions.MisraGriesAgg.mergeSummaries(waves, c), total)
  }
}
