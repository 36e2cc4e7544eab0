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
    (0 until 8).map(i =>
      shiftleft(conv(substring(md5(c), 2 * i + 1, 2), 16, 10).cast("long"),
        8 * i))
      .reduce((a, b) => a.bitwiseOR(b))

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
}
