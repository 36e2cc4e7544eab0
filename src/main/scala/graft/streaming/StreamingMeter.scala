package graft.streaming

import graft.operators.Bpe
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Token-budget metering of a DOCUMENT STREAM against a FROZEN BPE
  * model — the ingest-side budget gate of a training-data pipeline:
  * data arrives continuously, every micro-batch is metered in the
  * tokenizer's own units ([[graft.operators.Bpe.meter]], the identical
  * arithmetic the batch gates certify), and the pipeline tracks the
  * cumulative burn toward the corpus token budget while it fills.
  *
  * Exactly-once without a ledger, like
  * [[StreamingCuration.startCurated]]: per-doc meters land in a
  * batchId-keyed dir (`outPath/b<id>`) and the batch's one-row total in
  * a sibling (`outPath/t<id>`), both with overwrite semantics — a
  * crash-replay rewrites the same directories wholesale, and the
  * metered values are deterministic given the frozen model. The
  * cumulative readout ([[totalTokens]]) is a read-time sum of the
  * one-row total files — O(committed batches) rows, never a corpus
  * re-scan — which is what an ingest loop polls between batches to
  * stop at budget ([[budgetReached]]). Empty batches are suppressed
  * (K3).
  */
object StreamingMeter {

  /** Stream per-doc BPE meters + per-batch totals to `outPath`,
    * metering each micro-batch against the model at `modelRoot`.
    */
  def startMetered(docs: DataFrame, modelRoot: String, outPath: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    startMeteredWith(docs, outPath, checkpoint, "bpe_tokens")(b =>
      Bpe.meter(b, Bpe.modelVocab(b.sparkSession, modelRoot)))

  /** The WordPiece twin of [[startMetered]]: each micro-batch metered
    * by greedy longest-match against the frozen piece vocabulary
    * ([[graft.operators.WordPiece.meter]] — the identical arithmetic
    * the batch gates certify; unseen-character words meter as one
    * `[UNK]`). Same exactly-once overwrite protocol, same totals
    * sidecar (`wp_tokens`), same word-less-batch suppression.
    */
  def startWordPieceMetered(docs: DataFrame, modelRoot: String,
      outPath: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    startMeteredWith(docs, outPath, checkpoint, "wp_tokens")(b =>
      graft.operators.WordPiece.meter(b,
        graft.operators.WordPiece.modelPieces(b.sparkSession, modelRoot)))

  /** The shared per-batch publish skeleton of the two meters. */
  private def startMeteredWith(docs: DataFrame, outPath: String,
      checkpoint: String, tokensCol: String)(
      meterFn: DataFrame => DataFrame)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        // cheap emptiness gate on the BATCH (one in-memory limit-1
        // probe), not on the metered frame — probing the latter would
        // run the whole explode + vocab-join + aggregate once for the
        // probe and again for the write, doubling every batch's cost
        if (!batch.isEmpty) {
          meterFn(batch)
            .write.mode(SaveMode.Overwrite)
            .parquet(s"$outPath/b$batchId")
          // totals from the COMMITTED per-doc dir (one small scan), so
          // the two artifacts can never disagree after a partial crash
          val committed = s.read.parquet(s"$outPath/b$batchId")
          if (committed.isEmpty) {
            // all-word-less batch metered to nothing: suppress the pair
            // of dirs wholesale (K3 — a replay rewrites and re-deletes)
            val b = new org.apache.hadoop.fs.Path(s"$outPath/b$batchId")
            b.getFileSystem(s.sparkContext.hadoopConfiguration)
              .delete(b, true)
          } else committed
            .agg(lit(batchId).as("batch_id"),
              count(lit(1)).as("n_docs"),
              sum(col(tokensCol)).as(tokensCol))
            .coalesce(1)
            .write.mode(SaveMode.Overwrite).parquet(s"$outPath/t$batchId")
        }
        ()
      }
      .start()

  /** Per-batch totals committed so far: (batch_id, n_docs, bpe_tokens),
    * one row per non-empty batch.
    */
  def batchTotals(s: SparkSession, outPath: String,
      tokensCol: String = "bpe_tokens"): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(outPath)
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    val dirs =
      if (!fs.exists(root)) Array.empty[String]
      else fs.listStatus(root)
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("t"))
        .map(_.getPath.toString)
    if (dirs.isEmpty)
      s.range(0).select(col("id").as("batch_id"),
        col("id").as("n_docs"), col("id").as(tokensCol))
    else s.read.parquet(dirs.toIndexedSeq: _*)
  }

  /** Cumulative tokens ingested across all committed batches (in the
    * active meter's own units — `bpe_tokens` or `wp_tokens`).
    */
  def totalTokens(s: SparkSession, outPath: String,
      tokensCol: String = "bpe_tokens"): Long =
    batchTotals(s, outPath, tokensCol)
      .agg(coalesce(sum(col(tokensCol)), lit(0L)))
      .head().getLong(0)

  /** The budget gate an ingest loop polls between batches. */
  def budgetReached(s: SparkSession, outPath: String, budget: Long): Boolean =
    totalTokens(s, outPath) >= budget
}
