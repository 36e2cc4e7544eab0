package graft.streaming

import graft.operators.Multimodal
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming image near-dup dedup against the PERSISTED
  * perceptual-hash index — the image sibling of `StreamingDedup`:
  * each micro-batch of decoded-and-hashed assets `(asset_id, phash)`
  * is (1) deduped against the index AND itself with the
  * keep-smallest-id contract (`Multimodal.phashKeepNew`), landing the
  * batch's SURVIVORS batchId-keyed, then (2) folded into the index
  * through its ledger so the NEXT batch deduplicates against it —
  * exactly-once under replay: the survivor write carries overwrite
  * semantics and the fold short-circuits on a committed batchId, so
  * a crash between the two replays to the identical state.
  *
  * Decode/hash happens UPSTREAM (`Multimodal.perceptualHashes` over
  * the asset stream) — this module only sees 16-byte hash rows, the
  * same weight discipline as the sign-word index.
  */
object StreamingMultimodal {

  /** Start the dedup-and-ingest stream over `(asset_id, phash)`. */
  def start(hashes: DataFrame, indexPath: String, outPath: String,
      checkpoint: String, compactEvery: Int = 16): StreamingQuery =
    hashes.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        publishBatch(batch, batchId, indexPath, outPath, compactEvery)
      }
      .start()

  /** One micro-batch — the replay-idempotent unit (exposed so the
    * spec can redeliver a batchId against partial state).
    */
  def publishBatch(batch: DataFrame, batchId: Long, indexPath: String,
      outPath: String, compactEvery: Int = 16): Unit = {
    if (batch.isEmpty) return // empty-batch suppression (K3)
    val s = batch.sparkSession
    // survivors FIRST (dedup sees index + this batch, not yet the
    // fold — folding first would make every batch row its own
    // "history" and the replay non-idempotent on a crash between)
    Multimodal.phashKeepNew(s, indexPath, batch)
      .write.mode(SaveMode.Overwrite).parquet(s"$outPath/b$batchId")
    Multimodal.appendToPhashIndex(batch, indexPath, batchId)
    if (compactEvery > 0 && batchId % compactEvery == compactEvery - 1
        && Multimodal.phashProtocol(indexPath).foldedBatches()
          .contains(batchId))
      Multimodal.compactPhashIndex(s, indexPath)
    ()
  }

  /** Streaming reverse-image SEARCH — the query-side twin of the
    * ingest stream, the `StreamingRetrieval.startPrefix` shape on the
    * phash index: each micro-batch of probe hashes
    * `(query_id, phash)` serves `Multimodal.phashSearch` against the
    * PERSISTED index and lands the matches batchId-keyed
    * (overwrite-on-replay ⇒ idempotent redelivery).
    */
  def startSearch(probes: DataFrame, indexPath: String, outPath: String,
      checkpoint: String, radius: Int = 3): StreamingQuery =
    probes.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        publishSearchBatch(batch, batchId, indexPath, outPath, radius)
      }
      .start()

  /** One search micro-batch (exposed for replay-idempotence specs). */
  def publishSearchBatch(batch: DataFrame, batchId: Long,
      indexPath: String, outPath: String, radius: Int = 3): Unit = {
    if (batch.isEmpty) return // empty-batch suppression (K3)
    Multimodal.phashSearch(batch.sparkSession, indexPath,
        batch.select(batch("query_id").cast("long").as("query_id"),
          batch("phash").cast("long").as("phash")), radius)
      .write.mode(SaveMode.Overwrite).parquet(s"$outPath/b$batchId")
    ()
  }
}
