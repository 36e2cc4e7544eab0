package graft.streaming

import graft.operators.Retrieval
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming keyword search against the PERSISTED BM25 inverted index —
  * the serving-time shape of `text_bm25_multi`, completing the triad:
  * `StreamingDedup` ingests into the dedup index, `StreamingSimilarity`
  * serves/ingests the IVF index, this module serves/ingests the BM25
  * index. Each micro-batch of queries `(query_id, terms)`:
  *
  *   1. collects the batch's term buckets driver-side (bounded by the
  *      micro-batch) into a static PartitionFilter,
  *   2. reads ONLY those `bucket=` directories of every committed
  *      posting sub-root — |terms|/Buckets of the postings bytes, raw
  *      corpus never touched,
  *   3. ranks per query with the bounded-state `top_k` aggregate and
  *      lands `(query_id, doc_id, rank)` batchId-keyed.
  *
  * The search side is READ-ONLY, so replay idempotence needs no
  * ledger: a redelivered batchId rewrites its own output directory
  * (overwrite semantics), the `StreamingSimilarity.start` contract.
  * The ingest side MUTATES the index and therefore commits through
  * the index's batch ledger (`Retrieval.appendToBm25Index`).
  */
object StreamingRetrieval {

  /** Start the search stream: `queries` must be a streaming frame with
    * (query_id, terms: array<string>). The index at `indexPath` must
    * exist (`Retrieval.ensureBm25Index` or an equivalent build).
    */
  def start(queries: DataFrame, indexPath: String, outPath: String,
      checkpoint: String, k: Int = 10): StreamingQuery =
    queries.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        publishBatch(batch, batchId, indexPath, outPath, k)
      }
      .start()

  /** One micro-batch publish — the replay-idempotent unit (also invoked
    * directly by the spec to simulate a redelivered batch).
    */
  def publishBatch(batch: DataFrame, batchId: Long, indexPath: String,
      outPath: String, k: Int = 10): Unit = {
    if (batch.isEmpty) return // empty-batch suppression (K3)
    Retrieval.bm25Batch(batch.sparkSession, indexPath, batch, k)
      .write.mode(SaveMode.Overwrite).parquet(s"$outPath/b$batchId")
  }

  /** The WRITE side: fold micro-batches of NEW documents into the
    * persisted BM25 index — `Retrieval.appendToBm25Index` per batch
    * (tokenize the BATCH only; postings + mergeable stats land in a
    * ledgered `b<batchId>/` sub-root), exactly-once under replay via
    * the index ledger. The NEXT search batch automatically ranks over
    * the grown corpus with its df/N/avgdl shifted accordingly.
    * Periodic compaction is ledger-gated and idempotent, same as
    * `StreamingSimilarity.startIngest`.
    */
  def startIngest(docs: DataFrame, indexPath: String,
      checkpoint: String, compactEvery: Int = 16): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          Retrieval.appendToBm25Index(batch, indexPath, batchId)
          if (compactEvery > 0 && batchId % compactEvery == compactEvery - 1
              && Retrieval.bm25FoldedBatches(indexPath).contains(batchId))
            Retrieval.compactBm25Index(batch.sparkSession, indexPath)
        }
      }
      .start()

  /** Streaming EXACT-PHRASE search against the persisted positional
    * index — `Retrieval.phraseBatch` per micro-batch of
    * `(query_id, phrase)`: one static bucket PartitionFilter per
    * batch, batchId-keyed overwrite output. Read-only ⇒
    * replay-idempotent without a ledger, the [[start]] contract.
    */
  def startPhrase(queries: DataFrame, indexPath: String, outPath: String,
      checkpoint: String, k: Int = 10): StreamingQuery =
    queries.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        publishPhraseBatch(batch, batchId, indexPath, outPath, k)
      }
      .start()

  /** One phrase micro-batch publish — the replay-idempotent unit. */
  def publishPhraseBatch(batch: DataFrame, batchId: Long,
      indexPath: String, outPath: String, k: Int = 10): Unit = {
    if (batch.isEmpty) return // empty-batch suppression (K3)
    Retrieval.phraseBatch(batch.sparkSession, indexPath, batch, k)
      .write.mode(SaveMode.Overwrite).parquet(s"$outPath/b$batchId")
  }

  /** Fold micro-batches of NEW documents into the positional index —
    * `Retrieval.appendToPhraseIndex` per batch (pair postings of the
    * BATCH only land in a ledgered `b<batchId>/` sub-root),
    * exactly-once under replay via the index ledger; ledger-gated
    * periodic compaction, same as [[startIngest]].
    */
  def startPhraseIngest(docs: DataFrame, indexPath: String,
      checkpoint: String, compactEvery: Int = 16): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          Retrieval.appendToPhraseIndex(batch, indexPath, batchId)
          if (compactEvery > 0 && batchId % compactEvery == compactEvery - 1
              && Retrieval.phraseFoldedBatches(indexPath).contains(batchId))
            Retrieval.compactPhraseIndex(batch.sparkSession, indexPath)
        }
      }
      .start()

  /** Streaming SUBSTRING (grep) search against the persisted trigram
    * index — `Retrieval.substringBatch` per micro-batch of
    * `(query_id, needle)`: one static bucket PartitionFilter + one
    * candidate-verify join per batch, batchId-keyed overwrite output.
    * Read-only ⇒ replay-idempotent without a ledger. `docs` is the
    * corpus frame the exact verify greps (the serve contract of
    * `text_substring`).
    */
  def startSubstring(queries: DataFrame, indexPath: String,
      docs: DataFrame, outPath: String, checkpoint: String): StreamingQuery =
    queries.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        publishSubstringBatch(batch, batchId, indexPath, docs, outPath)
      }
      .start()

  /** One substring micro-batch publish — the replay-idempotent unit. */
  def publishSubstringBatch(batch: DataFrame, batchId: Long,
      indexPath: String, docs: DataFrame, outPath: String): Unit = {
    if (batch.isEmpty) return // empty-batch suppression (K3)
    Retrieval.substringBatch(batch.sparkSession, indexPath, docs, batch)
      .write.mode(SaveMode.Overwrite).parquet(s"$outPath/b$batchId")
  }

  /** Fold micro-batches of NEW documents into the trigram index —
    * ledgered postings-only folds with ledger-gated periodic
    * compaction via the shared [[Retrieval.compactSubstringIndex]].
    */
  def startSubstringIngest(docs: DataFrame, indexPath: String,
      checkpoint: String, compactEvery: Int = 16): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          Retrieval.appendToSubstringIndex(batch, indexPath, batchId)
          if (compactEvery > 0 && batchId % compactEvery == compactEvery - 1
              && Retrieval.phraseFoldedBatches(indexPath).contains(batchId))
            Retrieval.compactSubstringIndex(batch.sparkSession, indexPath)
        }
      }
      .start()

  /** Stream takedown requests `(doc_id)` through the CROSS-INDEX sweep
    * — each micro-batch tombstones its ids in all four indexes under
    * `root` via [[Retrieval.takedownSweep]], with the epoch-namespaced
    * deleteId scheme of `StreamingDedup.startDeletes` (a fresh
    * checkpoint must not let batchId 0 collide with an OLD sweep's
    * committed id 0 and silently short-circuit — the epoch source is
    * the union of all four ledgers, since a crashed sweep can leave
    * kinds at different horizons). Replay safety is per-kind
    * exactly-once: a redelivered batch no-ops on committed kinds and
    * completes the rest.
    */
  def startSweep(ids: DataFrame, root: String,
      checkpoint: String): StreamingQuery = {
    val epoch = StreamingDedup.epochFor(ids, checkpoint,
      Retrieval.sweptDeleteIds(root))
    ids.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        publishSweep(batch, batchId, root, epoch)
      }
      .start()
  }

  /** One sweep micro-batch — the replay-idempotent unit (exposed so
    * the spec can re-deliver a batchId against partial state).
    */
  def publishSweep(batch: DataFrame, batchId: Long, root: String,
      epoch: Long): Unit = {
    if (batch.isEmpty) return // empty-batch suppression (K3)
    Retrieval.takedownSweep(batch.sparkSession,
      batch.select(org.apache.spark.sql.functions.col("doc_id")),
      root, (epoch << 32) | batchId)
    ()
  }
}
