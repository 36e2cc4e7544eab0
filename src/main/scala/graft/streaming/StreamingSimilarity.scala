package graft.streaming

import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming ANN enrichment against the PERSISTED IVF index — the
  * serving-time shape of `sim_ivf_indexed`, the way `StreamingDedup` is
  * the ingestion-time shape of `dedup_incremental_indexed`. Each
  * micro-batch of query embeddings:
  *
  *   1. assigns every query to its `nprobe` nearest cells (in-row
  *      ranking against the K cached centroids — pure map work),
  *   2. reads ONLY the probed `cent_id=` directories of the
  *      cell-partitioned vector index (static partition prune, the
  *      nprobe/K byte bound),
  *   3. ranks with the bounded-state `top_k` aggregate and appends
  *      (query_id, neighbor_id, rank) to the sink.
  *
  * The index is READ-ONLY here, so replay idempotence needs no ledger:
  * results land in a batchId-keyed directory with overwrite semantics —
  * a restart that redelivers a micro-batch rewrites the same directory
  * instead of appending duplicates. (Contrast `StreamingDedup`, whose
  * batches MUTATE the index and therefore commit through the batch
  * ledger.)
  *
  * Scale shape per batch: O(|batch| × K) centroid rankings map-side, a
  * shuffle join keyed by cell over only the probed cells' vectors, and
  * k-pair aggregation buffers through the final exchange. The corpus is
  * never re-scanned and never re-assigned — ingest paid that once when
  * the index was built.
  */
object StreamingSimilarity {

  /** Start the enrichment stream: `queries` must be a streaming frame
    * with (query_id, qv: array<float>). The index at `indexPath` must
    * exist (`Similarity.ensureIvfIndex` or an equivalent build).
    */
  def start(queries: DataFrame, indexPath: String, outPath: String,
      checkpoint: String, nprobe: Int = 4, k: Int = 5): StreamingQuery =
    queries.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        publishBatch(batch, batchId, indexPath, outPath, nprobe, k)
      }
      .start()

  /** One micro-batch publish — the replay-idempotent unit (also invoked
    * directly by the spec to simulate a redelivered batch).
    */
  def publishBatch(batch: DataFrame, batchId: Long, indexPath: String,
      outPath: String, nprobe: Int = 4, k: Int = 5): Unit = {
    if (batch.isEmpty) return // empty-batch suppression (K3)
    Similarity.indexTopK(batch.sparkSession, indexPath, batch, nprobe, k)
      .write.mode(SaveMode.Overwrite).parquet(s"$outPath/b$batchId")
  }

  /** Streaming serve from the persisted IVF+BINARY index — [[start]]'s
    * contract at the cheapest rung: each micro-batch of
    * `(query_id, qv)` probes cells, Hamming-shortlists over the
    * 16 B/row sign words, and exact-reranks only the shortlist against
    * `full`, the full-precision sidecar (bounded In(vec_id) point
    * lookups). Read-only ⇒ batchId-keyed overwrite, no ledger.
    * Completes streaming-SERVE symmetry across the ANN rungs.
    */
  def startBinary(queries: DataFrame, indexPath: String, full: DataFrame,
      outPath: String, checkpoint: String, nprobe: Int = 4,
      k: Int = 5): StreamingQuery =
    queries.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        publishBinaryBatch(batch, batchId, indexPath, full, outPath,
          nprobe, k)
      }
      .start()

  /** One binary-serve micro-batch — the replay-idempotent unit. */
  def publishBinaryBatch(batch: DataFrame, batchId: Long,
      indexPath: String, full: DataFrame, outPath: String,
      nprobe: Int = 4, k: Int = 5): Unit = {
    if (batch.isEmpty) return // empty-batch suppression (K3)
    Similarity.ivfBinaryTopK(batch.sparkSession, indexPath, batch, full,
      nprobe, k)
      .write.mode(SaveMode.Overwrite).parquet(s"$outPath/b$batchId")
  }

  /** The WRITE side of the index lifecycle: fold micro-batches of NEW
    * corpus vectors `(vec_id, v)` into the persisted IVF index —
    * `Similarity.appendToIvfIndex` per batch, so each vector is
    * assigned to its frozen nearest centroid and lands
    * cell-partitioned in a `b<batchId>/` sub-root. Exactly-once under
    * replay via the index's batch ledger (a redelivered batchId
    * short-circuits post-commit, rewrites its b-dir pre-commit), the
    * same protocol `StreamingDedup` uses for the dedup index. The NEXT
    * enrichment batch (`start`) automatically searches the grown
    * corpus — the committed-roots reader unions seed + ledgered
    * appends. Maintenance every `compactEvery` batches via
    * [[IngestMaintenance]]: compact-all by default, or — with
    * `retainCommits` ≥ 1 — a floor-bounded vacuum that keeps the
    * newest `retainCommits` commits exactly as-of-readable while
    * still bounding the sub-root listing.
    */
  def startIngest(vectors: DataFrame, indexPath: String,
      checkpoint: String, compactEvery: Int = 16,
      retainCommits: Int = 0): StreamingQuery =
    vectors.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          Similarity.appendToIvfIndex(batch, indexPath, batchId)
          // foreachBatch is the single writer both maintenance ops
          // require; gating and cadence live in IngestMaintenance.
          IngestMaintenance.run(Similarity.protocol(indexPath), batchId,
            compactEvery, retainCommits)(
            Similarity.compactIvfIndex(batch.sparkSession, indexPath))(
            Similarity.vacuumIvfIndex(batch.sparkSession, indexPath, _))
        }
      }
      .start()

  /** [[startIngest]] for a persisted IVF-PQ index: each micro-batch of
    * `(vec_id, v)` vectors encodes against the FROZEN centroids and
    * codebook and folds exactly-once through the same ledger
    * ([[graft.operators.Similarity.appendToIvfPqIndex]]), with the
    * identical ledger-gated periodic compaction. The stream never
    * retrains either artifact — refreshes are offline maintenance,
    * exactly like the float index's centroid policy.
    */
  def startPqIngest(vectors: DataFrame, indexPath: String,
      checkpoint: String, compactEvery: Int = 16,
      retainCommits: Int = 0): StreamingQuery =
    vectors.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          Similarity.appendToIvfPqIndex(batch, indexPath, batchId)
          IngestMaintenance.run(Similarity.protocol(indexPath), batchId,
            compactEvery, retainCommits)(
            Similarity.compactIvfPqIndex(batch.sparkSession, indexPath))(
            Similarity.vacuumIvfPqIndex(batch.sparkSession, indexPath, _))
        }
      }
      .start()

  /** Stream new vectors into a persisted IVF+BINARY index — the
    * [[startPqIngest]] contract on the sign-word payload: every
    * micro-batch folds exactly-once through the shared ledger against
    * the FROZEN centroids, with the same ledger-gated periodic
    * compaction. Completes streaming-ingest symmetry across the index
    * family (float, PQ, binary).
    */
  def startBinaryIngest(vectors: DataFrame, indexPath: String,
      checkpoint: String, compactEvery: Int = 16,
      retainCommits: Int = 0): StreamingQuery =
    vectors.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          Similarity.appendToIvfBinaryIndex(batch, indexPath, batchId)
          IngestMaintenance.run(Similarity.protocol(indexPath), batchId,
            compactEvery, retainCommits)(
            Similarity.compactIvfBinaryIndex(batch.sparkSession, indexPath))(
            Similarity.vacuumIvfBinaryIndex(batch.sparkSession, indexPath, _))
        }
      }
      .start()
}
