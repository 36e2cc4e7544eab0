package graft.streaming

import graft.operators.{Dedup, TextAnalysis}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** In-flight curation of a DOCUMENT STREAM — the batch `doc_curate`
  * stages that are per-row predicates applied at ingest time, before
  * anything lands in the corpus: quality floor + n-gram decontamination
  * against a held-out benchmark.
  *
  * Three decontamination routes, by benchmark scale:
  *
  *   - [[curate]]       — the benchmark's distinct 4-gram xxhash64 set
  *                        ships as a literal in-row set (EXACT; driver
  *                        memory O(|grams|) — fine for a small fixture,
  *                        the shape that rots as the benchmark suite
  *                        grows).
  *   - [[curateBloom]]  — a distributed-built Bloom ships instead
  *                        (driver memory O(bloom bits); one-sided
  *                        error: never keeps a contaminated doc,
  *                        over-drops clean docs at ~fpp per gram).
  *   - [[curateExact]]  — the production route: the Bloom probes
  *                        in-row and the RARE hits are exact-verified
  *                        by a distributed semi-join against the
  *                        benchmark gram FRAME — EXACT semantics with
  *                        driver memory bounded by the bloom, never by
  *                        the gram count. Needs batch semantics for
  *                        the per-doc verdict regroup, so streams run
  *                        it per micro-batch via [[startCurated]]
  *                        (foreachBatch), where the quality floor and
  *                        bloom probe remain the identical row-local
  *                        expressions the pure-append routes use.
  *
  * The stateful stages of corpus curation (cross-document dedup,
  * mixture accounting) stay in the batch/compaction tier by design:
  * near-dup candidate generation needs corpus-wide blocking joins, and
  * `StatefulOps.dedupWithinWatermark` already covers the
  * bounded-horizon streaming variant.
  */
object StreamingCuration {

  /** The distinct 4-gram hash FRAME `(gh)` of a benchmark — the
    * distributed drop-list representation ([[curateExact]]'s verify
    * side and the input both builds below aggregate). Never collected.
    */
  def benchmarkGramFrame(bench: DataFrame): DataFrame =
    bench
      .select(explode(array_distinct(Dedup.kgrams(col("text"), 4))).as("g"))
      .select(xxhash64(col("g")).as("gh")).distinct()

  /** Distinct 4-gram hashes of a static benchmark frame (the value to
    * broadcast into [[curate]]). Driver memory grows with the
    * benchmark suite — past fixture scale, use [[curateExact]].
    */
  def benchmarkGramHashes(bench: DataFrame): Array[Long] =
    benchmarkGramFrame(bench).orderBy("gh").collect().map(_.getLong(0))

  /** Gram-hash column of a text column (shared by tests/diagnostics). */
  def gramHashes(text: Column): Column =
    transform(array_distinct(Dedup.kgrams(text, 4)), g => xxhash64(g))

  /** Filter a (possibly streaming) document frame to rows with
    * `quality >= minQuality` that share NO 4-gram with the benchmark.
    *
    * Membership runs as `exists(grams, g -> g IN <set>)`: above the
    * InSet conversion threshold the IN compiles to a PRE-BUILT hash set
    * (one O(1) probe per gram), where `arrays_overlap` against a
    * literal array would rebuild its probe set per ROW — O(|benchmark|)
    * per document.
    */
  def curate(docs: DataFrame, benchHashes: Array[Long],
      minQuality: Double = 0.75): DataFrame =
    docs
      .filter(TextAnalysis.qualityScore(col("text")) >= minQuality)
      .filter(!exists(gramHashes(col("text")),
        g => g.isInCollection(benchHashes.toSeq)))

  /** Distributed Bloom build over a benchmark frame's distinct 4-grams —
    * the drop-list representation past exact-set scale (see
    * [[graft.functions.BloomMightContain]]). Built with a treeAggregate
    * across executors, never collected as raw hashes.
    */
  def benchmarkBloom(bench: DataFrame, expectedGrams: Long,
      fpp: Double = 0.01): org.apache.spark.util.sketch.BloomFilter =
    bench
      .select(explode(array_distinct(Dedup.kgrams(col("text"), 4))).as("g"))
      .select(xxhash64(col("g")).as("gh")).distinct()
      .stat.bloomFilter("gh", expectedGrams, fpp)

  /** [[curate]] with the Bloom drop-list: identical shape, one-sided
    * error — never keeps a contaminated doc; over-drops clean docs at
    * ~fpp per gram.
    */
  def curateBloom(docs: DataFrame,
      bloom: org.apache.spark.util.sketch.BloomFilter,
      minQuality: Double = 0.75): DataFrame =
    docs
      .filter(TextAnalysis.qualityScore(col("text")) >= minQuality)
      .filter(!exists(gramHashes(col("text")),
        g => graft.functions.BloomMightContain.might_contain(g, bloom)))

  /** Bloom-ROUTED exact decontamination of one (micro-)batch: the
    * quality floor and the in-row bloom probe split the batch into
    * definitely-clean rows (no gram might be in the benchmark — kept
    * outright, no join) and SUSPECTS (≥1 probe hit: the truly
    * contaminated plus ~fpp false positives), and only the suspects'
    * grams take the distributed semi-join against `benchGrams`
    * ([[benchmarkGramFrame]]) for the exact verdict. Result-identical
    * to [[curate]] with the exact gram array (batch-parity spec'd at
    * 100× the fixture benchmark), but nothing driver-side ever holds
    * the gram set: the driver carries the BLOOM (fixed bits), the gram
    * frame stays distributed, and the join side is O(|suspects| ×
    * grams/doc) rows — fpp-small however large the corpus batch.
    *
    * Batch-shaped (the per-doc verdict is a distinct + anti-join);
    * streams run it per micro-batch via [[startCurated]].
    */
  def curateExact(docs: DataFrame, bloom: org.apache.spark.util.sketch.BloomFilter,
      benchGrams: DataFrame, minQuality: Double = 0.75): DataFrame = {
    val cols = docs.columns.map(col).toSeq
    val q = docs
      .filter(TextAnalysis.qualityScore(col("text")) >= minQuality)
      .withColumn("_grams", gramHashes(col("text")))
      .withColumn("_suspect", exists(col("_grams"),
        g => graft.functions.BloomMightContain.might_contain(g, bloom)))
    val suspects = q.filter(col("_suspect"))
    val contaminated = suspects
      .select(col("doc_id"), explode(col("_grams")).as("gh"))
      .join(benchGrams.select(col("gh")), Seq("gh"), "left_semi")
      .select(col("doc_id")).distinct()
    q.filter(!col("_suspect")).select(cols: _*)
      .unionByName(
        suspects.join(contaminated, Seq("doc_id"), "left_anti")
          .select(cols: _*))
  }

  /** Streaming [[curateExact]]: each micro-batch takes the bloom probe
    * + exact-verify route and survivors land in a batchId-keyed dir
    * with overwrite semantics (`outPath/b<batchId>` — a replay after a
    * crash rewrites the same directory wholesale, so the curated
    * corpus stays exactly-once without a ledger: the batch's survivor
    * set is deterministic given the static benchmark artifacts).
    * Empty batches are suppressed (K3).
    */
  def startCurated(docs: DataFrame,
      bloom: org.apache.spark.util.sketch.BloomFilter,
      benchGrams: DataFrame, outPath: String, checkpoint: String,
      minQuality: Double = 0.75)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val kept = curateExact(batch, bloom, benchGrams, minQuality)
        if (!kept.isEmpty)
          kept.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
            .parquet(s"$outPath/b$batchId")
        ()
      }
      .start()

  /** Streaming markup extraction — the crawled-ingest FRONT stage,
    * upstream of everything above: each micro-batch of raw
    * `(doc_id, t2)` markup runs `TextAnalysis.extractHtml`
    * (script/style drop, link-density block filter, entity unescape)
    * and lands `(doc_id, ext, changed)` batchId-keyed. The per-doc
    * block reassembly is a doc_id-keyed aggregate WITHIN the batch —
    * no cross-batch state — so foreachBatch is the natural unit and
    * replay is a pure overwrite (no ledger; extraction is
    * deterministic and read-only).
    */
  def startExtract(docs: DataFrame, outPath: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        publishExtractBatch(batch, batchId, outPath)
      }
      .start()

  /** Streaming Naive-Bayes classification against the PERSISTED model
    * (`TextAnalysis.ensureNbModel`'s model/ + langs/ frames): each
    * micro-batch of `(doc_id, lang, text)` documents scores through the
    * SAME frozen-model kernel the batch serve uses
    * (`TextAnalysis.nbClassify`) and lands batchId-keyed — the model is
    * fitted once, offline; classification is per-batch map+join work
    * with no cross-batch state, so foreachBatch is the natural unit and
    * replay is a pure overwrite.
    */
  def startNbClassify(docs: DataFrame, modelRoot: String, outPath: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        publishNbBatch(batch, batchId, modelRoot, outPath)
      }
      .start()

  /** Streaming DSIR domain-fit metering against the PERSISTED model
    * (`Curation.ensureDsirModel`): each micro-batch of
    * `(doc_id, source, text)` documents scores through the same frozen
    * kernel the batch serve uses (`Curation.dsirScore` — hashed-bigram
    * buckets × the ≤ 1024-row model broadcast, integer log-weights,
    * md5-derived Gumbel keys) and lands batchId-keyed — the production
    * shape: fit the target-domain model once offline, meter every
    * crawled batch's domain fit as it arrives, and let the downstream
    * selection rank on the accumulated keys.
    */
  def startDsirScore(docs: DataFrame, modelRoot: String, outPath: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        publishDsirBatch(batch, batchId, modelRoot, outPath)
      }
      .start()

  /** Stream NEW link-graph edges `(src, dst)` into a ledgered graph
    * root — each micro-batch lands as one
    * [[graft.operators.Curation.appendEdgesCommit]] fold (exactly-once
    * under replay via the graph ledger, epoch-namespaced commitIds
    * like every streaming fold), so a warm-start re-score
    * ([[graft.operators.Curation.pagerankWarmStart]]) picks up the
    * grown graph at any commit boundary — the streaming half of
    * `q_pagerank_incremental`'s lifecycle. Re-emitted edges collapse
    * in the reader's distinct (re-ingest idempotence).
    */
  def startEdgeIngest(edges: DataFrame, root: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery = {
    val epoch = StreamingDedup.epochFor(edges, checkpoint,
      graft.operators.Curation.graphProtocol(root).allLedgerIds() + 0L)
    edges.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) // empty-batch suppression (K3)
          graft.operators.Curation.appendEdgesCommit(
            batch, root, (epoch << 32) | batchId)
        ()
      }
      .start()
  }

  /** [[startEdgeIngest]] with CHECKPOINTED re-scoring: every
    * `rescoreEvery` batches (ledger-gated, replay-idempotent — the
    * [[IngestMaintenance]] cadence convention) the stream re-scores
    * the grown graph warm-starting from the newest committed score
    * checkpoint and publishes the result as a ledgered `scores/b<hw>`
    * commit ([[graft.operators.Curation.checkpointRescore]] — the id
    * IS the edge ledger's high-water, so a redelivered cadence batch
    * short-circuits on the scores ledger). With `retainCheckpoints` ≥
    * 1 old checkpoints vacuum floor-bounded on the same cadence — the
    * long-running shape: edges stream in, scoring cost stays
    * amortized (PrIters rounds per cadence window, never per read),
    * and the checkpoint history holds a bounded as-of window.
    */
  def startEdgeIngestCheckpointed(edges: DataFrame, root: String,
      docs: DataFrame, checkpoint: String, rescoreEvery: Int = 8,
      retainCheckpoints: Int = 0)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.operators.Curation
    val epoch = StreamingDedup.epochFor(edges, checkpoint,
      Curation.graphProtocol(root).allLedgerIds() + 0L)
    edges.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val commitId = (epoch << 32) | batchId
          Curation.appendEdgesCommit(batch, root, commitId)
          if (rescoreEvery > 0 &&
              batchId % rescoreEvery == rescoreEvery - 1 &&
              Curation.graphProtocol(root).foldedBatches()
                .contains(commitId)) {
            Curation.checkpointRescore(batch.sparkSession, root, docs)
            if (retainCheckpoints >= 1) {
              val ids = Curation.scoresProtocol(root).allLedgerIds()
                .toSeq.sorted(Ordering[Long].reverse)
              if (ids.length > retainCheckpoints)
                Curation.vacuumScoreCheckpoints(batch.sparkSession,
                  root, ids(retainCheckpoints - 1))
            }
          }
        }
        ()
      }
      .start()
  }

  /** Stream LABELED documents into a ledgered NB model root — each
    * micro-batch folds as one
    * [[graft.operators.TextAnalysis.growNbModelCommit]] (exactly-once
    * under replay via the model ledger, epoch-namespaced commitIds),
    * so the classifier VERSION history grows with the stream and any
    * commit boundary stays servable through `readNbModelAsOf` — the
    * streaming half of `text_nb_asof`'s lifecycle, the way
    * [[startEdgeIngest]] is `q_pagerank_incremental`'s.
    */
  def startNbGrowIngest(labeled: DataFrame, root: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.operators.TextAnalysis
    val epoch = StreamingDedup.epochFor(labeled, checkpoint,
      TextAnalysis.modelProtocol(root).allLedgerIds() + 0L)
    labeled.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) // empty-batch suppression (K3)
          TextAnalysis.growNbModelCommit(batch.sparkSession, root,
            batch, (epoch << 32) | batchId)
        ()
      }
      .start()
  }

  /** One DSIR-score micro-batch — the replay-idempotent unit. */
  def publishDsirBatch(batch: DataFrame, batchId: Long, modelRoot: String,
      outPath: String): Unit = {
    if (batch.isEmpty) return // empty-batch suppression (K3)
    val s = batch.sparkSession
    graft.operators.Curation.dsirScore(
        batch.select(col("doc_id"), col("source"), col("text")),
        s.read.parquet(s"$modelRoot/model"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$outPath/b$batchId")
  }

  /** One NB-classify micro-batch — the replay-idempotent unit. */
  def publishNbBatch(batch: DataFrame, batchId: Long, modelRoot: String,
      outPath: String): Unit = {
    if (batch.isEmpty) return // empty-batch suppression (K3)
    val s = batch.sparkSession
    graft.operators.TextAnalysis.nbClassify(
        batch.select(col("doc_id"), col("lang"), col("text")),
        s.read.parquet(s"$modelRoot/model"),
        s.read.parquet(s"$modelRoot/langs"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$outPath/b$batchId")
  }

  /** One extraction micro-batch — the replay-idempotent unit. */
  def publishExtractBatch(batch: DataFrame, batchId: Long,
      outPath: String): Unit = {
    if (batch.isEmpty) return // empty-batch suppression (K3)
    TextAnalysis.extractHtml(batch.select(col("doc_id"), col("t2")))
      .select(col("doc_id"), col("ext"),
        when(col("ext") =!= col("t2"), 1L).otherwise(0L).as("changed"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$outPath/b$batchId")
  }
}
