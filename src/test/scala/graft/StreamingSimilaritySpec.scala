package graft

import graft.operators.Similarity
import graft.streaming.StreamingSimilarity
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming ANN enrichment against the persisted IVF index: each
  * micro-batch's output must equal the batch index query over the same
  * query set (rankings are per-query, so the union over micro-batches
  * is the batch answer), and a redelivered batchId must rewrite rather
  * than duplicate.
  */
class StreamingSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def resultsOf(out: String) =
    spark.read.option("recursiveFileLookup", "true").parquet(out)
      .select($"query_id", $"neighbor_id", $"rank")
      .as[(Long, Long, Int)].collect().toSet

  test("stream enrichment vs persisted IVF index: micro-batch union " +
    "equals the batch index query; a replayed batchId is idempotent") {
    implicit val sc = spark.sqlContext
    val idx = Similarity.ensureIvfIndex(spark, sf0001)
    val out = tmpDir("ssim-out")
    val ckpt = tmpDir("ssim-ckpt")
    val qvecs = Tables.embeddings(spark, sf0001)
      .filter($"vec_id" < 6)
      .select($"vec_id", $"embedding")
      .as[(Long, Array[Float])].collect().toSeq.sortBy(_._1)

    val in = MemoryStream[(Long, Array[Float])]
    val q = StreamingSimilarity.start(
      in.toDF().toDF("query_id", "qv"), idx, out, ckpt)
    try {
      in.addData(qvecs.take(3): _*)
      q.processAllAvailable()
      in.addData(qvecs.drop(3): _*)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = resultsOf(out)
    val batch = Similarity.indexTopK(spark, idx,
      Tables.embeddings(spark, sf0001).filter($"vec_id" < 6)
        .select($"vec_id".as("query_id"), $"embedding".as("qv")))
      .as[(Long, Long, Int)].collect().toSet
    assert(streamed == batch)
    assert(streamed.map(_._1) == (0L until 6L).toSet)

    // replay of batch 0 (restart between sink write and checkpoint
    // commit): the batchId-keyed overwrite rewrites the same directory —
    // no duplicate rows appear
    StreamingSimilarity.publishBatch(
      qvecs.take(3).toDF("query_id", "qv"), 0L, idx, out)
    assert(resultsOf(out) == streamed, "replayed batch must not duplicate")
  }
}
