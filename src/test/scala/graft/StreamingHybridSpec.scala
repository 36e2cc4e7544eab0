package graft

import graft.operators.{Retrieval, Similarity}
import graft.streaming.StreamingHybrid
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming hybrid serving: micro-batch parity with the one-shot
  * hybridBatch over both persisted indexes, and replay idempotence of
  * the batchId-keyed output.
  */
class StreamingHybridSpec extends SparkSpec {
  import spark.implicits._

  test("stream hybrid search: per-batch results equal the one-shot " +
    "batch over both persisted indexes; a replayed batch rewrites " +
    "identically") {
    implicit val sc = spark.sqlContext
    val bmIdx = Retrieval.ensureBm25Index(spark, sf0001)
    val ivfIdx = Similarity.ensureIvfIndex(spark, sf0001)
    val out = tmpDir("hyb-out")
    val ckpt = tmpDir("hyb-ckpt")

    // deterministic query rows: the gate's own (terms, embedding) batch
    val qRows = Retrieval.HybridMultiQueries.toDF("query_id", "terms")
      .join(Tables.embeddings(spark, sf0001)
          .select(($"vec_id" % 3).as("g"),
            posexplode($"embedding").as(Seq("dim", "x")))
          .groupBy($"g", $"dim").agg(avg($"x").as("qx"))
          .groupBy($"g")
          .agg(array_sort(collect_list(struct($"dim", $"qx"))).as("ps"))
          .select((-($"g" + 1)).cast("long").as("query_id"),
            transform($"ps", p => p("qx")).as("qv")),
        Seq("query_id"))
      .as[(Long, Seq[String], Seq[Double])].collect().toSeq
      .sortBy(_._1)

    val in = MemoryStream[(Long, Seq[String], Seq[Double])]
    val q = StreamingHybrid.start(
      in.toDF().toDF("query_id", "terms", "qv"), bmIdx, ivfIdx, out, ckpt)
    try {
      in.addData(qRows.take(1): _*) // batch 0: one query
      q.processAllAvailable()
      in.addData(qRows.drop(1): _*) // batch 1: the other two
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.read.parquet(s"$out/b0", s"$out/b1")
      .as[(Long, Long, Long, Long, Double, Int)].collect().toSet
    val direct = Retrieval.hybridBatch(spark, bmIdx, ivfIdx,
        qRows.toDF("query_id", "terms", "qv"))
      .as[(Long, Long, Long, Long, Double, Int)].collect().toSet
    assert(streamed == direct,
      "streamed fusion must equal the one-shot batch serve")
    assert(direct.map(_._1) == qRows.map(_._1).toSet)

    // replay: a redelivered batchId rewrites the same rows
    StreamingHybrid.publishBatch(
      qRows.take(1).toDF("query_id", "terms", "qv"), 0L, bmIdx, ivfIdx, out)
    val replayed = spark.read.parquet(s"$out/b0", s"$out/b1")
      .as[(Long, Long, Long, Long, Double, Int)].collect().toSet
    assert(replayed == streamed)
  }
}
