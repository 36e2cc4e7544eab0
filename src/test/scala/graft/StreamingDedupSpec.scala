package graft

import graft.operators.Dedup
import graft.streaming.StreamingDedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The streaming index-backed dedup: micro-batch survivors must equal
  * the batch operator applied sequentially (corpus grows by survivors
  * only), across exact dups, near dups, and cross-batch dups.
  */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  // 20 words → 18 distinct 3-shingles; one trailing-word change keeps
  // Jaccard at 17/19 ≈ 0.89 ≥ 0.8 (near-dup), two early changes drop it
  // well below.
  private val base = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 " +
    "w11 w12 w13 w14 w15 w16 w17 w18 w19 w20"
  private val nearDup = base.replace("w20", "x20")
  private val fresh = "f1 f2 f3 f4 f5 f6 f7 f8 f9 f10 " +
    "f11 f12 f13 f14 f15 f16 f17 f18 f19 f20"

  test("stream dedup vs persisted index: exact/near dups drop across " +
    "micro-batches, survivors grow the index, result equals the batch " +
    "operator applied sequentially") {
    implicit val sc = spark.sqlContext
    val idx = tmpDir("sdedup-idx")
    val out = tmpDir("sdedup-out")
    val ckpt = tmpDir("sdedup-ckpt")
    val init = Seq((1L, base)).toDF("doc_id", "text")
    Dedup.writeIndex(init, idx)

    val in = MemoryStream[(Long, String)]
    val q = StreamingDedup.start(
      in.toDF().toDF("doc_id", "text"), idx, out, ckpt)
    try {
      // batch 1: 10 = exact dup of corpus doc 1; 11 = near dup of 1;
      // 12 = fresh
      in.addData((10L, base), (11L, nearDup), (12L, fresh))
      q.processAllAvailable()
      // batch 2: 20 = exact dup of batch-1 SURVIVOR 12 (cross-batch);
      // 21 = near dup of DROPPED 11 → still a near dup of corpus doc 1;
      // 22 = genuinely new
      in.addData((20L, fresh), (21L, nearDup),
        (22L, "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10 " +
          "z11 z12 z13 z14 z15 z16 z17 z18 z19 z20"))
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.read.parquet(out)
      .select($"doc_id").as[Long].collect().toSet
    assert(streamed == Set(12L, 22L))

    // sequential batch reference: corpus grows by survivors only
    val b1 = Seq((10L, base), (11L, nearDup), (12L, fresh))
      .toDF("doc_id", "text")
    val b2 = Seq((20L, fresh), (21L, nearDup),
      (22L, "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10 " +
        "z11 z12 z13 z14 z15 z16 z17 z18 z19 z20"))
      .toDF("doc_id", "text")
    val s1 = Dedup.incrementalKeepNew(init, b1)
    val s2 = Dedup.incrementalKeepNew(init.union(s1), b2)
    val reference = (s1.select($"doc_id").as[Long].collect() ++
      s2.select($"doc_id").as[Long].collect()).toSet
    assert(streamed == reference)

    // the index grew by exactly the survivors: a from-scratch index over
    // init ∪ survivors has the identical df summary
    val scratch = tmpDir("sdedup-scratch")
    Dedup.writeIndex(
      init.union(spark.read.parquet(out).select($"doc_id", $"text")),
      scratch)
    val dfGrown = spark.read.parquet(s"$idx/df")
      .as[(Long, Long)].collect().toMap
    val dfScratch = spark.read.parquet(s"$scratch/df")
      .as[(Long, Long)].collect().toMap
    assert(dfGrown == dfScratch)
  }
}
