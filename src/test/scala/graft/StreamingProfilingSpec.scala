package graft

import graft.functions.HllAgg
import graft.streaming.StreamingProfiling
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming HLL register maintenance: micro-batch-union parity with
  * the one-shot batch sketch, replay idempotence from the max algebra,
  * and the estimate's accuracy over the published table.
  */
class StreamingProfilingSpec extends SparkSpec {
  import spark.implicits._

  test("stream hll: two micro-batches fold to exactly the one-shot " +
    "batch registers, and the estimate tracks the true distinct count") {
    implicit val sc = spark.sqlContext
    val out = tmpDir("hll-out")
    val ckpt = tmpDir("hll-ckpt")

    val wave1 = (0 until 400).map(i => s"user-$i")
    val wave2 = (300 until 700).map(i => s"user-$i") // 300..399 repeat

    val in = MemoryStream[String]
    val q = StreamingProfiling.startHllIngest(
      in.toDF().toDF("k"), out, ckpt)
    try {
      in.addData(wave1: _*)
      q.processAllAvailable()
      in.addData(wave2: _*)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = StreamingProfiling.readRegisters(spark, out)
      .as[(Int, Int)].collect().sorted.toSeq
    val oneShot = StreamingProfiling.registersOf(
      (wave1 ++ wave2).toDF("k"))
      .as[(Int, Int)].collect().sorted.toSeq
    assert(streamed == oneShot,
      "streamed registers must equal the one-shot batch sketch")

    val est = StreamingProfiling.estimate(spark, out)
    assert(math.abs(est - 700.0) / 700.0 < 0.15, s"estimate=$est")
  }

  test("replay idempotence and order independence: re-folding a batch " +
    "is a register no-op (max algebra, no ledger needed)") {
    val out = tmpDir("hll-replay")
    val a = (0 until 100).map(i => s"a-$i").toDF("k")
    val b = (0 until 50).map(i => s"b-$i").toDF("k")

    StreamingProfiling.foldRegisters(a, out)
    StreamingProfiling.foldRegisters(b, out)
    val once = StreamingProfiling.readRegisters(spark, out)
      .as[(Int, Int)].collect().sorted.toSeq

    StreamingProfiling.foldRegisters(b, out) // crash-replay of batch b
    StreamingProfiling.foldRegisters(a, out) // and an out-of-order one
    val replayed = StreamingProfiling.readRegisters(spark, out)
      .as[(Int, Int)].collect().sorted.toSeq
    assert(replayed == once, "replayed folds must not move registers")

    // order independence from scratch: b then a
    val out2 = tmpDir("hll-replay2")
    StreamingProfiling.foldRegisters(b, out2)
    StreamingProfiling.foldRegisters(a, out2)
    val swapped = StreamingProfiling.readRegisters(spark, out2)
      .as[(Int, Int)].collect().sorted.toSeq
    assert(swapped == once)
  }

  test("empty state: estimate reads 0 occupied registers before any " +
    "fold; HllAgg.estimate applies the linear-counting zero branch") {
    val out = tmpDir("hll-empty")
    assert(StreamingProfiling.readRegisters(spark, out).isEmpty)
    assert(HllAgg.estimate(Map.empty, 10) == 0.0)
  }

  test("stream hot keys: per-batch summaries merge to a guaranteed " +
    "superset of whole-stream heavy hitters — including a key heavy " +
    "only in AGGREGATE — and a replayed batch cannot inflate counts") {
    implicit val sc = spark.sqlContext
    val out = tmpDir("hot-out")
    val ckpt = tmpDir("hot-ckpt")
    // 'H' is 30% of EVERY wave (never the within-wave majority against
    // the wave's own tail), the tails are disjoint singletons — so H
    // is heavy only over the union, the cross-batch case the merge
    // rule exists for. c=4, threshold N/5 = 20% < 30%.
    def wave(tag: String) =
      Seq.fill(30)("H") ++ (0 until 70).map(i => s"$tag-$i")
    val in = MemoryStream[String]
    val q = StreamingProfiling.startHotKeys(
      in.toDF().toDF("k"), out, ckpt, c = 4)
    try {
      in.addData(wave("a"): _*); q.processAllAvailable()
      in.addData(wave("b"): _*); q.processAllAvailable()
      in.addData(wave("c"): _*); q.processAllAvailable()
    } finally q.stop()

    val (cands, total) = StreamingProfiling.hotKeyCandidates(spark, out, 4)
    assert(total == 300L)
    assert(cands.size <= 4 && cands.contains("H"),
      s"heavy hitter evicted: $cands")
    // the MG undercount bound holds on the merged summary
    assert(cands("H") <= 90L && cands("H") >= 90L - total / 5)

    // replay: a crash-replayed batch OVERWRITES its summary dir
    // wholesale (never appends), so the batch count stays one and the
    // superset guarantee survives — which MG counter values the
    // replay lands on may legitimately differ with partitioning, so
    // the pinned invariants are the contractual ones, not byte
    // equality
    StreamingProfiling.batchSummary(wave("b").toDF("k"), 4)
      .coalesce(1)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$out/s1")
    val (cands2, total2) = StreamingProfiling.hotKeyCandidates(spark, out, 4)
    assert(total2 == 300L, s"replay double-counted: $total2")
    assert(cands2.size <= 4 && cands2.contains("H"),
      s"replay broke the guarantee: $cands2")

    // a crashed in-flight batch leaves a dir WITHOUT _SUCCESS; a
    // concurrent readout must skip it (the replay will complete it)
    // rather than fail on the partial parquet or count it twice
    val partial = new java.io.File(s"$out/s3")
    assert(partial.mkdirs())
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$out/s3/part-00000.parquet"),
      Array[Byte](0x50, 0x41, 0x52)) // truncated magic, unreadable
    val (cands3, total3) = StreamingProfiling.hotKeyCandidates(spark, out, 4)
    assert(total3 == 300L, s"uncommitted dir was read: $total3")
    assert(cands3 == cands2, "uncommitted dir changed the candidates")
  }
}
