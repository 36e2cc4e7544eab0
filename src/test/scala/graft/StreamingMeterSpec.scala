package graft

import graft.operators.Bpe
import graft.streaming.StreamingMeter
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming token-budget metering against the frozen BPE model:
  * micro-batch parity with the batch meter, OOV char fallback,
  * per-batch totals, and the cumulative budget gate.
  */
class StreamingMeterSpec extends SparkSpec {
  import spark.implicits._

  test("stream meter: per-doc parity with the batch meter across " +
    "micro-batches, committed totals drive the budget gate") {
    implicit val sc = spark.sqlContext
    val modelRoot = Bpe.ensureBpeModel(spark, sf0001)
    val out = tmpDir("meter-out")
    val ckpt = tmpDir("meter-ckpt")

    val corpus = Tables.documents(spark, sf0001)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val wave1 = corpus.take(3).toSeq
    // wave 2 includes an out-of-vocabulary word -> char-count fallback
    val wave2 = Seq((9001L, "zzzqqq " + corpus(3)._2))

    val in = MemoryStream[(Long, String)]
    val q = StreamingMeter.startMetered(
      in.toDF().toDF("doc_id", "text"), modelRoot, out, ckpt)
    try {
      in.addData(wave1: _*)
      q.processAllAvailable()
      in.addData(wave2: _*)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.read.parquet(s"$out/b0", s"$out/b1")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val batchEquiv = Bpe.meter(
      (wave1 ++ wave2).toDF("doc_id", "text"),
      Bpe.modelVocab(spark, modelRoot))
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(streamed == batchEquiv,
      "stream meters must equal the one-shot batch meter")

    // the OOV word contributes exactly its char count on top of the
    // base document's own meter
    val base = Bpe.meter(Seq((1L, corpus(3)._2)).toDF("doc_id", "text"),
      Bpe.modelVocab(spark, modelRoot)).as[(Long, Long, Long)].head()
    val oov = streamed.find(_._1 == 9001L).get
    assert(oov._2 == base._2 + 1 && oov._3 == base._3 + 6,
      s"OOV 'zzzqqq' must meter as 6 chars: $oov vs base $base")

    val totals = StreamingMeter.batchTotals(spark, out)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(totals.map(t => (t._1, t._2)) == Seq((0L, 3L), (1L, 1L)))
    assert(totals.map(_._3).sum == streamed.map(_._3).sum)

    val all = StreamingMeter.totalTokens(spark, out)
    assert(all == streamed.map(_._3).sum)
    assert(StreamingMeter.budgetReached(spark, out, all))
    assert(!StreamingMeter.budgetReached(spark, out, all + 1))
  }

  test("wordpiece stream meter: per-doc parity with the batch greedy " +
    "meter, UNK words meter as one token, totals in wp units") {
    implicit val sc = spark.sqlContext
    val modelRoot =
      graft.operators.WordPiece.ensureWordPieceModel(spark, sf0001)
    val pieces = graft.operators.WordPiece.modelPieces(spark, modelRoot)
    val out = tmpDir("wpmeter-out")
    val ckpt = tmpDir("wpmeter-ckpt")
    val corpus = Tables.documents(spark, sf0001)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val wave1 = corpus.take(3).toSeq
    // '???' uses characters outside the training alphabet → [UNK] = 1
    val wave2 = Seq((9001L, "??? " + corpus(3)._2))
    val in = MemoryStream[(Long, String)]
    val q = StreamingMeter.startWordPieceMetered(
      in.toDF().toDF("doc_id", "text"), modelRoot, out, ckpt)
    try {
      in.addData(wave1: _*); q.processAllAvailable()
      in.addData(wave2: _*); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.read.parquet(s"$out/b0", s"$out/b1")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val batchEquiv = graft.operators.WordPiece.meter(
        (wave1 ++ wave2).toDF("doc_id", "text"), pieces)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(streamed == batchEquiv,
      "wp stream meters must equal the one-shot batch meter")
    // the unseen-alphabet word costs exactly ONE [UNK] token
    val base = graft.operators.WordPiece.meter(
        Seq((1L, corpus(3)._2)).toDF("doc_id", "text"), pieces)
      .as[(Long, Long, Long)].head()
    val unk = streamed.find(_._1 == 9001L).get
    assert(unk._2 == base._2 + 1 && unk._3 == base._3 + 1,
      s"'???' must meter as one UNK: $unk vs base $base")
    val all = StreamingMeter.totalTokens(spark, out, "wp_tokens")
    assert(all == streamed.map(_._3).sum && all > 0)
  }

  test("empty output: totals read as zero before any batch commits") {
    val out = tmpDir("meter-empty")
    assert(StreamingMeter.totalTokens(spark, out) == 0L)
    assert(!StreamingMeter.budgetReached(spark, out, 1L))
  }

  test("word-less batch suppression: a non-empty batch whose docs " +
    "meter to zero rows commits NO dirs (K3 holds past the cheap " +
    "batch.isEmpty gate)") {
    implicit val sc = spark.sqlContext
    val modelRoot = Bpe.ensureBpeModel(spark, sf0001)
    val out = tmpDir("meter-wordless")
    val ckpt = tmpDir("meter-wordless-ckpt")
    val in = MemoryStream[(Long, String)]
    val q = StreamingMeter.startMetered(
      in.toDF().toDF("doc_id", "text"), modelRoot, out, ckpt)
    try {
      in.addData((1L, "   "), (2L, "")) // words explode to nothing
      q.processAllAvailable()
      in.addData((3L, "real words here"))
      q.processAllAvailable()
    } finally q.stop()
    val dirs = new java.io.File(out).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(!dirs.exists(_.startsWith("b0")) && !dirs.exists(_.startsWith("t0")),
      s"the word-less batch must leave no committed dirs, got $dirs")
    assert(dirs.contains("b1") && dirs.contains("t1"),
      s"the real batch commits normally, got $dirs")
    val totals = StreamingMeter.batchTotals(spark, out)
      .select($"batch_id", $"n_docs").as[(Long, Long)].collect().toSeq
    assert(totals == Seq((1L, 1L)))
  }
}
