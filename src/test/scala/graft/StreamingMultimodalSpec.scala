package graft

import graft.operators.Multimodal
import graft.media.DispatchMediaKernel
import graft.streaming.StreamingMultimodal
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming image dedup-and-ingest: micro-batched arrival must
  * converge to the one-shot batch keep-list, later batches must dedup
  * against earlier ones through the index, and a redelivered batchId —
  * including one whose FOLD already committed — must reproduce its own
  * survivors exactly.
  */
class StreamingMultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("micro-batched image waves dedup against the growing index; " +
    "the union of survivors equals the one-shot keep-list; a replay " +
    "after the fold committed is idempotent") {
    implicit val sc = spark.sqlContext
    val hashes = Multimodal
      .perceptualHashes(Multimodal.plantedImages(spark, sf0001),
        DispatchMediaKernel)
      .collect().map(p => p.asset_id -> p.phash).toSeq.sortBy(_._1)
    val idx = tmpDir("sphash-idx")
    val out = tmpDir("sphash-out")
    val ckpt = tmpDir("sphash-ckpt")
    // seed an EMPTY index root (the stream builds the rest)
    Multimodal.writePhashIndex(
      Seq.empty[(Long, Long)].toDF("asset_id", "phash"), idx)

    val (w1, w2) = hashes.splitAt(hashes.length / 2)
    val in = MemoryStream[(Long, Long)]
    val q = StreamingMultimodal.start(
      in.toDF().toDF("asset_id", "phash"), idx, out, ckpt)
    try {
      in.addData(w1: _*); q.processAllAvailable()
      in.addData(w2: _*); q.processAllAvailable()
    } finally q.stop()

    def survivors() = spark.read
      .option("recursiveFileLookup", "true").parquet(out)
      .select($"asset_id").as[Long].collect().toSet
    val streamed = survivors()
    // one-shot truth: smallest-id-wins over band collisions at <= 3
    val hm = hashes.toMap
    def chunkSet(h: Long) =
      (0 until 4).map(c => (c, (h >>> (c * 16)) & 0xFFFFL)).toSet
    val expect = hm.keySet.filter(id => !hm.exists { case (o, oh) =>
      o < id && chunkSet(oh).intersect(chunkSet(hm(id))).nonEmpty &&
        java.lang.Long.bitCount(oh ^ hm(id)) <= 3
    })
    assert(streamed == expect,
      s"extra=${streamed.diff(expect)} missing=${expect.diff(streamed)}")

    // replay batch 1 AFTER its fold committed: the batch's rows now
    // sit in the index too, but self-partners are excluded by the
    // strict smaller-id rule, so the rewritten survivor dir is
    // identical and the fold short-circuits
    StreamingMultimodal.publishBatch(
      w2.toDF("asset_id", "phash"), 1L, idx, out)
    assert(survivors() == streamed,
      "a replayed batch must reproduce its own survivors")
  }

  test("one banding machine: AUDIO fingerprints flow through the same " +
    "persisted index and keep-new contract unchanged — the 64-bit hash " +
    "convention is modality-agnostic") {
    val hashes = Multimodal.audioFingerprints(
      Multimodal.plantedAudio(spark, sf0001), DispatchMediaKernel)
      .collect().map(p => p.asset_id -> p.phash).toMap
    val idx = tmpDir("aphash-idx")
    val hist = hashes.toSeq.filter(_._1 % 5 != 4)
      .toDF("asset_id", "phash")
    Multimodal.writePhashIndex(hist, idx)
    val incoming = hashes.toSeq.filter(_._1 % 5 == 4)
      .toDF("asset_id", "phash")
    val got = Multimodal.phashKeepNew(spark, idx, incoming)
      .select($"asset_id").as[Long].collect().toSet
    def chunkSet(h: Long) =
      (0 until 4).map(c => (c, (h >>> (c * 16)) & 0xFFFFL)).toSet
    val expect = hashes.keySet.filter(id => id % 5 == 4 &&
      !hashes.exists { case (o, oh) =>
        o < id && chunkSet(oh).intersect(chunkSet(hashes(id))).nonEmpty &&
          java.lang.Long.bitCount(oh ^ hashes(id)) <= 3
      })
    assert(got == expect,
      "the audio wave must dedup through the unmodified image index")
  }

  test("streaming reverse-image search: micro-batched probes serve " +
    "Hamming matches off the persisted index batchId-keyed, equal to " +
    "the batch serve, and a redelivered batch rewrites identically") {
    implicit val sc = spark.sqlContext
    val hashes = Multimodal
      .perceptualHashes(Multimodal.plantedImages(spark, sf0001),
        DispatchMediaKernel)
      .collect().map(p => p.asset_id -> p.phash).toSeq.sortBy(_._1)
    val idx = tmpDir("searchphash-idx")
    Multimodal.writePhashIndex(hashes.toDF("asset_id", "phash"), idx)
    val probes = hashes.filter(_._1 % 8 == 1)
    val out = tmpDir("searchphash-out")
    val ckpt = tmpDir("searchphash-ckpt")
    val in = MemoryStream[(Long, Long)]
    val q = StreamingMultimodal.startSearch(
      in.toDF().toDF("query_id", "phash"), idx, out, ckpt)
    val (p1, p2) = probes.splitAt(probes.length / 2)
    try {
      in.addData(p1: _*); q.processAllAvailable()
      in.addData(p2: _*); q.processAllAvailable()
    } finally q.stop()
    def rows(path: String) = spark.read
      .option("recursiveFileLookup", "true").parquet(path)
      .select($"query_id", $"asset_id", $"hamming")
      .as[(Long, Long, Long)].collect().toSet
    val streamed = rows(out)
    val oneShot = Multimodal.phashSearch(spark, idx,
        probes.toDF("query_id", "phash"))
      .as[(Long, Long, Long)].collect().toSet
    assert(streamed == oneShot,
      "streamed matches must equal the one-shot batch serve")
    assert(streamed.nonEmpty && streamed.exists(r => r._3 == 0L),
      "probes indexed themselves must self-match at Hamming 0")
    // redelivery of batch 0 overwrites its dir with identical content
    StreamingMultimodal.publishSearchBatch(
      p1.toDF("query_id", "phash"), 0L, idx, out)
    assert(rows(out) == streamed,
      "a replayed search batch must be byte-idempotent")
  }

  test("the COMPRESSED container is transparent to the machine: the " +
    "planted FLAC corpus fingerprints asset-for-asset identically to " +
    "the WAV corpus (lossless decode), so every index/serve built on " +
    "one container answers for the other") {
    val wav = Multimodal.audioFingerprints(
      Multimodal.plantedAudio(spark, sf0001), DispatchMediaKernel)
      .collect().map(p => p.asset_id -> p.phash).toMap
    val fl = Multimodal.audioFingerprints(
      Multimodal.plantedFlacAudio(spark, sf0001), DispatchMediaKernel)
      .collect().map(p => p.asset_id -> p.phash).toMap
    assert(fl == wav,
      "FLAC fingerprints must equal the WAV corpus's bit-for-bit")
  }
}

