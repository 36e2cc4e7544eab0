package graft

import graft.operators.Multimodal
import graft.media.{Asset, PpmMediaKernel, StubMediaKernel}

/** The pure-JVM PPM (P6) media kernel: REAL pixel decode through the
  * MediaKernel SPI — hand-computed channel statistics, nearest-neighbor
  * resampling, row sampling — plus the dispatch contract: non-P6
  * payloads take the stub arithmetic, so the oracle-gated multimodal
  * queries stay byte-identical with this kernel ACTIVE (the proof the
  * SPI carries a non-stub implementation without breaking the gates).
  */
class PpmKernelSpec extends SparkSpec {
  import spark.implicits._

  private def p6(w: Int, h: Int, maxval: Int,
      pixels: Seq[(Int, Int, Int)], comment: String = ""): Array[Byte] = {
    val c = if (comment.isEmpty) "" else s"# $comment\n"
    s"P6\n$c$w $h\n$maxval\n".getBytes("US-ASCII") ++
      pixels.flatMap { case (r, g, b) =>
        Seq(r.toByte, g.toByte, b.toByte) }
  }

  private def asset(id: Long, bytes: Array[Byte]) =
    Asset(id, "image/x-portable-pixmap", bytes.length.toLong, bytes)

  test("P6 decode: width/height from the header, channel means/maxes " +
    "and bright fraction from the actual pixels") {
    val img = p6(2, 2, 255,
      Seq((255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 255)))
    val f = PpmMediaKernel.decodeBatch(Seq(asset(1L, img))).head
    assert(f.width == 2 && f.height == 2)
    // sums per channel are 510/1020 = 0.5; every channel peaks at 255;
    // only the white pixel clears luma > maxval/2 -> 1/4
    assert(f.features.toSeq == Seq(0.5f, 0.5f, 0.5f, 0.5f,
      1.0f, 1.0f, 1.0f, 0.25f), f.features.toSeq.toString)
  }

  test("P6 header: comments and a non-255 maxval parse; statistics " +
    "normalize by the declared maxval") {
    val img = p6(1, 1, 100, Seq((100, 0, 50)), comment = "made by hand")
    val f = PpmMediaKernel.decodeBatch(Seq(asset(2L, img))).head
    assert(f.width == 1 && f.height == 1)
    // luma 150 is exactly 3*maxval/2 boundary: 2*150 > 3*100 is false
    assert(f.features.toSeq == Seq(1.0f, 0.0f, 0.5f, 0.5f,
      1.0f, 0.0f, 0.5f, 0.0f), f.features.toSeq.toString)
  }

  test("P6 resize: nearest-neighbor luma thumbnail samples the exact " +
    "source pixels") {
    // 4x4 gray ramp: pixel (y, x) has r=g=b = (y*4+x)*16
    val img = p6(4, 4, 255,
      (0 until 16).map { i => val v = i * 16; (v, v, v) })
    val t = PpmMediaKernel.resizeBatch(Seq(asset(3L, img)), 2, 2).head
    assert(t.width == 2 && t.height == 2)
    // targets map to source pixels (0,0), (0,2), (2,0), (2,2)
    assert(t.thumb.map(_ & 0xff).toSeq == Seq(0, 32, 128, 160))
  }

  test("P6 frames: every-other pixel ROW becomes one sample with the " +
    "portable row hash") {
    val rows = Seq(
      Seq((1, 2, 3), (4, 5, 6)),
      Seq((7, 8, 9), (10, 11, 12)),
      Seq((13, 14, 15), (16, 17, 18)))
    val img = p6(2, 3, 255, rows.flatten)
    val fs = PpmMediaKernel.frames(asset(4L, img), 2).toSeq
    assert(fs.map(_.frame_idx) == Seq(0, 2))
    assert(fs.forall(_.n_bytes == 6L))
    val row2 = rows(2).flatMap { case (r, g, b) =>
      Seq(r.toByte, g.toByte, b.toByte) }.toArray
    assert(fs(1).frame_hash == graft.media.Media.byteHash(row2))
  }

  test("dispatch: non-P6 and truncated-P6 payloads take the stub " +
    "arithmetic exactly (mixed corpora keep their gate values)") {
    val text = asset(5L, "just some document text".getBytes("UTF-8"))
    val truncated = asset(6L,
      p6(10, 10, 255, Seq((1, 2, 3)))) // header claims 300 pixel bytes
    for (a <- Seq(text, truncated)) {
      val viaPpm = PpmMediaKernel.decodeBatch(Seq(a)).head
      val viaStub = StubMediaKernel.decodeBatch(Seq(a)).head
      assert(viaPpm.width == viaStub.width &&
        viaPpm.height == viaStub.height &&
        viaPpm.features.toSeq == viaStub.features.toSeq)
      assert(PpmMediaKernel.frames(a, 2).toSeq.map(_.frame_hash) ==
        StubMediaKernel.frames(a, 2).toSeq.map(_.frame_hash))
    }
  }

  test("multimodal gate queries are byte-identical with the PPM kernel " +
    "ACTIVE (text payloads dispatch to the stub), and real P6 assets " +
    "decode for real through the distributed plumbing") {
    def gateRows(name: String) =
      SparkEntry.queries(name)(spark, sf0001).collect().map(_.toString).toSet
    val stubFeatures = gateRows("multimodal_features")
    val stubFrames = gateRows("multimodal_frames")
    Multimodal.setKernel(PpmMediaKernel)
    try {
      assert(gateRows("multimodal_features") == stubFeatures,
        "gate values must not move under the alternate kernel")
      assert(gateRows("multimodal_frames") == stubFrames)
      // and genuine image bytes flow through the SAME Spark plumbing
      // with real decoded statistics
      val img = p6(2, 2, 255,
        Seq((255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 255)))
      val decoded = Multimodal.extractFeatures(
        Seq(asset(9L, img)).toDS()).collect()
      assert(decoded.length == 1)
      assert(decoded.head.width == 2 &&
        decoded.head.features.toSeq.take(4) ==
          Seq(0.5f, 0.5f, 0.5f, 0.5f),
        "the active kernel must really decode P6 through mapPartitions")
    } finally Multimodal.setKernel(StubMediaKernel)
  }
}
