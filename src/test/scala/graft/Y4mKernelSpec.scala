package graft

import graft.operators.Multimodal
import graft.media.{Asset, DispatchMediaKernel, StubMediaKernel, Y4mMediaKernel}

/** The pure-JVM YUV4MPEG2 video kernel: REAL frame decode through the
  * MediaKernel SPI — hand-computed luma/chroma/motion statistics,
  * poster-frame thumbnails, true frame sampling — plus the dispatch
  * contract (malformed payloads take the stub exactly) and the router
  * composing all three real kernels.
  */
class Y4mKernelSpec extends SparkSpec {
  import spark.implicits._

  private def y4m(header: String, frames: Seq[Array[Byte]]): Array[Byte] =
    header.getBytes("US-ASCII") ++
      frames.flatMap(f => "FRAME\n".getBytes("US-ASCII") ++ f)

  private def asset(id: Long, bytes: Array[Byte]) =
    Asset(id, "video/x-yuv4mpeg", bytes.length.toLong, bytes)

  test("mono decode: hand-computed mean/std/motion/cuts/duration/dark " +
    "across all frames, neutral chroma") {
    // 2x2 Cmono at 2 fps: black frame, then two white frames
    val a = asset(1L, y4m("YUV4MPEG2 W2 H2 F2:1 Cmono\n", Seq(
      Array.fill(4)(0.toByte),
      Array.fill(4)(255.toByte),
      Array.fill(4)(255.toByte))))
    val f = Y4mMediaKernel.decodeBatch(Seq(a)).head
    assert(f.width == 2 && f.height == 2)
    assert(f.features.toSeq == Seq(
      (170.0 / 255).toFloat,                  // mean luma 2040/12
      (math.sqrt(14450.0) / 255).toFloat,     // E[y^2]=43350, var=14450
      0.5f,                                   // |dY|: (255*4 + 0)/(4*2)/255
      0.5f,                                   // 1 cut of 2 transitions
      0.5f, 0.5f,                             // mono -> neutral chroma
      1.5f,                                   // 3 frames / 2 fps
      (1.0 / 3).toFloat),                     // 4 of 12 pixels dark
      f.features.toSeq.toString)
  }

  test("C420 defaults: no F and no C in the header mean 25 fps 420jpeg; " +
    "chroma planes decode at quarter size") {
    // 2x2 C420: Y=100 everywhere, U plane=[200], V plane=[50]
    val a = asset(2L, y4m("YUV4MPEG2 W2 H2\n", Seq(
      Array[Byte](100, 100, 100, 100, 200.toByte, 50))))
    val f = Y4mMediaKernel.decodeBatch(Seq(a)).head
    assert(f.width == 2 && f.height == 2)
    assert(f.features.toSeq == Seq(
      (100.0 / 255).toFloat, 0.0f, 0.0f, 0.0f,
      (200.0 / 255).toFloat, (50.0 / 255).toFloat,
      (1.0 / 25).toFloat, 0.0f),
      f.features.toSeq.toString)
  }

  test("resize: poster-frame (FIRST frame) nearest-neighbor luma " +
    "thumbnail; later frames don't leak in") {
    val ramp = Array.tabulate(16)(i => (i * 16).toByte)
    val noise = Array.fill(16)(7.toByte)
    val a = asset(3L, y4m("YUV4MPEG2 W4 H4 F1:1 Cmono\n", Seq(ramp, noise)))
    val t = Y4mMediaKernel.resizeBatch(Seq(a), 2, 2).head
    assert(t.width == 2 && t.height == 2)
    // targets map to source pixels (0,0), (0,2), (2,0), (2,2)
    assert(t.thumb.map(_ & 0xff).toSeq == Seq(0, 32, 128, 160))
  }

  test("frames: every-th REAL video frame with its raw plane bytes " +
    "hashed; frame headers with parameters parse") {
    val fr = (0 until 3).map(k => Array.fill(4)((k * 10 + 1).toByte))
    // middle frame carries a FRAME-header parameter (interlace marker)
    val bytes = "YUV4MPEG2 W2 H2 F2:1 Cmono\n".getBytes("US-ASCII") ++
      ("FRAME\n".getBytes("US-ASCII") ++ fr(0)) ++
      ("FRAME It\n".getBytes("US-ASCII") ++ fr(1)) ++
      ("FRAME\n".getBytes("US-ASCII") ++ fr(2))
    val fs = Y4mMediaKernel.frames(asset(4L, bytes), 2).toSeq
    assert(fs.map(_.frame_idx) == Seq(0, 2))
    assert(fs.forall(_.n_bytes == 4L))
    assert(fs(1).frame_hash == graft.media.Media.byteHash(fr(2)))
  }

  test("dispatch: non-y4m, unknown colorspace, truncated and " +
    "frameless payloads take the stub arithmetic exactly") {
    val text = asset(5L, "just some document text".getBytes("UTF-8"))
    val badCs = asset(6L, y4m("YUV4MPEG2 W2 H2 C410\n",
      Seq(Array.fill(6)(1.toByte))))
    val truncated = asset(7L, y4m("YUV4MPEG2 W2 H2 Cmono\n",
      Seq(Array.fill(3)(1.toByte)))) // frame needs 4 luma bytes
    val frameless = asset(8L, "YUV4MPEG2 W2 H2 Cmono\n".getBytes("US-ASCII"))
    for (a <- Seq(text, badCs, truncated, frameless)) {
      assert(Y4mMediaKernel.parseY4m(a.content).isEmpty)
      val viaY4m = Y4mMediaKernel.decodeBatch(Seq(a)).head
      val viaStub = StubMediaKernel.decodeBatch(Seq(a)).head
      assert(viaY4m.width == viaStub.width &&
        viaY4m.height == viaStub.height &&
        viaY4m.features.toSeq == viaStub.features.toSeq)
      assert(Y4mMediaKernel.frames(a, 2).toSeq.map(_.frame_hash) ==
        StubMediaKernel.frames(a, 2).toSeq.map(_.frame_hash))
    }
  }

  test("the router sends real y4m video through the real kernel via " +
    "the distributed plumbing, alongside the other modalities") {
    Multimodal.setKernel(DispatchMediaKernel)
    try {
      val vid = asset(20L, y4m("YUV4MPEG2 W2 H2 F2:1 Cmono\n", Seq(
        Array.fill(4)(0.toByte), Array.fill(4)(255.toByte),
        Array.fill(4)(255.toByte))))
      val decoded = Multimodal.extractFeatures(Seq(vid).toDS()).collect()
      assert(decoded.length == 1)
      assert(decoded.head.width == 2 &&
        decoded.head.features(6) == 1.5f,
        "y4m payload must reach the video kernel through mapPartitions")
      val sampled = Multimodal.sampleFrames(Seq(vid).toDS(), 2).collect()
      assert(sampled.map(_.frame_idx).sorted.toSeq == Seq(0, 2),
        "frame sampling must see the REAL video frames")
    } finally Multimodal.setKernel(StubMediaKernel)
  }
}
