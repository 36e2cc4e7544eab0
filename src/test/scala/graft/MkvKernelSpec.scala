package graft

import graft.operators.Multimodal
import graft.media.{Asset, DispatchMediaKernel, MkvMediaKernel, StubMediaKernel}

/** The Matroska/WebM EBML-walk kernel: vint id/size parsing, the
  * Info/Tracks/Cluster element tree, spec defaults (TimestampScale
  * 1 ms, audio 8000 Hz mono), the unknown-size Segment convention,
  * metering statistics, the cluster-size envelope, the element
  * sampler, and the dispatch contract. Every fixture is hand-built
  * byte by byte, so the expected values are hand-computed, not
  * round-tripped.
  */
class MkvKernelSpec extends SparkSpec {

  // ---- hand EBML encoder (test-only) ----

  /** Vint-encode a SIZE in the fewest bytes (marker bit in the first
    * byte). Small fixture sizes only.
    */
  private def vsize(n: Int): Array[Byte] =
    if (n < 0x7f) Array((0x80 | n).toByte) // 0x7f itself would be all-ones
    else if (n < 0x3fff) Array((0x40 | (n >> 8)).toByte, n.toByte)
    else Array((0x20 | (n >> 16)).toByte, (n >> 8).toByte, n.toByte)

  private def idBytes(id: Long): Array[Byte] = {
    val n = if (id <= 0xff) 1 else if (id <= 0xffff) 2
      else if (id <= 0xffffff) 3 else 4
    Array.tabulate(n)(k => (id >> (8 * (n - 1 - k))).toByte)
  }

  private def el(id: Long, payload: Array[Byte]): Array[Byte] =
    idBytes(id) ++ vsize(payload.length) ++ payload

  private def uintEl(id: Long, v: Long, width: Int): Array[Byte] =
    el(id, Array.tabulate(width)(k => (v >> (8 * (width - 1 - k))).toByte))

  private def floatEl(id: Long, v: Float): Array[Byte] = {
    val bits = java.lang.Float.floatToIntBits(v)
    el(id, Array.tabulate(4)(k => (bits >> (8 * (3 - k))).toByte))
  }

  private val ebmlHeader = el(0x1A45DFA3L, Array.fill(5)(0x42.toByte))

  private def videoTrack(w: Int, h: Int): Array[Byte] =
    el(0xAEL, uintEl(0x83L, 1, 1) ++
      el(0xE0L, uintEl(0xB0L, w, 2) ++ uintEl(0xBAL, h, 2)))

  private def audioTrack(freq: Float, channels: Int): Array[Byte] =
    el(0xAEL, uintEl(0x83L, 2, 1) ++
      el(0xE1L, floatEl(0xB5L, freq) ++ uintEl(0x9FL, channels, 1)))

  private def segment(children: Array[Byte]): Array[Byte] =
    el(0x18538067L, children)

  private def asset(id: Long, bytes: Array[Byte]) =
    Asset(id, "video/webm", bytes.length.toLong, bytes)

  test("element-tree metering: hand-computed duration, track layout, " +
    "cluster count and byte fraction — all from the EBML walk, no " +
    "codec decode") {
    // TimestampScale 1e6 ns (explicit) × Duration 2500 ticks = 2.5 s
    val info = el(0x1549A966L,
      uintEl(0x2AD7B1L, 1000000L, 3) ++ floatEl(0x4489L, 2500f))
    val tracks = el(0x1654AE6BL,
      videoTrack(640, 360) ++ audioTrack(48000f, 2))
    val clusters = el(0x1F43B675L, Array.fill(40)(0x11.toByte)) ++
      el(0x1F43B675L, Array.fill(24)(0x22.toByte))
    val bytes = ebmlHeader ++ segment(info ++ tracks ++ clusters)
    val f = MkvMediaKernel.decodeBatch(Seq(asset(1L, bytes))).head
    assert(f.width == 640 && f.height == 360,
      "width/height carry the first video track's dimensions")
    assert(f.features(0) == 2.5f, s"duration ${f.features(0)}")
    assert(f.features(1) == 2f && f.features(2) == 1f &&
      f.features(3) == 1f, "one video + one audio track")
    assert(f.features(4) == 2f, "two clusters")
    // cluster spans: (4-byte id + 1-byte size + payload) each
    val clusterBytes = (5 + 40) + (5 + 24)
    assert(f.features(5) == (clusterBytes.toDouble / bytes.length).toFloat,
      "cluster byte fraction")
    assert(f.features(6) == 48000f && f.features(7) == 2f,
      "audio sampling rate and channels")
  }

  test("spec defaults: a missing TimestampScale means 1 ms ticks, a " +
    "missing Audio element means 8000 Hz mono, and an audio-only " +
    "container reports 0x0 dimensions") {
    val info = el(0x1549A966L, floatEl(0x4489L, 1500f)) // 1.5 s at default
    val bareAudio = el(0xAEL, uintEl(0x83L, 2, 1)) // no Audio element
    val tracks = el(0x1654AE6BL, bareAudio)
    val bytes = ebmlHeader ++ segment(info ++ tracks)
    val f = MkvMediaKernel.decodeBatch(Seq(asset(2L, bytes))).head
    assert(f.width == 0 && f.height == 0, "no video track")
    assert(f.features(0) == 1.5f, "default TimestampScale is 1e6 ns")
    assert(f.features(6) == 8000f && f.features(7) == 1f,
      "spec-default audio parameters")
    assert(f.features(4) == 0f && f.features(5) == 0f, "no clusters")
  }

  test("unknown-size Segment (the live-muxing convention) extends to " +
    "EOF and parses; an unknown size anywhere else is an opaque blob") {
    val info = el(0x1549A966L, floatEl(0x4489L, 1000f))
    val tracks = el(0x1654AE6BL, videoTrack(16, 16))
    val segPayload = info ++ tracks
    val openSeg = idBytes(0x18538067L) ++
      Array(0xff.toByte) ++ segPayload // size all-ones = unknown
    val bytes = ebmlHeader ++ openSeg
    val f = MkvMediaKernel.decodeBatch(Seq(asset(3L, bytes))).head
    assert(f.width == 16 && f.features(0) == 1.0f,
      "unknown-size segment must parse to EOF")
    // the same all-ones size on Info (a child) must reject the payload
    val openInfo = idBytes(0x1549A966L) ++ Array(0xff.toByte) ++
      floatEl(0x4489L, 1000f)
    val bad = ebmlHeader ++ segment(openInfo ++ tracks)
    assert(MkvMediaKernel.parseMkv(bad).isEmpty,
      "unknown size outside the Segment must not parse")
  }

  test("element sampler: each Segment child (Info, Tracks, Cluster) " +
    "is one sample with its true byte span; the envelope thumbnail " +
    "requantizes cluster spans against the largest") {
    val info = el(0x1549A966L, floatEl(0x4489L, 100f))
    val tracks = el(0x1654AE6BL, videoTrack(8, 8))
    val c1 = el(0x1F43B675L, Array.fill(59)(1.toByte)) // span 64
    val c2 = el(0x1F43B675L, Array.fill(27)(2.toByte)) // span 32
    val bytes = ebmlHeader ++ segment(info ++ tracks ++ c1 ++ c2)
    val a = asset(4L, bytes)
    val all = MkvMediaKernel.frames(a, 1).toSeq
    assert(all.map(_.n_bytes) ==
      Seq(info.length.toLong, tracks.length.toLong, 64L, 32L))
    val segPayloadOff = bytes.length -
      (info.length + tracks.length + 64 + 32)
    val expected = Seq(
      (segPayloadOff, info.length),
      (segPayloadOff + info.length, tracks.length),
      (segPayloadOff + info.length + tracks.length, 64),
      (segPayloadOff + info.length + tracks.length + 64, 32))
      .map { case (off, len) => graft.media.Media.byteHash(
        java.util.Arrays.copyOfRange(bytes, off, off + len)) }
    assert(all.map(_.frame_hash) == expected)
    assert(MkvMediaKernel.frames(a, 2).toSeq.map(_.frame_idx) == Seq(0, 2))
    // envelope: 2 clusters, spans 64 (=> 255) and 32 (=> 32*255/64=127)
    val t = MkvMediaKernel.resizeBatch(Seq(a), 2, 1).head
    assert(t.thumb.toSeq == Seq(255.toByte, 127.toByte))
  }

  test("malformed payloads take the stub arithmetic exactly: missing " +
    "EBML header, no Segment, no Tracks, zero tracks, video without " +
    "dimensions, overrunning element, truncated vint, text") {
    val info = el(0x1549A966L, floatEl(0x4489L, 1000f))
    val tracks = el(0x1654AE6BL, videoTrack(32, 32))
    val good = ebmlHeader ++ segment(info ++ tracks)
    assert(MkvMediaKernel.parseMkv(good).isDefined)
    val noHeader = segment(info ++ tracks)
    val noSegment = ebmlHeader ++ info
    val noTracks = ebmlHeader ++ segment(info)
    val zeroTracks = ebmlHeader ++
      segment(info ++ el(0x1654AE6BL, Array.emptyByteArray))
    val dimless = ebmlHeader ++ segment(info ++
      el(0x1654AE6BL, el(0xAEL, uintEl(0x83L, 1, 1)))) // video, no Video el
    val overrun = ebmlHeader ++ idBytes(0x18538067L) ++
      vsize(1000) ++ info // claims 1000 payload bytes, has fewer
    val truncated = good.dropRight(3)
    val text = "just some document text".getBytes("UTF-8")
    for ((bytes, id) <- Seq(noHeader -> 10L, noSegment -> 11L,
        noTracks -> 12L, zeroTracks -> 13L, dimless -> 14L,
        overrun -> 15L, truncated -> 16L, text -> 17L)) {
      val a = asset(id, bytes)
      assert(MkvMediaKernel.parseMkv(bytes).isEmpty,
        s"payload $id must not parse")
      val viaMkv = MkvMediaKernel.decodeBatch(Seq(a)).head
      val viaStub = StubMediaKernel.decodeBatch(Seq(a)).head
      assert(viaMkv.width == viaStub.width &&
        viaMkv.features.toSeq == viaStub.features.toSeq,
        s"payload $id must take the stub")
      assert(MkvMediaKernel.frames(a, 2).toSeq.map(_.frame_hash) ==
        StubMediaKernel.frames(a, 2).toSeq.map(_.frame_hash))
    }
  }

  test("router: EBML-magic payloads route to the Matroska kernel in " +
    "mixed batches, and a rotten EBML-prefixed payload lands on stub " +
    "values through the dispatcher") {
    val info = el(0x1549A966L, floatEl(0x4489L, 2000f))
    val tracks = el(0x1654AE6BL, videoTrack(320, 240))
    val good = ebmlHeader ++ segment(info ++ tracks)
    val a = asset(20L, good)
    val viaDispatch = DispatchMediaKernel.decodeBatch(Seq(a)).head
    val direct = MkvMediaKernel.decodeBatch(Seq(a)).head
    assert(viaDispatch.width == 320 &&
      viaDispatch.features.toSeq == direct.features.toSeq)
    val text = asset(21L, "plain text payload".getBytes("UTF-8"))
    val mixed = DispatchMediaKernel.decodeBatch(Seq(text, a))
    assert(mixed.head.features.toSeq ==
      StubMediaKernel.decodeBatch(Seq(text)).head.features.toSeq)
    assert(mixed(1).width == 320)
    val rotten = asset(22L,
      Array(0x1a, 0x45, 0xdf, 0xa3).map(_.toByte) ++
        "but not really".getBytes("UTF-8"))
    assert(DispatchMediaKernel.decodeBatch(Seq(rotten)).head
      .features.toSeq ==
      StubMediaKernel.decodeBatch(Seq(rotten)).head.features.toSeq)
  }
}
