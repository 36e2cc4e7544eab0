package graft

import graft.operators.Multimodal
import graft.media.{Asset, DispatchMediaKernel, Mp3MediaKernel, StubMediaKernel}

/** The MP3 frame-header kernel: ID3v2 skip, MPEG-1 Layer III frame
  * walk (header-derived lengths — 144·bitrate/samplerate + padding),
  * metering statistics, bitrate-envelope thumbnails, the frame
  * sampler, and the dispatch contract (malformed payloads to the
  * stub). Every fixture is hand-built byte by byte, so the expected
  * values are hand-computed, not round-tripped.
  */
class Mp3KernelSpec extends SparkSpec {

  /** One MPEG-1 Layer III frame: bitrateIdx/sampleRateIdx/padding/mono
    * as given, body filled with a deterministic byte pattern. The
    * header-derived length is 144·kbps·1000/rate + pad.
    */
  private def frame(bitrateIdx: Int, srIdx: Int, pad: Boolean,
      mono: Boolean, fill: Int): Array[Byte] = {
    val kbps = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192,
      224, 256, 320)(bitrateIdx)
    val rate = Array(44100, 48000, 32000)(srIdx)
    val len = 144 * kbps * 1000 / rate + (if (pad) 1 else 0)
    val b = new Array[Byte](len)
    b(0) = 0xff.toByte
    b(1) = 0xfb.toByte // sync + MPEG-1 + Layer III + no CRC
    b(2) = ((bitrateIdx << 4) | (srIdx << 2) |
      (if (pad) 2 else 0)).toByte
    b(3) = (if (mono) 0xc0 else 0x40).toByte
    for (i <- 4 until len) b(i) = ((fill + i) % 251).toByte
    b
  }

  /** ID3v2.3 tag of `padLen` content bytes (syncsafe size). */
  private def id3v2(padLen: Int): Array[Byte] =
    Array[Byte]('I', 'D', '3', 3, 0, 0,
      ((padLen >> 21) & 0x7f).toByte, ((padLen >> 14) & 0x7f).toByte,
      ((padLen >> 7) & 0x7f).toByte, (padLen & 0x7f).toByte) ++
      Array.fill(padLen)(0x55.toByte)

  private def asset(id: Long, bytes: Array[Byte]) =
    Asset(id, "audio/mpeg", bytes.length.toLong, bytes)

  test("CBR mono stream: hand-computed duration, frame count, bitrate " +
    "stats, channel layout — all from headers, no entropy decode") {
    // 10 frames, 32 kbps @ 32000 Hz mono: each exactly 144 bytes
    val bytes = (0 until 10).toArray
      .flatMap(k => frame(1, 2, pad = false, mono = true, fill = k))
    assert(bytes.length == 1440)
    val f = Mp3MediaKernel.decodeBatch(Seq(asset(1L, bytes))).head
    assert(f.width == 32000 && f.height == 1,
      "width/height carry sample rate and channels")
    // duration: 10 frames x 1152 samples / 32000 Hz = 0.36 s
    assert(f.features(0) == 0.36f, s"duration ${f.features(0)}")
    assert(f.features(1) == 10f, "frame count")
    assert(f.features(2) == 32f && f.features(3) == 32f &&
      f.features(4) == 32f, "CBR: mean=min=max=32 kbps")
    assert(f.features(5) == 0f, "CBR: VBR flag clear")
    assert(f.features(6) == 0f, "no padded frames")
    assert(f.features(7) == 144f, "mean frame length")
  }

  test("VBR + padding + ID3v2 skip + trailing ID3v1: the walk honors " +
    "the syncsafe tag size, per-frame lengths, and the 128-byte TAG") {
    // 48 kbps @ 32000 = 216 bytes; padded 32 kbps = 145 bytes
    val body = frame(1, 2, pad = false, mono = false, fill = 0) ++
      frame(3, 2, pad = false, mono = false, fill = 1) ++
      frame(1, 2, pad = true, mono = false, fill = 2)
    val id3v1 = Array[Byte]('T', 'A', 'G') ++ Array.fill(125)(0x20.toByte)
    val bytes = id3v2(20) ++ body ++ id3v1
    val f = Mp3MediaKernel.decodeBatch(Seq(asset(2L, bytes))).head
    assert(f.width == 32000 && f.height == 2, "joint stereo = 2 channels")
    assert(f.features(1) == 3f, "three frames")
    assert(f.features(2) == (32f + 48f + 32f) / 3, "mean kbps")
    assert(f.features(3) == 32f && f.features(4) == 48f)
    assert(f.features(5) == 1f, "VBR flag set")
    assert(math.abs(f.features(6) - 1.0 / 3) < 1e-7, "one padded of three")
    assert(math.abs(f.features(7) - (144 + 216 + 145) / 3.0) < 1e-4,
      "mean frame length")
  }

  test("frame sampler: every physical frame is one sample with its " +
    "true byte span and hash; every-2nd keeps frames 0 and 2") {
    val f0 = frame(1, 2, pad = false, mono = true, fill = 0)
    val f1 = frame(3, 2, pad = false, mono = true, fill = 1)
    val f2 = frame(1, 2, pad = true, mono = true, fill = 2)
    val a = asset(3L, f0 ++ f1 ++ f2)
    val all = Mp3MediaKernel.frames(a, 1).toSeq
    assert(all.map(_.n_bytes) == Seq(144L, 216L, 145L))
    assert(all.map(_.frame_hash) == Seq(f0, f1, f2).map(graft.media.Media.byteHash))
    val sampled = Mp3MediaKernel.frames(a, 2).toSeq
    assert(sampled.map(_.frame_idx) == Seq(0, 2))
  }

  test("bitrate-envelope thumbnail: integer requantization against the " +
    "320 kbps ceiling, nearest-neighbor along frames") {
    val a = asset(4L,
      frame(1, 2, pad = false, mono = true, fill = 0) ++
        frame(14, 2, pad = false, mono = true, fill = 1)) // 32 then 320
    val r = Mp3MediaKernel.resizeBatch(Seq(a), 4, 1).head
    assert(r.width == 4 && r.height == 1)
    val expect32 = (32 * 255 / 320).toByte
    val expect320 = (320 * 255 / 320).toByte
    assert(r.thumb.toSeq == Seq(expect32, expect32, expect320, expect320),
      s"got ${r.thumb.toSeq}")
  }

  test("malformed payloads take the stub arithmetic exactly: free " +
    "bitrate, reserved sample rate, overrunning frame, mid-stream " +
    "rate switch, trailing garbage, text") {
    val good = frame(1, 2, pad = false, mono = true, fill = 0)
    val freeBitrate = good.clone()
    freeBitrate(2) = 0x08.toByte // bitrate idx 0 (free format)
    val reservedRate = good.clone()
    reservedRate(2) = (0x10 | 0x0c).toByte // sample-rate idx 3
    val truncated = good.take(100) // frame overruns the payload
    // rate switch mid-stream: 32000 Hz then 44100 Hz
    val rateSwitch = good ++ frame(1, 0, pad = false, mono = true, fill = 1)
    val garbage = good ++ Array.fill(7)(0x00.toByte) // not an ID3v1 tag
    val text = "just some document text".getBytes("UTF-8")
    for ((bytes, id) <- Seq(freeBitrate -> 10L, reservedRate -> 11L,
        truncated -> 12L, rateSwitch -> 13L, garbage -> 14L,
        text -> 15L)) {
      val a = asset(id, bytes)
      assert(Mp3MediaKernel.parseMp3(bytes).isEmpty,
        s"payload $id must not parse")
      val viaMp3 = Mp3MediaKernel.decodeBatch(Seq(a)).head
      val viaStub = StubMediaKernel.decodeBatch(Seq(a)).head
      assert(viaMp3.width == viaStub.width &&
        viaMp3.features.toSeq == viaStub.features.toSeq,
        s"payload $id must take the stub")
      assert(Mp3MediaKernel.frames(a, 2).toSeq.map(_.frame_hash) ==
        StubMediaKernel.frames(a, 2).toSeq.map(_.frame_hash))
    }
  }

  test("router: ID3v2-tagged and raw MP3 streams route to the MP3 " +
    "kernel, text stays on the stub, and a malformed ID3-prefixed " +
    "payload still lands on stub values through the dispatcher") {
    val raw = (0 until 4).toArray
      .flatMap(k => frame(1, 2, pad = false, mono = true, fill = k))
    val tagged = id3v2(12) ++ raw
    for ((bytes, id) <- Seq(raw -> 20L, tagged -> 21L)) {
      val a = asset(id, bytes)
      val viaDispatch = DispatchMediaKernel.decodeBatch(Seq(a)).head
      val direct = Mp3MediaKernel.decodeBatch(Seq(a)).head
      assert(viaDispatch.width == 32000 &&
        viaDispatch.features.toSeq == direct.features.toSeq,
        s"payload $id must route to the MP3 kernel")
    }
    // a batch mixing text and MP3 keeps per-payload routing AND order
    val text = asset(22L, "plain text payload".getBytes("UTF-8"))
    val mixed = DispatchMediaKernel.decodeBatch(Seq(text, asset(23L, raw)))
    assert(mixed.head.features.toSeq ==
      StubMediaKernel.decodeBatch(Seq(text)).head.features.toSeq)
    assert(mixed(1).width == 32000)
    // ID3 prefix but a rotten stream: routed to MP3, served by stub
    val rotten = asset(24L, id3v2(4) ++ "not frames".getBytes("UTF-8"))
    assert(DispatchMediaKernel.decodeBatch(Seq(rotten)).head
      .features.toSeq ==
      StubMediaKernel.decodeBatch(Seq(rotten)).head.features.toSeq)
  }
}
