package graft

import graft.operators.Multimodal
import graft.media.{Asset, DispatchMediaKernel, FlacMediaKernel, StubMediaKernel}

/** The FLAC metadata-walk kernel: magic + block-chain parse, the
  * packed STREAMINFO layout (20-bit sample rate, 3-bit channels,
  * 5-bit bps, 36-bit total samples), metering statistics, the
  * coded-byte envelope thumbnail, the block/chunk frame sampler, and
  * the dispatch contract. Every fixture is hand-built byte by byte,
  * so the expected values are hand-computed, not round-tripped.
  */
class FlacKernelSpec extends SparkSpec {

  /** STREAMINFO payload (34 bytes): the packed layout of RFC 9639
    * §8.2, MD5 zeroed (the kernel never reads it).
    */
  private def streaminfo(minBlock: Int, maxBlock: Int, rate: Int,
      channels: Int, bps: Int, totalSamples: Long): Array[Byte] = {
    val s = new Array[Byte](34)
    s(0) = (minBlock >> 8).toByte; s(1) = minBlock.toByte
    s(2) = (maxBlock >> 8).toByte; s(3) = maxBlock.toByte
    // min/max frame size (u24 each, bytes 4..9): zero = unknown
    s(10) = (rate >> 12).toByte
    s(11) = (rate >> 4).toByte
    s(12) = (((rate & 0xf) << 4) | ((channels - 1) << 1) |
      ((bps - 1) >> 4)).toByte
    s(13) = ((((bps - 1) & 0xf) << 4) | ((totalSamples >> 32) & 0xf)).toByte
    s(14) = (totalSamples >> 24).toByte; s(15) = (totalSamples >> 16).toByte
    s(16) = (totalSamples >> 8).toByte; s(17) = totalSamples.toByte
    s
  }

  /** One metadata block: type + last flag header, u24 length, payload. */
  private def block(typ: Int, last: Boolean,
      payload: Array[Byte]): Array[Byte] =
    Array(((if (last) 0x80 else 0) | typ).toByte,
      (payload.length >> 16).toByte, (payload.length >> 8).toByte,
      payload.length.toByte) ++ payload

  private def flac(blocks: Array[Byte], audio: Array[Byte]): Array[Byte] =
    "fLaC".getBytes("US-ASCII") ++ blocks ++ audio

  private def asset(id: Long, bytes: Array[Byte]) =
    Asset(id, "audio/flac", bytes.length.toLong, bytes)

  test("STREAMINFO metering: hand-computed duration, samples, bit " +
    "depth, block count, audio fraction and compression ratio — all " +
    "from the metadata chain, no entropy decode") {
    // 44100 Hz stereo 16-bit, 88200 samples = exactly 2 s;
    // PCM bytes = 88200 * 2 * 16/8 = 352800
    val si = streaminfo(4096, 4096, 44100, 2, 16, 88200L)
    val audio = Array.tabulate(706)(i => ((i * 7) % 251).toByte)
    val bytes = flac(
      block(0, last = false, si) ++
        block(4, last = false, Array.fill(10)(0x41.toByte)) ++ // VORBIS_COMMENT
        block(1, last = true, Array.fill(6)(0.toByte)), // PADDING
      audio)
    val f = FlacMediaKernel.decodeBatch(Seq(asset(1L, bytes))).head
    assert(f.width == 44100 && f.height == 2,
      "width/height carry sample rate and channels")
    assert(f.features(0) == 2.0f, s"duration ${f.features(0)}")
    assert(f.features(1) == 88200f, "total samples")
    assert(f.features(2) == 16f, "bits per sample")
    assert(f.features(3) == 3f, "three metadata blocks")
    assert(f.features(4) == (706.0 / bytes.length).toFloat,
      "audio byte fraction")
    assert(f.features(5) == 4096f && f.features(6) == 4096f)
    assert(f.features(7) == (706.0 / 352800).toFloat,
      "compression ratio = coded bytes / PCM bytes")
  }

  test("packed-field extremes: a 20-bit sample rate, 8 channels, " +
    "32-bit depth and a >32-bit total-sample count unpack exactly") {
    // 655350 Hz is the largest representable rate; 0x5_0000_0001
    // samples exercises the 36-bit split across bytes 13/14
    val si = streaminfo(16, 65535, 655350, 8, 32, 0x500000001L)
    val bytes = flac(block(0, last = true, si), Array.fill(9)(1.toByte))
    val f = FlacMediaKernel.decodeBatch(Seq(asset(2L, bytes))).head
    assert(f.width == 655350 && f.height == 8)
    assert(f.features(2) == 32f, "bps")
    assert(f.features(1) == 0x500000001L.toFloat, "36-bit sample count")
    assert(f.features(5) == 16f && f.features(6) == 65535f)
  }

  test("frame sampler: each metadata block is one sample with its " +
    "true span (header included), then the audio region chunks at " +
    "FrameBytes; every-th filtering applies to the combined stream") {
    val si = streaminfo(256, 256, 8000, 1, 8, 8000L)
    val pad = Array.fill(5)(0.toByte)
    val audio = Array.tabulate(150)(i => (i % 113).toByte)
    val bytes = flac(
      block(0, last = false, si) ++ block(1, last = true, pad), audio)
    val all = FlacMediaKernel.frames(asset(3L, bytes), 1).toSeq
    // blocks: 4+34 and 4+5; audio: 64, 64, 22 (FrameBytes = 64)
    assert(all.map(_.n_bytes) == Seq(38L, 9L, 64L, 64L, 22L))
    assert(all.map(_.frame_idx) == Seq(0, 1, 2, 3, 4))
    // spans are the real bytes: re-hash the expected slices
    val expected = Seq((4, 38), (42, 9), (51, 64), (115, 64), (179, 22))
      .map { case (off, len) => graft.media.Media.byteHash(
        java.util.Arrays.copyOfRange(bytes, off, off + len)) }
    assert(all.map(_.frame_hash) == expected)
    val every2 = FlacMediaKernel.frames(asset(3L, bytes), 2).toSeq
    assert(every2.map(_.frame_idx) == Seq(0, 2, 4))
  }

  test("coded-byte envelope thumbnail: nearest-neighbor over the " +
    "audio region's raw bytes; a metadata-only stream falls back to " +
    "the stub") {
    val si = streaminfo(256, 256, 8000, 1, 8, 100L)
    val audio = Array.tabulate(100)(i => i.toByte)
    val bytes = flac(block(0, last = true, si), audio)
    val t = FlacMediaKernel.resizeBatch(Seq(asset(4L, bytes)), 5, 2).head
    // 10 cells over 100 bytes: cell i samples byte i*10
    assert(t.thumb.toSeq == (0 until 10).map(i => (i * 10).toByte))
    val empty = flac(block(0, last = true, si), Array.emptyByteArray)
    val viaFlac = FlacMediaKernel.resizeBatch(Seq(asset(5L, empty)), 4, 4).head
    val viaStub = StubMediaKernel.resizeBatch(Seq(asset(5L, empty)), 4, 4).head
    assert(viaFlac.thumb.toSeq == viaStub.thumb.toSeq)
  }

  test("malformed payloads take the stub arithmetic exactly: bad " +
    "magic, truncated STREAMINFO, wrong first block, overrunning " +
    "block, zero sample rate, duplicate STREAMINFO, no last flag, text") {
    val si = streaminfo(256, 256, 8000, 1, 8, 100L)
    val good = flac(block(0, last = true, si), Array.fill(10)(3.toByte))
    assert(FlacMediaKernel.parseFlac(good).isDefined)
    val badMagic = good.clone(); badMagic(0) = 'g'.toByte
    val shortSi = flac(block(0, last = true, si.take(20)), Array.emptyByteArray)
    val wrongFirst = flac(
      block(1, last = false, Array.fill(4)(0.toByte)) ++
        block(0, last = true, si), Array.emptyByteArray)
    val overrun = flac(
      Array[Byte](0x80.toByte, 0, 1, 0) ++ Array.fill(34)(0.toByte), // claims 256
      Array.emptyByteArray)
    val zeroRate = flac(
      block(0, last = true, streaminfo(256, 256, 0, 1, 8, 0L)),
      Array.fill(5)(0.toByte))
    val dupSi = flac(
      block(0, last = false, si) ++ block(0, last = true, si),
      Array.emptyByteArray)
    val noLast = flac(block(0, last = false, si), Array.emptyByteArray)
    val text = "just some document text".getBytes("UTF-8")
    for ((bytes, id) <- Seq(badMagic -> 10L, shortSi -> 11L,
        wrongFirst -> 12L, overrun -> 13L, zeroRate -> 14L,
        dupSi -> 15L, noLast -> 16L, text -> 17L)) {
      val a = asset(id, bytes)
      assert(FlacMediaKernel.parseFlac(bytes).isEmpty,
        s"payload $id must not parse")
      val viaFlac = FlacMediaKernel.decodeBatch(Seq(a)).head
      val viaStub = StubMediaKernel.decodeBatch(Seq(a)).head
      assert(viaFlac.width == viaStub.width &&
        viaFlac.features.toSeq == viaStub.features.toSeq,
        s"payload $id must take the stub")
      assert(FlacMediaKernel.frames(a, 2).toSeq.map(_.frame_hash) ==
        StubMediaKernel.frames(a, 2).toSeq.map(_.frame_hash))
    }
  }

  test("router: fLaC payloads route to the FLAC kernel in mixed " +
    "batches, and a rotten fLaC-prefixed payload lands on stub values " +
    "through the dispatcher") {
    val si = streaminfo(1024, 1024, 22050, 1, 16, 44100L)
    val good = flac(block(0, last = true, si),
      Array.tabulate(55)(i => (i * 3).toByte))
    val a = asset(20L, good)
    val viaDispatch = DispatchMediaKernel.decodeBatch(Seq(a)).head
    val direct = FlacMediaKernel.decodeBatch(Seq(a)).head
    assert(viaDispatch.width == 22050 &&
      viaDispatch.features.toSeq == direct.features.toSeq)
    // mixed batch keeps per-payload routing AND order
    val text = asset(21L, "plain text payload".getBytes("UTF-8"))
    val mixed = DispatchMediaKernel.decodeBatch(Seq(text, a))
    assert(mixed.head.features.toSeq ==
      StubMediaKernel.decodeBatch(Seq(text)).head.features.toSeq)
    assert(mixed(1).width == 22050)
    val rotten = asset(22L, "fLaC but not really".getBytes("UTF-8"))
    assert(DispatchMediaKernel.decodeBatch(Seq(rotten)).head
      .features.toSeq ==
      StubMediaKernel.decodeBatch(Seq(rotten)).head.features.toSeq)
    // gate byte-identity under the dispatch kernel is pinned once, in
    // WavKernelSpec — no FLAC payloads exist in the asset tables, so
    // the router addition cannot perturb it
  }

  // -------------------------------------------------------------------
  // The lossless decode tier: encode→decode roundtrips across every
  // subframe type / stereo mode / residual form, tamper refusal, and
  // the cross-container fingerprint identity the dedup gate rides on.
  // -------------------------------------------------------------------

  private def pcm(n: Int, seed: Long, scale: Int): Array[Int] =
    Array.tabulate(n)(t =>
      (((seed * (t + 7L) + t.toLong * t * 97L) % 1000000007L)
        % (2L * scale)).toInt - scale)

  import FlacMediaKernel.{FlacEncOpts, decodePcm, encodeFlac}

  test("roundtrip: mono 8-bit fixed-predictor/Rice encode decodes to " +
    "the exact samples, including a short last frame, and the " +
    "STREAMINFO fields survive") {
    val s = pcm(130, 99L, 128)
    val enc = encodeFlac(Array(s), 8000, 8, FlacEncOpts(blockSize = 26))
    val Some((info, out)) = decodePcm(enc)
    assert(info.sampleRate == 8000 && info.channels == 1 &&
      info.bitsPerSample == 8 && info.totalSamples == 130L)
    assert(out.toSeq == s.toSeq)
    // short last frame: 130 = 4×31 + 6 with blockSize 31
    val enc2 = encodeFlac(Array(s), 8000, 8, FlacEncOpts(blockSize = 31))
    assert(decodePcm(enc2).get._2.toSeq == s.toSeq)
  }

  test("roundtrip: every subframe type — constant (auto-detected), " +
    "verbatim, fixed, LPC, and the escape residual form — decodes " +
    "bit-exactly") {
    val flat = Array.fill(64)(-37)
    assert(decodePcm(encodeFlac(Array(flat), 8000, 8))
      .get._2.toSeq == flat.toSeq)
    val s = pcm(96, 7L, 120)
    for (opts <- Seq(
        FlacEncOpts(mode = "verbatim"),
        FlacEncOpts(mode = "lpc"),
        FlacEncOpts(forceEscape = true),
        FlacEncOpts(mode = "lpc", forceEscape = true))) {
      assert(decodePcm(encodeFlac(Array(s), 8000, 8, opts))
        .get._2.toSeq == s.toSeq, s"mode=${opts.mode} esc=${opts.forceEscape}")
    }
    // wasted bits: samples with 2 trailing zero bits declared as such —
    // the subframe codes s >> 2 and the decoder must shift back
    val sw = pcm(96, 13L, 8000).map(_ & ~3) // 2 trailing zeros, 16-bit range
    assert(decodePcm(encodeFlac(Array(sw), 8000, 16,
      FlacEncOpts(wasted = 2))).get._2.toSeq == sw.toSeq)
  }

  test("roundtrip: 16-bit stereo through all four channel layouts — " +
    "independent, left/side, right/side, mid/side — recovers both " +
    "channels exactly") {
    val l = pcm(90, 3L, 30000)
    val r = pcm(90, 11L, 30000)
    for (st <- Seq("indep", "ls", "rs", "ms")) {
      val Some((info, out)) =
        decodePcm(encodeFlac(Array(l, r), 44100, 16,
          FlacEncOpts(blockSize = 30, stereo = st)))
      assert(info.channels == 2, st)
      val dl = Array.tabulate(90)(i => out(2 * i))
      val dr = Array.tabulate(90)(i => out(2 * i + 1))
      assert(dl.toSeq == l.toSeq && dr.toSeq == r.toSeq, st)
    }
  }

  test("tamper refusal: a flipped bit in the coded audio region, a " +
    "corrupted frame-header byte, and a corrupted STREAMINFO MD5 all " +
    "decode to None — never to wrong samples") {
    val s = pcm(130, 42L, 128)
    val enc = encodeFlac(Array(s), 8000, 8)
    assert(decodePcm(enc).isDefined)
    val audioOff = 4 + 4 + 34 // magic + block header + STREAMINFO
    // flip a residual bit mid-frame (CRC-16 must catch it)
    val t1 = enc.clone(); t1(enc.length - 10) = (t1(enc.length - 10) ^ 0x10).toByte
    assert(decodePcm(t1).isEmpty)
    // corrupt the first frame header's blocksize-1 byte (CRC-8 catches)
    val t2 = enc.clone(); t2(audioOff + 5) = (t2(audioOff + 5) ^ 0x01).toByte
    assert(decodePcm(t2).isEmpty)
    // corrupt the signed MD5 (frames decode fine; the signature gate refuses)
    val t3 = enc.clone(); t3(4 + 4 + 18) = (t3(4 + 4 + 18) ^ 0x01).toByte
    assert(decodePcm(t3).isEmpty)
  }

  test("cross-container fingerprint identity: a WAV and a FLAC of the " +
    "same PCM produce the SAME envelope and the same 64-bit " +
    "fingerprint through the dispatch kernel — the invariant that " +
    "lets one oracle gate both dedup containers") {
    val n = 130
    val bytesPcm = pcm(n, 5L, 128)
    val wav = {
      val out = java.nio.ByteBuffer.allocate(44 + n)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put("RIFF".getBytes("US-ASCII")).putInt(36 + n)
        .put("WAVE".getBytes("US-ASCII"))
      out.put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(1).putInt(8000).putInt(8000)
        .putShort(1).putShort(8)
      out.put("data".getBytes("US-ASCII")).putInt(n)
      bytesPcm.foreach(v => out.put((v + 128).toByte))
      Asset(1L, "audio/wav", (44 + n).toLong, out.array())
    }
    val fl = {
      val b = encodeFlac(Array(bytesPcm), 8000, 8)
      Asset(2L, "audio/flac", b.length.toLong, b)
    }
    val envW = DispatchMediaKernel.audioEnvelope(wav, 65)
    val envF = DispatchMediaKernel.audioEnvelope(fl, 65)
    assert(envW.isDefined && envF.isDefined)
    assert(envW.get.toSeq == envF.get.toSeq)
  }
}
