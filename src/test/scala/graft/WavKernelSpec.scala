package graft

import java.nio.{ByteBuffer, ByteOrder}

import graft.operators.Multimodal
import graft.media.{Asset, DispatchMediaKernel, StubMediaKernel, WavMediaKernel}

/** The pure-JVM RIFF/WAVE PCM kernel: REAL sample decode through the
  * MediaKernel SPI — hand-computed waveform statistics, channel
  * averaging, integer thumbnail quantization, block sampling — plus
  * the dispatch contract (malformed payloads take the stub exactly)
  * and the magic-byte router that composes the PPM and WAV kernels
  * without moving any gate value.
  */
class WavKernelSpec extends SparkSpec {
  import spark.implicits._

  /** Minimal canonical WAV: RIFF → fmt (PCM) → data, little-endian.
    * `samples` is per-frame, per-channel integer values (16-bit signed
    * or 8-bit unsigned per `bits`).
    */
  private def wav(channels: Int, rate: Int, bits: Int,
      samples: Seq[Seq[Int]]): Array[Byte] = {
    val dataLen = samples.length * channels * bits / 8
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")); buf.putInt(36 + dataLen)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")); buf.putInt(16)
    buf.putShort(1); buf.putShort(channels.toShort); buf.putInt(rate)
    buf.putInt(rate * channels * bits / 8)
    buf.putShort((channels * bits / 8).toShort); buf.putShort(bits.toShort)
    buf.put("data".getBytes("US-ASCII")); buf.putInt(dataLen)
    samples.foreach(_.foreach(v =>
      if (bits == 8) buf.put(v.toByte) else buf.putShort(v.toShort)))
    buf.array()
  }

  private def asset(id: Long, bytes: Array[Byte]) =
    Asset(id, "audio/wav", bytes.length.toLong, bytes)

  test("16-bit mono decode: hand-computed mean/|mean|/RMS/peak/ZCR/" +
    "loud/duration/silence, rate and channels in the dim fields") {
    // mono stream 0, +0.5, -0.5, -1.0 at 4 Hz
    val a = asset(1L, wav(1, 4, 16, Seq(Seq(0), Seq(16384), Seq(-16384), Seq(-32768))))
    val f = WavMediaKernel.decodeBatch(Seq(a)).head
    assert(f.width == 4 && f.height == 1) // sampleRate, channels
    assert(f.features.toSeq == Seq(
      -0.25f,                      // mean (DC offset)
      0.5f,                        // mean |x|
      math.sqrt(0.375).toFloat,    // RMS of {0, .25, .25, 1}
      1.0f,                        // peak
      (1.0 / 3).toFloat,           // one sign change over 3 steps
      0.25f,                       // only -1.0 is loud (|x| > 1/2)
      1.0f,                        // 4 frames / 4 Hz
      0.25f),                      // only 0 is near-silent
      f.features.toSeq.toString)
  }

  test("8-bit stereo decode: channels average to mono before the " +
    "statistics") {
    // frames (128,128)->0, (255,1)->0, (192,192)->+0.5, (64,64)->-0.5
    val a = asset(2L, wav(2, 8, 8,
      Seq(Seq(128, 128), Seq(255, 1), Seq(192, 192), Seq(64, 64))))
    val f = WavMediaKernel.decodeBatch(Seq(a)).head
    assert(f.width == 8 && f.height == 2)
    assert(f.features.toSeq == Seq(
      0.0f, 0.25f, math.sqrt(0.125).toFloat, 0.5f,
      (1.0 / 3).toFloat, // F,F,F,T -> one crossing
      0.0f,              // 0.5 is not strictly loud
      0.5f,              // 4 frames / 8 Hz
      0.5f),             // the two cancelled frames are silent
      f.features.toSeq.toString)
  }

  test("resize: nearest-neighbor along time, integer 16-bit -> u8 " +
    "requantization") {
    val a = asset(3L, wav(1, 4, 16,
      Seq(Seq(-32768), Seq(0), Seq(16384), Seq(32512))))
    val t = WavMediaKernel.resizeBatch(Seq(a), 2, 1).head
    assert(t.width == 2 && t.height == 1)
    // targets sample frames 0 and 2: (-32768+32768)>>8, (16384+32768)>>8
    assert(t.thumb.map(_ & 0xff).toSeq == Seq(0, 192))
  }

  test("frames: 256-audio-frame blocks, trailing partial keeps its " +
    "true length, portable hash over the raw block bytes") {
    val bytes = wav(1, 8000, 16, (0 until 600).map(i => Seq(i)))
    val fs = WavMediaKernel.frames(asset(4L, bytes), 2).toSeq
    assert(fs.map(_.frame_idx) == Seq(0, 2))
    assert(fs.map(_.n_bytes) == Seq(512L, 176L))
    val block2 = java.util.Arrays.copyOfRange(bytes, 44 + 1024, 44 + 1200)
    assert(fs(1).frame_hash == graft.media.Media.byteHash(block2))
  }

  test("dispatch: non-RIFF, non-PCM-bit-depth and truncated payloads " +
    "take the stub arithmetic exactly") {
    val text = asset(5L, "just some document text".getBytes("UTF-8"))
    val wav24 = {
      val b = wav(1, 8000, 16, Seq(Seq(0), Seq(100)))
      b(34) = 24 // bits-per-sample field: 24-bit is not carried
      b
    }
    val truncated = {
      val b = wav(1, 8000, 16, Seq(Seq(0), Seq(100)))
      b(40) = 120 // data chunk claims 120 bytes; only 4 present
      b
    }
    for (a <- Seq(text, asset(6L, wav24), asset(7L, truncated))) {
      assert(WavMediaKernel.parseWav(a.content).isEmpty)
      val viaWav = WavMediaKernel.decodeBatch(Seq(a)).head
      val viaStub = StubMediaKernel.decodeBatch(Seq(a)).head
      assert(viaWav.width == viaStub.width &&
        viaWav.height == viaStub.height &&
        viaWav.features.toSeq == viaStub.features.toSeq)
      assert(WavMediaKernel.frames(a, 2).toSeq.map(_.frame_hash) ==
        StubMediaKernel.frames(a, 2).toSeq.map(_.frame_hash))
    }
  }

  test("multimodal gates are byte-identical with the DISPATCH kernel " +
    "active, and it routes real WAV and real P6 assets to their real " +
    "decoders through the same distributed plumbing") {
    def gateRows(name: String) =
      SparkEntry.queries(name)(spark, sf0001).collect().map(_.toString).toSet
    val stubFeatures = gateRows("multimodal_features")
    val stubFrames = gateRows("multimodal_frames")
    Multimodal.setKernel(DispatchMediaKernel)
    try {
      assert(gateRows("multimodal_features") == stubFeatures,
        "gate values must not move under the dispatch kernel")
      assert(gateRows("multimodal_frames") == stubFrames)
      val wavAsset = asset(10L,
        wav(1, 4, 16, Seq(Seq(0), Seq(16384), Seq(-16384), Seq(-32768))))
      val p6 = ("P6\n2 2\n255\n".getBytes("US-ASCII") ++
        Seq(255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255)
          .map(_.toByte)).toArray
      val decoded = Multimodal.extractFeatures(
          Seq(wavAsset, Asset(11L, "image/x-portable-pixmap",
            p6.length.toLong, p6)).toDS())
        .collect().sortBy(_.asset_id)
      assert(decoded(0).width == 4 && decoded(0).features(0) == -0.25f,
        "WAV payload must reach the WAV kernel")
      assert(decoded(1).width == 2 &&
        decoded(1).features.toSeq.take(4) == Seq(0.5f, 0.5f, 0.5f, 0.5f),
        "P6 payload must reach the PPM kernel through the same router")
    } finally Multimodal.setKernel(StubMediaKernel)
  }
}
