package graft.media

import graft.media.Media._


/** Pure-JVM kernel with REAL decode for RIFF/WAVE PCM audio (8- and
  * 16-bit, any channel count) — chunk-walk header parse, sample scan,
  * waveform statistics — the audio sibling of [[PpmMediaKernel]].
  * Same dispatch contract: anything not a well-formed PCM WAV falls
  * back to the stub arithmetic, so mixed corpora (and the
  * text-payload gate tables) keep their oracle-checked values while
  * genuine audio bytes get genuinely decoded. WavKernelSpec pins
  * hand-computed waveform statistics.
  *
  * `AssetFeatures.width`/`height` carry the stream's sample rate and
  * channel count (the audio analog of pixel dimensions). Feature
  * layout over the channel-averaged mono stream: mean (DC offset),
  * mean |x|, RMS, peak |x|, zero-crossing fraction, loud fraction
  * (|x| > 1/2), duration in seconds, near-silence fraction
  * (|x| < 1/64).
  */
object WavMediaKernel extends MediaKernel {

  private[graft] final case class WavInfo(channels: Int,
      sampleRate: Int, bits: Int, dataOff: Int, frames: Int) {
    def blockAlign: Int = channels * (bits / 8)
  }

  private def leU16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def leU32(b: Array[Byte], i: Int): Long =
    (leU16(b, i).toLong) | (leU16(b, i + 2).toLong << 16)
  private def tag(b: Array[Byte], i: Int, s: String): Boolean =
    (0 until 4).forall(j => b(i + j) == s.charAt(j).toByte)

  /** RIFF/WAVE chunk walk: requires an integer-PCM `fmt ` chunk
    * (format 1, 8/16-bit, consistent block align) and a whole-frame
    * `data` chunk fully inside the payload, with the RIFF word-pad
    * rule (odd chunks take one pad byte) honored between chunks.
    * Anything else — wrong magic, float/compressed formats, overrun
    * chunks, zero frames — is an opaque blob, not a decode error.
    */
  private[graft] def parseWav(b: Array[Byte]): Option[WavInfo] = {
    if (b.length < 12 || !tag(b, 0, "RIFF") || !tag(b, 8, "WAVE"))
      return None
    var i = 12
    var fmt: Option[(Int, Int, Int)] = None // channels, rate, bits
    var data: Option[(Int, Int)] = None     // off, len
    while (i + 8 <= b.length) {
      val size = leU32(b, i + 4)
      if (size > b.length - i - 8) return None // chunk overruns payload
      val sz = size.toInt
      if (tag(b, i, "fmt ")) {
        if (sz < 16) return None
        val o = i + 8
        val (af, ch, rate, bits) =
          (leU16(b, o), leU16(b, o + 2), leU32(b, o + 4), leU16(b, o + 14))
        if (af != 1 || ch < 1 || ch > 8 || bits % 8 != 0 ||
            (bits != 8 && bits != 16) ||
            rate < 1 || rate > 384000 ||
            leU16(b, o + 12) != ch * (bits / 8)) return None
        fmt = Some((ch, rate.toInt, bits))
      } else if (tag(b, i, "data")) {
        data = Some((i + 8, sz))
      }
      i += 8 + sz + (sz & 1) // RIFF chunks are word-aligned
    }
    for {
      (ch, rate, bits) <- fmt
      (off, len) <- data
      ba = ch * (bits / 8)
      if len % ba == 0 && len / ba > 0
    } yield WavInfo(ch, rate, bits, off, len / ba)
  }

  /** Channel-averaged mono frame `t` in INTEGER sample units
    * (16-bit scale: 8-bit samples are rebased to signed and shifted
    * up 8), divided by the channel count — integer division, so
    * resize thumbnails are byte-deterministic with no float in the
    * path.
    */
  /** |amplitude| envelope over `bins` equal time bins: frame t lands
    * in bin t·bins/frames (integer floor — surjective for
    * frames ≥ bins, so every bin holds ≥ 1 frame), summing
    * |channel-averaged mono| in the kernel's integer sample units.
    */
  override def audioEnvelope(a: Asset, bins: Int): Option[Array[Long]] =
    parseWav(a.content).filter(_.frames >= bins).map { w =>
      val env = new Array[Long](bins)
      var t = 0
      while (t < w.frames) {
        env((t.toLong * bins / w.frames).toInt) +=
          math.abs(monoInt(a.content, w, t)).toLong
        t += 1
      }
      env
    }

  private def monoInt(b: Array[Byte], w: WavInfo, t: Int): Int = {
    val base = w.dataOff + t * w.blockAlign
    var s = 0
    var c = 0
    while (c < w.channels) {
      s += (if (w.bits == 8) ((b(base + c) & 0xff) - 128) << 8
            else (((b(base + 2 * c) & 0xff) |
                   (b(base + 2 * c + 1) << 8)).toShort).toInt)
      c += 1
    }
    s / w.channels
  }

  def decodeBatch(batch: Seq[Asset]): Seq[AssetFeatures] = batch.map { a =>
    parseWav(a.content) match {
      case None => StubMediaKernel.decodeBatch(Seq(a)).head
      case Some(w) =>
        val n = w.frames
        var sum, sumAbs, sumSq = 0.0
        var peak = 0.0
        var zc, loud, quiet = 0
        var prevNeg = false
        var t = 0
        while (t < n) {
          // float mono in [-1, 1]: exact channel average of the
          // per-channel normalized samples
          var s = 0.0
          var c = 0
          while (c < w.channels) {
            val base = w.dataOff + t * w.blockAlign
            s += (if (w.bits == 8) ((a.content(base + c) & 0xff) - 128) / 128.0
                  else (((a.content(base + 2 * c) & 0xff) |
                         (a.content(base + 2 * c + 1) << 8)).toShort) / 32768.0)
            c += 1
          }
          val x = s / w.channels
          val ax = math.abs(x)
          sum += x; sumAbs += ax; sumSq += x * x
          if (ax > peak) peak = ax
          val neg = x < 0
          if (t > 0 && neg != prevNeg) zc += 1
          prevNeg = neg
          if (ax > 0.5) loud += 1
          if (ax < 1.0 / 64) quiet += 1
          t += 1
        }
        AssetFeatures(a.asset_id, w.sampleRate, w.channels, Array(
          (sum / n).toFloat, (sumAbs / n).toFloat,
          math.sqrt(sumSq / n).toFloat, peak.toFloat,
          (zc.toDouble / math.max(1, n - 1)).toFloat,
          (loud.toDouble / n).toFloat,
          (n.toDouble / w.sampleRate).toFloat,
          (quiet.toDouble / n).toFloat))
    }
  }

  /** Waveform thumbnail: `w*h` bytes, nearest-neighbor along time,
    * each byte the channel-averaged 16-bit amplitude requantized to
    * unsigned 8-bit — all integer arithmetic.
    */
  def resizeBatch(batch: Seq[Asset], w: Int, h: Int): Seq[ResizedAsset] =
    batch.map { a =>
      parseWav(a.content) match {
        case None => StubMediaKernel.resizeBatch(Seq(a), w, h).head
        case Some(info) =>
          val thumb = Array.tabulate(w * h) { i =>
            val t = (i.toLong * info.frames / (w.toLong * h)).toInt
            (((monoInt(a.content, info, t) + 32768) >> 8) & 0xff).toByte
          }
          ResizedAsset(a.asset_id, w, h, thumb)
      }
    }

  val FrameFrames = 256 // audio frames per sampled block

  /** Fixed 256-audio-frame blocks of the data chunk as samples (the
    * trailing partial block keeps its true byte length), every
    * `every`-th kept — the audio analog of the PPM row sampler.
    */
  def frames(a: Asset, every: Int): Iterator[FrameSample] =
    parseWav(a.content) match {
      case None => StubMediaKernel.frames(a, every)
      case Some(w) =>
        val blockBytes = FrameFrames * w.blockAlign
        val dataLen = w.frames * w.blockAlign
        val nBlocks = (dataLen + blockBytes - 1) / blockBytes
        (0 until nBlocks).iterator.filter(_ % every == 0).map { k =>
          val from = w.dataOff + k * blockBytes
          val until = math.min(from + blockBytes, w.dataOff + dataLen)
          val block = java.util.Arrays.copyOfRange(a.content, from, until)
          FrameSample(a.asset_id, k, block.length.toLong, byteHash(block))
        }
    }
}
