package graft.media

import graft.media.Media._


/** Pure-JVM kernel for MPEG-1 Layer III (MP3) audio — ID3v2 skip +
  * frame-header walk. NO entropy decode: the metering shape a
  * training-data pipeline needs from a crawled audio corpus
  * (duration, bitrate profile, channel layout, frame statistics)
  * falls out of the frame HEADERS alone — each frame's byte length
  * is fully determined by its header (144·bitrate/samplerate +
  * padding) and carries 1152 samples, so walking the headers yields
  * exact duration and the whole bitrate envelope without touching
  * the Huffman payload. Same dispatch contract as every kernel:
  * anything not a well-formed MPEG-1 Layer III stream (wrong
  * version/layer, free-format or reserved bitrate, reserved sample
  * rate, a frame overrunning the payload, trailing garbage that is
  * not an ID3v1 tag) is an opaque blob for the stub, not a decode
  * error. Mp3KernelSpec pins hand-built frames.
  *
  * `AssetFeatures.width`/`height` carry sample rate and channel
  * count (the WAV convention). Feature layout: duration seconds,
  * frame count, mean/min/max bitrate kbps, VBR flag (more than one
  * distinct bitrate), padded-frame fraction, mean frame length in
  * bytes.
  */
object Mp3MediaKernel extends MediaKernel {

  private[graft] final case class Mp3Frame(off: Int, len: Int,
      kbps: Int, padded: Boolean)
  private[graft] final case class Mp3Info(sampleRate: Int,
      channels: Int, frames: Vector[Mp3Frame]) {
    def durationSec: Double =
      frames.length.toDouble * SamplesPerFrame / sampleRate
  }

  /** MPEG-1 Layer III bitrate table (kbps), indexed by the header's
    * 4-bit field; 0 = free format (unsupported: the frame length is
    * then not header-derivable), 15 = forbidden.
    */
  private val Bitrates = Array(
    0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val Rates = Array(44100, 48000, 32000)
  val SamplesPerFrame = 1152

  /** Bytes to skip for a leading ID3v2 tag: 10-byte header with a
    * 28-bit syncsafe size (+10 for a footer when flag 0x10 is set);
    * 0 when no tag. Syncsafe bytes must have the high bit clear —
    * anything else is a malformed tag, reported as an overrun skip
    * so the parse rejects the payload.
    */
  private def id3v2End(b: Array[Byte]): Int =
    if (b.length >= 10 && b(0) == 'I'.toByte && b(1) == 'D'.toByte &&
        b(2) == '3'.toByte) {
      if (((b(6) | b(7) | b(8) | b(9)) & 0x80) != 0) Int.MaxValue
      else 10 + (((b(6) & 0x7f) << 21) | ((b(7) & 0x7f) << 14) |
        ((b(8) & 0x7f) << 7) | (b(9) & 0x7f)) +
        (if ((b(5) & 0x10) != 0) 10 else 0)
    } else 0

  /** Parse one frame header at `i`: MPEG-1 (version bits 11) Layer
    * III (layer bits 01) with a concrete bitrate and sample rate —
    * returns (length, kbps, sampleRate, channels, padded).
    */
  private def frameAt(b: Array[Byte],
      i: Int): Option[(Int, Int, Int, Int, Boolean)] = {
    if (i + 4 > b.length) return None
    if ((b(i) & 0xff) != 0xff || (b(i + 1) & 0xe0) != 0xe0) return None
    if (((b(i + 1) >> 3) & 3) != 3) return None // MPEG-1 only
    if (((b(i + 1) >> 1) & 3) != 1) return None // Layer III only
    val br = (b(i + 2) >> 4) & 0xf
    val sr = (b(i + 2) >> 2) & 3
    if (br == 0 || br == 15 || sr == 3) return None
    val padded = ((b(i + 2) >> 1) & 1) == 1
    val channels = if (((b(i + 3) >> 6) & 3) == 3) 1 else 2
    val len = 144 * Bitrates(br) * 1000 / Rates(sr) +
      (if (padded) 1 else 0)
    Some((len, Bitrates(br), Rates(sr), channels, padded))
  }

  /** Router probe: a syntactically valid MPEG-1 Layer III header at
    * `i` (full validity is [[parseMp3]]'s whole-stream walk).
    */
  private[graft] def looksLikeFrame(b: Array[Byte], i: Int): Boolean =
    frameAt(b, i).isDefined

  /** The whole-stream frame walk: skip a leading ID3v2 tag, then
    * frames must tile the payload exactly — same sample rate and
    * channel mode throughout (bitrate may vary per frame: VBR),
    * every frame fully inside the payload — with at most a trailing
    * 128-byte ID3v1 `TAG` block. Anything else is an opaque blob.
    */
  private[graft] def parseMp3(b: Array[Byte]): Option[Mp3Info] = {
    val start = id3v2End(b)
    if (start < 0 || start > b.length) return None
    var i = start
    var rate = -1
    var chans = -1
    val frames = Vector.newBuilder[Mp3Frame]
    var n = 0
    while (i < b.length) {
      frameAt(b, i) match {
        case Some((len, kbps, sr, ch, padded)) if i + len <= b.length &&
            (rate < 0 || (sr == rate && ch == chans)) =>
          rate = sr; chans = ch
          frames += Mp3Frame(i, len, kbps, padded)
          n += 1
          i += len
        case _ =>
          // only an ID3v1 tag may trail the last frame
          val isId3v1 = b.length - i == 128 && i + 3 <= b.length &&
            b(i) == 'T'.toByte && b(i + 1) == 'A'.toByte &&
            b(i + 2) == 'G'.toByte
          if (!isId3v1) return None
          i = b.length
      }
    }
    if (n == 0) None else Some(Mp3Info(rate, chans, frames.result()))
  }

  def decodeBatch(batch: Seq[Asset]): Seq[AssetFeatures] = batch.map { a =>
    parseMp3(a.content) match {
      case None => StubMediaKernel.decodeBatch(Seq(a)).head
      case Some(m) =>
        val ks = m.frames.map(_.kbps)
        val lens = m.frames.map(_.len)
        AssetFeatures(a.asset_id, m.sampleRate, m.channels, Array(
          m.durationSec.toFloat,
          m.frames.length.toFloat,
          (ks.sum.toDouble / ks.length).toFloat,
          ks.min.toFloat,
          ks.max.toFloat,
          if (ks.distinct.length > 1) 1f else 0f,
          (m.frames.count(_.padded).toDouble / m.frames.length).toFloat,
          (lens.map(_.toLong).sum.toDouble / lens.length).toFloat))
    }
  }

  /** Bitrate-envelope thumbnail: `w*h` bytes, nearest-neighbor along
    * the frame axis, each byte the frame's bitrate requantized to
    * unsigned 8-bit against the 320 kbps ceiling — all integer
    * arithmetic, the audio-metering analog of the WAV amplitude
    * thumbnail.
    */
  def resizeBatch(batch: Seq[Asset], w: Int, h: Int): Seq[ResizedAsset] =
    batch.map { a =>
      parseMp3(a.content) match {
        case None => StubMediaKernel.resizeBatch(Seq(a), w, h).head
        case Some(m) =>
          val thumb = Array.tabulate(w * h) { i =>
            val f = (i.toLong * m.frames.length / (w.toLong * h)).toInt
            (m.frames(f).kbps * 255 / 320).toByte
          }
          ResizedAsset(a.asset_id, w, h, thumb)
      }
    }

  /** Each physical MP3 frame is one sample (its true byte span,
    * header included), every `every`-th kept — frame boundaries are
    * the natural chunking a header walk yields.
    */
  def frames(a: Asset, every: Int): Iterator[FrameSample] =
    parseMp3(a.content) match {
      case None => StubMediaKernel.frames(a, every)
      case Some(m) =>
        m.frames.iterator.zipWithIndex.filter(_._2 % every == 0)
          .map { case (f, k) =>
            val bytes = java.util.Arrays.copyOfRange(
              a.content, f.off, f.off + f.len)
            FrameSample(a.asset_id, k, bytes.length.toLong,
              byteHash(bytes))
          }
    }
}
