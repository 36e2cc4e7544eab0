package graft.operators

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads are opaque
  * `binary` columns with typed metadata travelling alongside. The
  * default decode / feature-extract kernel is a deterministic
  * byte-driven STUB (no media libraries in this environment), but the
  * SPI demonstrably carries real implementations for ALL THREE mime
  * families, pure-JVM — including the two real-world image containers:
  * [[PngMediaKernel]] (full PNG: CRC chunk walk, inflate, all five
  * scanline filters, every 8-bit color type), [[JpegMediaKernel]]
  * (baseline JFIF: Huffman entropy decode, dequant, IDCT, chroma
  * upsampling, YCbCr→RGB), [[PpmMediaKernel]] (binary PPM/P6 images —
  * header parse, pixel statistics, nearest-neighbor resample, row
  * sampling), [[WavMediaKernel]] (RIFF/WAVE PCM audio — chunk walk,
  * waveform statistics, integer thumbnail requantization, block
  * sampling), [[Y4mMediaKernel]] (YUV4MPEG2 raw video — stream/frame
  * parse, luma/chroma/motion statistics, poster thumbnails, TRUE
  * frame sampling), composed by the magic-byte
  * [[DispatchMediaKernel]] router; the gate queries stay
  * byte-identical with any of them active
  * (Ppm/Wav/Y4m/Png/JpegKernelSpec).
  * The Spark-side contract (schema, batching, partition-parallel
  * execution, feature vector shape) is real and tested either way.
  *
  * At 100 TB the binary column dominates I/O: metadata queries must never
  * read it (column pruning does this for free in parquet as long as meta
  * lives in sibling columns, not inside the blob), and decode runs
  * batch-at-a-time per partition to amortize per-call overhead — the same
  * shape `mapInPandas`/Arrow batches give PySpark.
  */
object Multimodal {

  /** One media asset: opaque bytes + typed metadata columns. */
  final case class Asset(asset_id: Long, mime: String, n_bytes: Long,
      content: Array[Byte])

  /** Decoded features for one asset (fixed-width vector). */
  final case class AssetFeatures(asset_id: Long, width: Int, height: Int,
      features: Array[Float])

  val FeatureDim = 8
  val DecodeBatchSize = 64

  /** Content hash for the stub decoders: 31-polynomial over the bytes mod
    * 1e9+7. Plain modular arithmetic (NOT `Arrays.hashCode`, whose 32-bit
    * wrap has no clean SQL form) so the DuckDB oracle can recompute it
    * with a `list_reduce` fold and the stub pipelines get value-level
    * checks instead of rows-only.
    */
  def byteHash(bytes: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = (h * 31 + (bytes(i) & 0xff)) % 1000000007L; i += 1 }
    h
  }

  /** Thumbnail of one asset (stub resize: real plumbing, fake pixels). */
  final case class ResizedAsset(asset_id: Long, width: Int, height: Int,
      thumb: Array[Byte])

  /** One sampled frame of a (fake) video asset. */
  final case class FrameSample(asset_id: Long, frame_idx: Int,
      n_bytes: Long, frame_hash: Long)

  val FrameBytes = 64 // small enough that test payloads span many frames

  /** The decode SPI: everything media-library-shaped sits behind this
    * seam, so a production build drops in a real decoder (JNI ffmpeg,
    * ImageIO, …) WITHOUT touching the distributed plumbing or any query
    * code — the operators capture the active kernel at plan time and
    * ship it with the task closure (hence `Serializable`). Batch-level
    * signatures, not per-asset, so an implementation can amortize
    * native-call overhead across a batch exactly like Arrow record
    * batches under `mapInPandas`.
    */
  trait MediaKernel extends Serializable {
    def decodeBatch(batch: Seq[Asset]): Seq[AssetFeatures]
    def resizeBatch(batch: Seq[Asset], w: Int, h: Int): Seq[ResizedAsset]
    def frames(asset: Asset, every: Int): Iterator[FrameSample]

    /** The decoded RGB frame of a still image — (width, height,
      * 3·w·h bytes) — or None when the payload carries no decodable
      * pixel frame. This is the pixel-level access the perceptual-hash
      * operator builds on; audio/video/stub kernels keep the default
      * None (an asset with no decodable frame gets NO perceptual hash,
      * never a fake one — unlike the statistics paths, where the stub
      * fallback is the documented contract).
      */
    def rgbFrame(a: Asset): Option[(Int, Int, Array[Byte])] = None

    /** Decoded RGB pixel FRAMES — (frame_idx, width, height, rgb) for
      * every `every`-th frame. A still image is its own one-frame
      * video (idx 0); video kernels override with real frame
      * iteration. The pixel surface behind per-frame perceptual
      * hashing.
      */
    def rgbFrames(a: Asset,
        every: Int): Iterator[(Int, Int, Int, Array[Byte])] =
      rgbFrame(a).iterator.map { case (w, h, rgb) => (0, w, h, rgb) }

    /** The decoded waveform's |amplitude| ENVELOPE in `bins` equal
      * time bins (integer sample units summed per bin), or None when
      * the payload carries no sample-decodable audio of ≥ `bins`
      * frames. The audio analog of [[rgbFrame]]: the surface the
      * audio fingerprint reads. Kernels that meter audio WITHOUT
      * entropy-decoding samples (MP3, FLAC) honestly return None.
      */
    def audioEnvelope(a: Asset, bins: Int): Option[Array[Long]] = None
  }

  /** The default STUB kernel (no media libraries in this environment):
    * deterministic pure functions of the bytes so tests, reruns and the
    * DuckDB oracle all agree. Feature i is an exact rational in [0, 1)
    * derived from the content hash — engine-portable (no libm calls
    * whose last ulp differs across platforms).
    */
  object StubMediaKernel extends MediaKernel {
    def decodeBatch(batch: Seq[Asset]): Seq[AssetFeatures] = batch.map { a =>
      val h = byteHash(a.content)
      val feats = Array.tabulate(FeatureDim) { i =>
        (((h * 2654435761L + i * 40503L) % 1000003L).toDouble / 1000003.0).toFloat
      }
      AssetFeatures(a.asset_id, width = 1 + (h % 1024).toInt,
        height = 1 + ((h / 1024) % 1024).toInt, features = feats)
    }

    def resizeBatch(batch: Seq[Asset], w: Int, h: Int): Seq[ResizedAsset] =
      batch.map { a =>
        // Zero-byte payloads get a zero-filled thumb: `i % max(len, 1)` is
        // 0 for empty content, and content(0) would throw.
        val thumb =
          if (a.content.isEmpty) new Array[Byte](w * h)
          else Array.tabulate(w * h)(i => a.content(i % a.content.length))
        ResizedAsset(a.asset_id, w, h, thumb)
      }

    /** Treats the payload as fixed-size frames and keeps every
      * `every`-th — the 1→N row explosion shape (one asset, many
      * frames) a real sampler has.
      */
    def frames(a: Asset, every: Int): Iterator[FrameSample] =
      a.content.grouped(FrameBytes).zipWithIndex
        .filter { case (_, i) => i % every == 0 }
        .map { case (frame, i) =>
          FrameSample(a.asset_id, i, frame.length.toLong, byteHash(frame))
        }
  }

  /** Pure-JVM kernel with REAL decode for binary PPM (P6) images —
    * header parse (whitespace/comment tolerant), pixel scan, channel
    * statistics — no media library required. Dispatch is on the
    * container magic, the same shape a production ffmpeg/ImageIO
    * kernel has: a payload that is not a well-formed P6 falls back to
    * the deterministic stub arithmetic, so mixed corpora (and the
    * text-payload gate tables) keep their oracle-checked values while
    * genuine image bytes get genuinely decoded. This is the proof the
    * SPI carries a non-stub implementation end-to-end: PpmKernelSpec
    * pins hand-computed pixel statistics, and the multimodal gate
    * queries are asserted byte-identical with this kernel ACTIVE.
    *
    * Feature layout (all normalized to [0, 1] by maxval): mean R, G,
    * B; mean luma ((r+g+b)/3); max R, G, B; fraction of pixels whose
    * luma exceeds maxval/2.
    */
  object PpmMediaKernel extends MediaKernel {

    /** P6 header: magic, then width/height/maxval as ASCII decimals
      * separated by whitespace (with `#` comments), then ONE
      * whitespace byte, then raw RGB triplets. Returns
      * (width, height, maxval, pixelOffset); None for anything not a
      * complete single-byte-channel P6 (including truncated pixel
      * data — an opaque blob, not a decode error).
      */
    private[operators] def parseP6(b: Array[Byte]): Option[(Int, Int, Int, Int)] = {
      if (b.length < 2 || b(0) != 'P' || b(1) != '6') return None
      var i = 2
      val vals = new Array[Int](3)
      var v = 0
      while (v < 3) {
        var skipped = true
        while (skipped && i < b.length) {
          if (b(i) == '#') { while (i < b.length && b(i) != '\n') i += 1 }
          else if ((b(i) & 0xff) <= ' ') i += 1
          else skipped = false
        }
        if (i >= b.length || b(i) < '0' || b(i) > '9') return None
        var n = 0L
        while (i < b.length && b(i) >= '0' && b(i) <= '9') {
          n = n * 10 + (b(i) - '0'); i += 1
          if (n > Int.MaxValue) return None
        }
        vals(v) = n.toInt; v += 1
      }
      if (i >= b.length || (b(i) & 0xff) > ' ') return None
      i += 1 // the single post-maxval whitespace byte
      val (w, h, mx) = (vals(0), vals(1), vals(2))
      if (w <= 0 || h <= 0 || mx <= 0 || mx > 255) return None
      // Overflow-safe bound: 3L*w*h can wrap past Long.MaxValue for an
      // adversarial ~2e9 × 2e9 header; w.toLong*h (product of two ≤2^31
      // values) cannot, and passing it also guarantees w*h fits an Int
      // for the downstream pixel loops.
      if (w.toLong * h > (b.length - i) / 3) return None
      Some((w, h, mx, i))
    }

    def decodeBatch(batch: Seq[Asset]): Seq[AssetFeatures] = batch.map { a =>
      parseP6(a.content) match {
        case None => StubMediaKernel.decodeBatch(Seq(a)).head
        case Some((w, h, mx, off)) =>
          val n = w * h
          var sr, sg, sb = 0L
          var mr, mg, mb = 0
          var bright = 0
          var p = 0
          while (p < n) {
            val r = a.content(off + 3 * p) & 0xff
            val g = a.content(off + 3 * p + 1) & 0xff
            val b = a.content(off + 3 * p + 2) & 0xff
            sr += r; sg += g; sb += b
            if (r > mr) mr = r
            if (g > mg) mg = g
            if (b > mb) mb = b
            if (2L * (r + g + b) > 3L * mx) bright += 1
            p += 1
          }
          val d = mx.toDouble * n
          AssetFeatures(a.asset_id, w, h, Array(
            (sr / d).toFloat, (sg / d).toFloat, (sb / d).toFloat,
            ((sr + sg + sb) / (3.0 * d)).toFloat,
            (mr.toDouble / mx).toFloat, (mg.toDouble / mx).toFloat,
            (mb.toDouble / mx).toFloat,
            (bright.toDouble / n).toFloat))
      }
    }

    /** Nearest-neighbor resample to a w×h LUMA thumbnail (one byte per
      * target pixel, (r+g+b)/3); non-P6 payloads take the stub tile.
      */
    def resizeBatch(batch: Seq[Asset], w: Int, h: Int): Seq[ResizedAsset] =
      batch.map { a =>
        parseP6(a.content) match {
          case None => StubMediaKernel.resizeBatch(Seq(a), w, h).head
          case Some((sw, sh, _, off)) =>
            val thumb = Array.tabulate(w * h) { i =>
              val sy = ((i / w).toLong * sh / h).toInt
              val sx = ((i % w).toLong * sw / w).toInt
              val q = off + 3 * (sy * sw + sx)
              (((a.content(q) & 0xff) + (a.content(q + 1) & 0xff) +
                (a.content(q + 2) & 0xff)) / 3).toByte
            }
            ResizedAsset(a.asset_id, w, h, thumb)
        }
      }

    /** A still image's frame analog: every `every`-th pixel ROW as one
      * sample (n_bytes = 3·width, hashed with the portable fold);
      * non-P6 payloads take the stub's fixed-size chunking.
      */
    def frames(a: Asset, every: Int): Iterator[FrameSample] =
      parseP6(a.content) match {
        case None => StubMediaKernel.frames(a, every)
        case Some((w, h, _, off)) =>
          (0 until h).iterator.filter(_ % every == 0).map { y =>
            val row = java.util.Arrays.copyOfRange(
              a.content, off + 3 * y * w, off + 3 * (y + 1) * w)
            FrameSample(a.asset_id, y, row.length.toLong, byteHash(row))
          }
      }

    /** Raw pixel bytes (0..maxval per channel — a flat scale factor,
      * which every luma-ORDER consumer like dHash is invariant to).
      */
    override def rgbFrame(a: Asset): Option[(Int, Int, Array[Byte])] =
      parseP6(a.content).map { case (w, h, _, off) =>
        (w, h, java.util.Arrays.copyOfRange(a.content, off, off + 3 * w * h))
      }
  }

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

    private[operators] final case class WavInfo(channels: Int,
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

    private[operators] final case class Mp3Frame(off: Int, len: Int,
        kbps: Int, padded: Boolean)
    private[operators] final case class Mp3Info(sampleRate: Int,
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
    private[operators] def looksLikeFrame(b: Array[Byte], i: Int): Boolean =
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

  /** Pure-JVM kernel for ISO BMFF (MP4/MOV) video containers — a box
    * walk, NO codec decode: like [[Mp3MediaKernel]], the metering
    * shape a crawled video corpus needs (duration, track layout,
    * pixel dimensions, sample counts, media-payload share) is fully
    * determined by the container STRUCTURE — `mvhd` carries the
    * movie timescale/duration, each `trak`'s `tkhd`/`hdlr` its
    * dimensions and handler class, `stsz` its per-sample byte sizes —
    * so walking the box tree yields exact metering without touching a
    * single codec payload byte. Top-level boxes must tile the payload
    * exactly (a `size`-0 terminal box extends to EOF, per spec);
    * anything else — missing `ftyp`/`moov`/`mvhd`, an overrunning or
    * undersized box, a truncated sample table — is an opaque blob for
    * the stub. Mp4KernelSpec pins hand-built box trees.
    *
    * Decoding the codec payloads themselves (H.264/H.265 entropy
    * coding) is genuinely out of pure-JVM from-scratch scope — that is
    * the [[MediaKernel]] SPI boundary where a native decoder plugs in,
    * not a TODO: raw video ([[Y4mMediaKernel]]) and lossless audio
    * ([[FlacMediaKernel]]) mark the limit of what this library decodes
    * itself, and every pixel/sample-level operator (dedup
    * fingerprints, frame hashing) already runs against the SPI, so a
    * plugged kernel lights them up for compressed video unchanged.
    *
    * `AssetFeatures.width`/`height` carry the first video track's
    * pixel dimensions (the image/video convention; 0×0 when no video
    * track). Feature layout: duration seconds, track count, video
    * track count, audio track count, total sample count, mdat byte
    * fraction of the payload, mean sample bytes, top-level box count.
    */
  object Mp4MediaKernel extends MediaKernel {

    private[operators] final case class Mp4Box(off: Int, len: Int,
        typ: String, payloadOff: Int)
    private[operators] final case class Mp4Track(handler: String,
        width: Int, height: Int, sampleSize: Int,
        sampleSizes: Vector[Int]) {
      def sampleCount: Int = sampleSizes.length
    }
    private[operators] final case class Mp4Info(timescale: Long,
        duration: Long, tracks: Vector[Mp4Track], mdatBytes: Long,
        topBoxes: Vector[Mp4Box]) {
      def durationSec: Double =
        if (timescale == 0) 0.0 else duration.toDouble / timescale
    }

    private def beU32(b: Array[Byte], i: Int): Long =
      ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
        ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
    private def beU64(b: Array[Byte], i: Int): Long =
      (beU32(b, i) << 32) | beU32(b, i + 4)
    private def typ4(b: Array[Byte], i: Int): String =
      new String(Array(b(i), b(i + 1), b(i + 2), b(i + 3)), "US-ASCII")

    /** Walk the boxes tiling [from, until): each is size(4) type(4)
      * [largesize(8) when size==1] payload; size==0 means "to the end
      * of the enclosing space" and must therefore be last. None on
      * any overrun, undersize, or gap.
      */
    private def walk(b: Array[Byte], from: Int,
        until: Int): Option[Vector[Mp4Box]] = {
      val out = Vector.newBuilder[Mp4Box]
      var i = from
      while (i < until) {
        if (i + 8 > until) return None
        val size32 = beU32(b, i)
        val t = typ4(b, i + 4)
        if (!t.forall(c => c >= ' ' && c < 127)) return None
        val (len, pOff) =
          if (size32 == 0) ((until - i).toLong, i + 8)
          else if (size32 == 1) {
            if (i + 16 > until) return None
            (beU64(b, i + 8), i + 16)
          } else (size32, i + 8)
        if (len < (pOff - i) || i + len > until) return None
        out += Mp4Box(i, len.toInt, t, pOff)
        i += len.toInt
      }
      Some(out.result())
    }

    private def child(b: Array[Byte], parent: Mp4Box,
        t: String): Option[Mp4Box] =
      walk(b, parent.payloadOff, parent.off + parent.len)
        .flatMap(_.find(_.typ == t))

    /** mvhd / mdhd share the layout: version(1) flags(3), then v0
      * ctime(4) mtime(4) timescale(4) duration(4) / v1 with 8-byte
      * times and duration. Returns (timescale, duration).
      */
    private def timescaleDuration(b: Array[Byte],
        h: Mp4Box): Option[(Long, Long)] = {
      val p = h.payloadOff
      val v = b(p) & 0xff
      if (v == 0 && h.off + h.len >= p + 20)
        Some((beU32(b, p + 12), beU32(b, p + 16)))
      else if (v == 1 && h.off + h.len >= p + 32)
        Some((beU32(b, p + 20), beU64(b, p + 24)))
      else None
    }

    /** tkhd pixel dimensions: 16.16 fixed point at the end of the
      * fixed layout (after times/id/duration/layer/volume/matrix —
      * payload offset 76 for v0, 88 for v1).
      */
    private def tkhdDims(b: Array[Byte], h: Mp4Box): Option[(Int, Int)] = {
      val p = h.payloadOff
      val o = (b(p) & 0xff) match {
        case 0 => p + 76
        case 1 => p + 88
        case _ => return None
      }
      if (h.off + h.len < o + 8) None
      else Some(((beU32(b, o) >> 16).toInt, (beU32(b, o + 4) >> 16).toInt))
    }

    private def parseTrack(b: Array[Byte],
        trak: Mp4Box): Option[Mp4Track] = for {
      tkhd <- child(b, trak, "tkhd")
      (w, h) <- tkhdDims(b, tkhd)
      mdia <- child(b, trak, "mdia")
      hdlr <- child(b, mdia, "hdlr")
      // hdlr: version/flags(4) predefined(4) handler_type(4)
      if hdlr.len >= 20
      handler = typ4(b, hdlr.payloadOff + 8)
      stsz <- child(b, mdia, "minf").flatMap(child(b, _, "stbl"))
        .flatMap(child(b, _, "stsz"))
      sizes <- stszSizes(b, stsz)
    } yield Mp4Track(handler, w, h,
      (beU32(b, stsz.payloadOff + 4)).toInt, sizes)

    /** stsz: version/flags(4) sample_size(4) sample_count(4); a
      * sample_size of 0 means a per-sample u32 table follows — the
      * container's own "bitrate envelope". Bounded: the declared
      * table must fit the box.
      */
    private def stszSizes(b: Array[Byte],
        stsz: Mp4Box): Option[Vector[Int]] = {
      val p = stsz.payloadOff
      if (stsz.off + stsz.len < p + 12) return None
      val uniform = beU32(b, p + 4)
      val n = beU32(b, p + 8)
      if (n > (16 << 20)) return None // adversarial-header bound
      if (uniform != 0) Some(Vector.fill(n.toInt)(uniform.toInt))
      else if (stsz.off + stsz.len < p + 12 + 4 * n) None
      else Some(Vector.tabulate(n.toInt)(k =>
        beU32(b, p + 12 + 4 * k).toInt))
    }

    private[graft] def parseMp4(b: Array[Byte]): Option[Mp4Info] = for {
      tops <- walk(b, 0, b.length)
      if tops.headOption.exists(_.typ == "ftyp")
      moov <- tops.find(_.typ == "moov")
      mvhd <- child(b, moov, "mvhd")
      (timescale, duration) <- timescaleDuration(b, mvhd)
      traks = walk(b, moov.payloadOff, moov.off + moov.len)
        .getOrElse(Vector.empty).filter(_.typ == "trak")
      tracks <- traverseTracks(b, traks)
      if tracks.nonEmpty
    } yield Mp4Info(timescale, duration, tracks,
      tops.filter(_.typ == "mdat").map(_.len.toLong).sum, tops)

    /** Every trak must parse — a trak the walk cannot make sense of
      * means the container is damaged, not "a container with fewer
      * tracks".
      */
    private def traverseTracks(b: Array[Byte],
        traks: Vector[Mp4Box]): Option[Vector[Mp4Track]] = {
      val parsed = traks.map(parseTrack(b, _))
      if (parsed.exists(_.isEmpty)) None else Some(parsed.flatten)
    }

    def decodeBatch(batch: Seq[Asset]): Seq[AssetFeatures] = batch.map { a =>
      parseMp4(a.content) match {
        case None => StubMediaKernel.decodeBatch(Seq(a)).head
        case Some(m) =>
          val video = m.tracks.find(_.handler == "vide")
          val samples = m.tracks.map(_.sampleCount.toLong).sum
          AssetFeatures(a.asset_id,
            video.map(_.width).getOrElse(0),
            video.map(_.height).getOrElse(0), Array(
              m.durationSec.toFloat,
              m.tracks.length.toFloat,
              m.tracks.count(_.handler == "vide").toFloat,
              m.tracks.count(_.handler == "soun").toFloat,
              samples.toFloat,
              (m.mdatBytes.toDouble / a.content.length).toFloat,
              (if (samples == 0) 0.0
               else m.mdatBytes.toDouble / samples).toFloat,
              m.topBoxes.length.toFloat))
      }
    }

    /** Sample-size-envelope thumbnail off the first track's stsz
      * table: `w*h` bytes, nearest-neighbor along samples, each byte
      * the sample's size requantized against the track's largest
      * sample — the container-level analog of the MP3 bitrate
      * envelope, all integer arithmetic.
      */
    def resizeBatch(batch: Seq[Asset], w: Int, h: Int): Seq[ResizedAsset] =
      batch.map { a =>
        parseMp4(a.content) match {
          case Some(m) if m.tracks.exists(_.sampleCount > 0) =>
            val sizes = m.tracks.find(_.sampleCount > 0).get.sampleSizes
            val mx = math.max(1, sizes.max)
            val thumb = Array.tabulate(w * h) { i =>
              val k = (i.toLong * sizes.length / (w.toLong * h)).toInt
              (sizes(k) * 255 / mx).toByte
            }
            ResizedAsset(a.asset_id, w, h, thumb)
          case _ => StubMediaKernel.resizeBatch(Seq(a), w, h).head
        }
      }

    /** Top-level boxes are the natural chunking a container walk
      * yields: each is one sample with its true byte span, every
      * `every`-th kept.
      */
    def frames(a: Asset, every: Int): Iterator[FrameSample] =
      parseMp4(a.content) match {
        case None => StubMediaKernel.frames(a, every)
        case Some(m) =>
          m.topBoxes.iterator.zipWithIndex.filter(_._2 % every == 0)
            .map { case (box, k) =>
              val bytes = java.util.Arrays.copyOfRange(
                a.content, box.off, box.off + box.len)
              FrameSample(a.asset_id, k, bytes.length.toLong,
                byteHash(bytes))
            }
      }
  }

  /** Pure-JVM kernel with REAL decode for YUV4MPEG2 (y4m) raw video —
    * the video sibling of [[PpmMediaKernel]]/[[WavMediaKernel]],
    * completing real decoders for all three mime families the asset
    * table synthesizes. y4m is uncompressed planar YUV behind a textual
    * header (the interchange format ffmpeg/x264 pipe between stages),
    * so a full parse — stream header, per-frame FRAME markers, plane
    * geometry per colorspace — needs no codec. Same dispatch contract:
    * malformed payloads take the stub arithmetic; Y4mKernelSpec pins
    * hand-computed statistics.
    *
    * Feature layout over the luma (and chroma where present) planes of
    * ALL frames: mean Y, std Y, mean per-pixel |ΔY| between consecutive
    * frames (motion proxy), cut fraction (transitions with mean |ΔY| >
    * 16/255), mean U, mean V (neutral 0.5 for mono), duration in
    * seconds (frames · den/num), dark fraction (Y < 64).
    */
  object Y4mMediaKernel extends MediaKernel {

    private[graft] final case class Y4mInfo(w: Int, h: Int, num: Int,
        den: Int, lumaBytes: Int, chromaBytes: Int,
        cs: String, frameOff: Array[Int]) {
      def frameBytes: Int = lumaBytes + 2 * chromaBytes
      def frames: Int = frameOff.length
    }

    /** Stream header + frame walk. Colorspaces: C420* (either chroma
      * siting suffix), C422, C444, Cmono; default C420jpeg per spec.
      * W/H must be positive (and even where the subsampling requires
      * it), every FRAME marker must be complete with its full plane
      * payload in-bounds, and at least one frame must exist — anything
      * else is an opaque blob for the stub.
      */
    private[graft] def parseY4m(b: Array[Byte]): Option[Y4mInfo] = {
      val magic = "YUV4MPEG2"
      if (b.length < magic.length + 1 ||
          !(0 until magic.length).forall(i => b(i) == magic.charAt(i).toByte))
        return None
      var eol = magic.length
      while (eol < b.length && b(eol) != '\n') eol += 1
      if (eol >= b.length) return None
      val params = new String(b, magic.length, eol - magic.length,
        "US-ASCII").trim.split("\\s+").filter(_.nonEmpty)
      var w, h = -1
      var num = 25
      var den = 1
      var cs = "420jpeg"
      for (p <- params) p.head match {
        case 'W' => w = p.tail.toIntOption.getOrElse(return None)
        case 'H' => h = p.tail.toIntOption.getOrElse(return None)
        case 'F' => p.tail.split(":") match {
          case Array(n, d) =>
            num = n.toIntOption.getOrElse(return None)
            den = d.toIntOption.getOrElse(return None)
            if (num <= 0 || den <= 0) return None
          case _ => return None
        }
        case 'C' => cs = p.tail
        case _ => () // I/A/X params don't affect the geometry
      }
      if (w <= 0 || h <= 0 || w.toLong * h > b.length) return None
      val luma = w * h
      // Normalized colorspace tag, CARRIED on Y4mInfo: frameRgb used to
      // re-derive it from chroma byte counts, whose claimed uniqueness
      // breaks on degenerate dimensions (h=1 C420 or w=1 C422 give
      // chromaBytes == 0 and silently decoded as mono with misaligned
      // plane offsets) — the parser read the tag, so the decoder
      // switches on it.
      val csNorm =
        if (cs.startsWith("420")) "420"
        else if (cs == "422") "422"
        else if (cs == "444") "444"
        else if (cs == "mono") "mono"
        else return None
      val chroma = csNorm match {
        case "420" =>
          if (w % 2 != 0 || h % 2 != 0) return None else (w / 2) * (h / 2)
        case "422" =>
          if (w % 2 != 0) return None else (w / 2) * h
        case "444" => luma
        case _ => 0
      }
      val frameBytes = luma + 2L * chroma
      val offs = Array.newBuilder[Int]
      var i = eol + 1
      while (i < b.length) {
        val fm = "FRAME"
        if (i + fm.length > b.length ||
            !(0 until fm.length).forall(j => b(i + j) == fm.charAt(j).toByte))
          return None
        var fe = i + fm.length
        while (fe < b.length && b(fe) != '\n') fe += 1
        if (fe >= b.length || frameBytes > b.length - fe - 1) return None
        offs += fe + 1
        i = fe + 1 + frameBytes.toInt
      }
      val arr = offs.result()
      if (arr.isEmpty) None
      else Some(Y4mInfo(w, h, num, den, luma, chroma, csNorm, arr))
    }

    private def planeSum(b: Array[Byte], off: Int, n: Int): Long = {
      var s = 0L
      var i = 0
      while (i < n) { s += b(off + i) & 0xff; i += 1 }
      s
    }

    /** One frame's RGB via full-range integer BT.601 (JPEG levels):
      * R = Y + 1.402·(V−128), G = Y − 0.344·(U−128) − 0.714·(V−128),
      * B = Y + 1.772·(U−128), in 16.16 fixed point — NEUTRAL chroma
      * (128) reproduces the luma byte EXACTLY, which is what keeps
      * grayscale planted streams oracle-exact while color streams take
      * the same genuine conversion. Chroma upsampling is nearest
      * (sample replication), the JPEG-kernel convention. Colorspace is
      * the tag the parser read (carried on Y4mInfo) — never re-derived
      * from plane geometry, which degenerate dimensions alias.
      */
    private def frameRgb(b: Array[Byte], info: Y4mInfo,
        off: Int): Array[Byte] = {
      val w = info.w; val h = info.h
      val rgb = new Array[Byte](3 * w * h)
      def clamp(v: Int): Byte =
        (if (v < 0) 0 else if (v > 255) 255 else v).toByte
      val uOff = off + info.lumaBytes
      val vOff = uOff + info.chromaBytes
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val yv = b(off + y * w + x) & 0xff
          val (u, v) = info.cs match {
            case "mono" => (128, 128)
            case "444" =>
              val ci = y * w + x
              (b(uOff + ci) & 0xff, b(vOff + ci) & 0xff)
            case "422" =>
              val ci = y * (w / 2) + x / 2
              (b(uOff + ci) & 0xff, b(vOff + ci) & 0xff)
            case _ => // 420
              val ci = (y / 2) * (w / 2) + x / 2
              (b(uOff + ci) & 0xff, b(vOff + ci) & 0xff)
          }
          val d = u - 128; val e = v - 128
          val q = 3 * (y * w + x)
          rgb(q) = clamp(yv + ((91881 * e) >> 16))
          rgb(q + 1) = clamp(yv - ((22554 * d + 46802 * e) >> 16))
          rgb(q + 2) = clamp(yv + ((116130 * d) >> 16))
          x += 1
        }
        y += 1
      }
      rgb
    }

    /** TRUE per-frame pixel access — the surface video near-dup
      * hashing reads; every `every`-th frame decodes to RGB.
      */
    override def rgbFrames(a: Asset,
        every: Int): Iterator[(Int, Int, Int, Array[Byte])] =
      parseY4m(a.content) match {
        case None => Iterator.empty
        case Some(info) =>
          info.frameOff.iterator.zipWithIndex
            .filter { case (_, idx) => idx % every == 0 }
            .map { case (off, idx) =>
              (idx, info.w, info.h, frameRgb(a.content, info, off)) }
      }

    def decodeBatch(batch: Seq[Asset]): Seq[AssetFeatures] = batch.map { a =>
      parseY4m(a.content) match {
        case None => StubMediaKernel.decodeBatch(Seq(a)).head
        case Some(v) =>
          val n = v.lumaBytes
          var sy, sy2, su, sv = 0L
          var dark = 0L
          var diffSum = 0L
          var cuts = 0
          for (f <- 0 until v.frames) {
            val off = v.frameOff(f)
            var i = 0
            while (i < n) {
              val y = a.content(off + i) & 0xff
              sy += y; sy2 += y.toLong * y
              if (y < 64) dark += 1
              i += 1
            }
            if (v.chromaBytes > 0) {
              su += planeSum(a.content, off + n, v.chromaBytes)
              sv += planeSum(a.content, off + n + v.chromaBytes, v.chromaBytes)
            }
            if (f > 0) {
              val prev = v.frameOff(f - 1)
              var d = 0L
              var j = 0
              while (j < n) {
                d += math.abs((a.content(off + j) & 0xff) -
                  (a.content(prev + j) & 0xff))
                j += 1
              }
              diffSum += d
              if (d.toDouble / n > 16.0) cuts += 1
            }
          }
          val px = n.toLong * v.frames
          val meanY = sy.toDouble / px
          val varY = sy2.toDouble / px - meanY * meanY
          val cpx = v.chromaBytes.toLong * v.frames
          AssetFeatures(a.asset_id, v.w, v.h, Array(
            (meanY / 255).toFloat,
            (math.sqrt(math.max(0.0, varY)) / 255).toFloat,
            (if (v.frames > 1)
              diffSum.toDouble / (n.toLong * (v.frames - 1)) / 255 else 0.0)
              .toFloat,
            (if (v.frames > 1) cuts.toDouble / (v.frames - 1) else 0.0)
              .toFloat,
            (if (cpx > 0) su.toDouble / cpx / 255 else 0.5).toFloat,
            (if (cpx > 0) sv.toDouble / cpx / 255 else 0.5).toFloat,
            (v.frames.toDouble * v.den / v.num).toFloat,
            (dark.toDouble / px).toFloat))
      }
    }

    /** Nearest-neighbor luma thumbnail of the FIRST frame (the poster
      * frame), same sampling rule as the PPM resizer.
      */
    def resizeBatch(batch: Seq[Asset], w: Int, h: Int): Seq[ResizedAsset] =
      batch.map { a =>
        parseY4m(a.content) match {
          case None => StubMediaKernel.resizeBatch(Seq(a), w, h).head
          case Some(v) =>
            val off = v.frameOff(0)
            val thumb = Array.tabulate(w * h) { i =>
              val sy = ((i / w).toLong * v.h / h).toInt
              val sx = ((i % w).toLong * v.w / w).toInt
              a.content(off + sy * v.w + sx)
            }
            ResizedAsset(a.asset_id, w, h, thumb)
        }
      }

    /** REAL video frames: every `every`-th frame's raw plane payload as
      * one sample — the shape the stub and the PPM/WAV analogs emulate.
      */
    def frames(a: Asset, every: Int): Iterator[FrameSample] =
      parseY4m(a.content) match {
        case None => StubMediaKernel.frames(a, every)
        case Some(v) =>
          (0 until v.frames).iterator.filter(_ % every == 0).map { k =>
            val frame = java.util.Arrays.copyOfRange(
              a.content, v.frameOff(k), v.frameOff(k) + v.frameBytes)
            FrameSample(a.asset_id, k, frame.length.toLong, byteHash(frame))
          }
      }
  }

  /** Pure-JVM kernel for FLAC audio. Two tiers, matching what each
    * operator actually needs:
    *
    *  - METERING (`decodeBatch`) stays a metadata-block walk, NO codec
    *    decode: like [[Mp4MediaKernel]], duration / channel layout /
    *    bit depth / compression ratio are fully determined by the
    *    mandatory STREAMINFO block, so metering never touches an
    *    entropy-coded byte — the cheap path a 100-TB metering scan
    *    takes. The magic, a complete block chain (each 1-byte
    *    type+last-flag header, 3-byte big-endian length, payload
    *    in-bounds, STREAMINFO first with its fixed 34-byte layout and
    *    a nonzero sample rate) and a last-block flag inside the
    *    payload are required; anything else is an opaque blob for the
    *    stub.
    *  - SAMPLE DECODE (`decodePcm`, serving `audioEnvelope` and so the
    *    audio near-dup fingerprints) is a full lossless frame decode
    *    per RFC 9639: frame-header sync/CRC-8 walk, constant /
    *    verbatim / fixed-predictor (orders 0-4) / LPC subframes,
    *    partitioned Rice residuals (4- and 5-bit parameters, escape
    *    partitions), wasted bits, the three stereo decorrelations
    *    (left/side, right/side, mid/side), per-frame CRC-16 — and the
    *    decoded PCM is verified against STREAMINFO's MD5, so a decode
    *    that is not bit-exact REFUSES rather than fingerprinting
    *    wrong samples. FLAC is the one compressed audio container
    *    that is losslessly decodable pure-JVM from scratch; lossy
    *    codecs (MP3) stay at the metering tier — that boundary is the
    *    SPI seam, not a TODO.
    *
    * FlacKernelSpec pins hand-built streams, encode→decode roundtrips
    * across subframe types / stereo modes / escapes, and tamper
    * refusal (CRC and MD5).
    *
    * `AssetFeatures.width`/`height` carry sample rate and channel
    * count (the WAV/MP3 convention). Feature layout: duration seconds,
    * total samples, bits per sample, metadata block count, audio byte
    * fraction of the payload, min block size, max block size, and the
    * compression ratio (coded audio bytes over the PCM bytes the
    * stream decodes to; 0 when the stream declares no samples).
    */
  object FlacMediaKernel extends MediaKernel {

    private[operators] final case class FlacInfo(sampleRate: Int,
        channels: Int, bitsPerSample: Int, totalSamples: Long,
        minBlock: Int, maxBlock: Int, nMetaBlocks: Int, audioOff: Int) {
      def durationSec: Double = totalSamples.toDouble / sampleRate
    }

    private def u16(b: Array[Byte], i: Int): Int =
      ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
    private def u24(b: Array[Byte], i: Int): Int =
      ((b(i) & 0xff) << 16) | ((b(i + 1) & 0xff) << 8) | (b(i + 2) & 0xff)
    private def u32(b: Array[Byte], i: Int): Long =
      ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
        ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

    /** Magic + metadata-block chain walk. STREAMINFO's packed layout
      * (RFC 9639 §8.2): u16 min/max block size, u24 min/max frame
      * size, then 20-bit sample rate, 3-bit channels-1, 5-bit bps-1,
      * 36-bit total samples, 16-byte MD5.
      */
    private[graft] def parseFlac(b: Array[Byte]): Option[FlacInfo] = {
      if (b.length < 4 + 4 + 34 || b(0) != 'f' || b(1) != 'L' ||
          b(2) != 'a' || b(3) != 'C') return None
      var i = 4
      var n = 0
      var info: Option[FlacInfo] = None
      var last = false
      while (!last) {
        if (i + 4 > b.length) return None
        val hdr = b(i) & 0xff
        last = (hdr & 0x80) != 0
        val typ = hdr & 0x7f
        val len = u24(b, i + 1)
        if (typ == 127) return None // forbidden type, per spec
        if (i + 4 + len > b.length) return None
        if (n == 0) {
          // STREAMINFO must be first, with its exact fixed length
          if (typ != 0 || len != 34) return None
          val s = i + 4
          val rate = ((b(s + 10) & 0xff) << 12) |
            ((b(s + 11) & 0xff) << 4) | ((b(s + 12) & 0xff) >> 4)
          if (rate == 0) return None
          val channels = ((b(s + 12) >> 1) & 7) + 1
          val bps = (((b(s + 12) & 1) << 4) |
            ((b(s + 13) >> 4) & 0xf)) + 1
          val total = ((b(s + 13) & 0xfL) << 32) | u32(b, s + 14)
          info = Some(FlacInfo(rate, channels, bps, total,
            u16(b, s), u16(b, s + 2), 0, 0))
        } else if (typ == 0) return None // duplicate STREAMINFO
        n += 1
        i += 4 + len
      }
      info.map(_.copy(nMetaBlocks = n, audioOff = i))
    }

    def decodeBatch(batch: Seq[Asset]): Seq[AssetFeatures] = batch.map { a =>
      parseFlac(a.content) match {
        case None => StubMediaKernel.decodeBatch(Seq(a)).head
        case Some(f) =>
          val audioBytes = (a.content.length - f.audioOff).toLong
          val pcmBytes =
            f.totalSamples * f.channels * f.bitsPerSample / 8.0
          AssetFeatures(a.asset_id, f.sampleRate, f.channels, Array(
            f.durationSec.toFloat,
            f.totalSamples.toFloat,
            f.bitsPerSample.toFloat,
            f.nMetaBlocks.toFloat,
            (audioBytes.toDouble / a.content.length).toFloat,
            f.minBlock.toFloat,
            f.maxBlock.toFloat,
            (if (pcmBytes > 0) audioBytes / pcmBytes else 0.0).toFloat))
      }
    }

    /** Coded-byte envelope thumbnail: `w*h` bytes, nearest-neighbor
      * over the audio region's raw coded bytes — without entropy
      * decode the coded stream itself is the only per-position signal,
      * and its local byte density tracks the frame structure the way
      * the MP3 bitrate envelope does. Empty audio regions (metadata-
      * only streams) fall back to the stub.
      */
    def resizeBatch(batch: Seq[Asset], w: Int, h: Int): Seq[ResizedAsset] =
      batch.map { a =>
        parseFlac(a.content) match {
          case Some(f) if a.content.length > f.audioOff =>
            val n = a.content.length - f.audioOff
            val thumb = Array.tabulate(w * h) { i =>
              a.content(f.audioOff + (i.toLong * n / (w.toLong * h)).toInt)
            }
            ResizedAsset(a.asset_id, w, h, thumb)
          case _ => StubMediaKernel.resizeBatch(Seq(a), w, h).head
        }
      }

    /** The container's own chunking: each metadata block (header
      * included) is one sample, then the audio region in fixed
      * [[FrameBytes]] chunks — FLAC frame boundaries are not
      * header-derivable without entropy decode, so the audio region
      * chunks like the stub while the metadata chain keeps its true
      * spans.
      */
    def frames(a: Asset, every: Int): Iterator[FrameSample] =
      parseFlac(a.content) match {
        case None => StubMediaKernel.frames(a, every)
        case Some(f) =>
          val blocks = {
            val out = Vector.newBuilder[(Int, Int)]
            var i = 4
            while (i < f.audioOff) {
              val len = 4 + u24(a.content, i + 1)
              out += ((i, len))
              i += len
            }
            out.result()
          }
          val audio = (f.audioOff until a.content.length by FrameBytes)
            .map(o => (o, math.min(FrameBytes, a.content.length - o)))
          (blocks ++ audio).iterator.zipWithIndex
            .filter(_._2 % every == 0)
            .map { case ((off, len), k) =>
              val bytes = java.util.Arrays.copyOfRange(
                a.content, off, off + len)
              FrameSample(a.asset_id, k, bytes.length.toLong,
                byteHash(bytes))
            }
      }

    // -----------------------------------------------------------------
    // Full sample decode (the lossless tier)
    // -----------------------------------------------------------------

    private object Bad extends RuntimeException { override def fillInStackTrace(): Throwable = this }

    /** MSB-first bit reader; `pos` is the byte offset in `b`. */
    private final class Br(val b: Array[Byte], var pos: Int) {
      private var cur = 0
      private var nbits = 0
      def bit(): Int = {
        if (nbits == 0) {
          if (pos >= b.length) throw Bad
          cur = b(pos) & 0xff; pos += 1; nbits = 8
        }
        nbits -= 1
        (cur >> nbits) & 1
      }
      def bits(n: Int): Long = {
        var v = 0L
        var i = 0
        while (i < n) { v = (v << 1) | bit(); i += 1 }
        v
      }
      /** Two's-complement signed read. */
      def sbits(n: Int): Long = {
        val v = bits(n)
        if (n > 0 && (v & (1L << (n - 1))) != 0) v - (1L << n) else v
      }
      def unary(): Int = {
        var q = 0
        // runaway guard in Long: an Int shift wraps negative past
        // 256 MiB and would reject every large valid stream
        while (bit() == 0) {
          q += 1; if (q > (b.length.toLong << 3)) throw Bad
        }
        q
      }
      /** Byte offset of the NEXT unread byte (only valid aligned). */
      def bytePos: Int = { if (nbits != 0) throw Bad; pos }
      def align(): Unit = nbits = 0
    }

    private val Crc8Poly = 0x07
    private val Crc16Poly = 0x8005

    private def crc8(b: Array[Byte], from: Int, until: Int): Int = {
      var c = 0
      var i = from
      while (i < until) {
        c ^= b(i) & 0xff
        var k = 0
        while (k < 8) {
          c = if ((c & 0x80) != 0) ((c << 1) ^ Crc8Poly) & 0xff
              else (c << 1) & 0xff
          k += 1
        }
        i += 1
      }
      c
    }

    private def crc16(b: Array[Byte], from: Int, until: Int): Int = {
      var c = 0
      var i = from
      while (i < until) {
        c ^= (b(i) & 0xff) << 8
        var k = 0
        while (k < 8) {
          c = if ((c & 0x8000) != 0) ((c << 1) ^ Crc16Poly) & 0xffff
              else (c << 1) & 0xffff
          k += 1
        }
        i += 1
      }
      c
    }

    /** The frame header's UTF-8-style coded number (≤ 36 bits). */
    private def codedNum(r: Br): Long = {
      val b0 = r.bits(8).toInt
      if ((b0 & 0x80) == 0) return b0.toLong
      var n = 0
      var m = 0x40
      while ((b0 & m) != 0) { n += 1; m >>= 1 }
      if (n < 1 || n > 6) throw Bad
      var v = (b0 & (m - 1)).toLong
      var i = 0
      while (i < n) {
        val c = r.bits(8).toInt
        if ((c & 0xc0) != 0x80) throw Bad
        v = (v << 6) | (c & 0x3f)
        i += 1
      }
      v
    }

    /** Partitioned-Rice residual into `out(order until n)`. */
    private def residual(r: Br, n: Int, order: Int,
        out: Array[Long]): Unit = {
      val method = r.bits(2).toInt
      if (method > 1) throw Bad
      val pbits = if (method == 0) 4 else 5
      val esc = (1 << pbits) - 1
      val po = r.bits(4).toInt
      val parts = 1 << po
      if (n % parts != 0) throw Bad
      var idx = order
      var p = 0
      while (p < parts) {
        val cnt = (n >> po) - (if (p == 0) order else 0)
        if (cnt < 0) throw Bad
        val param = r.bits(pbits).toInt
        if (param == esc) {
          val w = r.bits(5).toInt
          var i = 0
          while (i < cnt) {
            out(idx) = if (w == 0) 0L else r.sbits(w)
            idx += 1; i += 1
          }
        } else {
          var i = 0
          while (i < cnt) {
            val q = r.unary().toLong
            val u = (q << param) | r.bits(param)
            out(idx) = (u >>> 1) ^ -(u & 1L) // zigzag
            idx += 1; i += 1
          }
        }
        p += 1
      }
    }

    /** One subframe of `n` samples at `bps` effective input bits. */
    private def subframe(r: Br, n: Int, bps: Int): Array[Long] = {
      if (r.bit() != 0) throw Bad // mandatory zero pad bit
      val t = r.bits(6).toInt
      val wasted =
        if (r.bit() == 1) r.unary() + 1 else 0
      val eb = bps - wasted
      if (eb < 1 || eb > 33) throw Bad
      val s = new Array[Long](n)
      if (t == 0) { // constant
        val v = r.sbits(eb)
        java.util.Arrays.fill(s, v)
      } else if (t == 1) { // verbatim
        var i = 0
        while (i < n) { s(i) = r.sbits(eb); i += 1 }
      } else if ((t & 0x38) == 8 && (t & 7) <= 4) { // fixed
        val o = t & 7
        if (o > n) throw Bad
        var i = 0
        while (i < o) { s(i) = r.sbits(eb); i += 1 }
        residual(r, n, o, s)
        i = o
        while (i < n) {
          s(i) += (o match {
            case 0 => 0L
            case 1 => s(i - 1)
            case 2 => 2 * s(i - 1) - s(i - 2)
            case 3 => 3 * s(i - 1) - 3 * s(i - 2) + s(i - 3)
            case _ => 4 * s(i - 1) - 6 * s(i - 2) + 4 * s(i - 3) -
              s(i - 4)
          })
          i += 1
        }
      } else if ((t & 0x20) != 0) { // LPC
        val o = (t & 0x1f) + 1
        if (o > n) throw Bad
        var i = 0
        while (i < o) { s(i) = r.sbits(eb); i += 1 }
        val prec = r.bits(4).toInt + 1
        if (prec == 16) throw Bad // code 15 is invalid
        val shift = r.sbits(5).toInt
        if (shift < 0) throw Bad
        val coefs = Array.fill(o)(r.sbits(prec))
        residual(r, n, o, s)
        i = o
        while (i < n) {
          var acc = 0L
          var j = 0
          while (j < o) { acc += coefs(j) * s(i - 1 - j); j += 1 }
          s(i) += acc >> shift
          i += 1
        }
      } else throw Bad
      if (wasted > 0) {
        var i = 0
        while (i < n) { s(i) <<= wasted; i += 1 }
      }
      s
    }

    private val RateCodes = Array(0, 88200, 176400, 192000, 8000,
      16000, 22050, 24000, 32000, 44100, 48000, 96000)

    /** Full lossless decode: channel-interleaved samples, or None for
      * anything the spec rejects — a bad sync, CRC-8/CRC-16 mismatch,
      * a malformed subframe, a sample total that disagrees with
      * STREAMINFO, or decoded PCM whose MD5 differs from the one the
      * encoder signed. Refuse-don't-approximate: a fingerprint of
      * wrong samples is worse than no fingerprint.
      */
    private[graft] def decodePcm(
        b: Array[Byte]): Option[(FlacInfo, Array[Int])] =
      parseFlac(b).flatMap { f =>
        try {
          if (f.totalSamples <= 0 ||
              f.totalSamples > (1L << 24)) return None
          val nch = f.channels
          val out = new Array[Int](f.totalSamples.toInt * nch)
          var filled = 0L
          var pos = f.audioOff
          while (filled < f.totalSamples) {
            if (pos >= b.length) throw Bad
            val start = pos
            val r = new Br(b, pos)
            if (r.bits(14) != 0x3ffe) throw Bad // sync
            if (r.bit() != 0) throw Bad         // reserved
            r.bit()                             // blocking strategy
            val bsCode = r.bits(4).toInt
            val srCode = r.bits(4).toInt
            val chCode = r.bits(4).toInt
            val ssCode = r.bits(3).toInt
            if (r.bit() != 0) throw Bad
            codedNum(r)
            val blockSize = bsCode match {
              case 0 => throw Bad
              case 1 => 192
              case c if c <= 5 => 576 << (c - 2)
              case 6 => r.bits(8).toInt + 1
              case 7 => r.bits(16).toInt + 1
              case c => 256 << (c - 8)
            }
            srCode match { // value unused (STREAMINFO governs), but
              case 12 => r.bits(8)   // the coded forms must be walked
              case 13 | 14 => r.bits(16)
              case 15 => throw Bad
              case _ => ()
            }
            val bps = ssCode match {
              case 0 => f.bitsPerSample
              case 1 => 8
              case 2 => 12
              case 4 => 16
              case 5 => 20
              case 6 => 24
              case 7 => 32
              case _ => throw Bad
            }
            val hdrEnd = r.bytePos
            if (r.bits(8).toInt != crc8(b, start, hdrEnd)) throw Bad
            val chans: Array[Array[Long]] = chCode match {
              case c if c <= 7 =>
                if (c + 1 != nch) throw Bad
                Array.fill(c + 1)(subframe(r, blockSize, bps))
              case 8 => // left/side
                if (nch != 2) throw Bad
                val l = subframe(r, blockSize, bps)
                val sd = subframe(r, blockSize, bps + 1)
                var i = 0
                while (i < blockSize) { sd(i) = l(i) - sd(i); i += 1 }
                Array(l, sd)
              case 9 => // right/side (side first)
                if (nch != 2) throw Bad
                val sd = subframe(r, blockSize, bps + 1)
                val rt = subframe(r, blockSize, bps)
                var i = 0
                while (i < blockSize) { sd(i) = sd(i) + rt(i); i += 1 }
                Array(sd, rt)
              case 10 => // mid/side
                if (nch != 2) throw Bad
                val mid = subframe(r, blockSize, bps)
                val sd = subframe(r, blockSize, bps + 1)
                var i = 0
                while (i < blockSize) {
                  val m2 = (mid(i) << 1) | (sd(i) & 1L)
                  mid(i) = (m2 + sd(i)) >> 1
                  sd(i) = (m2 - sd(i)) >> 1
                  i += 1
                }
                Array(mid, sd)
              case _ => throw Bad
            }
            r.align()
            val frameEnd = r.bytePos
            if (r.bits(16).toInt != crc16(b, start, frameEnd)) throw Bad
            pos = r.bytePos
            val take = math.min(blockSize.toLong,
              f.totalSamples - filled).toInt
            if (take < blockSize && pos < b.length) throw Bad
            var i = 0
            while (i < take) {
              var c = 0
              while (c < nch) {
                val v = chans(c)(i)
                if (v < Int.MinValue || v > Int.MaxValue) throw Bad
                out((filled.toInt + i) * nch + c) = v.toInt
                c += 1
              }
              i += 1
            }
            filled += take
          }
          // STREAMINFO's MD5 signs the unencoded PCM: verify when the
          // sample size is whole-byte and the encoder signed one
          if (f.bitsPerSample % 8 == 0) {
            val md5 = java.util.Arrays.copyOfRange(b, 8 + 18, 8 + 34)
            if (md5.exists(_ != 0) &&
                !java.util.Arrays.equals(md5, pcmMd5(out, f)))
              throw Bad
          }
          Some((f, out))
        } catch { case Bad => None }
      }

    /** MD5 of channel-interleaved little-endian signed samples — the
      * STREAMINFO signature layout for whole-byte sample sizes.
      */
    private[graft] def pcmMd5(samples: Array[Int],
        f: FlacInfo): Array[Byte] = {
      val nbytes = f.bitsPerSample / 8
      val buf = new Array[Byte](samples.length * nbytes)
      var i = 0
      while (i < samples.length) {
        var k = 0
        while (k < nbytes) {
          buf(i * nbytes + k) = ((samples(i) >> (8 * k)) & 0xff).toByte
          k += 1
        }
        i += 1
      }
      java.security.MessageDigest.getInstance("MD5").digest(buf)
    }

    /** |amplitude| envelope — the WAV kernel's contract on decoded
      * FLAC samples: channel-averaged mono in 16-bit-rebased integer
      * units (bits ≤ 16 shift up, larger shift down), integer
      * division, frame t lands in bin t·bins/frames. A WAV and a FLAC
      * of the SAME PCM fingerprint identically (pinned in
      * FlacKernelSpec), which is what lets one oracle gate both
      * containers.
      */
    override def audioEnvelope(a: Asset, bins: Int): Option[Array[Long]] =
      decodePcm(a.content).filter(_._2.length > 0).flatMap {
        case (f, s) =>
          val frames = s.length / f.channels
          if (frames < bins) None
          else {
            val env = new Array[Long](bins)
            var t = 0
            while (t < frames) {
              var sum = 0L
              var c = 0
              while (c < f.channels) {
                val v = s(t * f.channels + c).toLong
                sum += (if (f.bitsPerSample <= 16)
                  v << (16 - f.bitsPerSample)
                else v >> (f.bitsPerSample - 16))
                c += 1
              }
              env((t.toLong * bins / frames).toInt) +=
                math.abs(sum / f.channels)
              t += 1
            }
            Some(env)
          }
      }

    // -----------------------------------------------------------------
    // Encoder (fixture + spec side): real spec-compliant streams —
    // fixed-predictor / constant / verbatim / LPC subframes,
    // partitioned-Rice residuals with optional escape, the three
    // stereo decorrelations, CRC-8/CRC-16, STREAMINFO MD5.
    // -----------------------------------------------------------------

    private[graft] final case class FlacEncOpts(blockSize: Int = 26,
        stereo: String = "indep", // indep | ls | rs | ms
        mode: String = "auto",    // auto | verbatim | constant | lpc
        forceEscape: Boolean = false,
        wasted: Int = 0) // declare w wasted bits (samples must be ≪-able)

    private final class Bw {
      private val out = new java.io.ByteArrayOutputStream()
      private var cur = 0
      private var nbits = 0
      def put(v: Long, n: Int): Unit = {
        var i = n - 1
        while (i >= 0) {
          cur = (cur << 1) | ((v >>> i) & 1L).toInt
          nbits += 1
          if (nbits == 8) { out.write(cur); cur = 0; nbits = 0 }
          i -= 1
        }
      }
      def alignZero(): Unit = if (nbits > 0) put(0L, 8 - nbits)
      def bytes: Array[Byte] = { require(nbits == 0); out.toByteArray }
    }

    private def zigzag(v: Long): Long = (v << 1) ^ (v >> 63)

    private def riceCost(res: Array[Long], from: Int, p: Int): Long = {
      var bits = 0L
      var i = from
      while (i < res.length) {
        bits += (zigzag(res(i)) >>> p) + 1 + p
        i += 1
      }
      bits
    }

    /** Residual coding: method 0 (4-bit Rice), one partition; the
      * parameter is the cost-optimal p ∈ [0,14], or the escape (raw
      * width) when forced or cheaper.
      */
    private def writeResidual(w: Bw, res: Array[Long], order: Int,
        forceEscape: Boolean): Unit = {
      w.put(0L, 2) // method: 4-bit Rice
      w.put(0L, 4) // partition order 0
      var width = 0
      var i = order
      while (i < res.length) {
        var need = 1
        while (need < 32 && (res(i) < -(1L << (need - 1)) ||
            res(i) >= (1L << (need - 1)))) need += 1
        if (need > width) width = need
        i += 1
      }
      var bestP = 0
      var bestCost = Long.MaxValue
      var p = 0
      while (p <= 14) {
        val c = riceCost(res, order, p)
        if (c < bestCost) { bestCost = c; bestP = p }
        p += 1
      }
      val n = res.length - order
      val rawCost = 5L + n.toLong * width
      if (forceEscape || rawCost < bestCost) {
        w.put(15L, 4) // escape
        w.put(width.toLong, 5)
        var i = order
        while (i < res.length) {
          w.put(res(i) & ((1L << width) - 1), width)
          i += 1
        }
      } else {
        w.put(bestP.toLong, 4)
        var i = order
        while (i < res.length) {
          val u = zigzag(res(i))
          val q = (u >>> bestP).toInt
          var k = 0
          while (k < q) { w.put(0L, 1); k += 1 }
          w.put(1L, 1)
          if (bestP > 0) w.put(u & ((1L << bestP) - 1), bestP)
          i += 1
        }
      }
    }

    /** LPC constants for mode="lpc": order 2, pred = (9a − 4b) >> 2 —
      * a genuine quantized-coefficient path, distinct from every
      * fixed predictor.
      */
    private val LpcCoefs = Array(9L, -4L)
    private val LpcShift = 2
    private val LpcPrec = 5

    private def writeSubframe(w: Bw, s0: Array[Long], bps0: Int,
        opts: FlacEncOpts): Unit = {
      // wasted bits: every sample must carry `wasted` trailing zeros;
      // the subframe codes s >> wasted at bps − wasted effective bits
      val s = if (opts.wasted == 0) s0 else s0.map { v =>
        require((v & ((1L << opts.wasted) - 1)) == 0,
          "wasted-bit encode needs samples with that many trailing zeros")
        v >> opts.wasted
      }
      val bps = bps0 - opts.wasted
      val n = s.length
      w.put(0L, 1) // pad
      // the wasted-bits field follows the 6 type bits: flag 0, or
      // flag 1 + unary(wasted − 1)
      def putWasted(): Unit =
        if (opts.wasted == 0) w.put(0L, 1)
        else { w.put(1L, 1); w.put(1L, opts.wasted) } // w−1 zeros then 1
      val constant = opts.mode != "verbatim" && s.forall(_ == s(0))
      if (opts.mode == "constant" && !constant)
        throw new IllegalArgumentException("constant mode on varying samples")
      if (constant && opts.mode != "lpc") {
        w.put(0L, 6); putWasted()
        w.put(s(0) & ((1L << bps) - 1), bps)
      } else if (opts.mode == "verbatim") {
        w.put(1L, 6); putWasted()
        var i = 0
        while (i < n) { w.put(s(i) & ((1L << bps) - 1), bps); i += 1 }
      } else if (opts.mode == "lpc" && n > 2) {
        // blocks too short for the order-2 predictor (a ragged last
        // frame) fall through to the fixed-predictor branch — the
        // mode is a knob, the stream must stay valid at every length
        val o = 2
        w.put(0x20L | (o - 1), 6); putWasted()
        var i = 0
        while (i < o) { w.put(s(i) & ((1L << bps) - 1), bps); i += 1 }
        w.put((LpcPrec - 1).toLong, 4)
        w.put(LpcShift.toLong, 5)
        LpcCoefs.foreach(c => w.put(c & ((1L << LpcPrec) - 1), LpcPrec))
        val res = new Array[Long](n)
        i = o
        while (i < n) {
          res(i) = s(i) -
            ((LpcCoefs(0) * s(i - 1) + LpcCoefs(1) * s(i - 2)) >> LpcShift)
          i += 1
        }
        writeResidual(w, res, o, opts.forceEscape)
      } else { // auto: best fixed predictor 0..2 by |residual| sum
        var bestO = 0
        var bestRes: Array[Long] = null
        var bestSum = Long.MaxValue
        var o = 0
        while (o <= math.min(2, n - 1)) {
          val res = new Array[Long](n)
          var sum = 0L
          var i = o
          while (i < n) {
            res(i) = o match {
              case 0 => s(i)
              case 1 => s(i) - s(i - 1)
              case _ => s(i) - 2 * s(i - 1) + s(i - 2)
            }
            sum += math.abs(res(i))
            i += 1
          }
          if (sum < bestSum) { bestSum = sum; bestO = o; bestRes = res }
          o += 1
        }
        w.put(8L | bestO, 6); putWasted()
        var i = 0
        while (i < bestO) { w.put(s(i) & ((1L << bps) - 1), bps); i += 1 }
        writeResidual(w, bestRes, bestO, opts.forceEscape)
      }
    }

    /** Encode channel-planar samples into a complete FLAC stream
      * (STREAMINFO + frames). `bits` ∈ {8, 16}; stereo modes apply
      * only to 2-channel input.
      */
    private[graft] def encodeFlac(chs: Array[Array[Int]], rate: Int,
        bits: Int, opts: FlacEncOpts = FlacEncOpts()): Array[Byte] = {
      require(bits == 8 || bits == 16)
      require(chs.nonEmpty && chs.forall(_.length == chs(0).length))
      require(opts.stereo == "indep" || chs.length == 2)
      require(opts.blockSize >= 2 && opts.blockSize <= 256)
      val nch = chs.length
      val total = chs(0).length
      val frames = new scala.collection.mutable.ArrayBuffer[Array[Byte]]()
      var off = 0
      var frameIdx = 0L
      while (off < total) {
        val bs = math.min(opts.blockSize, total - off)
        val w = new Bw
        w.put(0x3ffeL, 14) // sync
        w.put(0L, 1)       // reserved
        w.put(0L, 1)       // fixed blocking
        w.put(6L, 4)       // block size: 8-bit at end of header
        w.put(0L, 4)       // sample rate: from STREAMINFO
        val chCode = opts.stereo match {
          case "ls" => 8L
          case "rs" => 9L
          case "ms" => 10L
          case _ => (nch - 1).toLong
        }
        w.put(chCode, 4)
        w.put(if (bits == 8) 1L else 4L, 3)
        w.put(0L, 1)
        // UTF-8-style frame number (two-byte form past 127)
        if (frameIdx < 128) w.put(frameIdx, 8)
        else {
          require(frameIdx < 2048)
          w.put(0xc0L | (frameIdx >> 6), 8)
          w.put(0x80L | (frameIdx & 0x3f), 8)
        }
        w.put((bs - 1).toLong, 8)
        val hdr = w.bytes
        val w2 = new Bw
        val slice = (c: Int) =>
          Array.tabulate(bs)(i => chs(c)(off + i).toLong)
        opts.stereo match {
          case "ls" =>
            val l = slice(0); val r = slice(1)
            writeSubframe(w2, l, bits, opts)
            writeSubframe(w2, Array.tabulate(bs)(i => l(i) - r(i)),
              bits + 1, opts)
          case "rs" =>
            val l = slice(0); val r = slice(1)
            writeSubframe(w2, Array.tabulate(bs)(i => l(i) - r(i)),
              bits + 1, opts)
            writeSubframe(w2, r, bits, opts)
          case "ms" =>
            val l = slice(0); val r = slice(1)
            writeSubframe(w2, Array.tabulate(bs)(i => (l(i) + r(i)) >> 1),
              bits, opts)
            writeSubframe(w2, Array.tabulate(bs)(i => l(i) - r(i)),
              bits + 1, opts)
          case _ =>
            var c = 0
            while (c < nch) { writeSubframe(w2, slice(c), bits, opts); c += 1 }
        }
        w2.alignZero()
        val body = w2.bytes
        val frame = new java.io.ByteArrayOutputStream()
        frame.write(hdr)
        frame.write(crc8(hdr, 0, hdr.length))
        frame.write(body)
        val soFar = frame.toByteArray
        val c16 = crc16(soFar, 0, soFar.length)
        frame.write((c16 >> 8) & 0xff)
        frame.write(c16 & 0xff)
        frames += frame.toByteArray
        off += bs
        frameIdx += 1
      }
      val minF = if (frames.isEmpty) 0 else frames.map(_.length).min
      val maxF = if (frames.isEmpty) 0 else frames.map(_.length).max
      val interleaved = new Array[Int](total * nch)
      var i = 0
      while (i < total) {
        var c = 0
        while (c < nch) { interleaved(i * nch + c) = chs(c)(i); c += 1 }
        i += 1
      }
      val md5 = pcmMd5(interleaved,
        FlacInfo(rate, nch, bits, total.toLong, 0, 0, 0, 0))
      val out = new java.io.ByteArrayOutputStream()
      out.write("fLaC".getBytes("US-ASCII"))
      out.write(0x80); out.write(0); out.write(0); out.write(34)
      val si = new Bw
      si.put(opts.blockSize.toLong, 16)      // min block
      si.put(opts.blockSize.toLong, 16)      // max block
      si.put(minF.toLong, 24)                // min frame size
      si.put(maxF.toLong, 24)                // max frame size
      si.put(rate.toLong, 20)
      si.put((nch - 1).toLong, 3)
      si.put((bits - 1).toLong, 5)
      si.put(total.toLong, 36)
      out.write(si.bytes)
      out.write(md5)
      frames.foreach(f => out.write(f))
      out.toByteArray
    }
  }

  /** Pure-JVM kernel for Matroska/WebM video containers — an EBML
    * element walk, NO codec decode: the Matroska sibling of
    * [[Mp4MediaKernel]]'s box walk. Every Matroska element is
    * (vint id, vint size, payload), so duration (Info's float
    * Duration × TimestampScale), track layout (Tracks → TrackEntry →
    * TrackType / Video PixelWidth/Height / Audio
    * SamplingFrequency+Channels) and the media-payload share (Cluster
    * byte spans) all fall out of the element tree without touching a
    * coded frame. The EBML header must come first and elements must
    * tile their parent exactly; an unknown (all-ones) size is accepted
    * ONLY on the Segment (the live-muxing convention — it then extends
    * to EOF). Anything else — a truncated vint, an overrunning
    * element, a video track without dimensions, no tracks — is an
    * opaque blob for the stub. MkvKernelSpec pins hand-built trees.
    *
    * `AssetFeatures.width`/`height` carry the first video track's
    * pixel dimensions (the MP4 convention; 0×0 when no video track).
    * Feature layout: duration seconds, track count, video track
    * count, audio track count, cluster count, cluster byte fraction
    * of the payload, first audio track's sampling rate (0 when none),
    * first audio track's channel count (0 when none).
    */
  object MkvMediaKernel extends MediaKernel {

    private[operators] final case class Elem(id: Long, off: Int,
        payloadOff: Int, payloadLen: Int)
    private[operators] final case class MkvTrack(typ: Int, w: Int,
        h: Int, freq: Double, channels: Int)
    private[operators] final case class MkvInfo(tsScale: Long,
        durTicks: Double, tracks: Vector[MkvTrack],
        segChildren: Vector[Elem]) {
      def clusters: Vector[Elem] = segChildren.filter(_.id == IdCluster)
      def durationSec: Double = durTicks * tsScale / 1e9
    }

    private val IdEbml = 0x1A45DFA3L
    private val IdSegment = 0x18538067L
    private val IdInfo = 0x1549A966L
    private val IdTimestampScale = 0x2AD7B1L
    private val IdDuration = 0x4489L
    private val IdTracks = 0x1654AE6BL
    private val IdTrackEntry = 0xAEL
    private val IdTrackType = 0x83L
    private val IdVideo = 0xE0L
    private val IdPixelWidth = 0xB0L
    private val IdPixelHeight = 0xBAL
    private val IdAudio = 0xE1L
    private val IdSamplingFrequency = 0xB5L
    private val IdChannels = 0x9FL
    private val IdCluster = 0x1F43B675L

    /** Element ID at `i`: 1–4 bytes, marker bit KEPT (the raw-ID
      * convention Matroska specs use). Returns (id, bytesRead).
      */
    private def readId(b: Array[Byte], i: Int): Option[(Long, Int)] = {
      if (i >= b.length) return None
      val first = b(i) & 0xff
      val n = Integer.numberOfLeadingZeros(first) - 23 // 1..8 for bit 7..0
      if (n < 1 || n > 4 || i + n > b.length) return None
      var v = first.toLong
      for (k <- 1 until n) v = (v << 8) | (b(i + k) & 0xff)
      Some((v, n))
    }

    /** Element size at `i`: 1–8 bytes, marker bit STRIPPED; the
      * all-value-bits-ones pattern means "unknown", returned as -1.
      */
    private def readSize(b: Array[Byte], i: Int): Option[(Long, Int)] = {
      if (i >= b.length) return None
      val first = b(i) & 0xff
      val n = Integer.numberOfLeadingZeros(first) - 23
      if (n < 1 || n > 8 || i + n > b.length) return None
      var v = (first & (0xff >> n)).toLong
      for (k <- 1 until n) v = (v << 8) | (b(i + k) & 0xff)
      val allOnes = (1L << (7 * n)) - 1
      Some((if (v == allOnes) -1L else v, n))
    }

    /** Walk the elements tiling [from, until): known sizes must fit
      * exactly; an unknown size is accepted only when
      * `unknownToEnd` contains the element's id (it then extends to
      * `until` and must be last). None on any overrun or gap.
      */
    private def walk(b: Array[Byte], from: Int, until: Int,
        unknownToEnd: Set[Long] = Set.empty): Option[Vector[Elem]] = {
      val out = Vector.newBuilder[Elem]
      var i = from
      while (i < until) {
        val (id, idLen) = readId(b, i).getOrElse(return None)
        val (size, szLen) = readSize(b, i + idLen).getOrElse(return None)
        val pOff = i + idLen + szLen
        val pLen =
          if (size >= 0) {
            if (size > until - pOff) return None
            size.toInt
          } else if (unknownToEnd.contains(id)) until - pOff
          else return None
        out += Elem(id, i, pOff, pLen)
        i = pOff + pLen
      }
      Some(out.result())
    }

    private def childrenOf(b: Array[Byte], e: Elem): Option[Vector[Elem]] =
      walk(b, e.payloadOff, e.payloadOff + e.payloadLen)

    /** Big-endian unsigned integer payload (0–8 bytes; empty = 0,
      * the EBML convention).
      */
    private def uintOf(b: Array[Byte], e: Elem): Option[Long] =
      if (e.payloadLen > 8) None
      else {
        var v = 0L
        for (k <- 0 until e.payloadLen)
          v = (v << 8) | (b(e.payloadOff + k) & 0xff)
        Some(v)
      }

    /** EBML float payload: 4 or 8 bytes (0 bytes = 0.0 per spec). */
    private def floatOf(b: Array[Byte], e: Elem): Option[Double] =
      e.payloadLen match {
        case 0 => Some(0.0)
        case 4 =>
          var bits = 0
          for (k <- 0 until 4) bits = (bits << 8) | (b(e.payloadOff + k) & 0xff)
          Some(java.lang.Float.intBitsToFloat(bits).toDouble)
        case 8 =>
          var bits = 0L
          for (k <- 0 until 8) bits = (bits << 8) | (b(e.payloadOff + k) & 0xff)
          Some(java.lang.Double.longBitsToDouble(bits))
        case _ => None
      }

    private def find(kids: Vector[Elem], id: Long): Option[Elem] =
      kids.find(_.id == id)

    /** A TrackEntry must carry a TrackType; a video track (type 1)
      * must carry pixel dimensions; audio parameters take the spec
      * defaults (8000 Hz, 1 channel) when the Audio element or its
      * children are absent.
      */
    private def parseTrack(b: Array[Byte],
        entry: Elem): Option[MkvTrack] = for {
      kids <- childrenOf(b, entry)
      typEl <- find(kids, IdTrackType)
      typ <- uintOf(b, typEl)
      dims <-
        if (typ != 1) Some((0, 0))
        else for {
          video <- find(kids, IdVideo)
          vkids <- childrenOf(b, video)
          w <- find(vkids, IdPixelWidth).flatMap(uintOf(b, _))
          h <- find(vkids, IdPixelHeight).flatMap(uintOf(b, _))
          if w > 0 && h > 0
        } yield (w.toInt, h.toInt)
      audio = find(kids, IdAudio).flatMap(childrenOf(b, _))
      freq <- audio.flatMap(find(_, IdSamplingFrequency)) match {
        case Some(e) => floatOf(b, e)
        case None => Some(8000.0)
      }
      channels <- audio.flatMap(find(_, IdChannels)) match {
        case Some(e) => uintOf(b, e)
        case None => Some(1L)
      }
    } yield MkvTrack(typ.toInt, dims._1, dims._2,
      if (typ == 2) freq else 0.0,
      if (typ == 2) channels.toInt else 0)

    private[graft] def parseMkv(b: Array[Byte]): Option[MkvInfo] = for {
      tops <- walk(b, 0, b.length, unknownToEnd = Set(IdSegment))
      if tops.headOption.exists(_.id == IdEbml)
      seg <- tops.find(_.id == IdSegment)
      segKids <- childrenOf(b, seg)
      info <- find(segKids, IdInfo)
      infoKids <- childrenOf(b, info)
      tsScale <- find(infoKids, IdTimestampScale) match {
        case Some(e) => uintOf(b, e)
        case None => Some(1000000L) // spec default: 1 ms ticks
      }
      durTicks <- find(infoKids, IdDuration) match {
        case Some(e) => floatOf(b, e)
        case None => Some(0.0)
      }
      tracksEl <- find(segKids, IdTracks)
      entries <- childrenOf(b, tracksEl)
      tracks <- traverseTracks(b, entries.filter(_.id == IdTrackEntry))
      if tracks.nonEmpty
    } yield MkvInfo(tsScale, durTicks, tracks, segKids)

    /** Every TrackEntry must parse — an entry the walk cannot make
      * sense of means the container is damaged, not "fewer tracks".
      */
    private def traverseTracks(b: Array[Byte],
        entries: Vector[Elem]): Option[Vector[MkvTrack]] = {
      val parsed = entries.map(parseTrack(b, _))
      if (parsed.exists(_.isEmpty)) None else Some(parsed.flatten)
    }

    def decodeBatch(batch: Seq[Asset]): Seq[AssetFeatures] = batch.map { a =>
      parseMkv(a.content) match {
        case None => StubMediaKernel.decodeBatch(Seq(a)).head
        case Some(m) =>
          val video = m.tracks.find(_.typ == 1)
          val audio = m.tracks.find(_.typ == 2)
          val clusterBytes = m.clusters
            .map(c => (c.payloadOff + c.payloadLen - c.off).toLong).sum
          AssetFeatures(a.asset_id,
            video.map(_.w).getOrElse(0),
            video.map(_.h).getOrElse(0), Array(
              m.durationSec.toFloat,
              m.tracks.length.toFloat,
              m.tracks.count(_.typ == 1).toFloat,
              m.tracks.count(_.typ == 2).toFloat,
              m.clusters.length.toFloat,
              (clusterBytes.toDouble / a.content.length).toFloat,
              audio.map(_.freq).getOrElse(0.0).toFloat,
              audio.map(_.channels).getOrElse(0).toFloat))
      }
    }

    /** Cluster-size envelope thumbnail: `w*h` bytes, nearest-neighbor
      * along clusters, each byte the cluster's total span requantized
      * against the largest — the Matroska analog of the MP4
      * sample-size envelope. Cluster-less containers fall back to the
      * stub.
      */
    def resizeBatch(batch: Seq[Asset], w: Int, h: Int): Seq[ResizedAsset] =
      batch.map { a =>
        parseMkv(a.content) match {
          case Some(m) if m.clusters.nonEmpty =>
            val sizes = m.clusters
              .map(c => c.payloadOff + c.payloadLen - c.off)
            val mx = math.max(1, sizes.max)
            val thumb = Array.tabulate(w * h) { i =>
              val k = (i.toLong * sizes.length / (w.toLong * h)).toInt
              (sizes(k) * 255 / mx).toByte
            }
            ResizedAsset(a.asset_id, w, h, thumb)
          case _ => StubMediaKernel.resizeBatch(Seq(a), w, h).head
        }
      }

    /** The Segment's top-level elements (Info, Tracks, each Cluster …)
      * are the natural chunking the element walk yields: each is one
      * sample with its true byte span, every `every`-th kept.
      */
    def frames(a: Asset, every: Int): Iterator[FrameSample] =
      parseMkv(a.content) match {
        case None => StubMediaKernel.frames(a, every)
        case Some(m) =>
          m.segChildren.iterator.zipWithIndex.filter(_._2 % every == 0)
            .map { case (e, k) =>
              val bytes = java.util.Arrays.copyOfRange(
                a.content, e.off, e.payloadOff + e.payloadLen)
              FrameSample(a.asset_id, k, bytes.length.toLong,
                byteHash(bytes))
            }
      }
  }

  /** Pure-JVM kernel with REAL decode for PNG images — the first
    * REAL-WORLD container in the kernel mix (PPM/WAV/Y4M are
    * headerless-simple interchange formats; PNG is what an actual
    * crawled corpus contains). Full pipeline with no media library:
    * signature + CRC-checked chunk walk, IHDR/PLTE/IDAT assembly,
    * zlib inflate (`java.util.zip.Inflater`), per-scanline unfilter
    * (all five PNG filter types incl. Paeth), and color-type expansion
    * (gray / RGB / palette / gray+alpha / RGBA, 8-bit depth) to a flat
    * RGB frame. Same dispatch contract as the other kernels: anything
    * else — interlaced, 16-bit, bad CRC, truncated IDAT — is an opaque
    * blob for the stub, so the oracle-gated queries hold byte-identical
    * with this kernel active. PngKernelSpec pins hand-computed pixels
    * through a from-scratch encoder.
    *
    * Feature layout matches [[PpmMediaKernel]] exactly (mean R/G/B,
    * mean luma, max R/G/B, bright fraction — all over 255), so an
    * image's statistics are container-invariant: the SAME pixels as
    * P6 or PNG yield the SAME feature vector (pinned in the spec).
    */
  object PngMediaKernel extends RgbFrameKernel {

    private[graft] final case class PngImage(w: Int, h: Int,
        rgb: Array[Byte])

    private val Signature =
      Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

    /** Max decoded RGB bytes (64 MB): an inflate bound, not a format
      * rule — a 4-KB zip-bomb IDAT claiming a 10⁹-pixel IHDR must not
      * allocate the claim.
      */
    private val MaxPixelBytes = 64 << 20

    private def beU32(b: Array[Byte], i: Int): Long =
      ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
        ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

    /** Full PNG decode to a flat RGB8 frame; None for anything this
      * kernel does not carry (16-bit depth, Adam7 interlace, unknown
      * color type, CRC mismatch, truncated or oversized streams) —
      * an opaque blob, not a decode error.
      */
    private[graft] def decodePng(b: Array[Byte]): Option[PngImage] = {
      if (b.length < Signature.length + 12 ||
          !Signature.indices.forall(i => b(i) == Signature(i))) return None
      var i = Signature.length
      var w, h, colorType = -1
      var plte: Array[Byte] = null
      val idat = new java.io.ByteArrayOutputStream()
      var ended = false
      while (!ended) {
        if (i + 12 > b.length) return None // no room for len+type+crc
        val len = beU32(b, i)
        if (len > b.length - i - 12) return None // chunk overruns payload
        val n = len.toInt
        val crc = new java.util.zip.CRC32()
        crc.update(b, i + 4, 4 + n)
        if (crc.getValue != beU32(b, i + 8 + n)) return None
        val t = new String(b, i + 4, 4, "US-ASCII")
        t match {
          case "IHDR" =>
            if (n != 13 || w >= 0) return None // exactly one, first seen
            val (ww, hh) = (beU32(b, i + 8), beU32(b, i + 12))
            // 8-bit depth, compression 0, filter 0, no interlace only
            if (ww < 1 || hh < 1 || ww > Int.MaxValue || hh > Int.MaxValue ||
                b(i + 16) != 8 || b(i + 18) != 0 || b(i + 19) != 0 ||
                b(i + 20) != 0) return None
            w = ww.toInt; h = hh.toInt
            colorType = b(i + 17) & 0xff
          case "PLTE" =>
            if (n == 0 || n % 3 != 0 || n > 768) return None
            plte = java.util.Arrays.copyOfRange(b, i + 8, i + 8 + n)
          case "IDAT" => idat.write(b, i + 8, n)
          case "IEND" => ended = true
          case _ => () // ancillary chunks don't affect the pixels
        }
        i += 12 + n
      }
      if (w < 0 || idat.size == 0) return None
      val channels = colorType match {
        case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
        case _ => return None
      }
      if (colorType == 3 && plte == null) return None
      val stride = w.toLong * channels
      // Overflow-safe size guards (w and h are attacker-controlled up
      // to 2^31-1 each, so their product can wrap a Long): bound the
      // filtered raw bytes AND the decoded RGB frame — the comment's
      // "never allocate the claim" must hold for 1-channel color types
      // too, where raw is a third of the RGB expansion.
      if (stride + 1 > MaxPixelBytes / h) return None
      if (w > MaxPixelBytes / 3 / h) return None
      val rawLen = (h * (stride + 1)).toInt
      val raw = new Array[Byte](rawLen)
      val inf = new java.util.zip.Inflater()
      inf.setInput(idat.toByteArray)
      var off = 0
      try {
        while (off < rawLen && !inf.finished()) {
          val got = inf.inflate(raw, off, rawLen - off)
          if (got == 0 && (inf.needsInput() || inf.needsDictionary()))
            return None // truncated or preset-dictionary stream
          off += got
        }
      } catch {
        case _: java.util.zip.DataFormatException => return None
      } finally inf.end()
      if (off != rawLen) return None
      // per-scanline unfilter, in place into the filtered-bytes-stripped
      // frame; `left` reaches back one PIXEL (channels bytes), per spec
      val sw = stride.toInt
      val out = new Array[Byte](h * sw)
      var y = 0
      while (y < h) {
        val ft = raw(y * (sw + 1)) & 0xff
        val src = y * (sw + 1) + 1
        val dst = y * sw
        var x = 0
        while (x < sw) {
          val cur = raw(src + x) & 0xff
          val left = if (x >= channels) out(dst + x - channels) & 0xff else 0
          val up = if (y > 0) out(dst - sw + x) & 0xff else 0
          val ul =
            if (y > 0 && x >= channels) out(dst - sw + x - channels) & 0xff
            else 0
          val rec = ft match {
            case 0 => cur
            case 1 => cur + left
            case 2 => cur + up
            case 3 => cur + (left + up) / 2
            case 4 =>
              // Paeth predictor: nearest of left/up/upper-left to their
              // linear estimate, ties left > up > upper-left
              val p = left + up - ul
              val (pa, pb, pc) =
                (math.abs(p - left), math.abs(p - up), math.abs(p - ul))
              cur + (if (pa <= pb && pa <= pc) left
                     else if (pb <= pc) up
                     else ul)
            case _ => return None
          }
          out(dst + x) = rec.toByte
          x += 1
        }
        y += 1
      }
      // expand every color type to flat RGB (alpha dropped — statistics
      // are over the color channels, the PPM-parity contract)
      val rgb = new Array[Byte](w * h * 3)
      var p = 0
      while (p < w * h) {
        colorType match {
          case 2 | 6 =>
            val q = p * channels
            rgb(3 * p) = out(q); rgb(3 * p + 1) = out(q + 1)
            rgb(3 * p + 2) = out(q + 2)
          case 0 | 4 =>
            val g = out(p * channels)
            rgb(3 * p) = g; rgb(3 * p + 1) = g; rgb(3 * p + 2) = g
          case 3 =>
            val idx = out(p) & 0xff
            if (3 * idx + 2 >= plte.length) return None
            rgb(3 * p) = plte(3 * idx); rgb(3 * p + 1) = plte(3 * idx + 1)
            rgb(3 * p + 2) = plte(3 * idx + 2)
        }
        p += 1
      }
      Some(PngImage(w, h, rgb))
    }

    protected def decodeRgb(b: Array[Byte]): Option[(Int, Int, Array[Byte])] =
      // belt to the parser's own guards: NO malformed payload may
      // escape as an exception — the opaque-blob contract
      try decodePng(b).map(img => (img.w, img.h, img.rgb))
      catch { case _: RuntimeException => None }
  }

  /** Shared serve-side arithmetic for kernels that decode a container
    * to a flat 8-bit RGB frame ([[PngMediaKernel]],
    * [[JpegMediaKernel]]): identical statistics, thumbnail sampling and
    * row hashing to [[PpmMediaKernel]], so an image's readouts are
    * container-invariant — only `decodeRgb` differs per format, and a
    * payload it rejects takes the stub arithmetic exactly.
    */
  sealed trait RgbFrameKernel extends MediaKernel {

    /** (width, height, 3·w·h RGB bytes), or None for a payload this
      * container's decoder does not carry (→ stub fallback).
      */
    protected def decodeRgb(b: Array[Byte]): Option[(Int, Int, Array[Byte])]

    override def rgbFrame(a: Asset): Option[(Int, Int, Array[Byte])] =
      decodeRgb(a.content)

    def decodeBatch(batch: Seq[Asset]): Seq[AssetFeatures] = batch.map { a =>
      decodeRgb(a.content) match {
        case None => StubMediaKernel.decodeBatch(Seq(a)).head
        case Some((w, h, rgb)) =>
          val n = w * h
          var sr, sg, sb = 0L
          var mr, mg, mb = 0
          var bright = 0
          var p = 0
          while (p < n) {
            val r = rgb(3 * p) & 0xff
            val g = rgb(3 * p + 1) & 0xff
            val b = rgb(3 * p + 2) & 0xff
            sr += r; sg += g; sb += b
            if (r > mr) mr = r
            if (g > mg) mg = g
            if (b > mb) mb = b
            if (2L * (r + g + b) > 3L * 255) bright += 1
            p += 1
          }
          val d = 255.0 * n
          AssetFeatures(a.asset_id, w, h, Array(
            (sr / d).toFloat, (sg / d).toFloat, (sb / d).toFloat,
            ((sr + sg + sb) / (3.0 * d)).toFloat,
            (mr / 255.0).toFloat, (mg / 255.0).toFloat,
            (mb / 255.0).toFloat,
            (bright.toDouble / n).toFloat))
      }
    }

    /** Nearest-neighbor luma thumbnail, the [[PpmMediaKernel]] sampling
      * rule over the decoded RGB frame.
      */
    def resizeBatch(batch: Seq[Asset], w: Int, h: Int): Seq[ResizedAsset] =
      batch.map { a =>
        decodeRgb(a.content) match {
          case None => StubMediaKernel.resizeBatch(Seq(a), w, h).head
          case Some((sw, sh, rgb)) =>
            val thumb = Array.tabulate(w * h) { i =>
              val sy = ((i / w).toLong * sh / h).toInt
              val sx = ((i % w).toLong * sw / w).toInt
              val q = 3 * (sy * sw + sx)
              (((rgb(q) & 0xff) + (rgb(q + 1) & 0xff) +
                (rgb(q + 2) & 0xff)) / 3).toByte
            }
            ResizedAsset(a.asset_id, w, h, thumb)
        }
      }

    /** Every `every`-th DECODED pixel row as one sample (3·width bytes,
      * portable hash) — identical sample semantics to the PPM row
      * sampler, so the same pixels hash the same whichever container
      * carried them.
      */
    def frames(a: Asset, every: Int): Iterator[FrameSample] =
      decodeRgb(a.content) match {
        case None => StubMediaKernel.frames(a, every)
        case Some((w, h, rgb)) =>
          (0 until h).iterator.filter(_ % every == 0).map { y =>
            val row = java.util.Arrays.copyOfRange(
              rgb, 3 * y * w, 3 * (y + 1) * w)
            FrameSample(a.asset_id, y, row.length.toLong, byteHash(row))
          }
      }
  }

  /** Pure-JVM kernel with REAL decode for baseline JPEG (JFIF /
    * SOF0-SOF1 Huffman sequential) — with [[PngMediaKernel]] this
    * covers the two containers a crawled image corpus actually
    * consists of, end-to-end with no media library: marker walk
    * (DQT/DHT/SOF/DRI/SOS, APPn skipped), canonical Huffman table
    * construction (JPEG spec F.2.2.3 MINCODE/MAXCODE/VALPTR), an
    * FF-stuffing-aware bit reader, MCU entropy decode with DC
    * prediction and restart-marker resets, dequantization through the
    * zigzag map, a separable float IDCT, sample-replication chroma
    * upsampling for any 1-4 sampling factors, and JFIF YCbCr→RGB.
    * Same dispatch contract as every kernel: progressive (SOF2),
    * arithmetic-coded, 12-bit, truncated or otherwise malformed
    * streams are opaque blobs for the stub — decode never throws.
    * Serve arithmetic is the shared [[RgbFrameKernel]], so the SAME
    * pixels yield the SAME statistics as P6/PNG (JpegKernelSpec pins
    * exactness on quantizer-1 grayscale streams, where baseline JPEG
    * is lossless end-to-end, and ±1 on color roundtrips).
    */
  object JpegMediaKernel extends RgbFrameKernel {

    /** Zigzag position → natural (row-major) coefficient position. */
    private val Zigzag: Array[Int] = Array(
      0, 1, 8, 16, 9, 2, 3, 10,
      17, 24, 32, 25, 18, 11, 4, 5,
      12, 19, 26, 33, 40, 48, 41, 34,
      27, 20, 13, 6, 7, 14, 21, 28,
      35, 42, 49, 56, 57, 50, 43, 36,
      29, 22, 15, 23, 30, 37, 44, 51,
      58, 59, 52, 45, 38, 31, 39, 46,
      53, 60, 61, 54, 47, 55, 62, 63)

    /** cos((2x+1)·u·π/16) — the separable IDCT basis. */
    private val Cos: Array[Array[Double]] =
      Array.tabulate(8, 8)((x, u) => math.cos((2 * x + 1) * u * math.Pi / 16))
    private val C: Array[Double] =
      Array.tabulate(8)(u => if (u == 0) 1.0 / math.sqrt(2.0) else 1.0)

    /** Decode-failure control signal — stack-trace-free, caught at the
      * [[decodeRgb]] boundary (the "opaque blob" contract).
      */
    private object Malformed
      extends RuntimeException(null, null, false, false)

    /** Canonical Huffman table (counts per code length 1..16 + the
      * symbol list), decode via the spec's MINCODE/MAXCODE/VALPTR walk.
      */
    private final class Huff(counts: Array[Int], vals: Array[Int]) {
      val minCode = new Array[Int](17)
      val maxCode = Array.fill(17)(-1)
      val valPtr = new Array[Int](17)
      locally {
        var code = 0
        var k = 0
        var l = 1
        while (l <= 16) {
          valPtr(l) = k
          minCode(l) = code
          code += counts(l - 1)
          k += counts(l - 1)
          if (counts(l - 1) > 0) maxCode(l) = code - 1
          code <<= 1
          l += 1
        }
        if (k != vals.length) throw Malformed
      }
      def value(l: Int, code: Int): Int = vals(valPtr(l) + code - minCode(l))
    }

    /** MSB-first bit reader over the entropy-coded segment: a 0xFF00
      * pair is a stuffed data byte; any other 0xFF-marker stops the
      * stream (restart markers are consumed explicitly between
      * intervals, never mid-block).
      */
    private final class BitReader(b: Array[Byte], var pos: Int) {
      private var cur = 0
      private var nbits = 0
      def bit(): Int = {
        if (nbits == 0) {
          if (pos >= b.length) throw Malformed
          var v = b(pos) & 0xff
          pos += 1
          if (v == 0xff) {
            if (pos >= b.length) throw Malformed
            if ((b(pos) & 0xff) == 0x00) pos += 1
            else throw Malformed // real marker inside a block
          }
          cur = v; nbits = 8
        }
        nbits -= 1
        (cur >> nbits) & 1
      }
      def receive(n: Int): Int = {
        var v = 0
        var i = 0
        while (i < n) { v = (v << 1) | bit(); i += 1 }
        v
      }
      def align(): Unit = nbits = 0
      /** Consume the expected restart marker at a byte boundary,
        * skipping unconsumed pad/stuffed bytes before it (a pad byte
        * whose fill bits make it 0xFF is written as a stuffed FF00
        * pair that no block ever read).
        */
      def expectRst(n: Int): Unit = {
        align()
        while (pos + 2 <= b.length &&
            !((b(pos) & 0xff) == 0xff && (b(pos + 1) & 0xff) != 0x00))
          pos += 1
        if (pos + 2 > b.length ||
            (b(pos + 1) & 0xff) != (0xd0 | (n & 7))) throw Malformed
        pos += 2
      }
    }

    private def huffDecode(r: BitReader, t: Huff): Int = {
      var code = r.bit()
      var l = 1
      while (l <= 16) {
        if (t.maxCode(l) >= 0 && code <= t.maxCode(l)) return t.value(l, code)
        code = (code << 1) | r.bit()
        l += 1
      }
      throw Malformed
    }

    /** DIFF/coefficient magnitude extension (spec F.12): an s-bit value
      * below 2^(s-1) encodes a negative number.
      */
    private def extend(v: Int, s: Int): Int =
      if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

    private final case class Component(id: Int, h: Int, v: Int, tq: Int) {
      var td = 0
      var ta = 0
    }

    /** Pixel cap shared with the PNG kernel's reasoning: the IHDR-said
      * size is attacker-controlled; never allocate more than 64 MB of
      * RGB for one asset.
      */
    private val MaxPixels = (64 << 20) / 3

    protected def decodeRgb(b: Array[Byte]): Option[(Int, Int, Array[Byte])] =
      // Malformed is the parser's own signal; any other RuntimeException
      // (index/size arithmetic on adversarial headers) is equally "not
      // a JPEG we carry" — the opaque-blob contract means decode never
      // throws
      try decode(b)
      catch { case _: RuntimeException => None }

    /** Spec access to the decoded RGB frame (the protected SPI method
      * under its container-specific name, like [[PngMediaKernel]]'s
      * `decodePng`).
      */
    private[graft] def decodeJpeg(
        b: Array[Byte]): Option[(Int, Int, Array[Byte])] = decodeRgb(b)

    private def decode(b: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
      if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8)
        return None
      val qt = new Array[Array[Int]](4)
      val dcT = new Array[Huff](4)
      val acT = new Array[Huff](4)
      var w, h = -1
      var comps: Array[Component] = null
      var ri = 0
      var scanStart = -1
      var i = 2
      while (scanStart < 0) {
        if (i + 2 > b.length || (b(i) & 0xff) != 0xff) throw Malformed
        val m = b(i + 1) & 0xff
        if (m == 0xff) { i += 1 } // fill byte
        else if (m == 0x01 || (m >= 0xd0 && m <= 0xd8)) i += 2 // standalone
        else {
          if (i + 4 > b.length) throw Malformed
          val len = ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
          if (len < 2 || i + 2 + len > b.length) throw Malformed
          val end = i + 2 + len
          m match {
            case 0xdb => // DQT: one or more (precision/id, 64 zigzag)
              var p = i + 4
              while (p < end) {
                val pq = (b(p) & 0xff) >> 4
                val tq = b(p) & 0x0f
                if (pq != 0 || tq > 3 || p + 65 > end) throw Malformed
                qt(tq) = Array.tabulate(64)(k => b(p + 1 + k) & 0xff)
                p += 65
              }
            case 0xc4 => // DHT: one or more (class/id, 16 counts, values)
              var p = i + 4
              while (p < end) {
                if (p + 17 > end) throw Malformed
                val tc = (b(p) & 0xff) >> 4
                val th = b(p) & 0x0f
                if (tc > 1 || th > 3) throw Malformed
                val counts = Array.tabulate(16)(k => b(p + 1 + k) & 0xff)
                val n = counts.sum
                if (p + 17 + n > end || n > 256) throw Malformed
                val vals = Array.tabulate(n)(k => b(p + 17 + k) & 0xff)
                val t = new Huff(counts, vals)
                if (tc == 0) dcT(th) = t else acT(th) = t
                p += 17 + n
              }
            case 0xc0 | 0xc1 => // baseline / extended sequential Huffman
              if (w >= 0 || len < 8) throw Malformed
              if ((b(i + 4) & 0xff) != 8) throw Malformed // 8-bit only
              h = ((b(i + 5) & 0xff) << 8) | (b(i + 6) & 0xff)
              w = ((b(i + 7) & 0xff) << 8) | (b(i + 8) & 0xff)
              val nf = b(i + 9) & 0xff
              if (w < 1 || h < 1 || w.toLong * h > MaxPixels ||
                  (nf != 1 && nf != 3) || len != 8 + 3 * nf) throw Malformed
              comps = Array.tabulate(nf) { c =>
                val o = i + 10 + 3 * c
                val comp = Component(b(o) & 0xff, (b(o + 1) & 0xff) >> 4,
                  b(o + 1) & 0x0f, b(o + 2) & 0xff)
                if (comp.h < 1 || comp.h > 4 || comp.v < 1 || comp.v > 4 ||
                    comp.tq > 3) throw Malformed
                // T.81 A.2.2: a SINGLE-component scan is non-interleaved
                // — one 8×8 data unit per MCU in raster order, whatever
                // sampling factors the SOF declares (they only shape
                // MULTI-component interleave). Normalizing to 1×1 makes
                // the generic MCU walk exactly that raster walk.
                if (nf == 1) comp.copy(h = 1, v = 1) else comp
              }
            case 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb |
                0xcd | 0xce | 0xcf =>
              throw Malformed // progressive / arithmetic / lossless
            case 0xdd =>
              if (len != 4) throw Malformed
              ri = ((b(i + 4) & 0xff) << 8) | (b(i + 5) & 0xff)
            case 0xda => // SOS
              if (comps == null) throw Malformed
              val ns = b(i + 4) & 0xff
              if (ns != comps.length || len != 6 + 2 * ns) throw Malformed
              for (c <- 0 until ns) {
                val cs = b(i + 5 + 2 * c) & 0xff
                val comp = comps.find(_.id == cs).getOrElse(throw Malformed)
                comp.td = (b(i + 6 + 2 * c) & 0xff) >> 4
                comp.ta = b(i + 6 + 2 * c) & 0x0f
              }
              // Spectral-selection bytes: a baseline sequential scan is
              // Ss=0, Se=63, Ah=Al=0 (T.81 B.2.3). Anything else (e.g.
              // a nonzero successive-approximation Al) would be decoded
              // here under full-spectral assumptions and yield WRONG
              // features — route it to the stub as an opaque blob like
              // every other unsupported variant.
              if ((b(end - 3) & 0xff) != 0 || (b(end - 2) & 0xff) != 63 ||
                  (b(end - 1) & 0xff) != 0) throw Malformed
              scanStart = end
            case 0xd9 => throw Malformed // EOI before any scan
            case _ => () // APPn / COM / DNL: skip
          }
          if (scanStart < 0) i = end
        }
      }
      // entropy decode: MCU walk over the padded component planes
      val hmax = comps.map(_.h).max
      val vmax = comps.map(_.v).max
      val mcusX = (w + 8 * hmax - 1) / (8 * hmax)
      val mcusY = (h + 8 * vmax - 1) / (8 * vmax)
      val planes = comps.map(c =>
        new Array[Byte](mcusX * 8 * c.h * mcusY * 8 * c.v))
      for (c <- comps) {
        if (qt(c.tq) == null || dcT(c.td) == null || acT(c.ta) == null)
          throw Malformed
      }
      val r = new BitReader(b, scanStart)
      val preds = new Array[Int](comps.length)
      val coef = new Array[Int](64)
      val block = new Array[Double](64)
      var mcu = 0
      var my = 0
      while (my < mcusY) {
        var mx = 0
        while (mx < mcusX) {
          if (ri > 0 && mcu > 0 && mcu % ri == 0) {
            r.expectRst((mcu / ri - 1) % 8)
            java.util.Arrays.fill(preds, 0)
          }
          var ci = 0
          while (ci < comps.length) {
            val c = comps(ci)
            val q = qt(c.tq)
            val pw = mcusX * 8 * c.h
            var vy = 0
            while (vy < c.v) {
              var vx = 0
              while (vx < c.h) {
                // -- one 8×8 block: DC diff + AC run-length, dequantized
                java.util.Arrays.fill(coef, 0)
                val s0 = huffDecode(r, dcT(c.td))
                if (s0 > 11) throw Malformed
                preds(ci) += extend(r.receive(s0), s0)
                coef(0) = preds(ci) * q(0)
                var k = 1
                var open = true
                while (open && k < 64) {
                  val rs = huffDecode(r, acT(c.ta))
                  val run = rs >> 4
                  val sz = rs & 0x0f
                  if (sz == 0) {
                    if (run == 15) k += 16 else open = false // ZRL / EOB
                  } else {
                    k += run
                    if (k > 63) throw Malformed
                    coef(Zigzag(k)) = extend(r.receive(sz), sz) * q(k)
                    k += 1
                  }
                }
                // -- separable IDCT + level shift into the plane
                var u = 0
                while (u < 64) { block(u) = coef(u); u += 1 }
                val bx = (mx * c.h + vx) * 8
                val by = (my * c.v + vy) * 8
                var y = 0
                while (y < 8) {
                  var x = 0
                  while (x < 8) {
                    var s = 0.0
                    var uu = 0
                    while (uu < 8) {
                      var vv = 0
                      while (vv < 8) {
                        val f = block(vv * 8 + uu)
                        if (f != 0.0)
                          s += C(uu) * C(vv) * f * Cos(x)(uu) * Cos(y)(vv)
                        vv += 1
                      }
                      uu += 1
                    }
                    val px = math.round(s / 4.0 + 128.0).toInt
                    planes(ci)((by + y) * pw + bx + x) =
                      math.max(0, math.min(255, px)).toByte
                    x += 1
                  }
                  y += 1
                }
                vx += 1
              }
              vy += 1
            }
            ci += 1
          }
          mcu += 1
          mx += 1
        }
        my += 1
      }
      // color conversion + sample-replication chroma upsampling
      val rgb = new Array[Byte](w * h * 3)
      def sample(ci: Int, x: Int, y: Int): Int = {
        val c = comps(ci)
        val pw = mcusX * 8 * c.h
        planes(ci)((y * c.v / vmax) * pw + (x * c.h / hmax)) & 0xff
      }
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val p = 3 * (y * w + x)
          if (comps.length == 1) {
            val g = sample(0, x, y).toByte
            rgb(p) = g; rgb(p + 1) = g; rgb(p + 2) = g
          } else {
            val yy = sample(0, x, y)
            val cb = sample(1, x, y) - 128
            val cr = sample(2, x, y) - 128
            def clamp(v: Double): Byte =
              math.max(0, math.min(255, math.round(v).toInt)).toByte
            rgb(p) = clamp(yy + 1.402 * cr)
            rgb(p + 1) = clamp(yy - 0.344136 * cb - 0.714136 * cr)
            rgb(p + 2) = clamp(yy + 1.772 * cb)
          }
          x += 1
        }
        y += 1
      }
      Some((w, h, rgb))
    }
  }

  /** Pure-JVM kernel with REAL decode for GIF (87a/89a) — the fourth
    * image container of a crawled corpus after PNG/JPEG/PPM: header +
    * logical-screen parse, global/local color tables, extension-block
    * skip, first-frame image descriptor, the GIF flavor of LZW
    * (LSB-first variable-width codes 3-12 bits, CLEAR/END, KwKwK
    * case, deferred-clear 4096-entry table) over the concatenated
    * data sub-blocks, and 4-pass interlace row mapping. Animated GIFs
    * decode their FIRST frame (the thumbnail/statistics contract —
    * later frames need composition state no statistics gate reads).
    * Same opaque-blob contract as every kernel: truncated streams,
    * missing color tables, out-of-palette indexes or LZW codes, and
    * pixel claims over the [[PngMediaKernel]]-style inflate bound all
    * fall back to the stub — decode never throws.
    */
  object GifMediaKernel extends RgbFrameKernel {

    /** Max decoded pixels (first frame): the same zip-bomb stance as
      * PNG's 64 MB RGB bound (LZW expands ~1000:1 at worst; a 4-KB
      * stream claiming a 10⁹-pixel frame must not allocate the claim).
      */
    private val MaxPixels = (64 << 20) / 3

    private object Malformed
      extends RuntimeException(null, null, false, false)

    private def u16(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

    /** GIF-LZW decode of `data` (concatenated sub-blocks) into exactly
      * `expected` palette indexes — variable-width LSB-first codes, a
      * CLEAR resets the table, the stream must cover every pixel
      * (an early END or bit exhaustion is malformed).
      */
    private[graft] def lzwDecode(minCodeSize: Int, data: Array[Byte],
        expected: Int): Array[Byte] = {
      if (minCodeSize < 2 || minCodeSize > 8) throw Malformed
      val clear = 1 << minCodeSize
      val endCode = clear + 1
      val prefix = new Array[Int](4096)
      val suffix = new Array[Byte](4096)
      val stack = new Array[Byte](4096)
      val out = new Array[Byte](expected)
      var outPos = 0
      var next = endCode + 1
      var codeSize = minCodeSize + 1
      var prev = -1
      var bitPos = 0
      val nBits = data.length * 8
      def read(): Int = {
        if (bitPos + codeSize > nBits) throw Malformed
        var v = 0
        var i = 0
        while (i < codeSize) {
          val bp = bitPos + i
          if (((data(bp >> 3) >> (bp & 7)) & 1) != 0) v |= 1 << i
          i += 1
        }
        bitPos += codeSize
        v
      }
      while (outPos < expected) {
        val code = read()
        if (code == clear) {
          next = endCode + 1; codeSize = minCodeSize + 1; prev = -1
        } else if (code == endCode) {
          throw Malformed // stream ended before covering every pixel
        } else {
          // valid codes: literals, table entries, or exactly `next`
          // with a predecessor (the KwKwK case)
          if (code > next || (code == next && prev == -1)) throw Malformed
          val kwkwk = code == next
          var cur = if (kwkwk) prev else code
          var sp = 0
          while (cur >= clear + 2) {
            stack(sp) = suffix(cur); sp += 1; cur = prefix(cur)
          }
          val first = cur.toByte // expansion always bottoms at a literal
          if (outPos + sp + 1 + (if (kwkwk) 1 else 0) > expected)
            throw Malformed
          out(outPos) = first; outPos += 1
          var i = sp - 1
          while (i >= 0) { out(outPos) = stack(i); outPos += 1; i -= 1 }
          if (kwkwk) { out(outPos) = first; outPos += 1 }
          if (prev != -1 && next < 4096) {
            prefix(next) = prev; suffix(next) = first
            next += 1
            // width grows when the NEXT entry would not fit; at 4096
            // the table freezes (deferred clear) and codes stay 12-bit
            if (next < 4096 && next == (1 << codeSize)) codeSize += 1
          }
          prev = code
        }
      }
      out
    }

    private[graft] def decodeGif(
        b: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
      if (b.length < 13) return None
      val hdr = new String(b, 0, 6, java.nio.charset.StandardCharsets.ISO_8859_1)
      if (hdr != "GIF87a" && hdr != "GIF89a") return None
      val packed = b(10) & 0xff
      var pos = 13
      var gct: Array[Byte] = null
      if ((packed & 0x80) != 0) {
        val n = 2 << (packed & 7)
        if (pos + 3 * n > b.length) throw Malformed
        gct = java.util.Arrays.copyOfRange(b, pos, pos + 3 * n)
        pos += 3 * n
      }
      while (true) {
        if (pos >= b.length) throw Malformed
        (b(pos) & 0xff) match {
          case 0x21 => // extension: introducer + label, then sub-blocks
            pos += 2
            var n = -1
            while (n != 0) {
              if (pos >= b.length) throw Malformed
              n = b(pos) & 0xff
              pos += 1 + n
            }
          case 0x2c => // image descriptor — the first frame
            if (pos + 10 > b.length) throw Malformed
            val w = u16(b, pos + 5)
            val h = u16(b, pos + 7)
            val ip = b(pos + 9) & 0xff
            pos += 10
            if (w <= 0 || h <= 0 || w.toLong * h > MaxPixels)
              throw Malformed
            var ct = gct
            if ((ip & 0x80) != 0) {
              val n = 2 << (ip & 7)
              if (pos + 3 * n > b.length) throw Malformed
              ct = java.util.Arrays.copyOfRange(b, pos, pos + 3 * n)
              pos += 3 * n
            }
            if (ct == null) throw Malformed
            val interlaced = (ip & 0x40) != 0
            if (pos >= b.length) throw Malformed
            val minCode = b(pos) & 0xff
            pos += 1
            val data = new java.io.ByteArrayOutputStream()
            var n = -1
            while (n != 0) {
              if (pos >= b.length) throw Malformed
              n = b(pos) & 0xff
              pos += 1
              if (n > 0) {
                if (pos + n > b.length) throw Malformed
                data.write(b, pos, n)
                pos += n
              }
            }
            val idx = lzwDecode(minCode, data.toByteArray, w * h)
            // decoded row i displays at rowOrder(i) — 4-pass interlace
            val rowOrder: IndexedSeq[Int] =
              if (!interlaced) 0 until h
              else (0 until h by 8) ++ (4 until h by 8) ++
                (2 until h by 4) ++ (1 until h by 2)
            val rgb = new Array[Byte](3 * w * h)
            var i = 0
            while (i < h) {
              val dy = rowOrder(i)
              var x = 0
              while (x < w) {
                val ci = idx(i * w + x) & 0xff
                if (3 * ci + 2 >= ct.length) throw Malformed
                val q = 3 * (dy * w + x)
                rgb(q) = ct(3 * ci); rgb(q + 1) = ct(3 * ci + 1)
                rgb(q + 2) = ct(3 * ci + 2)
                x += 1
              }
              i += 1
            }
            return Some((w, h, rgb))
          case 0x3b => throw Malformed // trailer before any image
          case _ => throw Malformed
        }
      }
      None // unreachable
    }

    protected def decodeRgb(b: Array[Byte]): Option[(Int, Int, Array[Byte])] =
      try decodeGif(b)
      catch { case _: RuntimeException => None }
  }

  /** Pure-JVM kernel with REAL decode for uncompressed Windows BMP
    * (BITMAPINFOHEADER-or-later, BI_RGB, 24/32-bit) — the format
    * screenshots and scanned-document corpora arrive in: little-endian
    * header parse, 4-byte row padding, BGR(A)→RGB channel swap,
    * bottom-up (positive height) and top-down (negative) row order.
    * Palettized, RLE-compressed, bitfield and 16-bit variants are
    * opaque blobs for the stub, same contract as every kernel.
    */
  object BmpMediaKernel extends RgbFrameKernel {

    private val MaxPixels = (64 << 20) / 3

    private object Malformed
      extends RuntimeException(null, null, false, false)

    private def u16(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    private def i32(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
        ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

    private[graft] def decodeBmp(
        b: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
      if (b.length < 54 || b(0) != 'B'.toByte || b(1) != 'M'.toByte)
        return None
      val dataOff = i32(b, 10)
      val hdrSize = i32(b, 14)
      if (hdrSize < 40) throw Malformed // BITMAPCOREHEADER: unsupported
      val w = i32(b, 18)
      val hRaw = i32(b, 22)
      val topDown = hRaw < 0
      val h = math.abs(hRaw)
      val planes = u16(b, 26)
      val bpp = u16(b, 28)
      val comp = i32(b, 30)
      if (planes != 1 || comp != 0 || (bpp != 24 && bpp != 32))
        throw Malformed
      if (w <= 0 || h <= 0 || hRaw == Int.MinValue ||
          w.toLong * h > MaxPixels) throw Malformed
      val bytesPp = bpp / 8
      val rowSize = ((bpp * w + 31) / 32) * 4
      if (dataOff < 54 || dataOff.toLong + rowSize.toLong * h > b.length)
        throw Malformed
      val rgb = new Array[Byte](3 * w * h)
      var y = 0
      while (y < h) {
        val ro = dataOff + (if (topDown) y else h - 1 - y) * rowSize
        var x = 0
        while (x < w) {
          val p = ro + x * bytesPp
          val q = 3 * (y * w + x)
          rgb(q) = b(p + 2); rgb(q + 1) = b(p + 1); rgb(q + 2) = b(p)
          x += 1
        }
        y += 1
      }
      Some((w, h, rgb))
    }

    protected def decodeRgb(b: Array[Byte]): Option[(Int, Int, Array[Byte])] =
      try decodeBmp(b)
      catch { case _: RuntimeException => None }
  }

  /** Magic-byte router over the real kernels — the production shape: a
    * mixed corpus decodes each payload with the implementation its
    * container asks for (PNG, baseline JPEG, GIF and uncompressed BMP
    * images, P6 pixmaps, RIFF/WAVE PCM, MPEG-1 Layer III and FLAC
    * audio, ISO BMFF / MP4 and Matroska/WebM video containers,
    * YUV4MPEG2 raw video), and
    * anything unrecognized stays on the stub arithmetic (so the
    * oracle-gated queries hold byte-identical under this kernel too,
    * pinned in WavKernelSpec/PngKernelSpec/JpegKernelSpec/
    * Mp3KernelSpec).
    */
  object DispatchMediaKernel extends MediaKernel {
    private def magic(b: Array[Byte], s: String, off: Int): Boolean =
      b.length >= off + s.length &&
        (0 until s.length).forall(j => b(off + j) == s.charAt(j).toByte)
    private def route(a: Asset): MediaKernel = {
      val b = a.content
      if (b.length >= 4 && b(0) == 0x89.toByte && magic(b, "PNG", 1))
        PngMediaKernel
      // JPEG before MP3: an MP3 frame header also starts 0xFF-high,
      // but 0xFF 0xD8 0xFF (SOI + marker) is never a valid MPEG sync
      // + header pair, so the order only matters for disambiguation
      else if (b.length >= 3 && (b(0) & 0xff) == 0xff &&
          (b(1) & 0xff) == 0xd8 && (b(2) & 0xff) == 0xff)
        JpegMediaKernel
      else if (magic(b, "P6", 0)) PpmMediaKernel
      else if (magic(b, "RIFF", 0) && magic(b, "WAVE", 8)) WavMediaKernel
      else if (magic(b, "fLaC", 0)) FlacMediaKernel
      // MP3: a leading ID3v2 tag, or a raw stream opening on a valid
      // MPEG-1 Layer III frame header; parseMp3 decides full validity
      // and malformed payloads still land on the stub
      else if (magic(b, "ID3", 0) || Mp3MediaKernel.looksLikeFrame(b, 0))
        Mp3MediaKernel
      // ISO BMFF (MP4/MOV): the ftyp box type at offset 4
      else if (magic(b, "ftyp", 4)) Mp4MediaKernel
      // Matroska/WebM: the EBML header element id at offset 0
      else if (b.length >= 4 && (b(0) & 0xff) == 0x1a &&
          (b(1) & 0xff) == 0x45 && (b(2) & 0xff) == 0xdf &&
          (b(3) & 0xff) == 0xa3)
        MkvMediaKernel
      else if (magic(b, "YUV4MPEG2", 0)) Y4mMediaKernel
      else if (magic(b, "GIF8", 0)) GifMediaKernel
      // BMP's 2-byte magic is weak — route LAST among the containers
      // so a payload another magic claims never lands here; a
      // non-BMP 'BM…' payload fails the header parse onto the stub
      else if (magic(b, "BM", 0)) BmpMediaKernel
      else StubMediaKernel
    }
    /** Route a batch while PRESERVING the per-kernel batch shape: the
      * SPI's batch-level signature exists so implementations amortize
      * per-call overhead (native contexts, codec setup) across a
      * batch, and per-asset dispatch would quietly reduce every batch
      * to size 1. Each kernel sees one sub-batch in input order; the
      * results reassemble positionally.
      */
    private def byKernel[T](batch: Seq[Asset])(
        run: (MediaKernel, Seq[Asset]) => Seq[T]): Seq[T] = {
      val routed = batch.map(a => (route(a), a)).zipWithIndex
      val out = new Array[Any](batch.length)
      for ((k, group) <- routed.groupBy(_._1._1)) {
        val results = run(k, group.map(_._1._2))
        for (((_, idx), r) <- group.zip(results)) out(idx) = r
      }
      out.toSeq.map(_.asInstanceOf[T])
    }
    def decodeBatch(batch: Seq[Asset]): Seq[AssetFeatures] =
      byKernel(batch)((k, b) => k.decodeBatch(b))
    def resizeBatch(batch: Seq[Asset], w: Int, h: Int): Seq[ResizedAsset] =
      byKernel(batch)((k, b) => k.resizeBatch(b, w, h))
    def frames(a: Asset, every: Int): Iterator[FrameSample] =
      route(a).frames(a, every)
    override def rgbFrame(a: Asset): Option[(Int, Int, Array[Byte])] =
      route(a).rgbFrame(a)
    override def rgbFrames(a: Asset,
        every: Int): Iterator[(Int, Int, Int, Array[Byte])] =
      route(a).rgbFrames(a, every)
    override def audioEnvelope(a: Asset, bins: Int): Option[Array[Long]] =
      route(a).audioEnvelope(a, bins)
  }

  @volatile private var activeKernel: MediaKernel = StubMediaKernel

  /** The kernel the operators will capture at plan time. */
  def kernel: MediaKernel = activeKernel

  /** Install a replacement kernel (a real decoder, or a fake in tests).
    * Takes effect for plans built AFTER the call — running plans keep
    * the kernel their closures captured.
    */
  def setKernel(k: MediaKernel): Unit = activeKernel = k

  /** Stub decode at the default seam (compat + spec entry point). */
  def decodeBatch(batch: Seq[Asset]): Seq[AssetFeatures] =
    StubMediaKernel.decodeBatch(batch)

  /** Stub resize at the default seam (compat + spec entry point). */
  def resizeBatch(batch: Seq[Asset], w: Int, h: Int): Seq[ResizedAsset] =
    StubMediaKernel.resizeBatch(batch, w, h)

  /** Frame sampling through the active kernel. */
  def sampleFrames(assets: Dataset[Asset], every: Int): Dataset[FrameSample] = {
    import assets.sparkSession.implicits._
    val k = kernel // captured at plan time, serialized with the closure
    assets.mapPartitions(_.flatMap(a => k.frames(a, every)))
  }

  /** Partition-parallel batched resize (same batching contract as
    * `extractFeatures`), through the active kernel.
    */
  def resizeAssets(assets: Dataset[Asset], w: Int, h: Int): Dataset[ResizedAsset] = {
    import assets.sparkSession.implicits._
    val k = kernel
    assets.mapPartitions(_.grouped(DecodeBatchSize)
      .flatMap(b => k.resizeBatch(b.toSeq, w, h)))
  }

  /** Synthesize an asset table from `documents` (text bytes as the opaque
    * payload — the deterministic stand-in for real media blobs).
    */
  def assets(spark: SparkSession, sfDir: String): Dataset[Asset] = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select(
        col("doc_id").as("asset_id"),
        when(col("doc_id") % 3 === 0, "image/png")
          .when(col("doc_id") % 3 === 1, "audio/wav")
          .otherwise("video/mp4").as("mime"),
        length(col("text").cast("binary")).cast("long").as("n_bytes"),
        col("text").cast("binary").as("content"))
      .as[Asset]
  }

  /** Partition-parallel, batched decode: the distributed plumbing around
    * the active kernel. Batches of `DecodeBatchSize` amortize per-call
    * cost exactly like Arrow record batches under `mapInPandas`.
    */
  def extractFeatures(assets: Dataset[Asset]): Dataset[AssetFeatures] = {
    import assets.sparkSession.implicits._
    val k = kernel
    assets.mapPartitions { it =>
      it.grouped(DecodeBatchSize).flatMap(b => k.decodeBatch(b.toSeq))
    }
  }

  // ---------------------------------------------------------------------
  // Perceptual image near-dup dedup — the multimodal twin of
  // dedup_simhash: dHash over the decoded pixel frame, Hamming-banded
  // LSH candidates, exact popcount verify, connected components.
  // ---------------------------------------------------------------------

  /** dHash grid: 8×8 horizontal-gradient bits need a 9-column grid. */
  val DHashGridW = 9
  val DHashGridH = 8

  /** One asset's 64-bit perceptual hash. */
  final case class PerceptualHash(asset_id: Long, phash: Long)

  /** Difference hash (dHash) of one decoded RGB frame: integer luma
    * (299r + 587g + 114b)/1000 per pixel, floor-boundary box-average
    * downsample to a 9×8 grid (box for cell (cx,cy) spans
    * x ∈ [cx·w/9, (cx+1)·w/9) — every box non-empty for w ≥ 9), then
    * bit (cy·8 + cx) set iff grid(cx+1,cy) > grid(cx,cy). All
    * arithmetic is exact integer — no float resampling — so the DuckDB
    * oracle re-derives hashes bit-for-bit from the same pixel values.
    * None for frames smaller than the grid. A flat channel scale (PPM
    * maxval < 255) cannot flip a strict luma ORDER comparison, so raw
    * bytes are hashed as-is.
    */
  def dHash64(w: Int, h: Int, rgb: Array[Byte]): Option[Long] = {
    if (w < DHashGridW || h < DHashGridH) return None
    val grid = new Array[Long](DHashGridW * DHashGridH)
    var cy = 0
    while (cy < DHashGridH) {
      val y0 = cy * h / DHashGridH
      val y1 = (cy + 1) * h / DHashGridH
      var cx = 0
      while (cx < DHashGridW) {
        val x0 = cx * w / DHashGridW
        val x1 = (cx + 1) * w / DHashGridW
        var sum = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val p = 3 * (y * w + x)
            sum += (299 * (rgb(p) & 0xff) + 587 * (rgb(p + 1) & 0xff) +
              114 * (rgb(p + 2) & 0xff)) / 1000
            x += 1
          }
          y += 1
        }
        grid(cy * DHashGridW + cx) = sum / ((y1 - y0).toLong * (x1 - x0))
        cx += 1
      }
      cy += 1
    }
    var bits = 0L
    var k = 0
    while (k < 64) {
      val gcy = k / 8
      val gcx = k % 8
      if (grid(gcy * DHashGridW + gcx + 1) > grid(gcy * DHashGridW + gcx))
        bits |= 1L << k
      k += 1
    }
    Some(bits)
  }

  /** Perceptual hash of every DECODABLE image asset — a distributed map
    * at the kernel SPI seam (same confinement rule as decode/resize).
    * Assets with no decodable ≥ 9×8 frame yield NO row: they are simply
    * not near-dup candidates, never hashed from fake pixels.
    */
  def perceptualHashes(assets: Dataset[Asset],
      k: MediaKernel): Dataset[PerceptualHash] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.flatMap { a =>
      k.rgbFrame(a).flatMap { case (w, h, rgb) => dHash64(w, h, rgb) }
        .map(PerceptualHash(a.asset_id, _))
    })
  }

  /** Planted 18×16 grayscale P6 corpus for the image-dedup gates: docs
    * with doc_id % 8 < 3 share a FAMILY seed (doc_id − doc_id % 8);
    * the rest are singletons. Pixel (x,y) is an exact integer formula
    * of (seed, k = y·18 + x), and family variants 1–2 additionally
    * shift the four pixels of ONE 2×2 downsample box (grid cell
    * (7,3)) — so family members differ in at most the 2 dHash bits
    * that compare that cell, and 4-band/16-bit Hamming LSH (lossless
    * to distance ≤ 3 by pigeonhole) must surface every planted pair.
    * The oracle re-derives every pixel, grid cell, hash bit, band and
    * popcount from the same closed-form arithmetic — bit-exact across
    * engines because everything is integer.
    */
  val PlantW = 18
  val PlantH = 16

  /** Minimal 24-bit BI_RGB BMP encode (bottom-up rows, 4-byte row
    * padding) — the second REAL container the planted corpus ships
    * in, so the dedup gates exercise the magic router and two genuine
    * decoders end-to-end, not just one. Round-trips through
    * [[BmpMediaKernel.decodeBmp]] pixel-exactly.
    */
  private[graft] def encodeBmp(w: Int, h: Int,
      rgb: Array[Byte]): Array[Byte] = {
    val rowBytes = (3 * w + 3) / 4 * 4
    val imgSize = rowBytes * h
    val out = java.nio.ByteBuffer.allocate(54 + imgSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put('B'.toByte).put('M'.toByte).putInt(54 + imgSize)
      .putInt(0).putInt(54)
    out.putInt(40).putInt(w).putInt(h)
      .putShort(1).putShort(24)
      .putInt(0).putInt(imgSize).putInt(2835).putInt(2835)
      .putInt(0).putInt(0)
    var y = h - 1
    while (y >= 0) {
      var x = 0
      while (x < w) {
        val p = 3 * (y * w + x)
        out.put(rgb(p + 2)).put(rgb(p + 1)).put(rgb(p))
        x += 1
      }
      var pad = rowBytes - 3 * w
      while (pad > 0) { out.put(0.toByte); pad -= 1 }
      y -= 1
    }
    out.array()
  }

  def plantedImages(spark: SparkSession, sfDir: String): Dataset[Asset] = {
    import spark.implicits._
    Tables.documents(spark, sfDir).select(col("doc_id")).as[Long].map { id =>
      val fam = if (id % 8 < 3) id - (id % 8) else id
      val seed = (fam * 2654435761L) % 1000000007L
      val variant = id - fam
      val px = new Array[Byte](3 * PlantW * PlantH)
      var y = 0
      while (y < PlantH) {
        var x = 0
        while (x < PlantW) {
          val k = y * PlantW + x
          val bump =
            if (variant > 0 && x >= 14 && x <= 15 && y >= 6 && y <= 7)
              variant * 64L
            else 0L
          // seed×(k+7) mod p decorrelates pixel walks ACROSS seeds (a
          // purely additive seed term left only ~117 distinct hashes
          // per 500 docs — wrap-pattern clustering — which overloads
          // the band buckets downstream)
          val v = (((seed * (k + 7L) + k.toLong * k * 97L) % 1000000007L
            + bump) % 256L).toByte
          val p = 3 * k
          px(p) = v; px(p + 1) = v; px(p + 2) = v
          x += 1
        }
        y += 1
      }
      // container diversity INSIDE families: variant 1 ships as BMP,
      // the rest as P6 — near-dups must be found ACROSS containers,
      // which only holds if both real decoders emit identical pixels
      // through the magic router (the oracle knows pixels, not
      // containers, so any decoder drift breaks the hash match)
      if (variant == 1L || (id % 8 >= 3 && id % 2 == 1))
        Asset(id, "image/bmp", 0L, encodeBmp(PlantW, PlantH, px))
      else {
        val header = s"P6 $PlantW $PlantH 255\n".getBytes("US-ASCII")
        Asset(id, "image/x-portable-pixmap",
          (header.length + px.length).toLong, header ++ px)
      }
    }
  }

  /** Near-dup image pairs over the planted corpus: REAL container
    * round-trip (encode P6 → magic-routed kernel decode → luma → dHash),
    * then the dedup_simhash banding shape — 4 × 16-bit chunks, pairs
    * collide on a chunk (finds ALL pairs at Hamming ≤ 3 by pigeonhole,
    * never all-pairs), exact popcount verify on survivors. The band
    * self-join runs on skinny (asset_id, chunk, cv, phash) rows; the
    * image bytes are dropped right after the hash map.
    */
  def perceptualDupPairs(s: SparkSession, d: String): DataFrame = {
    val hashes = perceptualHashes(plantedImages(s, d), DispatchMediaKernel)
      .toDF()
    val chunks = hashes.select(
      col("asset_id"), col("phash"),
      explode(array((0 until 4).map(c =>
        struct(lit(c).as("chunk"),
          shiftrightunsigned(col("phash"), c * 16)
            .bitwiseAND(lit(0xFFFFL)).as("cv"))): _*)).as("cc"))
      .select(col("asset_id"), col("phash"),
        col("cc.chunk").as("chunk"), col("cc.cv").as("cv"))
    val a = chunks.select(col("asset_id").as("asset_a"),
      col("phash").as("ha"), col("chunk"), col("cv"))
    val b = chunks.select(col("asset_id").as("asset_b"),
      col("phash").as("hb"), col("chunk"), col("cv"))
    a.join(b, Seq("chunk", "cv"))
      .filter(col("asset_a") < col("asset_b"))
      .select(col("asset_a"), col("asset_b"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= 3)
  }

  // ---------------------------------------------------------------------
  // Audio near-dup: dHash's gradient-sign construction on the |x|
  // time-envelope of REAL sample decode (WAV PCM) — the acoustic
  // fingerprint's cheapest honest form (energy-contour signs; the
  // spectral-peak variants need an FFT this container set doesn't
  // justify). Same 64-bit hash ⇒ the SAME Hamming-band machinery as
  // images, completing near-dup dedup across all three media families.
  // ---------------------------------------------------------------------

  /** Envelope bins per fingerprint: 65 bins → 64 gradient bits. */
  val AudioBins = 65

  /** Planted samples per stream (2 per bin). */
  val AudioSamples = 130

  /** Gradient-sign bits of an envelope: bit k set iff
    * env(k+1) > env(k) — [[dHash64]]'s comparison on the time axis.
    */
  private def gradientBits(env: Array[Long]): Long = {
    var bits = 0L
    var k = 0
    while (k < env.length - 1) {
      if (env(k + 1) > env(k)) bits |= 1L << k
      k += 1
    }
    bits
  }

  /** 64-bit audio fingerprint of every sample-decodable asset;
    * payloads with no decodable waveform of ≥ AudioBins frames yield
    * NO row (the perceptualHashes contract on sound).
    */
  def audioFingerprints(assets: Dataset[Asset],
      k: MediaKernel): Dataset[PerceptualHash] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.flatMap { a =>
      k.audioEnvelope(a, AudioBins)
        .map(env => PerceptualHash(a.asset_id, gradientBits(env)))
    })
  }

  /** Planted 8-bit mono PCM corpus (8 kHz, AudioSamples frames) —
    * the image families on the time axis: sample byte
    * v(t) = ((seed·(t+7) + t²·97) mod p) mod 256, variants bump the
    * two samples of ONE envelope bin (bin 30, t ∈ {60, 61}) by
    * variant·64 — ≤ 2 fingerprint bits per variant. The kernel's
    * envelope is Σ|v−128|·256 per bin (monoInt's 16-bit rebase), an
    * exact integer the oracle restates.
    */
  def plantedAudio(spark: SparkSession, sfDir: String): Dataset[Asset] = {
    import spark.implicits._
    Tables.documents(spark, sfDir).select(col("doc_id")).as[Long].map { id =>
      val fam = if (id % 8 < 3) id - (id % 8) else id
      val seed = (fam * 2654435761L) % 1000000007L
      val variant = id - fam
      val n = AudioSamples
      val out = java.nio.ByteBuffer.allocate(44 + n)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put("RIFF".getBytes("US-ASCII")).putInt(36 + n)
        .put("WAVE".getBytes("US-ASCII"))
      out.put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(1).putInt(8000).putInt(8000)
        .putShort(1).putShort(8)
      out.put("data".getBytes("US-ASCII")).putInt(n)
      var t = 0
      while (t < n) {
        val bump =
          if (variant > 0 && (t == 60 || t == 61)) variant * 64L else 0L
        out.put((((seed * (t + 7L) + t.toLong * t * 97L) % 1000000007L
          + bump) % 256L).toByte)
        t += 1
      }
      val bytes = out.array()
      Asset(id, "audio/wav", bytes.length.toLong, bytes)
    }
  }

  /** Planted FLAC corpus: the SAME deterministic PCM as
    * [[plantedAudio]] (signed 8-bit, v(t) − 128), Rice/fixed-predictor
    * ENCODED into real FLAC frames per asset at the kernel encoder's
    * defaults. Because FLAC is lossless, the fingerprints — and so the
    * dedup oracle — are IDENTICAL to the WAV corpus's: the gate passes
    * iff the frame decode recovers every sample bit-exactly (and the
    * decoder separately proves that against STREAMINFO's MD5).
    */
  def plantedFlacAudio(spark: SparkSession, sfDir: String): Dataset[Asset] = {
    import spark.implicits._
    Tables.documents(spark, sfDir).select(col("doc_id")).as[Long].map { id =>
      val fam = if (id % 8 < 3) id - (id % 8) else id
      val seed = (fam * 2654435761L) % 1000000007L
      val variant = id - fam
      val n = AudioSamples
      val pcm = new Array[Int](n)
      var t = 0
      while (t < n) {
        val bump =
          if (variant > 0 && (t == 60 || t == 61)) variant * 64L else 0L
        pcm(t) = (((seed * (t + 7L) + t.toLong * t * 97L) % 1000000007L
          + bump) % 256L).toInt - 128
        t += 1
      }
      val bytes = FlacMediaKernel.encodeFlac(Array(pcm), 8000, 8)
      Asset(id, "audio/flac", bytes.length.toLong, bytes)
    }
  }

  /** Near-dup audio pairs — [[perceptualDupPairs]]' banding on the
    * acoustic fingerprints: 4 × 16-bit chunks, collide, popcount ≤ 3.
    */
  def audioDupPairs(s: SparkSession, d: String): DataFrame =
    audioDupPairsOf(audioFingerprints(plantedAudio(s, d),
      DispatchMediaKernel).toDF())

  /** The same near-dup banding over the COMPRESSED planted corpus:
    * fingerprints come off the FLAC frame decode (routed by magic
    * through the dispatch kernel), everything downstream is the one
    * shared Hamming-band machine.
    */
  def flacDupPairs(s: SparkSession, d: String): DataFrame =
    audioDupPairsOf(audioFingerprints(plantedFlacAudio(s, d),
      DispatchMediaKernel).toDF())

  private def audioDupPairsOf(hashes: DataFrame): DataFrame = {
    val chunks = bandEntries(hashes)
    val a = chunks.select(col("asset_id").as("asset_a"),
      col("phash").as("ha"), col("chunk"), col("cv"))
    val b = chunks.select(col("asset_id").as("asset_b"),
      col("phash").as("hb"), col("chunk"), col("cv"))
    a.join(b, Seq("chunk", "cv"))
      .filter(col("asset_a") < col("asset_b"))
      .select(col("asset_a"), col("asset_b"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long")
          .as("hamming"))
      .distinct()
      .filter(col("hamming") <= 3)
  }

  // ---------------------------------------------------------------------
  // Video near-dup: per-frame dHash over REAL frame decode (Y4M), then
  // aligned-frame Hamming banding — two videos are near-dups when
  // enough of their same-index sampled frames land within the image
  // dedup's Hamming radius. Never all-pairs: candidates must collide
  // on a (frame_idx, chunk, cv) band bucket first.
  // ---------------------------------------------------------------------

  /** One sampled frame's perceptual hash. */
  final case class FramePHash(asset_id: Long, frame_idx: Int, phash: Long)

  /** Per-frame dHash of every decodable video (or still — a still is
    * its one-frame video) — the distributed map at the kernel SPI
    * seam; frames smaller than the 9×8 grid yield no row.
    */
  def framePerceptualHashes(assets: Dataset[Asset], k: MediaKernel,
      every: Int = 1): Dataset[FramePHash] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.flatMap { a =>
      k.rgbFrames(a, every).flatMap { case (idx, w, h, rgb) =>
        dHash64(w, h, rgb).map(FramePHash(a.asset_id, idx, _))
      }
    })
  }

  /** Frames per planted video; matching ≥ [[VideoMinMatch]] aligned
    * frames at Hamming ≤ 3 makes a near-dup pair.
    */
  val PlantFrames = 4
  val VideoMinMatch = 2

  /** Planted Y4M (C420, neutral chroma) corpus for the video-dedup
    * gate — the [[plantedImages]] families extended with a frame
    * dimension: luma(f, x, y) adds a per-frame f·(k+131) term to the
    * image formula (decorrelating frames within a stream), variants
    * perturb the SAME 2×2 box on EVERY frame (≤ 2 dHash bits per
    * frame), and chroma planes sit at 128 so the full-range BT.601
    * decode reproduces the luma byte exactly — the closed form the
    * oracle re-derives.
    */
  def plantedVideos(spark: SparkSession, sfDir: String): Dataset[Asset] = {
    import spark.implicits._
    Tables.documents(spark, sfDir).select(col("doc_id")).as[Long].map { id =>
      val fam = if (id % 8 < 3) id - (id % 8) else id
      val seed = (fam * 2654435761L) % 1000000007L
      val variant = id - fam
      val header =
        s"YUV4MPEG2 W$PlantW H$PlantH F25:1 Ip A1:1 C420\n"
          .getBytes("US-ASCII")
      val frameHdr = "FRAME\n".getBytes("US-ASCII")
      val luma = PlantW * PlantH
      val chroma = (PlantW / 2) * (PlantH / 2)
      val buf = new java.io.ByteArrayOutputStream(
        header.length + PlantFrames * (frameHdr.length + luma + 2 * chroma))
      buf.write(header)
      var f = 0
      while (f < PlantFrames) {
        buf.write(frameHdr)
        var k = 0
        while (k < luma) {
          val x = k % PlantW; val y = k / PlantW
          val bump =
            if (variant > 0 && x >= 14 && x <= 15 && y >= 6 && y <= 7)
              variant * 64L
            else 0L
          val v = (((seed * (k + 7L) + k.toLong * k * 97L +
            f.toLong * (k + 131L)) % 1000000007L + bump) % 256L).toInt
          buf.write(v)
          k += 1
        }
        var c = 0
        while (c < 2 * chroma) { buf.write(128); c += 1 }
        f += 1
      }
      val bytes = buf.toByteArray
      Asset(id, "video/x-yuv4mpeg", bytes.length.toLong, bytes)
    }
  }

  /** Video near-dup pairs: per-frame hashes band on
    * (frame_idx, chunk, cv), colliding same-index frames verify with
    * exact popcount at ≤ 3, and a pair qualifies at ≥ VideoMinMatch
    * matched frames — output (asset_a, asset_b, n_frames_matched).
    */
  def videoDupPairs(s: SparkSession, d: String): DataFrame = {
    val hashes = framePerceptualHashes(plantedVideos(s, d),
      DispatchMediaKernel).toDF()
    val chunks = hashes.select(
      col("asset_id"), col("frame_idx"), col("phash"),
      explode(array((0 until 4).map(c =>
        struct(lit(c).as("chunk"),
          shiftrightunsigned(col("phash"), c * 16)
            .bitwiseAND(lit(0xFFFFL)).as("cv"))): _*)).as("cc"))
      .select(col("asset_id"), col("frame_idx"), col("phash"),
        col("cc.chunk").as("chunk"), col("cc.cv").as("cv"))
    val a = chunks.select(col("asset_id").as("asset_a"),
      col("phash").as("ha"), col("frame_idx"), col("chunk"), col("cv"))
    val b = chunks.select(col("asset_id").as("asset_b"),
      col("phash").as("hb"), col("frame_idx"), col("chunk"), col("cv"))
    val frameMatches = a.join(b, Seq("frame_idx", "chunk", "cv"))
      .filter(col("asset_a") < col("asset_b"))
      .filter(bit_count(col("ha").bitwiseXOR(col("hb"))) <= 3)
      .select(col("asset_a"), col("asset_b"), col("frame_idx"))
      .distinct()
    frameMatches.groupBy(col("asset_a"), col("asset_b"))
      .agg(count(lit(1)).as("n_frames_matched"))
      .filter(col("n_frames_matched") >= VideoMinMatch)
  }

  // ---------------------------------------------------------------------
  // Persisted perceptual-hash index — the operational image-dedup shape
  // at 100 TB: history images are hashed ONCE and their band entries
  // persisted; each new wave bands against the index (and itself),
  // never re-decoding or re-pairing the history. Speaks the same
  // FoldProtocol dialect as every other index: ledgered folds,
  // tombstoned takedowns, compaction, fsck.
  // ---------------------------------------------------------------------

  private val PhashSchema =
    "asset_id BIGINT, phash BIGINT, chunk INT, cv BIGINT, bucket BIGINT"

  /** Band-entry buckets per index (the Retrieval.Buckets convention). */
  val PhashBuckets = 32

  private[graft] def phashProtocol(path: String) =
    new graft.index.FoldProtocol(path, "_phash_ledger")

  /** The audio near-dup oracle — sample algebra, envelope, gradient
    * bits, banding and popcount in closed-form integer SQL. Shared
    * VERBATIM by `multimodal_audio_dedup` (WAV) and
    * `multimodal_flac_dedup` (FLAC): both planted corpora carry the
    * same PCM, and lossless decode makes the fingerprint
    * container-independent.
    */
  private def audioDedupOracleSql: String =
    s"""WITH sd AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % 8 < 3 THEN doc_id % 8 ELSE 0 END AS var,
       |    ((CASE WHEN doc_id % 8 < 3 THEN doc_id - (doc_id % 8)
       |           ELSE doc_id END) * 2654435761) % 1000000007 AS seed
       |  FROM documents),
       |sm AS (
       |  SELECT doc_id, t,
       |    abs((((seed * (t+7) + t*t*97) % 1000000007)
       |        + CASE WHEN var > 0 AND t IN (60, 61)
       |               THEN var*64 ELSE 0 END) % 256 - 128) * 256 AS av
       |  FROM sd, range(0, $AudioSamples) tt(t)),
       |env AS (
       |  SELECT doc_id, (t * $AudioBins) // $AudioSamples AS bin,
       |    sum(av) AS e
       |  FROM sm GROUP BY doc_id, (t * $AudioBins) // $AudioSamples),
       |sigs AS (
       |  SELECT a.doc_id,
       |    bit_or(CASE WHEN b.e > a.e
       |           THEN (1::HUGEINT << a.bin)::UBIGINT
       |           ELSE 0::UBIGINT END) AS sig
       |  FROM env a JOIN env b
       |    ON b.doc_id = a.doc_id AND b.bin = a.bin + 1
       |  WHERE a.bin < ${AudioBins - 1}
       |  GROUP BY a.doc_id),
       |chunks AS (SELECT doc_id, sig, c, (sig >> (c*16)) & 65535 AS cv
       |           FROM sigs, range(0, 4) t(c))
       |SELECT DISTINCT a.doc_id AS asset_a, b.doc_id AS asset_b,
       |  CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
       |FROM chunks a JOIN chunks b
       |  ON a.c = b.c AND a.cv = b.cv AND a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.sig, b.sig)) <= 3""".stripMargin

  /** One (asset_id, phash) row → its 4 band entries with the bucket
    * partition key: bucket = pmod(xxhash64(chunk:cv), 32), so a
    * bounded query set's candidate read is a static PartitionFilter.
    */
  private def bandEntries(hashes: DataFrame): DataFrame =
    hashes.select(col("asset_id"), col("phash"),
      explode(array((0 until 4).map(c =>
        struct(lit(c).as("chunk"),
          shiftrightunsigned(col("phash"), c * 16)
            .bitwiseAND(lit(0xFFFFL)).as("cv"))): _*)).as("cc"))
      .select(col("asset_id"), col("phash"),
        col("cc.chunk").as("chunk"), col("cc.cv").as("cv"),
        pmod(xxhash64(concat_ws(":", col("cc.chunk"), col("cc.cv"))),
          lit(PhashBuckets.toLong)).as("bucket"))

  private def stagePhashes(hashes: DataFrame, path: String,
      dir: String): Unit =
    bandEntries(hashes)
      .repartition(col("bucket"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy("bucket")
      .parquet(dir)

  /** Build a fresh perceptual-hash index at `path` (seed sub-root). */
  def writePhashIndex(hashes: DataFrame, path: String): Unit =
    stagePhashes(hashes,
      path, s"${phashProtocol(path).dir("phashes")}/seed")

  /** Ledgered fold of a new image wave's hashes — exactly once under
    * replay, the appendToIvfBinaryIndex contract on band entries.
    */
  def appendToPhashIndex(hashes: DataFrame, path: String,
      batchId: Long): Boolean =
    phashProtocol(path).fold(batchId, Seq("phashes")) {
      stagePhashes(hashes, path,
        s"${phashProtocol(path).dir("phashes")}/b$batchId")
    }

  /** Ledgered image takedown — tombstones only, O(|ids|). */
  def deleteFromPhashIndex(ids: DataFrame, path: String,
      deleteId: Long): Boolean = {
    val p = phashProtocol(path)
    p.delete(deleteId) { p.stageTombstones(ids, "asset_id", deleteId) }
  }

  /** All committed band entries minus committed tombstones. */
  def indexPhashes(s: SparkSession, path: String): DataFrame =
    phashProtocol(path).readCommittedStripped(s, "phashes", "asset_id")(
      r => s.read.schema(PhashSchema).option("basePath", r).parquet(r))

  /** [[indexPhashes]] AS OF a ledger horizon — the shared list-time
    * dir/tombstone scoping, zero data cost. With this every persisted
    * index kind in the engine (BM25, phrase, trigram, word-positional,
    * float/PQ/binary ANN, perceptual-hash) serves ledger horizons.
    */
  def indexPhashesAsOf(s: SparkSession, path: String,
      asOf: Long): DataFrame =
    phashProtocol(path).readCommittedStrippedAsOf(s, "phashes",
      "asset_id", asOf)(
      r => s.read.schema(PhashSchema).option("basePath", r).parquet(r))

  /** Rewrite committed sub-roots into one `c<hw>` dir — the shared
    * compaction contract (served view in, tombstones purged, ledger
    * kept).
    */
  def compactPhashIndex(s: SparkSession, path: String): Unit = {
    val p = phashProtocol(path)
    p.withLease("compact-phash") {
      indexPhashes(s, path)
        .repartition(col("bucket"))
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .partitionBy("bucket")
        .parquet(s"$path/.phashes.compacting/${p.compactDirName()}")
      p.publishDir(".phashes.compacting", "phashes")
      p.clearTombstones()
    }
  }

  /** Incremental image dedup — the `Dedup.incrementalKeepNew` contract
    * on perceptual hashes: an incoming image SURVIVES iff no image
    * with a smaller asset_id (indexed history OR earlier in the
    * incoming wave) sits within Hamming ≤ 3 of it. Candidates come
    * from band collisions against the index ∪ the wave itself (never
    * all-pairs); the popcount verify runs on collisions only. The
    * history is never re-decoded, re-hashed or re-paired.
    */
  def phashKeepNew(s: SparkSession, indexPath: String,
      incoming: DataFrame, asOf: Option[Long] = None): DataFrame = {
    val inc = bandEntries(incoming.select(col("asset_id"), col("phash")))
    val partners = asOf.fold(indexPhashes(s, indexPath))(h =>
      indexPhashesAsOf(s, indexPath, h))
      .select(col("asset_id"), col("phash"), col("chunk"), col("cv"))
      .unionByName(inc.select(col("asset_id"), col("phash"),
        col("chunk"), col("cv")))
    val rejected = inc.alias("i")
      .join(partners.alias("p"),
        col("i.chunk") === col("p.chunk") && col("i.cv") === col("p.cv")
          && col("p.asset_id") < col("i.asset_id"))
      .filter(bit_count(col("i.phash").bitwiseXOR(col("p.phash"))) <= 3)
      .select(col("i.asset_id").as("asset_id"))
      .distinct()
    incoming.select(col("asset_id"), col("phash"))
      .join(rejected, Seq("asset_id"), "left_anti")
  }

  /** Perceptual-hash SEARCH from the persisted index — the retrieval
    * twin of [[phashKeepNew]]: every indexed asset within Hamming ≤
    * `radius` of each probe hash (self-matches included — a search
    * legitimately returns the identical asset). Candidates come from
    * band collisions (lossless for radius ≤ 3 by pigeonhole over the
    * 4 × 16-bit chunks); the popcount verify runs on collisions only.
    * The probes' band BUCKETS are collected driver-side as the
    * candidate read's static PartitionFilter — a bounded pushdown: ≤
    * [[PhashBuckets]] distinct values by construction, and a
    * point/batch query touches ≤ 4·|probes| of the 32, which is the
    * whole point of the bucket layout at reverse-image-search scale.
    */
  def phashSearch(s: SparkSession, indexPath: String, probes: DataFrame,
      radius: Int = 3, asOf: Option[Long] = None): DataFrame = {
    require(radius <= 3,
      "band candidates are lossless only to radius 3; larger radii " +
        "need a wider band split")
    val pb = bandEntries(probes.select(
        col("query_id").as("asset_id"), col("phash")))
      .select(col("asset_id").as("query_id"), col("phash").as("qhash"),
        col("chunk"), col("cv"), col("bucket"))
    val buckets = pb.select(col("bucket")).distinct()
      .collect().map(_.getLong(0)) // ≤ PhashBuckets = 32 rows
    val idx = asOf.fold(indexPhashes(s, indexPath))(h =>
        indexPhashesAsOf(s, indexPath, h))
      .filter(col("bucket").isin(buckets.toSeq: _*))
      .select(col("asset_id"), col("phash"), col("chunk"), col("cv"))
    pb.drop("bucket").join(idx, Seq("chunk", "cv"))
      .filter(bit_count(col("qhash").bitwiseXOR(col("phash"))) <= radius)
      .select(col("query_id"), col("asset_id"),
        bit_count(col("qhash").bitwiseXOR(col("phash"))).cast("long")
          .as("hamming"))
      .distinct()
  }

  /** Build-if-absent the incremental gate's HISTORY index: the planted
    * corpus' doc_id % 5 ≠ 4 wave hashed through the real decode and
    * seeded, keyed on the seed's completeness.
    */
  def ensureIncrementalPhashIndex(s: SparkSession, d: String): String = {
    val suffix = d.replaceAll("\\W", "_")
    val root = new org.apache.hadoop.fs.Path(
      s.conf.get("spark.sql.warehouse.dir"), s"graft_phash_index$suffix")
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    Layout.ensurePublishedDir(s, root.toString)(r =>
      fs.exists(new org.apache.hadoop.fs.Path(
        phashProtocol(r).dir("phashes") + "/seed", "_SUCCESS"))
    ) { staging =>
      val history = perceptualHashes(
        plantedImages(s, d).filter(col("asset_id") % 5 =!= 4),
        DispatchMediaKernel).toDF()
      writePhashIndex(history, staging)
    }
  }

  /** Oracle CTE chain shared by the image-dedup and phash-search
    * gates: closed-form pixel values → 2×2 box averages → gradient
    * bits → band chunks, mirroring [[plantedImages]] + [[dHash64]]
    * integer-exactly (luma of a gray pixel (v,v,v) is
    * (299+587+114)·v/1000 = v, so the SQL skips the no-op).
    */
  private def phashChunksCte: String =
    s"""WITH RECURSIVE sd AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % 8 < 3 THEN doc_id % 8 ELSE 0 END AS var,
       |    ((CASE WHEN doc_id % 8 < 3 THEN doc_id - (doc_id % 8)
       |           ELSE doc_id END) * 2654435761) % 1000000007 AS seed
       |  FROM documents),
       |px AS (
       |  SELECT doc_id, x, y,
       |    ((seed * (y*$PlantW+x+7) + (y*$PlantW+x)*(y*$PlantW+x)*97)
       |       % 1000000007
       |      + CASE WHEN var > 0 AND x BETWEEN 14 AND 15
       |                  AND y BETWEEN 6 AND 7
       |             THEN var*64 ELSE 0 END) % 256 AS v
       |  FROM sd, range(0, $PlantW) tx(x), range(0, $PlantH) ty(y)),
       |g AS (
       |  SELECT doc_id, x // 2 AS cx, y // 2 AS cy, sum(v) // 4 AS gv
       |  FROM px GROUP BY doc_id, x // 2, y // 2),
       |sigs AS (
       |  SELECT a.doc_id,
       |    bit_or(CASE WHEN b.gv > a.gv
       |           THEN (1::HUGEINT << (a.cy*8 + a.cx))::UBIGINT
       |           ELSE 0::UBIGINT END) AS sig
       |  FROM g a JOIN g b
       |    ON b.doc_id = a.doc_id AND b.cy = a.cy AND b.cx = a.cx + 1
       |  WHERE a.cx < 8
       |  GROUP BY a.doc_id),
       |chunks AS (SELECT doc_id, sig, c, (sig >> (c*16)) & 65535 AS cv
       |           FROM sigs, range(0, 4) t(c))""".stripMargin

  /** [[phashChunksCte]] extended with the dedup gates' verified-pairs
    * CTE (smaller-vs-larger id, radius 3).
    */
  private def phashPairsCte: String =
    s"""$phashChunksCte,
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS asset_a, b.doc_id AS asset_b,
       |    CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
       |  FROM chunks a JOIN chunks b
       |    ON a.c = b.c AND a.cv = b.cv AND a.doc_id < b.doc_id
       |  WHERE bit_count(xor(a.sig, b.sig)) <= 3)""".stripMargin

  val specs: Seq[QuerySpec] = Seq(

    // Metadata-only scan: must prune the blob column (verified by plan
    // inspection in MultimodalSpec). Oracle reproduces the byte length and
    // content hash from the text payload.
    QuerySpec(
      "multimodal_meta",
      """SELECT doc_id AS asset_id,
        | CASE WHEN doc_id % 3 = 0 THEN 'image/png'
        |      WHEN doc_id % 3 = 1 THEN 'audio/wav'
        |      ELSE 'video/mp4' END AS mime,
        | CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        | md5(text) AS content_hash
        |FROM documents""".stripMargin) { (s, d) =>
      Tables.documents(s, d).select(
        col("doc_id").as("asset_id"),
        when(col("doc_id") % 3 === 0, "image/png")
          .when(col("doc_id") % 3 === 1, "audio/wav")
          .otherwise("video/mp4").as("mime"),
        length(col("text").cast("binary")).cast("long").as("n_bytes"),
        md5(col("text")).as("content_hash"))
    },

    // Full decode pipeline: binary → batched stub decode → feature stats.
    // The stub's arithmetic is engine-portable, so the oracle recomputes
    // the content hash (list_reduce fold), the width/height derivation,
    // and the float-rounded feature sum term by term.
    QuerySpec(
      "multimodal_features",
      s"""WITH h AS (SELECT doc_id AS asset_id, ${foldHashSql("text")} AS h FROM documents)
         |SELECT asset_id,
         |  CAST(1 + h % 1024 AS BIGINT) AS width,
         |  CAST(1 + (h // 1024) % 1024 AS BIGINT) AS height,
         |  round(${(0 until FeatureDim).map(i =>
             s"CAST(CAST(((h * 2654435761 + $i * 40503) % 1000003) AS DOUBLE)" +
               " / 1000003.0 AS FLOAT)::DOUBLE").mkString(" + ")}, 4)
         |    AS feature_sum
         |FROM h""".stripMargin) { (s, d) =>
      val feats: DataFrame = extractFeatures(assets(s, d)).toDF()
      feats.select(
        col("asset_id"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        round(aggregate(transform(col("features"), x => x.cast("double")),
          lit(0.0), (acc, v) => acc + v), 4).as("feature_sum"))
    },

    // Batched stub resize: per-asset thumbnail metadata. The stub tiles
    // the payload to w×h bytes, which SQL reproduces with repeat+substr;
    // md5 hex is identical across engines.
    QuerySpec(
      "multimodal_resize",
      s"""SELECT doc_id AS asset_id,
         |  CAST(16 AS BIGINT) AS width, CAST(16 AS BIGINT) AS height,
         |  CAST(256 AS BIGINT) AS thumb_bytes,
         |  CASE WHEN length(text) = 0 THEN '$ZeroThumbMd5'
         |       ELSE md5(substr(repeat(text, CAST(ceil(256.0 / length(text)) AS INT)),
         |                 1, 256)) END AS thumb_hash
         |FROM documents""".stripMargin) { (s, d) =>
      resizeAssets(assets(s, d), 16, 16).toDF()
        .select(col("asset_id"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          length(col("thumb")).cast("long").as("thumb_bytes"),
          md5(col("thumb")).as("thumb_hash"))
    },

    // Frame sampling: 1→N explosion, every 2nd fixed-size frame. Chunking
    // is substr arithmetic and the frame hash is the portable fold.
    QuerySpec(
      "multimodal_frames",
      s"""WITH c0 AS (SELECT doc_id, text,
         |    unnest(range(0, CAST(ceil(length(text) / $FrameBytes.0) AS BIGINT))) AS c
         |  FROM documents),
         |c AS (SELECT doc_id AS asset_id, c AS frame_idx,
         |    substr(text, CAST(c * $FrameBytes + 1 AS INT), $FrameBytes) AS chunk
         |  FROM c0 WHERE c % 2 = 0)
         |SELECT asset_id, CAST(frame_idx AS BIGINT) AS frame_idx,
         |  CAST(length(chunk) AS BIGINT) AS n_bytes,
         |  ${foldHashSql("chunk")} AS frame_hash
         |FROM c""".stripMargin) { (s, d) =>
      sampleFrames(assets(s, d), every = 2).toDF()
        .select(col("asset_id"),
          col("frame_idx").cast("long").as("frame_idx"),
          col("n_bytes"), col("frame_hash"))
    },

    // Perceptual image near-dup pairs: planted P6 corpus → real
    // magic-routed decode → dHash → Hamming-banded LSH → popcount
    // verify. The oracle recomputes every pixel, grid cell, hash bit,
    // band bucket and popcount in closed-form integer SQL — a
    // value-level cross-check of the whole encode/decode/hash/band
    // path.
    QuerySpec(
      "multimodal_dedup",
      s"""$phashPairsCte
         |SELECT asset_a, asset_b, hamming FROM pairs""".stripMargin) {
      (s, d) => perceptualDupPairs(s, d)
    },

    // Transitive closure of the near-dup pairs: every matched image
    // gets cluster_id = min reachable asset_id (the canonical survivor),
    // via the same iterative min-label + pointer-jumping components the
    // text dedup uses. The oracle walks reachability with a recursive
    // CTE over the pair set it just re-derived.
    QuerySpec(
      "multimodal_dedup_cluster",
      s"""$phashPairsCte,
         |edges AS (SELECT asset_a AS u, asset_b AS v FROM pairs
         |          UNION ALL SELECT asset_b, asset_a FROM pairs),
         |reach(u, r) AS (
         |  SELECT DISTINCT u, u FROM edges
         |  UNION
         |  SELECT e.u, reach.r FROM edges e JOIN reach ON e.v = reach.u)
         |SELECT u AS asset_id, CAST(min(r) AS BIGINT) AS cluster_id,
         |  CAST(CASE WHEN u = min(r) THEN 1 ELSE 0 END AS BIGINT) AS keep
         |FROM reach GROUP BY u""".stripMargin) { (s, d) =>
      val pairs = perceptualDupPairs(s, d)
        .select(col("asset_a").as("doc_a"), col("asset_b").as("doc_b"))
      Dedup.connectedComponents(pairs)
        .select(col("doc_id").as("asset_id"), col("cluster_id"),
          when(col("doc_id") === col("cluster_id"), 1L).otherwise(0L)
            .as("keep"))
    },

    // Incremental image dedup against the PERSISTED perceptual-hash
    // index — the Dedup.incrementalKeepNew contract on pixels: the
    // history wave is hashed once and indexed; the incoming wave
    // bands against the index (and itself) and an incoming image
    // survives iff no smaller-id image sits within Hamming ≤ 3. The
    // oracle rebuilds the full-corpus banding from the closed-form
    // pixel arithmetic and bars every incoming image that is the
    // greater id of a verified pair — incremental ingestion must
    // converge to exactly what a full re-dedup would keep.
    QuerySpec(
      "multimodal_dedup_incremental",
      s"""$phashPairsCte
         |SELECT s.doc_id AS asset_id,
         |  CAST(CASE WHEN s.sig >= 9223372036854775808::UBIGINT
         |       THEN CAST(s.sig AS HUGEINT) - 18446744073709551616::HUGEINT
         |       ELSE CAST(s.sig AS HUGEINT) END AS BIGINT) AS phash
         |FROM sigs s
         |WHERE s.doc_id % 5 = 4
         |  AND s.doc_id NOT IN (SELECT asset_b FROM pairs
         |                       WHERE asset_b % 5 = 4)""".stripMargin) {
      (s, d) =>
      val idx = ensureIncrementalPhashIndex(s, d)
      val incoming = perceptualHashes(
        plantedImages(s, d).filter(col("asset_id") % 5 === 4),
        DispatchMediaKernel).toDF()
      phashKeepNew(s, idx, incoming)
    },

    // Reverse-image SEARCH from the persisted perceptual-hash index —
    // the retrieval twin of the dedup serve (same bands, same
    // popcount verify, probe-bucket static prune): every indexed
    // asset within Hamming ≤ 3 of each probe, self-matches included.
    // Probes are the variant-1 family members; the index is the
    // incremental gate's history wave. The oracle re-derives both
    // sides' hashes in closed form and joins chunks a (probes) ×
    // chunks b (history) with no id ordering — search is directed,
    // unlike dedup's a < b pairs.
    QuerySpec(
      "multimodal_phash_search",
      s"""$phashChunksCte
         |SELECT DISTINCT a.doc_id AS query_id, b.doc_id AS asset_id,
         |  CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
         |FROM chunks a JOIN chunks b
         |  ON a.c = b.c AND a.cv = b.cv
         |WHERE a.doc_id % 8 = 1 AND b.doc_id % 5 <> 4
         |  AND bit_count(xor(a.sig, b.sig)) <= 3""".stripMargin) {
      (s, d) =>
      val idx = ensureIncrementalPhashIndex(s, d)
      val probes = perceptualHashes(
        plantedImages(s, d).filter(col("asset_id") % 8 === 1),
        DispatchMediaKernel).toDF()
        .select(col("asset_id").as("query_id"), col("phash"))
      phashSearch(s, idx, probes)
    },

    // Video near-dup pairs: planted Y4M streams (C420, neutral
    // chroma) through the REAL frame decode (header walk, per-frame
    // plane offsets, fixed-point BT.601) → per-frame dHash →
    // aligned-frame Hamming banding → matched-frame count. The oracle
    // re-derives every frame's luma, grid, hash bit, band bucket,
    // per-frame popcount and the ≥ VideoMinMatch threshold in
    // closed-form integer SQL.
    // Audio near-dup pairs: planted PCM streams through the REAL
    // sample decode (RIFF chunk walk, monoInt rebase) → |x| envelope →
    // gradient-sign fingerprint → the image-dedup banding. The oracle
    // re-derives every sample, bin sum, gradient bit, band bucket and
    // popcount in closed-form integer SQL.
    QuerySpec("multimodal_audio_dedup", audioDedupOracleSql) {
      (s, d) => audioDupPairs(s, d)
    },

    // The SAME near-dup contract on the COMPRESSED container: the
    // planted corpus carries identical PCM, Rice/fixed-predictor
    // encoded into real FLAC frames, and the serve fingerprints off
    // the kernel's full lossless frame decode. The oracle is the WAV
    // gate's VERBATIM — lossless means the closed-form sample algebra
    // is container-independent — so a single decoder bit error
    // anywhere (header walk, Rice, predictor, decorrelation) breaks
    // parity.
    QuerySpec("multimodal_flac_dedup", audioDedupOracleSql) {
      (s, d) => flacDupPairs(s, d)
    },

    QuerySpec(
      "multimodal_video_dedup",
      s"""WITH sd AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 8 < 3 THEN doc_id % 8 ELSE 0 END AS var,
         |    ((CASE WHEN doc_id % 8 < 3 THEN doc_id - (doc_id % 8)
         |           ELSE doc_id END) * 2654435761) % 1000000007 AS seed
         |  FROM documents),
         |px AS (
         |  SELECT doc_id, f, x, y,
         |    ((seed * (y*$PlantW+x+7) + (y*$PlantW+x)*(y*$PlantW+x)*97
         |        + f*((y*$PlantW+x)+131)) % 1000000007
         |      + CASE WHEN var > 0 AND x BETWEEN 14 AND 15
         |                  AND y BETWEEN 6 AND 7
         |             THEN var*64 ELSE 0 END) % 256 AS v
         |  FROM sd, range(0, $PlantFrames) tf(f),
         |       range(0, $PlantW) tx(x), range(0, $PlantH) ty(y)),
         |g AS (
         |  SELECT doc_id, f, x // 2 AS cx, y // 2 AS cy, sum(v) // 4 AS gv
         |  FROM px GROUP BY doc_id, f, x // 2, y // 2),
         |sigs AS (
         |  SELECT a.doc_id, a.f,
         |    bit_or(CASE WHEN b.gv > a.gv
         |           THEN (1::HUGEINT << (a.cy*8 + a.cx))::UBIGINT
         |           ELSE 0::UBIGINT END) AS sig
         |  FROM g a JOIN g b
         |    ON b.doc_id = a.doc_id AND b.f = a.f AND b.cy = a.cy
         |      AND b.cx = a.cx + 1
         |  WHERE a.cx < 8
         |  GROUP BY a.doc_id, a.f),
         |chunks AS (SELECT doc_id, f, sig, c, (sig >> (c*16)) & 65535 AS cv
         |           FROM sigs, range(0, 4) t(c)),
         |fm AS (
         |  SELECT DISTINCT a.doc_id AS asset_a, b.doc_id AS asset_b, a.f
         |  FROM chunks a JOIN chunks b
         |    ON a.f = b.f AND a.c = b.c AND a.cv = b.cv
         |      AND a.doc_id < b.doc_id
         |  WHERE bit_count(xor(a.sig, b.sig)) <= 3)
         |SELECT asset_a, asset_b,
         |  CAST(count(*) AS BIGINT) AS n_frames_matched
         |FROM fm GROUP BY asset_a, asset_b
         |HAVING count(*) >= $VideoMinMatch""".stripMargin) {
      (s, d) => videoDupPairs(s, d)
    }
  )

  /** SQL form of [[byteHash]] over a named string column (documents are
    * pure ASCII, so `ascii(substr(...))` equals the byte value). `def`s so
    * `specs` (initialized above) can reference them at object init.
    */
  private def foldHashSql(column: String): String =
    "list_reduce(list_prepend(0::BIGINT, list_transform(" +
      s"range(1, length($column) + 1), i -> ascii(substr($column, i, 1))::BIGINT))," +
      " (a, b) -> (a * 31 + b) % 1000000007)"

  /** md5 of 256 zero bytes — the resize stub's thumb for an empty payload
    * (SQL can't build a NUL-byte string portably, so the oracle inlines
    * the digest).
    */
  private def ZeroThumbMd5: String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(new Array[Byte](256)).map("%02x".format(_)).mkString
}
