package graft.media

import graft.media.Media._


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

  private[graft] final case class FlacInfo(sampleRate: Int,
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
