package graft.media

import graft.media.Media._


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
