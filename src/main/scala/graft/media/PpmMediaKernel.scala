package graft.media

import graft.media.Media._


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
  private[graft] def parseP6(b: Array[Byte]): Option[(Int, Int, Int, Int)] = {
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
