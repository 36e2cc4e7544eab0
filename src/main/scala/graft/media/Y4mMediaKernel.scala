package graft.media

import graft.media.Media._


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
