package graft

import graft.operators.Multimodal
import graft.media.{Asset, DispatchMediaKernel, GifMediaKernel, PpmMediaKernel, StubMediaKernel}

/** The pure-JVM GIF kernel: REAL first-frame decode — header/LSD
  * parse, color tables, GIF-LZW (variable-width LSB-first codes,
  * CLEAR/END, KwKwK, width growth to 12 bits, table freeze at 4096),
  * interlace row mapping — pinned against a from-scratch compressing
  * LZW encoder with hand-chosen pixels, against the PPM kernel (same
  * pixels, different container → same statistics), and against the
  * dispatch contract (malformed payloads take the stub exactly).
  */
class GifKernelSpec extends SparkSpec {

  // ---- from-scratch GIF writer: LSB-first bit packer + a REAL
  // compressing LZW encoder that mirrors the decoder's width/CLEAR
  // conventions (entry creation lags one code on the decode side, so
  // the encoder widens at next == (1<<codeSize)+1 and CLEARs at 4096)

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var acc = 0
    private var n = 0
    def write(code: Int, size: Int): Unit = {
      acc |= code << n
      n += size
      while (n >= 8) { out.write(acc & 0xff); acc >>>= 8; n -= 8 }
    }
    def bytes(): Array[Byte] = {
      if (n > 0) { out.write(acc & 0xff); acc = 0; n = 0 }
      out.toByteArray
    }
  }

  private def lzwEncode(minCodeSize: Int, pixels: Array[Byte]): Array[Byte] = {
    val clear = 1 << minCodeSize
    val end = clear + 1
    val w = new BitWriter
    var codeSize = minCodeSize + 1
    val dict = scala.collection.mutable.HashMap.empty[(Int, Int), Int]
    var next = end + 1
    w.write(clear, codeSize)
    var cur = -1
    for (b <- pixels) {
      val p = b & 0xff
      require(p < clear, "pixel index out of palette")
      if (cur == -1) cur = p
      else dict.get((cur, p)) match {
        case Some(c) => cur = c
        case None =>
          w.write(cur, codeSize)
          if (next < 4096) {
            dict((cur, p)) = next
            next += 1
            // the decoder creates this entry one code LATER (its
            // counter lags ours by one), widening when its counter
            // hits 1<<codeSize — which is when ours hits it + 1, so
            // the code we emit NEXT is read at the decoder's width
            if (next == (1 << codeSize) + 1 && codeSize < 12)
              codeSize += 1
          } else {
            // table full: hand the decoder a CLEAR instead of running
            // deferred-clear 12-bit codes forever
            w.write(clear, codeSize)
            dict.clear(); next = end + 1; codeSize = minCodeSize + 1
          }
          cur = p
      }
    }
    if (cur != -1) w.write(cur, codeSize)
    w.write(end, codeSize)
    w.bytes()
  }

  private def u16le(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  /** Assemble a single-frame GIF89a. `palette` is 3·2^k bytes; pixels
    * are palette indexes in natural row order — pass `interlaced` to
    * store them in 4-pass order with the flag set.
    */
  private def gif(w: Int, h: Int, palette: Array[Byte],
      pixels: Array[Byte], interlaced: Boolean = false,
      extraFrame: Boolean = false): Array[Byte] = {
    val entries = palette.length / 3
    require(Integer.bitCount(entries) == 1 && entries >= 2)
    val pbits = Integer.numberOfTrailingZeros(entries)
    val stored =
      if (!interlaced) pixels
      else {
        val order = (0 until h by 8) ++ (4 until h by 8) ++
          (2 until h by 4) ++ (1 until h by 2)
        order.flatMap(y =>
          pixels.slice(y * w, (y + 1) * w)).toArray
      }
    val minCode = math.max(2, pbits)
    val data = lzwEncode(minCode, stored)
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    out.write(u16le(w)); out.write(u16le(h))
    out.write(0x80 | (pbits - 1)) // GCT present, 2^pbits entries
    out.write(0); out.write(0)
    out.write(palette)
    def frame(): Unit = {
      out.write(0x2c)
      out.write(u16le(0)); out.write(u16le(0))
      out.write(u16le(w)); out.write(u16le(h))
      out.write(if (interlaced) 0x40 else 0x00)
      out.write(minCode)
      data.grouped(255).foreach { blk =>
        out.write(blk.length); out.write(blk)
      }
      out.write(0)
    }
    frame()
    if (extraFrame) frame()
    out.write(0x3b)
    out.toByteArray
  }

  private def asset(id: Long, b: Array[Byte]): Asset =
    Asset(id, "application/octet-stream", b.length.toLong, b)

  /** Value view of AssetFeatures (the features array compares by
    * reference in the case class).
    */
  private def feat(f: graft.media.AssetFeatures) =
    (f.asset_id, f.width, f.height, f.features.toSeq)

  // the PNG spec's 2x2: red, green, blue, white
  private val Palette4 = Array[Byte](
    255.toByte, 0, 0, 0, 255.toByte, 0, 0, 0, 255.toByte,
    255.toByte, 255.toByte, 255.toByte)
  private val Rgb2x2 = Array[Byte](
    255.toByte, 0, 0, 0, 255.toByte, 0,
    0, 0, 255.toByte, 255.toByte, 255.toByte, 255.toByte)

  test("first-frame decode: hand-computed statistics, and the SAME " +
    "pixels as P6 yield the SAME features (container-invariant)") {
    val a = asset(1L, gif(2, 2, Palette4, Array[Byte](0, 1, 2, 3)))
    val f = GifMediaKernel.decodeBatch(Seq(a)).head
    assert(f.width == 2 && f.height == 2)
    assert(f.features.toSeq == Seq(
      0.5f, 0.5f, 0.5f, 0.5f, 1.0f, 1.0f, 1.0f, 0.25f),
      f.features.toSeq.toString)
    val p6 = ("P6\n2 2\n255\n".getBytes("US-ASCII") ++ Rgb2x2).toArray
    val viaPpm = PpmMediaKernel
      .decodeBatch(Seq(Asset(1L, "x", p6.length.toLong, p6))).head
    assert(f.features.toSeq == viaPpm.features.toSeq)
    val gifRows = GifMediaKernel.frames(a, 1).toSeq
    val ppmRows = PpmMediaKernel
      .frames(Asset(1L, "x", p6.length.toLong, p6), 1).toSeq
    assert(gifRows.map(r => (r.frame_idx, r.n_bytes, r.frame_hash)) ==
      ppmRows.map(r => (r.frame_idx, r.n_bytes, r.frame_hash)))
  }

  test("LZW round-trip property: random images drive width growth, " +
    "KwKwK sequences and the 4096 table CLEAR — every pixel exact") {
    val rnd = new scala.util.Random(42)
    for ((w, h, colors) <- Seq((64, 64, 128), (128, 128, 256),
        (37, 11, 4), (1, 1, 2), (255, 3, 16))) {
      val palette = Array.tabulate(colors * 3)(i =>
        ((i * 97 + 13) % 256).toByte)
      val pixels = Array.tabulate(w * h)(_ =>
        rnd.nextInt(colors).toByte)
      // runs of repeats provoke the KwKwK case
      for (i <- 10 until math.min(w * h, 300)) pixels(i) = pixels(i / 2)
      val decoded = GifMediaKernel.decodeGif(gif(w, h, palette, pixels))
      assert(decoded.isDefined, s"$w x $h / $colors must parse")
      val (dw, dh, rgb) = decoded.get
      assert(dw == w && dh == h)
      val expected = pixels.flatMap(p =>
        palette.slice(3 * (p & 0xff), 3 * (p & 0xff) + 3))
      assert(rgb.toSeq == expected.toSeq, s"$w x $h / $colors pixels")
    }
  }

  test("interlaced streams map the 4-pass row order back to natural " +
    "order") {
    val w = 8
    val h = 13 // odd, not a multiple of 8 — exercises every pass edge
    val palette = Array.tabulate(16 * 3)(i => ((i * 31) % 256).toByte)
    val pixels = Array.tabulate(w * h)(i => (i % 16).toByte)
    val flat = GifMediaKernel.decodeGif(gif(w, h, palette, pixels)).get
    val inter = GifMediaKernel.decodeGif(
      gif(w, h, palette, pixels, interlaced = true)).get
    assert(inter._3.toSeq == flat._3.toSeq,
      "interlaced and sequential storage must decode identically")
  }

  test("animated GIFs decode the FIRST frame only") {
    val one = GifMediaKernel.decodeGif(
      gif(2, 2, Palette4, Array[Byte](0, 1, 2, 3)))
    val two = GifMediaKernel.decodeGif(
      gif(2, 2, Palette4, Array[Byte](0, 1, 2, 3), extraFrame = true))
    assert(one.isDefined && two.isDefined)
    assert(one.get._3.toSeq == two.get._3.toSeq)
  }

  test("dispatch contract: truncated stream, missing color table, " +
    "out-of-palette index, early END, oversized claim and trailer-" +
    "before-image all take the stub arithmetic exactly") {
    val good = gif(2, 2, Palette4, Array[Byte](0, 1, 2, 3))
    val noTable = {
      // GCT flag off, no local table either
      val b = good.clone(); b(10) = 0x00.toByte
      // splice out the 12 palette bytes
      b.take(13) ++ b.drop(13 + 12)
    }
    val truncated = good.take(good.length - 6)
    val trailerFirst = good.take(13) ++ Array(0x3b.toByte)
    val oversized = {
      val b = good.clone()
      // image descriptor follows the 12-byte GCT at 13; its w/h live
      // at +5/+7 past the 0x2c — claim 60000 x 60000
      val d = 13 + 12
      assert((b(d) & 0xff) == 0x2c)
      b(d + 5) = 0x60.toByte; b(d + 6) = 0xea.toByte
      b(d + 7) = 0x60.toByte; b(d + 8) = 0xea.toByte
      b
    }
    val outOfPalette = {
      // palette claims 2 entries but pixels index up to 3: rebuild
      // with a 4-entry encode then shrink the GCT size bits
      val b = gif(2, 2, Palette4, Array[Byte](0, 1, 2, 3))
      b(10) = (0x80 | 0).toByte // 2 entries claimed
      b.take(13) ++ b.slice(13, 13 + 6) ++ b.drop(13 + 12)
    }
    for ((bad, what) <- Seq(noTable -> "no color table",
        truncated -> "truncated", trailerFirst -> "trailer first",
        oversized -> "oversized", outOfPalette -> "out-of-palette")) {
      val a = asset(9L, bad)
      val viaGif = GifMediaKernel.decodeBatch(Seq(a)).head
      val viaStub = StubMediaKernel.decodeBatch(Seq(a)).head
      assert(feat(viaGif) == feat(viaStub), s"$what must take the stub")
    }
    // and the good payload must NOT take the stub
    val a = asset(9L, good)
    assert(feat(GifMediaKernel.decodeBatch(Seq(a)).head) !=
      feat(StubMediaKernel.decodeBatch(Seq(a)).head))
  }

  test("router: a GIF payload reaches the GIF kernel through " +
    "DispatchMediaKernel; features match the direct decode") {
    val a = asset(7L, gif(2, 2, Palette4, Array[Byte](0, 1, 2, 3)))
    assert(feat(DispatchMediaKernel.decodeBatch(Seq(a)).head) ==
      feat(GifMediaKernel.decodeBatch(Seq(a)).head))
    assert(Multimodal.kernel eq StubMediaKernel,
      "default kernel must stay the stub")
  }
}
