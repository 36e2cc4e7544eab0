package graft

import graft.media.{Asset, BmpMediaKernel, DispatchMediaKernel, PpmMediaKernel, StubMediaKernel}

/** The pure-JVM BMP kernel: uncompressed BITMAPINFOHEADER decode —
  * little-endian header, 4-byte row padding, BGR(A)→RGB swap,
  * bottom-up and top-down row order — pinned against hand-built
  * files, against the PPM kernel (same pixels → same statistics),
  * and against the dispatch contract.
  */
class BmpKernelSpec extends SparkSpec {

  private def le16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  /** Assemble a BI_RGB BMP from natural-row-order RGB pixels: rows are
    * stored bottom-up (or top-down for negative height), channels
    * swapped to BGR(A), rows padded to 4 bytes.
    */
  private def bmp(w: Int, h: Int, rgb: Array[Byte], bpp: Int = 24,
      topDown: Boolean = false): Array[Byte] = {
    require(rgb.length == 3 * w * h)
    val bytesPp = bpp / 8
    val rowSize = ((bpp * w + 31) / 32) * 4
    val dataOff = 54
    val out = new java.io.ByteArrayOutputStream()
    out.write('B'); out.write('M')
    out.write(le32(dataOff + rowSize * h))
    out.write(le32(0)); out.write(le32(dataOff))
    out.write(le32(40))
    out.write(le32(w)); out.write(le32(if (topDown) -h else h))
    out.write(le16(1)); out.write(le16(bpp))
    out.write(le32(0)) // BI_RGB
    out.write(le32(rowSize * h))
    out.write(le32(2835)); out.write(le32(2835))
    out.write(le32(0)); out.write(le32(0))
    val rows = if (topDown) 0 until h else (h - 1) to 0 by -1
    for (y <- rows) {
      val row = new Array[Byte](rowSize)
      for (x <- 0 until w) {
        val q = 3 * (y * w + x)
        row(x * bytesPp) = rgb(q + 2)     // B
        row(x * bytesPp + 1) = rgb(q + 1) // G
        row(x * bytesPp + 2) = rgb(q)     // R
        if (bpp == 32) row(x * bytesPp + 3) = 0xff.toByte
      }
      out.write(row)
    }
    out.toByteArray
  }

  private def asset(id: Long, b: Array[Byte]): Asset =
    Asset(id, "application/octet-stream", b.length.toLong, b)

  /** Value view of AssetFeatures (the features array compares by
    * reference in the case class).
    */
  private def feat(f: graft.media.AssetFeatures) =
    (f.asset_id, f.width, f.height, f.features.toSeq)

  private val Rgb2x2 = Array[Byte](
    255.toByte, 0, 0, 0, 255.toByte, 0,
    0, 0, 255.toByte, 255.toByte, 255.toByte, 255.toByte)

  test("24-bit bottom-up decode with row padding: hand-computed " +
    "statistics, and the SAME pixels as P6 yield the SAME features") {
    val a = asset(1L, bmp(2, 2, Rgb2x2))
    val f = BmpMediaKernel.decodeBatch(Seq(a)).head
    assert(f.width == 2 && f.height == 2)
    assert(f.features.toSeq == Seq(
      0.5f, 0.5f, 0.5f, 0.5f, 1.0f, 1.0f, 1.0f, 0.25f),
      f.features.toSeq.toString)
    val p6 = ("P6\n2 2\n255\n".getBytes("US-ASCII") ++ Rgb2x2).toArray
    val viaPpm = PpmMediaKernel
      .decodeBatch(Seq(Asset(1L, "x", p6.length.toLong, p6))).head
    assert(f.features.toSeq == viaPpm.features.toSeq)
    val bmpRows = BmpMediaKernel.frames(a, 1).toSeq
    val ppmRows = PpmMediaKernel
      .frames(Asset(1L, "x", p6.length.toLong, p6), 1).toSeq
    assert(bmpRows.map(r => (r.frame_idx, r.n_bytes, r.frame_hash)) ==
      ppmRows.map(r => (r.frame_idx, r.n_bytes, r.frame_hash)))
  }

  test("top-down (negative height) and 32-bit (BGRA) variants decode " +
    "to the same pixels as the 24-bit bottom-up file") {
    val w = 5 // odd width: 24-bit rows carry a real pad
    val h = 3
    val rgb = Array.tabulate(3 * w * h)(i => ((i * 53 + 7) % 256).toByte)
    val base = BmpMediaKernel.decodeBmp(bmp(w, h, rgb))
    assert(base.isDefined && base.get._3.toSeq == rgb.toSeq,
      "24-bit bottom-up must reconstruct every byte")
    for ((variant, what) <- Seq(
        bmp(w, h, rgb, topDown = true) -> "top-down",
        bmp(w, h, rgb, bpp = 32) -> "32-bit",
        bmp(w, h, rgb, bpp = 32, topDown = true) -> "32-bit top-down")) {
      val got = BmpMediaKernel.decodeBmp(variant)
      assert(got.isDefined && got.get._3.toSeq == rgb.toSeq, what)
    }
  }

  test("dispatch contract: palettized/compressed/truncated/" +
    "out-of-bounds variants take the stub arithmetic exactly") {
    val good = bmp(2, 2, Rgb2x2)
    val bpp8 = { val b = good.clone(); b(28) = 8; b }
    val rle = { val b = good.clone(); b(30) = 1; b } // BI_RLE8
    val truncated = good.take(good.length - 4)
    val hugeOffset = { val b = good.clone(); b(10) = 0xff.toByte; b }
    val zeroW = { val b = good.clone(); b(18) = 0; b }
    for ((bad, what) <- Seq(bpp8 -> "8-bit", rle -> "RLE",
        truncated -> "truncated", hugeOffset -> "bad offset",
        zeroW -> "zero width")) {
      val a = asset(9L, bad)
      assert(feat(BmpMediaKernel.decodeBatch(Seq(a)).head) ==
        feat(StubMediaKernel.decodeBatch(Seq(a)).head), s"$what must stub")
    }
    val a = asset(9L, good)
    assert(feat(BmpMediaKernel.decodeBatch(Seq(a)).head) !=
      feat(StubMediaKernel.decodeBatch(Seq(a)).head))
  }

  test("router: a BMP payload reaches the BMP kernel through " +
    "DispatchMediaKernel, and a non-BMP 'BM…' text payload falls " +
    "through the parse onto the stub") {
    val a = asset(7L, bmp(2, 2, Rgb2x2))
    assert(feat(DispatchMediaKernel.decodeBatch(Seq(a)).head) ==
      feat(BmpMediaKernel.decodeBatch(Seq(a)).head))
    val texty = asset(8L,
      "BMW dealers quote maintenance schedules online".getBytes("US-ASCII"))
    assert(feat(DispatchMediaKernel.decodeBatch(Seq(texty)).head) ==
      feat(StubMediaKernel.decodeBatch(Seq(texty)).head))
  }
}
