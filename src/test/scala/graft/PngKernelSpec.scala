package graft

import java.nio.ByteBuffer

import graft.operators.Multimodal
import graft.media.{Asset, DispatchMediaKernel, PngMediaKernel, PpmMediaKernel, StubMediaKernel}

/** The pure-JVM PNG kernel: REAL decode of the first real-world
  * container in the kernel mix — CRC-checked chunk walk, zlib inflate,
  * all five scanline filters, every 8-bit color type — pinned against a
  * from-scratch encoder with hand-chosen pixels, against the PPM kernel
  * (same pixels, different container → same statistics), and against
  * the dispatch contract (malformed payloads take the stub exactly).
  */
class PngKernelSpec extends SparkSpec {
  import spark.implicits._

  // ---- from-scratch encoder (signature + CRC chunks + deflate +
  // per-row filter application, the exact inverse of the decoder) ----

  private def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val bb = ByteBuffer.allocate(12 + data.length)
    bb.putInt(data.length)
    bb.put(typ.getBytes("US-ASCII")); bb.put(data)
    val crc = new java.util.zip.CRC32()
    crc.update(typ.getBytes("US-ASCII")); crc.update(data)
    bb.putInt(crc.getValue.toInt)
    bb.array()
  }

  private def deflate(b: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(b); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private val Channels = Map(0 -> 1, 2 -> 3, 3 -> 1, 4 -> 2, 6 -> 4)

  /** Encode `pixels` (h × w × channels bytes, row-major) as a PNG,
    * filtering row y with `filters(y % filters.length)`.
    */
  private def png(w: Int, h: Int, colorType: Int, pixels: Array[Byte],
      filters: Seq[Int] = Seq(0),
      plte: Option[Array[Byte]] = None): Array[Byte] = {
    val ch = Channels(colorType)
    val stride = w * ch
    require(pixels.length == h * stride, "pixel buffer shape")
    val raw = new Array[Byte](h * (stride + 1))
    for (y <- 0 until h) {
      val f = filters(y % filters.length)
      raw(y * (stride + 1)) = f.toByte
      for (x <- 0 until stride) {
        val cur = pixels(y * stride + x) & 0xff
        val left = if (x >= ch) pixels(y * stride + x - ch) & 0xff else 0
        val up = if (y > 0) pixels((y - 1) * stride + x) & 0xff else 0
        val ul =
          if (y > 0 && x >= ch) pixels((y - 1) * stride + x - ch) & 0xff
          else 0
        val pred = f match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case 4 =>
            val p = left + up - ul
            val (pa, pb, pc) =
              (math.abs(p - left), math.abs(p - up), math.abs(p - ul))
            if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul
        }
        raw(y * (stride + 1) + 1 + x) = (cur - pred).toByte
      }
    }
    val ihdr = ByteBuffer.allocate(13)
    ihdr.putInt(w).putInt(h).put(8.toByte).put(colorType.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte)
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte) ++
      chunk("IHDR", ihdr.array()) ++
      plte.map(p => chunk("PLTE", p)).getOrElse(Array.empty[Byte]) ++
      chunk("IDAT", deflate(raw)) ++
      chunk("IEND", Array.empty[Byte])
  }

  private def asset(id: Long, bytes: Array[Byte]) =
    Asset(id, "image/png", bytes.length.toLong, bytes)

  private val Rgb2x2: Array[Byte] =
    Seq(255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255)
      .map(_.toByte).toArray

  test("RGB decode: hand-computed channel means/maxes/luma/bright " +
    "fraction — and the SAME pixels as P6 yield the SAME features " +
    "(container-invariant statistics)") {
    val a = asset(1L, png(2, 2, 2, Rgb2x2))
    val f = PngMediaKernel.decodeBatch(Seq(a)).head
    assert(f.width == 2 && f.height == 2)
    assert(f.features.toSeq == Seq(
      0.5f, 0.5f, 0.5f, // mean R, G, B: (255+255)/(255*4) each
      0.5f,             // mean luma
      1.0f, 1.0f, 1.0f, // each channel peaks at 255
      0.25f),           // only the white pixel clears luma > 1/2
      f.features.toSeq.toString)
    val p6 = ("P6\n2 2\n255\n".getBytes("US-ASCII") ++ Rgb2x2).toArray
    val viaPpm = PpmMediaKernel
      .decodeBatch(Seq(Asset(1L, "x", p6.length.toLong, p6))).head
    assert(f.features.toSeq == viaPpm.features.toSeq &&
      f.width == viaPpm.width && f.height == viaPpm.height,
      "PNG and P6 must decode the same pixels to the same statistics")
    // row sampling too: same decoded rows hash the same bytes
    val pngRows = PngMediaKernel.frames(a, 1).toSeq
    val ppmRows = PpmMediaKernel
      .frames(Asset(1L, "x", p6.length.toLong, p6), 1).toSeq
    assert(pngRows.map(r => (r.frame_idx, r.n_bytes, r.frame_hash)) ==
      ppmRows.map(r => (r.frame_idx, r.n_bytes, r.frame_hash)))
  }

  test("all five scanline filters reconstruct exactly: a gradient " +
    "image round-trips through None/Sub/Up/Average/Paeth rows") {
    val w = 5
    val h = 5
    val pixels = Array.tabulate(h * w * 3) { i =>
      val p = i / 3
      ((p * 37 + (i % 3) * 11) % 256).toByte
    }
    val bytes = png(w, h, 2, pixels, filters = Seq(0, 1, 2, 3, 4))
    val img = PngMediaKernel.decodePng(bytes)
    assert(img.isDefined, "filtered stream must parse")
    assert(img.get.rgb.toSeq == pixels.toSeq,
      "unfilter must reconstruct every byte exactly")
  }

  test("grayscale, gray+alpha, RGBA and palette color types expand to " +
    "the right RGB frame (alpha dropped, gray replicated, palette " +
    "looked up)") {
    // gray 2×1: 10, 200 → each replicated across R=G=B
    val gray = PngMediaKernel.decodePng(
      png(2, 1, 0, Array[Byte](10, 200.toByte))).get
    assert(gray.rgb.toSeq == Seq[Byte](10, 10, 10, 200.toByte,
      200.toByte, 200.toByte))
    // gray+alpha: alpha bytes must not leak into the statistics
    val ga = PngMediaKernel.decodePng(
      png(2, 1, 4, Array[Byte](10, 0, 200.toByte, 255.toByte))).get
    assert(ga.rgb.toSeq == gray.rgb.toSeq)
    // RGBA: drop alpha
    val rgba = PngMediaKernel.decodePng(png(2, 1, 6,
      Array[Byte](1, 2, 3, 0, 4, 5, 6, 255.toByte))).get
    assert(rgba.rgb.toSeq == Seq[Byte](1, 2, 3, 4, 5, 6))
    // palette: indexes 1, 0 against a 2-entry PLTE
    val pal = PngMediaKernel.decodePng(png(2, 1, 3, Array[Byte](1, 0),
      plte = Some(Array[Byte](9, 8, 7, 99, 98, 97)))).get
    assert(pal.rgb.toSeq == Seq[Byte](99, 98, 97, 9, 8, 7))
    // an out-of-range palette index is an opaque blob, not a crash
    assert(PngMediaKernel.decodePng(png(2, 1, 3, Array[Byte](2, 0),
      plte = Some(Array[Byte](9, 8, 7, 99, 98, 97)))).isEmpty)
  }

  test("resize: nearest-neighbor luma thumbnail over the decoded frame") {
    val a = asset(3L, png(2, 2, 2, Rgb2x2))
    val t = PngMediaKernel.resizeBatch(Seq(a), 2, 2).head
    // luma of each source pixel: 255/3 = 85, 85, 85, 255
    assert(t.thumb.map(_ & 0xff).toSeq == Seq(85, 85, 85, 255))
    val p6 = ("P6\n2 2\n255\n".getBytes("US-ASCII") ++ Rgb2x2).toArray
    assert(t.thumb.toSeq == PpmMediaKernel
      .resizeBatch(Seq(Asset(3L, "x", p6.length.toLong, p6)), 2, 2)
      .head.thumb.toSeq, "same pixels, same thumbnail, either container")
  }

  test("dispatch contract: corrupt CRC, truncated IDAT, interlace and " +
    "16-bit depth all take the stub arithmetic exactly") {
    val good = png(2, 2, 2, Rgb2x2)
    val badCrc = good.clone()
    badCrc(badCrc.length - 1) = (badCrc(badCrc.length - 1) ^ 0x01).toByte
    val truncated = {
      // rebuild with the IDAT's deflate stream cut in half — a valid
      // chunk (CRC recomputed) whose inflate cannot complete
      val raw = deflate {
        val stride = 2 * 3
        val r = new Array[Byte](2 * (stride + 1))
        for (y <- 0 until 2; x <- 0 until stride)
          r(y * (stride + 1) + 1 + x) = Rgb2x2(y * stride + x)
        r
      }
      val ihdr = ByteBuffer.allocate(13)
      ihdr.putInt(2).putInt(2).put(8.toByte).put(2.toByte)
        .put(0.toByte).put(0.toByte).put(0.toByte)
      Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte) ++
        chunk("IHDR", ihdr.array()) ++
        chunk("IDAT", raw.take(raw.length / 2)) ++
        chunk("IEND", Array.empty[Byte])
    }
    val interlaced = {
      val b = png(2, 2, 2, Rgb2x2)
      // IHDR data: offset 8 (sig) + 8 (len+type) + 12 = interlace byte;
      // patching it invalidates the CRC too — either reason suffices
      b(8 + 8 + 12) = 1
      b
    }
    val text = "just some document text".getBytes("UTF-8")
    for ((bytes, id) <- Seq(badCrc -> 5L, truncated -> 6L,
        interlaced -> 7L, text -> 8L)) {
      val a = asset(id, bytes)
      assert(PngMediaKernel.decodePng(bytes).isEmpty,
        s"payload $id must be an opaque blob")
      val viaPng = PngMediaKernel.decodeBatch(Seq(a)).head
      val viaStub = StubMediaKernel.decodeBatch(Seq(a)).head
      assert(viaPng.width == viaStub.width &&
        viaPng.height == viaStub.height &&
        viaPng.features.toSeq == viaStub.features.toSeq)
      assert(PngMediaKernel.frames(a, 2).toSeq.map(_.frame_hash) ==
        StubMediaKernel.frames(a, 2).toSeq.map(_.frame_hash))
    }
  }

  test("adversarial IHDR dimensions: a CRC-valid header claiming " +
    "2^31-1 x 2^31-1 pixels is an opaque blob, not an allocation or a " +
    "crash (the size guards must be overflow-safe)") {
    val ihdr = ByteBuffer.allocate(13)
    ihdr.putInt(Int.MaxValue).putInt(Int.MaxValue)
      .put(8.toByte).put(6.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    val bytes =
      Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte) ++
        chunk("IHDR", ihdr.array()) ++
        chunk("IDAT", Array[Byte](0x78, 0x01)) ++
        chunk("IEND", Array.empty[Byte])
    assert(PngMediaKernel.decodePng(bytes).isEmpty)
    // and the full dispatch path takes the stub without throwing
    val a = asset(30L, bytes)
    assert(PngMediaKernel.decodeBatch(Seq(a)).head.features.toSeq ==
      StubMediaKernel.decodeBatch(Seq(a)).head.features.toSeq)
    // a large-but-1-channel claim must ALSO bound the RGB expansion
    val gray = ByteBuffer.allocate(13)
    gray.putInt(8192).putInt(4096) // raw ~34MB passes; RGB 100MB must not
    gray.put(8.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
      .put(0.toByte)
    val grayBytes =
      Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte) ++
        chunk("IHDR", gray.array()) ++
        chunk("IDAT", Array[Byte](0x78, 0x01)) ++
        chunk("IEND", Array.empty[Byte])
    assert(PngMediaKernel.decodePng(grayBytes).isEmpty,
      "the decoded-RGB bound must hold for 1-channel color types too")
  }

  test("property: random images of every non-palette color type with " +
    "mixed per-row filters round-trip EXACTLY (seeded, 40 images)") {
    val rnd = new scala.util.Random(20260814L)
    for (round <- 1 to 40) {
      val colorType = Seq(0, 2, 4, 6)(rnd.nextInt(4))
      val ch = Channels(colorType)
      val w = 1 + rnd.nextInt(12)
      val h = 1 + rnd.nextInt(12)
      val pixels = Array.fill(h * w * ch)(rnd.nextInt(256).toByte)
      val filters = Seq.fill(h)(rnd.nextInt(5))
      val img = PngMediaKernel
        .decodePng(png(w, h, colorType, pixels, filters))
        .getOrElse(fail(s"round $round: valid stream must parse"))
      val expect = new Array[Byte](w * h * 3)
      for (p <- 0 until w * h) colorType match {
        case 2 | 6 =>
          expect(3 * p) = pixels(p * ch)
          expect(3 * p + 1) = pixels(p * ch + 1)
          expect(3 * p + 2) = pixels(p * ch + 2)
        case 0 | 4 =>
          val g = pixels(p * ch)
          expect(3 * p) = g; expect(3 * p + 1) = g; expect(3 * p + 2) = g
      }
      assert(img.w == w && img.h == h, s"round $round dims")
      assert(img.rgb.toSeq == expect.toSeq,
        s"round $round: $colorType ${w}x$h filters $filters")
    }
  }

  test("router: a real PNG reaches the PNG kernel through the " +
    "distributed plumbing, gate values stay byte-identical under the " +
    "dispatch kernel") {
    def gateRows(name: String) =
      SparkEntry.queries(name)(spark, sf0001).collect().map(_.toString).toSet
    val stubFeatures = gateRows("multimodal_features")
    Multimodal.setKernel(DispatchMediaKernel)
    try {
      assert(gateRows("multimodal_features") == stubFeatures,
        "gate values must not move under the dispatch kernel")
      val decoded = Multimodal.extractFeatures(
          Seq(asset(20L, png(2, 2, 2, Rgb2x2))).toDS())
        .collect().head
      assert(decoded.width == 2 && decoded.features.toSeq.take(4) ==
        Seq(0.5f, 0.5f, 0.5f, 0.5f),
        "PNG payload must reach the PNG kernel through the router")
    } finally Multimodal.setKernel(StubMediaKernel)
  }
}
