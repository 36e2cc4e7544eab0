package graft

import graft.operators.Multimodal
import graft.media.{Asset, DispatchMediaKernel, Mp4MediaKernel, StubMediaKernel}

/** The ISO BMFF (MP4) box-walk kernel: box tiling (32-bit, 64-bit and
  * size-0 terminal boxes), mvhd/tkhd/mdhd/hdlr/stsz extraction,
  * metering features, sample-size-envelope thumbnails, top-level-box
  * sampling, and the dispatch contract. Fixtures are hand-built box
  * trees — every expected value is hand-computed.
  */
class Mp4KernelSpec extends SparkSpec {

  private def be32(v: Long): Array[Byte] = Array(
    ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
    ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def box(typ: String, payload: Array[Byte]): Array[Byte] =
    be32(8L + payload.length) ++ typ.getBytes("US-ASCII") ++ payload

  /** mvhd/mdhd v0: version+flags, ctime, mtime, timescale, duration,
    * then enough trailing bytes for the fixed layout.
    */
  private def mvhd(timescale: Long, duration: Long): Array[Byte] =
    box("mvhd", new Array[Byte](4) ++ be32(0) ++ be32(0) ++
      be32(timescale) ++ be32(duration) ++ new Array[Byte](80))

  private def mdhd(timescale: Long, duration: Long): Array[Byte] =
    box("mdhd", new Array[Byte](4) ++ be32(0) ++ be32(0) ++
      be32(timescale) ++ be32(duration) ++ new Array[Byte](4))

  /** tkhd v0: 76 payload bytes of fixed layout, then 16.16 width and
    * height.
    */
  private def tkhd(w: Int, h: Int): Array[Byte] =
    box("tkhd", new Array[Byte](76) ++ be32(w.toLong << 16) ++
      be32(h.toLong << 16))

  private def hdlr(handler: String): Array[Byte] =
    box("hdlr", new Array[Byte](8) ++ handler.getBytes("US-ASCII") ++
      new Array[Byte](12))

  /** stsz: uniform size (table-free) when `uniform` > 0, else a
    * per-sample size table.
    */
  private def stsz(uniform: Int, sizes: Seq[Int]): Array[Byte] =
    box("stsz", new Array[Byte](4) ++ be32(uniform.toLong) ++
      be32(sizes.length.toLong) ++
      (if (uniform == 0) sizes.toArray.flatMap(s => be32(s.toLong))
       else Array.empty[Byte]))

  private def trak(w: Int, h: Int, handler: String, uniform: Int,
      sizes: Seq[Int]): Array[Byte] =
    box("trak", tkhd(w, h) ++ box("mdia",
      mdhd(1000, 0) ++ hdlr(handler) ++
        box("minf", box("stbl", stsz(uniform, sizes)))))

  private def ftyp: Array[Byte] =
    box("ftyp", "isom".getBytes("US-ASCII") ++ be32(0) ++
      "isommp42".getBytes("US-ASCII"))

  private def asset(id: Long, bytes: Array[Byte]) =
    Asset(id, "video/mp4", bytes.length.toLong, bytes)

  test("two-track movie: hand-computed duration, track/handler counts, " +
    "video dimensions, sample totals and mdat share — all from the box " +
    "tree, no codec decode") {
    val video = trak(320, 240, "vide", 0, Seq(100, 200, 300))
    val audio = trak(0, 0, "soun", 128, Seq(1, 2, 3, 4)) // uniform stsz
    val mdat = box("mdat", Array.fill(600 + 4 * 128)(0x42.toByte))
    val bytes = ftyp ++ box("moov", mvhd(1000, 2500) ++ video ++ audio) ++
      mdat
    val f = Mp4MediaKernel.decodeBatch(Seq(asset(1L, bytes))).head
    assert(f.width == 320 && f.height == 240,
      "width/height carry the video track's pixel dimensions")
    assert(f.features(0) == 2.5f, s"duration ${f.features(0)}")
    assert(f.features(1) == 2f, "track count")
    assert(f.features(2) == 1f && f.features(3) == 1f,
      "one video, one audio track")
    assert(f.features(4) == 7f, "3 video + 4 audio samples")
    assert(f.features(5) ==
      (mdat.length.toDouble / bytes.length).toFloat, "mdat share")
    assert(f.features(6) == (mdat.length / 7.0).toFloat,
      "mean sample bytes")
    assert(f.features(7) == 3f, "ftyp + moov + mdat")
  }

  test("audio-only movie: no video track means 0x0 dimensions, " +
    "handler counts still exact") {
    val bytes = ftyp ++ box("moov",
      mvhd(600, 1200) ++ trak(0, 0, "soun", 64, Seq(1, 2)))
    val f = Mp4MediaKernel.decodeBatch(Seq(asset(2L, bytes))).head
    assert(f.width == 0 && f.height == 0)
    assert(f.features(0) == 2f && f.features(2) == 0f &&
      f.features(3) == 1f)
  }

  test("box-walk variants: a 64-bit largesize box and a size-0 " +
    "terminal mdat both tile correctly") {
    val payload = Array.fill(16)(0x11.toByte)
    val large = be32(1) ++ "mdat".getBytes("US-ASCII") ++
      Array[Byte](0, 0, 0, 0) ++ be32(16L + payload.length) ++ payload
    val movie = ftyp ++ box("moov",
      mvhd(1000, 1000) ++ trak(8, 8, "vide", 0, Seq(5)))
    val withLarge = movie ++ large
    val f1 = Mp4MediaKernel.decodeBatch(Seq(asset(3L, withLarge))).head
    assert(f1.features(7) == 3f, "largesize mdat is one box")
    assert(f1.features(5) ==
      (large.length.toDouble / withLarge.length).toFloat)
    // size-0: extends to EOF, must be last
    val zero = be32(0) ++ "mdat".getBytes("US-ASCII") ++ payload
    val withZero = movie ++ zero
    val f2 = Mp4MediaKernel.decodeBatch(Seq(asset(4L, withZero))).head
    assert(f2.features(7) == 3f && f2.features(5) ==
      (zero.length.toDouble / withZero.length).toFloat)
  }

  test("top-level-box sampler and sample-size-envelope thumbnail") {
    val movie = ftyp ++ box("moov",
      mvhd(1000, 1000) ++ trak(8, 8, "vide", 0, Seq(10, 40))) ++
      box("mdat", Array.fill(50)(0x07.toByte))
    val a = asset(5L, movie)
    val all = Mp4MediaKernel.frames(a, 1).toSeq
    assert(all.map(_.frame_idx) == Seq(0, 1, 2))
    val tops = Seq(
      java.util.Arrays.copyOfRange(movie, 0, ftyp.length),
      java.util.Arrays.copyOfRange(movie, ftyp.length, movie.length - 58),
      java.util.Arrays.copyOfRange(movie, movie.length - 58, movie.length))
    assert(all.map(_.n_bytes) == tops.map(_.length.toLong))
    assert(all.map(_.frame_hash) == tops.map(graft.media.Media.byteHash))
    // envelope: sizes 10 and 40 against max 40 → 63 and 255
    val r = Mp4MediaKernel.resizeBatch(Seq(a), 2, 1).head
    assert(r.thumb.toSeq == Seq((10 * 255 / 40).toByte, 255.toByte),
      s"got ${r.thumb.toSeq}")
  }

  test("malformed containers take the stub arithmetic exactly: missing " +
    "moov, overrunning box, truncated stsz table, non-leading ftyp, " +
    "damaged trak, text") {
    val good = ftyp ++ box("moov",
      mvhd(1000, 1000) ++ trak(8, 8, "vide", 0, Seq(5)))
    val noMoov = ftyp ++ box("free", Array.fill(8)(0.toByte))
    val overrun = good.take(good.length - 4) // last box overruns
    // stsz declares 4 samples but carries 1 table entry
    val badStsz = ftyp ++ box("moov", mvhd(1000, 1000) ++
      box("trak", tkhd(8, 8) ++ box("mdia", mdhd(1000, 0) ++
        hdlr("vide") ++ box("minf", box("stbl",
          box("stsz", new Array[Byte](4) ++ be32(0) ++ be32(4) ++
            be32(5)))))))
    val notFirst = box("free", Array.empty[Byte]) ++ good
    // a trak without tkhd: container damaged, not "fewer tracks"
    val noTkhd = ftyp ++ box("moov", mvhd(1000, 1000) ++
      box("trak", box("mdia", mdhd(1000, 0) ++ hdlr("vide") ++
        box("minf", box("stbl", stsz(1, Seq(1)))))))
    val text = "just some document text".getBytes("UTF-8")
    for ((bytes, id) <- Seq(noMoov -> 10L, overrun -> 11L,
        badStsz -> 12L, notFirst -> 13L, noTkhd -> 14L, text -> 15L)) {
      val a = asset(id, bytes)
      assert(Mp4MediaKernel.parseMp4(bytes).isEmpty,
        s"payload $id must not parse")
      val viaMp4 = Mp4MediaKernel.decodeBatch(Seq(a)).head
      val viaStub = StubMediaKernel.decodeBatch(Seq(a)).head
      assert(viaMp4.width == viaStub.width &&
        viaMp4.features.toSeq == viaStub.features.toSeq,
        s"payload $id must take the stub")
    }
  }

  test("router: the ftyp magic at offset 4 routes to the MP4 kernel " +
    "through the dispatcher; a rotten ftyp-prefixed payload still " +
    "serves stub values") {
    val movie = ftyp ++ box("moov",
      mvhd(1000, 2000) ++ trak(16, 16, "vide", 0, Seq(9)))
    val viaDispatch = DispatchMediaKernel
      .decodeBatch(Seq(asset(20L, movie))).head
    assert(viaDispatch.width == 16 && viaDispatch.features(0) == 2f,
      "dispatch must route MP4 to the box-walk kernel")
    val rotten = asset(21L, ftyp ++ "garbage".getBytes("UTF-8"))
    assert(DispatchMediaKernel.decodeBatch(Seq(rotten)).head
      .features.toSeq ==
      StubMediaKernel.decodeBatch(Seq(rotten)).head.features.toSeq)
  }
}
