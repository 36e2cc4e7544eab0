package graft

import graft.operators.{Dedup, Multimodal}
import graft.media.{Asset, DispatchMediaKernel, PpmMediaKernel, StubMediaKernel, WavMediaKernel}

/** Perceptual image near-dup dedup: the dHash kernel (integer luma,
  * floor-boundary box averaging, gradient-sign bits), the rgbFrame SPI
  * surface it reads pixels through, cross-container hash invariance
  * (same pixels → same phash whichever container carried them), and
  * the planted-corpus banding contract (every planted family pair is
  * within the banding's lossless Hamming radius, and the candidate
  * join is band-bucketed, never all-pairs).
  */
class PerceptualHashSpec extends SparkSpec {
  import spark.implicits._

  private def p6(w: Int, h: Int, pixels: Seq[(Int, Int, Int)]): Array[Byte] =
    s"P6\n$w $h\n255\n".getBytes("US-ASCII") ++
      pixels.flatMap { case (r, g, b) => Seq(r.toByte, g.toByte, b.toByte) }

  private def gray(w: Int, h: Int, v: Int => Int): Array[Byte] = {
    val rgb = new Array[Byte](3 * w * h)
    for (k <- 0 until w * h) {
      val b = v(k).toByte
      rgb(3 * k) = b; rgb(3 * k + 1) = b; rgb(3 * k + 2) = b
    }
    rgb
  }

  // --- minimal truecolor PNG encoder (filter 0, one IDAT) so the
  // cross-container pin needs no fixture files ---
  private def pngChunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def be32(v: Long): Unit =
      (24 to 0 by -8).foreach(s => out.write(((v >> s) & 0xff).toInt))
    be32(data.length.toLong)
    out.write(typ.getBytes("US-ASCII")); out.write(data)
    val crc = new java.util.zip.CRC32()
    crc.update(typ.getBytes("US-ASCII")); crc.update(data)
    be32(crc.getValue)
    out.toByteArray
  }

  private def png(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h).put(8.toByte).put(2.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    val raw = new java.io.ByteArrayOutputStream()
    for (y <- 0 until h) {
      raw.write(0) // filter None per scanline
      raw.write(rgb, 3 * y * w, 3 * w)
    }
    val d = new java.util.zip.Deflater()
    d.setInput(raw.toByteArray); d.finish()
    val buf = new Array[Byte](raw.size() + 64)
    val n = d.deflate(buf)
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      pngChunk("IHDR", ihdr) ++ pngChunk("IDAT", buf.take(n)) ++
      pngChunk("IEND", Array.empty[Byte])
  }

  test("dHash64: gradient-sign bits on an identity-size (9×8) grid " +
    "match a hand-walked derivation; sub-grid frames hash to None") {
    // strictly increasing lumas across each row → every horizontal
    // gradient is positive → all 64 bits set
    val inc = gray(9, 8, k => (k % 9) * 10)
    assert(Multimodal.dHash64(9, 8, inc) == Some(-1L))
    // strictly decreasing → no bit set
    val dec = gray(9, 8, k => 200 - (k % 9) * 10)
    assert(Multimodal.dHash64(9, 8, dec) == Some(0L))
    // single flip: only pixel (1,0) raised above pixel (2,0) — bits 0
    // (grid 0→1 rises) stays set, bit 1 (grid 1→2 falls) clears; rows
    // 1..7 keep the increasing pattern
    val one = gray(9, 8, k => if (k == 1) 90 else (k % 9) * 10)
    val got = Multimodal.dHash64(9, 8, one).get
    assert((got & 1L) == 1L && (got & 2L) == 0L)
    // smaller than the grid in either dimension → no hash
    assert(Multimodal.dHash64(8, 8, gray(8, 8, _ => 0)).isEmpty)
    assert(Multimodal.dHash64(9, 7, gray(9, 7, _ => 0)).isEmpty)
  }

  test("dHash64: 18×16 box-average downsample is exact 2×2 integer " +
    "mean (floor), pinned against a direct 9×8 rendering of the " +
    "averaged grid — and luma uses the 299/587/114 integer weights") {
    def v(k: Int): Int = (k * 37 + 11) % 256
    val big = gray(18, 16, v)
    // hand-average each 2×2 box into the 9×8 image (the left 9 columns
    // of the 18-wide frame form cx 0..8 after pairing)
    val avg = Array.tabulate(9 * 8) { c =>
      val cx = c % 9; val cy = c / 9
      val ks = Seq((2 * cy) * 18 + 2 * cx, (2 * cy) * 18 + 2 * cx + 1,
        (2 * cy + 1) * 18 + 2 * cx, (2 * cy + 1) * 18 + 2 * cx + 1)
      ks.map(v).sum / 4
    }
    val small = gray(9, 8, k => avg(k))
    assert(Multimodal.dHash64(18, 16, big) ==
      Multimodal.dHash64(9, 8, small))
    // color luma: (299R+587G+114B)/1000 — pixel 1 of row 0 gets R=255
    // (luma 76), the rest luma 100 via G=170,B=2 → (587*170+114*2)/1000
    // = (99790+228)/1000 = 100; bit 0 must read 76 < 100 correctly
    val rgb = new Array[Byte](3 * 9 * 8)
    for (k <- 0 until 9 * 8) {
      if (k == 0) { rgb(0) = 255.toByte }
      else { rgb(3 * k + 1) = 170.toByte; rgb(3 * k + 2) = 2.toByte }
    }
    val h = Multimodal.dHash64(9, 8, rgb).get
    assert((h & 1L) == 1L, "luma(255,0,0)=76 must read BELOW luma 100")
    assert((h & 2L) == 0L, "flat 100s right of cell 1 have no gradient")
  }

  test("cross-container invariance: the SAME pixels carried as P6 and " +
    "as PNG hash identically through the magic-routed dispatch; " +
    "audio/undecodable payloads yield NO hash row") {
    val rgb = gray(18, 16, k => (k * 53 + 7) % 256)
    val assets = Seq(
      Asset(1L, "image/x-portable-pixmap", 0L, p6(18, 16,
        (0 until 18 * 16).map { k =>
          val v = (k * 53 + 7) % 256; (v, v, v)
        })),
      Asset(2L, "image/png", 0L, png(18, 16, rgb)),
      Asset(3L, "audio/wav", 0L, "RIFF1234WAVEjunk".getBytes("US-ASCII")),
      Asset(4L, "text/plain", 0L, "not an image".getBytes("US-ASCII")))
    val hashes = Multimodal
      .perceptualHashes(assets.toDS(), DispatchMediaKernel)
      .collect().map(p => p.asset_id -> p.phash).toMap
    assert(hashes.keySet == Set(1L, 2L),
      s"only the two image containers hash: $hashes")
    assert(hashes(1L) == hashes(2L),
      "same pixels must hash identically whichever container carried them")
    // and the direct kernels agree with the dispatch route
    assert(PpmMediaKernel.rgbFrame(assets.head).isDefined)
    assert(WavMediaKernel.rgbFrame(assets(2)).isEmpty)
    assert(StubMediaKernel.rgbFrame(assets(3)).isEmpty)
  }

  test("planted corpus: every family pair is within Hamming ≤ 2 (so " +
    "4×16-bit banding is lossless for it), banded candidates equal " +
    "brute-force all-pairs at the ≤ 3 radius, and clusters elect the " +
    "min-id canonical") {
    val hashes = Multimodal
      .perceptualHashes(Multimodal.plantedImages(spark, sf0001),
        DispatchMediaKernel)
      .collect().map(p => p.asset_id -> p.phash).toMap
    val docs = hashes.keySet
    assert(docs.nonEmpty && docs.forall(hashes.contains),
      "every planted image must decode and hash")
    // planted family members: ≤ 2 bits apart (only grid cell (7,3)
    // comparisons can move)
    for (id <- docs if id % 8 > 0 && id % 8 < 3; base = id - (id % 8)
         if docs.contains(base)) {
      val d = java.lang.Long.bitCount(hashes(id) ^ hashes(base))
      assert(d <= 2, s"family ($base, $id) drifted to Hamming $d")
    }
    // banding vs brute force at radius ≤ 3 (banding is LOSSLESS there)
    val brute = (for {
      a <- docs; b <- docs if a < b
      d = java.lang.Long.bitCount(hashes(a) ^ hashes(b)) if d <= 3
    } yield (a, b, d.toLong)).toSet
    val banded = Multimodal.perceptualDupPairs(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(banded == brute,
      s"banding missed/invented pairs: ${banded.diff(brute)} / ${brute.diff(banded)}")
    // components: canonical is the min reachable id
    val cc = Dedup.connectedComponents(
      Multimodal.perceptualDupPairs(spark, sf0001)
        .select($"asset_a".as("doc_a"), $"asset_b".as("doc_b")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for ((id, cl) <- cc) assert(cl <= id && cc(cl) == cl,
      s"cluster label $cl of $id is not a canonical min")
  }

  test("encodeBmp: the planted BMP container round-trips through the " +
    "magic-routed decode pixel-exactly, so a family mixing P6 and BMP " +
    "variants still hashes consistently") {
    val rgb = gray(18, 16, k => (k * 91 + 3) % 256)
    val bmp = Multimodal.encodeBmp(18, 16, rgb)
    val a = Asset(7L, "image/bmp", bmp.length.toLong, bmp)
    val got = DispatchMediaKernel.rgbFrame(a)
    assert(got.isDefined, "BMP must route and decode")
    val (w, h, out) = got.get
    assert(w == 18 && h == 16)
    assert(out.toSeq == rgb.toSeq, "BGR/bottom-up/padding must invert")
    // and the planted corpus genuinely ships both containers
    val mimes = Multimodal.plantedImages(spark, sf0001)
      .collect().map(_.mime).toSet
    assert(mimes == Set("image/x-portable-pixmap", "image/bmp"))
  }

  test("incremental image dedup: phashKeepNew against the persisted " +
    "index equals the full-rebuild keep-list restricted to the " +
    "incoming wave, and the index lifecycle (fold, delete, compact, " +
    "replay) serves consistently") {
    val hashes = Multimodal
      .perceptualHashes(Multimodal.plantedImages(spark, sf0001),
        DispatchMediaKernel)
      .collect().map(p => p.asset_id -> p.phash).toMap
    // full-rebuild truth: an asset survives iff no smaller id within 3
    // AMONG BAND COLLISIONS (banding is part of the contract; at ≤ 3
    // it is lossless anyway by pigeonhole)
    def chunkSet(h: Long) = (0 until 4).map(c => (c, (h >>> (c * 16)) & 0xFFFFL)).toSet
    def rejected(id: Long): Boolean = hashes.exists { case (o, oh) =>
      o < id && chunkSet(oh).intersect(chunkSet(hashes(id))).nonEmpty &&
        java.lang.Long.bitCount(oh ^ hashes(id)) <= 3
    }
    val expect = hashes.keySet.filter(id => id % 5 == 4 && !rejected(id))

    val idx = Multimodal.ensureIncrementalPhashIndex(spark, sf0001)
    val incoming = Multimodal.perceptualHashes(
      Multimodal.plantedImages(spark, sf0001)
        .filter($"asset_id" % 5 === 4), DispatchMediaKernel).toDF()
    val got = Multimodal.phashKeepNew(spark, idx, incoming)
      .select($"asset_id").as[Long].collect().toSet
    assert(got == expect,
      s"keep-list drift: extra=${got.diff(expect)} missing=${expect.diff(got)}")

    // lifecycle on a scratch index: fold exactly-once, takedown
    // unshields a victim's near-dups, compaction serve-identical
    val scratch = tmpDir("phash-idx")
    val hist = incoming.sparkSession.createDataFrame(
      hashes.toSeq.filter(_._1 % 5 != 4).map(identity))
      .toDF("asset_id", "phash")
    Multimodal.writePhashIndex(hist.filter($"asset_id" % 2 === 0), scratch)
    assert(Multimodal.appendToPhashIndex(
      hist.filter($"asset_id" % 2 =!= 0), scratch, 0L))
    assert(!Multimodal.appendToPhashIndex(
      hist.filter($"asset_id" % 2 =!= 0), scratch, 0L),
      "a committed fold must short-circuit")
    val full = Multimodal.phashKeepNew(spark, scratch, incoming)
      .select($"asset_id").as[Long].collect().toSet
    assert(full == expect, "seed+fold must serve like the one-shot index")
    // takedown: deleting every indexed history row leaves only
    // wave-internal partners
    assert(Multimodal.deleteFromPhashIndex(
      hist.select($"asset_id"), scratch, 1L))
    val waveOnly = Multimodal.phashKeepNew(spark, scratch, incoming)
      .select($"asset_id").as[Long].collect().toSet
    def rejectedByWave(id: Long): Boolean = hashes.exists { case (o, oh) =>
      o < id && o % 5 == 4 &&
        chunkSet(oh).intersect(chunkSet(hashes(id))).nonEmpty &&
        java.lang.Long.bitCount(oh ^ hashes(id)) <= 3
    }
    assert(waveOnly ==
      hashes.keySet.filter(id => id % 5 == 4 && !rejectedByWave(id)),
      "tombstoned history must stop shielding")
    // compaction is serve-identical
    Multimodal.compactPhashIndex(spark, scratch)
    assert(Multimodal.phashKeepNew(spark, scratch, incoming)
      .select($"asset_id").as[Long].collect().toSet == waveOnly)
  }

  test("video frames: Y4M rgbFrames decodes every-th frame, neutral " +
    "chroma reproduces luma exactly, real chroma takes the fixed-point " +
    "BT.601 path, and a still image is its own one-frame video") {
    import graft.media.DispatchMediaKernel
    // hand-built 2-frame 2×2 C420 stream: frame 0 neutral chroma
    // (RGB must equal luma), frame 1 pure-red-ish chroma
    val header = "YUV4MPEG2 W2 H2 F25:1 C420\n".getBytes("US-ASCII")
    val fh = "FRAME\n".getBytes("US-ASCII")
    def frame(y: Seq[Int], u: Int, v: Int): Array[Byte] =
      fh ++ (y.map(_.toByte) :+ u.toByte :+ v.toByte)
    val y4m = header ++ frame(Seq(10, 20, 30, 40), 128, 128) ++
      frame(Seq(100, 100, 100, 100), 128, 228)
    val a = Asset(1L, "video/x-yuv4mpeg", y4m.length.toLong, y4m)
    val frames = DispatchMediaKernel.rgbFrames(a, 1).toSeq
    assert(frames.map(_._1) == Seq(0, 1))
    val (_, w0, h0, rgb0) = frames.head
    assert(w0 == 2 && h0 == 2)
    assert(rgb0.toSeq == Seq(10, 20, 30, 40).flatMap(v =>
      Seq(v.toByte, v.toByte, v.toByte)),
      "neutral chroma must reproduce the luma byte exactly")
    // frame 1: e = 100 → R = 100 + (91881*100 >> 16) = 100 + 140 = 240,
    // G = 100 - (46802*100 >> 16) = 100 - 71 = 29, B = 100
    val (_, _, _, rgb1) = frames(1)
    assert((rgb1(0) & 0xff, rgb1(1) & 0xff, rgb1(2) & 0xff) ==
      ((240, 29, 100)), s"BT.601 fixed point drifted: ${rgb1.toSeq}")
    // sampling: every=2 keeps frame 0 only
    assert(DispatchMediaKernel.rgbFrames(a, 2).map(_._1).toSeq == Seq(0))
    // a still image serves one frame at idx 0 through the same surface
    val still = Asset(2L, "image/x-portable-pixmap", 0L,
      p6(18, 16, (0 until 288).map(k => (k % 256, k % 256, k % 256))))
    assert(DispatchMediaKernel.rgbFrames(still, 1).map(_._1).toSeq ==
      Seq(0))
  }

  test("planted videos: every family's aligned frames stay within " +
    "Hamming ≤ 2, videoDupPairs finds each planted family pair with " +
    "all frames matched, and banding equals brute force at the " +
    "video threshold") {
    val fh = Multimodal.framePerceptualHashes(
      Multimodal.plantedVideos(spark, sf0001),
      graft.media.DispatchMediaKernel)
      .collect().map(p => (p.asset_id, p.frame_idx) -> p.phash).toMap
    val ids = fh.keys.map(_._1).toSet
    assert(fh.size == ids.size * Multimodal.PlantFrames,
      "every planted video must hash all its frames")
    for (id <- ids if id % 8 > 0 && id % 8 < 3; base = id - (id % 8)
         if ids.contains(base); f <- 0 until Multimodal.PlantFrames) {
      val d = java.lang.Long.bitCount(fh((id, f)) ^ fh((base, f)))
      assert(d <= 2, s"family ($base, $id) frame $f drifted to $d")
    }
    val got = Multimodal.videoDupPairs(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    // brute force at the same banded-then-verify semantics
    def chunkSet(h: Long) =
      (0 until 4).map(c => (c, (h >>> (c * 16)) & 0xFFFFL)).toSet
    val brute = (for {
      x <- ids; y <- ids if x < y
      n = (0 until Multimodal.PlantFrames).count { f =>
        chunkSet(fh((x, f))).intersect(chunkSet(fh((y, f)))).nonEmpty &&
          java.lang.Long.bitCount(fh((x, f)) ^ fh((y, f))) <= 3
      } if n >= Multimodal.VideoMinMatch
    } yield (x, y) -> n.toLong).toMap
    assert(got == brute)
    // planted family pairs match on ALL frames
    for (id <- ids if id % 8 > 0 && id % 8 < 3; base = id - (id % 8)
         if ids.contains(base)) {
      assert(got.get((base, id)).contains(Multimodal.PlantFrames.toLong),
        s"family pair ($base, $id) must match every aligned frame")
    }
  }

  test("audio fingerprints: the |x| envelope sums monoInt units per " +
    "time bin, gradient bits follow the envelope, non-decodable " +
    "payloads yield no fingerprint, and planted families stay within " +
    "Hamming ≤ 2 with banding equal to brute force") {
    import graft.media.DispatchMediaKernel
    // hand-built 8-bit mono WAV, 130 samples: first 65 quiet (128 →
    // |x| 0), last 65 loud (0 → |x| 128·256) — envelope rises once at
    // the midpoint, so exactly bit 31 is set (bin 31 → 32 boundary:
    // samples 62..63 quiet, 64..65 mixed? — compute: bin = t·65/130 =
    // t/2; bins 0..31 quiet (t ≤ 63), bin 32 holds t=64 (quiet) and
    // t=65 (loud), bins 33+ loud — env: 0×32, then 32768, then 65536×32
    // → rises at bins 31→32 and 32→33: bits 31 and 32
    def wav(samples: Seq[Int]): Array[Byte] = {
      val n = samples.length
      val out = java.nio.ByteBuffer.allocate(44 + n)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put("RIFF".getBytes("US-ASCII")).putInt(36 + n)
        .put("WAVE".getBytes("US-ASCII"))
      out.put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(1).putInt(8000).putInt(8000)
        .putShort(1).putShort(8)
      out.put("data".getBytes("US-ASCII")).putInt(n)
      samples.foreach(v => out.put(v.toByte))
      out.array()
    }
    val bytes = wav(Seq.fill(65)(128) ++ Seq.fill(65)(0))
    val a = Asset(1L, "audio/wav", bytes.length.toLong, bytes)
    val env = DispatchMediaKernel.audioEnvelope(a, 65).get
    assert(env.length == 65)
    assert(env.take(32).forall(_ == 0L))
    assert(env(32) == 128L * 256, "bin 32 holds one quiet + one loud")
    assert(env.drop(33).forall(_ == 2L * 128 * 256))
    val fp = Multimodal.audioFingerprints(Seq(a).toDS(),
      DispatchMediaKernel).collect()
    assert(fp.length == 1)
    assert(fp.head.phash == ((1L << 31) | (1L << 32)),
      s"exactly the two rise bits must be set: ${fp.head.phash.toBinaryString}")
    // too short / non-audio: no fingerprint row
    val short = Asset(2L, "audio/wav", 0L, wav(Seq.fill(10)(0)))
    val text = Asset(3L, "text/plain", 0L, "not audio".getBytes)
    assert(Multimodal.audioFingerprints(Seq(short, text).toDS(),
      DispatchMediaKernel).collect().isEmpty)

    // planted corpus: family drift ≤ 2 bits; banding == brute force
    val hashes = Multimodal.audioFingerprints(
      Multimodal.plantedAudio(spark, sf0001), DispatchMediaKernel)
      .collect().map(p => p.asset_id -> p.phash).toMap
    for (id <- hashes.keySet if id % 8 > 0 && id % 8 < 3;
         base = id - (id % 8) if hashes.contains(base)) {
      val d = java.lang.Long.bitCount(hashes(id) ^ hashes(base))
      assert(d <= 2, s"audio family ($base, $id) drifted to $d")
    }
    val brute = (for {
      x <- hashes.keySet; y <- hashes.keySet if x < y
      d = java.lang.Long.bitCount(hashes(x) ^ hashes(y)) if d <= 3
    } yield (x, y, d.toLong)).toSet
    val banded = Multimodal.audioDupPairs(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(banded == brute)
  }

  test("phash index as-of: horizon 0 on an evolved index dedups like " +
    "a fresh history-only index, the pre-delete horizon still lets " +
    "victims shield, and the max horizon equals the current view — " +
    "every persisted index kind now serves ledger horizons") {
    val hashes = Multimodal
      .perceptualHashes(Multimodal.plantedImages(spark, sf0001),
        DispatchMediaKernel)
      .collect().map(p => p.asset_id -> p.phash).toMap
    val histA = hashes.toSeq.filter { case (id, _) =>
      id % 5 != 4 && id % 2 == 0 }.toDF("asset_id", "phash")
    val histB = hashes.toSeq.filter { case (id, _) =>
      id % 5 != 4 && id % 2 != 0 }.toDF("asset_id", "phash")
    val incoming = hashes.toSeq.filter(_._1 % 5 == 4)
      .toDF("asset_id", "phash")
    // evolved: seed half the history, fold the rest as b1, tombstone
    // the seed half as d2
    val evolved = tmpDir("phash-asof")
    Multimodal.writePhashIndex(histA, evolved)
    assert(Multimodal.appendToPhashIndex(histB, evolved, 1L))
    assert(Multimodal.deleteFromPhashIndex(
      histA.select($"asset_id"), evolved, 2L))
    val fresh = tmpDir("phash-asof-hist")
    Multimodal.writePhashIndex(histA, fresh)
    def keep(idx: String, asOf: Option[Long] = None) =
      Multimodal.phashKeepNew(spark, idx, incoming, asOf = asOf)
        .select($"asset_id").as[Long].collect().toSet
    assert(keep(evolved, Some(0L)) == keep(fresh),
      "horizon 0 must dedup exactly like the history-only index")
    assert(keep(evolved, Some(2L)) == keep(evolved),
      "the max horizon must equal the current view")
    // the delete UNSHIELDS: horizon 2 keeps at least everything
    // horizon 1 kept (fewer partners can only admit more survivors)
    assert(keep(evolved, Some(1L)).subsetOf(keep(evolved, Some(2L))),
      "removing partners must never reject a previously-kept asset")
    // the SEARCH serve shares the horizon semantics: horizon 0 finds
    // exactly what the history-only index finds, and the post-delete
    // horizon hides every tombstoned asset
    val probes = incoming.select($"asset_id".as("query_id"), $"phash")
    def search(idx: String, asOf: Option[Long] = None) =
      Multimodal.phashSearch(spark, idx, probes, asOf = asOf)
        .as[(Long, Long, Long)].collect().toSet
    assert(search(evolved, Some(0L)) == search(fresh),
      "search at horizon 0 must equal the history-only index")
    val deleted = histA.select($"asset_id").as[Long].collect().toSet
    assert(!search(evolved, Some(2L)).exists(r => deleted.contains(r._2)),
      "post-delete search must hide every tombstoned asset")
    assert(search(evolved, Some(1L)).exists(r => deleted.contains(r._2)),
      "the pre-delete horizon must still serve eventual victims")
  }

  test("never-all-pairs: the candidate join keys are the band chunks " +
    "(chunk, cv), not a cross of the corpus") {
    val analyzed = Multimodal.perceptualDupPairs(spark, sf0001)
      .queryExecution.analyzed
    val joins = analyzed.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    assert(joins.nonEmpty)
    val keyed = joins.forall(_.condition.exists(c =>
      c.references.map(_.name).toSet.intersect(Set("chunk", "cv")).nonEmpty ||
        c.references.map(_.name).exists(_.startsWith("asset"))))
    assert(keyed, "every join must be band- or id-keyed")
    assert(!analyzed.exists {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join =>
        j.condition.isEmpty
      case _ => false
    }, "no condition-free (cross) join in the pair pipeline")
  }
}
