package graft.media

import graft.media.Media._


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

  private[graft] final case class Mp4Box(off: Int, len: Int,
      typ: String, payloadOff: Int)
  private[graft] final case class Mp4Track(handler: String,
      width: Int, height: Int, sampleSize: Int,
      sampleSizes: Vector[Int]) {
    def sampleCount: Int = sampleSizes.length
  }
  private[graft] final case class Mp4Info(timescale: Long,
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
