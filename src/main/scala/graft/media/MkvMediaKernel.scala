package graft.media

import graft.media.Media._


/** Pure-JVM kernel for Matroska/WebM video containers — an EBML
  * element walk, NO codec decode: the Matroska sibling of
  * [[Mp4MediaKernel]]'s box walk. Every Matroska element is
  * (vint id, vint size, payload), so duration (Info's float
  * Duration × TimestampScale), track layout (Tracks → TrackEntry →
  * TrackType / Video PixelWidth/Height / Audio
  * SamplingFrequency+Channels) and the media-payload share (Cluster
  * byte spans) all fall out of the element tree without touching a
  * coded frame. The EBML header must come first and elements must
  * tile their parent exactly; an unknown (all-ones) size is accepted
  * ONLY on the Segment (the live-muxing convention — it then extends
  * to EOF). Anything else — a truncated vint, an overrunning
  * element, a video track without dimensions, no tracks — is an
  * opaque blob for the stub. MkvKernelSpec pins hand-built trees.
  *
  * `AssetFeatures.width`/`height` carry the first video track's
  * pixel dimensions (the MP4 convention; 0×0 when no video track).
  * Feature layout: duration seconds, track count, video track
  * count, audio track count, cluster count, cluster byte fraction
  * of the payload, first audio track's sampling rate (0 when none),
  * first audio track's channel count (0 when none).
  */
object MkvMediaKernel extends MediaKernel {

  private[graft] final case class Elem(id: Long, off: Int,
      payloadOff: Int, payloadLen: Int)
  private[graft] final case class MkvTrack(typ: Int, w: Int,
      h: Int, freq: Double, channels: Int)
  private[graft] final case class MkvInfo(tsScale: Long,
      durTicks: Double, tracks: Vector[MkvTrack],
      segChildren: Vector[Elem]) {
    def clusters: Vector[Elem] = segChildren.filter(_.id == IdCluster)
    def durationSec: Double = durTicks * tsScale / 1e9
  }

  private val IdEbml = 0x1A45DFA3L
  private val IdSegment = 0x18538067L
  private val IdInfo = 0x1549A966L
  private val IdTimestampScale = 0x2AD7B1L
  private val IdDuration = 0x4489L
  private val IdTracks = 0x1654AE6BL
  private val IdTrackEntry = 0xAEL
  private val IdTrackType = 0x83L
  private val IdVideo = 0xE0L
  private val IdPixelWidth = 0xB0L
  private val IdPixelHeight = 0xBAL
  private val IdAudio = 0xE1L
  private val IdSamplingFrequency = 0xB5L
  private val IdChannels = 0x9FL
  private val IdCluster = 0x1F43B675L

  /** Element ID at `i`: 1–4 bytes, marker bit KEPT (the raw-ID
    * convention Matroska specs use). Returns (id, bytesRead).
    */
  private def readId(b: Array[Byte], i: Int): Option[(Long, Int)] = {
    if (i >= b.length) return None
    val first = b(i) & 0xff
    val n = Integer.numberOfLeadingZeros(first) - 23 // 1..8 for bit 7..0
    if (n < 1 || n > 4 || i + n > b.length) return None
    var v = first.toLong
    for (k <- 1 until n) v = (v << 8) | (b(i + k) & 0xff)
    Some((v, n))
  }

  /** Element size at `i`: 1–8 bytes, marker bit STRIPPED; the
    * all-value-bits-ones pattern means "unknown", returned as -1.
    */
  private def readSize(b: Array[Byte], i: Int): Option[(Long, Int)] = {
    if (i >= b.length) return None
    val first = b(i) & 0xff
    val n = Integer.numberOfLeadingZeros(first) - 23
    if (n < 1 || n > 8 || i + n > b.length) return None
    var v = (first & (0xff >> n)).toLong
    for (k <- 1 until n) v = (v << 8) | (b(i + k) & 0xff)
    val allOnes = (1L << (7 * n)) - 1
    Some((if (v == allOnes) -1L else v, n))
  }

  /** Walk the elements tiling [from, until): known sizes must fit
    * exactly; an unknown size is accepted only when
    * `unknownToEnd` contains the element's id (it then extends to
    * `until` and must be last). None on any overrun or gap.
    */
  private def walk(b: Array[Byte], from: Int, until: Int,
      unknownToEnd: Set[Long] = Set.empty): Option[Vector[Elem]] = {
    val out = Vector.newBuilder[Elem]
    var i = from
    while (i < until) {
      val (id, idLen) = readId(b, i).getOrElse(return None)
      val (size, szLen) = readSize(b, i + idLen).getOrElse(return None)
      val pOff = i + idLen + szLen
      val pLen =
        if (size >= 0) {
          if (size > until - pOff) return None
          size.toInt
        } else if (unknownToEnd.contains(id)) until - pOff
        else return None
      out += Elem(id, i, pOff, pLen)
      i = pOff + pLen
    }
    Some(out.result())
  }

  private def childrenOf(b: Array[Byte], e: Elem): Option[Vector[Elem]] =
    walk(b, e.payloadOff, e.payloadOff + e.payloadLen)

  /** Big-endian unsigned integer payload (0–8 bytes; empty = 0,
    * the EBML convention).
    */
  private def uintOf(b: Array[Byte], e: Elem): Option[Long] =
    if (e.payloadLen > 8) None
    else {
      var v = 0L
      for (k <- 0 until e.payloadLen)
        v = (v << 8) | (b(e.payloadOff + k) & 0xff)
      Some(v)
    }

  /** EBML float payload: 4 or 8 bytes (0 bytes = 0.0 per spec). */
  private def floatOf(b: Array[Byte], e: Elem): Option[Double] =
    e.payloadLen match {
      case 0 => Some(0.0)
      case 4 =>
        var bits = 0
        for (k <- 0 until 4) bits = (bits << 8) | (b(e.payloadOff + k) & 0xff)
        Some(java.lang.Float.intBitsToFloat(bits).toDouble)
      case 8 =>
        var bits = 0L
        for (k <- 0 until 8) bits = (bits << 8) | (b(e.payloadOff + k) & 0xff)
        Some(java.lang.Double.longBitsToDouble(bits))
      case _ => None
    }

  private def find(kids: Vector[Elem], id: Long): Option[Elem] =
    kids.find(_.id == id)

  /** A TrackEntry must carry a TrackType; a video track (type 1)
    * must carry pixel dimensions; audio parameters take the spec
    * defaults (8000 Hz, 1 channel) when the Audio element or its
    * children are absent.
    */
  private def parseTrack(b: Array[Byte],
      entry: Elem): Option[MkvTrack] = for {
    kids <- childrenOf(b, entry)
    typEl <- find(kids, IdTrackType)
    typ <- uintOf(b, typEl)
    dims <-
      if (typ != 1) Some((0, 0))
      else for {
        video <- find(kids, IdVideo)
        vkids <- childrenOf(b, video)
        w <- find(vkids, IdPixelWidth).flatMap(uintOf(b, _))
        h <- find(vkids, IdPixelHeight).flatMap(uintOf(b, _))
        if w > 0 && h > 0
      } yield (w.toInt, h.toInt)
    audio = find(kids, IdAudio).flatMap(childrenOf(b, _))
    freq <- audio.flatMap(find(_, IdSamplingFrequency)) match {
      case Some(e) => floatOf(b, e)
      case None => Some(8000.0)
    }
    channels <- audio.flatMap(find(_, IdChannels)) match {
      case Some(e) => uintOf(b, e)
      case None => Some(1L)
    }
  } yield MkvTrack(typ.toInt, dims._1, dims._2,
    if (typ == 2) freq else 0.0,
    if (typ == 2) channels.toInt else 0)

  private[graft] def parseMkv(b: Array[Byte]): Option[MkvInfo] = for {
    tops <- walk(b, 0, b.length, unknownToEnd = Set(IdSegment))
    if tops.headOption.exists(_.id == IdEbml)
    seg <- tops.find(_.id == IdSegment)
    segKids <- childrenOf(b, seg)
    info <- find(segKids, IdInfo)
    infoKids <- childrenOf(b, info)
    tsScale <- find(infoKids, IdTimestampScale) match {
      case Some(e) => uintOf(b, e)
      case None => Some(1000000L) // spec default: 1 ms ticks
    }
    durTicks <- find(infoKids, IdDuration) match {
      case Some(e) => floatOf(b, e)
      case None => Some(0.0)
    }
    tracksEl <- find(segKids, IdTracks)
    entries <- childrenOf(b, tracksEl)
    tracks <- traverseTracks(b, entries.filter(_.id == IdTrackEntry))
    if tracks.nonEmpty
  } yield MkvInfo(tsScale, durTicks, tracks, segKids)

  /** Every TrackEntry must parse — an entry the walk cannot make
    * sense of means the container is damaged, not "fewer tracks".
    */
  private def traverseTracks(b: Array[Byte],
      entries: Vector[Elem]): Option[Vector[MkvTrack]] = {
    val parsed = entries.map(parseTrack(b, _))
    if (parsed.exists(_.isEmpty)) None else Some(parsed.flatten)
  }

  def decodeBatch(batch: Seq[Asset]): Seq[AssetFeatures] = batch.map { a =>
    parseMkv(a.content) match {
      case None => StubMediaKernel.decodeBatch(Seq(a)).head
      case Some(m) =>
        val video = m.tracks.find(_.typ == 1)
        val audio = m.tracks.find(_.typ == 2)
        val clusterBytes = m.clusters
          .map(c => (c.payloadOff + c.payloadLen - c.off).toLong).sum
        AssetFeatures(a.asset_id,
          video.map(_.w).getOrElse(0),
          video.map(_.h).getOrElse(0), Array(
            m.durationSec.toFloat,
            m.tracks.length.toFloat,
            m.tracks.count(_.typ == 1).toFloat,
            m.tracks.count(_.typ == 2).toFloat,
            m.clusters.length.toFloat,
            (clusterBytes.toDouble / a.content.length).toFloat,
            audio.map(_.freq).getOrElse(0.0).toFloat,
            audio.map(_.channels).getOrElse(0).toFloat))
    }
  }

  /** Cluster-size envelope thumbnail: `w*h` bytes, nearest-neighbor
    * along clusters, each byte the cluster's total span requantized
    * against the largest — the Matroska analog of the MP4
    * sample-size envelope. Cluster-less containers fall back to the
    * stub.
    */
  def resizeBatch(batch: Seq[Asset], w: Int, h: Int): Seq[ResizedAsset] =
    batch.map { a =>
      parseMkv(a.content) match {
        case Some(m) if m.clusters.nonEmpty =>
          val sizes = m.clusters
            .map(c => c.payloadOff + c.payloadLen - c.off)
          val mx = math.max(1, sizes.max)
          val thumb = Array.tabulate(w * h) { i =>
            val k = (i.toLong * sizes.length / (w.toLong * h)).toInt
            (sizes(k) * 255 / mx).toByte
          }
          ResizedAsset(a.asset_id, w, h, thumb)
        case _ => StubMediaKernel.resizeBatch(Seq(a), w, h).head
      }
    }

  /** The Segment's top-level elements (Info, Tracks, each Cluster …)
    * are the natural chunking the element walk yields: each is one
    * sample with its true byte span, every `every`-th kept.
    */
  def frames(a: Asset, every: Int): Iterator[FrameSample] =
    parseMkv(a.content) match {
      case None => StubMediaKernel.frames(a, every)
      case Some(m) =>
        m.segChildren.iterator.zipWithIndex.filter(_._2 % every == 0)
          .map { case (e, k) =>
            val bytes = java.util.Arrays.copyOfRange(
              a.content, e.off, e.payloadOff + e.payloadLen)
            FrameSample(a.asset_id, k, bytes.length.toLong,
              byteHash(bytes))
          }
    }
}
