package graft.media

import graft.media.Media._


/** Magic-byte router over the real kernels — the production shape: a
  * mixed corpus decodes each payload with the implementation its
  * container asks for (PNG, baseline JPEG, GIF and uncompressed BMP
  * images, P6 pixmaps, RIFF/WAVE PCM, MPEG-1 Layer III and FLAC
  * audio, ISO BMFF / MP4 and Matroska/WebM video containers,
  * YUV4MPEG2 raw video), and
  * anything unrecognized stays on the stub arithmetic (so the
  * oracle-gated queries hold byte-identical under this kernel too,
  * pinned in WavKernelSpec/PngKernelSpec/JpegKernelSpec/
  * Mp3KernelSpec).
  */
object DispatchMediaKernel extends MediaKernel {
  private def magic(b: Array[Byte], s: String, off: Int): Boolean =
    b.length >= off + s.length &&
      (0 until s.length).forall(j => b(off + j) == s.charAt(j).toByte)
  private def route(a: Asset): MediaKernel = {
    val b = a.content
    if (b.length >= 4 && b(0) == 0x89.toByte && magic(b, "PNG", 1))
      PngMediaKernel
    // JPEG before MP3: an MP3 frame header also starts 0xFF-high,
    // but 0xFF 0xD8 0xFF (SOI + marker) is never a valid MPEG sync
    // + header pair, so the order only matters for disambiguation
    else if (b.length >= 3 && (b(0) & 0xff) == 0xff &&
        (b(1) & 0xff) == 0xd8 && (b(2) & 0xff) == 0xff)
      JpegMediaKernel
    else if (magic(b, "P6", 0)) PpmMediaKernel
    else if (magic(b, "RIFF", 0) && magic(b, "WAVE", 8)) WavMediaKernel
    else if (magic(b, "fLaC", 0)) FlacMediaKernel
    // MP3: a leading ID3v2 tag, or a raw stream opening on a valid
    // MPEG-1 Layer III frame header; parseMp3 decides full validity
    // and malformed payloads still land on the stub
    else if (magic(b, "ID3", 0) || Mp3MediaKernel.looksLikeFrame(b, 0))
      Mp3MediaKernel
    // ISO BMFF (MP4/MOV): the ftyp box type at offset 4
    else if (magic(b, "ftyp", 4)) Mp4MediaKernel
    // Matroska/WebM: the EBML header element id at offset 0
    else if (b.length >= 4 && (b(0) & 0xff) == 0x1a &&
        (b(1) & 0xff) == 0x45 && (b(2) & 0xff) == 0xdf &&
        (b(3) & 0xff) == 0xa3)
      MkvMediaKernel
    else if (magic(b, "YUV4MPEG2", 0)) Y4mMediaKernel
    else if (magic(b, "GIF8", 0)) GifMediaKernel
    // BMP's 2-byte magic is weak — route LAST among the containers
    // so a payload another magic claims never lands here; a
    // non-BMP 'BM…' payload fails the header parse onto the stub
    else if (magic(b, "BM", 0)) BmpMediaKernel
    else StubMediaKernel
  }
  /** Route a batch while PRESERVING the per-kernel batch shape: the
    * SPI's batch-level signature exists so implementations amortize
    * per-call overhead (native contexts, codec setup) across a
    * batch, and per-asset dispatch would quietly reduce every batch
    * to size 1. Each kernel sees one sub-batch in input order; the
    * results reassemble positionally.
    */
  private def byKernel[T](batch: Seq[Asset])(
      run: (MediaKernel, Seq[Asset]) => Seq[T]): Seq[T] = {
    val routed = batch.map(a => (route(a), a)).zipWithIndex
    val out = new Array[Any](batch.length)
    for ((k, group) <- routed.groupBy(_._1._1)) {
      val results = run(k, group.map(_._1._2))
      for (((_, idx), r) <- group.zip(results)) out(idx) = r
    }
    out.toSeq.map(_.asInstanceOf[T])
  }
  def decodeBatch(batch: Seq[Asset]): Seq[AssetFeatures] =
    byKernel(batch)((k, b) => k.decodeBatch(b))
  def resizeBatch(batch: Seq[Asset], w: Int, h: Int): Seq[ResizedAsset] =
    byKernel(batch)((k, b) => k.resizeBatch(b, w, h))
  def frames(a: Asset, every: Int): Iterator[FrameSample] =
    route(a).frames(a, every)
  override def rgbFrame(a: Asset): Option[(Int, Int, Array[Byte])] =
    route(a).rgbFrame(a)
  override def rgbFrames(a: Asset,
      every: Int): Iterator[(Int, Int, Int, Array[Byte])] =
    route(a).rgbFrames(a, every)
  override def audioEnvelope(a: Asset, bins: Int): Option[Array[Long]] =
    route(a).audioEnvelope(a, bins)
}
