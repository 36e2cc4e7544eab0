package graft.media

/** The media-kernel package: one file per container/codec kernel, the
  * decode SPI they implement, and the typed rows they exchange. Pure
  * move out of `graft.operators.Multimodal` (which keeps the
  * distributed plumbing, the perceptual-hash machinery and the single
  * `specs` registration point) — kernel diffs stay reviewable per
  * container.
  */

/** Shared constants and the content hash of the media kernels — the
  * values every kernel file and the Multimodal operators import
  * (`import graft.media.Media._`).
  */
object Media {
  val FeatureDim = 8
  val DecodeBatchSize = 64
  val FrameBytes = 64 // small enough that test payloads span many frames

  /** Content hash for the stub decoders: 31-polynomial over the bytes mod
    * 1e9+7. Plain modular arithmetic (NOT `Arrays.hashCode`, whose 32-bit
    * wrap has no clean SQL form) so the DuckDB oracle can recompute it
    * with a `list_reduce` fold and the stub pipelines get value-level
    * checks instead of rows-only.
    */
  def byteHash(bytes: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = (h * 31 + (bytes(i) & 0xff)) % 1000000007L; i += 1 }
    h
  }
}


/** One media asset: opaque bytes + typed metadata columns. */
final case class Asset(asset_id: Long, mime: String, n_bytes: Long,
    content: Array[Byte])

/** Decoded features for one asset (fixed-width vector). */
final case class AssetFeatures(asset_id: Long, width: Int, height: Int,
    features: Array[Float])


/** Thumbnail of one asset (stub resize: real plumbing, fake pixels). */
final case class ResizedAsset(asset_id: Long, width: Int, height: Int,
    thumb: Array[Byte])

/** One sampled frame of a (fake) video asset. */
final case class FrameSample(asset_id: Long, frame_idx: Int,
    n_bytes: Long, frame_hash: Long)


/** The decode SPI: everything media-library-shaped sits behind this
  * seam, so a production build drops in a real decoder (JNI ffmpeg,
  * ImageIO, …) WITHOUT touching the distributed plumbing or any query
  * code — the operators capture the active kernel at plan time and
  * ship it with the task closure (hence `Serializable`). Batch-level
  * signatures, not per-asset, so an implementation can amortize
  * native-call overhead across a batch exactly like Arrow record
  * batches under `mapInPandas`.
  */
trait MediaKernel extends Serializable {
  def decodeBatch(batch: Seq[Asset]): Seq[AssetFeatures]
  def resizeBatch(batch: Seq[Asset], w: Int, h: Int): Seq[ResizedAsset]
  def frames(asset: Asset, every: Int): Iterator[FrameSample]

  /** The decoded RGB frame of a still image — (width, height,
    * 3·w·h bytes) — or None when the payload carries no decodable
    * pixel frame. This is the pixel-level access the perceptual-hash
    * operator builds on; audio/video/stub kernels keep the default
    * None (an asset with no decodable frame gets NO perceptual hash,
    * never a fake one — unlike the statistics paths, where the stub
    * fallback is the documented contract).
    */
  def rgbFrame(a: Asset): Option[(Int, Int, Array[Byte])] = None

  /** Decoded RGB pixel FRAMES — (frame_idx, width, height, rgb) for
    * every `every`-th frame. A still image is its own one-frame
    * video (idx 0); video kernels override with real frame
    * iteration. The pixel surface behind per-frame perceptual
    * hashing.
    */
  def rgbFrames(a: Asset,
      every: Int): Iterator[(Int, Int, Int, Array[Byte])] =
    rgbFrame(a).iterator.map { case (w, h, rgb) => (0, w, h, rgb) }

  /** The decoded waveform's |amplitude| ENVELOPE in `bins` equal
    * time bins (integer sample units summed per bin), or None when
    * the payload carries no sample-decodable audio of ≥ `bins`
    * frames. The audio analog of [[rgbFrame]]: the surface the
    * audio fingerprint reads. Kernels that meter audio WITHOUT
    * entropy-decoding samples (MP3, FLAC) honestly return None.
    */
  def audioEnvelope(a: Asset, bins: Int): Option[Array[Long]] = None
}
