package graft.media

import graft.media.Media._


/** The default STUB kernel (no media libraries in this environment):
  * deterministic pure functions of the bytes so tests, reruns and the
  * DuckDB oracle all agree. Feature i is an exact rational in [0, 1)
  * derived from the content hash — engine-portable (no libm calls
  * whose last ulp differs across platforms).
  */
object StubMediaKernel extends MediaKernel {
  def decodeBatch(batch: Seq[Asset]): Seq[AssetFeatures] = batch.map { a =>
    val h = byteHash(a.content)
    val feats = Array.tabulate(FeatureDim) { i =>
      (((h * 2654435761L + i * 40503L) % 1000003L).toDouble / 1000003.0).toFloat
    }
    AssetFeatures(a.asset_id, width = 1 + (h % 1024).toInt,
      height = 1 + ((h / 1024) % 1024).toInt, features = feats)
  }

  def resizeBatch(batch: Seq[Asset], w: Int, h: Int): Seq[ResizedAsset] =
    batch.map { a =>
      // Zero-byte payloads get a zero-filled thumb: `i % max(len, 1)` is
      // 0 for empty content, and content(0) would throw.
      val thumb =
        if (a.content.isEmpty) new Array[Byte](w * h)
        else Array.tabulate(w * h)(i => a.content(i % a.content.length))
      ResizedAsset(a.asset_id, w, h, thumb)
    }

  /** Treats the payload as fixed-size frames and keeps every
    * `every`-th — the 1→N row explosion shape (one asset, many
    * frames) a real sampler has.
    */
  def frames(a: Asset, every: Int): Iterator[FrameSample] =
    a.content.grouped(FrameBytes).zipWithIndex
      .filter { case (_, i) => i % every == 0 }
      .map { case (frame, i) =>
        FrameSample(a.asset_id, i, frame.length.toLong, byteHash(frame))
      }
}
