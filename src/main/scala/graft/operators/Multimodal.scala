package graft.operators

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads are opaque
  * `binary` columns with typed metadata travelling alongside. The decode /
  * feature-extract step is STUBBED (no media libraries in this
  * environment) with a deterministic byte-driven fake — the Spark-side
  * contract (schema, batching, partition-parallel execution, feature
  * vector shape) is real and tested in MultimodalSpec.
  *
  * At 100 TB the binary column dominates I/O: metadata queries must never
  * read it (column pruning does this for free in parquet as long as meta
  * lives in sibling columns, not inside the blob), and decode runs
  * batch-at-a-time per partition to amortize per-call overhead — the same
  * shape `mapInPandas`/Arrow batches give PySpark.
  */
object Multimodal {

  /** One media asset: opaque bytes + typed metadata columns. */
  final case class Asset(asset_id: Long, mime: String, n_bytes: Long,
      content: Array[Byte])

  /** Decoded features for one asset (fixed-width vector). */
  final case class AssetFeatures(asset_id: Long, width: Int, height: Int,
      features: Array[Float])

  val FeatureDim = 8
  val DecodeBatchSize = 64

  /** STUB decoder standing in for a real image/audio decode. Deterministic
    * pure function of the bytes so tests and reruns agree; a production
    * build swaps only this function (same batch signature).
    */
  def decodeBatch(batch: Seq[Asset]): Seq[AssetFeatures] = batch.map { a =>
    val h = java.util.Arrays.hashCode(a.content)
    val feats = Array.tabulate(FeatureDim) { i =>
      // pseudo-feature: mixes content hash and position; bounded [-1, 1]
      math.sin((h.toLong * 2654435761L + i * 40503L).toDouble / Int.MaxValue).toFloat
    }
    AssetFeatures(a.asset_id, width = 1 + (math.abs(h) % 1024),
      height = 1 + (math.abs(h / 1024) % 1024), features = feats)
  }

  /** Thumbnail of one asset (stub resize: real plumbing, fake pixels). */
  final case class ResizedAsset(asset_id: Long, width: Int, height: Int,
      thumb: Array[Byte])

  /** One sampled frame of a (fake) video asset. */
  final case class FrameSample(asset_id: Long, frame_idx: Int,
      n_bytes: Long, frame_hash: Long)

  /** STUB resize standing in for an image scaler: deterministic bytes
    * derived from the payload, correct output shape (w×h×1 byte).
    */
  def resizeBatch(batch: Seq[Asset], w: Int, h: Int): Seq[ResizedAsset] =
    batch.map { a =>
      // Zero-byte payloads get a zero-filled thumb: `i % max(len, 1)` is 0
      // for empty content, and content(0) would throw.
      val thumb =
        if (a.content.isEmpty) new Array[Byte](w * h)
        else Array.tabulate(w * h)(i => a.content(i % a.content.length))
      ResizedAsset(a.asset_id, w, h, thumb)
    }

  val FrameBytes = 64 // small enough that test payloads span many frames

  /** STUB frame sampler standing in for video decode: treats the payload
    * as fixed-size frames and keeps every `every`-th — the 1→N row
    * explosion shape (one asset, many frames) that a real sampler has.
    */
  def sampleFrames(assets: Dataset[Asset], every: Int): Dataset[FrameSample] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.flatMap { a =>
      a.content.grouped(FrameBytes).zipWithIndex
        .filter { case (_, i) => i % every == 0 }
        .map { case (frame, i) =>
          FrameSample(a.asset_id, i, frame.length.toLong,
            java.util.Arrays.hashCode(frame).toLong)
        }
    })
  }

  /** Partition-parallel batched resize (same batching contract as
    * `extractFeatures`).
    */
  def resizeAssets(assets: Dataset[Asset], w: Int, h: Int): Dataset[ResizedAsset] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.grouped(DecodeBatchSize)
      .flatMap(b => resizeBatch(b.toSeq, w, h)))
  }

  /** Synthesize an asset table from `documents` (text bytes as the opaque
    * payload — the deterministic stand-in for real media blobs).
    */
  def assets(spark: SparkSession, sfDir: String): Dataset[Asset] = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select(
        col("doc_id").as("asset_id"),
        when(col("doc_id") % 3 === 0, "image/png")
          .when(col("doc_id") % 3 === 1, "audio/wav")
          .otherwise("video/mp4").as("mime"),
        length(col("text").cast("binary")).cast("long").as("n_bytes"),
        col("text").cast("binary").as("content"))
      .as[Asset]
  }

  /** Partition-parallel, batched decode: the distributed plumbing around
    * the stub. Batches of `DecodeBatchSize` amortize per-call cost exactly
    * like Arrow record batches under `mapInPandas`.
    */
  def extractFeatures(assets: Dataset[Asset]): Dataset[AssetFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.grouped(DecodeBatchSize).flatMap(b => decodeBatch(b.toSeq))
    }
  }

  val specs: Seq[QuerySpec] = Seq(

    // Metadata-only scan: must prune the blob column (verified by plan
    // inspection in MultimodalSpec). Oracle reproduces the byte length and
    // content hash from the text payload.
    QuerySpec(
      "multimodal_meta",
      """SELECT doc_id AS asset_id,
        | CASE WHEN doc_id % 3 = 0 THEN 'image/png'
        |      WHEN doc_id % 3 = 1 THEN 'audio/wav'
        |      ELSE 'video/mp4' END AS mime,
        | CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        | md5(text) AS content_hash
        |FROM documents""".stripMargin) { (s, d) =>
      Tables.documents(s, d).select(
        col("doc_id").as("asset_id"),
        when(col("doc_id") % 3 === 0, "image/png")
          .when(col("doc_id") % 3 === 1, "audio/wav")
          .otherwise("video/mp4").as("mime"),
        length(col("text").cast("binary")).cast("long").as("n_bytes"),
        md5(col("text")).as("content_hash"))
    },

    // Full decode pipeline: binary → batched stub decode → feature stats.
    // Not SQL-expressible (stub decoder) ⇒ rows-only check; semantics
    // pinned by OperatorsSpec.
    QuerySpec.noOracle("multimodal_features") { (s, d) =>
      val feats: DataFrame = extractFeatures(assets(s, d)).toDF()
      feats.select(
        col("asset_id"), col("width"), col("height"),
        round(aggregate(transform(col("features"), x => x.cast("double")),
          lit(0.0), (acc, v) => acc + v), 4).as("feature_sum"))
    },

    // Batched stub resize: per-asset thumbnail metadata (rows-only).
    QuerySpec.noOracle("multimodal_resize") { (s, d) =>
      resizeAssets(assets(s, d), 16, 16).toDF()
        .select(col("asset_id"), col("width"), col("height"),
          length(col("thumb")).cast("long").as("thumb_bytes"),
          md5(col("thumb")).as("thumb_hash"))
    },

    // Frame sampling: 1→N explosion, every 2nd fixed-size frame
    // (rows-only).
    QuerySpec.noOracle("multimodal_frames") { (s, d) =>
      sampleFrames(assets(s, d), every = 2).toDF()
    }
  )
}
