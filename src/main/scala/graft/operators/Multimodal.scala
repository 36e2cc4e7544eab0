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
    // pinned by MultimodalSpec.
    QuerySpec.noOracle("multimodal_features") { (s, d) =>
      val feats: DataFrame = extractFeatures(assets(s, d)).toDF()
      feats.select(
        col("asset_id"), col("width"), col("height"),
        round(aggregate(transform(col("features"), x => x.cast("double")),
          lit(0.0), (acc, v) => acc + v), 4).as("feature_sum"))
    }
  )
}
