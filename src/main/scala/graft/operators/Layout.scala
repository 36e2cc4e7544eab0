package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** Physical-layout helpers for repeated-join workloads: bucketed tables
  * co-locate both sides of an equi-join by pre-hashing rows into a fixed
  * bucket count at write time, so later joins/aggregations on the bucket
  * key need NO exchange — the shuffle is paid once at ingest instead of
  * per query. This is the managed-table analogue of the pipeline's
  * date-partitioned layout (pruning) and the standard answer to "the
  * same 100 TB join runs every hour".
  */
object Layout {

  /** Write `df` as a managed parquet table bucketed (and sorted) by
    * `keys` into `buckets` buckets.
    */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
      keys: Seq[String]): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)

  /** Compact the small files of ONE partition of a date-partitioned
    * parquet table (the ingest pipeline's append-forever layout): hourly
    * appends land ~1 file per run, so a year-old partition holds
    * thousands of KB-scale files whose open/footer cost dominates scans
    * long before data volume does. Rewrites the partition's rows into
    * `numFiles` files, then swaps directories so a concurrent reader of
    * OTHER partitions is never disturbed and partition pruning is
    * preserved. At production scale the same swap runs per-partition
    * from any orchestrator — each date directory is an independent unit.
    *
    * Write-audit-publish shape: the staging write COMPLETES before the
    * source directory moves, so no in-memory pin of the partition is
    * needed — the read streams executor-side, never materializing the
    * partition anywhere. `repartition(numFiles)` (not `coalesce`, which
    * would collapse the READ to `numFiles` tasks too) keeps the rewrite
    * parallel for large partitions; the shuffle is the price of N
    * parallel writers and is what a 100-TB partition needs.
    *
    * Atomicity caveat: the two `Files.move`s are atomic on a local /
    * HDFS-like filesystem, which is where this runs. Object stores
    * (S3/GCS) have no atomic directory rename — there, publish via a
    * metadata layer (Iceberg/Delta snapshot commit) or leave staging
    * dirs in place and flip a `_committed` manifest the readers resolve;
    * the staging-then-publish split below is exactly the shape those
    * protocols need, only the publish step differs.
    */
  def compactDatePartition(spark: SparkSession, tablePath: String,
      date: String, numFiles: Int = 1): Unit = {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val partDir = Paths.get(tablePath, s"date=$date")
    require(Files.isDirectory(partDir), s"no partition directory: $partDir")
    val tmpDir = Paths.get(tablePath, s".date=$date.compacting")
    // 1. Write (streaming read → shuffle → N writers); completes fully
    //    before any source file is touched.
    spark.read.parquet(partDir.toString)
      .repartition(numFiles)
      .write.mode(SaveMode.Overwrite).parquet(tmpDir.toString)
    // 2. Publish: two renames, no window where the partition is absent
    //    longer than a rename pair; old files removed only after the new
    //    directory is live.
    val trash = Paths.get(tablePath, s".date=$date.old")
    Files.move(partDir, trash)
    Files.move(tmpDir, partDir)
    Files.walk(trash).iterator().asScala.toSeq.reverse
      .foreach(Files.delete)
  }
}
