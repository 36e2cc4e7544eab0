package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}

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
}
