package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator in SURVEY.md §2 (and the LLM-data extension surface) is
  * registered here as a named query over the driver's synthetic tables,
  * with equivalent DuckDB-runnable ANSI SQL where the op is SQL-expressible.
  */
object SparkEntry {

  /** All registered operator queries, in registration order. */
  def specs: Seq[QuerySpec] =
    operators.Relational.specs ++
      operators.Extended.specs ++
      operators.Curation.specs ++
      operators.CorpusPipeline.specs ++
      operators.Dedup.specs ++
      operators.Similarity.specs ++
      operators.TextAnalysis.specs ++
      operators.Bpe.specs ++
      operators.Unigram.specs ++
      operators.WordPiece.specs ++
      operators.Retrieval.specs ++
      operators.Multimodal.specs ++
      operators.Profiling.specs ++
      operators.Layout.specs ++
      operators.TimeTravel.specs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's latest-snapshot pattern (F1+J2+A1): scalar-subquery
    * MAX broadcast back as an equality filter (SURVEY.md §3 entry point 2).
    */
  def entry(spark: SparkSession): DataFrame = {
    val byName = specs.map(sp => sp.name -> sp).toMap
    byName("q_snapshot_latest").fn(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    specs.map(sp => sp.name -> sp.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    specs.collect { case QuerySpec(n, _, Some(sql)) => n -> sql }.toMap
}
