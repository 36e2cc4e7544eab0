package graft.operators

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ranked text retrieval over the `documents` corpus: Okapi BM25
  * scoring of a fixed query-term set, served two ways with ONE result
  * contract (both gate against the same oracle SQL):
  *
  *   - `text_bm25`          — straight from the corpus: one tokenize
  *                            scan builds the query-term postings, a
  *                            second column-pruned scan the corpus
  *                            stats.
  *   - `text_bm25_indexed`  — from a PERSISTED inverted index whose
  *                            posting lists are physically partitioned
  *                            by a hash bucket of the term, so a query
  *                            reads only its terms' buckets (static
  *                            partition pruning) — the corpus pays
  *                            tokenization once at build time, queries
  *                            pay |terms|/Buckets of the postings
  *                            bytes and never touch the raw text.
  *
  * This is to keyword search what `Similarity.ensureIvfIndex` is to
  * embedding search; the training-data use is benchmark-overlap scoring
  * and corpus triage ("which documents answer this probe query") at a
  * cost that does not re-scan 100 TB of text per query.
  */
object Retrieval {

  /** The gate's fixed probe query: one rare term (df ≈ 5% of docs, so
    * idf dominates and near-dup boilerplate surfaces) plus two common
    * ones — the mixed-selectivity shape real probe queries have.
    */
  val QueryTerms: Seq[String] = Seq("dup", "query", "scan")

  // Okapi BM25 constants (the standard Robertson defaults k1=1.2,
  // b=0.75) appear as inline literals in BOTH the Spark expression and
  // the oracle SQL — see the literal-parity note in scorePostings.
  private val TopK = 10

  /** Posting-list hash buckets — the index's partition fan-out. The
    * knob trades listing granularity against small-dir overhead: a
    * query term maps to exactly ONE bucket (all its postings colocate),
    * so a q-term query lists ≤ q of the `Buckets` directories whatever
    * the vocabulary size.
    */
  val Buckets = 32

  private def words(c: Column): Column = split(c, " ")

  /** BM25 over a postings frame `(word, doc_id, tf, dl)` that holds
    * EVERY posting of each query term (both serving paths guarantee
    * this), joined with the one-row corpus stats `(n, avgdl)`.
    *
    * df per term falls out of the postings themselves (count of rows
    * per word — one row per (term, doc)), so no separate df relation is
    * stored or joined. The df frame is bounded by the LITERAL query
    * term count, and `stats` is a true one-row scalar — the only
    * broadcast. Top-k is orderBy+limit (TakeOrdered: per-partition
    * top-k merged on the driver, no global sort), ordered by the
    * ROUNDED score with doc_id tie-break so the cut is deterministic
    * across engines.
    */
  private def scorePostings(postings: DataFrame,
      stats: DataFrame): DataFrame = {
    val df_ = postings.groupBy(col("word"))
      .agg(count(lit(1)).cast("double").as("df"))
    val idf = log(lit(1.0) +
      (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    // Literals spelled identically to the oracle SQL (2.2, 1.2, 0.25,
    // 0.75) — deriving them (K1 + 1, 1 - B) could round to a different
    // double than the literal the oracle parses.
    val tfNorm = col("tf") * lit(2.2) /
      (col("tf") + lit(1.2) *
        (lit(0.25) + lit(0.75) * col("dl") / col("avgdl")))
    postings.join(df_, Seq("word"))
      .crossJoin(broadcast(stats))
      .groupBy(col("doc_id"))
      .agg(round(sum(idf * tfNorm), 4).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(TopK)
  }

  /** Corpus-direct BM25: the postings of the query terms survive an
    * isin filter applied DIRECTLY on the exploded token stream, so
    * everything past the tokenize scan is |terms|-bounded per doc. The
    * corpus stats (N, avgdl) ride a second scan — that scan prunes to
    * the text column only and aggregates to one row map-side; the
    * indexed path below amortizes even that away.
    */
  def bm25(s: SparkSession, d: String,
      terms: Seq[String] = QueryTerms): DataFrame = {
    val docs = Par.fanOut(Tables.documents(s, d))
      .select(col("doc_id"), words(col("text")).as("ws"))
    val stats = docs
      .select(size(col("ws")).as("dl"))
      .agg(count(lit(1)).cast("double").as("n"), avg(col("dl")).as("avgdl"))
    val postings = docs
      .select(col("doc_id"), size(col("ws")).as("dl"),
        explode(col("ws")).as("word"))
      .filter(col("word").isInCollection(terms))
      .groupBy(col("word"), col("doc_id"), col("dl"))
      .agg(count(lit(1)).as("tf"))
    scorePostings(postings, stats)
  }

  // ---- persisted inverted index ----
  //   <root>/postings/ — (word, doc_id, tf, dl) partitioned by
  //                      `bucket=pmod(xxhash64(word), Buckets)`; dl is
  //                      denormalized onto each posting (8 bytes/row)
  //                      so serving never joins a doc-length table.
  //   <root>/stats/    — ONE row (n, avgdl).
  // The full vocabulary is indexed (the index serves ANY term set, not
  // just the gate's); all postings of a word land in one bucket dir.

  private val PostingsSchema =
    "word STRING, doc_id BIGINT, tf BIGINT, dl INT, bucket BIGINT"

  /** Build a fresh BM25 index at `path` from a `documents`-shaped
    * frame. One tokenize scan feeds both outputs; `repartition(bucket)`
    * clusters each bucket into one file before the partitioned write
    * (without it every task writes a sliver of every bucket).
    */
  def writeBm25Index(docs: DataFrame, path: String): Unit = {
    val toks = Par.fanOut(docs)
      .select(col("doc_id"), words(col("text")).as("ws"))
      .select(col("doc_id"), size(col("ws")).as("dl"),
        explode(col("ws")).as("word"))
    toks
      .groupBy(col("word"), col("doc_id"), col("dl"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("bucket", pmod(xxhash64(col("word")), lit(Buckets)))
      .repartition(col("bucket"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy("bucket")
      .parquet(s"$path/postings")
    docs
      .select(size(words(col("text"))).as("dl"))
      .agg(count(lit(1)).cast("double").as("n"), avg(col("dl")).as("avgdl"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$path/stats")
  }

  /** Build-once cache keyed by the sf dir, same protocol as
    * `Similarity.ensureIvfIndex`: a complete index (both _SUCCESS
    * markers) is reused, anything partial is torn down and rebuilt.
    */
  def ensureBm25Index(s: SparkSession, d: String): String = {
    val suffix = d.replaceAll("\\W", "_")
    val root = new org.apache.hadoop.fs.Path(
      s.conf.get("spark.sql.warehouse.dir"), s"graft_bm25_index$suffix")
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    val complete = Seq("postings", "stats").forall(v =>
      fs.exists(new org.apache.hadoop.fs.Path(root, s"$v/_SUCCESS")))
    if (!complete) {
      fs.delete(root, true)
      writeBm25Index(Tables.documents(s, d), root.toString)
    }
    root.toString
  }

  /** BM25 served from the persisted index. The query terms' buckets are
    * computed driver-side with the SAME xxhash64 the build used (a
    * |terms|-row local relation — bounded by the literal term list, the
    * same class as indexTopK's probe-cell collect), which turns the
    * bucket prune into a STATIC PartitionFilter: the postings scan
    * lists ≤ |terms| of the `Buckets` directories (plan-pinned in
    * RetrievalSpec) and the raw corpus is never touched.
    */
  def bm25TopK(s: SparkSession, indexPath: String,
      terms: Seq[String] = QueryTerms): DataFrame = {
    import s.implicits._
    val buckets = terms.toDF("word")
      .select(pmod(xxhash64(col("word")), lit(Buckets)).as("bucket"))
      .distinct().collect().map(_.getLong(0)).sorted
    val postings = s.read.schema(PostingsSchema)
      .option("basePath", s"$indexPath/postings")
      .parquet(s"$indexPath/postings")
      .filter(col("bucket").isin(buckets: _*))
      .filter(col("word").isInCollection(terms))
      .select(col("word"), col("doc_id"), col("tf"), col("dl"))
    scorePostings(postings, s.read.parquet(s"$indexPath/stats"))
  }

  /** Shared oracle: both serving paths are result-identical by
    * contract, so both gate against this SQL. Arithmetic mirrors the
    * Spark expression shape term-for-term (same literal constants, same
    * association) so the 4-decimal rounding is stable across engines;
    * the ORDER BY cuts on the ROUNDED score with doc_id tie-break.
    */
  private val bm25OracleSql: String = {
    val termList = QueryTerms.map("'" + _ + "'").mkString(", ")
    s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       |st AS (SELECT CAST(count(*) AS DOUBLE) AS n,
       |              avg(len(ws)) AS avgdl FROM d),
       |t AS (SELECT doc_id, len(ws) AS dl, unnest(ws) AS word FROM d),
       |tf AS (SELECT word, doc_id, dl, count(*) AS tf FROM t
       |       WHERE word IN ($termList) GROUP BY word, doc_id, dl),
       |df AS (SELECT word, CAST(count(*) AS DOUBLE) AS df
       |       FROM tf GROUP BY word),
       |sc AS (SELECT tf.doc_id,
       |         sum(ln(1.0 + (st.n - df.df + 0.5) / (df.df + 0.5))
       |             * (tf.tf * CAST(2.2 AS DOUBLE)
       |                / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / st.avgdl))))
       |           AS score
       |       FROM tf JOIN df USING (word), st
       |       GROUP BY tf.doc_id)
       |SELECT doc_id, round(score, 4) AS score FROM sc
       |ORDER BY round(score, 4) DESC, doc_id LIMIT $TopK""".stripMargin
  }

  def specs: Seq[QuerySpec] = Seq(
    QuerySpec("text_bm25", bm25OracleSql) { (s, d) => bm25(s, d) },
    QuerySpec("text_bm25_indexed", bm25OracleSql) { (s, d) =>
      bm25TopK(s, ensureBm25Index(s, d))
    },
  )
}
