package graft.streaming

import graft.operators.{Dedup, TextAnalysis}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** In-flight curation of a DOCUMENT STREAM — the batch `doc_curate`
  * stages that are per-row predicates applied at ingest time, before
  * anything lands in the corpus: quality floor + n-gram decontamination
  * against a held-out benchmark.
  *
  * The benchmark ships as its distinct 4-gram xxhash64 set, broadcast
  * as a literal (eval suites are small — thousands of docs, not
  * corpora; a larger drop-list would ship a bloom filter the same way).
  * Both stages are STATELESS per-row expressions: no watermark, no
  * state store, valid in every output mode, and the stream plan is the
  * identical expression tree the batch pipeline runs — curation
  * semantics cannot drift between the hourly batch path and the
  * streaming path.
  *
  * The stateful stages of corpus curation (cross-document dedup,
  * mixture accounting) stay in the batch/compaction tier by design:
  * near-dup candidate generation needs corpus-wide blocking joins, and
  * `StatefulOps.dedupWithinWatermark` already covers the
  * bounded-horizon streaming variant.
  */
object StreamingCuration {

  /** Distinct 4-gram hashes of a static benchmark frame (the value to
    * broadcast into [[curate]]).
    */
  def benchmarkGramHashes(bench: DataFrame): Array[Long] =
    bench
      .select(explode(array_distinct(Dedup.kgrams(col("text"), 4))).as("g"))
      .select(xxhash64(col("g")).as("gh")).distinct()
      .orderBy("gh")
      .collect().map(_.getLong(0))

  /** Gram-hash column of a text column (shared by tests/diagnostics). */
  def gramHashes(text: Column): Column =
    transform(array_distinct(Dedup.kgrams(text, 4)), g => xxhash64(g))

  /** Filter a (possibly streaming) document frame to rows with
    * `quality >= minQuality` that share NO 4-gram with the benchmark.
    *
    * Membership runs as `exists(grams, g -> g IN <set>)`: above the
    * InSet conversion threshold the IN compiles to a PRE-BUILT hash set
    * (one O(1) probe per gram), where `arrays_overlap` against a
    * literal array would rebuild its probe set per ROW — O(|benchmark|)
    * per document.
    */
  def curate(docs: DataFrame, benchHashes: Array[Long],
      minQuality: Double = 0.75): DataFrame =
    docs
      .filter(TextAnalysis.qualityScore(col("text")) >= minQuality)
      .filter(!exists(gramHashes(col("text")),
        g => g.isInCollection(benchHashes.toSeq)))

  /** Distributed Bloom build over a benchmark frame's distinct 4-grams —
    * the drop-list representation past exact-set scale (see
    * [[graft.functions.BloomMightContain]]). Built with a treeAggregate
    * across executors, never collected as raw hashes.
    */
  def benchmarkBloom(bench: DataFrame, expectedGrams: Long,
      fpp: Double = 0.01): org.apache.spark.util.sketch.BloomFilter =
    bench
      .select(explode(array_distinct(Dedup.kgrams(col("text"), 4))).as("g"))
      .select(xxhash64(col("g")).as("gh")).distinct()
      .stat.bloomFilter("gh", expectedGrams, fpp)

  /** [[curate]] with the Bloom drop-list: identical shape, one-sided
    * error — never keeps a contaminated doc; over-drops clean docs at
    * ~fpp per gram.
    */
  def curateBloom(docs: DataFrame,
      bloom: org.apache.spark.util.sketch.BloomFilter,
      minQuality: Double = 0.75): DataFrame =
    docs
      .filter(TextAnalysis.qualityScore(col("text")) >= minQuality)
      .filter(!exists(gramHashes(col("text")),
        g => graft.functions.BloomMightContain.might_contain(g, bloom)))
}
