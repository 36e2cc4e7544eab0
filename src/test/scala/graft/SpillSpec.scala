package graft

/** Spill safety for the custom object-buffer aggregates (`TopKAgg`,
  * `TopKStrAgg`, `SimHashAgg`): ObjectHashAggregate keeps at most
  * `spark.sql.objectHashAggregate.sortBased.fallbackThreshold` distinct
  * keys in its hash map, then FALLS BACK to sort-based aggregation —
  * the path a 100-TB run takes whenever group cardinality outgrows
  * executor memory. The fallback exercises buffer serialization and
  * sort-merge of partially-aggregated buffers, code the happy path
  * never touches; these tests force threshold=1 (every group after the
  * first spills) and assert bit-identical results, so the engine's
  * scale story does not rest on never spilling.
  */
class SpillSpec extends SparkSpec {

  private val Key = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
  // One query per custom aggregate: top_k (sim_topk), top_k_str
  // (vocab_coverage), simhash_agg (dedup_simhash).
  private val Queries = Seq("sim_topk", "vocab_coverage", "dedup_simhash")

  private def run(name: String): Seq[String] =
    SparkEntry.queries(name)(spark, sf0001)
      .collect().map(_.toString).sorted.toSeq

  test("top_k / top_k_str / simhash_agg: sort-based fallback " +
    "(threshold=1) produces results identical to the hash path") {
    val orig = spark.conf.get(Key, "128")
    val base = Queries.map(n => n -> run(n)).toMap
    try {
      spark.conf.set(Key, "1")
      Queries.foreach { n =>
        val fb = run(n)
        assert(fb.nonEmpty, s"$n: empty result under fallback")
        assert(fb == base(n), s"$n: sort-based fallback diverged")
      }
    } finally spark.conf.set(Key, orig)
  }
}
