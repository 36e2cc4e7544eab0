package graft

class CorpusPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("pipeline_corpus + rejects partition the corpus and the packing " +
    "arithmetic holds per stratum") {
    val kept = SparkEntry.queries("pipeline_corpus")(spark, sf0001)
      .select($"doc_id", $"lang", $"n_tok", $"bin_id")
      .as[(Long, String, Long, Long)].collect()
    val rejects = SparkEntry.queries("pipeline_corpus_rejects")(spark, sf0001)
      .select($"doc_id", $"reason").as[(Long, String)].collect()
    val all = spark.read.parquet(s"$sf0001/documents.parquet")
      .select($"doc_id").as[Long].collect().toSet
    val keptIds = kept.map(_._1).toSet
    val rejIds = rejects.map(_._1).toSet
    // every document is accounted for exactly once
    assert(keptIds.intersect(rejIds).isEmpty)
    assert(keptIds.union(rejIds) == all,
      "survivors + rejects must partition the corpus")
    // attribution labels come from the pipeline's stage vocabulary
    val reasons = Set("extract_empty", "filter", "duplicate", "holdout",
      "contaminated", "sampled_out")
    assert(rejects.forall(r => reasons.contains(r._2)))
    // benchmark docs never reach the corpus, whatever else they did
    val src0 = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter($"source" === "src0").select($"doc_id").as[Long].collect().toSet
    assert(src0.intersect(keptIds).isEmpty, "holdout must be excluded")
    // packing: recompute each stratum's exclusive prefix sum in doc_id
    // order — every doc's bin must be prior div 2048
    kept.groupBy(_._2).foreach { case (_, docs) =>
      var prior = 0L
      docs.sortBy(_._1).foreach { case (_, _, nTok, binId) =>
        assert(binId == prior / 2048L,
          s"bin must be the exclusive prefix sum div budget ($binId vs ${prior / 2048L})")
        prior += nTok
      }
    }
  }
}
