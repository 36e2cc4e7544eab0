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

  test("pipeline_rag: chunks are exactly doc_chunk_overlap's >= 16-token " +
    "windows, the serve is a correctly ranked top-20, and the " +
    "md5-embedding recompute matches every served score") {
    val served = SparkEntry.queries("pipeline_rag")(spark, sf0001)
      .select($"rnk", $"doc_id", $"chunk_idx", $"sim")
      .as[(Long, Long, Int, Double)].collect().sortBy(_._1)
    assert(served.length == 20 && served.map(_._1).toSeq == (1L to 20L))
    // ranks strictly follow (sim desc, doc_id, chunk_idx)
    served.sliding(2).foreach { case Array(a, b) =>
      assert(a._4 > b._4 || (a._4 == b._4 &&
        (a._2 < b._2 || (a._2 == b._2 && a._3 < b._3))))
    }
    // recompute each served chunk's fake embedding + cosine from the
    // raw text with plain Scala — the full chunk→embed→score chain
    val text = spark.read.parquet(s"$sf0001/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def comp(key: String) =
      (java.lang.Long.parseLong(md5hex(key).substring(0, 15), 16)
        % 1000003L).toDouble / 1000003.0 - 0.5
    val qv = (0 until 8).map(j => comp(s"graftprobe:$j"))
    val qn = math.sqrt(qv.map(x => x * x).reduce(_ + _))
    served.foreach { case (_, docId, chunkIdx, sim) =>
      val ws = text(docId).split(" ", -1)
      val st = chunkIdx * 48
      val slice = ws.slice(st, st + 64)
      assert(slice.length >= 16, "served chunk must pass the tail filter")
      val fp = md5hex(slice.mkString(" "))
      val ev = (0 until 8).map(j => comp(s"$fp:$j"))
      val dot = (0 until 8).map(j => ev(j) * qv(j)).reduce(_ + _)
      val nv = math.sqrt(ev.map(x => x * x).reduce(_ + _))
      val expect = BigDecimal(dot / (nv * qn))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(expect - sim) < 1e-9,
        s"doc $docId chunk $chunkIdx: $expect vs $sim")
    }
  }

  test("audit frame: the single-pass in_k1/in_k2 flags agree row-for-row " +
    "with the filtered/deduped stage memberships, and the cont set is " +
    "exactly the decontamination drop (the rejects gate's inputs)") {
    import org.apache.spark.sql.functions.col
    val st = operators.CorpusPipeline.stages(spark, sf0001).toMap
    val audit = st("audit")
      .select($"doc_id", $"in_k1", $"in_k2")
      .as[(Long, Boolean, Boolean)].collect()
    val nrmIds = st("normalized").select($"doc_id").as[Long].collect().toSet
    val k1Ids = st("filtered").select($"doc_id").as[Long].collect().toSet
    val k2Ids = st("deduped").select($"doc_id").as[Long].collect().toSet
    // one audit row per normalized doc, flags == stage membership
    assert(audit.map(_._1).toSet == nrmIds)
    assert(audit.length == nrmIds.size, "audit must be one row per nrm doc")
    audit.foreach { case (id, k1, k2) =>
      assert(k1 == k1Ids.contains(id), s"in_k1 flag wrong for $id")
      assert(k2 == k2Ids.contains(id), s"in_k2 flag wrong for $id")
    }
    // cont = k2's non-holdout members that did NOT survive
    // decontamination (k3 = corpus anti-join cont)
    val contIds = st("cont").select($"doc_id").as[Long].collect().toSet
    val corpusIds = st("deduped").filter(col("source") =!= "src0")
      .select($"doc_id").as[Long].collect().toSet
    val k3Ids = st("decontaminated").select($"doc_id").as[Long]
      .collect().toSet
    assert(contIds.subsetOf(corpusIds))
    assert(corpusIds -- contIds == k3Ids,
      "cont must be exactly the decontamination drop set")
  }
}
