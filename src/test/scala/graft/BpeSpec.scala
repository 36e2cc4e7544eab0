package graft

import graft.operators.Bpe
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.functions._

/** BPE learn/apply: hand-derivable micro-corpus election order (merge
  * list, tie-breaks, sentinel exhaustion, one-pass replace semantics),
  * model persistence contract, meter bounds, and the window-free plan
  * of the budget variant.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def docsFrame(texts: String*) = {
    val dir = tmpDir("bpe-docs")
    texts.zipWithIndex
      .map { case (t, i) => (i.toLong, "en", "srcX", t) }
      .toDF("doc_id", "lang", "source", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("learn elects merges in hand-derived order: count desc, pair " +
    "asc tie-break, sentinel once pairs are exhausted") {
    // Corpus "the the the cat": word freqs {the:3, cat:1}.
    //  r1 pairs: (t h)=3 (h e)=3 (c a)=1 (a t)=1 → tie 3/3 → "h e" wins
    //  r2: "t he"=3 beats (c a)/(a t)             → "the" closes
    //  r3: only cat's (c a)=1 (a t)=1 → "a t" wins (asc)
    //  r4: (c at)=1                                → "cat" closes
    //  r5: no pairs anywhere                       → sentinel
    val d = docsFrame("the the the cat")
    val (merges, vocab, base) = Bpe.learn(Tables.documents(spark, d), 5)
    assert(merges == Seq("h e", "t he", "a t", "c at", Bpe.Sentinel))
    val segs = vocab.select($"word", trim($"seq").as("s"))
      .as[(String, String)].collect().toMap
    assert(segs == Map("the" -> "the", "cat" -> "cat"))
    base.unpersist()
  }

  test("one-pass replace semantics: a pair overlapping its own run " +
    "merges leftmost-first, non-overlapping — 'aaaaa' → aa a aa") {
    // " a a a a a ": match at 0 consumes its trailing space, so the
    // 2nd 'a' run can only rematch from the 4th 'a' → "aa a aa".
    val d = docsFrame("aaaaa")
    val (merges, vocab, base) = Bpe.learn(Tables.documents(spark, d), 1)
    assert(merges == Seq("a a"))
    val seg = vocab.select(trim($"seq")).as[String].head()
    assert(seg == "aa a aa")
    base.unpersist()
  }

  test("persisted model: exactly Rounds ranked merges, merged = pair " +
    "sans space, vocab covers every corpus word, and a second ensure " +
    "re-serves without rebuilding") {
    val root = Bpe.ensureBpeModel(spark, sf0001)
    val merges = spark.read.parquet(s"$root/merges")
      .orderBy("rank")
      .as[(Int, String, String)].collect()
    assert(merges.length == Bpe.Rounds)
    assert(merges.map(_._1).toSeq == (1 to Bpe.Rounds))
    assert(merges.forall { case (_, p, m) => m == p.replace(" ", "") })
    assert(merges.map(_._2).distinct.length == Bpe.Rounds,
      "a pair merged away cannot recur")
    val vocabWords = spark.read.parquet(s"$root/vocab")
      .select("word").as[String].collect().toSet
    val corpusWords = Tables.documents(spark, sf0001)
      .select(explode(split($"text", " ")).as("w"))
      .filter($"w" =!= "").select("w").as[String].collect().toSet
    assert(vocabWords == corpusWords)
    val stamp = new java.io.File(s"$root/merges").lastModified()
    assert(Bpe.ensureBpeModel(spark, sf0001) == root)
    assert(new java.io.File(s"$root/merges").lastModified() == stamp,
      "complete model must re-serve, not rebuild")
  }

  test("merge-gain curve: rank 0 is the char baseline, totals are " +
    "non-increasing, and the final total equals the vocab's metered sum") {
    val root = Bpe.ensureBpeModel(spark, sf0001)
    val curve = spark.read.parquet(s"$root/curve")
      .orderBy("rank").as[(Int, Long)].collect()
    assert(curve.map(_._1).toSeq == (0 to Bpe.Rounds))
    val chars = Tables.documents(spark, sf0001)
      .select(sum(length(regexp_replace($"text", " ", ""))))
      .as[Long].head()
    assert(curve.head._2 == chars, "rank 0 = one token per character")
    assert(curve.sliding(2).forall(w => w(0)._2 >= w(1)._2),
      "a merge can only shrink the corpus")
    val vocabTotal = spark.read.parquet(s"$root/vocab")
      .select(sum($"freq" * $"n_bpe")).as[Long].head()
    assert(curve.last._2 == vocabTotal)
  }

  test("meter bounds: for every doc, n_words <= bpe_tokens <= chars " +
    "sans spaces, and 8 merges strictly compress the corpus total") {
    val byName = SparkEntry.queries
    val metered = byName("text_bpe_tokens")(spark, sf0001)
      .join(Tables.documents(spark, sf0001), "doc_id")
      .select($"n_words", $"bpe_tokens",
        length(regexp_replace($"text", " ", "")).cast("long").as("n_chars"))
      .as[(Long, Long, Long)].collect()
    assert(metered.nonEmpty)
    assert(metered.forall { case (w, b, c) => w <= b && b <= c })
    val (totB, totC) = metered.foldLeft((0L, 0L)) {
      case ((b, c), (_, tb, tc)) => (b + tb, c + tc)
    }
    assert(totB < totC, "merges must beat the char-level segmentation")
  }

  test("doc_token_budget_bpe: per-lang BPE-token prefix under budget, " +
    "and the plan carries no window over the corpus order") {
    val res = SparkEntry.queries("doc_token_budget_bpe")(spark, sf0001)
    val rows = res.select($"lang", $"n_tok").as[(String, Long)].collect()
    assert(rows.nonEmpty)
    // Every selected doc entered while its language's budget was open,
    // so no language's selected total can exceed budget + one max doc.
    val perLang = rows.groupBy(_._1).view.mapValues(_.map(_._2))
    perLang.foreach { case (lang, toks) =>
      assert(toks.sum < Bpe.Budget + toks.max,
        s"$lang straddles more than one doc past the budget")
    }
    // sparkPlan, not executedPlan: AQE wraps the executed tree as a
    // leaf, so collect() must walk the pre-adaptive physical plan.
    val windows = res.queryExecution.sparkPlan.collect {
      case w: WindowExec if w.partitionSpec.isEmpty => w
    }
    assert(windows.isEmpty, "no unpartitioned window over the corpus")
  }

  test("text_oov_rate: OOV counts recompute from the raw word sets — " +
    "wave tokens outside the history vocabulary, per language") {
    val res = SparkEntry.queries("text_oov_rate")(spark, sf0001)
      .select($"lang", $"n_tokens", $"n_oov", $"oov_rate")
      .as[(String, Long, Long, Double)].collect()
    assert(res.nonEmpty)
    val docs = Tables.documents(spark, sf0001)
    val histWords = docs.filter($"doc_id" % 5 =!= 4)
      .select(explode(split($"text", " ")).as("w"))
      .filter($"w" =!= "").as[String].collect().toSet
    val wave = docs.filter($"doc_id" % 5 === 4)
      .select($"lang", explode(split($"text", " ")).as("w"))
      .filter($"w" =!= "").as[(String, String)].collect()
    val byLang = wave.groupBy(_._1)
    for ((lang, n, oov, rate) <- res) {
      val ws = byLang(lang).map(_._2)
      assert(n == ws.length, s"$lang token count")
      assert(oov == ws.count(w => !histWords.contains(w)), s"$lang oov")
      assert(rate >= 0.0 && rate <= 1.0)
    }
  }

  test("learn at 64 rounds: the segmentation checkpoint bounds plan " +
    "depth at the cadence — Rounds is genuinely a knob, not a " +
    "lineage-stacking limit") {
    assert(64 > Bpe.CheckpointEvery * 3,
      "the case must cross several checkpoint boundaries to prove the " +
        "reset")
    val (merges, totals, seg, base) =
      Bpe.learnWithCurve(Tables.documents(spark, sf0001), 64)
    try {
      assert(merges.length == 64, "one elected merge per round")
      assert(totals.length == 65, "char baseline + one total per round")
      assert(totals.zip(totals.tail).forall { case (a, b) => b <= a },
        "each merge can only shrink (or hold) the corpus token total")
      // The 8-round prefix is the gate's learn exactly: checkpointing
      // only restarts lineage, it must not move one election.
      val gate = spark.read
        .parquet(Bpe.ensureBpeModel(spark, sf0001) + "/merges")
        .orderBy($"rank").select($"pair").as[String].collect().toSeq
      assert(merges.take(gate.length) == gate,
        "the long learn's prefix must equal the gated 8-round learn")
      // Bounded depth: the final segmentation's analyzed plan stacks at
      // most CheckpointEvery replaces — the rest were absorbed into
      // parquet pins. Without the checkpoint this count is 64.
      val stacked = "replace\\(".r
        .findAllIn(seg.queryExecution.analyzed.toString).size
      assert(stacked <= Bpe.CheckpointEvery,
        s"plan must stack at most ${Bpe.CheckpointEvery} replaces after " +
          s"the last checkpoint, found $stacked")
    } finally base.unpersist()
  }

  test("text_bpe_tokens serve path: vocab joins broadcast — no shuffle " +
    "of the exploded corpus token stream") {
    val plan = SparkEntry.queries("text_bpe_tokens")(spark, sf0001)
      .queryExecution.sparkPlan
    val shuffles = plan.collect { case s: ShuffleExchangeExec => s }
    // One shuffle only: the final doc_id aggregate's exchange (plus
    // AQE coalescing underneath it); the vocab side must ride the
    // broadcast, never a sort-merge exchange on `word`.
    assert(shuffles.size <= 1, s"expected <=1 exchange, got: $shuffles")
  }

  test("ledgered tokenizer versions: the horizon-2 vocab is " +
    "frame-identical to the overwrite-published history model (same " +
    "train slice, same fit), and the vacuumed root refuses the " +
    "reclaimed seed horizon") {
    import graft.operators.Bpe
    import graft.index.ModelLedger
    val ledger = Bpe.ensureLedgeredBpeModel(spark, sf0001)
    val hist = Bpe.ensureHistoryBpeModel(spark, sf0001)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select($"word", $"freq", $"n_bpe")
      .as[(String, Long, Long)].collect().toSet
    assert(rows(ModelLedger.readSideAsOf(spark, ledger, "vocab", 2L)) ==
      rows(Bpe.modelVocab(spark, hist)))
    // versions genuinely differ: the seed fit (one train third) must
    // segment SOME word differently from the full-train fit
    val seedV = rows(ModelLedger.readSideAsOf(spark, ledger, "vocab", 0L))
    assert(seedV != rows(ModelLedger.readSideAsOf(spark, ledger, "vocab", 2L)))
    val vac = Bpe.ensureVacuumedBpeModel(spark, sf0001)
    val e = intercept[IllegalArgumentException] {
      ModelLedger.readSideAsOf(spark, vac, "vocab", 0L)
    }
    assert(e.getMessage.contains("compaction"))
  }
}
