package graft

import graft.operators.Unigram
import org.apache.spark.sql.functions._

/** The unigram-LM (SentencePiece-shape) tokenizer: hand-walked Viterbi
  * segmentation (scores, split choice, the ascending-j first-max
  * tie-break), hard-EM pruning behavior, model persistence, and the
  * structural bounds that make the apply meter trustworthy.
  */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  test("viterbiPieces: picks the max-score segmentation, prefers the " +
    "longest piece on ties, and covers every character") {
    // vocab: 'ab' beats 'a'+'b' (-1.0 > -1.5-1.5); for 'ba' only the
    // char path exists
    val m = typedlit(Map("ab" -> -1.0, "a" -> -1.5, "b" -> -1.5))
    val out = Seq("abab", "ba", "aabb")
      .toDF("word")
      .select($"word", Unigram.viterbiPieces($"word", m).as("pieces"))
      .as[(String, Seq[String])].collect().toMap
    assert(out("abab").sorted == Seq("ab", "ab"),
      "two merged pieces must beat four chars")
    assert(out("ba").sorted == Seq("a", "b"))
    assert(out("aabb").sorted == Seq("a", "ab", "b"),
      "the interior 'ab' must be found across the aa/bb runs")
    // tie-break: 'xy' scored exactly like 'x'+'y' — the FIRST max over
    // ascending split points j keeps the longer piece (smaller j)
    val tie = typedlit(Map("xy" -> -2.0, "x" -> -1.0, "y" -> -1.0))
    val t = Seq("xy").toDF("word")
      .select(Unigram.viterbiPieces($"word", tie).as("p"))
      .as[Seq[String]].head()
    assert(t == Seq("xy"),
      s"equal-score paths must resolve to the longest piece, got $t")
  }

  test("learnModel: hard EM prunes seed pieces the best paths never " +
    "use, keeps every single char, and the persisted model re-serves " +
    "without re-learning") {
    val (pieces, wordseg, curve) = Unigram.learnModel(
      Tables.documents(spark, sf0001))
    val ps = pieces.as[(String, Double, Long)].collect()
    assert(ps.nonEmpty && ps.length <= Unigram.SeedSize + 64)
    // every multi-char survivor was genuinely used; chars may be 0
    assert(ps.filter(_._1.length > 1).forall(_._3 > 0),
      "an unused multi-char piece survived the prune")
    // every character of the corpus vocabulary is coverable
    val chars = ps.filter(_._1.length == 1).map(_._1.head).toSet
    val words = wordseg.select($"word").as[String].collect()
    assert(words.forall(_.forall(chars.contains)),
      "single-char coverage must span the corpus alphabet")
    // scores are log-probs of a proper distribution: all negative
    assert(ps.forall(_._2 < 0.0))
    // segmentation bounds: ceil(len/MaxPieceLen) <= n_pieces <= len
    val segs = wordseg.select($"word", $"n_pieces")
      .as[(String, Long)].collect()
    assert(segs.forall { case (w, n) =>
      n <= w.length &&
        n >= (w.length + Unigram.MaxPieceLen - 1) / Unigram.MaxPieceLen })
    // EM genuinely pruned: the seed had SeedSize multi pieces (or all
    // available), the survivors are strictly fewer at this corpus
    assert(ps.count(_._1.length > 1) < Unigram.SeedSize)
    // the prune curve: one point per EM round, vocab monotonically
    // non-increasing (EM only prunes), the final point consistent with
    // the returned model and segmentation
    assert(curve.map(_._1) == (0 to Unigram.EmRounds))
    assert(curve.sliding(2).forall {
      case Seq((_, v1, _), (_, v2, _)) => v2 <= v1
      case _ => true
    }, "vocab size must be non-increasing across EM rounds")
    assert(curve.last._2 == ps.length.toLong)
    val freqs = wordseg.select($"word", $"freq")
      .as[(String, Long)].collect().toMap
    val totalFinal = segs.map { case (w, n) => n * freqs(w) }.sum
    assert(curve.last._3 == totalFinal,
      "final curve total must equal sum(freq * n_pieces)")

    // persistence: a second ensure serves the identical model
    val root = Unigram.ensureUnigramModel(spark, sf0001)
    val served = spark.read.parquet(s"$root/pieces")
      .as[(String, Double, Long)].collect().sortBy(_._1)
    assert(served.toSeq == ps.sortBy(_._1).toSeq,
      "the persisted model must equal the in-memory learn")
  }

  test("meter: unigram_tokens sums the wordseg counts with char-count " +
    "fallback for out-of-vocabulary words") {
    val wordseg = Seq(("alpha", 1L, 2L), ("beta", 1L, 1L))
      .toDF("word", "freq", "n_pieces")
    val docs = Seq((1L, "alpha beta alpha"), (2L, "gamma beta"))
      .toDF("doc_id", "text")
    val rows = Unigram.meter(docs, wordseg)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(rows(1L) == ((3L, 5L)), "2 + 1 + 2 pieces")
    assert(rows(2L) == ((2L, 6L)),
      "OOV 'gamma' pays its 5 chars + beta's 1 piece")
  }

  test("ledgered tokenizer versions: the history-slice version is " +
    "frame-identical to the overwrite-published history model, the " +
    "seed version differs, and vacuum refuses the reclaimed horizon") {
    import graft.operators.Unigram
    import graft.Tables
    import graft.index.ModelLedger
    val hist = Tables.documents(spark, sf0001)
      .filter($"doc_id" % 5 =!= 4)
    val root = tmpDir("uni-ledger")
    assert(Unigram.commitUnigramVersion(spark, hist.filter($"doc_id" % 3 === 1), root, 0L))
    assert(Unigram.commitUnigramVersion(spark, hist, root, 1L))
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select($"word", $"freq", $"n_pieces")
      .as[(String, Long, Long)].collect().toSet
    val published = spark.read.parquet(
      Unigram.ensureHistoryUnigramModel(spark, sf0001) + "/wordseg")
    assert(rows(Unigram.wordsegAsOf(spark, root, 1L)) == rows(published))
    assert(rows(Unigram.wordsegAsOf(spark, root, 0L)) != rows(published))
    assert(ModelLedger.vacuum(spark, root,
      Seq("pieces", "wordseg", "curve"), 1L))
    assert(rows(Unigram.wordsegAsOf(spark, root, 1L)) == rows(published))
    val e = intercept[IllegalArgumentException] {
      Unigram.wordsegAsOf(spark, root, 0L)
    }
    assert(e.getMessage.contains("compaction"))
  }
}
