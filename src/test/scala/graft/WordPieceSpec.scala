package graft

import graft.operators.WordPiece
import org.apache.spark.sql.functions._

/** WordPiece semantics on controlled inputs: the likelihood-gain
  * election (the thing that makes it NOT BPE), greedy
  * longest-match-first serving, the `[UNK]` rule, and the persisted
  * model roundtrip. Corpus value parity is the driver gate's job.
  */
class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(docs: String*) =
    docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

  test("learn elects by likelihood gain, not raw count: a rare but " +
    "perfectly cohesive pair beats a frequent pair with promiscuous " +
    "members") {
    // 'x q' only ever co-occur (5×): score = 5S/(5·5) = S/5.
    // 'a b' co-occur 20× but a and b each appear 120×:
    // score = 20S/(120·120) = S/720. Raw-count BPE would elect "a ##b";
    // WordPiece must elect "x ##q".
    val docs = corpus(
      (Seq.fill(5)("xq") ++ Seq.fill(20)("ab") ++
        Seq.fill(100)("az") ++ Seq.fill(100)("zb")).mkString(" "))
    val (merges, pieces) = WordPiece.learn(docs, 1)
    assert(merges.head._1 == "x ##q",
      s"expected the cohesive pair, got ${merges.head}")
    // the merged piece joins the vocabulary alongside the alphabet
    assert(pieces.contains("xq"))
    assert(pieces.contains("a") && pieces.contains("##b"))
  }

  test("greedy longest-match-first: the longest piece wins at each " +
    "position even when a shorter split would also cover the word, " +
    "and continuation pieces require ##") {
    val words = Seq("abc", "abd", "cab").toDF("word")
    // pieces: initial {a, ab, c}, continuation {##b, ##c, ##d}.
    // "abc" → greedy takes "ab" (longest at pos 1), then "##c" — NOT
    // the equally-covering a ##b ##c. "cab" → c ##a? no ##a piece:
    // c matches pos 1, then pos 2 needs ##a — absent → [UNK].
    val pieces = Seq("a", "ab", "c", "##b", "##c", "##d")
    val got = WordPiece.greedySegmented(words, pieces)
      .select($"word", $"n_wp", $"wp_pieces")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getString(2))))
      .toMap
    assert(got("abc") == ((2L, "ab ##c")))
    assert(got("abd") == ((2L, "ab ##d")))
    assert(got("cab") == ((1L, "[UNK]")))
  }

  test("initial vs continuation positions are distinct vocabularies: " +
    "a bare piece never matches mid-word and a ## piece never matches " +
    "word-initially") {
    val words = Seq("aa").toDF("word")
    // only bare "a": pos 1 matches, pos 2 needs ##a → UNK
    val bareOnly = WordPiece.greedySegmented(words, Seq("a"))
      .select($"wp_pieces").head().getString(0)
    assert(bareOnly == "[UNK]")
    // only "##a": pos 1 needs a bare piece → UNK immediately
    val contOnly = WordPiece.greedySegmented(words, Seq("##a"))
      .select($"wp_pieces").head().getString(0)
    assert(contOnly == "[UNK]")
    // both: a ##a
    val both = WordPiece.greedySegmented(words, Seq("a", "##a"))
      .select($"n_wp", $"wp_pieces").as[(Long, String)].head()
    assert(both == ((2L, "a ##a")))
  }

  test("persisted model roundtrip: ensure is build-once (second call " +
    "serves the same merges), pieces = alphabet forms + merged " +
    "symbols, and the corpus serve covers every distinct word") {
    val root = WordPiece.ensureWordPieceModel(spark, sf0001)
    val merges = spark.read.parquet(s"$root/merges")
      .orderBy($"rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(merges.length == WordPiece.Rounds)
    assert(merges.forall { case (_, pair, merged, _) =>
      merged == pair.replace(" ##", "").replace(" ", "") })
    // deterministic rebuild: a second ensure must not relearn/drift
    val again = spark.read.parquet(
        s"${WordPiece.ensureWordPieceModel(spark, sf0001)}/merges")
      .orderBy($"rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(again.toSeq == merges.toSeq)
    val served = SparkEntry.queries("text_wordpiece_tokens")(spark, sf0001)
    val nWords = Tables.documents(spark, sf0001)
      .select(explode(split($"text", " ")).as("w"))
      .filter($"w" =!= "").select($"w").distinct().count()
    assert(served.count() == nWords)
    // alphabet-complete vocabulary ⇒ no UNK on the training corpus
    assert(served.filter($"wp_pieces" === "[UNK]").count() == 0)
    // and the segmentation is faithful: pieces reassemble the word
    val broken = served
      .withColumn("re",
        regexp_replace(regexp_replace($"wp_pieces", " ##", ""), " ", ""))
      .filter($"re" =!= $"word").count()
    assert(broken == 0, "pieces must concatenate back to the word")
  }

  test("ledgered tokenizer versions: the full-corpus version serves " +
    "the overwrite-published piece list identically, the narrower " +
    "seed version differs, and vacuum refuses the reclaimed horizon") {
    import graft.operators.WordPiece
    import graft.Tables
    import graft.index.ModelLedger
    val docs = Tables.documents(spark, sf0001)
    val root = tmpDir("wp-ledger")
    assert(WordPiece.commitWordPieceVersion(spark,
      docs.filter($"doc_id" % 3 === 1), root, 0L))
    assert(WordPiece.commitWordPieceVersion(spark, docs, root, 1L))
    val published = WordPiece.modelPieces(spark,
      WordPiece.ensureWordPieceModel(spark, sf0001))
    assert(WordPiece.piecesAsOf(spark, root, 1L) == published)
    assert(WordPiece.piecesAsOf(spark, root, 0L) != published)
    assert(ModelLedger.vacuum(spark, root, Seq("merges", "pieces"), 1L))
    assert(WordPiece.piecesAsOf(spark, root, 1L) == published)
    val e = intercept[IllegalArgumentException] {
      WordPiece.piecesAsOf(spark, root, 0L)
    }
    assert(e.getMessage.contains("compaction"))
  }
}
