package graft

import graft.streaming.StreamingCuration
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Top level, NOT nested in the spec: Janino cannot instantiate an
  * encoder target scoped to an outer test-class instance, so a nested
  * case class silently demotes every stream below it to the
  * interpreted (non-codegen) path (3× "Expr codegen error ... falling
  * back to interpreter" in the suite logs before this was hoisted).
  */
case class StreamingCurationDoc(doc_id: Long, text: String)

class StreamingCurationSpec extends SparkSpec {
  import spark.implicits._

  private type Doc = StreamingCurationDoc
  private val Doc = StreamingCurationDoc

  // 25 words, stopword-rich → quality 1.0
  private val goodText = ("the quick brown fox jumps over a lazy dog and " +
    "then it runs off to the river for a long cool drink of water today").trim

  test("stream curation: quality floor and benchmark overlap drop " +
    "in-flight; clean docs pass") {
    implicit val sc = spark.sqlContext
    // benchmark = one "eval" doc; its 4-grams become the drop-list
    val bench = Seq((0L, goodText)).toDF("doc_id", "text")
    val hashes = StreamingCuration.benchmarkGramHashes(bench)
    assert(hashes.length == goodText.split(" ").length - 3)

    val in = MemoryStream[Doc]
    val q = StreamingCuration.curate(in.toDF(), hashes)
      .writeStream.format("memory").queryName("curated")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(
        Doc(1, "too short"), // fails the quality floor
        Doc(2, "the quick brown fox jumps straight into the benchmark " +
          "which is a problem for all of it and everyone in the land today"),
        // ↑ shares the 4-gram "the quick brown fox" → contaminated
        Doc(3, "a completely original sentence of decent length that " +
          "talks about the weather in copenhagen and the traffic on its " +
          "bridges for a while longer"))
      q.processAllAvailable()
    } finally q.stop()
    val ids = spark.table("curated").select($"doc_id").as[Long].collect().toSeq
    assert(ids == Seq(3L))
  }

  test("bloom curation: one-sided error — everything the exact set drops " +
    "the bloom drops too; over-drop stays near the configured fpp") {
    val docs = Tables.documents(spark, sf0001)
    val bench = docs.filter($"source" === "src0")
    val corpus = docs.filter($"source" =!= "src0")
    val hashes = StreamingCuration.benchmarkGramHashes(bench)
    val bloom = StreamingCuration.benchmarkBloom(
      bench, expectedGrams = hashes.length.toLong, fpp = 0.01)
    // the bloom agrees with itself AND contains every true member
    assert(hashes.forall(bloom.mightContainLong))
    val exactKeep = StreamingCuration.curate(corpus, hashes)
      .select($"doc_id").as[Long].collect().toSet
    val bloomKeep = StreamingCuration.curateBloom(corpus, bloom)
      .select($"doc_id").as[Long].collect().toSet
    // no contaminated doc survives the bloom that the exact set caught
    assert(bloomKeep.subsetOf(exactKeep))
    // and false positives barely over-drop at 1% fpp on ~60-gram docs
    assert((exactKeep -- bloomKeep).size <= math.max(5, exactKeep.size / 2),
      s"over-dropped ${(exactKeep -- bloomKeep).size} of ${exactKeep.size}")
  }

  test("bloom-routed EXACT decontamination: verdict parity with the " +
    "exact gram array at 100x the fixture benchmark — driver holds the " +
    "bloom, the gram set stays a distributed frame") {
    val docs = Tables.documents(spark, sf0001)
    val bench0 = docs.filter($"source" === "src0")
    val corpus = docs.filter($"source" =!= "src0")
    // 100× benchmark: the fixture plus 99 word-salted copies — every
    // word of a copy carries its copy tag, so each copy contributes a
    // DISJOINT 4-gram set and the gram count scales ~100×, exactly the
    // suite growth that breaks a driver-collected array
    val bench100 = bench0.select($"doc_id", $"text")
      .crossJoin(spark.range(0, 100).toDF("rep"))
      .select($"doc_id",
        when($"rep" === 0, $"text").otherwise(
          concat_ws(" ", transform(split($"text", " "),
            w => concat(w, lit("_"), $"rep")))).as("text"))
    val grams100 = StreamingCuration.benchmarkGramFrame(bench100)
    val nGrams = grams100.count()
    val nBase = StreamingCuration.benchmarkGramFrame(bench0).count()
    assert(nGrams >= 90 * nBase,
      s"salted copies must multiply the gram set: $nGrams vs base $nBase")
    val bloom = StreamingCuration.benchmarkBloom(bench100, nGrams, 0.01)
    val routedKeep = StreamingCuration.curateExact(corpus, bloom, grams100)
      .select($"doc_id").as[Long].collect().toSet
    // parity with the exact-array route over the SAME 100× benchmark
    val exactKeep = StreamingCuration.curate(corpus,
        StreamingCuration.benchmarkGramHashes(bench100))
      .select($"doc_id").as[Long].collect().toSet
    assert(routedKeep == exactKeep,
      "bloom-routed exact verify must equal the exact-array verdicts " +
        "(the fpp false positives must all be clawed back)")
    // and the salted grams match no real text, so the verdicts equal
    // the original benchmark's too — the bloom's over-drop is gone
    val keep0 = StreamingCuration.curate(corpus,
        StreamingCuration.benchmarkGramHashes(bench0))
      .select($"doc_id").as[Long].collect().toSet
    assert(routedKeep == keep0,
      "routing must not change which docs the benchmark condemns")
    assert(routedKeep.nonEmpty)
  }

  test("streamed edge folds: the grown graph's warm-start re-score " +
    "equals the batch incremental gate, and a replayed edge commit " +
    "no-ops") {
    implicit val sc = spark.sqlContext
    import graft.operators.Curation
    val docs = Tables.documents(spark, sf0001)
    val root = tmpDir("pr-edge-stream")
    Curation.initGraphLedger(spark, docs, root)
    // the growth event (the third planted formula) streamed in TWO
    // micro-batches split by src parity — the union distinct is the
    // same grown graph q_pagerank_incremental folds in one batch
    val n = docs.count()
    val grow = docs.select(col("doc_id").as("src"),
        ((col("doc_id") * 13 + 11) % n).as("dst"))
      .filter(col("dst") =!= col("src"))
      .as[(Long, Long)].collect().toSeq
    val in = MemoryStream[(Long, Long)]
    val q = StreamingCuration.startEdgeIngest(
      in.toDF().toDF("src", "dst"), root, tmpDir("pr-edge-ckpt"))
    try {
      in.addData(grow.filter(_._1 % 2 == 0): _*); q.processAllAvailable()
      in.addData(grow.filter(_._1 % 2 == 1): _*); q.processAllAvailable()
    } finally q.stop()
    val commits = Curation.graphProtocol(root).foldedBatches().toSeq.sorted
    assert(commits.length == 2 && commits.head > 0L,
      s"epoch-minted edge commits must clear the seed: $commits")
    val streamed = Curation.pagerankWarmStart(spark, root, docs)
      .as[(Long, Long)].collect().toSeq
    val batch = SparkEntry.queries("q_pagerank_incremental")(spark, sf0001)
      .as[(Long, Long)].collect().toSeq
    assert(streamed == batch,
      "stream-grown graph must re-score exactly like the batch fold")
    // replayed edge commit: committed no-op
    assert(!Curation.appendEdgesCommit(
      grow.take(3).toDF("src", "dst"), root, commits.head))
  }

  test("checkpointed edge ingest: cadenced re-scores land as ledgered " +
    "checkpoints equal to the batch lifecycle's, retention bounds the " +
    "checkpoint history, and the newest still serves warm-starts") {
    implicit val sc = spark.sqlContext
    import graft.operators.Curation
    val docs = Tables.documents(spark, sf0001)
    val n = docs.count()
    def formula(a: Long, b: Long) =
      docs.select(col("doc_id").as("src"),
          ((col("doc_id") * a + b) % n).as("dst"))
        .filter(col("dst") =!= col("src"))
    val root = tmpDir("pr-ckpt-stream")
    Curation.initGraphLedger(spark, docs, root, seedFormulas = 1)
    // the batch twin of the same lifecycle is the value baseline
    val replica = tmpDir("pr-ckpt-replica")
    Curation.initGraphLedger(spark, docs, replica, seedFormulas = 1)
    Curation.appendEdgesCommit(formula(17L, 3L), replica, 1L)
    Curation.checkpointRescore(spark, replica, docs)
    Curation.appendEdgesCommit(formula(13L, 11L), replica, 2L)
    Curation.checkpointRescore(spark, replica, docs)

    val in = MemoryStream[(Long, Long)]
    val q = StreamingCuration.startEdgeIngestCheckpointed(
      in.toDF().toDF("src", "dst"), root, docs,
      tmpDir("pr-ckpt-stream-ckpt"), rescoreEvery = 1,
      retainCheckpoints = 1)
    try {
      for (f <- Seq(formula(17L, 3L), formula(13L, 11L))) {
        in.addData(f.as[(Long, Long)].collect().toSeq: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val sp = Curation.scoresProtocol(root)
    def scoresOf(r: String): Map[Long, Long] = {
      val p = Curation.scoresProtocol(r)
      val newest = p.committedDirs("scores")
        .maxBy(d => p.dirOrd(d.substring(d.lastIndexOf('/') + 1)))
      spark.read.parquet(newest).select($"id", $"r")
        .as[(Long, Long)].collect().toMap
    }
    assert(scoresOf(root) == scoresOf(replica),
      "streamed cadenced checkpoints must equal the batch chain's state")
    // retention kept exactly ONE servable checkpoint horizon: the
    // newest collapsed into a c-dir, the older one refuses
    val ids = sp.allLedgerIds().toSeq.sorted
    assert(ids.length == 2 && ids.head > 0L)
    val dataNames = new java.io.File(sp.dir("scores")).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dataNames == Set(s"c${ids(1)}"),
      s"unexpected checkpoint dirs: $dataNames")
    assertThrows[IllegalArgumentException](
      sp.committedDirsAsOf("scores", ids.head))
    // the vacuumed root still serves warm-start reads
    assert(Curation.pagerankWarmStart(spark, root, docs).count() > 0)
  }

  test("streamed NB model grows: each micro-batch lands a ledgered " +
    "model version; the final version equals the from-scratch fit on " +
    "the union and intermediate horizons stay servable") {
    implicit val sc = spark.sqlContext
    import graft.operators.TextAnalysis
    val docs = Tables.documents(spark, sf0001)
    val train = docs.filter($"doc_id" % 5 =!= 4)
    val root = tmpDir("nb-grow-stream")
    TextAnalysis.initLedgeredNbModel(
      train.filter($"doc_id" % 3 === 1), root)
    val in = MemoryStream[(Long, String, String)]
    val q = StreamingCuration.startNbGrowIngest(
      in.toDF().toDF("doc_id", "lang", "text"), root,
      tmpDir("nb-grow-ckpt"))
    try {
      for (m <- Seq(2, 0)) {
        in.addData(train.filter($"doc_id" % 3 === m)
          .select($"doc_id", $"lang", $"text")
          .as[(Long, String, String)].collect().toSeq: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val ids = TextAnalysis.modelProtocol(root).foldedBatches().toSeq.sorted
    assert(ids.length == 2 && ids.head > 0L,
      s"epoch-minted model commits must clear the seed: $ids")
    def mkey(df: org.apache.spark.sql.DataFrame) =
      df.select($"lang", $"tok", $"c", $"l_i").collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getLong(3))).toSet
    // final version == from-scratch fit on the full train split
    assert(mkey(TextAnalysis.readNbModelAsOf(spark, root, ids(1))._1)
      == mkey(TextAnalysis.nbModelFrames(train)._1))
    // the intermediate version == fit on the first two thirds
    assert(mkey(TextAnalysis.readNbModelAsOf(spark, root, ids(0))._1)
      == mkey(TextAnalysis.nbModelFrames(
        train.filter($"doc_id" % 3 =!= 0))._1))
    // replayed grow is a committed no-op
    assert(!TextAnalysis.growNbModelCommit(spark, root,
      train.limit(3), ids.head))
  }

  test("startCurated: micro-batches through the bloom-routed exact " +
    "path land batch-keyed survivors identical to the batch operator") {
    implicit val sc = spark.sqlContext
    val docs = Tables.documents(spark, sf0001)
    val bench = docs.filter($"source" === "src0")
    val corpus = docs.filter($"source" =!= "src0")
    val grams = StreamingCuration.benchmarkGramFrame(bench)
      .localCheckpoint() // static side of every micro-batch's verify
    val bloom = StreamingCuration.benchmarkBloom(bench, grams.count(), 0.01)
    val batchKeep = StreamingCuration.curateExact(corpus, bloom, grams)
      .select($"doc_id").as[Long].collect().toSet
    val out = tmpDir("curated-stream-out")
    val in = MemoryStream[Doc]
    val q = StreamingCuration.startCurated(
      in.toDF(), bloom, grams, out, tmpDir("curated-stream-ckpt"))
    try {
      val rows = corpus.select($"doc_id", $"text").as[(Long, String)]
        .collect().map { case (id, t) => Doc(id, t) }
      val (half1, half2) = rows.splitAt(rows.length / 2)
      in.addData(half1.toIndexedSeq: _*); q.processAllAvailable()
      in.addData(half2.toIndexedSeq: _*); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.read.option("recursiveFileLookup", "true")
      .parquet(out).select($"doc_id").as[Long].collect().toSet
    assert(streamed == batchKeep,
      "streaming micro-batches must reproduce the batch verdicts")
  }

  test("startExtract: streamed markup extraction equals the batch " +
    "extractor per micro-batch, clean docs pass unchanged, and a " +
    "replayed batchId rewrites rather than duplicates") {
    implicit val sc = spark.sqlContext
    import graft.operators.TextAnalysis
    val raw = Seq(
      1L -> (TextAnalysis.MarkupPre + "alpha beta" + TextAnalysis.MarkupPost),
      2L -> "already clean text",
      3L -> (TextAnalysis.MarkupPre + "gamma" + TextAnalysis.MarkupPost))
    val out = tmpDir("sext-out"); val ckpt = tmpDir("sext-ckpt")
    val in = MemoryStream[(Long, String)]
    val q = StreamingCuration.startExtract(
      in.toDF().toDF("doc_id", "t2"), out, ckpt)
    try {
      in.addData(raw.take(2): _*); q.processAllAvailable()
      in.addData(raw.drop(2): _*); q.processAllAvailable()
    } finally q.stop()
    def read() = spark.read.option("recursiveFileLookup", "true")
      .parquet(out).as[(Long, String, Long)].collect().toSet
    val streamed = read()
    val batch = TextAnalysis.extractHtml(raw.toDF("doc_id", "t2"))
      .select($"doc_id", $"ext",
        when($"ext" =!= $"t2", 1L).otherwise(0L).as("changed"))
      .as[(Long, String, Long)].collect().toSet
    assert(streamed == batch, "stream must equal the batch extractor")
    assert(streamed.exists(r => r._1 == 2L && r._3 == 0L &&
      r._2 == "already clean text"), "clean docs pass unchanged")
    assert(streamed.exists(r => r._1 == 1L && r._3 == 1L &&
      r._2.startsWith("alpha beta")), "markup docs extract their body")
    // replay batch 0
    StreamingCuration.publishExtractBatch(
      raw.take(2).toDF("doc_id", "t2"), 0L, out)
    assert(read() == streamed, "replayed batch must not duplicate")
  }

  test("startNbClassify: streamed classification against the persisted " +
    "NB model equals the batch serve per micro-batch, and a replayed " +
    "batchId rewrites rather than duplicates") {
    implicit val sc = spark.sqlContext
    import graft.operators.TextAnalysis
    val modelRoot = TextAnalysis.ensureNbModel(spark, sf0001)
    val holdout = Tables.documents(spark, sf0001)
      .filter($"doc_id" % 5 === 4)
      .select($"doc_id", $"lang", $"text")
      .as[(Long, String, String)].collect().toSeq
    val out = tmpDir("snb-out"); val ckpt = tmpDir("snb-ckpt")
    val in = MemoryStream[(Long, String, String)]
    val q = StreamingCuration.startNbClassify(
      in.toDF().toDF("doc_id", "lang", "text"), modelRoot, out, ckpt)
    try {
      in.addData(holdout.take(30): _*); q.processAllAvailable()
      in.addData(holdout.drop(30): _*); q.processAllAvailable()
    } finally q.stop()
    def read() = spark.read.option("recursiveFileLookup", "true")
      .parquet(out).as[(Long, String, String, Long)].collect().toSet
    val streamed = read()
    val batch = SparkEntry.queries("text_nb_indexed")(spark, sf0001)
      .as[(Long, String, String, Long)].collect().toSet
    assert(streamed == batch,
      "streamed classification must equal the persisted-model batch serve")
    // replay batch 0
    StreamingCuration.publishNbBatch(
      holdout.take(30).toDF("doc_id", "lang", "text"), 0L, modelRoot, out)
    assert(read() == streamed, "replayed batch must not duplicate")
  }

  test("startDsirScore: streamed domain-fit scores against the persisted " +
    "DSIR model equal the batch kernel per micro-batch, and a replayed " +
    "batchId rewrites rather than duplicates") {
    implicit val sc = spark.sqlContext
    import graft.operators.Curation
    val modelRoot = Curation.ensureDsirModel(spark, sf0001)
    val docs = Tables.documents(spark, sf0001)
      .select($"doc_id", $"source", $"text")
      .as[(Long, String, String)].collect().toSeq.take(60)
    val out = tmpDir("sdsir-out"); val ckpt = tmpDir("sdsir-ckpt")
    val in = MemoryStream[(Long, String, String)]
    val q = StreamingCuration.startDsirScore(
      in.toDF().toDF("doc_id", "source", "text"), modelRoot, out, ckpt)
    try {
      in.addData(docs.take(25): _*); q.processAllAvailable()
      in.addData(docs.drop(25): _*); q.processAllAvailable()
    } finally q.stop()
    def read() = spark.read.option("recursiveFileLookup", "true")
      .parquet(out).as[(Long, String, Long, Long)].collect().toSet
    val streamed = read()
    val batch = Curation.dsirScore(
        docs.toDF("doc_id", "source", "text"),
        spark.read.parquet(s"$modelRoot/model"))
      .as[(Long, String, Long, Long)].collect().toSet
    assert(streamed == batch,
      "streamed scores must equal the frozen-model batch kernel")
    // replay batch 0
    StreamingCuration.publishDsirBatch(
      docs.take(25).toDF("doc_id", "source", "text"), 0L, modelRoot, out)
    assert(read() == streamed, "replayed batch must not duplicate")
  }

  test("stream and batch curation agree: the same expressions filter the " +
    "documents table to the same survivors") {
    implicit val sc = spark.sqlContext
    val docs = Tables.documents(spark, sf0001)
    val bench = docs.filter($"source" === "src0")
    val hashes = StreamingCuration.benchmarkGramHashes(bench)
    val batchIds = StreamingCuration
      .curate(docs.filter($"source" =!= "src0"), hashes)
      .select($"doc_id").as[Long].collect().toSet
    assert(batchIds.nonEmpty)
    val in = MemoryStream[Doc]
    val q = StreamingCuration.curate(in.toDF(), hashes)
      .writeStream.format("memory").queryName("curated_parity")
      .outputMode(OutputMode.Append()).start()
    try {
      val rows = docs.filter($"source" =!= "src0")
        .select($"doc_id", $"text").as[(Long, String)].collect()
      in.addData(rows.map { case (id, t) => Doc(id, t) }.toIndexedSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamIds = spark.table("curated_parity")
      .select($"doc_id").as[Long].collect().toSet
    assert(streamIds == batchIds)
  }

  test("extract → curate chain: startExtract's landed output streams " +
    "into startCurated and the end-to-end survivors equal the batch " +
    "composition of the two operators") {
    implicit val sc = spark.sqlContext
    import graft.operators.TextAnalysis
    val bench = Seq((0L, goodText)).toDF("doc_id", "text")
    val grams = StreamingCuration.benchmarkGramFrame(bench).localCheckpoint()
    val bloom = StreamingCuration.benchmarkBloom(bench, grams.count(), 0.01)
    val raw = Seq(
      1L -> (TextAnalysis.MarkupPre +
        "an original body of twenty plus words that talks about the " +
        "harbour and the wind and the city it describes at length" +
        TextAnalysis.MarkupPost),
      2L -> (TextAnalysis.MarkupPre + "too short" + TextAnalysis.MarkupPost),
      3L -> ("a clean body of twenty plus words that walks along the " +
        "river and the bridge and the square it describes in detail " +
        "for some time"),
      4L -> (TextAnalysis.MarkupPre +
        "the quick brown fox jumps straight into this body which has " +
        "more than twenty words and it keeps going on much longer" +
        TextAnalysis.MarkupPost))
    // the batch composition of the two operators is the contract
    val extracted = TextAnalysis.extractHtml(raw.toDF("doc_id", "t2"))
      .select($"doc_id", $"ext".as("text"))
    val batchKeep = StreamingCuration.curateExact(extracted, bloom, grams)
      .select($"doc_id").as[Long].collect().toSet
    assert(batchKeep == Set(1L, 3L),
      "fixture: 2 must fail quality, 4 must hit the benchmark")
    // stage 1: raw markup → extracted parquet, batchId-keyed
    val mid = tmpDir("chain-mid")
    val in = MemoryStream[(Long, String)]
    val q1 = StreamingCuration.startExtract(
      in.toDF().toDF("doc_id", "t2"), mid, tmpDir("chain-ck1"))
    try {
      in.addData(raw.take(2): _*); q1.processAllAvailable()
      in.addData(raw.drop(2): _*); q1.processAllAvailable()
    } finally q1.stop()
    // stage 2: the landed extraction output IS the next stage's source —
    // a file-source stream over the batchId-keyed directories
    val midSchema = new org.apache.spark.sql.types.StructType()
      .add("doc_id", "long").add("ext", "string").add("changed", "long")
    val src = spark.readStream.schema(midSchema).parquet(s"$mid/b*")
      .select($"doc_id", $"ext".as("text"))
    val out = tmpDir("chain-out")
    val q2 = StreamingCuration.startCurated(
      src, bloom, grams, out, tmpDir("chain-ck2"))
    try q2.processAllAvailable() finally q2.stop()
    val streamed = spark.read.option("recursiveFileLookup", "true")
      .parquet(out).select($"doc_id").as[Long].collect().toSet
    assert(streamed == batchKeep,
      "the chained streams must reproduce the composed batch verdicts")
  }
}
