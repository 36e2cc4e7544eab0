package graft

import graft.operators.Similarity
import graft.streaming.StreamingSimilarity
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming ANN enrichment against the persisted IVF index: each
  * micro-batch's output must equal the batch index query over the same
  * query set (rankings are per-query, so the union over micro-batches
  * is the batch answer), and a redelivered batchId must rewrite rather
  * than duplicate.
  */
class StreamingSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def resultsOf(out: String) =
    spark.read.option("recursiveFileLookup", "true").parquet(out)
      .select($"query_id", $"neighbor_id", $"rank")
      .as[(Long, Long, Int)].collect().toSet

  test("stream enrichment vs persisted IVF index: micro-batch union " +
    "equals the batch index query; a replayed batchId is idempotent") {
    implicit val sc = spark.sqlContext
    val idx = Similarity.ensureIvfIndex(spark, sf0001)
    val out = tmpDir("ssim-out")
    val ckpt = tmpDir("ssim-ckpt")
    val qvecs = Tables.embeddings(spark, sf0001)
      .filter($"vec_id" < 6)
      .select($"vec_id", $"embedding")
      .as[(Long, Array[Float])].collect().toSeq.sortBy(_._1)

    val in = MemoryStream[(Long, Array[Float])]
    val q = StreamingSimilarity.start(
      in.toDF().toDF("query_id", "qv"), idx, out, ckpt)
    try {
      in.addData(qvecs.take(3): _*)
      q.processAllAvailable()
      in.addData(qvecs.drop(3): _*)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = resultsOf(out)
    val batch = Similarity.indexTopK(spark, idx,
      Tables.embeddings(spark, sf0001).filter($"vec_id" < 6)
        .select($"vec_id".as("query_id"), $"embedding".as("qv")))
      .as[(Long, Long, Int)].collect().toSet
    assert(streamed == batch)
    assert(streamed.map(_._1) == (0L until 6L).toSet)

    // replay of batch 0 (restart between sink write and checkpoint
    // commit): the batchId-keyed overwrite rewrites the same directory —
    // no duplicate rows appear
    StreamingSimilarity.publishBatch(
      qvecs.take(3).toDF("query_id", "qv"), 0L, idx, out)
    assert(resultsOf(out) == streamed, "replayed batch must not duplicate")
  }

  /** Independent nearest-frozen-centroid recompute (rounded cosine
    * desc, cent_id tie-break — the assign contract) in plain Scala.
    */
  private def nearestCent(v: Array[Float],
      cents: Seq[(Long, Array[Double])]): Long =
    cents.map { case (cid, cv) =>
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < v.length) {
        d += v(i) * cv(i); na += v(i).toDouble * v(i); nb += cv(i) * cv(i)
        i += 1
      }
      (BigDecimal(d / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP), cid)
    }.minBy { case (sim, cid) => (-sim, cid) }._2

  test("streaming BINARY serve vs persisted IVF+binary index: " +
    "micro-batch union equals the batch serve (shortlist + exact " +
    "rerank included); a replayed batchId is idempotent") {
    implicit val sc = spark.sqlContext
    val idx = Similarity.ensureIvfBinaryIndex(spark, sf0001)
    val full = Tables.embeddings(spark, sf0001)
      .select($"vec_id", $"embedding".as("v"))
    val out = tmpDir("sbin-out")
    val ckpt = tmpDir("sbin-ckpt")
    val qvecs = Tables.embeddings(spark, sf0001)
      .filter($"vec_id" < 6)
      .select($"vec_id", $"embedding")
      .as[(Long, Array[Float])].collect().toSeq.sortBy(_._1)

    val in = MemoryStream[(Long, Array[Float])]
    val q = StreamingSimilarity.startBinary(
      in.toDF().toDF("query_id", "qv"), idx, full, out, ckpt)
    try {
      in.addData(qvecs.take(3): _*)
      q.processAllAvailable()
      in.addData(qvecs.drop(3): _*)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = resultsOf(out)
    val batch = Similarity.ivfBinaryTopK(spark, idx,
      qvecs.toDF("query_id", "qv"), full)
      .as[(Long, Long, Int)].collect().toSet
    assert(streamed == batch,
      "micro-batch union must equal the batch binary serve")
    // replay batch 0
    StreamingSimilarity.publishBinaryBatch(
      qvecs.take(3).toDF("query_id", "qv"), 0L, idx, full, out)
    assert(resultsOf(out) == streamed,
      "a replayed batch must not duplicate")
  }

  test("appendToIvfIndex: a batch-grown index holds exactly the union " +
    "assigned to the FROZEN centroids; replay, crash-window and " +
    "compaction are all exactly-once / result-identical") {
    val e = Tables.embeddings(spark, sf0001)
      .select($"vec_id", $"embedding".as("v"))
    val wave1 = e.filter($"vec_id" % 3 =!= 2)
    val wave2 = e.filter($"vec_id" % 3 === 2 && $"vec_id" % 2 === 0)
    val wave3 = e.filter($"vec_id" % 3 === 2 && $"vec_id" % 2 === 1)
    val idx = tmpDir("ivf-grown")
    Similarity.writeIvfIndex(wave1, idx)
    assert(Similarity.appendToIvfIndex(wave2, idx, 0L))

    def contents() = Similarity.indexVectors(spark, idx)
      .select($"vec_id", $"cent_id").as[(Long, Long)].collect().toSet
    val cents = spark.read.parquet(s"$idx/cents")
      .as[(Long, Array[Double])].collect().toSeq
    val expect = wave1.union(wave2)
      .as[(Long, Array[Float])].collect()
      .map { case (id, v) => id -> nearestCent(v, cents) }.toSet
    val afterB0 = contents()
    assert(afterB0 == expect,
      "grown index must equal union-assigned-to-frozen-centroids")

    // post-commit replay: committed no-op
    assert(!Similarity.appendToIvfIndex(wave2, idx, 0L))
    assert(contents() == afterB0)

    // crash BETWEEN b-dir write and ledger commit: the orphan b-dir is
    // invisible to readers until the batch's replay commits it
    Similarity.stageIvfFold(wave3, idx, 1L)
    assert(contents() == afterB0, "orphan b-dir must stay invisible")
    assert(Similarity.appendToIvfIndex(wave3, idx, 1L))
    val afterB1 = contents()
    assert(afterB1.map(_._1) == afterB0.map(_._1) ++
      wave3.select($"vec_id").as[Long].collect())

    // queries before/after compaction are identical; compaction bounds
    // the sub-root listing to ONE dir
    val q = e.filter($"vec_id" < 3)
      .select($"vec_id".as("query_id"), $"v".as("qv"))
    val before = Similarity.indexTopK(spark, idx, q)
      .as[(Long, Long, Int)].collect().toSet
    // pre-compaction the index is a 3-root union (seed + b0 + b1); the
    // static cell prune must reach EVERY branch's PartitionFilters —
    // the property that keeps probe cost at nprobe/K across appends
    val one = e.filter($"vec_id" === 1)
      .select($"vec_id".as("query_id"), $"v".as("qv"))
    val multiScans = Similarity.indexTopK(spark, idx, one)
      .queryExecution.sparkPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.metadata("Location").contains("ivf-grown") &&
            f.metadata("Location").contains("vectors") => f
      }
    assert(multiScans.size >= 3, s"expected 3 union branches: $multiScans")
    multiScans.foreach { f =>
      assert(f.partitionFilters.map(_.toString)
        .exists(s => s.contains(" IN ") || s.contains("INSET")),
        s"branch without the static cell prune: ${f.partitionFilters}")
      assert(f.selectedPartitions.partitionCount <= 4)
    }
    Similarity.compactIvfIndex(spark, idx)
    assert(contents() == afterB1)
    assert(Similarity.indexTopK(spark, idx, q)
      .as[(Long, Long, Int)].collect().toSet == before)
    import scala.jdk.CollectionConverters._
    val roots = java.nio.file.Files.list(java.nio.file.Paths.get(
      Similarity.protocol(idx).dir("vectors"))).iterator().asScala
      .filter(java.nio.file.Files.isDirectory(_)).toSeq
    assert(roots.size == 1 &&
      roots.head.getFileName.toString.matches("c\\d+"))
    // replayed batchIds keep short-circuiting after their b-dirs are
    // compacted away
    assert(!Similarity.appendToIvfIndex(wave2, idx, 0L))
    assert(contents() == afterB1)
  }

  test("indexTopK: when probes cover a STRICT subset of cells, the " +
    "vector scan lists only the probed cent_id= directories") {
    val e = Tables.embeddings(spark, sf0001)
      .select($"vec_id", $"embedding".as("v"))
    val idx = tmpDir("ivf-prune")
    // seedEvery=10 → ~50 cells; one query probes 4 of them
    Similarity.writeIvfIndex(e, idx, seedEvery = 10)
    val q1 = e.filter($"vec_id" === 0)
      .select($"vec_id".as("query_id"), $"v".as("qv"))
    val res = Similarity.indexTopK(spark, idx, q1)
    val vecScan = res.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
        if f.metadata("Location").contains("vectors") => f
    }.head
    assert(vecScan.partitionFilters.nonEmpty,
      "strict-subset probe must plan a PartitionFilter")
    val listed = vecScan.selectedPartitions.partitionCount
    assert(listed <= 4, s"one query with nprobe=4 listed $listed cell dirs")
    val totalCells = spark.read.parquet(s"$idx/cents").count()
    assert(listed < totalCells)
    assert(res.count() > 0)
  }

  test("startIngest: streamed vector batches fold into the index " +
    "exactly-once and the next enrichment query searches the grown " +
    "corpus") {
    implicit val sc = spark.sqlContext
    val e = Tables.embeddings(spark, sf0001)
      .select($"vec_id", $"embedding".as("v"))
    val idx = tmpDir("ivf-ingest")
    Similarity.writeIvfIndex(e.filter($"vec_id" % 2 === 0), idx)
    val newVecs = e.filter($"vec_id" % 2 === 1)
      .as[(Long, Array[Float])].collect().toSeq.sortBy(_._1)

    val in = MemoryStream[(Long, Array[Float])]
    val q = StreamingSimilarity.startIngest(
      in.toDF().toDF("vec_id", "v"), idx, tmpDir("ivf-ingest-ckpt"),
      compactEvery = 2)
    try {
      in.addData(newVecs.take(5): _*)
      q.processAllAvailable()
      in.addData(newVecs.drop(5): _*)
      q.processAllAvailable()
    } finally q.stop()

    val ids = Similarity.indexVectors(spark, idx)
      .select($"vec_id").as[Long].collect().toSet
    assert(ids == e.select($"vec_id").as[Long].collect().toSet,
      "all streamed vectors must be searchable after the folds")
    // compactEvery=2 fired after batchId 1: the sub-root listing is
    // bounded to ONE compaction dir and nothing was lost
    import scala.jdk.CollectionConverters._
    val roots = java.nio.file.Files.list(java.nio.file.Paths.get(
      Similarity.protocol(idx).dir("vectors"))).iterator().asScala
      .filter(java.nio.file.Files.isDirectory(_))
      .map(_.getFileName.toString).toSeq
    assert(roots.size == 1 && roots.head.matches("c\\d+"),
      s"expected auto-compacted roots: $roots")
    // a streamed vector is now found by enrichment: querying WITH one
    // of the new vectors' values returns sim-1.0 neighbors from its
    // cell (itself excluded by id)
    val (nid, nv) = newVecs.head
    val hits = Similarity.indexTopK(spark, idx,
      Seq((nid, nv)).toDF("query_id", "qv"))
      .as[(Long, Long, Int)].collect()
    assert(hits.nonEmpty && !hits.exists(_._2 == nid))
  }

  test("retained streaming ingest (retainCommits): the as-of window " +
    "stays bounded — surviving horizons serve the unvacuumed " +
    "replica's results exactly, older horizons refuse, and the dir " +
    "count is bounded") {
    implicit val sc = spark.sqlContext
    val e = Tables.embeddings(spark, sf0001)
      .select($"vec_id", $"embedding".as("v"))
    val seed = e.filter($"vec_id" % 4 === 0)
    val waves = (1 to 3).map(m => e.filter($"vec_id" % 4 === m)
      .as[(Long, Array[Float])].collect().toSeq)
    val idx = tmpDir("ivf-retained")
    Similarity.writeIvfIndex(seed, idx)
    // an UNVACUUMED replica of the same lifecycle is the value baseline
    val replica = tmpDir("ivf-retained-replica")
    Similarity.writeIvfIndex(seed, replica)
    waves.zipWithIndex.foreach { case (w, i) =>
      Similarity.appendToIvfIndex(
        w.toDF("vec_id", "v"), replica, i.toLong)
    }
    val in = MemoryStream[(Long, Array[Float])]
    // vacuumEvery cadence = compactEvery; fires each batch here
    val q = StreamingSimilarity.startIngest(
      in.toDF().toDF("vec_id", "v"), idx, tmpDir("ivf-retained-ckpt"),
      compactEvery = 1, retainCommits = 2)
    try {
      for (w <- waves) { in.addData(w: _*); q.processAllAvailable() }
    } finally q.stop()
    val queries = Tables.embeddings(spark, sf0001).filter($"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"embedding".as("qv"))
    def served(path: String, asOf: Option[Long]) =
      Similarity.indexTopK(spark, path, queries, asOf = asOf)
        .as[(Long, Long, Int)].collect().toSet
    // the two newest commits stay exactly as-of-readable, value-equal
    // to the unvacuumed replica's horizons
    for (h <- Seq(1L, 2L))
      assert(served(idx, Some(h)) == served(replica, Some(h)),
        s"horizon $h diverged from the unvacuumed replica")
    assert(served(idx, None) == served(replica, None))
    // the horizon past the retention window refuses
    assertThrows[IllegalArgumentException](served(idx, Some(0L)))
    // bounded dir count: one resolved c-dir + the window's tail
    import scala.jdk.CollectionConverters._
    val roots = java.nio.file.Files.list(java.nio.file.Paths.get(
      Similarity.protocol(idx).dir("vectors"))).iterator().asScala
      .filter(java.nio.file.Files.isDirectory(_))
      .map(_.getFileName.toString).toSet
    assert(roots == Set("c1", "b2"), s"unexpected dirs: $roots")
  }

  test("startPqIngest: streamed batches encode against the frozen " +
    "artifacts, fold exactly-once, auto-compact, and serve with the " +
    "one-shot index's results") {
    implicit val sc = spark.sqlContext
    val e = Tables.embeddings(spark, sf0001)
      .select($"vec_id", $"embedding".as("v"))
    val idx = tmpDir("ivfpq-ingest")
    Similarity.writeIvfPqIndex(e.filter($"vec_id" % 2 === 0), idx)
    val newVecs = e.filter($"vec_id" % 2 === 1)
      .as[(Long, Array[Float])].collect().toSeq.sortBy(_._1)

    val in = MemoryStream[(Long, Array[Float])]
    val q = StreamingSimilarity.startPqIngest(
      in.toDF().toDF("vec_id", "v"), idx, tmpDir("ivfpq-ingest-ckpt"),
      compactEvery = 2)
    try {
      in.addData(newVecs.take(5): _*)
      q.processAllAvailable()
      in.addData(newVecs.drop(5): _*)
      q.processAllAvailable()
    } finally q.stop()

    assert(Similarity.indexCodes(spark, idx)
      .select($"vec_id").as[Long].collect().toSet ==
      e.select($"vec_id").as[Long].collect().toSet,
      "every streamed vector must be coded into the index")
    import scala.jdk.CollectionConverters._
    val roots = java.nio.file.Files.list(java.nio.file.Paths.get(
      Similarity.protocol(idx).dir("vectors"))).iterator().asScala
      .filter(java.nio.file.Files.isDirectory(_))
      .map(_.getFileName.toString).toSeq
    assert(roots.size == 1 && roots.head.matches("c\\d+"),
      s"expected auto-compacted roots: $roots")
    // the streamed-and-compacted index serves the same results as an
    // index built in ONE shot over the same corpus (frozen-artifact
    // encode is order-independent given identical seeds/codebook
    // training inputs... the artifacts differ: seed-built on evens vs
    // full - so compare against a replica of the SAME lifecycle)
    val replica = tmpDir("ivfpq-replica")
    Similarity.writeIvfPqIndex(e.filter($"vec_id" % 2 === 0), replica)
    Similarity.appendToIvfPqIndex(
      e.filter($"vec_id" % 2 === 1), replica, 0L)
    val queries = Tables.embeddings(spark, sf0001)
      .filter($"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"embedding".as("qv"))
    val served = Similarity.ivfPqTopK(spark, idx, queries, e)
      .collect().map(_.toString).toSet
    val oneShot = Similarity.ivfPqTopK(spark, replica, queries, e)
      .collect().map(_.toString).toSet
    assert(served == oneShot,
      "streamed folds + compaction must serve the replica's results")
    assert(Similarity.protocol(idx)
      .fsck(Seq("cents", "codebook", "vectors", "tombstones")).clean)
  }

  test("startBinaryIngest: streamed batches sign-pack against the " +
    "frozen centroids, fold exactly-once, auto-compact, and serve the " +
    "same-lifecycle replica's results") {
    implicit val sc = spark.sqlContext
    val e = Tables.embeddings(spark, sf0001)
      .select($"vec_id", $"embedding".as("v"))
    val idx = tmpDir("ivfbin-ingest")
    Similarity.writeIvfBinaryIndex(e.filter($"vec_id" % 2 === 0), idx)
    val newVecs = e.filter($"vec_id" % 2 === 1)
      .as[(Long, Array[Float])].collect().toSeq.sortBy(_._1)

    val in = MemoryStream[(Long, Array[Float])]
    val q = StreamingSimilarity.startBinaryIngest(
      in.toDF().toDF("vec_id", "v"), idx, tmpDir("ivfbin-ingest-ckpt"),
      compactEvery = 2)
    try {
      in.addData(newVecs.take(5): _*)
      q.processAllAvailable()
      in.addData(newVecs.drop(5): _*)
      q.processAllAvailable()
    } finally q.stop()

    assert(Similarity.indexBWords(spark, idx)
      .select($"vec_id").as[Long].collect().toSet ==
      e.select($"vec_id").as[Long].collect().toSet,
      "every streamed vector must be sign-packed into the index")
    import scala.jdk.CollectionConverters._
    val roots = java.nio.file.Files.list(java.nio.file.Paths.get(
      Similarity.protocol(idx).dir("bwords"))).iterator().asScala
      .filter(java.nio.file.Files.isDirectory(_))
      .map(_.getFileName.toString).toSeq
    assert(roots.size == 1 && roots.head.matches("c\\d+"),
      s"expected auto-compacted roots: $roots")
    val replica = tmpDir("ivfbin-replica")
    Similarity.writeIvfBinaryIndex(e.filter($"vec_id" % 2 === 0), replica)
    Similarity.appendToIvfBinaryIndex(
      e.filter($"vec_id" % 2 === 1), replica, 0L)
    val queries = Tables.embeddings(spark, sf0001)
      .filter($"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"embedding".as("qv"))
    val served = Similarity.ivfBinaryTopK(spark, idx, queries, e)
      .collect().map(_.toString).toSet
    val oneShot = Similarity.ivfBinaryTopK(spark, replica, queries, e)
      .collect().map(_.toString).toSet
    assert(served == oneShot,
      "streamed folds + compaction must serve the replica's results")
    assert(Similarity.protocol(idx)
      .fsck(Seq("cents", "bwords", "tombstones")).clean)
  }
}
