package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Centroid refresh: the recall inequality that justifies the op, the
  * drift gate, and the ledgered exactly-once refresh protocol.
  */
class IvfRefreshSpec extends SparkSpec {
  import spark.implicits._

  test("sim_ivf_refreshed: one Lloyd re-cluster wins back recall lost " +
    "to frozen-centroid growth under a distribution shift") {
    val rows = SparkEntry.queries("sim_ivf_refreshed")(spark, sf0001)
      .select($"query_id", $"frozen_common", $"refreshed_common")
      .as[(Long, Long, Long)].collect()
    assert(rows.length == 40, "20 original + 20 shifted queries")
    val frozen = rows.map(_._2).sum
    val refreshed = rows.map(_._3).sum
    assert(refreshed >= frozen,
      s"refreshed recall $refreshed must not lose to frozen $frozen")
    // the shifted half is where frozen centroids hurt: the refresh must
    // strictly improve there (otherwise the op is vacuous on the gate)
    val shifted = rows.filter(_._1 >= 100000L)
    assert(shifted.map(_._3).sum > shifted.map(_._2).sum,
      "refresh must strictly improve shifted-query recall")
  }

  test("sim_ivf_binary_refreshed: the re-cluster inequality holds at " +
    "the sign-word rung too — refreshed recall never loses overall " +
    "and strictly improves on the shifted half") {
    val rows = SparkEntry.queries("sim_ivf_binary_refreshed")(spark, sf0001)
      .select($"query_id", $"frozen_common", $"refreshed_common")
      .as[(Long, Long, Long)].collect()
    assert(rows.length == 40, "20 original + 20 shifted queries")
    assert(rows.map(_._3).sum >= rows.map(_._2).sum,
      "refreshed binary recall must not lose to frozen")
    val shifted = rows.filter(_._1 >= 100000L)
    assert(shifted.map(_._3).sum > shifted.map(_._2).sum,
      "binary refresh must strictly improve shifted-query recall")
  }

  test("refreshIvfBinaryIndex: drift gate skips the rewrite, ledgered " +
    "refreshIds are exactly-once, the re-bin rewrites every live sign " +
    "word exactly once, and a short sidecar refuses to publish") {
    val idx = tmpDir("ivfbin-refresh")
    val e = Tables.embeddings(spark, sf0001)
      .select($"vec_id", $"embedding".as("v"))
    Similarity.writeIvfBinaryIndex(e.filter($"vec_id" % 5 =!= 4), idx)
    assert(Similarity.appendToIvfBinaryIndex(
      e.filter($"vec_id" % 5 === 4), idx, 0L))
    val queries = Tables.embeddings(spark, sf0001)
      .filter($"vec_id" < 20)
      .select($"vec_id".as("query_id"), $"embedding".as("qv"))
    def served() = Similarity.ivfBinaryTopK(spark, idx, queries, e)
      .as[(Long, Long, Int)].collect().toSeq
    val baseline = served()

    // impossible drift bar: skip the rewrite, still commit the id
    assert(!Similarity.refreshIvfBinaryIndex(spark, idx, 0L, e,
      minDrift = 10.0))
    assert(served() == baseline, "a skipped refresh must not touch data")
    assert(!Similarity.refreshIvfBinaryIndex(spark, idx, 0L, e),
      "replayed refreshId is a committed no-op even when it skipped")

    // a sidecar that misses live rows must refuse loudly
    intercept[IllegalStateException] {
      Similarity.refreshIvfBinaryIndex(spark, idx, 1L,
        e.filter($"vec_id" % 2 === 0))
    }

    // a real refresh: rewrites, serves a complete consistent index,
    // neither it nor the old fold replays
    assert(Similarity.refreshIvfBinaryIndex(spark, idx, 2L, e))
    assert(!Similarity.refreshIvfBinaryIndex(spark, idx, 2L, e))
    assert(!Similarity.appendToIvfBinaryIndex(
      e.filter($"vec_id" % 5 === 4), idx, 0L),
      "folded batches must keep short-circuiting after a refresh")
    val after = served()
    assert(after.map(_._1).distinct.sorted ==
      baseline.map(_._1).distinct.sorted,
      "every query still gets a full ranking")
    val rewritten = Similarity.protocol(idx).committedDirs("bwords")
      .filter(_.matches(".*/c\\d+$")).head
    val words = spark.read.option("basePath", rewritten).parquet(rewritten)
    assert(words.groupBy($"vec_id").count()
      .filter($"count" > 1).count() == 0,
      "refresh must not duplicate sign words")
    assert(words.count() == e.count())
    // sign words are FROZEN across the refresh: only cent_id moved
    val packed3 = Similarity.binarized(e)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    val afterWords = words.select($"vec_id", $"w0", $"w1")
      .as[(Long, Long, Long)].collect()
    assert(afterWords.forall { case (id, w0, w1) =>
      packed3(id) == ((w0, w1)) },
      "the refresh must re-bin, never re-encode, the sign words")
  }

  test("sim_topk_filtered: the label predicate reaches the parquet " +
    "scan as a PushedFilter, every neighbor satisfies it, and rankings " +
    "agree with a driver-side recompute over the filtered corpus") {
    val q = SparkEntry.queries("sim_topk_filtered")(spark, sf0001)
    val scans = q.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
        if f.metadata("Location").contains("embeddings") => f
    }
    assert(scans.exists(_.metadata("PushedFilters").contains("In(label")),
      s"label restriction must ride the scan: " +
        scans.map(_.metadata("PushedFilters")).mkString(" | "))
    val rows = q.select($"query_id", $"neighbor_id", $"rank")
      .as[(Long, Long, Int)].collect()
    val labels = Tables.embeddings(spark, sf0001)
      .select($"vec_id", $"label").as[(Long, Long)].collect().toMap
    assert(rows.nonEmpty)
    assert(rows.forall(r => labels(r._2) % 2 == 0),
      "every served neighbor must satisfy the predicate")
    // the filter admits fewer candidates but never short-changes k
    assert(rows.groupBy(_._1).forall(_._2.length == 5))
  }

  test("vacuumIvfIndex: surviving horizons serve identically, the " +
    "reclaimed horizon refuses, replays no-op, centroids stay frozen, " +
    "and folds/deletes keep working after the vacuum") {
    val e = Tables.embeddings(spark, sf0001)
      .select($"vec_id", $"embedding".as("v"))
    val idx = tmpDir("ivf-vacuum")
    Similarity.writeIvfIndex(e.filter($"vec_id" % 5 =!= 4), idx)
    assert(Similarity.appendToIvfIndex(
      e.filter($"vec_id" % 5 === 4), idx, 1L))
    assert(Similarity.deleteFromIvfIndex(
      e.filter($"vec_id" % 9 === 0).select($"vec_id"), idx, 2L))
    val q = e.filter($"vec_id" < 20)
      .select($"vec_id".as("query_id"), $"v".as("qv"))
    def servedAsOf(h: Long) =
      Similarity.indexTopK(spark, idx, q, asOf = Some(h))
        .as[(Long, Long, Int)].collect().toSet
    def servedNow() = Similarity.indexTopK(spark, idx, q)
      .as[(Long, Long, Int)].collect().toSet
    val pre = Map(1L -> servedAsOf(1L), 2L -> servedAsOf(2L))
    val preNow = servedNow()
    val centsBefore = spark.read.parquet(
      Similarity.protocol(idx).dir("cents")).collect().toSet
    assert(Similarity.vacuumIvfIndex(spark, idx, 1L))
    for (h <- Seq(1L, 2L))
      assert(servedAsOf(h) == pre(h), s"horizon $h moved under vacuum")
    assert(servedNow() == preNow)
    assertThrows[IllegalArgumentException](servedAsOf(0L))
    assert(spark.read.parquet(Similarity.protocol(idx).dir("cents"))
      .collect().toSet == centsBefore, "vacuum must not touch cents")
    // replay no-op; committed ids keep short-circuiting; the index
    // stays live (a post-vacuum re-ingest of the takedown victims
    // outranks the absorbed tombstone)
    assert(!Similarity.vacuumIvfIndex(spark, idx, 1L))
    assert(!Similarity.appendToIvfIndex(
      e.filter($"vec_id" % 5 === 4), idx, 1L))
    assert(Similarity.appendToIvfIndex(
      e.filter($"vec_id" % 9 === 0), idx, 3L))
    val reingested = Similarity.indexVectors(spark, idx)
      .select($"vec_id").as[Long].collect().toSet
    assert(reingested == e.select($"vec_id").as[Long].collect().toSet,
      "post-vacuum re-ingest must restore full-corpus coverage")
  }

  test("refreshIvfIndex: drift gate skips the rewrite, ledgered " +
    "refreshIds are exactly-once, folds keep short-circuiting") {
    val idx = tmpDir("ivf-refresh")
    val e = Tables.embeddings(spark, sf0001)
      .select($"vec_id", $"embedding".as("v"))
    Similarity.writeIvfIndex(e.filter($"vec_id" % 5 =!= 4), idx)
    assert(Similarity.appendToIvfIndex(
      e.filter($"vec_id" % 5 === 4), idx, 0L))
    val queries = Tables.embeddings(spark, sf0001)
      .filter($"vec_id" < 20)
      .select($"vec_id".as("query_id"), $"embedding".as("qv"))
    def served() = Similarity.indexTopK(spark, idx, queries)
      .as[(Long, Long, Int)].collect().toSeq
    val baseline = served()

    // an impossible drift bar: the gate must skip the rewrite but still
    // commit the refreshId (a restarted maintenance job is a no-op)
    assert(!Similarity.refreshIvfIndex(spark, idx, 0L, minDrift = 10.0))
    assert(served() == baseline, "a skipped refresh must not touch data")
    assert(!Similarity.refreshIvfIndex(spark, idx, 0L),
      "replayed refreshId is a committed no-op even when it skipped")

    // a real refresh: rewrites, serves a complete consistent index,
    // and neither it nor the old fold replays
    assert(Similarity.refreshIvfIndex(spark, idx, 1L))
    assert(!Similarity.refreshIvfIndex(spark, idx, 1L))
    assert(!Similarity.appendToIvfIndex(
      e.filter($"vec_id" % 5 === 4), idx, 0L),
      "folded batches must keep short-circuiting after a refresh")
    val after = served()
    assert(after.map(_._1).distinct.sorted == baseline.map(_._1).distinct.sorted,
      "every query still gets a full ranking")
    // vectors and centroids stayed consistent: each served neighbor
    // exists exactly once in the rewritten index
    val rewritten = Similarity.protocol(idx).committedDirs("vectors")
      .filter(_.matches(".*/c\\d+$")).head
    val n = spark.read.parquet(rewritten)
      .groupBy($"vec_id").count().filter($"count" > 1).count()
    assert(n == 0, "refresh must not duplicate vectors")
    assert(spark.read.parquet(rewritten).count() == e.count())
  }

  test("mergeIvfIndexes: the merged root serves IDENTICALLY to the " +
    "grow path over the same split (merge(build A, build B) == " +
    "build(A) + append(raw B)), carries merged-from provenance, and " +
    "covers the union corpus exactly once") {
    val e = Tables.embeddings(spark, sf0001)
      .select($"vec_id", $"embedding".as("v"))
    val queries = Tables.embeddings(spark, sf0001)
      .filter($"vec_id" < 20)
      .select($"vec_id".as("query_id"), $"embedding".as("qv"))
    def served(idx: String) = Similarity.indexTopK(spark, idx, queries)
      .as[(Long, Long, Int)].collect().toSet

    val merged = Similarity.ensureMergedIvfIndex(spark, sf0001)
    // the grow-path construction over the SAME split: centroids from
    // crawl A's build, crawl B folded from RAW vectors — a different
    // code path (no index-level copy, no re-read of B's root) that the
    // merge contract says must serve the same rankings
    val grown = tmpDir("ivf-merge-grow")
    Similarity.writeIvfIndex(e.filter($"vec_id" % 3 =!= 2), grown)
    assert(Similarity.appendToIvfIndex(
      e.filter($"vec_id" % 3 === 2), grown, 0L))
    assert(served(merged) == served(grown),
      "merged root must serve exactly what the grow path serves")

    // ledger provenance: the merge records where the fold came from,
    // and the fold itself is a committed, replay-safe batch
    val p = Similarity.protocol(merged)
    assert(p.foldedBatches().contains(0L))
    assert(p.entries().exists(_.startsWith("merged-from=graft_ivf_src_a")),
      s"provenance line missing from ${p.entries()}")

    // union coverage: every corpus vector exactly once
    val vecs = Similarity.indexVectors(spark, merged)
    assert(vecs.count() == e.count())
    assert(vecs.groupBy($"vec_id").count()
      .filter($"count" > 1).count() == 0,
      "merge must not duplicate vectors")
  }
}
