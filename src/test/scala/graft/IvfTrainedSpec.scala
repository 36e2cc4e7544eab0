package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Multi-round Lloyd training (`writeTrainedIvfIndex`) vs the
  * one-step build on a corpus engineered to punish bad seeding: all
  * every-25th seed ids are planted in ONE cluster, so the one-step
  * means are blends of that cluster plus whatever distant clusters
  * happened to hash onto each seed — while iterated rounds let cells
  * escape toward the true centers (the classic k-means recovery).
  * Recall at EQUAL nprobe must never lose and strictly win here.
  */
class IvfTrainedSpec extends SparkSpec {
  import spark.implicits._

  private val Dim = 64
  private val NClusters = 8

  // deterministic planted corpus: 8 near-orthogonal unit centers
  // (64-dim gaussians), members = center + small per-id jitter; ids
  // divisible by 25 (the default seed sample) all land in cluster 0
  private lazy val centers: Array[Array[Double]] = {
    val rnd = new scala.util.Random(7)
    Array.fill(NClusters) {
      val v = Array.fill(Dim)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
  }

  private def clusterOf(id: Long): Int =
    if (id % 25 == 0) 0 else (1 + (id * 2654435761L) % 7).toInt

  private def vecOf(id: Long): Seq[Float] = {
    val r = new scala.util.Random(id)
    centers(clusterOf(id)).map(x => (x + 0.05 * r.nextGaussian()).toFloat)
      .toSeq
  }

  test("trained IVF at equal nprobe never loses to the one-step build " +
    "and strictly wins on the planted-cluster corpus") {
    val n = 800L
    val ids = (0L until n).toSeq
    val vecs = ids.map(i => (i, vecOf(i))).toDF("vec_id", "v")
      .repartition(8).cache()
    val oneStep = tmpDir("ivf-train-one")
    val trained = tmpDir("ivf-train-multi")
    Similarity.writeIvfIndex(vecs, oneStep)
    Similarity.writeTrainedIvfIndex(vecs, trained)

    // exact top-5 per query on the engine's own grid (4-dp-rounded
    // cosine, neighbor-id tie-break), computed driver-side — the
    // corpus is a fixture, not a scale test
    val all = ids.map(i => i -> vecOf(i).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dp = 0.0; var na = 0.0; var nb = 0.0; var k = 0
      while (k < Dim) { dp += a(k) * b(k); na += a(k) * a(k)
        nb += b(k) * b(k); k += 1 }
      math.round(dp / math.sqrt(na * nb) * 1e4) / 1e4
    }
    val queryIds = ids.filter(i => i % 25 != 0).take(40)
    val exact = queryIds.map { q =>
      q -> ids.filter(_ != q)
        .map(i => (i, cos(all(q), all(i))))
        .sortBy { case (i, s) => (-s, i) }.take(5).map(_._1).toSet
    }.toMap
    val queries = queryIds.map(q => (q, vecOf(q))).toDF("query_id", "qv")

    def recall(root: String): Int =
      Similarity.indexTopK(spark, root, queries, nprobe = 1)
        .select($"query_id", $"neighbor_id").as[(Long, Long)]
        .collect()
        .count { case (q, nb) => exact(q).contains(nb) }

    val rOne = recall(oneStep)
    val rTrained = recall(trained)
    assert(rTrained >= rOne,
      s"trained recall $rTrained lost to one-step $rOne at equal nprobe")
    assert(rTrained > rOne,
      s"planted corpus must show a strict win: $rTrained vs $rOne " +
        s"of ${queryIds.length * 5}")
    // ... and training recovers most of the planted structure
    assert(rTrained >= (queryIds.length * 5 * 7) / 10,
      s"trained recall $rTrained below 70% on the planted corpus")
  }

  test("the trained root speaks the full index lifecycle: appends " +
    "assign to the FROZEN trained centroids, deletes tombstone, " +
    "replays short-circuit") {
    val ids = (0L until 400L).toSeq
    val vecs = ids.map(i => (i, vecOf(i))).toDF("vec_id", "v")
    val root = tmpDir("ivf-train-life")
    Similarity.writeTrainedIvfIndex(vecs, root)
    val centsBefore = spark.read.parquet(
      Similarity.protocol(root).dir("cents")).collect().toSet
    // fold a new wave (shifted ids) — exactly-once under replay
    val wave = (400L until 440L).map(i => (i, vecOf(i - 400L)))
      .toDF("vec_id", "v")
    assert(Similarity.appendToIvfIndex(wave, root, 1L))
    assert(!Similarity.appendToIvfIndex(wave, root, 1L),
      "a committed fold must no-op on replay")
    // the appended twins of the query vectors are now their nearest
    // neighbors (cosine 1 at rank 1)
    val queries = ids.take(5).map(q => (q, vecOf(q)))
      .toDF("query_id", "qv")
    val served = Similarity.indexTopK(spark, root, queries, nprobe = 2)
      .filter($"rank" === 1)
      .select($"query_id", $"neighbor_id").as[(Long, Long)]
      .collect().toMap
    assert(ids.take(5).forall(q => served(q) == q + 400L),
      s"each query's folded twin must serve at rank 1: $served")
    // centroids stayed FROZEN through the fold
    val centsAfter = spark.read.parquet(
      Similarity.protocol(root).dir("cents")).collect().toSet
    assert(centsAfter == centsBefore, "folds must not move trained cents")
    // takedown hides the twins again
    assert(Similarity.deleteFromIvfIndex(
      wave.select($"vec_id"), root, 2L))
    val after = Similarity.indexTopK(spark, root, queries, nprobe = 2)
      .select($"neighbor_id").as[Long].collect().toSet
    assert(after.forall(_ < 400L), "tombstoned vectors must not serve")
  }
}
