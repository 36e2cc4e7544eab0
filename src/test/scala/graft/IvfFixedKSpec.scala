package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** The bounded-K IVF build mode (`writeIvfIndexFixedK`): the structural
  * half of the `sim_ivf_fixedk_recall` gate — the persisted centroid
  * frame is EXACTLY FixedK rows of dim-length arrays regardless of
  * corpus size (the property that caps `assign`'s map-side centroid
  * array at a broadcastable constant), and the served recall clears the
  * same usefulness floor as the default-seeded index.
  */
class IvfFixedKSpec extends SparkSpec {
  import spark.implicits._

  test("writeIvfIndexFixedK: centroid frame is FixedK rows x dim " +
    "doubles however large the input, and every corpus vector lands " +
    "in exactly one of those cells") {
    val root = ensureIdx()
    val cents = spark.read.parquet(
      Similarity.protocol(root).dir("cents"))
    assert(cents.count() == Similarity.FixedK,
      s"bounded-K build must persist exactly ${Similarity.FixedK} centroids")
    val dims = cents.select(size($"cv")).distinct().as[Int].collect()
    assert(dims.sameElements(Array(64)),
      s"every centroid must be the full 64-dim mean, got ${dims.toSeq}")
    // assignment is total and single-homed: |vectors| == |corpus|, and
    // every cent_id is one of the FixedK persisted centroids
    val corpusN = Tables.embeddings(spark, sf0001).count()
    val vecs = Similarity.indexVectors(spark, root)
    assert(vecs.count() == corpusN, "every vector assigned exactly once")
    val cellIds = cents.select($"cent_id").as[Long].collect().toSet
    val homed = vecs.select($"cent_id").distinct().as[Long].collect()
    assert(homed.forall(cellIds), "assignments reference only built cells")
  }

  test("sim_ivf_fixedk_recall: hash-seeded bounded-K index clears the " +
    "recall floor and never exceeds the exact top-k size") {
    val rows = SparkEntry.queries("sim_ivf_fixedk_recall")(spark, sf0001)
      .select($"query_id", $"n_common").as[(Long, Long)].collect()
    assert(rows.length == 20, "one recall row per gate query")
    assert(rows.forall(r => r._2 >= 0 && r._2 <= 5),
      "per-query overlap is bounded by k")
    // fixed K=32 with nprobe=4 probes 1/8 of the corpus (vs ~1/5 for
    // the N/25-seeded sim_ivf, floored at 50): 40% is the usefulness
    // bar that scales with the coverage ratio; the value-level gate is
    // the oracle hash match, not this floor
    val total = rows.map(_._2).sum
    assert(total >= 40,
      s"aggregate recall@5 must clear 40% on the gate corpus, got $total/100")
  }

  private def ensureIdx(): String =
    Similarity.ensureFixedKIvfIndex(spark, sf0001)

  test("bounded-K index composes with the fold/delete lifecycle: " +
    "appends assign to the FROZEN FixedK centroids, deletes tombstone, " +
    "replays short-circuit — centroid frame never grows") {
    val idx = tmpDir("ivf-fixedk-life")
    val e = Tables.embeddings(spark, sf0001)
      .select($"vec_id", $"embedding".as("v"))
    val history = e.filter($"vec_id" % 5 =!= 4)
    val wave = e.filter($"vec_id" % 5 === 4)
    Similarity.writeIvfIndexFixedK(history, idx)
    val centsBefore = spark.read.parquet(
        Similarity.protocol(idx).dir("cents"))
      .orderBy($"cent_id").collect().map(_.toString).toSeq

    assert(Similarity.appendToIvfIndex(wave, idx, 1L))
    assert(Similarity.indexVectors(spark, idx).count() == e.count(),
      "fold must add exactly the wave")
    // frozen-centroid contract: the fold reuses the FixedK cells
    val centsAfter = spark.read.parquet(
        Similarity.protocol(idx).dir("cents"))
      .orderBy($"cent_id").collect().map(_.toString).toSeq
    assert(centsAfter == centsBefore,
      "append must not touch the bounded centroid frame")
    assert(!Similarity.appendToIvfIndex(wave, idx, 1L),
      "replayed fold is a committed no-op")

    Similarity.deleteFromIvfIndex(
      e.filter($"vec_id" % 10 === 0).select($"vec_id"), idx, 1L)
    val served = Similarity.indexVectors(spark, idx)
      .select($"vec_id").as[Long].collect().toSet
    assert(served == e.select($"vec_id").as[Long].collect().toSet
      .filterNot(_ % 10 == 0),
      "tombstoned ids must stop serving; everything else must remain")
  }
}
