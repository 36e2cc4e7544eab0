package graft

import graft.functions.{TopKAgg, TopKBuffer}
import org.apache.spark.sql.functions._

/** Bounded-state top-k aggregate: ranking semantics (score desc, id
  * tie-break), partial-merge correctness across partitions, and the
  * plan shape that is its reason to exist (aggregate with map-side
  * partial merge, not a window).
  */
class TopKAggSpec extends SparkSpec {
  import spark.implicits._

  test("buffer: keeps k best, ordered, ties to smaller id, -0.0 < 0.0") {
    val b = new TopKBuffer(3)
    Seq((0.5, 10L), (0.9, 7L), (0.5, 3L), (0.1, 1L), (0.9, 8L))
      .foreach { case (s, i) => b.insert(s, i) }
    val got = (0 until b.n).map(i => (b.scores(i), b.ids(i)))
    assert(got == Seq((0.9, 7L), (0.9, 8L), (0.5, 3L)))
    val z = new TopKBuffer(2)
    z.insert(-0.0, 1L); z.insert(0.0, 2L)
    assert((z.scores(0), z.ids(0)) == (0.0, 2L)) // 0.0 ranks above -0.0
  }

  test("aggregate matches the window formulation on randomized data " +
    "across many partitions (partial merges exercised)") {
    val rnd = new scala.util.Random(42)
    val rows = Seq.tabulate(5000) { i =>
      (rnd.nextInt(20).toLong, math.rint(rnd.nextDouble() * 100) / 100, i.toLong)
    }
    val df = rows.toDF("q", "sim", "id").repartition(16)
    val viaAgg = df.groupBy($"q")
      .agg(TopKAgg.top_k($"sim", $"id", 5).as("top"))
      .select($"q", posexplode($"top").as(Seq("pos", "sc")))
      .select($"q", $"sc.id".as("id"), ($"pos" + 1).cast("int").as("rank"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"q").orderBy($"sim".desc, $"id")
    val viaWindow = df.select($"q", $"id", row_number().over(w).as("rank"))
      .filter($"rank" <= 5)
    assert(viaAgg.collect().toSet == viaWindow.collect().toSet)
  }

  test("sim_topk plans as a partial-merged aggregate — no Window, no " +
    "per-query sort of the full candidate set") {
    val p = SparkEntry.queries("sim_topk")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Window"), p.take(2000))
    assert(p.contains("ObjectHashAggregate"), p.take(2000))
    assert(p.contains("partial_top_k"), p.take(2000))
  }

  test("string-id buffer: keeps k best, ties to binary-smaller id, " +
    "matching (score DESC, id ASC)") {
    import graft.functions.TopKStrBuffer
    import org.apache.spark.unsafe.types.UTF8String
    def u(s: String) = UTF8String.fromString(s)
    val b = new TopKStrBuffer(3)
    Seq((5.0, "the"), (9.0, "of"), (5.0, "and"), (1.0, "zz"), (9.0, "to"))
      .foreach { case (s, w) => b.insert(s, u(w)) }
    val got = (0 until b.n).map(i => (b.scores(i), b.ids(i).toString))
    assert(got == Seq((9.0, "of"), (9.0, "to"), (5.0, "and")))
  }

  test("string-id aggregate matches the window formulation on " +
    "randomized words across many partitions (serde + partial merges)") {
    val rnd = new scala.util.Random(7)
    val vocab = Seq("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa", "lam", "mu")
    val rows = Seq.tabulate(5000) { _ =>
      (rnd.nextInt(4).toLong, rnd.nextInt(50).toDouble,
        vocab(rnd.nextInt(vocab.size)))
    }
    val df = rows.toDF("g", "score", "word").repartition(16)
    // de-dup (g, word) first so ranks are well-defined on ties
    val agg = df.groupBy($"g", $"word").agg(max($"score").as("s"))
    val viaAgg = agg.groupBy($"g")
      .agg(TopKAgg.top_k_str($"s", $"word", 4).as("top"))
      .select($"g", posexplode($"top").as(Seq("pos", "sc")))
      .select($"g", $"sc.id".as("word"), ($"pos" + 1).cast("int").as("rank"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"g").orderBy($"s".desc, $"word")
    val viaWindow = agg
      .select($"g", $"word", row_number().over(w).as("rank"))
      .filter($"rank" <= 4)
    assert(viaAgg.collect().toSet == viaWindow.collect().toSet)
  }

  test("vocab_coverage plans with NO window anywhere — the vocabulary " +
    "ranking rides the bounded-state top_k_str aggregate") {
    val p = SparkEntry.queries("vocab_coverage")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Window"), p.take(2000))
    assert(p.contains("partial_top_k_str"), p.take(2000))
  }

  test("nulls are skipped; k=1 degenerates to max_by") {
    val df = Seq[(Long, Option[Double], Long)](
      (1L, Some(0.3), 1L), (1L, None, 2L), (1L, Some(0.7), 3L))
      .toDF("q", "sim", "id")
    val got = df.groupBy($"q")
      .agg(TopKAgg.top_k($"sim", $"id", 1).as("top"))
      .select(explode($"top").as("sc")).select($"sc.id").as[Long].collect()
    assert(got.toSeq == Seq(3L))
  }
}
