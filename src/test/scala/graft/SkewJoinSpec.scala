package graft

import org.apache.spark.sql.functions._

/** AQE skew handling: a join whose left side is pathologically skewed
  * (one hot key holding most rows) gets its oversized partitions SPLIT
  * at runtime by OptimizeSkewedJoin — the engine-level answer to skew
  * that complements the query-level salting in q_skew_agg. At 100 TB a
  * hot user/key otherwise pins one executor while 999 idle.
  */
class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("AQE splits skewed sort-merge-join partitions at runtime") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16k")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16k")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      // 50k rows on ONE key + a sprinkle of others vs a small dim table
      val left = spark.range(50000).select(lit(7L).as("k"), $"id".as("payload"))
        .union(spark.range(100).select(($"id" % 10).as("k"), $"id".as("payload")))
      val right = spark.range(10).select($"id".as("k"), ($"id" * 2).as("v"))
      val joined = left.join(right, "k")
      // execute THIS DataFrame so its AdaptiveSparkPlan reaches the final
      // (re-optimized) state before inspecting it
      assert(joined.collect().length == 50100) // every left key matches
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), plan.take(2000))
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("docShingles df-cap is skew-safe: a hot stop-shingle is culled by " +
    "partial-agg + broadcast anti-join, never co-located in one task") {
    import graft.operators.Dedup
    // One synthetic hot 3-gram present in EVERY doc (df ≫ cap) plus a
    // unique tail per doc. The hot shingle must be dropped, the unique
    // ones kept.
    val docs = spark.range(200).select(
      $"id".as("doc_id"),
      concat(lit("the quick fox "),
        lit("tail "), $"id", lit(" word "), $"id", lit(" more")).as("text"))
    val sh = Dedup.docShingles(docs, maxDf = 50)
    val shingles = sh.select("sh").distinct().as[String].collect()
    assert(!shingles.contains("the quick fox"), "hot shingle survived the cap")
    assert(sh.count() > 0)
    // Plan shape: the df computation must be a partially-aggregated
    // groupBy (map-side combine collapses the hot key) feeding a
    // broadcast anti-join — NOT a window, which would funnel the hot
    // key's full row set into a single task before filtering.
    val plan = sh.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan.take(2000))
    assert(plan.contains("partial_count"), plan.take(2000))
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      plan.take(2000))
  }
}
