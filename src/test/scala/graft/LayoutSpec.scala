package graft

import graft.operators.Layout
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {

  test("bucketed tables join without any exchange (co-located join)") {
    val o = Tables.orders(spark, sf0001)
    val l = Tables.lineitem(spark, sf0001)
    Layout.writeBucketed(o, "orders_b", 4, Seq("o_orderkey"))
    Layout.writeBucketed(
      l.withColumnRenamed("l_orderkey", "o_orderkey"), "lineitem_b", 4,
      Seq("o_orderkey"))
    // at test scale the planner prefers broadcasting the small side
    // (also shuffle-free); disable it to surface the bucketed SMJ path a
    // large-×-large join would take
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("orders_b")
        .join(spark.table("lineitem_b"), Seq("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
      assert(plan.contains("SortMergeJoin"))
      // and the result is still correct
      val n = joined.count()
      val expected = l.join(o, l("l_orderkey") === o("o_orderkey")).count()
      assert(n == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("bucketed groupBy on the bucket key needs no exchange") {
    Layout.writeBucketed(Tables.orders(spark, sf0001), "orders_b2", 4,
      Seq("o_custkey"))
    try {
      val agg = spark.table("orders_b2").groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed agg must not shuffle:\n$plan")
      assert(agg.count() > 0)
    } finally spark.sql("DROP TABLE IF EXISTS orders_b2")
  }
}
