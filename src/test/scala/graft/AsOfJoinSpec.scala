package graft

import graft.plans.AsOfJoin
import org.apache.spark.sql.functions._

/** Semantics + plan shape of the native as-of join (custom logical node
  * → strategy → AsOfJoinExec merge).
  */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = to_timestamp(lit(s))

  private lazy val quotes = Seq(
    // key, time, px
    ("A", "2026-01-01 09:00:00", 1.0),
    ("A", "2026-01-01 09:05:00", 2.0),
    ("A", "2026-01-01 09:10:00", 3.0),
    ("B", "2026-01-01 09:07:00", 9.0))
    .toDF("sym", "t", "px")
    .select($"sym", to_timestamp($"t").as("qt"), $"px")

  private lazy val trades = Seq(
    ("A", "2026-01-01 08:59:00", 1L), // before any quote → dropped
    ("A", "2026-01-01 09:05:00", 2L), // equal ts → inclusive match (2.0)
    ("A", "2026-01-01 09:06:00", 3L), // between → latest before (2.0)
    ("A", "2026-01-01 09:30:00", 4L), // after all → last (3.0)
    ("B", "2026-01-01 09:08:00", 5L), // other key → 9.0, never A's quotes
    ("C", "2026-01-01 09:08:00", 6L)) // key with no quotes → dropped
    .toDF("sym", "t", "id")
    .select($"sym", to_timestamp($"t").as("tt"), $"id")

  test("as-of picks the latest right row at or before each left row, " +
    "per key, inclusive, inner") {
    val out = AsOfJoin.asof(trades, quotes, Seq("sym"), "tt", "qt")
      .select($"id", $"px").as[(Long, Double)].collect().toMap
    assert(out == Map(2L -> 2.0, 3L -> 2.0, 4L -> 3.0, 5L -> 9.0))
  }

  test("plan: AsOfJoinExec node, no union, no window, one exchange per " +
    "side — the merge IS the operator, not a composition") {
    val df = AsOfJoin.asof(trades, quotes, Seq("sym"), "tt", "qt")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin"), p)
    assert(!p.contains("Window") && !p.contains("Union"), p)
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 2, p)
    // and the declared output ordering lets a downstream per-key window
    // reuse the exchange: no THIRD exchange appears
    val proj = df.select(trades("sym").as("s"), trades("tt").as("t"), $"px")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"s").orderBy($"t")
    val downstream = proj.withColumn("rn", row_number().over(w))
    val p2 = downstream.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(p2).size == 2, p2)
  }

  test("SQL surface: the asof_join TVF reaches the native operator — " +
    "same rows as the Scala API, AsOfJoinExec in the plan, right keys " +
    "deduplicated from the output") {
    AsOfJoin.ensureSqlRegistered(spark)
    trades.createOrReplaceTempView("tvf_trades")
    quotes.createOrReplaceTempView("tvf_quotes")
    val df = spark.sql(
      "SELECT id, px FROM asof_join('tvf_trades', 'tvf_quotes', 'sym', 'tt', 'qt')")
    assert(df.queryExecution.executedPlan.toString.contains("AsOfJoin"))
    val out = df.as[(Long, Double)].collect().toMap
    assert(out == Map(2L -> 2.0, 3L -> 2.0, 4L -> 3.0, 5L -> 9.0))
    // output columns: all left, right minus the key (no ambiguous 'sym')
    val cols = spark.sql(
      "SELECT * FROM asof_join('tvf_trades', 'tvf_quotes', 'sym', 'tt', 'qt')")
      .columns.toSeq
    assert(cols == Seq("sym", "tt", "id", "qt", "px"), cols.mkString(","))
    // a bad table name fails the QUERY with a resolution error, not a job
    val err = intercept[Exception] {
      spark.sql("SELECT * FROM asof_join('no_such_view', 'tvf_quotes', " +
        "'sym', 'tt', 'qt')").collect()
    }
    assert(err.getMessage.toLowerCase.contains("no_such_view"), err.getMessage)
  }

  test("self-join inputs (both sides from one scan) resolve — the " +
    "right-side re-alias keeps attribute ids disjoint") {
    val ev = Tables.events(spark, sf0001)
    val clicks = ev.filter($"event_type" === "click")
      .select($"event_id", $"user_id", $"ts")
    val errors = ev.filter($"event_type" === "error")
      .select($"user_id", $"ts".as("err_ts"), $"value")
    val out = AsOfJoin.asof(clicks, errors, Seq("user_id"), "ts", "err_ts")
    assert(out.count() > 0)
    assert(out.columns.count(_ == "user_id") == 2) // both sides kept
  }

  test("q_asof_native equals the composed q_asof_join row-for-row") {
    val a = SparkEntry.queries("q_asof_join")(spark, sf0001)
    val b = SparkEntry.queries("q_asof_native")(spark, sf0001)
    assert(a.count() == b.count())
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }

  test("empty sides: no right rows → empty inner result; no left rows → " +
    "empty; merge never NPEs on empty partitions") {
    val noQuotes = quotes.filter($"px" < 0)
    assert(AsOfJoin.asof(trades, noQuotes, Seq("sym"), "tt", "qt").count() == 0)
    val noTrades = trades.filter($"id" < 0)
    assert(AsOfJoin.asof(noTrades, quotes, Seq("sym"), "tt", "qt").count() == 0)
  }

  test("property: merge agrees with the composed window formulation on " +
    "randomized key/time data (including key runs, ties, and gaps)") {
    val rnd = new scala.util.Random(20260812L)
    (1 to 5).foreach { trial =>
      // small key/time domains force collisions, runs, and empty keys
      val lRows = Seq.fill(200)((rnd.nextInt(8), rnd.nextInt(50), rnd.nextInt()))
      val rRaw = Seq.fill(60)((rnd.nextInt(10), rnd.nextInt(50), rnd.nextDouble()))
      // right side unique per (key, time) — the documented contract
      val rRows = rRaw.groupBy(t => (t._1, t._2)).map(_._2.head).toSeq
      val l = lRows.toDF("k", "t", "id")
        .select($"k", timestamp_seconds($"t").as("lt"), $"id")
      val r = rRows.toDF("k", "t", "pay")
        .select($"k", timestamp_seconds($"t").as("rt"), $"pay")
      val native = AsOfJoin.asof(l, r, Seq("k"), "lt", "rt")
        .select($"id", $"pay").as[(Int, Double)].collect().sorted.toSeq
      // reference: composed union + running last(ignoreNulls) window
      val u = r.select($"k", $"rt".as("ts"), lit(0).as("src"),
          lit(null).cast("int").as("id"), $"pay")
        .unionByName(l.select($"k", $"lt".as("ts"), lit(1).as("src"),
          $"id", lit(null).cast("double").as("pay")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"k").orderBy($"ts", $"src")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      val composed = u
        .withColumn("lastPay", last($"pay", ignoreNulls = true).over(w))
        .filter($"src" === 1 && $"lastPay".isNotNull)
        .select($"id", $"lastPay").as[(Int, Double)].collect().sorted.toSeq
      assert(native == composed, s"trial $trial diverged")
    }
  }

  test("unknown column name fails fast with a descriptive error") {
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asof(trades, quotes, Seq("nope"), "tt", "qt")
    }
    assert(e.getMessage.contains("nope"))
  }

  test("mismatched key types fail fast instead of comparing garbage " +
    "in the merge") {
    val rInt = quotes.withColumn("sym", hash($"sym")) // string → int key
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asof(trades, rInt, Seq("sym"), "tt", "qt")
    }
    assert(e.getMessage.contains("cast one side first"), e.getMessage)
  }
}
