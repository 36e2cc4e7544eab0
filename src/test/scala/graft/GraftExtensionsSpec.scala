package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, explode}

class GraftExtensionsSpec extends SparkSpec {

  test("extensions expose cosine_sim and simhash_agg to SQL") {
    // getOrCreate would hand back the suite-shared session (built without
    // extensions), so detach it first and build a fresh session over the
    // same SparkContext with the extensions installed.
    val shared = spark // force lazy init before detaching
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val cos = s.sql(
        "SELECT cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c")
        .collect().head.getDouble(0)
      assert(math.abs(cos - 1.0) < 1e-12)
      val sig = s.sql(
        """SELECT simhash_agg(tok) AS sig FROM VALUES ('a'), ('b'), ('c') t(tok)""")
        .collect().head.getLong(0)
      // deterministic: recompute from the reference token hash
      val votes = new Array[Int](64)
      Seq("a", "b", "c").foreach { t =>
        val h = graft.functions.SimHashAgg.tokenHash(t)
        (0 until 64).foreach(i =>
          votes(i) += (if (((h >>> i) & 1L) == 1L) 1 else -1))
      }
      val expected = (0 until 64).foldLeft(0L)((acc, i) =>
        if (votes(i) > 0) acc | (1L << i) else acc)
      assert(sig == expected)
      // winnow_fingerprints: SQL form matches the Column API, and the
      // k/w arguments must be integer literals
      val viaSql = s.sql(
        "SELECT winnow_fingerprints('the quick brown fox jumps', 4, 2) AS f")
        .collect().head.getSeq[Long](0)
      import org.apache.spark.sql.functions.{col, lit}
      val viaApi = s.range(1).select(
        graft.functions.RollingHashMinima.winnow_fingerprints(
          lit("the quick brown fox jumps"), k = 4, w = 2).as("f"))
        .collect().head.getSeq[Long](0)
      assert(viaSql == viaApi && viaSql.nonEmpty)
      intercept[Exception](
        s.sql("SELECT winnow_fingerprints('x', id, 2) FROM range(1)").collect())
      intercept[Exception](
        s.sql("SELECT winnow_fingerprints('x', CAST(NULL AS INT), 2)").collect())
      intercept[Exception](
        s.sql("SELECT winnow_fingerprints('x', -1, 4)").collect())
      // BIGINT literal above Int.MaxValue: the descriptive argument error,
      // not a raw NumberFormatException (ADVICE r2)
      val big = intercept[Exception](
        s.sql("SELECT winnow_fingerprints('x', 5000000000, 16)").collect())
      def rootMessages(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(e =>
          Option(e.getMessage).toSeq ++ rootMessages(e.getCause))
      assert(rootMessages(big).exists(_.contains("out of Int range")),
        s"got: ${rootMessages(big).mkString(" | ")}")
      // dot_product: double-accumulated, zero vector gives 0.0 (not NaN)
      val dot = s.sql(
        "SELECT dot_product(array(CAST(1.5 AS FLOAT), CAST(-2.0 AS FLOAT)), " +
          "array(1.0d, 1.0d)) AS d").collect().head.getDouble(0)
      assert(dot == -0.5)
      val zdot = s.sql(
        "SELECT dot_product(array(0.0d, 0.0d), array(1.0d, -1.0d)) >= 0 AS b")
        .collect().head.getBoolean(0)
      assert(zdot)
      // non-string simhash input implicitly casts instead of ClassCast-ing
      val castSig = s.sql(
        "SELECT simhash_agg(id) AS sig FROM range(3)").collect().head.getLong(0)
      val strSig = s.sql(
        "SELECT simhash_agg(CAST(id AS STRING)) AS sig FROM range(3)")
        .collect().head.getLong(0)
      assert(castSig == strSig)
      // the injected PLANNER STRATEGY: an AsOfJoinPlan planted on this
      // extensions-built session must plan to AsOfJoinExec WITHOUT the
      // runtime ensureRegistered fallback ever running
      assert(!s.experimental.extraStrategies
        .contains(graft.plans.AsOfJoin.AsOfJoinStrategy))
      import s.implicits._
      val l = Seq((1, 10, "x")).toDF("k", "t", "v")
      val r = Seq((1, 5, 2.0)).toDF("k", "t2", "p")
      val node = graft.plans.AsOfJoin.AsOfJoinPlan(
        org.apache.spark.sql.graft.Bridge.analyzed(l),
        org.apache.spark.sql.graft.Bridge.analyzed(r),
        Seq(org.apache.spark.sql.graft.Bridge.analyzed(l).output.head),
        Seq(org.apache.spark.sql.graft.Bridge.analyzed(r).output.head),
        org.apache.spark.sql.graft.Bridge.analyzed(l).output(1),
        org.apache.spark.sql.graft.Bridge.analyzed(r).output(1))
      val df = org.apache.spark.sql.graft.Bridge.ofRows(s, node)
      assert(df.queryExecution.executedPlan.toString.contains("AsOfJoin"))
      assert(df.count() == 1)
      // top_k: SQL-callable bounded top-k aggregate; k must be a literal
      val tk = s.sql(
        """SELECT q, top_k(sim, id, 2) AS t FROM VALUES
          |  (1, 0.5d, 10L), (1, 0.9d, 7L), (1, 0.7d, 3L) v(q, sim, id)
          |GROUP BY q""".stripMargin).select(explode(col("t.id")))
        .collect().map(_.getLong(0)).toSeq
      assert(tk == Seq(7L, 3L), tk.mkString(","))
      intercept[Exception](
        s.sql("SELECT top_k(sim, id, id) FROM VALUES (0.5d, 1L) v(sim, id)")
          .collect())
      // polymorphic id type: string ids dispatch to the string-buffer
      // variant (ties by binary string order, matching ORDER BY n DESC, w)
      val tks = s.sql(
        """SELECT top_k(n, w, 2) AS t FROM VALUES
          |  (5.0d, 'the'), (9.0d, 'of'), (9.0d, 'to') v(n, w)""".stripMargin)
        .select(explode(col("t.id"))).collect().map(_.getString(0)).toSeq
      assert(tks == Seq("of", "to"), tks.mkString(","))
      // the injected TABLE FUNCTION: asof_join reachable from pure SQL on
      // the extensions-built session (no runtime registration call)
      l.createOrReplaceTempView("ext_l")
      r.createOrReplaceTempView("ext_r")
      val tvf = s.sql(
        "SELECT v, p FROM asof_join('ext_l', 'ext_r', 'k', 't', 't2')")
      assert(tvf.queryExecution.executedPlan.toString.contains("AsOfJoin"))
      assert(tvf.collect().map(x => (x.getString(0), x.getDouble(1))).toSeq
        == Seq(("x", 2.0)))
      // misra_gries: SQL-callable heavy-hitter candidates; c literal-only
      val mg = s.sql(
        """SELECT misra_gries(k, 2) AS c FROM VALUES
          |  ('a'), ('a'), ('a'), ('b'), ('b'), ('z') v(k)""".stripMargin)
        .select(explode(col("c"))).collect().map(_.getString(0)).toSet
      assert(mg.contains("a") && mg.size <= 2, mg.mkString(","))
      intercept[Exception](
        s.sql("SELECT misra_gries(k, id) FROM VALUES ('a', 1L) v(k, id)")
          .collect())
      // hll_registers: SQL-callable register file; p literal-only.
      // hash 1L: register 0, m = 1 -> rho = 54 at p = 10
      val hll = s.sql(
        "SELECT hll_registers(h, 10) AS r FROM VALUES (1L) v(h)")
        .select(explode(col("r")))
        .collect().map(r => (r.getStruct(0).getInt(0),
          r.getStruct(0).getInt(1))).toSeq
      assert(hll == Seq((0, 54)), hll.mkString(","))
      intercept[Exception](
        s.sql("SELECT hll_registers(h, h) FROM VALUES (1L) v(h)").collect())
    } finally {
      // restore the suite-shared session (same SparkContext; don't stop)
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }
}
