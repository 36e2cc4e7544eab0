package graft

import org.apache.spark.sql.functions._

class ExtendedSpec extends SparkSpec {
  import spark.implicits._

  test("q_asof_join: every matched error precedes (or equals) its click, " +
    "and is the latest such error for that user") {
    val out = SparkEntry.queries("q_asof_join")(spark, sf0001)
      .select($"event_id", $"user_id", $"click_ts", $"err_value")
      .as[(Long, Long, String, Double)].collect()
    assert(out.nonEmpty)
    val ev = Tables.events(spark, sf0001)
      .select($"event_id", $"user_id",
        date_format($"ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts"),
        $"event_type", $"value")
      .as[(Long, Long, String, String, Double)].collect()
    val errorsByUser = ev.filter(_._4 == "error").groupBy(_._2)
    out.take(50).foreach { case (_, user, clickTs, errValue) =>
      val prior = errorsByUser(user).filter(_._3 <= clickTs)
      assert(prior.nonEmpty)
      // latest prior error timestamp; max event_id breaks same-ts ties
      val best = prior.maxBy(e => (e._3, e._1))
      assert(best._5 == errValue,
        s"user=$user clickTs=$clickTs expected=${best._5} got=$errValue")
    }
  }

  test("q_anomaly: every flagged value clears its type's threshold, " +
    "no unflagged value does, and thresholds match rounded moments") {
    val out = SparkEntry.queries("q_anomaly")(spark, sf0001)
      .select($"event_id", $"event_type", $"value", $"threshold")
      .as[(Long, String, Double, Double)].collect()
    assert(out.nonEmpty)
    val ev = Tables.events(spark, sf0001)
      .select($"event_id", $"event_type", $"value")
      .as[(Long, String, Double)].collect()
    def r4(x: Double) = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val thr = ev.groupBy(_._2).map { case (t, es) =>
      val xs = es.map(_._3); val n = xs.length
      val mu = xs.sum / n
      val sd = math.sqrt(xs.map(x => (x - mu) * (x - mu)).sum / (n - 1))
      t -> (r4(mu) + 3 * r4(sd))
    }
    val flagged = out.map(_._1).toSet
    ev.foreach { case (id, t, v) =>
      assert((v > thr(t)) == flagged.contains(id), s"event $id")
    }
    out.foreach { case (_, t, v, th) =>
      assert(math.abs(th - r4(thr(t))) < 1e-9 && v > th)
    }
  }

  test("q_cdc_delta: null-slot discipline per change_type, and a " +
    "brute-force per-user recompute agrees exactly") {
    val out = SparkEntry.queries("q_cdc_delta")(spark, sf0001)
      .select($"user_id", $"change_type", $"old_type", $"new_type",
        $"old_value", $"new_value")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), Option(r.getString(2)),
        Option(r.getString(3)),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)),
        if (r.isNullAt(5)) None else Some(r.getDouble(5))))
    assert(out.nonEmpty)
    out.foreach {
      case (_, "added", ot, _, ov, nv) =>
        assert(ot.isEmpty && ov.isEmpty && nv.nonEmpty)
      case (_, "removed", ot, nt, _, nv) =>
        assert(nt.isEmpty && nv.isEmpty && ot.nonEmpty)
      case (u, "changed", ot, nt, ov, nv) =>
        assert(ot.nonEmpty && nt.nonEmpty)
        assert(ot != nt || ov != nv, s"user $u reported unchanged state")
      case (u, ct, _, _, _, _) => fail(s"user $u unknown change_type $ct")
    }
    // independent recompute: brute-force latest-state per user per window
    val ev = Tables.events(spark, sf0001)
      .select($"user_id", $"ts".cast("string"), $"event_id", $"event_type",
        $"value")
      .as[(Long, String, Long, String, Double)].collect()
    def state(lo: String, hi: String) = ev
      .filter(e => e._2 > lo && e._2 <= hi)
      .groupBy(_._1)
      .map { case (u, es) =>
        val last = es.maxBy(e => (e._2, e._3)); u -> (last._4, last._5) }
    val olds = state("2024-01-01 00:00:00", "2024-01-01 12:00:00")
    val news = state("2024-01-01 12:00:00", "2024-01-02 00:00:00")
    val expect = (olds.keySet ++ news.keySet).flatMap { u =>
      (olds.get(u), news.get(u)) match {
        case (Some(o), None) => Some((u, "removed", Some(o._1), None,
          Some(o._2), None))
        case (None, Some(n)) => Some((u, "added", None, Some(n._1),
          None, Some(n._2)))
        case (Some(o), Some(n)) if o != n =>
          Some((u, "changed", Some(o._1), Some(n._1), Some(o._2), Some(n._2)))
        case _ => None
      }
    }
    assert(out.toSet == expect)
  }

  test("q_range_frame: every row is its own frame peer, and a brute-force " +
    "recount of one user's trailing window matches") {
    val out = SparkEntry.queries("q_range_frame")(spark, sf0001)
      .select($"event_id", $"user_id", $"v10m", $"n10m")
      .as[(Long, Long, Double, Long)].collect()
    assert(out.nonEmpty && out.forall(_._4 >= 1))
    val ev = Tables.events(spark, sf0001)
      .select($"event_id", $"user_id", unix_millis($"ts").as("ms"),
        $"value".cast("decimal(12,2)").cast("double"))
      .as[(Long, Long, Long, Double)].collect()
    val user = ev.head._2
    val mine = ev.filter(_._2 == user)
    out.filter(_._2 == user).foreach { case (id, _, v10m, n10m) =>
      val ms = mine.find(_._1 == id).get._3
      val frame = mine.filter(e => e._3 >= ms - 600000 && e._3 <= ms)
      assert(frame.length == n10m, s"event $id")
      assert(math.abs(frame.map(_._4).sum - v10m) < 1e-6, s"event $id")
    }
  }

  test("q_skew_agg: salted two-stage equals plain groupBy exactly") {
    val salted = SparkEntry.queries("q_skew_agg")(spark, sf0001)
      .as[(String, Long, Double)].collect().toMap2
    val plain = Tables.events(spark, sf0001)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        sum($"value".cast("decimal(12,2)")).cast("double").as("t"))
      .as[(String, Long, Double)].collect().toMap2
    assert(salted == plain)
  }

  test("q_approx: every group's sketch verdicts certify as 1 and the " +
    "exact counts line up with the oracled companion q_approx_exact") {
    val approx = SparkEntry.queries("q_approx")(spark, sf0001)
      .select($"l_returnflag", $"n", $"parts_within_eps", $"median_within_eps")
      .as[(String, Long, Long, Long)].collect()
    val exact = SparkEntry.queries("q_approx_exact")(spark, sf0001)
      .select($"l_returnflag", $"n")
      .as[(String, Long)].collect().toMap
    assert(approx.nonEmpty && approx.length == exact.size)
    approx.foreach { case (flag, n, partsOk, medianOk) =>
      assert(n == exact(flag))
      // the in-query ε-gate (3σ HLL envelope; median rank within ±1%)
      // is what the driver hash-compares against literal 1 — assert it
      // end-to-end here too so a sketch regression fails fast locally
      assert(partsOk == 1L, s"$flag: HLL count outside 3σ envelope")
      assert(medianOk == 1L, s"$flag: approx median rank outside ±1%")
    }
  }

  test("q_pivot row sums equal event counts per bucket") {
    val p = SparkEntry.queries("q_pivot")(spark, sf0001)
      .withColumn("pivot_total", $"click" + $"error" + $"purchase")
      .select($"user_bucket", $"pivot_total")
      .as[(Long, Long)].collect().toMap
    val totals = Tables.events(spark, sf0001)
      .filter($"event_type".isin("click", "error", "purchase"))
      .groupBy(($"user_id" % 10).as("b")).count()
      .as[(Long, Long)].collect().toMap
    assert(p == totals)
  }

  test("q_incr_agg: merged history+delta state equals the one-shot " +
    "recompute EXACTLY (decimal-sum associativity), including avg") {
    val merged = SparkEntry.queries("q_incr_agg")(spark, sf0001)
      .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    val direct = Tables.events(spark, sf0001)
      .groupBy($"event_type").agg(
        count(lit(1)).as("n"),
        sum($"value".cast("decimal(12,2)")).cast("double").as("total_value"),
        min($"value").as("mn"), max($"value").as("mx"))
      .withColumn("avg_value", ($"total_value" / $"n").cast("double"))
      .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    assert(merged == direct)
  }

  test("q_incr_join: the delta-rule maintained view equals the one-shot " +
    "join recompute EXACTLY, and the increments are genuine (every " +
    "delta term contributes rows)") {
    val maintained = SparkEntry.queries("q_incr_join")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    val orders = Tables.load(spark, sf0001, "orders")
    val direct = orders
      .join(Tables.load(spark, sf0001, "customer"),
        $"o_custkey" === $"c_custkey")
      .groupBy($"o_custkey")
      .agg(count(lit(1)).as("n"),
        sum($"o_totalprice".cast("decimal(12,2)")).cast("double").as("tv"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(maintained == direct)
    // the fixture exercises all three delta terms: orders and customers
    // both have non-empty increments
    assert(orders.filter($"o_orderkey" % 11 === 5).count() > 0)
    assert(Tables.load(spark, sf0001, "customer")
      .filter($"c_custkey" % 13 === 6).count() > 0)
  }

  test("q_upsert: keys unique after the merge, updates overwrite in " +
    "place, inserts extend the key space, untouched rows survive intact") {
    val base = Tables.load(spark, sf0001, "orders")
    val nBase = base.count()
    val nIns = base.filter($"o_orderkey" % 31 === 0).count()
    val r = SparkEntry.queries("q_upsert")(spark, sf0001)
    assert(r.count() == nBase + nIns) // updates replace, inserts add
    assert(r.select($"o_orderkey").distinct().count() == nBase + nIns)
    // every key ≡ 3 (mod 7) carries the update image
    assert(r.filter($"o_orderkey" % 7 === 3 && $"o_orderkey" < 10000000L &&
      $"o_orderstatus" =!= "X").count() == 0)
    // inserts all land past the base id space with status N
    assert(r.filter($"o_orderkey" >= 10000000L && $"o_orderstatus" =!= "N")
      .count() == 0)
  }

  private implicit class Tupled3[A, B, C](rows: Array[(A, B, C)]) {
    def toMap2: Map[A, (B, C)] = rows.map(r => r._1 -> (r._2, r._3)).toMap
  }
}
