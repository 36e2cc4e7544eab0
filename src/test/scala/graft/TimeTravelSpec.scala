package graft

import graft.operators.TimeTravel
import org.apache.spark.sql.functions._

/** Table-level time travel: horizon-exact replay against an
  * independent recompute, keyed-upsert resolution, delete scoping, and
  * the ledger's exactly-once replay behavior.
  */
class TimeTravelSpec extends SparkSpec {
  import spark.implicits._

  test("readEventsAsOf replays every horizon exactly (independent " +
    "recompute): inserts appear at their commit, the upsert flips " +
    "values at horizon 2, the delete hides at horizon 3 only") {
    val root = TimeTravel.ensureLedgeredEvents(spark, sf0001)
    val raw = Tables.events(spark, sf0001)
      .select($"event_id", $"event_type", $"value")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    def expected(h: Int): Set[(Long, String, Double)] =
      raw.filter { case (id, _, _) =>
        id % 3 <= math.min(h, 2) && !(h >= 3 && id % 5 == 0)
      }.map { case (id, t, v) =>
        (id, t, if (h >= 2 && id % 6 == 0) v + 100.0 else v)
      }.toSet
    for (h <- 0 to 3) {
      val got = TimeTravel.readEventsAsOf(spark, root, h)
        .select($"event_id", $"event_type", $"value")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
        .toSet
      assert(got == expected(h), s"horizon $h diverged")
    }
    // the upsert is load-bearing: horizon 2 differs from horizon 1 on
    // the updated keys, and each key resolves to exactly ONE version
    assert(expected(2).exists { case (id, _, _) => id % 6 == 0 })
    val dup = TimeTravel.readEventsAsOf(spark, root, 3)
      .groupBy($"event_id").count().filter($"count" > 1).count()
    assert(dup == 0, "per-key resolution must yield one version")
  }

  test("the ledger is exactly-once and build-once: replayed folds and " +
    "deletes no-op, and a second ensure serves identical horizons") {
    val root = TimeTravel.ensureLedgeredEvents(spark, sf0001)
    val p = TimeTravel.protocol(root)
    assert(p.foldedBatches() == Set(1L, 2L))
    assert(p.deletedBatches() == Set(3L))
    // a replayed commit against the PUBLISHED root is a committed no-op
    assert(!p.fold(1L, Seq("data")) {
      fail("a committed fold must not re-stage")
    })
    assert(!p.delete(3L) {
      fail("a committed delete must not re-stage")
    })
    val before = TimeTravel.readEventsAsOf(spark, root, 3)
      .agg(count(lit(1)), sum($"value".cast("decimal(12,2)")))
      .as[(Long, java.math.BigDecimal)].head()
    val again = TimeTravel.ensureLedgeredEvents(spark, sf0001)
    val after = TimeTravel.readEventsAsOf(spark, again, 3)
      .agg(count(lit(1)), sum($"value".cast("decimal(12,2)")))
      .as[(Long, java.math.BigDecimal)].head()
    assert(root == again && before == after)
  }
}
