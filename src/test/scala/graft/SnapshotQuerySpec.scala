package graft

import graft.operators.SnapshotQuery
import graft.schema.{TrafficObservation, WeatherObservation}
import org.apache.spark.sql.Dataset

class SnapshotQuerySpec extends SparkSpec {
  import spark.implicits._

  private def t(date: String, time: String, geo: String): TrafficObservation =
    TrafficObservation(date, time, geo, "55.1", "12.5", "FRC2",
      33L, 50L, 108L, 71L, 0.95, road_closure = false,
      s"55.1,12.5", "55.0,12.0", "55.2,12.9")

  private def w(date: String, time: String, geo: String): WeatherObservation =
    WeatherObservation(date, time, geo, "DK", "Frederiksberg", "Rain",
      "light rain", 8.5, 6.76, 7.78, 8.89, 1009L, 87L, 10000L, 6.2,
      240L, 75L, s"55.1,12.5")

  private def ds[T: org.apache.spark.sql.Encoder](xs: Seq[T]): Dataset[T] =
    xs.toDS()

  // Golden fixture: 3 hours × 3 geo points, one point missing from weather
  // in the latest hour (FIXTURES.md §2).
  private val hours = Seq("08:00", "09:00", "10:00")
  private val geos = Seq("a", "b", "c")
  private val traffic = for (h <- hours; g <- geos) yield t("2026-08-12", h, g)
  private val weather =
    (for (h <- hours.take(2); g <- geos) yield w("2026-08-12", h, g)) ++
      geos.filterNot(_ == "c").map(g => w("2026-08-12", "10:00", g))

  test("golden: snapshot keeps only latest-hour rows where both sides exist") {
    val out = SnapshotQuery.latestJoined(ds(traffic).toDF(), ds(weather).toDF())
    val rows = out.select("geo_name", "time").as[(String, String)]
      .collect().sorted
    assert(rows.toSeq == Seq("a" -> "10:00", "b" -> "10:00"))
    // USING semantics: join keys appear exactly once
    assert(out.columns.count(_ == "date") == 1)
    assert(out.columns.length == 15 + 18 - 4)
  }

  test("MAX comes from traffic only: latest traffic hour with zero weather" +
    " match ⇒ empty snapshot (not the newest matching hour)") {
    val wOld = weather.filter(_.time != "10:00") // weather stops at 09:00
    val out = SnapshotQuery.latestJoined(ds(traffic).toDF(), ds(wOld).toDF())
    assert(out.count() == 0)
  }

  test("SQL-text form matches the DataFrame form") {
    ds(traffic).toDF().createOrReplaceTempView("traffic_table")
    ds(weather).toDF().createOrReplaceTempView("weather_table")
    val sql = SnapshotQuery.latestJoinedSql(spark)
    val df = SnapshotQuery.latestJoined(ds(traffic).toDF(), ds(weather).toDF())
    assert(sql.select("geo_name").as[String].collect().sorted.toSeq ==
      df.select("geo_name").as[String].collect().sorted.toSeq)
  }

  test("property: every snapshot row carries the global max traffic " +
    "timestamp, and row count ≤ geo points present at that timestamp") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 25) {
      val hist = Seq.fill(1 + rnd.nextInt(40)) {
        (f"2026-08-${1 + rnd.nextInt(28)}%02d",
          f"${rnd.nextInt(24)}%02d:00",
          "abcd" (rnd.nextInt(4)).toString,
          rnd.nextDouble() < 0.7)
      }
      val tr = hist.map { case (d, h, g, _) => t(d, h, g) }.distinct
      val we = hist.collect { case (d, h, g, true) => w(d, h, g) }.distinct
      val maxKey = tr.map(o => (o.date, o.time)).max
      val out = SnapshotQuery.latestJoined(ds(tr).toDF(), ds(we).toDF())
        .select("date", "time", "geo_name")
        .as[(String, String, String)].collect()
      assert(out.forall { case (d, h, _) => (d, h) == maxKey })
      val geoAtMax = tr.filter(o => (o.date, o.time) == maxKey)
        .map(_.geo_name).distinct
      assert(out.length <= geoAtMax.length)
    }
  }
}
