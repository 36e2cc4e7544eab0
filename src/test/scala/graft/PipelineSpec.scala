package graft

import graft.pipeline.IngestPipeline
import graft.pipeline.IngestPipeline.Config
import graft.schema.GeoPoint
import graft.sources.HttpJsonSource

import java.time.{ZoneId, ZonedDateTime}
import java.util.concurrent.atomic.AtomicInteger
import scala.util.{Failure, Success, Try}

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private def cfg(base: String): Config = Config(
    trafficUrlTemplate = "traffic://{lat},{lon}?key={key}",
    weatherUrlTemplate = "weather://{lat},{lon}?key={key}",
    points = Fixtures.geoPoints,
    trafficPath = s"$base/traffic_table",
    weatherPath = s"$base/weather_table",
    snapshotPath = s"$base/latest_joined_data",
    retryDelayMillis = 0L)

  private val hour1 = ZonedDateTime.of(2026, 8, 12, 9, 0, 0, 0, ZoneId.of("UTC"))
  private val hour2 = hour1.plusHours(1)

  /** Fixture fetcher: dispatches on URL scheme like the reference's two
    * templates; speed varies per hour so rows are distinguishable.
    */
  private def okFetcher(speed: Long): HttpJsonSource.Fetcher = (url, p) =>
    Success(
      if (url.startsWith("traffic")) Fixtures.tomtom(currentSpeed = speed)
      else Fixtures.openWeather())

  test("two hourly runs: append grows history, snapshot holds only latest") {
    val base = tmpDir("pipeline")
    val c = cfg(base)
    val r1 = IngestPipeline.run(spark, c, okFetcher(30), hour1)
    assert(r1.trafficRows == 3 && r1.weatherRows == 3 && r1.snapshotRows == 3)
    assert(r1.failures.isEmpty)
    val r2 = IngestPipeline.run(spark, c, okFetcher(55), hour2)
    assert(r2.snapshotRows == 3)
    // K1 append semantics: both hours in history
    val hist = spark.read.parquet(c.trafficPath)
    assert(hist.count() == 6)
    // K2 overwrite semantics: snapshot has ONLY the latest hour
    val snap = spark.read.parquet(c.snapshotPath)
    assert(snap.select("time").distinct().as[String].collect().toSeq ==
      Seq("10:00"))
    assert(snap.select("current_speed").distinct().as[Long]
      .collect().toSeq == Seq(55L))
    // one run-constant stamp shared by all rows of a run (P9)
    assert(hist.select("date", "time").distinct().count() == 2)
  }

  test("per-unit isolation: one failing point skips, others proceed (O2)") {
    val base = tmpDir("pipeline")
    val flaky: HttpJsonSource.Fetcher = (url, p) =>
      if (p.geo_name == "langebro") Failure(new RuntimeException("HTTP 500"))
      else okFetcher(30)(url, p)
    val r = IngestPipeline.run(spark, cfg(base), flaky, hour1)
    assert(r.trafficRows == 2 && r.weatherRows == 2)
    // both fetch phases record the failure in the side channel
    assert(r.failures.map(_._1).toSet == Set("langebro"))
    assert(r.failures.length == 2)
  }

  test("retry: succeeds on third attempt (S3: tries=3)") {
    val calls = new AtomicInteger(0)
    val eventuallyOk: HttpJsonSource.Fetcher = (url, p) =>
      if (calls.incrementAndGet() % 3 == 0) okFetcher(30)(url, p)
      else Failure(new RuntimeException("transient"))
    val r = IngestPipeline.run(spark, cfg(tmpDir("pipeline")), eventuallyOk, hour1)
    assert(r.trafficRows == 3 && r.weatherRows == 3 && r.failures.isEmpty)
  }

  test("all fetches fail: empty-batch suppression writes nothing (K3/F3)") {
    val base = tmpDir("pipeline")
    val dead: HttpJsonSource.Fetcher = (_, _) =>
      Failure(new RuntimeException("down"))
    val r = IngestPipeline.run(spark, cfg(base), dead, hour1)
    assert(r.trafficRows == 0 && r.weatherRows == 0 && r.snapshotRows == 0)
    assert(r.failures.length == 6)
    assert(Try(spark.read.parquet(s"$base/traffic_table").count()).isFailure)
  }

  test("malformed payloads drop per-record, run continues (P12/K4)") {
    val badJson: HttpJsonSource.Fetcher = (url, p) =>
      if (p.geo_name == "langebro") Success(Fixtures.notJson)
      else okFetcher(30)(url, p)
    val r = IngestPipeline.run(spark, cfg(tmpDir("pipeline")), badJson, hour1)
    assert(r.trafficRows == 2)
    // weather parser also rejects the non-JSON payload
    assert(r.weatherRows == 2)
    assert(r.snapshotRows == 2)
  }

  test("snapshot refreshes from on-disk history even when this run appends " +
    "no traffic rows (regression: the reference's scheduled query reruns " +
    "unconditionally every hour)") {
    val base = tmpDir("pipeline")
    val c = cfg(base)
    assert(IngestPipeline.run(spark, c, okFetcher(30), hour1).snapshotRows == 3)
    // hour 2: traffic API down, weather still appending — the snapshot
    // must still be recomputed from history, not skipped.
    val trafficDown: HttpJsonSource.Fetcher = (url, p) =>
      if (url.startsWith("traffic")) Failure(new RuntimeException("HTTP 503"))
      else okFetcher(41)(url, p)
    val r2 = IngestPipeline.run(spark, c, trafficDown, hour2)
    assert(r2.trafficRows == 0 && r2.weatherRows == 3)
    assert(r2.snapshotRows == 3) // latest traffic hour (hour 1) still joins
  }

  test("url template rendering substitutes lat/lon/key (S1 URL shape)") {
    val url = HttpJsonSource.renderUrl(
      "https://api/x?point={lat},{lon}&key={key}",
      GeoPoint("g", "55.1", "12.5"), "SECRET")
    assert(url == "https://api/x?point=55.1,12.5&key=SECRET")
  }
}
