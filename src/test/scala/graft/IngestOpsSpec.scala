package graft

import graft.operators.IngestOps
import graft.schema.{RawFetch, Schemas}
import org.apache.spark.sql.DataFrame

class IngestOpsSpec extends SparkSpec {
  import spark.implicits._

  private def rawDf(payloads: (String, String)*): DataFrame =
    payloads.map { case (name, p) => RawFetch(name, "55.1", "12.5", p) }
      .toDS().toDF()

  test("traffic extraction produces the 15 DDL columns with exact values") {
    val out = IngestOps.trafficFromRaw(
      rawDf("noerrebrogade" -> Fixtures.tomtom()), "2026-08-12", "09:00")
    assert(out.columns.toSeq == Schemas.trafficTableSchema.fieldNames.toSeq)
    val r = out.collect().head
    assert(r.getAs[String]("date") == "2026-08-12")
    assert(r.getAs[String]("time") == "09:00")
    assert(r.getAs[String]("road_class") == "FRC2")
    assert(r.getAs[Long]("current_speed") == 33L)
    assert(r.getAs[Double]("confidence") == 0.95)
    assert(!r.getAs[Boolean]("road_closure"))
    // P7: string concatenation of the *input* strings, not arithmetic
    assert(r.getAs[String]("original_coordinates") == "55.1,12.5")
    // P2/P3: head and last of the coordinate array, cast to string (P6)
    assert(r.getAs[String]("first_coordinates") == "55.661234,12.501234")
    assert(r.getAs[String]("last_coordinates") == "55.662345,12.502345")
  }

  test("single-coordinate array: head == last (FIXTURES.md edge)") {
    val one = Fixtures.tomtom(coords = Seq((55.0, 12.0)))
    val r = IngestOps.trafficFromRaw(rawDf("x" -> one), "2026-08-12", "09:00")
      .collect().head
    assert(r.getAs[String]("first_coordinates") ==
      r.getAs[String]("last_coordinates"))
  }

  test("malformed traffic payloads are dropped, valid ones survive (P12/O2)") {
    val out = IngestOps.trafficFromRaw(
      rawDf("good" -> Fixtures.tomtom(),
        "bad" -> Fixtures.malformedTraffic,
        "worse" -> Fixtures.notJson),
      "2026-08-12", "09:00")
    assert(out.select("geo_name").as[String].collect().toSeq == Seq("good"))
  }

  test("weather extraction produces the 18 DDL columns; Kelvin→Celsius (P5)") {
    val out = IngestOps.weatherFromRaw(
      rawDf("noerrebrogade" -> Fixtures.openWeather()), "2026-08-12", "09:00")
    assert(out.columns.toSeq == Schemas.weatherTableSchema.fieldNames.toSeq)
    val r = out.collect().head
    assert(math.abs(r.getAs[Double]("temperature") - (281.65 - 273.15)) < 1e-9)
    assert(r.getAs[String]("weather_main") == "Rain")
    assert(r.getAs[String]("country") == "DK")
    assert(r.getAs[String]("city_area_name") == "Frederiksberg")
    assert(r.getAs[Long]("pressure") == 1009L)
    assert(r.getAs[String]("original_coordinates") == "55.1,12.5")
  }

  test("temp exactly 273.15K → 0.0°C (FIXTURES.md edge)") {
    val r = IngestOps.weatherFromRaw(
      rawDf("x" -> Fixtures.openWeather(temp = 273.15)), "2026-08-12", "09:00")
      .collect().head
    assert(r.getAs[Double]("temperature") == 0.0)
  }

  test("empty weather[] array → record dropped (P12)") {
    val out = IngestOps.weatherFromRaw(
      rawDf("x" -> Fixtures.openWeather(emptyWeatherArray = true)),
      "2026-08-12", "09:00")
    assert(out.count() == 0)
  }
}
