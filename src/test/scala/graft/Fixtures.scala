package graft

import graft.schema.GeoPoint

/** Raw API payload fixtures mirroring FIXTURES.md §1 (shapes consumed at
  * reference `deployment_function.py:95-103` and `:138-151`).
  */
object Fixtures {

  def tomtom(currentSpeed: Long = 33, freeFlowSpeed: Long = 50,
      confidence: Double = 0.95, roadClosure: Boolean = false,
      coords: Seq[(Double, Double)] = Seq(
        (55.661234, 12.501234), (55.661789, 12.501789), (55.662345, 12.502345)))
      : String = {
    val cs = coords.map { case (la, lo) =>
      s"""{"latitude": $la, "longitude": $lo}"""
    }.mkString(",")
    s"""{"flowSegmentData": {"frc": "FRC2", "currentSpeed": $currentSpeed,
       | "freeFlowSpeed": $freeFlowSpeed, "currentTravelTime": 108,
       | "freeFlowTravelTime": 71, "confidence": $confidence,
       | "roadClosure": $roadClosure,
       | "coordinates": {"coordinate": [$cs]}}}""".stripMargin
  }

  def openWeather(temp: Double = 281.65, weatherMain: String = "Rain",
      desc: String = "light rain", city: String = "Frederiksberg",
      emptyWeatherArray: Boolean = false): String = {
    val warr =
      if (emptyWeatherArray) "[]"
      else s"""[{"main": "$weatherMain", "description": "$desc"}]"""
    s"""{"weather": $warr,
       | "main": {"temp": $temp, "feels_like": 279.91, "temp_min": 280.93,
       |          "temp_max": 282.04, "pressure": 1009, "humidity": 87},
       | "visibility": 10000, "wind": {"speed": 6.2, "deg": 240},
       | "clouds": {"all": 75}, "sys": {"country": "DK"},
       | "name": "$city"}""".stripMargin
  }

  /** Missing flowSegmentData → record must be dropped (P12). */
  val malformedTraffic = """{"unexpected": {"shape": 1}}"""
  val notJson = """this is not json at all"""

  /** 3-point subset incl. a name with slashes/periods (FIXTURES.md §1c). */
  val geoPoints: Seq[GeoPoint] = Seq(
    GeoPoint("noerrebrogade", "55.694843", "12.548434"),
    GeoPoint("torvegade/knippelsbro", "55.671906", "12.581135"),
    GeoPoint("langebro", "55.668548", "12.571472"))
}
