package graft.schema

import org.apache.spark.sql.types._

/** Fixed schemas mirroring the reference DDL and raw API payloads.
  *
  * Storage schemas are explicit `StructType` constants with
  * `nullable=false` mirroring the `NOT NULL` on every DDL column
  * (reference `bigquery_table_creation_queries.sql:1-38`); payload
  * schemas mirror the dict accesses in the reference handlers
  * (`deployment_function.py:95-103` and `:138-151`).
  *
  * Dates/times/coordinates are deliberately STRING-typed for parity:
  * the reference stores `'%Y-%m-%d'`/`'%H:%M'` strings
  * (`deployment_function.py:62-63`) and string lat/lon
  * (`bigquery_table_creation_queries.sql:26-27`), re-parsing them at
  * query time.
  */
object Schemas {

  // ---- raw API payload schemas (transient, for from_json) ----

  /** TomTom flow-segment response (`deployment_function.py:95-103`). */
  val tomtomSchema: StructType = StructType(Seq(
    StructField("flowSegmentData", StructType(Seq(
      StructField("frc", StringType),
      StructField("currentSpeed", LongType),
      StructField("freeFlowSpeed", LongType),
      StructField("currentTravelTime", LongType),
      StructField("freeFlowTravelTime", LongType),
      StructField("confidence", DoubleType),
      StructField("roadClosure", BooleanType),
      StructField("coordinates", StructType(Seq(
        StructField("coordinate", ArrayType(StructType(Seq(
          StructField("latitude", DoubleType),
          StructField("longitude", DoubleType)))))))))))))

  /** OpenWeather current-weather response (`deployment_function.py:138-151`). */
  val openWeatherSchema: StructType = StructType(Seq(
    StructField("weather", ArrayType(StructType(Seq(
      StructField("main", StringType),
      StructField("description", StringType))))),
    StructField("main", StructType(Seq(
      StructField("temp", DoubleType),
      StructField("feels_like", DoubleType),
      StructField("temp_min", DoubleType),
      StructField("temp_max", DoubleType),
      StructField("pressure", LongType),
      StructField("humidity", LongType)))),
    StructField("visibility", LongType),
    StructField("wind", StructType(Seq(
      StructField("speed", DoubleType),
      StructField("deg", LongType)))),
    StructField("clouds", StructType(Seq(
      StructField("all", LongType)))),
    StructField("sys", StructType(Seq(
      StructField("country", StringType)))),
    StructField("name", StringType)))

  // ---- storage schemas (reference DDL parity) ----

  private def s(n: String) = StructField(n, StringType, nullable = false)
  private def l(n: String) = StructField(n, LongType, nullable = false)
  private def d(n: String) = StructField(n, DoubleType, nullable = false)

  /** 15 columns ← `bigquery_table_creation_queries.sql:22-38`. */
  val trafficTableSchema: StructType = StructType(Seq(
    s("date"), s("time"), s("geo_name"), s("latitude"), s("longitude"),
    s("road_class"), l("current_speed"), l("free_flow_speed"),
    l("current_travel_time"), l("free_flow_travel_time"),
    d("confidence"), StructField("road_closure", BooleanType, nullable = false),
    s("original_coordinates"), s("first_coordinates"), s("last_coordinates")))

  /** 18 columns ← `bigquery_table_creation_queries.sql:1-20`. */
  val weatherTableSchema: StructType = StructType(Seq(
    s("date"), s("time"), s("geo_name"), s("country"), s("city_area_name"),
    s("weather_main"), s("weather_description"), d("temperature"),
    d("feels_like"), d("temp_min"), d("temp_max"), l("pressure"),
    l("humidity_percent"), l("visibility"), d("wind_speed"),
    l("wind_direction_degrees"), l("cloudiness_percent"),
    s("original_coordinates")))

  /** The join's natural key (`bigquery_scheduled_query.sql:4-6`). */
  val joinKeys: Seq[String] =
    Seq("date", "time", "geo_name", "original_coordinates")
}

/** Typed row of `traffic_table` (compile-time image of the 15-col DDL). */
final case class TrafficObservation(
    date: String, time: String, geo_name: String,
    latitude: String, longitude: String, road_class: String,
    current_speed: Long, free_flow_speed: Long,
    current_travel_time: Long, free_flow_travel_time: Long,
    confidence: Double, road_closure: Boolean,
    original_coordinates: String, first_coordinates: String,
    last_coordinates: String)

/** Typed row of `weather_table` (compile-time image of the 18-col DDL). */
final case class WeatherObservation(
    date: String, time: String, geo_name: String, country: String,
    city_area_name: String, weather_main: String, weather_description: String,
    temperature: Double, feels_like: Double, temp_min: Double,
    temp_max: Double, pressure: Long, humidity_percent: Long,
    visibility: Long, wind_speed: Double, wind_direction_degrees: Long,
    cloudiness_percent: Long, original_coordinates: String)

/** A monitored location (`deployment_function.py:225-286`): lat/lon are
  * strings — the reference only ever concatenates them (`:119`, `:158`).
  */
final case class GeoPoint(geo_name: String, lat: String, lon: String)

/** One fetched API payload with its fan-out context (SURVEY.md §2.1 S1/S2). */
final case class RawFetch(geo_name: String, lat: String, lon: String,
    payload: String)
