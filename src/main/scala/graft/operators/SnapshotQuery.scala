package graft.operators

import graft.schema.Schemas
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The flagship snapshot query (`bigquery_scheduled_query.sql:1-17`):
  *
  *   traffic INNER JOIN weather USING (date,time,geo_name,original_coordinates)
  *   WHERE datetime(date,time) = (SELECT MAX(datetime(date,time)) FROM traffic)
  *
  * Faithful semantics (SURVEY.md §7.4): the MAX reads the traffic table
  * ONLY — if the newest traffic hour has no weather match the snapshot is
  * empty; we must not "improve" this to a MAX over the join.
  *
  * Physical shape at scale: the MAX is a 1-row aggregate broadcast back
  * as an equality filter (Spark plans the SQL scalar subquery the same
  * way); the filter lands BEFORE the join on both inputs, so the join
  * only ever sees one hour of data — broadcastable regardless of history
  * size. Date+time parse: one `to_timestamp(concat_ws(...))` replaces
  * PARSE_DATE + PARSE_TIME + DATETIME (D1–D3) with identical ordering
  * semantics (strings are zero-padded fixed-width).
  */
object SnapshotQuery {

  /** `datetime(date, time)` over the string pair (D1–D3). */
  def tsExpr(dateCol: String = "date", timeCol: String = "time") =
    to_timestamp(concat_ws(" ", col(dateCol), col(timeCol)), "yyyy-MM-dd HH:mm")

  /** DataFrame form. */
  def latestJoined(traffic: DataFrame, weather: DataFrame): DataFrame = {
    val mx = traffic.agg(max(tsExpr()).as("max_ts"))
    traffic
      .join(broadcast(mx), tsExpr() === col("max_ts")) // F1 on traffic side
      .drop("max_ts")
      .join(weather.join(broadcast(mx), tsExpr() === col("max_ts"))
        .drop("max_ts"), Schemas.joinKeys, "inner") // J1: USING semantics
  }

  /** SQL-text form — the reference query modulo BigQuery→Spark datetime
    * function names; exercises Catalyst's ScalarSubquery planning.
    * Expects temp views `traffic_table` / `weather_table`.
    */
  def latestJoinedSql(spark: SparkSession): DataFrame = spark.sql(
    """SELECT *
      |FROM traffic_table
      |INNER JOIN weather_table
      |USING (date, time, geo_name, original_coordinates)
      |WHERE to_timestamp(concat_ws(' ', date, time), 'yyyy-MM-dd HH:mm') =
      |  (SELECT MAX(to_timestamp(concat_ws(' ', date, time), 'yyyy-MM-dd HH:mm'))
      |   FROM traffic_table)""".stripMargin)
}
