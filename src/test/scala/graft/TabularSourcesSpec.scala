package graft

import org.apache.spark.sql.functions._

/** CSV and JSON source/sink round-trips with explicit schemas — the
  * Spark analogue of the reference's CSV load path into fixed-DDL tables
  * (`deployment_function.py:190`, `api_method = "load_csv"`): schema is
  * DECLARED, never inferred, and a round-trip must be lossless.
  */
class TabularSourcesSpec extends SparkSpec {

  test("CSV round-trip with explicit schema is lossless (load_csv path)") {
    val df = Tables.load(spark, sf0001, "customer")
    val dir = tmpDir("csvround")
    df.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.schema(df.schema).option("header", "true").csv(dir)
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      df.schema.map(f => (f.name, f.dataType)))
    assert(back.orderBy("c_custkey").collect().toSeq ==
      df.orderBy("c_custkey").collect().toSeq)
  }

  test("JSON round-trip with explicit schema is lossless, including the " +
    "embedded JSON-string column") {
    val df = Tables.events(spark, sf0001)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), col("props"))
    val dir = tmpDir("jsonround")
    df.write.mode("overwrite").json(dir)
    val back = spark.read.schema(df.schema).json(dir)
    assert(back.count() == df.count())
    assert(back.orderBy("event_id").collect().toSeq ==
      df.orderBy("event_id").collect().toSeq)
  }
}
