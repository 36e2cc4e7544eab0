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

  test("ORC round-trip is lossless including timestamp and array columns " +
    "(columnar interchange beyond parquet)") {
    val docs = Tables.documents(spark, sf0001)
      .withColumn("toks", split(col("text"), " "))
      .select(col("doc_id"), col("lang"), col("toks"))
    val ev = Tables.events(spark, sf0001)
      .select(col("event_id"), col("ts"), col("value"))
    val d1 = tmpDir("orcdocs"); val d2 = tmpDir("orcev")
    docs.write.mode("overwrite").orc(d1)
    ev.write.mode("overwrite").orc(d2)
    val docsBack = spark.read.schema(docs.schema).orc(d1)
    val evBack = spark.read.schema(ev.schema).orc(d2)
    assert(docsBack.orderBy("doc_id").collect().toSeq ==
      docs.orderBy("doc_id").collect().toSeq)
    assert(evBack.orderBy("event_id").collect().toSeq ==
      ev.orderBy("event_id").collect().toSeq)
    // and predicate pushdown reaches the ORC scan like parquet
    val q = docsBack.filter(col("doc_id") === 7L)
    val scan = q.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    assert(scan.metadata("PushedFilters").contains("EqualTo(doc_id,7)"),
      scan.metadata("PushedFilters"))
  }
}
