package graft

import graft.operators.IngestOps
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}

class HttpJsonSourceV2Spec extends SparkSpec {
  import spark.implicits._

  private def writeFixture(dir: String, name: String, body: String): Unit =
    Files.write(Paths.get(dir, name), body.getBytes("UTF-8"))

  test("DSv2 httpjson: one partition per point, executor-side fetch, " +
    "per-unit failure isolation as error rows") {
    val dir = tmpDir("dsv2")
    writeFixture(dir, "55.1_12.5.json", Fixtures.tomtom(currentSpeed = 42))
    writeFixture(dir, "55.2_12.6.json", Fixtures.tomtom(currentSpeed = 77))
    // third point has no file → fetch fails → error row, not a dead job
    val df = spark.read.format("httpjson")
      .option("template", s"file://$dir/{lat}_{lon}.json")
      .option("points", "a|55.1|12.5;b|55.2|12.6;dead|9.9|9.9")
      .option("retries", "2")
      .option("retryDelayMillis", "0")
      .load()
    assert(df.columns.toSeq ==
      Seq("geo_name", "lat", "lon", "payload", "error"))
    assert(df.rdd.getNumPartitions == 3) // one fetch per partition
    val rows = df.collect().map(r => r.getString(0) ->
      (Option(r.getString(3)), Option(r.getString(4)))).toMap
    assert(rows("a")._1.exists(_.contains("\"currentSpeed\": 42")))
    assert(rows("b")._1.exists(_.contains("\"currentSpeed\": 77")))
    assert(rows("dead")._1.isEmpty && rows("dead")._2.nonEmpty)
  }

  test("malformed points entry fails with an error naming the bad spec " +
    "(regression: opaque MatchError at planning time)") {
    val df = spark.read.format("httpjson")
      .option("template", "file:///nowhere/{lat}_{lon}.json")
      .option("points", "ok|55.1|12.5;bad-entry|55.2")
      .load()
    val e = intercept[Throwable](df.count())
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("bad-entry")))
    // over-long entries are rejected too (not folded into lon)
    val df4 = spark.read.format("httpjson")
      .option("template", "file:///nowhere/{lat}_{lon}.json")
      .option("points", "four-fields|55.1|12.5|extra")
      .load()
    val e4 = intercept[Throwable](df4.count())
    assert(messages(e4).exists(_.contains("four-fields")))
  }

  test("DSv2 output feeds the same extraction as the driver-side source") {
    val dir = tmpDir("dsv2")
    writeFixture(dir, "55.1_12.5.json", Fixtures.tomtom())
    val raw = spark.read.format("httpjson")
      .option("template", s"file://$dir/{lat}_{lon}.json")
      .option("points", "noerrebrogade|55.1|12.5")
      .load()
      .filter(col("payload").isNotNull)
    val out = IngestOps.trafficFromRaw(raw, "2026-08-12", "09:00")
    val r = out.collect().head
    assert(r.getAs[String]("geo_name") == "noerrebrogade")
    assert(r.getAs[Long]("current_speed") == 33L)
    assert(r.getAs[String]("original_coordinates") == "55.1,12.5")
  }
}
