package graft.sources.v2

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import java.util
import scala.jdk.CollectionConverters._

/** DataSourceV2 connector for the HTTP JSON fetch (SURVEY.md §2.1 S1/S2
  * as a first-class source): `spark.read.format("httpjson")`.
  *
  *   spark.read.format("httpjson")
  *     .option("template", "https://api/flow?point={lat},{lon}&key=...")
  *     .option("points", "noerrebrogade|55.694843|12.548434;langebro|...")
  *     .option("retries", "3")
  *     .load()
  *
  * One geo point = one `InputPartition`, so fetches run ON EXECUTORS in
  * parallel — the distributed upgrade of the reference's sequential
  * 40-unit driver loop (`deployment_function.py:296-307`). Failures
  * exhaust the per-partition retry budget and surface as rows with a
  * null payload and an `error` column (per-unit isolation: a dead
  * endpoint yields a diagnosable row, never a dead job). `file:` URLs
  * work through the same path, which is how the zero-egress tests and
  * fixture replays drive it.
  *
  * Output schema: geo_name, lat, lon, payload, error (payload/error
  * mutually null). Parsing stays downstream in `IngestOps` — the source
  * moves bytes, the engine plans the extraction.
  */
class HttpJsonSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "httpjson"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    HttpJsonSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new HttpJsonTable(new CaseInsensitiveStringMap(properties))
}

object HttpJsonSource {
  val schema: StructType = StructType(Seq(
    StructField("geo_name", StringType, nullable = false),
    StructField("lat", StringType, nullable = false),
    StructField("lon", StringType, nullable = false),
    StructField("payload", StringType, nullable = true),
    StructField("error", StringType, nullable = true)))
}

private[v2] class HttpJsonTable(options: CaseInsensitiveStringMap)
  extends Table with SupportsRead {
  override def name(): String = "httpjson"
  override def schema(): StructType = HttpJsonSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new HttpJsonScanBuilder(options)
}

private[v2] class HttpJsonScanBuilder(options: CaseInsensitiveStringMap)
  extends ScanBuilder with Scan with Batch {
  override def build(): Scan = this
  override def readSchema(): StructType = HttpJsonSource.schema
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val template = options.get("template")
    require(template != null, "httpjson requires option 'template'")
    val pointsOpt = options.get("points")
    require(pointsOpt != null,
      "httpjson requires option 'points' (name|lat|lon;...)")
    val retries = options.getInt("retries", 3)
    val delayMs = options.getLong("retryDelayMillis", 1000L)
    pointsOpt.split(";").filter(_.nonEmpty).map { spec =>
      // limit -1 keeps trailing fields separate so "a|1|2|3" is rejected
      // rather than silently folding "2|3" into lon
      val fields = spec.split("\\|", -1)
      require(fields.length == 3,
        s"httpjson 'points' entry '$spec' is malformed: expected name|lat|lon")
      val Array(name, lat, lon) = fields
      HttpJsonPartition(name, lat, lon,
        template.replace("{lat}", lat).replace("{lon}", lon),
        retries, delayMs): InputPartition
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new HttpJsonReaderFactory
}

private[v2] case class HttpJsonPartition(geoName: String, lat: String,
    lon: String, url: String, retries: Int, delayMs: Long)
  extends InputPartition

private[v2] class HttpJsonReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new HttpJsonPartitionReader(p.asInstanceOf[HttpJsonPartition])
}

/** Executor-side fetch of one point: retry loop, then exactly one row. */
private[v2] class HttpJsonPartitionReader(p: HttpJsonPartition)
  extends PartitionReader[InternalRow] {

  private var done = false
  private var row: InternalRow = _

  private def fetchOnce(): String = {
    val conn = new java.net.URL(p.url).openConnection()
    conn.setConnectTimeout(10000)
    conn.setReadTimeout(10000)
    conn match {
      case h: java.net.HttpURLConnection if h.getResponseCode != 200 =>
        throw new RuntimeException(
          s"Failed to fetch data for ${p.geoName}: status ${h.getResponseCode}")
      case _ =>
    }
    val in = conn.getInputStream
    try new String(in.readAllBytes(), "UTF-8") finally in.close()
  }

  override def next(): Boolean = {
    if (done) return false
    var payload: String = null
    var error: String = null
    var attempt = 0
    while (payload == null && attempt < p.retries) {
      if (attempt > 0) Thread.sleep(p.delayMs)
      try payload = fetchOnce()
      catch { case e: Exception => error = e.toString }
      attempt += 1
    }
    def u(s: String) = if (s == null) null else UTF8String.fromString(s)
    row = InternalRow(u(p.geoName), u(p.lat), u(p.lon), u(payload),
      if (payload == null) u(error) else null)
    done = true
    true
  }

  override def get(): InternalRow = row
  override def close(): Unit = ()
}
