package graft
import org.apache.spark.sql.SparkSession
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "1048576")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val byName = SparkEntry.specs.map(sp => sp.name -> sp).toMap
    args.foreach { name =>
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        byName(name).fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        println(s"TIMING $name run$i: ${(System.nanoTime()-t0)/1e9}")
        // isolate runs like graft.Bench does — a query that caches
        // (sim_ivf etc.) would otherwise report a warm-cache run2
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
