package graft
import org.apache.spark.sql.SparkSession

/** Dev harness: time a comma-separated subset of SparkEntry.queries under
  * the bench protocol (sf0.001 warm-up compile pass, noop sink, cache
  * clear, two timed runs) without paying for the whole suite — for
  * before/after checks while optimizing one query. Not part of the driver
  * contract.
  */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      // mirror Bench's AQE floor so A/B numbers transfer
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_MIN_PARTITION_SIZE", "256k"))
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        sys.env.getOrElse("SPARK_GRAFT_CACHE_AQE", "true"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (n <- names) {
      try { SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save() } catch { case _: Throwable => () }
      spark.catalog.clearCache()
      PipelineQueries.clearPairsMemo() // A/B runs must measure the COLD build
      for (i <- 1 to 2) {
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
        println(s"TIMED $n run$i ${(System.nanoTime()-t0)/1e9}")
        spark.catalog.clearCache()
        PipelineQueries.clearPairsMemo()
      }
    }
    spark.stop()
  }
}
