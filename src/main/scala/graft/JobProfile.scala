package graft
import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Dev harness: run one query under the bench protocol with a listener
  * that prints every Spark job's wall time and aggregate task metrics
  * (tasks, input bytes, shuffle read/write) — the guide-§1 empirical
  * breakdown for a multi-job query (iterative rounds, checkpoint
  * materializations, bounded collects) where a single end-to-end number
  * hides which job is the cost. Not part of the driver contract.
  *
  * Usage: runMain graft.JobProfile <query>[,query...]
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      // mirror Bench's AQE floor + cache re-optimization so profiles match
      // bench conditions
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_MIN_PARTITION_SIZE", "256k"))
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        sys.env.getOrElse("SPARK_GRAFT_CACHE_AQE", "true"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    case class Acc(var tasks: Int = 0, var inB: Long = 0, var srB: Long = 0,
                   var swB: Long = 0, var cpuMs: Long = 0)
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val jobAcc = new java.util.concurrent.ConcurrentHashMap[Int, Acc]()
    val stageToJob = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val desc = Option(j.properties.getProperty("spark.job.description")).getOrElse("")
        jobStart.put(j.jobId, (System.nanoTime(), desc))
        jobAcc.put(j.jobId, Acc())
        j.stageIds.foreach(s => stageToJob.put(s, j.jobId))
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val jid = stageToJob.getOrDefault(t.stageId, -1)
        val a = jobAcc.get(jid)
        if (a != null && t.taskMetrics != null) a.synchronized {
          a.tasks += 1
          a.inB += t.taskMetrics.inputMetrics.bytesRead
          a.srB += t.taskMetrics.shuffleReadMetrics.totalBytesRead
          a.swB += t.taskMetrics.shuffleWriteMetrics.bytesWritten
          a.cpuMs += t.taskMetrics.executorCpuTime / 1000000
        }
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val (t0, desc) = jobStart.getOrDefault(j.jobId, (0L, ""))
        val a = jobAcc.getOrDefault(j.jobId, Acc())
        val ms = (System.nanoTime() - t0) / 1e6
        lines.add(f"job ${j.jobId}%3d ${ms}%8.1f ms tasks=${a.tasks}%4d " +
          f"in=${a.inB / 1024}%8dK sr=${a.srB / 1024}%8dK sw=${a.swB / 1024}%8dK " +
          f"cpu=${a.cpuMs}%6dms  $desc")
      }
    })
    for (n <- names) {
      // warm-up compile pass, as in Bench
      try { SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save() } catch { case _: Throwable => () }
      spark.catalog.clearCache()
      PipelineQueries.clearPairsMemo()
      lines.clear()
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
      val el = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let job-end events drain
      println(s"===== $n: ${el}s =====")
      lines.forEach(l => println(l))
      spark.catalog.clearCache()
      PipelineQueries.clearPairsMemo()
    }
    spark.stop()
  }
}
