package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Dev lane (round-12 verdict Next #3): exercise every connected-components
  * tier at corpus scale. Since the round-12 driver finish, every graded
  * corpus takes tier 1 (raw pair graph collected into the exact driver
  * union-find) — the contraction tier and the distributed min-label rounds
  * that guard 100 TB otherwise run only in unit tests. This main runs the
  * SAME pair graph through all three tiers by lowering the driver edge cap
  * (0 disables both driver tiers; 1 admits only the contracted graph) and
  * pins label equality across them plus per-tier wall clock. Not part of
  * the driver contract.
  *
  * Usage: graft.CcScale <corpusDir>
  */
object CcScale {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // one shared, checkpointed pair graph: the lane measures the TIERS,
    // not the candidate generation in front of them
    val pairs = Dedup.minhashLshPairs(
        Queries.spread(Queries.table(spark, dir, "documents")),
        3, PipelineQueries.MinhashBands, PipelineQueries.MinhashRows,
        PipelineQueries.MinhashBucketCap)
      .localCheckpoint()
    val nPairs = pairs.count()

    def labelsHash(df: DataFrame): (Long, Long) = {
      val row = df.agg(
        sum(crc32(concat_ws("|", col("node").cast("string"), col("label").cast("string")))),
        count(lit(1))).collect()(0)
      (row.getLong(0), row.getLong(1))
    }
    def run(tier: String, cap: Long): (Long, Long, Double) = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val labels = Dedup.clusterLabels(pairs, PipelineQueries.ClusterIters,
        checkConverged = false, driverFinishMaxEdges = cap)
      val h = labelsHash(labels)
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"""{"lane":"cc","tier":"$tier","cap":$cap,"pairs":$nPairs,"nodes":${h._2},"hash":${h._1},"wall":$wall%.2f}""")
      (h._1, h._2, wall)
    }
    // warm-up: compile the plans once so tier walls compare like for like
    run("warmup-driver-raw", Long.MaxValue)

    val t1 = run("driver-raw", Long.MaxValue) // tier 1: exact driver union-find on the raw graph
    // cap below the raw edge count but above the contracted graph's: skips
    // tier 1, admits the contracted root graph to the driver union-find
    val t2 = run("driver-contracted", nPairs - 1)
    val t3 = run("distributed-rounds", 0L)    // tier 3: contraction + distributed min-label rounds
    val ok = t1._1 == t2._1 && t2._1 == t3._1 && t1._2 == t2._2 && t2._2 == t3._2
    println(s"""{"lane":"cc","result":"${if (ok) "PASS" else "FAIL"}","labels_equal":$ok}""")
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
