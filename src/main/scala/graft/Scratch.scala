package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// throwaway diagnostic — not committed
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val orders = Queries.table(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
    val li = Queries.table(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"))
    val edges = orders.join(li, col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))
    var n = 0
    graft.operators.Graph.pagerank(edges, 2, dedupEdges = true,
      roundProbe = (contrib, next) => {
        n += 1
        if (n == 2) {
          // round 2: caches fully built — the steady-state plan
          contrib.queryExecution.toRdd.foreach(_ => ())
          println("##### contrib round2 EXECUTED\n" +
            contrib.queryExecution.explainString(
              org.apache.spark.sql.execution.SimpleMode))
        }
      })
    spark.stop()
  }
}
