package graft
import org.apache.spark.sql.SparkSession

/** Dev harness: dump every judged query's formatted physical plan to one
  * file and print a shuffle census (exchanges / broadcasts / sort-merge
  * joins / codegen spans per query) — the per-round plan-shape audit
  * trail: a regression that swaps a broadcast join for a sort-merge join
  * or adds an exchange shows up as a one-line diff here long before it
  * shows up as wall time at scale. Not part of the driver contract.
  *
  * Usage: runMain graft.PlanDump [outFile] (default /tmp/plans.txt)
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0) else "/tmp/plans.txt"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sb = new StringBuilder
    val census = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Int, Int, Int)]
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      val plan =
        try fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        catch { case e: Throwable => s"ERROR: $e" }
      sb.append(s"===== $name =====\n").append(plan).append("\n")
      def cnt(needle: String): Int = {
        var (i, n) = (0, 0)
        while ({ i = plan.indexOf(needle, i); i >= 0 }) { n += 1; i += needle.length }
        n
      }
      // formatted mode marks codegen membership per operator as
      // "[codegen id : N]" — distinct ids = whole-stage codegen spans
      val spans = "\\[codegen id : (\\d+)\\]".r
        .findAllMatchIn(plan).map(_.group(1)).toSet.size
      // shuffle-specific marker only: formatted mode prints shuffle nodes
      // as "+- Exchange (N)" (partitioning goes on a separate Arguments
      // line), while broadcast/reuse nodes are "+- BroadcastExchange (N)" /
      // "+- ReusedExchange (N)" — the "- Exchange (" needle matches only
      // the true shuffles, so a shuffle<->broadcast swap shows in the diff
      val shuffles = cnt("- Exchange (")
      census += ((name, shuffles, cnt("BroadcastHashJoin") + cnt("BroadcastNestedLoopJoin"),
        cnt("SortMergeJoin"), spans))
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), sb.toString)
    println(f"${"query"}%-24s ${"exch"}%5s ${"bcast"}%5s ${"smj"}%5s ${"wscg"}%5s")
    census.sortBy(-_._2).foreach { case (n, e, b, s, w) =>
      println(f"$n%-24s $e%5d $b%5d $s%5d $w%5d")
    }
    println(s"plans written to $out")
    spark.stop()
  }
}
