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
    val census = scala.collection.mutable.ArrayBuffer.empty[(String, graft.plans.Census)]
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)
           if only.forall(_.contains(name))) {
      // EXECUTE each frame, then census the executed tree (round-10 verdict
      // #3: the pre-execution formatted explain carries no codegen ids
      // under AQE, so the old text census read wscg = 0 for ~90/95 queries
      // and could not catch an interpreter-fallback regression; counting is
      // now a tree walk — PlanCensus — deduped by node identity, because
      // the post-execution explain TEXT overcounts ~3x via Initial/Final
      // sections and repeated shared subtrees). The text dump stays for
      // human reads (PushedFilters etc.).
      val plan =
        try {
          val df = fn(spark, sfDir)
          val c = graft.plans.PlanCensus.executedCensus(df)
          census += ((name, c))
          df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
        } catch { case e: Throwable => s"ERROR: $e" }
      sb.append(s"===== $name =====\n").append(plan).append("\n")
      // per-query cache isolation: the CacheManager matches canonicalized
      // plans ACROSS queries, so without this a later query's census would
      // depend on which earlier query populated a shared banding cache
      spark.catalog.clearCache()
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), sb.toString)
    // the census TABLE goes to its own file too — the round-11 artifact
    // captured only the top-14 stdout rows (verdict #2); the committed
    // artifact must hold all rows
    val tab = new StringBuilder
    tab.append(f"${"query"}%-24s ${"exch"}%5s ${"bcast"}%5s ${"smj"}%5s ${"wscg"}%5s ${"fallback"}%s\n")
    census.sortBy(-_._2.shuffles).foreach { case (n, c) =>
      val fb = if (c.fallbacks.isEmpty) "-"
               else c.fallbacks.map(_.split('.').last).groupBy(identity)
                 .map { case (k, v) => s"$k x${v.size}" }.mkString(",")
      tab.append(f"$n%-24s ${c.shuffles}%5d ${c.broadcastJoins}%5d ${c.sortMergeJoins}%5d ${c.codegenSpans}%5d $fb%s\n")
    }
    print(tab)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out + ".census"), tab.toString)
    println(s"plans written to $out, census to $out.census")
    spark.stop()
  }
}
