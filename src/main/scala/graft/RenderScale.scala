package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: series-cardinality scaling for the render-target layer.
  * Synthesizes S series x T slots DISTRIBUTED (spark.range, no driver
  * materialization), evaluates a representative target per function
  * family at S and 10S, and prints per-target wall seconds — evidence
  * that the groupBy(ts) combiners, per-series windows, and winner-frame
  * selectors scale linearly in series count (the axis a 100 TB metric
  * estate grows along). Not part of the driver contract.
  *
  * Usage: runMain graft.RenderScale [baseSeries] [slots]
  */
object RenderScale {
  def main(args: Array[String]): Unit = {
    val baseS = if (args.length > 0) args(0).toInt else 20000
    val slots = if (args.length > 1) args(1).toInt else 96
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def frame(series: Int) =
      spark.range(series.toLong * slots).select(
        concat(lit("app.g"), (col("id") % 50).cast("string"),
          lit(".m"), (col("id") / slots).cast("string")).as("metric"),
        (col("id") % slots) * 60L + 60L as "ts",
        // deterministic, non-constant, a sprinkling of nulls (gaps)
        when(pmod(col("id"), lit(97)) =!= 0,
          pmod(col("id") * 7919L, lit(10007)).cast("double") / 100.0).as("value"))

    val targets = Seq(
      "sumSeries(app.*.*)",                 // cross-series combine
      "groupByNode(app.*.*,1,\"sum\")",     // grouped combine (50 groups)
      "percentileOfSeries(app.*.*,50)",     // per-ts rank over S values
      "movingAverage(app.*.*,5)",           // per-series window
      "nPercentile(app.*.*,95)",            // two-window per-series rank
      "highestAverage(app.*.*,10)",         // winner-frame selector
      "averageAbove(app.*.*,50)")           // threshold filter
    for (mult <- Seq(1, 10); s = baseS * mult) {
      val df = frame(s)
      for (t <- targets) {
        val expr = serving.TargetLang.parse(t)
        val t0 = System.nanoTime()
        serving.TargetEval.eval(expr, g => serving.TargetEval.globFilter(df, g))
          .write.format("noop").mode("overwrite").save()
        println(f"RENDERSCALE S=$s%-7d ${(System.nanoTime() - t0) / 1e9}%8.2fs  $t")
      }
    }
    spark.stop()
  }
}
