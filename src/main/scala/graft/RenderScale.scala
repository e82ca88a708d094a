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

    // Spark's `/` on a bigint is FRACTIONAL division — a stray double in
    // the name would add dots and break the 3-node glob silently, so the
    // series index floors to an integer and the group node is a function
    // of the SERIES (constant across its slots), not the row. One builder
    // for both naming lanes so the slot math / gap pattern can't drift.
    def frameNamed(series: Int)(nameOf: org.apache.spark.sql.Column
                                => org.apache.spark.sql.Column) = {
      val sid = floor(col("id") / slots.toDouble).cast("long")
      spark.range(series.toLong * slots).select(
        nameOf(sid).as("metric"),
        pmod(col("id"), lit(slots.toLong)) * 60L + 60L as "ts",
        // deterministic, non-constant, a sprinkling of nulls (gaps)
        when(pmod(col("id"), lit(97)) =!= 0,
          pmod(col("id") * 7919L, lit(10007)).cast("double") / 100.0).as("value"))
    }
    def frame(series: Int) = frameNamed(series)(sid =>
      concat(lit("app.g"), pmod(sid, lit(50L)).cast("string"),
        lit(".m"), sid.cast("string")))

    val targets = Seq(
      "sumSeries(app.*.*)",                 // cross-series combine
      "groupByNode(app.*.*,1,\"sum\")",     // grouped combine (50 groups)
      "percentileOfSeries(app.*.*,50)",     // per-ts rank over S values
      "movingAverage(app.*.*,5)",           // per-series window
      "nPercentile(app.*.*,95)",            // two-window per-series rank
      "highestAverage(app.*.*,10)",         // winner-frame selector
      "averageAbove(app.*.*,50)")           // threshold filter
    def evalT(df: org.apache.spark.sql.DataFrame, t: String) =
      serving.TargetEval.eval(serving.TargetLang.parse(t),
        g => serving.TargetEval.globFilter(df, g))
    for (mult <- Seq(1, 10); s = baseS * mult) {
      val df = frame(s)
      // guard against the measure-nothing failure mode: the glob must
      // actually select the synthesized series before anything is timed
      require(evalT(df, "sumSeries(app.*.*)").limit(1).count() == 1,
        "scaling frame produced no glob-matching series")
      for (t <- targets) {
        val t0 = System.nanoTime()
        evalT(df, t).write.format("noop").mode("overwrite").save()
        println(f"RENDERSCALE S=$s%-7d ${(System.nanoTime() - t0) / 1e9}%8.2fs  $t")
      }
    }

    // tag-family lane: the same S x T frame under graphite TAGGED naming
    // (`cpu;dc=dK;host=hSID`) — seriesByTag is regexp_extract predicates in
    // the scan, groupByTags one groupBy bounded by groups x slots, so both
    // should track the name-glob lane linearly in S
    def taggedFrame(series: Int) = frameNamed(series)(sid =>
      concat(lit("cpu;dc=d"), pmod(sid, lit(8L)).cast("string"),
        lit(";host=h"), sid.cast("string")))
    val tagTargets = Seq(
      "seriesByTag('name=cpu','dc=d3')",                        // exact-filter discovery
      "groupByTags(seriesByTag('name=cpu','host=~h1'),'sum','dc')", // regex + grouped combine
      "aliasByTags(seriesByTag('name=cpu','dc!=d0'),'host','dc')")  // negation + rename
    for (mult <- Seq(1, 10); s = baseS * mult) {
      val df = taggedFrame(s)
      require(evalT(df, "seriesByTag('name=cpu')").limit(1).count() == 1,
        "tagged scaling frame produced no tag-matching series")
      for (t <- tagTargets) {
        val t0 = System.nanoTime()
        evalT(df, t).write.format("noop").mode("overwrite").save()
        println(f"RENDERSCALE S=$s%-7d ${(System.nanoTime() - t0) / 1e9}%8.2fs  $t")
      }
    }
    spark.stop()
  }
}
