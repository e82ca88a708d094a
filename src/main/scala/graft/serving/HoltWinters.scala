package graft.serving

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Graphite's Holt-Winters triple-exponential smoothing — the render
  * API's alerting family (holtWintersForecast / ConfidenceBands /
  * Aberration). The recurrence is inherently sequential per series
  * (each slot's state feeds the next), so it runs as one typed
  * mapGroups pass per metric: one shuffle on the series key, each
  * group a bounded slot scan (the fetch window), state O(season) —
  * the same partitioning story as every per-series window transform.
  *
  * Semantics follow graphite-web's holtWintersAnalysis: alpha=0.1,
  * beta=0.0035, gamma=0.1, season = 1 day of slots (step inferred as
  * the minimum positive ts delta per series); the first point predicts
  * itself; a gap (None) appends a None intercept / zero slope /
  * zero seasonal / carried prediction and resets the next prediction,
  * exactly the reference's "do the best we can" branch. The bootstrap
  * (graphite re-fetches 7 extra days before the render window to warm
  * the seasonal state, then crops) lives in TargetEval's holtWinters
  * branch + the serving layer's windowed fetch; this object analyzes
  * whatever window it is handed.
  */
object HoltWinters {

  final case class Analysis(predictions: Array[Option[Double]],
                            deviations: Array[Option[Double]])

  /** The graphite recurrence over one series' (sorted) values. */
  def analysis(values: Array[Option[Double]], seasonLength: Int): Analysis = {
    val alpha = 0.1; val beta = 0.0035; val gamma = 0.1
    val n = values.length
    val intercepts = new Array[Option[Double]](n)
    val slopes = new Array[Double](n)
    val seasonals = new Array[Double](n)
    val predictions = new Array[Option[Double]](n)
    val deviations = new Array[Option[Double]](n)
    def lastSeasonal(i: Int): Double = {
      val j = i - seasonLength
      if (j >= 0) seasonals(j) else 0.0
    }
    def lastDeviation(i: Int): Double = {
      val j = i - seasonLength
      if (j >= 0) deviations(j).getOrElse(0.0) else 0.0
    }
    var nextPred: Option[Double] = None
    var i = 0
    while (i < n) {
      values(i) match {
        case None =>
          intercepts(i) = None
          slopes(i) = 0.0
          seasonals(i) = 0.0
          predictions(i) = nextPred
          deviations(i) = Some(0.0)
          nextPred = None
        case Some(actual) =>
          var lastIntercept = 0.0
          var lastSlope = 0.0
          var prediction: Option[Double] = None
          if (i == 0) {
            lastIntercept = actual
            lastSlope = 0.0
            // the first prediction is the first observation
            prediction = Some(actual)
          } else {
            lastIntercept = intercepts(i - 1).getOrElse(actual)
            lastSlope = slopes(i - 1)
            prediction = nextPred
          }
          val ls = lastSeasonal(i)
          val intercept = alpha * (actual - ls) + (1 - alpha) * (lastIntercept + lastSlope)
          val slope = beta * (intercept - lastIntercept) + (1 - beta) * lastSlope
          val seasonal = gamma * (actual - intercept) + (1 - gamma) * ls
          val deviation =
            gamma * math.abs(actual - prediction.getOrElse(0.0)) + (1 - gamma) * lastDeviation(i)
          intercepts(i) = Some(intercept)
          slopes(i) = slope
          seasonals(i) = seasonal
          predictions(i) = prediction
          deviations(i) = Some(deviation)
          // AFTER seasonals(i) is written: at seasonLength == 1 (daily or
          // coarser slots) lastSeasonal(i + 1) reads index i — before the
          // write it silently returned the array default 0
          val nextLastSeasonal = lastSeasonal(i + 1)
          nextPred = Some(intercept + slope + nextLastSeasonal)
      }
      i += 1
    }
    Analysis(predictions, deviations)
  }

  /** Run the analysis per series over a (metric, ts, value) frame and
    * emit one row per input slot:
    * (metric, ts, value, prediction, deviation). Step (and with it the
    * one-day season length) is inferred per series from the minimum
    * positive ts delta.
    */
  def analyzed(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("metric"), col("ts"), col("value"))
      .as[(String, Long, Option[Double])]
      .groupByKey(_._1)
      .flatMapGroups { (metric, it) =>
        val rows = it.toArray.sortBy(_._2)
        val ts = rows.map(_._2)
        val values = rows.map(_._3)
        val step =
          if (ts.length < 2) 60L
          else ts.sliding(2).map(p => p(1) - p(0)).filter(_ > 0).minOption.getOrElse(60L)
        val season = math.max(1L, 86400L / math.max(1L, step)).toInt
        val a = analysis(values, season)
        rows.indices.iterator.map { i =>
          (metric, ts(i), values(i), a.predictions(i), a.deviations(i))
        }
      }
      .toDF("metric", "ts", "value", "prediction", "deviation")
  }
}
