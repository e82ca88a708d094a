package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Derived-series operators over long-format streams: per-key rates
  * (counter derivative with reset clamping) and trailing moving averages —
  * the serving-side transforms a Graphite-style stack computes on fetch
  * (the reference stores raw + downsampled series and leaves derivation to
  * the web layer; here they are first-class distributed operators).
  *
  * Scale posture: `rate` is ONE shuffle, partitioned by the entity key —
  * key cardinality (users / metrics, millions in production) provides the
  * parallelism, and each partition is a linear lag scan. `movingAvg` runs
  * its range frame over an ALREADY-ROLLED-UP slot table (bounded rows per
  * key: retention/step), never over raw points — the rollup does the volume
  * reduction, the window does bounded-frame math on slots.
  */
object SeriesOps {

  /** Per-key non-negative derivative, per second (the classic counter-rate
    * transform: negative deltas are counter resets, clamped to 0). `tsCol`
    * is an integer microsecond timestamp; `orderCols` must make the
    * per-key order total (ties on ts broken by a unique id) so lag() is
    * deterministic under any partitioning.
    *
    * First point per key has no predecessor: rate is null, kept (callers
    * filter if they want gaps dropped). dt <= 0 (duplicate timestamp after
    * the tie-break) also yields null rather than an infinite rate.
    */
  def rate(df: DataFrame, keys: Seq[String], tsCol: String, valueCol: String,
           orderCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderCols.map(col): _*)
    val dt = col(tsCol) - col("prev_us")
    df.withColumn("prev_us", lag(col(tsCol), 1).over(w))
      .withColumn("prev_v", lag(col(valueCol), 1).over(w))
      .withColumn("rate_ps",
        when(col("prev_us").isNotNull && dt > 0,
          // fixed IEEE op order (sub, clamp, mul, div) so the oracle's
          // identical expression reproduces the same double bit-for-bit
          round(greatest(col(valueCol) - col("prev_v"), lit(0.0)) * lit(1000000.0)
            / dt.cast("double"), 6)))
      .drop("prev_v")
  }

  /** Trailing moving average over a rolled-up slot table: for each key and
    * slot, the mean of `valueCol` across slots in `[ts - rangeLen, ts]`.
    * Sums travel as decimals (associative, engine-exact); the divide happens
    * once at the end — so the result is bit-identical across engines and
    * partitionings, unlike a floating `avg().over(range)` whose accumulation
    * order is unspecified.
    *
    * Input contract: one row per (keys, tsCol) — i.e. a rollup output, where
    * rows per key are bounded by retention/step — with `sumCol` a decimal
    * slot sum and `nCol` its point count.
    */
  def movingAvg(rollup: DataFrame, keys: Seq[String], tsCol: String,
                sumCol: String, nCol: String, rangeLen: Long): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(tsCol))
      .rangeBetween(-rangeLen, Window.currentRow)
    rollup
      .withColumn("mov_sum", sum(col(sumCol)).over(w))
      .withColumn("mov_n", sum(col(nCol)).over(w))
      .withColumn("mavg", round(col("mov_sum").cast("double") / col("mov_n"), 6))
      .drop("mov_sum")
  }
}
