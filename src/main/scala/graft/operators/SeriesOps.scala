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
                sumCol: String, nCol: String, rangeLen: Long): DataFrame =
    chunkedTrailing(rollup, keys, tsCol, rangeLen) { (df, base) =>
      val w = base.rangeBetween(-rangeLen, Window.currentRow)
      df.withColumn("mov_sum", sum(col(sumCol)).over(w))
        .withColumn("mov_n", sum(col(nCol)).over(w))
        .withColumn("mavg", round(col("mov_sum").cast("double") / col("mov_n"), 6))
        .drop("mov_sum")
    }

  /** Parallelize a per-key TRAILING-range window over long histories:
    * partition by (keys, 64×range time-chunk) and duplicate each chunk's
    * trailing `rangeLen` tail as a halo into the next chunk, so every
    * emitted row still sees its full trailing frame. A plain per-key
    * window serializes a key's entire history through ONE task — at a
    * decade of 60s slots that is millions of rows per partition (the
    * round-8 100×-events finding: ts_anomaly 2.6 s at one month of
    * history, 67 s at 8.5 years on the same 5 series). Halo rows only
    * FEED frames — they are dropped after the window — so results are
    * bit-identical to the unchunked form (the aggregates ride decimals /
    * longs, associative under any partitioning); the overhead is the
    * 1/64 halo duplication.
    */
  private def chunkedTrailing(rollup: DataFrame, keys: Seq[String],
                              tsCol: String, rangeLen: Long)(
      build: (DataFrame, org.apache.spark.sql.expressions.WindowSpec) => DataFrame): DataFrame = {
    val chunkLen = rangeLen * 64
    val chunk = floor(col(tsCol) / chunkLen)
    // one explode, not a self-union: a union's halo-side filter pushes
    // into the (often expensive, aggregated) upstream and defeats exchange
    // reuse — the rollup would compute twice
    val own = struct(chunk.as("__chunk"), lit(false).as("__halo"))
    // pmod, not %: Spark's % keeps the dividend's sign, so a pre-1970
    // (negative) slot near a chunk boundary would fail the halo gate and
    // silently starve the next chunk's trailing frames (floor() already
    // handles negatives for the chunk id itself)
    val tagged = rollup.withColumn("__t",
      explode(when(pmod(col(tsCol), lit(chunkLen)) >= chunkLen - rangeLen,
        array(own, struct((chunk + 1).as("__chunk"), lit(true).as("__halo"))))
        .otherwise(array(own))))
      .withColumn("__chunk", col("__t.__chunk"))
      .withColumn("__halo", col("__t.__halo"))
      .drop("__t")
    val w = Window.partitionBy(keys.map(col) :+ col("__chunk"): _*)
      .orderBy(col(tsCol))
    build(tagged, w).where(!col("__halo")).drop("__chunk", "__halo")
  }

  /** Trailing z-score anomaly flags over a rolled-up slot table — the
    * holtWintersAberration-flavored serving transform: a slot is anomalous
    * when it deviates from the mean of its own trailing window by more than
    * `zThresh` standard deviations. The window ends at the PREVIOUS slot
    * (`[ts - rangeLen, ts - 1]`): a spike must not damp its own baseline.
    *
    * Exactness: slot sums and squared sums ride as decimals, so the
    * trailing mean/variance numerators are exact integers scaled by the
    * decimal scale — order-free under any partitioning; doubles appear
    * only in the final closed form (variance cast, IEEE-correctly-rounded
    * sqrt, one compare), identically in both engines. Slots with fewer
    * than `minSlots` predecessors report NULL (no baseline, not "normal").
    *
    * Input contract as [[movingAvg]], plus `sqCol` = decimal slot sum of
    * squares. Window math runs over bounded slot counts, never raw points.
    */
  def anomalyFlags(rollup: DataFrame, keys: Seq[String], tsCol: String,
                   sumCol: String, sqCol: String, nCol: String,
                   rangeLen: Long, zThresh: Double, minSlots: Int): DataFrame =
    chunkedTrailing(rollup, keys, tsCol, rangeLen) { (df, base) =>
      val w = base.rangeBetween(-rangeLen, -1)
      val n = sum(col(nCol)).over(w)
      val s = sum(col(sumCol)).over(w)
      val s2 = sum(col(sqCol)).over(w)
      val slotMean = col(sumCol).cast("double") / col(nCol)
      // population variance over the trailing points: (n·Σx² − (Σx)²)/n² —
      // numerator exact in decimal, one double division at the end
      val mean = s.cast("double") / col("__wn")
      val variance = (col("__wn") * s2 - s * s).cast("double") /
        (col("__wn") * col("__wn")).cast("double")
      df
        .withColumn("__wn", n)
        .withColumn("base_mean", round(mean, 6))
        .withColumn("base_std", round(sqrt(variance), 6))
        .withColumn("z",
          when(col("__wn") >= minSlots && sqrt(variance) > 0,
            round((slotMean - mean) / sqrt(variance), 6)))
        .withColumn("is_anom",
          when(col("__wn") >= minSlots && sqrt(variance) > 0,
            (abs(slotMean - mean) > lit(zThresh) * sqrt(variance)).cast("int")))
        .withColumn("base_mean", when(col("__wn") >= minSlots, col("base_mean")))
        .withColumn("base_std", when(col("__wn") >= minSlots, col("base_std")))
        .drop("__wn")
    }

  /** Top-k series by windowed integral (the sortByTotal/highestMax family
    * of serving-side series selection): rank keys by their exact decimal
    * total over the window, keep the top `k` (total desc, key asc), and
    * return those keys' full slot series tagged with the rank. Totals are
    * ONE partial-aggregated pass; the rank table is k rows and broadcasts
    * back onto the slot table — series data never shuffles for selection.
    */
  def topKByTotal(rollup: DataFrame, keyCol: String, tsCol: String,
                  sumCol: String, k: Int): DataFrame = {
    val totals = rollup.groupBy(col(keyCol))
      .agg(sum(col(sumCol)).as("__total"))
    // orderBy+limit plans a distributed TakeOrderedAndProject (per-partition
    // top-k then a k-row merge) — a bare row_number window over the totals
    // would drag EVERY key's total into one partition; the rank window here
    // only ever sees the k survivors
    val w = Window.orderBy(col("__total").desc, col(keyCol))
    val top = totals.orderBy(col("__total").desc, col(keyCol)).limit(k)
      .withColumn("rank", row_number().over(w))
      .withColumn("total", col("__total").cast("double"))
      .drop("__total")
    rollup.join(broadcast(top), keyCol)
  }
}
