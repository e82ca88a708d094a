package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Two-phase salted aggregation for skew-heavy group keys. A plain
  * `groupBy(k)` puts every row of a hot key through one reducer; at 100 TB
  * a single hot metric (or a boilerplate dedup digest) turns one task into
  * the stage's critical path. Salting splits each key into `salts`
  * sub-groups for the first (partial) aggregation, then combines the
  * per-salt partials in a second, tiny aggregation — both shuffles are
  * uniform by construction.
  *
  * Only algebraic aggregates decompose this way; the combiners here cover
  * the engine's rollup set (sum/count/min/max — avg = sum/count at the
  * end). The salt is a deterministic hash of stable columns, NOT rand():
  * retries and replays must land rows in the same sub-group.
  *
  * (With AQE on, `spark.sql.adaptive.skewJoin` handles skewed JOINS
  * automatically; salted aggregation covers the groupBy side, which AQE
  * does not re-split.)
  *
  * MEASURED GUIDANCE (round-6 zipf-skew experiment, SURVEY addendum): for
  * algebraic aggregates over FINE-GRAINED keys, Spark's map-side partial
  * aggregation already absorbs per-key skew — each map task emits one
  * partial row per key, so a hot key's reducer receives at most one row
  * per task no matter how many raw rows the key holds. On a 10x corpus
  * with one metric carrying 50% of 1M rows, the plain (metric, slot)
  * rollup was unaffected (1.0s) while this salted form paid its second
  * shuffle for nothing (2.2s). Reach for salting only when the partial
  * layer cannot shrink the hot key's input: aggregation over an input
  * already partitioned by a super-key of the group key (the planner skips
  * the partial), or per-group state that grows with input (then prefer a
  * mergeable sketch over salting). Windows are the other real skew class —
  * the engine's ts windows stay skew-proof by always windowing over
  * rolled-up slot frames (bounded rows per key), never raw points.
  */
object SkewAgg {

  /** Decimal-exact salted sum + count (the rollup combiners):
    * phase 1 groups by (keys, salt) computing partial sums/counts,
    * phase 2 sums the partials per key. Result is bit-identical to the
    * unsalted aggregate because decimal addition is associative.
    */
  def saltedSumCount(df: DataFrame, keys: Seq[Column], keyNames: Seq[String],
                     value: Column, saltSource: Column, salts: Int,
                     sumName: String, cntName: String): DataFrame = {
    val salted = df.withColumn("__salt", pmod(Dedup.h32(saltSource.cast("string")), lit(salts.toLong)))
    val phase1 = salted
      .groupBy(keys :+ col("__salt"): _*)
      .agg(sum(value.cast("decimal(18,2)")).as("__psum"), count(lit(1)).as("__pcnt"))
    phase1
      .groupBy(keyNames.map(col): _*)
      .agg(sum(col("__psum")).cast("double").as(sumName),
        sum(col("__pcnt")).as(cntName))
  }
}
