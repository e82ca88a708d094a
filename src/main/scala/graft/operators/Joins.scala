package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators the reference's TSDB model implies but Spark
  * lacks as built-ins: backward as-of join and interval×point range join.
  * Both are expressed as compositions of existing operators (the brief's
  * preference order (a)) with plans that survive scale:
  *
  *  - as-of = union the two sides, ONE shuffle on the join keys, and a
  *    running `last(..., ignoreNulls)` window — never a per-row range probe
  *    or a theta join;
  *  - range join = explode intervals to the coarse time buckets they
  *    overlap, equi-join points on bucket (uniform shuffle keys), then
  *    refine with the exact predicate — never `a.join(b, lo <= ts && ts <
  *    hi)` which Spark executes as BroadcastNestedLoopJoin (O(N×M), the
  *    100 TB killer).
  */
object Joins {

  /** Backward as-of join: for every left row, attach `rightVals` from the
    * latest right row in the same `keys` group whose `rightTs` <=  the left
    * row's `leftTs` (null columns when no such row exists).
    *
    * Contract: `left`'s non-key columns (including `leftTs`) must be
    * disjoint from `keys`; attached columns are named `prefix + c`.
    * A right row AT the left timestamp counts (<=, matching DuckDB's
    * ASOF JOIN and pandas merge_asof defaults); among right rows sharing
    * (keys, ts) the tie goes to the greatest `rightVals` tuple by struct
    * order — callers wanting reference LWW semantics pass an arrival/offset
    * column first in `rightVals`.
    */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTs: String, rightTs: String, rightVals: Seq[String],
           prefix: String = "asof_"): DataFrame = {
    val payload = left.columns.filterNot(c => keys.contains(c) || c == leftTs).toSeq
    val rTypes = rightVals.map(c => right.schema(c).dataType)
    // union schema: keys ++ __ts ++ __side ++ left payload ++ right vals
    val rSide = right.select(
      keys.map(col) ++ Seq(col(rightTs).as("__ts"), lit(0).as("__side")) ++
        payload.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightVals.map(c => col(c).as(prefix + c)): _*)
    val lSide = left.select(
      keys.map(col) ++ Seq(col(leftTs).as("__ts"), lit(1).as("__side")) ++
        payload.map(col) ++
        rightVals.zip(rTypes).map { case (c, t) => lit(null).cast(t).as(prefix + c) }: _*)
    // right rows sort before left rows at equal ts so "at the timestamp"
    // matches. The right values ride as ONE nullable struct (__row): a
    // single last(__row, ignoreNulls) picks the whole winning row as a
    // unit, so a NULL inside a right value is carried faithfully instead
    // of falling through to an older row's value (per-column last() would
    // mix columns across rows whenever a right value is NULL).
    val rowStruct = struct(rightVals.map(c => col(prefix + c)): _*)
    val unioned = rSide.unionByName(lSide)
      .withColumn("__row", when(col("__side") === 0, rowStruct))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"), col("__row"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val attached = unioned
      .withColumn("__asof", last(col("__row"), ignoreNulls = true).over(w))
    attached.where(col("__side") === 1)
      .select(keys.map(col) ++ Seq(col("__ts").as(leftTs)) ++
        payload.map(col) ++
        rightVals.map(c => col(s"__asof.$prefix$c").as(prefix + c)): _*)
  }

  /** Interval×point range join: inner-join every `intervals` row to the
    * `points` rows with `lo <= ts < hi` (timestamps as LONG numerics, e.g.
    * epoch ns), with no equi-key required. `bucket` is the coarse blocking
    * granularity IN THE SAME UNIT — pick it near the typical interval width
    * so each interval explodes to ~2 bucket rows. Column names must be
    * disjoint between the two sides.
    *
    * Bucketing is exact long arithmetic (align = ts - ts % bucket; epoch-ns
    * values exceed double's 2^53 exact range, so float division would
    * misplace boundary points). Each point lives in exactly one bucket, so
    * a (interval, point) pair meets exactly once — no post-join dedup.
    */
  def rangePoints(intervals: DataFrame, points: DataFrame,
                  lo: Column, hi: Column, ts: Column, bucket: Long): DataFrame = {
    def align(c: Column): Column = c - pmod(c, lit(bucket))
    // empty/inverted intervals (lo >= hi) match nothing by definition —
    // filtered before the explode, where sequence(start > stop, +step)
    // would throw instead of yielding zero rows
    val iv = intervals.where(lo < hi).withColumn("__b",
      explode(sequence(align(lo), align(hi - 1), lit(bucket))))
    val pt = points.withColumn("__b", align(ts))
    iv.join(pt, iv("__b") === pt("__b") && ts >= lo && ts < hi)
      .drop("__b")
  }
}
