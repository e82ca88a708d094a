package graft.storage

import graft.core.{AggMethod, Archive}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core time-series dataflow operators, expressed as declarative DataFrame
  * transforms over the long format `(metric: string, ts: long epoch-seconds,
  * value: double)` so Catalyst handles pushdown/pruning/codegen.
  *
  * Semantics re-derived from the reference TSDB's write/fetch pipeline
  * (reference: kenshin/storage.py:384-700), re-based on Spark groupBy/window
  * aggregation instead of seek-and-pack ring-buffer files.
  */
object TimeSeries {

  /** Floor-align timestamps to an archive step
    * (reference alignment: kenshin/storage.py:429).
    */
  def alignTs(ts: Column, stepSeconds: Int): Column =
    (ts - pmod(ts, lit(stepSeconds.toLong))).cast("long")

  /** Align a batch to `step` and keep the last write per (metric, aligned ts).
    * The reference dedupes duplicate aligned timestamps by taking the last
    * (kenshin/storage.py:441-445); we standardize on last-write-wins ordered
    * by `arrival` (the raw pre-floor event time or an explicit source
    * offset — NOT a partition-dependent id, so replay is deterministic),
    * ties broken by the larger value. The winning row's arrival is kept for
    * downstream cross-batch LWW. One shuffle on (metric, aligned_ts).
    */
  def alignDedup(df: DataFrame, stepSeconds: Int, arrival: Column): DataFrame = {
    val w = Window.partitionBy(col("metric"), col("aligned_ts"))
      .orderBy(arrival.desc, col("value").desc)
    df.withColumn("aligned_ts", alignTs(col("ts"), stepSeconds))
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .select(col("metric"), col("aligned_ts").as("ts"), col("value"), arrival.as("arrival"))
  }

  /** Downsample one level into the next coarser level: tumbling window of
    * `stepSeconds`, one of the five closed aggregation methods. Nulls are
    * ignored natively (all-null group -> null), matching filter_values
    * (reference: kenshin/storage.py:588-615). Single shuffle with map-side
    * partial aggregation.
    */
  def rollup(df: DataFrame, stepSeconds: Int, agg: AggMethod): DataFrame =
    df.groupBy(col("metric"), alignTs(col("ts"), stepSeconds).as("ts"))
      .agg(agg.expr(col("value"), col("ts")).as("value"))

  /** Fetch-window clamp (reference: kenshin/storage.py:626-637):
    * reject inverted ranges, clamp to [now - maxRetention, now]; None when
    * the requested range is entirely outside the retained window.
    */
  def clampWindow(fromTime: Long, untilTime: Long, now: Long, maxRetention: Long): Option[(Long, Long)] = {
    if (fromTime >= untilTime) return None
    val oldest = now - maxRetention
    if (fromTime > now || untilTime < oldest) return None
    val from = math.max(fromTime, oldest)
    val until = math.min(untilTime, now)
    Some((from, until))
  }

  /** Archive selection: the finest archive whose retention covers
    * `now - fromTime` (reference: kenshin/storage.py:639-642). Returns the
    * level index into the finest-first cascade. This is the fetch planner's
    * key property at scale: older queries read coarser (smaller) tables, so
    * scan size is bounded independently of raw data volume.
    */
  def selectArchive(archives: Seq[Archive], fromTime: Long, now: Long): Int = {
    val diff = now - fromTime
    val i = archives.indexWhere(_.retention >= diff)
    if (i >= 0) i else archives.length - 1
  }

  /** Route points to cascade levels by age: each point lands in the finest
    * archive whose retention covers `now - ts`; older than all -> level -1
    * (dropped, counted by caller). Reference: kenshin/storage.py:397-419.
    * Pure projection — no shuffle.
    */
  def ageRoute(df: DataFrame, archives: Seq[Archive], now: Long): DataFrame = {
    val age = lit(now) - col("ts")
    val level = archives.zipWithIndex.foldRight(lit(-1): Column) {
      case ((archive, i), elseCol) => when(age <= archive.retention, lit(i)).otherwise(elseCol)
    }
    df.withColumn("level", level)
  }

  /** Gap-fill a fetched range against a dense time spine: one row per
    * (metric, slot) in [from, until) at `step`, null value where no data
    * (reference fetch pre-allocates null points: kenshin/storage.py:650-693).
    * The spine (metrics x slots) is tiny relative to data and broadcast.
    *
    * `spineMetrics` (a 1-column `metric` frame, normally the catalog table)
    * supplies the series list; without it the spine is derived from the
    * fetched rows themselves — fine for tests, but a fetch at scale should
    * never scan data to learn metric names, and silent series would vanish
    * instead of fetching as all-null.
    */
  def gapFill(df: DataFrame, fromTime: Long, untilTime: Long, stepSeconds: Int,
              spineMetrics: Option[DataFrame] = None): DataFrame = {
    val from = roundup(fromTime, stepSeconds)
    val until = roundup(untilTime, stepSeconds)
    val spine = spineMetrics.getOrElse(df.select(col("metric")).distinct())
      .select(col("metric"),
        explode(sequence(lit(from), lit(until - stepSeconds), lit(stepSeconds.toLong))).as("ts"))
    spine.join(df, Seq("metric", "ts"), "left")
      .select(col("metric"), col("ts"), col("value"))
  }

  /** Ceil to a multiple of base (reference: kenshin/utils.py:32-44, used for
    * fetch boundary alignment kenshin/storage.py:647-648).
    */
  def roundup(x: Long, base: Int): Long = {
    val r = x % base
    if (r == 0) x else x + (base - r)
  }

  /** Last-write-wins merge of duplicate `(metric, ts)` rows by `arrival`
    * (ties broken by larger value — deterministic under replay). The
    * read-side half of the reference's idempotent slot overwrite
    * (kenshin/storage.py:429-445). Map-side partial agg, one shuffle.
    */
  def lwwMerge(df: DataFrame): DataFrame =
    df.groupBy(col("metric"), col("ts"))
      .agg(
        max_by(col("value"), struct(col("arrival"), col("value"))).as("value"),
        max(col("arrival")).as("arrival"))

  /** Merge the hot (pre-flush, streaming-state) view with historical storage,
    * hot-wins on overlap — the reference stitches its in-memory cache with
    * on-disk archives (rurouni/cache.py:161-169 + web-side merge). Implemented
    * as history anti-joined against hot keys, then union: no row from history
    * survives where hot has the same (metric, ts).
    */
  def mergeHotHistorical(hot: DataFrame, historical: DataFrame): DataFrame = {
    val hotKeys = hot.select(col("metric"), col("ts"))
    historical.join(hotKeys, Seq("metric", "ts"), "left_anti")
      .unionByName(hot.select(col("metric"), col("ts"), col("value")))
  }
}
