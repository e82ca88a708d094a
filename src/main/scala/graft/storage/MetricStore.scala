package graft.storage

import graft.core.{Archive, StorageSchema}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** A multi-resolution metric store: one partitioned Parquet table per cascade
  * level (`level_0` = finest), replacing the reference's N-metrics-per-file
  * ring-buffer format (reference layout: kenshin/storage.py:21-33). Retention
  * becomes partition TTL; the ring's O(1) offset math becomes partition
  * pruning on a day-bucket column plus parquet min/max stats.
  *
  * Scale posture: every path is a partition-prunable scan + a single shuffle
  * aggregation; nothing collects to the driver. Level tables are partitioned
  * by `pday = floor(ts / 86400)` so a fetch touches only the days it asks
  * for, and the cascade's dirty-range propagation rewrites only affected
  * partitions (dynamic partition overwrite).
  */
final class MetricStore(val root: String, val schema: StorageSchema)(implicit spark: SparkSession) {

  val archives: Seq[Archive] = schema.archives
  private def levelPath(i: Int): String = s"$root/${schema.name}/level_$i"

  private def withPday(df: DataFrame): DataFrame =
    df.withColumn("pday", floor(col("ts") / 86400L))

  /** Ingest a batch of raw points `(metric, ts, value)` with an `arrival`
    * ordering column: align + last-write-wins to the level-0 step, route
    * by age (late points older than level-k retention land directly in
    * level k+1 — reference: kenshin/storage.py:397-419), drop points older
    * than everything, and append each slice to its level table.
    * Returns the number of dropped too-old points.
    */
  def writeBatch(points: DataFrame, now: Long): Long = {
    val routed = TimeSeries.ageRoute(points, archives, now).cache()
    try {
      // one pass to learn which levels have data (avoids empty parquet dirs)
      val counts = routed.groupBy(col("level")).count()
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      archives.indices.filter(counts.getOrElse(_, 0L) > 0).foreach { i =>
        val slice = routed.where(col("level") === i).drop("level")
        val deduped = TimeSeries.alignDedup(slice, archives(i).secondsPerPoint, col("arrival"))
        withPday(deduped).write
          .mode(SaveMode.Append)
          .partitionBy("pday")
          .parquet(levelPath(i))
      }
      counts.getOrElse(-1, 0L)
    } finally routed.unpersist()
  }

  private val levelSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("metric", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType)))

  /** Read one level, pruned to a time range (partition pruning on pday +
    * row-group pruning on ts).
    */
  def readLevel(i: Int, fromTime: Long, untilTime: Long): DataFrame =
    if (!hasData(levelPath(i)))
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], levelSchema)
    else
      spark.read.parquet(levelPath(i))
        .where(col("pday").between(fromTime / 86400L, untilTime / 86400L))
        .where(col("ts") >= fromTime && col("ts") < untilTime)
        .select(col("metric"), col("ts"), col("value"))

  /** Propagate a dirty time range from level i to level i+1 — the
    * downsample cascade (reference: kenshin/storage.py:510-586). Only the
    * affected pday partitions of level i+1 are rewritten. The dirty window
    * is widened to whole lower-step boundaries so partially-covered windows
    * are recomputed from source, never double-aggregated.
    */
  def propagate(i: Int, dirtyFrom: Long, dirtyUntil: Long): Unit = {
    require(i >= 0 && i < archives.length - 1, s"no coarser level below $i")
    val lowerStep = archives(i + 1).secondsPerPoint
    val from = dirtyFrom - java.lang.Math.floorMod(dirtyFrom, lowerStep.toLong)
    val until = TimeSeries.roundup(dirtyUntil, lowerStep)
    val fresh = TimeSeries.rollup(readLevel(i, from, until), lowerStep, schema.aggregationMethod)

    val target = levelPath(i + 1)
    val existing =
      if (hasData(target))
        spark.read.parquet(target)
          .where(col("pday").between(from / 86400L, until / 86400L))
          .where(!(col("ts") >= from && col("ts") < until))
          .select(col("metric"), col("ts"), col("value"))
      else spark.emptyDataFrame

    val merged = if (existing.isEmpty) fresh else existing.unionByName(fresh)
    if (merged.isEmpty) return // nothing in the dirty range at either level
    // Two-phase write: dynamic partition overwrite via a staging dir would
    // avoid read-own-write; local FS parquet cannot overwrite a table it is
    // reading, so stage then swap.
    val staging = s"$target.__staging"
    withPday(merged).write.mode(SaveMode.Overwrite).partitionBy("pday").parquet(staging)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(staging), spark.sparkContext.hadoopConfiguration)
    val tgt = new org.apache.hadoop.fs.Path(target)
    fs.delete(tgt, true)
    fs.rename(new org.apache.hadoop.fs.Path(staging), tgt)
  }

  /** Run the full cascade for a dirty range, gated per level by the xff
    * batching rule: level i+1 is refreshed only when the dirty range crosses
    * an xff-sized time unit (reference: kenshin/storage.py:505-528 — xff is
    * a propagation batching/delay factor, NOT a min-known fraction; no data
    * is ever discarded by it). `force` bypasses the gate (shutdown flush).
    */
  def cascade(dirtyFrom: Long, dirtyUntil: Long, force: Boolean = false): Unit = {
    var from = dirtyFrom
    var until = dirtyUntil
    (0 until archives.length - 1).foreach { i =>
      val unit = propagateTimeunit(i)
      val crossesUnit = (from / unit) != (until / unit) || (until - from) >= unit
      if (force || crossesUnit) propagate(i, from, until)
      else return
      // the next level's dirty range is the widened window just rewritten
      val lowerStep = archives(i + 1).secondsPerPoint
      from = from - java.lang.Math.floorMod(from, lowerStep.toLong)
      until = TimeSeries.roundup(until, lowerStep)
    }
  }

  /** timeunit = ceil((lower_spp / higher_spp) * xff) * higher_spp
    * (reference: kenshin/storage.py:505-508).
    */
  def propagateTimeunit(i: Int): Long = {
    val higher = archives(i).secondsPerPoint.toLong
    val lower = archives(i + 1).secondsPerPoint.toLong
    math.ceil(lower.toDouble / higher * schema.xFilesFactor).toLong * higher
  }

  /** Range fetch: clamp the window to retention, pick the finest archive
    * covering `now - from` (coarser data answers older queries, bounding
    * scan size — reference: kenshin/storage.py:617-694), read that level
    * pruned, gap-fill against the step spine. Returns None when the range
    * is entirely outside retention. Output: (metric, ts, value) step-aligned,
    * nulls in gaps.
    */
  def fetch(metricFilter: Option[String], fromTime: Long, untilTime: Long, now: Long): Option[(Int, DataFrame)] =
    TimeSeries.clampWindow(fromTime, untilTime, now, schema.maxRetention).map { case (from, until) =>
      val level = TimeSeries.selectArchive(archives, from, now)
      val step = archives(level).secondsPerPoint
      val base = readLevel(level, TimeSeries.roundup(from, step), TimeSeries.roundup(until, step))
      val filtered = metricFilter.fold(base)(m => base.where(col("metric") === m))
      (level, TimeSeries.gapFill(filtered, from, until, step).orderBy("metric", "ts"))
    }

  /** Retention TTL: drop whole pday partitions entirely older than each
    * level's retention (replaces the ring buffer's silent overwrite;
    * fetch never returns data older than retention either way, matching
    * kenshin/storage.py:626-637).
    */
  def enforceRetention(now: Long): Unit =
    archives.indices.foreach { i =>
      val path = levelPath(i)
      if (tableExists(path)) {
        val cutoffDay = (now - archives(i).retention) / 86400L - 1
        val fs = org.apache.hadoop.fs.FileSystem.get(
          new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
        val dirs = fs.listStatus(new org.apache.hadoop.fs.Path(path))
        dirs.foreach { st =>
          val name = st.getPath.getName
          if (name.startsWith("pday=")) {
            val day = name.stripPrefix("pday=").toLong
            if (day < cutoffDay) fs.delete(st.getPath, true)
          }
        }
      }
    }

  def tableExists(path: String): Boolean = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    fs.exists(new org.apache.hadoop.fs.Path(path))
  }

  /** True when the table dir holds at least one data file (a dir with only
    * _SUCCESS — e.g. after a TTL wiped every partition — counts as empty).
    */
  def hasData(path: String): Boolean = {
    if (!tableExists(path)) return false
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(new org.apache.hadoop.fs.Path(path), true)
    while (it.hasNext) {
      val f = it.next().getPath.getName
      if (!f.startsWith("_") && !f.startsWith(".")) return true
    }
    false
  }
}
