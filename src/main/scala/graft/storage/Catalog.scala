package graft.storage

import graft.core.{StorageSchemas, TokenBucket}
import graft.functions.Fnv1a
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The metrics catalog — the reference's metric index + link tree collapsed
  * into one small Parquet table `(metric, schema_name, created_ts)`
  * (reference index: rurouni/cache.py:69-97, index line format `metric
  * schema file_idx pos_idx`; registration path rurouni/cache.py:112-151).
  *
  * Roles:
  *  - metric registration on first sight, guarded by a token-bucket create
  *    throttle (rurouni/utils.py:55-104) and the fnv1a shard check
  *    (rurouni/cache.py:123-128) — points for rejected metrics are dropped
  *    for the batch, exactly like the reference;
  *  - the authoritative metric list for fetch spines: a gap-fill never
  *    scans raw data to learn metric names (at 100 TB the catalog is the
  *    only table small enough to answer "which series exist").
  *
  * File-size posture: the catalog is tiny (one row per metric) and updated
  * by appending only NEW metrics, so it stays a handful of files; reads
  * broadcast.
  */
final class Catalog(val root: String, val schemas: StorageSchemas,
                    val numInstances: Int = 1, val instance: Int = 0,
                    val bucket: Option[TokenBucket] = None)
                   (implicit spark: SparkSession) {

  val path = s"$root/catalog"

  /** Counters surfaced for instrumentation (reference: creates /
    * droppedCreates, rurouni/state/instrumentation.py).
    */
  @volatile var creates: Long = 0L
  @volatile var droppedCreates: Long = 0L

  private val catalogSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("metric", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("schema_name", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("created_ts", org.apache.spark.sql.types.LongType)))

  private def fs: org.apache.hadoop.fs.FileSystem =
    org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)

  private def exists: Boolean = {
    SafeSwap.recover(fs, path) // restore if a remove() died mid-swap
    fs.exists(new org.apache.hadoop.fs.Path(path))
  }

  def metrics(): DataFrame =
    if (!exists)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], catalogSchema)
    else spark.read.parquet(path)

  /** First-match-wins schema assignment as a plan column (chained
    * prefix-anchored rlike — `Regex.lookingAt` == `^(?:pattern)` find), so
    * registration never round-trips metric names through the driver.
    */
  private def schemaNameCol(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    schemas.schemas.foldRight(
      lit(graft.core.StorageSchemas.defaultSchema.name)) { (sch, acc) =>
      when(c.rlike("^(?:" + sch.pattern.regex + ")"), lit(sch.name)).otherwise(acc)
    }

  /** Shard-local gate as a plan column (pmod == Python's non-negative %,
    * like Fnv1a.shard). */
  private def shardOkCol: org.apache.spark.sql.Column =
    if (numInstances > 1)
      pmod(Fnv1a.fnv1a32(col("metric")), lit(numInstances)) === lit(instance)
    else lit(true)

  /** Register every first-seen metric in `points`, then return the points
    * filtered to admitted metrics. New metrics pass (in deterministic
    * name order) through the shard check and the token bucket; rejects are
    * dropped and counted. Nothing row-shaped ever reaches the driver: the
    * shard gate and schema assignment run in-plan, the throttle grant is
    * one bounded 1-row aggregate + a bulk token take, and the admitted
    * prefix is an orderBy/limit — at a 3M-metric estate the old
    * name-collect here was the last admin-path driver list.
    */
  def admit(points: DataFrame, now: Long): DataFrame = {
    val fresh = points.select(col("metric")).distinct()
      .join(metrics().select(col("metric")), Seq("metric"), "left_anti")
      .persist()
    try {
      val row = fresh
        .agg(count(lit(1)).as("total"), count(when(shardOkCol, 1)).as("ok")).head()
      val total = row.getLong(0); val ok = row.getLong(1)
      if (total > 0) {
        // the reference walks creates in sorted name order, shard rejects
        // consuming no tokens (rurouni/cache.py:112-151): granting
        // min(tokens, ok) to the first `grant` shard-local names is the
        // same admitted set, without the per-name driver walk
        val grant = bucket.fold(ok)(_.consumeUpTo(ok))
        if (grant > 0) {
          fresh.where(shardOkCol).orderBy(col("metric"))
            .limit(math.min(grant, Int.MaxValue.toLong).toInt)
            .select(col("metric"), schemaNameCol(col("metric")).as("schema_name"),
              lit(now).as("created_ts"))
            .coalesce(1)
            .write.mode(SaveMode.Append).parquet(path)
        }
        creates += grant
        droppedCreates += total - grant
      }
    } finally fresh.unpersist(false)
    points.join(broadcast(metrics().select(col("metric"))), Seq("metric"), "left_semi")
  }

  /** Glob-tree series discovery over the catalog (the graphite-web
    * `metrics/find` analog — the reference keeps a filesystem link tree
    * for this, rurouni/storage.py:20-22,51-53; the catalog replaces it):
    * `findNodes("sys.*.cpu")` returns the matching depth-3 nodes with
    * leaf/branch flags. See [[SeriesFind.nodes]].
    */
  def findNodes(query: String, limit: Int = 1000): DataFrame =
    SeriesFind.nodes(metrics().select(col("metric")), query, limit)

  /** Crash-recovery rebuild: re-derive catalog entries from the level
    * tables themselves, like the reference re-deriving its index from file
    * headers (rurouni/storage.py:56-77 rebuildIndex; boot path
    * rurouni/cache.py:56-60). Metrics found in storage but missing from the
    * catalog are registered with their earliest stored timestamp; existing
    * rows are kept (the catalog stays authoritative for schema assignment).
    * Returns the number of recovered metrics.
    */
  def rebuildFromStore(store: MetricStore): Long = {
    val perLevel = store.archives.indices.flatMap { i =>
      val path = s"${store.root}/${store.schema.name}/level_$i"
      if (store.hasData(path))
        Some(spark.read.parquet(path).groupBy(col("metric")).agg(min(col("ts")).as("first_ts")))
      else None
    }
    if (perLevel.isEmpty) return 0L
    val found = perLevel.reduce(_ unionByName _)
      .groupBy(col("metric")).agg(min(col("first_ts")).as("first_ts"))
    // recovery stays fully in-plan: schema assignment is the rlike chain,
    // the driver sees only a count (a 3M-metric rebuild collects nothing)
    val missing = found.join(metrics().select(col("metric")), Seq("metric"), "left_anti")
      .select(col("metric"), schemaNameCol(col("metric")).as("schema_name"),
        col("first_ts").as("created_ts"))
      .persist()
    try {
      val n = missing.count()
      if (n > 0)
        missing.coalesce(1).sortWithinPartitions("metric")
          .write.mode(SaveMode.Append).parquet(path)
      n
    } finally missing.unpersist(false)
  }

  /** Remove metrics from the catalog (delete-metrics admin op). Backup-swap
    * (SafeSwap): a crash at any step leaves the old or new catalog intact.
    */
  def remove(toDelete: Seq[String]): Unit = {
    if (!exists || toDelete.isEmpty) return
    val remaining = metrics().where(!col("metric").isInCollection(toDelete))
    remaining.coalesce(1).write.mode(SaveMode.Overwrite).parquet(SafeSwap.stagingPath(path))
    SafeSwap.commit(fs, path)
  }
}
