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

  /** Register every first-seen metric in `points`, then return the points
    * filtered to admitted metrics. New metrics pass (in deterministic
    * name order) through the shard check and the token bucket; rejects are
    * dropped and counted. The collect is bounded: new-metric names only,
    * themselves capped by the throttle over time.
    */
  def admit(points: DataFrame, now: Long): DataFrame = {
    val fresh = points.select(col("metric")).distinct()
      .join(metrics().select(col("metric")), Seq("metric"), "left_anti")
      .collect().map(_.getString(0)).sorted
    if (fresh.nonEmpty) {
      val admitted = fresh.filter { m =>
        if (numInstances > 1 && Fnv1a.shard(m, numInstances) != instance) {
          droppedCreates += 1; false // mis-routed (UnexpectedMetric)
        } else if (!bucket.forall(_.consume(1))) {
          droppedCreates += 1; false // create storm (TokenBucketFull)
        } else { creates += 1; true }
      }
      if (admitted.nonEmpty) {
        import spark.implicits._
        admitted.toSeq.map(m => (m, schemas.schemaFor(m).name, now))
          .toDF("metric", "schema_name", "created_ts")
          .coalesce(1)
          .write.mode(SaveMode.Append).parquet(path)
      }
    }
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
    val missing = found.join(metrics().select(col("metric")), Seq("metric"), "left_anti")
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    if (missing.nonEmpty) {
      import spark.implicits._
      missing.toSeq.map { case (m, ts) => (m, schemas.schemaFor(m).name, ts) }
        .toDF("metric", "schema_name", "created_ts")
        .coalesce(1)
        .write.mode(SaveMode.Append).parquet(path)
    }
    missing.length.toLong
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
