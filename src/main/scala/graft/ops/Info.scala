package graft.ops

import graft.core.StorageSchemas
import graft.storage.{Catalog, MetricStore}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Day-2 ops inspection (reference: bin/kenshin-info.py — pprint the file
  * header; bin/kenshin-debug.py — peek archive points). The Parquet-store
  * analog of "the header" is the schema + per-level partition statistics,
  * reported per cascade level:
  *
  *   level rows, pday partitions, bytes on disk, ts span, dirty range.
  *
  * All driver-side numbers come from FS listing plus one small aggregate
  * per level — an admin-cadence probe, not a query-path cost.
  */
object Info {

  final case class LevelInfo(level: Int, secondsPerPoint: Int, retention: Long,
                             rows: Long, partitions: Int, bytes: Long,
                             tsMin: Option[Long], tsMax: Option[Long],
                             dirty: Option[(Long, Long)])

  def levelInfos(store: MetricStore)(implicit spark: SparkSession): Seq[LevelInfo] =
    store.archives.indices.map { i =>
      val path = s"${store.root}/${store.schema.name}/level_$i"
      val a = store.archives(i)
      if (!store.hasData(path))
        LevelInfo(i, a.secondsPerPoint, a.retention, 0L, 0, 0L, None, None, store.dirtyRange(i))
      else {
        val fs = org.apache.hadoop.fs.FileSystem.get(
          new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
        val parts = fs.listStatus(new org.apache.hadoop.fs.Path(path))
          .count(_.getPath.getName.startsWith("pday="))
        val bytes = fs.getContentSummary(new org.apache.hadoop.fs.Path(path)).getLength
        val head = spark.read.parquet(path)
          .agg(count(lit(1)), min(col("ts")), max(col("ts"))).head()
        LevelInfo(i, a.secondsPerPoint, a.retention, head.getLong(0), parts, bytes,
          if (head.isNullAt(1)) None else Some(head.getLong(1)),
          if (head.isNullAt(2)) None else Some(head.getLong(2)),
          store.dirtyRange(i))
      }
    }

  /** Human-readable store report (the kenshin-info pprint analog). */
  def report(store: MetricStore)(implicit spark: SparkSession): String = {
    val s = store.schema
    val sb = new StringBuilder
    sb ++= s"schema: ${s.name}\n"
    sb ++= s"aggregation: ${s.aggregationMethod.name}\n"
    sb ++= s"xFilesFactor: ${s.xFilesFactor}\n"
    sb ++= s"maxRetention: ${s.maxRetention}\n"
    sb ++= s"cacheRetention: ${s.cacheRetention}\n"
    levelInfos(store).foreach { li =>
      sb ++= f"level_${li.level}: step=${li.secondsPerPoint}s retention=${li.retention}s " +
        f"rows=${li.rows} partitions=${li.partitions} bytes=${li.bytes}"
      (li.tsMin, li.tsMax) match {
        case (Some(lo), Some(hi)) => sb ++= s" ts=[$lo, $hi]"
        case _ => ()
      }
      li.dirty.foreach { case (f, u) => sb ++= s" dirty=[$f, $u)" }
      sb ++= "\n"
    }
    store.catalog.foreach { c =>
      val counts = c.metrics().groupBy(col("schema_name")).count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      sb ++= s"catalog: ${counts.values.sum} metrics (${
        counts.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString(", ")})\n"
    }
    sb.result()
  }

  /** Point peek (the kenshin-debug analog): the stored slots for one metric
    * at one level inside a window, duplicates resolved, as `ts\tvalue`.
    */
  def debugPoints(store: MetricStore, level: Int, metric: String,
                  fromTime: Long, untilTime: Long): Seq[(Long, Double)] =
    store.readLevel(level, fromTime, untilTime)
      .where(col("metric") === metric)
      .orderBy(col("ts"))
      .select(col("ts"), col("value"))
      .collect().toSeq.map(r => (r.getLong(0), r.getDouble(1)))

  /** CLI: `graft.ops.Info <storeRoot> <schemasConf> <schemaName>
    * [--debug metric level from until]`.
    */
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: Info <storeRoot> <schemasConf> <schemaName> [--debug metric level from until]")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    implicit val s: SparkSession = spark
    try {
      val schemas = StorageSchemas.load(args(1))
      val schema = schemas.byName(args(2)).getOrElse(
        sys.error(s"no schema named ${args(2)} in ${args(1)}"))
      val catalog = new Catalog(args(0), schemas)
      val store = new MetricStore(args(0), schema, Some(catalog))
      val di = args.indexOf("--debug")
      if (di >= 0) {
        val Seq(metric, level, from, until) = args.slice(di + 1, di + 5).toSeq
        debugPoints(store, level.toInt, metric, from.toLong, until.toLong)
          .foreach { case (ts, v) => println(s"$ts\t$v") }
      } else print(report(store))
    } finally spark.stop()
  }
}
