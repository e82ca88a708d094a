package graft

import graft.core.StorageSchemas
import graft.storage.{Catalog, MetricStore}
import org.apache.spark.sql.SparkSession

/** Fetch CLI (reference: bin/kenshin-fetch.py — `kenshin-fetch path --from
  * --until` printing `ts\tvalue` lines). Usage:
  *
  *   graft.Fetch <storeRoot> <schemasConf> <metric> <from> <until> [now]
  *
  * The schema is resolved by first-match over the conf (like the daemon);
  * the catalog at <storeRoot> (if any) supplies the fetch spine.
  */
object Fetch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, args)
    finally spark.stop()
  }

  def run(spark: SparkSession, args: Array[String]): Unit = {
    require(args.length >= 5, "usage: Fetch <storeRoot> <schemasConf> <metric> <from> <until> [now]")
    val Array(storeRoot, schemasConf, metric) = args.take(3)
    val from = args(3).toLong
    val until = args(4).toLong
    val now = if (args.length > 5) args(5).toLong else System.currentTimeMillis() / 1000
    implicit val s: SparkSession = spark
    val schemas = StorageSchemas.load(schemasConf)
    val catalog = new Catalog(storeRoot, schemas)
    val store = new MetricStore(storeRoot, schemas.schemaFor(metric), Some(catalog))
    store.fetch(Some(metric), from, until, now) match {
      case None => println("no data in window")
      case Some((level, df)) =>
        println(s"# level=$level step=${store.archives(level).secondsPerPoint}")
        df.collect().foreach { r =>
          val v = if (r.isNullAt(2)) "None" else r.getDouble(2).toString
          println(s"${r.getLong(1)}\t$v")
        }
    }
  }
}
