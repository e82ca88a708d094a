package graft

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{StorageSchemas, TokenBucket}
import graft.storage.Catalog

/** Dev harness (round-8 verdict item #2): prove `Catalog.admit` stays
  * O(new metrics) per batch at the reference's own estate size. Builds a
  * 3M-name catalog (the production derivation in BASELINE.md:
  * reference tests/test_io_performance.py sizes an instance-pair at ~3M
  * metrics), then drives 100 micro-batches through `admit` in two modes:
  *
  *  - steady: every point's metric already registered (the daemon's normal
  *    life) — per-batch cost must be flat and must not re-read the estate;
  *  - trickle: ~20 genuinely new metrics per batch under a token bucket —
  *    per-batch cost must track the batch, not the estate.
  *
  * Prints one JSON line with per-batch wall percentiles and driver-heap
  * growth. Not part of the driver contract.
  */
object AdmitScale {
  def main(args: Array[String]): Unit = {
    val estate = if (args.length > 0) args(0).toInt else 3000000
    val batches = if (args.length > 1) args(1).toInt else 100
    implicit val spark: SparkSession = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = java.nio.file.Files.createTempDirectory("graft-admitscale").toString

    // seed the estate directly in the catalog's own on-disk layout
    spark.range(estate)
      .select(concat(lit("sys.host"), col("id"), lit(".cpu.user")).as("metric"),
        lit("default").as("schema_name"), lit(1700000000L).as("created_ts"))
      .repartition(8)
      .write.mode(SaveMode.Overwrite).parquet(s"$root/catalog")

    val cat = new Catalog(root, new StorageSchemas(Nil),
      bucket = Some(new TokenBucket(50, 10.0)))

    def heapMb(): Long = {
      System.gc()
      (Runtime.getRuntime.totalMemory - Runtime.getRuntime.freeMemory) / (1 << 20)
    }

    def batch(i: Int, fresh: Int) = {
      val known = spark.range(4000)
        .select(concat(lit("sys.host"), pmod(col("id") * 37 + i, lit(estate.toLong)),
          lit(".cpu.user")).as("metric"))
      val extra =
        if (fresh == 0) known
        else known.unionAll(spark.range(fresh)
          .select(concat(lit("new.batch"), lit(i), lit(".m"), col("id")).as("metric")))
      extra.select(col("metric"), lit(1700003600L + i * 60).as("ts"),
        rand(i).as("value"), lit(1700003600L + i * 60).as("arrival"))
    }

    val out = for (mode <- Seq("steady", "trickle")) yield {
      cat.invalidate()
      val h0 = heapMb()
      val walls = (0 until batches).map { i =>
        val t0 = System.nanoTime()
        val admitted = cat.admit(batch(i, if (mode == "steady") 0 else 20),
          1700003600L + i * 60)
        val n = admitted.count() // force the gate plan like a writer would
        val w = (System.nanoTime() - t0) / 1e9
        if (i % 20 == 0) println(f"[$mode] batch $i%3d: $w%6.3fs rows=$n")
        w
      }.sorted
      val h1 = heapMb()
      def pct(p: Double) = walls((p * (walls.size - 1)).round.toInt)
      (mode, walls.head, pct(0.5), pct(0.95), walls.last, h1 - h0)
    }
    val js = out.map { case (m, mn, p50, p95, mx, dh) =>
      f"""\"$m\":{\"min\":$mn%.3f,\"p50\":$p50%.3f,\"p95\":$p95%.3f,\"max\":$mx%.3f,\"heap_delta_mb\":$dh}"""
    }.mkString("{", ",", s""","estate":$estate,"batches":$batches,"creates":${cat.creates},"dropped":${cat.droppedCreates}}""")
    println(js)
    spark.stop()
  }
}
