package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {

  // JSON string escape: backslash, quote, and ALL control chars (<0x20)
  // — a tab or CR in builder-authored SQL would otherwise make the
  // driver's json.load fail and silently zero the round's correctness.
  private def q(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** Dump every query result + oracle_sql.json + _errors.json under
    * `outDir`; returns the error map (empty == all queries ran). Split
    * from main so the never-vanish guarantee is spec-testable: a failing
    * query MUST land in `_errors.json` (round 6: 32 broken queries
    * silently read as "56/56 green").
    */
  def run(queries: Map[String, (SparkSession, String) => DataFrame],
          oracleSql: Map[String, String],
          spark: SparkSession, sfDir: String, outDir: String): Map[String, String] = {
    new java.io.File(outDir).mkdirs()
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    queries.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        errors(name) =
          s"${e.getClass.getName}: ${Option(e.getMessage).getOrElse("").take(4000)}"
      }
      // operators that .cache() internal stages (LSH banding, shingles) own
      // no unpersist — a 95-query sequential run would otherwise accumulate
      // every InMemoryRelation for the session's lifetime (round-11 ADVICE)
      finally spark.catalog.clearCache()
    }
    // the shared pair frame is deliberately NOT in the SQL cache, so the
    // per-query clearCache above never frees it — release it with the run
    // (round-13 ADVICE: the blocks otherwise stay pinned session-lifetime)
    PipelineQueries.clearPairsMemo()
    val json = oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // The errors map is always written — empty `{}` is the healthy signal.
    Files.writeString(Paths.get(s"$outDir/_errors.json"),
      errors.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}"))
    // Loud but rc-0: the driver must still score the queries that DID run.
    if (errors.nonEmpty)
      System.err.println(
        s"[verify] ${errors.size} queries FAILED: ${errors.keys.mkString(", ")}")
    errors.toMap
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // same AQE posture as Bench (coalescing floor + cache re-optimization)
      // so the verified plans are the benched plans
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_MIN_PARTITION_SIZE", "256k"))
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        sys.env.getOrElse("SPARK_GRAFT_CACHE_AQE", "true"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Pre-flight: log every table's actual on-disk schema, so a driver-side
    // data regeneration (round 6: events.ts ns-long → timestamp[us]) is
    // visible in the round log even before any query runs.
    for (t <- Seq("region", "nation", "customer", "supplier", "part", "orders",
                  "lineitem", "events", "documents", "embeddings"))
      try println(s"[verify] schema $t: " +
        spark.read.parquet(s"$sfDir/$t.parquet").schema.simpleString)
      catch { case e: Throwable =>
        println(s"[verify] schema $t: UNREADABLE: ${e.getMessage}") }
    // dev-only subset filter (comma-separated names); driver leaves it unset
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    run(
      SparkEntry.queries.filter { case (name, _) => only.forall(_.contains(name)) },
      SparkEntry.oracleSql, spark, sfDir, outDir)
    spark.stop()
  }
}
