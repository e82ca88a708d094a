package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite

/** Round-6 lesson encoded as a spec: the driver regenerated the testdata and
  * `events.ts` flipped from parquet TIMESTAMP(NANOS) (read as a raw ns long
  * under `nanosAsLong`) to `timestamp[us]` (read as TIMESTAMP_NTZ), and every
  * events query broke at analysis time. [[Queries.events]] must yield
  * bit-identical ns-long streams from ANY of the three encodings a user's
  * parquet can arrive in — and independently of the session timezone.
  */
class EventsEncodingSpec extends AnyFunSuite {
  val spark = SparkTestBase.spark
  import spark.implicits._

  private val root = Files.createTempDirectory("events-enc").toString

  /** Raw rows in the native ns-long domain — includes a sub-second µs part,
    * duplicate aligned slots (LWW material), and an end-of-day boundary.
    */
  private val rows = Seq(
    (1L, 1704067200_000000L, 10L, "click", 1.5, "{}"),
    (2L, 1704067200_500000L, 10L, "click", 2.5, "{}"), // same second, later µs
    (3L, 1704067205_123456L, 11L, "purchase", 9.0, "{}"),
    (4L, 1704153599_999999L, 12L, "error", 4.0, "{}"), // 23:59:59.999999
    (5L, 1704153600_000001L, 12L, "click", 5.0, "{}")) // day boundary +1µs

  private def base: DataFrame =
    rows.toDF("event_id", "us", "user_id", "event_type", "value", "props")

  private def write(dir: String, df: DataFrame): String = {
    df.coalesce(1).write.mode("overwrite").parquet(s"$root/$dir/events.parquet")
    s"$root/$dir"
  }

  // (a) ns-long column — the pre-round-6 driver encoding
  private lazy val nsDir = write("ns",
    base.select(col("event_id"), (col("us") * 1000L).as("ts"), col("user_id"),
      col("event_type"), col("value"), col("props")))
  // (b) timestamp[us] / TIMESTAMP_NTZ — the current driver encoding
  // (pandas-style; session is UTC here so the LTZ→NTZ cast is identity)
  private lazy val ntzDir = write("ntz",
    base.select(col("event_id"),
      timestamp_micros(col("us")).cast("timestamp_ntz").as("ts"), col("user_id"),
      col("event_type"), col("value"), col("props")))
  // (c) isAdjustedToUTC=true micros — Spark's own TimestampType output
  private lazy val ltzDir = write("ltz",
    base.select(col("event_id"), timestamp_micros(col("us")).as("ts"),
      col("user_id"), col("event_type"), col("value"), col("props")))

  private def stream(dir: String): Seq[(String, Long, Long, Double)] =
    Queries.metricStream(spark, dir)
      .orderBy("metric", "ns")
      .as[(String, Long, Long, Double)].collect().toSeq

  test("events normalizes all three ts encodings to identical ns-long streams") {
    for (d <- Seq(nsDir, ntzDir, ltzDir))
      assert(Queries.events(spark, d).schema("ts").dataType == LongType, d)
    val expected = rows.map { case (_, us, _, typ, v, _) =>
      (typ, us * 1000L, us / 1000000L, v)
    }.sortBy(r => (r._1, r._2))
    assert(stream(nsDir) == expected)
    assert(stream(ntzDir) == expected)
    assert(stream(ltzDir) == expected)
  }

  test("a ts_* and a ts_target_* query agree across encodings") {
    def pair(d: String) = (
      Queries.tsAlignDedup(spark, d).collect().toSeq,
      TargetQueries.targetBase(spark, d).orderBy("metric", "ts")
        .collect().toSeq)
    val (ns, nsT) = pair(nsDir)
    assert(ns.nonEmpty && nsT.nonEmpty)
    assert(pair(ntzDir) == ((ns, nsT)))
    assert(pair(ltzDir) == ((ns, nsT)))
  }

  test("range pushdown bounds select identical rows across encodings") {
    // [fromSec, untilSec) expressed on the raw ts type must equal the
    // derived-sec filter on every encoding, including the sub-second edges
    // (row 4 at 23:59:59.999999 is IN day 1; row 5 at +1µs is OUT)
    val from = 1704067205L; val until = 1704153600L
    def ranged(d: String): Seq[Long] =
      Queries.eventsRange(spark, d, Some(from), Some(until))
        .orderBy("event_id").select("event_id").as[Long].collect().toSeq
    val expected = rows.filter { case (_, us, _, _, _, _) =>
      val sec = us / 1000000L; sec >= from && sec < until
    }.map(_._1)
    assert(expected == Seq(3L, 4L)) // the fixture exercises both edges
    assert(ranged(nsDir) == expected)
    assert(ranged(ntzDir) == expected)
    assert(ranged(ltzDir) == expected)
  }

  test("normalization is session-timezone independent (non-UTC regression)") {
    val expected = stream(ntzDir)
    val ltzExpected = stream(ltzDir)
    // +5:45 (no DST) stresses both the day and the sub-hour offset lanes
    for (tz <- Seq("Asia/Kathmandu", "America/New_York")) {
      spark.conf.set("spark.sql.session.timeZone", tz)
      try {
        assert(stream(ntzDir) == expected, s"NTZ under $tz")
        assert(stream(ltzDir) == ltzExpected, s"LTZ under $tz")
      } finally spark.conf.set("spark.sql.session.timeZone", "UTC")
    }
  }
}
