package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** The round-6 failure mode, pinned: a query that throws during the
  * correctness dump must land in `_errors.json` — never silently vanish
  * from the scorecard (32 broken queries read as "56/56 green" that round).
  */
class VerifySpec extends AnyFunSuite {
  val spark = SparkTestBase.spark
  import spark.implicits._

  test("a broken query shows up in _errors.json; healthy runs write {}") {
    val out = Files.createTempDirectory("verify-spec").toString
    val ok: (SparkSession, String) => DataFrame =
      (s, _) => { import s.implicits._; Seq((1, "a")).toDF("k", "v") }
    val boom: (SparkSession, String) => DataFrame =
      (_, _) => throw new IllegalStateException("injected \"failure\"\n(line 2)")
    val errs = Verify.run(
      Map("good_q" -> ok, "broken_q" -> boom),
      Map("good_q" -> "SELECT 1", "broken_q" -> "SELECT 2"),
      spark, "/nonexistent", s"$out/mixed")
    assert(errs.keySet == Set("broken_q"))
    val errJson = Files.readString(Paths.get(s"$out/mixed/_errors.json"))
    // the artifact names the query, the exception class, and survives the
    // embedded quote/newline through the JSON escape
    assert(errJson.contains("\"broken_q\""), errJson)
    assert(errJson.contains("IllegalStateException"), errJson)
    assert(errJson.contains("""injected \"failure\"\n(line 2)"""), errJson)
    assert(!errJson.contains("good_q"), errJson)
    // the good query's parquet still exists (rc-0 posture: the driver
    // scores what ran) and the oracle map is intact
    assert(Files.exists(Paths.get(s"$out/mixed/good_q")))
    assert(Files.readString(Paths.get(s"$out/mixed/oracle_sql.json"))
      .contains("\"broken_q\": \"SELECT 2\""))
    // healthy run: the empty map is still written (absence of the file is
    // indistinguishable from a crashed run; `{}` is the green signal)
    val none = Verify.run(Map("good_q" -> ok), Map("good_q" -> "SELECT 1"),
      spark, "/nonexistent", s"$out/clean")
    assert(none.isEmpty)
    assert(Files.readString(Paths.get(s"$out/clean/_errors.json")) == "{}")
  }
}
