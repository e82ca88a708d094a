package graft

import graft.operators.Validate
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Constraint-report semantics on deliberately dirty data: pk dups and NULL
  * keys, FK orphans, and NULL predicate results all count as violations.
  */
class ValidateSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("pkUnique counts duplicates beyond the first AND null keys") {
    val df = Seq(Some(1L), Some(1L), Some(1L), Some(2L), None)
      .toDF("k")
    val r = Validate.pkUnique(df, "pk", Seq("k")).collect().head
    // 5 rows, distinct non-null keys {1, 2} → 3 violations (two extra 1s + the null)
    assert(r.getLong(1) === 5L && r.getLong(2) === 3L)
  }

  test("fkCovered counts orphans via anti-join") {
    val child = Seq(1L, 1L, 2L, 9L).toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val r = Validate.fkCovered(child, parent, "fk", "fk", "pk").collect().head
    assert(r.getLong(1) === 4L && r.getLong(2) === 1L)
  }

  test("predicate: NULL is a violation, report flags pass correctly") {
    val df = Seq(Some(5.0), Some(500.0), None).toDF("v")
    val rep = Validate.report(Seq(
      Validate.predicate(df, "in_range", col("v").isNotNull && col("v") < 100.0),
      Validate.predicate(df, "not_null", col("v").isNotNull)))
      .orderBy("rule").collect()
    assert(rep(0).getString(0) === "in_range" && rep(0).getLong(2) === 2L
      && rep(0).getInt(3) === 0)
    assert(rep(1).getLong(2) === 1L && rep(1).getInt(3) === 0)
  }

  test("predicate on an empty table reports 0 violations and pass=1, not NULL") {
    val df = Seq.empty[Double].toDF("v")
    val rep = Validate.report(Seq(
      Validate.predicate(df, "empty_ok", col("v") < 100.0))).collect().head
    assert(rep.getLong(1) === 0L && rep.getLong(2) === 0L && rep.getInt(3) === 1)
  }
}
