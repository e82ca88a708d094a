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

  test("fused == the per-rule pkUnique/predicate frames, row for row") {
    val df = Seq((Some(1L), Some(5.0)), (Some(1L), Some(500.0)),
      (Some(2L), None), (None, Some(7.0))).toDF("k", "v")
    val sep = Validate.report(Seq(
      Validate.pkUnique(df, "pk", Seq("k")),
      Validate.predicate(df, "in_range", col("v").isNotNull && col("v") < 100.0)))
      .orderBy("rule").collect().toSeq
    val fus = Validate.report(Seq(Validate.fused(df,
      pks = Seq("pk" -> Seq("k")),
      preds = Seq("in_range" -> (col("v").isNotNull && col("v") < 100.0)))))
      .orderBy("rule").collect().toSeq
    assert(fus === sep)
  }

  test("fused on an empty table still reports every rule with pass=1") {
    val df = Seq.empty[(Long, Double)].toDF("k", "v")
    val rep = Validate.report(Seq(Validate.fused(df,
      pks = Seq("pk" -> Seq("k")), preds = Seq("ok" -> (col("v") < 1.0)))))
      .orderBy("rule").collect()
    assert(rep.length === 2)
    assert(rep.forall(r => r.getLong(1) === 0L && r.getLong(2) === 0L && r.getInt(3) === 1))
  }

  test("fkCoveredFused == fkCovered + predicate, including a DUPLICATED parent key") {
    val child = Seq((1L, 5.0), (1L, 500.0), (2L, 7.0), (9L, 1.0)).toDF("fk", "v")
    // duplicate parent key 1 would double child rows under a naive left join
    val parent = Seq(1L, 1L, 2L, 3L).toDF("pk")
    val sep = Validate.report(Seq(
      Validate.fkCovered(child, parent, "fk_rule", "fk", "pk"),
      Validate.predicate(child, "v_range", col("v") < 100.0)))
      .orderBy("rule").collect().toSeq
    val fus = Validate.report(Seq(
      Validate.fkCoveredFused(child, parent, "fk_rule", "fk", "pk",
        preds = Seq("v_range" -> (col("v") < 100.0)))))
      .orderBy("rule").collect().toSeq
    assert(fus === sep)
  }
}
