package graft

import graft.operators.Joins
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics + plan-shape gates for the temporal join operators. */
class JoinsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("asOf: backward semantics, at-ts inclusion, null when no match") {
    val left = Seq((1L, 100L, "a"), (1L, 200L, "b"), (1L, 50L, "c"), (2L, 100L, "d"))
      .toDF("k", "lts", "tag")
    val right = Seq((1L, 100L, 10.0), (1L, 150L, 15.0), (3L, 10L, 99.0))
      .toDF("k", "rts", "v")
    val out = Joins.asOf(left, right, Seq("k"), "lts", "rts", Seq("rts", "v"))
      .orderBy("k", "lts")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, 50L, "c", -1L),     // before any right row -> null
      (1L, 100L, "a", 100L),   // right row AT the left ts counts (<=)
      (1L, 200L, "b", 150L),   // latest preceding, not just any
      (2L, 100L, "d", -1L)))   // key with no right rows at all
  }

  test("asOf: same-ts right duplicates resolve to greatest rightVals tuple") {
    val left = Seq((1L, 100L)).toDF("k", "lts")
    val right = Seq((1L, 100L, 1.0), (1L, 100L, 2.0)).toDF("k", "rts", "v")
    val v = Joins.asOf(left, right, Seq("k"), "lts", "rts", Seq("v"))
      .select("asof_v").head().getDouble(0)
    assert(v == 2.0)
  }

  test("asOf: same-ts duplicates pick ALL attached columns from the one winning row") {
    val left = Seq((1L, 100L)).toDF("k", "lts")
    // two right rows at the same ts: the greater (arrival, v) tuple must win
    // as a UNIT — no mixing arrival from one row with v from the other
    val right = Seq((1L, 100L, 1L, 10.0), (1L, 100L, 2L, 20.0))
      .toDF("k", "rts", "arrival", "v")
    val r = Joins.asOf(left, right, Seq("k"), "lts", "rts", Seq("arrival", "v"))
      .select("asof_arrival", "asof_v").head()
    assert((r.getLong(0), r.getDouble(1)) == ((2L, 20.0)))
  }

  test("asOf: a NULL inside the winning right row is carried, not replaced by older rows") {
    val left = Seq((1L, 100L)).toDF("k", "lts")
    val right = Seq((1L, 50L, Some(1L), Some(10.0)), (1L, 60L, Some(2L), None))
      .toDF("k", "rts", "arrival", "v")
    val r = Joins.asOf(left, right, Seq("k"), "lts", "rts", Seq("arrival", "v")).head()
    // winner is the ts=60 row as a unit: arrival=2, v=NULL — NOT v=10.0
    assert(r.getLong(2) == 2L && r.isNullAt(3))
  }

  test("rangePoints: empty and inverted intervals match nothing instead of crashing") {
    val iv = Seq((1L, 200L, 200L), (2L, 300L, 250L), (3L, 100L, 150L))
      .toDF("id", "lo", "hi")
    val pt = Seq(120L, 200L, 260L).toDF("ts")
    val out = Joins.rangePoints(iv, pt, col("lo"), col("hi"), col("ts"), 100L)
      .select("id", "ts").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((3L, 120L)))
  }

  test("rangePoints: boundaries, bucket-spanning intervals, exactly-once pairs") {
    val iv = Seq((1L, 100L, 400L), (2L, 250L, 260L), (3L, 900L, 950L))
      .toDF("id", "lo", "hi")
    val pt = Seq(99L, 100L, 399L, 400L, 255L, 260L).toDF("ts")
    val out = Joins.rangePoints(iv, pt, col("lo"), col("hi"), col("ts"), 100L)
      .groupBy("id").agg(count(lit(1)).as("n"), countDistinct(col("ts")).as("nd"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // id=1 spans buckets 100..300: hits 100 (inclusive lo), 255, 260, 399;
    //      not 99/400 (exclusive hi)
    // id=2 sits inside one bucket: hits 255 only (260 = hi excluded)
    // id=3 matches nothing -> absent from the inner join
    assert(out == Set((1L, 4L, 4L), (2L, 1L, 1L)))
    // exactly-once: n == distinct ts count per interval (no double-counted pairs)
  }

  test("rangePoints plans as an equi-join, not a nested-loop theta join") {
    val iv = Seq((1L, 100L, 400L)).toDF("id", "lo", "hi")
    val pt = Seq(150L).toDF("ts")
    val plan = Joins.rangePoints(iv, pt, col("lo"), col("hi"), col("ts"), 100L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"theta join in plan:\n$plan")
  }

  test("asOf is one shuffle on the keys (no range probe per row)") {
    val left = Seq((1L, 100L, "a")).toDF("k", "lts", "tag")
    val right = Seq((1L, 50L, 1.0)).toDF("k", "rts", "v")
    val plan = Joins.asOf(left, right, Seq("k"), "lts", "rts", Seq("v"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of should not plan a join:\n$plan")
    assert(plan.contains("Window"), "expected a window operator")
  }
}
