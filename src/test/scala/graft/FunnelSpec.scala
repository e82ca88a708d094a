package graft

import graft.operators.Funnel
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Funnel semantics: strict-after progression, earliest-qualifying step
  * times, per-step reach/conversion/latency, and tie policy.
  */
class FunnelSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  val Steps = Seq("a", "b", "c")

  private def report(evs: (Long, Long, String)*): Map[Int, (Long, Option[Double], Option[Double])] =
    Funnel.report(evs.toDF("k", "us", "ty"), col("k"), col("us"), col("ty"), Steps)
      .collect()
      .map(r => r.getInt(0) -> ((r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double]),
        Option(r.get(4)).map(_.asInstanceOf[Double]))))
      .toMap

  test("strict-after ordering: b before a, or at the same instant, doesn't convert") {
    val got = report(
      (1L, 10L, "a"), (1L, 20L, "b"), (1L, 30L, "c"), // full convert, lags 10/10
      (2L, 10L, "a"), (2L, 10L, "b"),                 // same-instant b: no step 2
      (3L, 20L, "b"), (3L, 30L, "a"))                 // b before a only: no step 2
    assert(got(1) === ((3L, None, None)))
    assert(got(2) === ((1L, Some(0.333333), Some(10.0)))) // conv rounds to 6dp
    assert(got(3) === ((1L, Some(1.0), Some(10.0))))
  }

  test("earliest qualifying time is used at every step") {
    // a at 10; b at 5 (too early), 15, 40 -> t2 = 15; c at 12 (too early), 50
    val got = report((1L, 10L, "a"), (1L, 5L, "b"), (1L, 15L, "b"),
      (1L, 40L, "b"), (1L, 12L, "c"), (1L, 50L, "c"))
    assert(got(2) === ((1L, Some(1.0), Some(5.0))))   // 15 - 10
    assert(got(3) === ((1L, Some(1.0), Some(35.0))))  // 50 - 15
  }

  test("empty stages report zero reach and NULL rates") {
    val got = report((1L, 10L, "a"))
    assert(got(1)._1 === 1L && got(2) === ((0L, Some(0.0), None))
      && got(3)._1 === 0L)
  }

  test("stage frames shrink monotonically and are partitioning-invariant") {
    val evs = (1L to 300L).flatMap { i =>
      Seq((i % 40, i, if (i % 3 == 0) "a" else if (i % 3 == 1) "b" else "c"))
    }
    val a = Funnel.report(evs.toDF("k", "us", "ty"), col("k"), col("us"), col("ty"), Steps)
      .collect().map(_.toSeq)
    val b = Funnel.report(evs.toDF("k", "us", "ty").repartition(11),
      col("k"), col("us"), col("ty"), Steps).collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
    val ns = a.sortBy(_.head.toString).map(_(2).asInstanceOf[Long])
    assert(ns(0) >= ns(1) && ns(1) >= ns(2))
  }
}
