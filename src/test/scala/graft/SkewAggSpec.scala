package graft

import graft.operators.SkewAgg
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Salted two-phase aggregation: bit-identical to the plain aggregate, with
  * the phase-1 shuffle keyed on (keys, salt).
  */
class SkewAggSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("salted sum/count equals the plain aggregate exactly (skewed input)") {
    // one hot key with 50k rows, many cold keys
    val rows = (1 to 50000).map(i => ("hot", i.toLong, (i % 97) / 10.0)) ++
      (1 to 5000).map(i => (s"cold${i % 500}", 100000L + i, i / 100.0))
    val df = rows.toDF("k", "id", "v")
    val salted = SkewAgg.saltedSumCount(df, Seq(col("k")), Seq("k"),
        col("v"), col("id"), 16, "s", "n")
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    val plain = df.groupBy(col("k"))
      .agg(sum(col("v").cast("decimal(18,2)")).cast("double").as("s"),
        count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    assert(salted == plain)
  }

  test("phase-1 grouping carries the salt (hot key split across reducers)") {
    val df = Seq(("k", 1L, 1.0)).toDF("k", "id", "v")
    val plan = SkewAgg.saltedSumCount(df, Seq(col("k")), Seq("k"),
      col("v"), col("id"), 16, "s", "n").queryExecution.executedPlan.toString
    assert(plan.contains("__salt"), s"no salt in plan:\n$plan")
    // two aggregation levels: partial+final around each of the two groupBys
    assert("HashAggregate|SortAggregate".r.findAllIn(plan).size >= 4, plan)
  }
}
