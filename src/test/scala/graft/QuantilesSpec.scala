package graft

import graft.operators.Quantiles
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class QuantilesSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("discrete quantiles on 1..100 are the percentile values themselves") {
    val df = (1 to 100).map(i => ("g", i.toDouble)).toDF("g", "v")
    val r = Quantiles.groupQuantiles(df, Seq("g"), col("v"), Seq(25, 50, 75, 95, 100))
      .head()
    assert((r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
      == ((25.0, 50.0, 75.0, 95.0, 100.0)))
  }

  test("n=20 at p95 takes rank 19, not the float-ceil 20") {
    // 0.95*20 in IEEE double is 19.000000000000000532 -> float ceil gives 20;
    // exact integer arithmetic gives ceil(19) = 19
    val df = (1 to 20).map(i => ("g", i.toDouble)).toDF("g", "v")
    val r = Quantiles.groupQuantiles(df, Seq("g"), col("v"), Seq(95)).head()
    assert(r.getDouble(1) == 19.0)
  }

  test("NULL values are excluded from the population") {
    val df = Seq(("g", Some(1.0)), ("g", None), ("g", Some(2.0)), ("g", Some(3.0)))
      .toDF("g", "v")
    val r = Quantiles.groupQuantiles(df, Seq("g"), col("v"), Seq(50, 100)).head()
    assert((r.getDouble(1), r.getDouble(2)) == ((2.0, 3.0)))
  }

  test("p1 of a tiny group clamps to rank 1 (the minimum)") {
    val df = Seq(("g", 7.0), ("g", 3.0)).toDF("g", "v")
    val r = Quantiles.groupQuantiles(df, Seq("g"), col("v"), Seq(1)).head()
    assert(r.getDouble(1) == 3.0)
  }

  test("groups are independent") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("b", 10.0), ("b", 20.0), ("b", 30.0))
      .toDF("g", "v")
    val m = Quantiles.groupQuantiles(df, Seq("g"), col("v"), Seq(50))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m == Map("a" -> 1.0, "b" -> 20.0))
  }
}
