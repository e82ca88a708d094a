package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Deterministic-sampling gates: exact reproducibility (the property
  * df.sample() lacks), stability under repartitioning, and per-stratum rate
  * accuracy.
  */
class SamplingSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  lazy val docs = (1 to 20000).map(i => (i.toLong, if (i % 4 == 0) "en" else "de"))
    .toDF("doc_id", "lang")

  test("identical row set on re-evaluation and under repartitioning") {
    def ids(df: org.apache.spark.sql.DataFrame) =
      Sampling.stratified(df, col("doc_id"), col("lang"), Seq("en" -> 0.25), 0.8)
        .select("doc_id").as[Long].collect().sorted.toSeq
    val base = ids(docs)
    assert(ids(docs) == base)
    assert(ids(docs.repartition(17)) == base)
  }

  test("per-stratum rates within 3% of target") {
    val sampled = Sampling.stratified(docs, col("doc_id"), col("lang"),
      Seq("en" -> 0.25), 0.8)
    val rates = sampled.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val en = rates("en") / 5000.0     // 5000 en docs
    val de = rates("de") / 15000.0    // 15000 de docs
    assert(math.abs(en - 0.25) < 0.03, s"en rate $en")
    assert(math.abs(de - 0.80) < 0.03, s"de rate $de")
  }

  test("weighted sample tracks inclusion probability ∝ weight") {
    val df = (1 to 30000).map(i => (i.toLong, (i % 3) match {
      case 0 => 100L   // P = 1/6
      case 1 => 300L   // P = 1/2
      case _ => 900L   // P = 1 (capped)
    })).toDF("doc_id", "w")
    val kept = Sampling.weighted(df, col("doc_id"), col("w"), 600L)
      .groupBy("w").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(math.abs(kept(100L) / 10000.0 - 1.0 / 6) < 0.03, s"w=100: ${kept(100L)}")
    assert(math.abs(kept(300L) / 10000.0 - 0.5) < 0.03, s"w=300: ${kept(300L)}")
    assert(kept(900L) == 10000L, "weight >= scale must always survive")
  }

  test("same salt gives consistent membership across tables") {
    val other = docs.select(col("doc_id"), lit("de").as("lang"))
    val a = Sampling.stratified(docs.where(col("lang") === "de"), col("doc_id"),
      col("lang"), Seq(), 0.5).select("doc_id").as[Long].collect().toSet
    val b = Sampling.stratified(other.where(col("doc_id") % 4 =!= 0), col("doc_id"),
      col("lang"), Seq(), 0.5).select("doc_id").as[Long].collect().toSet
    assert(a == b)
  }

  test("temperature rebalance keeps sqrt(min/n) of each group, within 4%") {
    // groups 15k "de" / 5k "en": min=5k → de keep rate = sqrt(1/3) ≈ 0.5774
    val kept = Sampling.rebalanceTemperature(docs, col("doc_id"), col("lang"))
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(kept("de") / 15000.0 - math.sqrt(1.0 / 3)) < 0.04)
    assert(math.abs(kept("en") / 5000.0 - 1.0) < 0.04)
  }

  test("temperature sits between uniform rebalance and keep-all (same salt)") {
    // thresholds are pointwise monotone (sqrt(x) >= x on [0,1]), so with a
    // shared salt the uniform sample is a SUBSET of the temperature sample
    val uni = Sampling.rebalanceUniform(docs, col("doc_id"), col("lang"), "s1")
      .select("doc_id").as[Long].collect().toSet
    val temp = Sampling.rebalanceTemperature(docs, col("doc_id"), col("lang"), "s1")
      .select("doc_id").as[Long].collect().toSet
    assert(uni.subsetOf(temp) && temp.size < 20000)
  }
}
