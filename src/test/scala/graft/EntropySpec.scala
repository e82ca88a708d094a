package graft

import graft.operators.TextAnalysis
import org.scalatest.funsuite.AnyFunSuite

/** Token-entropy quality signal: closed-form golden values, distribution
  * properties, cap behavior, and partitioning invariance.
  */
class EntropySpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def entropyOf(texts: (Long, String)*): Map[Long, (Long, Long, Option[Double])] =
    TextAnalysis.tokenEntropy(texts.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double]))))
      .toMap

  test("golden values: uniform tokens hit ln(k), constant doc hits 0") {
    val got = entropyOf(
      (1L, "a b c d"),     // 4 distinct, uniform: H = ln(4)
      (2L, "x x x x x"),   // one token: H = 0
      (3L, "a a b b"))     // two at 1/2: H = ln(2)
    assert(math.abs(got(1L)._3.get - math.log(4)) < 1e-6)
    assert(got(2L) === ((5L, 1L, Some(0.0))))
    assert(math.abs(got(3L)._3.get - math.log(2)) < 1e-6)
    assert(got(1L)._1 === 4L && got(1L)._2 === 4L)
  }

  test("mixed distribution matches the closed form") {
    // tfs: a=3, b=1 → H = ln(4) − (3·ln3 + 1·ln1)/4
    val expected = math.log(4) - 3 * math.log(3) / 4
    val got = entropyOf((1L, "a a a b"))(1L)
    assert(got._1 === 4L && got._2 === 2L)
    assert(math.abs(got._3.get - expected) < 1e-6)
  }

  test("docs past the EntropyCap yield NULL, matching the oracle's behavior") {
    val long = (1L, Seq.fill(TextAnalysis.EntropyCap + 1)("w").mkString(" "))
    val got = entropyOf(long)
    assert(got(1L)._1 === TextAnalysis.EntropyCap + 1L && got(1L)._3.isEmpty)
  }

  test("entropy is invariant under input repartitioning") {
    val docs = (1L to 200L).map(i =>
      (i, (1 to (i % 17 + 3).toInt).map(j => s"t${j % (i % 7 + 1)}").mkString(" ")))
    val a = TextAnalysis.tokenEntropy(docs.toDF("doc_id", "text"))
      .collect().map(_.toSeq).toSet
    val b = TextAnalysis.tokenEntropy(docs.toDF("doc_id", "text").repartition(13))
      .collect().map(_.toSeq).toSet
    assert(a === b)
  }
}
