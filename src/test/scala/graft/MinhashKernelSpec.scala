package graft

import graft.operators.Dedup
import graft.functions.HashKernels
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The codegen'd minhash kernel must be bit-identical to the composable
  * `minhashFamily` definition (which the DuckDB oracle SQL mirrors).
  */
class MinhashKernelSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("minhash_windows == minhashFamily for 16 hashes over varied inputs") {
    val inputs = Seq("", "a", "the quick brown fox", "ünïcode tøkens",
      "s0:adversarial prefix", "a b c d e f g h i j").toDF("s")
    val viaFamily = inputs.select(
      array(Dedup.minhashFamily(col("s"), 16): _*).as("arr")).collect().map(_.getSeq[Long](0))
    val viaKernel = inputs.select(
      HashKernels.minhashWindows(col("s"), 16).as("arr")).collect().map(_.getSeq[Long](0))
    viaFamily.zip(viaKernel).foreach { case (a, b) => assert(a == b) }
  }

  test("non-multiple-of-4 family sizes truncate the last digest identically") {
    val inputs = Seq("xyz").toDF("s")
    val viaFamily = inputs.select(array(Dedup.minhashFamily(col("s"), 6): _*))
      .collect().head.getSeq[Long](0)
    val viaKernel = inputs.select(HashKernels.minhashWindows(col("s"), 6))
      .collect().head.getSeq[Long](0)
    assert(viaFamily == viaKernel && viaKernel.length == 6)
  }
}
