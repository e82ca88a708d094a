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

  test("fused minhash_signature == explode + minhash_windows + groupBy mins") {
    // the round-13 per-doc signature kernel vs the composed shape it
    // replaced, over docs with repeats (min over multiset == min over
    // set), unicode, the adversarial prefix, and short docs (< w tokens
    // must yield NO signature row)
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "a a a a a a"), // heavy repeats
      (3L, "ünïcode tøkens everywhere ünïcode tøkens again"),
      (4L, "s0: adversarial s1: prefix tokens here"),
      (5L, "short doc"), // 2 tokens < w=3: dropped
      (6L, "exactly three tokens")
    ).toDF("doc_id", "text")
    for (h <- Seq(6, 8, 16)) {
      val fused = Dedup.minhashSignatures(docs, 3, h)
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val composed = Dedup.shingles(docs, 3)
        .select(col("doc_id"), HashKernels.minhashWindows(col("shingle"), h).as("mh"))
        .groupBy(col("doc_id"))
        .agg(array((0 until h).map(k => min(element_at(col("mh"), k + 1))): _*).as("sig"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      assert(fused == composed, s"h=$h")
      assert(!fused.contains(5L))
    }
  }
}
