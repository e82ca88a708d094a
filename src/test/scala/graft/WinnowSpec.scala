package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.WinnowKernel
import graft.operators.Dedup

/** Winnowed substring-dedup: kernel properties + the operator's guarantee
  * on constructed documents. Corpus-scale oracle parity is pinned by the
  * dedup_substring row of the driver's DuckDB compare (identical
  * dual-channel Horner both sides).
  */
class WinnowSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import WinnowKernel.fingerprints
  private def fp(s: String, k: Int = 12, w: Int = 16): Set[Long] = {
    val a = fingerprints(org.apache.spark.unsafe.types.UTF8String.fromString(s), k, w)
    (0 until a.numElements()).map(a.getLong).toSet
  }

  test("kernel: below the k+w-1 guarantee length fingerprints are empty") {
    assert(fp("x" * 26).isEmpty)
    assert(fp("short text").isEmpty)
    assert(fp("a" * 26).isEmpty)
    assert(fp("a" * 27).nonEmpty)
  }

  test("kernel: deterministic, and a shared >= k+w-1 span shares a fingerprint") {
    val span = "The quick brown fox jumps over the lazy dog repeatedly tonight."
    val d1 = "PREFIX ONE completely different start " + span + " trailing alpha"
    val d2 = "another beginning entirely here " + span + " end of doc two"
    assert(fp(d1) == fp(d1))
    val shared = fp(d1).intersect(fp(d2))
    assert(shared.nonEmpty,
      "documents sharing a 64-char span must share a winnowed fingerprint")
    // disjoint texts share nothing (62-bit hashes: collision would be a bug)
    val d3 = "0123456789 zyxwvutsrqponmlkjihgfedcba 9876543210 qwertyuiopasdf"
    assert(fp(d1).intersect(fp(d3)).isEmpty)
  }

  test("kernel: the k+w-1 guarantee holds at arbitrary (mis)aligned offsets") {
    // a shared span of EXACTLY k+w-1 codepoints contains exactly one full
    // hash window, entirely inside the span, in each document — its min is
    // necessarily a shared fingerprint, at any offset. This also exercises
    // position-independence of the rolling hash: the span sits at a
    // different absolute offset (and window alignment) in each document.
    val span = "abcdefghijklmnopqrstuvwxyz!" // 27 = k + w - 1
    assert(span.length == 27)
    for (off <- Seq(0, 1, 5, 13)) {
      val d1 = "X" * (20 + off) + span + "Y" * 9
      val d2 = "p" * (3 + 2 * off) + span + "q" * 15
      assert(fp(d1).intersect(fp(d2)).nonEmpty, s"guarantee failed at offset $off")
    }
  }

  test("operator: shared-span pairs found, exact copies canonicalized away, disjoint docs absent") {
    import spark.implicits._
    val span = "When in the course of human events it becomes necessary for one people " +
      "to dissolve the political bands which have connected them with another"
    val docs = Seq(
      (1L, "first document header " + span + " first document footer"),
      (2L, "second doc intro text " + span + " and a different ending here"),
      (3L, "first document header " + span + " first document footer"), // copy of 1
      (4L, "totally unrelated content about spark physical plans and shuffles"),
      (5L, "more unrelated filler prose with zero overlap to the span above")
    ).toDF("doc_id", "text")
    val pairs = Dedup.winnowSubstringPairs(docs, 12, 16, 100, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs.contains((1L, 2L)), s"span-sharing pair missing: $pairs")
    assert(pairs((1L, 2L)) >= 2, "a 140-char shared span must share >= 2 fingerprints")
    // doc 3 is a verbatim copy of doc 1: canonicalization collapses it
    assert(!pairs.keys.exists(p => p._1 == 3L || p._2 == 3L), s"copy not canonicalized: $pairs")
    assert(!pairs.keys.exists(p => p._1 == 4L || p._2 == 4L || p._1 == 5L || p._2 == 5L),
      s"disjoint docs must not pair: $pairs")
  }

  test("operator: df cap drops boilerplate fingerprints") {
    import spark.implicits._
    val boiler = "ALL RIGHTS RESERVED COPYRIGHT NOTICE TERMS OF SERVICE APPLY HERE NOW"
    // 6 docs all share the boilerplate span; with dfCap < 6 every
    // boilerplate fingerprint is dropped, so no pairs survive
    val docs = (1L to 6L).map(i => (i, s"doc number $i unique preamble $i$i$i " + boiler))
      .toDF("doc_id", "text")
    val capped = Dedup.winnowSubstringPairs(docs, 12, 16, 3, 1).count()
    val uncapped = Dedup.winnowSubstringPairs(docs, 12, 16, 100, 1).count()
    assert(uncapped > 0, "sanity: boilerplate pairs exist without the cap")
    assert(capped < uncapped, s"df cap must drop boilerplate pairs ($capped vs $uncapped)")
  }
}
