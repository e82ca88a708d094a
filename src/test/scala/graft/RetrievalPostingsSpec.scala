package graft

import graft.operators.Retrieval
import org.scalatest.funsuite.AnyFunSuite

/** Inverted-postings gates: exact df/cf despite posting-list truncation,
  * (tf desc, doc) posting order, and partitioning invariance.
  */
class RetrievalPostingsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  lazy val docs = Seq(
    (1L, "a b a c"),   // tf(a)=2
    (2L, "a a a b"),   // tf(a)=3
    (3L, "b c c"),
    (4L, "a")).toDF("doc_id", "text")

  test("df/cf exact, postings ranked by (tf desc, doc), truncated at k") {
    val got = Retrieval.invertedPostings(docs, "doc_id", "text", 2)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // a: docs {1:2, 2:3, 4:1} → df=3, cf=6, top-2 = 2:3,1:2
    assert(got("a") === ((3L, 6L, "2:3,1:2")))
    // b: tf=1 in docs 1,2,3 → tie broken by doc_id, truncated to 2 of 3
    assert(got("b") === ((3L, 3L, "1:1,2:1")))
    // c: docs {1:1, 3:2} → 3:2 first
    assert(got("c") === ((2L, 3L, "3:2,1:1")))
  }

  test("result is invariant under input repartitioning") {
    val a = Retrieval.invertedPostings(docs, "doc_id", "text", 2)
      .collect().map(_.toSeq).toSet
    val b = Retrieval.invertedPostings(docs.repartition(7), "doc_id", "text", 2)
      .collect().map(_.toSeq).toSet
    assert(a === b)
  }
}
