package graft

import graft.operators.Sketches
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** HLL sketch quality + mergeability gates. */
class SketchesSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("estimate within 10% at 5k distinct (raw path) and 150 distinct (corrected path)") {
    val big = (1 to 5000).map(i => ("g", s"v$i")).toDF("g", "x")
    val bigEst = Sketches.hllEstimate(
      Sketches.hllRegisters(big, Seq("g"), col("x")), Seq("g"), "est")
      .head().getDouble(1)
    assert(math.abs(bigEst - 5000) / 5000.0 < 0.10, s"raw-path estimate $bigEst")

    val small = (1 to 150).map(i => ("g", s"u$i")).toDF("g", "x")
    val smallEst = Sketches.hllEstimate(
      Sketches.hllRegisters(small, Seq("g"), col("x")), Seq("g"), "est")
      .head().getDouble(1)
    assert(math.abs(smallEst - 150) / 150.0 < 0.10, s"corrected-path estimate $smallEst")
  }

  test("register tables merge associatively: union+max == whole") {
    val a = (1 to 800).map(i => ("g", s"v$i")).toDF("g", "x")
    val b = (500 to 1200).map(i => ("g", s"v$i")).toDF("g", "x")  // overlapping
    val whole = Sketches.hllRegisters(a.union(b), Seq("g"), col("x"))
    val merged = Sketches.hllRegisters(a, Seq("g"), col("x"))
      .union(Sketches.hllRegisters(b, Seq("g"), col("x")))
      .groupBy(col("g"), col("reg")).agg(max(col("m_rank")).as("m_rank"))
    assert(merged.exceptAll(whole).isEmpty && whole.exceptAll(merged).isEmpty)
  }

  test("CMS estimates are upper bounds and tight for skewed items") {
    // 1 heavy item (500x) + 200 light items (1x each)
    val rows = (1 to 500).map(_ => ("g", "heavy")) ++ (1 to 200).map(i => ("g", s"u$i"))
    val df = rows.toDF("g", "x")
    val sketch = Sketches.cmsSketch(df, Seq("g"), col("x"))
    val items = df.select(col("g"), col("x")).distinct()
    val est = Sketches.cmsEstimate(sketch, items, Seq("g"), col("x"), "est")
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    val exact = rows.groupBy(_._2).map { case (k, v) => k -> v.size.toLong }
    est.foreach { case (k, e) => assert(e >= exact(k), s"$k: est $e < exact ${exact(k)}") }
    // the heavy hitter's estimate is within the classic eps*N slack
    assert(est("heavy") <= 500 + (2.0 * 700 / Sketches.CmsWidth).ceil.toLong * 2)
  }

  test("CMS estimate of a never-ingested item is 0 when any bucket is empty") {
    // tiny sketch: 3 rows -> most buckets empty, so an unseen item almost
    // surely has >= 1 empty bucket and min(coalesce(c,0)) must yield 0
    val df = Seq(("g", "a"), ("g", "b"), ("g", "c")).toDF("g", "x")
    val sketch = Sketches.cmsSketch(df, Seq("g"), col("x"))
    val items = Seq(("g", "never-seen-item-xyz"), ("g", "a")).toDF("g", "x")
    val est = Sketches.cmsEstimate(sketch, items, Seq("g"), col("x"), "est")
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(est("never-seen-item-xyz") == 0L, s"unseen item estimated ${est.get("never-seen-item-xyz")}")
    assert(est("a") >= 1L)
  }

  test("cmsSketchWeighted over per-value counts == cmsSketch over every occurrence") {
    val rows = (1 to 500).map(_ => ("g", "heavy")) ++ (1 to 200).map(i => ("g", s"u${i % 37}"))
    val df = rows.toDF("g", "x")
    val perOcc = Sketches.cmsSketch(df, Seq("g"), col("x"))
    val counts = df.groupBy(col("g"), col("x")).agg(count(lit(1)).as("n"))
    val weighted = Sketches.cmsSketchWeighted(counts, Seq("g"), col("x"), col("n"))
    assert(weighted.exceptAll(perOcc).isEmpty && perOcc.exceptAll(weighted).isEmpty)
  }

  test("hllRegistersFromHash with h32 of the value == hllRegisters") {
    val df = (1 to 300).map(i => ("g", s"doc$i")).toDF("g", "x")
    val direct = Sketches.hllRegisters(df, Seq("g"), col("x"))
    val fromHash = Sketches.hllRegistersFromHash(df, Seq("g"),
      graft.operators.Dedup.h32(col("x")))
    assert(fromHash.exceptAll(direct).isEmpty && direct.exceptAll(fromHash).isEmpty)
  }

  test("CMS sketch state merges by SUM: union of shards == whole") {
    val a = (1 to 300).map(i => ("g", s"v${i % 40}")).toDF("g", "x")
    val b = (1 to 300).map(i => ("g", s"v${i % 55}")).toDF("g", "x")
    val whole = Sketches.cmsSketch(a.union(b), Seq("g"), col("x"))
    val merged = Sketches.cmsSketch(a, Seq("g"), col("x"))
      .union(Sketches.cmsSketch(b, Seq("g"), col("x")))
      .groupBy(col("g"), col("row"), col("bucket")).agg(sum(col("c")).as("c"))
    assert(merged.exceptAll(whole).isEmpty && whole.exceptAll(merged).isEmpty)
  }

  test("estimate is insensitive to duplication (set semantics)") {
    val once = (1 to 1000).map(i => ("g", s"v$i")).toDF("g", "x")
    val thrice = once.union(once).union(once)
    val e1 = Sketches.hllEstimate(
      Sketches.hllRegisters(once, Seq("g"), col("x")), Seq("g"), "est").head().getDouble(1)
    val e3 = Sketches.hllEstimate(
      Sketches.hllRegisters(thrice, Seq("g"), col("x")), Seq("g"), "est").head().getDouble(1)
    assert(e1 == e3)
  }
}
