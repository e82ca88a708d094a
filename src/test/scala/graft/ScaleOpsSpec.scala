package graft

import graft.operators.{ChangeCapture, Graph, Quantiles, Similarity}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-4 scale-path operators: fixed-point PageRank, histogram
  * quantiles, snapshot CDC, SCD-2 intervals, embedding dimension stats.
  */
class ScaleOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // ---- PageRank -----------------------------------------------------------

  /** Reference implementation of the exact integer update rule, driver-side. */
  private def refPagerank(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val nn = nodes.length.toLong
    val deg = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    var rank = nodes.map(n => n -> Graph.Scale / nn).toMap
    for (_ <- 1 to iters) {
      val dang = nodes.filterNot(deg.contains).map(rank).sum
      val inbound = edges.groupBy(_._2).view.mapValues { es =>
        es.map { case (u, _) => rank(u) / deg(u) }.sum
      }.toMap
      rank = nodes.map { v =>
        v -> ((15L * Graph.Scale) / (100L * nn)
          + (85L * dang) / (100L * nn)
          + (85L * inbound.getOrElse(v, 0L)) / 100L)
      }.toMap
    }
    rank
  }

  test("pagerank matches the driver-side integer reference on a small graph") {
    // 1→2, 2→1, 3→1, 3→2, 4 dangling (reached from 1)
    val edges = Seq((1L, 2L), (2L, 1L), (3L, 1L), (3L, 2L), (1L, 4L))
    val got = Graph.pagerank(edges.toDF("src", "dst"), 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === refPagerank(edges, 4))
  }

  test("pagerank: authority flows to the sink of a chain, total mass sane") {
    // chain 1→2→3: rank(3) > rank(2) > rank(1) after enough rounds
    val got = Graph.pagerank(Seq((1L, 2L), (2L, 3L)).toDF("src", "dst"), 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(3L) > got(2L) && got(2L) > got(1L))
    // floors only ever LOSE mass: total stays within 1e-6 of SCALE but never above
    val total = got.values.sum
    assert(total <= Graph.Scale && total > (Graph.Scale * 0.99).toLong)
  }

  test("pagerank is invariant under input partitioning") {
    val edges = (1L to 40L).flatMap(i => Seq((i, i % 7 + 1), (i % 5 + 1, i)))
    val a = Graph.pagerank(edges.toDF("src", "dst"), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val b = Graph.pagerank(edges.toDF("src", "dst").repartition(13), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(a === b)
  }

  // ---- histogram quantiles ------------------------------------------------

  test("histogram quantile estimates land within one bin width of exact") {
    val bins = 64
    val df = (1 to 4000).map(i => ("g" + i % 3, (i * 2654435761L % 10007).toDouble))
      .toDF("g", "v")
    val est = Quantiles.histogramQuantiles(df, Seq("g"), col("v"), bins, Seq(50, 90, 99))
      .collect().map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val exact = Quantiles.groupQuantiles(df, Seq("g"), col("v"), Seq(50, 90, 99))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    for (g <- est.keys) {
      val binW = 10007.0 / bins * 1.05 // min/max per group ≈ full range
      assert(math.abs(est(g)._1 - exact(g)._1) <= binW, s"$g p50")
      assert(math.abs(est(g)._2 - exact(g)._2) <= binW, s"$g p90")
      assert(math.abs(est(g)._3 - exact(g)._3) <= binW, s"$g p99")
    }
  }

  test("histogram quantiles: constant group degenerates to the constant") {
    val df = Seq(("a", 5.0), ("a", 5.0), ("a", 5.0)).toDF("g", "v")
    val r = Quantiles.histogramQuantiles(df, Seq("g"), col("v"), 16, Seq(50, 99))
      .collect().head
    assert(r.getLong(1) === 3L && r.getDouble(2) === 5.0 && r.getDouble(3) === 5.0)
  }

  // ---- snapshot diff ------------------------------------------------------

  test("snapshotDiff classifies insert/update/delete/unchanged, null-safely") {
    val old = Seq((1L, Some("A"), 10.0), (2L, Some("B"), 20.0),
      (3L, Some("C"), 30.0), (4L, None: Option[String], 40.0))
      .toDF("k", "st", "tp")
    val nw = Seq((1L, Some("A"), 10.0), (2L, Some("X"), 20.0),
      (4L, Some("D"), 40.0), (5L, Some("E"), 50.0))
      .toDF("k", "st", "tp")
    val got = ChangeCapture.snapshotDiff(old, nw, Seq("k"), Seq("st", "tp"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "unchanged", 2L -> "update", 3L -> "delete",
      4L -> "update", // NULL → D must classify as update, not unchanged
      5L -> "insert"))
  }

  // ---- SCD-2 intervals ----------------------------------------------------

  test("scd2Intervals collapses runs and links validity bounds") {
    val ev = Seq(
      (1L, 10L, 100L, "a"), (1L, 11L, 200L, "a"), (1L, 12L, 300L, "b"),
      (1L, 13L, 400L, "a"), (2L, 20L, 150L, "x"))
      .toDF("user_id", "event_id", "us", "state")
    val got = ChangeCapture.scd2Intervals(ev, Seq("user_id"), col("us"),
      Seq(col("event_id")), col("state"))
      .orderBy("user_id", "valid_from")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]), r.getInt(4)))
    assert(got === Seq(
      (1L, "a", 100L, Some(300L), 0), (1L, "b", 300L, Some(400L), 0),
      (1L, "a", 400L, None, 1), (2L, "x", 150L, None, 1)))
  }

  test("scd2Intervals: same-instant ties resolve by the tiebreak column") {
    val ev = Seq((1L, 2L, 100L, "b"), (1L, 1L, 100L, "a"))
      .toDF("user_id", "event_id", "us", "state")
    val got = ChangeCapture.scd2Intervals(ev, Seq("user_id"), col("us"),
      Seq(col("event_id")), col("state"))
      .orderBy("valid_from", "state").collect()
      .map(r => (r.getString(1), r.getInt(4)))
    // event_id 1 ("a") precedes event_id 2 ("b"): two change rows, b current
    assert(got.toSeq === Seq(("a", 0), ("b", 1)))
  }

  // ---- embedding dimension stats ------------------------------------------

  test("dimStats matches a driver-side brute force on quantized values") {
    val vecs = (0 until 50).map { i =>
      Tuple1((0 until 8).map(d => ((i * 31 + d * 17) % 200 - 100) / 97.0f).toArray)
    }
    val df = vecs.toDF("embedding")
    val got = Similarity.dimStats(df).orderBy("dim").collect()
    val qs = vecs.map(_._1.map(x => math.floor(x.toDouble * 1e6).toLong))
    for (d <- 0 until 8) {
      val col = qs.map(_(d))
      val n = col.size.toLong
      val s = col.sum
      val s2 = col.map(q => BigInt(q) * q).sum
      val r = got(d)
      assert(r.getLong(1) === n)
      assert(math.abs(r.getDouble(2) - s.toDouble / (n * 1e6)) < 1e-6)
      val varExact = (BigInt(n) * s2 - BigInt(s) * s).toDouble / (n * n).toDouble / 1e12
      assert(math.abs(r.getDouble(3) - varExact) < 1e-6)
      assert(r.getDouble(4) === col.min / 1e6 && r.getDouble(5) === col.max / 1e6)
    }
  }
}
