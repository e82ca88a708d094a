package graft

import graft.operators.{ChangeCapture, Graph, Quantiles}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property invariants for the round-4 scale-path operators: each
  * distributed implementation must agree with a naive in-memory reference
  * on randomized inputs (fixed seeds so failures replay).
  */
class ScalePropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  def gen[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  // ---- snapshotDiff vs brute force ---------------------------------------

  val snapGen: Gen[(List[(Long, String)], List[(Long, String)])] = for {
    no <- Gen.chooseNum(0, 80)
    nn <- Gen.chooseNum(0, 80)
    o <- Gen.listOfN(no, for {
      k <- Gen.chooseNum(1L, 40L); v <- Gen.oneOf("a", "b", "c")
    } yield (k, v))
    n <- Gen.listOfN(nn, for {
      k <- Gen.chooseNum(1L, 40L); v <- Gen.oneOf("a", "b", "c")
    } yield (k, v))
  } yield (o.distinctBy(_._1), n.distinctBy(_._1))

  test("snapshotDiff agrees with the naive set-algebra reference (8 seeds)") {
    (1L to 8L).foreach { seed =>
      val (o, n) = gen(snapGen, seed)
      val om = o.toMap; val nm = n.toMap
      val expected = (om.keySet ++ nm.keySet).map { k =>
        k -> ((om.get(k), nm.get(k)) match {
          case (None, Some(_)) => "insert"
          case (Some(_), None) => "delete"
          case (Some(a), Some(b)) if a == b => "unchanged"
          case _ => "update"
        })
      }.toMap
      val got = ChangeCapture.snapshotDiff(
        o.toDF("k", "v"), n.toDF("k", "v"), Seq("k"), Seq("v"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got === expected, s"seed=$seed")
    }
  }

  test("snapshotDiff: null-keyed rows classify by SIDE PRESENCE, not key nullability") {
    // a null key never matches (===), but the row still EXISTS on its side:
    // old-only null key = delete, new-only null key = insert — reading the
    // null key as "side absent" would call both of these inserts
    val o = Seq((Option(1L), "a"), (Option.empty[Long], "x")).toDF("k", "v")
    val n = Seq((Option(1L), "a"), (Option.empty[Long], "y")).toDF("k", "v")
    val got = ChangeCapture.snapshotDiff(o, n, Seq("k"), Seq("v"))
      .collect().map(r => (if (r.isNullAt(0)) -1L else r.getLong(0)) -> r.getString(1))
    assert(got.count(_ == (-1L, "delete")) == 1, got.toSeq.toString)
    assert(got.count(_ == (-1L, "insert")) == 1, got.toSeq.toString)
    assert(got.count(_ == (1L, "unchanged")) == 1, got.toSeq.toString)
    assert(got.length == 3)
  }

  // ---- histogram quantiles: bin-width error bound on random data ---------

  val histGen: Gen[List[(String, Double)]] = for {
    n <- Gen.chooseNum(50, 400)
    rows <- Gen.listOfN(n, for {
      g <- Gen.oneOf("x", "y")
      v <- Gen.chooseNum(-5000, 5000).map(_ / 7.0)
    } yield (g, v))
  } yield rows

  test("histogram quantile error stays within one bin width of exact (6 seeds)") {
    val bins = 32
    (1L to 6L).foreach { seed =>
      val rows = gen(histGen, seed)
      val df = rows.toDF("g", "v")
      val est = Quantiles.histogramQuantiles(df, Seq("g"), col("v"), bins, Seq(50, 90))
        .collect().map(r => r.getString(0) -> ((r.getDouble(2), r.getDouble(3)))).toMap
      for ((g, vs0) <- rows.groupBy(_._1)) {
        val vs = vs0.map(_._2).sorted
        val binW = (vs.last - vs.head) / bins
        def exact(p: Int) = vs(math.max(1, (p * vs.size + 99) / 100) - 1)
        assert(math.abs(est(g)._1 - exact(50)) <= binW + 1e-9, s"seed=$seed g=$g p50")
        assert(math.abs(est(g)._2 - exact(90)) <= binW + 1e-9, s"seed=$seed g=$g p90")
      }
    }
  }

  // ---- pagerank vs driver reference on random graphs ---------------------

  val graphGen: Gen[List[(Long, Long)]] = for {
    n <- Gen.chooseNum(1, 120)
    edges <- Gen.listOfN(n, for {
      s <- Gen.chooseNum(1L, 30L); d <- Gen.chooseNum(1L, 30L)
    } yield (s, d))
  } yield edges

  test("pagerank agrees with the exact integer reference on random graphs (5 seeds)") {
    (1L to 5L).foreach { seed =>
      val edges = gen(graphGen, seed)
      // reference: same exact integer update rule, computed sequentially
      val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
      val nn = nodes.length.toLong
      val deg = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
      var rank = nodes.map(v => v -> Graph.Scale / nn).toMap
      for (_ <- 1 to 3) {
        val dang = nodes.filterNot(deg.contains).map(rank).sum
        val inb = edges.groupBy(_._2).view.mapValues(
          _.map { case (u, _) => rank(u) / deg(u) }.sum).toMap
        rank = nodes.map { v =>
          v -> ((15L * Graph.Scale) / (100L * nn)
            + (85L * dang) / (100L * nn)
            + (85L * inb.getOrElse(v, 0L)) / 100L)
        }.toMap
      }
      val got = Graph.pagerank(edges.toDF("src", "dst"), 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === rank, s"seed=$seed")
    }
  }

  test("pagerank conserves total mass per round up to the floor-division deficit (5 seeds)") {
    // Each round's floors lose at most: N (teleport) + N (dangling term)
    // + N (inbound 85/100) + E (share = rank DIV deg forfeits < deg per
    // node), and the initial split loses < N — so after r rounds
    //   Scale >= sum(rank) >= Scale - N - r*(E + 3N).
    // This is the exact-integer contract the BIGINT oracle cast relies on:
    // total mass can never overflow because it never exceeds Scale.
    (1L to 5L).foreach { seed =>
      val edges = gen(graphGen, seed)
      val nn = (edges.map(_._1) ++ edges.map(_._2)).distinct.length.toLong
      val ee = edges.length.toLong
      (1 to 3).foreach { iters =>
        val total = Graph.pagerank(edges.toDF("src", "dst"), iters)
          .agg(sum(col("rank"))).head().getLong(0)
        assert(total <= Graph.Scale, s"seed=$seed iters=$iters: mass grew")
        assert(total >= Graph.Scale - nn - iters * (ee + 3 * nn),
          s"seed=$seed iters=$iters: deficit beyond the floor bound")
      }
    }
  }

  test("semanticDedupAdaptive agrees with the naive within-cluster reference (4 seeds)") {
    import graft.operators.Clustering
    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def dot(a: Seq[Double], b: Seq[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 } // left-to-right, as VecOps
      s
    }
    val th = 0.9
    (1L to 4L).foreach { seed =>
      val vecGen = for {
        n <- Gen.chooseNum(25, 60)
        vs <- Gen.listOfN(n, Gen.listOfN(4, Gen.chooseNum(-100, 100).map(_ / 37.0)))
      } yield vs
      val base = gen(vecGen, seed).zipWithIndex.map { case (v, i) => (i.toLong, v: Seq[Double]) }
      // force exact duplicates with larger ids (the canonicalization path)
      val data = base ++ base.take(6).map { case (i, v) => (1000L + i, v) }
      val df = data.toDF("vec_id", "v")
      val got = Clustering.semanticDedupAdaptive(df, "vec_id", "v", 2, th)
        .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getBoolean(2))).toMap
      // reference: trusted assignment (pinned by its own specs), then naive
      // all-pairs within-cluster check — id drops iff ANY smaller id in its
      // cluster is a rounded-cosine near-dup
      val cl = Clustering.kmeansAdaptive(df, "vec_id", "v", 2)._1
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val byId = data.toMap
      data.foreach { case (id, v) =>
        val expDropped = data.exists { case (id2, v2) =>
          id2 < id && cl(id2) == cl(id) &&
            round6(dot(v, v2) / (math.sqrt(dot(v, v)) * math.sqrt(dot(v2, v2)))) >= th
        }
        assert(got(id) == ((cl(id), expDropped)),
          s"seed=$seed id=$id got=${got(id)} expected=(${cl(id)}, $expDropped) v=${byId(id)}")
      }
    }
  }

  test("pagerank is invariant to edge-list order and partitioning (3 seeds)") {
    (1L to 3L).foreach { seed =>
      val edges = gen(graphGen, seed)
      val base = Graph.pagerank(edges.toDF("src", "dst"), 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // reversed order, different partition count: identical ranks required
      // (integer sums are order-independent; float PageRank would fail this)
      val perm = Graph.pagerank(
        edges.reverse.toDF("src", "dst").repartition(7), 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(perm === base, s"seed=$seed")
    }
  }
}
