package graft

import graft.operators.{Joins, Quantiles, Sketches}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property invariants for the round-2 extended operators: each distributed
  * implementation must agree with a naive in-memory reference on randomized
  * inputs (fixed seeds so failures replay).
  */
class ExtPropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  def gen[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  val rowsGen: Gen[(List[(Long, Long, Double)], List[(Long, Long, Double)])] = for {
    nl <- Gen.chooseNum(1, 60)
    nr <- Gen.chooseNum(0, 60)
    l <- Gen.listOfN(nl, for {
      k <- Gen.chooseNum(1L, 4L); t <- Gen.chooseNum(0L, 100L)
      v <- Gen.chooseNum(-100, 100).map(_.toDouble)
    } yield (k, t, v))
    r <- Gen.listOfN(nr, for {
      k <- Gen.chooseNum(1L, 4L); t <- Gen.chooseNum(0L, 100L)
      v <- Gen.chooseNum(-100, 100).map(_.toDouble)
    } yield (k, t, v))
  } yield (l, r)

  test("asOf agrees with the naive latest-right-at-or-before reference (5 seeds)") {
    (1L to 5L).foreach { seed =>
      val (l, r0) = gen(rowsGen, seed)
      // distinct right (k, ts) so the reference value is unambiguous
      val r = r0.groupBy(x => (x._1, x._2)).map(_._2.maxBy(_._3)).toList
      val left = l.toDF("k", "lts", "lv")
      val right = r.toDF("k", "rts", "rv")
      val got = Joins.asOf(left, right, Seq("k"), "lts", "rts", Seq("rv"))
        .collect()
        .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2),
          if (x.isNullAt(3)) None else Some(x.getDouble(3))))
        .sortBy(x => (x._1, x._2, x._3))
      val want = l.map { case (k, t, v) =>
        val cand = r.filter(x => x._1 == k && x._2 <= t)
        val asof = if (cand.isEmpty) None
          else Some(cand.maxBy(x => (x._2, x._3))._3)
        (k, t, v, asof)
      }.sortBy(x => (x._1, x._2, x._3))
      assert(got.toList == want, s"seed=$seed")
    }
  }

  test("rangePoints agrees with the naive theta join (5 seeds, several bucket sizes)") {
    (1L to 5L).foreach { seed =>
      val (iv0, pt0) = gen(rowsGen, seed)
      val iv = iv0.zipWithIndex.map { case ((_, t, _), i) =>
        (i.toLong, t, t + (i % 37) + 1) } // [lo, hi) widths 1..37
      val pts = pt0.map(_._2)
      val intervals = iv.toDF("id", "lo", "hi")
      val points = pts.toDF("ts")
      Seq(7L, 16L, 100L).foreach { bucket =>
        val got = Joins.rangePoints(intervals, points,
            col("lo"), col("hi"), col("ts"), bucket)
          .select("id", "ts").collect().map(r => (r.getLong(0), r.getLong(1)))
          .sorted.toList
        val want = (for { (id, lo, hi) <- iv; t <- pts if t >= lo && t < hi }
          yield (id, t)).sorted
        assert(got == want, s"seed=$seed bucket=$bucket")
      }
    }
  }

  test("groupQuantiles agrees with sorted-seq indexing (5 seeds)") {
    (1L to 5L).foreach { seed =>
      val (l, _) = gen(rowsGen, seed)
      val df = l.toDF("k", "t", "v").select(col("k"), col("v"))
      val pcts = Seq(10, 25, 50, 75, 95, 100)
      val got = Quantiles.groupQuantiles(df, Seq("k"), col("v"), pcts)
        .collect().map(r => r.getLong(0) -> pcts.indices.map(i => r.getDouble(i + 1)))
        .toMap
      val want = l.groupBy(_._1).map { case (k, rows) =>
        val sorted = rows.map(_._3).sorted
        k -> pcts.map { p =>
          val rank = math.max(1, (p * sorted.size + 99) / 100)
          sorted(rank - 1)
        }
      }
      assert(got.view.mapValues(_.toList).toMap ==
        want.view.mapValues(_.toList).toMap, s"seed=$seed")
    }
  }

  test("HLL estimate is invariant under input partitioning and order (3 seeds)") {
    (1L to 3L).foreach { seed =>
      val n = 500 + seed.toInt * 377
      val vals = (1 to n).map(i => ("g", s"v${(i * seed) % (n / 2)}"))
      val df = vals.toDF("g", "x")
      def est(d: org.apache.spark.sql.DataFrame): Double =
        Sketches.hllEstimate(Sketches.hllRegisters(d, Seq("g"), col("x")),
          Seq("g"), "est").head().getDouble(1)
      val base = est(df)
      assert(est(df.repartition(13)) == base, s"seed=$seed: partitioning changed estimate")
      assert(est(df.orderBy(col("x").desc)) == base, s"seed=$seed: order changed estimate")
    }
  }
}
