package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Connected-components gates: label propagation must match a union-find
  * reference on random graphs, and the fixed round count used by the
  * checked query must reach the fixpoint on the real corpus.
  */
class DedupClusterSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def unionFind(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    // normalize to component-min labels
    val byRoot = nodes.groupBy(find)
    byRoot.flatMap { case (_, ns) => val m = ns.min; ns.map(_ -> m) }.toMap
  }

  val graphGen: Gen[List[(Long, Long)]] = for {
    n <- Gen.chooseNum(1, 120)
    es <- Gen.listOfN(n, for {
      a <- Gen.chooseNum(0L, 59L); d <- Gen.chooseNum(1L, 10L)
    } yield (a, math.min(60L, a + d)))
  } yield es

  test("label propagation matches union-find on random graphs (5 seeds, both paths)") {
    (1L to 5L).foreach { seed =>
      val edges = graphGen.apply(Gen.Parameters.default, Seed(seed)).get.distinct
      val pairs = edges.toDF("a", "b")
      val want = unionFind(edges)
      // driver-finish path (default threshold: these graphs always fit)
      val viaDriver = Dedup.clusterLabels(pairs, 61)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(viaDriver == want, s"seed=$seed (driver union-find path)")
      // distributed fallback, forced (threshold 0): path-shaped random
      // graphs can have diameter ~#nodes, so give the min-label rounds a
      // 61-round budget to guarantee convergence
      val viaRounds = Dedup.clusterLabels(pairs, 61, driverFinishMaxEdges = 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(viaRounds == want, s"seed=$seed (distributed min-label path)")
    }
  }

  test("driver union-find spills to the next tier when the NODE cap trips") {
    val edges = (0L until 200L).map(i => (2 * i, 2 * i + 1)) // 400 distinct nodes
    val pairs = edges.toDF("a", "b")
    // edge cap would admit the graph; the node cap must refuse it mid-build
    assert(Dedup.driverUnionFind(pairs, maxNodes = 100).isEmpty,
      "400-node graph must trip a 100-node cap")
    assert(Dedup.driverUnionFind(pairs, maxNodes = 400).isDefined,
      "exact-fit graph must not trip the cap")
    // e2e: clusterLabels with both driver tiers disabled still labels
    // correctly (the distributed fallback the cap spills into)
    val want = unionFind(edges.toList)
    val got = Dedup.clusterLabels(pairs, 3, driverFinishMaxEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("convergence audit: round budget failures are loud, sufficient budgets pass") {
    // a path graph 0-1-2-...-9: min-label needs 9 synchronous rounds
    val chain = (0L until 9L).map(i => (i, i + 1))
    val pairs = chain.toDF("a", "b")
    val ex = intercept[IllegalArgumentException] {
      Dedup.clusterLabels(pairs, 3, checkConverged = true)
    }
    assert(ex.getMessage.contains("rounds"), ex.getMessage)
    val ok = Dedup.clusterLabels(pairs, 9, checkConverged = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ok == unionFind(chain.toList))
  }

  test("the checked query's 6 rounds reach the fixpoint on sf0.01 (fallback path)") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val pairs = Dedup.minhashLshPairs(docs, 3, PipelineQueries.MinhashBands,
      PipelineQueries.MinhashRows, PipelineQueries.MinhashBucketCap).cache()
    // force the distributed rounds (the production query takes the exact
    // driver-finish path at every measured corpus; this pins that the
    // ClusterIters budget is still sound if the fallback ever fires)
    val at6 = Dedup.clusterLabels(pairs, PipelineQueries.ClusterIters,
        driverFinishMaxEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    val exact = Dedup.clusterLabels(pairs, PipelineQueries.ClusterIters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    assert(at6 == exact,
      "6 distributed rounds disagree with exact union-find on the test corpus")
  }
}
