package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** LSH quality gates: the planes must actually be locality-sensitive (the
  * round-1 mixer degenerated to identical all-+1 planes, collapsing every
  * bucket), and the blocked paths must hit a recall floor against the exact
  * brute-force baselines on real test data.
  */
class SimilaritySpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  val sfDir = "/root/testdata/sf0.01"
  lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").cache()

  test("planes are distinct and mixed-sign (no parity degeneracy)") {
    val ps = Similarity.multiTablePlanes(PipelineQueries.LshTables,
      PipelineQueries.LshPlanesPerTable, 64)
    val flat = ps.flatten
    assert(flat.distinct.size == flat.size, "duplicate hyperplanes across tables")
    flat.foreach { plane =>
      assert(plane.contains(1.0) && plane.contains(-1.0), "single-sign plane")
      // roughly balanced: a fair mixer keeps each sign within [25%, 75%]
      val pos = plane.count(_ > 0)
      assert(pos >= plane.size / 4 && pos <= plane.size * 3 / 4, s"skewed plane: $pos/+")
    }
  }

  test("lshBucket spreads vectors over many buckets") {
    val ps = Similarity.planes(PipelineQueriesLshPlanes, 64, table = 0)
    val n = emb.select(Similarity.lshBucket(
        Similarity.asDouble(col("embedding")), ps).as("b"))
      .select(countDistinct(col("b"))).head().getLong(0)
    // 4 planes -> 16 buckets; degenerate planes would collapse to <= 2
    assert(n >= 8, s"only $n distinct buckets")
  }
  private def PipelineQueriesLshPlanes = PipelineQueries.LshPlanesPerTable

  test("lshBucketsAll kernel is bit-identical to the per-table lshBucket composition (r9)") {
    // the one-call kernel exists because the composed form's generated
    // method exceeds JIT limits at adaptive depth; equivalence here pins
    // that the kernel's arithmetic (dot fold order, >0 sign, bit sum)
    // matches the documented column composition exactly, at an adaptive
    // 16x16 depth like the 100x corpus selects
    val tables = Similarity.multiTablePlanes(16, 16, 64)
    val both = emb.select(
        graft.functions.VecOps.lshBucketsAll(
          Similarity.asDouble(col("embedding")), tables).as("k"),
        org.apache.spark.sql.functions.array(
          tables.map(t => Similarity.lshBucket(
            Similarity.asDouble(col("embedding")), t)): _*).as("c"))
      .where(org.apache.spark.sql.functions.not(col("k") === col("c")))
    assert(both.isEmpty, "kernel and composition disagree on some vector")
  }

  test("multi-table ANN recall@5 >= 0.9 vs brute force (sf0.01)") {
    val queries = emb.where(col("vec_id") < PipelineQueries.NumQueryVecs)
    val k = PipelineQueries.KnnK
    val exact = Similarity.bruteForceKnn(emb, queries, k)
      .select("query_id", "nbr_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.lshAnn(emb, queries, k, PipelineQueries.AnnTables)
      .select("query_id", "nbr_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"ANN recall@$k = $recall")
  }

  test("IVF ANN recall@5 vs brute force (sf0.01) hits its floor") {
    val queries = emb.where(col("vec_id") < PipelineQueries.NumQueryVecs)
    val k = PipelineQueries.KnnK
    val exact = Similarity.bruteForceKnn(emb, queries, k)
      .select("query_id", "nbr_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.ivfAnn(emb, queries, k,
        ExtQueries.IvfCentroids, ExtQueries.IvfProbe)
      .select("query_id", "nbr_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"IVF recall@$k = $recall")
  }

  test("blocked near-dup recall >= 0.9 vs exhaustive (sf0.01)") {
    val thr = PipelineQueries.CosineThreshold
    val exact = Similarity.cosineNearDupPairsExhaustive(emb, thr)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val blocked = Similarity.cosineNearDupPairs(emb, thr, PipelineQueries.AnnTables)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(blocked.subsetOf(exact), "blocked path produced a pair the exhaustive scan did not")
    val recall = (exact & blocked).size.toDouble / exact.size
    assert(recall >= 0.9, s"near-dup recall = $recall")
  }
}
