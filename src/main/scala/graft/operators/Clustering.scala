package graft.operators

import graft.functions.VecOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic Lloyd's k-means over embedding columns, and the
  * SemDeDup-style semantic dedup built on top of it (cluster the corpus,
  * then drop within-cluster cosine near-duplicates keeping the earliest
  * id — Abbas et al. 2023's recipe for pruning web-scale training sets).
  *
  * Engine shape: centroids are a k x dim table, bounded and tiny, so they
  * live on the driver and enter each iteration as broadcast literals — the
  * corpus-side work per iteration is ONE narrow codegen'd projection
  * (k dot products per row) plus one (cluster, dim)-grouped aggregation
  * whose partial aggregates make the shuffle k*dim rows, independent of
  * corpus size. No iteration ever shuffles the vectors themselves.
  *
  * Determinism (the oracle contract): per-dimension centroid numerators
  * are accumulated as 1e6-scaled BIGINTs, so sums are exact integers and
  * independent of partitioning/visit order; each new centroid value is
  * then the same double `sum / (n * 1e6)` in any engine. Assignment ties
  * (identical distances, e.g. duplicated vectors seeding twin centroids)
  * resolve to the smallest cluster id. Clusters that lose all members are
  * dropped, matching the unrolled SQL oracle exactly.
  */
object Clustering {

  /** One k-means distance: squared L2 via dot products, computed as
    * v.v - 2 v.c + c.c with the centroid dot precomputed on the driver.
    */
  private def distSq(vv: Column, v: Column, c: Seq[Double]): Column = {
    val cc = c.foldLeft(0.0)((s, x) => s + x * x)
    vv - lit(2.0) * VecOps.vecDot(v, lit(c.toArray)) + lit(cc)
  }

  /** Argmin over the (clusterId, centroid) list; ties -> smallest id.
    * Emitted as least() + a first-match CASE so the whole assignment stays
    * one codegen'd projection.
    */
  private def assignExpr(vv: Column, v: Column, cents: Seq[(Int, Seq[Double])])
      : (Column, Column) = {
    val ds = cents.map { case (id, c) => (id, distSq(vv, v, c)) }
    val best = least(ds.map(_._2): _*)
    // nested CASE with the smallest cluster id as the OUTERMOST branch, so
    // the first (smallest id) match wins on exact-distance ties
    val cl = ds.reverse.foldLeft(lit(ds.last._1)) { case (acc, (id, d)) =>
      when(d === best, id).otherwise(acc)
    }
    (cl, best)
  }

  /** Scaled exact numerator: round(x * 1e6) as BIGINT. Portable: round()
    * is half-away-from-zero for doubles in both engines.
    */
  private def scaled(x: Column): Column = round(x * 1000000.0).cast("long")

  /** Run `iters` Lloyd iterations from the k smallest-id vectors.
    * Returns (assignments: id, cluster, dist2; final centroids by id).
    * `vecCol` must already be ARRAY<DOUBLE>.
    */
  def kmeans(emb: DataFrame, idCol: String, vecCol: String, k: Int, iters: Int)
      : (DataFrame, Seq[(Int, Seq[Double])]) = {
    val spark = emb.sparkSession
    val e = emb.select(col(idCol).as("__id"), col(vecCol).as("__v"))
      .withColumn("__vv", VecOps.vecDot(col("__v"), col("__v")))
    // init: the k smallest-id vectors, cluster id = rank (0-based). A tiny
    // bounded driver collect, same as any broadcast dimension table.
    var cents: Seq[(Int, Seq[Double])] = e.orderBy("__id").limit(k)
      .select("__v").collect().toSeq.zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Double](0)) }
    for (_ <- 1 to iters) {
      val (cl, _) = assignExpr(col("__vv"), col("__v"), cents)
      // exact per-(cluster, dim) numerators; the posexplode fans out dim
      // rows per vector but partial aggregation collapses them map-side,
      // so the shuffle is k*dim rows regardless of corpus size
      val sums = e.withColumn("__cl", cl)
        .select(col("__cl"), posexplode(col("__v")).as(Seq("__d", "__x")))
        .groupBy("__cl", "__d")
        .agg(sum(scaled(col("__x"))).as("__sq"), count(lit(1)).as("__n"))
        .collect()
      cents = sums.groupBy(_.getInt(0)).toSeq.map { case (clId, rows) =>
        val dim = rows.map(r => (r.getInt(1), r.getLong(2) / (r.getLong(3) * 1000000.0)))
        (clId, dim.sortBy(_._1).map(_._2).toSeq)
      }.sortBy(_._1)
    }
    val (cl, d) = assignExpr(col("__vv"), col("__v"), cents)
    val out = e.select(col("__id").as(idCol), cl.as("cluster"),
      round(d, 6).as("dist2"))
    (out, cents)
  }

  /** SemDeDup: k-means-cluster, then inside each cluster mark every vector
    * that has a SMALLER-id near-duplicate (rounded cosine >= threshold) as
    * dropped. The within-cluster self-join is the operator's whole cost —
    * quadratic in cluster size, which is why k must grow with the corpus
    * (SemDeDup uses k ~ sqrt(N); the blocking argument mirrors the LSH
    * bucket caps elsewhere in this package). Pairs travel as slim
    * (a, b) ids; vectors re-join only for the cosine refine.
    */
  def semanticDedup(emb: DataFrame, idCol: String, vecCol: String,
                    k: Int, iters: Int, threshold: Double): DataFrame = {
    val (assign, _) = kmeans(emb, idCol, vecCol, k, iters)
    val a = assign.select(col(idCol).as("__id"), col("cluster"))
    val vecs = emb.select(col(idCol).as("__id"), col(vecCol).as("__v"))
    val pairs = a.as("l").join(a.as("r"),
        col("l.cluster") === col("r.cluster") && col("l.__id") < col("r.__id"))
      .select(col("l.__id").as("a"), col("r.__id").as("b"))
    val dropped = pairs
      .join(vecs.withColumnRenamed("__id", "a").withColumnRenamed("__v", "__va"), "a")
      .join(vecs.withColumnRenamed("__id", "b").withColumnRenamed("__v", "__vb"), "b")
      .where(round(VecOps.vecDot(col("__va"), col("__vb"))
        / (VecOps.vecNorm(col("__va")) * VecOps.vecNorm(col("__vb"))), 6)
        >= threshold)
      .select(col("b").as("__id")).distinct()
    a.join(dropped.withColumn("__hit", lit(true)), Seq("__id"), "left")
      .select(col("__id").as(idCol), col("cluster"),
        coalesce(col("__hit"), lit(false)).as("dropped"))
  }
}
