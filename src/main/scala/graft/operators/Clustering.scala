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
    *
    * BIT-IDENTICAL vectors are canonicalized before the self-join (the
    * same exact-dup preamble as `Dedup.canonicalize` /
    * `Similarity.cosineNearDupPairs`): for threshold <= 1, every non-rep
    * copy is a near-dup of its group's min-id rep by definition
    * (cosine = 1), and any near-dup witness through a copy is also a
    * witness through its rep (same vector, id <= copy's id) — so pairing
    * only DISTINCT (cluster, vector) reps is semantics-preserving. Without
    * this, an m-way duplicated corpus pays m² in the self-join: the
    * round-2 10x experiment measured exactly that blowup shape (this
    * operator went 2.9s → 30.1s for 10x data before the preamble).
    */
  def semanticDedup(emb: DataFrame, idCol: String, vecCol: String,
                    k: Int, iters: Int, threshold: Double): DataFrame = {
    require(threshold <= 1.0,
      "semanticDedup: threshold > 1 breaks the identical-vector fast path")
    val (assign, _) = kmeans(emb, idCol, vecCol, k, iters)
    val a = assign.select(col(idCol).as("__id"), col("cluster"))
    val vecs = emb.select(col(idCol).as("__id"), col(vecCol).as("__v"))
    // one row per distinct (cluster, vector): min-id rep + all member ids
    val groups = a.join(vecs, "__id")
      .groupBy(col("cluster"), col("__v"))
      .agg(min(col("__id")).as("__rep"), collect_list(col("__id")).as("__members"))
      .cache()
    // copies drop unconditionally (cosine 1 vs their smaller-id rep)
    val copyDrops = groups
      .select(explode(col("__members")).as("__id"), col("__rep"))
      .where(col("__id") =!= col("__rep"))
      .select(col("__id"))
    // reps pair only against other DISTINCT vectors in the cluster
    val reps = groups.select(col("cluster"), col("__rep"), col("__v"))
    val repDrops = reps.as("l").join(reps.as("r"),
        col("l.cluster") === col("r.cluster") && col("l.__rep") < col("r.__rep"))
      .where(round(VecOps.vecDot(col("l.__v"), col("r.__v"))
        / (VecOps.vecNorm(col("l.__v")) * VecOps.vecNorm(col("r.__v"))), 6)
        >= threshold)
      .select(col("r.__rep").as("__id")).distinct()
    // disjoint by construction (copyDrops: non-reps only; repDrops: reps
    // only) and individually duplicate-free — union needs no distinct
    val dropped = copyDrops.unionByName(repDrops)
    a.join(dropped.withColumn("__hit", lit(true)), Seq("__id"), "left")
      .select(col("__id").as(idCol), col("cluster"),
        coalesce(col("__hit"), lit(false)).as("dropped"))
  }
}
