package graft.operators

import graft.functions.VecOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic Lloyd's k-means over embedding columns, and the
  * SemDeDup-style semantic dedup built on top of it (cluster the corpus,
  * then drop within-cluster cosine near-duplicates keeping the earliest
  * id — Abbas et al. 2023's recipe for pruning web-scale training sets).
  *
  * Engine shape: centroids are a k x dim table, bounded and tiny, so they
  * live on the driver and enter each iteration as broadcast literals (k <=
  * 100) or as a broadcast k-row frame (above that) — the corpus-side work
  * per iteration is ONE fused codegen pass (each of the k distances
  * computed exactly once per row) plus the `vec_sum_scaled` aggregate
  * kernel, whose partial aggregates make the shuffle k array rows,
  * independent of corpus size. No iteration ever shuffles the vectors
  * themselves.
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

  /** Cluster count sized to the corpus: k = max(minK, ceil(sqrt(n))) over
    * DISTINCT vectors — the SemDeDup build rule (k ~ sqrt(N) keeps expected
    * cluster size ~sqrt(N), so the within-cluster self-join stays ~N total
    * pairs instead of N²/k). The same grow-the-index-with-the-data rule as
    * [[Similarity.adaptivePlanesPerTable]]: a fixed k saturates — cluster
    * occupancy grows linearly with the corpus and the pairing re-quadratizes
    * (the round-4 10x run measured exactly that residue at fixed k=8).
    */
  def adaptiveK(nDistinctVectors: Long, minK: Int = 8): Int =
    math.max(minK, math.ceil(math.sqrt(nDistinctVectors.toDouble)).toInt)

  /** Above this k, assignment switches from k·dim centroid literals (one
    * codegen'd projection) to the broadcast centroid FRAME
    * ([[frameAssign]]: k rows shipped per iteration, argmin as one
    * primitive loop, centroids never collected). The literal path wins
    * only while its generated code stays small: every iteration embeds
    * FRESH centroid literals, so each iteration's plan is a new Janino
    * compilation whose size grows with k·dim — at the sf0.1 adaptive
    * k = 71 that recompile cost made the literal path ~0.5-0.7 s SLOWER
    * per query than the frame loop (r14 interleaved A/B: embed_kmeans
    * 2.33 → 1.65 s, dedup_semantic 2.59 → 2.11 s). 16 keeps genuinely
    * small-k callers on the fused-codegen path; both paths are pinned
    * bit-identical by spec.
    */
  val LiteralAssignMax = 16

  /** One k-means distance: squared L2 via dot products, computed as
    * v.v - 2 v.c + c.c with the centroid dot precomputed on the driver.
    */
  private def distSq(vv: Column, v: Column, c: Seq[Double]): Column = {
    val cc = c.foldLeft(0.0)((s, x) => s + x * x)
    vv - lit(2.0) * VecOps.vecDot(v, lit(c.toArray)) + lit(cc)
  }

  /** Argmin over the (clusterId, centroid) list; ties -> smallest id.
    * Staged as three stacked narrow projections (distances once, then the
    * min, then the first-match CASE) that whole-stage codegen fuses into
    * one pass: each centroid distance is computed EXACTLY ONCE per row and
    * the argmin compares column references. The single-projection
    * `least(d…) + CASE(d === least…)` form re-evaluates every distance ~k
    * times per row — O(k² · dim) flops — invisible at k=8 but a measured
    * 10x slowdown once the corpus-adaptive rule pushed k to 71 at sf0.1.
    * Output columns: `__cl` (cluster), `__d` (squared distance).
    */
  private def withAssign(e: DataFrame, cents: Seq[(Int, Seq[Double])],
                         carry: Seq[String] = Nil): DataFrame = {
    val dcols = cents.map { case (id, c) =>
      distSq(col("__vv"), col("__v"), c).as(s"__dist$id") }
    val ds = cents.map { case (id, _) => (id, col(s"__dist$id")) }
    // least() rejects a single argument — a corpus that collapses to one
    // surviving cluster must still assign, not throw
    val best = if (ds.size == 1) ds.head._2 else least(ds.map(_._2): _*)
    val staged = e.select(col("__id") +: col("__v") +: carry.map(col) ++: dcols: _*)
      .withColumn("__d", best)
    // nested CASE with the smallest cluster id as the OUTERMOST branch, so
    // the first (smallest id) match wins on exact-distance ties
    val cl = ds.reverse.foldLeft(lit(ds.last._1)) { case (acc, (id, d)) =>
      when(d === col("__d"), id).otherwise(acc)
    }
    staged.select(col("__id") +: col("__v") +: carry.map(col) ++:
      Seq(cl.as("__cl"), col("__d")): _*)
  }

  // scaled numerators (round(x * 1e6) as BIGINT, half away from zero in
  // both engines) live in the vec_sum_scaled kernel: VecAgg.scaledLong

  /** Run `iters` Lloyd iterations from the k smallest-id vectors.
    * Returns (assignments: id, cluster, dist2; final centroids by id).
    * `vecCol` must already be ARRAY<DOUBLE>, with every vector the SAME
    * length and no null elements (centroid means divide by the per-cluster
    * row count; distances truncate to the shorter operand, so ragged
    * corpora are ill-defined for k-means in any formulation).
    * `idCol` must be UNIQUE per row (the canonicalized entrypoints
    * guarantee uniqueness via min-id reps; direct callers own it). Both
    * assignment paths keep every input row — r9: the frame path's old
    * per-id argmin groupBy, which silently collapsed duplicate ids, is
    * gone with the k-row fan.
    */
  def kmeans(emb: DataFrame, idCol: String, vecCol: String, k: Int, iters: Int)
      : (DataFrame, Seq[(Int, Seq[Double])]) = {
    val e = buildCorpus(emb, idCol, vecCol)
    finishKmeans(e, idCol, k, iters, useFrame = k > LiteralAssignMax)
  }

  /** Corpus-adaptive k-means over CANONICALIZED vectors: exact duplicates
    * collapse to one weighted row before any Lloyd work, so iterations and
    * assignment cost O(distinct vectors), not O(rows) — on a heavily
    * duplicated corpus (the web-crawl norm, and exactly the 10x
    * duplication-stress corpus) the clustering cost stops growing with the
    * copy count. Results are BIT-IDENTICAL to running over every copy:
    * `round(x·1e6) · cnt` equals the sum of cnt copies of the rounded
    * integer exactly, the weighted member count matches, initialization
    * still takes the k smallest FULL-corpus ids (twin centroids from
    * duplicated seeds included), and every copy inherits its rep's
    * assignment — pinned by spec against the explicit-k all-copies run.
    * k = [[adaptiveK]] of the canonical row count (no separate distinct
    * scan).
    */
  def kmeansAdaptive(emb: DataFrame, idCol: String, vecCol: String, iters: Int,
                     minK: Int = 8,
                     roundProbe: DataFrame => Unit = _ => ())
      : (DataFrame, Seq[(Int, Seq[Double])]) = {
    val (out, cents, repFrame) =
      kmeansCanonical(emb, idCol, vecCol, iters, minK, roundProbe)
    repFrame.unpersist()
    (out, cents)
  }

  /** Canonical weighted run; also returns the rep-level frame
    * (cluster, __rep, __v, __members), CACHED — callers that don't need it
    * must unpersist it ([[kmeansAdaptive]]), [[semanticDedupAdaptive]]
    * reuses it as its pairing groups.
    */
  private def kmeansCanonical(emb: DataFrame, idCol: String, vecCol: String,
                              iters: Int, minK: Int,
                              roundProbe: DataFrame => Unit = _ => ())
      : (DataFrame, Seq[(Int, Seq[Double])], DataFrame) = {
    val full = emb.select(col(idCol).as("__id"), col(vecCol).as("__v"))
    val canon = full.groupBy("__v")
      .agg(min(col("__id")).as("__rep"), count(lit(1)).as("__cnt"),
        collect_list(col("__id")).as("__members"))
      .cache()
    val k = adaptiveK(canon.count(), minK)
    val ew = canon.select(col("__rep").as("__id"), col("__v"), col("__cnt"))
      .withColumn("__vv", VecOps.vecDot(col("__v"), col("__v")))
    // init = the k smallest ids of the FULL corpus (copies included), same
    // rule as the unweighted path; limit-k plans a TakeOrdered, no full sort
    val initFrom = canon.select(explode(col("__members")).as("__id"), col("__v"))
    val (assignRep, cents) =
      if (k > LiteralAssignMax)
        kmeansFrame(ew, k, iters, weighted = true, initFrom, roundProbe)
      else kmeansLiteral(ew, k, iters, weighted = true, initFrom, roundProbe)
    val chkRep = assignRep.select(col("__id").as("__rep"), col("__cl"), col("__d"))
      .localCheckpoint()
    val perId = chkRep.join(canon.select(col("__rep"), col("__members")), "__rep")
      .select(explode(col("__members")).as(idCol), col("__cl").as("cluster"),
        round(col("__d"), 6).as("dist2"))
      .localCheckpoint()
    val repFrame = chkRep.join(
        canon.select(col("__rep"), col("__v"), col("__members")), "__rep")
      .select(col("__cl").as("cluster"), col("__rep"), col("__v"), col("__members"))
      .cache()
    repFrame.count() // materialize before releasing canon
    canon.unpersist()
    (perId, cents, repFrame)
  }

  /** `useFrame` exposed for the spec that pins literal- and frame-path
    * equivalence (same assignments, centroids, tie-breaks) on one corpus.
    */
  private[graft] def kmeansImpl(emb: DataFrame, idCol: String, vecCol: String,
                                k: Int, iters: Int, useFrame: Boolean,
                                roundProbe: DataFrame => Unit = _ => ())
      : (DataFrame, Seq[(Int, Seq[Double])]) =
    finishKmeans(buildCorpus(emb, idCol, vecCol), idCol, k, iters, useFrame,
      roundProbe)

  /** The corpus frame is scanned by EVERY Lloyd iteration plus the final
    * assignment (and the adaptive-k distinct) — cache it once (projected:
    * id, v, v·v only), same rule as Graph.pagerank's cached edges; without
    * this, `iters + 1` full source scans at 100 TB.
    */
  private def buildCorpus(emb: DataFrame, idCol: String, vecCol: String): DataFrame =
    emb.select(col(idCol).as("__id"), col(vecCol).as("__v"))
      .withColumn("__vv", VecOps.vecDot(col("__v"), col("__v")))
      .cache()

  private def finishKmeans(e: DataFrame, idCol: String, k: Int, iters: Int,
                           useFrame: Boolean,
                           roundProbe: DataFrame => Unit = _ => ())
      : (DataFrame, Seq[(Int, Seq[Double])]) = {
    val (out, cents) =
      if (useFrame) kmeansFrame(e, k, iters, weighted = false, e, roundProbe)
      else kmeansLiteral(e, k, iters, weighted = false, e, roundProbe)
    // the result is slim (id, cluster, dist2): materialize it eagerly so the
    // corpus cache can be released before returning — callers' downstream
    // plans then read the checkpoint, not a re-scan
    val result = out.select(col("__id").as(idCol), col("__cl").as("cluster"),
      round(col("__d"), 6).as("dist2")).localCheckpoint()
    e.unpersist()
    (result, cents)
  }

  /** Per-cluster centroid numerators: the vec_sum_scaled aggregate kernel —
    * one pass over each unsafe array, k buffer rows per partition map-side,
    * so the shuffle is k ARRAY rows (the posexplode+groupBy(cl,dim) form
    * paid dim hash-agg probes per vector). Weighted rows multiply each
    * rounded element by `__cnt` — exactly the sum over that many copies.
    */
  private def clusterSums(assigned: DataFrame, weighted: Boolean): DataFrame =
    assigned.groupBy("__cl").agg(
      (if (weighted)
        graft.functions.VecAgg.vecSumScaledWeighted(col("__v"), col("__cnt"))
      else graft.functions.VecAgg.vecSumScaled(col("__v"))).as("__sums"),
      (if (weighted) sum(col("__cnt")) else count(lit(1))).as("__n"))

  /** Small-k path: centroids as driver literals, assignment is ONE narrow
    * codegen'd projection, per-iteration centroid sums collected (k·dim
    * values, bounded). `initFrom` supplies the init vectors — the corpus
    * itself, or the exploded full-id view of a canonicalized corpus.
    */
  private def kmeansLiteral(e: DataFrame, k: Int, iters: Int,
                            weighted: Boolean, initFrom: DataFrame,
                            roundProbe: DataFrame => Unit = _ => ())
      : (DataFrame, Seq[(Int, Seq[Double])]) = {
    val carry = if (weighted) Seq("__cnt") else Nil
    // init: the k smallest-id vectors, cluster id = rank (0-based). A tiny
    // bounded driver collect, same as any broadcast dimension table.
    var cents: Seq[(Int, Seq[Double])] = initFrom.orderBy("__id").limit(k)
      .select("__v").collect().toSeq.zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Double](0)) }
    for (_ <- 1 to iters) {
      // test seam: PlanAuditSpec pins the per-iteration shape (one exchange,
      // no broadcast of the corpus, k-row aggregate) on the PRE-collect plan
      val sumsPlan = clusterSums(withAssign(e, cents, carry), weighted)
      roundProbe(sumsPlan)
      val sums = sumsPlan.collect()
      cents = sums.map { r =>
        val n = r.getLong(2)
        (r.getInt(0), r.getSeq[Long](1).map(_ / (n * 1000000.0)))
      }.toSeq.sortBy(_._1)
    }
    (withAssign(e, cents).select(col("__id"), col("__cl"), col("__d")), cents)
  }

  /** Large-k path: centroids stay a k-row DataFrame for the whole run —
    * broadcast into each assignment, localCheckpoint'ed between iterations
    * (k rows, tiny), never collected to the driver. Arithmetic is
    * bit-identical to the literal path: same scaled-integer numerators,
    * same `sum / (n * 1e6)` double division, same left-to-right dot fold,
    * and min(struct(dist, cl)) reproduces the smallest-id tie-break.
    */
  private def kmeansFrame(e: DataFrame, k: Int, iters: Int,
                          weighted: Boolean, initFrom: DataFrame,
                          roundProbe: DataFrame => Unit = _ => ())
      : (DataFrame, Seq[(Int, Seq[Double])]) = {
    def assign(cents: DataFrame, withCnt: Boolean): DataFrame =
      frameAssign(e, cents, withCnt)
    val w = Window.orderBy("__id")
    var cents = initFrom.orderBy("__id").limit(k)
      .select((row_number().over(w) - 1).cast("int").as("__cl"), col("__v").as("__c"))
      .withColumn("__cc", VecOps.vecDot(col("__c"), col("__c")))
      .localCheckpoint()
    for (_ <- 1 to iters) {
      // same vec_sum_scaled kernel as the literal path: k array rows
      // shuffle, centroids derived without ever leaving the cluster
      val centsPlan = clusterSums(assign(cents, weighted), weighted)
        .select(col("__cl"),
          expr("transform(__sums, s -> s / (__n * 1000000.0D))").as("__c"))
        .withColumn("__cc", VecOps.vecDot(col("__c"), col("__c")))
      // test seam: PlanAuditSpec pins the per-iteration shape here — the
      // localCheckpoint below erases the plan (the pagerank lesson)
      roundProbe(centsPlan)
      cents = centsPlan.localCheckpoint()
    }
    val fin = assign(cents, withCnt = false)
      .select(col("__id"), col("__cl"), col("__d")).localCheckpoint()
    val centsSeq = cents.orderBy("__cl").collect().toSeq
      .map(r => (r.getInt(0), r.getSeq[Double](1)))
    (fin, centsSeq)
  }

  /** One frame-path assignment: the k-row centroid frame is collected
    * (bounded: k rows of dim doubles — the same bytes the previous
    * BroadcastNestedLoopJoin shipped to every executor anyway) and the
    * argmin runs as ONE primitive loop per corpus row over the broadcast
    * matrix. The crossJoin+groupBy form this replaces materialized an
    * n-by-k ROW FAN per iteration — 1.2e9 rows carrying a copied vector
    * payload each at the 100x corpus (n=1.1M canonical, adaptive k=1050),
    * which took dedup_semantic to 20 minutes; the loop form does the same
    * n*k*dim flops with zero row blowup and NO exchange at all (the old
    * form's "exchange-free" still paid the fan through the aggregate).
    *
    * Bit-identical to the fanned form and the literal path: the dot runs
    * the same ascending index fold as VecDotExpr, d = vv - 2*dot + cc in
    * the same association, and strict `<` over ascending cluster ids
    * reproduces min(struct(d, cl))'s smallest-id tie-break. Pinned by
    * PlanAuditSpec (plan shape) and the literal/frame equivalence spec.
    */
  private def frameAssign(e: DataFrame, cents: DataFrame, withCnt: Boolean): DataFrame = {
    val spark = e.sparkSession
    val centArr: Array[(Int, Array[Double], Double)] = cents
      .select(col("__cl"), col("__c"), col("__cc")).collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
      .sortBy(_._1)
    val bc = spark.sparkContext.broadcast(centArr)
    val schema = e.schema
    val idIdx = schema.fieldIndex("__id")
    val vIdx = schema.fieldIndex("__v")
    val vvIdx = schema.fieldIndex("__vv")
    val cntIdx = if (withCnt) schema.fieldIndex("__cnt") else -1
    val outSchema = org.apache.spark.sql.types.StructType(
      Seq(schema(idIdx), schema(vIdx)) ++
        (if (withCnt) Seq(schema(cntIdx)) else Nil) ++
        Seq(org.apache.spark.sql.types.StructField("__cl",
            org.apache.spark.sql.types.IntegerType, nullable = false),
          org.apache.spark.sql.types.StructField("__d",
            org.apache.spark.sql.types.DoubleType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    e.mapPartitions { it =>
      val cs = bc.value
      it.map { r =>
        val vSeq = r.getSeq[Double](vIdx)
        val v = vSeq.toArray
        val vv = r.getDouble(vvIdx)
        var bd = Double.NaN
        var bcl = -1
        var j = 0
        while (j < cs.length) {
          val c = cs(j)._2
          var s = 0.0
          var i = 0
          val n = math.min(v.length, c.length)
          while (i < n) { s += v(i) * c(i); i += 1 }
          val d = vv - 2.0 * s + cs(j)._3
          // struct-min semantics: smaller d wins, ties keep the earlier
          // (smaller) cluster id; NaN sorts greatest like Spark's double
          // ordering
          if (bcl == -1 || d < bd || (bd.isNaN && !d.isNaN)) { bd = d; bcl = cs(j)._1 }
          j += 1
        }
        if (withCnt) org.apache.spark.sql.Row(r.get(idIdx), vSeq, r.getLong(cntIdx), bcl, bd)
        else org.apache.spark.sql.Row(r.get(idIdx), vSeq, bcl, bd)
      }
    }(enc)
  }

  /** The frame-path iteration assignment, UN-checkpointed, for the plan
    * audit: the production builder ([[frameAssign]]) over the same cached
    * corpus and k-row centroid frame `kmeansFrame` uses — so the audited
    * plan IS the per-iteration plan. Returns (cached corpus — caller
    * materializes then unpersists it, assignment frame).
    */
  private[graft] def frameAssignForAudit(emb: DataFrame, idCol: String,
                                         vecCol: String, k: Int): (DataFrame, DataFrame) = {
    val e = buildCorpus(emb, idCol, vecCol)
    val w = Window.orderBy("__id")
    val cents = e.orderBy("__id").limit(k)
      .select((row_number().over(w) - 1).cast("int").as("__cl"), col("__v").as("__c"))
      .withColumn("__cc", VecOps.vecDot(col("__c"), col("__c")))
      .localCheckpoint()
    (e, frameAssign(e, cents, withCnt = false))
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
                    k: Int, iters: Int, threshold: Double): DataFrame =
    dropPass(emb, idCol, vecCol, kmeans(emb, idCol, vecCol, k, iters)._1, threshold)

  /** SemDeDup with the corpus-adaptive k rule ([[kmeansAdaptive]]) — the
    * production form: blocking grows with the corpus, so within-cluster
    * pairing stays ~linear overall. Reuses the canonical run's rep-level
    * frame directly as the pairing groups (one row per distinct vector
    * with its cluster, min-id rep and member list — exactly what
    * [[dropPass]] rebuilds with a second vector shuffle for the
    * explicit-k path), so the whole operator does ONE groupBy over the
    * vectors total.
    */
  def semanticDedupAdaptive(emb: DataFrame, idCol: String, vecCol: String,
                            iters: Int, threshold: Double, minK: Int = 8,
                            roundProbe: DataFrame => Unit = _ => ()): DataFrame = {
    require(threshold <= 1.0,
      "semanticDedup: threshold > 1 breaks the identical-vector fast path")
    val (assign, _, repFrame) =
      kmeansCanonical(emb, idCol, vecCol, iters, minK, roundProbe)
    val copyDrops = repFrame
      .select(explode(col("__members")).as("__id"), col("__rep"))
      .where(col("__id") =!= col("__rep"))
      .select(col("__id"))
    val reps = repFrame.select(col("cluster"), col("__rep"), col("__v"))
    val repDrops = reps.as("l").join(reps.as("r"),
        col("l.cluster") === col("r.cluster") && col("l.__rep") < col("r.__rep"))
      .where(round(VecOps.vecDot(col("l.__v"), col("r.__v"))
        / (VecOps.vecNorm(col("l.__v")) * VecOps.vecNorm(col("r.__v"))), 6)
        >= threshold)
      .select(col("r.__rep").as("__id")).distinct()
    val dropped = copyDrops.unionByName(repDrops).localCheckpoint()
    repFrame.unpersist()
    assign.select(col(idCol).as("__id"), col("cluster"))
      .join(dropped.withColumn("__hit", lit(true)), Seq("__id"), "left")
      .select(col("__id").as(idCol), col("cluster"),
        coalesce(col("__hit"), lit(false)).as("dropped"))
  }

  private def dropPass(emb: DataFrame, idCol: String, vecCol: String,
                       assign: DataFrame, threshold: Double): DataFrame = {
    require(threshold <= 1.0,
      "semanticDedup: threshold > 1 breaks the identical-vector fast path")
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
    // only) and individually duplicate-free — union needs no distinct.
    // Eagerly materialize the slim dropped-id frame so the cached groups can
    // be released here rather than pinned until a caller clearCache()s.
    val dropped = copyDrops.unionByName(repDrops).localCheckpoint()
    groups.unpersist()
    a.join(dropped.withColumn("__hit", lit(true)), Seq("__id"), "left")
      .select(col("__id").as(idCol), col("cluster"),
        coalesce(col("__hit"), lit(false)).as("dropped"))
  }
}
