package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Similarity}
import graft.functions.VecOps

/** Second-shape verification (round-10 verdict #4): at the 100×-docs
  * corpus ten heavy queries are vouched for only by the engine itself —
  * the single-node DuckDB oracle exhausts disk/RAM before producing an
  * answer. These tests re-derive the three biggest through a STRUCTURALLY
  * DIFFERENT Spark plan and assert equivalence, so the engine's 100×
  * answers are cross-checked by an independent shape rather than trusted:
  *
  *  - curation_funnel: the fused one-pass conditional aggregate vs the six
  *    standalone stage operators (textLangid / textQuality / exact-dedup
  *    groupBy / textDecontaminate) composed as literal filters and counted
  *    independently;
  *  - dedup_clusters: engine labels vs a driver-side union-find replay of
  *    every edge in a seeded sample of components;
  *  - embed_cosine_neardup: soundness (a seeded 1k-pair sample of the
  *    result recomputes to the same exact cosine, above threshold) and
  *    completeness (every within-cell pair above threshold from a seeded
  *    sample of LSH cells appears in the result).
  *
  * Round 11 closes the remaining trust-me set: dedup_ngram_jaccard and
  * dedup_minhash_lsh get the same witness recipe; embed_kmeans and
  * dedup_semantic are replayed END-TO-END in plain Scala on the driver (no
  * Spark plan at all — content canonicalization, weighted Lloyd rounds with
  * exact-integer numerators, the within-cluster cosine drop pass) and
  * compared row-for-row; split_leakage is re-derived from the
  * witness-verified pair layer through an independent MessageDigest split
  * hash and a window aggregate; dedup_simhash_pairs gets MessageDigest
  * signature witnesses over an arithmetically independent banding. With
  * these, EVERY 100x oracle-unreachable query is either oracle-exact or
  * second-shape-verified at the full corpus.
  *
  * Corpus dir comes from GRAFT_XSCALE_DIR (default sf0.1, so the suite
  * always pins the equivalences); the round-10 evidence run points it at
  * the 100× corpus — results recorded in SURVEY.md. A standalone run with
  * the env set builds its own wider session (local[16]) since these are
  * corpus-scale jobs, not unit tests.
  */
class SecondShapeSpec extends AnyFunSuite
    with org.scalatest.BeforeAndAfterEach {

  private val dir: String =
    sys.env.getOrElse("GRAFT_XSCALE_DIR", "/root/testdata/sf0.1")

  // corpus-scale tests must not inherit a previous test's pinned blocks:
  // at 100x the memoized pair checkpoint plus leftover caches crowd the
  // unified memory the cosine witness needs for its hash-join build
  override def afterEach(): Unit = {
    try {
      logMem("end-of-test")
      spark.catalog.clearCache()
      PipelineQueries.clearPairsMemo()
      logMem("after-clear")
    } finally super.afterEach()
  }

  /** Memory-margin telemetry (round-13 verdict #5): the 100x witness
    * session runs near the heap edge by design (reduced-memory posture),
    * so every test logs heap + storage occupancy at its end and after the
    * cache/memo clear — the next memory failure is a measurement in the
    * gate log, not a surprise. Driver heap == executor heap in local mode.
    */
  private def logMem(label: String): Unit = {
    val rt = Runtime.getRuntime
    val usedMb = (rt.totalMemory - rt.freeMemory) >> 20
    val maxMb = rt.maxMemory >> 20
    val ex = spark.sparkContext.statusTracker.getExecutorInfos
    val storMb = ex.map(_.usedOnHeapStorageMemory).sum >> 20
    val storMaxMb = ex.map(_.totalOnHeapStorageMemory).sum >> 20
    println(s"[mem] $label: heap ${usedMb}/${maxMb} MiB, " +
      s"storage ${storMb}/${storMaxMb} MiB")
  }

  private lazy val spark: SparkSession = {
    val s =
      if (sys.env.contains("GRAFT_XSCALE_DIR") &&
          SparkSession.getDefaultSession.isEmpty)
        // Memory-margin posture (round-13 verdict #5): the 100x witnesses
        // run in the default 8 GiB test-fork heap BY DESIGN (a passing run
        // is evidence the engine degrades gracefully under tight memory),
        // but the r13 session — 16 cores over 16 coarse partitions — ran
        // the witness derivations' 200M-row window sorts at the edge of
        // UNTRACKED heap (sorter pages awaiting GC, codegen buffers, task
        // results), and one run died of a hard JVM OOM outside the unified
        // pool. Margins, not more heap: 10 concurrent tasks instead of 16
        // (less simultaneous untracked allocation), 48 shuffle partitions
        // (4x smaller per-task sorts at 5M docs), and memory.fraction 0.5
        // so tracked consumers spill earlier and leave heap slack for what
        // the manager cannot see.
        SparkSession.builder()
          .master("local[10]")
          .appName("graft-secondshape")
          .config("spark.sql.shuffle.partitions", "48")
          .config("spark.memory.fraction", "0.5")
          .config("spark.sql.session.timeZone", "UTC")
          .config("spark.sql.legacy.parquet.nanosAsLong", "true")
          .config("spark.ui.enabled", "false")
          .getOrCreate()
      else SparkTestBase.spark
    if (sys.env.contains("GRAFT_XSCALE_DIR")) {
      // fail fast, not mid-suite: the corpus-scale witnesses are sized for
      // the documented 8 GiB reduced-memory posture — a smaller heap makes
      // a later OOM look like an engine regression when it is a harness
      // misconfiguration (round-13 verdict #5)
      val maxMb = Runtime.getRuntime.maxMemory >> 20
      require(maxMb >= 6 * 1024,
        s"corpus-scale witness session needs >= 6 GiB heap, got ${maxMb} MiB" +
          " — set SPARK_DRIVER_MEM (sbt fork -Xmx) before running with" +
          " GRAFT_XSCALE_DIR")
    }
    s
  }

  test("curation_funnel == its six standalone stage operators composed") {
    val fused = PipelineQueries.curationFunnel(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap

    // compose the standalone operators: each stage is an independent
    // filter/join over the standalone query outputs, counted separately —
    // no shared one-pass aggregate, no window-based canonical flag
    val docs = Queries.spread(Queries.table(spark, dir, "documents"))
      .select(col("doc_id"), col("source"), col("text"))
    val lang = PipelineQueries.textLangid(spark, dir).select("doc_id", "lang_pred")
    val qual = PipelineQueries.textQuality(spark, dir).select("doc_id", "quality")
    val base = docs.join(lang, "doc_id").join(qual, "doc_id").cache()
    val s2 = base.where(col("source") =!= PipelineQueries.BenchSource)
    val s3 = s2.where(col("lang_pred") === "en")
    val s4 = s3.where(col("quality") >= PipelineQueries.QualityMin).cache()
    // stage 5 via the exact-dedup primitive (groupBy-min over stage-4
    // survivors), not the fused plan's window flag
    val canon = s4.groupBy(md5(col("text")).as("__d"))
      .agg(min(col("doc_id")).as("__cid"))
    val s5 = s4.join(canon, md5(col("text")) === col("__d") &&
      col("doc_id") === col("__cid")).cache()
    val decon = PipelineQueries.textDecontaminate(spark, dir)
      .select("doc_id", "hit_frac")
    val s6 = s5.join(decon, Seq("doc_id"), "left")
      .where(coalesce(col("hit_frac"), lit(0.0)) <= PipelineQueries.ContamMax)

    val composed = Map(
      1L -> base.count(), 2L -> s2.count(), 3L -> s3.count(),
      4L -> s4.count(), 5L -> s5.count(), 6L -> s6.count())
    base.unpersist(); s4.unpersist(); s5.unpersist()
    assert(composed == fused,
      s"funnel diverged from composed stages: fused=$fused composed=$composed")
    // stages 1–5 must be exercised; stage 6 MAY legitimately be zero (the
    // 100× corpus's synthetic token shuffles overlap the benchmark's
    // shingles heavily, so decontamination filters every survivor — both
    // shapes agreeing on that zero is still a real equivalence)
    assert(fused(1L) > 0 && fused(5L) > 0, s"vacuous funnel: $fused")
  }

  test("dedup_clusters labels == driver union-find replay on sampled components") {
    val docs = Queries.spread(Queries.table(spark, dir, "documents"))
    val pairs = Dedup.minhashLshPairs(docs, 3, PipelineQueries.MinhashBands,
        PipelineQueries.MinhashRows, PipelineQueries.MinhashBucketCap)
      .select(col("a").cast("long").as("a"), col("b").cast("long").as("b"))
      .cache()
    val labels = PipelineQueries.dedupClusters(spark, dir)
      .select(col("doc_id").cast("long").as("doc_id"),
        col("cluster_id").cast("long").as("cluster_id"))
      .cache()

    // seeded sample of up to 200 components (md5 order is deterministic
    // and corpus-independent); pull EVERY edge of those components — both
    // endpoints of an edge share a label, so filtering on the a-side
    // label is exhaustive
    val sampled = labels.select(col("cluster_id")).distinct()
      .orderBy(md5(col("cluster_id").cast("string"))).limit(200)
    val edges = pairs
      .join(labels.select(col("doc_id").as("a"), col("cluster_id")), "a")
      .join(sampled, "cluster_id")
      .select(col("a"), col("b"))
    val es = edges.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(es.length < 2000000, s"sampled-component edge pull too big: ${es.length}")
    val got = labels.join(sampled, "cluster_id")
      .select(col("doc_id"), col("cluster_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.nonEmpty, "no sampled components — vacuous replay")

    // classic path-compressed union-find over the sampled edges
    val parent = scala.collection.mutable.HashMap[Long, Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    for ((a, b) <- es) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val roots = got.keys.map(n => n -> find(n)).toMap
    val minOf = roots.groupBy(_._2).map { case (r, m) => r -> m.keys.min }
    val replay = roots.map { case (n, r) => n -> minOf(r) }
    val diff = got.collect { case (n, l) if replay.get(n).exists(_ != l) => (n, l, replay(n)) }
    assert(diff.isEmpty,
      s"${diff.size} label mismatches, first 5: ${diff.take(5).mkString(", ")}")
    pairs.unpersist(); labels.unpersist()
  }

  test("dedup_clusters: driver-finish tier == distributed min-label shape, full graph") {
    // round 12: production takes the exact driver union-find tier, so the
    // union-find replay above now shares its ALGORITHM with production
    // (inputs and implementation still differ). This keeps a structurally
    // different second shape at full-graph scope: the forced distributed
    // path (contraction + min-label rounds, driverFinishMaxEdges = 0) must
    // produce identical labels for every node.
    val docs = Queries.spread(Queries.table(spark, dir, "documents"))
    val pairs = Dedup.minhashLshPairs(docs, 3, PipelineQueries.MinhashBands,
        PipelineQueries.MinhashRows, PipelineQueries.MinhashBucketCap)
      .select(col("a").cast("long").as("a"), col("b").cast("long").as("b"))
      .cache()
    val viaDriver = Dedup.clusterLabels(pairs, PipelineQueries.ClusterIters)
    val viaRounds = Dedup.clusterLabels(pairs, PipelineQueries.ClusterIters,
      checkConverged = true, driverFinishMaxEdges = 0L)
    val n = viaDriver.count()
    val mismatch = viaDriver.as("d")
      .join(viaRounds.as("r"), col("d.node") === col("r.node"), "full")
      .where(col("d.label").isNull || col("r.label").isNull ||
        col("d.label") =!= col("r.label"))
      .count()
    assert(n > 0, "vacuous: no labeled nodes")
    assert(mismatch == 0, s"$mismatch/$n labels differ between the two CC shapes")
    pairs.unpersist()
  }

  test("embed_cosine_neardup: seeded witness pairs — exact-cosine sound and cell-complete") {
    val res = PipelineQueries.embedCosineNearDup(spark, dir).cache()
    val emb = Queries.table(spark, dir, "embeddings")
      .select(col("vec_id"), Similarity.asDouble(col("embedding")).as("v"))

    // SOUNDNESS: a seeded 1k-pair sample of the result must recompute to
    // the SAME exact cosine (same dot/norm/round ops) and clear the
    // threshold
    val sample = res.orderBy(md5(concat_ws("|", col("a"), col("b")))).limit(1000)
    val recomputed = sample
      .join(emb.select(col("vec_id").as("a"), col("v").as("va"),
        Similarity.norm(col("v")).as("na")), "a")
      .join(emb.select(col("vec_id").as("b"), col("v").as("vb"),
        Similarity.norm(col("v")).as("nb")), "b")
      .withColumn("cos2",
        round(Similarity.dot(col("va"), col("vb")) / (col("na") * col("nb")), 6))
    val bad = recomputed
      .where(col("cos2") =!= col("cos") || col("cos2") < PipelineQueries.CosineThreshold)
      .count()
    val n = sample.count()
    assert(n > 0, "vacuous witness: query returned no pairs")
    assert(bad == 0, s"$bad of $n sampled result pairs failed exact-cosine recompute")

    // COMPLETENESS: rebuild the blocking independently (same public plane
    // generator + bucket kernel), take a seeded sample of occupied cells,
    // enumerate EVERY within-cell pair exhaustively, and assert each pair
    // at-or-above threshold is present in the result
    val canon = Dedup.canonicalize(emb, "vec_id", col("v"), Seq("v"))
      .withColumn("nrm", Similarity.norm(col("v")))
    val b = Similarity.adaptivePlanesPerTable(
      emb.select(col("v")).distinct().count())
    val tables = Similarity.multiTablePlanes(PipelineQueries.LshTables, b, 64)
    val cells = canon.select(col("vec_id"), col("v"), col("nrm"),
      posexplode(VecOps.lshBucketsAll(col("v"), tables)).as(Seq("tbl", "bucket")))
    val sampledCells = cells.groupBy(col("tbl"), col("bucket"))
      .agg(count(lit(1)).as("cn")).where(col("cn") >= 2 && col("cn") <= 2000)
      .orderBy(md5(concat_ws("|", col("tbl"), col("bucket")))).limit(200)
      .select(col("tbl"), col("bucket"))
    val inCell = cells.join(sampledCells, Seq("tbl", "bucket"))
    val expected = inCell.as("l").join(inCell.as("r"),
        col("l.tbl") === col("r.tbl") && col("l.bucket") === col("r.bucket") &&
          col("l.vec_id") < col("r.vec_id"))
      .withColumn("cos",
        round(Similarity.dot(col("l.v"), col("r.v")) / (col("l.nrm") * col("r.nrm")), 6))
      .where(col("cos") >= PipelineQueries.CosineThreshold)
      .select(col("l.vec_id").as("a"), col("r.vec_id").as("b"))
      .distinct()
    val expN = expected.count()
    assert(expN > 0, "vacuous completeness witness: no in-cell pairs above threshold")
    val missing = expected.join(res, Seq("a", "b"), "left_anti").count()
    assert(missing == 0, s"$missing of $expN witness pairs missing from the result")
    res.unpersist()
  }

  test("dedup_ngram_jaccard: seeded witness pairs — exact-Jaccard sound and shingle-complete") {
    // round-11 verdict #1: the two largest still-unverified 100× heavies get
    // the embed_cosine_neardup recipe. Second shape here: per-doc CAPPED
    // shingle SETS as arrays (window-df + collect_set), pairs verified by
    // array_intersect — no hashed-shingle self-join, no pair groupBy, no
    // df semi-join; only the hash function and the cap CONSTANT are shared,
    // because they define the operator's semantics.
    import org.apache.spark.sql.expressions.Window
    val res = PipelineQueries.dedupNgramJaccard(spark, dir).cache()
    val docs = Queries.spread(Queries.table(spark, dir, "documents"))
    val canon = Dedup.canonicalize(docs.select(col("doc_id"), col("text")),
      "doc_id", md5(col("text")), Seq("text"))
    // independent df: a count window over per-(doc, hash) distinct rows
    val perDoc = Dedup.shingles(canon, 3)
      .select(col("doc_id"), Dedup.h32(col("shingle")).as("h"))
      .dropDuplicates("doc_id", "h")
    val capped = perDoc
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("h"))))
      .where(col("df") <= PipelineQueries.JaccardDfCap)
    val sets = capped.groupBy(col("doc_id"))
      .agg(collect_set(col("h")).as("hs"), count(lit(1)).as("n"))
      .cache()

    // SOUNDNESS: a seeded 1k-pair sample of the result must reproduce the
    // SAME rounded jaccard from the array sets and clear the threshold
    val sample = res.orderBy(md5(concat_ws("|", col("a"), col("b")))).limit(1000)
    val recomputed = sample
      .join(sets.select(col("doc_id").as("a"), col("hs").as("ha"), col("n").as("na")), "a")
      .join(sets.select(col("doc_id").as("b"), col("hs").as("hb"), col("n").as("nb")), "b")
      .withColumn("ni", size(array_intersect(col("ha"), col("hb"))).cast("double"))
      .withColumn("j2", round(col("ni") / (col("na") + col("nb") - col("ni")), 6))
    val n = sample.count()
    val bad = recomputed
      .where(col("j2") =!= col("jaccard") || col("j2") < PipelineQueries.JaccardMin)
      .count()
    assert(n > 0, "vacuous witness: query returned no pairs")
    assert(bad == 0, s"$bad of $n sampled result pairs failed exact-Jaccard recompute")

    // COMPLETENESS: seeded sample of capped shared shingles; EVERY doc pair
    // sharing one, with array-recomputed jaccard >= threshold, must appear.
    // The sample is 200 corpus-wide seeded shingles (unbiased) UNION 200
    // seeded shingles shared by a sampled RESULT pair (anchored): at the
    // 100x corpus the distinct-content rewrites make a random shared
    // shingle's pairs almost never clear the threshold, so the unbiased
    // half alone went vacuous — every anchored shingle is shared by an
    // above-threshold pair by construction, so expN > 0 is guaranteed
    // while the unbiased half still sweeps for missing pairs anywhere
    val randomSh = capped.groupBy(col("h")).agg(count(lit(1)).as("cn"))
      .where(col("cn") >= 2)
      .orderBy(md5(col("h").cast("string"))).limit(200)
      .select(col("h"))
    val anchoredSh = sample.select(col("a"), col("b"))
      .join(capped.select(col("doc_id").as("a"), col("h")), "a")
      .join(capped.select(col("doc_id").as("b"), col("h")), Seq("b", "h"))
      .select(col("h")).distinct()
      .orderBy(md5(col("h").cast("string"))).limit(200)
    val sampledSh = randomSh.unionByName(anchoredSh).distinct()
    val inSh = capped.join(sampledSh, Seq("h")).select(col("h"), col("doc_id"))
    val expected = inSh.as("l").join(inSh.as("r"),
        col("l.h") === col("r.h") && col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("a"), col("r.doc_id").as("b")).distinct()
      .join(sets.select(col("doc_id").as("a"), col("hs").as("ha"), col("n").as("na")), "a")
      .join(sets.select(col("doc_id").as("b"), col("hs").as("hb"), col("n").as("nb")), "b")
      .withColumn("ni", size(array_intersect(col("ha"), col("hb"))).cast("double"))
      .where(round(col("ni") / (col("na") + col("nb") - col("ni")), 6)
        >= PipelineQueries.JaccardMin)
      .select(col("a"), col("b"))
    val expN = expected.count()
    assert(expN > 0, "vacuous completeness witness: no shared-shingle pairs above threshold")
    val missing = expected.join(res, Seq("a", "b"), "left_anti").count()
    assert(missing == 0, s"$missing of $expN witness pairs missing from the result")
    sets.unpersist(); res.unpersist()
  }

  // ---- plain-Scala Lloyd replay (shared by the kmeans + semantic tests) --

  /** Exactly Spark's round(x, 6) for doubles (decimal-string HALF_UP). */
  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** The 1e6-scaled-BIGINT discipline (inlined, NOT VecAgg.scaledLong — the
    * replay shares only the documented rounding rule, no production code).
    */
  private def scaledL(x: Double): Long =
    java.math.BigDecimal.valueOf(x * 1000000.0)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toLong

  /** Full plain-Scala replay of the adaptive weighted k-means — no Spark
    * plan at all beyond the initial corpus collect: driver-side content
    * canonicalization, k = max(minK, ceil(sqrt(distinct))), init = the k
    * smallest full-corpus ids, `iters` Lloyd rounds over canonical rows
    * with cnt-weighted exact-integer centroid numerators, final argmin with
    * the smallest-cluster-id tie-break. Bit-exact by the same argument the
    * literal/frame paths use: ascending-index dot folds, d = vv - 2*dot + cc
    * in the same association, integer numerators order-independent.
    * -0.0 keys are normalized to 0.0 the way Spark's
    * NormalizeFloatingNumbers rewrites groupBy keys.
    */
  private final class LloydReplay(rows: Array[(Long, Array[Double])],
                                  iters: Int, minK: Int) {
    import scala.collection.parallel.CollectionConverters._

    // content canonicalization: group by (normalized) vector
    private val groups: Array[(Array[Double], Array[Long])] = {
      val m = new java.util.HashMap[scala.collection.immutable.ArraySeq[Double],
        scala.collection.mutable.ArrayBuffer[Long]]()
      rows.foreach { case (id, v) =>
        m.computeIfAbsent(scala.collection.immutable.ArraySeq.unsafeWrapArray(v),
          _ => scala.collection.mutable.ArrayBuffer.empty[Long]) += id
      }
      val out = new Array[(Array[Double], Array[Long])](m.size)
      var i = 0
      val it = m.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        out(i) = (e.getKey.unsafeArray.asInstanceOf[Array[Double]],
          e.getValue.toArray.sorted)
        i += 1
      }
      out
    }
    val nCanon: Int = groups.length
    val k: Int = math.max(minK, math.ceil(math.sqrt(nCanon.toDouble)).toInt)
    private val repVec: Array[Array[Double]] = groups.map(_._1)
    private val repCnt: Array[Long] = groups.map(_._2.length.toLong)
    private val repVv: Array[Double] = repVec.map { v =>
      var s = 0.0; var i = 0
      while (i < v.length) { s += v(i) * v(i); i += 1 }; s
    }

    private def ccOf(c: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < c.length) { s += c(i) * c(i); i += 1 }; s
    }

    /** frameAssign's exact loop: ascending dot, strict-< smallest-id ties. */
    private def assign(cents: Array[(Int, Array[Double], Double)])
        : (Array[Int], Array[Double]) = {
      val cl = new Array[Int](nCanon)
      val dd = new Array[Double](nCanon)
      (0 until nCanon).par.foreach { i =>
        val v = repVec(i); val vv = repVv(i)
        var bd = Double.NaN; var bcl = -1; var j = 0
        while (j < cents.length) {
          val c = cents(j)._2
          var s = 0.0; var t = 0
          val n = math.min(v.length, c.length)
          while (t < n) { s += v(t) * c(t); t += 1 }
          val d = vv - 2.0 * s + cents(j)._3
          if (bcl == -1 || d < bd || (bd.isNaN && !d.isNaN)) { bd = d; bcl = cents(j)._1 }
          j += 1
        }
        cl(i) = bcl; dd(i) = bd
      }
      (cl, dd)
    }

    // init: the k smallest FULL-corpus ids with their (canonical) vectors
    private val initCents: Array[(Int, Array[Double], Double)] = {
      val byId = groups.flatMap { case (v, ids) => ids.map(_ -> v) }
        .sortBy(_._1).take(k)
      byId.zipWithIndex.map { case ((_, v), i) => (i, v, ccOf(v)) }
    }

    val finalCents: Array[(Int, Array[Double], Double)] = {
      var cents = initCents
      for (_ <- 1 to iters) {
        val (cl, _) = assign(cents)
        // exact-integer weighted numerators: parallel per-chunk partials,
        // merged — integer addition is order-independent
        val chunks = (0 until nCanon).grouped(math.max(1, nCanon / 64)).toArray
        val partials = chunks.par.map { idxs =>
          val m = new java.util.HashMap[Integer, (Array[Long], Array[Long])]()
          idxs.foreach { i =>
            val v = repVec(i); val cnt = repCnt(i)
            val acc = m.computeIfAbsent(cl(i),
              _ => (new Array[Long](v.length), new Array[Long](1)))
            var t = 0
            while (t < v.length) { acc._1(t) += scaledL(v(t)) * cnt; t += 1 }
            acc._2(0) += cnt
          }
          m
        }.seq
        val merged = new java.util.HashMap[Integer, (Array[Long], Array[Long])]()
        partials.foreach { m =>
          m.forEach { (key, p) =>
            val acc = merged.computeIfAbsent(key,
              _ => (new Array[Long](p._1.length), new Array[Long](1)))
            var t = 0
            while (t < p._1.length) { acc._1(t) += p._1(t); t += 1 }
            acc._2(0) += p._2(0)
          }
        }
        val next = scala.collection.mutable.ArrayBuffer.empty[(Int, Array[Double], Double)]
        merged.forEach { (key, acc) =>
          val n = acc._2(0)
          val c = acc._1.map(_ / (n * 1000000.0))
          next += ((key.intValue(), c, ccOf(c)))
        }
        cents = next.sortBy(_._1).toArray
      }
      cents
    }

    private val (finCl, finD) = assign(finalCents)

    /** vec_id -> (cluster, dist2) over EVERY corpus row (copies inherit
      * their rep's assignment, dist2 = round(d, 6)).
      */
    val perId: java.util.HashMap[Long, (Int, Double)] = {
      val m = new java.util.HashMap[Long, (Int, Double)](rows.length * 2)
      var i = 0
      while (i < nCanon) {
        val a = (finCl(i), round6(finD(i)))
        groups(i)._2.foreach(id => m.put(id, a))
        i += 1
      }
      m
    }

    /** The set of dropped vec_ids, the SemDeDup decision: non-rep copies
      * drop unconditionally; a rep drops iff a smaller-id rep in its
      * cluster has rounded cosine >= threshold.
      */
    def droppedSet(threshold: Double): java.util.HashSet[Long] = {
      val byCl = (0 until nCanon).groupBy(finCl).map { case (c, is) =>
        c -> is.toArray.sortBy(i => groups(i)._2.head)
      }
      val repDrop = new Array[Boolean](nCanon)
      byCl.values.toArray.par.foreach { idxs =>
        var j = 1
        while (j < idxs.length) {
          val vj = repVec(idxs(j)); val nj = math.sqrt(repVv(idxs(j)))
          var i = 0
          var hit = false
          while (i < j && !hit) {
            val vi = repVec(idxs(i))
            var s = 0.0; var t = 0
            val n = math.min(vi.length, vj.length)
            while (t < n) { s += vi(t) * vj(t); t += 1 }
            if (round6(s / (math.sqrt(repVv(idxs(i))) * nj)) >= threshold) hit = true
            i += 1
          }
          repDrop(idxs(j)) = hit
          j += 1
        }
      }
      val m = new java.util.HashSet[Long](rows.length * 2)
      var i = 0
      while (i < nCanon) {
        val ids = groups(i)._2
        if (repDrop(i)) m.add(ids.head)
        var j = 1
        while (j < ids.length) { m.add(ids(j)); j += 1 }
        i += 1
      }
      m
    }
  }

  private lazy val lloyd: LloydReplay = {
    val s = spark
    import s.implicits._
    val rows = Queries.table(s, dir, "embeddings")
      .select(col("vec_id").cast("long"),
        transform(col("embedding"), x => x.cast("double")))
      .as[(Long, Array[Double])].collect()
      // groupBy-key -0.0 normalization, as Spark's NormalizeFloatingNumbers
      .map { case (id, v) => (id, v.map(x => if (x == 0.0) 0.0 else x)) }
    new LloydReplay(rows, CurationQueries.KmeansIters, CurationQueries.KmeansMinK)
  }

  test("embed_kmeans == plain-Scala Lloyd replay (no Spark plan), every row") {
    val s = spark
    import s.implicits._
    val eng = CurationQueries.embedKmeans(s, dir)
      .select(col("vec_id").cast("long"), col("cluster").cast("int"), col("dist2"))
      .as[(Long, Int, Double)].collect()
    assert(eng.length == lloyd.perId.size,
      s"row count: engine ${eng.length} vs replay ${lloyd.perId.size}")
    assert(eng.nonEmpty, "vacuous: empty corpus")
    val clUsed = eng.map(_._2).distinct
    assert(clUsed.length > 1, "vacuous: single cluster")
    val bad = eng.filter { case (id, cl, d2) =>
      val r = lloyd.perId.get(id)
      r == null || r._1 != cl || r._2 != d2
    }
    assert(bad.isEmpty,
      s"${bad.length} of ${eng.length} rows diverge from the replay; first 5: " +
        bad.take(5).map { case (id, cl, d2) =>
          s"$id engine=($cl,$d2) replay=${lloyd.perId.get(id)}" }.mkString(", "))
    assert(lloyd.k >= CurationQueries.KmeansMinK && lloyd.nCanon > lloyd.k,
      s"vacuous blocking: k=${lloyd.k} over ${lloyd.nCanon} canonical vectors")
  }

  test("dedup_semantic == plain-Scala replay (kmeans + within-cluster cosine drops), every row") {
    val s = spark
    import s.implicits._
    val eng = CurationQueries.dedupSemantic(s, dir)
      .select(col("vec_id").cast("long"), col("cluster").cast("int"), col("dropped"))
      .as[(Long, Int, Boolean)].collect()
    val drops = lloyd.droppedSet(PipelineQueries.CosineThreshold)
    assert(eng.length == lloyd.perId.size,
      s"row count: engine ${eng.length} vs replay ${lloyd.perId.size}")
    val nDropped = eng.count(_._3)
    assert(nDropped > 0 && nDropped < eng.length,
      s"vacuous drop set: $nDropped of ${eng.length}")
    val bad = eng.filter { case (id, cl, dr) =>
      val r = lloyd.perId.get(id)
      r == null || r._1 != cl || drops.contains(id) != dr
    }
    assert(bad.isEmpty,
      s"${bad.length} of ${eng.length} rows diverge from the replay; first 5: " +
        bad.take(5).map { case (id, cl, dr) =>
          s"$id engine=($cl,$dr) replay=(${lloyd.perId.get(id)},${drops.contains(id)})" }
          .mkString(", "))
  }

  test("split_leakage == independent MessageDigest split hash + window aggregation") {
    val s = spark
    import s.implicits._
    // pair layer: the EXACT production call splitLeakage makes internally is
    // dedup_minhash_lsh's — witness-verified at this corpus by the minhash
    // second-shape test above. The layer under test here is everything on
    // top: split membership, direction, and the per-val-doc aggregate.
    val res = PipelineQueries.splitLeakage(s, dir)
      .select(col("val_doc_id").cast("long"), col("n_train_dups").cast("long"),
        col("example_train_doc").cast("long"))
    val pairs = PipelineQueries.dedupMinhashLsh(s, dir)
      .select(col("a").cast("long"), col("b").cast("long"))
    // independent split hash: plain-Scala MD5 of the documented
    // "split:<id>" composition — no Dedup.h32, no Spark md5/conv/substring
    val valPct = PipelineQueries.ValPct
    val lab = pairs.as[(Long, Long)].mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      def isVal(id: Long): Boolean = {
        val d = md.digest(s"split:$id".getBytes("UTF-8"))
        val h32 = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        h32 % 100 >= 100 - valPct
      }
      it.map { case (a, b) => (a, b, isVal(a), isVal(b)) }
    }.toDF("a", "b", "va", "vb")
    // window aggregation instead of the production groupBy
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("val_doc_id")
    val alt = lab.where(col("va") =!= col("vb"))
      .select(when(col("va"), col("a")).otherwise(col("b")).as("val_doc_id"),
        when(col("va"), col("b")).otherwise(col("a")).as("train_doc_id"))
      .withColumn("n_train_dups", count(lit(1)).over(w))
      .withColumn("example_train_doc", min(col("train_doc_id")).over(w))
      .select(col("val_doc_id"), col("n_train_dups"), col("example_train_doc"))
      .dropDuplicates("val_doc_id")
      // materialize before exceptAll: Spark 4.1's setop planning rewrites
      // the window attribute out of the dedup child (ATTRIBUTE_NOT_FOUND
      // internal error); the checkpoint keeps the window shape AND the
      // comparison
      .localCheckpoint()
    val resC = res.localCheckpoint()
    val nRes = resC.count()
    assert(nRes > 0, "vacuous: no leaked val docs")
    val nAlt = alt.count()
    assert(nAlt == nRes, s"row count: alt $nAlt vs res $nRes")
    assert(resC.exceptAll(alt).count() == 0 && alt.exceptAll(resC).count() == 0,
      "split_leakage diverged from the independent-hash window shape")
  }

  test("dedup_simhash_pairs: seeded witness pairs — MessageDigest-signature sound and bucket-complete") {
    val s = spark
    import s.implicits._
    val res = PipelineQueries.dedupSimhashPairs(s, dir).cache()
    val docs = Queries.spread(Queries.table(s, dir, "documents"))
    // the signature layer is oracle-verified at this corpus already
    // (dedup_simhash is EXACT in the 100x sweep); reuse it for the
    // full-corpus banding, and recompute witnesses' signatures from scratch
    val sh = Dedup.simhash(docs).cache()
    // independent banding: integer div/mod arithmetic + a UNION of per-band
    // selects + a window count, instead of the production
    // posexplode(shiftright&mask) + groupBy/join cap
    import org.apache.spark.sql.expressions.Window
    val banded = (0 until Dedup.SimhashBands).map { b =>
      sh.select(col("doc_id"), col("simhash"), lit(b).as("band"),
        expr(s"(simhash div ${1L << (b * Dedup.SimhashBandBits)}) % ${1 << Dedup.SimhashBandBits}")
          .as("band_key"))
    }.reduce(_ unionByName _)
      .withColumn("cn", count(lit(1)).over(Window.partitionBy(col("band"), col("band_key"))))
      .cache()
    val capped = banded.where(col("cn") <= PipelineQueries.SimhashBucketCap)

    // SOUNDNESS 1: sampled result pairs recompute to the SAME hamming <= 3
    // from signatures built with plain-Scala MessageDigest md5 over the
    // doc's distinct tokens — no HashKernels, no lane packing, the
    // documented two-half (hlo/hhi) bit layout
    val sample = res.orderBy(md5(concat_ws("|", col("a"), col("b")))).limit(1000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(sample.nonEmpty, "vacuous witness: query returned no pairs")
    val ids = sample.flatMap(p => Seq(p._1, p._2)).distinct.toSeq
    val tokRows = docs
      .join(broadcast(ids.toDF("doc_id")), "doc_id")
      .select(col("doc_id"),
        array_distinct(graft.operators.TextAnalysis.tokens(col("text"))))
      .as[(Long, Seq[String])].collect()
    def sigOf(tokens: Seq[String]): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val votes = new Array[Int](Dedup.SimhashBits)
      tokens.foreach { t =>
        val d = md.digest(t.getBytes("UTF-8"))
        var hlo = 0L; var hhi = 0L
        var i = 0
        while (i < 4) { hlo = (hlo << 8) | (d(i) & 0xffL); i += 1 }
        while (i < 8) { hhi = (hhi << 8) | (d(i) & 0xffL); i += 1 }
        var j = 0
        while (j < Dedup.SimhashBits) {
          val bit = if (j < 32) (hlo >> j) & 1L else (hhi >> (j - 32)) & 1L
          votes(j) += (if (bit == 1L) 1 else -1)
          j += 1
        }
      }
      (0 until Dedup.SimhashBits).map(j => if (votes(j) > 0) 1L << j else 0L).sum
    }
    val indSig: Map[Long, Long] = tokRows.map { case (id, ts) => id -> sigOf(ts) }.toMap
    val badH = sample.filter { case (a, b, ham) =>
      val h = java.lang.Long.bitCount(indSig(a) ^ indSig(b))
      h != ham || h > 3
    }
    assert(badH.isEmpty,
      s"${badH.length} of ${sample.length} sampled pairs fail the MessageDigest " +
        s"hamming recompute; first 5: ${badH.take(5).mkString(", ")}")

    // SOUNDNESS 2: each sampled pair shares at least one band whose
    // independently-counted bucket is within the cap
    val sampleDf = sample.map(p => (p._1, p._2)).toSeq.toDF("a", "b")
    val witnessed = sampleDf
      .join(capped.select(col("doc_id").as("a"), col("band"), col("band_key")), "a")
      .join(capped.select(col("doc_id").as("b"), col("band").as("b2"),
        col("band_key").as("k2")), "b")
      .where(col("band") === col("b2") && col("band_key") === col("k2"))
      .select(col("a"), col("b")).distinct()
    val unsound = sampleDf.join(witnessed, Seq("a", "b"), "left_anti").count()
    assert(unsound == 0,
      s"$unsound of ${sample.length} sampled pairs have NO capped band collision")

    // COMPLETENESS: seeded sample of capped buckets (2..cap members); every
    // within-bucket pair at hamming <= 3 must be present
    val sampledBk = banded.select(col("band"), col("band_key"), col("cn"))
      .distinct()
      .where(col("cn") >= 2 && col("cn") <= PipelineQueries.SimhashBucketCap)
      .orderBy(md5(concat_ws("|", col("band"), col("band_key")))).limit(200)
      .select(col("band"), col("band_key"))
    val inBk = banded.join(sampledBk, Seq("band", "band_key"))
    val expected = inBk.as("l").join(inBk.as("r"),
        col("l.band") === col("r.band") && col("l.band_key") === col("r.band_key") &&
          col("l.doc_id") < col("r.doc_id"))
      .where(bit_count(col("l.simhash").bitwiseXOR(col("r.simhash"))) <= 3)
      .select(col("l.doc_id").as("a"), col("r.doc_id").as("b")).distinct()
    val expN = expected.count()
    assert(expN > 0, "vacuous completeness witness: no in-bucket pairs at hamming <= 3")
    val missing = expected.join(res, Seq("a", "b"), "left_anti").count()
    assert(missing == 0, s"$missing of $expN witness pairs missing from the result")
    banded.unpersist(); sh.unpersist(); res.unpersist()
  }

  test("dedup_minhash_lsh: seeded witness pairs — band-collision sound and bucket-complete") {
    // Second shape: signatures recomputed through the DOCUMENTED
    // minhashFamily composition (md5 hex windows + conv, per hash) instead
    // of the HashKernels.minhashWindows codegen kernel the production path
    // uses, banded with concat_ws over slice exactly as the op defines a
    // band key. A kernel bug (the round-9 fallback class's cousin) would
    // diverge here.
    val res = PipelineQueries.dedupMinhashLsh(spark, dir).cache()
    val docs = Queries.spread(Queries.table(spark, dir, "documents"))
    val nh = PipelineQueries.MinhashBands * PipelineQueries.MinhashRows
    val fam = Dedup.minhashFamily(col("shingle"), nh)
    val sigs = Dedup.shingles(docs.select(col("doc_id"), col("text")), 3)
      .groupBy(col("doc_id"))
      .agg(min(fam.head).as("h0"), fam.tail.zipWithIndex.map {
        case (c, i) => min(c).as(s"h${i + 1}") }: _*)
    val banded = sigs.select(col("doc_id"),
        posexplode(transform(sequence(lit(0), lit(PipelineQueries.MinhashBands - 1)),
          b => concat_ws(",", slice(
            array((0 until nh).map(k => col(s"h$k")): _*),
            b * PipelineQueries.MinhashRows + 1, lit(PipelineQueries.MinhashRows))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_key")
      .cache()
    val bucketN = banded.groupBy(col("band"), col("band_key"))
      .agg(count(lit(1)).as("cn")).cache()

    // SOUNDNESS: each sampled result pair must share at least one band
    // whose independently-recomputed bucket is within the cap
    val sample = res.orderBy(md5(concat_ws("|", col("a"), col("b")))).limit(1000)
    val keptB = banded.join(
      bucketN.where(col("cn") <= PipelineQueries.MinhashBucketCap)
        .select(col("band"), col("band_key")), Seq("band", "band_key"))
    val witnessed = sample
      .join(keptB.select(col("doc_id").as("a"), col("band"), col("band_key")), "a")
      .join(keptB.select(col("doc_id").as("b"), col("band").as("band2"),
        col("band_key").as("key2")), "b")
      .where(col("band") === col("band2") && col("band_key") === col("key2"))
      .select(col("a"), col("b")).distinct()
    val n = sample.count()
    assert(n > 0, "vacuous witness: query returned no pairs")
    val unsound = sample.select(col("a"), col("b"))
      .join(witnessed, Seq("a", "b"), "left_anti").count()
    assert(unsound == 0,
      s"$unsound of $n sampled result pairs have NO capped band collision in the recomputed signatures")

    // COMPLETENESS: seeded sample of capped buckets (2..cap members) from
    // the independent signatures; every within-bucket pair must be present
    val sampledBk = bucketN
      .where(col("cn") >= 2 && col("cn") <= PipelineQueries.MinhashBucketCap)
      .orderBy(md5(concat_ws("|", col("band"), col("band_key")))).limit(200)
      .select(col("band"), col("band_key"))
    val inBk = banded.join(sampledBk, Seq("band", "band_key"))
    val expected = inBk.as("l").join(inBk.as("r"),
        col("l.band") === col("r.band") && col("l.band_key") === col("r.band_key") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("a"), col("r.doc_id").as("b")).distinct()
    val expN = expected.count()
    assert(expN > 0, "vacuous completeness witness: no in-bucket pairs")
    val missing = expected.join(res, Seq("a", "b"), "left_anti").count()
    assert(missing == 0, s"$missing of $expN witness pairs missing from the result")
    banded.unpersist(); bucketN.unpersist(); res.unpersist()
  }
}
