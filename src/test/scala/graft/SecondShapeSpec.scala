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
  * Corpus dir comes from GRAFT_XSCALE_DIR (default sf0.1, so the suite
  * always pins the equivalences); the round-10 evidence run points it at
  * the 100× corpus — results recorded in SURVEY.md. A standalone run with
  * the env set builds its own wider session (local[16]) since these are
  * corpus-scale jobs, not unit tests.
  */
class SecondShapeSpec extends AnyFunSuite {

  private val dir: String =
    sys.env.getOrElse("GRAFT_XSCALE_DIR", "/root/testdata/sf0.1")

  private lazy val spark: SparkSession =
    if (sys.env.contains("GRAFT_XSCALE_DIR") &&
        SparkSession.getDefaultSession.isEmpty)
      SparkSession.builder()
        .master("local[16]")
        .appName("graft-secondshape")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    else SparkTestBase.spark

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
    // sharing one, with array-recomputed jaccard >= threshold, must appear
    val sampledSh = capped.groupBy(col("h")).agg(count(lit(1)).as("cn"))
      .where(col("cn") >= 2)
      .orderBy(md5(col("h").cast("string"))).limit(200)
      .select(col("h"))
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
