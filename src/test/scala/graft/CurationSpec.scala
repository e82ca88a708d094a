package graft

import graft.operators.{Clustering, Dedup, Layout, Retrieval, Sampling, Scrub, Sketches}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-4 curation operators: chunk substring dedup, BM25, PII scrub,
  * deterministic k-means / SemDeDup, Z-order layout, exactly-k group
  * sampling, bloom join pruning — golden values, property checks, and the
  * determinism guarantees the oracles rely on.
  */
class CurationSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // ---- chunk dedup ---------------------------------------------------------

  test("chunkDupStats: repeated chunk across docs flags the later occurrence only") {
    val a = "w1 w2 w3 w4"        // one chunk (c=4)
    val b = s"$a x1 x2 x3 x4"    // chunk 0 duplicates doc a's chunk 0
    val docs = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val got = Dedup.chunkDupStats(docs, 4).orderBy("doc_id")
      .select("doc_id", "n_chunks", "dup_chunks").as[(Long, Long, Long)].collect()
    assert(got.toSeq == Seq((1L, 1L, 0L), (2L, 2L, 1L)))
  }

  test("chunkDupStats: within-doc repetition counts as duplication; partial tail chunk kept") {
    // c=2: chunks = [a b], [a b], [c] — second chunk duplicates the first
    val docs = Seq((5L, "a b a b c")).toDF("doc_id", "text")
    val got = Dedup.chunkDupStats(docs, 2)
      .select("n_chunks", "dup_chunks", "dup_frac").as[(Long, Long, Double)].head()
    assert(got == ((3L, 1L, 0.333333)))
  }

  test("chunkDupStats: tokenization collapses whitespace runs and case") {
    val docs = Seq((1L, "A  b\tc"), (2L, "a b c")).toDF("doc_id", "text")
    val got = Dedup.chunkDupStats(docs, 4).orderBy("doc_id")
      .select("dup_chunks").as[Long].collect()
    assert(got.toSeq == Seq(0L, 1L))
  }

  // ---- BM25 ----------------------------------------------------------------

  test("bm25 matches a hand-rolled reference on a tiny corpus") {
    val docs = Seq(
      (1L, "cat dog cat"), (2L, "dog fish"), (3L, "bird bird bird")
    ).toDF("doc_id", "text")
    val got = Retrieval.bm25(docs, "doc_id", "text", Seq("cat", "dog"), 10)
      .select("doc_id", "score").as[(Long, Double)].collect().toMap
    // reference: N=3, sdl=8, avgdl=8/3; df(cat)=1, df(dog)=2
    def s(tf: Int, dl: Int, df: Int): Double = {
      val idf = math.log((3 - df + 0.5) / (df + 0.5) + 1.0)
      idf * (tf * 2.2) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / (8.0 / 3)))
    }
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.keySet == Set(1L, 2L)) // doc 3 scores 0 and is filtered
    assert(math.abs(got(1L) - r6(s(2, 3, 1) + s(1, 3, 2))) < 1e-9)
    assert(math.abs(got(2L) - r6(s(0, 2, 1) + s(1, 2, 2))) < 1e-9)
  }

  test("bm25 score is invariant to partitioning (exact-integer statistics)") {
    val docs = (1L to 200L).map(i => (i, s"t$i hash " * (i % 7 + 1).toInt)).toDF("doc_id", "text")
    val a = Retrieval.bm25(docs.repartition(1), "doc_id", "text", Seq("hash"), 50)
      .select("doc_id", "score").as[(Long, Double)].collect().toSeq
    val b = Retrieval.bm25(docs.repartition(7, col("doc_id")), "doc_id", "text", Seq("hash"), 50)
      .select("doc_id", "score").as[(Long, Double)].collect().toSeq
    assert(a == b)
  }

  // ---- PII scrub -----------------------------------------------------------

  test("scrub redacts multiple emails and IPs, leaves clean text alone") {
    val df = Seq(
      "mail a.b+c@ex-1.example.com and d@e.org here",
      "host 10.0.255.3 then 192.168.1.1 end",
      "no pii at all",
      "a@b.c stays: single-letter TLD is not an email"
    ).toDF("t")
    val (clean, ne, ni) = Scrub.scrub(col("t"))
    val got = df.select(clean.as("c"), ne.as("e"), ni.as("i"))
      .as[(String, Int, Int)].collect().toSeq
    assert(got(0) == (("mail <EMAIL> and <EMAIL> here", 2, 0)))
    assert(got(1) == (("host <IP> then <IP> end", 0, 2)))
    assert(got(2) == (("no pii at all", 0, 0)))
    assert(got(3)._2 == 0) // 2+ letter TLD required
  }

  test("scrub order: an email's dotted host is not double-counted as an IP") {
    val df = Seq("ping me@192.168.0.1.example.io now").toDF("t")
    val (clean, ne, ni) = Scrub.scrub(col("t"))
    val (c, e, i) = df.select(clean, ne, ni).as[(String, Int, Int)].head()
    assert(e == 1 && i == 0 && c == "ping <EMAIL> now")
  }

  // ---- k-means -------------------------------------------------------------

  private def vecDf(rows: Seq[(Long, Seq[Double])]) =
    rows.toDF("vec_id", "v")

  test("kmeans separates two obvious blobs and assigns ties to the smaller cluster id") {
    // ids 0,1 seed the two centroids; blob A near (0,0), blob B near (10,10)
    val data = vecDf(Seq(
      0L -> Seq(0.0, 0.1), 1L -> Seq(10.0, 10.0),
      2L -> Seq(0.1, 0.0), 3L -> Seq(9.9, 10.1), 4L -> Seq(0.05, 0.05)))
    val (assign, cents) = Clustering.kmeans(data, "vec_id", "v", 2, 2)
    val m = assign.select("vec_id", "cluster").as[(Long, Int)].collect().toMap
    assert(m(0L) == 0 && m(2L) == 0 && m(4L) == 0 && m(1L) == 1 && m(3L) == 1)
    assert(cents.map(_._1) == Seq(0, 1))
    // centroid 0 = exact mean of blob A under the 1e6-scaled integer rule
    val c0 = cents.head._2
    assert(math.abs(c0.head - 0.05) < 1e-6 && math.abs(c0(1) - 0.05) < 1e-6)
  }

  test("kmeans assignment is partitioning-invariant (scaled-integer centroid sums)") {
    val rnd = new scala.util.Random(7)
    val data = (0L until 120L).map(i =>
      (i, Seq.fill(8)(rnd.nextDouble() - 0.5)))
    val a = Clustering.kmeans(vecDf(data).repartition(1), "vec_id", "v", 4, 2)
      ._1.select("vec_id", "cluster").as[(Long, Int)].collect().toMap
    val b = Clustering.kmeans(vecDf(data).repartition(5, col("vec_id")), "vec_id", "v", 4, 2)
      ._1.select("vec_id", "cluster").as[(Long, Int)].collect().toMap
    assert(a == b)
  }

  test("kmeans frame path (broadcast centroids) matches the literal path exactly") {
    // the large-k path must be bit-identical to the small-k path: same
    // scaled-integer sums, same double division, same smallest-id tie-break
    // via min(struct(dist, cl)). Run both on one corpus, same k.
    val rnd = new scala.util.Random(11)
    val data = vecDf((0L until 150L).map(i =>
      (i, Seq.fill(6)(rnd.nextDouble() - 0.5))) ++
      Seq(150L -> Seq(0.25, 0.25, 0.25, 0.25, 0.25, 0.25),
          151L -> Seq(0.25, 0.25, 0.25, 0.25, 0.25, 0.25))) // exact dup pair
    val (al, cl) = Clustering.kmeansImpl(data, "vec_id", "v", 6, 2, useFrame = false)
    val (af, cf) = Clustering.kmeansImpl(data, "vec_id", "v", 6, 2, useFrame = true)
    val ml = al.collect().map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2))).toMap
    val mf = af.collect().map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2))).toMap
    assert(ml == mf)
    assert(cl == cf)
  }

  test("vec_sum_scaled kernel: scaledLong tracks Spark's round() on half/edge cases") {
    // the kernel's rounding must be indistinguishable from the
    // round(x*1e6)+cast the oracle SQL uses — decimal-string HALF_UP,
    // including the values where float +0.5 tricks go wrong
    val xs = Seq(0.5, -0.5, 1.5, -1.5, 2.675, -2.675, 0.49999999999999994,
      -0.49999999999999994, 1e-7, -1e-7, 123456.789012, -123456.789012, 0.0)
    val viaSpark = xs.toDF("x")
      .select(round(col("x") * 1000000.0).cast("long")).as[Long].collect().toSeq
    val viaKernel = xs.map(x => graft.functions.VecAgg.scaledLong(x * 1000000.0))
    assert(viaKernel == viaSpark)
  }

  test("vec_sum_scaled aggregate equals the posexplode+sum formulation") {
    val rnd = new scala.util.Random(13)
    val data = (0L until 200L).map(i => (i % 7, Seq.fill(5)(rnd.nextDouble() * 2 - 1)))
      .toDF("g", "v")
    val viaKernel = data.groupBy("g")
      .agg(graft.functions.VecAgg.vecSumScaled(col("v")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val viaExplode = data
      .select(col("g"), posexplode(col("v")).as(Seq("d", "x")))
      .groupBy("g", "d").agg(sum(round(col("x") * 1000000.0).cast("long")).as("s"))
      .collect().groupBy(_.getLong(0))
      .map { case (g, rows) => g -> rows.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq }
    assert(viaKernel == viaExplode)
  }

  test("canonical weighted kmeans equals the explicit-k all-copies run on a duplicated corpus") {
    // 40 distinct vectors, each duplicated 1-4x with larger ids, including
    // duplicates among the k smallest ids (twin-centroid seeds). The
    // canonical path must reproduce the all-copies run bit-for-bit:
    // weighted integer sums, full-corpus init, copies inheriting their
    // rep's assignment.
    val rnd = new scala.util.Random(23)
    val base = (0L until 40L).map(i => (i, Seq.fill(4)(rnd.nextDouble() - 0.5)))
    val copies = base.flatMap { case (i, v) =>
      (1 to (i % 4).toInt).map(c => (100L + i * 10 + c, v)) }
    val data = vecDf(base ++ copies)
    val k = Clustering.adaptiveK(40L) // distinct vectors = 40 -> k = 8
    val (ae, ce) = Clustering.kmeans(data, "vec_id", "v", k, 2)
    val (ac, cc) = Clustering.kmeansAdaptive(data, "vec_id", "v", 2)
    val me = ae.collect().map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2))).toMap
    val mc = ac.collect().map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2))).toMap
    assert(mc == me)
    assert(cc == ce)
  }

  test("adaptiveK follows the sqrt build rule with a floor") {
    assert(Clustering.adaptiveK(0) == 8)
    assert(Clustering.adaptiveK(63) == 8)
    assert(Clustering.adaptiveK(65) == 9)
    assert(Clustering.adaptiveK(100) == 10)
    assert(Clustering.adaptiveK(1000000) == 1000)
    assert(Clustering.adaptiveK(1000001) == 1001)
  }

  test("kmeans survives total collapse to one cluster (least() single-arg guard)") {
    // every vector identical: after iteration 1 only cluster 0 survives;
    // the next assignment runs against a single centroid and must not
    // throw (Spark's least() requires >1 args)
    val data = vecDf((0L until 6L).map(i => (i, Seq(1.0, 2.0))))
    val (assign, cents) = Clustering.kmeans(data, "vec_id", "v", 3, 2)
    assert(cents.map(_._1) == Seq(0))
    assert(assign.select("cluster").as[Int].collect().toSet == Set(0))
  }

  test("kmeans drops emptied clusters instead of carrying stale centroids") {
    // id 1's seed is immediately outvoted: every point sits at (0,0)-ish, so
    // after iteration 1 cluster 1 may lose all members -> it must disappear
    // from the centroid list rather than resurrect with its old position
    val data = vecDf(Seq(
      0L -> Seq(0.0, 0.0), 1L -> Seq(0.2, 0.0), 2L -> Seq(0.01, 0.0),
      3L -> Seq(0.02, 0.0), 4L -> Seq(0.0, 0.01)))
    val (assign, cents) = Clustering.kmeans(data, "vec_id", "v", 2, 2)
    val clusters = assign.select("cluster").as[Int].collect().toSet
    assert(cents.map(_._1).toSet == clusters)
  }

  // ---- semantic dedup ------------------------------------------------------

  test("semanticDedup drops later near-identical vectors within a cluster, keeps the first") {
    val data = vecDf(Seq(
      0L -> Seq(1.0, 0.0), 1L -> Seq(0.0, 1.0),
      2L -> Seq(1.0, 0.001),  // near-dup of 0
      3L -> Seq(0.0, 0.9),    // near-dup of 1 (same direction)
      4L -> Seq(-1.0, 0.0)))  // opposite direction: cosine -1, kept
    val got = Clustering.semanticDedup(data, "vec_id", "v", 2, 1, 0.95)
      .select("vec_id", "dropped").as[(Long, Boolean)].collect().toMap
    assert(!got(0L) && !got(1L) && got(2L) && got(3L) && !got(4L))
  }

  // ---- Z-order -------------------------------------------------------------

  test("morton interleave golden values") {
    val df = Seq((3L, 5L), (0L, 0L), (255L, 0L), (0L, 255L)).toDF("x", "y")
    val got = df.select(Layout.morton(col("x"), col("y"), 8)).as[Long].collect().toSeq
    // x=3,y=5: x bits even (1+4), y bits odd (2+0+32) -> 0b100111 = 39
    assert(got == Seq(39L, 0L, 0x5555L, 0xAAAAL))
  }

  test("morton Column expression and SQL string agree (generated from one loop)") {
    val df = Seq((17L, 200L), (123L, 45L)).toDF("px", "py")
    df.createOrReplaceTempView("mz")
    val viaCol = df.select(Layout.morton(col("px"), col("py"), 8)).as[Long].collect().toSeq
    val viaSql = spark.sql(
      s"SELECT ${Layout.mortonSql("px", "py", 8).replace("//", "DIV")} FROM mz")
      .as[Long].collect().toSeq
    assert(viaCol == viaSql)
  }

  test("zorderLayout yields non-overlapping zkey ranges per output partition") {
    val rnd = new scala.util.Random(3)
    val df = (1 to 2000).map(_ => (rnd.nextInt(1000).toLong, rnd.nextInt(1000).toLong))
      .toDF("x", "y")
    val laid = Layout.zorderLayout(df, "x", "y", 8, 8)
    val ranges = laid.select(spark_partition_id().as("p"), col("zkey"))
      .groupBy("p").agg(min("zkey").as("lo"), max("zkey").as("hi"))
      .orderBy("lo").as[(Int, Long, Long)].collect()
    ranges.sliding(2).foreach {
      case Array((_, _, hi1), (_, lo2, _)) => assert(hi1 <= lo2)
      case _ =>
    }
    // locality: mean per-eighth-of-files x-span must beat the global span
    val spans = laid.groupBy(spark_partition_id()).agg((max("x") - min("x")).as("s"))
      .as[(Int, Long)].collect().map(_._2)
    assert(spans.sum.toDouble / spans.length < 999 * 0.8)
  }

  // ---- group top-k sampling ------------------------------------------------

  test("groupTopK returns exactly k per group, stable under repartitioning") {
    val df = (1L to 300L).map(i => (i, s"g${i % 3}")).toDF("id", "g")
    val a = Sampling.groupTopK(df, col("id"), col("g"), 7)
      .select("id").as[Long].collect().toSet
    assert(a.size == 21)
    val b = Sampling.groupTopK(df.repartition(11, col("id")), col("id"), col("g"), 7)
      .select("id").as[Long].collect().toSet
    assert(a == b)
    val perGroup = Sampling.groupTopK(df, col("id"), col("g"), 7)
      .groupBy("g").count().as[(String, Long)].collect().toMap
    assert(perGroup.values.forall(_ == 7L))
  }

  test("groupTopK keeps whole groups smaller than k") {
    val df = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "g")
    assert(Sampling.groupTopK(df, col("id"), col("g"), 5).count() == 3)
  }

  // ---- sliding chunks ------------------------------------------------------

  test("slidingChunks: 50% overlap shares tokens, counts and tails exact") {
    import graft.operators.Packing
    // 10 tokens, c=4, s=2 → chunks at 0,2,4,6 → 4 chunks (1 + ceil(6/2))
    val df = Seq((1L, "a b c d e f g h i j"), (2L, "x y")).toDF("doc_id", "text")
    val got = Packing.slidingChunks(df, col("text"), 4, 2)
      .orderBy("doc_id", "chunk_idx").collect()
    val d1 = got.filter(_.getLong(0) == 1L)
    assert(d1.length === 4)
    assert(d1.map(_.getInt(2)).toSeq === Seq(4, 4, 4, 4))
    // short doc: one chunk, truncated length
    val d2 = got.filter(_.getLong(0) == 2L)
    assert(d2.length === 1 && d2.head.getInt(2) === 2)
    // consecutive chunk hashes differ but overlap is real: chunk 0 = a b c d,
    // chunk 1 = c d e f (hand md5 of the joined strings)
    def m(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(d1(0).getString(3) === m("a b c d"))
    assert(d1(1).getString(3) === m("c d e f"))
  }

  // ---- bloom filter --------------------------------------------------------

  test("bloom filter has no false negatives and a bounded FP rate") {
    val keys = (1L to 5000L).map(i => s"k$i").toDF("k")
    val bits = Sketches.bloomBuild(keys, col("k"))
    val fn = keys.where(!Sketches.bloomMightContain(bits, col("k"))).count()
    assert(fn == 0, "false negative")
    val other = (1L to 20000L).map(i => s"x$i").toDF("k")
    val fp = other.where(Sketches.bloomMightContain(bits, col("k"))).count()
    // n=5000, m=2^18, k=3 -> theoretical FP ~ 0.00018; allow 10x slack
    assert(fp < 40, s"fp rate too high: $fp / 20000")
  }

  test("bloom merge equals bloom of the union") {
    val a = Sketches.bloomBuild(Seq("a", "b").toDF("k"), col("k"))
    val b = Sketches.bloomBuild(Seq("c").toDF("k"), col("k"))
    val u = Sketches.bloomBuild(Seq("a", "b", "c").toDF("k"), col("k"))
    assert(Sketches.bloomMerge(a, b).toSeq == u.toSeq)
  }

  test("bloom-pruned semi join returns exactly the unpruned result") {
    val build = (1L to 400L).filter(_ % 3 == 0).map(i => (i, s"o$i")).toDF("key", "o")
    val probe = (1L to 400L).map(i => (i, s"p$i")).toDF("key", "p")
    val bits = Sketches.bloomBuild(build.select(col("key")), col("key").cast("string"))
    val pruned = probe.where(Sketches.bloomMightContain(bits, col("key").cast("string")))
      .join(build.select("key"), Seq("key"), "left_semi")
      .select("key").as[Long].collect().toSet
    val plain = probe.join(build.select("key"), Seq("key"), "left_semi")
      .select("key").as[Long].collect().toSet
    assert(pruned == plain)
  }
}
