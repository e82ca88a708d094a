package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor / similarity search over an embedding column
  * (`array<float>`), for `embeddings(vec_id, embedding, label)`.
  *
  * Baseline = brute-force cosine top-k (exact, O(Q*N) — fine when the query
  * set is small and broadcast). Scale path = LSH sign-projection bucketing:
  * candidates only join within equal buckets, so the pair count is bounded
  * by bucket occupancy instead of N^2. All vector math uses codegen'd
  * higher-order functions (zip_with/aggregate) on doubles — no UDFs.
  */
object Similarity {

  /** Cast array<float> -> array<double> once; all math in double. */
  def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** Codegen'd kernels (graft.functions.VecOps) — same left-to-right fold
    * order as the SQL-oracle list kernels, no per-pair array allocation.
    */
  def dot(a: Column, b: Column): Column = graft.functions.VecOps.vecDot(a, b)

  def norm(a: Column): Column = graft.functions.VecOps.vecNorm(a)

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k: for each query vector, the k nearest corpus
    * vectors by cosine (self-matches excluded). The query side is broadcast
    * — at scale Q << N, so this is one broadcast-nested-loop + a top-k
    * window, no shuffle of the corpus.
    */
  def bruteForceKnn(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // norms computed once per vector, not once per pair
    val c = corpus.select(col("vec_id").as("nbr_id"), asDouble(col("embedding")).as("cvec"))
      .withColumn("cn", norm(col("cvec")))
    val q = queries.select(col("vec_id").as("query_id"), asDouble(col("embedding")).as("qvec"))
      .withColumn("qn", norm(col("qvec")))
    // a small input often arrives as one parquet split; spread the O(Q*N)
    // scoring across the cluster before the broadcast nested-loop join
    val scored = c.repartition().join(broadcast(q), col("query_id") =!= col("nbr_id"))
      .withColumn("cos", round(dot(col("qvec"), col("cvec")) / (col("qn") * col("cn")), 6))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("nbr_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("nbr_id"), col("cos"), col("rank"))
  }

  /** Deterministic pseudo-random hyperplanes: component i of plane p is
    * +1/-1 from a tiny integer mixer — stable across runs (no RNG on the
    * data path) and emitted as literal arrays so SQL oracles share them.
    */
  def planes(numPlanes: Int, dim: Int): Seq[Seq[Double]] =
    (0 until numPlanes).map { p =>
      (0 until dim).map { i =>
        val m = (i.toLong * 2654435761L + p.toLong * 40503L + (i + p).toLong * (i + p) * 97L) % 2
        if (m == 0) 1.0 else -1.0
      }
    }

  /** Sign-projection LSH bucket id: bit p = sign(dot(v, plane_p)) for
    * `numPlanes` planes -> an int bucket in [0, 2^numPlanes). The plane
    * dot products fold left-to-right like the cosine path, so bucket
    * assignment is bit-reproducible.
    */
  def lshBucket(vec: Column, ps: Seq[Seq[Double]]): Column = {
    val proj = ps.zipWithIndex.map { case (plane, p) =>
      val s = dot(vec, typedLit(plane))
      when(s > 0, lit(1L << p)).otherwise(lit(0L))
    }
    proj.reduce(_ + _)
  }

  /** LSH-bucketed ANN: cosine top-k but candidates restricted to vectors
    * sharing the query's bucket. Trades recall for a bounded candidate set —
    * the scale path when Q*N is too big to broadcast-scan.
    */
  def lshAnn(corpus: DataFrame, queries: DataFrame, k: Int, ps: Seq[Seq[Double]]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c = corpus.select(col("vec_id").as("nbr_id"), asDouble(col("embedding")).as("cvec"))
      .withColumn("bucket", lshBucket(col("cvec"), ps))
      .withColumn("cn", norm(col("cvec")))
    val q = queries.select(col("vec_id").as("query_id"), asDouble(col("embedding")).as("qvec"))
      .withColumn("bucket", lshBucket(col("qvec"), ps))
      .withColumn("qn", norm(col("qvec")))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .where(col("query_id") =!= col("nbr_id"))
      .withColumn("cos", round(dot(col("qvec"), col("cvec")) / (col("qn") * col("cn")), 6))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("nbr_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("nbr_id"), col("cos"), col("rank"))
  }

  /** Embedding near-duplicate pairs: all (a < b) with cosine >= threshold.
    * Blocked by LSH bucket at scale; `exhaustive = true` does the full
    * pairwise scan (correctness oracle / small N).
    */
  def cosineNearDupPairs(embeddings: DataFrame, threshold: Double, exhaustive: Boolean = true): DataFrame = {
    val e = embeddings.select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("nrm", norm(col("v")))
    val l = e.select(col("vec_id").as("a"), col("v").as("va"), col("nrm").as("na"))
    val r = e.select(col("vec_id").as("b"), col("v").as("vb"), col("nrm").as("nb"))
    val pairs =
      if (exhaustive) l.repartition().join(broadcast(r), col("a") < col("b"))
      else {
        val ps = planes(8, 64)
        val lb = l.withColumn("bucket", lshBucket(col("va"), ps))
        val rb = r.withColumn("bucket", lshBucket(col("vb"), ps))
        lb.join(rb, Seq("bucket")).where(col("a") < col("b"))
      }
    pairs.withColumn("cos", round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 6))
      .where(col("cos") >= threshold)
      .select(col("a"), col("b"), col("cos"))
  }
}
