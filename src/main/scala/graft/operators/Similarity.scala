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

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x * x))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k: for each query vector, the k nearest corpus
    * vectors by cosine (self-matches excluded). The query side is broadcast
    * — at scale Q << N, so this is one broadcast-nested-loop + a top-k
    * window, no shuffle of the corpus.
    */
  def bruteForceKnn(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c = corpus.select(col("vec_id").as("nbr_id"), asDouble(col("embedding")).as("cvec"))
    val q = queries.select(col("vec_id").as("query_id"), asDouble(col("embedding")).as("qvec"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("nbr_id"))
      .withColumn("cos", round(cosine(col("qvec"), col("cvec")), 6))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("nbr_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("nbr_id"), col("cos"), col("rank"))
  }

  /** Deterministic pseudo-random hyperplane: component i of plane p is
    * +1/-1 from a tiny integer mixer — portable to SQL oracles and stable
    * across runs (no RNG on the data path).
    */
  private def planeSign(p: Int, i: Column): Column =
    when(pmod(i * lit(2654435761L) + lit(p) * lit(40503L) + (i + lit(p)) * (i + lit(p)) * lit(97L),
      lit(2)) === 0, lit(1.0)).otherwise(lit(-1.0))

  /** Sign-projection LSH bucket id: bit p = sign(dot(v, plane_p)) for
    * `numPlanes` planes -> an int bucket in [0, 2^numPlanes).
    */
  def lshBucket(vec: Column, numPlanes: Int): Column = {
    val proj = (0 until numPlanes).map { p =>
      val s = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1), (x, i) => x * planeSign(p, i)),
        lit(0.0), (acc, x) => acc + x)
      when(s > 0, lit(1L << p)).otherwise(lit(0L))
    }
    proj.reduce(_ + _)
  }

  /** LSH-bucketed ANN: cosine top-k but candidates restricted to vectors
    * sharing the query's bucket. Trades recall for a bounded candidate set —
    * the scale path when Q*N is too big to broadcast-scan.
    */
  def lshAnn(corpus: DataFrame, queries: DataFrame, k: Int, numPlanes: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c = corpus.select(col("vec_id").as("nbr_id"), asDouble(col("embedding")).as("cvec"))
      .withColumn("bucket", lshBucket(col("cvec"), numPlanes))
    val q = queries.select(col("vec_id").as("query_id"), asDouble(col("embedding")).as("qvec"))
      .withColumn("bucket", lshBucket(col("qvec"), numPlanes))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .where(col("query_id") =!= col("nbr_id"))
      .withColumn("cos", round(cosine(col("qvec"), col("cvec")), 6))
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
    val l = e.select(col("vec_id").as("a"), col("v").as("va"))
    val r = e.select(col("vec_id").as("b"), col("v").as("vb"))
    val pairs =
      if (exhaustive) l.join(r, col("a") < col("b"))
      else {
        val lb = l.withColumn("bucket", lshBucket(col("va"), 8))
        val rb = r.withColumn("bucket", lshBucket(col("vb"), 8))
        lb.join(rb, Seq("bucket")).where(col("a") < col("b"))
      }
    pairs.withColumn("cos", round(cosine(col("va"), col("vb")), 6))
      .where(col("cos") >= threshold)
      .select(col("a"), col("b"), col("cos"))
  }
}
