package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 ranked retrieval for a FIXED term list — the corpus-quality /
  * relevance-scoring primitive of a training-data pipeline (e.g. scoring
  * documents against a topic probe, or building retrieval baselines).
  *
  * Shape: two corpus passes, both narrow. Pass 1 computes the global
  * statistics (N, total token count, per-term document frequencies) as ONE
  * scalar aggregate row — every input to the score is an exact integer, so
  * the derived doubles (avgdl, idf) are bit-identical in any engine and
  * under any partitioning. Pass 2 broadcasts that row and evaluates the
  * score as a fixed-order sum of per-term closed forms (never an aggregate
  * over exploded term rows, whose addition order would be
  * partition-dependent).
  */
object Retrieval {

  val K1 = 1.2
  val B = 0.75

  def tokens(textCol: Column): Column =
    filter(split(lower(trim(textCol)), "\\s+"), t => length(t) > 0)

  /** Per-doc BM25 scores for `terms`; returns (idCol, dl, tf_<i>..., score).
    * Keeps score > 0 rows, ranked desc with id tiebreak, top `limit`.
    */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
           terms: Seq[String], limit: Int): DataFrame = {
    val base = docs.select(col(idCol), tokens(col(textCol)).as("__toks"))
      .withColumn("__dl", size(col("__toks")))
    val withTf = terms.zipWithIndex.foldLeft(base) { case (df, (t, i)) =>
      df.withColumn(s"__tf$i", size(filter(col("__toks"), x => x === lit(t))))
    }.drop("__toks")
    val statAggs = Seq(count(lit(1)).as("__n"), sum(col("__dl")).as("__sdl")) ++
      terms.indices.map(i => sum((col(s"__tf$i") > 0).cast("long")).as(s"__df$i"))
    val stats = withTf.agg(statAggs.head, statAggs.tail: _*)
    val scored = withTf.crossJoin(broadcast(stats))
      .withColumn("__avgdl", col("__sdl").cast("double") / col("__n"))
    // Expression GROUPING mirrors the oracle SQL exactly (multiplication /
    // addition are bitwise-commutative in IEEE, associativity is not), and
    // every double constant is the same Scala value the SQL interpolates.
    val score = terms.indices.map { i =>
      val tf = col(s"__tf$i").cast("double")
      val dfc = col(s"__df$i")
      val idf = log((col("__n") - dfc + lit(0.5)) / (dfc + lit(0.5)) + lit(1.0))
      val inner = col("__dl").cast("double") / col("__avgdl") * B + (1.0 - B)
      idf * (tf * (K1 + 1.0)) / (tf + inner * K1)
    }.reduce(_ + _) // fixed left-to-right term order — both engines add identically
    val outCols = Seq(col(idCol), col("__dl").as("dl")) ++
      terms.indices.map(i => col(s"__tf$i").as(s"tf${i + 1}")) :+ col("score")
    scored.withColumn("score", round(score, 6))
      .where(col("score") > 0)
      .select(outCols: _*)
      .orderBy(col("score").desc, col(idCol))
      .limit(limit)
  }

  /** Static inverted index with TRUNCATED posting lists: per token, document
    * frequency, collection frequency, and the top-`k` postings by (tf desc,
    * doc_id) serialized as `doc:tf,doc:tf,...`. Truncation is what makes the
    * index state bounded at 100 TB — a stopword's full posting list is
    * corpus-sized, its top-k is k rows; df/cf stay exact because they
    * aggregate BEFORE the rank filter.
    *
    * Shuffle shape: explode → groupBy(token, doc) benefits from map-side
    * combine (per-doc tf collapses in the mapper), the rank window
    * re-shuffles only one row per (token, doc), and the final per-token
    * fold sees ≤ df rows of which ≤ k carry postings.
    */
  def invertedPostings(docs: DataFrame, idCol: String, textCol: String,
                       k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("token")).orderBy(col("tf").desc, col(idCol))
    docs.select(col(idCol), explode(tokens(col(textCol))).as("token"))
      .groupBy(col("token"), col(idCol))
      .agg(count(lit(1)).as("tf"))
      .withColumn("__rk", row_number().over(w))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("cf"),
        array_join(
          transform(
            array_sort(collect_list(when(col("__rk") <= k,
              struct(col("__rk"), col(idCol).as("doc"), col("tf"))))),
            x => concat(x.getField("doc").cast("string"), lit(":"),
              x.getField("tf").cast("string"))),
          ",").as("postings"))
  }

  /** DuckDB mirror of [[invertedPostings]] over the documents table. */
  def invertedPostingsSql(k: Int): String =
    s"""(WITH toks AS (
       |  SELECT doc_id, unnest(list_filter(
       |    string_split_regex(lower(trim(text)), '\\s+'), x -> len(x) > 0)) AS token
       |  FROM documents),
       |tf AS (SELECT token, doc_id, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
       |rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY token
       |         ORDER BY tf DESC, doc_id) AS rk FROM tf)
       |SELECT token, COUNT(*) AS df, CAST(SUM(tf) AS BIGINT) AS cf,
       |       coalesce(string_agg(CASE WHEN rk <= $k
       |         THEN doc_id || ':' || tf END, ',' ORDER BY rk), '') AS postings
       |FROM rk GROUP BY token)""".stripMargin
}
