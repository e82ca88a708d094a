package graft

import graft.operators.{Clustering, Dedup, Layout, Packing, Retrieval, Sampling, Scrub, Sketches}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-4 curation operators: chunk-granularity substring dedup, BM25
  * retrieval scoring, PII scrubbing, deterministic k-means + SemDeDup
  * semantic dedup, Z-order layout, exactly-k group sampling, and
  * bloom-filter join pruning — each oracle-checked against DuckDB like the
  * core queries, each designed shuffle-minimal for the 100 TB posture.
  */
object CurationQueries {

  // ---- chunk-level exact substring dedup ---------------------------------
  val ChunkTokens = 8

  def dedupChunk(s: SparkSession, dir: String): DataFrame =
    Dedup.chunkDupStats(Queries.table(s, dir, "documents"), ChunkTokens)
      .orderBy("doc_id")

  val dedupChunkSql: String =
    s"""WITH toks AS (SELECT doc_id,
       |    list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> len(x) > 0) AS t
       |  FROM documents),
       |ch AS (SELECT doc_id, unnest(range(CAST(ceil(len(t) / $ChunkTokens.0) AS BIGINT))) AS chunk_idx, t FROM toks),
       |k AS (SELECT doc_id, chunk_idx,
       |        md5(array_to_string(t[chunk_idx*$ChunkTokens+1 : chunk_idx*$ChunkTokens+$ChunkTokens], ' ')) AS k FROM ch),
       |r AS (SELECT doc_id, chunk_idx, row_number() OVER (PARTITION BY k ORDER BY doc_id, chunk_idx) AS rn FROM k)
       |SELECT doc_id, COUNT(*) AS n_chunks,
       |  CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_chunks,
       |  round(CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6) AS dup_frac
       |FROM r GROUP BY 1 ORDER BY doc_id""".stripMargin

  // ---- sliding overlap chunking (RAG layout) -------------------------------
  val SlideChunk = 32
  val SlideStride = 16

  /** 32-token chunks at stride 16 (50% overlap) with per-chunk hashes. */
  def chunkSliding(s: SparkSession, dir: String): DataFrame =
    // sort-first (see textLangid): the range exchange samples its CHILD, so
    // an orderBy after the explode+slice+md5 projection executes that
    // projection twice over every chunk. Sorting the slim (doc_id, text)
    // base instead and letting the order-preserving projection + in-row
    // sequence explode carry (doc_id, chunk_idx) order costs one cheap
    // exchange — measured 14.8 s -> ~6 s on the 10× corpus. Row order per
    // partition stays deterministic; the driver's compare sorts rows.
    Packing.slidingChunks(
      Queries.table(s, dir, "documents").select(col("doc_id"), col("text"))
        .orderBy("doc_id"),
      col("text"), SlideChunk, SlideStride)

  val chunkSlidingSql: String =
    s"""SELECT * FROM ${Packing.slidingChunksSql(SlideChunk, SlideStride)}
       |ORDER BY doc_id, chunk_idx""".stripMargin

  // ---- BM25 ranked retrieval ---------------------------------------------
  val Bm25Terms = Seq("hash", "merge", "scan")
  val Bm25Limit = 20

  def textBm25(s: SparkSession, dir: String): DataFrame =
    Retrieval.bm25(Queries.table(s, dir, "documents"), "doc_id", "text",
      Bm25Terms, Bm25Limit)

  val textBm25Sql: String = {
    val k1p1 = Retrieval.K1 + 1.0
    val oneMinusB = 1.0 - Retrieval.B
    def term(i: Int) =
      s"""ln((n - df$i + 0.5) / (df$i + 0.5) + 1.0)
         | * (CAST(tf$i AS DOUBLE) * $k1p1)
         | / (CAST(tf$i AS DOUBLE) + (CAST(dl AS DOUBLE) / avgdl * ${Retrieval.B} + $oneMinusB) * ${Retrieval.K1})"""
        .stripMargin.replace("\n", "")
    s"""WITH toks AS (SELECT doc_id,
       |    list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> len(x) > 0) AS t
       |  FROM documents),
       |tf AS (SELECT doc_id, len(t) AS dl,
       |         ${Bm25Terms.zipWithIndex.map { case (t, i) =>
                    s"len(list_filter(t, x -> x = '$t')) AS tf${i + 1}" }.mkString(", ")}
       |       FROM toks),
       |st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(dl) AS BIGINT) AS sdl,
       |         ${Bm25Terms.indices.map { i =>
                    s"CAST(SUM(CASE WHEN tf${i + 1} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df${i + 1}" }.mkString(", ")}
       |       FROM tf),
       |av AS (SELECT *, CAST(sdl AS DOUBLE) / n AS avgdl FROM st),
       |sc AS (SELECT doc_id, dl, ${Bm25Terms.indices.map(i => s"tf${i + 1}").mkString(", ")},
       |         round(${Bm25Terms.indices.map(i => term(i + 1)).mkString(" + ")}, 6) AS score
       |       FROM tf CROSS JOIN av)
       |SELECT doc_id, dl, ${Bm25Terms.indices.map(i => s"tf${i + 1}").mkString(", ")}, score
       |FROM sc WHERE score > 0 ORDER BY score DESC, doc_id LIMIT $Bm25Limit""".stripMargin
  }

  // ---- PII scrubbing -----------------------------------------------------
  /** Demonstrated over a derived column that concatenates a synthetic email
    * + IPv4 in front of the text (the corpus itself is clean token soup),
    * so the redaction path is exercised on every row; ScrubSpec covers the
    * messy edge cases on crafted strings.
    */
  def textPiiScrub(s: SparkSession, dir: String): DataFrame = {
    val docs = Queries.table(s, dir, "documents")
      .withColumn("raw", concat(
        col("source"), lit("@mail."), col("lang"), lit(" 192.168."),
        (col("doc_id") % 256).cast("string"), lit("."),
        (col("doc_id") % 100).cast("string"), lit(" "), col("text")))
    val (clean, ne, ni) = Scrub.scrub(col("raw"))
    docs.select(col("doc_id"), ne.as("n_email"), ni.as("n_ip"),
        substring(clean, 1, 60).as("head"))
      .orderBy("doc_id")
  }

  val textPiiScrubSql: String =
    s"""WITH raw AS (SELECT doc_id,
       |    source || '@mail.' || lang || ' 192.168.' || CAST(doc_id % 256 AS VARCHAR)
       |      || '.' || CAST(doc_id % 100 AS VARCHAR) || ' ' || text AS s
       |  FROM documents),
       |e AS (SELECT doc_id,
       |        len(regexp_extract_all(s, '${Scrub.EmailRe}')) AS n_email,
       |        regexp_replace(s, '${Scrub.EmailRe}', '<EMAIL>', 'g') AS s1 FROM raw),
       |i AS (SELECT doc_id, n_email,
       |        len(regexp_extract_all(s1, '${Scrub.Ipv4Re}')) AS n_ip,
       |        regexp_replace(s1, '${Scrub.Ipv4Re}', '<IP>', 'g') AS s2 FROM e)
       |SELECT doc_id, n_email, n_ip, substr(s2, 1, 60) AS head FROM i ORDER BY doc_id""".stripMargin

  // ---- deterministic k-means + SemDeDup ----------------------------------
  val KmeansMinK = 8
  val KmeansIters = 2

  private def embDouble(s: SparkSession, dir: String): DataFrame =
    Queries.table(s, dir, "embeddings")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))

  /** Corpus-adaptive cluster count — k = max(8, ceil(sqrt(distinct
    * vectors))), the [[Clustering.adaptiveK]] build rule, with the
    * distinct count computed on the operator's cached corpus frame (no
    * second source scan). The oracle SQL derives the SAME k in its `kk`
    * CTE, so Spark and DuckDB block identically at every scale factor (the
    * fixed k=8 this replaces was the one quadratic-at-100x shape left:
    * cluster occupancy grew linearly with the corpus while k stood still).
    */
  def embedKmeans(s: SparkSession, dir: String): DataFrame =
    Clustering.kmeansAdaptive(embDouble(s, dir), "vec_id", "v",
      KmeansIters, KmeansMinK)._1.orderBy("vec_id")

  /** The unrolled-iteration oracle: generated from the same constants; one
    * CTE block per Lloyd iteration, then the final assignment. Iterations
    * run over the CANONICAL `ec` table (one row per distinct vector with
    * its multiplicity) with cnt-weighted sums — exactly the Spark
    * implementation's shape, and exactly equal to iterating every copy:
    * `round(x·1e6)·cnt` = the sum of cnt copies of the rounded integer.
    */
  private def kmeansIterCtes(it: Int, prev: String): String =
    s"""d$it AS (SELECT ecv.rep, ecv.cnt, c.cl,
       |  ecv.vv - 2.0 * list_inner_product(ecv.v, c.c) + list_inner_product(c.c, c.c) AS d
       |  FROM ecv CROSS JOIN $prev c),
       |a$it AS (SELECT rep, cnt, cl FROM (SELECT rep, cnt, cl,
       |    row_number() OVER (PARTITION BY rep ORDER BY d, cl) AS rn FROM d$it) WHERE rn = 1),
       |x$it AS (SELECT a$it.cl, a$it.cnt, unnest(range(len(ec.v))) AS i, unnest(ec.v) AS x
       |  FROM a$it JOIN ec USING (rep)),
       |s$it AS (SELECT cl, i,
       |    CAST(SUM(CAST(round(x * 1000000.0) AS BIGINT) * cnt) AS BIGINT) AS sq,
       |    CAST(SUM(cnt) AS BIGINT) AS n FROM x$it GROUP BY 1, 2),
       |c$it AS (SELECT cl, list(sq / (n * 1000000.0) ORDER BY i) AS c FROM s$it GROUP BY cl)""".stripMargin

  private val kmeansPrefixSql: String = {
    val iters = (1 to KmeansIters)
      .map(it => kmeansIterCtes(it, s"c${it - 1}")).mkString(",\n")
    // kk mirrors Clustering.adaptiveK: k = max(minK, ceil(sqrt(#distinct
    // vectors))) — data-derived in BOTH engines, so the blocking matches at
    // any scale factor without regenerating the SQL. Initialization stays
    // over the FULL corpus e (duplicated seed ids give twin centroids,
    // matching the Spark init rule).
    s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
       |ev AS (SELECT vec_id, v, list_inner_product(v, v) AS vv FROM e),
       |ec AS MATERIALIZED (SELECT MIN(vec_id) AS rep, v, CAST(COUNT(*) AS BIGINT) AS cnt
       |      FROM e GROUP BY v),
       |ecv AS (SELECT rep, v, cnt, list_inner_product(v, v) AS vv FROM ec),
       |kk AS (SELECT GREATEST($KmeansMinK,
       |         CAST(ceil(sqrt(CAST(COUNT(*) AS DOUBLE))) AS INT)) AS k FROM ec),
       |c0 AS (SELECT CAST(rn - 1 AS INT) AS cl, v AS c
       |       FROM (SELECT v, row_number() OVER (ORDER BY vec_id) AS rn FROM e)
       |       CROSS JOIN kk WHERE rn <= kk.k),
       |$iters""".stripMargin
  }

  val embedKmeansSql: String =
    s"""$kmeansPrefixSql,
       |df AS (SELECT ev.vec_id, c.cl,
       |  ev.vv - 2.0 * list_inner_product(ev.v, c.c) + list_inner_product(c.c, c.c) AS d
       |  FROM ev CROSS JOIN c$KmeansIters c)
       |SELECT vec_id, cl AS cluster, round(d, 6) AS dist2
       |FROM (SELECT vec_id, cl, d, row_number() OVER (PARTITION BY vec_id ORDER BY d, cl) AS rn FROM df)
       |WHERE rn = 1 ORDER BY vec_id""".stripMargin

  def dedupSemantic(s: SparkSession, dir: String): DataFrame =
    Clustering.semanticDedupAdaptive(embDouble(s, dir), "vec_id", "v",
        KmeansIters, PipelineQueries.CosineThreshold, KmeansMinK)
      .orderBy("vec_id")

  val dedupSemanticSql: String =
    s"""$kmeansPrefixSql,
       |fin AS (SELECT vec_id, cl FROM (
       |  SELECT ev.vec_id, c.cl, row_number() OVER (PARTITION BY ev.vec_id ORDER BY
       |    ev.vv - 2.0 * list_inner_product(ev.v, c.c) + list_inner_product(c.c, c.c), c.cl) AS rn
       |  FROM ev CROSS JOIN c$KmeansIters c) WHERE rn = 1),
       |drp AS (SELECT DISTINCT r.vec_id AS b
       |        FROM fin l JOIN fin r ON l.cl = r.cl AND l.vec_id < r.vec_id
       |        JOIN e ea ON ea.vec_id = l.vec_id JOIN e eb ON eb.vec_id = r.vec_id
       |        WHERE round(list_cosine_similarity(ea.v, eb.v), 6) >= ${PipelineQueries.CosineThreshold})
       |SELECT fin.vec_id, fin.cl AS cluster, (drp.b IS NOT NULL) AS dropped
       |FROM fin LEFT JOIN drp ON fin.vec_id = drp.b ORDER BY fin.vec_id""".stripMargin

  // ---- Z-order layout audit ----------------------------------------------
  val ZBits = 8

  /** Per-z-cell occupancy + raw-key min/max: the data-skipping evidence
    * (each top-level z-cell covers ~1/16 of EACH key's range, so a filter
    * on either key prunes ~15/16 of the files a range-partitioned layout
    * would produce). Bounds come from one scalar aggregate, like the SQL's
    * scalar subqueries.
    */
  def zorderLayout(s: SparkSession, dir: String): DataFrame = {
    val li = Queries.table(s, dir, "lineitem").select(col("l_partkey"), col("l_orderkey"))
    val b = li.agg(min("l_partkey").cast("long"), max("l_partkey").cast("long"),
      min("l_orderkey").cast("long"), max("l_orderkey").cast("long")).head()
    Layout.zkey(li, "l_partkey", "l_orderkey",
        b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3), ZBits)
      .groupBy(shiftright(col("zkey"), ZBits).as("zcell"))
      .agg(count(lit(1)).as("n"),
        min("l_partkey").as("min_pk"), max("l_partkey").as("max_pk"),
        min("l_orderkey").as("min_ok"), max("l_orderkey").as("max_ok"))
      .orderBy("zcell")
  }

  val zorderLayoutSql: String =
    s"""WITH b AS (SELECT CAST(MIN(l_partkey) AS BIGINT) AS xmn, CAST(MAX(l_partkey) AS BIGINT) AS xmx,
       |    CAST(MIN(l_orderkey) AS BIGINT) AS ymn, CAST(MAX(l_orderkey) AS BIGINT) AS ymx FROM lineitem),
       |c AS (SELECT l_partkey, l_orderkey,
       |    ${Layout.cellSqlRef("l_partkey", "xmn", "xmx", ZBits)} AS px,
       |    ${Layout.cellSqlRef("l_orderkey", "ymn", "ymx", ZBits)} AS py
       |  FROM lineitem CROSS JOIN b),
       |zk AS (SELECT l_partkey, l_orderkey, ${Layout.mortonSql("px", "py", ZBits)} AS zkey FROM c)
       |SELECT zkey >> $ZBits AS zcell, COUNT(*) AS n,
       |  MIN(l_partkey) AS min_pk, MAX(l_partkey) AS max_pk,
       |  MIN(l_orderkey) AS min_ok, MAX(l_orderkey) AS max_ok
       |FROM zk GROUP BY 1 ORDER BY zcell""".stripMargin

  // ---- exactly-k per-group sample ----------------------------------------
  val GroupTopKK = 5
  val GroupTopKSalt = "gtopk"

  def sampleGroupTopk(s: SparkSession, dir: String): DataFrame =
    Sampling.groupTopK(
        Queries.table(s, dir, "documents").select(col("doc_id"), col("lang")),
        col("doc_id"), col("lang"), GroupTopKK, GroupTopKSalt)
      .orderBy("doc_id")

  val sampleGroupTopkSql: String =
    s"""WITH r AS (SELECT doc_id, lang,
       |    row_number() OVER (PARTITION BY lang
       |      ORDER BY ${Sampling.bucketOfSql("doc_id", GroupTopKSalt)}, doc_id) AS rk
       |  FROM documents)
       |SELECT doc_id, lang FROM r WHERE rk <= $GroupTopKK ORDER BY doc_id""".stripMargin

  // ---- bloom-filter join pruning -----------------------------------------
  /** Customers with at least one order, computed as bloom-prune (probe-side
    * filter BEFORE the exchange) + exact semi-join. False positives are
    * dropped by the join, so the result is identical to the plain
    * semi-join the oracle runs — which is the point: the bloom is a
    * runtime filter, not an approximation of the answer.
    */
  def bloomPruneJoin(s: SparkSession, dir: String): DataFrame = {
    val orders = Queries.table(s, dir, "orders").select(col("o_custkey"))
    val bits = Sketches.bloomBuild(orders, col("o_custkey").cast("string"))
    Queries.table(s, dir, "customer").select(col("c_custkey"), col("c_name"))
      .where(Sketches.bloomMightContain(bits, col("c_custkey").cast("string")))
      .join(orders, col("c_custkey") === col("o_custkey"), "left_semi")
      .orderBy("c_custkey")
  }

  val bloomPruneJoinSql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE c_custkey IN (SELECT o_custkey FROM orders) ORDER BY c_custkey""".stripMargin
}
