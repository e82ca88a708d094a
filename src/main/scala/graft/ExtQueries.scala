package graft

import graft.operators.{Joins, Quantiles, Sampling, Similarity, Sketches, SkewAgg}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-2 extended operator surface: temporal joins, sketches, sampling,
  * and the IVF ANN scale path — each oracle-checked like the core queries.
  */
object ExtQueries {

  // ---- as-of join ------------------------------------------------------
  /** For every click, the user's most recent purchase at-or-before it
    * (backward as-of on the user key). One shuffle on user_id.
    */
  def asofJoin(s: SparkSession, dir: String): DataFrame = {
    // µs domain: DuckDB reads the nanos timestamps at µs precision, so the
    // oracle can only see floor(ns/1000) — mirror that exactly (no µs-level
    // collisions exist in the data, checked through sf0.1)
    val ev = Queries.events(s, dir).withColumn("us", expr("ts DIV 1000"))
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("us").as("click_us"), col("value").as("click_value"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("us"), col("value"))
    Joins.asOf(clicks, purchases, Seq("user_id"), "click_us", "us", Seq("us", "value"))
      .orderBy("user_id", "click_us")
  }

  val asofJoinSql: String =
    """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us, value FROM events),
      |u AS (
      |  SELECT user_id, us AS ts, 0 AS side, NULL::DOUBLE AS click_value,
      |         us AS r_us, value AS r_value
      |  FROM ev WHERE event_type = 'purchase'
      |  UNION ALL
      |  SELECT user_id, us, 1, value, NULL, NULL FROM ev WHERE event_type = 'click'),
      |w AS (SELECT user_id, ts, side, click_value,
      |        -- the winning right row travels as ONE struct (side=0-only, so
      |        -- the CASE is NULL for left rows), mirroring Joins.asOf: a NULL
      |        -- INSIDE a right value must be carried faithfully, never
      |        -- back-filled from an older row as independent per-column
      |        -- last_value(... IGNORE NULLS) would do. ('asof' is a DuckDB
      |        -- keyword — hence won_row.)
      |        last_value(CASE WHEN side = 0
      |            THEN struct_pack(r_us := r_us, r_value := r_value) END
      |          IGNORE NULLS) OVER win AS won_row
      |      FROM u
      |      -- (r_us, r_value NULLS FIRST) tie-break mirrors Joins.asOf's
      |      -- winning-row struct order (Spark sorts null fields first ASC)
      |      WINDOW win AS (PARTITION BY user_id
      |        ORDER BY ts, side, r_us, r_value NULLS FIRST ROWS UNBOUNDED PRECEDING))
      |SELECT user_id, ts AS click_us, click_value,
      |       struct_extract(won_row, 'r_us') AS asof_us,
      |       struct_extract(won_row, 'r_value') AS asof_value
      |FROM w WHERE side = 1 ORDER BY user_id, click_us""".stripMargin

  // ---- range join ------------------------------------------------------
  /** Clicks-before-error: for every error event, how many clicks (any user)
    * landed in the preceding 5 minutes. Keyless interval×point join via
    * bucket blocking; zero-count errors kept by re-joining counts to the
    * interval side.
    */
  val RangeWinUs: Long = 300L * 1000000L

  def rangeJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Queries.events(s, dir).withColumn("us", expr("ts DIV 1000"))
    val errs = ev.where(col("event_type") === "error")
      .select(col("event_id"), col("us").as("err_us"))
      .withColumn("lo", col("err_us") - RangeWinUs)
    val clicks = ev.where(col("event_type") === "click").select(col("us").as("click_us"))
    val hits = Joins.rangePoints(errs, clicks,
        col("lo"), col("err_us"), col("click_us"), RangeWinUs)
      .groupBy(col("event_id")).agg(count(lit(1)).as("n_clicks"))
    errs.select(col("event_id"), col("err_us"))
      .join(hits, Seq("event_id"), "left")
      .withColumn("n_clicks", coalesce(col("n_clicks"), lit(0L)))
      .orderBy("event_id")
  }

  val rangeJoinSql: String =
    s"""WITH ev AS (SELECT event_id, epoch_us(ts) AS us, event_type FROM events),
       |e AS (SELECT event_id, us AS err_us FROM ev WHERE event_type = 'error'),
       |c AS (SELECT us AS click_us FROM ev WHERE event_type = 'click')
       |SELECT e.event_id, e.err_us, COUNT(c.click_us) AS n_clicks
       |FROM e LEFT JOIN c
       |  ON c.click_us >= e.err_us - $RangeWinUs AND c.click_us < e.err_us
       |GROUP BY 1, 2 ORDER BY event_id""".stripMargin

  // ---- HLL approx distinct --------------------------------------------
  /** Per event type: HLL estimate of distinct users (small range, bias
    * correction active) and distinct event ids (raw estimator path), next
    * to the exact counts — the error is part of the checked output.
    */
  def hllDistinct(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Dedup
    val ev = Queries.events(s, dir)
    val g = Seq("event_type")
    // ONE events scan (r15; was 3 — one per register lane + the exact
    // lane). The distinct (event_type, lane, value) frame is a sufficient
    // statistic for everything downstream: HLL registers keep max(rank),
    // so registers over DISTINCT values are identical to registers over
    // all occurrences, and a row count over the distinct frame IS the
    // countDistinct (h is null iff the value was null, and countDistinct
    // skips nulls). md5 runs once per DISTINCT value instead of once per
    // occurrence. Cache lifetime is caller-owned (Bench/Verify/TimeOne
    // clearCache); size is one slim (type, lane, hash) row per distinct
    // value.
    val base = ev.select(col("event_type"),
        posexplode(array(col("user_id").cast("string"),
          col("event_id").cast("string"))).as(Seq("lane", "v")))
      .distinct()
      .select(col("event_type"), col("lane"), Dedup.h32(col("v")).as("h"))
      .cache()
    val users = Sketches.hllEstimate(
      Sketches.hllRegistersFromHash(base.where(col("lane") === 0), g, col("h")),
      g, "hll_users")
    val ids = Sketches.hllEstimate(
      Sketches.hllRegistersFromHash(base.where(col("lane") === 1), g, col("h")),
      g, "hll_events")
    val exact = base.groupBy(col("event_type"))
      .agg(sum(when(col("lane") === 0 && col("h").isNotNull, 1L).otherwise(0L)).as("n_users"),
        sum(when(col("lane") === 1 && col("h").isNotNull, 1L).otherwise(0L)).as("n_events"))
    exact.join(users, g).join(ids, g)
      .select(col("event_type"), col("n_users"), col("hll_users"),
        col("n_events"), col("hll_events"))
      .orderBy("event_type")
  }

  val hllDistinctSql: String = {
    val users = Sketches.hllEstimateSql("events", "event_type",
      "CAST(user_id AS VARCHAR)", "hll_users")
    val ids = Sketches.hllEstimateSql("events", "event_type",
      "CAST(event_id AS VARCHAR)", "hll_events")
    s"""WITH exact AS (SELECT event_type, COUNT(DISTINCT user_id) AS n_users,
       |                      COUNT(DISTINCT event_id) AS n_events
       |               FROM events GROUP BY 1),
       |hu AS $users,
       |he AS $ids
       |SELECT exact.event_type, n_users, hll_users, n_events, hll_events
       |FROM exact JOIN hu ON exact.event_type = hu.event_type
       |           JOIN he ON exact.event_type = he.event_type
       |ORDER BY exact.event_type""".stripMargin
  }

  // ---- IVF ANN ---------------------------------------------------------
  val IvfCentroids = 16
  val IvfProbe = 2

  def annIvf(s: SparkSession, dir: String): DataFrame = {
    // no spread() — the corpus redistributes on its cell id anyway
    val emb = Queries.table(s, dir, "embeddings")
    Similarity.ivfAnn(emb, emb.where(col("vec_id") < PipelineQueries.NumQueryVecs),
        PipelineQueries.KnnK, IvfCentroids, IvfProbe)
      .orderBy("query_id", "rank")
  }

  val annIvfSql: String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |cents AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < $IvfCentroids),
       |assign AS (
       |  SELECT vec_id, cid AS cell FROM (
       |    SELECT e.vec_id, c.cid,
       |           ROW_NUMBER() OVER (PARTITION BY e.vec_id
       |             ORDER BY list_cosine_similarity(e.v, c.cv) DESC, c.cid) AS rn
       |    FROM e CROSS JOIN cents c) WHERE rn = 1),
       |probe AS (
       |  SELECT query_id, cell FROM (
       |    SELECT e.vec_id AS query_id, c.cid AS cell,
       |           ROW_NUMBER() OVER (PARTITION BY e.vec_id
       |             ORDER BY list_cosine_similarity(e.v, c.cv) DESC, c.cid) AS rn
       |    FROM e CROSS JOIN cents c WHERE e.vec_id < ${PipelineQueries.NumQueryVecs})
       |  WHERE rn <= $IvfProbe),
       |cand AS (SELECT p.query_id, a.vec_id AS nbr_id
       |         FROM probe p JOIN assign a ON p.cell = a.cell AND p.query_id <> a.vec_id),
       |scored AS (SELECT cand.query_id, cand.nbr_id,
       |                  round(list_cosine_similarity(eq.v, ec.v), 6) AS cos
       |           FROM cand JOIN e eq ON cand.query_id = eq.vec_id
       |                     JOIN e ec ON cand.nbr_id = ec.vec_id),
       |ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |             ORDER BY cos DESC, nbr_id) AS rank FROM scored)
       |SELECT query_id, nbr_id, cos, rank FROM ranked WHERE rank <= ${PipelineQueries.KnnK}
       |ORDER BY query_id, rank""".stripMargin

  // ---- salted skew-safe rollup ----------------------------------------
  /** The 300s sum rollup computed through two-phase salted aggregation
    * (operators/SkewAgg): same oracle as ts_rollup_sum — decimal addition
    * is associative, so splitting each (metric, slot) into 16 salt
    * sub-groups and re-combining is bit-identical, while a hot metric's
    * rows now spread over 16 reducers instead of serializing on one.
    */
  val RollupSalts = 16

  def tsRollupSalted(s: SparkSession, dir: String): DataFrame =
    SkewAgg.saltedSumCount(Queries.metricStream(s, dir),
        Seq(col("metric"), Queries.alignSec(300)), Seq("metric", "ts"),
        col("value"), col("ns"), RollupSalts, "sum_value", "n")
      .orderBy("metric", "ts")

  val tsRollupSaltedSql: String = Queries.tsRollupSumSql

  // ---- count-min heavy hitters ----------------------------------------
  /** Per event type: top-K users by CMS-estimated event count, with the
    * exact count beside it (the CMS estimate is an upper bound; its error
    * is part of the checked output). Sketch state is mergeable by SUM like
    * the HLL register table; the probe joins the sketch, not the raw data.
    */
  val CmsTopK = 5

  def cmsHeavyHitters(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Queries.events(s, dir)
    val g = Seq("event_type")
    // ONE base aggregate feeds everything (r14): the sketch, the probe
    // items, and the exact lane all derive from the per-(event_type, user)
    // count, CACHED — column pruning specializes each lane's copy of the
    // aggregate differently (the probe lane drops n_exact), so without the
    // cache the "identical" subtrees don't exchange-reuse and events is
    // scanned three times. With it events is scanned ONCE, and the
    // sketch's 4 md5 probes run per DISTINCT user (weighted by n_exact —
    // bit-identical counts) instead of per event occurrence. Cache
    // lifetime is caller-owned (Bench/Verify/TimeOne clearCache), size is
    // one slim row per distinct (event_type, user).
    val exact = ev.groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("n_exact"))
      .cache()
    val base = exact.withColumn("u", col("user_id").cast("string"))
    val sketch = Sketches.cmsSketchWeighted(base, g, col("u"), col("n_exact"))
    val est = Sketches.cmsEstimate(sketch,
        base.select(col("event_type"), col("u")), g, col("u"), "est")
      .withColumn("user_id", col("item").cast("long")).drop("item")
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("est").desc, col("user_id").asc)
    est.join(exact, Seq("event_type", "user_id"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= CmsTopK)
      .select(col("event_type"), col("user_id"), col("est"), col("n_exact"), col("rank"))
      .orderBy("event_type", "rank")
  }

  val cmsHeavyHittersSql: String = {
    def probeRows(src: String): String =
      (0 until Sketches.CmsDepth).map { r =>
        s"SELECT event_type, u, $r AS row, ${Sketches.cmsBucketSql(r, "u")} AS bucket FROM $src"
      }.mkString(" UNION ALL ")
    s"""WITH ev AS (SELECT event_type, user_id, CAST(user_id AS VARCHAR) AS u FROM events),
       |state AS (SELECT event_type, row, bucket, COUNT(*) AS c
       |          FROM (${probeRows("ev")}) GROUP BY 1, 2, 3),
       |items AS (SELECT DISTINCT event_type, u FROM ev),
       |probes AS (${probeRows("items")}),
       |est AS (SELECT p.event_type, CAST(p.u AS BIGINT) AS user_id, MIN(s.c) AS est
       |        FROM probes p JOIN state s
       |          ON p.event_type = s.event_type AND p.row = s.row AND p.bucket = s.bucket
       |        GROUP BY 1, 2),
       |exact AS (SELECT event_type, user_id, COUNT(*) AS n_exact FROM events GROUP BY 1, 2),
       |ranked AS (SELECT est.event_type, est.user_id, est, n_exact,
       |                  ROW_NUMBER() OVER (PARTITION BY est.event_type
       |                    ORDER BY est DESC, est.user_id) AS rank
       |           FROM est JOIN exact
       |             ON est.event_type = exact.event_type AND est.user_id = exact.user_id)
       |SELECT event_type, user_id, est, n_exact, rank FROM ranked
       |WHERE rank <= $CmsTopK ORDER BY event_type, rank""".stripMargin
  }

  // ---- exact grouped quantiles ----------------------------------------
  val QuantilePcts: Seq[Int] = Seq(25, 50, 75, 95)

  def quantileSummary(s: SparkSession, dir: String): DataFrame =
    Quantiles.groupQuantiles(Queries.events(s, dir), Seq("event_type"),
        col("value"), QuantilePcts)
      .orderBy("event_type")

  val quantileSummarySql: String =
    Quantiles.groupQuantilesSql("(SELECT event_type, value AS v FROM events)",
      "event_type", QuantilePcts) + " ORDER BY event_type"

  // ---- stratified sample ----------------------------------------------
  /** Rebalance the corpus: downsample the dominant language, keep the rest.
    * Deterministic hash sample — same rows on every engine/run/split.
    */
  val SampleRates: Seq[(String, Double)] = Seq("en" -> 0.25)
  val SampleDefaultRate = 0.8
  val SampleSalt = "smpl"

  def sampleStratified(s: SparkSession, dir: String): DataFrame =
    Sampling.stratified(Queries.table(s, dir, "documents"),
        col("doc_id"), col("lang"), SampleRates, SampleDefaultRate, SampleSalt)
      .select(col("doc_id"), col("lang"))
      .orderBy("doc_id")

  /** Length-proportional document sample: P(keep) = min(1, n_chars/600). */
  val WeightScale = 600L

  def sampleWeighted(s: SparkSession, dir: String): DataFrame =
    Sampling.weighted(Queries.table(s, dir, "documents"),
        col("doc_id"), col("n_chars"), WeightScale)
      .select(col("doc_id"), col("n_chars"))
      .orderBy("doc_id")

  val sampleWeightedSql: String =
    s"""SELECT doc_id, n_chars FROM documents
       |WHERE ${Sampling.weightedSql("doc_id", "n_chars", WeightScale)}
       |ORDER BY doc_id""".stripMargin

  val sampleStratifiedSql: String = {
    val b = Sampling.bucketOfSql("doc_id", SampleSalt)
    // reversed so a duplicated stratum key resolves like the Spark side's
    // nested when/otherwise foldLeft (LAST matching entry wins, not first)
    val thresh = SampleRates.reverse.foldRight(s"${(SampleDefaultRate * Sampling.Den).toLong}") {
      case ((k, r), acc) => s"CASE WHEN lang = '$k' THEN ${(r * Sampling.Den).toLong} ELSE $acc END"
    }
    s"""SELECT doc_id, lang FROM documents
       |WHERE $b < $thresh
       |ORDER BY doc_id""".stripMargin
  }
}
