package graft

import graft.operators.{SeriesOps, TextAnalysis}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-4 extended operator surface: derived time series (rates, moving
  * averages — the fetch-side transforms a Graphite-style web layer computes
  * on the reference's stored series), semi-structured property extraction,
  * OLAP rollup totals, TF-IDF term scoring, and Unicode canonicalization —
  * each oracle-checked like the core queries.
  */
object AnalyticsQueries {

  // ---- per-key rate (non-negative derivative) ---------------------------
  /** Per-user per-second rate of `value` between consecutive events, counter
    * resets clamped to 0 — one shuffle on user_id, linear lag scan within.
    * µs domain (ts DIV 1000) so the oracle sees identical timestamps.
    */
  def tsRate(s: SparkSession, dir: String): DataFrame = {
    val ev = Queries.events(s, dir).select(
      col("event_id"), col("user_id"), expr("ts DIV 1000").as("us"), col("value"))
    SeriesOps.rate(ev, Seq("user_id"), "us", "value", Seq("us", "event_id"))
      .select(col("event_id"), col("user_id"), col("us"), col("value"),
        col("prev_us"), col("rate_ps"))
      .orderBy("event_id")
  }

  val tsRateSql: String =
    """WITH ev AS (SELECT event_id, user_id, epoch_us(ts) AS us, value FROM events),
      |l AS (SELECT event_id, user_id, us, value,
      |        lag(us) OVER w AS prev_us, lag(value) OVER w AS prev_v
      |      FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id))
      |SELECT event_id, user_id, us, value, prev_us,
      |       CASE WHEN prev_us IS NOT NULL AND us - prev_us > 0
      |            THEN round(greatest(value - prev_v, 0.0) * 1000000.0
      |                       / CAST(us - prev_us AS DOUBLE), 6)
      |       END AS rate_ps
      |FROM l ORDER BY event_id""".stripMargin

  // ---- trailing moving average over the rollup --------------------------
  /** 10-minute trailing mean per metric over the 60s sum rollup: the range
    * frame runs over SLOTS (bounded rows per metric), never raw points;
    * sums travel as decimals so the mean is bit-identical across engines
    * and partitionings. Frame = [ts-540, ts] — ten 60s slots inclusive.
    */
  val MavgStep = 60L
  val MavgRange = 540L

  def tsMovingAvg(s: SparkSession, dir: String): DataFrame = {
    val roll = Queries.metricStream(s, dir)
      .groupBy(col("metric"), Queries.alignSec(MavgStep))
      .agg(sum(col("value").cast("decimal(18,2)")).as("sv"), count(lit(1)).as("n"))
    SeriesOps.movingAvg(roll, Seq("metric"), "ts", "sv", "n", MavgRange)
      .select(col("metric"), col("ts"), col("n"), col("mov_n"), col("mavg"))
      .orderBy("metric", "ts")
  }

  val tsMovingAvgSql: String =
    s"""WITH r AS (SELECT metric, ${Queries.alignSecSql(MavgStep)} AS ts,
       |             SUM(CAST(value AS DECIMAL(18,2))) AS sv, COUNT(*) AS n
       |           FROM (${Queries.MetricBaseSql}) GROUP BY 1, 2)
       |SELECT metric, ts, n, CAST(SUM(n) OVER w AS BIGINT) AS mov_n,
       |       round(CAST(SUM(sv) OVER w AS DOUBLE) / SUM(n) OVER w, 6) AS mavg
       |FROM r WINDOW w AS (PARTITION BY metric ORDER BY ts
       |  RANGE BETWEEN $MavgRange PRECEDING AND CURRENT ROW)
       |ORDER BY metric, ts""".stripMargin

  // ---- trailing z-score anomaly flags -----------------------------------
  val AnomRange = 540L
  val AnomZ = 2.0
  val AnomMinSlots = 3

  /** Slots deviating > 2σ from their own trailing-window baseline (window
    * ends at the previous slot so a spike can't damp its own baseline).
    * Decimal-exact sums/squared-sums; doubles only in the final closed
    * form (divide, IEEE-correctly-rounded sqrt, one compare).
    */
  def tsAnomaly(s: SparkSession, dir: String): DataFrame = {
    val v = col("value").cast("decimal(18,2)")
    val roll = Queries.metricStream(s, dir)
      .groupBy(col("metric"), Queries.alignSec(MavgStep))
      .agg(sum(v).as("sv"), sum(v * v).as("sq"), count(lit(1)).as("n"))
    SeriesOps.anomalyFlags(roll, Seq("metric"), "ts", "sv", "sq", "n",
      AnomRange, AnomZ, AnomMinSlots)
      .select(col("metric"), col("ts"), col("n"),
        col("base_mean"), col("base_std"), col("z"), col("is_anom"))
      .orderBy("metric", "ts")
  }

  val tsAnomalySql: String =
    s"""WITH r AS (SELECT metric, ${Queries.alignSecSql(MavgStep)} AS ts,
       |             SUM(CAST(value AS DECIMAL(18,2))) AS sv,
       |             SUM(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS sq,
       |             COUNT(*) AS n
       |           FROM (${Queries.MetricBaseSql}) GROUP BY 1, 2),
       |w AS (SELECT metric, ts, n, sv,
       |        SUM(n) OVER tw AS wn, SUM(sv) OVER tw AS ws, SUM(sq) OVER tw AS ws2
       |      FROM r WINDOW tw AS (PARTITION BY metric ORDER BY ts
       |        RANGE BETWEEN $AnomRange PRECEDING AND 1 PRECEDING)),
       |f AS (SELECT metric, ts, n,
       |        ws::DOUBLE / wn AS mean,
       |        sqrt((wn * ws2 - ws * ws)::DOUBLE / (wn * wn)::DOUBLE) AS std,
       |        sv::DOUBLE / n AS slot_mean, wn
       |      FROM w)
       |SELECT metric, ts, n,
       |  CASE WHEN wn >= $AnomMinSlots THEN round(mean, 6) END AS base_mean,
       |  CASE WHEN wn >= $AnomMinSlots THEN round(std, 6) END AS base_std,
       |  CASE WHEN wn >= $AnomMinSlots AND std > 0
       |       THEN round((slot_mean - mean) / std, 6) END AS z,
       |  CASE WHEN wn >= $AnomMinSlots AND std > 0
       |       THEN CAST(abs(slot_mean - mean) > CAST($AnomZ AS DOUBLE) * std AS INT) END AS is_anom
       |FROM f ORDER BY metric, ts""".stripMargin

  // ---- top-k series by windowed total -------------------------------------
  val TopSeriesK = 3

  /** The sortByTotal serving transform: the 3 heaviest metrics by exact
    * decimal total, with their full slot series and rank.
    */
  def tsTopkSeries(s: SparkSession, dir: String): DataFrame = {
    val roll = Queries.metricStream(s, dir)
      .groupBy(col("metric"), Queries.alignSec(MavgStep))
      .agg(sum(col("value").cast("decimal(18,2)")).as("sv"), count(lit(1)).as("n"))
    SeriesOps.topKByTotal(roll, "metric", "ts", "sv", TopSeriesK)
      .select(col("metric"), col("ts"), col("n"),
        col("sv").cast("double").as("slot_sum"),
        col("rank").as("rnk"), col("total"))
      .orderBy("rnk", "ts")
  }

  val tsTopkSeriesSql: String =
    s"""WITH r AS (SELECT metric, ${Queries.alignSecSql(MavgStep)} AS ts,
       |             SUM(CAST(value AS DECIMAL(18,2))) AS sv, COUNT(*) AS n
       |           FROM (${Queries.MetricBaseSql}) GROUP BY 1, 2),
       |t AS (SELECT metric, SUM(sv) AS total FROM r GROUP BY 1),
       |top AS (SELECT metric, total,
       |          ROW_NUMBER() OVER (ORDER BY total DESC, metric) AS rnk
       |        FROM t QUALIFY rnk <= $TopSeriesK)
       |SELECT r.metric, r.ts, r.n, CAST(r.sv AS DOUBLE) AS slot_sum,
       |       top.rnk, CAST(top.total AS DOUBLE) AS total
       |FROM r JOIN top USING (metric) ORDER BY rnk, ts""".stripMargin

  // ---- TF-IDF top terms --------------------------------------------------
  val TfidfK = 3

  def tfidfTopk(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.tfidfTopK(Queries.table(s, dir, "documents"), TfidfK)
      .orderBy("doc_id", "rnk")

  val tfidfTopkSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id,
       |         list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> len(x) > 0) AS t
       |  FROM documents),
       |pairs AS (SELECT doc_id, token, COUNT(*) AS tf
       |          FROM toks, unnest(t) AS u(token) GROUP BY 1, 2),
       |dft AS (SELECT token, COUNT(*) AS df FROM pairs GROUP BY 1),
       |nd AS (SELECT COUNT(*) AS n_docs FROM documents),
       |scored AS (
       |  SELECT p.doc_id, p.token, p.tf, d.df,
       |         round(p.tf * ln((n_docs + 1.0) / (d.df + 1.0)), 6) AS score
       |  FROM pairs p JOIN dft d USING (token), nd),
       |ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
       |             ORDER BY score DESC, token) AS rnk FROM scored)
       |SELECT doc_id, token, tf, df, score, rnk FROM ranked
       |WHERE rnk <= $TfidfK ORDER BY doc_id, rnk""".stripMargin

  // ---- JSON property extraction ------------------------------------------
  /** Typed aggregate over a JSON string column (the semi-structured side of
    * multimodal metadata): extract props.k per event and aggregate per type.
    * get_json_object is codegen'd; try_cast so a malformed row nulls out
    * instead of failing the job under ANSI mode.
    */
  def jsonPropsAgg(s: SparkSession, dir: String): DataFrame =
    Queries.events(s, dir)
      .withColumn("k", expr("try_cast(get_json_object(props, '$.k') AS BIGINT)"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), count(col("k")).as("n_k"),
        sum(col("k")).as("sum_k"), min(col("k")).as("min_k"), max(col("k")).as("max_k"),
        round(sum(col("k")).cast("double") / count(col("k")), 6).as("avg_k"))
      .orderBy("event_type")

  val jsonPropsAggSql: String =
    """WITH ev AS (SELECT event_type,
      |              TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      |            FROM events)
      |SELECT event_type, COUNT(*) AS n, COUNT(k) AS n_k,
      |       CAST(SUM(k) AS BIGINT) AS sum_k, MIN(k) AS min_k, MAX(k) AS max_k,
      |       round(CAST(SUM(k) AS DOUBLE) / COUNT(k), 6) AS avg_k
      |FROM ev GROUP BY 1 ORDER BY event_type""".stripMargin

  // ---- OLAP rollup (grouping sets) ----------------------------------------
  /** Revenue totals with subtotal and grand-total rows — the OLAP
    * aggregation family the reference lacks (SURVEY §2.4 "grouping sets:
    * not present").
    *
    * NOT expressed as Spark's native `rollup()`: that plans an Expand
    * operator which replicates EVERY RAW ROW once per grouping set (3x the
    * scan-side work here) before partial aggregation ever runs. Because
    * the aggregates are re-aggregable (decimal SUM of sums, SUM of
    * counts), the subtotal and grand-total levels derive from the BASE
    * GROUP table instead — one ordinary groupBy over the corpus, then two
    * aggregations over a handful of group rows. Decimal sums keep every
    * level bit-identical to the single-pass ROLLUP the oracle runs.
    * (Measured at the 10x corpus: 7.8s -> 1.3s; the saved 2x scan work
    * scales with the corpus while the re-agg side stays group-bounded.)
    */
  def olapRollup(s: SparkSession, dir: String): DataFrame = {
    val revDec = sum(Queries.decPrice(col("l_extendedprice"))
      * (lit(1).cast("decimal(3,2)") - Queries.decRate(col("l_discount"))))
    val base = Queries.table(s, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(revDec.as("__rev"), count(lit(1)).as("n"))
    val leaf = base.select(
      col("l_returnflag").as("flag"), col("l_linestatus").as("status"),
      lit(0).as("g_flag"), lit(0).as("g_status"), col("__rev"), col("n"))
    val sub = base.groupBy(col("l_returnflag"))
      .agg(sum(col("__rev")).as("__rev"), sum(col("n")).as("n"))
      .select(col("l_returnflag").as("flag"), lit("ALL").as("status"),
        lit(0).as("g_flag"), lit(1).as("g_status"), col("__rev"), col("n"))
    val grand = base
      .agg(sum(col("__rev")).as("__rev"), sum(col("n")).as("n"))
      .select(lit("ALL").as("flag"), lit("ALL").as("status"),
        lit(1).as("g_flag"), lit(1).as("g_status"), col("__rev"), col("n"))
    leaf.unionByName(sub).unionByName(grand)
      .select(col("flag"), col("status"), col("g_flag"), col("g_status"),
        col("__rev").cast("double").as("revenue"), col("n"))
      .orderBy("g_flag", "g_status", "flag", "status")
  }

  val olapRollupSql: String =
    """SELECT coalesce(l_returnflag, 'ALL') AS flag,
      |       coalesce(l_linestatus, 'ALL') AS status,
      |       CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
      |       CAST(GROUPING(l_linestatus) AS INT) AS g_status,
      |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
      |                * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue,
      |       COUNT(*) AS n
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY g_flag, g_status, flag, status""".stripMargin

  // ---- OLAP cube ----------------------------------------------------------
  /** Full CUBE over (returnflag, linestatus) — all four grouping sets, by
    * the same base-group derivation as [[olapRollup]]: Spark's cube() would
    * Expand every raw row 4x before partial aggregation; deriving the
    * flag-only, status-only, and grand totals from the base group table
    * re-aggregates a handful of rows instead. Decimal sum-of-sums keeps
    * every level bit-identical to the single-pass CUBE the oracle runs.
    */
  def olapCube(s: SparkSession, dir: String): DataFrame = {
    val revDec = sum(Queries.decPrice(col("l_extendedprice"))
      * (lit(1).cast("decimal(3,2)") - Queries.decRate(col("l_discount"))))
    val base = Queries.table(s, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(revDec.as("__rev"), count(lit(1)).as("n"))
    def level(flagCol: Column, statusCol: Column, gf: Int, gs: Int,
              grouped: DataFrame): DataFrame =
      grouped.select(flagCol.as("flag"), statusCol.as("status"),
        lit(gf).as("g_flag"), lit(gs).as("g_status"), col("__rev"), col("n"))
    val leaf = level(col("l_returnflag"), col("l_linestatus"), 0, 0, base)
    val byFlag = level(col("l_returnflag"), lit("ALL"), 0, 1,
      base.groupBy(col("l_returnflag"))
        .agg(sum(col("__rev")).as("__rev"), sum(col("n")).as("n")))
    val byStatus = level(lit("ALL"), col("l_linestatus"), 1, 0,
      base.groupBy(col("l_linestatus"))
        .agg(sum(col("__rev")).as("__rev"), sum(col("n")).as("n")))
    val grand = level(lit("ALL"), lit("ALL"), 1, 1,
      base.agg(sum(col("__rev")).as("__rev"), sum(col("n")).as("n")))
    leaf.unionByName(byFlag).unionByName(byStatus).unionByName(grand)
      .select(col("flag"), col("status"), col("g_flag"), col("g_status"),
        col("__rev").cast("double").as("revenue"), col("n"))
      .orderBy("g_flag", "g_status", "flag", "status")
  }

  val olapCubeSql: String =
    """SELECT coalesce(l_returnflag, 'ALL') AS flag,
      |       coalesce(l_linestatus, 'ALL') AS status,
      |       CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
      |       CAST(GROUPING(l_linestatus) AS INT) AS g_status,
      |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
      |                * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue,
      |       COUNT(*) AS n
      |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
      |ORDER BY g_flag, g_status, flag, status""".stripMargin

  // ---- Unicode canonicalization -------------------------------------------
  /** NFC-normalized fingerprint per document (pre-dedup canonicalization):
    * decomposed and precomposed spellings of the same text must hash
    * identically before any fingerprint/minhash operator sees them. The
    * kernel is a codegen Expression (functions/Normalize) with an
    * already-normalized fast path; unicode golden vectors live in the spec.
    */
  def textNormalize(s: SparkSession, dir: String): DataFrame =
    Queries.table(s, dir, "documents")
      .withColumn("__n", graft.functions.Normalize.nfc(col("text")))
      .select(col("doc_id"), md5(col("__n")).as("nfc_md5"),
        length(col("__n")).as("n_chars_nfc"),
        (col("__n") =!= col("text")).cast("int").as("changed"))
      .orderBy("doc_id")

  val textNormalizeSql: String =
    """WITH n AS (SELECT doc_id, text, nfc_normalize(text) AS nt FROM documents)
      |SELECT doc_id, md5(nt) AS nfc_md5, CAST(length(nt) AS INT) AS n_chars_nfc,
      |       CAST(nt <> text AS INT) AS changed
      |FROM n ORDER BY doc_id""".stripMargin
}
