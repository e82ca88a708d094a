package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.serving.{TargetEval, TargetLang}

/** Judged queries for the render-target language (serving/TargetLang +
  * TargetEval): each parses a REAL graphite-style target string and
  * evaluates it through the full function pipeline over a series frame
  * derived from the events table — the end-to-end path a graphite-web
  * user exercises, not a hand-built equivalent plan.
  *
  * Determinism: the base frame and every aggregate in the evaluator
  * travel on the DECIMAL(18,2) lane (see Queries' rules); max/lag/count
  * are order-independent; the one floating multiply (scale) happens once
  * after the exact sum. So results hash-match DuckDB under any
  * partitioning.
  */
object TargetQueries {

  /** Shared step-aligned decimal sum-rollup over events: ONE definition of
    * the (metric, ts, value) frame shape every target query evaluates
    * over, parameterized by series naming and step so the dotted, tagged,
    * and hourly bases cannot drift apart.
    */
  private def rollupBase(s: SparkSession, dir: String,
                         nameCol: org.apache.spark.sql.Column, step: Long): DataFrame =
    Queries.events(s, dir)
      .select(nameCol.as("metric"),
        expr("ts DIV 1000000000").as("sec"),
        col("value"))
      .groupBy(col("metric"), Queries.alignSec(step))
      .agg(sum(col("value").cast("decimal(18,2)")).cast("double").as("value"))

  /** 60s sum-rollup series frame named `app.<event_type>.u<user_id%4>` —
    * the same synthetic namespace the series-find query uses, at the shape
    * `MetricStore.fetch` emits: (metric, ts, value) step-aligned.
    */
  def targetBase(s: SparkSession, dir: String): DataFrame =
    rollupBase(s, dir,
      concat(lit("app."), col("event_type"), lit(".u"),
        pmod(col("user_id"), lit(4L)).cast("string")), 60)

  val TargetBaseSql: String =
    """SELECT 'app.' || event_type || '.u' || (user_id % 4) AS metric,
      |       (epoch_ns(ts) // 1000000000) - ((epoch_ns(ts) // 1000000000) % 60) AS ts,
      |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value
      |FROM events GROUP BY 1, 2""".stripMargin

  private def globLeaves(e: graft.serving.TExpr): Int = e match {
    case graft.serving.TPath(_)     => 1
    case graft.serving.TCall(_, as) => as.map(globLeaves).sum
    case _                          => 0
  }

  private def evalOver(s: SparkSession, dir: String, target: String): DataFrame = {
    val ast = TargetLang.parse(target)
    val base0 = targetBase(s, dir)
    // r14: a multi-glob target (divideSeries ratio) evaluates the shared
    // rollup once PER GLOB LEAF — two full events scans + rollups for one
    // query. Cache it so the scan+rollup run once; single-leaf targets keep
    // the lazy frame so their glob filter can keep sinking below the
    // rollup's partial aggregation (cache would block that pushdown).
    // Bench/Verify clearCache() releases it per query.
    val base = if (globLeaves(ast) >= 2) base0.cache() else base0
    TargetEval.eval(ast, glob => TargetEval.globFilter(base, glob))
  }

  /** Combine + transform: glob-pruned cross-series sum, scaled — the
    * bread-and-butter render target (`scale(sumSeries(...),0.5)`). The
    * glob is selective (2 of 3 event types, 3 of 4 user shards) so the
    * oracle must reproduce the glob pruning too.
    */
  def tsTargetAgg(s: SparkSession, dir: String): DataFrame =
    evalOver(s, dir, "scale(sumSeries(app.{click,purchase}.u[0-2]),0.5)")
      .orderBy("ts")

  val tsTargetAggSql: String =
    s"""WITH base AS ($TargetBaseSql),
       |agg AS (
       |  SELECT ts, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) * CAST(0.5 AS DOUBLE) AS value
       |  FROM base
       |  WHERE regexp_matches(metric, '^app\\.(?:click|purchase)\\.u[0-2]$$')
       |  GROUP BY ts)
       |SELECT 'scale(sumSeries(app.{click,purchase}.u[0-2]),0.5)' AS metric, ts, value
       |FROM agg ORDER BY ts""".stripMargin

  /** Windowed transform chain: counter-style non-negative derivative over
    * a cross-series sum — lag per series, resets (negative deltas) and the
    * first point emitted as nulls, graphite-None semantics.
    */
  def tsTargetRate(s: SparkSession, dir: String): DataFrame =
    evalOver(s, dir, "nonNegativeDerivative(sumSeries(app.purchase.u*))")
      .orderBy("ts")

  val tsTargetRateSql: String =
    s"""WITH base AS ($TargetBaseSql),
       |s AS (
       |  SELECT ts, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value
       |  FROM base WHERE regexp_matches(metric, '^app\\.purchase\\.u[^.]*$$')
       |  GROUP BY ts),
       |d AS (SELECT ts, value - LAG(value) OVER (ORDER BY ts) AS delta FROM s)
       |SELECT 'nonNegativeDerivative(sumSeries(app.purchase.u*))' AS metric, ts,
       |       CASE WHEN delta >= 0 THEN delta END AS value
       |FROM d ORDER BY ts""".stripMargin

  /** Series arithmetic: the graphite ratio idiom (error rate, share-of-
    * total) — one summed series divided by another, missing/zero divisor
    * points yielding None. Both sums ride the decimal lane; the single
    * divide is one IEEE op, so the result is engine-exact.
    */
  def tsTargetRatio(s: SparkSession, dir: String): DataFrame =
    evalOver(s, dir, "divideSeries(sumSeries(app.purchase.u*),sumSeries(app.*.u*))")
      .orderBy("ts")

  val tsTargetRatioSql: String =
    s"""WITH base AS ($TargetBaseSql),
       |p AS (
       |  SELECT ts, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value
       |  FROM base WHERE regexp_matches(metric, '^app\\.purchase\\.u[^.]*$$')
       |  GROUP BY ts),
       |t AS (
       |  SELECT ts, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value
       |  FROM base WHERE regexp_matches(metric, '^app\\.[^.]*\\.u[^.]*$$')
       |  GROUP BY ts)
       |SELECT 'divideSeries(sumSeries(app.purchase.u*),sumSeries(app.*.u*))' AS metric,
       |       p.ts AS ts,
       |       CASE WHEN t.value IS NOT NULL AND t.value <> 0 THEN p.value / t.value END AS value
       |FROM p LEFT JOIN t ON p.ts = t.ts ORDER BY ts""".stripMargin

  /** Re-bucket + group: per-series hourly max (summarize), then averaged
    * across series sharing name node 1 (groupByNode) — the graphite
    * "summarize then group" idiom, including graphite's summarize
    * renaming (node 1 survives it, as graphite users rely on).
    */
  def tsTargetChain(s: SparkSession, dir: String): DataFrame =
    evalOver(s, dir, "groupByNode(summarize(app.*.u?,\"1h\",\"max\"),1,\"avg\")")
      .orderBy("metric", "ts")

  val tsTargetChainSql: String =
    s"""WITH base AS ($TargetBaseSql),
       |sm AS (
       |  SELECT metric, ts - (ts % 3600) AS ts, MAX(value) AS value
       |  FROM base WHERE regexp_matches(metric, '^app\\.[^.]*\\.u[^.]$$')
       |  GROUP BY 1, 2),
       |g AS (
       |  SELECT string_split(metric, '.')[2] AS metric, ts,
       |         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(value) AS value
       |  FROM sm GROUP BY 1, 2)
       |SELECT metric, ts, value FROM g ORDER BY metric, ts""".stripMargin

  /** Filter + windowed transform: keep series whose per-series average
    * clears a bar (averageAbove — a metric-partitioned window over ONE
    * pass of the input, not a second compute of the upstream rollup plus
    * a winner broadcast), then a 3-slot moving sum per surviving series.
    * Exactness: the average is decimal-sum / count and the comparison is
    * strict, so the winner set is engine-stable; the moving sum rides the
    * decimal lane with one cast at the end.
    */
  def tsTargetSelect(s: SparkSession, dir: String): DataFrame =
    evalOver(s, dir, "movingSum(averageAbove(app.*.u*,50),3)")
      .orderBy("metric", "ts")

  val tsTargetSelectSql: String =
    s"""WITH base AS ($TargetBaseSql),
       |winners AS (
       |  SELECT metric FROM base
       |  WHERE regexp_matches(metric, '^app\\.[^.]*\\.u[^.]*$$')
       |  GROUP BY metric
       |  HAVING CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(value) > 50),
       |f AS (SELECT b.* FROM base b JOIN winners w USING (metric)),
       |m AS (
       |  SELECT metric, ts,
       |         CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
       |           PARTITION BY metric ORDER BY ts
       |           ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS value
       |  FROM f)
       |SELECT 'movingSum(' || metric || ',3)' AS metric, ts, value
       |FROM m ORDER BY metric, ts""".stripMargin

  /** Wildcard aggregation + per-series rebase: collapse the user-shard
    * node (sumSeriesWithWildcards strips node 2), then subtract each
    * collapsed series' own minimum (offsetToZero — a whole-partition
    * window, no join). The stripped-name groupBy is the same one-shuffle
    * shape as groupByNode.
    */
  def tsTargetWild(s: SparkSession, dir: String): DataFrame =
    evalOver(s, dir, "offsetToZero(sumSeriesWithWildcards(app.*.u*,2))")
      .orderBy("metric", "ts")

  val tsTargetWildSql: String =
    s"""WITH base AS ($TargetBaseSql),
       |w AS (
       |  SELECT string_split(metric, '.')[1] || '.' || string_split(metric, '.')[2] AS metric,
       |         ts, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value
       |  FROM base WHERE regexp_matches(metric, '^app\\.[^.]*\\.u[^.]*$$')
       |  GROUP BY 1, 2),
       |o AS (
       |  SELECT metric, ts, value - MIN(value) OVER (PARTITION BY metric) AS value
       |  FROM w)
       |SELECT 'offsetToZero(' || metric || ')' AS metric, ts, value
       |FROM o ORDER BY metric, ts""".stripMargin

  /** Cross-series rank percentile: one synthesized series holding the
    * per-timestamp median (graphite's non-interpolating rank, ceil(p/100 *
    * (n+1)) clamped to [1,n]). At p=50 the float rank is exact ((n+1)/2 is
    * a half-integer, correctly-rounded division), so the oracle's integer
    * (n+2) DIV 2 is identical — the selected value is an input value, no
    * arithmetic to diverge.
    */
  def tsTargetPct(s: SparkSession, dir: String): DataFrame =
    evalOver(s, dir, "percentileOfSeries(app.*.u*,50)")
      .orderBy("ts")

  val tsTargetPctSql: String =
    s"""WITH base AS ($TargetBaseSql),
       |r AS (
       |  SELECT ts, value,
       |         ROW_NUMBER() OVER (PARTITION BY ts ORDER BY value) AS rn,
       |         COUNT(*) OVER (PARTITION BY ts) AS cnt
       |  FROM base WHERE value IS NOT NULL
       |    AND regexp_matches(metric, '^app\\.[^.]*\\.u[^.]*$$')),
       |p AS (
       |  SELECT ts, value FROM r
       |  WHERE rn = LEAST(GREATEST((cnt + 2) // 2, 1), cnt))
       |SELECT 'percentileOfSeries(app.*.u*,50)' AS metric, ts, value
       |FROM p ORDER BY ts""".stripMargin

  /** 60s sum-rollup frame in graphite's TAGGED naming (`name;k=v;...`,
    * keys in canonical sorted order): `req;shard=u<user_id%4>;
    * type=<event_type>` — the same series content as [[targetBase]],
    * carried as tags instead of path nodes.
    */
  def taggedBase(s: SparkSession, dir: String): DataFrame =
    rollupBase(s, dir,
      concat(lit("req;shard=u"), pmod(col("user_id"), lit(4L)).cast("string"),
        lit(";type="), col("event_type")), 60)

  val TaggedBaseSql: String =
    """SELECT 'req;shard=u' || (user_id % 4) || ';type=' || event_type AS metric,
      |       (epoch_ns(ts) // 1000000000) - ((epoch_ns(ts) // 1000000000) % 60) AS ts,
      |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value
      |FROM events GROUP BY 1, 2""".stripMargin

  /** The graphite 1.1+ tag-database family end-to-end: seriesByTag
    * discovery (exact + start-anchored-regex + not-equal specs over tags
    * carried in the series name), groupByTags aggregation (one shuffle,
    * exact decimal lane), aliasByTags rename — all through the real
    * parse→eval pipeline. The oracle mirrors the tag predicates on the
    * same tagged name construction.
    */
  def tsTargetTags(s: SparkSession, dir: String): DataFrame = {
    val base = taggedBase(s, dir)
    TargetEval.eval(
      TargetLang.parse(
        "aliasByTags(groupByTags(seriesByTag('name=req','type=~(?:click|purchase)','shard!=u3'),'sum','shard'),'shard','name')"),
      glob => TargetEval.globFilter(base, glob))
      .orderBy("metric", "ts")
  }

  val tsTargetTagsSql: String =
    s"""WITH base AS ($TaggedBaseSql),
       |f AS (
       |  SELECT regexp_extract(metric, ';shard=([^;]*)', 1) AS shard, ts, value
       |  FROM base
       |  WHERE string_split(metric, ';')[1] = 'req'
       |    AND regexp_matches(regexp_extract(metric, ';type=([^;]*)', 1),
       |                       '^(?:click|purchase)')
       |    AND regexp_extract(metric, ';shard=([^;]*)', 1) <> 'u3')
       |SELECT shard || '.req' AS metric, ts,
       |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value
       |FROM f GROUP BY 1, 2 ORDER BY metric, ts""".stripMargin

  /** Hourly sum-rollup frame for the Holt-Winters query: hourly slots keep
    * the inferred season (86400/step = 24) and the oracle's recursion depth
    * (~31 days of slots per series) both honest and bounded.
    */
  def hwBase(s: SparkSession, dir: String): DataFrame =
    rollupBase(s, dir,
      concat(lit("app."), col("event_type"), lit(".u"),
        pmod(col("user_id"), lit(4L)).cast("string")), 3600)

  val HwBaseSql: String =
    """SELECT 'app.' || event_type || '.u' || (user_id % 4) AS metric,
      |       (epoch_ns(ts) // 1000000000) - ((epoch_ns(ts) // 1000000000) % 3600) AS ts,
      |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value
      |FROM events GROUP BY 1, 2""".stripMargin

  /** The graphite alerting family through the real target pipeline:
    * holtWintersConfidenceBands over a glob-pruned hourly frame. The
    * sequential recurrence (serving/HoltWinters.analysis — graphite-web
    * functions.py holtWintersAnalysis semantics) is replayed in the oracle
    * as a DuckDB recursive CTE carrying (intercept, slope, season-length
    * seasonal/deviation FIFO lists) per series, term-for-term in the same
    * IEEE op order (only +,-,*,abs — all correctly rounded), so the hash
    * compare is bit-exact. Season is inferred from the data identically on
    * both sides (86400 / min positive ts delta per series).
    */
  def tsTargetHw(s: SparkSession, dir: String): DataFrame =
    TargetEval.eval(
      TargetLang.parse("holtWintersConfidenceBands(app.{click,purchase}.u[0-3])"),
      glob => TargetEval.globFilter(hwBase(s, dir), glob))
      .orderBy("metric", "ts")

  val tsTargetHwSql: String =
    s"""WITH RECURSIVE
       |hwbase AS MATERIALIZED (
       |  SELECT metric, ts, value FROM ($HwBaseSql)
       |  WHERE regexp_matches(metric, '^app\\.(?:click|purchase)\\.u[0-3]$$')),
       |slots AS MATERIALIZED (
       |  SELECT metric, ts, value,
       |         ROW_NUMBER() OVER (PARTITION BY metric ORDER BY ts) - 1 AS i
       |  FROM hwbase),
       |sn AS MATERIALIZED (
       |  SELECT m.metric,
       |         GREATEST(1, 86400 // GREATEST(1, COALESCE(d.step, 60))) AS season
       |  FROM (SELECT DISTINCT metric FROM slots) m
       |  LEFT JOIN (SELECT metric, MIN(d) AS step
       |             FROM (SELECT metric,
       |                          ts - LAG(ts) OVER (PARTITION BY metric ORDER BY ts) AS d
       |                   FROM slots)
       |             WHERE d > 0 GROUP BY metric) d USING (metric)),
       |rec AS (
       |  -- i = 0: ls/ld empty-history zeros; the first point predicts itself
       |  SELECT metric, i, ts, value, pred, dev, icpt, slope,
       |         icpt + slope +
       |           (CASE WHEN season = 1 THEN snl ELSE CAST(0 AS DOUBLE) END) AS npred,
       |         [snl] AS seas, [dev] AS devs, season
       |  FROM (
       |    SELECT metric, i, ts, value, pred, dev, icpt, season,
       |           CAST(0.0035 AS DOUBLE) * (icpt - value)
       |             + (CAST(1 AS DOUBLE) - CAST(0.0035 AS DOUBLE)) * CAST(0 AS DOUBLE) AS slope,
       |           CAST(0.1 AS DOUBLE) * (value - icpt)
       |             + (CAST(1 AS DOUBLE) - CAST(0.1 AS DOUBLE)) * CAST(0 AS DOUBLE) AS snl
       |    FROM (
       |      SELECT s.metric, s.i, s.ts, s.value,
       |             s.value AS pred,
       |             CAST(0.1 AS DOUBLE) * ABS(s.value - s.value)
       |               + (CAST(1 AS DOUBLE) - CAST(0.1 AS DOUBLE)) * CAST(0 AS DOUBLE) AS dev,
       |             CAST(0.1 AS DOUBLE) * (s.value - CAST(0 AS DOUBLE))
       |               + (CAST(1 AS DOUBLE) - CAST(0.1 AS DOUBLE)) * (s.value + CAST(0 AS DOUBLE)) AS icpt,
       |             n.season
       |      FROM slots s JOIN sn n ON n.metric = s.metric
       |      WHERE s.i = 0))
       |  UNION ALL
       |  SELECT metric, i, ts, value, pred, dev, icpt, slope,
       |         icpt + slope +
       |           (CASE WHEN len(nseas) = season THEN nseas[1] ELSE CAST(0 AS DOUBLE) END) AS npred,
       |         nseas AS seas, ndevs AS devs, season
       |  FROM (
       |    SELECT metric, i, ts, value, pred, dev, icpt, slope, season,
       |           list_append(CASE WHEN len(seas) = season THEN seas[2:] ELSE seas END, snl) AS nseas,
       |           list_append(CASE WHEN len(devs) = season THEN devs[2:] ELSE devs END, dev) AS ndevs
       |    FROM (
       |      SELECT metric, i, ts, value, pred,
       |             CAST(0.1 AS DOUBLE) * ABS(value - pred)
       |               + (CAST(1 AS DOUBLE) - CAST(0.1 AS DOUBLE)) * ld AS dev,
       |             icpt,
       |             CAST(0.0035 AS DOUBLE) * (icpt - licpt)
       |               + (CAST(1 AS DOUBLE) - CAST(0.0035 AS DOUBLE)) * lslope AS slope,
       |             CAST(0.1 AS DOUBLE) * (value - icpt)
       |               + (CAST(1 AS DOUBLE) - CAST(0.1 AS DOUBLE)) * ls AS snl,
       |             seas, devs, season
       |      FROM (
       |        SELECT s.metric, s.i, s.ts, s.value,
       |               r.npred AS pred,
       |               r.icpt AS licpt, r.slope AS lslope,
       |               CASE WHEN len(r.seas) = r.season THEN r.seas[1]
       |                    ELSE CAST(0 AS DOUBLE) END AS ls,
       |               CASE WHEN len(r.devs) = r.season THEN r.devs[1]
       |                    ELSE CAST(0 AS DOUBLE) END AS ld,
       |               CAST(0.1 AS DOUBLE) * (s.value -
       |                 CASE WHEN len(r.seas) = r.season THEN r.seas[1]
       |                      ELSE CAST(0 AS DOUBLE) END)
       |                 + (CAST(1 AS DOUBLE) - CAST(0.1 AS DOUBLE)) * (r.icpt + r.slope) AS icpt,
       |               r.seas, r.devs, r.season AS season
       |        FROM rec r JOIN slots s ON s.metric = r.metric AND s.i = r.i + 1)))),
       |hw AS MATERIALIZED (SELECT metric, ts, pred, dev FROM rec)
       |SELECT metric, ts, value FROM (
       |  SELECT 'holtWintersConfidenceUpper(' || metric || ')' AS metric, ts,
       |         pred + CAST(3 AS DOUBLE) * dev AS value FROM hw
       |  UNION ALL
       |  SELECT 'holtWintersConfidenceLower(' || metric || ')' AS metric, ts,
       |         pred - CAST(3 AS DOUBLE) * dev AS value FROM hw)
       |ORDER BY metric, ts""".stripMargin

  /** Exponential moving average through the real pipeline: window 6 slots,
    * c = 2/7, seeded with the first window's None-skipping mean, a gap
    * emits None with the state held. The oracle replays the recurrence as
    * a per-series recursive CTE in the identical IEEE op order
    * (c·v + (1−c)·ema, both factors written as the same literal division),
    * so the compare is bit-exact on the decimal-sourced doubles — the same
    * discipline as the Holt-Winters oracle.
    */
  def tsTargetEma(s: SparkSession, dir: String): DataFrame =
    evalOver(s, dir, "exponentialMovingAverage(app.purchase.u*,6)")
      .orderBy("metric", "ts")

  val tsTargetEmaSql: String =
    s"""WITH RECURSIVE
       |ebase AS MATERIALIZED (
       |  SELECT metric, ts, value FROM ($TargetBaseSql)
       |  WHERE regexp_matches(metric, '^app\\.purchase\\.u[^.]*$$')),
       |slots AS MATERIALIZED (
       |  SELECT metric, ts, value,
       |         ROW_NUMBER() OVER (PARTITION BY metric ORDER BY ts) - 1 AS i
       |  FROM ebase),
       |rec AS (
       |  -- state: (shead, chead) accumulate the first-6 seed window in slot
       |  -- order; ema is NULL until the seed lands at i = 5
       |  SELECT metric, i, ts, value,
       |         CASE WHEN value IS NOT NULL THEN value ELSE CAST(0 AS DOUBLE) END AS shead,
       |         CASE WHEN value IS NOT NULL THEN 1 ELSE 0 END AS chead,
       |         CAST(NULL AS DOUBLE) AS ema,
       |         CAST(NULL AS DOUBLE) AS outv
       |  FROM slots WHERE i = 0
       |  UNION ALL
       |  SELECT metric, i, ts, value, shead, chead, ema,
       |         CASE WHEN i = 5 THEN ema
       |              WHEN i > 5 AND value IS NOT NULL THEN ema END AS outv
       |  FROM (
       |    SELECT s.metric, s.i, s.ts, s.value,
       |           CASE WHEN s.i <= 5 AND s.value IS NOT NULL
       |                THEN r.shead + s.value ELSE r.shead END AS shead,
       |           CASE WHEN s.i <= 5 AND s.value IS NOT NULL
       |                THEN r.chead + 1 ELSE r.chead END AS chead,
       |           CASE
       |             WHEN s.i < 5 THEN CAST(NULL AS DOUBLE)
       |             WHEN s.i = 5 THEN
       |               CASE WHEN (CASE WHEN s.value IS NOT NULL THEN r.chead + 1 ELSE r.chead END) > 0
       |                    THEN (CASE WHEN s.value IS NOT NULL THEN r.shead + s.value ELSE r.shead END)
       |                         / (CASE WHEN s.value IS NOT NULL THEN r.chead + 1 ELSE r.chead END)
       |                    ELSE CAST(0 AS DOUBLE) END
       |             WHEN s.value IS NULL THEN r.ema
       |             ELSE (CAST(2 AS DOUBLE) / 7) * s.value
       |                  + (CAST(1 AS DOUBLE) - CAST(2 AS DOUBLE) / 7) * r.ema
       |           END AS ema
       |    FROM rec r JOIN slots s ON s.metric = r.metric AND s.i = r.i + 1))
       |SELECT 'exponentialMovingAverage(' || metric || ',6)' AS metric, ts,
       |       outv AS value
       |FROM rec ORDER BY metric, ts""".stripMargin

  /** The round's new transform families chained end-to-end: smartSummarize
    * (2h buckets anchored at the frame head, exact decimal sums) →
    * removeBelowValue (interior gaps) → interpolate (linear fill between
    * the surviving neighbors) → minMax (per-series [0,1] normalization).
    * Every float op after the exact sums is a fixed-order correctly-
    * rounded IEEE expression mirrored verbatim in the SQL, so the hash
    * compare needs no tolerance.
    */
  def tsTargetMix(s: SparkSession, dir: String): DataFrame =
    evalOver(s, dir,
      "minMax(interpolate(removeBelowValue(smartSummarize(app.{click,view}.u*,\"2h\",\"sum\"),100)))")
      .orderBy("metric", "ts")

  val tsTargetMixSql: String =
    s"""WITH
       |mbase AS MATERIALIZED (
       |  SELECT metric, ts, value FROM ($TargetBaseSql)
       |  WHERE regexp_matches(metric, '^app\\.(?:click|view)\\.u[^.]*$$')),
       |sm AS (
       |  SELECT metric,
       |         ts - ((ts - (SELECT MIN(ts) FROM mbase)) % 7200) AS ts,
       |         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value
       |  FROM mbase GROUP BY 1, 2),
       |rb AS (
       |  SELECT metric, ts,
       |         CASE WHEN value >= 100 THEN value END AS value
       |  FROM sm),
       |ix AS (
       |  SELECT metric, ts, value,
       |         ROW_NUMBER() OVER (PARTITION BY metric ORDER BY ts) AS rn
       |  FROM rb),
       |nb AS (
       |  SELECT metric, ts, value, rn,
       |         LAST_VALUE(CASE WHEN value IS NOT NULL THEN rn END IGNORE NULLS)
       |           OVER (PARTITION BY metric ORDER BY ts
       |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prn,
       |         LAST_VALUE(value IGNORE NULLS)
       |           OVER (PARTITION BY metric ORDER BY ts
       |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
       |         FIRST_VALUE(CASE WHEN value IS NOT NULL THEN rn END IGNORE NULLS)
       |           OVER (PARTITION BY metric ORDER BY ts
       |                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nrn,
       |         FIRST_VALUE(value IGNORE NULLS)
       |           OVER (PARTITION BY metric ORDER BY ts
       |                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv
       |  FROM ix),
       |itp AS (
       |  SELECT metric, ts,
       |         CASE WHEN value IS NOT NULL THEN value
       |              WHEN pv IS NOT NULL AND nv IS NOT NULL
       |              THEN pv + ((nv - pv) * (rn - prn)) / (nrn - prn) END AS value
       |  FROM nb),
       |mm AS (
       |  SELECT metric, ts, value,
       |         MIN(value) OVER (PARTITION BY metric) AS lo,
       |         MAX(value) OVER (PARTITION BY metric) AS hi
       |  FROM itp)
       |SELECT 'minMax(interpolate(removeBelowValue(smartSummarize(' || metric ||
       |       ',"2h","sum"),100)))' AS metric, ts,
       |       CASE WHEN value IS NOT NULL THEN
       |         CASE WHEN hi > lo THEN (value - lo) / (hi - lo)
       |              ELSE CAST(0 AS DOUBLE) END END AS value
       |FROM mm ORDER BY metric, ts""".stripMargin
}
