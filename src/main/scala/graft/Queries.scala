package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The judged query surface: every operator from SURVEY.md §2 plus the
  * training-data pipeline operators, each as a (SparkSession, sfDir) =>
  * DataFrame paired with a DuckDB oracle in `oracle`.
  *
  * Determinism rules (so the DuckDB hash-compare is exact):
  *  - money math on DECIMAL (exact, associative) then CAST to DOUBLE;
  *  - event timestamps normalized to nanosecond longs at the source
  *    (schema-adaptive, see [[Queries.events]]), floored to epoch seconds
  *    with integer division;
  *  - every query ORDER BYs its full key set; aggregates aliased identically
  *    in Spark and SQL.
  */
object Queries {

  // ---- shared constants (UTC) ----
  val Now: Long = 1706659200L            // 2024-01-31 00:00:00, just past events range
  val GapFrom: Long = 1704412800L        // 2024-01-05
  val GapUntil: Long = 1705017600L       // 2024-01-12
  val HotLo: Long = 1705708800L          // 2024-01-20 (hot view start)
  val HistHi: Long = 1706140800L         // 2024-01-25 (history flushed through here)

  /** Default cascade (mirrors the reference's default schema:
    * conf/storage-schemas.conf.example:38-44): 10s:12h, 60s:2d, 300s:7d,
    * 15m:25w.
    */
  val Cascade: Seq[graft.core.Archive] = Seq(
    graft.core.Archive(10, 4320), graft.core.Archive(60, 2880),
    graft.core.Archive(300, 2016), graft.core.Archive(900, 16800))

  // ---- table readers ----
  def table(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Parallelism guard for hash/explode-heavy operators: the local test
    * files arrive as a single parquet split (one row group), which would
    * serialize CPU-bound per-row work (md5, shingling, vector math) on one
    * core. Fires only when the scan is under-split — at scale inputs have
    * >= defaultParallelism splits and this is a no-op, never a blind full
    * shuffle of a well-split corpus.
    */
  def spread(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }

  /** Epoch micros of a TIMESTAMP_NTZ wall clock interpreted as UTC, by pure
    * field extraction (days/hours/minutes + exact DECIMAL(8,6) seconds).
    * Every term is timezone-free — unlike `unix_micros(ntz)`, whose implicit
    * NTZ→TIMESTAMP cast routes through the session timezone and is only
    * exact when the session happens to be UTC.
    */
  def ntzEpochMicros(c: Column): Column =
    unix_date(c.cast("date")) * lit(86400000000L) +
      hour(c) * lit(3600000000L) + minute(c) * lit(60000000L) +
      (date_part(lit("SECOND"), c) * lit(1000000)).cast("long")

  /** Schema-adaptive events source: whatever parquet encoding `ts` arrives
    * in, downstream always sees a nanosecond *LongType* `ts` — ns longs give
    * exact last-write-wins ordering and exact second flooring (`ts DIV 1e9`).
    *
    *  - `LongType`: TIMESTAMP(NANOS) parquet read under
    *    `spark.sql.legacy.parquet.nanosAsLong=true` — already ns, pass through;
    *  - `TimestampType` (isAdjustedToUTC=true): an instant —
    *    `unix_micros` is timezone-free, ×1000 is exact;
    *  - `TimestampNTZType` (µs wall clock, e.g. pandas `timestamp[us]`):
    *    interpreted as UTC. Under a UTC session the NTZ→TIMESTAMP cast is
    *    the identity shift, so `unix_micros(cast)` is exact AND cheap (one
    *    codegen arithmetic op per row — the 100 TB scan path); under any
    *    other session timezone the cast would shift, so the plan falls
    *    back to [[ntzEpochMicros]] (~40% slower on a scan-bound rollup,
    *    measured at 10M rows, still exact).
    *
    * µs×1000 preserves ordering and LWW tie-breaks exactly; the DuckDB
    * oracle (`epoch_ns`) returns the same µs×1000, so hashes match for
    * every encoding.
    */
  def events(s: SparkSession, dir: String): DataFrame =
    eventsRange(s, dir, None, None)

  /** [[events]] with a [fromSec, untilSec) window expressed on the RAW
    * on-disk `ts` type BEFORE normalization — the predicate reaches the
    * parquet scan (`PushedFilters`: row-group/page pruning, the difference
    * between reading a day and reading 100 TB), where a filter on the
    * computed ns column cannot push past the projection. Second-aligned
    * bounds are exact against every encoding (ns ≥ f·1e9 ⇔ floor-sec ≥ f).
    */
  def eventsRange(s: SparkSession, dir: String,
                  fromSec: Option[Long], untilSec: Option[Long]): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = table(s, dir, "events")
    val dt = raw.schema("ts").dataType
    def bound(sec: Long): Column = dt match {
      case LongType      => lit(sec * 1000000000L)
      case TimestampType => timestamp_seconds(lit(sec))
      case TimestampNTZType =>
        // wall clock == the UTC rendering of the instant (tz-free literal)
        lit(java.time.LocalDateTime.ofEpochSecond(sec, 0, java.time.ZoneOffset.UTC))
      case other => throw new IllegalArgumentException(
        s"events.ts: unsupported type $other (expected ns-long, timestamp, or timestamp_ntz)")
    }
    val clamped = (fromSec, untilSec) match {
      case (Some(f), Some(u)) => raw.where(col("ts") >= bound(f) && col("ts") < bound(u))
      case (Some(f), None)    => raw.where(col("ts") >= bound(f))
      case (None, Some(u))    => raw.where(col("ts") < bound(u))
      case (None, None)       => raw
    }
    dt match {
      case LongType         => clamped
      case TimestampType    => clamped.withColumn("ts", unix_micros(col("ts")) * lit(1000L))
      case TimestampNTZType =>
        val sessionUtc = java.time.ZoneId.of(s.conf.get("spark.sql.session.timeZone"))
          .normalized() == java.time.ZoneOffset.UTC
        val micros =
          if (sessionUtc) unix_micros(col("ts").cast("timestamp"))
          else ntzEpochMicros(col("ts"))
        clamped.withColumn("ts", micros * lit(1000L))
      case other => throw new IllegalArgumentException(
        s"events.ts: unsupported type $other")
    }
  }

  /** Long-format metric stream view of events: (metric, ns, sec, value). */
  def metricStream(s: SparkSession, dir: String): DataFrame =
    metricStreamRange(s, dir, None, None)

  /** [[metricStream]] over [[eventsRange]]: the [fromSec, untilSec) window
    * prunes the scan itself. */
  def metricStreamRange(s: SparkSession, dir: String,
                        fromSec: Option[Long], untilSec: Option[Long]): DataFrame =
    eventsRange(s, dir, fromSec, untilSec).select(
      col("event_type").as("metric"),
      col("ts").as("ns"),
      expr("ts DIV 1000000000").as("sec"),
      col("value"))

  val MetricBaseSql: String =
    "SELECT event_type AS metric, epoch_ns(ts) AS ns, epoch_ns(ts) // 1000000000 AS sec, value FROM events"

  def alignSec(step: Long): Column = (col("sec") - pmod(col("sec"), lit(step))).as("ts")
  def alignSecSql(step: Long): String = s"sec - sec % $step"

  /** Exact mean: decimal sum cast to double, divided by count — identical
    * IEEE ops in Spark and DuckDB.
    */
  def exactAvg(c: Column): Column =
    sum(c.cast("decimal(18,2)")).cast("double") / count(lit(1))
  def exactAvgSql(c: String): String =
    s"CAST(SUM(CAST($c AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)"

  def exactSum(c: Column): Column = sum(c.cast("decimal(18,2)")).cast("double")
  def exactSumSql(c: String): String = s"CAST(SUM(CAST($c AS DECIMAL(18,2))) AS DOUBLE)"

  // =====================================================================
  // TSDB operators (SURVEY §2.2-§2.6) over the events metric stream
  // =====================================================================

  /** Align to the level-0 step and dedupe duplicate aligned slots,
    * last-write-wins by raw ns arrival (reference: kenshin/storage.py:429-445).
    */
  def tsAlignDedup(s: SparkSession, dir: String): DataFrame =
    metricStream(s, dir)
      .groupBy(col("metric"), alignSec(10))
      .agg(max_by(col("value"), col("ns")).as("value"))
      .orderBy("metric", "ts")

  val tsAlignDedupSql: String =
    s"""SELECT metric, ${alignSecSql(10)} AS ts, arg_max(value, ns) AS value
       |FROM ($MetricBaseSql) GROUP BY 1, 2 ORDER BY metric, ts""".stripMargin

  /** The five downsample aggregation methods (reference: kenshin/agg.py:10-16)
    * as tumbling-window rollups at various steps.
    */
  def tsRollupAvg(s: SparkSession, dir: String): DataFrame =
    metricStream(s, dir)
      .groupBy(col("metric"), alignSec(300))
      .agg(exactAvg(col("value")).as("avg_value"), count(lit(1)).as("n"))
      .orderBy("metric", "ts")

  val tsRollupAvgSql: String =
    s"""SELECT metric, ${alignSecSql(300)} AS ts, ${exactAvgSql("value")} AS avg_value, COUNT(*) AS n
       |FROM ($MetricBaseSql) GROUP BY 1, 2 ORDER BY metric, ts""".stripMargin

  def tsRollupSum(s: SparkSession, dir: String): DataFrame =
    metricStream(s, dir)
      .groupBy(col("metric"), alignSec(300))
      .agg(exactSum(col("value")).as("sum_value"), count(lit(1)).as("n"))
      .orderBy("metric", "ts")

  val tsRollupSumSql: String =
    s"""SELECT metric, ${alignSecSql(300)} AS ts, ${exactSumSql("value")} AS sum_value, COUNT(*) AS n
       |FROM ($MetricBaseSql) GROUP BY 1, 2 ORDER BY metric, ts""".stripMargin

  def tsRollupLast(s: SparkSession, dir: String): DataFrame =
    metricStream(s, dir)
      .groupBy(col("metric"), alignSec(60))
      .agg(max_by(col("value"), col("ns")).as("last_value"))
      .orderBy("metric", "ts")

  val tsRollupLastSql: String =
    s"""SELECT metric, ${alignSecSql(60)} AS ts, arg_max(value, ns) AS last_value
       |FROM ($MetricBaseSql) GROUP BY 1, 2 ORDER BY metric, ts""".stripMargin

  def tsRollupMinMax(s: SparkSession, dir: String): DataFrame =
    metricStream(s, dir)
      .groupBy(col("metric"), alignSec(600))
      .agg(min(col("value")).as("vmin"), max(col("value")).as("vmax"), count(lit(1)).as("n"))
      .orderBy("metric", "ts")

  val tsRollupMinMaxSql: String =
    s"""SELECT metric, ${alignSecSql(600)} AS ts, MIN(value) AS vmin, MAX(value) AS vmax, COUNT(*) AS n
       |FROM ($MetricBaseSql) GROUP BY 1, 2 ORDER BY metric, ts""".stripMargin

  /** Range fetch with dense-spine gap filling: every (metric, slot) in the
    * window materializes, absent slots as null (reference fetch:
    * kenshin/storage.py:650-693).
    */
  def tsGapfill(s: SparkSession, dir: String): DataFrame = {
    val ms = metricStream(s, dir)
    // window clamp on the raw scan (PushedFilters), not the derived sec
    val agg = metricStreamRange(s, dir, Some(GapFrom), Some(GapUntil))
      .groupBy(col("metric"), alignSec(600))
      .agg(exactAvg(col("value")).as("avg_value"))
    val spine = ms.select(col("metric")).distinct()
      .select(col("metric"),
        explode(sequence(lit(GapFrom), lit(GapUntil - 600), lit(600L))).as("ts"))
    spine.join(agg, Seq("metric", "ts"), "left")
      .select(col("metric"), col("ts"), col("avg_value"))
      .orderBy("metric", "ts")
  }

  val tsGapfillSql: String =
    s"""WITH base AS ($MetricBaseSql),
       |agg AS (
       |  SELECT metric, ${alignSecSql(600)} AS ts, ${exactAvgSql("value")} AS avg_value
       |  FROM base WHERE sec >= $GapFrom AND sec < $GapUntil GROUP BY 1, 2),
       |spine AS (
       |  SELECT m.metric, g.ts FROM (SELECT DISTINCT metric FROM base) m,
       |       generate_series($GapFrom, ${GapUntil - 600}, 600) g(ts))
       |SELECT spine.metric AS metric, spine.ts AS ts, agg.avg_value AS avg_value
       |FROM spine LEFT JOIN agg ON spine.metric = agg.metric AND spine.ts = agg.ts
       |ORDER BY spine.metric, spine.ts""".stripMargin

  /** Hot-view ∪ historical merge with hot-wins dedupe (reference cache/disk
    * stitch: rurouni/cache.py:161-169). History is flushed through HistHi;
    * the hot streaming state covers [HotLo, now) — overlap resolved in favor
    * of hot.
    */
  def tsCacheMerge(s: SparkSession, dir: String): DataFrame = {
    def lww60(df: DataFrame): DataFrame =
      df.groupBy(col("metric"), alignSec(60)).agg(max_by(col("value"), col("ns")).as("value"))
    // each side's window clamps its own scan (PushedFilters both reads)
    val hist = lww60(metricStreamRange(s, dir, None, Some(HistHi)))
    val hot = lww60(metricStreamRange(s, dir, Some(HotLo), None))
    graft.storage.TimeSeries.mergeHotHistorical(hot, hist).orderBy("metric", "ts")
  }

  val tsCacheMergeSql: String =
    s"""WITH base AS ($MetricBaseSql),
       |hist AS (SELECT metric, ${alignSecSql(60)} AS ts, arg_max(value, ns) AS value
       |         FROM base WHERE sec < $HistHi GROUP BY 1, 2),
       |hot AS (SELECT metric, ${alignSecSql(60)} AS ts, arg_max(value, ns) AS value
       |        FROM base WHERE sec >= $HotLo GROUP BY 1, 2)
       |SELECT * FROM (
       |  SELECT metric, ts, value FROM hist h
       |  WHERE NOT EXISTS (SELECT 1 FROM hot WHERE hot.metric = h.metric AND hot.ts = h.ts)
       |  UNION ALL SELECT metric, ts, value FROM hot)
       |ORDER BY metric, ts""".stripMargin

  /** The hot-cache serving view (the reference's cache query,
    * rurouni/protocols.py:79-84): LWW-aligned slots at the level-0 step for
    * everything past the flush watermark. IngestSpec pins this query to the
    * actual HotCache machinery: feeding the same events through
    * HotCache.processBatch with the boundary at HotLo yields exactly this
    * result.
    */
  def tsHotView(s: SparkSession, dir: String): DataFrame =
    metricStreamRange(s, dir, Some(HotLo), None)
      .groupBy(col("metric"), alignSec(10))
      .agg(max_by(col("value"), col("ns")).as("value"))
      .orderBy("metric", "ts")

  val tsHotViewSql: String =
    s"""SELECT metric, ${alignSecSql(10)} AS ts, arg_max(value, ns) AS value
       |FROM ($MetricBaseSql) WHERE sec >= $HotLo GROUP BY 1, 2 ORDER BY metric, ts""".stripMargin

  /** The metrics catalog derived from first sight — metric registration
    * order and volume (reference metric index: rurouni/cache.py:69-97,
    * registration rurouni/cache.py:112-151). This is the table fetch
    * spines read instead of scanning raw data for metric names.
    */
  def catalogSpine(s: SparkSession, dir: String): DataFrame =
    metricStream(s, dir)
      .groupBy(col("metric"))
      .agg(min(col("sec")).as("created_ts"), count(lit(1)).as("n_points"))
      .orderBy("metric")

  val catalogSpineSql: String =
    s"""SELECT metric, MIN(sec) AS created_ts, COUNT(*) AS n_points
       |FROM ($MetricBaseSql) GROUP BY 1 ORDER BY metric""".stripMargin

  /** Glob-tree series discovery (the graphite-web `metrics/find` analog —
    * the reference keeps a filesystem link tree exactly for this walk,
    * rurouni/storage.py:20-22,51-53; our catalog replaces it, §2.11): the
    * event namespace is synthesized into dotted paths of MIXED depth
    * (`app.<type>.u<k>` leaves, plus `….raw` below even-user nodes so u0
    * is leaf AND branch while u1 is leaf-only) and walked with a component
    * glob via [[graft.storage.SeriesFind.nodes]] — `{a,b}` alternation,
    * `[0-1]` class, leaf/branch flags per node.
    */
  val SeriesFindQuery = "app.{click,view,purchase}.u[0-1]"

  def seriesFind(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir).select(col("event_type"), col("user_id"))
    val u = pmod(col("user_id"), lit(4L)).cast("string")
    val names = ev
      .select(concat(lit("app."), col("event_type"), lit(".u"), u).as("metric"))
      .union(ev.where(pmod(col("user_id"), lit(2L)) === 0)
        .select(concat(lit("app."), col("event_type"), lit(".u"), u, lit(".raw")).as("metric")))
      .distinct()
    graft.storage.SeriesFind.nodes(names, SeriesFindQuery)
      .select(col("path"),
        col("leaf").cast("bigint").as("leaf"),
        col("branch").cast("bigint").as("branch"))
      .orderBy("path")
  }

  val seriesFindSql: String =
    """WITH names AS (
      |  SELECT 'app.' || event_type || '.u' || (user_id % 4) AS metric FROM events
      |  UNION
      |  SELECT 'app.' || event_type || '.u' || (user_id % 4) || '.raw' FROM events WHERE user_id % 2 = 0
      |),
      |parts AS (SELECT metric, string_split(metric, '.') AS p FROM names),
      |hits AS (
      |  SELECT p, len(p) AS n FROM parts
      |  WHERE len(p) >= 3
      |    AND regexp_matches(p[1], '^app$')
      |    AND regexp_matches(p[2], '^(?:click|view|purchase)$')
      |    AND regexp_matches(p[3], '^u[0-1]$'))
      |SELECT array_to_string(p[1:3], '.') AS path,
      |       CAST(MAX(CASE WHEN n = 3 THEN 1 ELSE 0 END) AS BIGINT) AS leaf,
      |       CAST(MAX(CASE WHEN n > 3 THEN 1 ELSE 0 END) AS BIGINT) AS branch
      |FROM hits GROUP BY 1 ORDER BY path""".stripMargin

  /** Blacklist/whitelist regex admin filter over the metric namespace
    * (reference: bin/kenshin-find-file.py:8-14,38-50 and
    * bin/kenshin-get-metrics.py:9-24 — include/exclude regex over metrics).
    * Patterns kept to syntax shared by Java regex and DuckDB RE2.
    */
  val BlacklistInclude = "^(purchase|error|signup)"
  val BlacklistExclude = "sign"

  def blacklistFilter(s: SparkSession, dir: String): DataFrame =
    metricStream(s, dir)
      .where(col("metric").rlike(BlacklistInclude) && !col("metric").rlike(BlacklistExclude))
      .groupBy(col("metric"))
      .agg(count(lit(1)).as("n"), exactSum(col("value")).as("sum_value"))
      .orderBy("metric")

  val blacklistFilterSql: String =
    s"""SELECT metric, COUNT(*) AS n, ${exactSumSql("value")} AS sum_value
       |FROM ($MetricBaseSql)
       |WHERE regexp_matches(metric, '$BlacklistInclude') AND NOT regexp_matches(metric, '$BlacklistExclude')
       |GROUP BY 1 ORDER BY metric""".stripMargin

  /** Time-aligned wide merge: K series pivoted to one row per slot with a
    * column per metric, null-padded where a series has no point — the
    * reference's merge_points for wide export (bin/kenshin-rehash.py
    * merge_points doctest; §2.3). Explicit pivot column list keeps the
    * output schema static (required both for Catalyst and the oracle).
    */
  val PivotMetrics: Seq[String] = Seq("click", "error", "purchase", "signup", "view")

  def pivotExport(s: SparkSession, dir: String): DataFrame =
    metricStream(s, dir)
      .groupBy(alignSec(600))
      .pivot("metric", PivotMetrics)
      .agg(exactAvg(col("value")))
      .orderBy("ts")

  val pivotExportSql: String = {
    val cols = PivotMetrics.map { m =>
      s"""CAST(SUM(CAST(value AS DECIMAL(18,2))) FILTER (metric = '$m') AS DOUBLE)
         | / COUNT(*) FILTER (metric = '$m') AS "$m"""".stripMargin
    }.mkString(", ")
    s"""SELECT ${alignSecSql(600)} AS ts, $cols
       |FROM ($MetricBaseSql) GROUP BY 1 ORDER BY ts""".stripMargin
  }

  /** Sliding-window rollup (beyond the reference — §2.5 notes tumbling only;
    * Spark's window(slide) gives this for free): 600s windows sliding every
    * 300s, so each point lands in exactly 2 windows. Output keyed by the
    * window start epoch.
    */
  def tsSlidingWindow(s: SparkSession, dir: String): DataFrame =
    metricStream(s, dir)
      .groupBy(col("metric"),
        window(timestamp_seconds(col("sec")), "600 seconds", "300 seconds"))
      .agg(exactAvg(col("value")).as("avg_value"), count(lit(1)).as("n"))
      .select(col("metric"), unix_timestamp(col("window.start")).as("ws"),
        col("avg_value"), col("n"))
      .orderBy("metric", "ws")

  val tsSlidingWindowSql: String =
    s"""SELECT metric, ${alignSecSql(300)} - o AS ws,
       |${exactAvgSql("value")} AS avg_value, COUNT(*) AS n
       |FROM ($MetricBaseSql) CROSS JOIN (VALUES (0), (300)) offsets(o)
       |GROUP BY 1, 2 ORDER BY metric, ws""".stripMargin

  /** Session windows (beyond the reference): activity sessions per metric
    * closed by a 30-minute silence gap. The oracle reproduces session
    * boundaries with a gaps-and-islands cumulative sum — pinning that
    * Spark's session_window semantics match the classical SQL construction.
    */
  val SessionGap: Long = 1800

  def tsSessionWindow(s: SparkSession, dir: String): DataFrame =
    metricStream(s, dir)
      .groupBy(col("metric"), session_window(timestamp_seconds(col("sec")), s"$SessionGap seconds"))
      .agg(count(lit(1)).as("n"), exactSum(col("value")).as("sum_value"))
      .select(col("metric"),
        unix_timestamp(col("session_window.start")).as("session_start"),
        col("n"), col("sum_value"))
      .orderBy("metric", "session_start")

  val tsSessionWindowSql: String =
    s"""WITH base AS ($MetricBaseSql),
       |marked AS (
       |  SELECT metric, sec, ns, value,
       |         CASE WHEN sec - LAG(sec) OVER (PARTITION BY metric ORDER BY sec, ns) > $SessionGap
       |              THEN 1 ELSE 0 END AS new_session
       |  FROM base),
       |islands AS (
       |  SELECT metric, sec, value,
       |         SUM(new_session) OVER (PARTITION BY metric ORDER BY sec, ns
       |                                ROWS UNBOUNDED PRECEDING) AS session_id
       |  FROM marked)
       |SELECT metric, MIN(sec) AS session_start, COUNT(*) AS n, ${exactSumSql("value")} AS sum_value
       |FROM islands GROUP BY metric, session_id ORDER BY metric, session_start""".stripMargin

  /** Age-based cascade routing: each point lands in the finest archive whose
    * retention covers its age; older than all -> level -1 / dropped
    * (reference: kenshin/storage.py:397-419).
    */
  def tsAgeRoute(s: SparkSession, dir: String): DataFrame = {
    val ms = metricStream(s, dir)
    val routed = graft.storage.TimeSeries.ageRoute(
      ms.select(col("metric"), col("sec").as("ts"), col("value")), Cascade, Now)
    routed.groupBy(col("metric"), col("level"))
      .agg(count(lit(1)).as("n"), min(col("ts")).as("min_ts"), max(col("ts")).as("max_ts"))
      .orderBy("metric", "level")
  }

  val tsAgeRouteSql: String = {
    val cases = Cascade.zipWithIndex
      .map { case (a, i) => s"WHEN $Now - sec <= ${a.retention} THEN $i" }
      .mkString(" ")
    s"""SELECT metric, CASE $cases ELSE -1 END AS level,
       |COUNT(*) AS n, MIN(sec) AS min_ts, MAX(sec) AS max_ts
       |FROM ($MetricBaseSql) GROUP BY 1, 2 ORDER BY metric, level""".stripMargin
  }

  /** Flagship fetch: window clamp + archive selection (coarser data answers
    * older queries: kenshin/storage.py:639-642) + rollup at the selected
    * step + gap-fill. from = now-6d selects the 300s:7d level.
    */
  val FetchFrom: Long = Now - 518400 // now - 6d
  val FetchUntil: Long = Now - 86400 // now - 1d
  val FetchLevel: Int = graft.storage.TimeSeries.selectArchive(Cascade, FetchFrom, Now)
  val FetchStep: Int = Cascade(FetchLevel).secondsPerPoint
  require(FetchLevel == 2 && FetchStep == 300, s"archive selection changed: $FetchLevel/$FetchStep")

  def tsFetchArchive(s: SparkSession, dir: String): DataFrame = {
    val (from, until) = graft.storage.TimeSeries
      .clampWindow(FetchFrom, FetchUntil, Now, Cascade.map(_.retention).max).get
    val f = graft.storage.TimeSeries.roundup(from, FetchStep)
    val u = graft.storage.TimeSeries.roundup(until, FetchStep)
    val ms = metricStream(s, dir)
    val agg = metricStreamRange(s, dir, Some(f), Some(u))
      .groupBy(col("metric"), alignSec(FetchStep))
      .agg(exactAvg(col("value")).as("value"))
    val spine = ms.select(col("metric")).distinct()
      .select(col("metric"),
        explode(sequence(lit(f), lit(u - FetchStep), lit(FetchStep.toLong))).as("ts"))
    spine.join(agg, Seq("metric", "ts"), "left")
      .select(col("metric"), col("ts"), col("value"))
      .orderBy("metric", "ts")
  }

  val tsFetchArchiveSql: String = {
    val f = graft.storage.TimeSeries.roundup(FetchFrom, FetchStep)
    val u = graft.storage.TimeSeries.roundup(FetchUntil, FetchStep)
    s"""WITH base AS ($MetricBaseSql),
       |agg AS (
       |  SELECT metric, ${alignSecSql(FetchStep)} AS ts, ${exactAvgSql("value")} AS value
       |  FROM base WHERE sec >= $f AND sec < $u GROUP BY 1, 2),
       |spine AS (
       |  SELECT m.metric, g.ts FROM (SELECT DISTINCT metric FROM base) m,
       |       generate_series($f, ${u - FetchStep}, $FetchStep) g(ts))
       |SELECT spine.metric AS metric, spine.ts AS ts, agg.value AS value
       |FROM spine LEFT JOIN agg ON spine.metric = agg.metric AND spine.ts = agg.ts
       |ORDER BY spine.metric, spine.ts""".stripMargin
  }

  /** fnv1a32 shard routing (reference: rurouni/utils.py:107-108). */
  def fnv1aShard(s: SparkSession, dir: String): DataFrame =
    metricStream(s, dir)
      .groupBy(col("metric"),
        pmod(graft.functions.Fnv1a.fnv1a32(col("metric")), lit(8)).as("shard"))
      .agg(count(lit(1)).as("n"))
      .orderBy("metric", "shard")

  /** The oracle computes fnv1a-32 INDEPENDENTLY in SQL — a list_reduce of
    * the FNV round over the metric's UTF-8 BYTES (extracted as hex pairs of
    * `hex(encode(metric))`, since DuckDB has no blob indexing) — so it
    * matches the byte-defined JVM hash on ANY metric name, ASCII or not
    * (round-11 ADVICE: the previous `ord(substr(...))` variant hashed
    * Unicode code points and would have diverged — a loud false FAIL — on a
    * non-ASCII name; verified byte-identical on 'zipf.é' and the driver
    * corpora). Unsigned `h % 8` equals the JVM's `floorMod(signedH, 8)`
    * because 8 divides 2^32. Cross-checked against the golden-vectored JVM
    * shards for all driver metrics plus zipf names.
    */
  val fnv1aShardSql: String =
    s"""WITH base AS ($MetricBaseSql),
       |hashed AS (
       |  SELECT metric,
       |    list_reduce(
       |      list_prepend(2166136261::BIGINT,
       |        list_transform(range(1, octet_length(encode(metric))+1),
       |                       i -> ('0x' || substr(hex(encode(metric)), 2*i-1, 2))::BIGINT)),
       |      (h, b) -> (xor(h, b) * 16777619) % 4294967296) % 8 AS shard
       |  FROM (SELECT DISTINCT metric FROM base))
       |SELECT b.metric AS metric, CAST(h.shard AS INTEGER) AS shard, COUNT(*) AS n
       |FROM base b JOIN hashed h ON b.metric = h.metric
       |GROUP BY 1, 2 ORDER BY metric, shard""".stripMargin

  // =====================================================================
  // Relational coverage (scans, joins, windows, set ops) on the star schema
  // =====================================================================

  private[graft] def decPrice(c: Column): Column = c.cast("decimal(12,2)")
  private[graft] def decRate(c: Column): Column = c.cast("decimal(3,2)")

  /** Pricing-summary aggregation (scan + filter + wide agg; decimal-exact). */
  def q1Pricing(s: SparkSession, dir: String): DataFrame =
    // no spread(): scan+agg queries partial-aggregate map-side, so only a
    // handful of group rows ever shuffle — a pre-repartition would move all
    // 16 columns of every row before the filter and agg drop them
    table(s, dir, "lineitem")
      .where(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1998-09-02 00:00:00")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(decPrice(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(decPrice(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        // scale-6 sums round (HALF_UP via round(), which both engines share
        // — decimal DOWNCAST does not: DuckDB's truncates) to their natural
        // 2 decimals IN DECIMAL SPACE before the double cast: an exact
        // 17-significant-digit decimal converts to double differently
        // across engines (DuckDB double-rounds via int128*10^-s) — 1-ULP
        // mismatch first seen at 10x-corpus magnitudes; at 13 digits the
        // conversion is exact
        round(sum(decPrice(col("l_extendedprice"))
            * (lit(1).cast("decimal(3,2)") - decRate(col("l_discount")))), 2)
          .cast("double").as("sum_disc_price"),
        round(sum(decPrice(col("l_extendedprice"))
            * (lit(1).cast("decimal(3,2)") - decRate(col("l_discount")))
            * (lit(1).cast("decimal(3,2)") + decRate(col("l_tax")))), 2)
          .cast("double").as("sum_charge"),
        (sum(decPrice(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
        (sum(decPrice(col("l_extendedprice"))).cast("double") / count(lit(1))).as("avg_price"),
        (sum(decRate(col("l_discount"))).cast("double") / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  val q1PricingSql: String =
    """SELECT l_returnflag, l_linestatus,
      |CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
      |CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))), 2) AS DOUBLE) AS sum_disc_price,
      |CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))) * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(3,2)))), 2) AS DOUBLE) AS sum_charge,
      |CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
      |CAST(SUM(CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
      |COUNT(*) AS count_order
      |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Shipping-priority join: customer ⋈ orders ⋈ lineitem, top-10 orders by
    * revenue (decimal-exact, deterministic tiebreak). No broadcast hint on
    * customer — it grows with scale factor (a fact-sized side at 100×); AQE
    * picks broadcast at runtime when the filtered side is actually small.
    */
  def q3Shipping(s: SparkSession, dir: String): DataFrame = {
    val cust = table(s, dir, "customer").where(col("c_mktsegment") === "BUILDING")
    val ord = table(s, dir, "orders")
      .where(col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1998-03-15 00:00:00")))
    val li = table(s, dir, "lineitem")
      .where(col("l_shipdate") > lit(java.sql.Timestamp.valueOf("1998-03-15 00:00:00")))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), unix_timestamp(col("o_orderdate")).as("o_orderdate_sec"), col("o_orderpriority"))
      .agg(sum(decPrice(col("l_extendedprice")) * (lit(1).cast("decimal(3,2)") - decRate(col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val q3ShippingSql: String =
    """SELECT l_orderkey, CAST(epoch(o_orderdate) AS BIGINT) AS o_orderdate_sec, o_orderpriority,
      |CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue
      |FROM customer, orders, lineitem
      |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00' AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
      |GROUP BY 1, 2, 3 ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  /** Local-supplier-volume: 6-way join. Broadcast hints only on the true
    * dimension tables (nation: 25 rows, region: 5 rows — fixed size at any
    * sf); customer/supplier grow with sf, so they shuffle-join and AQE may
    * still broadcast them at runtime when small enough.
    */
  def q5Region(s: SparkSession, dir: String): DataFrame = {
    val region = table(s, dir, "region").where(col("r_name") === "ASIA")
    val nation = table(s, dir, "nation")
    val cust = table(s, dir, "customer")
    val supp = table(s, dir, "supplier")
    val ord = table(s, dir, "orders")
      .where(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
        col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00")))
    val li = table(s, dir, "lineitem")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(supp,
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(decPrice(col("l_extendedprice")) * (lit(1).cast("decimal(3,2)") - decRate(col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy(col("n_name"))
  }

  val q5RegionSql: String =
    """SELECT n_name,
      |CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue
      |FROM customer, orders, lineitem, supplier, nation, region
      |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey AND l_suppkey = s_suppkey
      |  AND c_nationkey = s_nationkey AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |  AND r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** Window top-k: top-3 orders per customer (rank over partition). */
  def windowTopk(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice").desc, col("o_orderkey"))
    table(s, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
      .orderBy("o_custkey", "rn")
  }

  val windowTopkSql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |         ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders) t
      |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin

  /** Semi/anti joins: per market segment, customers with and without orders. */
  def semiAnti(s: SparkSession, dir: String): DataFrame = {
    val cust = table(s, dir, "customer")
    val ord = table(s, dir, "orders").select(col("o_custkey"))
    val withOrders = cust.join(ord, col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_with_orders"))
    val withoutOrders = cust.join(ord, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_without_orders"))
    withOrders.join(withoutOrders, Seq("c_mktsegment"), "full_outer")
      .select(col("c_mktsegment"),
        coalesce(col("n_with_orders"), lit(0L)).as("n_with_orders"),
        coalesce(col("n_without_orders"), lit(0L)).as("n_without_orders"))
      .orderBy("c_mktsegment")
  }

  val semiAntiSql: String =
    """WITH w AS (SELECT c_mktsegment, COUNT(*) AS n_with_orders FROM customer c
      |           WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      |           GROUP BY c_mktsegment),
      |     wo AS (SELECT c_mktsegment, COUNT(*) AS n_without_orders FROM customer c
      |            WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      |            GROUP BY c_mktsegment)
      |SELECT COALESCE(w.c_mktsegment, wo.c_mktsegment) AS c_mktsegment,
      |       COALESCE(n_with_orders, 0) AS n_with_orders,
      |       COALESCE(n_without_orders, 0) AS n_without_orders
      |FROM w FULL OUTER JOIN wo ON w.c_mktsegment = wo.c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  /** Set operations: big purchasers ∩ repeat signups, minus heavy-error
    * users (thresholds on exact decimal sums so both engines agree).
    */
  def setOps(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    def cohort(t: String, having: Column) = ev.where(col("event_type") === t)
      .groupBy(col("user_id")).agg(
        sum(col("value").cast("decimal(18,2)")).as("sv"), count(lit(1)).as("cnt"))
      .where(having).select(col("user_id"))
    val bigPurchasers = cohort("purchase", col("sv") > 300)
    val repeatSignups = cohort("signup", col("cnt") >= 2)
    val heavyErrors = cohort("error", col("sv") > 800)
    bigPurchasers.intersect(repeatSignups).except(heavyErrors).orderBy("user_id")
  }

  val setOpsSql: String =
    """SELECT * FROM (
      |  SELECT user_id FROM events WHERE event_type = 'purchase'
      |    GROUP BY 1 HAVING SUM(CAST(value AS DECIMAL(18,2))) > 300
      |  INTERSECT
      |  SELECT user_id FROM events WHERE event_type = 'signup'
      |    GROUP BY 1 HAVING COUNT(*) >= 2
      |  EXCEPT
      |  SELECT user_id FROM events WHERE event_type = 'error'
      |    GROUP BY 1 HAVING SUM(CAST(value AS DECIMAL(18,2))) > 800)
      |ORDER BY user_id""".stripMargin
}
