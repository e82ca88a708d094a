package graft.serving

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.RetentionParser
import graft.storage.SeriesFind

/** Compiles a parsed render target ([[TargetLang]]) onto ONE DataFrame
  * plan over step-aligned series frames `(metric: string, ts: bigint,
  * value: double?)` — the shape `MetricStore.fetch` / `HotCache
  * .fetchMerged` produce (nulls are gaps, graphite's None).
  *
  * The graphite-web function set this covers is the render-API core
  * (combine / transform / filter / alias families); evaluation semantics
  * follow graphite-web's documented behavior: cross-series aggregates skip
  * None, derivative emits None at resets (nonNegativeDerivative) and on
  * the first point, keepLastValue forward-fills, summarize re-buckets per
  * series. The reference deployment runs these in the web process, one
  * series at a time; here each function is a distributed transform.
  *
  * Scale posture:
  *  - cross-series aggregation (`sumSeries`, `groupByNode`) is a
  *    `groupBy(ts)` — map-side partial aggregation collapses the series
  *    fan-in per task, and the output is bounded by range/step slots, not
  *    by series count;
  *  - per-series transforms (derivative, movingAverage, integral,
  *    keepLastValue, summarize) partition by `metric` — series cardinality
  *    IS the parallelism, and each partition is a bounded slot scan
  *    (retention/step rows);
  *  - `highestAverage`-style selectors reduce to a k-row winner frame that
  *    is broadcast back — no driver-side collect of series data;
  *  - sums that must be exact across engines/partitionings travel as
  *    DECIMAL(18,2) (the repo-wide exact-money lane) and divide/scale once
  *    at the end.
  *
  * Everything here throws IllegalArgumentException on user error (unknown
  * function, bad arity/argument type) — the serving layer's 400 class.
  */
object TargetEval {

  /** Windowed fetch: (glob, extraHistorySec) -> step-aligned series frame.
    * `extraHistorySec` asks for that many extra seconds of history BEFORE
    * the render window's `from` (the holtWinters bootstrap re-fetch);
    * fetchers with no window clamp ignore it.
    */
  type WindowedFetch = (String, Long) => DataFrame

  /** Evaluate `expr` against `fetch`: glob -> step-aligned series frame.
    * The returned frame has the same (metric, ts, value) shape, with
    * function outputs named by the expression's canonical text. This
    * entry point has no render window, so holtWinters bootstrap re-fetch
    * and crop are no-ops (the caller already fetched all history it wants
    * analyzed — the judged-query path).
    */
  def eval(expr: TExpr, fetch: String => DataFrame): DataFrame =
    evalWindowed(expr, (g, _) => fetch(g), None)

  /** Serving-layer entry point: `cropFrom` is the render window's original
    * `from` — holtWinters functions evaluate their child with
    * `bootstrapInterval` (default 7d) of extra pre-window history via
    * `fetch`, then crop the analysis back to `ts >= cropFrom`, exactly
    * graphite-web's bootstrap semantics. `window`, when the caller has one,
    * is the full [from, until] render range — it only exists to give the
    * synthetic sources (constantLine / threshold / timeFunction) a time
    * axis; fetched data ignores it.
    */
  def evalWindowed(expr: TExpr, fetch: WindowedFetch, cropFrom: Option[Long],
                   extraHistory: Long = 0L,
                   window: Option[(Long, Long)] = None): DataFrame = expr match {
    case TPath(glob) => fetch(glob, extraHistory)
    case c: TCall    => evalCall(c, fetch, cropFrom, extraHistory, window)
    case other =>
      fail(s"'${other.canonical}' is not a series expression")
  }

  /** The reserved fetch glob meaning "every series": `seriesByTag` has no
    * path to glob (its filter is tag predicates over the fetched names),
    * so it fetches the full frame and filters in-plan. Fetchers built on
    * [[globFilter]] get this for free; bespoke fetchers must special-case
    * it the same way.
    */
  val MatchAllGlob = "**"

  /** Filter a series frame down to metrics matching a full-path glob
    * (`*` / `?` confined to one node, `{a,b}` and `[..]` as in find);
    * [[MatchAllGlob]] passes everything through.
    */
  def globFilter(df: DataFrame, glob: String): DataFrame =
    if (glob == MatchAllGlob) df
    else df.where(col("metric").rlike(pathRegex(glob)))

  /** Full-path glob -> anchored regex; pre-compiled so a malformed glob is
    * a client error at parse time, not an executor-time pattern failure.
    */
  def pathRegex(glob: String): String = {
    val re = SeriesFind.globToRegex(glob, "[^.]*", "[^.]")
    try { java.util.regex.Pattern.compile(re); () }
    catch {
      case e: java.util.regex.PatternSyntaxException =>
        fail(s"bad series glob '$glob': ${e.getMessage}")
    }
    re
  }

  /** Graphite-web maxDataPoints consolidation: re-bucket every series to
    * `bucketSec` tumbling buckets with the named consolidation method —
    * the serving-side guarantee that a year-long render ships a pixel
    * budget's worth of points, not range/step raw slots. Same aggregation
    * semantics (and decimal exact-sum lane) as summarize.
    */
  def consolidate(df: DataFrame, bucketSec: Long, method: String): DataFrame = {
    require(bucketSec > 0, s"consolidation bucket must be > 0, got $bucketSec")
    df.groupBy(col("metric"), (col("ts") - pmod(col("ts"), lit(bucketSec))).as("ts"))
      .agg(aggFor(method, col("value"), col("ts")).as("value"))
      .select(col("metric"), col("ts"), col("value").cast("double").as("value"))
  }

  /** The consolidation method pinned by the outermost consolidateBy call
    * in a target's AST, if any — the serving layer's maxDataPoints
    * consolidation honors it over the avg default (graphite's per-series
    * consolidationFunc).
    */
  def consolidationMethod(expr: TExpr): Option[String] = expr match {
    case TCall("consolidateBy", _ :: TStr(m) :: Nil) => Some(m)
    case TCall("cumulative", _) => Some("sum")
    case TCall(_, args) => args.iterator.flatMap(consolidationMethod).nextOption()
    case _ => None
  }

  /** The xFilesFactor pinned by a setXFilesFactor/xFilesFactor call in a
    * subtree, if any — graphite's setXFilesFactor sets `series
    * .xFilesFactor`, which the re-bucketing functions (summarize /
    * smartSummarize) then honor: a bucket whose non-None fraction falls
    * below the factor consolidates to None. The call itself is an
    * identity on the data (it neither renames nor transforms) — the
    * factor travels via this AST scan, exactly like consolidateBy's
    * method.
    */
  def xffOf(expr: TExpr): Option[Double] = expr match {
    case TCall("setXFilesFactor" | "xFilesFactor", args) =>
      // graphite coerces a quoted factor; any other shape is a loud
      // client error, never a silently ignored call
      val v = args match {
        case _ :: TNum(n, _) :: Nil => n
        case _ :: TStr(s) :: Nil =>
          try s.toDouble catch {
            case _: NumberFormatException =>
              throw new IllegalArgumentException(s"bad xFilesFactor '$s'")
          }
        case _ => throw new IllegalArgumentException(
          "setXFilesFactor expects (seriesList, factor)")
      }
      require(v >= 0 && v <= 1, s"xFilesFactor must be in [0,1], got $v")
      Some(v)
    case TCall(_, args) => args.iterator.flatMap(xffOf).nextOption()
    case _ => None
  }

  // ---- helpers ----------------------------------------------------------

  private def fail(msg: String): Nothing = throw new IllegalArgumentException(msg)

  /** Exact-sum lane (see Queries determinism rules). */
  private def dec(c: Column): Column = c.cast("decimal(18,2)")

  private def perSeries: org.apache.spark.sql.expressions.WindowSpec =
    Window.partitionBy(col("metric")).orderBy(col("ts"))

  /** Trailing window from graphite's `windowSize` argument, which is an
    * integer slot count OR a quoted time interval ('5min') — both appear
    * throughout the public function docs. Slots map to rowsBetween;
    * intervals map to rangeBetween over the step-aligned epoch-seconds
    * axis, which selects exactly interval/step trailing slots on a dense
    * frame when the interval is a multiple of the step (graphite's own
    * conversion) and stays honestly time-bounded when slots are missing
    * entirely.
    *
    * DOCUMENTED DIVERGENCE (non-multiple intervals): graphite converts the
    * interval to slots per series as `interval // step` (integer floor),
    * so '25s' over a 10s-step series means 2 trailing slots; the
    * time-range frame here covers [ts-interval+1, ts] = ceil(interval/
    * step) slots (3). A WindowSpec's range bounds are plan literals, so
    * the per-series floor conversion cannot ride one spec; the time-bound
    * is kept as the more honest reading of "a 25-second window".
    * TargetSpec pins both the multiple and the non-multiple behavior.
    */
  private def trailingWindow(arg: TExpr, fname: String): org.apache.spark.sql.expressions.WindowSpec =
    arg match {
      case TNum(v, _) if v == math.rint(v) && v > 0 =>
        perSeries.rowsBetween(-(v.toInt - 1).toLong, Window.currentRow)
      case TStr(s) =>
        val sec = seconds(s)
        require(sec > 0, s"$fname window must be a positive interval, got '$s'")
        perSeries.rangeBetween(-(sec - 1), Window.currentRow)
      case other => fail(
        s"$fname window: expected points or a time string, got '${other.canonical}'")
    }

  private def seriesW(e: TExpr, fetch: WindowedFetch, cropFrom: Option[Long],
                      extraHistory: Long,
                      window: Option[(Long, Long)] = None): DataFrame = e match {
    case TPath(_) | TCall(_, _) =>
      evalWindowed(e, fetch, cropFrom, extraHistory, window)
    case other => fail(s"expected a series expression, got '${other.canonical}'")
  }

  private def num(e: TExpr): Double = e match {
    case TNum(v, _) => v
    case other      => fail(s"expected a number, got '${other.canonical}'")
  }

  private def int(e: TExpr): Int = e match {
    case TNum(v, raw) if v == math.rint(v) => v.toInt
    case other => fail(s"expected an integer, got '${other.canonical}'")
  }

  private def str(e: TExpr): String = e match {
    case TStr(v) => v
    case other   => fail(s"expected a quoted string, got '${other.canonical}'")
  }

  /** "1h" / "90" / "+2d" / "-15min" -> signed seconds (retention units). */
  private def seconds(spec: String): Long = {
    val (sign, body) =
      if (spec.startsWith("-")) (-1L, spec.substring(1))
      else if (spec.startsWith("+")) (1L, spec.substring(1))
      else (1L, spec)
    try sign * RetentionParser.parseTimeStr(body)
    catch { case e: Exception => fail(s"bad time spec '$spec': ${e.getMessage}") }
  }

  /** Cross-series / cross-bucket aggregation column for a named method.
    * sum/avg take the decimal lane (exact under any partitioning); min/
    * max/count/last are order-independent already. `last` = value at the
    * max ts with a non-null value (graphite safeLast) — struct max orders
    * by ts first, and nulls are skipped by max itself.
    */
  private def aggFor(method: String, v: Column, ts: Column): Column = method match {
    case "sum"   => sum(dec(v)).cast("double")
    case "avg" | "average" =>
      sum(dec(v)).cast("double") / count(v)
    case "max"   => max(v)
    case "min"   => min(v)
    case "count" => count(v).cast("double")
    case "last"  => max(when(v.isNotNull, struct(ts, v))).getField("value")
    case other   => fail(s"unknown aggregation method '$other'")
  }

  /** Per-series statistic used by the filter (`averageAbove` family) and
    * select (`highestAverage` family) functions — graphite-web's
    * filterSeries statistic names, delegated to [[aggFor]] so the
    * filter/select family can never diverge from the combine/summarize
    * family's aggregation semantics.
    */
  private def seriesStat(kind: String): Column = {
    val method = kind match {
      case "average" => "avg"
      case "maximum" => "max"
      case "minimum" => "min"
      case "current" => "last"
      case "total"   => "sum"
      case other     => fail(s"unknown series statistic '$other'")
    }
    aggFor(method, col("value"), col("ts"))
  }

  /** [[seriesStat]] as a whole-series WINDOW column (partitioned by
    * metric): the same statistic, applied with `.over` at each aggregate
    * LEAF because a composite like avg's sum/count cannot be wrapped in
    * one WindowExpression. Lets the Above/Below filter family evaluate in
    * a single pass over its input instead of a second full compute of the
    * upstream pipeline plus a winner broadcast that is unbounded at
    * estate scale. TargetSpec pins this ≡ the [[statFor]] agg path per
    * method (named filter vs generic filterSeries on a random frame), so
    * the two shapes cannot drift.
    */
  private def seriesStatOver(kind: String, w: org.apache.spark.sql.expressions.WindowSpec): Column = {
    val v = col("value"); val ts = col("ts")
    kind match {
      case "average" => sum(dec(v)).over(w).cast("double") / count(v).over(w)
      case "maximum" => max(v).over(w)
      case "minimum" => min(v).over(w)
      case "current" =>
        max(when(v.isNotNull, struct(ts, v))).over(w).getField("value")
      case "total"   => sum(dec(v)).over(w).cast("double")
      case other     => fail(s"unknown series statistic '$other'")
    }
  }

  /** graphite's full aggFuncs method set as ONE aggregation column over
    * (value, ts) rows — the [[aggFor]] core plus median / range / stddev /
    * diff / multiply — shared by `aggregate`, `aggregateWithWildcards`,
    * `filterSeries`, and `highest`/`lowest` so the generic functions can
    * never diverge from the named ones. diff is safeDiff (first value in
    * name order minus the None-skipping rest = 2·v₀ − Σ, exact decimal);
    * multiply is None-strict.
    */
  private def statFor(method0: String): Column = {
    val m = method0.stripSuffix("Series") match {
      case "avg" | "average" => "average"
      case "total"           => "sum"
      case "current"         => "last"
      case "rangeOf"         => "range"
      case "maximum"         => "max"
      case "minimum"         => "min"
      case other             => other
    }
    m match {
      case "average" | "sum" | "min" | "max" | "count" | "last" =>
        aggFor(if (m == "average") "avg" else m, col("value"), col("ts"))
      case "median" =>
        rankPercentile(sort_array(collect_list(col("value"))), 50.0)
      case "range"  => max(col("value")) - min(col("value"))
      case "stddev" => stddev_pop(col("value"))
      case "diff" =>
        (lit(2) * min(when(col("value").isNotNull,
            struct(col("metric"), dec(col("value")).as("v")))).getField("v")
          - sum(dec(col("value")))).cast("double")
      case "multiply" =>
        when(sum(when(col("value").isNull, 1).otherwise(0)) === 0,
          aggregate(sort_array(collect_list(col("value"))), lit(1.0),
            (acc, x) => acc * x))
      case other => fail(s"unknown aggregation method '$other'")
    }
  }

  /** The normalized method name [[statFor]] resolves `method0` to — the
    * graphite output-naming convention (`aggregate(x,"avg")` emits
    * `averageSeries(x)`).
    */
  private def statName(method0: String): String =
    method0.stripSuffix("Series") match {
      case "avg" | "average" => "average"
      case "total"           => "sum"
      case "current"         => "last"
      case "rangeOf"         => "range"
      case "maximum"         => "max"
      case "minimum"         => "min"
      case other             => other
    }

  /** Graphite's non-interpolating rank percentile over a sorted value
    * array: rank = ceil(p/100 * (n+1)) clamped to [1, n]; empty -> null.
    */
  private def rankPercentile(sorted: Column, p: Double): Column =
    when(size(sorted) > 0,
      element_at(sorted,
        least(greatest(ceil(lit(p) * (size(sorted) + 1) / 100), lit(1L)),
          size(sorted).cast("long")).cast("int")))

  /** Add each series' own rank percentile as `__pct` via the two-window
    * rank idiom: row_number over value order + non-null count, then pick
    * the rank row — O(S log S) per series (one sort), never a per-row
    * array sort, and both windows share the metric partitioning (one
    * exchange). Same rank math as [[rankPercentile]].
    */
  private def withSeriesPercentile(df: DataFrame, p: Double): DataFrame = {
    val byVal = Window.partitionBy(col("metric")).orderBy(col("value").asc_nulls_last)
    val wSeries = Window.partitionBy(col("metric"))
    // nulls sort last, so row numbers 1..cnt are exactly the non-null
    // values in ascending order
    val rank = least(
      greatest(ceil(lit(p) * (col("__cnt") + 1) / 100), lit(1L)),
      col("__cnt")).cast("long")
    df.withColumn("__rn", row_number().over(byVal).cast("long"))
      .withColumn("__cnt", count(col("value")).over(wSeries))
      .withColumn("__pct", max(when(col("__rn") === rank, col("value"))).over(wSeries))
  }

  private def renamed(df: DataFrame, name: String): DataFrame =
    df.select(lit(name).as("metric"), col("ts"), col("value"))

  /** Graphite naming for per-series transforms: each output series wraps
    * its OWN input name — `scale(app.a.cpu,0.5)` — so a multi-series list
    * stays a list of distinct series (renaming all of them to the call
    * text would collide rows at equal timestamps).
    */
  private def wrapped(df: DataFrame, call: TCall): DataFrame = {
    val extra = call.args.tail.map(_.canonical) match {
      case Nil  => ""
      case rest => rest.mkString(",", ",", "")
    }
    df.select(
      concat(lit(call.name + "("), col("metric"), lit(extra + ")")).as("metric"),
      col("ts"), col("value"))
  }

  private def mapValue(df: DataFrame, f: Column => Column): DataFrame =
    df.select(col("metric"), col("ts"), f(col("value")).cast("double").as("value"))

  /** Python %-format of ONE numeric value into a template (the aliasQuery
    * newName contract): supports %d (truncates toward zero, as Python's
    * int-format of a float), %s, %f / %.Nf, and %g (Java semantics for g,
    * a documented shade off CPython's). No spec -> the template verbatim.
    */
  private[serving] def pyFormat(fmt: String, v: Double): String = {
    val re = "%(?:\\.(\\d+))?([dfgs])".r
    re.findFirstMatchIn(fmt) match {
      case None => fmt
      case Some(m) =>
        val rep = m.group(2) match {
          case "d" => v.toLong.toString
          case "s" => v.toString
          case "f" =>
            val p = Option(m.group(1)).map(_.toInt).getOrElse(6)
            String.format(java.util.Locale.ROOT, s"%.${p}f", Double.box(v))
          case "g" =>
            val p = Option(m.group(1)).map("." + _).getOrElse("")
            String.format(java.util.Locale.ROOT, s"%${p}g", Double.box(v))
        }
        fmt.substring(0, m.start) + rep + fmt.substring(m.end)
    }
  }

  // ---- function dispatch ------------------------------------------------

  private def evalCall(call: TCall, wfetch: WindowedFetch,
                       cropFrom: Option[Long], extraHistory: Long,
                       window: Option[(Long, Long)] = None): DataFrame = {
    val TCall(name, args) = call
    // plain glob fetch at THIS node's history depth; nested calls recurse
    // through `series`, which threads the window context down the tree
    val fetch: String => DataFrame = g => wfetch(g, extraHistory)
    def series(e: TExpr): DataFrame =
      seriesW(e, wfetch, cropFrom, extraHistory, window)
    def arity(n: Int): Unit =
      if (args.length != n) fail(s"$name expects $n argument(s), got ${args.length}")
    def atLeast(n: Int): Unit =
      if (args.length < n) fail(s"$name expects >= $n argument(s), got ${args.length}")
    def sl0: DataFrame = series(args.head)

    name match {
      // -- combine: N series lists -> one synthesized series -------------
      case "sumSeries" | "averageSeries" | "minSeries" | "maxSeries" | "countSeries" =>
        atLeast(1)
        val method = name match {
          case "sumSeries"     => "sum"
          case "averageSeries" => "avg"
          case "minSeries"     => "min"
          case "maxSeries"     => "max"
          case "countSeries"   => "count"
        }
        val all = args.map(series(_)).reduce(_ unionByName _)
        all.groupBy(col("ts"))
          .agg(aggFor(method, col("value"), col("ts")).as("value"))
          .select(lit(call.canonical).as("metric"), col("ts"),
            col("value").cast("double").as("value"))

      case "rangeOfSeries" | "stddevSeries" =>
        atLeast(1)
        val all = args.map(series(_)).reduce(_ unionByName _)
        val agg = name match {
          // max - min over the non-None values per timestamp
          case "rangeOfSeries" => max(col("value")) - min(col("value"))
          // population stddev, as graphite computes (sqrt(E[x^2]-E[x]^2))
          case "stddevSeries"  => stddev_pop(col("value"))
        }
        all.groupBy(col("ts")).agg(agg.cast("double").as("value"))
          .select(lit(call.canonical).as("metric"), col("ts"), col("value"))

      case "multiplySeries" =>
        // graphite safeMul is STRICT about None (any gap -> None), unlike
        // the None-skipping safeSum lane — pinned by spec. The per-ts
        // fan-in is the series count, so the collected product list is
        // bounded exactly like the groupBy(ts) partial rows it replaces.
        atLeast(1)
        val all = args.map(series(_)).reduce(_ unionByName _)
        all.groupBy(col("ts"))
          .agg(
            sum(when(col("value").isNull, 1).otherwise(0)).as("__nulls"),
            aggregate(sort_array(collect_list(col("value"))), lit(1.0),
              (acc, x) => acc * x).as("__prod"))
          .select(lit(call.canonical).as("metric"), col("ts"),
            when(col("__nulls") === 0, col("__prod")).cast("double").as("value"))

      case "powSeries" =>
        // left-fold pow across the series at each slot, in name order (a
        // frame's stand-in for graphite's list order), None-strict like
        // safePow over a row with a gap. The per-ts array is bounded by
        // series fan-in, as in multiplySeries.
        atLeast(1)
        val all = args.map(series(_)).reduce(_ unionByName _)
        all.groupBy(col("ts"))
          .agg(
            sum(when(col("value").isNull, 1).otherwise(0)).as("__nulls"),
            sort_array(collect_list(struct(col("metric"), col("value"))))
              .as("__ordered"))
          .select(lit(call.canonical).as("metric"), col("ts"),
            when(col("__nulls") === 0 && size(col("__ordered")) > 0,
              aggregate(
                expr("slice(__ordered, 2, size(__ordered))"),
                element_at(col("__ordered"), 1).getField("value"),
                (acc, x) => {
                  val r = pow(acc, x.getField("value"))
                  when(!isnan(r) && r =!= Double.PositiveInfinity &&
                    r =!= Double.NegativeInfinity, r)
                })).cast("double").as("value"))

      case "percentileOfSeries" =>
        // one synthesized series: graphite's non-interpolating rank
        // percentile (rank = ceil(p/100 * (n+1)), clamped to [1, n]) over
        // the non-None values at each timestamp. Two windows over the ts
        // partitioning (row_number in value order + non-null count), NOT a
        // collect_list: the array shape holds every series' value for a
        // slot in one in-memory element and falls over around the
        // million-series mark, while the sort-based rank spills and scales
        // (found by RenderScale at S=2M).
        arity(2)
        val p = num(args(1))
        require(p >= 0 && p <= 100, s"percentile must be in [0,100], got $p")
        val byVal = Window.partitionBy(col("ts")).orderBy(col("value").asc_nulls_last)
        val wTs = Window.partitionBy(col("ts"))
        val rank = least(
          greatest(ceil(lit(p) * (col("__cnt") + 1) / 100), lit(1L)),
          col("__cnt")).cast("long")
        sl0.withColumn("__rn", row_number().over(byVal).cast("long"))
          .withColumn("__cnt", count(col("value")).over(wTs))
          // one row per slot: the rank row, or (all-None slot) row 1 as None
          .where((col("__cnt") > 0 && col("__rn") === rank) ||
            (col("__cnt") === 0 && col("__rn") === 1))
          .select(lit(call.canonical).as("metric"), col("ts"),
            when(col("__cnt") > 0, col("value")).cast("double").as("value"))

      case "group" =>
        // concatenate series lists (graphite's list combiner)
        atLeast(1)
        args.map(series(_)).reduce(_ unionByName _)

      case "unique" =>
        // collapse duplicate series names (graphite keeps the first list
        // entry; a frame has no list order, so a conflicting duplicate —
        // same name, same slot, different value, a degenerate input —
        // resolves to the minimum non-null value, deterministic under any
        // partitioning; identical duplicates collapse losslessly)
        atLeast(1)
        args.map(series(_)).reduce(_ unionByName _)
          .groupBy(col("metric"), col("ts"))
          .agg(min(col("value")).as("value"))
          .select(col("metric"), col("ts"), col("value").cast("double").as("value"))

      case "fallbackSeries" =>
        // serve the fallback expression only when the primary matched no
        // series. The emptiness probe is a 1-row count aggregate cross-
        // joined back (plan-level — no driver collect); the primary
        // subtree is evaluated once for the probe and once for the data.
        arity(2)
        val prim = sl0
        val fb = series(args(1))
        val probe = broadcast(prim.agg(count(lit(1)).as("__pc")))
        prim.crossJoin(probe).where(col("__pc") > 0).drop("__pc")
          .unionByName(fb.crossJoin(probe).where(col("__pc") === 0).drop("__pc"))

      case "sumSeriesWithWildcards" | "averageSeriesWithWildcards"
         | "multiplySeriesWithWildcards" | "aggregateWithWildcards" =>
        // strip the named name nodes, then aggregate series that collapse
        // to the same stripped name — groupByNode's generalization; the
        // index-aware filter keeps this one groupBy, no UDF. The generic
        // form takes the method as arg 1 (graphite's full aggFuncs set);
        // the named forms pin sum/avg/multiply (multiply is None-strict,
        // via the statFor lane multiplySeries uses).
        val generic = name == "aggregateWithWildcards"
        atLeast(if (generic) 3 else 2)
        val method =
          if (generic) str(args(1))
          else if (name.startsWith("sum")) "sum"
          else if (name.startsWith("multiply")) "multiply"
          else "avg"
        val drop = (if (generic) args.drop(2) else args.tail).map(int)
        drop.foreach(i => require(i >= 0, s"$name node index must be >= 0, got $i"))
        val dropArr = array(drop.map(lit(_)): _*)
        val parts = split(col("metric"), "\\.")
        val stripped = array_join(
          filter(parts, (_, i) => !array_contains(dropArr, i.cast("int"))), ".")
        sl0.withColumn("__name", stripped)
          .groupBy(col("__name"), col("ts"))
          .agg((if (generic || method == "multiply") statFor(method)
                else aggFor(method, col("value"), col("ts"))).as("value"))
          .select(col("__name").as("metric"), col("ts"),
            col("value").cast("double").as("value"))

      case "weightedAverage" =>
        // weighted mean across two parallel series lists matched on name
        // node(s) — the cluster-weighted-metric idiom, with graphite's
        // exact shape: the numerator sums value*weight over matched pairs
        // (safeMul skips pairs where either side is None), but the
        // denominator is sumSeries over ALL weights — unmatched or
        // gap-opposed weights still divide. Division by a missing or zero
        // weight sum is None. Sums ride a decimal(27,6) lane (each product
        // is one IEEE op, the sums exact) so results are partition-stable.
        atLeast(3)
        val nodes = args.drop(2).map(int)
        nodes.foreach(i => require(i >= 0, s"weightedAverage node index must be >= 0, got $i"))
        def dec6(c: Column): Column = c.cast("decimal(27,6)")
        def keyed(df: DataFrame, v: String): DataFrame = {
          val parts = split(col("metric"), "\\.")
          df.select(
            concat_ws(".", nodes.map(i => coalesce(get(parts, lit(i)), lit(""))): _*)
              .as("__k"),
            col("ts"), col("value").as(v))
        }
        val wts = keyed(series(args(1)), "__w")
        val num = keyed(sl0, "__a").join(wts, Seq("__k", "ts"))
          .where(col("__a").isNotNull && col("__w").isNotNull)
          .groupBy(col("ts"))
          .agg(sum(dec6(col("__a") * col("__w"))).cast("double").as("__num"))
        val den = wts.groupBy(col("ts"))
          .agg(sum(dec6(col("__w"))).cast("double").as("__den"))
        den.join(num, Seq("ts"), "left")
          .select(lit(call.canonical).as("metric"), col("ts"),
            when(col("__num").isNotNull && col("__den").isNotNull && col("__den") =!= 0.0,
              col("__num") / col("__den")).cast("double").as("value"))

      // -- arithmetic between series --------------------------------------
      case "divideSeries" =>
        arity(2)
        val divisor = series(args(1))
        // graphite requires the divisor to be exactly one series; a 2-row
        // bounded probe (same cost class as the serving collect) enforces
        // it as a client error instead of silently joining a fan-out
        val dnames = divisor.select(col("metric")).distinct().limit(2)
          .collect().map(_.getString(0))
        if (dnames.length != 1)
          fail(s"divideSeries divisor must be exactly one series, got ${dnames.length}")
        val d = broadcast(divisor.select(col("ts").as("__dts"), col("value").as("__dv")))
        sl0.join(d, col("ts") === col("__dts"), "left")
          .select(
            concat(lit("divideSeries("), col("metric"), lit("," + dnames.head + ")"))
              .as("metric"),
            col("ts"),
            // graphite: division by zero (or a missing divisor point) is None
            when(col("value").isNotNull && col("__dv").isNotNull && col("__dv") =!= 0.0,
              col("value") / col("__dv")).cast("double").as("value"))

      case "divideSeriesLists" | "diffSeriesLists"
         | "multiplySeriesLists" | "powSeriesLists" =>
        // pairwise combine of two equal-length series lists, zipped in
        // name order (a frame has no list order; graphite zips fetch
        // order). The rank assignment sorts each side's DISTINCT-name
        // frame — bounded by series count, not points — in one partition;
        // fine for the realistic few-to-thousands-of-series use, and the
        // length check is two 1-row aggregates (bounded probes, the
        // divideSeries cost class). Mismatched lengths are a client error
        // as in graphite.
        arity(2)
        val left = sl0
        val right = series(args(1))
        def rankOf(df: DataFrame): DataFrame =
          df.select(col("metric")).distinct()
            .withColumn("__rank",
              row_number().over(Window.orderBy(col("metric"))))
        val lr = rankOf(left); val rr = rankOf(right)
        val Array(ln, rn2) = Array(lr, rr).map(
          _.agg(count(lit(1))).collect()(0).getLong(0))
        if (ln != rn2)
          fail(s"$name: lists must be the same length, got $ln vs $rn2")
        // pair names ride a broadcast rank->names frame so a slot present
        // on only one side still knows its pair name (value None)
        val pairs = lr.select(col("__rank"), col("metric").as("__lm"))
          .join(rr.select(col("__rank"), col("metric").as("__rm")), Seq("__rank"))
        val ldata = left.join(broadcast(lr), Seq("metric"))
          .select(col("__rank"), col("ts"), col("value"))
        val rdata = right.join(broadcast(rr), Seq("metric"))
          .select(col("__rank"), col("ts"), col("value").as("__rv"))
        val opName = name.stripSuffix("Lists")
        val v = name match {
          case "divideSeriesLists" =>
            when(col("value").isNotNull && col("__rv").isNotNull && col("__rv") =!= 0.0,
              col("value") / col("__rv"))
          case "diffSeriesLists" =>
            when(col("value").isNotNull && col("__rv").isNotNull,
              col("value") - col("__rv"))
          case "multiplySeriesLists" =>
            when(col("value").isNotNull && col("__rv").isNotNull,
              col("value") * col("__rv"))
          case "powSeriesLists" =>
            val r = pow(col("value"), col("__rv"))
            when(col("value").isNotNull && col("__rv").isNotNull && !isnan(r) &&
              r =!= Double.PositiveInfinity && r =!= Double.NegativeInfinity, r)
        }
        ldata.join(rdata, Seq("__rank", "ts"), "full_outer")
          .join(broadcast(pairs), Seq("__rank"))
          .select(
            concat(lit(opName + "("), col("__lm"), lit(","), col("__rm"), lit(")"))
              .as("metric"),
            col("ts"), v.cast("double").as("value"))

      case "aggregateSeriesLists" =>
        // generic pairwise combine of two zipped lists (the modern parent
        // of divide/diff/multiplySeriesLists): each name-order pair is
        // aggregated as a 2-series group with the full method set — the
        // union of the paired rows keyed by rank lets statFor do the work,
        // so the pairwise semantics (None-skipping sums, strict multiply)
        // are exactly the N-series ones.
        arity(3)
        val m0 = str(args(2))
        val la = sl0
        val ra = series(args(1))
        def rankOf2(df: DataFrame): DataFrame =
          df.select(col("metric")).distinct()
            .withColumn("__rank",
              row_number().over(Window.orderBy(col("metric"))))
        val lr2 = rankOf2(la); val rr2 = rankOf2(ra)
        val Array(lc, rc) = Array(lr2, rr2).map(
          _.agg(count(lit(1))).collect()(0).getLong(0))
        if (lc != rc)
          fail(s"aggregateSeriesLists: lists must be the same length, got $lc vs $rc")
        val pairNames = lr2.select(col("__rank"), col("metric").as("__lm"))
          .join(rr2.select(col("__rank"), col("metric").as("__rm")), Seq("__rank"))
        la.join(broadcast(lr2), Seq("metric"))
          .unionByName(ra.join(broadcast(rr2), Seq("metric")))
          .groupBy(col("__rank"), col("ts"))
          .agg(statFor(m0).as("value"))
          .join(broadcast(pairNames), Seq("__rank"))
          .select(
            concat(lit(statName(m0) + "Series("), col("__lm"), lit(","),
              col("__rm"), lit(")")).as("metric"),
            col("ts"), col("value").cast("double").as("value"))

      case "diffSeries" =>
        atLeast(2)
        val minuend = sl0
        val mnames = minuend.select(col("metric")).distinct().limit(2)
          .collect().map(_.getString(0))
        if (mnames.length != 1)
          fail(s"diffSeries minuend must be exactly one series, got ${mnames.length}")
        // subtrahend: sum across ALL remaining series, None skipped (so a
        // gap in one subtracted series doesn't null the result)
        val sub = broadcast(
          args.tail.map(series(_)).reduce(_ unionByName _)
            .groupBy(col("ts"))
            .agg(sum(dec(col("value"))).cast("double").as("__sv"))
            .select(col("ts").as("__sts"), col("__sv")))
        renamed(
          minuend.join(sub, col("ts") === col("__sts"), "left")
            .select(col("metric"), col("ts"),
              when(col("value").isNotNull,
                col("value") - coalesce(col("__sv"), lit(0.0)))
                .cast("double").as("value")),
          call.canonical)

      case "asPercent" =>
        atLeast(1)
        if (args.length > 2) fail(s"asPercent expects 1-2 arguments, got ${args.length}")
        val sl = sl0
        args.drop(1).headOption match {
          case Some(TNum(total, _)) =>
            wrapped(mapValue(sl, v =>
              when(lit(total) =!= 0.0, v / lit(total) * lit(100.0))), call)
          case totalArg =>
            // graphite: an absent total means the sum of the input list; a
            // seriesList total is summed per timestamp too
            val totalFrame = totalArg.map(series(_)).getOrElse(sl)
              .groupBy(col("ts"))
              .agg(sum(dec(col("value"))).cast("double").as("__tv"))
              .select(col("ts").as("__tts"), col("__tv"))
            wrapped(
              sl.join(broadcast(totalFrame), col("ts") === col("__tts"), "left")
                .select(col("metric"), col("ts"),
                  when(col("value").isNotNull && col("__tv").isNotNull && col("__tv") =!= 0.0,
                    col("value") / col("__tv") * lit(100.0))
                    .cast("double").as("value")),
              call)
        }

      // -- group: aggregate series sharing a name node --------------------
      case "groupByNode" =>
        arity(3)
        val n = int(args(1)); val method = str(args(2))
        require(n >= 0, s"groupByNode index must be >= 0, got $n")
        val parts = split(col("metric"), "\\.")
        sl0
          .withColumn("__node", get(parts, lit(n)))
          .where(col("__node").isNotNull)
          .groupBy(col("__node"), col("ts"))
          .agg(aggFor(method, col("value"), col("ts")).as("value"))
          .select(col("__node").as("metric"), col("ts"),
            col("value").cast("double").as("value"))

      case "groupByNodes" =>
        // groupByNode's multi-node generalization (graphite-web's modern
        // tag/path grouper): series collapsing to the same dot-joined node
        // tuple aggregate together. Series missing ANY named node are
        // dropped, exactly as groupByNode drops a missing single node.
        atLeast(3)
        val method = str(args(1))
        val nodes = args.drop(2).map(int(_))
        nodes.foreach(i => require(i >= 0, s"groupByNodes node index must be >= 0, got $i"))
        val parts = split(col("metric"), "\\.")
        val key = concat_ws(".", nodes.map(i => get(parts, lit(i))): _*)
        sl0
          .where(nodes.map(i => get(parts, lit(i)).isNotNull).reduce(_ && _))
          .withColumn("__key", key)
          .groupBy(col("__key"), col("ts"))
          .agg(aggFor(method, col("value"), col("ts")).as("value"))
          .select(col("__key").as("metric"), col("ts"),
            col("value").cast("double").as("value"))

      case "aggregate" =>
        // the modern generic combine — aggregate(list,"sum") ==
        // sumSeries(list) — with graphite's wider method set (median /
        // range / stddev / diff / multiply on top of the aggFor core) and
        // graphite's output naming: the normalized method + "Series(...)".
        // diff is graphite's safeDiff: first (in name order — a frame has
        // no list order) non-null value minus the sum of the rest, i.e.
        // 2·v₀ − Σ in the exact decimal lane. multiply is None-strict like
        // multiplySeries. median reuses the non-interpolating rank.
        arity(2)
        val m0 = str(args(1))
        renamed(
          sl0.groupBy(col("ts")).agg(statFor(m0).as("value"))
            .select(col("ts"), col("value").cast("double").as("value")),
          s"${statName(m0)}Series(${args.head.canonical})")

      // -- tag database family (graphite 1.1+; see serving/Tags) ----------
      case "seriesByTag" =>
        // tag-filtered discovery: fetch the full frame (MatchAllGlob) and
        // filter with the compiled tag predicates — they run codegen'd in
        // the scan, and everything non-matching dies before any shuffle.
        // Series keep their own (tagged) names, as in graphite.
        atLeast(1)
        fetch(MatchAllGlob).where(Tags.compile(col("metric"), args.map(str)))

      case "groupByTags" =>
        // collapse series sharing the same values of the named tags, one
        // aggregation per (tag-tuple, ts) — the tag world's groupByNodes,
        // with graphite's output naming: `<name-tag>;tag1=v1;...` for the
        // grouped tags in call order ('name' is always the prefix and is
        // not repeated if listed). Same single-shuffle groupBy shape and
        // exact-decimal lane as aggregate/groupByNodes, with the full
        // statFor method set.
        atLeast(3)
        val method = str(args(1))
        // canonical sorted key order in the output name (graphite's
        // TaggedSeries formatting), regardless of call order
        val tagKeys = args.drop(2).map(str).filter(_ != "name").distinct.sorted
        val nameV = Tags.tagValue(col("metric"), "name")
        val appended = tagKeys.map { k =>
          concat(lit(";" + k + "="), Tags.tagValue(col("metric"), k))
        }
        sl0
          .withColumn("__key", concat(nameV +: appended: _*))
          .groupBy(col("__key"), col("ts"))
          .agg(statFor(method).as("value"))
          .select(col("__key").as("metric"), col("ts"),
            col("value").cast("double").as("value"))

      // -- transform: per-point scalar maps -------------------------------
      case "scale"            => arity(2); wrapped(mapValue(sl0, _ * lit(num(args(1)))), call)
      case "offset" | "add"   => arity(2); wrapped(mapValue(sl0, _ + lit(num(args(1)))), call)
      case "absolute"         => arity(1); wrapped(mapValue(sl0, abs(_)), call)
      case "invert" =>
        // graphite: 1/x via safeDiv — division by zero is None
        arity(1); wrapped(mapValue(sl0, v => when(v =!= 0.0, lit(1.0) / v)), call)
      case "logarithm" =>
        atLeast(1)
        if (args.length > 2) fail(s"logarithm expects 1-2 arguments, got ${args.length}")
        val base = if (args.length == 2) num(args(1)) else 10.0
        require(base > 0 && base != 1.0, s"logarithm base must be > 0 and != 1, got $base")
        // graphite: non-positive values are None (math.log domain error)
        wrapped(mapValue(sl0, v => when(v > 0.0, log(base, v))), call)
      case "pow" =>
        arity(2)
        val factor = num(args(1))
        // graphite safePow: a math domain error ((-1)^0.5 -> NaN), overflow,
        // or 0^negative (Infinity here, ValueError there) is None
        wrapped(mapValue(sl0, v => {
          val r = pow(v, lit(factor))
          when(v.isNotNull && !isnan(r) &&
            r =!= Double.PositiveInfinity && r =!= Double.NegativeInfinity, r)
        }), call)
      case "squareRoot" =>
        arity(1); wrapped(mapValue(sl0, v => when(v >= 0.0, sqrt(v))), call)
      case "round" =>
        // python3 round() is banker's rounding — Spark's bround, not round
        atLeast(1)
        if (args.length > 2) fail(s"round expects 1-2 arguments, got ${args.length}")
        val p = if (args.length == 2) int(args(1)) else 0
        wrapped(mapValue(sl0, v => bround(v, p)), call)
      case "exp" =>
        // graphite safeExp: float overflow is None, not Infinity
        arity(1)
        wrapped(mapValue(sl0, v => {
          val r = exp(v)
          when(r =!= Double.PositiveInfinity, r)
        }), call)
      case "sigmoid" =>
        // 1 / (1 + e^(-x)); the e^(-x) overflow lane (x << 0) is None as
        // in graphite's safeExp, not the IEEE limit 0.0
        arity(1)
        wrapped(mapValue(sl0, v => {
          val e = exp(-v)
          when(e =!= Double.PositiveInfinity, lit(1.0) / (lit(1.0) + e))
        }), call)
      case "logit" =>
        // ln(x / (1-x)); outside the open unit interval the log/division
        // domain errors are None, graphite's safe wrappers
        arity(1)
        wrapped(mapValue(sl0, v =>
          when(v > 0.0 && v < 1.0, log(v / (lit(1.0) - v)))), call)

      case "minMax" =>
        // normalize each series to [0,1] by its own min/max; a flat series
        // maps to 0 (graphite's range==0 branch). Whole-partition windows
        // on the metric partitioning — no join, no second shuffle.
        arity(1)
        val wm = Window.partitionBy(col("metric"))
        val lo = min(col("value")).over(wm)
        val hi = max(col("value")).over(wm)
        wrapped(sl0.select(col("metric"), col("ts"),
          when(col("value").isNotNull,
            when(hi > lo, (col("value") - lo) / (hi - lo)).otherwise(0.0))
            .cast("double").as("value")), call)
      case "isNonNull" =>
        // every slot becomes 1.0 (has a value) or 0.0 (gap) — the gap-
        // visualization idiom; unlike other transforms this maps nulls too
        arity(1)
        wrapped(sl0.select(col("metric"), col("ts"),
          when(col("value").isNotNull, 1.0).otherwise(0.0).as("value")), call)
      case "offsetToZero" =>
        // subtract each series' own minimum: per-series min over an
        // unordered whole-partition window (no join, no extra shuffle
        // beyond the metric partitioning every per-series transform has)
        arity(1)
        val mn = min(col("value")).over(Window.partitionBy(col("metric")))
        wrapped(sl0.select(col("metric"), col("ts"),
          (col("value") - mn).cast("double").as("value")), call)
      case "delay" =>
        // shift each series' values by N slots (negative N shifts back);
        // vacated slots are None, as in graphite
        arity(2)
        val steps = int(args(1))
        wrapped(sl0.select(col("metric"), col("ts"),
          lag(col("value"), steps).over(perSeries).cast("double").as("value")), call)
      case "transformNull" =>
        atLeast(1)
        if (args.length > 2) fail(s"transformNull expects 1-2 arguments, got ${args.length}")
        val dflt = if (args.length == 2) num(args(1)) else 0.0
        wrapped(mapValue(sl0, v => coalesce(v, lit(dflt))), call)
      case "removeBelowValue" =>
        arity(2); wrapped(mapValue(sl0, v => when(v >= lit(num(args(1))), v)), call)
      case "removeAboveValue" =>
        arity(2); wrapped(mapValue(sl0, v => when(v <= lit(num(args(1))), v)), call)
      case "removeAbovePercentile" | "removeBelowPercentile" =>
        // null out points beyond each series' OWN rank percentile (same
        // non-interpolating rank as nPercentile); strict compare, as
        // graphite's removeAbove/BelowPercentile — windows only, no join
        arity(2)
        val p = num(args(1))
        require(p >= 0 && p <= 100, s"percentile must be in [0,100], got $p")
        val keep =
          if (name == "removeAbovePercentile") col("value") <= col("__pct")
          else col("value") >= col("__pct")
        wrapped(withSeriesPercentile(sl0, p)
          .select(col("metric"), col("ts"),
            when(keep, col("value")).cast("double").as("value")), call)

      // -- transform: per-series windowed ---------------------------------
      case "derivative" | "nonNegativeDerivative" | "perSecond" =>
        arity(1)
        val base = sl0.select(col("metric"), col("ts"), col("value"),
          lag(col("value"), 1).over(perSeries).as("__pv"),
          lag(col("ts"), 1).over(perSeries).as("__pt"))
        val delta = col("value") - col("__pv")
        val out = name match {
          case "derivative" => delta
          // graphite: a negative delta is a counter reset -> None
          case "nonNegativeDerivative" => when(delta >= 0, delta)
          case "perSecond" =>
            when(delta >= 0 && col("ts") > col("__pt"),
              round(delta / (col("ts") - col("__pt")).cast("double"), 6))
        }
        wrapped(base.select(col("metric"), col("ts"),
          when(col("__pv").isNotNull && col("value").isNotNull, out)
            .cast("double").as("value")), call)

      case "integral" =>
        arity(1)
        val running = sum(dec(coalesce(col("value"), lit(0.0))))
          .over(perSeries.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        wrapped(sl0.select(col("metric"), col("ts"),
          when(col("value").isNotNull, running.cast("double")).as("value")), call)

      case "integralByInterval" =>
        // integral that resets at each interval boundary — the per-day
        // running-total idiom; same accumulate-through-gaps / None-at-gap
        // semantics as integral, with the bucket joining the partition key
        arity(2)
        val interval = seconds(str(args(1)))
        require(interval > 0, s"integralByInterval interval must be > 0, got $interval")
        val bucket = col("ts") - pmod(col("ts"), lit(interval))
        val w = Window.partitionBy(col("metric"), bucket).orderBy(col("ts"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val running = sum(dec(coalesce(col("value"), lit(0.0)))).over(w)
        wrapped(sl0.select(col("metric"), col("ts"),
          when(col("value").isNotNull, running.cast("double")).as("value")), call)

      case "movingAverage" | "movingSum" | "movingMax" | "movingMin" =>
        arity(2)
        val w = trailingWindow(args(1), name)
        // same partial-window-at-start semantics as the pinned
        // movingAverage behavior; an all-None window is None (count 0 /
        // null-skipping max & min over no rows)
        val out = name match {
          case "movingAverage" =>
            sum(dec(col("value"))).over(w).cast("double") /
              count(col("value")).over(w)
          case "movingSum" => sum(dec(col("value"))).over(w).cast("double")
          case "movingMax" => max(col("value")).over(w)
          case "movingMin" => min(col("value")).over(w)
        }
        wrapped(sl0.select(col("metric"), col("ts"), out.as("value")), call)

      case "movingWindow" =>
        // the generic parent of the moving* family: movingWindow(list, n[,
        // func]) with the median included; same trailing-slots window and
        // null-awareness as the named forms
        atLeast(2)
        if (args.length > 3) fail(s"movingWindow expects 2-3 arguments, got ${args.length}")
        val func = if (args.length == 3) statName(str(args(2))) else "average"
        val w = trailingWindow(args(1), "movingWindow")
        val out = func match {
          case "average" =>
            sum(dec(col("value"))).over(w).cast("double") / count(col("value")).over(w)
          case "sum"    => sum(dec(col("value"))).over(w).cast("double")
          case "max"    => max(col("value")).over(w)
          case "min"    => min(col("value")).over(w)
          case "median" =>
            rankPercentile(sort_array(collect_list(col("value")).over(w)), 50.0)
          case "stddev" => stddev_pop(col("value")).over(w)
          case "range"  => max(col("value")).over(w) - min(col("value")).over(w)
          case "count"  => count(col("value")).over(w).cast("double")
          case other    => fail(s"movingWindow: unsupported method '$other'")
        }
        wrapped(sl0.select(col("metric"), col("ts"),
          out.cast("double").as("value")), call)

      case "aggregateLine" =>
        // each series flattened to its own statistic at every slot (the
        // nPercentile shape, generalized to the full method set). Graphite
        // draws 3 window-edge points and embeds the value in the name;
        // here the data level fills the series' own slots and the name is
        // the call text — the drawn line is the same.
        atLeast(1)
        if (args.length > 2) fail(s"aggregateLine expects 1-2 arguments, got ${args.length}")
        val func = if (args.length == 2) str(args(1)) else "average"
        val sl = sl0
        val stats = sl.groupBy(col("metric")).agg(statFor(func).as("__line"))
        wrapped(sl.join(broadcast(stats), Seq("metric"))
          .select(col("metric"), col("ts"),
            col("__line").cast("double").as("value")), call)

      case "movingMedian" =>
        // graphite's median — sorted[len//2], the upper mid — over the
        // trailing window's non-null values; exactly the rank-percentile
        // at p=50 (rank = ceil((n+1)/2) clamps to the upper mid for even
        // n). The windowed collect is bounded by the window size argument,
        // never by series length.
        arity(2)
        val w = trailingWindow(args(1), "movingMedian")
        wrapped(sl0.select(col("metric"), col("ts"),
          rankPercentile(sort_array(collect_list(col("value")).over(w)), 50.0)
            .cast("double").as("value")), call)

      case "linearRegression" =>
        // per-series ordinary least squares over the fetched window, each
        // series replaced by its fitted line at every slot (graphite fills
        // every slot, including former gaps). slope = cov(ts,value)/var(ts)
        // over the non-null points — covar_pop/var_pop are the numerically
        // stable forms (raw Σts² at epoch magnitudes ~1e9 would cancel
        // catastrophically in doubles). Series with < 2 points (var 0)
        // are dropped, graphite's failed-fit branch. Whole-partition
        // windows on the metric partitioning — no join.
        arity(1)
        val wm = Window.partitionBy(col("metric"))
        val tsNN = when(col("value").isNotNull, col("ts").cast("double"))
        val slope = covar_pop(tsNN, col("value")).over(wm) /
          var_pop(tsNN).over(wm)
        val meanTs = avg(tsNN).over(wm)
        val meanV = avg(col("value")).over(wm)
        wrapped(sl0.select(col("metric"), col("ts"), col("value"),
            slope.as("__m"), (meanV - slope * meanTs).as("__b"),
            var_pop(tsNN).over(wm).as("__var"))
          .where(col("__var") > 0)
          .select(col("metric"), col("ts"),
            (col("__m") * col("ts") + col("__b")).cast("double").as("value")),
          call)

      case "exponentialMovingAverage" =>
        // EMA with graphite's constant c = 2/(windowSize+1): seeded with
        // the average of the first window (None skipped), emitted from the
        // window's last slot on (earlier slots are None — the warm-up), a
        // gap emits None and leaves the state untouched. The recurrence is
        // inherently sequential per series, so it runs as the same typed
        // flatMapGroups shape as HoltWinters: one shuffle on the series
        // key, each group a bounded slot scan. A time-string windowSize
        // converts to slots via the inferred step and (in the serving
        // path) pre-fetches that much extra history, as graphite's
        // preview window does.
        arity(2)
        val (winPts, winSec) = args(1) match {
          case TNum(v, _) if v == math.rint(v) && v > 0 => (Some(v.toInt), None)
          case TStr(s2) =>
            val sec = seconds(s2)
            require(sec > 0, s"exponentialMovingAverage window must be > 0, got $s2")
            (None, Some(sec))
          case other => fail(
            s"exponentialMovingAverage window: expected points or a time string, got '${other.canonical}'")
        }
        val slE = winSec match {
          case Some(sec) => seriesW(args.head, wfetch, cropFrom, extraHistory + sec, window)
          case None      => sl0
        }
        val spark = slE.sparkSession
        import spark.implicits._
        val ema0 = slE.select(col("metric"), col("ts"), col("value"))
          .as[(String, Long, Option[Double])]
          .groupByKey(_._1)
          .flatMapGroups { (metric, it) =>
            val rows = it.toArray.sortBy(_._2)
            val step =
              if (rows.length < 2) 60L
              else rows.iterator.map(_._2).sliding(2)
                .map(p => p(1) - p(0)).filter(_ > 0).minOption.getOrElse(60L)
            val wp = winPts.getOrElse(
              math.max(1L, winSec.get / math.max(1L, step)).toInt)
            val out = new Array[Option[Double]](rows.length)
            val head = rows.take(wp).flatMap(_._3)
            var ema = if (head.nonEmpty) head.sum / head.length else 0.0
            var i = 0
            while (i < rows.length) {
              if (i < wp - 1) out(i) = None               // warm-up
              else if (i == wp - 1) out(i) = Some(ema)    // the seed itself
              else rows(i)._3 match {
                case None    => out(i) = None             // gap: state holds
                case Some(v) =>
                  ema = (2.0 / (wp + 1)) * v + (1.0 - 2.0 / (wp + 1)) * ema
                  out(i) = Some(ema)
              }
              i += 1
            }
            rows.indices.iterator.map(i => (metric, rows(i)._2, out(i)))
          }
          .toDF("metric", "ts", "value")
        val emaCropped = (winSec, cropFrom) match {
          case (Some(_), Some(f)) => ema0.where(col("ts") >= f)
          case _                  => ema0
        }
        wrapped(emaCropped, call)

      case "interpolate" =>
        // linearly fill interior gaps (graphite's interpolate): each null
        // run bounded by non-null neighbors on both sides gets the line
        // between them; leading/trailing runs stay None; an optional limit
        // caps the run length that may fill. Two whole-partition window
        // passes (backward fill state, forward fill state) over the one
        // metric partitioning — no join, frame stays step-aligned.
        atLeast(1)
        if (args.length > 2) fail(s"interpolate expects 1-2 arguments, got ${args.length}")
        val limit = if (args.length == 2) int(args(1)) else Int.MaxValue
        require(limit >= 0, s"interpolate limit must be >= 0, got $limit")
        val wB = perSeries.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wF = perSeries.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        val rn = row_number().over(perSeries).cast("long")
        val nnRn = when(col("value").isNotNull, col("__rn"))
        val nnV = when(col("value").isNotNull, col("value"))
        wrapped(sl0
          .select(col("metric"), col("ts"), col("value"), rn.as("__rn"))
          .select(col("metric"), col("ts"), col("value"), col("__rn"),
            last(nnRn, ignoreNulls = true).over(wB).as("__prn"),
            last(nnV, ignoreNulls = true).over(wB).as("__pv"),
            first(nnRn, ignoreNulls = true).over(wF).as("__nrn"),
            first(nnV, ignoreNulls = true).over(wF).as("__nv"))
          .select(col("metric"), col("ts"),
            when(col("value").isNotNull, col("value"))
              .otherwise(when(
                col("__pv").isNotNull && col("__nv").isNotNull &&
                  col("__nrn") - col("__prn") - 1 <= limit,
                col("__pv") + (col("__nv") - col("__pv")) *
                  (col("__rn") - col("__prn")) / (col("__nrn") - col("__prn"))))
              .cast("double").as("value")), call)

      case "stdev" =>
        // moving population stddev over the last N slots; graphite's
        // windowTolerance (default 0.1) nulls windows with fewer than 10%
        // non-None points. Window width at the series head is the rows
        // seen so far, as in graphite's growing initial window.
        arity(2)
        val n = int(args(1))
        require(n > 0, s"stdev window must be > 0 slots, got $n")
        val w = perSeries.rowsBetween(-(n - 1).toLong, Window.currentRow)
        val valid = count(col("value")).over(w)
        val width = least(row_number().over(perSeries).cast("long"), lit(n.toLong))
        wrapped(sl0.select(col("metric"), col("ts"),
          when(valid.cast("double") / width.cast("double") >= 0.1,
            stddev_pop(col("value")).over(w)).cast("double").as("value")), call)

      case "holtWintersForecast" | "holtWintersConfidenceBands"
         | "holtWintersConfidenceArea" | "holtWintersAberration" =>
        // the graphite alerting family (see serving/HoltWinters): one
        // sequential analysis pass per series, then per-row arithmetic.
        // Signatures: forecast(series[, bootstrapInterval]),
        // bands/aberration(series[, delta[, bootstrapInterval]]).
        // Bootstrap: the child subtree is evaluated with bootstrapInterval
        // (default 7d) of extra pre-window history so the seasonal state is
        // warm at the window head, then the analysis is cropped back to the
        // request window — graphite-web's holtWintersForecast re-fetch.
        // Under the windowless [[eval]] entry point the re-fetch and crop
        // are identity (the whole fetched history is the window).
        atLeast(1)
        val (delta, rest) =
          if (name == "holtWintersForecast") (3.0, args.drop(1))
          else args.drop(1) match {
            case TNum(v, _) :: tail => (v, tail)
            case other              => (3.0, other)
          }
        if (rest.length > 1) fail(s"$name: too many arguments (${args.length})")
        val bootstrapSec = rest.headOption.map(b => seconds(str(b)))
          .getOrElse(7L * 86400L)
        require(bootstrapSec >= 0, s"$name: negative bootstrapInterval")
        val slBoot = seriesW(args.head, wfetch, cropFrom, extraHistory + bootstrapSec, window)
        val an0 = HoltWinters.analyzed(slBoot)
        val an = cropFrom.fold(an0)(f => an0.where(col("ts") >= f))
        def named(prefix: Column, valueCol: Column): DataFrame =
          an.select(
            concat(prefix, lit("("), col("metric"), lit(")")).as("metric"),
            col("ts"), valueCol.cast("double").as("value"))
        val upper = col("prediction") + lit(delta) * col("deviation")
        val lower = col("prediction") - lit(delta) * col("deviation")
        name match {
          case "holtWintersForecast" =>
            named(lit("holtWintersForecast"), col("prediction"))
          case "holtWintersConfidenceBands" | "holtWintersConfidenceArea" =>
            // both bands from ONE analysis pass: explode a 2-element
            // array per row rather than unioning two copies of the
            // sequential mapGroups subtree. ConfidenceArea is the same
            // data with an area fill between the bands — a renderer
            // styling concern, like the other presentation identities.
            an.select(col("metric"), col("ts"),
                explode(array(
                  struct(lit("holtWintersConfidenceUpper").as("p"), upper.as("v")),
                  struct(lit("holtWintersConfidenceLower").as("p"), lower.as("v"))))
                  .as("__e"))
              .select(
                concat(col("__e.p"), lit("("), col("metric"), lit(")")).as("metric"),
                col("ts"), col("__e.v").cast("double").as("value"))
          case "holtWintersAberration" =>
            // excess beyond the bands; inside them, a gap, or a missing
            // band all emit 0, exactly graphite's loop (null comparisons
            // fall through to the otherwise)
            named(lit("holtWintersAberration"),
              when(col("value") > upper, col("value") - upper)
                .when(col("value") < lower, col("value") - lower)
                .otherwise(lit(0.0)))
        }

      case "keepLastValue" =>
        atLeast(1)
        if (args.length > 2) fail(s"keepLastValue expects 1-2 arguments, got ${args.length}")
        val limit = if (args.length == 2) int(args(1)) else Int.MaxValue
        require(limit > 0, s"keepLastValue limit must be > 0, got $limit")
        val wAll = perSeries.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val rn = row_number().over(perSeries)
        val filled = last(col("value"), ignoreNulls = true).over(wAll)
        // slot distance to the last non-null row, via row numbers (the
        // frame is step-aligned, so row distance == slot distance)
        val lastRn = last(when(col("value").isNotNull, rn), ignoreNulls = true).over(wAll)
        wrapped(sl0.select(col("metric"), col("ts"), col("value"),
            rn.as("__rn"), filled.as("__fill"), lastRn.as("__lrn"))
          .select(col("metric"), col("ts"),
            when(col("value").isNotNull, col("value"))
              .otherwise(when(col("__rn") - col("__lrn") <= limit, col("__fill")))
              .cast("double").as("value")), call)

      case "summarize" =>
        atLeast(3)
        if (args.length > 4) fail(s"summarize expects 3-4 arguments, got ${args.length}")
        val interval = seconds(str(args(1)))
        require(interval > 0, s"summarize interval must be > 0, got $interval")
        val method = str(args(2))
        // graphite's optional alignToFrom: true anchors buckets at the
        // window (or frame) start instead of interval boundaries — the
        // smartSummarize bucketing; false/absent is the default grid
        val alignToFrom = args.lift(3).exists {
          case TStr(v) if v.equalsIgnoreCase("true") || v == "1"   => true
          case TStr(v) if v.equalsIgnoreCase("false") || v == "0"  => false
          // URL targets write the Python booleans unquoted: `...,true)`
          // parses as a bare path token
          case TPath(v) if v.equalsIgnoreCase("true")  => true
          case TPath(v) if v.equalsIgnoreCase("false") => false
          case TNum(v, _) => v != 0
          case other      => fail(s"summarize: bad alignToFrom '${other.canonical}'")
        }
        // a setXFilesFactor in the child subtree gates each bucket on its
        // non-None fraction (graphite's series.xFilesFactor contract)
        val xff = xffOf(args.head)
        val sl1 = sl0
        val bucketed =
          if (!alignToFrom)
            sl1.withColumn("__b", col("ts") - pmod(col("ts"), lit(interval)))
          else cropFrom match {
            case Some(f) => sl1.withColumn("__b",
              col("ts") - pmod(col("ts") - lit(f), lit(interval)))
            case None =>
              val anchored = sl1.crossJoin(broadcast(sl1.agg(min(col("ts")).as("__a"))))
              anchored.withColumn("__b",
                col("ts") - pmod(col("ts") - col("__a"), lit(interval)))
          }
        val agged = bucketed
          .groupBy(col("metric"), col("__b").as("ts"))
          .agg(aggFor(method, col("value"), col("ts")).as("value"),
            count(col("value")).as("__n"), count(lit(1)).as("__c"))
        val gated = xff match {
          case Some(x) => when(
            col("__n").cast("double") >= lit(x) * col("__c").cast("double"), col("value"))
          case None => col("value")
        }
        wrapped(
          agged.select(col("metric"), col("ts"), gated.cast("double").as("value")),
          call)

      case "smartSummarize" =>
        // summarize with buckets anchored at the render window's start
        // (graphite's requestContext startTime) instead of interval
        // boundaries; windowless, the anchor is the frame's own first
        // slot — a 1-row aggregate broadcast back, not a collect
        arity(3)
        val interval = seconds(str(args(1)))
        require(interval > 0, s"smartSummarize interval must be > 0, got $interval")
        val method = str(args(2))
        val sl = sl0
        val anchored = cropFrom match {
          case Some(f) => sl.withColumn("__a", lit(f))
          case None    => sl.crossJoin(broadcast(sl.agg(min(col("ts")).as("__a"))))
        }
        val xffS = xffOf(args.head)
        val aggedS = anchored
          .groupBy(col("metric"),
            (col("ts") - pmod(col("ts") - col("__a"), lit(interval))).as("ts"))
          .agg(aggFor(method, col("value"), col("ts")).as("value"),
            count(col("value")).as("__n"), count(lit(1)).as("__c"))
        val gatedS = xffS match {
          case Some(x) => when(
            col("__n").cast("double") >= lit(x) * col("__c").cast("double"), col("value"))
          case None => col("value")
        }
        wrapped(
          aggedS.select(col("metric"), col("ts"), gatedS.cast("double").as("value")),
          call)

      case "hitcount" =>
        // rate → count per bucket: Σ value·step over each interval bucket
        // (graphite's hitcount — how many events a per-second rate series
        // represents). Step is inferred per series (min positive ts delta,
        // 60 when unknowable); buckets anchor at the window start, or at
        // interval boundaries with alignToInterval=true.
        atLeast(2)
        if (args.length > 3) fail(s"hitcount expects 2-3 arguments, got ${args.length}")
        val interval = seconds(str(args(1)))
        require(interval > 0, s"hitcount interval must be > 0, got $interval")
        val alignToInterval = args.length == 3 && (args(2) match {
          case TStr(s2)   => s2.equalsIgnoreCase("true")
          case TNum(v, _) => v != 0
          case _          => false
        })
        val sl = sl0
        val wm = Window.partitionBy(col("metric"))
        val stepped = sl
          .select(col("metric"), col("ts"), col("value"),
            (col("ts") - lag(col("ts"), 1).over(perSeries)).as("__d"))
          .select(col("metric"), col("ts"), col("value"),
            coalesce(min(when(col("__d") > 0, col("__d"))).over(wm), lit(60L))
              .as("__step"))
        val anchored =
          if (alignToInterval) stepped.withColumn("__a", lit(0L))
          else cropFrom match {
            case Some(f) => stepped.withColumn("__a", lit(f))
            case None =>
              stepped.crossJoin(broadcast(sl.agg(min(col("ts")).as("__a"))))
          }
        wrapped(anchored
          .groupBy(col("metric"),
            (col("ts") - pmod(col("ts") - col("__a"), lit(interval))).as("ts"))
          .agg(sum(when(col("value").isNotNull,
            dec(col("value")) * col("__step"))).as("value"))
          .select(col("metric"), col("ts"), col("value").cast("double").as("value")),
          call)

      case "timeSlice" =>
        // null out points outside [start, end] — slots stay, values go
        // (graphite keeps the grid). Bounds: epoch-second numbers, or
        // signed time strings relative to the render window's start
        // ("-1h" = an hour before `from`); the relative form without a
        // window is a client error, not a guess.
        atLeast(2)
        if (args.length > 3) fail(s"timeSlice expects 2-3 arguments, got ${args.length}")
        def sliceBound(e: TExpr): Long = e match {
          case TNum(v, _) => v.toLong
          case TStr(s2) =>
            cropFrom match {
              case Some(f) => f + seconds(s2)
              case None => fail(
                s"timeSlice: relative bound '$s2' needs a render window (use epoch seconds)")
            }
          case other => fail(s"timeSlice: bad bound '${other.canonical}'")
        }
        val lo = sliceBound(args(1))
        val hi = if (args.length == 3) sliceBound(args(2)) else Long.MaxValue
        wrapped(sl0.select(col("metric"), col("ts"),
          when(col("ts") >= lo && col("ts") <= hi, col("value"))
            .cast("double").as("value")), call)

      case "consolidateBy" =>
        // pins the maxDataPoints consolidation method for this subtree
        // (avg is the default otherwise); pure pass-through at the data
        // level — the serving layer reads the method off the parsed AST
        // via [[consolidationMethod]]. The name wraps so dashboards see
        // graphite's consolidateBy(name,'func') labels.
        arity(2)
        val m = str(args(1))
        aggFor(m match {
          case "average" => "avg"
          case "total"   => "sum"
          case "current" => "last"
          case x         => x
        }, col("value"), col("ts"))  // validate the method eagerly (400, not 500)
        wrapped(sl0, call)

      case "cumulative" =>
        // graphite's alias for consolidateBy(series,"sum"):
        // data-identity, consolidation method carried on the AST (see
        // [[consolidationMethod]])
        arity(1)
        wrapped(sl0, call)

      case "timeShift" =>
        arity(2)
        // graphite timeShift("1d") presents data from one day AGO at each
        // current timestamp: label shifts forward by the offset
        val delta = seconds(str(args(1)))
        wrapped(sl0.select(col("metric"), (col("ts") + lit(delta)).as("ts"), col("value")),
          call)

      case "timeStack" =>
        // the week-over-week overlay: one shifted copy of every series per
        // step in [start, end), each named timeShift(name,unit,i) as
        // graphite does. ONE scan: each row explodes into its step copies
        // (a row-level sequence), so the inner expression is never
        // re-evaluated per shift. Optional args default like graphite's
        // (unit "1d", start 0, end 7). The cap compares in Long — an
        // Int-overflowing [start, end) must be a 400, not a 4-billion-step
        // explode.
        atLeast(1)
        if (args.length > 4) fail(s"timeStack expects 1-4 arguments, got ${args.length}")
        val unitRaw = if (args.length >= 2) str(args(1)) else "1d"
        val unit = seconds(unitRaw)
        val lo = if (args.length >= 3) int(args(2)) else 0
        val hi = if (args.length >= 4) int(args(3)) else 7
        val steps = hi.toLong - lo.toLong
        require(steps > 0, s"timeStack end must be > start, got [$lo, $hi)")
        require(steps <= 64, s"timeStack fans out $steps copies; cap is 64")
        sl0.select(col("metric"), col("ts"), col("value"),
            explode(sequence(lit(lo.toLong), lit(hi.toLong - 1))).as("__i"))
          .select(
            concat(lit("timeShift("), col("metric"), lit(s""","$unitRaw","""),
              col("__i").cast("string"), lit(")")).as("metric"),
            (col("ts") + lit(unit) * col("__i")).as("ts"), col("value"))

      case "scaleToSeconds" =>
        // value × (seconds / step): the rate-renormalization graphite
        // users pair with counters. Step is inferred per series from the
        // slot grid (min positive ts delta — the same inference the
        // holtWinters family uses; 60 when a series has a single slot),
        // and the factor applies as ONE float multiply per row.
        arity(2)
        val sec = num(args(1))
        val wAll = Window.partitionBy(col("metric"))
        wrapped(sl0
          .select(col("metric"), col("ts"), col("value"),
            (col("ts") - lag(col("ts"), 1).over(perSeries)).as("__d"))
          .select(col("metric"), col("ts"), col("value"),
            min(when(col("__d") > 0, col("__d"))).over(wAll).as("__step"))
          .select(col("metric"), col("ts"),
            (col("value") *
              (lit(sec) / coalesce(col("__step"), lit(60L)).cast("double")))
              .as("value")), call)

      // -- alias ----------------------------------------------------------
      case "alias" =>
        arity(2); renamed(sl0, str(args(1)))
      case "aliasByMetric" =>
        // last name node, function wrappers stripped first (same cleanup
        // as substr) — graphite's "show me just the leaf" rename
        arity(1)
        val cleanedMetric = regexp_replace(
          regexp_replace(col("metric"), "^.*\\(", ""), "\\).*$", "")
        sl0.select(element_at(split(cleanedMetric, "\\."), -1).as("metric"),
          col("ts"), col("value"))
      case "aliasByNode" =>
        // graphite accepts ints (dotted-name nodes) AND strings (tag keys)
        // mixed in one call — `aliasByNode(series, 1, 'dc')`; the name part
        // (before any ';') is what splits into nodes, so tagged series
        // alias cleanly by position too
        atLeast(2)
        val parts = split(substring_index(col("metric"), ";", 1), "\\.")
        val nodes = args.tail.map {
          case n @ TNum(_, _) =>
            val i = int(n)
            require(i >= 0, s"aliasByNode index must be >= 0, got $i")
            coalesce(get(parts, lit(i)), lit(""))
          case TStr(k) => Tags.tagValue(col("metric"), k)
          case other => fail(s"aliasByNode: expected node index or tag name, got ${other.canonical}")
        }
        sl0.select(concat_ws(".", nodes: _*).as("metric"), col("ts"), col("value"))

      case "aliasByTags" =>
        // rename each series to its values of the named tags, dot-joined —
        // the tag world's aliasByNode ('name' yields the name tag; a
        // missing tag contributes an empty node, like aliasByNode's
        // out-of-range index).
        atLeast(2)
        val vals = args.tail.map(e => Tags.tagValue(col("metric"), str(e)))
        sl0.select(concat_ws(".", vals: _*).as("metric"), col("ts"), col("value"))

      case "changed" =>
        // 1 where the value differs from the LAST NON-NULL value, else 0 —
        // the state-transition counter idiom. Graphite carries `previous`
        // across gaps (a None slot leaves it untouched), so the comparison
        // is against the last seen value, not the previous slot.
        arity(1)
        val prev = last(col("value"), ignoreNulls = true)
          .over(perSeries.rowsBetween(Window.unboundedPreceding, -1))
        wrapped(sl0.select(col("metric"), col("ts"),
          when(col("value").isNotNull && prev.isNotNull && col("value") =!= prev, 1.0)
            .otherwise(0.0).as("value")), call)

      case "substr" =>
        // trim each series name to node range [start, stop) with
        // graphite's python-slice semantics (negatives count from the
        // end, stop 0 means "to the end"). Graphite first strips function
        // wrappers — text up to the last '(' and from the first ')' — so
        // substr(sumSeries(a.b.*),0,2) slices "a.b.*", not the call text.
        atLeast(2)
        if (args.length > 3) fail(s"substr expects 2-3 arguments, got ${args.length}")
        val start = int(args(1))
        val stop = if (args.length == 3) int(args(2)) else 0
        val cleaned = regexp_replace(
          regexp_replace(col("metric"), "^.*\\(", ""), "\\).*$", "")
        val parts = split(cleaned, "\\.")
        val n = size(parts).cast("long")
        def clampIdx(i: Int): Column =
          if (i >= 0) least(lit(i.toLong), n)
          else greatest(n + i, lit(0L))
        val s0 = clampIdx(start)
        val e0 = if (stop == 0) n else clampIdx(stop)
        val sliced = slice(parts, (s0 + 1).cast("int"),
          greatest(e0 - s0, lit(0L)).cast("int"))
        sl0.select(array_join(sliced, ".").as("metric"), col("ts"), col("value"))

      case "aliasSub" =>
        // re.sub on every series name; graphite backreferences (\1) are
        // translated to the JVM's ($1), and everything else in the
        // replacement — including literal '$', which Java would read as a
        // group reference — is escaped to stay literal. Pattern syntax
        // AND backreference group numbers are validated here, so every
        // user error is a 400 at parse time, never an executor failure.
        arity(3)
        val search = str(args(1))
        val groups =
          try java.util.regex.Pattern.compile(search).matcher("").groupCount()
          catch {
            case e: java.util.regex.PatternSyntaxException =>
              fail(s"bad aliasSub pattern '$search': ${e.getMessage}")
          }
        val raw = str(args(2))
        val replace = new StringBuilder
        var i = 0
        while (i < raw.length) {
          val c = raw.charAt(i)
          if (c == '\\' && i + 1 < raw.length && raw.charAt(i + 1).isDigit) {
            val g = raw.charAt(i + 1) - '0'
            if (g > groups)
              fail(s"aliasSub replacement references group \\$g but the " +
                s"pattern has only $groups group(s)")
            replace.append('$').append(raw.charAt(i + 1)); i += 2
          } else if (c == '$' || c == '\\') {
            replace.append('\\').append(c); i += 1
          } else { replace.append(c); i += 1 }
        }
        sl0.select(
          regexp_replace(col("metric"), search, replace.toString).as("metric"),
          col("ts"), col("value"))

      // -- filter ---------------------------------------------------------
      case "grep" =>
        arity(2); sl0.where(col("metric").rlike(str(args(1))))
      case "exclude" =>
        arity(2); sl0.where(!col("metric").rlike(str(args(1))))

      // -- filter: keep series whose per-series statistic clears a bar ----
      // (modern graphite-web routes all eight through filterSeries with
      // strict > / < against the threshold)
      case "averageAbove" | "averageBelow" | "maximumAbove" | "maximumBelow"
         | "minimumAbove" | "minimumBelow" | "currentAbove" | "currentBelow" =>
        arity(2)
        val n = num(args(1))
        // one pass: the per-series statistic rides a metric-partitioned
        // window, so the upstream pipeline (an arbitrary fetch/transform
        // chain, the expensive part) is computed ONCE — the winner-frame
        // semi-join shape computed it twice and broadcast a winner set
        // that is series-count-bounded, i.e. unbounded at estate scale.
        // An all-null series' stat is NULL, which fails both > and < —
        // identical to the winner shape dropping it.
        val stat = seriesStatOver(
          name.stripSuffix("Above").stripSuffix("Below"),
          Window.partitionBy(col("metric")))
        val keep =
          if (name.endsWith("Above")) col("__stat") > lit(n)
          else col("__stat") < lit(n)
        sl0.withColumn("__stat", stat).where(keep).drop("__stat")

      case "filterSeries" =>
        // the generic form the eight named filters route through in
        // modern graphite-web: filterSeries(list, func, operator, n) with
        // the full aggFuncs method set and all six comparison operators
        arity(4)
        val func = str(args(1)); val op = str(args(2)); val n = num(args(3))
        val sl = sl0
        val keep = op match {
          case ">"  => col("__stat") > lit(n)
          case ">=" => col("__stat") >= lit(n)
          case "<"  => col("__stat") < lit(n)
          case "<=" => col("__stat") <= lit(n)
          case "="  => col("__stat") === lit(n)
          case "!=" => col("__stat") =!= lit(n)
          case other => fail(s"filterSeries: unknown operator '$other'")
        }
        val winners = sl.groupBy(col("metric")).agg(statFor(func).as("__stat"))
          .where(keep).select(col("metric"))
        sl.join(broadcast(winners), Seq("metric"), "left_semi")

      case "highest" | "lowest" =>
        // generic top/bottom-k by any aggFuncs statistic — the modern
        // parent of highestAverage/lowestCurrent; defaults n=1,
        // func=average as in graphite
        atLeast(1)
        if (args.length > 3) fail(s"$name expects 1-3 arguments, got ${args.length}")
        val k = if (args.length >= 2) int(args(1)) else 1
        require(k >= 0, s"$name n must be >= 0, got $k")
        val func = if (args.length == 3) str(args(2)) else "average"
        val sl = sl0
        val ranked = sl.groupBy(col("metric")).agg(statFor(func).as("__stat"))
        val order =
          if (name == "lowest") Seq(col("__stat").asc_nulls_last, col("metric").asc)
          else Seq(col("__stat").desc_nulls_last, col("metric").asc)
        val winners = ranked.orderBy(order: _*).limit(k).select(col("metric"))
        sl.join(broadcast(winners), Seq("metric"), "left_semi")

      // -- select: top/bottom k series by a per-series statistic ----------
      case "highestAverage" | "highestMax" | "highestCurrent"
         | "lowestAverage" | "lowestCurrent" =>
        arity(2)
        val k = int(args(1))
        require(k >= 0, s"$name k must be >= 0, got $k")
        val sl = sl0
        val stat = name match {
          case "highestMax"                        => seriesStat("maximum")
          case "highestCurrent" | "lowestCurrent"  => seriesStat("current")
          case _                                   => seriesStat("average")
        }
        val ranked = sl.groupBy(col("metric")).agg(stat.as("__stat"))
        // deterministic winners: stat, then name; k rows broadcast back
        val order =
          if (name.startsWith("lowest")) Seq(col("__stat").asc_nulls_last, col("metric").asc)
          else Seq(col("__stat").desc_nulls_last, col("metric").asc)
        val winners = ranked.orderBy(order: _*).limit(k).select(col("metric"))
        sl.join(broadcast(winners), Seq("metric"), "left_semi")

      case "mostDeviant" =>
        // top-n series by population variance — the "what moved" selector.
        // Same k-row broadcast-winners shape as highestAverage. Graphite
        // accepted both (list, n) and the legacy (n, list) order; so do we.
        arity(2)
        val (slArg, kArg) = args.head match {
          case TNum(_, _) => (args(1), args.head)
          case _          => (args.head, args(1))
        }
        val k = int(kArg)
        require(k >= 0, s"mostDeviant n must be >= 0, got $k")
        val sl = series(slArg)
        val ranked = sl.groupBy(col("metric"))
          .agg(var_pop(col("value")).as("__stat"))
        val winners = ranked
          .orderBy(col("__stat").desc_nulls_last, col("metric").asc)
          .limit(k).select(col("metric"))
        sl.join(broadcast(winners), Seq("metric"), "left_semi")

      case "removeEmptySeries" =>
        // drop series with no values at all — or, with an xFilesFactor
        // argument, series whose non-null fraction is below it (graphite's
        // xff gate; 0 keeps any series with >= 1 value)
        atLeast(1)
        if (args.length > 2) fail(s"removeEmptySeries expects 1-2 arguments, got ${args.length}")
        val xff = if (args.length == 2) num(args(1)) else 0.0
        require(xff >= 0 && xff <= 1, s"xFilesFactor must be in [0,1], got $xff")
        val sl = sl0
        val winners = sl.groupBy(col("metric"))
          .agg(count(col("value")).as("__nn"), count(lit(1)).as("__n"))
          .where(col("__nn") > 0 &&
            col("__nn").cast("double") / col("__n") >= lit(xff))
          .select(col("metric"))
        sl.join(broadcast(winners), Seq("metric"), "left_semi")

      case "averageOutsidePercentile" =>
        // keep series whose average falls OUTSIDE the (100-n, n) rank-
        // percentile band of all the averages (band edges are outside:
        // graphite's strict `not low < avg < high`). The stat frame is
        // bounded by series count; the band is one broadcast row.
        arity(2)
        val n0 = num(args(1))
        require(n0 >= 0 && n0 <= 100, s"percentile must be in [0,100], got $n0")
        val p = if (n0 < 50) 100 - n0 else n0
        val sl = sl0
        val stats = sl.groupBy(col("metric")).agg(seriesStat("average").as("__avg"))
        val sorted = sort_array(collect_list(col("__avg")))
        val band = stats.agg(
          rankPercentile(sorted, 100 - p).as("__lo"),
          rankPercentile(sorted, p).as("__hi"))
        val winners = stats.crossJoin(broadcast(band))
          .where(!(col("__avg") > col("__lo") && col("__avg") < col("__hi")))
          .select(col("metric"))
        sl.join(broadcast(winners), Seq("metric"), "left_semi")

      case "removeBetweenPercentile" =>
        // keep series with ANY point outside the per-timestamp
        // (100-n, n) percentile band across series. Unlike graphite's
        // py2 quirk (None sorts below everything, so a gap counted as
        // "outside"), gaps here are simply not evidence either way.
        arity(2)
        val n0 = num(args(1))
        require(n0 >= 0 && n0 <= 100, s"percentile must be in [0,100], got $n0")
        val p = if (n0 < 50) 100 - n0 else n0
        val sl = sl0
        val lst = sort_array(collect_list(col("value")))
        // bands: one row per slot — bounded by range/step, broadcastable
        val bands = sl.groupBy(col("ts")).agg(lst.as("__l"))
          .select(col("ts"), rankPercentile(col("__l"), 100 - p).as("__lo"),
            rankPercentile(col("__l"), p).as("__hi"))
        val winners = sl.join(broadcast(bands), Seq("ts"))
          .groupBy(col("metric"))
          .agg(max(when(col("value").isNotNull &&
            !(col("value") > col("__lo") && col("value") < col("__hi")), 1)
            .otherwise(0)).as("__out"))
          .where(col("__out") === 1)
          .select(col("metric"))
        sl.join(broadcast(winners), Seq("metric"), "left_semi")

      case "limit" =>
        // graphite takes the first n series of the list. A frame has no
        // list order, so the order must come from the expression: when the
        // input is a sortBy* call, the first-n read IS the top/bottom-n of
        // that statistic (the documented limit(sortByMaxima(x),n) idiom);
        // otherwise the deterministic reading is name order — the order
        // /render emits (sortByName's result).
        arity(2)
        val k = int(args(1))
        require(k >= 0, s"limit n must be >= 0, got $k")
        val sl = sl0
        val ordered = args.head match {
          case TCall("sortByTotal", _)  => Some((seriesStat("total"), false))
          case TCall("sortByMaxima", _) => Some((seriesStat("maximum"), false))
          case TCall("sortByMinima", _) => Some((seriesStat("minimum"), true))
          case _                        => None
        }
        val winners = ordered match {
          case Some((stat, asc)) =>
            val ranked = sl.groupBy(col("metric")).agg(stat.as("__stat"))
            val order =
              if (asc) Seq(col("__stat").asc_nulls_last, col("metric").asc)
              else Seq(col("__stat").desc_nulls_last, col("metric").asc)
            ranked.orderBy(order: _*).limit(k).select(col("metric"))
          case None =>
            sl.select(col("metric")).distinct().orderBy(col("metric").asc).limit(k)
        }
        sl.join(broadcast(winners), Seq("metric"), "left_semi")

      case "nPercentile" =>
        // each series becomes a flat line at its own rank percentile
        // (graphite fills EVERY slot, including former gaps); windows
        // only, so no join and no second shuffle
        arity(2)
        val p = num(args(1))
        require(p >= 0 && p <= 100, s"percentile must be in [0,100], got $p")
        wrapped(withSeriesPercentile(sl0, p)
          .select(col("metric"), col("ts"),
            col("__pct").cast("double").as("value")), call)

      case "mapSeries" =>
        // mapSeries(list, *mapNodes) groups series for a downstream
        // reduceSeries; a frame carries the grouping in the names
        // themselves, so the data level is identity — reduceSeries
        // re-derives the groups from the name nodes
        atLeast(2)
        args.tail.foreach(int) // validate node indexes (400, not 500)
        sl0

      case "reduceSeries" =>
        // reduceSeries(mapSeries(...), "fn", reduceNode, "m1", "m2", ...):
        // series sharing the first `reduceNode` name nodes reduce
        // together, each matcher naming the role its series plays; output
        // named nodes[0:reduceNode] + ".reduce." + fn, graphite's exact
        // key. One conditional-aggregation groupBy — fully distributed,
        // no per-group re-evaluation loop.
        atLeast(4)
        val fn = str(args(1))
        val rNode = int(args(2))
        require(rNode >= 1, s"reduceSeries reduceNode must be >= 1, got $rNode")
        val matchers = args.drop(3).map(str)
        val parts = split(col("metric"), "\\.")
        val key = array_join(slice(parts, 1, rNode), ".")
        val nodeV = get(parts, lit(rNode))
        val matched = sl0
          .where(size(parts) > rNode && nodeV.isin(matchers: _*))
          .withColumn("__key", key).withColumn("__node", nodeV)
        def role(i: Int): Column =
          max(when(col("__node") === matchers(i), col("value")))
        val reduced = fn match {
          case "sumSeries" | "averageSeries" =>
            matched.groupBy(col("__key"), col("ts"))
              .agg(aggFor(if (fn == "sumSeries") "sum" else "avg",
                col("value"), col("ts")).as("value"))
          case "diffSeries" | "divideSeries" | "asPercent" =>
            if (matchers.length != 2)
              fail(s"reduceSeries: $fn takes exactly 2 matchers, got ${matchers.length}")
            val v = fn match {
              case "diffSeries" =>
                when(role(0).isNotNull && role(1).isNotNull, role(0) - role(1))
              case "divideSeries" =>
                when(role(0).isNotNull && role(1).isNotNull && role(1) =!= 0.0,
                  role(0) / role(1))
              case "asPercent" =>
                when(role(0).isNotNull && role(1).isNotNull && role(1) =!= 0.0,
                  role(0) / role(1) * lit(100.0))
            }
            matched.groupBy(col("__key"), col("ts")).agg(v.as("value"))
          case other =>
            fail(s"reduceSeries: unsupported reduce function '$other' " +
              "(sumSeries, averageSeries, diffSeries, divideSeries, asPercent)")
        }
        reduced.select(
          concat(col("__key"), lit(".reduce." + fn)).as("metric"),
          col("ts"), col("value").cast("double").as("value"))

      case "verticalLine" =>
        // a marker at one timestamp (graphite draws a vertical rule);
        // bounds follow the timeSlice convention: epoch seconds, or a
        // signed time string relative to the window's `from`
        atLeast(1)
        if (args.length > 3) fail(s"verticalLine expects 1-3 arguments, got ${args.length}")
        val (f, u) = window.getOrElse(fail(
          s"$name needs a render window (serving path only)"))
        val at = args.head match {
          case TNum(v2, _) => v2.toLong
          case TStr(s2)    => f + seconds(s2)
          case other       => fail(s"verticalLine: bad timestamp '${other.canonical}'")
        }
        if (at < f || at > u)
          fail(s"verticalLine: ts $at outside the render window [$f, $u]")
        val label = args.lift(1).map(str).getOrElse(at.toString)
        val ss = org.apache.spark.sql.SparkSession.active
        import ss.implicits._
        Seq((label, at, 1.0)).toDF("metric", "ts", "value")

      // -- template re-evaluation: per-group / renamed re-fetch -----------
      // Both materialize a bounded NAME list on the driver (never point
      // data) and re-enter the evaluator per name — exactly graphite's own
      // evaluation shape for these two; the 512-name cap keeps the loop a
      // serving-tier cost, loudly, instead of an accidental 2M-plan fanout.
      case "applyByNode" =>
        // applyByNode(list, nodeNum, "template(%)"[, "newName(%)"]):
        // evaluate the template once per distinct node prefix, '%'
        // replaced by the prefix (servers.*.disk -> one template eval per
        // servers.sN)
        atLeast(3)
        if (args.length > 4) fail(s"applyByNode expects 3-4 arguments, got ${args.length}")
        val nodeNum = int(args(1))
        require(nodeNum >= 0, s"applyByNode node must be >= 0, got $nodeNum")
        val template = str(args(2))
        val newName = args.lift(3).map(str)
        val prefixes = sl0
          .select(array_join(slice(split(col("metric"), "\\."), 1, nodeNum + 1), "."))
          .distinct().limit(513).collect().map(_.getString(0)).sorted
        if (prefixes.length > 512)
          fail("applyByNode: > 512 node prefixes; narrow the glob")
        if (prefixes.isEmpty) sl0.limit(0)
        else prefixes.map { p =>
          val sub = evalWindowed(
            TargetLang.parse(template.replace("%", p)),
            wfetch, cropFrom, extraHistory, window)
          newName.fold(sub)(n => renamed(sub, n.replace("%", p)))
        }.reduce(_ unionByName _)

      case "aliasQuery" =>
        // aliasQuery(list, search, replace, newName): per input series,
        // regex-substitute its name into a NEW query, evaluate it, take
        // the resulting first series' last non-None value, and sprintf it
        // into newName — graphite's "label by another metric's current
        // value" idiom (e.g. channel power labeled by channel frequency).
        // Same bounded-512 loud re-entry shape as applyByNode; every
        // collect is ≤ 1 row. Python %-format backrefs (\1) become Java
        // ($1) for the substitution; %d truncates toward zero as Python's
        // does.
        arity(4)
        val search = str(args(1))
        val replace = str(args(2)).replaceAll("\\\\(\\d)", "\\$$1")
        val newName = str(args(3))
        val sl = sl0
        val names = sl.select(col("metric")).distinct().limit(513)
          .collect().map(_.getString(0)).sorted
        if (names.length > 512) fail("aliasQuery: > 512 series; narrow the glob")
        // empty input -> empty output (graphite's loop body never runs);
        // a zero-entry map() literal would fail analysis downstream
        if (names.isEmpty) return sl
        val renames = names.map { n =>
          val q = n.replaceAll(search, replace)
          val sub = evalWindowed(TargetLang.parse(q), wfetch, cropFrom,
            extraHistory, window)
          val firstRows = sub.select(min(col("metric"))).collect()
          val first = Option(firstRows.head.getString(0)).getOrElse(
            fail(s"aliasQuery: no series found with query: $q"))
          val lastRows = sub
            .where(col("metric") === first && col("value").isNotNull)
            .orderBy(col("ts").desc).limit(1).select(col("value")).collect()
          if (lastRows.isEmpty)
            fail(s"aliasQuery: cannot get last value of series: $first")
          n -> pyFormat(newName, lastRows.head.getDouble(0))
        }
        val lookup = map(renames.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
        sl.select(coalesce(element_at(lookup, col("metric")), col("metric")).as("metric"),
          col("ts"), col("value"))

      case "useSeriesAbove" =>
        // useSeriesAbove(list, value, "search", "replace"): for series
        // whose max clears the bar, fetch the search->replace renamed
        // sibling metric (the disk.bytes_free -> disk.bytes_used idiom)
        arity(4)
        val bar = num(args(1))
        val search = str(args(2)); val replace = str(args(3))
        val winners = sl0.groupBy(col("metric"))
          .agg(max(col("value")).as("__mx"))
          .where(col("__mx") > lit(bar))
          .select(col("metric")).limit(513).collect().map(_.getString(0)).sorted
        if (winners.length > 512)
          fail("useSeriesAbove: > 512 matching series; narrow the glob or raise the bar")
        if (winners.isEmpty) sl0.limit(0)
        else winners.map { m =>
          fetch(m.replaceAll(search, replace))
        }.reduce(_ unionByName _)

      // -- synthetic sources: series drawn from the render window ---------
      // These fetch nothing — the time axis IS the render window, so they
      // exist only on the windowed serving path; the windowless judged
      // entry point has no axis to draw on and 400s with a clear message.
      case "constantLine" | "threshold" =>
        // constantLine(v): a flat line, graphite's three points (from,
        // midpoint, until), named by the raw value text.
        // threshold(v[,label[,color]]) is its aliased presentation twin.
        atLeast(1)
        if (name == "constantLine") arity(1)
        else if (args.length > 3) fail(s"threshold expects 1-3 arguments, got ${args.length}")
        val v = num(args.head)
        val (f, u) = window.getOrElse(fail(
          s"$name needs a render window (serving path only)"))
        val label = (name, args.lift(1)) match {
          case ("threshold", Some(TStr(l))) => l
          case _                            => args.head.canonical
        }
        val ss = org.apache.spark.sql.SparkSession.active
        import ss.implicits._
        Seq(f, (f + u) / 2, u).distinct.map(t => (label, t, v))
          .toDF("metric", "ts", "value")

      case "sinFunction" =>
        // sin(ts)·amplitude on the window grid — the deterministic test
        // source (randomWalkFunction is deliberately absent: an engine
        // whose results must hash-match an oracle has no business emitting
        // nondeterminism)
        atLeast(1)
        if (args.length > 3) fail(s"sinFunction expects 1-3 arguments, got ${args.length}")
        val label = str(args.head)
        val amp = if (args.length >= 2) num(args(1)) else 1.0
        val step = if (args.length == 3) int(args(2)).toLong else 60L
        require(step > 0, s"sinFunction step must be > 0, got $step")
        val (f, u) = window.getOrElse(fail(
          s"$name needs a render window (serving path only)"))
        val ss = org.apache.spark.sql.SparkSession.active
        ss.range(0L, (u - f) / step + 1)
          .select(lit(label).as("metric"),
            (lit(f) + col("id") * step).as("ts"),
            (sin((lit(f) + col("id") * step).cast("double")) * amp)
              .cast("double").as("value"))

      case "timeFunction" | "time" | "identity" =>
        // time(name[, step=60]) / identity(name): value == its own epoch
        // timestamp at each step across the window — the test/reference
        // axis source. Generated distributed (spark.range), never a
        // driver-side list: a year at step 1 is 31M rows.
        atLeast(1)
        if (name == "identity") arity(1)
        else if (args.length > 2) fail(s"$name expects 1-2 arguments, got ${args.length}")
        val label = str(args.head)
        val step = if (args.length == 2) int(args(1)).toLong else 60L
        require(step > 0, s"$name step must be > 0, got $step")
        val (f, u) = window.getOrElse(fail(
          s"$name needs a render window (serving path only)"))
        val ss = org.apache.spark.sql.SparkSession.active
        ss.range(0L, (u - f) / step + 1)
          .select(lit(label).as("metric"),
            (lit(f) + col("id") * step).as("ts"),
            (lit(f) + col("id") * step).cast("double").as("value"))

      // -- presentation/no-op: display attributes and list ordering -------
      // These change how graphite-web DRAWS, not the data: identity here
      // keeps real dashboards working against /render. List order is
      // presentation too — /render always emits deterministic name order
      // (sortByName's result); the sortBy* variants' orders cannot ride a
      // DataFrame, which has no row order to carry.
      case "sortByName" | "sortByTotal" | "sortByMaxima" | "sortByMinima"
         | "sortBy" | "color" | "lineWidth" | "dashed" | "drawAsInfinite"
         | "secondYAxis" | "stacked" | "areaBetween" | "alpha" | "areaAlpha"
         | "cactiStyle" | "legendValue" | "setXFilesFactor" | "xFilesFactor" =>
        atLeast(1)
        // a bare/malformed factor must fail HERE, not silently pass as an
        // identity the summarize-side AST scan then ignores
        if (name == "setXFilesFactor" || name == "xFilesFactor") { xffOf(call); () }
        sl0

      case other =>
        fail(s"unknown render function '$other'")
    }
  }
}
