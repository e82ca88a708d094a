package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.serving.{TargetEval, TargetLang}

/** Render-language acceptance corpus (round-8 verdict item #4): ~110
  * real-world-shaped target strings — the idioms graphite-web's public
  * function docs give as canonical examples (nested aliasByNode, asPercent
  * totals, movingAverage-of-sum chains, groupByNode rollups, holtWinters
  * bands, tag queries) — parsed and evaluated over a synthetic server
  * estate. Every target must evaluate without error to a (metric, ts,
  * value) frame, non-empty unless listed otherwise, with all values finite
  * or null. This is the "does a real dashboard render" gate on top of
  * TargetSpec's per-function semantic pins.
  */
class AcceptanceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // ---- synthetic estate: 2h at step 60, dashboard-shaped tree ----------
  // servers.<host>.cpu.{user,system,idle}, memory.{used,free},
  // load.shortterm; stats.counters.requests.<code>.count (cumulative);
  // stats.timers.api.<verb>.{p50,p95,p99}; tagged cpu.total;dc=..;host=..
  private val T0 = 1700000000L - (1700000000L % 60)
  private val Slots = 30
  private val hosts = Seq("web01", "web02", "web03", "db01", "db02")

  private lazy val frame: DataFrame = {
    val rows = Seq.newBuilder[(String, Long, Option[Double])]
    for ((h, hi) <- hosts.zipWithIndex; k <- 0 until Slots) {
      val ts = T0 + k * 60L
      val user = 30.0 + 10 * hi + 15 * math.sin(k / 5.0 + hi)
      // web03 has a mid-window gap: null handling must flow through chains
      val gap = h == "web03" && k >= 10 && k < 14
      def put(m: String, v: Double): Unit =
        rows += ((m, ts, if (gap) None else Some(v)))
      put(s"servers.$h.cpu.user", user)
      put(s"servers.$h.cpu.system", 10.0 + 2 * hi + 3 * math.cos(k / 3.0))
      put(s"servers.$h.cpu.idle", 100.0 - user)
      put(s"servers.$h.memory.used", 4000.0 + 100 * hi + 40 * k)
      put(s"servers.$h.memory.free", 8000.0 - 100 * hi - 40 * k)
      put(s"servers.$h.load.shortterm", 0.5 + 0.1 * hi + 0.3 * math.sin(k / 4.0))
      val dc = if (hi < 3) "east" else "west"
      put(s"cpu.total;dc=$dc;host=$h", user + 10)
    }
    for (code <- Seq("2xx", "4xx", "5xx"); k <- 0 until Slots) {
      val base = Map("2xx" -> 50, "4xx" -> 7, "5xx" -> 3)(code)
      rows += ((s"stats.counters.requests.$code.count", T0 + k * 60L,
        Some(10.0 + base * k + (k % 5))))
    }
    for (verb <- Seq("get", "post"); p <- Seq("p50", "p95", "p99"); k <- 0 until Slots)
      rows += ((s"stats.timers.api.$verb.$p", T0 + k * 60L,
        Some(Map("p50" -> 40.0, "p95" -> 180.0, "p99" -> 420.0)(p) + 5 * math.sin(k / 3.0 + verb.length))))
    rows.result().toDF("metric", "ts", "value").cache()
  }

  /** Targets every dashboard idiom family; each evaluates over the estate. */
  private val corpus: Seq[String] = Seq(
    // combining
    "sumSeries(servers.*.cpu.user)",
    "averageSeries(servers.*.cpu.user)",
    "maxSeries(servers.*.cpu.*)",
    "minSeries(servers.web*.cpu.idle)",
    "diffSeries(servers.web01.memory.used,servers.web01.memory.free)",
    "divideSeries(stats.counters.requests.5xx.count,stats.counters.requests.2xx.count)",
    "multiplySeries(servers.web01.cpu.user,servers.web01.cpu.system)",
    "rangeOfSeries(servers.*.cpu.user)",
    "stddevSeries(servers.*.cpu.user)",
    "percentileOfSeries(servers.*.cpu.user,95)",
    "group(servers.web01.cpu.user,servers.db01.cpu.user)",
    "aggregate(servers.*.cpu.user,\"sum\")",
    "aggregate(servers.*.cpu.user,\"median\")",
    "countSeries(servers.*.cpu.user)",
    "weightedAverage(servers.*.cpu.user,servers.*.cpu.system,1)",
    "sumSeriesWithWildcards(servers.*.cpu.*,1)",
    "averageSeriesWithWildcards(servers.*.cpu.*,1)",
    "aggregateSeriesLists(servers.web0{1,2}.cpu.user,servers.web0{1,2}.cpu.system,\"sum\")",
    "divideSeriesLists(servers.web0{1,2}.cpu.user,servers.web0{1,2}.cpu.system)",
    "multiplySeriesLists(servers.web0{1,2}.cpu.user,servers.web0{1,2}.cpu.system)",
    "diffSeriesLists(servers.web0{1,2}.memory.used,servers.web0{1,2}.memory.free)",
    // alias family — the most common dashboard wrapper
    "alias(sumSeries(servers.*.cpu.user),\"Total CPU\")",
    "aliasByNode(servers.*.cpu.user,1)",
    "aliasByNode(servers.*.cpu.*,1,3)",
    "aliasByMetric(servers.web01.cpu.user)",
    "aliasSub(servers.*.cpu.user,\"^servers\\.\",\"srv.\")",
    "aliasByNode(movingAverage(servers.*.cpu.user,\"5min\"),1)",
    "aliasByNode(asPercent(stats.counters.requests.{4xx,5xx}.count,sumSeries(stats.counters.requests.*.count)),3)",
    // scaling / pointwise math
    "scale(servers.web01.cpu.user,0.001)",
    "scaleToSeconds(stats.counters.requests.2xx.count,1)",
    "offset(servers.web01.cpu.idle,-100)",
    "offsetToZero(servers.web01.load.shortterm)",
    "absolute(offset(servers.web01.cpu.user,-50))",
    "invert(servers.web01.cpu.user)",
    "logarithm(servers.web01.memory.used)",
    "squareRoot(servers.web01.memory.used)",
    "pow(servers.web01.cpu.user,2)",
    "exp(scale(servers.web01.cpu.user,0.01))",
    "sigmoid(scale(servers.web01.cpu.user,0.01))",
    "logit(scale(servers.web01.cpu.idle,0.001))",
    "round(divideSeries(servers.web01.memory.used,servers.web01.memory.free),2)",
    "minMax(servers.*.cpu.user)",
    // rate / counter handling
    "derivative(stats.counters.requests.2xx.count)",
    "nonNegativeDerivative(stats.counters.requests.2xx.count)",
    "perSecond(stats.counters.requests.2xx.count)",
    "integral(stats.counters.requests.2xx.count)",
    "integralByInterval(stats.counters.requests.2xx.count,\"30min\")",
    "delay(servers.web01.cpu.user,3)",
    "timeShift(servers.web01.cpu.user,\"30min\")",
    "timeStack(servers.web01.cpu.user,\"10min\",0,2)",
    "keepLastValue(servers.web03.cpu.user)",
    "keepLastValue(servers.web03.cpu.user,2)",
    "transformNull(servers.web03.cpu.user,0)",
    "interpolate(servers.web03.cpu.user)",
    "isNonNull(servers.web03.cpu.user)",
    "changed(servers.web01.cpu.user)",
    "cumulative(stats.counters.requests.2xx.count)",
    "consolidateBy(servers.web01.cpu.user,\"max\")",
    // moving windows
    "movingAverage(servers.web01.cpu.user,5)",
    "movingAverage(servers.*.cpu.user,\"10min\")",
    "movingSum(stats.counters.requests.2xx.count,\"15min\")",
    "movingMax(servers.web01.cpu.user,5)",
    "movingMin(servers.web01.cpu.user,5)",
    "movingMedian(servers.web01.cpu.user,\"10min\")",
    "movingWindow(servers.web01.cpu.user,\"10min\",\"avg\")",
    "exponentialMovingAverage(servers.web01.cpu.user,10)",
    "stdev(servers.web01.cpu.user,5)",
    "linearRegression(servers.web01.cpu.user)",
    "aggregateLine(servers.web01.cpu.user,\"avg\")",
    "nPercentile(servers.web01.cpu.user,95)",
    // series filtering
    "maximumAbove(servers.*.cpu.user,50)",
    "maximumBelow(servers.*.cpu.user,1000)",
    "averageAbove(servers.*.cpu.user,10)",
    "averageBelow(servers.*.cpu.user,1000)",
    "filterSeries(servers.*.cpu.user,\"max\",\">\",10)",
    "highestCurrent(servers.*.cpu.user,2)",
    "highestAverage(servers.*.cpu.user,2)",
    "highestMax(servers.*.cpu.user,3)",
    "lowestCurrent(servers.*.cpu.user,2)",
    "highest(servers.*.cpu.user,2,\"max\")",
    "lowest(servers.*.cpu.user,2,\"average\")",
    "mostDeviant(servers.*.cpu.user,2)",
    "averageOutsidePercentile(servers.*.cpu.user,90)",
    "removeAboveValue(servers.web01.cpu.user,99)",
    "removeBelowValue(servers.web01.cpu.user,1)",
    "removeAbovePercentile(servers.web01.cpu.user,95)",
    "removeBelowPercentile(servers.web01.cpu.user,5)",
    "removeBetweenPercentile(servers.*.cpu.user,95)",
    "removeEmptySeries(servers.*.cpu.user)",
    "exclude(servers.*.cpu.user,\"db\")",
    "grep(servers.*.cpu.user,\"web\")",
    "limit(sortByName(servers.*.cpu.user),3)",
    "unique(servers.web01.cpu.user,servers.web01.cpu.user)",
    "substr(servers.web01.cpu.user,1,3)",
    // sorting
    "sortByTotal(servers.*.cpu.user)",
    "sortByMaxima(servers.*.cpu.user)",
    "sortByMinima(servers.*.cpu.user)",
    "sortByName(servers.*.cpu.*)",
    // grouping / rollup — the heart of most dashboards
    "groupByNode(servers.*.cpu.*,3,\"sum\")",
    "groupByNodes(servers.*.cpu.*,\"avg\",1,3)",
    "applyByNode(servers.*.cpu.user,1,\"sumSeries(%.cpu.*)\")",
    "asPercent(servers.web01.cpu.user,sumSeries(servers.web01.cpu.*))",
    "asPercent(servers.*.cpu.user)",
    "asPercent(servers.web01.memory.used,100000)",
    "mapSeries(servers.*.memory.*,1)",
    "reduceSeries(mapSeries(servers.*.memory.*,1),\"diffSeries\",3,\"used\",\"free\")",
    // summarize family
    "summarize(stats.counters.requests.2xx.count,\"10min\",\"sum\")",
    "summarize(servers.web01.cpu.user,\"30min\",\"avg\",true)",
    "smartSummarize(servers.web01.cpu.user,\"30min\",\"max\")",
    "hitcount(stats.counters.requests.2xx.count,\"10min\")",
    "hitcount(stats.counters.requests.2xx.count,\"10min\",true)",
    // forecasting
    "holtWintersForecast(servers.web01.cpu.user)",
    "holtWintersConfidenceBands(servers.web01.cpu.user)",
    "holtWintersAberration(servers.web01.cpu.user)",
    // tags
    "seriesByTag(\"name=cpu.total\",\"dc=east\")",
    "groupByTags(seriesByTag(\"name=cpu.total\"),\"sum\",\"dc\")",
    "aliasByTags(seriesByTag(\"name=cpu.total\"),\"host\")",
    // fallback / misc
    "fallbackSeries(servers.nosuch.*,servers.web01.cpu.user)",
    "fallbackSeries(servers.web01.cpu.user,servers.db01.cpu.user)",
    // sibling-rename selection (the disk.bytes_free -> bytes_used idiom)
    "useSeriesAbove(servers.*.memory.used,1000,\"used\",\"free\")",
    // tag regex / not-equal matches (graphite tag query operators)
    "seriesByTag(\"name=cpu.total\",\"host=~web.*\")",
    "seriesByTag(\"name=cpu.total\",\"dc!=west\")",
    "groupByTags(seriesByTag(\"name=cpu.total\",\"host=~.*0[12]\"),\"avg\",\"dc\")",
    // absolute-bound slice (relative bounds need a render window)
    s"timeSlice(servers.web01.cpu.user,${1700000000L - (1700000000L % 60)},${1700000000L - (1700000000L % 60) + 600})")

  /** Window-dependent synthetic sources evaluated with a render window. */
  private val windowedCorpus: Seq[String] = Seq(
    "constantLine(123.4)",
    "threshold(90,\"danger\")",
    "timeFunction(\"t\")",
    "sinFunction(\"wave\",10)",
    "identity(\"x\")")

  private def evalOne(target: String, windowed: Boolean): Seq[(String, Long, Option[Double])] = {
    val expr = TargetLang.parse(target)
    val df =
      if (windowed)
        TargetEval.evalWindowed(expr, (g, _) => TargetEval.globFilter(frame, g),
          None, window = Some((T0, T0 + Slots * 60L)))
      else TargetEval.eval(expr, g => TargetEval.globFilter(frame, g))
    df.collect().map(r => (r.getString(0), r.getLong(1),
      if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSeq
  }

  test(s"acceptance: all ${corpus.size + windowedCorpus.size} dashboard targets evaluate to sane frames") {
    val failures = Seq.newBuilder[String]
    for ((target, windowed) <- corpus.map((_, false)) ++ windowedCorpus.map((_, true))) {
      try {
        val rows = evalOne(target, windowed)
        if (rows.isEmpty) failures += s"$target: EMPTY result"
        else {
          if (rows.exists(_._1.isEmpty)) failures += s"$target: empty series name"
          if (rows.exists(r => r._3.exists(v => v.isNaN || v.isInfinite)))
            failures += s"$target: non-finite value"
        }
      } catch {
        case e: Throwable =>
          failures += s"$target: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(160)}"
      }
    }
    val fs = failures.result()
    assert(fs.isEmpty, s"\n${fs.size} corpus failures:\n${fs.mkString("\n")}")
  }
}
