package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame

import graft.serving._

/** Render-target language: parser shape/error cases, and evaluator
  * semantics against first-principles expectations over a tiny
  * hand-computed series frame (two series, step 10, with gaps).
  */
class TargetSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // ---- parser -----------------------------------------------------------

  test("parser: paths, numbers, strings, nesting, glob commas") {
    assert(TargetLang.parse("app.cpu.user") == TPath("app.cpu.user"))
    assert(TargetLang.parse("scale(a.b,0.5)") ==
      TCall("scale", List(TPath("a.b"), TNum(0.5, "0.5"))))
    assert(TargetLang.parse("""alias(a.b,"total")""") ==
      TCall("alias", List(TPath("a.b"), TStr("total"))))
    // commas inside {} belong to the glob, not the arg list
    assert(TargetLang.parse("sumSeries(app.{a,b}.u[0-2])") ==
      TCall("sumSeries", List(TPath("app.{a,b}.u[0-2]"))))
    val nested = TargetLang.parse("groupByNode(summarize(a.*,\"1h\",\"max\"),1,\"avg\")")
    assert(nested == TCall("groupByNode", List(
      TCall("summarize", List(TPath("a.*"), TStr("1h"), TStr("max"))),
      TNum(1, "1"), TStr("avg"))))
    // canonical round-trips re-parse to the same tree
    assert(TargetLang.parse(nested.canonical) == nested)
    // whitespace-insensitive
    assert(TargetLang.parse(" scale( a.b , 2 ) ") ==
      TCall("scale", List(TPath("a.b"), TNum(2, "2"))))
  }

  test("parser: malformed input is a client error") {
    for (bad <- Seq("", "scale(a.b", "scale(a.b,)", "f(a))", "alias(a,\"x)",
                    "app.{a,b", "a b"))
      assertThrows[IllegalArgumentException](TargetLang.parse(bad))
  }

  test("parser property: canonical re-parses to the identical AST (300 generated trees)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val identGen = Gen.oneOf("scale", "sumSeries", "f", "alias_fn", "g2")
    val pathGen: Gen[TExpr] = for {
      n <- Gen.chooseNum(1, 4)
      comps <- Gen.listOfN(n,
        Gen.oneOf("app", "cpu", "u*", "x?", "[0-2]", "{a,b}", "req;dc=east"))
    } yield TPath(comps.mkString("."))
    val numGen: Gen[TExpr] =
      Gen.oneOf(TNum(0.5, "0.5"), TNum(-3, "-3"), TNum(10, "10"), TNum(2.25, "2.25"))
    val strGen: Gen[TExpr] =
      Gen.oneOf(TStr("1h"), TStr("max"), TStr("name=cpu"), TStr("a b"), TStr(""))
    def exprGen(depth: Int): Gen[TExpr] =
      if (depth == 0) Gen.oneOf(pathGen, numGen, strGen)
      else Gen.frequency(
        2 -> pathGen, 1 -> numGen, 1 -> strGen,
        3 -> (for {
          name <- identGen
          n <- Gen.chooseNum(0, 3)
          args <- Gen.listOfN(n, exprGen(depth - 1))
        } yield TCall(name, args)))
    for (i <- 0 until 300) {
      val e = exprGen(3).pureApply(Gen.Parameters.default, Seed(i.toLong))
      assert(TargetLang.parse(e.canonical) == e,
        s"round-trip failed for: ${e.canonical}")
    }
  }

  test("path glob regex: * and ? never cross a dot; braces and classes work") {
    val re = TargetEval.pathRegex("app.*.u[0-2]")
    assert("app.click.u0".matches(re))
    assert(!"app.click.extra.u0".matches(re))   // * confined to one node
    assert(!"app.click.u3".matches(re))
    val re2 = TargetEval.pathRegex("app.{click,view}.u?")
    assert("app.view.u1".matches(re2) && !"app.buy.u1".matches(re2))
    assert(!"app.view.u11".matches(re2))        // ? is exactly one char
    assertThrows[IllegalArgumentException](TargetEval.pathRegex("a.[bad"))
  }

  // ---- evaluator --------------------------------------------------------

  /** Two step-10 series; s.b has a null gap at ts=20 and none at ts=40. */
  private def frame: DataFrame =
    Seq[(String, Long, Option[Double])](
      ("s.a.x", 10L, Some(1.0)), ("s.a.x", 20L, Some(3.0)),
      ("s.a.x", 30L, Some(2.0)), ("s.a.x", 40L, Some(8.0)),
      ("s.b.x", 10L, Some(10.0)), ("s.b.x", 20L, None),
      ("s.b.x", 30L, Some(30.0))
    ).toDF("metric", "ts", "value")

  private def ev(target: String): Map[(String, Long), Option[Double]] =
    TargetEval.eval(TargetLang.parse(target),
        glob => TargetEval.globFilter(frame, glob))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toMap

  test("sumSeries skips nulls per timestamp; name is the call text") {
    val m = ev("sumSeries(s.*.x)")
    assert(m == Map(
      ("sumSeries(s.*.x)", 10L) -> Some(11.0),
      ("sumSeries(s.*.x)", 20L) -> Some(3.0),   // s.b gap skipped
      ("sumSeries(s.*.x)", 30L) -> Some(32.0),
      ("sumSeries(s.*.x)", 40L) -> Some(8.0)))
  }

  test("averageSeries divides by the non-null count") {
    val m = ev("averageSeries(s.*.x)")
    assert(m(("averageSeries(s.*.x)", 20L)) == Some(3.0)) // 3/1, not 3/2
    assert(m(("averageSeries(s.*.x)", 10L)) == Some(5.5))
  }

  test("scale wraps each series' own name (no cross-series collision)") {
    val m = ev("scale(s.*.x,2)")
    assert(m(("scale(s.a.x,2)", 20L)) == Some(6.0))
    assert(m(("scale(s.b.x,2)", 20L)) == None)   // null stays null
    assert(m.size == 7)
  }

  test("derivative family: first point null, resets null for nonNegative") {
    val d = ev("derivative(s.a.x)")
    assert(d(("derivative(s.a.x)", 10L)) == None)
    assert(d(("derivative(s.a.x)", 30L)) == Some(-1.0))
    val nn = ev("nonNegativeDerivative(s.a.x)")
    assert(nn(("nonNegativeDerivative(s.a.x)", 30L)) == None) // reset
    assert(nn(("nonNegativeDerivative(s.a.x)", 40L)) == Some(6.0))
    val ps = ev("perSecond(s.a.x)")
    assert(ps(("perSecond(s.a.x)", 40L)) == Some(0.6))
  }

  test("integral accumulates through gaps, emits null at gaps") {
    val m = ev("integral(s.b.x)")
    assert(m(("integral(s.b.x)", 10L)) == Some(10.0))
    assert(m(("integral(s.b.x)", 20L)) == None)
    assert(m(("integral(s.b.x)", 30L)) == Some(40.0))
  }

  test("movingAverage over slots, null-aware") {
    val m = ev("movingAverage(s.a.x,2)")
    assert(m(("movingAverage(s.a.x,2)", 10L)) == Some(1.0))
    assert(m(("movingAverage(s.a.x,2)", 40L)) == Some(5.0))
    // window with one null: averages the single non-null value
    val b = ev("movingAverage(s.b.x,2)")
    assert(b(("movingAverage(s.b.x,2)", 20L)) == Some(10.0))
  }

  test("keepLastValue forward-fills, honoring the slot limit") {
    val m = ev("keepLastValue(s.b.x)")
    assert(m(("keepLastValue(s.b.x)", 20L)) == Some(10.0))
    // limit 0 is rejected; a gap longer than the limit stays null
    assertThrows[IllegalArgumentException](ev("keepLastValue(s.b.x,0)"))
    val lim = ev("keepLastValue(s.b.x,1)")
    assert(lim(("keepLastValue(s.b.x,1)", 20L)) == Some(10.0))
  }

  test("summarize re-buckets per series with graphite renaming") {
    val m = ev("summarize(s.a.x,\"20\",\"sum\")")
    // buckets [0,20): ts10 -> 1; [20,40): 3+2 -> 5; [40,60): 8
    assert(m == Map(
      ("summarize(s.a.x,\"20\",\"sum\")", 0L) -> Some(1.0),
      ("summarize(s.a.x,\"20\",\"sum\")", 20L) -> Some(5.0),
      ("summarize(s.a.x,\"20\",\"sum\")", 40L) -> Some(8.0)))
    val last = ev("summarize(s.a.x,\"20\",\"last\")")
    assert(last(("summarize(s.a.x,\"20\",\"last\")", 20L)) == Some(2.0))
  }

  test("timeShift relabels forward; alias and aliasByNode rename") {
    val m = ev("timeShift(s.a.x,\"30\")")
    assert(m(("timeShift(s.a.x,\"30\")", 40L)) == Some(1.0))
    val a = ev("alias(sumSeries(s.*.x),\"total\")")
    assert(a(("total", 10L)) == Some(11.0))
    val n = ev("aliasByNode(s.*.x,1)")
    assert(n(("a", 10L)) == Some(1.0) && n(("b", 10L)) == Some(10.0))
  }

  test("groupByNode aggregates by name component") {
    val m = ev("groupByNode(s.*.x,2,\"sum\")")  // node 2 == "x" for both
    assert(m(("x", 10L)) == Some(11.0))
    assert(m(("x", 20L)) == Some(3.0))
  }

  test("grep/exclude filter; highestAverage selects deterministically") {
    assert(ev("grep(s.*.x,\"b\")").keys.nonEmpty &&
      ev("grep(s.*.x,\"b\")").keys.forall(_._1 == "s.b.x"))
    assert(ev("exclude(s.*.x,\"b\")").keys.nonEmpty &&
      ev("exclude(s.*.x,\"b\")").keys.forall(_._1 == "s.a.x"))
    // avg(s.a.x)=3.5, avg(s.b.x)=20 -> b wins at k=1, names unchanged
    val m = ev("highestAverage(s.*.x,1)")
    assert(m.keys.map(_._1).toSet == Set("s.b.x"))
    val lo = ev("lowestAverage(s.*.x,1)")
    assert(lo.keys.map(_._1).toSet == Set("s.a.x"))
  }

  test("transformNull / removeBelowValue / absolute / offset") {
    val t = ev("transformNull(s.b.x,-1)")
    assert(t(("transformNull(s.b.x,-1)", 20L)) == Some(-1.0))
    val r = ev("removeBelowValue(s.a.x,3)")
    assert(r(("removeBelowValue(s.a.x,3)", 10L)) == None)
    assert(r(("removeBelowValue(s.a.x,3)", 20L)) == Some(3.0))
    val o = ev("offset(absolute(scale(s.a.x,-1)),1)")
    assert(o(("offset(absolute(scale(s.a.x,-1)),1)", 40L)) == Some(9.0))
  }

  test("divideSeries: pointwise ratio, zero/missing divisor -> null") {
    val m = ev("divideSeries(s.a.x,sumSeries(s.b.x))")
    assert(m(("divideSeries(s.a.x,sumSeries(s.b.x))", 10L)) == Some(0.1))
    assert(m(("divideSeries(s.a.x,sumSeries(s.b.x))", 20L)) == None)  // null divisor
    assert(m(("divideSeries(s.a.x,sumSeries(s.b.x))", 40L)) == None)  // no divisor point
    // a multi-series divisor is a client error, not a silent fan-out join
    assertThrows[IllegalArgumentException](ev("divideSeries(s.a.x,s.*.x)"))
  }

  test("diffSeries: single minuend minus the None-skipping sum of the rest") {
    val m = ev("diffSeries(s.b.x,s.a.x)")
    assert(m(("diffSeries(s.b.x,s.a.x)", 10L)) == Some(9.0))
    assert(m(("diffSeries(s.b.x,s.a.x)", 20L)) == None)    // minuend gap stays None
    assert(m(("diffSeries(s.b.x,s.a.x)", 30L)) == Some(28.0))
    assertThrows[IllegalArgumentException](ev("diffSeries(s.*.x,s.a.x)"))
  }

  test("asPercent: share of list total, constant total, and series total") {
    val m = ev("asPercent(s.*.x)")
    assert(m(("asPercent(s.a.x)", 10L)) == Some(1.0 / 11.0 * 100.0))
    assert(m(("asPercent(s.b.x)", 20L)) == None)           // own gap stays None
    assert(m(("asPercent(s.a.x)", 20L)) == Some(100.0))    // sole contributor
    val c = ev("asPercent(s.a.x,4)")
    assert(c(("asPercent(s.a.x,4)", 20L)) == Some(75.0))
    val t = ev("asPercent(s.a.x,s.b.x)")
    assert(t(("asPercent(s.a.x,s.b.x)", 10L)) == Some(10.0))
    assert(t(("asPercent(s.a.x,s.b.x)", 40L)) == None)     // total has no point
  }

  test("evaluator rejects type and arity errors, unknown functions") {
    for (bad <- Seq("scale(s.a.x)", "scale(s.a.x,\"2\")", "summarize(s.a.x,\"0\",\"sum\")",
                    "summarize(s.a.x,\"1h\",\"median\")", "frobnicate(s.a.x)",
                    "alias(5,\"x\")", "movingAverage(s.a.x,1.5)"))
      assertThrows[IllegalArgumentException](ev(bad))
  }

  // ---- round-6 function-library expansion -------------------------------

  test("rangeOfSeries / stddevSeries aggregate the non-null spread per ts") {
    val r = ev("rangeOfSeries(s.*.x)")
    assert(r(("rangeOfSeries(s.*.x)", 10L)) == Some(9.0))
    assert(r(("rangeOfSeries(s.*.x)", 20L)) == Some(0.0))  // lone value
    assert(r(("rangeOfSeries(s.*.x)", 30L)) == Some(28.0))
    val sd = ev("stddevSeries(s.*.x)")
    assert(sd(("stddevSeries(s.*.x)", 10L)) == Some(4.5))  // pop stddev of {1,10}
    assert(sd(("stddevSeries(s.*.x)", 20L)) == Some(0.0))
  }

  test("multiplySeries is None-strict (any gap nulls the product)") {
    val m = ev("multiplySeries(s.*.x)")
    assert(m(("multiplySeries(s.*.x)", 10L)) == Some(10.0))
    assert(m(("multiplySeries(s.*.x)", 20L)) == None)   // s.b gap -> None
    assert(m(("multiplySeries(s.*.x)", 30L)) == Some(60.0))
    assert(m(("multiplySeries(s.*.x)", 40L)) == Some(8.0))
  }

  test("percentileOfSeries uses graphite's non-interpolating rank") {
    val m = ev("percentileOfSeries(s.*.x,50)")
    // rank = ceil(0.5 * (n+1)): n=2 -> rank 2 (upper median), n=1 -> rank 1
    assert(m(("percentileOfSeries(s.*.x,50)", 10L)) == Some(10.0))
    assert(m(("percentileOfSeries(s.*.x,50)", 20L)) == Some(3.0))
    assert(m(("percentileOfSeries(s.*.x,50)", 30L)) == Some(30.0))
    assertThrows[IllegalArgumentException](ev("percentileOfSeries(s.*.x,101)"))
  }

  test("group concatenates series lists; names survive") {
    val m = ev("group(s.a.x,s.b.x)")
    assert(m.size == 7 && m.keys.map(_._1).toSet == Set("s.a.x", "s.b.x"))
  }

  test("sum/averageSeriesWithWildcards collapse the stripped name") {
    val m = ev("sumSeriesWithWildcards(s.*.x,1)")
    assert(m == Map(
      ("s.x", 10L) -> Some(11.0), ("s.x", 20L) -> Some(3.0),
      ("s.x", 30L) -> Some(32.0), ("s.x", 40L) -> Some(8.0)))
    val a = ev("averageSeriesWithWildcards(s.*.x,1)")
    assert(a(("s.x", 10L)) == Some(5.5))
  }

  test("invert / logarithm / pow / squareRoot null the domain errors") {
    val i = ev("invert(s.a.x)")
    assert(i(("invert(s.a.x)", 20L)) == Some(1.0 / 3.0))
    // 1/0 is None, like graphite's safeDiv
    assert(ev("invert(transformNull(s.b.x,0))")
      .apply(("invert(transformNull(s.b.x,0))", 20L)) == None)
    val lg = ev("logarithm(s.a.x)")
    assert(lg(("logarithm(s.a.x)", 10L)) == Some(0.0))
    val lg2 = ev("logarithm(s.a.x,2)")
    assert(lg2(("logarithm(s.a.x,2)", 40L)) == Some(3.0))
    assert(ev("logarithm(scale(s.a.x,-1))").values.forall(_ == None))
    assertThrows[IllegalArgumentException](ev("logarithm(s.a.x,1)"))
    val p = ev("pow(s.a.x,2)")
    assert(p(("pow(s.a.x,2)", 20L)) == Some(9.0))
    // (-v)^0.5 is a domain error -> None; 0^-1 (Infinity) likewise
    assert(ev("pow(scale(s.a.x,-1),0.5)").values.forall(_ == None))
    assert(ev("pow(transformNull(s.b.x,0),-1)")
      .apply(("pow(transformNull(s.b.x,0),-1)", 20L)) == None)
    val sq = ev("squareRoot(s.a.x)")
    assert(sq(("squareRoot(s.a.x)", 40L)) == Some(math.sqrt(8.0)))
    assert(ev("squareRoot(scale(s.a.x,-1))").values.forall(_ == None))
  }

  test("isNonNull maps gaps to 0 and values to 1") {
    val m = ev("isNonNull(s.b.x)")
    assert(m == Map(
      ("isNonNull(s.b.x)", 10L) -> Some(1.0),
      ("isNonNull(s.b.x)", 20L) -> Some(0.0),
      ("isNonNull(s.b.x)", 30L) -> Some(1.0)))
  }

  test("offsetToZero subtracts each series' own minimum") {
    val m = ev("offsetToZero(s.a.x)")
    assert(m(("offsetToZero(s.a.x)", 10L)) == Some(0.0))
    assert(m(("offsetToZero(s.a.x)", 40L)) == Some(7.0))
  }

  test("delay shifts slots, vacated slots None; negative shifts back") {
    val m = ev("delay(s.a.x,1)")
    assert(m(("delay(s.a.x,1)", 10L)) == None)
    assert(m(("delay(s.a.x,1)", 40L)) == Some(2.0))
    val b = ev("delay(s.a.x,-1)")
    assert(b(("delay(s.a.x,-1)", 10L)) == Some(3.0))
    assert(b(("delay(s.a.x,-1)", 40L)) == None)
  }

  test("integralByInterval resets the running sum at bucket boundaries") {
    val m = ev("integralByInterval(s.a.x,\"20\")")
    assert(m(("integralByInterval(s.a.x,\"20\")", 20L)) == Some(3.0)) // reset
    assert(m(("integralByInterval(s.a.x,\"20\")", 30L)) == Some(5.0))
    assert(m(("integralByInterval(s.a.x,\"20\")", 40L)) == Some(8.0)) // reset
    val b = ev("integralByInterval(s.b.x,\"20\")")
    assert(b(("integralByInterval(s.b.x,\"20\")", 20L)) == None)      // gap stays None
    assert(b(("integralByInterval(s.b.x,\"20\")", 30L)) == Some(30.0))
  }

  test("movingSum / movingMax / movingMin over slots, null-aware") {
    val s = ev("movingSum(s.a.x,2)")
    assert(s(("movingSum(s.a.x,2)", 20L)) == Some(4.0))
    assert(s(("movingSum(s.a.x,2)", 40L)) == Some(10.0))
    val mx = ev("movingMax(s.a.x,3)")
    assert(mx(("movingMax(s.a.x,3)", 30L)) == Some(3.0))
    assert(mx(("movingMax(s.a.x,3)", 40L)) == Some(8.0))
    val mn = ev("movingMin(s.b.x,2)")
    assert(mn(("movingMin(s.b.x,2)", 20L)) == Some(10.0)) // null skipped
    // a window of only the gap row is None
    val one = ev("movingMin(s.b.x,1)")
    assert(one(("movingMin(s.b.x,1)", 20L)) == None)
  }

  test("aliasSub rewrites names with graphite backreferences") {
    val m = ev("aliasSub(s.*.x,\"^s\\.(.)\\.x$\",\"m_\\1\")")
    assert(m.keys.map(_._1).toSet == Set("m_a", "m_b"))
    assert(m(("m_a", 10L)) == Some(1.0))
    assertThrows[IllegalArgumentException](ev("aliasSub(s.*.x,\"[bad\",\"x\")"))
    // a literal '$' in the replacement stays literal (re.sub semantics),
    // never a Java group reference crashing executor-side
    val dollar = ev("aliasSub(s.a.x,\"^s\",\"$\")")
    assert(dollar.keys.map(_._1).toSet == Set("$.a.x"))
    // a backreference past the pattern's group count is a client error
    assertThrows[IllegalArgumentException](ev("aliasSub(s.*.x,\"(a)\",\"\\2\")"))
  }

  test("filterSeries family keeps series clearing the bar, names unchanged") {
    // avg a=3.5 b=20; max a=8 b=30; min a=1 b=10; current a=8 b=30
    def names(t: String): Set[String] = ev(t).keys.map(_._1).toSet
    assert(names("averageAbove(s.*.x,5)") == Set("s.b.x"))
    assert(names("averageBelow(s.*.x,5)") == Set("s.a.x"))
    assert(names("maximumAbove(s.*.x,8)") == Set("s.b.x"))   // strict >
    assert(names("maximumBelow(s.*.x,10)") == Set("s.a.x"))
    assert(names("minimumAbove(s.*.x,1)") == Set("s.b.x"))   // strict >
    assert(names("minimumBelow(s.*.x,5)") == Set("s.a.x"))
    assert(names("currentAbove(s.*.x,9)") == Set("s.b.x"))
    assert(names("currentBelow(s.*.x,9)") == Set("s.a.x"))
    assert(names("averageAbove(s.*.x,0)") == Set("s.a.x", "s.b.x"))
  }

  test("named Above/Below filters (window path) == filterSeries (agg path) on a random gappy frame") {
    // the named eight evaluate their per-series statistic as a window;
    // generic filterSeries still uses the groupBy+semi-join statFor shape —
    // equality here pins the two implementations to the same semantics
    // (gaps, an all-null series, negative values, several thresholds)
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(20260815)
    val rows = for { s <- 0 until 12; t <- 0 until 40 } yield (
      s"r.s$s.x", t * 10L,
      if (s == 11) None // all-null series: NULL stat must fail > and <
      else if (rnd.nextInt(5) == 0) None
      else Some(math.round(rnd.nextDouble() * 2000.0 - 1000.0) / 100.0))
    val f = rows.toDF("metric", "ts", "value")
      .select(col("metric"), col("ts"), col("value").cast("double"))
    def run(t: String): Map[(String, Long), Option[Double]] =
      TargetEval.eval(TargetLang.parse(t), g => TargetEval.globFilter(f, g))
        .collect().map(r => (r.getString(0), r.getLong(1)) ->
          (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    val pairs = Seq(
      ("averageAbove", "average", ">"), ("averageBelow", "average", "<"),
      ("maximumAbove", "max", ">"), ("maximumBelow", "max", "<"),
      ("minimumAbove", "min", ">"), ("minimumBelow", "min", "<"),
      ("currentAbove", "current", ">"), ("currentBelow", "current", "<"))
    var sawRows = false
    for ((named, func, op) <- pairs; n <- Seq(-3.0, 0.0, 2.5)) {
      val a = run(s"$named(r.*.x,$n)")
      val b = run(s"""filterSeries(r.*.x,"$func","$op",$n)""")
      assert(a == b, s"$named(r.*.x,$n) diverged from filterSeries($func,$op)")
      sawRows |= a.nonEmpty
    }
    // guard against vacuous equality across the WHOLE sweep: if every
    // (named, n) combination filtered everything out, the equalities above
    // proved nothing about the window-vs-agg semantics
    assert(sawRows, "every Above/Below combination returned zero series")
  }

  test("highestCurrent / lowestCurrent select by the last non-null value") {
    assert(ev("highestCurrent(s.*.x,1)").keys.map(_._1).toSet == Set("s.b.x"))
    assert(ev("lowestCurrent(s.*.x,1)").keys.map(_._1).toSet == Set("s.a.x"))
  }

  test("limit takes the first n series in name order") {
    val m = ev("limit(s.*.x,1)")
    assert(m.keys.map(_._1).toSet == Set("s.a.x") && m.size == 4)
    assert(ev("limit(s.*.x,0)").isEmpty)
  }

  test("limit over sortBy* selects by the sort statistic, not name order") {
    // max a=8 b=30; min a=1 b=10; total a=14 b=40
    assert(ev("limit(sortByMaxima(s.*.x),1)").keys.map(_._1).toSet == Set("s.b.x"))
    assert(ev("limit(sortByMinima(s.*.x),1)").keys.map(_._1).toSet == Set("s.a.x"))
    assert(ev("limit(sortByTotal(s.*.x),1)").keys.map(_._1).toSet == Set("s.b.x"))
    assert(ev("limit(sortByName(s.*.x),1)").keys.map(_._1).toSet == Set("s.a.x"))
  }

  test("removeAbove/BelowPercentile null points beyond the series' own rank percentile") {
    // s.a sorted [1,2,3,8]: p50 rank ceil(0.5*5)=3 -> percentile 3
    val ab = ev("removeAbovePercentile(s.a.x,50)")
    assert(ab(("removeAbovePercentile(s.a.x,50)", 20L)) == Some(3.0)) // == kept
    assert(ab(("removeAbovePercentile(s.a.x,50)", 40L)) == None)      // 8 > 3
    val be = ev("removeBelowPercentile(s.a.x,50)")
    assert(be(("removeBelowPercentile(s.a.x,50)", 10L)) == None)      // 1 < 3
    assert(be(("removeBelowPercentile(s.a.x,50)", 40L)) == Some(8.0))
    assertThrows[IllegalArgumentException](ev("removeAbovePercentile(s.a.x,-1)"))
  }

  test("stdev computes a moving population stddev with window tolerance") {
    val m = ev("stdev(s.a.x,2)")
    assert(m(("stdev(s.a.x,2)", 10L)) == Some(0.0))  // single-point window
    assert(m(("stdev(s.a.x,2)", 20L)) == Some(1.0))  // {1,3}
    assert(m(("stdev(s.a.x,2)", 30L)) == Some(0.5))  // {3,2}
    assert(m(("stdev(s.a.x,2)", 40L)) == Some(3.0))  // {2,8}
    // gap-only window fails the 10% tolerance -> None
    val one = ev("stdev(s.b.x,1)")
    assert(one(("stdev(s.b.x,1)", 20L)) == None)
    // gap inside a wider window: stddev of the remaining value
    val two = ev("stdev(s.b.x,2)")
    assert(two(("stdev(s.b.x,2)", 20L)) == Some(0.0))
  }

  test("changed flags value transitions; substr slices name nodes") {
    val c = ev("changed(s.b.x)")
    assert(c == Map(
      ("changed(s.b.x)", 10L) -> Some(0.0),   // first point
      ("changed(s.b.x)", 20L) -> Some(0.0),   // gap emits 0
      ("changed(s.b.x)", 30L) -> Some(1.0)))  // vs last NON-NULL (10), not the gap
    val ca = ev("changed(s.a.x)")
    assert(ca(("changed(s.a.x)", 20L)) == Some(1.0))
    val sub = ev("substr(s.*.x,1)")
    assert(sub.keys.map(_._1).toSet == Set("a.x", "b.x"))
    val mid = ev("substr(s.*.x,1,2)")
    assert(mid.keys.map(_._1).toSet == Set("a", "b"))
    // function wrappers are stripped before slicing, as in graphite
    val wrap = ev("substr(sumSeries(s.a.x),0,2)")
    assert(wrap.keys.map(_._1).toSet == Set("s.a"))
    // negative indices count from the end (python-slice semantics)
    val neg = ev("substr(s.*.x,-2)")
    assert(neg.keys.map(_._1).toSet == Set("a.x", "b.x"))
    val negStop = ev("substr(s.*.x,0,-1)")
    assert(negStop.keys.map(_._1).toSet == Set("s.a", "s.b"))
  }

  test("weightedAverage joins lists on name nodes and weights per ts") {
    // avg list = s.a.x/s.b.x values; weight list = w.a.x/w.b.x
    val wts = Seq[(String, Long, Option[Double])](
      ("w.a.x", 10L, Some(1.0)), ("w.a.x", 20L, Some(1.0)),
      ("w.b.x", 10L, Some(3.0)), ("w.b.x", 20L, Some(2.0))
    ).toDF("metric", "ts", "value")
    val all = frame.unionByName(wts)
    val m = TargetEval.eval(
      TargetLang.parse("weightedAverage(s.*.x,w.*.x,1)"),
      glob => TargetEval.globFilter(all, glob))
      .collect()
      .map(r => r.getLong(1) -> (if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toMap
    // ts10: (1*1 + 10*3)/(1+3) = 7.75
    // ts20: numerator skips the s.b gap pair (3*1=3) but the denominator
    // still sums ALL weights (1+2=3), graphite's sumSeries(weights) -> 1.0
    assert(m(10L) == Some(7.75))
    assert(m(20L) == Some(1.0))
    // no weights at ts30/40 -> no denominator slot
    assert(!m.contains(30L) && !m.contains(40L))
    assertThrows[IllegalArgumentException](ev("weightedAverage(s.*.x,s.*.x)"))
  }

  test("averageOutsidePercentile / removeBetweenPercentile band filters") {
    // four flat series with averages 1, 2, 3, 10 at a single ts
    val f = Seq[(String, Long, Option[Double])](
      ("q.m1.x", 10L, Some(1.0)), ("q.m2.x", 10L, Some(2.0)),
      ("q.m3.x", 10L, Some(3.0)), ("q.m4.x", 10L, Some(10.0))
    ).toDF("metric", "ts", "value")
    def names(t: String): Set[String] =
      TargetEval.eval(TargetLang.parse(t), g => TargetEval.globFilter(f, g))
        .collect().map(_.getString(0)).toSet
    // p=75: sorted [1,2,3,10], hi = rank ceil(.75*5)=4 -> 10, lo = rank 2 -> 2
    // outside the strict band (2,10): m1 (1), m2 (edge 2), m4 (edge 10)
    assert(names("averageOutsidePercentile(q.*.x,75)") == Set("q.m1.x", "q.m2.x", "q.m4.x"))
    // n<50 normalizes to 100-n: same result
    assert(names("averageOutsidePercentile(q.*.x,25)") == Set("q.m1.x", "q.m2.x", "q.m4.x"))
    assert(names("removeBetweenPercentile(q.*.x,75)") == Set("q.m1.x", "q.m2.x", "q.m4.x"))
    assertThrows[IllegalArgumentException](ev("removeBetweenPercentile(s.*.x,101)"))
  }

  test("timeStack emits shifted copies named per step") {
    val m = ev("timeStack(s.a.x,\"10\",0,2)")
    // copy 0 unshifted, copy 1 labeled one 10s step later
    assert(m(("timeShift(s.a.x,\"10\",0)", 10L)) == Some(1.0))
    assert(m(("timeShift(s.a.x,\"10\",1)", 20L)) == Some(1.0))
    assert(m.size == 8)
    assertThrows[IllegalArgumentException](ev("timeStack(s.a.x,\"10\",2,2)"))
    // graphite's optional-arg default is 7 daily steps
    assert(ev("timeStack(s.a.x)").size == 28)
    // an Int-overflowing range is a 400, never a multi-billion-step explode
    assertThrows[IllegalArgumentException](
      ev("timeStack(s.a.x,\"10\",-2000000000,2000000000)"))
  }

  test("holtWinters family: forecast, bands, aberration (hand-computed recurrence)") {
    def approx(a: Option[Double], b: Double): Boolean =
      a.exists(v => math.abs(v - b) < 1e-9)
    // s.a.x = 1,3,2,8; short series -> seasonal terms AND the seasonal
    // deviation feedback (one season ago) are all 0:
    //   i0: pred=1, intercept=1, slope=0, dev=0
    //   i1: pred=1, intercept=1.2, slope=0.0007, dev=0.1*|3-1|=0.2
    //   i2: pred=1.2007, dev=0.1*|2-1.2007|=0.07993
    //   i3: pred=1.281609755, dev=0.1*|8-pred|=0.6718390245
    val f = ev("holtWintersForecast(s.a.x)")
    assert(approx(f(("holtWintersForecast(s.a.x)", 10L)), 1.0))
    assert(approx(f(("holtWintersForecast(s.a.x)", 30L)), 1.2007))
    assert(approx(f(("holtWintersForecast(s.a.x)", 40L)), 1.281609755))
    val b = ev("holtWintersConfidenceBands(s.a.x)")
    assert(approx(b(("holtWintersConfidenceUpper(s.a.x)", 20L)), 1.6))   // 1 + 3*0.2
    assert(approx(b(("holtWintersConfidenceLower(s.a.x)", 20L)), 0.4))
    val ab = ev("holtWintersAberration(s.a.x)")
    assert(approx(ab(("holtWintersAberration(s.a.x)", 10L)), 0.0))       // inside bands
    assert(approx(ab(("holtWintersAberration(s.a.x)", 20L)), 1.4))       // 3 - 1.6
    assert(approx(ab(("holtWintersAberration(s.a.x)", 40L)),
      8.0 - (1.281609755 + 3 * 0.6718390245)))
    // gaps: the None branch carries the prediction once, then resets it;
    // an aberration over a gap (or a missing band) is graphite's 0, not None
    val g = ev("holtWintersForecast(s.b.x)")
    assert(approx(g(("holtWintersForecast(s.b.x)", 10L)), 10.0))
    assert(approx(g(("holtWintersForecast(s.b.x)", 20L)), 10.0))
    assert(g(("holtWintersForecast(s.b.x)", 30L)) == None)
    val abg = ev("holtWintersAberration(s.b.x)")
    assert(approx(abg(("holtWintersAberration(s.b.x)", 20L)), 0.0))
    assert(approx(abg(("holtWintersAberration(s.b.x)", 30L)), 0.0))
    // graphite's bootstrapInterval argument parses; under the windowless
    // eval entry point the re-fetch/crop are identity (no render window)
    assert(ev("holtWintersForecast(s.a.x,\"7d\")").size == 4)
    assert(ev("holtWintersConfidenceBands(s.a.x,3,\"7d\")").size == 8)
    assertThrows[IllegalArgumentException](ev("holtWintersForecast(s.a.x,5)"))
  }

  test("holtWinters bootstrap warms the seasonal state before the render window") {
    import org.apache.spark.sql.functions.col
    // 4 days of hourly slots, daily sawtooth + drift: seasonal state only
    // converges with history, so a cold start at the window head diverges
    val full = (0 until 96).map { i =>
      ("h.x", 3600L * i, Some((i % 24).toDouble + i * 0.01))
    }.toDF("metric", "ts", "value")
    val from = 3600L * 48; val until = 3600L * 96
    val wfetch: TargetEval.WindowedFetch = (glob, extra) =>
      TargetEval.globFilter(full, glob)
        .where(col("ts") >= from - extra && col("ts") < until)
    def m(df: DataFrame): Map[Long, Option[Double]] =
      df.collect().map(r => r.getLong(1) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    val target = TargetLang.parse("holtWintersForecast(h.x)")
    val boot = m(TargetEval.evalWindowed(target, wfetch, Some(from)))
    // cropped to the window, and bit-identical to analyzing the full
    // history then cropping (the ground truth the bootstrap approximates
    // when history is deeper than 7d; here 7d covers everything)
    val truth = HoltWinters.analyzed(full)
      .where(col("ts") >= from)
      .collect().map(r => r.getLong(1) ->
        Option(r.get(3)).map(_.asInstanceOf[Double])).toMap
    assert(boot.keySet == truth.keySet)
    assert(boot.keys.forall(_ >= from))
    assert(boot.forall { case (ts, v) => truth(ts) == v })
    // a cold (windowless) analysis of just the render window differs at
    // the head — this is exactly the deviation the bootstrap removes
    val cold = m(TargetEval.eval(target,
      glob => TargetEval.globFilter(full, glob)
        .where(col("ts") >= from && col("ts") < until)))
    assert(cold(from) != boot(from))
    // an explicit "1d" bootstrapInterval prefetches exactly one day
    val oneDay = m(TargetEval.evalWindowed(
      TargetLang.parse("holtWintersForecast(h.x,\"1d\")"), wfetch, Some(from)))
    val oneDayTruth = HoltWinters.analyzed(full.where(col("ts") >= from - 86400L))
      .where(col("ts") >= from)
      .collect().map(r => r.getLong(1) ->
        Option(r.get(3)).map(_.asInstanceOf[Double])).toMap
    assert(oneDay == oneDayTruth && oneDay(from) != cold(from))
  }

  test("holtWinters seasonal feedback is consistent at season length 1") {
    // daily-or-coarser slots: nextPred must read the seasonal value just
    // written, not the array default
    val a = HoltWinters.analysis(Array(Some(1.0), Some(3.0), Some(2.0)), 1)
    // i1: intercept 1.2, slope 0.0007, seasonal 0.18 -> pred[2] = 1.3807
    assert(math.abs(a.predictions(2).get - 1.3807) < 1e-9)
  }

  test("presentation functions are data-level identity, not 400s") {
    val base = ev("sumSeries(s.*.x)")
    for (t <- Seq("sortByName(sumSeries(s.*.x))", "color(sumSeries(s.*.x),\"red\")",
                  "stacked(sumSeries(s.*.x))", "lineWidth(sumSeries(s.*.x),2)")) {
      val m = ev(t)
      assert(m.values.toSeq.sorted(Ordering[Option[Double]]) ==
        base.values.toSeq.sorted(Ordering[Option[Double]]), t)
    }
  }

  test("scaleToSeconds renormalizes by the inferred per-series step") {
    // step-10 frame: factor = 1/10
    val m = ev("scaleToSeconds(s.a.x,1)")
    assert(m(("scaleToSeconds(s.a.x,1)", 10L)) == Some(1.0 * (1.0 / 10.0)))
    assert(m(("scaleToSeconds(s.a.x,1)", 40L)) == Some(8.0 * (1.0 / 10.0)))
    // gaps stay gaps; the other series scales by its own step
    val b = ev("scaleToSeconds(s.*.x,30)")
    assert(b(("scaleToSeconds(s.b.x,30)", 20L)) == None)
    assert(b(("scaleToSeconds(s.b.x,30)", 30L)) == Some(30.0 * (30.0 / 10.0)))
  }

  test("aliasByMetric renames to the leaf node, stripping function wrappers") {
    val m = ev("aliasByMetric(s.a.x)")
    assert(m(("x", 10L)) == Some(1.0) && m(("x", 40L)) == Some(8.0))
    // wrapper stripped before the node slice (same cleanup as substr);
    // a trailing scalar arg survives into the leaf exactly as graphite's
    // rfind('(')/find(')') slice does — quirk-faithful
    val w = ev("aliasByMetric(sumSeries(s.*.x))")
    assert(w.keySet.map(_._1) == Set("x"))
    val q = ev("aliasByMetric(scale(s.a.x,2))")
    assert(q(("x,2", 10L)) == Some(2.0))
  }

  test("nPercentile flattens each series to its own rank percentile") {
    val m = ev("nPercentile(s.*.x,50)")
    // s.a sorted [1,2,3,8]: rank ceil(0.5*5)=3 -> 3; s.b [10,30]: rank 2 -> 30
    assert(m(("nPercentile(s.a.x,50)", 10L)) == Some(3.0))
    assert(m(("nPercentile(s.a.x,50)", 40L)) == Some(3.0))
    assert(m(("nPercentile(s.b.x,50)", 20L)) == Some(30.0)) // former gap filled
  }

  test("aggregate: the generic combine covers the wider graphite method set") {
    val s = ev("aggregate(s.*.x,\"sum\")")
    assert(s(("sumSeries(s.*.x)", 10L)) == Some(11.0))
    assert(s(("sumSeries(s.*.x)", 20L)) == Some(3.0))
    val med = ev("aggregate(s.*.x,\"median\")")
    assert(med(("medianSeries(s.*.x)", 10L)) == Some(10.0)) // upper mid of [1,10]
    assert(med(("medianSeries(s.*.x)", 20L)) == Some(3.0))
    val rg = ev("aggregate(s.*.x,\"range\")")
    assert(rg(("rangeSeries(s.*.x)", 30L)) == Some(28.0))
    assert(rg(("rangeSeries(s.*.x)", 40L)) == Some(0.0))
    // diff = first (name order) minus the rest, None-skipping
    val df = ev("aggregate(s.*.x,\"diff\")")
    assert(df(("diffSeries(s.*.x)", 10L)) == Some(-9.0))
    assert(df(("diffSeries(s.*.x)", 20L)) == Some(3.0))
    // multiply is None-strict like multiplySeries
    val mu = ev("aggregate(s.*.x,\"multiply\")")
    assert(mu(("multiplySeries(s.*.x)", 20L)) == None)
    assert(mu(("multiplySeries(s.*.x)", 30L)) == Some(60.0))
    val sd = ev("aggregate(s.*.x,\"stddev\")")
    assert(sd(("stddevSeries(s.*.x)", 10L)) == Some(4.5))
    // method aliases normalize into the output name, graphite-style
    assert(ev("aggregate(s.*.x,\"avg\")").keySet.map(_._1) ==
      Set("averageSeries(s.*.x)"))
    assertThrows[IllegalArgumentException](ev("aggregate(s.*.x,\"bogus\")"))
  }

  test("groupByNodes joins multiple name nodes; missing nodes drop the series") {
    val m = ev("groupByNodes(s.*.x,\"sum\",0,2)")
    assert(m(("s.x", 10L)) == Some(11.0) && m(("s.x", 30L)) == Some(32.0))
    // node 3 does not exist -> every series dropped
    assert(ev("groupByNodes(s.*.x,\"sum\",3)").isEmpty)
  }

  test("round is banker's (python3), exp and sigmoid null the overflow lane") {
    val r = ev("round(scale(s.a.x,0.25),1)")
    assert(r(("round(scale(s.a.x,0.25),1)", 10L)) == Some(0.2)) // bround(0.25)
    assert(r(("round(scale(s.a.x,0.25),1)", 20L)) == Some(0.8)) // bround(0.75)
    val e = ev("exp(scale(s.a.x,100))")
    assert(e(("exp(scale(s.a.x,100))", 10L)).exists(v => math.abs(v - math.exp(100)) < 1e75))
    assert(e(("exp(scale(s.a.x,100))", 40L)) == None)            // e^800 overflow
    val g = ev("sigmoid(s.a.x)")
    assert(g(("sigmoid(s.a.x)", 10L)).exists(v => math.abs(v - 1.0 / (1 + math.exp(-1.0))) < 1e-12))
    assert(ev("sigmoid(scale(s.a.x,-100))")(("sigmoid(scale(s.a.x,-100))", 40L)) == None)
  }

  test("minMax normalizes per series; gaps stay gaps") {
    val m = ev("minMax(s.*.x)")
    assert(m(("minMax(s.a.x)", 10L)) == Some(0.0))
    assert(m(("minMax(s.a.x)", 40L)) == Some(1.0))
    assert(m(("minMax(s.a.x)", 20L)) == Some(2.0 / 7.0))
    assert(m(("minMax(s.b.x)", 20L)) == None)
    assert(m(("minMax(s.b.x)", 30L)) == Some(1.0))
  }

  test("mostDeviant selects by variance, either argument order") {
    // var(s.a)=7.25, var(s.b)=100 -> s.b
    assert(ev("mostDeviant(s.*.x,1)").keySet.map(_._1) == Set("s.b.x"))
    assert(ev("mostDeviant(1,s.*.x)").keySet.map(_._1) == Set("s.b.x"))
  }

  test("removeEmptySeries drops all-gap series and honors xFilesFactor") {
    // every value nulled -> nothing survives
    assert(ev("removeEmptySeries(removeBelowValue(s.*.x,100))").isEmpty)
    // xff=1.0: s.b is 2/3 non-null -> dropped, s.a 4/4 -> kept
    assert(ev("removeEmptySeries(s.*.x,1.0)").keySet.map(_._1) == Set("s.a.x"))
    assert(ev("removeEmptySeries(s.*.x)").keySet.map(_._1) == Set("s.a.x", "s.b.x"))
  }

  test("unique collapses duplicate series; fallbackSeries serves the backup only when empty") {
    val u = ev("unique(group(s.a.x,s.a.x))")
    assert(u.size == 4 && u(("s.a.x", 40L)) == Some(8.0))
    assert(ev("fallbackSeries(s.zzz.x,s.a.x)").keySet.map(_._1) == Set("s.a.x"))
    assert(ev("fallbackSeries(s.b.x,s.a.x)").keySet.map(_._1) == Set("s.b.x"))
  }

  test("movingMedian: trailing-window upper-mid median, null-aware") {
    val m = ev("movingMedian(s.*.x,2)")
    assert(m(("movingMedian(s.a.x,2)", 10L)) == Some(1.0))
    assert(m(("movingMedian(s.a.x,2)", 20L)) == Some(3.0)) // upper mid of [1,3]
    assert(m(("movingMedian(s.a.x,2)", 30L)) == Some(3.0))
    assert(m(("movingMedian(s.a.x,2)", 40L)) == Some(8.0))
    assert(m(("movingMedian(s.b.x,2)", 20L)) == Some(10.0)) // gap skipped
  }

  test("linearRegression fits per series and fills every slot") {
    // s.b: (10,10),(30,30) -> y = x
    val m = ev("linearRegression(s.b.x)")
    assert(m(("linearRegression(s.b.x)", 10L)).exists(v => math.abs(v - 10) < 1e-9))
    assert(m(("linearRegression(s.b.x)", 20L)).exists(v => math.abs(v - 20) < 1e-9)) // gap filled
    assert(m(("linearRegression(s.b.x)", 30L)).exists(v => math.abs(v - 30) < 1e-9))
  }

  test("exponentialMovingAverage: seeded with the first window's mean, gaps hold state") {
    val m = ev("exponentialMovingAverage(s.a.x,2)")
    assert(m(("exponentialMovingAverage(s.a.x,2)", 10L)) == None) // warm-up
    assert(m(("exponentialMovingAverage(s.a.x,2)", 20L)) == Some(2.0)) // seed (1+3)/2
    assert(m(("exponentialMovingAverage(s.a.x,2)", 30L)).exists(v => math.abs(v - 2.0) < 1e-12))
    assert(m(("exponentialMovingAverage(s.a.x,2)", 40L)).exists(v => math.abs(v - 6.0) < 1e-12))
    val b = ev("exponentialMovingAverage(s.b.x,2)")
    assert(b(("exponentialMovingAverage(s.b.x,2)", 20L)) == Some(10.0)) // seed skips the gap
    assert(b(("exponentialMovingAverage(s.b.x,2)", 30L)).exists(v => math.abs(v - (2.0 / 3 * 30 + 1.0 / 3 * 10)) < 1e-9))
  }

  test("interpolate fills interior gaps linearly; limit 0 and edges stay null") {
    val m = ev("interpolate(s.b.x)")
    assert(m(("interpolate(s.b.x)", 20L)) == Some(20.0)) // (10+30)/2
    assert(ev("interpolate(s.b.x,0)")(("interpolate(s.b.x,0)", 20L)) == None)
    // leading null (from delay) is not interpolated
    val d = ev("interpolate(delay(s.a.x,1))")
    val lead = d.collect { case ((_, 10L), v) => v }
    assert(lead.nonEmpty && lead.forall(_ == None))
  }

  test("smartSummarize anchors buckets at the window start (frame head when windowless)") {
    val m = ev("smartSummarize(s.a.x,\"20s\",\"sum\")")
    assert(m == Map(
      ("smartSummarize(s.a.x,\"20s\",\"sum\")", 10L) -> Some(4.0),
      ("smartSummarize(s.a.x,\"20s\",\"sum\")", 30L) -> Some(10.0)))
  }

  test("hitcount converts rates to per-bucket counts via the inferred step") {
    val m = ev("hitcount(s.a.x,\"20s\")")
    assert(m(("hitcount(s.a.x,\"20s\")", 10L)) == Some(40.0))  // (1+3)*10
    assert(m(("hitcount(s.a.x,\"20s\")", 30L)) == Some(100.0)) // (2+8)*10
    val a = ev("hitcount(s.a.x,\"20s\",\"true\")")
    assert(a(("hitcount(s.a.x,\"20s\",\"true\")", 0L)) == Some(10.0))
    assert(a(("hitcount(s.a.x,\"20s\",\"true\")", 20L)) == Some(50.0))
    assert(a(("hitcount(s.a.x,\"20s\",\"true\")", 40L)) == Some(80.0))
  }

  test("timeSlice nulls values outside the slice, keeping the grid") {
    val m = ev("timeSlice(s.a.x,15,35)")
    assert(m(("timeSlice(s.a.x,15,35)", 10L)) == None)
    assert(m(("timeSlice(s.a.x,15,35)", 20L)) == Some(3.0))
    assert(m(("timeSlice(s.a.x,15,35)", 40L)) == None)
    assert(m.size == 4)
  }

  test("consolidateBy is data-identity; the AST carries the method to serving") {
    val m = ev("consolidateBy(s.a.x,\"max\")")
    assert(m(("consolidateBy(s.a.x,\"max\")", 40L)) == Some(8.0))
    assert(TargetEval.consolidationMethod(
      TargetLang.parse("scale(consolidateBy(a.b,\"sum\"),2)")) == Some("sum"))
    assert(TargetEval.consolidationMethod(TargetLang.parse("scale(a.b,2)")) == None)
    assertThrows[IllegalArgumentException](ev("consolidateBy(s.a.x,\"bogus\")"))
  }

  test("filterSeries: the generic filter covers all operators and the wide method set") {
    // totals: s.a = 14, s.b = 40
    assert(ev("filterSeries(s.*.x,\"sum\",\">\",20)").keySet.map(_._1) == Set("s.b.x"))
    assert(ev("filterSeries(s.*.x,\"sum\",\"<=\",14)").keySet.map(_._1) == Set("s.a.x"))
    assert(ev("filterSeries(s.*.x,\"max\",\"=\",8)").keySet.map(_._1) == Set("s.a.x"))
    assert(ev("filterSeries(s.*.x,\"max\",\"!=\",8)").keySet.map(_._1) == Set("s.b.x"))
    // median: s.a -> 3 (upper mid of [1,2,3,8]), s.b -> 30
    assert(ev("filterSeries(s.*.x,\"median\",\">=\",30)").keySet.map(_._1) == Set("s.b.x"))
    assertThrows[IllegalArgumentException](ev("filterSeries(s.*.x,\"sum\",\"~\",1)"))
  }

  test("highest / lowest: generic top-k with graphite defaults") {
    assert(ev("highest(s.*.x)").keySet.map(_._1) == Set("s.b.x"))      // avg 20 > 3.5
    assert(ev("lowest(s.*.x,1,\"max\")").keySet.map(_._1) == Set("s.a.x"))
    assert(ev("highest(s.*.x,2)").keySet.map(_._1) == Set("s.a.x", "s.b.x"))
  }

  test("aggregateWithWildcards generalizes the wildcard combines") {
    val m = ev("aggregateWithWildcards(s.*.x,\"max\",1)")
    assert(m(("s.x", 10L)) == Some(10.0) && m(("s.x", 40L)) == Some(8.0))
    // pins against the named form's collapse shape
    val s = ev("sumSeriesWithWildcards(s.*.x,1)")
    assert(s(("s.x", 10L)) == Some(11.0))
  }

  test("seriesLists family zips in name order and checks lengths") {
    val m = ev("diffSeriesLists(s.a.x,s.b.x)")
    assert(m(("diffSeries(s.a.x,s.b.x)", 10L)) == Some(-9.0))
    assert(m(("diffSeries(s.a.x,s.b.x)", 20L)) == None) // right gap
    assert(m(("diffSeries(s.a.x,s.b.x)", 40L)) == None) // right slot missing
    val d = ev("divideSeriesLists(s.b.x,s.a.x)")
    assert(d(("divideSeries(s.b.x,s.a.x)", 10L)) == Some(10.0))
    val p = ev("multiplySeriesLists(s.a.x,s.a.x)")
    assert(p(("multiplySeries(s.a.x,s.a.x)", 40L)) == Some(64.0))
    assertThrows[IllegalArgumentException](ev("diffSeriesLists(s.*.x,s.a.x)"))
  }

  test("logit maps the unit interval, Nones the domain errors") {
    // scale 0.2: values 0.2, 0.6, 0.4, 1.6 — the last is out of (0,1)
    val m = ev("logit(scale(s.a.x,0.2))")
    assert(m(("logit(scale(s.a.x,0.2))", 10L))
      .exists(v => math.abs(v - math.log(0.2 / 0.8)) < 1e-9))
    assert(m(("logit(scale(s.a.x,0.2))", 40L)) == None)
  }

  test("applyByNode re-evaluates the template per node prefix") {
    val m = ev("applyByNode(s.*.x,1,\"sumSeries(%.x)\")")
    // prefixes s.a and s.b -> sumSeries over each single series
    assert(m(("sumSeries(s.a.x)", 40L)) == Some(8.0))
    assert(m(("sumSeries(s.b.x)", 30L)) == Some(30.0))
    val n = ev("applyByNode(s.*.x,1,\"sumSeries(%.x)\",\"pfx.%\")")
    assert(n(("pfx.s.a", 10L)) == Some(1.0))
  }

  test("useSeriesAbove fetches the renamed siblings of series clearing the bar") {
    // only s.b (max 30) clears 20; replace b -> a fetches s.a.x
    val m = ev("useSeriesAbove(s.*.x,20,\"b\",\"a\")")
    assert(m.keySet.map(_._1) == Set("s.a.x") && m(("s.a.x", 40L)) == Some(8.0))
    assert(ev("useSeriesAbove(s.*.x,100,\"b\",\"a\")").isEmpty)
  }

  test("movingWindow dispatches the full method set over the trailing window") {
    val s2 = ev("movingWindow(s.a.x,2,\"sum\")")
    assert(s2(("movingWindow(s.a.x,2,\"sum\")", 20L)) == Some(4.0))
    assert(s2(("movingWindow(s.a.x,2,\"sum\")", 40L)) == Some(10.0))
    // default func = average == movingAverage; median == movingMedian
    assert(ev("movingWindow(s.a.x,2)").values.toSeq.sorted(Ordering[Option[Double]]) ==
      ev("movingAverage(s.a.x,2)").values.toSeq.sorted(Ordering[Option[Double]]))
    assert(ev("movingWindow(s.b.x,2,\"median\")").values.toSeq.sorted(Ordering[Option[Double]]) ==
      ev("movingMedian(s.b.x,2)").values.toSeq.sorted(Ordering[Option[Double]]))
  }

  test("aggregateLine flattens each series to its own statistic; add offsets") {
    val m = ev("aggregateLine(s.a.x,\"max\")")
    assert(m.values.toSet == Set(Some(8.0)) && m.size == 4)
    val a = ev("aggregateLine(s.a.x)")
    assert(a.values.toSet == Set(Some(3.5))) // exact decimal mean
    assert(ev("add(s.a.x,10)")(("add(s.a.x,10)", 10L)) == Some(11.0))
  }

  test("cumulative is identity data + a sum consolidation hint") {
    val m = ev("cumulative(s.a.x)")
    assert(m(("cumulative(s.a.x)", 40L)) == Some(8.0))
    assert(TargetEval.consolidationMethod(TargetLang.parse("cumulative(a.b)")) ==
      Some("sum"))
  }

  test("powSeries folds in name order, None-strict") {
    val m = ev("powSeries(s.a.x,s.b.x)")
    assert(m(("powSeries(s.a.x,s.b.x)", 10L)) == Some(1.0))          // 1^10
    assert(m(("powSeries(s.a.x,s.b.x)", 20L)) == None)               // strict gap
    assert(m(("powSeries(s.a.x,s.b.x)", 30L)) == Some(math.pow(2, 30)))
    assert(m(("powSeries(s.a.x,s.b.x)", 40L)) == Some(8.0))          // single base
  }

  test("aggregateSeriesLists reduces each zipped pair with the full method set") {
    val m = ev("aggregateSeriesLists(s.a.x,s.b.x,\"sum\")")
    assert(m(("sumSeries(s.a.x,s.b.x)", 10L)) == Some(11.0))
    assert(m(("sumSeries(s.a.x,s.b.x)", 20L)) == Some(3.0)) // None-skipping
    assert(m(("sumSeries(s.a.x,s.b.x)", 40L)) == Some(8.0))
  }

  test("mapSeries is identity; reduceSeries reduces role-matched groups") {
    assert(ev("mapSeries(s.*.x,1)") == ev("group(s.*.x)"))
    val m = ev("reduceSeries(mapSeries(s.*.x,1),\"divideSeries\",1,\"a\",\"b\")")
    assert(m(("s.reduce.divideSeries", 10L)) == Some(0.1))           // 1/10
    assert(m(("s.reduce.divideSeries", 20L)) == None)                // b gap
    assert(m(("s.reduce.divideSeries", 30L)).exists(v => math.abs(v - 2.0 / 30) < 1e-12))
    assert(m(("s.reduce.divideSeries", 40L)) == None)                // b slot missing
    val p = ev("reduceSeries(mapSeries(s.*.x,1),\"asPercent\",1,\"a\",\"b\")")
    assert(p(("s.reduce.asPercent", 10L)) == Some(10.0))
    assertThrows[IllegalArgumentException](
      ev("reduceSeries(mapSeries(s.*.x,1),\"bogus\",1,\"a\",\"b\")"))
  }

  test("synthetic sources draw on the render window; windowless is a 400") {
    def evw(target: String): Seq[(String, Long, Option[Double])] =
      TargetEval.evalWindowed(TargetLang.parse(target),
          (g, _) => TargetEval.globFilter(frame, g), Some(100L),
          window = Some((100L, 200L)))
        .collect().toSeq.map(r => (r.getString(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    assert(evw("constantLine(4.5)").toSet ==
      Set(("4.5", 100L, Some(4.5)), ("4.5", 150L, Some(4.5)), ("4.5", 200L, Some(4.5))))
    assert(evw("threshold(4.5,\"limit\")").map(_._1).toSet == Set("limit"))
    assert(evw("timeFunction(\"t\",30)").toSet ==
      Set(("t", 100L, Some(100.0)), ("t", 130L, Some(130.0)),
          ("t", 160L, Some(160.0)), ("t", 190L, Some(190.0))))
    assert(evw("identity(\"i\")").map(_._2).toSet == Set(100L, 160L))
    assert(evw("verticalLine(150)") == Seq(("150", 150L, Some(1.0))))
    assert(evw("verticalLine(\"+10\",\"mark\")") == Seq(("mark", 110L, Some(1.0))))
    assertThrows[IllegalArgumentException](evw("verticalLine(999)")) // outside window
    assertThrows[IllegalArgumentException](ev("constantLine(4.5)"))
    assertThrows[IllegalArgumentException](ev("timeFunction(\"t\")"))
    assertThrows[IllegalArgumentException](ev("verticalLine(150)"))
  }

  test("summarize alignToFrom anchors buckets at the frame head (graphite 4th arg)") {
    // s.a.x ts 10..40 step 10; default grid 20s buckets: 0=[10],20=[20,30],40=[40]
    val grid = ev("summarize(s.a.x,\"20s\",\"sum\")")
    assert(grid == Map(
      ("summarize(s.a.x,\"20s\",\"sum\")", 0L) -> Some(1.0),
      ("summarize(s.a.x,\"20s\",\"sum\")", 20L) -> Some(5.0),
      ("summarize(s.a.x,\"20s\",\"sum\")", 40L) -> Some(8.0)))
    // anchored at min ts = 10: buckets 10=[10,20], 30=[30,40]
    val anchored = ev("summarize(s.a.x,\"20s\",\"sum\",\"true\")")
    assert(anchored == Map(
      ("summarize(s.a.x,\"20s\",\"sum\",\"true\")", 10L) -> Some(4.0),
      ("summarize(s.a.x,\"20s\",\"sum\",\"true\")", 30L) -> Some(10.0)))
    // explicit false keeps the grid; junk is a loud client error
    def slots(m: Map[(String, Long), Option[Double]]): Map[Long, Option[Double]] =
      m.map { case ((_, ts), v) => ts -> v }
    assert(slots(ev("summarize(s.a.x,\"20s\",\"sum\",\"false\")")) == slots(grid))
    assertThrows[IllegalArgumentException](
      ev("summarize(s.a.x,\"20s\",\"sum\",\"maybe\")"))
  }

  test("setXFilesFactor gates summarize buckets on the non-None fraction") {
    // s.b.x: ts10=10.0 (bucket 0, 1/1 non-null), ts20=None + ts30=30.0
    // (bucket 20, 1/2 non-null = 0.5)
    val n = "summarize(s.b.x,\"20s\",\"sum\")"
    assert(ev("summarize(setXFilesFactor(s.b.x,0.6),\"20s\",\"sum\")") ==
      Map((n, 0L) -> Some(10.0), (n, 20L) -> None))          // 0.5 < 0.6 -> None
    assert(ev("summarize(setXFilesFactor(s.b.x,0.5),\"20s\",\"sum\")") ==
      Map((n, 0L) -> Some(10.0), (n, 20L) -> Some(30.0)))    // 0.5 >= 0.5 kept
    // without the factor the half-null bucket consolidates normally
    assert(ev(n) == Map((n, 0L) -> Some(10.0), (n, 20L) -> Some(30.0)))
    assertThrows[IllegalArgumentException](
      ev("summarize(setXFilesFactor(s.b.x,1.5),\"20s\",\"sum\")"))
  }

  test("multiplySeriesWithWildcards: None-strict product on the stripped name") {
    val m = ev("multiplySeriesWithWildcards(s.*.x,1)")
    assert(m == Map(
      ("s.x", 10L) -> Some(10.0),
      ("s.x", 20L) -> None,          // 3.0 × gap -> None (safeMul strict)
      ("s.x", 30L) -> Some(60.0),
      ("s.x", 40L) -> Some(8.0)))    // single participant
  }

  test("holtWintersConfidenceArea is the bands data (area fill is presentation)") {
    assert(ev("holtWintersConfidenceArea(s.a.x)") ==
      ev("holtWintersConfidenceBands(s.a.x)"))
  }

  test("aliasQuery labels each series by the derived query's last value") {
    // chan.pow.1/2 labeled by chan.freq.1/2's last non-None value
    val f = Seq[(String, Long, Option[Double])](
      ("chan.pow.1", 10L, Some(1.0)), ("chan.pow.1", 20L, Some(2.0)),
      ("chan.pow.2", 10L, Some(3.0)),
      ("chan.freq.1", 10L, Some(101.5)), ("chan.freq.1", 20L, None), // last non-None = 101.5
      ("chan.freq.2", 10L, Some(99.0)), ("chan.freq.2", 20L, Some(104.9))
    ).toDF("metric", "ts", "value")
    def evq(t: String) = TargetEval.eval(TargetLang.parse(t),
        glob => TargetEval.globFilter(f, glob))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val got = evq(
      "aliasQuery(chan.pow.*,'chan\\.pow\\.([0-9]+)','chan.freq.\\1','Channel %d MHz')")
    assert(got == Set(
      ("Channel 101 MHz", 10L), ("Channel 101 MHz", 20L), // %d truncates 101.5
      ("Channel 104 MHz", 10L)))
    // a derived query with no series is a loud client error
    assertThrows[IllegalArgumentException](evq(
      "aliasQuery(chan.pow.*,'pow','nosuch','%d')"))
  }

  // ---- tag database family ---------------------------------------------

  /** Graphite-tagged names: `name;k=v;...`, canonical key order; `web.req`
    * is untagged (tags read as empty), `cpu;host=b` has no dc tag.
    */
  private def taggedFrame: DataFrame =
    Seq[(String, Long, Option[Double])](
      ("cpu;dc=east;host=a", 10L, Some(1.0)), ("cpu;dc=east;host=a", 20L, Some(2.0)),
      ("cpu;dc=east;host=b", 10L, Some(4.0)), ("cpu;dc=east;host=b", 20L, Some(8.0)),
      ("cpu;dc=west;host=a", 10L, Some(16.0)), ("cpu;dc=west;host=a", 20L, None),
      ("cpu;host=b", 10L, Some(32.0)),
      ("web.req", 10L, Some(64.0))
    ).toDF("metric", "ts", "value")

  private def evt(target: String): Map[(String, Long), Option[Double]] =
    TargetEval.eval(TargetLang.parse(target),
        glob => TargetEval.globFilter(taggedFrame, glob))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toMap

  test("Tags: spec parsing, non-empty rule, value extraction") {
    assert(Tags.parseSpec("dc=east") == Tags.Spec("dc", "=", "east"))
    assert(Tags.parseSpec("dc!=east") == Tags.Spec("dc", "!=", "east"))
    assert(Tags.parseSpec("dc=~ea.*") == Tags.Spec("dc", "=~", "ea.*"))
    assert(Tags.parseSpec("dc!~ea.*") == Tags.Spec("dc", "!~", "ea.*"))
    // '=' inside the VALUE is legal (first op wins on the key side)
    assert(Tags.parseSpec("q=a=b") == Tags.Spec("q", "=", "a=b"))
    assertThrows[IllegalArgumentException](Tags.parseSpec("noop"))
    assertThrows[IllegalArgumentException](Tags.parseSpec("dc=~[bad"))
    assert(Tags.matchesNonEmpty(Tags.Spec("dc", "=", "east")))
    assert(!Tags.matchesNonEmpty(Tags.Spec("dc", "=", "")))
    assert(Tags.matchesNonEmpty(Tags.Spec("dc", "=~", "ea.*")))
    assert(!Tags.matchesNonEmpty(Tags.Spec("dc", "=~", ".*")))   // matches ''
    assert(!Tags.matchesNonEmpty(Tags.Spec("dc", "!=", "x")))
  }

  test("seriesByTag: exact, regex-from-start, negations, missing-tag-as-empty") {
    // exact on name + dc
    assert(evt("seriesByTag('name=cpu','dc=east')").keys.map(_._1).toSet ==
      Set("cpu;dc=east;host=a", "cpu;dc=east;host=b"))
    // regex is anchored at the START of the value: 'es' must not match 'west'
    assert(evt("seriesByTag('name=cpu','dc=~es')").isEmpty)
    assert(evt("seriesByTag('name=cpu','dc=~we')").keys.map(_._1).toSet ==
      Set("cpu;dc=west;host=a"))
    // != includes series MISSING the tag (value = ''), =empty matches them only
    assert(evt("seriesByTag('name=cpu','dc!=east')").keys.map(_._1).toSet ==
      Set("cpu;dc=west;host=a", "cpu;host=b"))
    assert(evt("seriesByTag('name=cpu','dc=')").keys.map(_._1).toSet ==
      Set("cpu;host=b"))
    // untagged series: name IS the whole path
    assert(evt("seriesByTag('name=web.req')").keys.map(_._1).toSet == Set("web.req"))
    // !~ with the non-empty rule carried by the name spec
    assert(evt("seriesByTag('name=cpu','host!~a')").keys.map(_._1).toSet ==
      Set("cpu;dc=east;host=b", "cpu;host=b"))
    // at least one spec must demand a non-empty value
    assertThrows[IllegalArgumentException](evt("seriesByTag('dc!=east')"))
    assertThrows[IllegalArgumentException](evt("seriesByTag('dc=')"))
    assertThrows[IllegalArgumentException](evt("seriesByTag()"))
  }

  test("groupByTags: aggregation, graphite naming, name listed explicitly") {
    // sum by dc: missing dc groups under the empty value
    assert(evt("groupByTags(seriesByTag('name=cpu'),'sum','dc')") == Map(
      ("cpu;dc=east", 10L) -> Some(5.0), ("cpu;dc=east", 20L) -> Some(10.0),
      ("cpu;dc=west", 10L) -> Some(16.0), ("cpu;dc=west", 20L) -> None,
      ("cpu;dc=", 10L) -> Some(32.0)))
    // 'name' in the tag list is the prefix, never repeated
    assert(evt("groupByTags(seriesByTag('name=cpu','dc=east'),'max','name','host')") == Map(
      ("cpu;host=a", 10L) -> Some(1.0), ("cpu;host=a", 20L) -> Some(2.0),
      ("cpu;host=b", 10L) -> Some(4.0), ("cpu;host=b", 20L) -> Some(8.0)))
    assertThrows[IllegalArgumentException](
      evt("groupByTags(seriesByTag('name=cpu'),'sum')")) // no tags
  }

  test("aliasByNode mixes node indices and tag keys (graphite 1.1 form)") {
    // tagged name: node split applies to the part before ';'
    assert(evt("aliasByNode(seriesByTag('name=cpu','dc=east','host=a'),0,'dc')")
      .keys.map(_._1).toSet == Set("cpu.east"))
    assertThrows[IllegalArgumentException](
      evt("aliasByNode(seriesByTag('name=cpu'),sumSeries(x))"))
  }

  test("Tags property: compiled predicates match a naive evaluator (120 random queries)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // independent reference: parse tags from a name and evaluate one spec
    def tagsOf(m: String): Map[String, String] = {
      val segs = m.split(";", -1)
      Map("name" -> segs.head) ++ segs.tail.flatMap { s =>
        val i = s.indexOf('='); if (i < 0) None else Some(s.take(i) -> s.drop(i + 1))
      }
    }
    def naive(m: String, sp: Tags.Spec): Boolean = {
      val v = tagsOf(m).getOrElse(sp.key, "")
      sp.op match {
        case "="  => v == sp.value
        case "!=" => v != sp.value
        case "=~" => java.util.regex.Pattern.compile(sp.value).matcher(v).lookingAt()
        case "!~" => !java.util.regex.Pattern.compile(sp.value).matcher(v).lookingAt()
      }
    }
    val corpus = for {
      name <- Seq("cpu", "mem.used", "disk")
      dc <- Seq(Some("east"), Some("west"), None)
      host <- Seq(Some("h1"), Some("h12"), None)
    } yield name +
      dc.map(";dc=" + _).getOrElse("") + host.map(";host=" + _).getOrElse("")
    val df = corpus.map(m => (m, 1L, Some(1.0))).toDF("metric", "ts", "value")
    val keyGen = Gen.oneOf("name", "dc", "host", "rack")
    val opGen = Gen.oneOf("=", "!=", "=~", "!~")
    val valGen = Gen.oneOf("cpu", "east", "west", "h1", "h", "h.*", "ea", "", "mem.used")
    val specGen = for { k <- keyGen; o <- opGen; v <- valGen } yield s"$k$o$v"
    val qGen = Gen.chooseNum(1, 3).flatMap(n => Gen.listOfN(n, specGen))
    var checked = 0
    for (i <- 0 until 240 if checked < 120) {
      val specs = qGen.pureApply(Gen.Parameters.default, Seed(i.toLong))
      val parsed = specs.map(Tags.parseSpec)
      if (parsed.exists(Tags.matchesNonEmpty)) { // else compile() rejects, by design
        checked += 1
        val got = df.where(Tags.compile(
            org.apache.spark.sql.functions.col("metric"), specs))
          .select("metric").collect().map(_.getString(0)).toSet
        val want = corpus.filter(m => parsed.forall(naive(m, _))).toSet
        assert(got == want, s"specs=$specs got=$got want=$want")
      }
    }
    assert(checked >= 60, s"generator starved: only $checked valid queries")
  }

  test("aliasByTags: dot-joined tag values, name tag, missing tag empty") {
    assert(evt("aliasByTags(seriesByTag('name=cpu','dc=east'),'host','name')")
      .keys.map(_._1).toSet == Set("a.cpu", "b.cpu"))
    // missing dc contributes an empty node (concat_ws drops nothing between dots)
    assert(evt("aliasByTags(seriesByTag('name=cpu','host=b'),'dc')")
      .keys.map(_._1).toSet == Set("east", ""))
  }

  test("moving* windowSize accepts a quoted interval: '30s' == 3 slots at step 10 (r8)") {
    // graphite's windowSize doc: integer datapoint count OR quoted time
    // period; on a step-aligned frame they must select the same slots
    for (f <- Seq("movingAverage", "movingSum", "movingMax", "movingMin",
                  "movingMedian")) {
      val byPoints = ev(s"$f(s.a.x,3)").map { case ((m, t), v) =>
        (m.replace(",3)", ",\"30s\")"), t) -> v
      }
      assert(ev(s"$f(s.a.x,\"30s\")") == byPoints, f)
    }
    assert(
      ev("movingWindow(s.a.x,\"30s\",\"sum\")").toSeq.map(kv => (kv._1._2, kv._2)).sorted ==
      ev("movingWindow(s.a.x,3,\"sum\")").toSeq.map(kv => (kv._1._2, kv._2)).sorted)
  }

  test("moving* NON-multiple interval: '25s' at step 10 time-bounds to 3 slots (documented divergence, r9)") {
    // graphite floors interval//step (2 slots for '25s' at step 10); the
    // range-frame here covers [ts-24, ts] = 3 step-10 slots. Pinned so the
    // divergence documented at TargetEval.trailingWindow stays deliberate:
    // if this ever changes to the floor conversion, update BOTH.
    assert(ev("movingSum(s.a.x,\"25s\")").map { case ((m, t), v) =>
      (m.replace("\"25s\"", "3"), t) -> v
    } == ev("movingSum(s.a.x,3)"))
  }
}
