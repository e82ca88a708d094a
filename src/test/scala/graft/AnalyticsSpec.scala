package graft

import graft.functions.Normalize
import graft.operators.{SeriesOps, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-4 operators: per-key rate (counter derivative), trailing moving
  * average over rollup slots, TF-IDF top-k, NFC normalization, JSON
  * extraction, and OLAP rollup — hand-computed golden values plus naive
  * reference checks.
  */
class AnalyticsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // ---- SeriesOps.rate ------------------------------------------------------

  test("rate: per-second derivative with counter-reset clamp and null first row") {
    // user 1: (0us, 10.0) -> (2s, 14.0): rate 2.0; -> (4s, 4.0): reset -> 0.0
    // user 2: single point -> null rate
    val df = Seq(
      (1L, 1L, 0L, 10.0), (2L, 1L, 2000000L, 14.0), (3L, 1L, 4000000L, 4.0),
      (4L, 2L, 1000000L, 5.0)
    ).toDF("event_id", "user_id", "us", "value")
    val got = SeriesOps.rate(df, Seq("user_id"), "us", "value", Seq("us", "event_id"))
      .orderBy("event_id").select("event_id", "rate_ps").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
    assert(got.toSeq == Seq(
      1L -> None, 2L -> Some(2.0), 3L -> Some(0.0), 4L -> None))
  }

  test("rate: duplicate timestamp after tie-break yields null, not infinity") {
    val df = Seq((1L, 7L, 100L, 1.0), (2L, 7L, 100L, 9.0))
      .toDF("event_id", "user_id", "us", "value")
    val got = SeriesOps.rate(df, Seq("user_id"), "us", "value", Seq("us", "event_id"))
      .orderBy("event_id").select("rate_ps").collect()
    assert(got(0).isNullAt(0) && got(1).isNullAt(0))
  }

  // ---- SeriesOps.movingAvg -------------------------------------------------

  test("movingAvg: trailing range frame over slots, decimal-exact mean") {
    // slots at ts 0,60,120 with sums 6,12,3 and counts 2,3,1; range 60 =>
    // ts 0: 6/2=3.0; ts 60: (6+12)/(2+3)=3.6; ts 120: (12+3)/(3+1)=3.75
    val roll = Seq(("m", 0L, BigDecimal(6.00), 2L), ("m", 60L, BigDecimal(12.00), 3L),
      ("m", 120L, BigDecimal(3.00), 1L))
      .toDF("metric", "ts", "sv", "n")
      .withColumn("sv", col("sv").cast("decimal(18,2)"))
    val got = SeriesOps.movingAvg(roll, Seq("metric"), "ts", "sv", "n", 60L)
      .orderBy("ts").select("mov_n", "mavg").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.toSeq == Seq((2L, 3.0), (5L, 3.6), (4L, 3.75)))
  }

  test("movingAvg: a gap larger than the range excludes older slots") {
    val roll = Seq(("m", 0L, BigDecimal(10.00), 1L), ("m", 1000L, BigDecimal(2.00), 1L))
      .toDF("metric", "ts", "sv", "n")
      .withColumn("sv", col("sv").cast("decimal(18,2)"))
    val got = SeriesOps.movingAvg(roll, Seq("metric"), "ts", "sv", "n", 540L)
      .orderBy("ts").select("mavg").collect().map(_.getDouble(0))
    assert(got.toSeq == Seq(10.0, 2.0))
  }

  test("movingAvg: negative (pre-1970) timestamps keep their trailing frames across chunk boundaries (r9)") {
    // the chunked-trailing halo gate must use pmod, not % (Spark's % keeps
    // the dividend's sign): plant slots straddling a chunk boundary in
    // negative-ts space and check the frame still sees its predecessor.
    // range 60 => chunkLen 3840; boundary at -3840: ts -3870 is in chunk -2
    // and within 60 of the boundary, so it must halo into chunk -1 and feed
    // ts -3830's frame.
    val roll = Seq(("m", -3870L, BigDecimal(6.00), 2L), ("m", -3830L, BigDecimal(12.00), 3L))
      .toDF("metric", "ts", "sv", "n")
      .withColumn("sv", col("sv").cast("decimal(18,2)"))
    val got = SeriesOps.movingAvg(roll, Seq("metric"), "ts", "sv", "n", 60L)
      .orderBy("ts").select("mov_n", "mavg").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.toSeq == Seq((2L, 3.0), (5L, 3.6)))
  }

  // ---- TF-IDF ----------------------------------------------------------------

  test("tfidf: scores and ranks match the hand computation") {
    // 3 docs; "rare" only in doc 0, "common" in all three
    val docs = Seq(
      (0L, "rare common rare"), (1L, "common other"), (2L, "common other other")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.tfidfTopK(docs, 2).orderBy("doc_id", "rnk")
      .select("doc_id", "token", "tf", "df", "score", "rnk").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getInt(5)))
    def sc(tf: Long, df: Long) = BigDecimal(tf * math.log(4.0 / (df + 1.0)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // doc 0: rare tf=2 df=1 -> 2*ln(2); common tf=1 df=3 -> ln(1)=0
    assert(got(0) == (0L, "rare", 2L, 1L, sc(2, 1), 1))
    assert(got(1) == (0L, "common", 1L, 3L, 0.0, 2))
    // doc 1: both score 0 and ln(2) — other tf=1 df=2 -> ln(4/3)
    assert(got(2) == (1L, "other", 1L, 2L, sc(1, 2), 1))
    assert(got(3) == (1L, "common", 1L, 3L, 0.0, 2))
    // doc 2: other tf=2
    assert(got(4) == (2L, "other", 2L, 2L, sc(2, 2), 1))
    assert(got(5) == (2L, "common", 1L, 3L, 0.0, 2))
  }

  // ---- NFC normalization ------------------------------------------------------

  test("nfc golden vectors: decomposed composes, precomposed unchanged, ascii identity") {
    val dec = "éclair"    // e + COMBINING ACUTE
    val pre = "éclair"     // precomposed é
    val rows = Seq((1L, dec), (2L, pre), (3L, "plain ascii"), (4L, "Å ring"))
      .toDF("id", "t")
      .select(col("id"), Normalize.nfc(col("t")).as("n"), length(Normalize.nfc(col("t"))).as("len"))
      .orderBy("id").collect()
    assert(rows(0).getString(1) == pre, "decomposed input must compose")
    assert(rows(1).getString(1) == pre)
    assert(rows(0).getInt(2) == 6 && rows(1).getInt(2) == 6, "NFC length in codepoints")
    assert(rows(2).getString(1) == "plain ascii")
    assert(rows(3).getString(1) == "Å ring", "A + ring composes to Å")
  }

  test("nfc handles null and empty, and matches java.text.Normalizer on random strings") {
    val rnd = new scala.util.Random(7)
    val pool = "aééö Å"
    val strs = (1 to 40).map(_ => (1 to rnd.nextInt(12)).map(_ => pool(rnd.nextInt(pool.length))).mkString)
    val df = (strs :+ "").zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "t")
    val got = df.select(col("id"), Normalize.nfc(col("t"))).orderBy("id").collect().map(_.getString(1))
    val want = (strs :+ "").map(s =>
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
    assert(got.toSeq == want)
    val withNull = Seq((1L, null.asInstanceOf[String])).toDF("id", "t")
      .select(Normalize.nfc(col("t"))).collect()
    assert(withNull(0).isNullAt(0))
  }

  // ---- query-level sanity over real testdata ---------------------------------

  private val Sf = "/root/testdata/sf0.001"

  test("olap_rollup: subtotals sum to the grand total; grouping flags consistent") {
    val rows = AnalyticsQueries.olapRollup(spark, Sf).collect()
    val grand = rows.filter(r => r.getInt(2) == 1 && r.getInt(3) == 1)
    assert(grand.length == 1 && grand.head.getString(0) == "ALL")
    val leafN = rows.filter(r => r.getInt(2) == 0 && r.getInt(3) == 0).map(_.getLong(5)).sum
    assert(grand.head.getLong(5) == leafN, "leaf counts must sum to the grand total")
    val leafRev = rows.filter(r => r.getInt(2) == 0 && r.getInt(3) == 0).map(_.getDouble(4)).sum
    assert(math.abs(grand.head.getDouble(4) - leafRev) < 1e-6)
  }

  test("json_props_agg: every event has a parseable k and avg is sum/n") {
    val rows = AnalyticsQueries.jsonPropsAgg(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2), s"n != n_k for ${r.getString(0)}")
      val expect = BigDecimal(r.getLong(3).toDouble / r.getLong(2))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(6) == expect)
    }
  }

  test("ts_rate and ts_moving_avg run green on testdata with sane values") {
    val rate = AnalyticsQueries.tsRate(spark, Sf)
    assert(rate.where(col("rate_ps") < 0).count() == 0, "clamped rates are non-negative")
    assert(rate.count() > 0)
    val mavg = AnalyticsQueries.tsMovingAvg(spark, Sf)
    assert(mavg.where(col("mavg").isNull).count() == 0, "every slot has a mean")
    assert(mavg.where(col("mov_n") < col("n")).count() == 0, "frame includes current slot")
  }

  test("olap_cube: both one-dim margins sum to the grand total; 4 grouping sets present") {
    val r = AnalyticsQueries.olapCube(spark, Sf).collect()
    val grand = r.filter(x => x.getInt(2) == 1 && x.getInt(3) == 1)
    assert(grand.length === 1)
    val gRev = grand.head.getDouble(4)
    val byFlag = r.filter(x => x.getInt(2) == 0 && x.getInt(3) == 1).map(_.getDouble(4)).sum
    val byStatus = r.filter(x => x.getInt(2) == 1 && x.getInt(3) == 0).map(_.getDouble(4)).sum
    assert(math.abs(byFlag - gRev) < 1e-6 && math.abs(byStatus - gRev) < 1e-6)
    assert(r.map(x => (x.getInt(2), x.getInt(3))).distinct.sorted.toSeq
      === Seq((0, 0), (0, 1), (1, 0), (1, 1)))
  }

  test("anomalyFlags: a planted spike flags, steady slots don't, baseline excludes self") {
    import graft.operators.SeriesOps
    // slots 0..9 at value 10 (n=1 each), slot 10 spikes to 100
    val slots = ((0 to 9).map(i => ("m", i * 60L, 10.0)) :+ ("m", 600L, 100.0))
      .toDF("metric", "ts", "v")
      .select(col("metric"), col("ts"),
        col("v").cast("decimal(18,2)").as("sv"),
        (col("v").cast("decimal(18,2)") * col("v").cast("decimal(18,2)")).as("sq"),
        lit(1L).as("n"))
    val got = SeriesOps.anomalyFlags(slots, Seq("metric"), "ts", "sv", "sq", "n",
      540L, 2.0, 3).orderBy("ts").collect()
    // first 3 slots: no baseline (wn < 3) → NULLs
    assert(got.take(3).forall(r => r.isNullAt(r.fieldIndex("is_anom"))))
    // steady mid-series slots: zero variance → NULL flag (std > 0 gate)
    assert(got(5).isNullAt(got(5).fieldIndex("is_anom")))
    // the spike: its baseline is the 9 preceding 10.0 slots — but their
    // variance is 0, so gate... plant variance: shift to a jittered series
    val jit = ((0 to 9).map(i => ("m", i * 60L, 10.0 + (i % 2))) :+ ("m", 600L, 100.0))
      .toDF("metric", "ts", "v")
      .select(col("metric"), col("ts"),
        col("v").cast("decimal(18,2)").as("sv"),
        (col("v").cast("decimal(18,2)") * col("v").cast("decimal(18,2)")).as("sq"),
        lit(1L).as("n"))
    val g2 = SeriesOps.anomalyFlags(jit, Seq("metric"), "ts", "sv", "sq", "n",
      540L, 2.0, 3).orderBy("ts").collect()
    val spike = g2.last
    assert(spike.getInt(spike.fieldIndex("is_anom")) === 1, "spike must flag")
    assert(g2(8).getInt(g2(8).fieldIndex("is_anom")) === 0, "jittered steady slot must not")
  }

  test("topKByTotal: selects exactly k keys by decimal total with rank, keeps full series") {
    import graft.operators.SeriesOps
    val slots = Seq(
      ("a", 0L, 5.0), ("a", 60L, 5.0),   // total 10
      ("b", 0L, 30.0),                    // total 30
      ("c", 0L, 7.0), ("c", 60L, 7.0), ("c", 120L, 7.0)) // total 21
      .toDF("metric", "ts", "v")
      .select(col("metric"), col("ts"), col("v").cast("decimal(18,2)").as("sv"))
    val got = SeriesOps.topKByTotal(slots, "metric", "ts", "sv", 2)
      .select("metric", "rank", "total").distinct().collect()
      .map(r => (r.getString(0), r.getInt(1), r.getDouble(2))).sortBy(_._2)
    assert(got.toSeq === Seq(("b", 1, 30.0), ("c", 2, 21.0)))
    val rows = SeriesOps.topKByTotal(slots, "metric", "ts", "sv", 2).count()
    assert(rows === 4L, "b's 1 slot + c's 3 slots")
  }
}
