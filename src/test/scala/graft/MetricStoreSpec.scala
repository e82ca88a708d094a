package graft

import graft.core.{Archive, StorageSchema, AggMethod}
import graft.storage.{MetricStore, TimeSeries}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** End-to-end store tests: write -> cascade -> fetch against the reference's
  * golden scenarios (reference: tests/test_storage.py:73-257), on the
  * Parquet-level implementation.
  */
class MetricStoreSpec extends AnyFunSuite with BeforeAndAfterAll {
  implicit lazy val spark = SparkTestBase.spark
  import spark.implicits._

  val nowTs = 1411628779L
  var root: java.nio.file.Path = _

  override def beforeAll(): Unit = { root = java.nio.file.Files.createTempDirectory("graft-store") }
  override def afterAll(): Unit = {
    import scala.reflect.io.Directory
    new Directory(new java.io.File(root.toString)).deleteRecursively()
    ()
  }

  def schema(name: String, archives: Seq[Archive], agg: AggMethod = AggMethod.Min, xff: Double = 1.0) =
    StorageSchema(name, ".*".r, xff, agg, archives, 600, 8)

  def points(is: Range): org.apache.spark.sql.DataFrame =
    is.flatMap { i =>
      Seq(("cpu0", nowTs - i, 0.0 + i, i.toLong), ("cpu1", nowTs - i, 10.0 + i, i.toLong))
    }.toDF("metric", "ts", "value", "arrival")

  test("update + fetch identity at finest archive (tests/test_storage.py:73-85)") {
    val store = new MetricStore(s"$root/s1", schema("s1", Seq(Archive(1, 6), Archive(3, 6))))
    val dropped = store.writeBatch(points(1 to 5), nowTs)
    assert(dropped == 0)
    val Some((level, df)) = store.fetch(Some("cpu0"), nowTs - 5, nowTs, nowTs)
    assert(level == 0)
    val got = df.as[(String, Long, Option[Double])].collect().toSeq
    val exp = (1 to 5).reverse.map(i => ("cpu0", nowTs - i, Some(0.0 + i)))
    assert(got == exp)
  }

  test("propagation to coarser archive with min agg (tests/test_storage.py:87-97)") {
    val store = new MetricStore(s"$root/s2", schema("s2", Seq(Archive(1, 6), Archive(3, 6))))
    store.writeBatch(points(1 to 6), nowTs)
    store.cascade(nowTs - 6, nowTs, force = true)
    // fetch far enough back to select the 3s archive
    val Some((level, df)) = store.fetch(Some("cpu0"), nowTs - 7, nowTs, nowTs)
    assert(level == 1)
    val got = df.as[(String, Long, Option[Double])].collect()
    // non-null slots must equal min over each 3s window
    val byWindow = (1 to 6).groupBy(i => ((nowTs - i) / 3) * 3)
      .map { case (w, is) => (w, 0.0 + is.min) } // min agg; value(i) = i
    got.foreach { case (_, ts, v) =>
      v.foreach(value => assert(byWindow(ts) == value, s"slot $ts"))
    }
    assert(got.count(_._3.isDefined) == byWindow.size)
  }

  test("old points land directly in the coarser archive (tests/test_storage.py:115-125)") {
    val store = new MetricStore(s"$root/s3", schema("s3", Seq(Archive(1, 6), Archive(3, 6))))
    // ages 7..12 exceed the 6s level-0 retention but fit level 1 (18s)
    val dropped = store.writeBatch(points(7 to 12), nowTs)
    assert(dropped == 0)
    assert(!store.tableExists(s"$root/s3/s3/level_0") ||
      spark.read.parquet(s"$root/s3/s3/level_0").isEmpty)
    val l1 = spark.read.parquet(s"$root/s3/s3/level_1")
    assert(l1.count() > 0)
    // too-old points (beyond 18s) are dropped and counted
    val dropped2 = store.writeBatch(points(19 to 20), nowTs)
    assert(dropped2 == 4)
  }

  test("3-level cascade + range-limited fetch (tests/test_storage.py:221-257)") {
    val store = new MetricStore(s"$root/s4",
      schema("s4", Seq(Archive(1, 60), Archive(3, 60), Archive(6, 60)), AggMethod.Min, 1.0))
    store.writeBatch(points(1 to 50), nowTs)
    store.cascade(nowTs - 50, nowTs, force = true)
    // range of 100s > 3s-archive retention (180s? no: 60*3=180 covers; use 200)
    val Some((level, _)) = store.fetch(Some("cpu0"), nowTs - 200, nowTs, nowTs)
    assert(level == 2) // 200 > 180 -> 6s archive
    val Some((level1, _)) = store.fetch(Some("cpu0"), nowTs - 100, nowTs, nowTs)
    assert(level1 == 1) // 100 > 60, <= 180 -> 3s archive
  }

  test("xff gates propagation cadence (kenshin/storage.py:505-528)") {
    val store = new MetricStore(s"$root/s5",
      schema("s5", Seq(Archive(1, 60), Archive(3, 60)), AggMethod.Min, xff = 5.0))
    assert(store.propagateTimeunit(0) == 15) // ceil(3/1 * 5) * 1
    store.writeBatch(points(1 to 5), nowTs)
    val unitStart = (nowTs / 15) * 15
    // misaligned range inside one unit -> gate skips
    store.cascade(unitStart + 1, unitStart + 6)
    assert(!store.tableExists(s"$root/s5/s5/level_1"))
    // a range starting exactly on a unit boundary propagates even without
    // crossing one (kenshin/storage.py:520-521)
    store.cascade(unitStart, unitStart + 5)
    assert(store.tableExists(s"$root/s5/s5/level_1"))
  }

  test("propagation window truncates at the last completed xff unit (kenshin/storage.py:542-549)") {
    val store = new MetricStore(s"$root/s5w",
      schema("s5w", Seq(Archive(1, 60), Archive(3, 60)), AggMethod.Min, xff = 5.0))
    // unit = 15, lowerStep = 3 <= unit: end snaps down, start covers >= 1 unit
    assert(store.propagationWindow(0, 100, 131, force = false) == ((90L, 120L)))
    // boundary-aligned single-unit range covers the PREVIOUS unit
    assert(store.propagationWindow(0, 105, 110, force = false) == ((90L, 105L)))
    // force covers the full step-aligned range (shutdown flush)
    assert(store.propagationWindow(0, 100, 131, force = true) == ((99L, 132L)))
  }

  test("propagate preserves level-1 partitions outside the dirty day range") {
    val store = new MetricStore(s"$root/s7",
      schema("s7", Seq(Archive(1, 86400), Archive(60, 43200))))
    // age 15d: too old for level 0 (1d) but fits level 1 (30d) -> direct write
    val old = Seq(("m", nowTs - 86400L * 15, 7.0, 1L)).toDF("metric", "ts", "value", "arrival")
    assert(store.writeBatch(old, nowTs) == 0)
    val fresh = Seq(("m", nowTs - 10, 2.0, 2L)).toDF("metric", "ts", "value", "arrival")
    store.writeBatch(fresh, nowTs)
    store.cascade(nowTs - 10, nowTs, force = true)
    val l1 = store.readLevel(1, 0, nowTs + 86400).as[(String, Long, Double)].collect()
    assert(l1.exists(_._3 == 7.0), "directly-written old point lost by the cascade rewrite")
    assert(l1.exists(_._3 == 2.0), "fresh rollup missing")
  }

  test("rewritten slot is last-write-wins across batches (kenshin/storage.py:429-445)") {
    val store = new MetricStore(s"$root/s8", schema("s8", Seq(Archive(1, 60), Archive(3, 60))))
    val t = nowTs - 5
    store.writeBatch(Seq(("m", t, 1.0, 100L)).toDF("metric", "ts", "value", "arrival"), nowTs)
    store.writeBatch(Seq(("m", t, 9.0, 200L)).toDF("metric", "ts", "value", "arrival"), nowTs)
    // raw storage appends both; merge-on-read resolves to the later write
    assert(spark.read.parquet(s"$root/s8/s8/level_0").count() == 2)
    val rows = store.readLevel(0, t, t + 1).as[(String, Long, Double)].collect()
    assert(rows.toSeq == Seq(("m", t, 9.0)))
    val Some((_, df)) = store.fetch(Some("m"), t, t + 1, nowTs)
    assert(df.as[(String, Long, Option[Double])].collect().toSeq == Seq(("m", t, Some(9.0))))
  }

  test("writeBatch records the dirty window; cascadeAuto consumes it (mtime analog)") {
    val store = new MetricStore(s"$root/s9",
      schema("s9", Seq(Archive(1, 60), Archive(3, 60)), AggMethod.Min))
    store.writeBatch(points(1 to 6), nowTs)
    assert(store.dirtyRange(0).contains((nowTs - 6, nowTs)))
    store.cascadeAuto(force = true)
    assert(store.dirtyRange(0).isEmpty)
    assert(store.readLevel(1, 0, nowTs + 86400).count() > 0)
  }

  test("cascadeAuto: a clean level 0 does not block a dirty coarser level") {
    // 3-level cascade; late points age-route straight into level 1, so
    // only dirty(1) is recorded — an early return at clean level 0 would
    // strand that window forever (even under force)
    val store = new MetricStore(s"$root/s14",
      schema("s14", Seq(Archive(1, 60), Archive(3, 600), Archive(30, 6000)), AggMethod.Min))
    val late = nowTs - 120 // older than level 0's 60s retention, inside level 1's
    store.writeBatch(Seq(("m", late, 7.0, 1L)).toDF("metric", "ts", "value", "arrival"), nowTs)
    assert(store.dirtyRange(0).isEmpty && store.dirtyRange(1).nonEmpty)
    store.cascadeAuto(force = true)
    assert(store.dirtyRange(1).isEmpty, "level 1's dirty window was not consumed")
    assert(store.readLevel(2, 0, nowTs + 86400).count() > 0,
      "late point never propagated to the coarsest level")
  }

  test("compact rewrites a level resolving superseded slots (LSM maintenance)") {
    val store = new MetricStore(s"$root/s13", schema("s13", Seq(Archive(1, 60), Archive(3, 60))))
    val t = nowTs - 5
    store.writeBatch(Seq(("m", t, 1.0, 100L)).toDF("metric", "ts", "value", "arrival"), nowTs)
    store.writeBatch(Seq(("m", t, 9.0, 200L)).toDF("metric", "ts", "value", "arrival"), nowTs)
    assert(spark.read.parquet(s"$root/s13/s13/level_0").count() == 2)
    assert(store.compact(0) == 1) // one superseded row removed
    assert(spark.read.parquet(s"$root/s13/s13/level_0").count() == 1)
    assert(store.readLevel(0, t, t + 1).as[(String, Long, Double)].collect().toSeq ==
      Seq(("m", t, 9.0)))
  }

  /** Port of the reference's 21-slot lost-point golden vector
    * (tests/test_storage.py:150-186): two updates with mtime-style dirty
    * tracking; the trailing incomplete xff unit must NOT be propagated.
    */
  test("lost-point propagation golden vector (tests/test_storage.py:150-186)") {
    val store = new MetricStore(s"$root/s10",
      schema("s10", Seq(Archive(1, 60), Archive(3, 60)), AggMethod.Min, xff = 5.0))
    def batch(seeds: Range) = seeds.flatMap { i =>
      Seq(("cpu0", nowTs - i, 0.0 + i, (nowTs - i) * 1000L),
          ("cpu1", nowTs - i, 10.0 + i, (nowTs - i) * 1000L))
    }.toDF("metric", "ts", "value", "arrival")
    store.writeBatch(batch(30 to 44), nowTs)
    store.cascadeAuto()
    store.writeBatch(batch(0 to 14), nowTs)
    store.cascadeAuto()
    val fromTs = nowTs - 61
    val Some((level, df)) = store.fetch(Some("cpu0"), fromTs, nowTs, nowTs)
    assert(level == 1)
    val got = df.as[(String, Long, Option[Double])].collect().map(_._3).toSeq
    val n = None
    val expected = Seq(n, n, n, n, n, Some(44.0), Some(41.0), Some(38.0), Some(35.0),
      Some(32.0), Some(30.0), n, n, n, n, Some(14.0), Some(11.0), Some(8.0),
      Some(5.0), n, n)
    assert(got == expected, s"got $got")
  }

  /** Port of the boundary-aligned start-time golden vector
    * (tests/test_storage.py:188-205): a dirty range starting exactly on a
    * timeunit boundary still propagates.
    */
  test("boundary-aligned propagation golden vector (tests/test_storage.py:188-205)") {
    val store = new MetricStore(s"$root/s11",
      schema("s11", Seq(Archive(1, 60), Archive(3, 60)), AggMethod.Min, xff = 5.0))
    def batch(seeds: Range) = seeds.flatMap { i =>
      Seq(("cpu0", nowTs - i, 0.0 + i, (nowTs - i) * 1000L),
          ("cpu1", nowTs - i, 10.0 + i, (nowTs - i) * 1000L))
    }.toDF("metric", "ts", "value", "arrival")
    store.writeBatch(batch(10 to 19), nowTs)
    store.cascadeAuto()
    store.writeBatch(batch(1 to 6), nowTs)
    store.cascadeAuto()
    val fromTs = 1411628760L
    val untilTs = fromTs + 15
    val Some((level, df)) = store.fetch(Some("cpu0"), fromTs, untilTs, fromTs + 61)
    assert(level == 1)
    val got = df.as[(String, Long, Option[Double])].collect().map(_._3).toSeq
    assert(got == Seq(Some(17.0), Some(14.0), Some(11.0), Some(10.0), Some(5.0)), s"got $got")
  }

  /** Sparse-update vector (tests/test_storage.py:207-218): missing finest
    * slots fetch as nulls.
    */
  test("sparse update golden vector (tests/test_storage.py:207-218)") {
    val store = new MetricStore(s"$root/s12",
      schema("s12", Seq(Archive(1, 60), Archive(3, 60)), AggMethod.Min))
    val pts = Seq(1, 2, 4, 5).flatMap { i =>
      Seq(("cpu0", nowTs - i, 0.0 + i, (nowTs - i) * 1000L),
          ("cpu1", nowTs - i, 10.0 + i, (nowTs - i) * 1000L))
    }.toDF("metric", "ts", "value", "arrival")
    store.writeBatch(pts, nowTs)
    val Some((level, df)) = store.fetch(Some("cpu0"), nowTs - 5, nowTs, nowTs)
    assert(level == 0)
    val got = df.as[(String, Long, Option[Double])].collect().map(_._3).toSeq
    assert(got == Seq(Some(5.0), Some(4.0), None, Some(2.0), Some(1.0)), s"got $got")
  }

  test("retention TTL drops too-old partitions (ring overwrite analog)") {
    val store = new MetricStore(s"$root/s6", schema("s6", Seq(Archive(1, 86400), Archive(60, 86400 * 10 / 60))))
    val old = Seq(("m", nowTs - 86400 * 5, 1.0, 1L)).toDF("metric", "ts", "value", "arrival")
    val fresh = Seq(("m", nowTs - 10, 2.0, 2L)).toDF("metric", "ts", "value", "arrival")
    store.writeBatch(old.unionAll(fresh), nowTs)
    assert(store.readLevel(1, 0, nowTs + 86400).count() == 1)
    store.enforceRetention(nowTs + 86400 * 30) // way past retention
    assert(store.readLevel(1, 0, nowTs + 86400).isEmpty)
  }
}
