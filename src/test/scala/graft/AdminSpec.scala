package graft

import graft.core.{AggMethod, Archive, StorageSchema, StorageSchemas}
import graft.ops.Admin
import graft.storage.{Catalog, MetricStore}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Admin ops: delete-metrics, change-schema (CHANGE_META vs REBUILD split),
  * and the long-format migration round trip.
  * Reference: bin/kenshin-delete.py, bin/kenshin-change-schema.py:34-126,
  * bin/kenshin-rehash.py.
  */
class AdminSpec extends AnyFunSuite with BeforeAndAfterAll {
  implicit lazy val spark = SparkTestBase.spark
  import spark.implicits._

  val nowTs = 1411628779L
  var root: java.nio.file.Path = _
  override def beforeAll(): Unit = { root = java.nio.file.Files.createTempDirectory("graft-admin") }
  override def afterAll(): Unit = {
    import scala.reflect.io.Directory
    new Directory(new java.io.File(root.toString)).deleteRecursively()
    ()
  }

  def schema(name: String, archives: Seq[Archive], agg: AggMethod = AggMethod.Min, xff: Double = 1.0) =
    StorageSchema(name, ".*".r, xff, agg, archives, 600, 8)

  def points(is: Range) =
    is.flatMap { i =>
      Seq(("cpu0", nowTs - i, 0.0 + i, i.toLong), ("cpu1", nowTs - i, 10.0 + i, i.toLong))
    }.toDF("metric", "ts", "value", "arrival")

  test("deleteMetrics also purges the hot cache (no resurrection at next flush)") {
    import graft.streaming.HotCache
    val store = new MetricStore(s"$root/d0", schema("d0", Seq(Archive(1, 600), Archive(3, 1800))))
    val hot = new HotCache(store, cacheRetention = 300, waitTime = 60)
    // recent points stay in the hot table (above the watermark)
    hot.processBatch(Seq(("cpu0", nowTs - 5, 1.0, 1L), ("cpu1", nowTs - 5, 2.0, 2L))
      .toDF("metric", "ts", "value", "arrival"), nowTs)
    assert(hot.hotView().select("metric").distinct().count() == 2)
    Admin.deleteMetrics(store, Seq("cpu0"))
    assert(hot.hotView().select("metric").as[String].collect().toSet == Set("cpu1"))
    // the flush that follows must not bring cpu0 back into level 0
    hot.flush(nowTs + 3600)
    val lvl0 = store.readLevel(0, 0, nowTs + 86400).select("metric").distinct()
      .as[String].collect().toSet
    assert(!lvl0.contains("cpu0"), "deleted metric resurrected from the hot cache")
  }

  test("readPerMetricTree of an empty tree yields an empty frame, not a crash") {
    val dir = java.nio.file.Files.createTempDirectory(root, "empty-tree")
    val df = Admin.readPerMetricTree(dir.toString)
    assert(df.count() == 0 && df.columns.toSeq == Seq("metric", "ts", "value"))
  }

  test("deleteMetrics removes a metric from every level and the catalog") {
    val sch = schema("d1", Seq(Archive(1, 60), Archive(3, 60)))
    val cat = new Catalog(s"$root/d1-cat", new StorageSchemas(Seq(sch)))
    val store = new MetricStore(s"$root/d1", sch, Some(cat))
    cat.admit(points(1 to 6), nowTs)
    store.writeBatch(points(1 to 6), nowTs)
    store.cascade(nowTs - 6, nowTs, force = true)
    Admin.deleteMetrics(store, Seq("cpu0"))
    (0 to 1).foreach { lvl =>
      val left = store.readLevel(lvl, 0, nowTs + 86400).select("metric").distinct()
        .as[String].collect().toSet
      assert(left == Set("cpu1"), s"level $lvl")
    }
    assert(cat.metrics().select("metric").as[String].collect().toSeq == Seq("cpu1"))
    // remaining metric's data is intact
    val Some((_, df)) = store.fetch(Some("cpu1"), nowTs - 5, nowTs, nowTs)
    assert(df.where(col("value").isNotNull).count() == 5)
  }

  test("plan splits CHANGE_META vs REBUILD exactly like the reference (change-schema.py:41-67)") {
    val a = schema("s", Seq(Archive(1, 60), Archive(3, 60)), AggMethod.Min, 1.0)
    assert(Admin.plan(a, a) == Admin.NoOperation)
    assert(Admin.plan(a, a.copy(xFilesFactor = 5.0)) == Admin.ChangeMeta)
    assert(Admin.plan(a, a.copy(aggregationMethod = AggMethod.Max)) == Admin.ChangeMeta)
    assert(Admin.plan(a, a.copy(archives = Seq(Archive(1, 60), Archive(6, 60)))) == Admin.Rebuild)
    // retention change beats a simultaneous meta change
    assert(Admin.plan(a, a.copy(archives = Seq(Archive(2, 60)), xFilesFactor = 2.0)) == Admin.Rebuild)
  }

  test("changeMeta keeps data, swaps aggregation for future cascades") {
    val store = new MetricStore(s"$root/cm", schema("cm", Seq(Archive(1, 60), Archive(3, 60)), AggMethod.Min))
    store.writeBatch(points(1 to 6), nowTs)
    val maxStore = Admin.changeMeta(store, schema("cm", Seq(Archive(1, 60), Archive(3, 60)), AggMethod.Max))
    maxStore.cascade(nowTs - 6, nowTs, force = true)
    // propagated slots now carry MAX per window: window min..max of i -> max val
    val byWindow = (1 to 6).groupBy(i => ((nowTs - i) / 3) * 3)
      .map { case (w, is) => (w, 0.0 + is.max) }
    val got = maxStore.readLevel(1, 0, nowTs + 86400)
      .where(col("metric") === "cpu0").as[(String, Long, Double)].collect()
    got.foreach { case (_, ts, v) => assert(byWindow(ts) == v, s"slot $ts") }
    assert(got.length == byWindow.size)
  }

  test("rebuild re-aggregates into a new cascade preserving data (change-schema.py:81-126)") {
    val old = new MetricStore(s"$root/rb-old", schema("rb", Seq(Archive(1, 60), Archive(3, 60)), AggMethod.Min))
    old.writeBatch(points(1 to 30), nowTs)
    old.cascade(nowTs - 30, nowTs, force = true)
    // new cascade: 2s finest, 6s coarser
    val rebuilt = Admin.rebuild(old, s"$root/rb-new",
      schema("rb", Seq(Archive(2, 30), Archive(6, 60)), AggMethod.Min), nowTs)
    // level 0 (2s): every 2s slot holds the LWW of the 1s points (later ts wins)
    val l0 = rebuilt.readLevel(0, 0, nowTs + 86400)
      .where(col("metric") === "cpu0").as[(String, Long, Double)].collect()
      .map { case (_, ts, v) => ts -> v }.toMap
    val exp0 = (1 to 30).groupBy(i => ((nowTs - i) / 2) * 2)
      .map { case (w, is) => (w, 0.0 + is.min) } // later ts = smaller i = LWW winner... see assert below
    exp0.foreach { case (w, v) =>
      if (w >= nowTs - old.archives(0).retention) // within re-ingested window
        assert(l0(w) == v, s"slot $w")
    }
    // level 1 (6s): min-aggregated from level 0
    val l1 = rebuilt.readLevel(1, 0, nowTs + 86400)
      .where(col("metric") === "cpu0").as[(String, Long, Double)].collect()
    l1.foreach { case (_, ts, v) =>
      val mins = (1 to 30).filter(i => { val t = nowTs - i; t >= ts && t < ts + 6 })
      if (mins.nonEmpty) assert(v == mins.min.toDouble, s"slot $ts")
    }
    assert(l1.nonEmpty)
  }

  test("migration round trip: per-metric tree -> importSeries == direct writes (rehash analog)") {
    // synthesize the old per-metric layout
    val tree = s"$root/whisper-tree"
    Seq("svc.a", "svc.b").foreach { m =>
      (1 to 20).map(i => (nowTs - i, i * 1.0))
        .toDF("ts", "value")
        .write.mode("overwrite").parquet(s"$tree/$m")
    }
    val sch = schema("mig", Seq(Archive(1, 60), Archive(3, 60)))
    val migrated = new MetricStore(s"$root/mig-new", sch.copy(name = "mig1"))
    Admin.importSeries(Admin.readPerMetricTree(tree), migrated, nowTs)

    val direct = new MetricStore(s"$root/mig-direct", sch.copy(name = "mig2"))
    val pts = Seq("svc.a", "svc.b").flatMap(m => (1 to 20).map(i => (m, nowTs - i, i * 1.0, (nowTs - i))))
      .toDF("metric", "ts", "value", "arrival")
    direct.writeBatch(pts, nowTs)
    direct.cascade(nowTs - sch.maxRetention, nowTs, force = true)

    (0 to 1).foreach { lvl =>
      val a = migrated.readLevel(lvl, 0, nowTs + 86400)
        .as[(String, Long, Double)].collect().toSet
      val b = direct.readLevel(lvl, 0, nowTs + 86400)
        .as[(String, Long, Double)].collect().toSet
      assert(a == b, s"level $lvl differs")
    }
  }
}
