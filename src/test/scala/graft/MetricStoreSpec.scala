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
    // dirty range of 5s does not cross a 15s boundary from a unit start
    val from = (nowTs / 15) * 15
    store.cascade(from, from + 5)
    assert(!store.tableExists(s"$root/s5/s5/level_1"))
    store.cascade(from, from + 20) // crosses -> propagates
    assert(store.tableExists(s"$root/s5/s5/level_1"))
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
