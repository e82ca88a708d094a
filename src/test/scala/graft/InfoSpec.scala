package graft

import graft.core.{Archive, StorageSchema, StorageSchemas, AggMethod}
import graft.ops.Info
import graft.storage.{Catalog, MetricStore}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The kenshin-info/kenshin-debug analog must report a populated store
  * accurately (schema, per-level rows/partitions/bytes/span/dirty, catalog
  * counts) and peek stored points.
  */
class InfoSpec extends AnyFunSuite with BeforeAndAfterAll {
  implicit lazy val spark = SparkTestBase.spark
  import spark.implicits._

  val nowTs = 1411628779L
  var root: java.nio.file.Path = _
  var store: MetricStore = _

  override def beforeAll(): Unit = {
    root = java.nio.file.Files.createTempDirectory("graft-info")
    val schema = StorageSchema("inf", ".*".r, 1.0, AggMethod.Average,
      Seq(Archive(1, 600), Archive(60, 86400)), 600, 8)
    val catalog = new Catalog(s"$root/st", new StorageSchemas(Seq(schema)))
    store = new MetricStore(s"$root/st", schema, Some(catalog))
    val pts = (1 to 10).map(i => ("cpu.load", nowTs - i, i.toDouble, i.toLong))
      .toDF("metric", "ts", "value", "arrival")
    val admitted = catalog.admit(pts, nowTs)
    store.writeBatch(admitted, nowTs)
  }

  override def afterAll(): Unit = {
    import scala.reflect.io.Directory
    new Directory(new java.io.File(root.toString)).deleteRecursively()
    ()
  }

  test("report covers schema, cascade, per-level stats and the catalog") {
    val r = Info.report(store)
    assert(r.contains("schema: inf"))
    assert(r.contains("aggregation: average"))
    assert(r.contains("level_0: step=1s retention=600s rows=10 partitions=1"))
    assert(r.contains(s"ts=[${nowTs - 10}, ${nowTs - 1}]"))
    assert(r.contains("dirty=["), "un-cascaded writes must show their dirty range")
    assert(r.contains("level_1: step=60s retention=5184000s rows=0 partitions=0 bytes=0"))
    assert(r.contains("catalog: 1 metrics (inf=1)"))
  }

  test("level infos carry machine-readable numbers") {
    val lis = Info.levelInfos(store)
    assert(lis.map(_.level) == Seq(0, 1))
    assert(lis(0).rows == 10 && lis(0).bytes > 0 && lis(0).partitions == 1)
    assert(lis(0).tsMin.contains(nowTs - 10) && lis(0).tsMax.contains(nowTs - 1))
    assert(lis(1).rows == 0 && lis(1).tsMin.isEmpty)
  }

  test("debugPoints peeks one metric's slots in a window") {
    val pts = Info.debugPoints(store, 0, "cpu.load", nowTs - 5, nowTs)
    assert(pts == (1 to 5).reverse.map(i => (nowTs - i, i.toDouble)))
  }
}
