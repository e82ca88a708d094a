package graft

import graft.core.StorageSchemas
import graft.storage.{Catalog, MetricStore}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Fetch CLI round trip (reference: bin/kenshin-fetch.py prints
  * `ts\tvalue` lines, None for gaps).
  */
class FetchCliSpec extends AnyFunSuite with BeforeAndAfterAll {
  implicit lazy val spark = SparkTestBase.spark
  import spark.implicits._

  var root: java.nio.file.Path = _
  override def beforeAll(): Unit = { root = java.nio.file.Files.createTempDirectory("graft-cli") }
  override def afterAll(): Unit = {
    import scala.reflect.io.Directory
    new Directory(new java.io.File(root.toString)).deleteRecursively()
    ()
  }

  test("Fetch.run prints ts\\tvalue lines with None for gaps") {
    val conf =
      """[cli]
        |pattern = ^cli\.
        |retentions = 1s:60s,3s:180s
        |aggregationMethod = min
        |""".stripMargin
    val confPath = s"$root/storage-schemas.conf"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(confPath), conf)
    val schemas = StorageSchemas.load(confPath)
    val storeRoot = s"$root/store"
    val cat = new Catalog(storeRoot, schemas)
    val store = new MetricStore(storeRoot, schemas.schemaFor("cli.m"), Some(cat))
    val now = 1700003600L
    val pts = Seq(("cli.m", now - 5, 1.5, 1L), ("cli.m", now - 3, 2.5, 2L))
      .toDF("metric", "ts", "value", "arrival")
    cat.admit(pts, now)
    store.writeBatch(pts, now)

    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) {
      Fetch.run(spark, Array(storeRoot, confPath, "cli.m",
        (now - 5).toString, now.toString, now.toString))
    }
    val lines = out.toString.trim.split("\n").toSeq
    assert(lines.head == "# level=0 step=1")
    assert(lines.tail == Seq(
      s"${now - 5}\t1.5", s"${now - 4}\tNone", s"${now - 3}\t2.5",
      s"${now - 2}\tNone", s"${now - 1}\tNone"))
  }
}
