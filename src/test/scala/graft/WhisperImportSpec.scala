package graft

import graft.core.{Archive, StorageSchema, AggMethod}
import graft.ops.WhisperImport
import graft.storage.MetricStore
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Round-trip tests for the binary Whisper migration: synthesize `.wsp`
  * files byte-for-byte per the reference formats
  * (kenshin/tools/whisper_tool.py:9-21), import the tree, and require the
  * fetched data to equal a direct write of the same points.
  */
class WhisperImportSpec extends AnyFunSuite with BeforeAndAfterAll {
  implicit lazy val spark = SparkTestBase.spark
  import spark.implicits._

  val nowTs = 1411628779L
  var root: java.nio.file.Path = _

  override def beforeAll(): Unit = { root = java.nio.file.Files.createTempDirectory("graft-wsp") }
  override def afterAll(): Unit = {
    import scala.reflect.io.Directory
    new Directory(new java.io.File(root.toString)).deleteRecursively()
    ()
  }

  private def write(path: java.nio.file.Path, bytes: Array[Byte]): Unit = {
    java.nio.file.Files.createDirectories(path.getParent)
    java.nio.file.Files.write(path, bytes)
    ()
  }

  test("header round-trips byte-for-byte (metadata !2LfL + archives !3L)") {
    val bytes = WhisperImport.writeWsp(5, 0.5f,
      Seq((10, 100), (60, 50)), Seq(Map.empty, Map.empty))
    val h = WhisperImport.readHeader(bytes)
    assert(h.aggType == 5 && h.xff == 0.5f)
    assert(h.maxRetention == 60L * 50)
    assert(h.archives.map(a => (a.secondsPerPoint, a.count)) == Seq((10, 100), (60, 50)))
    // archive 0 starts right after the header; archive 1 right after 0's ring
    assert(h.archives(0).offset == WhisperImport.MetadataSize + 2 * WhisperImport.ArchiveInfoSize)
    assert(h.archives(1).offset == h.archives(0).offset + 100 * WhisperImport.PointSize)
  }

  test("ring unwind: slot position is irrelevant, ts=0 and expired slots drop") {
    val t0 = nowTs - nowTs % 10
    val pts = Map(7 -> (t0, 1.5), 2 -> (t0 - 10, 2.5), // live, out of ring order
      5 -> (nowTs - 2000L, 9.9)) // older than the 100s retention horizon
    val bytes = WhisperImport.writeWsp(1, 0.5f, Seq((10, 10)), Seq(pts))
    val got = WhisperImport.readPoints(bytes, nowTs).toSet
    assert(got == Set((0, t0, 1.5), (0, t0 - 10, 2.5)))
  }

  test("tree import fetches identically to a direct write of the same points") {
    val step = 10
    val t0 = nowTs - nowTs % step
    val series = Map(
      "srv.web.cpu" -> (1 to 5).map(i => (t0 - i * step, i * 1.0)),
      "srv.db.mem" -> (1 to 5).map(i => (t0 - i * step, i * 100.0)))
    // synthesize the whisper tree, points scattered across ring slots
    val tree = root.resolve("tree")
    series.foreach { case (metric, pts) =>
      val slots = pts.zipWithIndex.map { case ((ts, v), i) => (3 + i * 2) -> (ts, v) }.toMap
      val bytes = WhisperImport.writeWsp(1, 0.5f, Seq((step, 60)), Seq(slots))
      write(tree.resolve(metric.replace('.', '/') + ".wsp"), bytes)
    }
    def newStore(name: String) = new MetricStore(s"$root/$name",
      StorageSchema(name, ".*".r, 1.0, AggMethod.Average,
        Seq(Archive(step, 600), Archive(step * 6, 1200)), 600, 8))
    // import path
    val imported = newStore("imp")
    WhisperImport.importTree(tree.toString, imported, nowTs)
    // direct-write path
    val direct = newStore("dir")
    val rows = series.toSeq.flatMap { case (m, pts) => pts.map(p => (m, p._1, p._2, p._1)) }
      .toDF("metric", "ts", "value", "arrival")
    direct.writeBatch(rows, nowTs)
    direct.cascade(nowTs - direct.schema.maxRetention, nowTs, force = true)
    // fetches must agree, per metric, at both levels
    series.keys.foreach { m =>
      val Some((li, di)) = imported.fetch(Some(m), t0 - 6 * step, nowTs, nowTs)
      val Some((ld, dd)) = direct.fetch(Some(m), t0 - 6 * step, nowTs, nowTs)
      assert(li == ld)
      val a = di.as[(String, Long, Option[Double])].collect().toSeq
      val b = dd.as[(String, Long, Option[Double])].collect().toSeq
      assert(a == b, s"fetch mismatch for $m")
    }
  }

  test("two whisper archives: finer archive wins overlapping slots") {
    val step = 10
    val t0 = nowTs - nowTs % (step * 6)
    // fine archive and coarse archive both hold a point for the same
    // coarse-aligned slot with different values
    val fine = Map(0 -> (t0, 1.0))
    val coarse = Map(0 -> (t0, 999.0))
    val bytes = WhisperImport.writeWsp(1, 0.5f,
      Seq((step, 60), (step * 6, 60)), Seq(fine, coarse))
    write(root.resolve("tree2/m/a.wsp"), bytes)
    val store = new MetricStore(s"$root/imp2",
      StorageSchema("imp2", ".*".r, 1.0, AggMethod.Average,
        Seq(Archive(step, 600), Archive(step * 6, 1200)), 600, 8))
    WhisperImport.importTree(root.resolve("tree2").toString, store, nowTs)
    val Some((_, df)) = store.fetch(Some("m.a"), t0 - step, t0 + step, nowTs)
    val vals = df.where(col("value").isNotNull)
      .select(col("ts"), col("value")).as[(Long, Double)].collect().toMap
    assert(vals(t0) == 1.0, "the finer archive's point must win the slot")
  }
}
