package graft

import graft.operators.Multimodal
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Multimodal plumbing: the real binaryFile source, batch feature
  * extraction via mapPartitions, and the metadata-only pass.
  */
class MultimodalSpec extends AnyFunSuite with BeforeAndAfterAll {
  implicit lazy val spark = SparkTestBase.spark

  var root: java.nio.file.Path = _
  override def beforeAll(): Unit = {
    root = java.nio.file.Files.createTempDirectory("graft-media")
    // synthesize a tiny media tree: PNG magic + arbitrary payloads
    java.nio.file.Files.write(root.resolve("1001.png"),
      Array[Byte](0x89.toByte, 0x50, 0x4e, 0x47) ++ Array.tabulate(60)(_.toByte))
    java.nio.file.Files.write(root.resolve("1002.wav"),
      "RIFFxxxxWAVE".getBytes ++ Array.tabulate(30)(i => (i * 3).toByte))
    java.nio.file.Files.write(root.resolve("notes.txt"), "hello".getBytes)
  }
  override def afterAll(): Unit = {
    import scala.reflect.io.Directory
    new Directory(new java.io.File(root.toString)).deleteRecursively()
    ()
  }

  test("binaryFile source yields the media-table shape (id from stem, kind from extension)") {
    val media = Multimodal.readBinaryDir(root.toString)
    val rows = media.collect().map(r => (r.getLong(0), r.getString(1),
      r.getAs[Array[Byte]](2).length)).sortBy(_._1)
    assert(rows.map(t => (t._1, t._2)).filter(_._1 < 2000L).toSeq ==
      Seq((1001L, "png"), (1002L, "wav")))
    assert(rows.find(_._1 == 1001L).get._3 == 64)
    // no numeric stem -> stable hashed id, kind still from extension
    assert(rows.exists(t => t._2 == "txt" && t._1 > 2000L))
  }

  test("pathGlobFilter pushes file pruning into the source") {
    val media = Multimodal.readBinaryDir(root.toString, Some("*.png"))
    assert(media.count() == 1)
  }

  test("extractFeatures streams payloads through the per-partition decoder") {
    val feats = Multimodal.extractFeatures(
        Multimodal.readBinaryDir(root.toString, Some("*.png")), frameStride = 16)
      .collect()
    assert(feats.length == 1)
    val f = feats.head
    assert(f.media_id == 1001L && f.kind == "png")
    assert(f.header_hex == "89504e47") // PNG magic sniffed
    assert(f.n_bytes == 64)
    assert(f.frame_offsets == Seq(0, 16, 32, 48))
  }
}
