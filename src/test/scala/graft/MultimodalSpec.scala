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

  // ---- REAL image decode (JDK javax.imageio codecs) ----------------------

  /** A deterministic 8x4 test image: left half solid red, right half solid
    * blue — expectations below are first-principles pixel math, not a
    * round trip through the code under test.
    */
  private def writeTestPng(path: java.nio.file.Path): Unit = {
    val img = new java.awt.image.BufferedImage(8, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 8)
      img.setRGB(x, y, if (x < 4) 0xff0000 else 0x0000ff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    java.nio.file.Files.write(path, bos.toByteArray)
    ()
  }

  test("imageFeatures really decodes PNG payloads and extracts exact pixel stats") {
    val dir = java.nio.file.Files.createTempDirectory("graft-img")
    try {
      writeTestPng(dir.resolve("7.png"))
      val feats = Multimodal.imageFeatures(
        Multimodal.readBinaryDir(dir.toString), targetW = 4, targetH = 4).collect()
      assert(feats.length == 1)
      val f = feats.head
      assert(f.decoded && f.width == 8 && f.height == 4)
      // nearest-neighbor 4x4 resize of half-red/half-blue: 8 red + 8 blue px
      assert(f.mean_r == 127.5 && f.mean_g == 0.0 && f.mean_b == 127.5)
      // luma(red)=76 -> bin 4; luma(blue)=29 -> bin 1; 8 px each
      assert(f.luma_hist(4) == 8 && f.luma_hist(1) == 8 && f.luma_hist.sum == 16)
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir.toString)).deleteRecursively()
      ()
    }
  }

  test("undecodable payloads surface as decoded=false, not exceptions") {
    val feats = Multimodal.imageFeatures(
      Multimodal.readBinaryDir(root.toString, Some("*.png"))).collect()
    // 1001.png has a PNG magic but a garbage body — the reader must reject
    // it cleanly on the executor
    assert(feats.length == 1 && !feats.head.decoded && feats.head.width == -1)
  }

  test("resizeNearest is an exact deterministic sampling (no interpolation)") {
    val img = new java.awt.image.BufferedImage(2, 1, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0x102030); img.setRGB(1, 0, 0x405060)
    // upscale 2x1 -> 4x1: each source pixel repeats exactly twice
    val px = Multimodal.resizeNearest(img, 4, 1).map(_ & 0xffffff)
    assert(px.toSeq == Seq(0x102030, 0x102030, 0x405060, 0x405060))
  }
}
