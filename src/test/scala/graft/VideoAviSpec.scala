package graft

import graft.operators.Multimodal
import org.scalatest.funsuite.AnyFunSuite

/** Real AVI container metadata, pinned by byte-for-byte synthesized RIFF
  * files (the AudioWavSpec discipline): avih main-header fields, vids
  * stream-header codec/fps, nested-LIST traversal, audio-only fallback,
  * rejection of non-AVI payloads, and the distributed mapPartitions path.
  */
class VideoAviSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def le16(v: Int): Seq[Byte] = Seq((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Int): Seq[Byte] =
    Seq(v & 0xff, (v >> 8) & 0xff, (v >> 16) & 0xff, (v >> 24) & 0xff).map(_.toByte)
  private def fourcc(s: String): Seq[Byte] = s.getBytes("US-ASCII").toSeq

  private def chunk(id: String, body: Seq[Byte]): Seq[Byte] =
    fourcc(id) ++ le32(body.length) ++ body ++
      (if (body.length % 2 == 1) Seq(0.toByte) else Seq.empty)

  private def list(typ: String, body: Seq[Byte]): Seq[Byte] =
    chunk("LIST", fourcc(typ) ++ body)

  /** AVIMAINHEADER: 56 bytes, usPerFrame/totalFrames/streams/width/height
    * at offsets 0/16/24/32/36.
    */
  private def avih(usPerFrame: Int, frames: Int, streams: Int, w: Int, h: Int): Seq[Byte] =
    chunk("avih", le32(usPerFrame) ++ le32(0) ++ le32(0) ++ le32(0) ++
      le32(frames) ++ le32(0) ++ le32(streams) ++ le32(0) ++
      le32(w) ++ le32(h) ++ Seq.fill(16)(0.toByte))

  /** AVISTREAMHEADER: fccType/fccHandler at 0/4, scale/rate at 20/24. */
  private def strh(typ: String, handler: String, scale: Int, rate: Int): Seq[Byte] =
    chunk("strh", fourcc(typ) ++ fourcc(handler) ++ le32(0) ++ le16(0) ++ le16(0) ++
      le32(0) ++ le32(scale) ++ le32(rate) ++ Seq.fill(24)(0.toByte))

  private def avi(hdrl: Seq[Byte]): Array[Byte] = {
    val body = fourcc("AVI ") ++ list("hdrl", hdrl) ++ list("movi", Seq.fill(8)(0.toByte))
    (fourcc("RIFF") ++ le32(body.length) ++ body).toArray
  }

  test("avih + vids strh: exact width/height/frames/fps/codec") {
    val bytes = avi(
      avih(40000, 250, 2, 320, 240) ++
        list("strl", strh("vids", "MJPG", 1, 25)) ++
        list("strl", strh("auds", "pcm ", 1, 8000)))
    val Some((w, h, frames, streams, fpsMilli, durMs, codec)) =
      Multimodal.decodeAviMeta(bytes)
    assert((w, h, frames, streams) == (320, 240, 250, 2))
    assert(fpsMilli == 25000L)       // rate/scale = 25 fps exactly
    assert(durMs == 10000L)          // 250 frames * 40ms
    assert(codec == "mjpg")          // fourcc lowercased
  }

  test("fractional fps stays exact in milli-fps integer math (NTSC 29.97)") {
    val bytes = avi(
      avih(33367, 300, 1, 640, 480) ++
        list("strl", strh("vids", "xvid", 1001, 30000)))
    val Some((_, _, _, _, fpsMilli, _, _)) = Multimodal.decodeAviMeta(bytes)
    assert(fpsMilli == 29970L) // 30000*1000/1001, floor — no float drift
  }

  test("audio-only AVI falls back to avih-derived fps and empty codec") {
    val bytes = avi(
      avih(40000, 100, 1, 0, 0) ++
        list("strl", strh("auds", "pcm ", 1, 8000)))
    val Some((_, _, frames, _, fpsMilli, _, codec)) = Multimodal.decodeAviMeta(bytes)
    assert(frames == 100 && codec == "" && fpsMilli == 25000L) // 1e9/40000us
  }

  test("non-AVI payloads (WAV, junk, truncated header) return None, never throw") {
    assert(Multimodal.decodeAviMeta("RIFF1234WAVE".getBytes).isEmpty)
    assert(Multimodal.decodeAviMeta("not media at all".getBytes).isEmpty)
    assert(Multimodal.decodeAviMeta(Array[Byte](82, 73)).isEmpty)
    // well-formed RIFF AVI whose avih body is truncated below 40 bytes
    val trunc = avi(chunk("avih", le32(40000) ++ le32(0)))
    assert(Multimodal.decodeAviMeta(trunc).isEmpty)
  }

  test("crafted oversized chunk length terminates the walk instead of wrapping (no throw)") {
    // len = 0x7FFFFFF0: the old Int walk wrapped pos negative, passed the
    // `pos + 8 <= end` guard, and threw StringIndexOutOfBoundsException —
    // one bad payload failing the whole executor task
    val hugeLen = fourcc("JUNK") ++ le32(0x7FFFFFF0) ++ Seq.fill(16)(0.toByte)
    val body = fourcc("AVI ") ++ list("hdrl",
      avih(40000, 250, 1, 320, 240) ++
        list("strl", strh("vids", "MJPG", 1, 25))) ++ hugeLen
    val bytes = (fourcc("RIFF") ++ le32(body.length) ++ body).toArray
    // headers before the bad chunk still parse; the walk just ends there
    val Some((w, h, frames, _, _, _, codec)) = Multimodal.decodeAviMeta(bytes)
    assert((w, h, frames, codec) == (320, 240, 250, "mjpg"))
    // same crafted len with the huge chunk FIRST: nothing parsed, None, no throw
    val bad = (fourcc("RIFF") ++ le32(24) ++ fourcc("AVI ") ++ hugeLen).toArray
    assert(Multimodal.decodeAviMeta(bad).isEmpty)
    assert(Multimodal.aviFrameChunks(bad, 8).isEmpty)
    // decodeWav, same latent pattern: huge chunk between fmt and data must
    // end the walk gracefully (no data chunk found -> None), never throw
    val wav = ("RIFF".getBytes("US-ASCII").toSeq ++ le32(100) ++
      fourcc("WAVE") ++
      chunk("fmt ", le16(1) ++ le16(1) ++ le32(8000) ++ le32(8000) ++
        le16(1) ++ le16(8)) ++
      fourcc("JUNK") ++ le32(0x7FFFFFF0) ++ Seq.fill(8)(0.toByte) ++
      chunk("data", Seq.fill(4)(100.toByte))).toArray
    assert(Multimodal.decodeWav(wav).isEmpty)
  }

  // ——— MJPEG frame decode: the one codec the container grammar alone
  // permits — each 00dc chunk is a plain baseline JPEG, decodable by the
  // same javax.imageio path as still images ———

  private def jpegBytes(rgb: Int, w: Int = 48, h: Int = 32): Seq[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setColor(new java.awt.Color(rgb))
    g.fillRect(0, 0, w, h)
    g.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray.toSeq
  }

  private def mjpegAvi(frames: Seq[Seq[Byte]], w: Int = 48, h: Int = 32): Array[Byte] = {
    val movi = frames.map(f => chunk("00dc", f)).foldLeft(Seq.empty[Byte])(_ ++ _) ++
      chunk("01wb", Seq.fill(64)(7.toByte)) // an audio chunk the walk must skip
    val body = fourcc("AVI ") ++
      list("hdrl", avih(40000, frames.length, 1, w, h) ++
        list("strl", strh("vids", "MJPG", 1, 25))) ++
      list("movi", movi)
    (fourcc("RIFF") ++ le32(body.length) ++ body).toArray
  }

  test("aviFrameChunks: movi 00dc chunks in order, audio chunks skipped, maxFrames bound") {
    val f1 = jpegBytes(0xff0000)
    val f2 = jpegBytes(0x0000ff)
    val bytes = mjpegAvi(Seq(f1, f2))
    val got = Multimodal.aviFrameChunks(bytes, 8)
    assert(got.length == 2)
    assert(got(0).toSeq == f1 && got(1).toSeq == f2)
    assert(Multimodal.aviFrameChunks(bytes, 1).length == 1)
    // rec-grouped movi sublists recurse (interleaved AVIs group frames)
    val recd = {
      val movi = list("rec ", chunk("00dc", f1)) ++ chunk("00dc", f2)
      val body = fourcc("AVI ") ++
        list("hdrl", avih(40000, 2, 1, 48, 32) ++
          list("strl", strh("vids", "MJPG", 1, 25))) ++ list("movi", movi)
      (fourcc("RIFF") ++ le32(body.length) ++ body).toArray
    }
    assert(Multimodal.aviFrameChunks(recd, 8).length == 2)
  }

  test("videoFrameStats: MJPEG frames decode to real pixel statistics") {
    import spark.implicits._
    val red = jpegBytes(0xff0000)  // luma ≈ 76
    val blue = jpegBytes(0x0000ff) // luma ≈ 29
    val rows = Seq(
      Multimodal.MediaRow(1L, "avi", mjpegAvi(Seq(red, blue))),
      Multimodal.MediaRow(2L, "bin", "not video".getBytes)).toDF()
    val got = Multimodal.videoFrameStats(rows)(spark).collect().sortBy(_.media_id)
    val v = got(0)
    assert(v.sampled_frames == 2 && v.decoded_frames == 2)
    assert(v.width == 48 && v.height == 32) // native size of the first frame
    // solid-color JPEG round-trips near-exactly; mean over (red + blue)/2
    assert(math.abs(v.mean_r - 127.5) < 8, s"mean_r=${v.mean_r}")
    assert(math.abs(v.mean_b - 127.5) < 8, s"mean_b=${v.mean_b}")
    assert(v.mean_g < 8, s"mean_g=${v.mean_g}")
    // motion proxy: |luma(red) - luma(blue)| ≈ 47
    assert(math.abs(v.motion - 47) < 10, s"motion=${v.motion}")
    assert(got(1).decoded_frames == 0 && got(1).sampled_frames == 0)
  }

  test("videoFeatures distributed path: real AVI rows decode, others flagged") {
    import spark.implicits._
    val good = avi(avih(20000, 50, 1, 160, 120) ++
      list("strl", strh("vids", "h264", 1, 50)))
    val rows = Seq(
      Multimodal.MediaRow(1L, "avi", good),
      Multimodal.MediaRow(2L, "bin", "nope".getBytes)).toDF()
    val got = Multimodal.videoFeatures(rows)(spark).collect().sortBy(_.media_id)
    assert(got(0).decoded && got(0).width == 160 && got(0).height == 120 &&
      got(0).n_frames == 50 && got(0).fps_milli == 50000L &&
      got(0).duration_ms == 1000L && got(0).codec == "h264")
    assert(!got(1).decoded && got(1).width == -1)
  }
}
