package graft

import graft.operators.Multimodal
import org.scalatest.funsuite.AnyFunSuite

/** Real WAV/PCM audio decode, pinned by byte-for-byte synthesized RIFF
  * files (the WhisperImportSpec discipline): square/ramp waves with
  * hand-computable peak/RMS/envelope, 8-bit unsigned and 16-bit signed,
  * stereo interleave, extension-chunk tolerance, truncation, and the
  * distributed mapPartitions path.
  */
class AudioWavSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def le16(v: Int): Seq[Byte] = Seq((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Int): Seq[Byte] =
    Seq(v & 0xff, (v >> 8) & 0xff, (v >> 16) & 0xff, (v >> 24) & 0xff).map(_.toByte)

  /** Synthesize a PCM WAV byte-for-byte per the RIFF spec. 16-bit samples
    * are signed LE; 8-bit are unsigned (offset 128) — `samples` is always
    * the SIGNED amplitude, encoded per `bits`.
    */
  private def wav(ch: Int, rate: Int, bits: Int, samples: Seq[Int],
                  junkChunk: Boolean = false, dataLenOverride: Option[Int] = None): Array[Byte] = {
    val dataBytes: Seq[Byte] =
      if (bits == 8) samples.map(s => ((s + 128) & 0xff).toByte)
      else samples.flatMap(le16)
    val junk: Seq[Byte] =
      if (junkChunk) "LIST".getBytes.toSeq ++ le32(4) ++ "INFO".getBytes.toSeq else Seq.empty
    val fmt = "fmt ".getBytes.toSeq ++ le32(16) ++ le16(1) ++ le16(ch) ++ le32(rate) ++
      le32(rate * ch * bits / 8) ++ le16(ch * bits / 8) ++ le16(bits)
    val data = "data".getBytes.toSeq ++ le32(dataLenOverride.getOrElse(dataBytes.length)) ++ dataBytes
    val body = "WAVE".getBytes.toSeq ++ fmt ++ junk ++ data
    ("RIFF".getBytes.toSeq ++ le32(body.length) ++ body).toArray
  }

  test("16-bit square wave: exact peak, RMS, frames, duration") {
    val samples = Seq.tabulate(16)(i => if (i % 2 == 0) 1000 else -1000)
    val Some((ch, rate, bits, dec)) = Multimodal.decodeWav(wav(1, 8000, 16, samples))
    assert((ch, rate, bits) == (1, 8000, 16))
    assert(dec.toSeq == samples)
    val f = featuresOf(wav(1, 8000, 16, samples))
    assert(f.decoded && f.n_frames == 16 && f.duration_ms == 2) // 16/8000 s
    assert(f.peak == 1000 && f.rms == 1000.0)
  }

  test("8-bit unsigned centering: amplitude is sample-128") {
    val f = featuresOf(wav(1, 4000, 8, Seq(50, -50, 50, -50)))
    assert(f.decoded && f.bits == 8 && f.peak == 50 && f.rms == 50.0 && f.n_frames == 4)
  }

  test("stereo interleave: frames = samples/channels, peak across channels") {
    // L=100, R=-300 repeated 4x -> 4 frames
    val inter = Seq(100, -300, 100, -300, 100, -300, 100, -300)
    val f = featuresOf(wav(2, 1000, 16, inter))
    assert(f.decoded && f.channels == 2 && f.n_frames == 4 && f.duration_ms == 4)
    assert(f.peak == 300)
    // rms = sqrt((4*100^2 + 4*300^2)/8) = sqrt(50000)
    assert(f.rms == BigDecimal(math.sqrt(50000.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("16-frame ramp: envelope is the per-frame amplitude exactly") {
    val samples = Seq.tabulate(16)(i => i * 10) // frames == segments
    val f = featuresOf(wav(1, 16000, 16, samples))
    assert(f.envelope == Seq.tabulate(16)(i => (i * 10).toLong))
  }

  test("extension chunks are skipped; truncated data decodes the intact prefix") {
    val withJunk = wav(1, 8000, 16, Seq(7, -7), junkChunk = true)
    assert(Multimodal.decodeWav(withJunk).get._4.toSeq == Seq(7, -7))
    // header claims 100 sample bytes, file carries 2 samples
    val truncated = wav(1, 8000, 16, Seq(7, -7), dataLenOverride = Some(100))
    assert(Multimodal.decodeWav(truncated).get._4.toSeq == Seq(7, -7))
  }

  test("non-WAV, float-PCM, and garbage payloads refuse to decode") {
    assert(Multimodal.decodeWav("not audio at all".getBytes).isEmpty)
    assert(Multimodal.decodeWav(Array.empty[Byte]).isEmpty)
    val floatTag = wav(1, 8000, 16, Seq(1, 2))
    floatTag(20) = 3 // format tag IEEE float
    assert(Multimodal.decodeWav(floatTag).isEmpty)
  }

  test("distributed decode over a media table: executors compute, driver sees features") {
    import spark.implicits._
    implicit val s = spark
    val rows = Seq(
      Multimodal.MediaRow(1L, "wav", wav(1, 8000, 16, Seq.fill(8)(500))),
      Multimodal.MediaRow(2L, "wav", wav(2, 44100, 16, Seq.tabulate(20)(i => i * 100))),
      Multimodal.MediaRow(3L, "bin", "junk payload".getBytes))
    val got = Multimodal.audioFeatures(rows.toDF())
      .collect().sortBy(_.media_id)
    assert(got(0).decoded && got(0).rms == 500.0 && got(0).sample_rate == 8000)
    assert(got(1).decoded && got(1).channels == 2 && got(1).n_frames == 10)
    assert(!got(2).decoded)
  }

  private def featuresOf(bytes: Array[Byte]): Multimodal.AudioFeatures = {
    import spark.implicits._
    implicit val s = spark
    Multimodal.audioFeatures(Seq(Multimodal.MediaRow(1L, "wav", bytes)).toDF())
      .collect().head
  }
}
