package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video are carried as opaque
  * `binary` payload columns plus typed metadata, processed in batch form via
  * mapPartitions (the JVM analog of mapInPandas — one iterator per partition,
  * so decoders amortize per-batch setup and the payload never hits the
  * driver).
  *
  * IMAGE decode is REAL: the JDK ships codecs (javax.imageio —
  * PNG/JPEG/BMP/GIF) so `imageFeatures` decodes, resizes
  * (deterministic nearest-neighbor) and extracts pixel statistics on
  * executors. AUDIO decode is REAL for RIFF/WAV PCM (8/16-bit): a direct
  * byte-level chunk parse (`decodeWav`) — no library variance, bit-stable
  * features. VIDEO container metadata is REAL for AVI (RIFF again — the
  * same chunk parser family: `decodeAviMeta` reads width/height/fps/
  * frame-count/codec from avih/strh headers); only frame PIXEL decode
  * remains a clearly-marked deterministic STUB (`decodeStub`) — the
  * container has no video codecs — with the schema, partitioning, batch
  * shape and signature real: swap the stub for a JNI/codec call and
  * nothing else changes.
  */
object Multimodal {

  // ImageIO must not look for a display on executors
  try { System.setProperty("java.awt.headless", "true"); () }
  catch { case _: SecurityException => () }

  /** One media row: opaque bytes + typed metadata. */
  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])

  /** Extracted features (what a real decoder would emit). */
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Int,
      header_hex: String,    // first-4-bytes magic, as a codec would sniff
      checksum32: Long,      // payload integrity hash
      frame_offsets: Seq[Int]) // sampled "frame" positions (stride sampling)

  /** Builds a media table from documents: payload = UTF-8 bytes of the text
    * column standing in for encoded media. Real pipelines would read
    * `binaryFile` sources here; the downstream plumbing is identical.
    */
  def asMediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      lit("blob").as("kind"),
      col("text").cast("binary").as("payload"))

  /** Real binary source: Spark's `binaryFile` reader over a directory of
    * media files -> the same media-table shape (media_id from the file
    * name's numeric stem or a stable path hash, kind from the extension,
    * payload = raw bytes). Supports pushed path-glob filtering and
    * `pathGlobFilter`; files stream through executors, never the driver.
    */
  def readBinaryDir(path: String, glob: Option[String] = None)(implicit spark: SparkSession): DataFrame = {
    val reader = spark.read.format("binaryFile")
    val df = glob.fold(reader)(g => reader.option("pathGlobFilter", g)).load(path)
    val fileName = element_at(split(col("path"), "/"), -1)
    val stem = regexp_extract(fileName, "^(\\d+)", 1)
    df.select(
      // try_cast: an all-digit stem longer than a Long (hash-named assets)
      // falls back to the path hash instead of an ANSI cast overflow
      coalesce(stem.try_cast("long"), abs(xxhash64(col("path")))).as("media_id"),
      lower(coalesce(nullif(regexp_extract(fileName, "\\.([A-Za-z0-9]+)$", 1), lit("")),
        lit("bin"))).as("kind"),
      col("content").as("payload"))
  }

  /** STUB decode for AUDIO/VIDEO payloads (no AV codecs in this
    * environment) — deterministic fake features; pure function of the
    * payload bytes so tests and oracles can pin it. Image payloads have
    * the real path: `imageFeatures` below.
    */
  def decodeStub(row: MediaRow, frameStride: Int): MediaFeatures = {
    val bytes = row.payload
    val headerHex = bytes.take(4).map(b => f"${b & 0xff}%02x").mkString
    MediaFeatures(
      media_id = row.media_id,
      kind = row.kind,
      n_bytes = bytes.length,
      header_hex = headerHex,
      checksum32 = graft.functions.Fnv1a.hash32(bytes).toLong & 0xffffffffL,
      frame_offsets = bytes.indices.by(math.max(frameStride, 1)).toSeq)
  }

  /** Batch feature extraction: one decoder instantiation per partition,
    * payloads streamed through it (never collected). This is the operator a
    * resize / frame-sample / embed step plugs into.
    */
  def extractFeatures(media: DataFrame, frameStride: Int)(implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // per-partition decoder setup would go here
      rows.map(decodeStub(_, frameStride))
    }
  }

  /** Decoded-image statistics: what a training-data image pipeline filters
    * and dedups on before the expensive embed step.
    */
  final case class ImageFeatures(
      media_id: Long,
      kind: String,
      decoded: Boolean,
      width: Int,
      height: Int,
      mean_r: Double, mean_g: Double, mean_b: Double,
      luma_hist: Seq[Long]) // 16 bins over resized luma, a cheap visual signature

  /** Real image decode via the JDK's built-in codecs. Returns None for
    * payloads no installed reader accepts (truncated files, non-images).
    */
  def decodeImage(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
    try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
    catch { case _: java.io.IOException | _: RuntimeException => None }

  /** Deterministic nearest-neighbor resize — an explicit sampling loop, not
    * Graphics2D interpolation, so features are bit-stable across JVMs.
    */
  def resizeNearest(img: java.awt.image.BufferedImage, w: Int, h: Int): Array[Int] = {
    val out = new Array[Int](w * h)
    val (sw, sh) = (img.getWidth, img.getHeight)
    var y = 0
    while (y < h) {
      val sy = math.min(sh - 1, y * sh / h)
      var x = 0
      while (x < w) {
        out(y * w + x) = img.getRGB(math.min(sw - 1, x * sw / w), sy)
        x += 1
      }
      y += 1
    }
    out
  }

  private def featuresOf(row: MediaRow, w: Int, h: Int): ImageFeatures =
    decodeImage(row.payload) match {
      case None =>
        ImageFeatures(row.media_id, row.kind, decoded = false, -1, -1, 0, 0, 0, Seq.fill(16)(0L))
      case Some(img) =>
        val px = resizeNearest(img, w, h)
        var (r, g, b) = (0L, 0L, 0L)
        val hist = new Array[Long](16)
        var i = 0
        while (i < px.length) {
          val p = px(i)
          val (pr, pg, pb) = ((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff)
          r += pr; g += pg; b += pb
          // integer ITU-R 601 luma, exact across platforms
          hist(((pr * 299 + pg * 587 + pb * 114) / 1000) >> 4) += 1
          i += 1
        }
        val n = px.length.toDouble
        ImageFeatures(row.media_id, row.kind, decoded = true, img.getWidth, img.getHeight,
          r / n, g / n, b / n, hist.toSeq)
    }

  /** Distributed decode -> resize -> feature pass: one ImageIO context per
    * partition (mapPartitions), payload bytes never leave the executors.
    */
  def imageFeatures(media: DataFrame, targetW: Int = 32, targetH: Int = 32)
                   (implicit spark: SparkSession): Dataset[ImageFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.map(featuresOf(_, targetW, targetH))
    }
  }

  /** Decoded-audio statistics: what an audio training-data pipeline filters
    * and dedups on (silence detection, clipping, duration buckets) before
    * the expensive embed/transcribe step. Envelope = 16 equal time segments,
    * mean |amplitude| per segment by exact integer division — the audio
    * analog of the image luma histogram.
    */
  final case class AudioFeatures(
      media_id: Long,
      kind: String,
      decoded: Boolean,
      channels: Int,
      sample_rate: Int,
      bits: Int,
      n_frames: Long,
      duration_ms: Long,     // frames * 1000 / rate, exact integer math
      peak: Int,             // max |sample| across all channels
      rms: Double,           // sqrt of exact integer sum of squares / count
      envelope: Seq[Long])   // 16-segment mean-|amplitude| signature

  private def leInt(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
  private def leShort(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)).toShort.toInt

  /** RIFF/WAV PCM decode by direct chunk parse — pure byte math, no codec
    * library, so features are bit-identical on any JVM. Walks the chunk
    * list (tolerating extension chunks like LIST/fact), requires format tag
    * 1 (integer PCM) at 8 or 16 bits, and clamps the data length to the
    * payload so a truncated file decodes its intact prefix rather than
    * failing. Returns None for anything that isn't a well-formed PCM WAV.
    */
  def decodeWav(bytes: Array[Byte]): Option[(Int, Int, Int, Array[Int])] = {
    if (bytes.length < 44 ||
      !(bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F') ||
      !(bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E'))
      return None
    // walk position in Long: a crafted len near Int.MaxValue must terminate
    // the walk (pos sails past the end), not wrap negative and index bytes
    var pos = 12L
    var fmt: Option[(Int, Int, Int)] = None // channels, rate, bits
    var data: Option[(Int, Int)] = None     // offset, len
    while (pos + 8 <= bytes.length && (fmt.isEmpty || data.isEmpty)) {
      val p = pos.toInt // pos + 8 <= length: fits an Int
      val id = new String(bytes, p, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val len = leInt(bytes, p + 4)
      if (len < 0) return None
      if (id == "fmt " && len >= 16 && p + 8 + 16 <= bytes.length) {
        val tag = leShort(bytes, p + 8)
        val ch = leShort(bytes, p + 10)
        val rate = leInt(bytes, p + 12)
        val bits = leShort(bytes, p + 22)
        if (tag != 1 || ch < 1 || rate <= 0 || (bits != 8 && bits != 16)) return None
        fmt = Some((ch, rate, bits))
      } else if (id == "data") {
        data = Some((p + 8, math.min(len, bytes.length - p - 8)))
      }
      pos += 8L + len + (len & 1) // chunks are word-aligned
    }
    for ((ch, rate, bits) <- fmt; (off, len) <- data) yield {
      val bytesPerSample = bits / 8
      val n = len / bytesPerSample
      val samples = new Array[Int](n)
      var i = 0
      while (i < n) {
        // 8-bit WAV is unsigned (centered at 128); 16-bit is signed LE
        samples(i) =
          if (bits == 8) (bytes(off + i) & 0xff) - 128
          else leShort(bytes, off + i * 2)
        i += 1
      }
      (ch, rate, bits, samples)
    }
  }

  private def audioFeaturesOf(row: MediaRow): AudioFeatures =
    decodeWav(row.payload) match {
      case None =>
        AudioFeatures(row.media_id, row.kind, decoded = false, -1, -1, -1, 0L, 0L, 0,
          0.0, Seq.fill(16)(0L))
      case Some((ch, rate, bits, samples)) =>
        val frames = samples.length / ch
        var peak = 0
        var sumSq = 0L // 16-bit^2 * length fits a long far past any real file
        val env = new Array[Long](16)
        var i = 0
        while (i < samples.length) {
          val a = math.abs(samples(i))
          if (a > peak) peak = a
          sumSq += a.toLong * a
          if (frames > 0) env((i / ch) * 16 / frames) += a
          i += 1
        }
        val segLen = math.max(frames * ch / 16, 1)
        AudioFeatures(row.media_id, row.kind, decoded = true, ch, rate, bits,
          frames, frames * 1000L / rate, peak,
          if (samples.isEmpty) 0.0
          else BigDecimal(math.sqrt(sumSq.toDouble / samples.length))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
          env.map(_ / segLen).toSeq)
    }

  /** Distributed WAV decode -> amplitude statistics: one pass per payload,
    * bytes never leave the executors (mapPartitions like imageFeatures).
    */
  def audioFeatures(media: DataFrame)(implicit spark: SparkSession): Dataset[AudioFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions(rows => rows.map(audioFeaturesOf))
  }

  /** Video container metadata — REAL for AVI (an AVI file is a RIFF
    * container, the same chunk grammar as WAV, parsed by the same byte
    * math): width/height/fps/frame-count/stream-count/codec fourcc from the
    * `avih` main header and the first `vids` stream header. Only FRAME
    * PIXEL decode stays out of reach (no video codecs in this
    * environment); everything a corpus curation pass filters on
    * (resolution buckets, duration, fps sanity, codec allowlist) is
    * extracted for real.
    */
  final case class VideoFeatures(
      media_id: Long,
      kind: String,
      decoded: Boolean,
      width: Int,
      height: Int,
      n_frames: Int,
      n_streams: Int,
      fps_milli: Long,    // frames/sec * 1000, exact: dwRate*1000 / dwScale
      duration_ms: Long,  // totalFrames * usPerFrame / 1000, exact
      codec: String)      // vids stream handler fourcc (e.g. "mjpg")

  /** AVI (RIFF) container metadata by direct chunk-list walk: the outer
    * form must be `RIFF….AVI `; `LIST` chunks recurse (hdrl holds avih,
    * strl holds strh); `avih` yields dwMicroSecPerFrame/dwTotalFrames/
    * dwStreams/dwWidth/dwHeight (offsets 0/16/24/32/36 —
    * AVIMAINHEADER layout); the first `strh` with fccType `vids` yields
    * the codec fourcc and dwScale/dwRate (offsets 4/20/24 —
    * AVISTREAMHEADER). Truncated chunk bodies are clamped like decodeWav.
    */
  def decodeAviMeta(bytes: Array[Byte]): Option[(Int, Int, Int, Int, Long, Long, String)] = {
    if (bytes.length < 12 ||
      !(bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F') ||
      !(bytes(8) == 'A' && bytes(9) == 'V' && bytes(10) == 'I' && bytes(11) == ' '))
      return None
    var avih: Option[(Int, Int, Int, Int, Int)] = None // usPerFrame, frames, streams, w, h
    var vids: Option[(String, Int, Int)] = None        // handler, scale, rate
    // walk position in Long: a crafted len near Int.MaxValue must walk off
    // the end (loop exits), not wrap `pos` negative — a negative pos passes
    // the `pos + 8 <= end` guard and indexes bytes out of range, an uncaught
    // executor exception from one bad payload
    def walk(start: Int, end: Int): Unit = {
      var pos = start.toLong
      while (pos + 8 <= end) {
        val p = pos.toInt // pos + 8 <= end: fits an Int
        val id = new String(bytes, p, 4, java.nio.charset.StandardCharsets.US_ASCII)
        val len = leInt(bytes, p + 4)
        if (len < 0) return
        val body = p + 8
        val bodyEnd = math.min(body.toLong + len, end.toLong).toInt
        if (id == "LIST" && body + 4 <= bodyEnd)
          walk(body + 4, bodyEnd) // skip the 4-byte list type, recurse
        else if (id == "avih" && avih.isEmpty && body + 40 <= bodyEnd)
          avih = Some((leInt(bytes, body), leInt(bytes, body + 16),
            leInt(bytes, body + 24), leInt(bytes, body + 32), leInt(bytes, body + 36)))
        else if (id == "strh" && vids.isEmpty && body + 28 <= bodyEnd &&
          new String(bytes, body, 4, java.nio.charset.StandardCharsets.US_ASCII) == "vids")
          vids = Some((new String(bytes, body + 4, 4,
            java.nio.charset.StandardCharsets.US_ASCII).toLowerCase,
            leInt(bytes, body + 20), leInt(bytes, body + 24)))
        pos = body.toLong + len + (len & 1) // chunks are word-aligned, like WAV
      }
    }
    walk(12, bytes.length)
    avih.map { case (usPf, frames, streams, w, h) =>
      val (codec, fpsMilli) = vids match {
        case Some((hdl, scale, rate)) if scale > 0 => (hdl, rate.toLong * 1000L / scale)
        case _ => ("", if (usPf > 0) 1000000000L / usPf else 0L)
      }
      (w, h, frames, streams, fpsMilli, frames.toLong * usPf / 1000L, codec)
    }
  }

  private def videoFeaturesOf(row: MediaRow): VideoFeatures =
    decodeAviMeta(row.payload) match {
      case None =>
        VideoFeatures(row.media_id, row.kind, decoded = false, -1, -1, 0, 0, 0L, 0L, "")
      case Some((w, h, frames, streams, fpsMilli, durMs, codec)) =>
        VideoFeatures(row.media_id, row.kind, decoded = true, w, h, frames,
          streams, fpsMilli, durMs, codec)
    }

  /** Distributed AVI metadata pass (mapPartitions like the image/audio
    * paths; payload bytes never leave the executors).
    */
  def videoFeatures(media: DataFrame)(implicit spark: SparkSession): Dataset[VideoFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions(rows => rows.map(videoFeaturesOf))
  }

  /** Compressed video frame chunks out of an AVI `movi` list: `##dc`
    * (compressed) / `##db` (uncompressed DIB) chunks, in file order, up to
    * `maxFrames` (rec-grouped lists recurse). For an MJPEG AVI each chunk
    * body is a plain baseline JPEG — decodable by the same `javax.imageio`
    * path as still images, no external codec — so frame PIXEL statistics
    * are real for the one codec the container grammar alone permits.
    * Truncated chunk bodies are clamped; oversized lens terminate the walk
    * (Long arithmetic, like `decodeAviMeta`).
    */
  def aviFrameChunks(bytes: Array[Byte], maxFrames: Int): Seq[Array[Byte]] = {
    if (bytes.length < 12 ||
      !(bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F') ||
      !(bytes(8) == 'A' && bytes(9) == 'V' && bytes(10) == 'I' && bytes(11) == ' '))
      return Nil
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    def isFrameId(id: String): Boolean =
      id.length == 4 && id(0).isDigit && id(1).isDigit &&
        (id.endsWith("dc") || id.endsWith("db"))
    def walk(start: Int, end: Int, inMovi: Boolean): Unit = {
      var pos = start.toLong
      while (pos + 8 <= end && out.length < maxFrames) {
        val p = pos.toInt
        val id = new String(bytes, p, 4, java.nio.charset.StandardCharsets.US_ASCII)
        val len = leInt(bytes, p + 4)
        if (len < 0) return
        val body = p + 8
        val bodyEnd = math.min(body.toLong + len, end.toLong).toInt
        if (id == "LIST" && body + 4 <= bodyEnd) {
          val listType = new String(bytes, body, 4, java.nio.charset.StandardCharsets.US_ASCII)
          // recurse into movi (frames live here) and its rec-grouped sublists
          walk(body + 4, bodyEnd, inMovi || listType == "movi")
        } else if (inMovi && isFrameId(id) && bodyEnd > body)
          out += java.util.Arrays.copyOfRange(bytes, body, bodyEnd)
        pos = body.toLong + len + (len & 1)
      }
    }
    walk(12, bytes.length, inMovi = false)
    out.toSeq
  }

  /** Decoded-frame statistics for MJPEG AVI payloads — the video analog of
    * `ImageFeatures`: per-payload mean RGB over up-to-`maxFrames` decoded
    * frames (each resized 32×32 by the deterministic nearest-neighbor
    * sampler) plus a motion proxy (mean |Δ luma| between consecutive frame
    * means). Non-AVI / non-MJPEG payloads yield decoded_frames = 0.
    */
  final case class VideoFrameStats(
      media_id: Long,
      kind: String,
      sampled_frames: Int,  // movi chunks examined (bounded by maxFrames)
      decoded_frames: Int,  // chunks ImageIO actually decoded
      width: Int, height: Int, // native size of the first decoded frame
      mean_r: Double, mean_g: Double, mean_b: Double,
      motion: Double)

  private def videoFrameStatsOf(row: MediaRow, maxFrames: Int): VideoFrameStats = {
    val chunks = aviFrameChunks(row.payload, maxFrames)
    val decoded = chunks.flatMap(decodeImage)
    if (decoded.isEmpty)
      return VideoFrameStats(row.media_id, row.kind, chunks.length, 0, -1, -1, 0, 0, 0, 0)
    var (r, g, b) = (0L, 0L, 0L)
    val lumaMeans = decoded.map { img =>
      val px = resizeNearest(img, 32, 32)
      var luma = 0L
      px.foreach { pck =>
        val (pr, pg, pb) = ((pck >> 16) & 0xff, (pck >> 8) & 0xff, pck & 0xff)
        r += pr; g += pg; b += pb
        luma += (pr * 299 + pg * 587 + pb * 114) / 1000
      }
      luma.toDouble / px.length
    }
    val n = decoded.length * 32 * 32.0
    val motion =
      if (lumaMeans.length < 2) 0.0
      else lumaMeans.sliding(2).map { case Seq(a, c) => math.abs(c - a) }.sum / (lumaMeans.length - 1)
    VideoFrameStats(row.media_id, row.kind, chunks.length, decoded.length,
      decoded.head.getWidth, decoded.head.getHeight, r / n, g / n, b / n, motion)
  }

  /** Distributed MJPEG-frame decode pass: mapPartitions like the other
    * media paths; frame bytes never leave the executors.
    */
  def videoFrameStats(media: DataFrame, maxFrames: Int = 8)
                     (implicit spark: SparkSession): Dataset[VideoFrameStats] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions(rows => rows.map(videoFrameStatsOf(_, maxFrames)))
  }

  /** Column-only metadata pass (no decode): portable to SQL oracles. */
  def payloadMeta(media: DataFrame): DataFrame =
    media.select(
      col("media_id"),
      col("kind"),
      length(col("payload")).as("n_bytes"),
      lower(hex(substring(col("payload"), 1, 4))).as("header_hex"))
}
