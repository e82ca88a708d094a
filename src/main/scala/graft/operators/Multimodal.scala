package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video are carried as opaque
  * `binary` payload columns plus typed metadata, processed in batch form via
  * mapPartitions (the JVM analog of mapInPandas — one iterator per partition,
  * so decoders amortize per-batch setup and the payload never hits the
  * driver).
  *
  * The actual codec step is a clearly-marked deterministic STUB — the
  * container has no image/audio libraries — but schema, partitioning, batch
  * shape and the UDF signature are real: swap `decodeStub` for a JNI/codec
  * call and nothing else changes.
  */
object Multimodal {

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

  /** STUB decode: a real implementation would decode image/audio frames
    * here (e.g. via a JNI codec) — deterministic fake features instead.
    * Pure function of the payload bytes so tests and oracles can pin it.
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

  /** Column-only metadata pass (no decode): portable to SQL oracles. */
  def payloadMeta(media: DataFrame): DataFrame =
    media.select(
      col("media_id"),
      col("kind"),
      length(col("payload")).as("n_bytes"),
      lower(hex(substring(col("payload"), 1, 4))).as("header_hex"))
}
