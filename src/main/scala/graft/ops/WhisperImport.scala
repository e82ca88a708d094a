package graft.ops

import graft.storage.MetricStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Real Whisper `.wsp` binary import (reference:
  * kenshin/tools/whisper_tool.py:9-63 header formats +
  * bin/kenshin-rehash.py:253-280 archive unpack): migrate a Graphite
  * install's on-disk tree straight into a MetricStore.
  *
  * Format (all big-endian):
  *  - metadata  `!2LfL`: aggregationType u32, maxRetention u32,
  *    xFilesFactor f32, archiveCount u32;
  *  - per archive `!3L`: byte offset, secondsPerPoint, pointCount;
  *  - each archive: pointCount slots of `!Ld` (timestamp u32, value f64) in
  *    RING order — a slot's position encodes nothing; its own timestamp
  *    says where it belongs, and ts=0 marks a never-written slot. Unwinding
  *    the ring is therefore just "parse every slot, keep ts in retention"
  *    (exactly the reference reader, bin/kenshin-rehash.py:266-276).
  *
  * Scale posture: a Graphite tree is millions of small files — the read is
  * a distributed `binaryFile` scan with the parse in `mapPartitions`
  * (genuine per-file imperative decode), one row per live point, then the
  * normal import path (admit -> age-routed write -> forced cascade).
  */
object WhisperImport {

  val MetadataSize = 16 // !2LfL
  val ArchiveInfoSize = 12 // !3L
  val PointSize = 12 // !Ld

  /** Whisper aggregationType id -> the store's method ids (whisper_tool
    * agg_type_dict:23-29 — same table as the reference's).
    */
  val AggNames: Map[Int, String] =
    Map(1 -> "average", 2 -> "sum", 3 -> "last", 4 -> "max", 5 -> "min")

  final case class WspArchive(offset: Int, secondsPerPoint: Int, count: Int) {
    def retention: Long = secondsPerPoint.toLong * count
    def byteSize: Int = count * PointSize
  }

  final case class WspHeader(aggType: Int, maxRetention: Long, xff: Float,
                             archives: Seq[WspArchive])

  def readHeader(bytes: Array[Byte]): WspHeader = {
    val buf = java.nio.ByteBuffer.wrap(bytes) // big-endian by default
    val aggType = buf.getInt()
    val maxRet = Integer.toUnsignedLong(buf.getInt())
    val xff = buf.getFloat()
    val archiveCnt = buf.getInt()
    require(archiveCnt > 0 && archiveCnt < 64, s"implausible archive count $archiveCnt — not a .wsp file?")
    val archives = (0 until archiveCnt).map { _ =>
      WspArchive(buf.getInt(), buf.getInt(), buf.getInt())
    }
    WspHeader(aggType, maxRet, xff, archives)
  }

  /** Every live point of every archive: (archiveIdx, ts, value). Slots with
    * ts=0 (never written) or older than the archive's retention horizon are
    * dropped, like the reference reader.
    */
  def readPoints(bytes: Array[Byte], now: Long): Seq[(Int, Long, Double)] = {
    val header = readHeader(bytes)
    header.archives.zipWithIndex.flatMap { case (a, idx) =>
      val tsMin = now - a.retention
      val buf = java.nio.ByteBuffer.wrap(bytes, a.offset, a.byteSize)
      (0 until a.count).flatMap { _ =>
        val ts = Integer.toUnsignedLong(buf.getInt())
        val v = buf.getDouble()
        if (ts > tsMin && ts != 0L) Some((idx, ts, v)) else None
      }
    }
  }

  /** `<tree>/a/b/c.wsp` -> `a.b.c` (metric_to_whisper_filepath inverted,
    * bin/kenshin-rehash.py:148-149).
    */
  def metricName(treeRoot: String, path: String): String = {
    val rootName = treeRoot.stripSuffix("/").split('/').last
    val tail = path.substring(path.indexOf(s"/$rootName/") + rootName.length + 2)
    tail.stripSuffix(".wsp").replace('/', '.')
  }

  /** Distributed tree read: one row per live point, `(metric, ts, value,
    * arrival)`. The arrival bonus makes the FINER archive win when two
    * archives cover the same rollup slot (same rule as Admin.rebuild).
    */
  def readTree(treeRoot: String, now: Long)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val files = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.wsp")
      .option("recursiveFileLookup", "true")
      .load(treeRoot)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
    files.mapPartitions { it =>
      it.flatMap { case (path, bytes) =>
        val metric = metricName(treeRoot, path)
        val nArchives = readHeader(bytes).archives.length
        readPoints(bytes, now).iterator.map { case (idx, ts, v) =>
          (metric, ts, v, ts * nArchives + (nArchives - 1 - idx))
        }
      }
    }.toDF("metric", "ts", "value", "arrival")
  }

  /** Full migration: tree -> admit -> age-routed write -> forced cascade.
    * Returns the count of too-old dropped points.
    */
  def importTree(treeRoot: String, store: MetricStore, now: Long)
                (implicit spark: SparkSession): Long =
    Admin.importSeries(readTree(treeRoot, now), store, now)

  // ---- .wsp synthesis (round-trip tests; byte-for-byte per the formats) --

  /** Pack a whisper file: points are placed at explicit ring slots
    * (slotIdx -> (ts, value)) so tests can prove ring-order independence.
    */
  def writeWsp(aggType: Int, xff: Float,
               archives: Seq[(Int, Int)], // (secondsPerPoint, count)
               points: Seq[Map[Int, (Long, Double)]]): Array[Byte] = {
    require(archives.length == points.length)
    val headerSize = MetadataSize + ArchiveInfoSize * archives.length
    val offsets = archives.scanLeft(headerSize) { case (off, (_, cnt)) => off + cnt * PointSize }
    val total = offsets.last
    val buf = java.nio.ByteBuffer.allocate(total)
    val maxRet = archives.map { case (spp, cnt) => spp.toLong * cnt }.max
    buf.putInt(aggType)
    buf.putInt(maxRet.toInt)
    buf.putFloat(xff)
    buf.putInt(archives.length)
    archives.zip(offsets).foreach { case ((spp, cnt), off) =>
      buf.putInt(off); buf.putInt(spp); buf.putInt(cnt)
    }
    archives.zipWithIndex.foreach { case ((_, cnt), ai) =>
      (0 until cnt).foreach { slot =>
        points(ai).get(slot) match {
          case Some((ts, v)) => buf.putInt(ts.toInt); buf.putDouble(v)
          case None => buf.putInt(0); buf.putDouble(0.0)
        }
      }
    }
    buf.array()
  }
}
