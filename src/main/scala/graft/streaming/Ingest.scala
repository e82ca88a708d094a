package graft.streaming

import graft.core.StorageSchema
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming ingest of the Graphite line protocol `"metric value timestamp"`
  * (reference: rurouni/protocols.py:31-42) re-based on Structured Streaming:
  * socket/Kafka/file source -> parse (malformed lines dropped, not fatal) ->
  * watermarked micro-batch -> align/dedupe -> level-0 append, with the
  * watermark playing the reference's cacheRetention + DEFAULT_WAIT_TIME
  * flush-delay role (rurouni/cache.py:259-262).
  */
object Ingest {

  /** Parse raw protocol lines into points. Bad lines (wrong field count,
    * non-numeric value/ts) become nulls and are filtered out — the stream
    * never dies on malformed input, matching the reference's drop+log.
    * Output: (metric, ts epoch-seconds long, value double, arrival long).
    *
    * `arrival` (the LWW tiebreaker) is the raw event timestamp at nanosecond
    * scale — stable across retries and repartitions, unlike a generated id
    * whose high bits encode partition layout. Duplicates with identical raw
    * timestamps tie; the store then deterministically keeps the larger
    * value (TimeSeries.alignDedup). A Kafka source should pass its offset
    * here instead for true write-order LWW.
    */
  def parseLines(lines: DataFrame): DataFrame = {
    val parts = split(trim(col("line")), "\\s+")
    // try_cast, not cast: under ANSI mode (Spark 4 default) a plain cast
    // would kill the stream on the first malformed number
    lines
      .withColumn("p", parts)
      .where(size(col("p")) === 3)
      .select(
        col("p").getItem(0).as("metric"),
        col("p").getItem(2).try_cast("double").as("raw_ts"),
        col("p").getItem(1).try_cast("double").as("value"))
      .where(col("metric").isNotNull && col("raw_ts").isNotNull && col("value").isNotNull)
      .select(col("metric") +: tsCols(col("raw_ts")) :+ col("value"): _*)
      .where(col("ts").isNotNull && col("arrival").isNotNull)
      .select(col("metric"), col("ts"), col("value"), col("arrival"))
  }

  /** ts + arrival conversion, overflow-safe end to end: try_cast (never
    * plain cast) so a NaN/Infinity/out-of-range timestamp — e.g. an
    * ms-epoch where seconds were expected, which exceeds decimal(21,9) —
    * nulls out and drops as malformed instead of throwing under ANSI mode
    * and killing the stream. Decimal, not double, math for arrival:
    * ts*1e9 exceeds the 52-bit double mantissa and would round the
    * tiebreaker.
    */
  private def tsCols(rawTs: Column): Seq[Column] = Seq(
    rawTs.try_cast("long").as("ts"),
    (rawTs.try_cast("decimal(21,9)") * lit(1000000000L)).try_cast("long").as("arrival"))

  /** Frame cap matching the reference pickle receiver's MAX_LENGTH = 2<<20
    * (rurouni/protocols.py:46).
    */
  val MaxFrameBytes: Int = 2 << 20

  private val frameSchema: org.apache.spark.sql.types.DataType =
    org.apache.spark.sql.types.DataType.fromDDL("array<struct<metric:string,ts:double,value:double>>")

  /** Framed-batch source (the pickle receiver analog,
    * rurouni/protocols.py:45-62): each row's `frame` column carries one
    * batch of points as a JSON array `[{"metric":…,"ts":…,"value":…},…]`
    * — Python pickle is not JVM-portable, so the Kafka payload format is
    * JSON/Avro with identical framing semantics. Invalid frames are
    * ignored whole (reference: "invalid pickle received … ignoring");
    * within a valid frame, entries with missing/bad fields drop
    * individually (the reference's per-datapoint try/except). Frames over
    * MaxFrameBytes are rejected.
    */
  def parseFrames(frames: DataFrame): DataFrame =
    frames
      .where(length(col("frame")) <= MaxFrameBytes)
      .select(explode(from_json(col("frame"), frameSchema)).as("p"))
      .select(
        col("p.metric").as("metric"),
        col("p.ts").as("raw_ts"),
        col("p.value").as("value"))
      .where(col("metric").isNotNull && col("raw_ts").isNotNull && col("value").isNotNull)
      .select(col("metric") +: tsCols(col("raw_ts")) :+ col("value"): _*)
      .where(col("ts").isNotNull && col("arrival").isNotNull)
      .select(col("metric"), col("ts"), col("value"), col("arrival"))

  /** Count of dropped frames (unparseable or oversized) in a batch. */
  def malformedFrameCount(frames: DataFrame): Long =
    frames.where(
      length(col("frame")) > MaxFrameBytes ||
        from_json(col("frame"), frameSchema).isNull)
      .count()

  /** Count of malformed lines in a batch (the reference logs+counts them;
    * we surface the same signal for instrumentation).
    */
  def malformedCount(lines: DataFrame): Long = {
    val parts = split(trim(col("line")), "\\s+")
    // get(), not getItem(): the conditions share subexpressions, and under
    // ANSI mode an out-of-bounds getItem throws even when the size
    // predicate would have short-circuited it
    val rawTs = get(col("p"), lit(2)).try_cast("double")
    lines.withColumn("p", parts)
      .where(size(col("p")) =!= 3 ||
        get(col("p"), lit(1)).try_cast("double").isNull ||
        rawTs.isNull ||
        // overflow class: parses as a double but can't convert to an
        // epoch-seconds long / ns arrival (NaN, Infinity, ms-epochs)
        rawTs.try_cast("long").isNull ||
        (rawTs.try_cast("decimal(21,9)") * lit(1000000000L)).try_cast("long").isNull)
      .count()
  }

  /** Start a streaming ingest from a line DataFrame (socket source in dev,
    * Kafka in prod — both yield a string column we alias to `line`) into the
    * hot cache: parse -> hot-cache merge -> watermark-gated idempotent
    * flush to level 0 (HotCache.processBatch). Replayed micro-batches
    * converge to the same state — effectively-once, the reference's
    * write-after-delay + idempotent slot overwrite
    * (rurouni/writer.py:33-45 + kenshin/storage.py:429-445).
    */
  def start(lines: DataFrame, hot: HotCache, checkpoint: String,
            nowFn: () => Long = () => System.currentTimeMillis() / 1000,
            instr: Option[Instrumentation] = None)(implicit spark: SparkSession): StreamingQuery =
    startWith(lines, hot, checkpoint, nowFn, instr, parseLines, malformedCount)

  /** Framed-batch streaming ingest (the pickle listener analog): same hot
    * path, frames instead of lines.
    */
  def startFrames(frames: DataFrame, hot: HotCache, checkpoint: String,
                  nowFn: () => Long = () => System.currentTimeMillis() / 1000,
                  instr: Option[Instrumentation] = None)(implicit spark: SparkSession): StreamingQuery =
    startWith(frames, hot, checkpoint, nowFn, instr, parseFrames, malformedFrameCount)

  /** Mixed-protocol ingest: ONE stream carrying both newline line-protocol
    * records and JSON-array frames (a row starting with `[` is a frame).
    * The reference daemon runs its line and pickle receivers side by side
    * into one cache (rurouni/service.py:31-45); funneling both through one
    * stream keeps the single-writer discipline — two streaming queries
    * would race their micro-batches on the hot table.
    */
  def startMixed(src: DataFrame, hot: HotCache, checkpoint: String,
                 nowFn: () => Long = () => System.currentTimeMillis() / 1000,
                 instr: Option[Instrumentation] = None)(implicit spark: SparkSession): StreamingQuery =
    startWith(src, hot, checkpoint, nowFn, instr, parseMixed, malformedMixedCount)

  private def isFrame: Column = trim(col("line")).startsWith("[")

  /** Lines parse as line protocol; `[`-prefixed rows parse as JSON frames. */
  def parseMixed(src: DataFrame): DataFrame =
    parseLines(src.where(!isFrame))
      .unionByName(parseFrames(src.where(isFrame)
        .select(trim(col("line")).as("frame"))))

  def malformedMixedCount(src: DataFrame): Long =
    malformedCount(src.where(!isFrame)) +
      malformedFrameCount(src.where(isFrame).select(trim(col("line")).as("frame")))

  /** Mixed-protocol ingest routed over MULTIPLE storage schemas: one stream,
    * one writer, points assigned to the FIRST schema whose pattern matches
    * their metric name — the reference's per-point getSchema routing
    * (rurouni/storage.py:152-180,200-204) as a single codegen'd CASE over
    * the batch. Points matching NO schema are dropped (the caller appends a
    * catch-all default route for reference fidelity — Daemon.main does).
    */
  /** @param postBatch maintenance hook invoked after every micro-batch's
    *   routes have processed (same thread as the writes — the level tables
    *   have ONE writer, so cascade/TTL work must interleave here, never
    *   run from a side thread racing the flush). The daemon passes its
    *   cadence-gated cascade+retention tick.
    */
  def startMixedRouted(src: DataFrame, targets: Seq[(StorageSchema, HotCache)],
                       checkpoint: String,
                       nowFn: () => Long = () => System.currentTimeMillis() / 1000,
                       instr: Option[Instrumentation] = None,
                       postBatch: Option[Long => Unit] = None)(implicit spark: SparkSession): StreamingQuery =
    startWithRouted(src, targets, checkpoint, nowFn, instr, parseMixed,
      malformedMixedCount, postBatch)

  /** First-match schema index over `metric`: `rlike("^(?:p)")` is exactly
    * `Pattern.lookingAt` — anchored at the start, unanchored at the end —
    * the semantics of StorageSchema.matches and of the reference's
    * `re.match`. Unmatched metrics get -1.
    */
  def routeIndex(schemas: Seq[StorageSchema]): Column =
    schemas.zipWithIndex.foldRight(lit(-1): Column) { case ((s, i), fallback) =>
      when(col("metric").rlike("^(?:" + s.pattern.pattern.pattern + ")"), lit(i))
        .otherwise(fallback)
    }

  private def startWith(src: DataFrame, hot: HotCache, checkpoint: String,
                        nowFn: () => Long, instr: Option[Instrumentation],
                        parse: DataFrame => DataFrame,
                        countBad: DataFrame => Long)(implicit spark: SparkSession): StreamingQuery =
    // single-target: the schema is never consulted (no route column, no
    // extra filter — the plan is identical to the pre-routing design)
    startWithRouted(src, Seq((hot.store.schema, hot)), checkpoint, nowFn, instr, parse, countBad)

  private def startWithRouted(src: DataFrame, targets: Seq[(StorageSchema, HotCache)],
                              checkpoint: String,
                              nowFn: () => Long, instr: Option[Instrumentation],
                              parse: DataFrame => DataFrame,
                              countBad: DataFrame => Long,
                              postBatch: Option[Long => Unit] = None): StreamingQuery =
    src.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime("5 seconds"))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val t0 = System.nanoTime()
        val points = parse(batch).cache()
        try {
          // counters only cost extra jobs when instrumentation is attached
          instr.foreach { ins =>
            ins.incr("metricReceived", points.count().toDouble)
            ins.incr("errors", countBad(batch).toDouble)
          }
          val committed =
            if (targets.lengthCompare(1) == 0) targets.head._2.processBatch(points, nowFn())
            else {
              val routed = points.withColumn("__route", routeIndex(targets.map(_._1))).cache()
              // every route's processBatch runs even on an empty slice: the
              // watermark flush must advance for schemas idle this batch
              try targets.zipWithIndex.map { case ((_, hot), i) =>
                hot.processBatch(routed.where(col("__route") === i).drop("__route"), nowFn())
              }.sum
              finally { routed.unpersist(); () }
            }
          instr.foreach { ins =>
            // post-admission count: throttled/mis-routed/dropped points are
            // NOT committed (parse-side points.count() would overstate)
            ins.incr("committedPoints", committed.toDouble)
            ins.appendUpdateTime((System.nanoTime() - t0) / 1e9)
          }
        } finally {
          points.unpersist()
          ()
        }
        postBatch.foreach(f => f(nowFn()))
      }
      .start()
}
