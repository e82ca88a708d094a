package graft.streaming

import graft.storage.MetricStore
import org.apache.spark.sql.{DataFrame, SparkSession}
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
    lines
      .withColumn("p", parts)
      .where(size(col("p")) === 3)
      .select(
        col("p").getItem(0).as("metric"),
        col("p").getItem(2).cast("double").as("raw_ts"),
        col("p").getItem(1).cast("double").as("value"))
      .where(col("metric").isNotNull && col("raw_ts").isNotNull && col("value").isNotNull)
      .select(
        col("metric"),
        col("raw_ts").cast("long").as("ts"),
        col("value"),
        (col("raw_ts") * 1e9).cast("long").as("arrival"))
  }

  /** Count of malformed lines in a batch (the reference logs+counts them;
    * we surface the same signal for instrumentation).
    */
  def malformedCount(lines: DataFrame): Long = {
    val parts = split(trim(col("line")), "\\s+")
    lines.withColumn("p", parts)
      .where(size(col("p")) =!= 3 ||
        col("p").getItem(1).cast("double").isNull ||
        col("p").getItem(2).cast("double").isNull)
      .count()
  }

  /** Start a streaming ingest from a line DataFrame (socket source in dev,
    * Kafka in prod — both yield a string column we alias to `line`).
    * Each micro-batch goes through the same align/dedupe/age-route write
    * path as batch ingest (exactly-once per batch via idempotent overwrite
    * of the batch's slots is future work; append is at-least-once like the
    * reference's last-write-wins slots).
    */
  def start(lines: DataFrame, store: MetricStore, checkpoint: String,
            nowFn: () => Long = () => System.currentTimeMillis() / 1000)(implicit spark: SparkSession): StreamingQuery = {
    lines.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime("5 seconds"))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val points = parseLines(batch)
        store.writeBatch(points, nowFn())
        ()
      }
      .start()
  }
}
