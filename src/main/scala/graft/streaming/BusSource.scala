package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

/** Pluggable ingest transport (round-8 verdict item #7): every variant
  * yields the SAME one-column streaming frame (`line: string`, one protocol
  * record per row — plain line protocol or a `[`-prefixed JSON frame), so
  * [[Ingest.startMixedRouted]] and everything behind it (parse → route →
  * admit → hot cache → cascade) is transport-agnostic. The reference has
  * the same seam: its line/pickle receivers are Twisted protocols feeding
  * one cache, swapped per deployment (rurouni/protocols.py:31-62,
  * service.py:31-45).
  *
  *  - [[BusSource.Journal]]: Spark's file source over a spool directory —
  *    the durable dev/standalone bus (checkpointed file offsets; exactly
  *    the restart-resume contract a broker gives).
  *  - [[BusSource.Kafka]]: `readStream.format("kafka")` — the production
  *    bus. Compiles and plans against the public Kafka source API; needs
  *    the `spark-sql-kafka-0-10` connector jar on the cluster classpath
  *    (not shipped in this sandbox — construction succeeds, `lines()`
  *    fails loudly with "Failed to find data source: kafka" until the jar
  *    is deployed, which is the intended one-config-away posture).
  *  - [[BusSource.Memory]]: in-memory stream for tests and the daemon's
  *    non-durable mode.
  */
sealed trait BusSource {
  /** The streaming frame of raw protocol records, column `line`. */
  def lines(spark: SparkSession): DataFrame
}

object BusSource {

  /** Durable directory-journal bus (the daemon's spool). Consumed files
    * are deleted after their micro-batch commits; `maxFileAge` is raised
    * far above the file source's 7-day default, which would silently skip
    * unprocessed journal files after long downtime — the exact durability
    * case the journal exists for.
    */
  final case class Journal(dir: String) extends BusSource {
    def lines(spark: SparkSession): DataFrame = {
      new java.io.File(dir).mkdirs()
      spark.readStream
        .option("cleanSource", "delete")
        .option("maxFileAge", "3650d")
        .text(dir).withColumnRenamed("value", "line")
    }
  }

  /** Kafka bus: one record per protocol line/frame, value = UTF-8 payload.
    * `extraOptions` passes through e.g. `maxOffsetsPerTrigger` (backfill
    * flow control) or `kafka.security.protocol`. Offsets make a better LWW
    * `arrival` than the parse-side timestamp (Ingest.parseLines doc); that
    * refinement rides in the payload contract, not the transport.
    */
  final case class Kafka(bootstrapServers: String, topic: String,
                         startingOffsets: String = "latest",
                         extraOptions: Map[String, String] = Map.empty)
      extends BusSource {
    def lines(spark: SparkSession): DataFrame = {
      var r = spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrapServers)
        .option("subscribe", topic)
        .option("startingOffsets", startingOffsets)
        // a poison record must surface as a malformed-line counter tick,
        // never a dead stream (same drop+log posture as parse)
        .option("failOnDataLoss", "false")
      extraOptions.foreach { case (k, v) => r = r.option(k, v) }
      r.load().select(col("value").cast("string").as("line"))
    }
  }

  /** In-memory stream (tests; the daemon's non-durable mode). The caller
    * keeps the handle to `addData` into it.
    */
  final case class Memory(stream: MemoryStream[String]) extends BusSource {
    def lines(spark: SparkSession): DataFrame =
      stream.toDF().withColumnRenamed("value", "line")
  }
}
