package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.{DedupStream, SessionStream, SketchStream}

/** Dev lane (round-11 verdict #5): drive the three streaming state paths at
  * corpus scale — their specs prove semantics at toy batch sizes; this main
  * measures what the specs claim structurally (per-batch cost flat in batch
  * index, state bounded, replay idempotent, batch-twin equivalence) on a
  * real corpus. Not part of the driver contract.
  *
  * Usage: graft.StreamScale <corpusDir> <nBatches> [workRoot]
  *   - DedupStream: documents replayed in nBatches doc_id-ordered batches
  *     (ids are monotone with arrival — the operator's invariant); prints
  *     per-batch wall + appended state rows; then replays the FINAL batch
  *     and asserts the decision table is unchanged (count + content hash).
  *   - SessionStream: events fed chronologically through a MemoryStream in
  *     nBatches chunks plus a far-future sentinel (advances the watermark so
  *     every real session closes); closed sessions must EQUAL the batch
  *     session_window twin, row for row.
  *   - SketchStream: documents merged in nBatches; register state must EQUAL
  *     the one-shot batch registers of the whole corpus, and the state row
  *     count must stay bounded by groups x 256 registers.
  */
object StreamScale {

  private def rmrf(p: String): Unit = {
    val f = new java.io.File(p)
    if (f.isDirectory) f.listFiles().foreach(c => rmrf(c.getPath))
    f.delete()
  }

  private def hashOf(df: DataFrame): String = {
    val row = df
      .agg(sum(crc32(concat_ws("|", df.columns.map(c => col(c).cast("string")): _*)))
        .as("h"), count(lit(1)).as("n"))
      .collect()(0)
    s"${row.get(0)}/${row.get(1)}"
  }

  def main(args: Array[String]): Unit = {
    val corpus = args(0)
    val nBatches = args(1).toInt
    val root = if (args.length > 2) args(2) else "/tmp/streamscale"
    // rmrf is recursive delete of a caller-supplied path — refuse anything
    // outside /tmp so a mistyped third argument cannot wipe an arbitrary
    // tree (round-12 ADVICE)
    val canonical = new java.io.File(root).getCanonicalPath
    require(canonical.startsWith("/tmp/") && canonical != "/tmp",
      s"StreamScale: workRoot must be a directory under /tmp (got $canonical)")
    rmrf(root)

    implicit val spark: SparkSession = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // ---------------- DedupStream ----------------
    val docs = spark.read.parquet(s"$corpus/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val (mnId, mxId) = docs.agg(min("doc_id"), max("doc_id")).as[(Long, Long)].first()
    val width = (mxId - mnId) / nBatches + 1
    val dedup = new DedupStream(s"$root/dedup", 3, PipelineQueries.MinhashBands,
      PipelineQueries.MinhashRows, PipelineQueries.MinhashBucketCap)
    var lastBatch: DataFrame = null
    for (i <- 0 until nBatches) {
      val lo = mnId + i * width
      // materialize the batch OUTSIDE the timer: arrival cost isn't the
      // operator's; processBatch's own jobs are what the O(batch) claim is
      // about
      val batch = docs.where(col("doc_id") >= lo && col("doc_id") < lo + width)
        .localCheckpoint()
      val t0 = System.nanoTime()
      dedup.processBatch(batch)
      val wall = (System.nanoTime() - t0) / 1e9
      val bandRows = spark.read.parquet(s"$root/dedup/dedup_bands").count()
      val decRows = spark.read.parquet(s"$root/dedup/dedup_decisions").count()
      println(f"""{"lane":"dedup","batch":$i,"rows":${batch.count()},"wall":$wall%.2f,"band_log":$bandRows,"decision_log":$decRows}""")
      lastBatch = batch
    }
    val beforeReplay = hashOf(dedup.decisions())
    val t0r = System.nanoTime()
    dedup.processBatch(lastBatch)
    val replayWall = (System.nanoTime() - t0r) / 1e9
    val afterReplay = hashOf(dedup.decisions())
    val dedupOk = beforeReplay == afterReplay
    println(f"""{"lane":"dedup","replay_wall":$replayWall%.2f,"idempotent":$dedupOk,"before":"$beforeReplay","after":"$afterReplay"}""")

    // ---------------- SessionStream ----------------
    val evs = Queries.metricStream(spark, corpus)
      .select(col("metric").as("key"), (col("ns") / 1000).cast("long").as("us"),
        col("ns").cast("long").as("seq"))
      .as[SessionStream.Ev]
      .orderBy("us", "seq") // chronological arrival
      .collect()
    require(evs.nonEmpty, s"StreamScale: no events in $corpus/events.parquet")
    val gapUs = Queries.SessionGap * 1000000L
    val sentinel = SessionStream.Ev("__sentinel__", evs.last.us + 1000L * gapUs, 0L)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[SessionStream.Ev]
    val q = SessionStream.start(spark, mem.toDS(), gapUs, "10 seconds", "scale_sessions")
    val chunk = (evs.length + nBatches - 1) / nBatches
    for ((grp, i) <- evs.grouped(chunk).zipWithIndex) {
      val t0 = System.nanoTime()
      mem.addData(grp.toIndexedSeq)
      q.processAllAvailable()
      val wall = (System.nanoTime() - t0) / 1e9
      val state = Option(q.lastProgress)
        .map(_.stateOperators.apply(0).numRowsTotal).getOrElse(-1L)
      println(f"""{"lane":"session","batch":$i,"rows":${grp.length},"wall":$wall%.2f,"state_rows":$state}""")
    }
    mem.addData(sentinel)
    q.processAllAvailable()
    // one empty pull so EventTimeTimeout fires for keys quiet since the
    // watermark moved (timeouts are evaluated when a batch runs)
    mem.addData(SessionStream.Ev("__sentinel__", sentinel.us + 1, 1L))
    q.processAllAvailable()
    val finalState = Option(q.lastProgress)
      .map(_.stateOperators.apply(0).numRowsTotal).getOrElse(-1L)
    val streamed = spark.table("scale_sessions")
      .where(col("key") =!= "__sentinel__")
      .select(col("key"), col("session_start"), col("session_end"), col("n_events"))
    val batchTwin = spark.createDataset(evs.toIndexedSeq)
      .groupBy(col("key"), session_window(timestamp_micros(col("us")),
        s"${Queries.SessionGap} seconds"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("key"),
        unix_micros(col("session_window.start")).as("session_start"), col("n_events"))
    val twinSet = batchTwin.select("key", "session_start", "n_events")
    val gotSet = streamed.select("key", "session_start", "n_events")
    val missing = twinSet.exceptAll(gotSet).count()
    val extra = gotSet.exceptAll(twinSet).count()
    q.stop()
    val nStreamed = gotSet.count()
    println(s"""{"lane":"session","sessions":$nStreamed,"missing_vs_batch":$missing,"extra_vs_batch":$extra,"final_state_rows":$finalState}""")

    // ---------------- SketchStream ----------------
    val sk = new SketchStream(s"$root/sketch", Seq("lang"))
    val langDocs = docs.join(
      spark.read.parquet(s"$corpus/documents.parquet").select("doc_id", "lang")
        .withColumn("doc_id", col("doc_id").cast("long")), Seq("doc_id"))
    for (i <- 0 until nBatches) {
      val lo = mnId + i * width
      val batch = langDocs.where(col("doc_id") >= lo && col("doc_id") < lo + width)
        .localCheckpoint()
      val t0 = System.nanoTime()
      sk.mergeBatch(batch, col("text"))
      val wall = (System.nanoTime() - t0) / 1e9
      val stateRows = sk.registers().count()
      println(f"""{"lane":"sketch","batch":$i,"wall":$wall%.2f,"state_rows":$stateRows}""")
    }
    val batchRegs = graft.operators.Sketches
      .hllRegisters(langDocs, Seq("lang"), col("text"))
      .groupBy(col("lang"), col("reg")).agg(max(col("m_rank")).as("m_rank"))
    val regsDiff = sk.registers().exceptAll(batchRegs).count() +
      batchRegs.exceptAll(sk.registers()).count()
    println(s"""{"lane":"sketch","register_diff_vs_batch":$regsDiff,"state_rows":${sk.registers().count()}}""")

    val ok = dedupOk && missing == 0 && extra == 0 && regsDiff == 0
    println(s"""{"result":"${if (ok) "PASS" else "FAIL"}"}""")
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
