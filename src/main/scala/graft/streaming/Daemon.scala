package graft.streaming

import graft.core.{AggMethod, StorageSchema}
import graft.storage.{Catalog, MetricStore}
import java.io.{BufferedReader, InputStreamReader}
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery

/** The runnable cache daemon — the analog of the reference's
  * `bin/rurouni-cache.py` service wiring (rurouni/service.py:27-52): ONE
  * process that listens for line-protocol points on a TCP socket, parses
  * and admits them through the streaming ingest into the hot cache,
  * watermark-flushes closed slots into the archive cascade, and serves both
  * the pre-flush cache view and the merged hot ∪ historical read over HTTP.
  *
  * Wiring (each arrow is a component that exists and is specced on its own;
  * the daemon is the missing one-process composition):
  * {{{
  *   TCP line listener  ──>  MemoryStream[String]
  *       (protocols.MetricLineReceiver, service.py:31-45)
  *   MemoryStream  ──Ingest.start──>  parse -> admit -> HotCache append
  *       (cache service wiring, service.py:55-61)
  *   HotCache  ──watermark flush──>  MetricStore cascade (level 0..n)
  *       (WriterService, service.py:69-71)
  *   HotCache  ──CacheQueryServer──>  GET /query, GET /fetch
  *       (CacheManagementHandler, service.py:63-67)
  * }}}
  *
  * Shutdown mirrors the reference's stop hook
  * (rurouni/writer.py:73-83 writeCachedDataPointsWhenStop): the listener
  * closes, buffered lines drain through one final micro-batch, and the
  * WHOLE hot cache flushes to the store with the watermark gate disabled —
  * a clean stop loses no committed point.
  *
  * The TCP listener is a driver-side socket (like [[CacheQueryServer]]'s
  * HTTP endpoint): the ingest protocol edge is inherently a single
  * network endpoint in the reference deployment too. Parsing, alignment,
  * admission, cache maintenance, and flush all stay distributed Spark jobs;
  * the listener only enqueues raw lines. At production scale the same
  * daemon shape runs with the MemoryStream swapped for a Kafka source —
  * `Ingest.start` is source-agnostic — and the listener retired.
  */
/** @param spoolDir when set, lines are ALSO journaled to this directory
  *   and the streaming source is Spark's file source over it instead of
  *   the in-memory stream: the file source checkpoints consumed files, so
  *   a restarted daemon with the same checkpoint resumes EXACTLY where it
  *   stopped (the durability MemoryStream cannot give; the same property a
  *   Kafka source provides in a full deployment). The TCP listener then
  *   plays the role of the journal writer.
  */
final class Daemon(val store: MetricStore, cacheRetention: Long, waitTime: Long,
                   checkpoint: String, linePort: Int = 0, httpPort: Int = 0,
                   nowFn: () => Long = () => System.currentTimeMillis() / 1000,
                   instr: Option[Instrumentation] = None,
                   metricInterval: Long = 60L,
                   spoolDir: Option[String] = None)
                  (implicit spark: SparkSession) {

  val hot = new HotCache(store, cacheRetention, waitTime)
  private val httpServer = new CacheQueryServer(hot, httpPort, instr)
  private var listener: ServerSocket = _
  private var ingest: StreamingQuery = _
  private var mem: MemoryStream[String] = _
  @volatile private var running = false

  /** Start every service; returns (line port, http port) — pass 0s to the
    * constructor for ephemeral ports (tests), fixed ports in production.
    */
  def start(): (Int, Int) = synchronized {
    require(!running, "daemon already running")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    implicit val enc: org.apache.spark.sql.Encoder[String] =
      org.apache.spark.sql.Encoders.STRING
    val lines = spoolDir match {
      case Some(dir) =>
        new java.io.File(dir).mkdirs()
        spark.readStream
          // consumed journal files are deleted after their batch commits —
          // without this the spool grows with total ingest volume forever
          .option("cleanSource", "delete")
          // the file source's DEFAULT maxFileAge (7d) would silently skip
          // unprocessed journal files after long downtime — the exact
          // durability case spool mode exists for
          .option("maxFileAge", "3650d")
          .text(dir).withColumnRenamed("value", "line")
      case None =>
        mem = MemoryStream[String]
        mem.toDF().withColumnRenamed("value", "line")
    }
    // mixed protocol: plain "metric value ts" lines AND JSON-array frames
    // (the pickle-receiver analog) on the same port, one stream, one writer
    ingest = Ingest.startMixed(lines, hot, checkpoint, nowFn, instr)
    listener = new ServerSocket(linePort, 64, InetAddress.getByName("127.0.0.1"))
    running = true
    val t = new Thread(() => acceptLoop(), "graft-line-listener")
    t.setDaemon(true)
    t.start()
    // self-metrics loop (the reference's InstrumentationService: a
    // LoopingCall draining counters every RUROUNI_METRIC_INTERVAL,
    // rurouni/state/instrumentation.py:115-130): drained stats re-enter as
    // ordinary line-protocol points through the SAME ingest stream — no
    // second writer races the micro-batch, the engine monitors itself
    // with itself
    instr.foreach { _ =>
      val m = new Thread(() => {
        while (running) {
          try Thread.sleep(metricInterval * 1000L)
          catch { case _: InterruptedException => () }
          if (running) recordSelfMetrics()
        }
      }, "graft-self-metrics")
      m.setDaemon(true)
      m.start()
    }
    (listener.getLocalPort, httpServer.start())
  }

  /** Drain instrumentation counters into the ingest stream as
    * `rurouni.<host>.<instance>.<stat>` points (cache_record,
    * rurouni/state/instrumentation.py:105-113). Public so ops probes and
    * tests can force a deterministic drain between intervals.
    */
  def recordSelfMetrics(): Unit =
    instr.foreach { ins =>
      enqueue(ins.drain(nowFn()).map { case (metric, ts, value, _) =>
        s"$metric $value $ts" })
    }

  private val conns = new java.util.concurrent.ConcurrentHashMap[Socket, Thread]()

  private def acceptLoop(): Unit =
    while (running) {
      try {
        val sock = listener.accept()
        val t = new Thread(() => handleConn(sock), "graft-line-conn")
        t.setDaemon(true)
        conns.put(sock, t)
        t.start()
      } catch {
        // a closed listener throws on every accept: returning (not
        // continuing) avoids a busy loop during shutdown
        case _: java.io.IOException => return
      }
    }

  private val spoolSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Hand a batch of raw lines to the stream: straight into the
    * MemoryStream, or — in spool mode — as one atomically-renamed closed
    * file (the file source only picks up NEW files, so append-in-place
    * would silently lose lines; nanoTime+seq in the name keeps restarted
    * daemons from colliding with already-checkpointed file names).
    */
  private def enqueue(batch: Seq[String]): Unit =
    if (batch.nonEmpty) spoolDir match {
      case None => batch.foreach(mem.addData(_))
      case Some(dir) =>
        val name = s"batch-${System.nanoTime()}-${spoolSeq.incrementAndGet()}"
        val tmp = new java.io.File(dir, s".$name.tmp")
        java.nio.file.Files.write(tmp.toPath,
          batch.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
        if (!tmp.renameTo(new java.io.File(dir, s"$name.txt")))
          throw new java.io.IOException(s"spool rename failed for $name")
    }

  /** One client connection: newline-delimited `"metric value timestamp"`
    * lines enqueue raw — validation happens in the distributed parse
    * (malformed lines drop there, never kill the stream or the socket).
    * Lines batch per connection, flushed every SpoolBatch lines, at EOF,
    * AND whenever the reader has no more buffered input — a persistent
    * low-rate client (one carbon point every N seconds over a held-open
    * socket) must not sit invisible in a half-full buffer.
    */
  private def handleConn(sock: Socket): Unit = {
    val SpoolBatch = 1000
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    def flush(): Unit = if (buf.nonEmpty) { enqueue(buf.toSeq); buf.clear() }
    try {
      val rd = new BufferedReader(
        new InputStreamReader(sock.getInputStream, StandardCharsets.UTF_8))
      var line = rd.readLine()
      while (line != null && running) {
        if (line.nonEmpty) {
          buf += line
          if (buf.length >= SpoolBatch || !rd.ready()) flush()
        }
        line = rd.readLine()
      }
    } catch {
      case _: java.io.IOException => () // client went away: drop the conn
    } finally {
      flush()
      sock.close()
      conns.remove(sock)
      ()
    }
  }

  /** Deterministic drain for tests and ops probes: block until every line
    * received so far has been parsed, admitted, and flushed-if-closed.
    */
  def processAllAvailable(): Unit = ingest.processAllAvailable()

  /** Clean stop with the reference's shutdown flush: stop accepting, drain
    * buffered lines through a final micro-batch, then flush the ENTIRE hot
    * cache past the watermark (writeCachedDataPointsWhenStop,
    * rurouni/writer.py:73-83) and stop serving.
    */
  def stop(): Unit = synchronized {
    if (!running) return
    listener.close() // no new connections; accept loop exits
    // close live client sockets and WAIT for their handlers: each handler's
    // finally-flush must land before the final micro-batch drains, or lines
    // the daemon already read off a socket would hit a stopped stream
    conns.forEach { (s, _) => try s.close() catch { case _: java.io.IOException => () } }
    conns.forEach { (_, t) => t.join(5000L) }
    recordSelfMetrics() // tail counters ride the final micro-batch
    ingest.processAllAvailable()
    running = false // after the drain: late handler flushes still enqueued
    ingest.stop()
    hot.flushAll(nowFn())
    httpServer.stop()
  }
}

/** CLI entrypoint: `graft.Daemon <root> <retentions> [linePort] [httpPort]`
  * — e.g. `run /var/lib/graft "10s:1d,60s:30d" 2003 8080`. Storage schema
  * uses the given retention cascade for all metrics (`.*`), average
  * aggregation, with a catalog for registration/throttle like the
  * reference's create path. Runs until SIGTERM/Ctrl-C; the shutdown hook
  * performs the full cache flush.
  */
object Daemon {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Daemon <root> <retentions> [linePort] [httpPort]")
    val root = args(0)
    val archives = graft.core.RetentionParser.parseRetentions(args(1))
    val linePort = if (args.length > 2) args(2).toInt else 2003
    val httpPort = if (args.length > 3) args(3).toInt else 8080
    implicit val spark: SparkSession = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("graft-daemon")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val schema = StorageSchema("default", ".*".r, 0.5, AggMethod.Average,
      archives, cacheRetention = archives.head.retention / 2, metricsPerFile = 40)
    val schemas = new graft.core.StorageSchemas(Seq(schema))
    val catalog = new Catalog(root, schemas)
    val store = new MetricStore(root, schema, Some(catalog))
    val instr = new Instrumentation()
    val daemon = new Daemon(store, cacheRetention = schema.cacheRetention,
      waitTime = 10L, checkpoint = s"$root/_checkpoint",
      linePort = linePort, httpPort = httpPort, instr = Some(instr),
      // production default: journal through the spool so a restart resumes
      // from the checkpoint instead of losing buffered lines
      spoolDir = Some(s"$root/_spool"))
    val (lp, hp) = daemon.start()
    // scalastyle:off println
    println(s"graft-daemon: lines on 127.0.0.1:$lp, http on 127.0.0.1:$hp, root=$root")
    // scalastyle:on println
    // register via Hadoop's ShutdownHookManager ABOVE Spark's own hook
    // priority: a plain JVM hook runs CONCURRENTLY with Spark's, so the
    // shutdown flush's jobs would race SparkContext.stop() and die with
    // "SparkContext was shut down" on exactly the SIGTERM path this
    // entrypoint exists for. Higher priority = runs first in Hadoop's
    // manager; Spark registers at 30.
    org.apache.hadoop.util.ShutdownHookManager.get()
      .addShutdownHook(new Runnable { def run(): Unit = daemon.stop() }, 60)
    Thread.currentThread().join() // serve until killed
  }
}
