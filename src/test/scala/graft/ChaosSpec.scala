package graft

import java.nio.file.{Files, Path, Paths}
import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger, AtomicLong}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.core.{AggMethod, RetentionParser, StorageSchema, StorageSchemas}
import graft.functions.Fnv1a
import graft.ops.{Admin, CacheQueryCli}
import graft.storage.{Catalog, MetricStore}

/** Combined chaos lane (round-10 verdict #7). CrashSpec, ReshardSpec,
  * SoakSpec and RenderLoadSpec each prove ONE axis; production fails on
  * combinations. One continuous scenario against a live sharded estate:
  *
  *  1. a 2-instance deployment ingests continuously while dashboard
  *     pollers render against BOTH instances;
  *  2. instance 0 is SIGKILL'd mid-load (journal snapshot taken first) and
  *     restarted on the same spool/checkpoint/store — pollers keep going
  *     the whole time, with failures tolerated ONLY inside the outage
  *     window of the killed instance;
  *  3. post-restart, ingest and maintenance must resume (new points
  *     commit and serve — the drain, catalog and store-upsert paths all
  *     re-engage), and every pre-kill point plus every journaled point
  *     survives exactly once;
  *  4. the estate is then stopped cleanly and re-sharded 2→3 (the
  *     read-everything / keep-mine migration), three instances restart,
  *     polling resumes: every point from every phase fetches exactly once
  *     through the routed client, ownership agrees with fnv1a%3, and a
  *     render round against the new estate returns all-200-with-data.
  */
class ChaosSpec extends AnyFunSuite with BeforeAndAfterAll {
  implicit lazy val spark = SparkTestBase.spark

  private var root: Path = _
  private var spawned: List[DaemonHarness.Live] = Nil
  private def track(l: DaemonHarness.Live): DaemonHarness.Live = {
    spawned = l :: spawned; l
  }

  override def beforeAll(): Unit = { root = Files.createTempDirectory("graft-chaos") }
  override def afterAll(): Unit = {
    spawned.foreach(DaemonHarness.stop)
    import scala.reflect.io.Directory
    new Directory(new java.io.File(root.toString)).deleteRecursively()
    ()
  }

  private val schema = StorageSchema("default", ".*".r, 0.5, AggMethod.Average,
    RetentionParser.parseRetentions("10s:1h"),
    cacheRetention = 1800, metricsPerFile = 40)

  private def get(url: String): (Int, String) = {
    val conn = java.net.URI.create(url).toURL
      .openConnection().asInstanceOf[java.net.HttpURLConnection]
    conn.setConnectTimeout(5000)
    conn.setReadTimeout(60000)
    try {
      val code = conn.getResponseCode
      val is = if (code >= 400) conn.getErrorStream else conn.getInputStream
      val body = if (is == null) "" else new String(is.readAllBytes(), "UTF-8")
      (code, body)
    } finally conn.disconnect()
  }

  private def enc(s: String): String = java.net.URLEncoder.encode(s, "UTF-8")

  private def journaled(daemonRoot: String): Seq[(String, Long, Double)] = {
    val spool = Paths.get(daemonRoot, "_spool")
    if (!Files.isDirectory(spool)) return Nil
    Files.list(spool).iterator().asScala.toSeq.filter(Files.isRegularFile(_))
      .flatMap { f =>
        new String(Files.readAllBytes(f), java.nio.charset.StandardCharsets.UTF_8)
          .split("\n").filter(_.nonEmpty).flatMap { l =>
            l.split(" ") match {
              case Array(m, v, t) => Some((m, t.toLong, v.toDouble))
              case _              => None
            }
          }
      }
  }

  private def allPoints(oldRoot: String) = {
    val store = new MetricStore(oldRoot, schema, None)
    val lvl0 = store.readLevel(0, 0L, Long.MaxValue / 4)
    val hotPath = s"$oldRoot/${schema.name}/hot"
    val hot =
      if (store.hasData(hotPath))
        spark.read.parquet(hotPath).select(col("metric"), col("ts"), col("value"))
      else lvl0.limit(0)
    lvl0.unionByName(hot).distinct()
  }

  test("ingest + polling + kill -9 + restart + re-shard 2->3: no loss, renders recover") {
    val names = (1 to 24).map(i => s"chaos.m$i")
    val now = (System.currentTimeMillis() / 1000 / 10) * 10

    // ---- phase 1: live 2-instance estate under ingest + dashboard load --
    var estate: Array[DaemonHarness.Live] = Array(
      track(DaemonHarness.spawn(s"$root/s0", numInstances = 2, instance = 0)),
      track(DaemonHarness.spawn(s"$root/s1", numInstances = 2, instance = 1)))
    def sendPoint(m: String, ts: Long, v: Double, n: Int = 2): Boolean =
      try { DaemonHarness.send(estate(Fnv1a.shard(m, n)).linePort, Seq(s"$m $v $ts")); true }
      catch { case _: Throwable => false }

    val phase1 = for ((m, i) <- names.zipWithIndex; k <- 0 until 3)
      yield (m, now - 240 + k * 10, i * 10 + k + 0.5)
    phase1.foreach { case (m, ts, v) => assert(sendPoint(m, ts, v), s"phase1 send $m") }
    for (m <- names)
      assert(DaemonHarness.poll(180) {
        CacheQueryCli.query("127.0.0.1", estate.map(_.httpPort).toSeq, m)
          .contains(s"[${now - 240}")
      }, s"phase1 $m never became queryable")

    // continuous load: a feeder emitting fresh slots round-robin and two
    // pollers rendering against both instances; outage failures are only
    // tolerated for the killed instance inside its outage window
    val stop = new AtomicBoolean(false)
    val outage = new AtomicBoolean(false) // true while instance 0 is down
    val fed = new AtomicInteger(0)
    val lastFeedTs = new AtomicLong(0)
    val renderFailures = new ConcurrentLinkedQueue[String]()
    val rendersOk = new AtomicInteger(0)
    val feeder = new Thread(() => {
      var t = now
      while (!stop.get()) {
        val m = names(fed.get() % names.size)
        if (sendPoint(m, t, t % 1000 + 0.25)) { fed.incrementAndGet(); lastFeedTs.set(t) }
        t += 10
        Thread.sleep(200)
      }
    }, "chaos-feeder")
    feeder.setDaemon(true)
    val pollers = (0 until 2).map { pi =>
      val th = new Thread(() => {
        val rnd = new scala.util.Random(pi)
        while (!stop.get()) {
          val inst = rnd.nextInt(estate.length)
          val d = estate(inst)
          try {
            val (code, body) = get(s"http://127.0.0.1:${d.httpPort}/render?" +
              s"target=${enc("sumSeries(chaos.*)")}&from=${now - 300}&until=${now + 3600}")
            if (code == 200 && body.contains("\"datapoints\":[[")) rendersOk.incrementAndGet()
            else if (!(inst == 0 && outage.get()))
              renderFailures.add(s"inst$inst code=$code ${body.take(120)}")
          } catch {
            case e: Throwable =>
              if (!(inst == 0 && outage.get()))
                renderFailures.add(s"inst$inst ${e.getClass.getSimpleName}")
          }
          Thread.sleep(250)
        }
      }, s"chaos-poller-$pi")
      th.setDaemon(true); th.start(); th
    }
    feeder.start()
    assert(DaemonHarness.poll(60) { rendersOk.get() > 10 && fed.get() > 20 },
      "load never established")

    // ---- phase 2: SIGKILL instance 0 mid-load ---------------------------
    outage.set(true)
    val journalSnapshot = journaled(s"$root/s0")
    DaemonHarness.sigkill(estate(0))
    Thread.sleep(2000) // a couple of poller rounds against the dead socket

    // ---- phase 3: restart on the same root; load continues --------------
    estate = Array(track(DaemonHarness.spawn(s"$root/s0", numInstances = 2, instance = 0)),
      estate(1))
    // grace: a poller request STARTED during the outage can fail after the
    // flag flips — outlast the 5s connect timeout before lifting tolerance
    Thread.sleep(6000)
    outage.set(false)
    val okBeforeRecovery = rendersOk.get()

    // every pre-kill point and every journaled point survives, exactly once
    val mustServe = (phase1 ++ journalSnapshot).distinct
    for ((m, ts, v) <- mustServe) {
      assert(DaemonHarness.poll(180) {
        CacheQueryCli.query("127.0.0.1", estate.map(_.httpPort).toSeq, m)
          .contains(s"[$ts,$v]")
      }, s"point $m [$ts,$v] lost across the crash")
      val body = CacheQueryCli.query("127.0.0.1", estate.map(_.httpPort).toSeq, m)
      assert(body.indexOf(s"[$ts,") == body.lastIndexOf(s"[$ts,"),
        s"slot $m@$ts duplicated after replay")
    }

    // ingest + maintenance resumed: fresh post-restart slots commit and
    // serve through the restarted instance's drain
    val fed0 = fed.get()
    assert(DaemonHarness.poll(120) { fed.get() > fed0 + 10 }, "feeder stalled post-restart")
    assert(DaemonHarness.poll(180) {
      val t = lastFeedTs.get()
      t > 0 && names.exists { m =>
        CacheQueryCli.query("127.0.0.1", estate.map(_.httpPort).toSeq, m).contains(s"[$t,")
      }
    }, "no post-restart point ever became queryable — drain did not resume")
    // polling kept succeeding after the recovery grace
    assert(DaemonHarness.poll(120) { rendersOk.get() > okBeforeRecovery + 10 },
      "renders did not resume after restart")

    // ---- phase 4: clean stop, re-shard 2->3, keep serving ---------------
    stop.set(true)
    feeder.join(10000); pollers.foreach(_.join(10000))
    assert(renderFailures.isEmpty, s"renders failed outside the outage window: ${
      renderFailures.iterator().asScala.take(5).mkString(" | ")}")
    estate.foreach(DaemonHarness.stop)

    val full = allPoints(s"$root/s0").unionByName(allPoints(s"$root/s1"))
      .localCheckpoint()
    assert(full.count() >= phase1.size.toLong, "migration source lost points")
    for (i <- 0 until 3) {
      val cat = new Catalog(s"$root/n$i", new StorageSchemas(Seq(schema)),
        numInstances = 3, instance = i)
      val st = new MetricStore(s"$root/n$i", schema, Some(cat))
      Admin.importSeries(full, st, now)
    }
    val trio = (0 until 3).map(i =>
      track(DaemonHarness.spawn(s"$root/n$i", numInstances = 3, instance = i)))
    val newHttp = trio.map(_.httpPort)

    // every phase-1 point fetches exactly once through the routed client
    for ((m, ts, v) <- phase1) {
      assert(DaemonHarness.poll(120) {
        CacheQueryCli.fetch("127.0.0.1", newHttp, m, now - 3600, now + 7200, now)
          .contains(s"[$ts,$v]")
      }, s"$m [$ts,$v] lost in the re-shard")
      val body = CacheQueryCli.fetch("127.0.0.1", newHttp, m, now - 3600, now + 7200, now)
      assert(body.indexOf(s"[$ts,") == body.lastIndexOf(s"[$ts,"),
        s"slot $m@$ts duplicated after re-shard")
    }
    // ownership agrees with fnv1a%3, merged discovery sees each once
    for (i <- 0 until 3) {
      val found = CacheQueryCli.find("127.0.0.1", Seq(newHttp(i)), "chaos.*")
      for (m <- names)
        assert(found.contains("\"path\":\"" + m + "\"") == (Fnv1a.shard(m, 3) == i),
          s"$m on instance $i disagrees with fnv1a%3")
    }
    // a render round against the new estate: all 200 with data
    for (d <- trio) {
      val (code, body) = get(s"http://127.0.0.1:${d.httpPort}/render?" +
        s"target=${enc("sumSeries(chaos.*)")}&from=${now - 300}&until=${now + 7200}")
      assert(code == 200 && body.contains("\"datapoints\":[["),
        s"post-reshard render failed on ${d.httpPort}: $code ${body.take(120)}")
    }
  }
}
