package graft

import java.io.{BufferedReader, InputStreamReader, OutputStreamWriter}
import java.net.Socket
import java.nio.charset.StandardCharsets
import java.util.concurrent.TimeUnit

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.functions.Fnv1a
import graft.ops.CacheQueryCli

/** Multi-instance sharded deployment e2e (round-8 verdict item #3): TWO
  * REAL daemon processes (separate JVMs, separate Spark sessions, separate
  * stores) with disjoint fnv1a shards — the reference's example deployment
  * of two rurouni-cache instances (conf/rurouni.conf.example:16,21-29)
  * routed by `get_instance_of_metric` (rurouni/utils.py:107-108).
  *
  * Proves, across live processes:
  *  - a point sent to its OWN shard's instance registers and is queryable
  *    through the shard-routed client ([[CacheQueryCli.query]] picks the
  *    owner port by fnv1a, like bin/kenshin-cache-query.py);
  *  - a point MIS-ROUTED to the other instance is rejected at registration
  *    (rurouni/cache.py:123-128) — it never appears in that instance's
  *    catalog or cache;
  *  - glob discovery fans out to both instances and merges
  *    (graphite-web CLUSTER_SERVERS behavior, [[CacheQueryCli.find]]).
  */
class ShardSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var procs: Seq[Process] = Nil
  private var root: java.nio.file.Path = _

  override def beforeAll(): Unit = { root = java.nio.file.Files.createTempDirectory("graft-shard") }
  override def afterAll(): Unit = {
    procs.foreach(_.destroy())
    procs.foreach(_.waitFor(30, TimeUnit.SECONDS))
    procs.foreach(_.destroyForcibly())
    import scala.reflect.io.Directory
    new Directory(new java.io.File(root.toString)).deleteRecursively()
    ()
  }

  private val addOpens = Seq(
    "java.lang", "java.lang.invoke", "java.lang.reflect", "java.io",
    "java.net", "java.nio", "java.util", "java.util.concurrent",
    "java.util.concurrent.atomic", "sun.nio.ch", "sun.nio.cs",
    "sun.security.action", "sun.util.calendar"
  ).map(p => s"--add-opens=java.base/$p=ALL-UNNAMED")

  /** Launch `graft.streaming.Daemon` in a fresh JVM; return (proc, linePort,
    * httpPort) once its banner prints. The subprocess gets a small core
    * budget so two instances plus this test JVM coexist.
    */
  private def spawnDaemon(instance: Int): (Process, Int, Int) = {
    val java = System.getProperty("java.home") + "/bin/java"
    val cmd = Seq(java, "-Xmx4g", "-cp", System.getProperty("java.class.path")) ++
      addOpens ++ Seq("graft.streaming.Daemon",
        s"$root/inst$instance", "10s:1h", "0", "0", "127.0.0.1", "2", s"$instance")
    val pb = new ProcessBuilder(cmd: _*)
    pb.environment().put("SPARK_MASTER", "local[3]")
    pb.environment().put("SPARK_GRAFT_CPUS", "3")
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val banner = """lines on 127\.0\.0\.1:(\d+), http on 127\.0\.0\.1:(\d+)""".r
    val reader = new BufferedReader(new InputStreamReader(proc.getInputStream))
    val deadline = System.nanoTime() + TimeUnit.SECONDS.toNanos(180)
    var ports: Option[(Int, Int)] = None
    while (ports.isEmpty && System.nanoTime() < deadline) {
      val line = reader.readLine()
      if (line == null) fail(s"daemon $instance exited before its banner")
      banner.findFirstMatchIn(line).foreach(m =>
        ports = Some((m.group(1).toInt, m.group(2).toInt)))
    }
    assert(ports.nonEmpty, s"daemon $instance: no banner within 180s")
    // drain the subprocess's remaining output so its stdout pipe never fills
    new Thread(() => {
      try { while (reader.readLine() != null) () } catch { case _: Throwable => () }
    }) { setDaemon(true); start() }
    (proc, ports.get._1, ports.get._2)
  }

  private def send(port: Int, lines: Seq[String]): Unit = {
    val sock = new Socket("127.0.0.1", port)
    try {
      val w = new OutputStreamWriter(sock.getOutputStream, StandardCharsets.UTF_8)
      lines.foreach(l => w.write(l + "\n"))
      w.flush()
    } finally sock.close()
  }

  private def poll(deadlineSec: Int)(cond: => Boolean): Boolean = {
    val deadline = System.nanoTime() + TimeUnit.SECONDS.toNanos(deadlineSec)
    while (System.nanoTime() < deadline) {
      if (try cond catch { case _: Throwable => false }) return true
      Thread.sleep(2000)
    }
    cond
  }

  test("two live sharded instances: fnv1a client routing, mis-route rejection, merged find") {
    val names = (1 to 40).map(i => s"shard.m$i")
    val own = Array(names.filter(Fnv1a.shard(_, 2) == 0).take(3),
                    names.filter(Fnv1a.shard(_, 2) == 1).take(3))
    assert(own(0).size == 3 && own(1).size == 3)
    // one deliberately MIS-routed name per instance (owned by the OTHER)
    val misTo0 = names.filter(Fnv1a.shard(_, 2) == 1).drop(3).head
    val misTo1 = names.filter(Fnv1a.shard(_, 2) == 0).drop(3).head

    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.DurationInt
    import scala.concurrent.ExecutionContext.Implicits.global
    val spawned = Seq(0, 1).map(i => Future(spawnDaemon(i)))
      .map(Await.result(_, 200.seconds))
    procs = spawned.map(_._1)
    val Seq(l0, l1) = spawned.map(_._2)
    val Seq(h0, h1) = spawned.map(_._3)
    val httpPorts = Seq(h0, h1)

    // slot-aligned timestamps (step 10s) so the hot view's datapoints carry
    // exactly the sent instants
    val now = (System.currentTimeMillis() / 1000 / 10) * 10
    def pt(m: String, k: Int) = s"$m ${k + 1}.5 ${now - 60 + k * 10}"
    send(l0, own(0).flatMap(m => (0 until 3).map(k => pt(m, k))) :+ pt(misTo0, 0))
    send(l1, own(1).flatMap(m => (0 until 3).map(k => pt(m, k))) :+ pt(misTo1, 0))

    // 1. every correctly-routed metric becomes queryable THROUGH THE
    //    SHARD-ROUTED CLIENT (it must pick the right port on its own)
    for (m <- own(0) ++ own(1))
      assert(poll(120) {
        CacheQueryCli.query("127.0.0.1", httpPorts, m).contains("[" + (now - 60))
      }, s"$m never became queryable via the routed client")

    // 2. the mis-routed names were rejected at registration: absent from
    //    the receiving instance's catalog (find) and cache (query)
    for ((mis, h) <- Seq((misTo0, h0), (misTo1, h1))) {
      val found = CacheQueryCli.find("127.0.0.1", Seq(h), "shard.*")
      assert(!found.contains("\"" + mis + "\""),
        s"mis-routed $mis admitted by instance on port $h: $found")
      val body = try CacheQueryCli.query("127.0.0.1", Seq(h), mis)
        catch { case _: Throwable => "" } // a 4xx is also a correct "absent"
      assert(!body.contains(s"${now - 60}"),
        s"mis-routed $mis has cached datapoints on port $h")
    }

    // 3. merged glob discovery sees both instances' series, each exactly once
    val merged = CacheQueryCli.find("127.0.0.1", httpPorts, "shard.*")
    for (m <- own(0) ++ own(1)) {
      assert(merged.contains("\"path\":\"" + m + "\""), s"$m missing from merged find")
      assert(merged.indexOf("\"path\":\"" + m + "\"")
        == merged.lastIndexOf("\"path\":\"" + m + "\""), s"$m duplicated in merged find")
    }
  }
}
