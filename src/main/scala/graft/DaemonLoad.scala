package graft

import java.io.OutputStreamWriter
import java.net.Socket
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.SparkSession

import graft.core.{AggMethod, Archive, StorageSchema}
import graft.storage.MetricStore
import graft.streaming.Daemon

/** Dev harness: daemon ingest throughput — the reference's headline axis
  * (a rurouni-cache instance is sized by points/s it can absorb). Drives
  * N line-protocol points over C concurrent sockets into a running
  * daemon and times until every point is queryable in the hot view,
  * for both the in-memory stream and the durable spool journal path.
  * Not part of the driver contract.
  *
  * Usage: runMain graft.DaemonLoad [points] [connections]
  */
object DaemonLoad {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 400000
    val conns = if (args.length > 1) args(1).toInt else 8
    implicit val spark: SparkSession = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = java.nio.file.Files.createTempDirectory("graft-load")

    val Now = 1700000000L
    for (mode <- Seq("memory", "spool")) {
      val schema = StorageSchema(s"load$mode", ".*".r, 1.0, AggMethod.Last,
        Seq(Archive(10, 720), Archive(60, 1440)), 3600L, 8)
      val store = new MetricStore(s"$root/$mode", schema)
      val d = new Daemon(Seq(Daemon.Route(store, 3600L)), waitTime = 30L,
        checkpoint = s"$root/$mode-ckpt", nowFn = () => Now,
        spoolDir = if (mode == "spool") Some(s"$root/$mode-spool") else None)
      val (linePort, _) = d.start()
      // N distinct (metric, slot) pairs inside the hot window, so the
      // LWW dedupe collapses nothing and the final count is exact
      val slots = 360
      val series = (n + slots - 1) / slots
      val t0 = System.nanoTime()
      val threads = (0 until conns).map { c =>
        val t = new Thread(() => {
          val sock = new Socket("127.0.0.1", linePort)
          try {
            val w = new OutputStreamWriter(
              new java.io.BufferedOutputStream(sock.getOutputStream, 1 << 16),
              StandardCharsets.UTF_8)
            var i = c
            while (i < n) {
              val m = i % series
              val slot = i / series % slots
              w.write(s"srv.h$m.cpu ${i.toDouble} ${Now - 3590 + slot * 10}\n")
              i += conns
            }
            w.flush()
          } finally sock.close()
        })
        t.start(); t
      }
      threads.foreach(_.join())
      val tSend = (System.nanoTime() - t0) / 1e9
      var count = 0L
      var it = 0
      val deadline = System.currentTimeMillis() + 300000
      while (count < n && System.currentTimeMillis() < deadline) {
        d.processAllAvailable()
        count = d.hot.hotView().count()
        it += 1
        if (sys.env.contains("DAEMONLOAD_DEBUG"))
          println(f"  it=$it count=$count t=${(System.nanoTime() - t0) / 1e9}%.1fs")
      }
      val tAll = (System.nanoTime() - t0) / 1e9
      // rate from what actually became queryable — a timeout must print a
      // loud marker and an honest (lower) rate, never n/t
      val marker = if (count < n) " TIMEOUT-POINTS-LOST" else ""
      println(f"DAEMONLOAD mode=$mode%-6s n=$n conns=$conns " +
        f"send=${tSend}%.1fs e2e=${tAll}%.1fs rate=${count / tAll}%.0f pts/s " +
        f"(count=$count)$marker")
      d.stop()
    }
    spark.stop()
  }
}
