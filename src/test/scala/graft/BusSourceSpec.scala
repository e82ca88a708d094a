package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.streaming.{BusSource, Ingest}

/** Transport-pluggability contract (round-8): every BusSource yields the
  * same `line` frame, so the parse → admit pipeline behind it produces
  * IDENTICAL points no matter which bus carried them. Reference seam:
  * line/pickle receivers are interchangeable transports into one cache
  * (rurouni/protocols.py:31-62).
  */
class BusSourceSpec extends AnyFunSuite with BeforeAndAfterAll {
  implicit lazy val spark = SparkTestBase.spark

  var root: java.nio.file.Path = _
  override def beforeAll(): Unit = { root = java.nio.file.Files.createTempDirectory("graft-bus") }
  override def afterAll(): Unit = {
    import scala.reflect.io.Directory
    new Directory(new java.io.File(root.toString)).deleteRecursively()
    ()
  }

  // one payload exercising BOTH protocols plus a malformed record
  private val payload = Seq(
    "a.cpu 1.5 1700000000",
    "not a parseable line",
    """[{"metric":"b.mem","ts":1700000010,"value":2.5},{"metric":"c.io","ts":1700000020,"value":3.5}]""")

  private def drain(src: BusSource, trigger: Trigger,
                    feed: () => Unit): Seq[(String, Long, Double, Long)] = {
    import spark.implicits._
    val got = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Double, Long)]
    feed()
    val q = src.lines(spark).writeStream.outputMode("append")
      .trigger(trigger)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        got.synchronized {
          got ++= Ingest.parseMixed(b).as[(String, Long, Double, Long)].collect()
        }
        ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    got.toSeq.sorted
  }

  test("journal and memory buses carry identical points through parseMixed") {
    val viaMemory = {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      implicit val enc: org.apache.spark.sql.Encoder[String] =
        org.apache.spark.sql.Encoders.STRING
      val mem = MemoryStream[String]
      drain(BusSource.Memory(mem), Trigger.ProcessingTime(0),
        () => { mem.addData(payload); () })
    }
    val dir = s"$root/journal"
    val viaJournal = drain(BusSource.Journal(dir), Trigger.AvailableNow(),
      () => {
        new java.io.File(dir).mkdirs()
        java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/b0.txt"),
          payload.mkString("", "\n", "\n").getBytes("UTF-8"))
        ()
      })
    val expected = Seq(
      ("a.cpu", 1700000000L, 1.5, 1700000000L * 1000000000L),
      ("b.mem", 1700000010L, 2.5, 1700000010L * 1000000000L),
      ("c.io", 1700000020L, 3.5, 1700000020L * 1000000000L))
    assert(viaMemory == expected)
    assert(viaJournal == expected) // byte-identical across transports
  }

  test("kafka bus is wired to the public connector API and fails LOUDLY without the jar") {
    val k = BusSource.Kafka("broker-1:9092,broker-2:9092", "graft-points",
      startingOffsets = "earliest",
      extraOptions = Map("maxOffsetsPerTrigger" -> "100000"))
    // the connector jar is deliberately not shipped in this sandbox: the
    // one-config-away posture is "deploy spark-sql-kafka and construct
    // BusSource.Kafka" — absence must be an immediate, named error, never
    // a silently-empty stream
    val ex = intercept[Exception] { k.lines(spark) }
    assert(ex.getMessage.toLowerCase.contains("kafka"), ex.getMessage)
  }
}
