package graft

import graft.core.{AggMethod, Archive, StorageSchema, StorageSchemas, TokenBucket}
import graft.storage.{Catalog, MetricStore}
import graft.functions.Fnv1a
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Metrics catalog: first-sight registration with schema assignment,
  * token-bucket create throttle, fnv1a shard gate, and the catalog-backed
  * fetch spine. Reference: rurouni/cache.py:69-151, rurouni/utils.py:55-108.
  */
class CatalogSpec extends AnyFunSuite with BeforeAndAfterAll {
  implicit lazy val spark = SparkTestBase.spark
  import spark.implicits._

  var root: java.nio.file.Path = _
  override def beforeAll(): Unit = { root = java.nio.file.Files.createTempDirectory("graft-catalog") }
  override def afterAll(): Unit = {
    import scala.reflect.io.Directory
    new Directory(new java.io.File(root.toString)).deleteRecursively()
    ()
  }

  val schemas = new StorageSchemas(Seq(
    StorageSchema("cpu", "^sys\\.cpu\\.".r, 1.0, AggMethod.Average, Seq(Archive(10, 360)), 600, 8),
    StorageSchema("everything", ".*".r, 1.0, AggMethod.Last, Seq(Archive(60, 1440)), 600, 8)))

  def pts(ms: String*) =
    ms.zipWithIndex.map { case (m, i) => (m, 1700000000L + i, 1.0, i.toLong) }
      .toDF("metric", "ts", "value", "arrival")

  test("TokenBucket ports the reference doctest (rurouni/utils.py:60-70)") {
    var now = 0.0
    val b = new TokenBucket(60, 1, () => now)
    assert(b.consume(6))
    assert(b.consume(54))
    assert(!b.consume(1))
    now = 1.0 // one second refills one token
    assert(b.consume(1))
    assert(!b.consume(1))
  }

  test("consumeUpTo grants whole tokens in one take (batch form of consume(1))") {
    var now = 0.0
    val b = new TokenBucket(10, 1, () => now)
    assert(b.consumeUpTo(4) == 4)
    assert(b.consumeUpTo(100) == 6) // capped by what's left
    assert(b.consumeUpTo(1) == 0)
    now = 2.5 // fractional refill: only whole tokens grant
    assert(b.consumeUpTo(5) == 2)
    assert(b.consume(0.5)) // the fractional remainder is still there
  }

  test("in-plan schema assignment (rlike chain) matches schemaFor for every name shape") {
    // prefix-anchored first-match: an interior occurrence of the pattern
    // ("xsys.cpu.y") must NOT match, exactly like Regex.lookingAt
    val names = Seq("sys.cpu.user", "sys.cpux", "app.x", "m.1", "xsys.cpu.y")
    val cat = new Catalog(s"$root/cparity", schemas)
    cat.admit(pts(names: _*), 100L)
    val reg = cat.metrics().as[(String, String, Long)].collect()
      .map(r => r._1 -> r._2).toMap
    names.foreach(n => assert(reg(n) == schemas.schemaFor(n).name, n))
  }

  test("first sight registers with first-match schema; re-sight does not duplicate") {
    val cat = new Catalog(s"$root/c1", schemas)
    val out1 = cat.admit(pts("sys.cpu.user", "app.latency"), 100L)
    assert(out1.count() == 2)
    val reg = cat.metrics().orderBy("metric")
      .as[(String, String, Long)].collect().toSeq
    assert(reg == Seq(("app.latency", "everything", 100L), ("sys.cpu.user", "cpu", 100L)))
    assert(cat.creates == 2)
    // same metrics again: no new rows, points still admitted
    val out2 = cat.admit(pts("sys.cpu.user"), 200L)
    assert(out2.count() == 1)
    assert(cat.metrics().count() == 2)
  }

  test("token bucket throttles creates; throttled metrics' points drop (rurouni/cache.py:119-121)") {
    var now = 0.0
    val cat = new Catalog(s"$root/c2", schemas,
      bucket = Some(new TokenBucket(2, 0, () => now)))
    val out = cat.admit(pts("m.a", "m.b", "m.c"), 100L)
    // deterministic name order: m.a, m.b admitted; m.c throttled
    assert(out.select("metric").as[String].collect().toSet == Set("m.a", "m.b"))
    assert(cat.droppedCreates == 1 && cat.creates == 2)
    // known metrics stay admitted even with an empty bucket
    assert(cat.admit(pts("m.a"), 200L).count() == 1)
  }

  test("mis-routed metrics are rejected by the shard gate (rurouni/cache.py:123-128)") {
    val metricsForInstance0 = (1 to 100).map(i => s"m.$i").filter(Fnv1a.shard(_, 4) == 0)
    val other = (1 to 100).map(i => s"m.$i").find(Fnv1a.shard(_, 4) == 3).get
    val cat = new Catalog(s"$root/c3", schemas, numInstances = 4, instance = 0)
    val out = cat.admit(pts(metricsForInstance0.head, other), 100L)
    assert(out.select("metric").as[String].collect().toSeq == Seq(metricsForInstance0.head))
    assert(cat.droppedCreates == 1)
  }

  test("shard-foreign creates consume tokens BEFORE the shard check (rurouni/cache.py:119-128)") {
    // the reference's walk is: consume(1) first, instance check second —
    // so a mis-routed name burns a token even though it is then dropped.
    // Pick two names where the SORTED-first one is shard-foreign: with a
    // 1-token bucket the foreign name eats the token, the local name gets
    // none, and NOTHING is admitted.
    val names = (1 to 200).map(i => s"tk.$i")
    val foreign = names.filter(Fnv1a.shard(_, 4) == 3)
    val local = names.filter(Fnv1a.shard(_, 4) == 0)
    val pair = (for { f <- foreign; l <- local if f < l } yield (f, l)).head
    var now = 0.0
    val cat = new Catalog(s"$root/c3tok", schemas, numInstances = 4, instance = 0,
      bucket = Some(new TokenBucket(1, 0, () => now)))
    val out = cat.admit(pts(pair._1, pair._2), 100L)
    assert(out.count() == 0, "token went to the shard-foreign name; local name throttled")
    assert(cat.creates == 0 && cat.droppedCreates == 2)
    assert(cat.metrics().count() == 0)
  }

  test("catalog-backed fetch spine: silent series fetch as all-null") {
    val sch = StorageSchema("s", ".*".r, 1.0, AggMethod.Last, Seq(Archive(10, 360)), 600, 8)
    // the catalog must know the store's schema: fetch spines are filtered
    // to the store's schema_name (shared catalogs would otherwise gap-fill
    // phantom series from other stores)
    val cat = new Catalog(s"$root/c4", new StorageSchemas(Seq(sch)))
    val store = new MetricStore(s"$root/c4-store", sch, Some(cat))
    val now = 1700003600L
    cat.admit(pts("m.live", "m.silent"), now)
    store.writeBatch(Seq(("m.live", now - 100, 5.0, 1L)).toDF("metric", "ts", "value", "arrival"), now)
    val Some((_, df)) = store.fetch(None, now - 100, now - 80, now)
    val got = df.as[(String, Long, Option[Double])].collect().toSeq
    assert(got == Seq(
      ("m.live", now - 100, Some(5.0)), ("m.live", now - 90, None),
      ("m.silent", now - 100, None), ("m.silent", now - 90, None)))
  }

  test("rebuildFromStore recovers a lost catalog from level tables (rurouni/storage.py:56-77)") {
    val sch = StorageSchema("rb", ".*".r, 1.0, AggMethod.Last, Seq(Archive(10, 360)), 600, 8)
    val store = new MetricStore(s"$root/c6-store", sch)
    val now = 1700003600L
    store.writeBatch(pts("sys.cpu.user", "app.latency")
      .withColumn("ts", lit(now - 100L)), now)
    // fresh catalog dir (simulating index loss); recover from storage
    val cat = new Catalog(s"$root/c6-cat", schemas)
    assert(cat.rebuildFromStore(store) == 2)
    val reg = cat.metrics().orderBy("metric").as[(String, String, Long)].collect().toSeq
    assert(reg.map(_._1) == Seq("app.latency", "sys.cpu.user"))
    assert(reg.map(_._2) == Seq("everything", "cpu")) // schema re-derived by regex
    assert(reg.forall(_._3 == now - 100L))            // created_ts = earliest stored slot
    // idempotent: nothing more to recover
    assert(cat.rebuildFromStore(store) == 0)
  }

  // ---- round-8 pins: admit is O(batch), never O(estate) ----------------

  test("steady-state admit passes the batch through untouched (no estate join)") {
    val cat = new Catalog(s"$root/c9", schemas)
    cat.admit(pts("s.a", "s.b"), 100L).count()
    val p = pts("s.a", "s.b")
    // every metric known → the SAME frame comes back: no gate join exists
    // at all, so per-batch cost cannot scale with the estate
    assert(cat.admit(p, 200L) eq p)
  }

  test("admit's point gate joins this batch's rejects, not the estate, and survives the append") {
    var now = 0.0
    val cat = new Catalog(s"$root/c7", schemas,
      bucket = Some(new TokenBucket(1, 0, () => now)))
    val out = cat.admit(pts("t.a", "t.b", "t.c"), 100L) // grant t.a; throttle t.b, t.c
    // the gate must NOT rescan the catalog: the admit append already
    // happened, so a lineage recompute against the post-append estate
    // would re-derive an empty fresh set and silently admit the throttled
    // names — the reject set is checkpointed pre-append instead
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("c7/catalog"), plan.take(2000))
    assert(out.select("metric").as[String].collect().toSeq == Seq("t.a"))
    assert(cat.creates == 1 && cat.droppedCreates == 2)
  }

  test("metrics() is cached across calls; any mutation invalidates") {
    val cat = new Catalog(s"$root/c10", schemas)
    cat.admit(pts("k.a"), 100L).count()
    val m1 = cat.metrics()
    assert(m1 eq cat.metrics()) // cross-batch reuse: no parquet re-read
    cat.admit(pts("k.b"), 200L).count() // append → invalidate
    assert(!(m1 eq cat.metrics()))
    assert(cat.metricCount() == 2)
    cat.remove(Seq("k.a")) // remove → invalidate
    assert(cat.metricCount() == 1)
  }

  test("the cached base is a file-list snapshot: appends never double-count (r8)") {
    // a persisted frame over the DIRECTORY re-lists it on a recomputed
    // scan and silently absorbs appended rows; the snapshot base cannot
    val cat = new Catalog(s"$root/c12", schemas)
    cat.admit(pts("d.a"), 100L).count()
    val base = cat.metrics()
    base.count() // materialize
    cat.admit(pts("d.b", "d.c"), 200L).count() // parquet gains a new file
    // the OLD frame still sees exactly its snapshot, even if recomputed
    assert(base.select("metric").as[String].collect().toSeq == Seq("d.a"))
    assert(cat.metricCount() == 3)
    assert(cat.admit(pts("d.b"), 300L).count() == 1 && cat.creates == 3)
  }

  test("hintSmall stops forcing broadcast above the estate threshold") {
    val cat = new Catalog(s"$root/c11", schemas)
    cat.admit(pts("h.a", "h.b", "h.c"), 100L).count()
    def hinted(c: Catalog) =
      c.hintSmall(c.metrics()).queryExecution.analyzed.toString.contains("ResolvedHint")
    assert(hinted(cat)) // 3 rows ≤ default 1M threshold: broadcast forced
    spark.conf.set("spark.graft.catalog.broadcastMaxRows", "2")
    try {
      val big = new Catalog(s"$root/c11", schemas) // re-reads conf
      assert(!hinted(big)) // 3 rows > threshold 2: planner decides
    } finally spark.conf.unset("spark.graft.catalog.broadcastMaxRows")
  }

  test("remove deletes catalog rows") {
    val cat = new Catalog(s"$root/c5", schemas)
    cat.admit(pts("a", "b", "c"), 100L)
    cat.remove(Seq("b"))
    assert(cat.metrics().select("metric").as[String].collect().toSorted == Seq("a", "c"))
  }

  test("emergency eviction under a registration storm: live readers recompute, never fail") {
    // Round-10 ADVICE (medium): the emergency cap unpersists retired frames
    // INSIDE the min-hold window, and the code claims a render scanning such
    // a frame "pays a recompute, not a wrong answer". This test verifies
    // that claim empirically: the retired frames are plain .persist() over a
    // stable explicit file-list snapshot (lineage intact — contrast a
    // localCheckpoint, whose truncated lineage makes mid-scan unpersist
    // fatal), so a scan that loses its blocks must fall back to lineage
    // recompute. Storm = 40 metrics()/invalidate() cycles (the in-process
    // equivalent of 40 creating admits), enough to push the retired queue
    // past the 32-frame emergency threshold while 4 reader threads
    // continuously scan the OLDEST captured frames — exactly the frames the
    // emergency regime evicts mid-hold.
    // grace and min-hold pushed past the test's wall-clock: the ONLY code
    // path that can unpersist a frame inside this test is the emergency cap
    spark.conf.set("spark.graft.catalog.retireGraceMs", "1800000")
    spark.conf.set("spark.graft.catalog.retireMinHoldMs", "1800000")
    try {
      val cat = new Catalog(s"$root/cemerg", schemas)
      cat.admit(pts((1 to 2000).map(i => f"em.m$i%04d"): _*), 100L).count()

      // each captured frame reads a DISTINCT file-list snapshot (every storm
      // admit appends a part file), so every persist is its own CacheManager
      // entry — an invalidate-only storm would alias one shared entry and
      // make the storageLevel assertions vacuous
      val captured = new java.util.concurrent.CopyOnWriteArrayList[(org.apache.spark.sql.DataFrame, Long)]()
      captured.add((cat.metrics(), cat.metricCount()))
      val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
      val scans = new java.util.concurrent.atomic.AtomicInteger(0)
      val errors = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      val readers = (0 until 4).map { ci =>
        val t = new Thread(() => {
          val rnd = new scala.util.Random(ci)
          while (!stop.get()) {
            try {
              // bias to the oldest third — those are the emergency victims
              val n = captured.size()
              val idx = if (n <= 1) 0 else rnd.nextInt(math.max(1, n / 3))
              val (f, expect) = captured.get(idx)
              val c = f.count()
              if (c != expect) errors.add(s"frame[$idx] count $c != $expect")
              scans.incrementAndGet()
            } catch {
              case e: Throwable => errors.add(s"scan failed: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
            }
          }
        }, s"emerg-reader-$ci")
        t.setDaemon(true); t.start(); t
      }
      // the storm: 40 creating admits, each appends a file, retires the live
      // frame, and builds a fresh one
      for (i <- 1 to 40) {
        cat.admit(pts(f"em.storm$i%02d"), 200L).count()
        captured.add((cat.metrics(), cat.metricCount()))
      }
      // emergency must have actually evicted old frames WHILE readers were live
      import org.apache.spark.storage.StorageLevel
      val evictedDuringLoad = (0 until captured.size())
        .count(i => captured.get(i)._1.storageLevel == StorageLevel.NONE)
      // deterministic post-eviction scan of the oldest (certainly-evicted) frame
      assert(captured.get(0)._1.storageLevel == StorageLevel.NONE,
        "storm did not trip the emergency cap — test is vacuous")
      assert(captured.get(0)._1.count() == captured.get(0)._2,
        "recompute of an evicted frame returned wrong rows")
      Thread.sleep(1500) // let readers take a few more post-eviction scans
      stop.set(true)
      readers.foreach(_.join(30000))
      assert(errors.isEmpty, s"reader failures under emergency eviction (${errors.size}): " +
        scala.jdk.CollectionConverters.IteratorHasAsScala(errors.iterator()).asScala.take(3).mkString(" | "))
      assert(scans.get() > 20, s"only ${scans.get()} concurrent scans — storm too fast to exercise readers")
      assert(evictedDuringLoad >= 5, s"only $evictedDuringLoad frames evicted — emergency regime barely exercised")
      println(s"EMERGENCY-EVICT scans=${scans.get()} evicted=$evictedDuringLoad captured=${captured.size()}")
    } finally {
      spark.conf.unset("spark.graft.catalog.retireGraceMs")
      spark.conf.unset("spark.graft.catalog.retireMinHoldMs")
    }
  }
  private implicit class SortedOps(a: Array[String]) { def toSorted: Seq[String] = a.toSeq.sorted }
}
