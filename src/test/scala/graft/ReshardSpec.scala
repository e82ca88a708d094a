package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.core.{AggMethod, RetentionParser, StorageSchema, StorageSchemas}
import graft.functions.Fnv1a
import graft.ops.{Admin, CacheQueryCli}
import graft.storage.{Catalog, MetricStore}

/** Cluster re-shard migration e2e (round-8 verdict item #5): grow a LIVE
  * 2-instance deployment to 3 instances — the operation
  * `bin/kenshin-rehash.py` exists for (route by fnv1a % N_new,
  * rurouni/utils.py:107-108, then rewrite each metric's data into its new
  * owner's store).
  *
  * Shape: two real daemon JVMs ingest a sharded estate; both stop cleanly;
  * the offline migration reads each old store's full data (level 0 union
  * the hot table — a stop that failed to flush must not lose data) and
  * feeds ALL of it to each of THREE new stores, whose shard gates
  * (numInstances=3) keep exactly their own metrics — the same
  * read-everything / keep-mine semantics as the reference's rehash walk.
  * Three daemons restart on the new roots and the routed client must see
  * every metric exactly once, owned by exactly the instance fnv1a names.
  */
class ReshardSpec extends AnyFunSuite with BeforeAndAfterAll {
  implicit lazy val spark = SparkTestBase.spark

  private var root: Path = _
  private var live: Seq[DaemonHarness.Live] = Nil

  override def beforeAll(): Unit = { root = Files.createTempDirectory("graft-reshard") }
  override def afterAll(): Unit = {
    live.foreach(DaemonHarness.stop)
    import scala.reflect.io.Directory
    new Directory(new java.io.File(root.toString)).deleteRecursively()
    ()
  }

  // the daemon CLI's schema for a bare "10s:1h" retention arg
  private val schema = StorageSchema("default", ".*".r, 0.5, AggMethod.Average,
    RetentionParser.parseRetentions("10s:1h"),
    cacheRetention = 1800, metricsPerFile = 40)

  /** Everything a stopped instance holds: level 0 union the hot table
    * (a clean stop flushes hot into level 0, but the migration must not
    * depend on that flush having won the race with process death).
    */
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

  test("2->3 re-shard: every metric fetchable exactly once, fnv1a owner agrees") {
    val names = (1 to 36).map(i => s"rs.m$i")
    val now = (System.currentTimeMillis() / 1000 / 10) * 10
    val pts = for ((m, i) <- names.zipWithIndex; k <- 0 until 3)
      yield (m, now - 120 + k * 10, i * 10 + k + 0.5)

    // ---- live 2-instance estate ----------------------------------------
    live = Seq(0, 1).map(i =>
      DaemonHarness.spawn(s"$root/old$i", numInstances = 2, instance = i))
    val lineOf = live.map(_.linePort)
    for ((m, ts, v) <- pts)
      DaemonHarness.send(lineOf(Fnv1a.shard(m, 2)), Seq(s"$m $v $ts"))
    val oldHttp = live.map(_.httpPort)
    for (m <- names)
      assert(DaemonHarness.poll(180) {
        CacheQueryCli.query("127.0.0.1", oldHttp, m).contains(s"[${now - 120}")
      }, s"$m never became queryable on the 2-instance estate")
    live.foreach(DaemonHarness.stop)
    live = Nil

    // ---- offline migration: read everything, each new gate keeps its own
    val estate = allPoints(s"$root/old0").unionByName(allPoints(s"$root/old1"))
      .localCheckpoint()
    assert(estate.count() >= names.size * 3L, "migration source lost points")
    for (i <- 0 until 3) {
      val cat = new Catalog(s"$root/new$i", new StorageSchemas(Seq(schema)),
        numInstances = 3, instance = i)
      val st = new MetricStore(s"$root/new$i", schema, Some(cat))
      Admin.importSeries(estate, st, now)
    }

    // ---- 3-instance deployment over the migrated estate -----------------
    live = (0 until 3).map(i =>
      DaemonHarness.spawn(s"$root/new$i", numInstances = 3, instance = i))
    val newHttp = live.map(_.httpPort)

    // the routed client finds every point at its exact value, exactly once
    for ((m, ts, v) <- pts) {
      assert(DaemonHarness.poll(120) {
        CacheQueryCli.fetch("127.0.0.1", newHttp, m, now - 3600, now + 60, now)
          .contains(s"[$ts,$v]")
      }, s"$m [$ts,$v] lost in the re-shard")
      val body = CacheQueryCli.fetch("127.0.0.1", newHttp, m, now - 3600, now + 60, now)
      assert(body.indexOf(s"[$ts,") == body.lastIndexOf(s"[$ts,"),
        s"slot $m@$ts duplicated after migration: $body")
    }

    // ownership agrees with fnv1a % 3: each instance finds exactly its own
    for (i <- 0 until 3) {
      val found = CacheQueryCli.find("127.0.0.1", Seq(newHttp(i)), "rs.*")
      for (m <- names)
        assert(found.contains("\"path\":\"" + m + "\"") == (Fnv1a.shard(m, 3) == i),
          s"$m on instance $i disagrees with fnv1a routing (owner ${Fnv1a.shard(m, 3)})")
    }
    // merged discovery sees the whole estate, each metric once
    val merged = CacheQueryCli.find("127.0.0.1", newHttp, "rs.*")
    for (m <- names) {
      assert(merged.contains("\"path\":\"" + m + "\""), s"$m missing after re-shard")
      assert(merged.indexOf("\"path\":\"" + m + "\"")
        == merged.lastIndexOf("\"path\":\"" + m + "\""), s"$m duplicated after re-shard")
    }
  }
}
