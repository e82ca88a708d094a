package graft

import graft.core._
import graft.functions.Fnv1a
import org.scalatest.funsuite.AnyFunSuite

/** Golden vectors ported from the reference test suite (semantics only —
  * reference: tests/test_storage.py, tests/test_agg.py, tests/test_fnv1a.py).
  */
class RetentionSpec extends AnyFunSuite {
  test("parse_time_str golden vectors (kenshin/storage.py:148-169)") {
    assert(RetentionParser.parseTimeStr("12h") == 43200L)
    assert(RetentionParser.parseTimeStr("60") == 60L)
    assert(RetentionParser.parseTimeStr("60s") == 60L)
    assert(RetentionParser.parseTimeStr("1min") == 60L)
    assert(RetentionParser.parseTimeStr("2d") == 172800L)
    assert(RetentionParser.parseTimeStr("1w") == 604800L)
    assert(RetentionParser.parseTimeStr("5y") == 5L * 86400 * 365)
    // unit prefix matching: "m" resolves to minutes (first prefix match)
    assert(RetentionParser.parseTimeStr("1m") == 60L)
    intercept[InvalidTime](RetentionParser.parseTimeStr("1x"))
    intercept[InvalidTime](RetentionParser.parseTimeStr("abc"))
  }

  test("parse_retention_def: count as number or duration (kenshin/storage.py:171-181)") {
    assert(RetentionParser.parseRetentionDef("60s:2d") == Archive(60, 2880))
    assert(RetentionParser.parseRetentionDef("1s:1h") == Archive(1, 3600))
    assert(RetentionParser.parseRetentionDef("10s:10") == Archive(10, 10))
    assert(RetentionParser.parseRetentions("10s:12h,60s:2d") ==
      Seq(Archive(10, 4320), Archive(60, 2880)))
  }

  test("archive validation rules 1-5 (kenshin/storage.py:219-270)") {
    // valid default cascade
    val cascade = RetentionParser.parseRetentions("10s:12h,60s:2d,300s:7d,15m:25w,12h:5y")
    assert(RetentionParser.validateArchives(cascade, 20.0).size == 5)
    // rule 1: empty
    intercept[InvalidConfig](RetentionParser.validateArchives(Nil, 1.0))
    // rule 2: duplicate precision
    intercept[InvalidConfig](
      RetentionParser.validateArchives(Seq(Archive(1, 10), Archive(1, 20)), 1.0))
    // rule 3: divisibility
    intercept[InvalidConfig](
      RetentionParser.validateArchives(Seq(Archive(2, 10), Archive(5, 10)), 1.0))
    // rule 4: increasing retention
    intercept[InvalidConfig](
      RetentionParser.validateArchives(Seq(Archive(1, 100), Archive(10, 5)), 1.0))
    // rule 5: enough points to consolidate (xff batching)
    intercept[InvalidConfig](
      RetentionParser.validateArchives(Seq(Archive(1, 2), Archive(3, 100)), 1.0))
  }
}

class SchemasSpec extends AnyFunSuite {
  val conf = """
    |[metric_test]
    |pattern = .*metric_test.*
    |retentions = 1s:1h,6s:2h
    |xFilesFactor = 1
    |aggregationMethod = avg
    |cacheRetention = 10s
    |metricsPerFile = 8
    |
    |[rurouni_stats]
    |pattern = ^rurouni\.
    |retentions = 60s:2d,300s:7d
    |xFilesFactor = 20
    |aggregationMethod = avg
    |cacheRetention = 600s
    |metricsPerFile = 8
    |
    |[default]
    |pattern = .*
    |retentions = 10s:12h,60s:2d,300s:7d,15m:25w
    |xFilesFactor = 20
    |aggregationMethod = avg
    |cacheRetention = 620s
    |metricsPerFile = 8
    |""".stripMargin

  test("first-match-wins schema assignment (rurouni/storage.py:200-204)") {
    val schemas = StorageSchemas.parse(conf)
    assert(schemas.schemaFor("a.metric_test.b").name == "metric_test")
    assert(schemas.schemaFor("rurouni.creates").name == "rurouni_stats")
    assert(schemas.schemaFor("sys.cpu.user").name == "default")
    assert(schemas.schemaFor("sys.cpu.user").archives.head == Archive(10, 4320))
    assert(schemas.schemaFor("a.metric_test.b").cacheRetention == 10L)
    assert(schemas.schemaFor("x").maxRetention == 900L * 16800)
  }

  test("pattern anchors at start like re.match") {
    val schemas = StorageSchemas.parse(conf)
    // '^rurouni\.' must not match mid-string; '.*rurouni' style would
    assert(schemas.schemaFor("app.rurouni.x").name == "default")
  }
}

class AggSpec extends AnyFunSuite {
  test("agg id order stability (kenshin/agg.py:10-16)") {
    assert(AggMethod.all.map(_.name) == Seq("average", "sum", "last", "max", "min"))
    assert(AggMethod.byName("avg") == AggMethod.Average)
    assert(AggMethod.byId(2) == AggMethod.Last)
  }
}

class Fnv1aSpec extends AnyFunSuite {
  test("fnv1a32 known-answer vectors (tests/test_fnv1a.py:16-22)") {
    def signed(u: Long): Int = u.toInt
    assert(Fnv1a.hash32("") == signed(0x811c9dc5L))
    assert(Fnv1a.hash32("a") == signed(0xe40c292cL))
    assert(Fnv1a.hash32("foobar") == signed(0xbf9cf968L))
    assert(Fnv1a.hash32("hello") == signed(0x4f9f2cabL))
    assert(Fnv1a.hash32(Array[Byte](-1, 0, 0, 1)) == signed(0xc48fb86dL))
  }

  test("shard is non-negative and stable (rurouni/utils.py:107-108)") {
    assert(Fnv1a.shard("hello", 2) == java.lang.Math.floorMod(0x4f9f2cab, 2))
    (0 until 100).foreach { i => assert(Fnv1a.shard(s"metric.$i", 8) >= 0) }
  }
}
