package graft

import graft.operators.Layout
import graft.sources.JsonlCorpus
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Source/sink edges: JSONL corpus ingestion (permissive parse, dead-letter
  * capture, schema-drift repair) and the z-ordered parquet sink (disjoint
  * per-file z-ranges, preserved row count).
  */
class SourceSinkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  var root: java.nio.file.Path = _
  override def beforeAll(): Unit = { root = java.nio.file.Files.createTempDirectory("graft-ss") }
  override def afterAll(): Unit = {
    import scala.reflect.io.Directory
    new Directory(new java.io.File(root.toString)).deleteRecursively()
    ()
  }

  test("jsonl: clean parses good lines, repairs missing n_chars, rejects capture bad lines") {
    val p = s"$root/docs.jsonl"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(p),
      Seq(
        """{"doc_id": 1, "text": "hello world", "lang": "en", "source": "web", "n_chars": 11}""",
        """{"doc_id": 2, "text": "abc", "lang": "de", "source": "web"}""", // n_chars drifted away
        """{"text": "no id", "lang": "en", "source": "web"}""",           // id-less → reject
        """this is not json at all""",                                     // corrupt → reject
        """{"doc_id": 4, "text": "ok", "lang": "fr", "source": "book", "n_chars": 2}"""
      ).mkString("\n"))
    val clean = JsonlCorpus.clean(spark, p).orderBy("doc_id").collect()
    assert(clean.map(_.getLong(0)).toSeq === Seq(1L, 2L, 4L))
    assert(clean(1).getLong(4) === 3L, "missing n_chars must be recomputed from text")
    assert(clean(0).getLong(4) === 11L)
    val rejects = JsonlCorpus.rejects(spark, p).collect()
    assert(rejects.length === 2)
    assert(rejects.exists(r => !r.isNullAt(0) && r.getString(0).contains("not json")))
    // id-less-but-parseable lines must carry a reconstructed payload, not a
    // contentless NULL — the dead-letter row is useless without the line
    assert(rejects.forall(r => !r.isNullAt(0)), "every reject row carries its payload")
    assert(rejects.exists(r => r.getString(0).contains("no id")))
  }

  test("zorder sink: files disjoint in z, counts preserved, raw-key envelopes tight") {
    val df = (0 until 1024).map(i => (i.toLong % 32, (i.toLong * 7) % 32, i.toLong))
      .toDF("x", "y", "id")
    val out = s"$root/zorder"
    Layout.zorderWrite(df, "x", "y", 5, 4, out)
    val audit = Layout.fileAudit(spark, out, "x", "y").collect()
    assert(audit.map(_.getLong(1)).sum === 1024L, "row count preserved")
    assert(audit.length === 4, "numFiles respected")
    // per-file z-ranges must be pairwise disjoint (the clustering property)
    val ranges = audit.map(r => (r.getLong(2), r.getLong(3))).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) => assert(hi < lo2, s"overlapping z-ranges: $ranges")
      case _ =>
    }
    // and tighter than the global envelope on at least one raw dimension:
    // the first z-file must not span the full x or y domain
    val f = audit.minBy(_.getLong(2))
    assert(f.getLong(5) - f.getLong(4) < 31 || f.getLong(7) - f.getLong(6) < 31,
      "first z-file spans the whole domain on both keys — clustering is not happening")
  }
}
