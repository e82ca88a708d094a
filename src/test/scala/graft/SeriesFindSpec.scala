package graft

import graft.storage.SeriesFind
import org.scalatest.funsuite.AnyFunSuite

/** Glob-tree series discovery (the graphite-web metrics/find analog over
  * the catalog; the reference's link tree serves this walk,
  * rurouni/storage.py:20-22,51-53).
  */
class SeriesFindSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("globToRegex: graphite component globs translate to anchored RE2-safe regexes") {
    assert(SeriesFind.globToRegex("*") == "^.*$")
    assert(SeriesFind.globToRegex("cpu?") == "^cpu.$")
    assert(SeriesFind.globToRegex("u[0-9]") == "^u[0-9]$")
    assert(SeriesFind.globToRegex("{click,view}") == "^(?:click|view)$")
    // regex metacharacters in plain components match literally
    assert(SeriesFind.globToRegex("a+b") == "^a\\+b$")
    assert(SeriesFind.globToRegex("a.b") == "^a\\.b$")
    assert("^(?:a|b)x$".r.pattern.matcher("ax").matches())
    // a comma inside a character class is literal, not alternation
    assert(SeriesFind.globToRegex("[,x]") == "^[,x]$")
    // a stray closing brace with no opener is literal
    assert(SeriesFind.globToRegex("a}b") == "^a\\}b$")
  }

  private val metrics = Seq(
    "app.click.u0", "app.click.u0.raw", "app.view.u1", "app.click", "sys.cpu")
    .toDF("metric")

  test("nodes: leaf and branch flags at query depth, glob per component") {
    val got = SeriesFind.nodes(metrics, "app.*.u?").collect()
      .map(r => (r.getString(0), r.getBoolean(1), r.getBoolean(2)))
    assert(got.toSeq == Seq(
      ("app.click.u0", true, true),  // metric ends here AND extends (.raw)
      ("app.view.u1", true, false)))
  }

  test("nodes: one-level walk shows branches like the link-tree directory listing") {
    val got = SeriesFind.nodes(metrics, "*").collect()
      .map(r => (r.getString(0), r.getBoolean(1), r.getBoolean(2)))
    assert(got.toSeq == Seq(("app", false, true), ("sys", false, true)))
    // a node that is both a metric and a subtree root (dir-and-file)
    val mid = SeriesFind.nodes(metrics, "app.{click}").collect()
      .map(r => (r.getString(0), r.getBoolean(1), r.getBoolean(2)))
    assert(mid.toSeq == Seq(("app.click", true, true)))
  }

  test("nodes: limit bounds the output; empty components rejected") {
    assert(SeriesFind.nodes(metrics, "*", limit = 1).count() == 1)
    intercept[IllegalArgumentException] { SeriesFind.nodes(metrics, "a..b") }
    intercept[IllegalArgumentException] { SeriesFind.nodes(metrics, "") }
    // malformed glob (unclosed class) is a client error at plan time, not
    // an executor-time pattern failure
    intercept[IllegalArgumentException] { SeriesFind.nodes(metrics, "a[0-") }
    ()
  }
}
