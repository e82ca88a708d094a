package graft.serving

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Graphite tagged-series support (the tag-database query family:
  * `seriesByTag` / `groupByTags` / `aliasByTags`). Graphite's carbon tag
  * format stores tags IN the series name — `name;tag1=val1;tag2=val2`,
  * tag order canonicalized by key — and every series implicitly carries a
  * `name` tag holding the part before the first `;`. The reference stack
  * predates tag support entirely (kenshin metric names are plain dotted
  * paths), so this is the graphite-web 1.1+ surface re-expressed on the
  * same storage: because the tags travel inside the metric string, a tag
  * query compiles to string predicates over the `metric` column — no
  * separate tag index is needed for filtering, and the predicates run
  * codegen'd inside the scan instead of against a tag database (graphite's
  * LocalDatabaseTagDB round-trips through sqlite/redis per query).
  *
  * Scale posture: `tagValue` is one `regexp_extract` per referenced key
  * (whole-stage codegen, no shuffle); a `seriesByTag` filter is applied to
  * the fetched frame before any downstream aggregation, so the engine
  * never materializes non-matching series past the scan.
  */
object Tags {

  /** The tag value of `key` in a series name column, graphite semantics:
    * `name` is everything before the first `;` (the whole string when
    * untagged); any other key extracts `;key=value` with `value` running
    * to the next `;` or end; a missing tag reads as the empty string
    * (graphite's TaggedSeries.tags.get(tag, '')).
    */
  def tagValue(metric: Column, key: String): Column =
    if (key == "name") substring_index(metric, ";", 1)
    else regexp_extract(metric, ";" + java.util.regex.Pattern.quote(key) + "=([^;]*)", 1)

  /** One parsed tag expression `tag <op> value` with op one of
    * `=` `!=` `=~` `!~` (graphite's seriesByTag spec grammar).
    */
  final case class Spec(key: String, op: String, value: String)

  private val SpecRe = "([^;!=~]+)(=~|!~|!=|=)(.*)".r

  /** Parse one spec; malformed specs are client errors
    * (IllegalArgumentException — the serving layer's 400 class).
    */
  def parseSpec(s: String): Spec = s match {
    case SpecRe(k, op, v) =>
      if (op == "=~" || op == "!~") {
        // pre-compile: a malformed regex must fail the request here, not
        // as an executor-time pattern error inside the scan
        try { java.util.regex.Pattern.compile(v); () }
        catch {
          case e: java.util.regex.PatternSyntaxException =>
            throw new IllegalArgumentException(
              s"bad regex in tag spec '$s': ${e.getMessage}")
        }
      }
      Spec(k, op, v)
    case _ => throw new IllegalArgumentException(
      s"bad tag spec '$s' (expected tag=value, tag!=value, tag=~regex, or tag!~regex)")
  }

  /** Whether a spec can only match series that HAVE the tag with a
    * non-empty value — graphite requires at least one such spec per
    * seriesByTag call so a query can never be an unbounded everything-scan
    * of the estate: `=` with a non-empty value, or `=~` with a pattern
    * that does not match the empty string.
    */
  def matchesNonEmpty(spec: Spec): Boolean = spec.op match {
    case "="  => spec.value.nonEmpty
    case "=~" => !java.util.regex.Pattern.compile(spec.value).matcher("").lookingAt()
    case _    => false
  }

  /** Compile one spec to a predicate over the metric-name column. Regex
    * ops match from the START of the value (graphite's re.match), not
    * anywhere in it; a missing tag participates as the empty string.
    */
  def predicate(metric: Column, spec: Spec): Column = {
    val v = tagValue(metric, spec.key)
    spec.op match {
      case "="  => v === lit(spec.value)
      case "!=" => v =!= lit(spec.value)
      case "=~" => v.rlike("^(?:" + spec.value + ")")
      case "!~" => !v.rlike("^(?:" + spec.value + ")")
    }
  }

  /** Parse + conjoin a full seriesByTag argument list, enforcing the
    * at-least-one-non-empty-match rule.
    */
  def compile(metric: Column, specs: Seq[String]): Column = {
    require(specs.nonEmpty, "seriesByTag expects at least one tag spec")
    val parsed = specs.map(parseSpec)
    require(parsed.exists(matchesNonEmpty),
      s"seriesByTag requires at least one spec matching a non-empty tag value, " +
        s"got: ${specs.mkString(", ")}")
    parsed.map(predicate(metric, _)).reduce(_ && _)
  }
}
