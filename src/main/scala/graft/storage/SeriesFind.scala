package graft.storage

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Glob-pattern series discovery — the graphite-web `metrics/find` query
  * shape. The reference maintains a filesystem LINK TREE mirroring the
  * metric namespace (`metric.replace('.', sep)`,
  * rurouni/storage.py:20-22,51-53 + createLink) precisely so the web
  * finder can glob it one path level at a time; its admin tools run
  * regexes over the metric index instead (bin/kenshin-get-metrics.py:9-24).
  * Here the catalog IS the index (SURVEY §2 marks the link tree n/a), so
  * find is a bounded scan over the catalog's metric column: match each
  * dotted path component against its glob, group by the query-depth
  * prefix, and report whether each node is a leaf (a metric ends exactly
  * there) and/or a branch (metrics extend deeper) — the two flags the
  * graphite-web tree UI needs.
  *
  * Scale posture: one narrow filter + one groupBy over the catalog (one
  * row per metric — the only table small enough at 100 TB to answer
  * "which series exist"), output limit-bounded before any collect.
  */
object SeriesFind {

  /** Translate one graphite path-component glob to an anchored Java-regex
    * (RE2-compatible — no backrefs): `*` -> `.*`, `?` -> `.`, `[...]`
    * character classes pass through, `{a,b}` -> `(?:a|b)`, everything
    * else matches literally. A component glob never crosses a `.`
    * boundary because matching is per-component.
    */
  def globToRegex(glob: String): String = globToRegex(glob, ".*", ".")

  /** Same translation with the wildcard classes injectable: full-path
    * matching (serving/TargetEval) passes `[^.]*` / `[^.]` so a `*` in
    * `app.*.cpu` spans one node, never a `.` boundary — per-component
    * matching keeps the plain classes because the split already guarantees
    * that.
    */
  def globToRegex(glob: String, star: String, one: String): String = {
    val sb = new StringBuilder("^")
    var inClass = false
    var braceDepth = 0
    glob.foreach {
      case '*' if !inClass => sb.append(star); ()
      case '?' if !inClass => sb.append(one); ()
      case '[' if !inClass => inClass = true; sb.append('['); ()
      case ']' if inClass => inClass = false; sb.append(']'); ()
      case '{' if !inClass => braceDepth += 1; sb.append("(?:"); ()
      case '}' if !inClass && braceDepth > 0 => braceDepth -= 1; sb.append(')'); ()
      case ',' if !inClass && braceDepth > 0 => sb.append('|'); ()
      case c if !inClass && "\\.^$+()|{}".indexOf(c.toInt) >= 0 =>
        sb.append('\\').append(c); ()
      case c => sb.append(c); ()
    }
    sb.append('$').toString
  }

  /** Find tree nodes matching a dotted glob query over a one-column
    * `metric` frame: returns `(path, leaf, branch)` sorted by path, at
    * depth = the query's component count. `leaf` — some metric IS this
    * path; `branch` — some metric extends below it (both can hold, like a
    * directory that is also a file in the reference's link tree).
    */
  def nodes(metrics: DataFrame, query: String, limit: Int = 1000): DataFrame = {
    require(query.nonEmpty, "find query must be non-empty")
    val comps = query.split("\\.", -1)
    require(comps.forall(_.nonEmpty), s"empty path component in find query '$query'")
    // pre-compile each translated component: a malformed glob (unclosed
    // class, say) must be a client error here, not an executor-time
    // pattern failure inside the scan
    comps.foreach { g =>
      try { java.util.regex.Pattern.compile(globToRegex(g)); () }
      catch {
        case e: java.util.regex.PatternSyntaxException =>
          throw new IllegalArgumentException(s"bad glob component '$g': ${e.getMessage}")
      }
    }
    val n = comps.length
    val parts = split(col("metric"), "\\.")
    // get(), not element_at(): ANSI mode throws on out-of-bounds and the
    // size guard's evaluation order isn't guaranteed; get() nulls out and
    // the null predicate filters the row
    val compMatch: Column = comps.zipWithIndex.map { case (g, i) =>
      get(parts, lit(i)).rlike(globToRegex(g))
    }.reduce(_ && _)
    metrics
      .where(size(parts) >= n && compMatch)
      .groupBy(array_join(slice(parts, 1, n), ".").as("path"))
      .agg(
        max(when(size(parts) === n, 1).otherwise(0)).as("leaf_i"),
        max(when(size(parts) > n, 1).otherwise(0)).as("branch_i"))
      .select(col("path"),
        (col("leaf_i") === 1).as("leaf"),
        (col("branch_i") === 1).as("branch"))
      .orderBy("path")
      .limit(limit)
  }
}
