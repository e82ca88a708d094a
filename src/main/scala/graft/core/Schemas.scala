package graft.core

import scala.util.matching.Regex

/** One named storage schema: first-match-wins regex over metric names,
  * assigning a retention cascade, aggregation method, xff rollup-batching
  * factor and cache retention (reference: rurouni/storage.py:136-210 +
  * conf/storage-schemas.conf.example).
  *
  * `metricsPerFile` from the reference is a write-batching knob for its
  * fixed-size file format; our Parquet layout batches natively, so it is
  * parsed but only kept for config fidelity.
  */
final case class StorageSchema(
    name: String,
    pattern: Regex,
    xFilesFactor: Double,
    aggregationMethod: AggMethod,
    archives: Seq[Archive],
    cacheRetention: Long,
    metricsPerFile: Int,
) {
  def matches(metric: String): Boolean =
    pattern.pattern.matcher(metric).lookingAt() // re.match anchors at start only
  def maxRetention: Long = archives.map(_.retention).max
}

final class StorageSchemas(val schemas: Seq[StorageSchema]) {
  /** First-match-wins; falls back to the default schema
    * (rurouni/storage.py:200-204).
    */
  def schemaFor(metric: String): StorageSchema =
    schemas.find(_.matches(metric)).getOrElse(StorageSchemas.defaultSchema)

  def byName(name: String): Option[StorageSchema] = schemas.find(_.name == name)
}

object StorageSchemas {
  /** Reference default: 7 days of minutely data (rurouni/storage.py:188-196). */
  val defaultSchema: StorageSchema = StorageSchema(
    name = "default",
    pattern = ".*".r,
    xFilesFactor = 1.0,
    aggregationMethod = AggMethod.Average,
    archives = Seq(Archive(60, 60 * 24 * 7)),
    cacheRetention = 600,
    metricsPerFile = 40,
  )

  /** Parses an INI-style storage-schemas.conf, preserving section order.
    * Sections look like (conf/storage-schemas.conf.example:22-44):
    * {{{
    * [metric-test]
    * pattern = .*metric_test.*
    * retentions = 1s:1h,6s:2h
    * xFilesFactor = 1
    * aggregationMethod = avg
    * cacheRetention = 10s
    * metricsPerFile = 8
    * }}}
    */
  def parse(content: String): StorageSchemas = {
    val sectionPat = "^\\[(.+)\\]$".r
    var current: Option[String] = None
    val opts = scala.collection.mutable.LinkedHashMap.empty[String, scala.collection.mutable.Map[String, String]]
    content.linesIterator.map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#") && !l.startsWith(";")).foreach {
      case sectionPat(name) =>
        current = Some(name)
        opts.getOrElseUpdate(name, scala.collection.mutable.LinkedHashMap.empty)
      case line if line.contains("=") =>
        current.foreach { sec =>
          val Array(k, v) = line.split("=", 2).map(_.trim)
          opts(sec)(k.toLowerCase) = v
        }
      case _ => ()
    }
    val schemas = opts.iterator.map { case (name, o) =>
      val xff = o.get("xfilesfactor").map(_.toDouble).getOrElse(1.0)
      val archives = RetentionParser.validateArchives(
        RetentionParser.parseRetentions(
          o.getOrElse("retentions", throw InvalidConfig(s"schema '$name' missing retentions"))),
        xff)
      StorageSchema(
        name = name,
        pattern = o.getOrElse("pattern", throw InvalidConfig(s"schema '$name' missing pattern")).r,
        xFilesFactor = xff,
        aggregationMethod = AggMethod.byName(o.getOrElse("aggregationmethod", "average")),
        archives = archives,
        cacheRetention = o.get("cacheretention").map(RetentionParser.parseTimeStr).getOrElse(600L),
        metricsPerFile = o.get("metricsperfile").map(_.toInt).getOrElse(40),
      )
    }.toSeq
    new StorageSchemas(schemas)
  }

  def load(path: String): StorageSchemas =
    parse(new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8))
}
