package graft.core

/** Retention / archive-cascade configuration.
  *
  * Semantics re-derived from the reference TSDB's retention parser and
  * archive validation (reference: kenshin/storage.py:130-270). An archive is
  * one resolution level of a downsample cascade: `secondsPerPoint` is the
  * tumbling-window width, `points` the ring length; `retention = spp * points`
  * is how far back that level answers queries.
  */
final case class Archive(secondsPerPoint: Int, points: Int) {
  require(secondsPerPoint > 0, s"secondsPerPoint must be > 0: $secondsPerPoint")
  require(points > 0, s"points must be > 0: $points")
  def retention: Long = secondsPerPoint.toLong * points
}

final case class InvalidTime(msg: String) extends IllegalArgumentException(msg)
final case class InvalidConfig(msg: String) extends IllegalArgumentException(msg)

object RetentionParser {
  /** Unit table matches the reference (kenshin/storage.py:131-138): note
    * years = 365 d, no months. Prefix matching ("h" -> hours, "mi" ->
    * minutes) per get_time_unit_name (kenshin/storage.py:141-146).
    */
  private val timeUnits: Seq[(String, Long)] = Seq(
    "seconds" -> 1L,
    "minutes" -> 60L,
    "hours"   -> 3600L,
    "days"    -> 86400L,
    "weeks"   -> 86400L * 7,
    "years"   -> 86400L * 365,
  )

  private val pat = "^(\\d+)([a-z]+)$".r

  def unitSeconds(unit: String): Long =
    timeUnits.collectFirst { case (name, secs) if name.startsWith(unit) => secs }
      .getOrElse(throw InvalidTime(s"Invalid time unit: '$unit'"))

  /** "12h" -> 43200; bare digits are seconds (kenshin/storage.py:148-169). */
  def parseTimeStr(s: String): Long =
    if (s.nonEmpty && s.forall(_.isDigit)) s.toLong
    else s match {
      case pat(num, unit) => num.toLong * unitSeconds(unit)
      case _              => throw InvalidTime(s"Invalid retention specification '$s'")
    }

  /** "60s:2d" -> Archive(60, 2880). The count may itself be a duration, in
    * which case points = duration / precision (kenshin/storage.py:171-181).
    */
  def parseRetentionDef(retentionDef: String): Archive = {
    val parts = retentionDef.trim.split(":", 2)
    require(parts.length == 2, s"retention def must be 'precision:count': '$retentionDef'")
    val precision = parseTimeStr(parts(0))
    val cnt =
      if (parts(1).nonEmpty && parts(1).forall(_.isDigit)) parts(1).toLong
      else parseTimeStr(parts(1)) / precision
    Archive(precision.toInt, cnt.toInt)
  }

  /** "10s:12h,60s:2d,..." -> ordered cascade. */
  def parseRetentions(s: String): Seq[Archive] =
    s.split(",").toIndexedSeq.map(parseRetentionDef)

  /** The five cascade validation rules (kenshin/storage.py:219-270):
    * 1. at least one archive; 2. strictly increasing precision (no dupes);
    * 3. even divisibility of coarser step by finer step; 4. strictly
    * increasing retention; 5. each level holds >= xff * pointsPerConsolidation
    * points (enough buffered points to batch-propagate to the next level).
    * Returns the cascade sorted finest-first.
    */
  def validateArchives(archives: Seq[Archive], xff: Double): Seq[Archive] = {
    if (archives.isEmpty) throw InvalidConfig("must specify at least one archive config")
    val sorted = archives.sortBy(_.secondsPerPoint)
    sorted.sliding(2).foreach {
      case Seq(a, b) =>
        if (a.secondsPerPoint >= b.secondsPerPoint)
          throw InvalidConfig(s"two same precision config: $a and $b")
        if (b.secondsPerPoint % a.secondsPerPoint != 0)
          throw InvalidConfig(
            s"higher precision must evenly divide lower precision: ${a.secondsPerPoint} and ${b.secondsPerPoint}")
        if (b.retention <= a.retention)
          throw InvalidConfig(
            s"lower precision archive must cover larger time interval: $a and $b")
        val pointsPerConsolidation = b.secondsPerPoint / a.secondsPerPoint
        if (a.points / xff < pointsPerConsolidation)
          throw InvalidConfig(
            s"each archive must have at least enough points to consolidate to the next: $a -> $b xff=$xff")
      case _ => ()
    }
    sorted
  }
}
