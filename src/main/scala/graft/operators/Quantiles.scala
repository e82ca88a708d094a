package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact grouped quantiles (discrete / "lower" definition): the p-th
  * percentile of a group of n values is the value at 1-indexed rank
  * max(1, ceil(p*n/100)) in sort order. One window shuffle on the group
  * keys, then a conditional-aggregation pivot — no approx sketch, no
  * per-group collect.
  *
  * Rank thresholds are computed in integer arithmetic ((p*n + 99) DIV 100):
  * a float `ceil(0.95 * n)` is engine-dependent when p/100 has no exact
  * binary form (0.95*20 = 19.000000000000000532 in IEEE double, ceil 20 —
  * while exact arithmetic gives 19).
  *
  * For percentile estimates over truly huge groups where one sort-shuffle
  * per group is too much, Spark's approx_percentile (t-digest) is the
  * escape hatch; this operator is the exact, hash-portable path.
  */
object Quantiles {

  /** Per-group discrete quantiles at integer percentiles `pcts` (0 < p <=
    * 100), emitted as one column `p<pct>` each.
    */
  def groupQuantiles(df: DataFrame, groups: Seq[String], value: Column,
                     pcts: Seq[Int]): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p > 0 && p <= 100), s"bad pcts: $pcts")
    val wOrd = Window.partitionBy(groups.map(col): _*).orderBy(value)
    val wAll = Window.partitionBy(groups.map(col): _*)
    // NULLs are excluded from the population: they would inflate n and —
    // worse — sort first in Spark but last in DuckDB, so any NULL input
    // silently skews the ranks AND breaks cross-engine parity
    val ranked = df
      .where(value.isNotNull)
      .withColumn("__v", value)
      .withColumn("__rn", row_number().over(wOrd))
      .withColumn("__n", count(lit(1)).over(wAll))
    val aggs = pcts.map { p =>
      max(when(col("__rn") === greatest(lit(1L), expr(s"($p * __n + 99) DIV 100")),
        col("__v"))).as(s"p$p")
    }
    ranked.groupBy(groups.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** DuckDB mirror over `src` (must expose the group column and `v`). */
  def groupQuantilesSql(src: String, groupCol: String, pcts: Seq[Int]): String = {
    val aggs = pcts.map { p =>
      s"MAX(CASE WHEN rn = GREATEST(1, ($p * n + 99) // 100) THEN v END) AS p$p"
    }.mkString(",\n       ")
    s"""(WITH ranked AS (
       |  SELECT $groupCol, v,
       |         ROW_NUMBER() OVER (PARTITION BY $groupCol ORDER BY v) AS rn,
       |         COUNT(*) OVER (PARTITION BY $groupCol) AS n
       |  FROM $src WHERE v IS NOT NULL)
       |SELECT $groupCol,
       |       $aggs
       |FROM ranked GROUP BY $groupCol)""".stripMargin
  }
}
