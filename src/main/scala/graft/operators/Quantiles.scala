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

  /** Two-pass fixed-bin HISTOGRAM quantile estimator — the scale path for
    * groups where [[groupQuantiles]]' one-sort-per-group window is too much
    * (a 100 TB group cannot be row_number'ed). Pass 1: per-group (min, max,
    * n) — a narrow partial-aggregated scan. Pass 2: per-group bin counts
    * over `bins` fixed-width buckets — another partial-aggregated scan
    * whose shuffle carries at most `bins` rows per group per partition.
    * The estimate for percentile p is the UPPER EDGE of the first bin
    * whose cumulative count reaches rank ceil(p*n/100): error is bounded
    * by one bin width (max-min)/bins, with no per-group sort anywhere.
    *
    * Every arithmetic step is either integer (rank thresholds, counts) or
    * a fixed IEEE-double expression tree evaluated identically by Spark
    * and DuckDB (bin assignment, edge reconstruction) — deterministic
    * under any partitioning, unlike t-digest/approx_percentile whose
    * merge order changes results run to run.
    */
  def histogramQuantiles(df: DataFrame, groups: Seq[String], value: Column,
                         bins: Int, pcts: Seq[Int]): DataFrame = {
    require(bins > 1 && pcts.forall(p => p > 0 && p <= 100), s"bad bins/pcts")
    val gcols = groups.map(col)
    val stats = df.where(value.isNotNull).groupBy(gcols: _*)
      .agg(min(value).cast("double").as("__mn"),
        max(value).cast("double").as("__mx"), count(lit(1)).as("__n"))
    // bin = floor((v-mn)*bins/(mx-mn)) clamped to [0,bins-1]; the constant
    // group (mx=mn) degenerates to bin 0
    val binned = df.where(value.isNotNull).join(stats, groups)
      .withColumn("__bin",
        when(col("__mx") === col("__mn"), lit(0)).otherwise(
          least(lit(bins - 1),
            floor((value.cast("double") - col("__mn")) * lit(bins.toDouble)
              / (col("__mx") - col("__mn"))).cast("int"))))
      .groupBy((gcols :+ col("__bin")): _*)
      .agg(count(lit(1)).as("__c"), first(col("__mn")).as("__mn"),
        first(col("__mx")).as("__mx"), first(col("__n")).as("__n"))
    val wCum = Window.partitionBy(gcols: _*).orderBy(col("__bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = binned.withColumn("__cum", sum(col("__c")).over(wCum))
    val aggs = pcts.map { p =>
      // first bin whose cumulative count reaches the integer rank — min()
      // over bins that qualify; upper-edge reconstruction
      round(min(when(col("__cum") >= greatest(lit(1L), expr(s"($p * __n + 99) DIV 100")),
        col("__mn") + (col("__bin") + 1).cast("double")
          * (col("__mx") - col("__mn")) / lit(bins.toDouble))), 6).as(s"p$p")
    }
    cum.groupBy(gcols: _*)
      .agg(max(col("__n")).as("n"), aggs: _*)
      .select((gcols :+ col("n")) ++ pcts.map(p => col(s"p$p")): _*)
  }

  /** DuckDB mirror of [[histogramQuantiles]] over `src` (group col + `v`). */
  def histogramQuantilesSql(src: String, groupCol: String, bins: Int,
                            pcts: Seq[Int]): String = {
    val aggs = pcts.map { p =>
      s"""round(MIN(CASE WHEN cum >= GREATEST(1, ($p * n + 99) // 100)
         |  THEN mn + (bin + 1)::DOUBLE * (mx - mn) / ${bins}.0 END), 6) AS p$p"""
        .stripMargin.replace("\n", " ")
    }.mkString(",\n       ")
    s"""(WITH stats AS (
       |  SELECT $groupCol, MIN(v)::DOUBLE AS mn, MAX(v)::DOUBLE AS mx, COUNT(*) AS n
       |  FROM $src WHERE v IS NOT NULL GROUP BY 1),
       |binned AS (
       |  SELECT s.$groupCol,
       |         CASE WHEN s.mx = s.mn THEN 0
       |              ELSE LEAST($bins - 1,
       |                CAST(floor((t.v::DOUBLE - s.mn) * ${bins}.0 / (s.mx - s.mn)) AS INT))
       |         END AS bin,
       |         COUNT(*) AS c, ANY_VALUE(s.mn) AS mn, ANY_VALUE(s.mx) AS mx,
       |         ANY_VALUE(s.n) AS n
       |  FROM $src t JOIN stats s USING ($groupCol) WHERE t.v IS NOT NULL
       |  GROUP BY 1, 2),
       |cum AS (
       |  SELECT *, SUM(c) OVER (PARTITION BY $groupCol ORDER BY bin
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM binned)
       |SELECT $groupCol, MAX(n) AS n,
       |       $aggs
       |FROM cum GROUP BY $groupCol)""".stripMargin
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
