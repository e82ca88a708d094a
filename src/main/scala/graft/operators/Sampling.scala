package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines. `df.sample()` draws
  * from a per-partition RNG — resplitting the input changes the sample, and
  * no SQL oracle can reproduce it. Hash-based sampling (keep iff
  * h(salt||id) mod den < rate*den) is reproducible across engines and runs,
  * stable under repartitioning, executes as a narrow codegen'd filter (no
  * shuffle), and two samples with the same salt are consistent across
  * tables — the property joins need at 100 TB.
  */
object Sampling {

  val Den = 10000L

  def bucketOf(idCol: Column, salt: String): Column =
    pmod(Dedup.h32(concat(lit(salt + ":"), idCol.cast("string"))), lit(Den))

  def bucketOfSql(idSql: String, salt: String): String =
    s"('0x'||substr(md5('$salt:' || CAST($idSql AS VARCHAR)),1,8))::BIGINT % $Den"

  /** Stratified sample: per-stratum keep rate, unknown strata use
    * `defaultRate`. Rates are exact out of Den (rate 0.25 keeps buckets
    * 0..2499).
    */
  def stratified(df: DataFrame, idCol: Column, stratumCol: Column,
                 rates: Seq[(String, Double)], defaultRate: Double,
                 salt: String = "smpl"): DataFrame = {
    val thresh = rates.foldLeft(lit((defaultRate * Den).toLong)) {
      case (acc, (k, r)) => when(stratumCol === k, lit((r * Den).toLong)).otherwise(acc)
    }
    df.where(bucketOf(idCol, salt) < thresh)
  }

  /** Weighted sample: row kept with probability min(1, weight/scale) —
    * e.g. length-proportional document sampling. Same hash-threshold
    * machinery (integer threshold, exact, repartition-stable); rows with
    * weight >= scale always survive.
    */
  def weighted(df: DataFrame, idCol: Column, weightCol: Column, scale: Long,
               salt: String = "wsmpl"): DataFrame = {
    // threshold = floor(weight * Den / scale) capped at Den; the double
    // division is exact for weight*Den < 2^53 and cast truncates = floor
    // for non-negative weights, matching DuckDB's // integer division
    val thresh = least(lit(Den),
      (weightCol.cast("long") * lit(Den) / lit(scale)).cast("long"))
    df.where(bucketOf(idCol, salt) < thresh)
  }

  def weightedSql(idSql: String, weightSql: String, scale: Long,
                  salt: String = "wsmpl"): String =
    s"${bucketOfSql(idSql, salt)} < LEAST($Den, CAST($weightSql AS BIGINT) * $Den // $scale)"

  /** Rebalance to a uniform group mix (e.g. per-language corpus balancing):
    * every group is downsampled, in expectation, to the size of the
    * smallest group, via the same deterministic hash threshold —
    * thresh_g = floor(min_count * Den / count_g) out of Den. Two tiny
    * aggregates (one row per group, one global min) broadcast back onto the
    * scan, so the data path stays ONE narrow filter: nothing about the
    * corpus itself shuffles, which is what makes mixture control affordable
    * at 100 TB. The threshold's double division is exact while
    * min_count * Den < 2^53 and the long cast truncates = floor for
    * non-negative counts, matching DuckDB's // integer division.
    */
  def rebalanceUniform(df: DataFrame, idCol: Column, groupCol: Column,
                       salt: String = "rebal"): DataFrame = {
    val counts = df.groupBy(groupCol.as("__g")).agg(count(lit(1)).as("__n"))
    val thresh = counts
      .crossJoin(broadcast(counts.agg(min(col("__n")).as("__mn"))))
      .select(col("__g"), (col("__mn") * lit(Den) / col("__n")).cast("long").as("__thresh"))
    df.join(broadcast(thresh), groupCol === col("__g"))
      .where(bucketOf(idCol, salt) < col("__thresh"))
      .drop("__g", "__thresh")
  }

  /** Temperature-smoothed mixture rebalance (the multilingual-pretraining
    * mix: sampling share ∝ p^(1/T)): each group keeps, in expectation,
    * rate (n_min/n_g)^(1/2) — T=2, the common smoothing that upweights
    * small languages less brutally than full uniform rebalance
    * ([[rebalanceUniform]] is the T=1 endpoint, keep-everything is T=∞).
    *
    * The exponent is fixed at 1/2 ON PURPOSE: IEEE-754 requires sqrt (and
    * division) to be CORRECTLY ROUNDED, so `floor(Den*sqrt(mn/n))` is
    * bit-identical on every engine — `pow(x, alpha)` carries no such
    * guarantee and can land on either side of an integer floor boundary,
    * which a hash-threshold gate turns into a row-level diff. Other
    * temperatures need a rational-power ladder of sqrt calls or a
    * pre-rounded threshold table.
    *
    * Same cost shape as [[rebalanceUniform]]: two bounded broadcast
    * aggregates, corpus path stays ONE narrow filter.
    */
  def rebalanceTemperature(df: DataFrame, idCol: Column, groupCol: Column,
                           salt: String = "tempr"): DataFrame = {
    val counts = df.groupBy(groupCol.as("__g")).agg(count(lit(1)).as("__n"))
    val thresh = counts
      .crossJoin(broadcast(counts.agg(min(col("__n")).as("__mn"))))
      .select(col("__g"),
        floor(lit(Den) * sqrt(col("__mn").cast("double") / col("__n")))
          .cast("long").as("__thresh"))
    df.join(broadcast(thresh), groupCol === col("__g"))
      .where(bucketOf(idCol, salt) < col("__thresh"))
      .drop("__g", "__thresh")
  }

  /** Exactly-k-per-group deterministic sample (reservoir analog): rank each
    * row within its group by the salted hash (id tiebreak) and keep the k
    * smallest — a uniform without-replacement draw that is reproducible
    * across runs, partitionings, and engines. One shuffle on the group key;
    * the rank window never sees more than a group's rows. For severely
    * hot groups at 100 TB, pre-filter with `stratified` at a rate that
    * leaves O(k log k) survivors per group, then rank those.
    */
  def groupTopK(df: DataFrame, idCol: Column, groupCol: Column, k: Int,
                salt: String = "gtopk"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(bucketOf(idCol, salt), idCol)
    df.withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= k)
      .drop("__rk")
  }
}
