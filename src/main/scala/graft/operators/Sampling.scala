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
}
