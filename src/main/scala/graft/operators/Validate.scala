package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality validation — the constraint-report pass a
  * pipeline runs before promoting a snapshot (primary-key uniqueness,
  * referential coverage, null and range bounds). Each rule compiles to ONE
  * aggregate or anti-join over the table it checks — there is no generic
  * row-by-row rule engine, so a 100 TB validation run costs a handful of
  * scans with map-side partial aggregation, and rules over the same table
  * share a scan when composed with [[report]].
  *
  * Every rule yields (rule, n_checked, n_violations): counts are exact
  * integers, so the report is bit-stable across engines and partitionings
  * by construction.
  */
object Validate {

  /** Primary-key uniqueness: violations = rows beyond the first per key
    * (total − distinct keys). Nulls in any key column count as violations
    * (a NULL pk is never a valid identity).
    */
  def pkUnique(df: DataFrame, rule: String, keys: Seq[String]): DataFrame = {
    val nonNull = keys.map(col(_).isNotNull).reduce(_ && _)
    df.agg(count(lit(1)).as("n_checked"),
        (count(lit(1)) - count_distinct(when(nonNull,
          struct(keys.map(col): _*)))).as("n_violations"))
      .select(lit(rule).as("rule"), col("n_checked"), col("n_violations"))
  }

  /** Referential coverage: child keys with no parent (left-anti count). */
  def fkCovered(child: DataFrame, parent: DataFrame, rule: String,
                childKey: String, parentKey: String): DataFrame = {
    val total = child.agg(count(lit(1)).as("n_checked"))
    val orphans = child.select(col(childKey))
      .join(parent.select(col(parentKey).as(childKey)), Seq(childKey), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
    total.crossJoin(orphans)
      .select(lit(rule).as("rule"), col("n_checked"), col("n_violations"))
  }

  /** Generic predicate rule: violations = rows where `ok` is not true
    * (NULL counts as a violation — an unevaluable constraint is not a
    * passing one). SUM over zero rows is NULL, so the empty-table case is
    * coalesced to 0 — an empty-but-valid table must report pass, not a
    * NULL pass flag.
    */
  def predicate(df: DataFrame, rule: String, ok: Column): DataFrame =
    df.agg(count(lit(1)).as("n_checked"),
        coalesce(sum(when(ok, 0L).otherwise(1L)), lit(0L)).as("n_violations"))
      .select(lit(rule).as("rule"), col("n_checked"), col("n_violations"))

  /** Stack rule results into one report with a pass flag. */
  def report(rules: Seq[DataFrame]): DataFrame =
    rules.reduce(_.unionByName(_))
      .withColumn("pass", (col("n_violations") === 0L).cast("int"))
}
