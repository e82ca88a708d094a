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

  /** Every same-table rule in ONE scan + ONE aggregate (r14): pk-uniqueness
    * counts and predicate violation sums are all aggregates over the same
    * rows, so composing them as separate [[pkUnique]]/[[predicate]] frames
    * pays one full table scan PER RULE — the union is five independent
    * aggregate plans, not a shared pass. This emits one row per rule from a
    * single aggregate via a literal-struct explode; results are identical
    * to the per-rule frames (exact integer counts either way).
    */
  def fused(df: DataFrame, pks: Seq[(String, Seq[String])],
            preds: Seq[(String, Column)]): DataFrame = {
    val pkAggs = pks.map { case (rule, keys) =>
      val nonNull = keys.map(col(_).isNotNull).reduce(_ && _)
      (rule, (count(lit(1)) - count_distinct(when(nonNull,
        struct(keys.map(col): _*)))).as(s"__v_$rule"))
    }
    val predAggs = preds.map { case (rule, ok) =>
      (rule, coalesce(sum(when(ok, 0L).otherwise(1L)), lit(0L)).as(s"__v_$rule"))
    }
    val all = pkAggs ++ predAggs
    df.agg(count(lit(1)).as("__n"), all.map(_._2): _*)
      .select(explode(array(all.map { case (rule, _) =>
        struct(lit(rule).as("rule"), col("__n").as("n_checked"),
          col(s"__v_$rule").as("n_violations"))
      }: _*)).as("__r"))
      .select(col("__r.rule"), col("__r.n_checked"), col("__r.n_violations"))
  }

  /** Referential coverage FUSED with same-scan predicate rules over the
    * child (r14): one pass over the child computes the fk orphan count, the
    * child total, and every predicate's violations. The anti-join becomes a
    * left join against the DISTINCT parent keys (distinct-ing first keeps
    * the row count stable where a duplicated parent key would multiply;
    * its aggregate rides the same exchange the join needs anyway) plus a
    * conditional count — the same orphan set [[fkCovered]] counts, without
    * re-scanning the child once per extra rule.
    */
  def fkCoveredFused(child: DataFrame, parent: DataFrame, fkRule: String,
                     childKey: String, parentKey: String,
                     preds: Seq[(String, Column)]): DataFrame = {
    val pkeys = parent.select(col(parentKey).as(childKey)).distinct()
      .withColumn("__hit", lit(true))
    val fkAgg = (fkRule,
      coalesce(sum(when(col("__hit").isNull, 1L).otherwise(0L)), lit(0L))
        .as(s"__v_$fkRule"))
    val predAggs = preds.map { case (rule, ok) =>
      (rule, coalesce(sum(when(ok, 0L).otherwise(1L)), lit(0L)).as(s"__v_$rule"))
    }
    val all = fkAgg +: predAggs
    child.join(pkeys, Seq(childKey), "left")
      .agg(count(lit(1)).as("__n"), all.map(_._2): _*)
      .select(explode(array(all.map { case (rule, _) =>
        struct(lit(rule).as("rule"), col("__n").as("n_checked"),
          col(s"__v_$rule").as("n_violations"))
      }: _*)).as("__r"))
      .select(col("__r.rule"), col("__r.n_checked"), col("__r.n_violations"))
  }
}
