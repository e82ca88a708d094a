package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.execution.{SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeLike, ReusedExchangeExec, ShuffleExchangeLike}
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, SortMergeJoinExec}

/** One query's structural plan facts, counted over the EXECUTED tree.
  *
  * @param fallbacks every CodegenFallback expression found, as
  *   "nodeName: ExpressionClass" — the round-9 regression class (a hot
  *   kernel dropping to the interpreter) shows up here as a `graft.*`
  *   class name, which CodegenAuditSpec pins to zero.
  */
final case class Census(
    shuffles: Int,
    broadcastJoins: Int,
    sortMergeJoins: Int,
    codegenSpans: Int,
    fallbacks: Seq[String])

/** Census a query plan by WALKING the executed physical tree, not by
  * grepping explain text (round-10 verdict #3: the pre-execution formatted
  * explain carries no codegen ids under AQE, so the old text census read
  * `wscg = 0` for ~90/95 queries and could not catch an
  * interpreter-fallback regression; the post-execution text overcounts
  * ~3x instead, because AQE explain prints Initial AND Final sections and
  * repeats shared cached subtrees).
  *
  * Counting rules, chosen to mean "what actually executes once":
  *  - nodes are deduplicated by object IDENTITY, so a persisted subtree
  *    referenced from several scans counts once;
  *  - AdaptiveSparkPlanExec / QueryStageExec are transparent wrappers —
  *    the census descends into their resolved plan;
  *  - ReusedExchangeExec counts nothing (the original exchange already
  *    counted where it executes);
  *  - InMemoryTableScanExec descends into the cached plan (its build cost
  *    is part of the query the first time) and still counts its own node's
  *    expressions.
  */
object PlanCensus {

  /** Execute the frame's OWN QueryExecution (a noop `df.write` would build
    * a separate one and leave this tree unfinalized under AQE), then
    * census the final executed plan.
    */
  def executedCensus(df: DataFrame): Census = {
    df.queryExecution.toRdd.foreach(_ => ())
    censusOf(df.queryExecution.executedPlan)
  }

  /** Count hash-partitioning shuffle exchanges that execute OUTSIDE any
    * cached build lineage — the exchanges a consumer of the cached stage
    * pays per run. Unlike [[censusOf]], the walk STOPS at
    * InMemoryTableScanExec: the one-time repartition that established the
    * cached partitioning lives in `relation.cachedPlan` and is exactly what
    * the single-exchange plan pins mean to exclude. A tree walk (vs
    * splitting the explain string at the first "InMemoryRelation") sees
    * every consumer branch — tree printing is depth-first, so branches that
    * PRINT after the first cached scan (e.g. the right side of a self-join)
    * still execute outside it and must be counted (round-11 ADVICE).
    */
  def consumerHashShuffles(root: SparkPlan): Int = {
    val seen = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[SparkPlan, java.lang.Boolean]())
    var n = 0
    def walk(p: SparkPlan): Unit = {
      if (p == null || !seen.add(p)) return
      p match {
        // AQE wrappers carry subqueries of their own (a DPP/scalar subquery
        // planned at the wrapper level holds a nested adaptive plan) — an
        // early return that only descends the main plan would skip any hash
        // exchange inside them (round-12 ADVICE)
        case a: AdaptiveSparkPlanExec =>
          walk(a.executedPlan); a.subqueries.foreach(walk); return
        case q: QueryStageExec => walk(q.plan); q.subqueries.foreach(walk); return
        case _: ReusedExchangeExec => return
        case _: InMemoryTableScanExec => return
        case s: ShuffleExchangeLike =>
          s.outputPartitioning match {
            case _: org.apache.spark.sql.catalyst.plans.physical.HashPartitioning => n += 1
            case _ => // range (orderBy) / single-partition exchanges are not the audited class
          }
        case _ =>
      }
      p.children.foreach(walk)
      p.subqueries.foreach(walk)
    }
    walk(root)
    n
  }

  /** True when the executed tree contains a cached scan — the audits above
    * use it to prove they are not vacuous (nothing cached = nothing pruned).
    */
  def hasInMemoryScan(root: SparkPlan): Boolean = {
    val seen = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[SparkPlan, java.lang.Boolean]())
    var found = false
    def walk(p: SparkPlan): Unit = {
      if (p == null || found || !seen.add(p)) return
      p match {
        case a: AdaptiveSparkPlanExec =>
          walk(a.executedPlan); a.subqueries.foreach(walk)
        case q: QueryStageExec => walk(q.plan); q.subqueries.foreach(walk)
        case _: InMemoryTableScanExec => found = true
        case _ =>
          p.children.foreach(walk)
          p.subqueries.foreach(walk)
      }
    }
    walk(root)
    found
  }

  def censusOf(root: SparkPlan): Census = {
    val seen = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[SparkPlan, java.lang.Boolean]())
    var shuffles, bcastJoins, smj, spans = 0
    val fallbacks = scala.collection.mutable.ArrayBuffer.empty[String]

    def walkExpr(e: Expression, at: String): Unit = {
      e match {
        case _: CodegenFallback => fallbacks += s"$at: ${e.getClass.getName}"
        case _ =>
      }
      e.children.foreach(walkExpr(_, at))
    }

    def walk(p: SparkPlan): Unit = {
      if (p == null || !seen.add(p)) return
      p match {
        case a: AdaptiveSparkPlanExec =>
          walk(a.executedPlan); a.subqueries.foreach(walk); return
        case q: QueryStageExec => walk(q.plan); q.subqueries.foreach(walk); return
        case _: ReusedExchangeExec => return
        case _: WholeStageCodegenExec => spans += 1
        case _: ShuffleExchangeLike => shuffles += 1
        case _: BroadcastHashJoinExec | _: BroadcastNestedLoopJoinExec => bcastJoins += 1
        case _: SortMergeJoinExec => smj += 1
        case m: InMemoryTableScanExec => walk(m.relation.cachedPlan)
        case _: BroadcastExchangeLike => // shape visible via the join count
        case _ =>
      }
      p.expressions.foreach(walkExpr(_, p.nodeName))
      p.children.foreach(walk)
      p.subqueries.foreach(walk)
    }

    walk(root)
    Census(shuffles, bcastJoins, smj, spans, fallbacks.toSeq)
  }
}
