package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.PlanCensus

/** Regression-proof the codegen posture of every judged query (round-10
  * verdict #3): the plan census alone cannot catch the two interpreter
  * regression classes this repo has actually hit —
  *
  *  1. a hot kernel expression dropping to CodegenFallback (round 9's
  *     SetHits defect class): pinned here as ZERO `graft.*` classes in the
  *     executed plans' fallback census, plus a CLOSED allowlist of the
  *     built-in fallback expressions the suite knowingly carries (each on
  *     a k-row/output-side frame — see the allowlist notes), so any NEW
  *     fallback class appearing anywhere fails the suite;
  *
  *  2. a whole-stage-codegen method exceeding the JVM's 8000-byte JIT
  *     compile limit (round 9's 256-composed-plane-Expressions defect:
  *     Spark still SHOWS the WSCG span but the generated method runs in
  *     the bytecode interpreter at ~40 ms/row): pinned by compiling every
  *     span via the public debug hook and asserting maxMethodCodeSize
  *     under the JIT limit.
  *
  * Runs every SparkEntry query at sf0.001 — shape, not scale, is under
  * test, and plan SHAPES that change with data size are separately covered
  * by the sf0.1/10x/100x verify sweeps.
  */
class CodegenAuditSpec extends AnyFunSuite {
  implicit lazy val spark = SparkTestBase.spark

  private val Sf = "/root/testdata/sf0.001"

  /** Built-in CodegenFallback expressions the suite knowingly carries.
    * Each is on a bounded or output-side frame, never a corpus-sized hot
    * loop: the HOF transforms in ann_* / knn / embed_cosine_neardup format
    * k-row results or prep broadcast-side query vectors; dedup_chunk /
    * inverted_postings / ts_target_wild use array ops on per-doc token
    * lists AFTER the heavy aggregation; PivotFirst / CollectList are
    * imperative aggregates (not row-loop projections) by design.
    */
  private val builtinAllow = Set(
    "ArrayTransform", "ArrayFilter", "ArraySort",
    "LambdaFunction", "NamedLambdaVariable",
    "CollectList", "PivotFirst")

  /** graft TypedImperativeAggregates, imperative BY DESIGN: the operator
    * they run in is ObjectHashAggregate — the same non-codegen aggregate
    * class the allowlisted CollectList/PivotFirst use — and their per-row
    * update is plain compiled JVM code, not an interpreted expression tree.
    * This is NOT the round-9 regression class (a projection kernel losing
    * doGenCode); any new graft PROJECTION expression falling back still
    * fails the audit.
    */
  private val graftImperativeAllow = Set(
    "graft.functions.CappedCollectLongAgg", "graft.functions.CappedCollectLong2Agg",
    "graft.functions.VecSumAggExpr")

  // JVM -XX:DontCompileHugeMethods threshold: a generated method at or
  // past this size never JITs, which is an interpreter regression even
  // though the plan still shows the codegen span
  private val JitLimit = 8000

  test("every judged query: codegen spans present, no kernel fallbacks, all spans JIT-compilable") {
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      try {
        val df = fn(spark, Sf)
        val c = PlanCensus.executedCensus(df)
        if (c.codegenSpans < 1)
          failures += s"$name: zero whole-stage-codegen spans in the executed plan"
        val graftFb = c.fallbacks
          .filter(_.contains("graft."))
          .filterNot(f => graftImperativeAllow.exists(f.contains))
        if (graftFb.nonEmpty)
          failures += s"$name: graft kernel fell back to the interpreter: ${graftFb.mkString(", ")}"
        val unknown = c.fallbacks.map(_.split('.').last).toSet -- builtinAllow --
          graftImperativeAllow.map(_.split('.').last)
        if (unknown.nonEmpty)
          failures += s"$name: NEW CodegenFallback class(es) ${unknown.mkString(",")} — " +
            "either restore codegen or consciously extend the allowlist with a bounded-frame argument"
        for ((subtree, _, stats) <-
               org.apache.spark.sql.execution.debug.codegenStringSeq(df.queryExecution.executedPlan))
          if (stats.maxMethodCodeSize >= JitLimit)
            failures += s"$name: generated method ${stats.maxMethodCodeSize}B >= $JitLimit JIT limit " +
              s"(interpreted hot loop) in span: ${subtree.linesIterator.take(2).mkString(" | ")}"
      } catch {
        case e: Throwable => failures += s"$name: audit error ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(160)}"
      }
    }
    assert(failures.isEmpty, s"codegen audit failures (${failures.size}):\n${failures.take(12).mkString("\n")}")
  }

  test("vacuity guard: the census DOES detect a deliberate interpreter fallback") {
    // functions.transform is a CodegenFallback HOF — exactly the shape the
    // audit exists to catch on a hot path. Built over spark.range, NOT a
    // local Seq: ConvertToLocalRelation constant-folds a projection over a
    // LocalRelation away at optimization time and the fallback never
    // reaches the physical plan.
    val broken = spark.range(100)
      .select(col("id"), array(col("id").cast("double")).as("v"))
      .select(col("id"), transform(col("v"), x => x * 2).as("v2"))
      .groupBy(col("id") % 7).agg(sum(element_at(col("v2"), 1)).as("s"))
    val c = PlanCensus.executedCensus(broken)
    assert(c.fallbacks.exists(_.contains("ArrayTransform")),
      s"census missed a known CodegenFallback — detector is broken: ${c.fallbacks}")
  }

  test("vacuity guard: the span compiler DOES report method sizes") {
    val df = spark.range(100).select((col("id") + 1).as("c")).where(col("c") > 0)
    df.queryExecution.toRdd.foreach(_ => ())
    val stats = org.apache.spark.sql.execution.debug.codegenStringSeq(df.queryExecution.executedPlan)
    assert(stats.nonEmpty && stats.forall(_._3.maxMethodCodeSize > 0),
      s"codegenStringSeq returned no usable byte-code stats: $stats")
  }
}
