package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd membership counter: how many elements of a string array are in
  * a fixed word set (multiplicity preserved — every occurrence counts).
  *
  * This is the hot kernel of the text-analysis operators (stopword ratios,
  * language-ID marker scores). The higher-order alternative
  * `size(filter(toks, t => array_contains(lit(words), t)))` is a
  * CodegenFallback: the lambda is interpreted per token with boxed
  * dispatch, and equal HOF subtrees get no CSE — measured 0.24 s per pass
  * over a 5k-doc corpus vs microseconds here. The word set is embedded as
  * a hashed reference object, so membership is O(1) per token regardless
  * of list size, inside whole-stage codegen.
  */
object SetHits {
  def setHits(arr: Column, words: Seq[String]): Column =
    ColumnBridge.column(SetHitsExpr(ColumnBridge.expression(arr), words))

  def count(a: ArrayData, set: java.util.HashSet[UTF8String]): Int = {
    val n = a.numElements()
    var c = 0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && set.contains(a.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }
}

case class SetHitsExpr(child: Expression, words: Seq[String]) extends UnaryExpression {
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"set_hits requires array<string> input, got $other")
    }

  @transient private lazy val wordSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.size * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override def nullSafeEval(a: Any): Any =
    SetHits.count(a.asInstanceOf[ArrayData], wordSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("wordSet", wordSet, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      s"""
         |int $n = $a.numElements();
         |int $c = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && $setRef.contains($a.getUTF8String($i))) $c++;
         |}
         |${ev.value} = $c;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "set_hits"
}
