package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd per-document text kernels for the quality-scoring operator.
  *
  * `textStats` folds the three token statistics the quality score needs
  * (word count, distinct-word count, stopword hits) into ONE pass over the
  * token array — the composable alternatives cost three passes
  * (size / array_distinct / a filter lambda), and the filter lambda runs
  * interpreted (HOFs are CodegenFallback). `charClassCount` replaces
  * `size(regexp_extract_all(text, '[^a-zA-Z0-9\s]'))` with a direct
  * codepoint scan — the character classes are all-ASCII, so a UTF-8
  * leading-byte walk counts exactly the codepoints the regex would match
  * (any non-ASCII codepoint is in the negated class by definition).
  */
object TextKernels {
  def textStats(toks: Column, stopwords: Seq[String]): Column =
    ColumnBridge.column(TextStatsExpr(ColumnBridge.expression(toks), stopwords))

  def charClassCount(text: Column): Column =
    ColumnBridge.column(CharClassCountExpr(ColumnBridge.expression(text)))

  def wordShingles(toks: Column, w: Int): Column =
    ColumnBridge.column(ShinglesExpr(ColumnBridge.expression(toks), w))

  def repetitionStats(toks: Column): Column =
    ColumnBridge.column(RepStatsExpr(ColumnBridge.expression(toks)))

  def stats(a: ArrayData, stopSet: java.util.HashSet[UTF8String]): Array[Int] = {
    val n = a.numElements()
    val seen = new java.util.HashSet[UTF8String](n * 2)
    var stop = 0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val t = a.getUTF8String(i)
        if (stopSet.contains(t)) stop += 1
        seen.add(t)
        ()
      }
      i += 1
    }
    Array(n, seen.size, stop)
  }

  private val Space = UTF8String.fromString(" ")

  /** Distinct word w-shingles (space-joined), first-occurrence order —
    * one pass, one hash set. The composable form
    * `array_distinct(transform(sequence(...), i => concat_ws(slice(...))))`
    * runs the lambda INTERPRETED per shingle (HOFs are CodegenFallback)
    * with a slice allocation each — this kernel is the shared front of
    * every shingle-based near-dup operator.
    */
  def shingleSet(a: ArrayData, w: Int): ArrayData = {
    val n = a.numElements()
    if (n < w)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]((n - w + 1) * 2)
    var i = 0
    while (i <= n - w) {
      val parts = new Array[UTF8String](w)
      var j = 0
      while (j < w) { parts(j) = a.getUTF8String(i + j); j += 1 }
      seen.add(UTF8String.concatWs(Space, parts: _*))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      seen.toArray.asInstanceOf[Array[AnyRef]])
  }

  /** Per-document n-gram repetition statistics (the Gopher-style repetition
    * quality signals): for gram widths 2 and 3 over the token array, the
    * total gram count (with multiplicity), the count of the most frequent
    * gram, and the number of gram occurrences belonging to grams that occur
    * more than once. One pass and one count map per width — the composable
    * form (explode n-grams, groupBy(doc, gram), groupBy(doc)) pays two
    * shuffles keyed on every gram occurrence of the corpus; this kernel
    * keeps the whole signal a narrow projection. Only counts are returned
    * (never "the" top gram), so ties need no ordering rule.
    */
  def repStats(a: ArrayData): Array[Int] = {
    val n = a.numElements()
    val out = new Array[Int](6)
    var w = 2
    while (w <= 3) {
      val base = (w - 2) * 3
      if (n >= w) {
        val m = new java.util.HashMap[UTF8String, Integer]((n - w + 1) * 2)
        var i = 0
        while (i <= n - w) {
          val parts = new Array[UTF8String](w)
          var j = 0
          while (j < w) { parts(j) = a.getUTF8String(i + j); j += 1 }
          m.merge(UTF8String.concatWs(Space, parts: _*), Integer.valueOf(1),
            (x: Integer, y: Integer) => Integer.valueOf(x.intValue + y.intValue))
          i += 1
        }
        var top = 0
        var dup = 0
        val it = m.values().iterator()
        while (it.hasNext) {
          val c = it.next().intValue
          if (c > top) top = c
          if (c > 1) dup += c
        }
        out(base) = n - w + 1
        out(base + 1) = top
        out(base + 2) = dup
      }
      w += 1
    }
    out
  }

  /** Codepoints outside [a-zA-Z0-9] ∪ Java regex \s ([ \t\n\x0B\f\r]).
    * UTF-8 continuation bytes (10xxxxxx) are skipped so multi-byte
    * codepoints count once (always as a hit — they are non-ASCII).
    */
  def punctCount(s: UTF8String): Int = {
    val n = s.numBytes()
    var c = 0
    var i = 0
    while (i < n) {
      val b = s.getByte(i)
      if ((b & 0xc0) != 0x80) { // not a continuation byte -> one codepoint
        val isWord = (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') ||
          (b >= '0' && b <= '9')
        val isWs = b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'
        if (!isWord && !isWs) c += 1
      }
      i += 1
    }
    c
  }
}

case class TextStatsExpr(child: Expression, stopwords: Seq[String]) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_words", IntegerType, nullable = false),
    StructField("n_uniq_words", IntegerType, nullable = false),
    StructField("n_stopwords", IntegerType, nullable = false)))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"text_stats requires array<string> input, got $other")
    }

  @transient private lazy val stopSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](stopwords.size * 2)
    stopwords.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override def nullSafeEval(a: Any): Any = {
    val r = TextKernels.stats(a.asInstanceOf[ArrayData], stopSet)
    org.apache.spark.sql.catalyst.InternalRow(r(0), r(1), r(2))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("stopSet", stopSet, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, a => {
      val r = ctx.freshName("r")
      s"""
         |int[] $r = graft.functions.TextKernels.stats($a, $setRef);
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[]{$r[0], $r[1], $r[2]});
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "text_stats"
}

case class ShinglesExpr(child: Expression, w: Int) extends UnaryExpression {
  require(w >= 1, "shingle width must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"word_shingles requires array<string> input, got $other")
    }

  override def nullSafeEval(a: Any): Any =
    TextKernels.shingleSet(a.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.TextKernels.shingleSet($a, $w)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "word_shingles"
}

case class RepStatsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_2grams", IntegerType, nullable = false),
    StructField("top2_count", IntegerType, nullable = false),
    StructField("dup2_count", IntegerType, nullable = false),
    StructField("n_3grams", IntegerType, nullable = false),
    StructField("top3_count", IntegerType, nullable = false),
    StructField("dup3_count", IntegerType, nullable = false)))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"repetition_stats requires array<string> input, got $other")
    }

  override def nullSafeEval(a: Any): Any = {
    val r = TextKernels.repStats(a.asInstanceOf[ArrayData])
    org.apache.spark.sql.catalyst.InternalRow(r(0), r(1), r(2), r(3), r(4), r(5))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val r = ctx.freshName("r")
      s"""
         |int[] $r = graft.functions.TextKernels.repStats($a);
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[]{$r[0], $r[1], $r[2], $r[3], $r[4], $r[5]});
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "repetition_stats"
}

case class CharClassCountExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"punct_count requires string input, got ${child.dataType}")

  override def nullSafeEval(s: Any): Any =
    TextKernels.punctCount(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.TextKernels.punctCount($s)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "punct_count"
}
