package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Codegen'd vector kernels for the similarity operators. The higher-order
  * alternative (`aggregate(zip_with(a,b,*),0,+)`) allocates an intermediate
  * array per pair — at N^2 pair counts that dominates the runtime. These
  * loop directly over the unsafe array data inside whole-stage codegen.
  *
  * Both accumulate strictly left-to-right (same order as a sequential fold
  * and as DuckDB's list kernels), so results stay bit-identical to the
  * oracle SQL.
  */
object VecOps {
  def vecDot(a: Column, b: Column): Column =
    ColumnBridge.column(VecDotExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def vecNorm(a: Column): Column =
    ColumnBridge.column(VecNormExpr(ColumnBridge.expression(a)))

  // interpreted fallbacks (also used by nullSafeEval)
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }

  def norm(a: ArrayData): Double = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { val x = a.getDouble(i); s += x * x; i += 1 }
    math.sqrt(s)
  }

  /** All-tables sign-LSH bucket ids (see [[LshBucketsExpr]]): one static
    * JIT-compiled loop, arithmetic bit-identical to the per-plane
    * VecDotExpr composition it replaces.
    */
  def lshBuckets(v: ArrayData, planes: Array[Array[Array[Double]]]): Array[Long] = {
    val out = new Array[Long](planes.length)
    var t = 0
    while (t < planes.length) {
      val tbl = planes(t)
      var bucket = 0L
      var p = 0
      while (p < tbl.length) {
        val plane = tbl(p)
        val n = math.min(v.numElements(), plane.length)
        var s = 0.0
        var i = 0
        while (i < n) { s += v.getDouble(i) * plane(i); i += 1 }
        if (s > 0) bucket += 1L << p
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    out
  }

  /** Column form of [[lshBuckets]]: `tables(t)(p)` = plane p of table t. */
  def lshBucketsAll(vec: Column, tables: Seq[Seq[Seq[Double]]]): Column =
    ColumnBridge.column(LshBucketsExpr(ColumnBridge.expression(vec),
      tables.map(_.map(_.toArray).toArray).toArray))

  def vecQuantStats(a: Column): Column =
    ColumnBridge.column(VecQuantStatsExpr(ColumnBridge.expression(a)))

  /** Symmetric int8 scalar-quantization stats: scale = max|x|/127,
    * q_i = floor(x_i/scale + 0.5) (explicit half-up — portable, unlike
    * rint/round whose half-case rules differ between engines), error =
    * |x_i - q_i*scale|. Returns {scale, mae, max_err}; a zero vector
    * quantizes to scale 0 with zero error. Accumulation is strictly
    * left-to-right so the DuckDB list-kernel oracle reproduces it
    * bit-for-bit.
    */
  def quantStats(a: ArrayData): Array[Double] = {
    val n = a.numElements()
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      val x = math.abs(a.getDouble(i))
      if (x > maxAbs) maxAbs = x
      i += 1
    }
    val scale = maxAbs / 127.0
    var sum = 0.0
    var mx = 0.0
    if (scale > 0.0) {
      i = 0
      while (i < n) {
        val x = a.getDouble(i)
        val q = math.floor(x / scale + 0.5)
        val e = math.abs(x - q * scale)
        sum += e
        if (e > mx) mx = e
        i += 1
      }
    }
    Array(scale, if (n > 0 && scale > 0.0) sum / n else 0.0, mx)
  }
}

case class VecDotExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vec_dot requires array<double> inputs, got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    VecOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vec_dot"
}

case class VecQuantStatsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("scale", DoubleType, nullable = false),
    org.apache.spark.sql.types.StructField("mae", DoubleType, nullable = false),
    org.apache.spark.sql.types.StructField("max_err", DoubleType, nullable = false)))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vec_quant_stats requires array<double> input, got $other")
    }

  override def nullSafeEval(a: Any): Any = {
    val r = VecOps.quantStats(a.asInstanceOf[ArrayData])
    org.apache.spark.sql.catalyst.InternalRow(r(0), r(1), r(2))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val r = ctx.freshName("r")
      s"""
         |double[] $r = graft.functions.VecOps.quantStats($a);
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[]{$r[0], $r[1], $r[2]});
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "vec_quant_stats"
}

case class VecNormExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vec_norm requires array<double> input, got $other")
    }

  override def nullSafeEval(a: Any): Any = VecOps.norm(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val x = ctx.freshName("x")
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = $a.getDouble($i);
         |  $s += $x * $x;
         |}
         |${ev.value} = java.lang.Math.sqrt($s);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "vec_norm"
}

/** All LSH-table bucket ids for one vector in ONE compact kernel call.
  *
  * The column-expression formulation (`array(tables.map(lshBucket(v, _)))`,
  * 16 tables x 16 planes at the 100x corpus's adaptive depth) inlines 256
  * VecDotExpr loops into a single generated method — far past the JIT's
  * method-size limits, so the stage runs in the BYTECODE INTERPRETER
  * (~40 ms/row; found when the 100x embed_cosine_neardup run pinned 31
  * cores inside generate_doConsume for half an hour). This kernel does the
  * identical arithmetic — per table t, bucket = sum over planes p of
  * (dot(v, plane_p) > 0 ? 1<<p : 0), dots folding ascending exactly like
  * VecDotExpr — in one small generated call into a static JIT-compiled
  * loop, keeping whole-stage codegen AND compiled execution at any depth.
  */
case class LshBucketsExpr(child: Expression, planes: Array[Array[Array[Double]]])
    extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"lsh_buckets requires an array<double> input, got $other")
    }

  override def nullSafeEval(v: Any): Any =
    ArrayData.toArrayData(VecOps.lshBuckets(v.asInstanceOf[ArrayData], planes))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("planes", planes, "double[][][]")
      s"""
         |${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
         |  graft.functions.VecOps.lshBuckets($a, $ref));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "lsh_buckets"
}
