package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 32-bit FNV-1a hash, byte-compatible with the reference's sharding hash
  * (reference: rurouni/fnv1a.pyx:6-23; golden vectors tests/test_fnv1a.py:16-22).
  * Used to assign a metric to a shard: `fnv1a32(metric) % numShards`
  * (rurouni/utils.py:107-108). Returned as a signed Int (two's-complement
  * cast of the unsigned 32-bit hash, matching the reference's int cast).
  */
object Fnv1a {
  final val OffsetBasis: Int = 0x811c9dc5
  final val Prime: Int = 0x01000193

  def hash32(bytes: Array[Byte]): Int = {
    var h = OffsetBasis
    var i = 0
    while (i < bytes.length) {
      h = (h ^ (bytes(i) & 0xff)) * Prime
      i += 1
    }
    h
  }

  def hash32(s: String): Int = hash32(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** Non-negative shard index for a metric (mirrors rurouni/utils.py:107-108:
    * Python % always returns a non-negative result for positive modulus).
    */
  def shard(metric: String, numShards: Int): Int =
    java.lang.Math.floorMod(hash32(metric), numShards)

  /** Column API: fnv1a32 of a string column, codegen'd. */
  def fnv1a32(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(Fnv1a32Expr(ColumnBridge.expression(c)))
  }
}

/** Codegen'd Catalyst expression so the hash stays inside whole-stage
  * codegen on the ingest hot path (no UDF serialization overhead).
  */
case class Fnv1a32Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"fnv1a32 requires string input, got ${child.dataType}")
  }

  override def nullSafeEval(input: Any): Any =
    Fnv1a.hash32(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Fnv1a.hash32($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "fnv1a32"
}
