package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a codegen expression — the canonicalization
  * step every multilingual training-data pipeline needs before hashing or
  * deduplicating text (a decomposed "é" (e + U+0301) and the precomposed
  * U+00E9 must fingerprint identically). Spark has no normalization
  * built-in; a Scala UDF would break whole-stage codegen around it, so this
  * follows the TextKernels pattern: a static JVM kernel called from
  * generated code.
  *
  * NFC (not NFKC) so the oracle side (DuckDB `nfc_normalize`) computes the
  * same form; compatibility folding (ligatures, width) is a lossier
  * transform pipelines opt into separately.
  */
object Normalize {
  def nfc(text: Column): Column =
    ColumnBridge.column(NfcNormalizeExpr(ColumnBridge.expression(text)))

  /** ASCII (and already-NFC) inputs return the input object unchanged —
    * `isNormalized` is a cheap scan and the common clean-corpus case should
    * not pay a UTF8String -> String -> UTF8String round trip.
    */
  def nfcNormalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"nfc_normalize requires string input, got ${child.dataType}")

  override def nullSafeEval(s: Any): Any =
    Normalize.nfcNormalize(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.Normalize.nfcNormalize($s)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "nfc_normalize"
}
