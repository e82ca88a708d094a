package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (Schleimer/Wilkinson/Aiken 2003, the
  * MOSS local-sampling scheme) — the candidate generator for exact
  * SUBSTRING-level dedup, the duplication long documents hide from
  * whole-doc shingle sets: a 5 KB page that embeds a 200-char boilerplate
  * block shares almost no WORD-shingle mass with another page embedding
  * the same block, but winnowed char-gram fingerprints flag exactly that
  * span.
  *
  * Per document: dual-channel polynomial rolling hashes of every k-char
  * (codepoint) gram, then the minimum of every w consecutive gram hashes —
  * the fingerprint set is the DISTINCT window minima. Selection density is
  * ~2/(w+1) of positions, and the scheme's guarantee holds: any substring
  * of length >= k + w - 1 shared by two documents contributes at least one
  * full hash window to both, whose minimum is the same value — the pair
  * shares a fingerprint. Documents shorter than k + w - 1 codepoints have
  * no full window and fingerprint to the empty set.
  *
  * The hash is Horner over CODEPOINTS (h = (h*B + cp) mod M per char, M =
  * 2^31-1 prime, two independent bases combined as h1*M + h2 into one
  * ~62-bit value, making cross-document accidental collisions negligible
  * at corpus scale without leaving 64-bit arithmetic) — chosen to be
  * expressible verbatim in the DuckDB oracle via
  * list_reduce/unicode/substr, so the engine and oracle compute
  * bit-identical fingerprints. One kernel call per document: the rolling
  * update is O(1)/position and the window minima use a monotonic deque,
  * so a document costs O(len) with no per-position row, no UDF, and no
  * interpreter fallback (codegen'd static call, same shape as
  * [[HashKernels.minhashSignature]]).
  */
object WinnowKernel {
  /** Channel bases; M = 2^31 - 1 (prime). h1*B < 2^51 stays in a long. */
  val B1 = 1000003L
  val B2 = 1000033L
  val M = 2147483647L

  def winnowFingerprints(text: Column, k: Int, w: Int): Column =
    ColumnBridge.column(WinnowFingerprintsExpr(ColumnBridge.expression(text), k, w))

  private def powMod(b: Long, e: Int): Long = {
    var r = 1L; var base = b % M; var n = e
    while (n > 0) {
      if ((n & 1) == 1) r = r * base % M
      base = base * base % M
      n >>= 1
    }
    r
  }

  /** Static entry point for the codegen'd [[WinnowFingerprintsExpr]]:
    * sorted distinct window-minimum fingerprints of `s`.
    */
  def fingerprints(s: UTF8String, k: Int, w: Int): ArrayData = {
    // codepoint extraction mirrors the oracle's character indexing
    // (DuckDB substr/unicode count codepoints, not UTF-16 units)
    val str = s.toString
    var cpn = 0
    val cps = new Array[Int](str.length)
    var ci = 0
    while (ci < str.length) {
      val cp = str.codePointAt(ci)
      cps(cpn) = cp
      cpn += 1
      ci += Character.charCount(cp)
    }
    if (cpn < k + w - 1)
      return org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(Array.emptyLongArray)
    val nh = cpn - k + 1 // k-gram positions
    val h = new Array[Long](nh)
    val pk1 = powMod(B1, k)
    val pk2 = powMod(B2, k)
    var h1 = 0L; var h2 = 0L
    var i = 0
    while (i < k) { // Horner for position 0
      h1 = (h1 * B1 + cps(i)) % M
      h2 = (h2 * B2 + cps(i)) % M
      i += 1
    }
    h(0) = h1 * M + h2
    while (i < cpn) { // rolling update: add cps(i), drop cps(i-k)
      h1 = ((h1 * B1 + cps(i)) % M - cps(i - k) * pk1 % M + M) % M
      h2 = ((h2 * B2 + cps(i)) % M - cps(i - k) * pk2 % M + M) % M
      h(i - k + 1) = h1 * M + h2
      i += 1
    }
    // window minima via monotonic deque: O(nh) for all nh - w + 1 windows
    val m = nh - w + 1
    val mins = new Array[Long](m)
    val dq = new Array[Int](nh)
    var head = 0; var tail = 0 // dq[head until tail] = candidate indices
    var p = 0
    while (p < nh) {
      while (tail > head && h(dq(tail - 1)) >= h(p)) tail -= 1
      dq(tail) = p; tail += 1
      if (dq(head) <= p - w) head += 1
      if (p >= w - 1) mins(p - w + 1) = h(dq(head))
      p += 1
    }
    java.util.Arrays.sort(mins)
    var distinct = 1
    var j = 1
    while (j < m) { if (mins(j) != mins(j - 1)) distinct += 1; j += 1 }
    val out = new Array[Long](distinct)
    out(0) = mins(0)
    var o = 1; j = 1
    while (j < m) {
      if (mins(j) != mins(j - 1)) { out(o) = mins(j); o += 1 }
      j += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }
}

case class WinnowFingerprintsExpr(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 1 && w >= 1, "k and w must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"winnow_fingerprints requires string input, got ${child.dataType}")

  override def nullSafeEval(s: Any): Any =
    WinnowKernel.fingerprints(s.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.WinnowKernel.fingerprints($s, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "winnow_fingerprints"
}
