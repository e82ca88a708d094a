package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd minhash family kernel. The composable form computes
  * ceil(H/4) md5 digests as HEX STRINGS and parses H
  * `conv(substring(hex, …), 16, 10)` windows back out of them — per
  * shingle, that is 4 hex encodings plus 16 string-slice/radix-parse
  * expression trees. This kernel produces the same H longs straight from
  * the raw digest bytes in one JVM call (digest d = md5("s<d>:"+s); hash k
  * = unsigned big-endian int of bytes 4*(k%4)..4*(k%4)+3 of digest k/4 —
  * exactly the hex-window definition, since 8 hex chars ARE 4 digest
  * bytes). Bit-identical to `Dedup.minhashFamily` / the DuckDB oracle's
  * `('0x'||substr(md5('s<d>:'||s), p, 8))::BIGINT`.
  */
object HashKernels {
  def minhashWindows(shingle: Column, numHashes: Int): Column =
    ColumnBridge.column(MinhashWindowsExpr(ColumnBridge.expression(shingle), numHashes))

  /** Whole minhash SIGNATURE in one per-document kernel call: fold the
    * running min of every hash window over all w-shingles of the token
    * array, with the digest bytes fed incrementally (prefix, token bytes,
    * single spaces) so no shingle string, window array, or exploded row is
    * ever materialized. Replaces explode(shingles) + minhashWindows +
    * groupBy(doc_id).agg(min...) — at the 100x corpus that shape pushed
    * 263M shingle rows through the hash aggregate for 5M output rows, and
    * the explode+agg machinery (not the md5 work) was ~2/3 of the
    * signature stage. min over all shingles == min over distinct shingles,
    * so skipping the per-doc dedup set is exact. Empty array out when the
    * doc has fewer than w tokens (the explode shape emitted no row — the
    * caller filters).
    */
  def minhashSignature(toks: Column, w: Int, numHashes: Int): Column =
    ColumnBridge.column(MinhashSignatureExpr(ColumnBridge.expression(toks), w, numHashes))

  /** SimHash majority-vote recompose from the 15 lane-packed sums + token
    * count (see Dedup.simhash for the lane packing). As composed Catalyst
    * arithmetic the 60 `when(2*S_j > n, 1<<j)` terms generate a 13.8 KB
    * projection method — past the JVM's 8000-byte JIT compile limit, so
    * the per-doc hot loop silently ran in the bytecode interpreter
    * (caught by CodegenAuditSpec, round 11). This kernel is one small
    * call; bit-identical to the composed form (pure integer math, lanes
    * are non-negative so arithmetic vs logical shift is moot).
    */
  def simhashRecompose(lanes: Column, n: Column): Column =
    ColumnBridge.column(SimhashRecomposeExpr(
      ColumnBridge.expression(lanes), ColumnBridge.expression(n)))

  def recompose60(lanes: ArrayData, n: Long): Long = {
    var out = 0L
    var f = 0
    while (f < 15) {
      val lane = lanes.getLong(f)
      var k = 0
      while (k < 4) {
        val s = (lane >> (k * 15)) & 0x7fffL
        if (s * 2 > n) out |= 1L << (k * 15 + f)
        k += 1
      }
      f += 1
    }
    out
  }

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def windows(s: UTF8String, numHashes: Int): ArrayData = {
    val md = md5Local.get()
    val sBytes = s.getBytes
    val out = new Array[Any](numHashes)
    var d = 0
    var k = 0
    while (k < numHashes) {
      md.reset()
      // ASCII prefix "s<d>:" — matches lit(s"s$d:") for the ASCII digits
      md.update(('s').toByte)
      val ds = String.valueOf(d)
      var i = 0
      while (i < ds.length) { md.update(ds.charAt(i).toByte); i += 1 }
      md.update((':').toByte)
      md.update(sBytes)
      val dg = md.digest()
      var j = 0
      while (j < 4 && k < numHashes) {
        out(k) = ((dg(4 * j) & 0xffL) << 24) | ((dg(4 * j + 1) & 0xffL) << 16) |
          ((dg(4 * j + 2) & 0xffL) << 8) | (dg(4 * j + 3) & 0xffL)
        j += 1
        k += 1
      }
      d += 1
    }
    new GenericArrayData(out)
  }

  /** Running-min minhash signature over the w-shingles of `a` — the static
    * the codegen'd [[MinhashSignatureExpr]] calls. Bit-identical to
    * min-per-hash over [[windows]] of each space-joined shingle: the md5
    * input bytes are fed incrementally in exactly the concat order
    * ("s<d>:" + tok + " " + tok + ...), and 8 hex chars ARE 4 digest bytes.
    */
  def signatureOf(a: ArrayData, w: Int, numHashes: Int): ArrayData = {
    val n = a.numElements()
    if (n < w)
      return org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(Array.emptyLongArray)
    val nd = (numHashes + 3) / 4
    // "s<d>:" prefixes are tiny and per-call; token bytes extracted once
    // (each token is read by up to w shingles)
    val prefixes = new Array[Array[Byte]](nd)
    var d = 0
    while (d < nd) {
      val ds = String.valueOf(d)
      val p = new Array[Byte](ds.length + 2)
      p(0) = 's'.toByte
      var i = 0
      while (i < ds.length) { p(i + 1) = ds.charAt(i).toByte; i += 1 }
      p(p.length - 1) = ':'.toByte
      prefixes(d) = p
      d += 1
    }
    val toks = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) { toks(i) = a.getUTF8String(i).getBytes; i += 1 }
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val md = md5Local.get()
    i = 0
    while (i <= n - w) {
      d = 0
      var k = 0
      while (d < nd) {
        md.reset()
        md.update(prefixes(d))
        var j = 0
        while (j < w) {
          if (j > 0) md.update(' '.toByte)
          md.update(toks(i + j))
          j += 1
        }
        val dg = md.digest()
        var jj = 0
        while (jj < 4 && k < numHashes) {
          val v = ((dg(4 * jj) & 0xffL) << 24) | ((dg(4 * jj + 1) & 0xffL) << 16) |
            ((dg(4 * jj + 2) & 0xffL) << 8) | (dg(4 * jj + 3) & 0xffL)
          if (v < mins(k)) mins(k) = v
          jj += 1
          k += 1
        }
        d += 1
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(mins)
  }
}

case class SimhashRecomposeExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType.isInstanceOf[ArrayType] &&
        left.dataType.asInstanceOf[ArrayType].elementType == LongType &&
        right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"simhash_recompose requires (array<bigint>, bigint), got (${left.dataType}, ${right.dataType})")

  override def nullSafeEval(lanes: Any, n: Any): Any =
    HashKernels.recompose60(lanes.asInstanceOf[ArrayData], n.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, n) => s"graft.functions.HashKernels.recompose60($l, $n)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "simhash_recompose"
}

case class MinhashSignatureExpr(child: Expression, w: Int, numHashes: Int)
    extends UnaryExpression {
  require(w >= 1 && numHashes >= 1, "w and numHashes must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_signature requires array<string> input, got $other")
    }

  override def nullSafeEval(a: Any): Any =
    HashKernels.signatureOf(a.asInstanceOf[ArrayData], w, numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.HashKernels.signatureOf($a, $w, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "minhash_signature"
}

case class MinhashWindowsExpr(child: Expression, numHashes: Int) extends UnaryExpression {
  require(numHashes >= 1, "numHashes must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"minhash_windows requires string input, got ${child.dataType}")

  override def nullSafeEval(s: Any): Any =
    HashKernels.windows(s.asInstanceOf[UTF8String], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.HashKernels.windows($s, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "minhash_windows"
}
