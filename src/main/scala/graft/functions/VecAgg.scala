package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Element-wise exact-integer vector-sum aggregate: per group, sums
  * `round(x_i * 1e6)` (the 1e6-scaled BIGINT discipline shared with
  * [[graft.operators.Clustering]] and the DuckDB oracles) into one
  * `array<long>` per group.
  *
  * Why an aggregate kernel and not `posexplode + groupBy(cl, dim)`: the
  * explode form fans every vector into `dim` rows that each pay row
  * construction plus a hash-aggregate probe — the dominant linear cost of
  * a Lloyd iteration once assignment is O(k·dim). This kernel does the
  * same exact integer math in one pass over the unsafe array per row, and
  * the map-side partial state is k buffers per partition, so the shuffle is
  * k ROWS (each one array) instead of k·dim rows. Decimal-string HALF_UP
  * rounding (`BigDecimal.valueOf`) reproduces Spark's `round()` — and
  * therefore the oracle's — bit-for-bit; integer addition is
  * order-independent, so results are partitioning-invariant by
  * construction.
  *
  * Buffers grow to the longest vector seen, so ragged inputs never throw —
  * but note the k-means caller divides every dimension by ONE per-group
  * row count, which matches a per-dimension count only when all vectors
  * share the same length with no null elements (k-means over ragged
  * vectors is ill-defined anyway — the distance kernel truncates to the
  * shorter operand). Uniform non-null vectors are a documented
  * precondition of [[graft.operators.Clustering.kmeans]].
  */
object VecAgg {
  /** `vec_sum_scaled(v)` over a group -> array<long> of per-dimension
    * scaled sums.
    */
  def vecSumScaled(v: Column): Column =
    ColumnBridge.column(
      VecSumAggExpr(ColumnBridge.expression(v)).toAggregateExpression())

  /** Weighted form: each vector contributes `round(x_i*1e6) * weight` —
    * EXACTLY the sum of `weight` copies (integer multiplication distributes
    * over the rounded value), which is what lets k-means run over
    * canonicalized distinct vectors with multiplicities and stay
    * bit-identical to the all-copies run.
    */
  def vecSumScaledWeighted(v: Column, weight: Column): Column =
    ColumnBridge.column(
      VecSumAggExpr(ColumnBridge.expression(v),
        Some(ColumnBridge.expression(weight))).toAggregateExpression())

  /** Exactly Spark's round(x, 0) for doubles (decimal-string HALF_UP =
    * half away from zero), then the long cast — must stay in lockstep with
    * the `round(x * 1000000.0)` the DuckDB k-means oracles use; pinned
    * against Spark's own round() by spec.
    */
  def scaledLong(x: Double): Long =
    java.math.BigDecimal.valueOf(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toLong
}

case class VecSumAggExpr(child: Expression,
                         weight: Option[Expression] = None,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = child +: weight.toSeq
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (child.dataType, weight.map(_.dataType)) match {
      case (ArrayType(DoubleType, _), None | Some(LongType)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vec_sum_scaled requires (array<double>[, bigint weight]), got $other")
    }

  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  private def grown(buf: Array[Long], n: Int): Array[Long] =
    if (buf.length >= n) buf
    else java.util.Arrays.copyOf(buf, n)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) buffer
    else {
      val w = weight.map(_.eval(input)) match {
        case Some(null) => return buffer // null weight: contributes nothing
        case Some(x) => x.asInstanceOf[Long]
        case None => 1L
      }
      val a = v.asInstanceOf[ArrayData]
      val n = a.numElements()
      val b = grown(buffer, n)
      var i = 0
      while (i < n) {
        if (!a.isNullAt(i)) b(i) += VecAgg.scaledLong(a.getDouble(i) * 1000000.0) * w
        i += 1
      }
      b
    }
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    val b = grown(b1, b2.length)
    var i = 0
    while (i < b2.length) { b(i) += b2(i); i += 1 }
    b
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buffer.length * 8)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecSumAggExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecSumAggExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head,
      weight = if (newChildren.length > 1) Some(newChildren(1)) else None)

  override def prettyName: String = "vec_sum_scaled"
}
