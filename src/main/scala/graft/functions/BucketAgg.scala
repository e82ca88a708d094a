package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** LSH bucket-candidate kernels: the banded-signature candidate stage as
  * ONE aggregation instead of count-aggregate + cap semi-join + bucket
  * self-join.
  *
  * `cappedCollectLong(doc_id, cap)` collects a bucket's member ids but
  * STOPS STORING past `cap` and evaluates to null — the mega-bucket guard
  * (a band bucket of k docs emits k^2/2 pairs; boilerplate-heavy corpora
  * concentrate near-identical signatures into one bucket) enforced with
  * BOUNDED per-group state at any scale: unlike a plain collect_list whose
  * buffer is O(bucket size), a billion-member bucket costs this aggregate
  * one overflow flag. `pairsOf(members)` then explodes each surviving
  * bucket (≤ cap members by construction) into its unordered candidate
  * pairs (a < b).
  *
  * Why this beats the join shape it replaced (round 13, measured at the
  * 100x corpus): the old pipeline materialized a 20M-row banded cache,
  * re-scanned it three times (bucket counts, cap join, self-join) and paid
  * sort-merge sorts on both self-join sides; this shape is scan ->
  * groupBy -> explode with exactly two exchanges end-to-end (the
  * aggregation's and the final pair distinct's).
  */
object BucketAgg {
  def cappedCollectLong(c: Column, cap: Int): Column =
    ColumnBridge.column(
      CappedCollectLongAgg(ColumnBridge.expression(c), cap).toAggregateExpression())

  def pairsOf(members: Column): Column =
    ColumnBridge.column(BucketPairsExpr(ColumnBridge.expression(members)))

  /** All unordered pairs (min, max) of the distinct-per-bucket member ids —
    * static entry point for the codegen'd [[BucketPairsExpr]].
    */
  def pairs(a: ArrayData): ArrayData = {
    val n = a.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n * (n - 1) / 2)
    var idx = 0
    var i = 0
    while (i < n) {
      val x = a.getLong(i)
      var j = i + 1
      while (j < n) {
        val y = a.getLong(j)
        val row = new GenericInternalRow(2)
        if (x < y) { row.setLong(0, x); row.setLong(1, y) }
        else { row.setLong(0, y); row.setLong(1, x) }
        out(idx) = row
        idx += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Growable bounded member buffer: `elems` doubles up to the cap;
  * `overflowed` buckets stop storing (their members are never needed —
  * the whole bucket is dropped).
  */
final class CappedLongsBuffer(var elems: Array[Long], var n: Int,
                              var overflowed: Boolean)

case class CappedCollectLongAgg(child: Expression, cap: Int,
                                mutableAggBufferOffset: Int = 0,
                                inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CappedLongsBuffer] {

  require(cap >= 1, "cap must be >= 1")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"capped_collect_long requires bigint input, got ${child.dataType}")

  override def createAggregationBuffer(): CappedLongsBuffer =
    new CappedLongsBuffer(Array.emptyLongArray, 0, overflowed = false)

  private def append(b: CappedLongsBuffer, v: Long): Unit = {
    if (b.overflowed) return
    if (b.n >= cap) { b.overflowed = true; b.elems = Array.emptyLongArray; b.n = 0; return }
    if (b.n == b.elems.length)
      b.elems = java.util.Arrays.copyOf(b.elems, math.min(cap, math.max(4, b.elems.length * 2)))
    b.elems(b.n) = v
    b.n += 1
  }

  override def update(buffer: CappedLongsBuffer, input: InternalRow): CappedLongsBuffer = {
    val v = child.eval(input)
    if (v != null) append(buffer, v.asInstanceOf[Long])
    buffer
  }

  override def merge(b1: CappedLongsBuffer, b2: CappedLongsBuffer): CappedLongsBuffer = {
    if (b2.overflowed) { b1.overflowed = true; b1.elems = Array.emptyLongArray; b1.n = 0 }
    else {
      var i = 0
      while (i < b2.n && !b1.overflowed) { append(b1, b2.elems(i)); i += 1 }
    }
    b1
  }

  override def eval(buffer: CappedLongsBuffer): Any =
    if (buffer.overflowed) null
    else new GenericArrayData(java.util.Arrays.copyOf(buffer.elems, buffer.n))

  override def serialize(buffer: CappedLongsBuffer): Array[Byte] = {
    if (buffer.overflowed) return Array[Byte](1)
    val bb = ByteBuffer.allocate(1 + 8 * buffer.n)
    bb.put(0: Byte)
    var i = 0
    while (i < buffer.n) { bb.putLong(buffer.elems(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): CappedLongsBuffer = {
    if (bytes(0) == 1)
      return new CappedLongsBuffer(Array.emptyLongArray, 0, overflowed = true)
    val n = (bytes.length - 1) / 8
    val bb = ByteBuffer.wrap(bytes, 1, bytes.length - 1)
    val elems = new Array[Long](n)
    var i = 0
    while (i < n) { elems(i) = bb.getLong(); i += 1 }
    new CappedLongsBuffer(elems, n, overflowed = false)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CappedCollectLongAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CappedCollectLongAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  override def prettyName: String = "capped_collect_long"
}

case class BucketPairsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("a", LongType, nullable = false),
      StructField("b", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bucket_pairs requires array<bigint> input, got $other")
    }

  override def nullSafeEval(a: Any): Any =
    BucketAgg.pairs(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.BucketAgg.pairs($a)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "bucket_pairs"
}
