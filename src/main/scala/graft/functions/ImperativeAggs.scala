package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** `udaf_imperative` (SURVEY.md §2.J): the high-performance sketch-merge
  * path on Spark's internal TypedImperativeAggregate API — a raw
  * primitive-array buffer mutated in place, vs the typed `Aggregator`
  * (Udfs.MinSigAggregator) which pays encoder round-trips per row.
  * Same mergeable-sketch contract: element-wise min of MinHash
  * signatures, associative + commutative, fixed-size state → the
  * partial/final shuffle carries nPerm longs per group regardless of
  * input size (the 100 TB shape). Equivalence with the Aggregator is
  * asserted in DedupSpec.
  */
case class MinSigImperative(
    child: Expression,
    nPerm: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"input must be array<bigint>, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(nPerm)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = math.min(nPerm, arr.numElements())
      var i = 0
      while (i < n) {
        val x = arr.getLong(i)
        if (x < buf(i)) buf(i) = x
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < nPerm) {
      if (b(i) < a(i)) a(i) = b(i)
      i += 1
    }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * nPerm)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(nPerm)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinSigImperative =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinSigImperative =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinSigImperative =
    copy(child = newChildren.head)
}

object ImperativeAggs {
  /** Column wrapper: element-wise-min aggregate over array<long> rows. */
  def minSig(c: Column, nPerm: Int): Column =
    ColumnBridge.column(
      MinSigImperative(ColumnBridge.expression(c), nPerm)
        .toAggregateExpression())
}
