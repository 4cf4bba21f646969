package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Union}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Theta sketches (`agg_theta_sketch`): the distinct-count sketch family
  * that supports SET ALGEBRA — union, and crucially INTERSECTION, which
  * HLL cannot do (an HLL union of two sketches exists; an HLL
  * intersection does not, short of lossy inclusion-exclusion). The
  * pipeline question they answer at 100 TB: "how many distinct users did
  * BOTH X and Y" across groups too large to pairwise count-distinct —
  * audience overlap, cross-contamination between corpus shards,
  * users-retained-between-cohorts.
  *
  * [[ThetaSketchAgg]] is the build/merge aggregate on the same
  * TypedImperativeAggregate path as [[MinSigImperative]]: fixed-size
  * mergeable state, partial/final shuffle carries sketch bytes (≤ 8·2^lgK
  * per group), never raw ids. [[ThetaEstimate]] /
  * [[ThetaIntersectEstimate]] / [[ThetaUnionEstimate]] are report-side
  * scalar expressions over the compact sketch bytes (CodegenFallback —
  * they run on report-sized rows, one per group pair, where codegen buys
  * nothing).
  *
  * Below ~2^lgK distinct items a theta sketch is in its EXACT regime
  * (theta = 1, every hash retained), so estimates — including
  * intersection and union results — are exactly right; that is what lets
  * the declared query full-oracle against DuckDB's exact counts at
  * fixture scale while the identical plan degrades gracefully to
  * ±~1.6% (lgK=12) at 100 TB.
  */
object ThetaAggs {

  private def builder(lgK: Int) =
    SetOperation.builder().setLogNominalEntries(lgK)

  private[graft] def wrap(bytes: Array[Byte]): CompactSketch =
    CompactSketch.wrap(Memory.wrap(bytes))

  /** Build/merge aggregate: long ids in, compact sketch bytes out. */
  def thetaSketch(c: Column, lgK: Int = 12): Column =
    ColumnBridge.column(
      ThetaSketchAgg(ColumnBridge.expression(c), lgK).toAggregateExpression())

  /** Distinct-count estimate of one sketch. */
  def thetaEstimate(sk: Column): Column =
    ColumnBridge.column(ThetaEstimate(ColumnBridge.expression(sk)))

  /** Distinct-count estimate of the intersection of two sketches. */
  def thetaIntersectEstimate(a: Column, b: Column): Column =
    ColumnBridge.column(ThetaIntersectEstimate(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Distinct-count estimate of the union of two sketches. */
  def thetaUnionEstimate(a: Column, b: Column, lgK: Int = 12): Column =
    ColumnBridge.column(ThetaUnionEstimate(
      ColumnBridge.expression(a), ColumnBridge.expression(b), lgK))
}

/** Theta-sketch build/merge over a LongType column → compact sketch
  * bytes. The buffer is a datasketches Union (itself a mergeable
  * sketch), so update and merge are both native sketch operations.
  */
case class ThetaSketchAgg(
    child: Expression,
    lgK: Int = 12,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Union] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"input must be bigint, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Long])
    buf
  }

  override def merge(a: Union, b: Union): Union = {
    a.union(b.getResult())
    a
  }

  override def eval(buf: Union): Any = buf.getResult().toByteArray()

  override def serialize(buf: Union): Array[Byte] =
    buf.getResult().toByteArray()

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
    u.union(ThetaAggs.wrap(bytes))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ThetaSketchAgg =
    copy(child = newChildren.head)
}

/** Estimate of one compact theta sketch. */
case class ThetaEstimate(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"input must be binary sketch bytes, got ${other.catalogString}")
  }
  override protected def nullSafeEval(b: Any): Any =
    ThetaAggs.wrap(b.asInstanceOf[Array[Byte]]).getEstimate
  override protected def withNewChildInternal(c: Expression): ThetaEstimate =
    copy(child = c)
}

/** Estimate of the intersection of two compact theta sketches. */
case class ThetaIntersectEstimate(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"inputs must be binary sketch bytes, got $other")
    }
  override protected def nullSafeEval(a: Any, b: Any): Any =
    SetOperation.builder().buildIntersection()
      .intersect(ThetaAggs.wrap(a.asInstanceOf[Array[Byte]]),
        ThetaAggs.wrap(b.asInstanceOf[Array[Byte]]))
      .getEstimate
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): ThetaIntersectEstimate =
    copy(left = l, right = r)
}

/** Estimate of the union of two compact theta sketches. */
case class ThetaUnionEstimate(left: Expression, right: Expression,
    lgK: Int = 12)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"inputs must be binary sketch bytes, got $other")
    }
  override protected def nullSafeEval(a: Any, b: Any): Any =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
      .union(ThetaAggs.wrap(a.asInstanceOf[Array[Byte]]),
        ThetaAggs.wrap(b.asInstanceOf[Array[Byte]]))
      .getEstimate
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): ThetaUnionEstimate =
    copy(left = l, right = r)
}
