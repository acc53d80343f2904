package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_mg_sketch(item STRING, k)` — Misra–Gries summary over a
  * group's items, emitted as SERIALIZED state (BinaryType) so partials
  * compose across queries and micro-batches, the [[KllSketchAgg]]
  * convention exactly.
  */
case class MgSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MisraGries.Summary] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_mg_sketch expects STRING, got ${child.dataType.sql}")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_mg_sketch"

  override def createAggregationBuffer(): MisraGries.Summary =
    new MisraGries.Summary(k)

  override def update(buf: MisraGries.Summary, input: InternalRow): MisraGries.Summary = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(buf: MisraGries.Summary, other: MisraGries.Summary): MisraGries.Summary = {
    buf.merge(other); buf
  }

  override def eval(buf: MisraGries.Summary): Any = buf.serialize
  override def serialize(buf: MisraGries.Summary): Array[Byte] = buf.serialize
  override def deserialize(storage: Array[Byte]): MisraGries.Summary =
    MisraGries.deserialize(storage)

  override def withNewMutableAggBufferOffset(newOffset: Int): MgSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MgSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MgSketchAgg =
    copy(child = newChild)
}

/** `graft_mg_merge(sk BINARY)` — fold serialized summaries, one per
  * row: the rollup half of the two-phase deployment. */
case class MgMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MisraGries.Summary] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_mg_merge expects BINARY (a serialized mg summary), got ${child.dataType.sql}")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_mg_merge"

  override def createAggregationBuffer(): MisraGries.Summary =
    new MisraGries.Summary(0) // empty marker until the first input fixes k

  private def fold(buf: MisraGries.Summary, in: MisraGries.Summary): MisraGries.Summary =
    if (buf.n == 0 && buf.counts.isEmpty && buf.k != in.k) in
    else { buf.merge(in); buf }

  override def update(buf: MisraGries.Summary, input: InternalRow): MisraGries.Summary = {
    val v = child.eval(input)
    if (v == null) buf
    else fold(buf, MisraGries.deserialize(v.asInstanceOf[Array[Byte]]))
  }

  override def merge(buf: MisraGries.Summary, other: MisraGries.Summary): MisraGries.Summary =
    if (other.n == 0 && other.counts.isEmpty) buf else fold(buf, other)

  override def eval(buf: MisraGries.Summary): Any = buf.serialize
  override def serialize(buf: MisraGries.Summary): Array[Byte] = buf.serialize
  override def deserialize(storage: Array[Byte]): MisraGries.Summary =
    MisraGries.deserialize(storage)

  override def withNewMutableAggBufferOffset(newOffset: Int): MgMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MgMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MgMergeAgg =
    copy(child = newChild)
}

/** `graft_mg_estimate(sk BINARY, item STRING)` — the summary's count
  * estimate for an item; 0 when absent (MG never overcounts, so 0 is
  * the honest lower bound). Scalar over group rows — metadata-scale. */
case class MgEstimate(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_mg_estimate expects (BINARY, STRING), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_mg_estimate"

  override protected def nullSafeEval(sk: Any, item: Any): Any =
    MisraGries.deserialize(sk.asInstanceOf[Array[Byte]])
      .estimate(item.asInstanceOf[UTF8String].toString)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MgEstimate =
    copy(left = newLeft, right = newRight)
}
