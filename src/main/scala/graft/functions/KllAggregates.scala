package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** `graft_kll_sketch(v BIGINT, k)` — build a [[Kll.Sketch]] over a
  * group's values and emit the SERIALIZED sketch (BinaryType). Emitting
  * state instead of an estimate is what makes the sketch composable
  * beyond one query: per-micro-batch partials land in a table and
  * [[KllMergeAgg]] folds them later (the mergeable-summary streaming
  * deployment), exactly how a 1000-executor rollup would ship
  * per-partition sketches to a final merge.
  */
case class KllSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Kll.Sketch] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_kll_sketch expects BIGINT, got ${child.dataType.sql}")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kll_sketch"

  override def createAggregationBuffer(): Kll.Sketch = new Kll.Sketch(k)

  override def update(buf: Kll.Sketch, input: InternalRow): Kll.Sketch = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: Kll.Sketch, other: Kll.Sketch): Kll.Sketch = {
    buf.merge(other); buf
  }

  override def eval(buf: Kll.Sketch): Any = buf.serialize

  override def serialize(buf: Kll.Sketch): Array[Byte] = buf.serialize
  override def deserialize(storage: Array[Byte]): Kll.Sketch =
    Kll.deserialize(storage)

  override def withNewMutableAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllSketchAgg =
    copy(child = newChild)
}

/** `graft_kll_merge(sketch BINARY)` — fold already-serialized sketches
  * (one per row) into one: the second half of the two-phase deployment.
  * k is taken from the first sketch seen; mismatched k fails loudly.
  */
case class KllMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Kll.Sketch] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_kll_merge expects BINARY (a serialized kll sketch), got ${child.dataType.sql}")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kll_merge"

  // empty marker until the first input fixes k
  override def createAggregationBuffer(): Kll.Sketch = new Kll.Sketch(Kll.MinCap)

  private def fold(buf: Kll.Sketch, incoming: Kll.Sketch): Kll.Sketch =
    if (buf.n == 0 && buf.k != incoming.k) incoming // adopt the stream's k
    else { buf.merge(incoming); buf }

  override def update(buf: Kll.Sketch, input: InternalRow): Kll.Sketch = {
    val v = child.eval(input)
    if (v == null) buf
    else fold(buf, Kll.deserialize(v.asInstanceOf[Array[Byte]]))
  }

  override def merge(buf: Kll.Sketch, other: Kll.Sketch): Kll.Sketch =
    if (other.n == 0) buf else fold(buf, other)

  override def eval(buf: Kll.Sketch): Any = buf.serialize

  override def serialize(buf: Kll.Sketch): Array[Byte] = buf.serialize
  override def deserialize(storage: Array[Byte]): Kll.Sketch =
    Kll.deserialize(storage)

  override def withNewMutableAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllMergeAgg =
    copy(child = newChild)
}

/** `graft_kll_quantile(sketch BINARY, q_ppm BIGINT)` — the q-quantile
  * estimate out of a serialized sketch: always an actual data element.
  * Scalar, evaluated on GROUP rows (metadata-scale), so CodegenFallback
  * costs nothing measurable.
  */
case class KllQuantile(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_kll_quantile expects (BINARY, BIGINT), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_kll_quantile"

  override protected def nullSafeEval(sketch: Any, qPpm: Any): Any =
    Kll.deserialize(sketch.asInstanceOf[Array[Byte]])
      .quantile(qPpm.asInstanceOf[Long]) match {
      case Some(v) => v
      case None    => null
    }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllQuantile =
    copy(left = newLeft, right = newRight)
}
