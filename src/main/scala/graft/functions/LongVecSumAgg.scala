package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** ELEMENTWISE long-vector sum aggregate — `graft_lvecsum(arr)` returns
  * the per-index sum of every input `array<bigint>` (all inputs must
  * share one length; NULL arrays are skipped, an all-NULL/empty group
  * yields NULL).
  *
  * Why it exists (r17 optimization round, guide §2.3 "aggregate before
  * you shuffle" + §1.2 "fix the distributed algorithm first"): the
  * second-moment census under PCA (q_embed_pca / q_stream_pca) used to
  * EXPLODE dims(dims+1)/2 = 2,080 (i, j, product) structs per vector
  * into a hash aggregate — ~21M generated rows at sf0.1, each paying
  * struct allocation plus a (i, j)-key hash probe, and the whole census
  * needed three passes over the cached corpus (pairs, margins, count).
  * Summing the per-row FLATTENED product array elementwise instead
  * keeps the loop a tight primitive-long add over a mutable buffer
  * (no per-element row objects, no hashing) and lets pairs + margins +
  * count ride ONE corpus pass; the dims²-sized readout explodes from a
  * single aggregated row. Exact integer sums — grouping/merge order
  * cannot change the result, so the DuckDB oracles are untouched.
  *
  * Merge is commutative/associative elementwise addition, so any merge
  * tree (partition layout, AQE re-splits, retries, micro-batch slicing)
  * yields the identical vector — the same portability argument as the
  * KMV/KLL/MG sketch family in this package.
  *
  * Buffers are `Array[Long]` mutated in place; the empty array is the
  * "no input yet" marker (adopts the first input's length, the
  * MisraGries pristine-buffer rule). Element nulls are not supported
  * (inputs here are products/counts, never NULL); ragged lengths fail
  * loudly rather than mis-align indices.
  */
case class LongVecSumAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  // SQL-registered as graft_lvecsum, so arbitrary input can reach it
  // (ADVICE r17): anything but array<bigint> must fail analysis, not
  // mis-read element bytes at runtime
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_lvecsum requires array<bigint>, got ${other.catalogString}")
    }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val b = if (buf.length == 0) new Array[Long](n) else buf
      require(b.length == n,
        s"graft_lvecsum: ragged input lengths (${b.length} vs $n)")
      var i = 0
      while (i < n) {
        // a NULL element would silently sum as 0/garbage where sum()
        // null-skips — reject loudly (census arrays are never null)
        require(!arr.isNullAt(i), s"graft_lvecsum: null element at index $i")
        b(i) += arr.getLong(i); i += 1
      }
      b
    }
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] =
    if (b2.length == 0) b1
    else if (b1.length == 0) b2
    else {
      require(b1.length == b2.length,
        s"graft_lvecsum: ragged partial lengths (${b1.length} vs ${b2.length})")
      var i = 0
      while (i < b1.length) { b1(i) += b2(i); i += 1 }
      b1
    }

  override def eval(buf: Array[Long]): Any =
    if (buf.length == 0) null else new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.length * 8)
    bb.putInt(buf.length)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val b = new Array[Long](n)
    var i = 0
    while (i < n) { b(i) = bb.getLong; i += 1 }
    b
  }

  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_lvecsum"

  override def withNewMutableAggBufferOffset(newOffset: Int): LongVecSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): LongVecSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): LongVecSumAgg =
    copy(child = newChild)
}
