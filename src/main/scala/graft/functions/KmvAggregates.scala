package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** The TWO-PHASE deployment surface for the KMV distinct sketch
  * ([[KmvDistinct]] is the one-shot cell): `graft_kmv_sketch` emits a
  * group's serialized k-minimum-values state, partials land in a table
  * (per input split, per micro-batch), and `graft_kmv_merge` +
  * `graft_kmv_estimate` roll them up later — completing the
  * scalar/grouped × batch/stream matrix KLL and Misra–Gries already
  * ship. Merge is set-union-keep-k-smallest: commutative, associative,
  * idempotent, so ANY merge tree (partition layout, AQE re-splits,
  * micro-batch slicing, retries) yields the identical sketch and the
  * identical integer estimate — which is why the one-shot batch oracle
  * is shared VERBATIM by every deployment cell.
  *
  * Unlike KLL/MG summaries the sketch is a pure function of the input's
  * distinct SET (no layout-dependent compaction), so the DuckDB oracle
  * replays it bit-exactly from the portable 60-bit hash.
  */
object Kmv {

  /** k smallest distinct 60-bit hashes. k is mutable only through
    * marker adoption in [[merge]] — the same tightened rule as
    * [[MisraGries.Summary]]: a pristine k=0 empty buffer (the merge
    * agg's createAggregationBuffer) adopts the first real summary's k;
    * any other mismatch fails loudly, because merging sketches of
    * different k silently yields neither k's error bound. */
  final class Summary(private var k0: Int) {
    def k: Int = k0
    val values = new java.util.TreeSet[java.lang.Long]()

    def insert(v: Long): Unit = {
      if (values.size < k0) { values.add(v); () }
      else if (v < values.last()) {
        if (values.add(v)) { values.remove(values.last()); () }
      }
    }

    def merge(other: Summary): Unit = {
      if (k0 == 0 && values.isEmpty) k0 = other.k
      require(other.k == k0 || (other.k == 0 && other.values.isEmpty),
        s"kmv k mismatch: $k0 vs ${other.k}")
      val it = other.values.iterator()
      while (it.hasNext) insert(it.next())
    }

    /** Same integer arithmetic as [[KmvDistinct.eval]]: exact below k,
      * (k−1)·2⁶⁰ / z_k at capacity. */
    def estimate: Long =
      if (values.isEmpty) 0L // k=0 empty marker (all-NULL group) degrades to 0
      else if (values.size < k0) values.size.toLong
      else ((BigInt(k0 - 1) << 60) / BigInt(values.last())).toLong

    def serialize: Array[Byte] = {
      val bytes = new ByteArrayOutputStream(8 + values.size * 8)
      val out = new DataOutputStream(bytes)
      out.writeInt(k0)
      out.writeInt(values.size)
      val it = values.iterator()
      while (it.hasNext) out.writeLong(it.next())
      out.flush()
      bytes.toByteArray
    }
  }

  def deserialize(storage: Array[Byte]): Summary = {
    val in = ByteBuffer.wrap(storage)
    val s = new Summary(in.getInt)
    var left = in.getInt
    while (left > 0) { s.values.add(in.getLong); left -= 1 }
    s
  }
}

/** `graft_kmv_sketch(hv BIGINT, k)` — serialized KMV state per group. */
case class KmvSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Kmv.Summary] with UnaryLike[Expression] {

  require(k >= 2, s"graft_kmv_sketch needs k >= 2, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_kmv_sketch expects BIGINT (a 60-bit hash), got ${child.dataType.sql}")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kmv_sketch"

  override def createAggregationBuffer(): Kmv.Summary = new Kmv.Summary(k)

  override def update(buf: Kmv.Summary, input: InternalRow): Kmv.Summary = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: Kmv.Summary, other: Kmv.Summary): Kmv.Summary = {
    buf.merge(other); buf
  }

  override def eval(buf: Kmv.Summary): Any = buf.serialize
  override def serialize(buf: Kmv.Summary): Array[Byte] = buf.serialize
  override def deserialize(storage: Array[Byte]): Kmv.Summary =
    Kmv.deserialize(storage)

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvSketchAgg =
    copy(child = newChild)
}

/** `graft_kmv_merge(sk BINARY)` — fold serialized summaries, one per
  * row: the rollup half of the two-phase deployment. */
case class KmvMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Kmv.Summary] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_kmv_merge expects BINARY (a serialized kmv summary), got ${child.dataType.sql}")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kmv_merge"

  override def createAggregationBuffer(): Kmv.Summary =
    new Kmv.Summary(0) // empty marker until the first input fixes k

  override def update(buf: Kmv.Summary, input: InternalRow): Kmv.Summary = {
    val v = child.eval(input)
    if (v != null) buf.merge(Kmv.deserialize(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(buf: Kmv.Summary, other: Kmv.Summary): Kmv.Summary = {
    if (!(other.k == 0 && other.values.isEmpty)) buf.merge(other)
    buf
  }

  override def eval(buf: Kmv.Summary): Any = buf.serialize
  override def serialize(buf: Kmv.Summary): Array[Byte] = buf.serialize
  override def deserialize(storage: Array[Byte]): Kmv.Summary =
    Kmv.deserialize(storage)

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvMergeAgg =
    copy(child = newChild)
}

/** `graft_kmv_estimate(sk BINARY)` — the distinct-count estimate of a
  * (merged) summary; scalar over group rows, metadata-scale. */
case class KmvEstimate(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_kmv_estimate expects BINARY, got ${child.dataType.sql}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_kmv_estimate"

  override protected def nullSafeEval(sketch: Any): Any =
    Kmv.deserialize(sketch.asInstanceOf[Array[Byte]]).estimate

  override protected def withNewChildInternal(newChild: Expression): KmvEstimate =
    copy(child = newChild)
}
