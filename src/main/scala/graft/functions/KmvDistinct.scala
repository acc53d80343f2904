package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, LongType}

/** KMV (k-minimum-values) distinct-count sketch as a NATIVE Catalyst
  * aggregate (Beyer et al., SIGMOD 2007) — the mergeable-sketch shape
  * that makes approximate COUNT DISTINCT cheap at 100 TB: each partition
  * keeps only the k smallest distinct hash values (k·8 bytes of state),
  * partial buffers merge by set-union-keep-k-smallest (commutative,
  * associative, idempotent — so partition layout, AQE re-splits, and
  * retry re-execution can't change the answer), and the final estimate
  * is (k−1)·2⁶⁰ / z_k where z_k is the k-th smallest 60-bit hash.
  *
  * Determinism contract (what lets a DuckDB oracle replay the sketch
  * BIT-EXACTLY, unlike approx_count_distinct's HLL): the input is an
  * already-hashed 60-bit value (`Dedup.hex60(md5(...))`, the repo's
  * portable hash), the sketch is a pure function of the input's distinct
  * SET, and the estimate arithmetic is integer-only (BigInt here,
  * HUGEINT in the oracle; both truncate toward zero on positives).
  * Fewer than k distinct hashes ⇒ the sketch IS the distinct set and the
  * exact count is returned.
  *
  * Extends the §2.8 tier with the one Catalyst extension point the repo
  * didn't yet exercise: TypedImperativeAggregate (arbitrary-state
  * aggregation with explicit serialize/merge), alongside the codegen
  * scalar expressions (Hex60, JsToNumber, HilbertIndex,
  * BloomMightContainLong) and the TopKPerKey physical operator.
  */
case class KmvDistinct(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k >= 2, s"graft_kmv_distinct needs k >= 2, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_kmv_distinct expects BIGINT (a 60-bit hash), got ${child.dataType.sql}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kmv_distinct"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def insert(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit = {
    if (buf.size < k) { buf.add(v); () }
    else if (v < buf.last()) {
      if (buf.add(v)) { buf.remove(buf.last()); () }
    }
  }

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) insert(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    if (buf.size < k) buf.size.toLong
    else ((BigInt(k - 1) << 60) / BigInt(buf.last())).toLong

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream(4 + buf.size * 8)
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) out.writeLong(it.next())
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(storage: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val in = ByteBuffer.wrap(storage)
    val n = in.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add(in.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvDistinct =
    copy(child = newChild)
}
