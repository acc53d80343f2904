package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** TOP-K PER KEY as a first-class operator — logical node + strategy +
  * physical operator (tier (c) of the custom-operator preference order:
  * whole-operator semantics Spark's built-ins can't express efficiently).
  *
  * Spark's idiomatic per-key top-k is `row_number().over(partitionBy(key)
  * .orderBy(...))` + `filter(rn <= k)`: a full shuffle of EVERY row plus
  * a per-partition SORT of every group — no partial aggregation exists
  * for window ranks, so a 100 TB fact table crosses the wire whole. This
  * operator restores the missing map-side combine:
  *
  *   partial TopKPerKeyExec   (per input partition: bounded heap per key,
  *                             emits ≤ k rows per key per partition)
  *       → shuffle on key     (only the pruned candidates move)
  *   final TopKPerKeyExec     (same algorithm on the clustered rows,
  *                             emits the exact global top-k per key)
  *
  * Correctness: each key's global top-k rows are each in SOME partition's
  * local top-k (a row beaten by ≥ k rows of its key within one partition
  * is beaten by ≥ k rows globally), so partial pruning loses nothing.
  * Memory is O(keysPerPartition · k) rows — no group ever materializes,
  * no sort of full groups anywhere (contrast `flatMapGroups` + sort, or
  * the window twin's per-partition sort). Shuffle volume drops from
  * |rows| to ≤ |partitions| · |keys| · k.
  *
  * The heap ordering comes from `GenerateOrdering` over the declared
  * [[SortOrder]]s — identical comparison semantics to SortExec, so the
  * result set equals the window twin's exactly (ties must be broken by
  * the sort columns; pass a key-complete order, SURVEY §7.4).
  */
final case class TopKPerKeyPlan(
    keyExprs: Seq[Expression],
    sortOrder: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, "topKPerKey requires k > 0")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyPlan =
    copy(child = newChild)
}

/** Physical operator: bounded per-key heaps over the partition iterator.
  * `partial = true` runs before the exchange (any distribution, prunes);
  * `partial = false` declares ClusteredDistribution(keys) so planning
  * inserts the shuffle, and emits the exact answer.
  */
final case class TopKPerKeyExec(
    keyExprs: Seq[Expression],
    sortOrder: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(keyExprs))

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)

  override def simpleString(maxFields: Int): String =
    s"TopKPerKey${if (partial) "Partial" else "Final"} k=$k, " +
      s"keys=[${keyExprs.mkString(", ")}], order=[${sortOrder.mkString(", ")}]"

  override protected def doExecute(): RDD[InternalRow] = {
    val schema = child.output
    val keys = keyExprs
    val order = sortOrder
    val kk = k
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keys, schema)
      // compare(a,b) < 0 ⟺ a sorts first ⟺ a is "better"; the heap's
      // max (= head) is therefore the worst kept row — the eviction slot
      val ord = GenerateOrdering.generate(order, schema)
      val heaps = scala.collection.mutable.LinkedHashMap
        .empty[UnsafeRow, scala.collection.mutable.PriorityQueue[InternalRow]]
      iter.foreach { row =>
        val key = keyProj(row)
        val heap = heaps.getOrElseUpdate(key.copy(),
          scala.collection.mutable.PriorityQueue.empty[InternalRow](ord))
        if (heap.size < kk) heap.enqueue(row.copy())
        else if (ord.compare(row, heap.head) < 0) {
          heap.dequeue(); heap.enqueue(row.copy())
        }
      }
      heaps.valuesIterator.flatMap(_.dequeueAll)
    }
  }
}
