package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.QueryBuilder.scan

/** Typed Dataset API surface: case-class Encoders +
  * KeyValueGroupedDataset.flatMapGroups — the per-key imperative hook
  * (SURVEY §2.8's "table-function hook"), used here for per-user top-N
  * selection. Scale note: groupByKey shuffles once on the key and the
  * group iterator STREAMS through a bounded heap (O(n) memory per group,
  * no group materialization) — but unlike the window-function twin it
  * can't use partial aggregation, so prefer windows unless the per-group
  * logic genuinely needs arbitrary code (this query's oracle IS the
  * window twin, proving the equivalence).
  */
object TypedQueries {

  final case class Event(event_id: Long, user_id: Long, event_type: String, value: Double)
  final case class TopEvent(user_id: Long, rank_in_user: Int, event_id: Long, value: Double)

  /** Streaming bounded-heap top-N over a group iterator: O(n) keeps only
    * the current best `n` elements, never materializing the group — a
    * hot key with millions of events costs n slots of heap, where
    * `it.toSeq.sortBy` would buffer them all (executor OOM at scale).
    * Ordering: value DESC, event_id ASC — identical to the window twin.
    */
  private def topNByValue(it: Iterator[Event], n: Int): Seq[Event] = {
    // smaller tuple = better rank; PriorityQueue dequeues its MAX, so the
    // heap head is the worst kept element — the eviction candidate
    val ord = Ordering.by[Event, (Double, Long)](e => (-e.value, e.event_id))
    val heap = scala.collection.mutable.PriorityQueue.empty[Event](ord)
    it.foreach { e =>
      if (heap.size < n) heap.enqueue(e)
      else if (ord.lt(e, heap.head)) { heap.dequeue(); heap.enqueue(e) }
    }
    heap.dequeueAll.reverse // dequeue order is worst-first → reverse to best-first
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // the custom physical operator (plans/TopKPerKey.scala): logical node
    // + strategy + partial/final exec pair with map-side pruning — the
    // per-key top-k that ships ≤ partitions×keys×k rows through the
    // shuffle instead of the whole table (window twin = the oracle)
    "q_topk_per_key" -> ((s: SparkSession, d: String) => {
      graft.plans.TopKPerKey.topKPerKey(
        scan(s, d, "events").select("event_id", "user_id", "value"),
        keyCols = Seq("user_id"),
        sorts = Seq(("value", false), ("event_id", true)),
        k = 2)
        .orderBy(col("user_id"), col("value").desc, col("event_id"))
    }),

    "q_typed_topn" -> ((s: SparkSession, d: String) => {
      import s.implicits._
      scan(s, d, "events")
        .select("event_id", "user_id", "event_type", "value").as[Event]
        .groupByKey(_.user_id)
        .flatMapGroups { (uid, it) =>
          topNByValue(it, 2)
            .zipWithIndex
            .map { case (e, i) => TopEvent(uid, i + 1, e.event_id, e.value) }
        }
        .toDF()
        .orderBy(col("user_id"), col("rank_in_user"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q_topk_per_key" ->
      """WITH ranked AS (
        |  SELECT event_id, user_id, value,
        |         row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rn
        |  FROM events)
        |SELECT event_id, user_id, value
        |FROM ranked WHERE rn <= 2
        |ORDER BY user_id, value DESC, event_id""".stripMargin,
    "q_typed_topn" ->
      """WITH ranked AS (
        |  SELECT user_id, event_id, value,
        |         row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rn
        |  FROM events)
        |SELECT user_id, CAST(rn AS INT) AS rank_in_user, event_id, value
        |FROM ranked WHERE rn <= 2
        |ORDER BY user_id, rank_in_user""".stripMargin
  )
}
