package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.QueryBuilder.scan

/** Typed Dataset API surface: case-class Encoders +
  * KeyValueGroupedDataset.flatMapGroups — the per-key imperative hook
  * (SURVEY §2.8's "table-function hook"), used here for per-user top-N
  * selection. Scale note: groupByKey shuffles once on the key and the
  * group iterator streams — but unlike the window-function twin it can't
  * use partial aggregation, so prefer windows unless the per-group logic
  * genuinely needs arbitrary code (this query's oracle IS the window
  * twin, proving the equivalence).
  */
object TypedQueries {

  final case class Event(event_id: Long, user_id: Long, event_type: String, value: Double)
  final case class TopEvent(user_id: Long, rank_in_user: Int, event_id: Long, value: Double)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_typed_topn" -> ((s: SparkSession, d: String) => {
      import s.implicits._
      scan(s, d, "events")
        .select("event_id", "user_id", "event_type", "value").as[Event]
        .groupByKey(_.user_id)
        .flatMapGroups { (uid, it) =>
          it.toSeq
            .sortBy(e => (-e.value, e.event_id))
            .take(2)
            .zipWithIndex
            .map { case (e, i) => TopEvent(uid, i + 1, e.event_id, e.value) }
        }
        .toDF()
        .orderBy(col("user_id"), col("rank_in_user"))
    })
  )

  val oracleSql: Map[String, String] = Map(
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
