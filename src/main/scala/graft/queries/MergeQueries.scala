package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.QueryBuilder.scan
import graft.ops.Merge

/** Incremental-sync load semantics: orders is treated as a change stream
  * of per-customer state updates versioned by (o_orderdate, o_orderkey).
  * q_merge_upsert merges a pre-reduced base snapshot with a raw delta
  * batch (exercising upsert's associativity — exactly how periodic sync
  * batches land); q_scd2_history derives type-2 validity intervals.
  */
object MergeQueries {

  private val cutoff = "1999-01-01"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_merge_upsert" -> ((s: SparkSession, d: String) => {
      val o = scan(s, d, "orders")
      val base = o.filter(col("o_orderdate") < lit(cutoff).cast("timestamp"))
      val delta = o.filter(col("o_orderdate") >= lit(cutoff).cast("timestamp"))
      val baseState = Merge.latest(base, Seq("o_custkey"), Seq("o_orderdate", "o_orderkey"))
      Merge.upsert(baseState, delta, Seq("o_custkey"), Seq("o_orderdate", "o_orderkey"))
        .orderBy(col("o_custkey"))
    }),

    "q_scd2_history" -> ((s: SparkSession, d: String) => {
      Merge.scd2(
          scan(s, d, "orders")
            .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("o_totalprice")),
          Seq("o_custkey"), "o_orderdate", "o_orderkey")
        .select(col("o_custkey"), col("o_orderkey"), col("valid_from"),
          col("valid_to"), col("is_current"))
        .orderBy(col("o_custkey"), col("valid_from"), col("o_orderkey"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q_merge_upsert" ->
      """SELECT o_custkey, o_orderdate, o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
        |FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
        |                                   ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |      FROM orders) t
        |WHERE rn = 1 ORDER BY o_custkey""".stripMargin,
    "q_scd2_history" ->
      """SELECT o_custkey, o_orderkey, o_orderdate AS valid_from,
        |  lead(o_orderdate) OVER (PARTITION BY o_custkey
        |                          ORDER BY o_orderdate, o_orderkey) AS valid_to,
        |  lead(o_orderdate) OVER (PARTITION BY o_custkey
        |                          ORDER BY o_orderdate, o_orderkey) IS NULL AS is_current
        |FROM orders
        |ORDER BY o_custkey, valid_from, o_orderkey""".stripMargin
  )
}
