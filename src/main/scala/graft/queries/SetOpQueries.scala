package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.QueryBuilder.scan

/** Set-operation surface (SURVEY §2.5 — absent in the reference):
  * union/unionAll/intersect/except over compatible projections.
  */
object SetOpQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_set_union_all" -> ((s: SparkSession, d: String) => {
      val c = scan(s, d, "customer").select(col("c_nationkey").cast("int").as("nk"), lit("cust").as("side"))
      val sup = scan(s, d, "supplier").select(col("s_nationkey").cast("int").as("nk"), lit("supp").as("side"))
      c.unionAll(sup).orderBy(col("nk"), col("side"))
    }),

    "q_set_union" -> ((s: SparkSession, d: String) => {
      val c = scan(s, d, "customer").select(col("c_nationkey").cast("int").as("nk"))
      val sup = scan(s, d, "supplier").select(col("s_nationkey").cast("int").as("nk"))
      c.union(sup).distinct().orderBy(col("nk"))
    }),

    "q_set_intersect" -> ((s: SparkSession, d: String) => {
      val c = scan(s, d, "customer").select(col("c_nationkey").cast("int").as("nk"))
      val sup = scan(s, d, "supplier").select(col("s_nationkey").cast("int").as("nk"))
      c.intersect(sup).orderBy(col("nk"))
    }),

    // supplier side restricted to nations < 10 so the EXCEPT is non-empty
    // (all 25 nations have suppliers, so an unrestricted EXCEPT would
    // trivially verify an empty result)
    "q_set_except" -> ((s: SparkSession, d: String) => {
      val c = scan(s, d, "customer").select(col("c_nationkey").cast("int").as("nk"))
      val sup = scan(s, d, "supplier").select(col("s_nationkey").cast("int").as("nk"))
        .filter(col("nk") < 10)
      c.except(sup).orderBy(col("nk"))
    }),

    // multiset variants: EXCEPT ALL / INTERSECT ALL respect multiplicity
    // (n_left − n_right / min(n_left, n_right) copies per value)
    "q_set_except_all" -> ((s: SparkSession, d: String) => {
      val c = scan(s, d, "customer").select(col("c_nationkey").cast("int").as("nk"))
      val sup = scan(s, d, "supplier").select(col("s_nationkey").cast("int").as("nk"))
      c.exceptAll(sup).orderBy(col("nk"))
    }),

    "q_set_intersect_all" -> ((s: SparkSession, d: String) => {
      val c = scan(s, d, "customer").select(col("c_nationkey").cast("int").as("nk"))
      val sup = scan(s, d, "supplier").select(col("s_nationkey").cast("int").as("nk"))
      c.intersectAll(sup).orderBy(col("nk"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q_set_union_all" ->
      """SELECT CAST(c_nationkey AS INT) AS nk, 'cust' AS side FROM customer
        |UNION ALL
        |SELECT CAST(s_nationkey AS INT) AS nk, 'supp' AS side FROM supplier
        |ORDER BY nk, side""".stripMargin,
    "q_set_union" ->
      """SELECT CAST(c_nationkey AS INT) AS nk FROM customer
        |UNION
        |SELECT CAST(s_nationkey AS INT) AS nk FROM supplier
        |ORDER BY nk""".stripMargin,
    "q_set_intersect" ->
      """SELECT CAST(c_nationkey AS INT) AS nk FROM customer
        |INTERSECT
        |SELECT CAST(s_nationkey AS INT) AS nk FROM supplier
        |ORDER BY nk""".stripMargin,
    "q_set_except" ->
      """SELECT CAST(c_nationkey AS INT) AS nk FROM customer
        |EXCEPT
        |SELECT CAST(s_nationkey AS INT) AS nk FROM supplier WHERE s_nationkey < 10
        |ORDER BY nk""".stripMargin,
    "q_set_except_all" ->
      """SELECT CAST(c_nationkey AS INT) AS nk FROM customer
        |EXCEPT ALL
        |SELECT CAST(s_nationkey AS INT) AS nk FROM supplier
        |ORDER BY nk""".stripMargin,
    "q_set_intersect_all" ->
      """SELECT CAST(c_nationkey AS INT) AS nk FROM customer
        |INTERSECT ALL
        |SELECT CAST(s_nationkey AS INT) AS nk FROM supplier
        |ORDER BY nk""".stripMargin
  )
}
