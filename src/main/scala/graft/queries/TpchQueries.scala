package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.QueryBuilder.scan
import graft.ops.ExactAgg._

/** Canonical TPC-H query shapes over the synthetic tables (Q1 lives in
  * AggQueries as q_agg_q1; the star join is q_join_star). Dates are
  * shifted to the testdata's 1995-2001 span; columns the synthetic
  * schema lacks (shippriority, shipmode) are dropped. All money math is
  * exact-decimal so results hash-match DuckDB.
  */
object TpchQueries {

  private val cutoff = "1997-06-01"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Q3 shape — shipping-priority-style top-10 unshipped orders:
    // 3-way join, revenue agg, top-k by revenue
    "q_tpch_q3" -> ((s: SparkSession, d: String) => {
      val c = scan(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = scan(s, d, "orders")
        .filter(col("o_orderdate") < lit(cutoff).cast("timestamp"))
      val l = scan(s, d, "lineitem")
        .filter(col("l_shipdate") > lit(cutoff).cast("timestamp"))
      c.join(o, c("c_custkey") === o("o_custkey"))
        .join(l, o("o_orderkey") === l("l_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
        .limit(10)
    }),

    // Q6 shape — forecasting revenue change: pure scan + filter + one sum
    "q_tpch_q6" -> ((s: SparkSession, d: String) => {
      scan(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) &&
          col("l_quantity") < 24)
        .agg(dsum(col("l_extendedprice") * col("l_discount")).as("revenue"),
          count(lit(1)).as("n"))
    }),

    // Q10 shape — returned-item reporting: top-20 customers by lost revenue
    "q_tpch_q10" -> ((s: SparkSession, d: String) => {
      val c = scan(s, d, "customer")
      val o = scan(s, d, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-07-01").cast("timestamp"))
      val l = scan(s, d, "lineitem").filter(col("l_returnflag") === "R")
      c.join(o, c("c_custkey") === o("o_custkey"))
        .join(l, o("o_orderkey") === l("l_orderkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"))
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),

    // Q14 shape — promotion effect: conditional revenue share, a ratio of
    // two exact decimal sums (one deterministic double division)
    "q_tpch_q14" -> ((s: SparkSession, d: String) => {
      val l = scan(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-02-01").cast("timestamp"))
      val p = scan(s, d, "part")
      val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
      l.join(p, l("l_partkey") === p("p_partkey"))
        .agg(
          (lit(100.0) *
            dsum(when(col("p_type").startsWith("PROMO"), rev).otherwise(lit(0.0))) /
            dsum(rev)).as("promo_revenue_pct"),
          count(lit(1)).as("n"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q_tpch_q3" ->
      s"""SELECT l_orderkey, o_orderdate, ${sqlDsum("l_extendedprice * (1 - l_discount)")} AS revenue
         |FROM customer, orders, lineitem
         |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey AND o_orderkey = l_orderkey
         |  AND o_orderdate < TIMESTAMP '$cutoff 00:00:00'
         |  AND l_shipdate > TIMESTAMP '$cutoff 00:00:00'
         |GROUP BY l_orderkey, o_orderdate
         |ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10""".stripMargin,
    "q_tpch_q6" ->
      s"""SELECT ${sqlDsum("l_extendedprice * l_discount")} AS revenue, COUNT(*) AS n
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
         |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,
    "q_tpch_q10" ->
      s"""SELECT c_custkey, c_name, c_acctbal,
         |  ${sqlDsum("l_extendedprice * (1 - l_discount)")} AS revenue, COUNT(*) AS n_items
         |FROM customer, orders, lineitem
         |WHERE c_custkey = o_custkey AND o_orderkey = l_orderkey AND l_returnflag = 'R'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
         |GROUP BY c_custkey, c_name, c_acctbal
         |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "q_tpch_q14" ->
      s"""SELECT 100.0 *
         |    ${sqlDsum("CASE WHEN starts_with(p_type, 'PROMO') THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END")}
         |    / ${sqlDsum("l_extendedprice * (1 - l_discount)")} AS promo_revenue_pct,
         |  COUNT(*) AS n
         |FROM lineitem, part
         |WHERE l_partkey = p_partkey
         |  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND l_shipdate < TIMESTAMP '1996-02-01 00:00:00'""".stripMargin
  )
}
