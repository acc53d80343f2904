package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.QueryBuilder.scan
import graft.ops.ExactAgg

/** Window-function surface (SURVEY §2.5 — absent in the reference). Frame
  * orderings include a unique key (o_orderkey) so ranks and running sums
  * are deterministic.
  */
object WindowQueries {

  private def perCustomer = Window.partitionBy(col("o_custkey"))
    .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_win_rank" -> ((s: SparkSession, d: String) => {
      scan(s, d, "orders")
        .withColumn("rn", row_number().over(perCustomer))
        .withColumn("rk", rank().over(Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate").asc)))
        .withColumn("drk", dense_rank().over(Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate").asc)))
        .select(col("o_custkey"), col("o_orderkey"), col("rn"), col("rk"), col("drk"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    "q_win_lag_lead" -> ((s: SparkSession, d: String) => {
      scan(s, d, "orders")
        .withColumn("prev_price", lag(col("o_totalprice"), 1).over(perCustomer))
        .withColumn("next_price", lead(col("o_totalprice"), 1).over(perCustomer))
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("prev_price"), col("next_price"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // running total within customer — exact decimal running sum
    "q_win_runsum" -> ((s: SparkSession, d: String) => {
      val frame = perCustomer.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      scan(s, d, "orders")
        .withColumn("running_total", ExactAgg.dsumOver(col("o_totalprice"), frame))
        .withColumn("cum_n", count(lit(1)).over(frame))
        .select(col("o_custkey"), col("o_orderkey"), col("running_total"), col("cum_n"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // ntile quartiles of customers by balance (global window — fine for a
    // report-shaped output; partition-less windows don't scale and real
    // pipelines would bucket first, so keep the output small)
    "q_win_ntile" -> ((s: SparkSession, d: String) => {
      scan(s, d, "customer")
        .withColumn("quartile", ntile(4).over(Window.orderBy(col("c_acctbal").asc, col("c_custkey").asc)))
        .select(col("c_custkey"), col("c_acctbal"), col("quartile"))
        .orderBy(col("c_custkey"))
    }),

    // first/last/nth value over a full-partition frame — frame-boundary
    // semantics (last_value needs the unbounded-following frame or it
    // degenerates to the current row on both engines)
    "q_win_nth" -> ((s: SparkSession, d: String) => {
      val full = perCustomer.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      scan(s, d, "orders")
        .withColumn("first_key", first(col("o_orderkey")).over(full))
        .withColumn("last_key", last(col("o_orderkey")).over(full))
        .withColumn("second_key", nth_value(col("o_orderkey"), 2).over(full))
        .select(col("o_custkey"), col("o_orderkey"),
          col("first_key"), col("last_key"), col("second_key"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // rank ratios — exact divisions, identical IEEE on both engines
    "q_win_pct" -> ((s: SparkSession, d: String) => {
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
      scan(s, d, "orders")
        .withColumn("pr", percent_rank().over(w))
        .withColumn("cd", cume_dist().over(w))
        .select(col("o_custkey"), col("o_orderkey"), col("pr"), col("cd"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // sliding row-frame average (3-row centered window)
    "q_win_frame" -> ((s: SparkSession, d: String) => {
      val frame = perCustomer.rowsBetween(-1, 1)
      scan(s, d, "orders")
        .withColumn("sum3", ExactAgg.dsumOver(col("o_totalprice"), frame))
        .withColumn("n3", count(lit(1)).over(frame))
        .select(col("o_custkey"), col("o_orderkey"), col("sum3"), col("n3"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q_win_rank" ->
      """SELECT o_custkey, o_orderkey,
        |  row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn,
        |  rank() OVER (PARTITION BY o_custkey ORDER BY o_orderdate) AS rk,
        |  dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_orderdate) AS drk
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_win_lag_lead" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  lag(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price,
        |  lead(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_price
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_win_runsum" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) OVER
        |    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
        |  COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_n
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_win_ntile" ->
      """SELECT c_custkey, c_acctbal,
        |  ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS quartile
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_win_pct" ->
      """SELECT o_custkey, o_orderkey,
        |  percent_rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey) AS pr,
        |  cume_dist() OVER (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey) AS cd
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_win_frame" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) OVER
        |    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |     ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS DOUBLE) AS sum3,
        |  COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |     ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS n3
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_win_nth" ->
      """SELECT o_custkey, o_orderkey,
        |  first_value(o_orderkey) OVER w AS first_key,
        |  last_value(o_orderkey) OVER w AS last_key,
        |  nth_value(o_orderkey, 2) OVER w AS second_key
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin
  )
}
