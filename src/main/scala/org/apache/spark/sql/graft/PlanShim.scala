package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one sanctioned bridge from a custom [[LogicalPlan]] to a public
  * DataFrame. `Dataset.ofRows` is `private[sql]`, so this shim lives in
  * the `org.apache.spark.sql` namespace — the same technique Spark
  * extension libraries use; no Spark internals are modified or copied.
  */
object GraftPlanShim {
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: LogicalPlan): org.apache.spark.sql.DataFrame = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    org.apache.spark.sql.classic.Dataset.ofRows(classic, plan)
  }

  /** Expression ↔ Column bridge (`ExpressionUtils` is `private[sql]`) —
    * for expressions whose constructor takes non-Expression arguments
    * (e.g. a Broadcast handle) and so can't go through the function
    * registry like Hex60/JsToNumber do.
    */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): org.apache.spark.sql.Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  def expression(c: org.apache.spark.sql.Column): org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)
}
