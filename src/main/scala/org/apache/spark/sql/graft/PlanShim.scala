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
}
