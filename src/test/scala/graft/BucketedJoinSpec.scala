package graft

import org.apache.spark.sql.functions._
import graft.engine.QueryBuilder.scan

/** Bucketing: co-located joins with no shuffle exchange — the layout
  * that makes repeated large-fact joins viable at 100 TB (write once
  * bucketed by the join key; every subsequent join on that key skips
  * both shuffles).
  */
class BucketedJoinSpec extends SparkSpec {

  test("join of two tables bucketed on the key plans without a shuffle") {
    // external tables via explicit path — warehouse dir is a static conf
    val wh = java.nio.file.Files.createTempDirectory("graft_bucket").toString

    scan(spark, sf001, "orders")
      .write.mode("overwrite")
      .bucketBy(8, "o_custkey").sortBy("o_custkey")
      .option("path", s"$wh/orders_b")
      .saveAsTable("orders_b")
    scan(spark, sf001, "customer")
      .withColumnRenamed("c_custkey", "o_custkey")
      .write.mode("overwrite")
      .bucketBy(8, "o_custkey").sortBy("o_custkey")
      .option("path", s"$wh/customer_b")
      .saveAsTable("customer_b")

    val joined = spark.table("orders_b").join(spark.table("customer_b"), "o_custkey")
    // disable broadcast so the bucketed SMJ path is what gets planned
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = joined.queryExecution.executedPlan.toString()
      assert(!plan.contains("Exchange hashpartitioning"), plan.take(3000))
      // and it's still the correct join result
      val expected = scan(spark, sf001, "orders")
        .join(scan(spark, sf001, "customer"),
          col("o_custkey") === col("c_custkey")).count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }
}
