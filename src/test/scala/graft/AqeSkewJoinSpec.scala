package graft

import org.apache.spark.sql.functions._

/** AQE's runtime skew-join splitting — the complement to
  * Joins.saltedJoin: salting handles keys known (or discovered) to be
  * hot; AQE re-plans at runtime when a shuffle partition turns out
  * oversized. Both levers are part of the 100 TB skew story, so the
  * runtime one is pinned here: a 200k-row hot key against a dim join
  * must get its sort-merge partition split (plan marks skew=true).
  */
class AqeSkewJoinSpec extends SparkSpec {

  private def unwrap(p: org.apache.spark.sql.execution.SparkPlan) = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
    case other => other
  }

  test("AQE splits a skewed join partition at runtime (skew=true in the final plan)") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled"
    ).map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force sort-merge
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "100KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

      import spark.implicits._
      // one pathological key (0) with 200k rows ≈ 3 MB in a single
      // shuffle partition; 50 well-behaved keys around it
      val left = spark.range(200000).select(lit(0L).as("k"), $"id".as("v"))
        .union(spark.range(1000).select(($"id" % 50 + 1).as("k"), $"id".as("v")))
      val right = spark.range(51).select($"id".as("k"), ($"id" * 2).as("w"))
      val joined = left.join(right, "k")

      // execute THIS plan (count() would build its own aggregate plan
      // and leave joined.queryExecution unexecuted)
      assert(joined.collect().length == 200000 + 1000) // hot key matches k=0 once
      val planStr = unwrap(joined.queryExecution.executedPlan).toString()
      assert(planStr.contains("skew=true"),
        "AQE did not mark the skewed join:\n" + planStr.take(2000))
    } finally saved.foreach {
      case (key, Some(v)) => conf.set(key, v)
      case (key, None)    => conf.unset(key)
    }
  }
}
