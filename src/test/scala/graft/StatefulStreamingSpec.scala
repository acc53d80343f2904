package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import graft.streaming.StreamOps

/** Custom streaming state via KeyValueGroupedDataset.mapGroupsWithState —
  * the §2.7 extension the reference only gestures at with its unused
  * `schedule` type. Checked against the batch twin for equality.
  */
class StatefulStreamingSpec extends SparkSpec {
  import spark.implicits._

  test("mapGroupsWithState running per-user counts equal the batch groupBy") {
    val events = StreamOps.eventsStream(spark, sf001)
      .select(col("user_id").as[Long], col("value").as[Double])

    val counted = events
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (uid: Long, rows: Iterator[(Long, Double)], state: GroupState[(Long, Double)]) =>
          val (n0, s0) = state.getOption.getOrElse((0L, 0.0))
          var n = n0; var s = s0
          rows.foreach { r => n += 1; s += r._2 }
          state.update((n, s))
          (uid, n)
      }
      .toDF("user_id", "n")

    val q = counted.writeStream
      .format("memory").queryName("mem_state_counts")
      .outputMode(OutputMode.Update())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    // Update mode may emit a row per micro-batch — keep the max (final) count
    val got = spark.table("mem_state_counts")
      .groupBy("user_id").agg(max("n").as("n"))
      .orderBy("user_id").as[(Long, Long)].collect().toSeq

    val want = graft.engine.QueryBuilder.scan(spark, sf001, "events")
      .groupBy("user_id").agg(count(lit(1)).as("n"))
      .orderBy("user_id").as[(Long, Long)].collect().toSeq

    assert(got == want)
  }
}
