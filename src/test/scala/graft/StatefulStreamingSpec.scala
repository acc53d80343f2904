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

  test("eventsStream staging survives a REGENERATED source (dangling links swept, retargeted)") {
    import java.nio.file.{Files, Paths}
    val root = Files.createTempDirectory("graft_regen_test")
    val tbl = root.resolve("events.parquet")
    // generation 1: single-file layout
    Files.copy(Paths.get(s"$sf001/events.parquet"), tbl)
    StreamOps.eventsStream(spark, root.toString) // stages the symlink
    // regenerate: same table path, DIRECTORY layout with a new part name
    Files.delete(tbl)
    Files.createDirectories(tbl)
    Files.copy(Paths.get(s"$sf001/events.parquet"),
      tbl.resolve("part-00000-regen-c000.snappy.parquet"))
    // the old link now dangles — restaging must neither throw nor leave it
    StreamOps.eventsStream(spark, root.toString)
    val staged = Paths.get(StreamOps.streamSourceDir(root.toString))
    val ls = Files.list(staged)
    val links = try {
      import scala.jdk.CollectionConverters._
      ls.iterator().asScala.toList
    } finally ls.close()
    assert(links.nonEmpty && links.forall(Files.exists(_)), s"dangling links remain: $links")
  }

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

  test("flatMapGroupsWithState sessions: cross-batch merge, watermark-proven emission, open tail retained") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Long)] // (user_id, event-time seconds)
    val events = input.toDF().toDF("user_id", "sec")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val sessions = StreamOps.sessionizeCustomState(spark, events, gapSeconds = 10)
    val q = sessions.writeStream
      .format("memory").queryName("mem_fmgws_sessions")
      .outputMode(OutputMode.Append())
      .start()
    // batch 1: user 1 opens a session {100, 105}
    input.addData((1L, 100L), (1L, 105L))
    q.processAllAvailable()
    // batch 2: 112 is within the 10s gap of 105 — the session must merge
    // ACROSS batches (state, not batch-local grouping); user 2's far event
    // pushes the watermark to 1000 for the next batch
    input.addData((1L, 112L), (2L, 1000L))
    q.processAllAvailable()
    // batch 3: watermark (1000) has passed 112+10 → user 1's session is
    // provably final and must emit exactly once, as [100, 112] × 3 events
    input.addData((2L, 2000L))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("mem_fmgws_sessions")
      .select(col("user_id"),
        (unix_micros(col("session_start")) / 1000000L).cast("long"),
        (unix_micros(col("session_end")) / 1000000L).cast("long"), col("n_events"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(out.contains((1L, 100L, 112L, 3L)), s"cross-batch session missing/wrong: $out")
    assert(!out.exists(r => r._1 == 2L && r._2 == 2000L),
      s"open tail (user 2 @2000) leaked before the watermark proved it final: $out")
  }

  test("dropDuplicatesWithinWatermark bounds state: key re-emitted after eviction") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(String, Long)] // (key, event-time seconds)

    val deduped = input.toDF().toDF("k", "sec")
      .withColumn("ts", timestamp_seconds(col("sec")))
      .withWatermark("ts", "10 seconds")
      .dropDuplicatesWithinWatermark(Seq("k"))
      .select("k", "sec")

    val q = deduped.writeStream
      .format("memory").queryName("mem_dedup_evict")
      .outputMode(OutputMode.Append())
      .start()

    // batch 1: first sighting of "a" → emitted; watermark → 990
    input.addData(("a", 1000L))
    q.processAllAvailable()
    // batch 2: duplicate "a" inside the horizon → suppressed; "b" far in
    // the future advances the watermark to 49990, past a's expiry (1010)
    input.addData(("a", 1005L), ("b", 50000L))
    q.processAllAvailable()
    // batch 3: "a" again — its state was EVICTED, so it re-emits. An
    // unbounded dropDuplicates would suppress this forever (and keep
    // every key in the store forever — the 100 TB failure mode)
    input.addData(("a", 60000L))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("mem_dedup_evict").collect()
      .map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    assert(out == Seq(("a", 1000L), ("a", 60000L), ("b", 50000L)),
      s"got $out — expected a emitted twice (state evicted between)")

    // progress metrics corroborate eviction: rows were REMOVED from the
    // state store, not only added
    val removed = q.recentProgress.flatMap(p => Option(p.stateOperators))
      .flatten.map(_.numRowsRemoved).sum
    assert(removed > 0, "state store never evicted a row")
  }

  test("watermark late-data audit: dropped rows are counted and excluded, on-time windows intact") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Long] // event-time seconds

    val agg = input.toDF().toDF("sec")
      .withColumn("ts", timestamp_seconds(col("sec")))
      .withWatermark("ts", "300 seconds")
      .groupBy(window(col("ts"), "60 seconds").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").cast("long").as("w_start"), col("n"))

    val q = agg.writeStream
      .format("memory").queryName("mem_late_audit")
      .outputMode(OutputMode.Append())
      .start()

    // batch 1: minutes 36000(×2), 36060, 36540 → watermark 36540-300 = 36240
    input.addData(36000L, 36010L, 36060L, 36540L)
    q.processAllAvailable()
    // batch 2: THREE late windows (34800/35100/35400 — each window end
    // < 36240) → dropped and COUNTED. Distinct windows on purpose: the
    // metric counts STATE-OPERATOR input rows, i.e. post-partial-
    // aggregation window partials, not raw events — three events in one
    // late window would count once (see droppedByWatermark's doc). One
    // on-time row at 36300; one at 37800 advances the watermark to 37500
    input.addData(34800L, 35100L, 35400L, 36300L, 37800L)
    q.processAllAvailable()
    // batch 3: advance the watermark to 39300 so every surviving window
    // (incl. 37800's) flushes in append mode
    input.addData(39600L)
    q.processAllAvailable()
    q.stop()

    assert(StreamOps.droppedByWatermark(q) == 3L,
      s"expected exactly the 3 late rows counted, got ${StreamOps.droppedByWatermark(q)}")
    val out = spark.table("mem_late_audit").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // late rows excluded: no late window resurrected, on-time intact
    assert(Seq(34800L, 35100L, 35400L).forall(!out.contains(_)),
      s"late window materialized: $out")
    assert(out == Map(36000L -> 2L, 36060L -> 1L, 36540L -> 1L,
      36300L -> 1L, 37800L -> 1L), s"window counts wrong: $out")
  }

  test("custom-state sessions identical on HDFS-backed and RocksDB state stores") {
    // flatMapGroupsWithState keeps arbitrary user state — pin that the
    // large-state backend (RocksDB, spills to disk) produces the exact
    // session set the default heap-backed store does
    def run(name: String): Set[(Long, Long, Long)] =
      StreamOps.runToMemory(spark,
        StreamOps.sessionizeCustomState(spark, StreamOps.eventsStream(spark, sf001), 6 * 3600),
        name, "append")
        .select(col("user_id"), unix_micros(col("session_start")), col("n_events"))
        .as[(Long, Long, Long)].collect().toSet
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    val heap = run("mem_sess_heap")
    try {
      spark.conf.set(key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      val rocks = run("mem_sess_rocks")
      assert(rocks == heap && heap.nonEmpty)
    } finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("stateful streaming runs on the RocksDB state store (large-state backend)") {
    // the default HDFS-backed store keeps all state on the JVM heap; at
    // 100 TB-scale key cardinalities the RocksDB provider spills to
    // local disk — pin that the same query is correct on it
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    try {
      spark.conf.set(key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      val dd = StreamOps.streamDedup(
        StreamOps.eventsStream(spark, sf001), Seq("user_id", "event_type"))
      val got = StreamOps.runToMemory(spark, dd, "mem_dedup_rocks", "append")
        .orderBy("user_id", "event_type")
        .as[(Long, String)].collect().toSeq
      val want = graft.engine.QueryBuilder.scan(spark, sf001, "events")
        .select("user_id", "event_type").distinct()
        .orderBy("user_id", "event_type")
        .as[(Long, String)].collect().toSeq
      assert(got == want && got.nonEmpty)
    } finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }
}
