package graft

import org.apache.spark.sql.functions._
import graft.ops.Merge

class MergeSpec extends SparkSpec {
  import spark.implicits._

  private def state(rows: (Long, Int, String)*) = rows.toDF("k", "ver", "val")

  test("upsert: delta overwrites base per key, new keys insert, absent keys survive") {
    val base = state((1L, 1, "a1"), (2L, 1, "b1"))
    val delta = state((1L, 2, "a2"), (3L, 1, "c1"))
    val out = Merge.upsert(base, delta, Seq("k"), Seq("ver"))
      .as[(Long, Int, String)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, 2, "a2"), (2L, 1, "b1"), (3L, 1, "c1")))
  }

  test("upsert: associative — batched deltas equal one combined delta") {
    val base = state((1L, 1, "a1"))
    val d1 = state((1L, 2, "a2"), (2L, 1, "b1"))
    val d2 = state((1L, 3, "a3"), (2L, 2, "b2"))
    val stepwise = Merge.upsert(Merge.upsert(base, d1, Seq("k"), Seq("ver")), d2, Seq("k"), Seq("ver"))
    val combined = Merge.upsert(base, d1.unionByName(d2), Seq("k"), Seq("ver"))
    assert(stepwise.as[(Long, Int, String)].collect().toSet ==
      combined.as[(Long, Int, String)].collect().toSet)
  }

  test("upsert: version ties resolved deterministically by remaining columns") {
    val base = state((1L, 1, "x"))
    val delta = state((1L, 1, "z"), (1L, 1, "y"))
    val out = Merge.upsert(base, delta, Seq("k"), Seq("ver")).as[(Long, Int, String)].collect()
    assert(out.toSeq == Seq((1L, 1, "z"))) // struct max totally orders all cols
  }

  test("upsert: idempotent under batch replay (foreachBatch redelivery safety)") {
    // a streaming sync may re-apply a batch after failure; latest-wins
    // must make the replay a no-op
    val base = state((1L, 1, "a1"), (2L, 2, "b2"))
    val b = state((1L, 2, "a2"), (3L, 1, "c1"))
    val once = Merge.upsert(base, b, Seq("k"), Seq("ver"))
    val twice = Merge.upsert(once, b, Seq("k"), Seq("ver"))
    // sorted-seq compare (not a set): replay must not even duplicate rows
    assert(once.as[(Long, Int, String)].collect().sorted.toSeq ==
      twice.as[(Long, Int, String)].collect().sorted.toSeq)
  }

  test("keepExtremum: null payload sorts LOWEST (the documented NULLS FIRST contract)") {
    // Spark struct ordering: null < any value. On a leading-column tie,
    // min keeps the null payload, max keeps the non-null one — the
    // contract any SQL oracle twin must spell as NULLS FIRST.
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("k", LongType), StructField("ver", IntegerType),
      StructField("v", StringType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L, 1, null), Row(1L, 1, "x"))), schema)
    val mn = Merge.keepExtremum(df, Seq("k"), leading = Nil, takeMax = false)
      .as[(Long, Int, Option[String])].collect().toSeq
    val mx = Merge.keepExtremum(df, Seq("k"), leading = Nil, takeMax = true)
      .as[(Long, Int, Option[String])].collect().toSeq
    assert(mn == Seq((1L, 1, None)), s"min should keep the null payload, got $mn")
    assert(mx == Seq((1L, 1, Some("x"))), s"max should keep the non-null payload, got $mx")
  }

  test("retractExtremaState: interior delete keeps state; extremum delete recomputes; emptied key drops") {
    // base per key: k1 -> {1,5,9}, k2 -> {2,8}, k3 -> {4}
    val rows = Seq((1L, 1.0), (1L, 5.0), (1L, 9.0), (2L, 2.0), (2L, 8.0), (3L, 4.0))
      .toDF("k", "v")
    val state = rows.groupBy(col("k"))
      .agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
    // deletes: k1's interior 5 (no extremum move), k2's max 8 (recompute),
    // k3's only row (key vanishes)
    val dels = Seq((1L, 5.0), (2L, 8.0), (3L, 4.0)).toDF("k", "v")
    val remaining = rows.except(dels)
    val out = Merge.retractExtremaState(state, dels, remaining, Seq("k"), "v")
      .as[(Long, Double, Double)].collect().sortBy(_._1).toSeq
    assert(out == Seq((1L, 1.0, 9.0), (2L, 2.0, 2.0)))
  }

  test("retractExtremaState: N-batch IVM loop stays correct and leaks no per-batch persists") {
    spark.catalog.clearCache()
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val rows = (1 to 400).map(i => ((i % 20).toLong, i.toDouble)).toDF("k", "v").persist()
    var state = rows.groupBy(col("k")).agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
    var remaining = rows.toDF()
    val batches = 5
    for (b <- 1 to batches) {
      val dels = remaining.filter(col("v") % 7.0 === b.toDouble)
      remaining = remaining.filter(!(col("v") % 7.0 === b.toDouble))
      state = Merge.retractExtremaState(state, dels, remaining, Seq("k"), "v")
      state.count() // materialize per batch, as a streaming IVM caller would
    }
    // semantics: after N delete batches the maintained state equals a
    // from-scratch recompute over the surviving base
    val expect = remaining.groupBy(col("k"))
      .agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
      .as[(Long, Double, Double)].collect().toSet
    assert(state.as[(Long, Double, Double)].collect().toSet == expect)
    // storage: the only residency growth is the bounded one-localCheckpoint-
    // per-batch state chain (+1 for `rows` above), reclaimed by the context
    // cleaner as superseded states go out of scope. A leaked per-batch
    // persist inside retractExtremaState (its `joined` working set) would
    // register a SECOND rdd per batch and trip this bound.
    val leaked = (spark.sparkContext.getPersistentRDDs.keySet -- before).size
    assert(leaked <= batches + 1,
      s"$leaked persisted RDDs accumulated over $batches batches (bound: ${batches + 1})")
    rows.unpersist()
  }

  test("mergeExtremaState: insert batch folds into min/max state") {
    val st = Seq((1L, 2.0, 7.0)).toDF("k", "mn", "mx")
    val ins = Seq((1L, 1.0, 3.0), (2L, 5.0, 5.0)).toDF("k", "mn", "mx")
    val out = Merge.mergeExtremaState(st, ins, Seq("k"))
      .as[(Long, Double, Double)].collect().sortBy(_._1).toSeq
    assert(out == Seq((1L, 1.0, 7.0), (2L, 5.0, 5.0)))
  }

  test("deltaJoin: seeded random splits satisfy J_old ∪ ΔJ == full join") {
    import spark.implicits._
    val rnd = new scala.util.Random(77)
    val a = Seq.fill(200)((rnd.nextInt(30).toLong, rnd.nextInt(1000))).toDF("k", "av")
    val b = Seq.fill(80)((rnd.nextInt(30).toLong, rnd.nextInt(100).toString)).toDF("k", "bv")
    val full = a.join(b, Seq("k")).as[(Long, Int, String)].collect().groupBy(identity)
      .view.mapValues(_.length).toMap
    // any split of each side into (old, delta)
    (1 to 3).foreach { s =>
      val aOld = a.filter(col("av") % 3 =!= s % 3); val dA = a.filter(col("av") % 3 === s % 3)
      val bOld = b.filter(col("k") % 2 === s % 2);  val dB = b.filter(col("k") % 2 =!= s % 2)
      val maintained = aOld.join(bOld, Seq("k"))
        .unionByName(Merge.deltaJoin(aOld, dA, bOld, dB, Seq("k")))
        .as[(Long, Int, String)].collect().groupBy(identity).view.mapValues(_.length).toMap
      assert(maintained == full, s"split $s diverged (multiset compare)")
    }
  }

  test("scd2: contiguous intervals, one open-ended current row per key") {
    val ch = state((1L, 1, "a"), (1L, 3, "b"), (1L, 7, "c"), (2L, 5, "z"))
    val out = Merge.scd2(ch, Seq("k"), "ver", "val")
      .select(col("k"), col("valid_from"), col("valid_to"), col("is_current"))
      .as[(Long, Int, Option[Int], Boolean)].collect().sortBy(r => (r._1, r._2))
    assert(out.toSeq == Seq(
      (1L, 1, Some(3), false), (1L, 3, Some(7), false), (1L, 7, None, true),
      (2L, 5, None, true)))
  }

  test("checksum manifest maintenance round-trips: delete ⊕ reinsert = identity") {
    import org.apache.spark.sql.functions._
    val d = "/root/testdata/sf0.001"
    val docs = graft.engine.QueryBuilder.scan(spark, d, "documents")
    def manifest(df: org.apache.spark.sql.DataFrame) = df
      .select(col("source"), graft.ops.Dedup.hex60(md5(concat(col("doc_id").cast("string"),
        lit(":"), col("text")).cast("binary"))).as("h"))
      .groupBy(col("source")).agg(count(lit(1)).as("n"), expr("bit_xor(h)").as("x"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val base = manifest(docs)
    val delta = manifest(docs.filter(col("doc_id") % 10 === 2))
    // apply the delete, then re-apply the same batch as an insert
    val after = base.map { case (s, (n, x)) =>
      val (nd, xd) = delta.getOrElse(s, (0L, 0L))
      s -> (n - nd + nd, x ^ xd ^ xd)
    }
    assert(after == base, "xor maintenance is not an involution")
    // and the maintained query itself equals a from-scratch recompute
    val maintained = graft.queries.MergeQueries.queries("q_ivm_checksum")(spark, d)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val recompute = docs.filter(col("doc_id") % 10 =!= 2)
      .select(col("source"), col("n_chars"),
        graft.ops.Dedup.hex60(md5(concat(col("doc_id").cast("string"),
          lit(":"), col("text")).cast("binary"))).as("h"))
      .groupBy(col("source")).agg(count(lit(1)).as("n"),
        expr("bit_xor(h)").as("x"), sum("n_chars").as("b"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(maintained == recompute, "maintained manifest != from-scratch recompute")
  }
}
