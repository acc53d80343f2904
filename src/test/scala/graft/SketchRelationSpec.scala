package graft

import org.apache.spark.sql.functions._
import graft.ops.{BitmapIndex, Hll}

/** Relational-sketch laws for the round-12 distinct-count tier: the
  * bitmap index is EXACT and OR-merge idempotent; the HLL register
  * table is max-merge mergeable (any split of the input yields the
  * identical 64-register sketch) and its estimate lands within the
  * coarse m=64 error envelope on a known-cardinality set.
  */
class SketchRelationSpec extends SparkSpec {
  import spark.implicits._

  test("bitmap census counts exactly, set ops included") {
    val ev = Seq.tabulate(500)(i => ("view", (i % 200).toLong)) ++
      Seq.tabulate(300)(i => ("purchase", (i % 90 + 150).toLong))
    val df = ev.toDF("event_type", "user_id")
    val out = BitmapIndex.census(BitmapIndex.bitmap(df, "event_type", "user_id"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out("view")._1 == 200)
    assert(out("purchase")._1 == 90)
    // purchase ids 150..239 overlap view ids 0..199 on 150..199
    assert(out("view_and_purchase")._1 == 50)
    assert(out("view_or_purchase")._1 == 240)
  }

  test("bitmap OR-merge is idempotent: duplicated partials change nothing") {
    val df = Seq.tabulate(64)(i => ("view", i.toLong)).toDF("event_type", "user_id")
    val once = BitmapIndex.bitmap(df, "event_type", "user_id")
    val doubled = once.unionAll(once)
      .groupBy(col("t"), col("w")).agg(expr("bit_or(bits)").as("bits"))
    assert(BitmapIndex.census(doubled).collect().toSeq ==
      BitmapIndex.census(once).collect().toSeq)
  }

  test("HLL registers merge identically under any input split") {
    val items = (0L until 5000L).map(i => s"user-$i")
    val whole = Hll.registers(items.toDF("x"), "x")
    val (a, b) = items.splitAt(1234)
    val merged = Hll.registers(a.toDF("x"), "x")
      .unionAll(Hll.registers(b.toDF("x"), "x"))
      .groupBy(col("reg")).agg(max(col("mr")).as("mr"))
    assert(merged.orderBy("reg").collect().toSeq ==
      whole.orderBy("reg").collect().toSeq)
    // replay idempotence: merging the whole sketch with itself is a no-op
    val replayed = whole.unionAll(whole)
      .groupBy(col("reg")).agg(max(col("mr")).as("mr"))
    assert(replayed.orderBy("reg").collect().toSeq ==
      whole.orderBy("reg").collect().toSeq)
  }

  test("HLL estimate lands inside the coarse m=64 envelope on 5000 distinct") {
    val est = Hll.estimate(Hll.registers(
        (0L until 5000L).map(i => s"user-$i").toDF("x"), "x"))
      .select(col("hll_est")).collect()(0).getLong(0)
    // 1.04/sqrt(64) ~ 13% std error; 4 sigma is a deterministic-fixture
    // bound here (the hash is fixed, so this is a regression pin, not a
    // probabilistic claim)
    assert(est > 3000 && est < 7500, s"estimate $est implausible for 5000")
  }

  test("HLL linear-counting branch: tiny cardinalities route through it") {
    val one = Hll.estimate(Hll.registers(Seq("a", "b", "c").toDF("x"), "x"))
      .collect()(0)
    val estRaw = one.getAs[Long]("est_raw")
    val hll = one.getAs[Long]("hll_est")
    val lin = one.getAs[Long]("est_lin")
    assert(estRaw <= 160 && hll == lin,
      s"expected the linear-counting branch: raw=$estRaw est=$hll lin=$lin")
  }

  test("bloom filter: no false negatives, OR-merge equals one-shot build") {
    import graft.ops.FreqSketches
    val items = (0 until 600).map(i => s"tok$i")
    val whole = FreqSketches.bloomSketch(items.toDF("x"), "x", 3, 4096)
    // every member probes positive — the theorem, not a tolerance
    val hits = FreqSketches.bloomTest(whole, items.toDF("x"), "x", 3, 4096)
      .agg(min(col("hit"))).collect()(0).getLong(0)
    assert(hits == 1L, "a member probed negative")
    // split-and-merge law: partials from any split OR to the same words
    val (a, b) = items.splitAt(123)
    val merged = FreqSketches.bloomSketch(a.toDF("x"), "x", 3, 4096)
      .unionAll(FreqSketches.bloomSketch(b.toDF("x"), "x", 3, 4096))
      .groupBy(col("w")).agg(expr("bit_or(bits)").as("bits"))
    assert(merged.orderBy(col("w")).collect().toSeq ==
      whole.orderBy(col("w")).collect().toSeq, "merge law broken")
  }

  test("bloom fill is bounded by k x members and FPR stays plausible") {
    import graft.ops.FreqSketches
    val items = (0 until 400).map(i => s"tok$i")
    val census = FreqSketches.bloomCensus(
      FreqSketches.bloomSketch(items.toDF("x"), "x", 3, 4096),
      items.toDF("x"), "x", 3, 4096).collect()(0)
    assert(census.getAs[Long]("n_members") == 400)
    val bits = census.getAs[Long]("n_set_bits")
    assert(bits <= 1200 && bits >= 600, s"fill $bits implausible for 400x3")
    assert(census.getAs[Boolean]("no_false_negatives"))
    // fill ~25% -> per-probe FP chance ~1.6%; 200 probes, deterministic
    // fixture: a generous regression pin, not a probabilistic claim
    assert(census.getAs[Long]("n_false_pos") <= 20)
  }

  test("grouped bloom cells: one filter per language, theorem holds per group") {
    val rows = graft.queries.SqlFunctionQueries
      .queries("q_agg_bloom_grouped")(spark, sf001).collect()
    assert(rows.length >= 2, "expected one cell per language")
    rows.foreach { r =>
      assert(r.getAs[Boolean]("no_false_negatives"),
        s"member probed negative in ${r.getAs[String]("lang")}")
      assert(r.getAs[Long]("n_set_bits") <= 3 * r.getAs[Long]("n_members"),
        "fill exceeds k x members")
      assert(r.getAs[Long]("fpr_ppm") <= 1000000L)
    }
  }
}
