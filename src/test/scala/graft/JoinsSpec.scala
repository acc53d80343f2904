package graft

import org.apache.spark.sql.functions._
import graft.ops.Joins

/** Hand-built small cases for the custom join operators (the oracle
  * queries cover them on real data; these pin edge semantics).
  */
class JoinsSpec extends SparkSpec {
  import spark.implicits._

  test("asofBackward: latest right row at-or-before left time, per key") {
    val trades = Seq((1L, 10L, "t1"), (1L, 25L, "t2"), (2L, 5L, "t3"))
      .toDF("k", "t", "trade")
    val quotes = Seq((1L, 5L, 100.0), (1L, 10L, 101.0), (1L, 20L, 102.0), (2L, 9L, 50.0))
      .toDF("qk", "qt", "px")

    val out = Joins.asofBackward(trades, quotes, "k", "qk", "t", "qt",
      rightPayload = Seq("px"), tiebreak = "qt")
      .orderBy("k", "t")
      .select("trade", "px").as[(String, Double)].collect().toSeq

    // t1@10 matches quote@10 (<= is inclusive); t2@25 matches quote@20;
    // t3@5 has no quote at-or-before for key 2 → dropped
    assert(out == Seq(("t1", 101.0), ("t2", 102.0)))
  }

  test("asofBackward: right-side time ties resolved by max tiebreak") {
    val l = Seq((1L, 10L)).toDF("k", "t")
    val r = Seq((1L, 10L, 1L, "a"), (1L, 10L, 2L, "b")).toDF("qk", "qt", "id", "v")
    val out = Joins.asofBackward(l, r, "k", "qk", "t", "qt", Seq("v"), tiebreak = "id")
      .select("v").as[String].collect().toSeq
    assert(out == Seq("b"))
  }

  test("intervalJoin: equals naive overlap join, each pair exactly once") {
    // intervals wide enough to span 3+ bins at binWidth=4 — the
    // left-edge-bin residual must still emit each overlapping pair once
    val a = Seq((1L, 0L, 10L), (2L, 5L, 6L), (3L, 20L, 35L), (4L, 40L, 41L))
      .toDF("aid", "a_lo", "a_hi")
    val b = Seq((10L, 8L, 25L), (20L, 34L, 50L), (30L, 11L, 19L))
      .toDF("bid", "b_lo", "b_hi")
    val got = Joins.intervalJoin(a, "a_lo", "a_hi", b, "b_lo", "b_hi", binWidth = 4L)
      .select("aid", "bid").as[(Long, Long)].collect().toSeq
    val naive = a.crossJoin(b)
      .filter(col("a_lo") <= col("b_hi") && col("b_lo") <= col("a_hi"))
      .select("aid", "bid").as[(Long, Long)].collect().toSeq
    assert(got.sorted == naive.sorted, s"got=$got naive=$naive")
    assert(got.size == got.toSet.size, s"duplicate pairs: $got")
    // pin the expected pairs: endpoints are inclusive (3 touches 20 at
    // b=10's hi=25 ∩ [20,35]; 4's [40,41] ∩ [34,50])
    assert(got.toSet == Set((1L, 10L), (3L, 10L), (3L, 20L), (4L, 20L)))
  }

  test("intervalJoin: point intervals and exact endpoint touch match inclusively") {
    val a = Seq((1L, 5L, 5L)).toDF("aid", "a_lo", "a_hi")
    val b = Seq((1L, 5L, 5L), (2L, 6L, 9L)).toDF("bid", "b_lo", "b_hi")
    val got = Joins.intervalJoin(a, "a_lo", "a_hi", b, "b_lo", "b_hi", binWidth = 10L)
      .select("aid", "bid").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 1L)))
  }

  test("rangeJoin: inclusive bounds, intervals spanning multiple bins") {
    val pts = Seq((1, 0.0), (2, 5.0), (3, 10.0), (4, 10.5), (5, 99.0)).toDF("id", "v")
    val ivs = Seq(("a", 0.0, 10.0), ("b", 10.0, 20.0)).toDF("name", "lo", "hi")
    val out = Joins.rangeJoin(pts, "v", ivs, "lo", "hi", binWidth = 3.0)
      .select("id", "name").as[(Int, String)].collect().toSet
    assert(out == Set((1, "a"), (2, "a"), (3, "a"), (3, "b"), (4, "b")))
  }

  test("rangeJoin plan is an equi-join on the bin, not a nested-loop join") {
    val c = graft.engine.QueryBuilder.scan(spark, sf001, "customer")
    val bands = graft.engine.QueryBuilder.scan(spark, sf001, "nation")
      .select(col("n_nationkey"), (col("n_nationkey") * 400.0).as("lo"),
        (col("n_nationkey") * 400.0 + 399.0).as("hi"))
    val plan = Joins.rangeJoin(c, "c_acctbal", bands, "lo", "hi", 250.0)
      .queryExecution.executedPlan.toString()
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
