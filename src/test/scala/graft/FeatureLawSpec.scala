package graft

import graft.queries.{AggQueries, FunnelQueries}

/** Structural laws for the round-13 feature/survival/EMD additions —
  * invariants that hold for any input, checked over the real sf0.001
  * outputs (the oracle pins exact values; these pin the MATH's shape).
  */
class FeatureLawSpec extends SparkSpec {

  test("split scan: partitions tile the relation and the best gain is positive") {
    val rows = AggQueries.queries("q_feature_split")(spark, sf001).collect()
    assert(rows.length == 5)
    val n = graft.engine.QueryBuilder.scan(spark, sf001, "customer").count()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_left") + r.getAs[Long]("n_right") == n)
      assert(r.getAs[Long]("c1_left") <= r.getAs[Long]("n_left"))
      assert(r.getAs[Long]("c1_right") <= r.getAs[Long]("n_right"))
    }
    // rows come back best-first; information gain of the best split is
    // genuinely positive (not just rounding noise: > one centibit unit
    // per row would be ~n — demand a tenth of that)
    assert(rows(0).getAs[Long]("gain_scaled") > n / 10,
      s"best gain ${rows(0).getAs[Long]("gain_scaled")} suspiciously small")
    val gains = rows.map(_.getAs[Long]("gain_scaled")).toSeq
    assert(gains == gains.sorted.reverse)
  }

  test("WoE bins: class masses tile the relation; IV contributions are nonnegative") {
    val rows = AggQueries.queries("q_feature_woe")(spark, sf001).collect()
    val n = graft.engine.QueryBuilder.scan(spark, sf001, "orders").count()
    assert(rows.map(r => r.getAs[Long]("n_good") + r.getAs[Long]("n_bad")).sum == n)
    // (p−q) and woe share a sign analytically; the floor-ppm rate gap
    // can disagree with woe only inside a one-ppm band around zero, so
    // any materially negative contribution is a math bug
    rows.foreach { r =>
      assert(r.getAs[Long]("iv_contrib") >= -math.abs(r.getAs[Long]("woe_cb")),
        s"bin ${r.getString(0)}: iv ${r.getAs[Long]("iv_contrib")}")
    }
  }

  test("survival curve: at-risk and s_cb are nonincreasing; terminal only closes the curve") {
    val rows = FunnelQueries.queries("q_events_survival")(spark, sf001).collect()
    val risk = rows.map(_.getAs[Long]("n_risk")).toSeq
    assert(risk == risk.sorted.reverse, s"at-risk not nonincreasing: $risk")
    val scb = rows.map(_.getAs[Long]("s_cb")).toSeq
    assert(scb.zip(scb.tail).forall { case (a, b) => b <= a },
      s"s_cb not nonincreasing: $scb")
    assert(scb.forall(_ <= 0L), "survival log-prob must be <= 0")
    val terminals = rows.map(_.getAs[Long]("terminal")).toSeq
    assert(terminals.dropRight(1).forall(_ == 0L) && terminals.last == 1L,
      s"terminal flag misplaced: $terminals")
    // deaths exhaust the cohort exactly
    assert(rows.map(_.getAs[Long]("n_deaths")).sum == risk.head)
  }

  test("EMD is zero between a distribution and itself, positive between cohorts") {
    val r = AggQueries.queries("q_agg_emd")(spark, sf001).collect()(0)
    assert(r.getAs[Long]("emd_cents_ppm") > 0L,
      "F/O cohorts have different price distributions; EMD must be > 0")
    // self-distance: rebuild the same statistic with both sides = all
    // orders — every |cum1·n2 − cum2·n1| term is identically zero
    import org.apache.spark.sql.functions._
    val o = graft.engine.QueryBuilder.scan(spark, sf001, "orders").select(
      floor(col("o_totalprice") * 100).cast("long").as("v"))
    val vals = o.groupBy(col("v")).agg(count(lit(1)).as("d"))
    import org.apache.spark.sql.expressions.Window
    val c = vals
      .withColumn("cum", sum(col("d")).over(
        Window.orderBy(col("v")).rowsBetween(Window.unboundedPreceding, 0)))
      .crossJoin(broadcast(vals.agg(sum(col("d")).as("n"))))
      .agg(sum(abs(col("cum") * col("n") - col("cum") * col("n"))).as("z"))
      .collect()(0)
    assert(c.getAs[Long]("z") == 0L)
  }
}
