package graft

import org.apache.spark.sql.functions._
import graft.engine.QueryBuilder.scan

/** Verification story for the one intentionally oracle-free query:
  * `q_agg_approx_distinct` (HLL++ sketch output is engine-specific, so
  * DuckDB can't hash-match it). Here the sketch is bounded against its
  * exact twin `q_agg_distinct`: every group's estimate must fall within
  * a conservative multiple of the configured rsd.
  */
class SketchSpec extends SparkSpec {

  test("approx_count_distinct is within rated error of exact COUNT(DISTINCT)") {
    val rsd = 0.02
    val exact = scan(spark, sf001, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("exact_parts"))
    val approx = scan(spark, sf001, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey"), rsd).as("approx_parts"))
    val joined = exact.join(approx, "l_returnflag").collect()
    assert(joined.length == 3)
    joined.foreach { r =>
      val (e, a) = (r.getLong(1), r.getLong(2))
      val relErr = math.abs(a - e).toDouble / e
      // HLL++ rsd is a standard deviation — 5σ is a safely deterministic
      // bound for a fixed dataset (the estimate itself is deterministic)
      assert(relErr <= 5 * rsd,
        s"flag ${r.getString(0)}: approx $a vs exact $e (relErr $relErr > ${5 * rsd})")
    }
  }

  test("approx_percentile lands within rank tolerance of the exact percentile") {
    // accuracy 1000 → rank error ≤ n/1000; check the returned value's
    // true rank is within that band of the target rank (the documented
    // GK-sketch guarantee — the q_agg_median exact twin is the oracle)
    val acc = 1000
    val vals = scan(spark, sf001, "lineitem")
      .select(col("l_extendedprice").cast("double").as("v"))
    val n = vals.count()
    val approx = vals.agg(approx_percentile(col("v"), lit(0.5), lit(acc))).head().getDouble(0)
    val rankOfApprox = vals.filter(col("v") <= approx).count()
    val tol = math.max(n / acc, 1L) + 1
    assert(math.abs(rankOfApprox - n / 2) <= tol,
      s"approx median $approx has rank $rankOfApprox, target ${n / 2} ± $tol of $n")
  }

  test("Poisson bootstrap: unit-mean weights, bracketing CI, deterministic") {
    import graft.ops.Bootstrap
    // threshold table: monotone, starts at 0, stays under 2^60
    assert(Bootstrap.thresholds.head == 0L)
    assert(Bootstrap.thresholds == Bootstrap.thresholds.sorted)
    assert(Bootstrap.thresholds.last < (1L << 60))
    val cust = scan(spark, sf001, "customer")
    // per-resample weight mass ≈ n (Poisson(1) has mean 1): within 15%
    val n = cust.count()
    val w0 = cust.select(Bootstrap.weight(col("c_custkey"), 0, "t").as("w"))
    val mass = w0.agg(sum(col("w"))).head().getLong(0)
    assert(math.abs(mass - n) <= n * 15 / 100, s"weight mass $mass vs n $n")
    assert(w0.filter(col("w") < 0).count() == 0)
    // the CI brackets the point estimate, and the whole row is
    // deterministic across reruns
    def run() = graft.queries.ProfileQueries.queries("q_profile_bootstrap")(spark, sf001)
      .head()
    val r = run()
    val (mean, lo, hi) = (r.getLong(1), r.getLong(2), r.getLong(3))
    assert(lo < mean && mean < hi, s"CI [$lo, $hi] does not bracket $mean")
    assert(run() == r, "bootstrap CI not deterministic across reruns")
  }
}
