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
}
