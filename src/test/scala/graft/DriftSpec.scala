package graft

import org.apache.spark.sql.functions._
import graft.ops.Drift

/** Drift-census invariants on crafted snapshots: constant-edge binning
  * with edge clamping (tails are counted, never dropped), floor-ppm
  * shares, identical snapshots → zero drift, and the empty-side guard.
  */
class DriftSpec extends SparkSpec {
  import spark.implicits._

  private def census(base: Seq[Double], cur: Seq[Double]) =
    Drift.driftCensus(base.toDF("v"), cur.toDF("v"), col("v"),
        lo = 0.0, hi = 100.0, nBins = 10)
      .collect().map(r => r.getAs[Long]("bin") ->
        (r.getAs[Long]("n_base"), r.getAs[Long]("n_cur"),
          r.getAs[Long]("base_ppm"), r.getAs[Long]("cur_ppm"),
          r.getAs[Long]("diff_ppm"))).toMap

  test("identical snapshots drift zero; shares are floor-ppm") {
    val xs = Seq(5.0, 15.0, 15.0) // bins 0, 1, 1
    val out = census(xs, xs)
    assert(out.keySet == Set(0L, 1L))
    assert(out(0L) == ((1L, 1L, 333333L, 333333L, 0L)))
    assert(out(1L) == ((2L, 2L, 666666L, 666666L, 0L)))
  }

  test("out-of-range tails clamp to edge bins and are counted") {
    val out = census(Seq(-50.0, 1e9), Seq(50.0))
    assert(out(0L)._1 == 1L && out(9L)._1 == 1L) // both tails landed
    assert(out.values.map(_._1).sum == 2L)
    // TVD in ppm = half the diff sum: base {0:.5, 9:.5} vs cur {5:1.0}
    assert(out.values.map(_._5).sum / 2 == 1000000L)
  }

  test("empty side yields zero shares, not a division error") {
    val out = census(Seq.empty, Seq(42.0))
    assert(out(4L) == ((0L, 1L, 0L, 1000000L, 1000000L)))
  }
}
