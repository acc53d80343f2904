package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift census between two snapshots of the same relation
  * — the ingest monitor a production pipeline runs before letting a new
  * batch of data into the training mix (the third data-quality leg next
  * to integrity/q_dq_orphans and uniqueness/q_dq_dupes).
  *
  * Fixed-bin histogram over a declared [lo, hi) range (bin edges are
  * CONSTANTS, so two engines — and two runs months apart — bin
  * identically; a quantile-derived binning would drift with the data it
  * is supposed to audit), per-bin shares in floor-ppm, and the per-bin
  * absolute share difference whose half-sum is the total-variation
  * distance. TVD instead of PSI/KL: those need ln(), which is not
  * bit-portable across engines; TVD is exact integer arithmetic and
  * bounds every event-probability shift directly (|P(A)−Q(A)| ≤ TVD).
  *
  * Scale: one map-side-combinable groupBy per snapshot to nBins rows,
  * then bin-dimension joins — nothing downstream of the histograms
  * touches the data again. At 100 TB the two counts are the whole cost.
  */
object Drift {

  /** Bin id for `v` in [lo, hi) split into nBins equal bins; values
    * outside clamp to the edge bins (a drifting tail lands in bin 0 or
    * nBins-1 and is COUNTED, never dropped).
    */
  def binOf(v: Column, lo: Double, hi: Double, nBins: Int): Column = {
    val width = (hi - lo) / nBins
    least(lit(nBins - 1), greatest(lit(0),
      floor((v.cast("double") - lit(lo)) / lit(width)).cast("int"))).cast("long")
  }

  /** (bin, n) histogram of `value` under the fixed binning — the
    * ADDITIVE unit the incremental path persists per batch: histograms
    * of disjoint slices sum to the histogram of their union, so a
    * snapshot's census never rescans data, only re-sums nBins-row
    * relations.
    */
  def histogram(df: DataFrame, value: Column,
                lo: Double, hi: Double, nBins: Int): DataFrame = {
    require(nBins >= 2 && hi > lo, s"histogram: bad binning [$lo, $hi) x $nBins")
    df.select(binOf(value, lo, hi, nBins).as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as("n"))
  }

  /** Census over two PRECOMPUTED (bin, n) histograms — the join/share
    * arithmetic shared by the batch and incremental paths.
    */
  def censusOfHists(baseHist: DataFrame, curHist: DataFrame): DataFrame = {
    val joined = baseHist.select(col("bin"), col("n").as("n_base"))
      .join(curHist.select(col("bin"), col("n").as("n_cur")), Seq("bin"), "full_outer")
      .select(col("bin"),
        coalesce(col("n_base"), lit(0L)).as("n_base"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    val totals = joined.agg(sum(col("n_base")).as("__tb"), sum(col("n_cur")).as("__tc"))
    joined.crossJoin(broadcast(totals)) // 1-row scalar — the allowed shape
      .withColumn("base_ppm", expr("n_base * 1000000 div greatest(__tb, 1)"))
      .withColumn("cur_ppm", expr("n_cur * 1000000 div greatest(__tc, 1)"))
      .withColumn("diff_ppm", abs(col("base_ppm") - col("cur_ppm")))
      .drop("__tb", "__tc")
  }

  /** Per-bin drift census: (bin, n_base, n_cur, base_ppm, cur_ppm,
    * diff_ppm), occupied bins only, floor-ppm shares. TVD in ppm =
    * sum(diff_ppm)/2 (left to the consumer so the relation stays
    * per-bin).
    */
  def driftCensus(base: DataFrame, current: DataFrame, value: Column,
                  lo: Double, hi: Double, nBins: Int): DataFrame =
    censusOfHists(
      histogram(base, value, lo, hi, nBins),
      histogram(current, value, lo, hi, nBins))

  /** Population Stability Index census over two PRECOMPUTED (bin, n)
    * histograms — the ln() the TVD census deliberately avoided, via the
    * staged fixed-point log (UlmTokenizer.costStages, shared bit-exact
    * with the DuckDB oracle). Shares floored at 1 ppm (the Laplace
    * guard — an empty bin would send PSI to ∞); per bin dlog_cb =
    * round(100·log2(max/min share)) and psi_term = |p−q|·dlog_cb, so
    * PSI in bits = Σ terms / 1e8 (·ln 2 for nats). The log runs on
    * nBins rows — cost lives entirely in the two histogram passes,
    * which the streaming twin pays per micro-batch as additive
    * partials. */
  def psiOfHists(baseHist: DataFrame, curHist: DataFrame): DataFrame = {
    var c = censusOfHists(baseHist, curHist)
      .withColumn("pp", greatest(col("base_ppm"), lit(1L)))
      .withColumn("qq", greatest(col("cur_ppm"), lit(1L)))
      .withColumn("rmax", greatest(col("pp"), col("qq")))
      .withColumn("rmin", least(col("pp"), col("qq")))
    UlmTokenizer.costStages("rmax", "rmin", UlmTokenizer.Spark).foreach {
      case (n, e) => c = c.withColumn(n, expr(e))
    }
    val p = c.select(col("bin"), col("n_base"), col("n_cur"),
      col("base_ppm"), col("cur_ppm"), col("cost_cb").as("dlog_cb"),
      (abs(col("pp") - col("qq")) * col("cost_cb")).as("psi_term"))
    val tot = p.agg(sum(col("psi_term")).as("psi_total"))
    p.crossJoin(broadcast(tot)).orderBy(col("bin"))
  }
}
