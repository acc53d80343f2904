package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Poisson bootstrap — distributed uncertainty quantification
  * (Chamandy et al. 2012, "Estimating Uncertainty for Massive Data
  * Streams"; the method Google built for exactly the can't-resample-
  * at-scale problem). The classical bootstrap draws n rows with
  * replacement B times — impossible distributed without B shuffles.
  * The Poisson bootstrap replaces each resample's multinomial counts
  * with independent per-row Poisson(1) weights: every row computes its
  * B weights LOCALLY, and each resample's statistic is a weighted sum
  * — so all B resamples ride ONE combinable aggregation over one scan.
  * No shuffle beyond the aggregate, no data movement, cost O(B) extra
  * codegen'd ops per row.
  *
  * Determinism: like [[DpRelease]], the Poisson draw is an inverse-CDF
  * threshold-table lookup on the keyed 60-bit row hash — the table is
  * a driver-computed constant inlined into the oracle, so the CI is
  * bit-exact reproducible across engines and runs (a property real
  * metric pipelines want: the error bar doesn't jitter between
  * identical reruns).
  */
object Bootstrap {

  /** Poisson(1) weights are truncated at K — P(X > 12) ≈ 5e-14, far
    * below the 2^-60 resolution of the uniform.
    */
  val K = 12

  /** CDF-strictly-below thresholds of Poisson(1), scaled to [0, 2^60):
    * t(k) = floor(P(X < k) · 2^60), k = 0..K; weight(u) =
    * #{k : t_k ≤ u} − 1 (t_0 = 0 always counts, so weight ≥ 0).
    */
  val thresholds: Seq[Long] = {
    val pmf = (0 to K).scanLeft(math.exp(-1.0)) { case (p, k) => p / (k + 1) }
    // pmf(k) = e^-1 / k!  — scanLeft yields e^-1, e^-1/1, e^-1/2!, ...
    val cdfBelow = pmf.take(K + 1).scanLeft(0.0)(_ + _).dropRight(1)
    cdfBelow.map(c => math.min((c * math.pow(2, 60)).toLong, (1L << 60) - 1))
  }

  /** The Poisson(1) weight of `rowKey` in resample `b` — one unrolled
    * codegen'd comparison chain, no join.
    */
  def weight(rowKey: Column, b: Int, salt: String): Column =
    thresholds.map { t =>
      when(lit(t) <= Dedup.hex60(md5(
        concat(lit(s"$salt/$b:"), rowKey.cast("string")).cast("binary"))), 1L)
        .otherwise(0L)
    }.reduce(_ + _) - 1L

  /** DuckDB spelling of [[weight]] given a SQL expression for the
    * 60-bit uniform `u` — the same thresholds, inlined.
    */
  def sqlWeightExpr(u: String): String =
    thresholds.map(t => s"CASE WHEN $t <= $u THEN 1 ELSE 0 END")
      .mkString("(", " + ", " - 1)")

  /** B bootstrap means of `valueScaled` (an exact integer-scaled
    * measure) in ONE aggregation pass: per resample, Σw and Σw·x.
    * Returns a single row holding the point estimate and the sorted
    * resample means — callers slice quantile indices out of the array.
    * All divisions happen on the 1-row aggregate in IEEE doubles.
    */
  def bootstrapMeans(
      df: DataFrame,
      rowKey: Column,
      valueScaled: Column,
      b: Int,
      salt: String
  ): DataFrame = {
    val aggs =
      sum(valueScaled).cast("long").as("sx") +: count(lit(1)).as("n") +:
        (0 until b).flatMap { i =>
          val w = weight(rowKey, i, salt)
          Seq(sum(w).cast("long").as(s"sw_$i"),
            sum(w * valueScaled).cast("long").as(s"swx_$i"))
        }
    df.agg(aggs.head, aggs.tail: _*)
      .withColumn("means", array_sort(array((0 until b).map { i =>
        col(s"swx_$i").cast("double") / col(s"sw_$i").cast("double")
      }: _*)))
      .select(col("n"), col("sx"), col("means"))
  }
}
