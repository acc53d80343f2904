package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Differentially-private aggregate release — the publication side of
  * the privacy tier (k-anonymity measures re-identification risk;
  * pseudonymization protects keys; this protects the RELEASED COUNTS
  * themselves). ε-DP counts via the two-sided geometric mechanism
  * (Ghosh–Roughgarden–Sundararajan 2009, the discrete Laplace): count
  * queries have sensitivity 1, so adding integer noise with
  * P(X = k) ∝ α^|k|, α = e^(-ε), gives ε-DP exactly — no continuous
  * Laplace, no floating-point privacy leaks (Mironov 2012's attack on
  * float Laplace is the published reason to stay in integers).
  *
  * Sampling is deterministic and engine-portable: the per-group uniform
  * is the keyed 60-bit hash u = hex60(md5(salt:group)), and the inverse
  * CDF is evaluated against a PRECOMPUTED THRESHOLD TABLE
  * t_k = floor(CDF(k) · 2^60) for k in [-B, B] (B=64 covers the
  * distribution to ~1e-28 at ε=1): noise(u) = #{k : t_k ≤ u} − B. The
  * table is a 129-row constant computed once on the driver and
  * broadcast; the oracle inlines the SAME numbers, so the release is
  * bit-exact reproducible — which is what a privacy auditor actually
  * wants from a deployed mechanism (same salt ⇒ same release; new salt
  * ⇒ fresh draw). At 100 TB the true counts are one combinable
  * aggregation; the noise join is group-rows × 129 broadcast — metadata
  * cost.
  *
  * Determinism caveat, stated honestly: a keyed-hash draw is a PRNG,
  * not true randomness — DP's guarantee holds against adversaries who
  * don't know the salt, exactly like the salt of [[Pseudonym]].
  */
object DpRelease {

  /** Inclusive noise bound: noise ∈ [-B, B], tail mass beyond B is
    * ~α^B/(1+α) — negligible for ε ≥ 0.25 (α^64 ≈ 1e-7 even at ε=0.25,
    * 1e-28 at ε=1).
    */
  val B = 64

  /** CDF thresholds of the two-sided geometric distribution with
    * α = e^(-ε), scaled to the 60-bit uniform's domain:
    * t(i) = floor(P(X ≤ i - B - 1) · 2^60) for i = 0..2B, i.e. the
    * cumulative mass STRICTLY BELOW noise value k = i - B. The noise
    * for uniform u is #{i : t(i) ≤ u} − B − 1... equivalently
    * noise(u) = #{k ∈ [-B,B] : t_k ≤ u} − (B + 1), with t_{-B} = 0
    * always ≤ u, so the count is ≥ 1 and noise ≥ -B.
    */
  def thresholds(eps: Double): Seq[(Int, Long)] = {
    require(eps > 0, s"eps must be positive, got $eps")
    val a = math.exp(-eps)
    // P(X = k) = (1-a)/(1+a) * a^|k|; accumulate CDF from -B
    val p0 = (1 - a) / (1 + a)
    val masses = (-B to B).map(k => p0 * math.pow(a, math.abs(k)))
    val cum = masses.scanLeft(0.0)(_ + _).dropRight(1) // CDF strictly below k
    (-B to B).zip(cum).map { case (k, c) =>
      k -> math.min((c * math.pow(2, 60)).toLong, (1L << 60) - 1)
    }
  }

  /** The deterministic per-group uniform draw in [0, 2^60). */
  def uniform(groupKey: Column, salt: String): Column =
    Dedup.hex60(md5(concat(lit(salt), lit(":"), groupKey.cast("string")).cast("binary")))

  /** ε-DP noisy counts per group: `df.groupBy(groupCol).count()` plus
    * two-sided geometric noise drawn from the keyed hash of the group
    * value. Output: (group, n_noisy) — the TRUE count never leaves the
    * operator. Floors at zero (a released count below 0 is pure noise).
    */
  def noisyCount(df: DataFrame, groupCol: String, salt: String, eps: Double): DataFrame = {
    // noise(u) = #{k : t_k ≤ u} − (B+1), unrolled into one codegen'd
    // sum of comparisons — a map-only projection over the group-sized
    // count relation (no join, not even a broadcast one, in the plan)
    val noiseOf: Column => Column = u =>
      thresholds(eps).map { case (_, t) => when(lit(t) <= u, 1L).otherwise(0L) }
        .reduce(_ + _) - (B + 1)
    df.groupBy(col(groupCol).as("grp"))
      .agg(count(lit(1)).as("n_true"))
      .withColumn("u", uniform(col("grp"), salt))
      .select(col("grp"),
        greatest(col("n_true") + noiseOf(col("u")), lit(0L)).cast("long").as("n_noisy"))
  }

  /** The threshold table as SQL VALUES rows — the oracle inlines the
    * exact numbers the engine used, making the release replayable.
    */
  def sqlThresholdRows(eps: Double): String =
    thresholds(eps).map { case (k, t) => s"($k, ${t}::BIGINT)" }.mkString(", ")
}
