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
  * No shuffle beyond the aggregate, no data movement.
  *
  * Determinism: like [[DpRelease]], the Poisson draw is an inverse-CDF
  * threshold-table lookup on a keyed 60-bit uniform — the table is a
  * driver-computed constant inlined into the oracle, so the CI is
  * bit-exact reproducible across engines and runs (a property real
  * metric pipelines want: the error bar doesn't jitter between
  * identical reruns).
  *
  * Cost: ONE md5 per row (not per row×resample — the r8 profile showed
  * 32 md5 invocations/row dominating the query). The B per-resample
  * uniforms derive from that single 60-bit hash by a two-round
  * multiply-add remix over its 30-bit halves mod 2^60
  * (Dietzfelbinger-style multiply-shift hashing): every product of a
  * 30-bit half with a 30-bit odd constant stays under 2^60, every sum
  * under 2^63 — no wraparound anywhere, so the arithmetic is legal and
  * IDENTICAL under Spark ANSI mode and DuckDB BIGINT semantics (both
  * engines trap 64-bit overflow; a classic xorshift-multiply mix would
  * be unwritable portably). The resample index enters round 1 as an
  * affine offset; the half-split between rounds is the nonlinearity.
  */
object Bootstrap {

  /** Poisson(1) weights are truncated at K — P(X > 12) ≈ 5e-14, far
    * below the 2^-60 resolution of the uniform.
    */
  val K = 12

  /** 2^60 and 2^30 — the remix modulus and the half-split radix. */
  val Mod60: Long = 1L << 60
  val Half30: Long = 1L << 30

  /** Odd 30-bit mixing constants (round 1 / round 2). Arbitrary but
    * fixed: they are part of the deterministic draw's definition and
    * are inlined verbatim into the SQL oracle.
    */
  val C1 = 827988741L; val C2 = 993268051L; val C3 = 362437001L
  val D1 = 692642101L; val D2 = 995070253L; val D3 = 613984261L

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

  /** The row's single 60-bit keyed uniform — the ONE md5. */
  def uniform0(rowKey: Column, salt: String): Column =
    Dedup.hex60(md5(concat(lit(s"$salt:"), rowKey.cast("string")).cast("binary")))

  /** Resample b's uniform from the shared row hash: two rounds of
    * (hi·c1 + lo·c2 + offset) mod 2^60 over the 30-bit halves. Pure
    * codegen'd integer arithmetic — ~10 ops replacing an md5.
    */
  def remix(u0: Column, b: Int): Column = {
    val h1 = (shiftrightunsigned(u0, 30) * lit(C1) +
      (u0 % lit(Half30)) * lit(C2) + lit((b + 1) * C3)) % lit(Mod60)
    (shiftrightunsigned(h1, 30) * lit(D1) +
      (h1 % lit(Half30)) * lit(D2) + lit(D3)) % lit(Mod60)
  }

  /** Poisson(1) weight of a 60-bit uniform — one unrolled codegen'd
    * comparison chain, no join.
    */
  def weightFromU(u: Column): Column =
    thresholds.map(t => when(lit(t) <= u, 1L).otherwise(0L)).reduce(_ + _) - 1L

  /** The Poisson(1) weight of `rowKey` in resample `b` — standalone
    * convenience (specs, single-resample callers); [[bootstrapMeans]]
    * shares one [[uniform0]] across all B resamples instead.
    */
  def weight(rowKey: Column, b: Int, salt: String): Column =
    weightFromU(remix(uniform0(rowKey, salt), b))

  /** DuckDB spelling of [[remix]]: `u` a 60-bit uniform expression,
    * `b` the 0-based resample-index expression. Same constants, same
    * halves, same modulus — engine and oracle cannot drift.
    */
  def sqlRemix(u: String, b: String): String = {
    val h1 = s"((($u) >> 30) * $C1 + (($u) % $Half30) * $C2 + (($b) + 1) * $C3) % $Mod60"
    s"((($h1) >> 30) * $D1 + (($h1) % $Half30) * $D2 + $D3) % $Mod60"
  }

  /** DuckDB spelling of [[weightFromU]] given a SQL expression for the
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
    val withU = df.withColumn("boot_u0", uniform0(rowKey, salt))
      .withColumn("boot_x", valueScaled)
    val aggs =
      sum(col("boot_x")).cast("long").as("sx") +: count(lit(1)).as("n") +:
        (0 until b).flatMap { i =>
          val w = weightFromU(remix(col("boot_u0"), i))
          Seq(sum(w).cast("long").as(s"sw_$i"),
            sum(w * col("boot_x")).cast("long").as(s"swx_$i"))
        }
    withU.agg(aggs.head, aggs.tail: _*)
      .withColumn("means", array_sort(array((0 until b).map { i =>
        col(s"swx_$i").cast("double") / col(s"sw_$i").cast("double")
      }: _*)))
      .select(col("n"), col("sx"), col("means"))
  }
}
