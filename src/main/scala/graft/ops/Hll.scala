package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HyperLogLog (Flajolet et al. 2007) as a RELATIONAL register table —
  * the third corner of the distinct-count triangle next to the exact
  * bitmap (BitmapIndex) and the KMV k-minimum-values sketch: 64
  * registers, each the MAX leading-zero rank seen among the hashes
  * routed to it. Like CMS/AMS/bitmap, the summary IS a flat table
  * ((reg, mr) — 64 rows), so partial aggregation is the merge
  * (max-groupBy composes over any partition/batch slicing and is
  * idempotent under replay), per-micro-batch partials append as plain
  * rows, and the DuckDB oracle replays every register bit-exactly from
  * the portable 60-bit md5 hash.
  *
  * All arithmetic is integer: rho from a bit-length CASE chain emitted
  * once here into BOTH dialects; the harmonic mean Σ 2^(-M_j) scaled to
  * S_x = Σ 2^(55-M_j) (≤ 64·2^55 < 2^62); the raw estimate
  * α₆₄·m²/S = (α_x20·4096·2^55) / S_x / 2^20 in DECIMAL(38,0)/HUGEINT;
  * the small-range linear-counting branch m·ln(m/V) via the SAME staged
  * fixed-point log the ULM tokenizer shares with its oracle
  * (UlmTokenizer.costStages) and the ln2 constant 693147/10^6.
  * Estimate quality is probabilistic (~1.04/√64 ≈ 13%), but the
  * PIPELINE is deterministic — the gate is hash-match, err_ppm
  * reported.
  */
object Hll {

  /** Number of registers (p = 6 index bits off a 60-bit hash). */
  val M = 64

  /** α₆₄ = 0.709 (Flajolet et al. 2007, Fig. 3) in 2^20 fixed point. */
  val AlphaX20: Long = math.round(0.709 * (1L << 20))

  /** Bit length of a nonnegative BIGINT as a CASE chain — portable
    * text (pure comparisons against power-of-two literals), emitted
    * into both the Spark and DuckDB plans. bitlen(0) = 0. */
  def bitlenCase(v: String): String =
    (53 to 1 by -1).map(j => s"WHEN ($v) >= ${1L << j} THEN ${j + 1}")
      .mkString("CASE ", " ", s" WHEN ($v) >= 1 THEN 1 ELSE 0 END")

  /** Per-key grouped registers (keys..., reg, mr) — the grouped
    * deployment cell: one 64-register sketch per key, all in one
    * max-groupBy pass. */
  def registersBy(items: DataFrame, keys: Seq[String], itemCol: String): DataFrame =
    items.select(keys.map(col) :+ Dedup.hex60(
        md5(concat(lit("hll:"), col(itemCol)).cast("binary"))).as("h"): _*)
      .select(keys.map(col) :+ expr("h % 64").as("reg") :+ expr("h div 64").as("v"): _*)
      .withColumn("rho", expr(s"CAST(55 - (${bitlenCase("v")}) AS BIGINT)"))
      .groupBy((keys :+ "reg").map(col): _*).agg(max(col("rho")).as("mr"))

  /** Per-key estimate relation (keys..., s_x, n_regs_zero, est_raw,
    * est_lin, hll_est) — a dense key×64 dimension fills missing
    * registers with true zeros; the staged log runs once per key row. */
  def estimateBy(regs: DataFrame, keys: Seq[String]): DataFrame = {
    val s = regs.sparkSession
    val dim0 = s.range(0, M.toLong).select(col("id").as("reg"))
    val dim =
      if (keys.isEmpty) dim0
      else regs.select(keys.map(col): _*).distinct().crossJoin(dim0)
    val rt = dim.join(regs, keys :+ "reg", "left")
      .select(keys.map(col) :+ col("reg") :+ coalesce(col("mr"), lit(0L)).as("mr"): _*)
    var t = (if (keys.isEmpty) rt.groupBy() else rt.groupBy(keys.map(col): _*))
      .agg(
        sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(55 - mr AS INT))")).as("s_x"),
        sum(when(col("mr") === 0, 1L).otherwise(0L)).as("v0"))
      .withColumn("vv", greatest(col("v0"), lit(1L)))
    UlmTokenizer.costStages(M.toString, "vv", UlmTokenizer.Spark).foreach {
      case (n, e) => t = t.withColumn(n, expr(e))
    }
    t.withColumn("est_raw", expr(
        s"CAST(CAST($AlphaX20 AS DECIMAL(38,0)) * ${M.toLong * M} * ${1L << 55}" +
          " div s_x AS BIGINT) div 1048576"))
      .withColumn("est_lin", expr(s"$M * cost_cb * 693147 div 100000000"))
      .select(keys.map(col) ++ Seq(col("s_x"), col("v0").as("n_regs_zero"),
        col("est_raw"), col("est_lin"),
        expr(s"CASE WHEN est_raw <= ${5 * M / 2} AND v0 > 0" +
          " THEN est_lin ELSE est_raw END").as("hll_est")): _*)
  }

  /** Occupied-register partials (reg, mr) over a string item column —
    * the scalar cell of [[registersBy]]. */
  def registers(items: DataFrame, itemCol: String): DataFrame =
    registersBy(items, Nil, itemCol)

  /** One-row estimate — the scalar cell of [[estimateBy]]. */
  def estimate(regs: DataFrame): DataFrame = estimateBy(regs, Nil)
}
