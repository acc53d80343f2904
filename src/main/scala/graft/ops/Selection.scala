package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import CacheScope.ScopedPersist

/** Exact order statistics over HIGH-cardinality columns without a
  * global (or per-group) sort — the distributed selection algorithm.
  *
  * The census-window trick the exact-median queries use (cumulative
  * weight over the (group, value) census) is only cheap while the
  * value domain is small; for a column with millions of distinct
  * values the census IS the table and the window becomes a per-group
  * sort — a hot partition per group at 100 TB. Two-phase selection
  * keeps the exactness and drops the sort: phase 1 histograms the
  * value's high bits (buckets = v >> shift: order-preserving for
  * signed longs since arithmetic shift is monotone) into a
  * groups × 2^(bits−shift) census, runs the cumulative window over
  * THAT census, and finds for each requested rank k the boundary
  * bucket where the cumulative count crosses k; phase 2 ranks only the
  * boundary bucket's rows (≈ n_group / 2^(bits−shift)). Among ties the
  * returned VALUE is rank-order independent, so the result is
  * deterministic even though row identity is not.
  *
  * The same shape powers CorpusOps.balancedSample (rank-threshold
  * keep-set) — here it returns the value AT a rank instead.
  */
object Selection {

  /** Exact integer division for rank formulas: (a − a mod b) / b. The
    * double division is exact because the numerator is a multiple of b
    * below 2^53 — rank arithmetic never routes through a float
    * percentage, so it cannot inherit ceil(q·n)'s rounding hazards.
    */
  def idiv(a: Column, b: Long): Column =
    ((a - pmod(a, lit(b))) / b).cast("long")

  /** For each group and each named target rank, the k-th smallest
    * value of `vCol` (1-based k, computed from the group's row count
    * by the caller-supplied Column formula — e.g. median
    * `n => (n + 1) div 2`). Returns long-format (groupCol, __t, v):
    * one row per group × target.
    */
  def kthSmallest(df: DataFrame, groupCol: String, vCol: String,
                  targets: Seq[(String, Column => Column)],
                  shift: Int = 14): DataFrame = {
    val rows = df
      .select(col(groupCol).as("__g"), col(vCol).cast("long").as("__v"))
      .withColumn("__b", shiftright(col("__v"), shift))
      .scopedPersist()
    val census = rows.groupBy(col("__g"), col("__b"))
      .agg(count(lit(1)).as("__bn"))
    val wg = Window.partitionBy(col("__g")).orderBy(col("__b"))
    val cum = census.withColumn("__cum", sum(col("__bn")).over(wg))
    val n = rows.groupBy(col("__g")).agg(count(lit(1)).as("__n"))
    val tgt = targets.map { case (nm, kf) =>
      n.select(col("__g"), lit(nm).as("__t"), kf(col("__n")).as("__k"))
    }.reduce(_ unionByName _)
    // boundary bucket per (group, target): min bucket with cum >= k,
    // plus the residual rank inside it — all census-sized relations
    val bound = cum.join(tgt, Seq("__g"))
      .filter(col("__cum") >= col("__k"))
      .groupBy(col("__g"), col("__t"), col("__k"))
      .agg(min(col("__b")).as("__bb"))
    val boundFull = bound
      .join(cum.select(col("__g"), col("__b").as("__bb"),
        col("__bn"), col("__cum")), Seq("__g", "__bb"))
      .select(col("__g").as("__bg"), col("__t"),
        (col("__k") - (col("__cum") - col("__bn"))).as("__need"), col("__bb"))
    // phase 2: rank ONLY the boundary buckets' rows
    val wb = Window.partitionBy(col("__bg"), col("__t")).orderBy(col("__v"))
    rows.join(broadcast(boundFull),
        col("__g") === col("__bg") && col("__b") === col("__bb"))
      .withColumn("__rn", row_number().over(wb))
      .filter(col("__rn") === col("__need"))
      .select(col("__g"), col("__t"), col("__v"))
  }
}
