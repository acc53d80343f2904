package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Order-independent floating-point aggregation.
  *
  * Summing doubles is not associative, so a distributed sum's low bits
  * depend on partitioning — they can't hash-match a single-node oracle.
  * Casting to decimal first makes the sum exact and order-independent:
  * double→decimal rounding is deterministic (ties are impossible for
  * scale>0 because x.5·10^-s is not a dyadic rational), the decimal sum is
  * exact, and the final cast back to double is deterministic. The DuckDB
  * side spells the identical thing: CAST(SUM(CAST(x AS DECIMAL(30,s))) AS
  * DOUBLE).
  *
  * This is also the right call at 100 TB: it costs one cast per row inside
  * codegen and buys run-to-run reproducibility of every money metric.
  */
object ExactAgg {
  def dec(c: Column, scale: Int = 6): Column = c.cast(DecimalType(30, scale))

  /** Exact, order-independent sum of a double column, returned as double. */
  def dsum(c: Column, scale: Int = 6): Column = sum(dec(c, scale)).cast("double")

  /** avg as exact-sum / count — both sides do one identical double division. */
  def davg(c: Column, scale: Int = 6): Column =
    (sum(dec(c, scale)).cast("double") / count(c)).cast("double")

  /** Windowed exact running sum. */
  def dsumOver(c: Column, w: org.apache.spark.sql.expressions.WindowSpec, scale: Int = 6): Column =
    sum(dec(c, scale)).over(w).cast("double")

  /** Exact sum for LARGE computed doubles (≳1e8, e.g. squared prices):
    * the plain decimal cast diverges across engines there because the
    * double's ulp approaches the rounding granularity and Spark rounds
    * the shortest-string repr. Floor-scaling first makes the cast input
    * integer-valued — integers round-trip decimal casts exactly on every
    * engine. Result = Σ floor(x·10^s) / 10^s.
    */
  def dsumScaled(c: Column, scale: Int = 6): Column =
    (sum(floor(c * math.pow(10, scale)).cast(DecimalType(38, 0))).cast("double") /
      math.pow(10, scale))

  def sqlDsumScaled(expr: String, scale: Int = 6): String =
    s"CAST(SUM(CAST(floor(($expr) * 1e$scale) AS DECIMAL(38,0))) AS DOUBLE) / 1e$scale"

  /** Windowed twin of [[dsumScaled]] — for LARGE computed doubles (≥ ~1e7,
    * e.g. price²) inside window frames, where the decimal cast of
    * [[dsumOver]] would hit the shortest-string rounding divergence. */
  def dsumScaledOver(c: Column, w: org.apache.spark.sql.expressions.WindowSpec,
                     scale: Int = 6): Column =
    (sum(floor(c * math.pow(10, scale)).cast(DecimalType(38, 0))).over(w).cast("double") /
      math.pow(10, scale))

  def sqlDsumScaledOver(expr: String, over: String, scale: Int = 6): String =
    s"CAST(SUM(CAST(floor(($expr) * 1e$scale) AS DECIMAL(38,0))) OVER $over AS DOUBLE) / 1e$scale"

  /** DuckDB spelling of dsum for oracle SQL. */
  def sqlDsum(expr: String, scale: Int = 6): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(30,$scale))) AS DOUBLE)"

  def sqlDavg(expr: String, scale: Int = 6): String =
    s"CAST(CAST(SUM(CAST($expr AS DECIMAL(30,$scale))) AS DOUBLE) / COUNT($expr) AS DOUBLE)"
}
