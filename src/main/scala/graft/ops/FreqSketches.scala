package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count–Min (Cormode & Muthukrishnan 2005) and AMS F₂ (Alon, Matias &
  * Szegedy 1996) frequency sketches, RELATIONALLY: unlike KLL/MG/KMV
  * (arbitrary-state TypedImperativeAggregates), these sketches ARE flat
  * integer tables — a d×w bucket-count relation / a d-row signed-sum
  * relation — so the Spark-first shape is a groupBy, not a binary blob:
  * partial aggregation gives map-side combine and ANY-merge-tree
  * mergeability for free (sum is the merge), per-micro-batch partials
  * append as plain rows and roll up with one more groupBy, and the
  * DuckDB oracle replays every cell bit-exactly from the portable
  * md5/hex60 hash (no float, no seed state).
  *
  * Deterministic grading: CMS never undercounts (est = min over d rows
  * of a sum that includes every true occurrence — a theorem, graded as
  * a boolean); the overcount magnitude is replayed exactly, not bounded
  * probabilistically. AMS's median-of-d estimate is likewise replayed
  * exactly; its guarantees are probabilistic over seeds, so the gate is
  * hash-match on the deterministic pipeline, err_ppm reported.
  */
object FreqSketches {

  /** CMS bucket of item `x` in row `r`: portable 60-bit md5 hash mod w. */
  def cmsBucket(r: Column, x: Column, w: Int): Column =
    pmod(Dedup.hex60(md5(concat(lit("cms:"), r.cast("string"), lit(":"), x)
      .cast("binary"))), lit(w.toLong))

  /** The d×w sketch relation (r, b, c) over an item column — the whole
    * sketch is d·w rows of (int, int, long): merge = sum by (r, b).
    * Hashes run once per DISTINCT item and are weighted by count (the
    * q_profile_dupcols lesson — md5 is the dominant cost, and
    * Σ_{occurrences→(r,b)} 1 = Σ_{w→(r,b)} c_w identically), so the
    * emitted cells are bit-identical to the per-occurrence build. */
  def cmsSketch(items: DataFrame, itemCol: String, d: Int, w: Int): DataFrame =
    items.groupBy(col(itemCol).as("x")).agg(count(lit(1)).as("cnt"))
      .select(col("x"), col("cnt"),
        explode(sequence(lit(0L), lit(d - 1L))).as("r"))
      .select(col("r"), cmsBucket(col("r"), col("x"), w).as("b"), col("cnt"))
      .groupBy(col("r"), col("b")).agg(sum(col("cnt")).as("c"))

  /** Point estimates for a (small) item relation against a sketch
    * relation: est(x) = min over rows r of c[r, h_r(x)]. The item side
    * broadcasts; the sketch side is d·w rows. Missing buckets are true
    * zeros (no occurrence hashed there). */
  def cmsEstimate(sketch: DataFrame, items: DataFrame, itemCol: String,
                  d: Int, w: Int): DataFrame =
    items.select(col(itemCol).as("x"))
      .withColumn("r", explode(sequence(lit(0L), lit(d - 1L))))
      .withColumn("b", cmsBucket(col("r"), col("x"), w))
      .join(sketch, Seq("r", "b"), "left")
      .groupBy(col("x"))
      .agg(min(coalesce(col("c"), lit(0L))).as("cms_est"))

  /** AMS ±1 sign of item `x` in row `r`. */
  def amsSign(r: Column, x: Column): Column =
    lit(1L) - lit(2L) * pmod(Dedup.hex60(
      md5(concat(lit("ams:"), r.cast("string"), lit(":"), x).cast("binary"))),
      lit(2L))

  /** The d-row AMS relation (r, z) with z = Σ_x s_r(x): one signed sum
    * per row over item OCCURRENCES — merge = sum by r, so partials from
    * any split/batch slicing compose. F₂ estimate = median of z². */
  def amsSketch(items: DataFrame, itemCol: String, d: Int): DataFrame =
    items.groupBy(col(itemCol).as("x")).agg(count(lit(1)).as("cnt"))
      .select(col("x"), col("cnt"),
        explode(sequence(lit(0L), lit(d - 1L))).as("r"))
      .select(col("r"), (col("cnt") * amsSign(col("r"), col("x"))).as("s"))
      .groupBy(col("r")).agg(sum(col("s")).as("z"))
}
