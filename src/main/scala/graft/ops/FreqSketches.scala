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

  /** Bloom bit position of item `x` for hash row `r`: portable 60-bit
    * md5 hash mod m. */
  def bloomPos(r: Column, x: Column, m: Int): Column =
    pmod(Dedup.hex60(md5(concat(lit("bloom:"), r.cast("string"), lit(":"), x)
      .cast("binary"))), lit(m.toLong))

  /** The (w, bits) BLOOM-FILTER relation (Bloom 1970) over the DISTINCT
    * items — the membership sketch completing the relational family
    * (CMS frequency, AMS F₂, HLL cardinality, bitmap exact-set): k
    * positions per item, 32 bits per BIGINT word (the BitmapIndex
    * convention — bit 31 is the largest used, so the mask stays
    * positive in every engine), `bit_or` IS the merge. m/32 rows total,
    * so per-batch partials append as plain rows and roll up with one
    * more groupBy. */
  def bloomSketch(items: DataFrame, itemCol: String, k: Int, m: Int): DataFrame =
    items.select(col(itemCol).as("x")).distinct()
      .select(col("x"), explode(sequence(lit(0L), lit(k - 1L))).as("r"))
      .select(bloomPos(col("r"), col("x"), m).as("pos"))
      .select(expr("pos div 32").as("w"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))").as("mk"))
      .groupBy(col("w")).agg(expr("bit_or(mk)").as("bits"))

  /** Membership census for a probe relation against a Bloom relation:
    * positive iff ALL k probed bits are set (min over the per-hash
    * hits). The probe side expands k-fold and equi-joins on the word —
    * never a rescan of the member set. Emits (p, hit ∈ {0, 1}). */
  def bloomTest(sketch: DataFrame, probes: DataFrame, probeCol: String,
                k: Int, m: Int): DataFrame =
    probes.select(col(probeCol).as("p"))
      .withColumn("r", explode(sequence(lit(0L), lit(k - 1L))))
      .withColumn("pos", bloomPos(col("r"), col("p"), m))
      .select(col("p"), expr("pos div 32").as("w"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))").as("mk"))
      .join(sketch, Seq("w"), "left")
      .groupBy(col("p"))
      .agg(min(when(coalesce(col("bits"), lit(0L)).bitwiseAND(col("mk")) =!= 0L,
        1L).otherwise(0L)).as("hit"))

  /** The standard Bloom census over a (w, bits) relation: fill, the
    * no-false-negatives THEOREM re-probed over every member, and the
    * exact false-positive count over 200 'zz<i>' probes (digits can't
    * appear in an [a-z]+ item set, so they are guaranteed non-members).
    * Shared by the batch and streaming cells so both replay the same
    * oracle verbatim. */
  def bloomCensus(sketch: DataFrame, members: DataFrame, memberCol: String,
                  k: Int, m: Int): DataFrame = {
    import graft.ops.CacheScope.ScopedPersist
    val s = sketch.sparkSession
    val sk = sketch.scopedPersist()
    val bits = sk.agg(sum(expr("bit_count(bits)")).cast("long").as("n_set_bits"))
    val mem = bloomTest(sk, members, memberCol, k, m)
      .agg(count(lit(1)).as("n_members"), min(col("hit")).as("all_hit"))
    val negs = s.range(200).select(concat(lit("zz"), col("id")).as("p"))
    val neg = bloomTest(sk, negs, "p", k, m)
      .agg(sum(col("hit")).as("n_false_pos"))
    mem.crossJoin(broadcast(bits)).crossJoin(broadcast(neg))
      .select(col("n_members"), col("n_set_bits"),
        expr(s"n_set_bits * 1000000 div $m").as("fill_ppm"),
        (col("all_hit") === 1L).as("no_false_negatives"),
        lit(200L).as("n_neg_probes"), col("n_false_pos"),
        expr("n_false_pos * 1000000 div 200").as("fpr_ppm"))
  }
}
