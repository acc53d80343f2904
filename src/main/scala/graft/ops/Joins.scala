package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join operators Spark lacks as single primitives, built the way they
  * scale — no join explosion, no cartesian products. The reference has no
  * joins at all (SURVEY §2.4); these are north-star extensions.
  */
object Joins {

  /** Backward as-of join: for each left row, attach the latest right row
    * with rightTime <= leftTime for the same key.
    *
    * Implementation is the union+window pattern, not join-then-rank:
    * both sides are tagged and unioned, shuffled ONCE on the key, sorted
    * within partition by (time, side), and each left row picks up the
    * running `last(right payload, ignoreNulls)` — i.e. the most recent
    * right row at or before it. Compared to `left.join(right, key &&
    * time >= rtime)` + row_number, this never materializes the O(|matches|)
    * intermediate, so it survives keys with millions of right rows.
    *
    * Right rows are deduplicated to one per (key, time) first (keeping the
    * row with the max tiebreaker) so the result is deterministic when
    * right-side times tie.
    *
    * @param rightPayload columns of `right` to attach (null-free names)
    * @param tiebreak     right column that makes (key, time) unique-ish;
    *                     max wins on ties
    */
  def asofBackward(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      rightPayload: Seq[String],
      tiebreak: String
  ): DataFrame = {
    val leftCols = left.columns.toSeq

    // one right row per (key, time): max_by(payload, tiebreak) — deterministic
    val payloadAggs = rightPayload.map(c => max_by(col(c), col(tiebreak)).as(c))
    val rightDedup = right.groupBy(col(rightKey), col(rightTime))
      .agg(payloadAggs.head, payloadAggs.tail: _*)

    val l = left
      .withColumn("__k", col(leftKey))
      .withColumn("__t", col(leftTime))
      .withColumn("__isLeft", lit(1))
      .withColumn("__r", lit(null).cast(
        org.apache.spark.sql.types.StructType(
          rightDedup.select(rightPayload.map(col): _*).schema.fields)))

    val r = rightDedup
      .withColumn("__k", col(rightKey))
      .withColumn("__t", col(rightTime))
      .withColumn("__isLeft", lit(0))
      .withColumn("__r", struct(rightPayload.map(col): _*))
      .select((leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c))
        ++ Seq(col("__k"), col("__t"), col("__isLeft"), col("__r"))): _*)

    val unioned = l.select((leftCols.map(col) ++ Seq(col("__k"), col("__t"), col("__isLeft"), col("__r"))): _*)
      .unionByName(r)

    // right rows (__isLeft=0) sort before left rows at equal time → '<=' semantics
    val w = Window.partitionBy("__k").orderBy(col("__t").asc, col("__isLeft").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    unioned
      .withColumn("__match", last("__r", ignoreNulls = true).over(w))
      .filter(col("__isLeft") === 1 && col("__match").isNotNull)
      .select(leftCols.map(col) ++ rightPayload.map(c => col(s"__match.$c").as(c)): _*)
  }

  /** Skew-mitigated equi-join — HOT-KEY-ONLY salting, two-path union.
    *
    * Keys whose left-side frequency exceeds `hotKeyThreshold` take the
    * salted path: their left rows get a deterministic (hash-derived,
    * random-free) salt and only the right rows OF THOSE KEYS are
    * replicated `saltFactor`×, so a hot key spreads over `saltFactor`
    * reducers. Everything else takes a plain equi-join. Result set is
    * identical to a plain inner join on `key` — only the shuffle
    * distribution changes.
    *
    * Why not salt everything: replicating the whole right side inflates
    * the shuffle `saltFactor`× — an 8× write of a 100 TB-scale right
    * table to fix a handful of hot keys. The hot set is at most
    * |left| / hotKeyThreshold keys, so its one-column projection is
    * broadcastable by construction, and the frequency pass is a cheap
    * map-side-combined count. Complements AQE's skew-join splitting
    * when a single key exceeds what one task can hold.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 saltFactor: Int, hotKeyThreshold: Long = 100000L): DataFrame = {
    val hot = left.groupBy(col(key)).agg(count(lit(1)).as("__n"))
      .filter(col("__n") > hotKeyThreshold).select(col(key))
    val leftHot = left.join(broadcast(hot), Seq(key), "left_semi")
    val leftCold = left.join(broadcast(hot), Seq(key), "left_anti")
    // only hot-key right rows are replicated
    val rightHot = right.join(broadcast(hot), Seq(key), "left_semi")
    val saltedLeft = leftHot.withColumn("__salt",
      pmod(xxhash64(leftHot.columns.map(col): _*), lit(saltFactor)).cast("int"))
    val saltedRight = rightHot.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    val hotJoined = saltedLeft.join(saltedRight, Seq(key, "__salt")).drop("__salt")
    // cold left rows can join the UNFILTERED right side (their keys are
    // disjoint from the hot set by construction) — saves an anti pass
    val coldJoined = leftCold.join(right, Seq(key))
    hotJoined.unionByName(coldJoined)
  }

  /** Bloom-prefiltered semi-join: build a Bloom filter over the dim keys
    * (n·~10 bits — fits in a broadcast long after the dim itself is too
    * big for a broadcast-hash join), drop the fact rows that can't match
    * BEFORE the shuffle, then run the exact semi-join to remove the
    * filter's false positives. At 100 TB this is the difference between
    * shuffling the whole fact table and shuffling the ~matching slice.
    * Spark's AQE has a runtime version (runtime.bloomFilter); this makes
    * the pattern explicit and deterministic. Integral keys only (the
    * fact-side test uses mightContainLong).
    *
    * The one driver-side action is dim.count() to size the filter —
    * metadata-scale, same class as IVF's seed collect.
    */
  def bloomPrefilteredSemiJoin(fact: DataFrame, factKey: String,
                               dim: DataFrame, dimKey: String,
                               fpp: Double = 0.01): DataFrame = {
    val spark = fact.sparkSession
    val n = math.max(dim.count(), 1L)
    val bf = dim.stat.bloomFilter(dimKey, n, fpp)
    val bc = spark.sparkContext.broadcast(bf)
    // native codegen'd probe (functions/BloomMightContainLong) — the
    // boxed-UDF version it replaces broke whole-stage codegen on the
    // fact scan; null keys yield null ≡ dropped by the filter
    fact.filter(graft.functions.BloomMightContainLong.probe(bc, col(factKey).cast("long")))
      .join(dim, fact(factKey) === dim(dimKey), "left_semi")
  }

  /** Range (interval) join: rows of `left` whose `leftValue` falls in
    * `[lo, hi]` of `right`. Implemented by binning: each right interval is
    * exploded to the bins it covers, the left value is bucketed to its
    * bin, and the join becomes an equi-join on the bin plus a residual
    * filter — a shuffle-partitionable plan instead of the
    * BroadcastNestedLoopJoin Spark would pick for a bare inequality join.
    * binWidth should be chosen ~ the typical interval width so intervals
    * explode to O(1) bins.
    */
  def rangeJoin(
      left: DataFrame,
      leftValue: String,
      right: DataFrame,
      lo: String,
      hi: String,
      binWidth: Double
  ): DataFrame = {
    val rightBinned = right.withColumn(
      "__bin",
      explode(sequence(
        floor(col(lo) / binWidth).cast("long"),
        floor(col(hi) / binWidth).cast("long")))
    )
    val leftBinned = left.withColumn("__bin", floor(col(leftValue) / binWidth).cast("long"))
    leftBinned
      .join(rightBinned, Seq("__bin"))
      .filter(col(leftValue) >= col(lo) && col(leftValue) <= col(hi))
      .drop("__bin")
  }

  /** Interval-OVERLAP join: pairs (l, r) with [lLo,lHi] ∩ [rLo,rHi] ≠ ∅
    * (both endpoints inclusive, numeric columns, distinct names across
    * the two sides). Generalizes [[rangeJoin]] from point-in-interval to
    * interval-interval — the shape of "which shipments were in flight
    * during which promo windows" / overlapping-session joins.
    *
    * Plan: both sides explode to the bins their interval covers and the
    * join is an equi-join on the bin — shuffle-partitionable, never the
    * BroadcastNestedLoopJoin a bare conjunction of inequalities gets.
    * A pair whose overlap spans several bins would surface once per
    * shared bin, so the residual keeps only the bin containing the
    * overlap's LEFT EDGE max(lLo, rLo): every overlapping pair survives
    * in exactly one bin — dedup by construction, no distinct shuffle.
    * Cost: each row duplicates to O(len/binWidth + 1) bin copies; pick
    * binWidth ≈ the typical interval length so that stays O(1).
    */
  def intervalJoin(
      left: DataFrame,
      lLo: String,
      lHi: String,
      right: DataFrame,
      rLo: String,
      rHi: String,
      binWidth: Long
  ): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    def binned(df: DataFrame, lo: String, hi: String) =
      df.withColumn("__bin", explode(sequence(
        floor(col(lo) / binWidth).cast("long"),
        floor(col(hi) / binWidth).cast("long"))))
    binned(left, lLo, lHi)
      .join(binned(right, rLo, rHi), Seq("__bin"))
      .filter(col(lLo) <= col(rHi) && col(rLo) <= col(lHi))
      .filter(col("__bin") ===
        floor(greatest(col(lLo), col(rLo)) / binWidth).cast("long"))
      .drop("__bin")
  }
}
