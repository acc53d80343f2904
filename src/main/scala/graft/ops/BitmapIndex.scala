package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Relational bitmap index (roaring-lite): EXACT distinct counting and
  * set algebra over a bounded integer id domain as a (set, word, bits)
  * relation — 32 ids per BIGINT word (bit 31 is the largest used, so
  * the mask stays positive in every engine), `bit_or` IS the merge.
  * Like the CMS/AMS relations (FreqSketches), the summary is a flat
  * table: partial aggregation gives map-side combine and any-merge-tree
  * mergeability for free, per-micro-batch partials append as plain rows
  * and roll up with one more groupBy, and the DuckDB oracle replays
  * every word bit-exactly. Unlike them it is EXACT — the trade is
  * memory ∝ domain/32 words per set instead of a fixed sketch size.
  *
  * Scale: distinct = Σ bit_count(bits) over a relation ~32x smaller
  * than the id multiset; intersection/union are word-keyed equi-joins
  * of bitmap relations, never a rescan of the raw events.
  */
object BitmapIndex {

  /** (t, w, bits) bitmap relation from a (t, id) set-membership
    * relation: w = id div 32, bit = id mod 32. Ids must be >= 0 —
    * enforced IN-PLAN (raise_error, so streaming callers keep working
    * and a negative id fails loudly at execution instead of silently
    * landing on a wrong word/bit via truncating div/%, which would
    * also diverge from the oracle's flooring `//`). */
  def bitmap(sets: DataFrame, setCol: String, idCol: String): DataFrame =
    sets.select(col(setCol).as("t"),
        expr(s"CASE WHEN $idCol >= 0 THEN CAST($idCol AS BIGINT) ELSE " +
          s"raise_error(concat('bitmap: ids must be >= 0, got ', CAST($idCol AS STRING))) END")
          .as("id"))
      .select(col("t"), expr("id div 32").as("w"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(id % 32 AS INT))").as("m"))
      .groupBy(col("t"), col("w")).agg(expr("bit_or(m)").as("bits"))

  /** Day-over-day retention over a per-day bitmap relation (t = day
    * TIMESTAMP, w, bits): DAU = popcount, retained = popcount(day AND
    * next-day) via a (day, word)-keyed equi-join — never a rescan of
    * the raw events. Only days with a successor emit. */
  def retention(bm: DataFrame): DataFrame = {
    val dau = bm.groupBy(col("t"))
      .agg(sum(expr("bit_count(bits)")).cast("long").as("dau"))
    val nx = bm.select(expr("t - INTERVAL 1 DAY").as("t"), col("w"),
      col("bits").as("b2"))
    val ret = bm.join(nx, Seq("t", "w"))
      .groupBy(col("t"))
      .agg(sum(expr("bit_count(bits & b2)")).cast("long").as("retained"))
    val days = bm.select(col("t")).distinct()
    val withNext = days.join(
      days.select(expr("t - INTERVAL 1 DAY").as("t")), Seq("t"))
    dau.join(withNext, Seq("t")).join(ret, Seq("t"), "left")
      .select(col("t").as("day"), col("dau"),
        coalesce(col("retained"), lit(0L)).as("retained"),
        expr("coalesce(retained, 0) * 1000000 div dau").as("retention_ppm"))
      .orderBy(col("day"))
  }

  /** Census over a two-set ('view'/'purchase') bitmap relation:
    * per-set exact distinct + word counts, then AND/OR rows from one
    * full-outer word join. Output: (set_name, n_users, n_words). */
  def census(bm: DataFrame): DataFrame = {
    val perT = bm.groupBy(col("t")).agg(
      sum(expr("bit_count(bits)")).cast("long").as("n_users"),
      count(lit(1)).as("n_words"))
    val v = bm.filter(col("t") === "view").select(col("w"), col("bits").as("bv"))
    val p = bm.filter(col("t") === "purchase").select(col("w"), col("bits").as("bp"))
    val j = v.join(p, Seq("w"), "full_outer")
      .select(coalesce(col("bv"), lit(0L)).as("bv"),
        coalesce(col("bp"), lit(0L)).as("bp"))
    val so = j.agg(
      sum(expr("bit_count(bv & bp)")).cast("long").as("n_and"),
      sum(expr("bit_count(bv | bp)")).cast("long").as("n_or"),
      sum(when(expr("bv & bp") =!= 0L, 1L).otherwise(0L)).as("w_and"),
      count(lit(1)).as("w_or"))
    perT.select(col("t").as("set_name"), col("n_users"), col("n_words"))
      .unionByName(so.select(lit("view_and_purchase").as("set_name"),
        col("n_and").as("n_users"), col("w_and").as("n_words")))
      .unionByName(so.select(lit("view_or_purchase").as("set_name"),
        col("n_or").as("n_users"), col("w_or").as("n_words")))
      .orderBy(col("set_name"))
  }
}
