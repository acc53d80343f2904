package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot-merge operators — the load-side semantics of an incremental
  * sync engine (reference behavior: upsert each extracted batch into the
  * destination by key, newest record wins; cf. the reference adapters'
  * insert/update flows).
  *
  * Scale shape: latest-wins is a groupBy-max over a struct whose leading
  * fields are the version columns — ONE shuffle with map-side partial
  * aggregation (each mapper pre-reduces to one candidate row per key),
  * strictly better at 100 TB than the row_number-window formulation,
  * which shuffles every row and materializes full per-key sorted groups.
  * Because the struct comparison totally orders ALL columns, the winner
  * is deterministic even when versions tie.
  */
object Merge {

  /** SCD1 latest-wins upsert of `delta` into `base` (same schema): for
    * each key the row with the greatest (versionCols..., rest...) tuple
    * survives. Associative — upsert(upsert(a,b),c) == upsert(a, b∪c) —
    * so incremental batches compose.
    */
  def upsert(base: DataFrame, delta: DataFrame,
             keys: Seq[String], versionCols: Seq[String]): DataFrame =
    latest(base.unionByName(delta), keys, versionCols)

  /** Reduce a change set to its latest record per key (see [[upsert]] for
    * the plan-shape rationale). */
  def latest(changes: DataFrame, keys: Seq[String], versionCols: Seq[String]): DataFrame =
    keepExtremum(changes, keys, leading = versionCols, takeMax = true)

  /** The shared struct-extremum reducer: one surviving row per key — the
    * one whose (leading..., remaining payload...) tuple is the max (or
    * min). groupBy + struct extremum, so it partial-aggregates map-side;
    * the full-tuple comparison makes the survivor deterministic even on
    * leading-column ties. Serves both latest-wins upsert (max on version
    * columns) and declarative dedup (min over the whole payload).
    *
    * NULL-ORDERING CONTRACT: Spark's struct comparison sorts null fields
    * LOWEST, i.e. every column compares as ASC NULLS FIRST / DESC NULLS
    * LAST. With `takeMax = false` a null payload column therefore BEATS
    * any non-null value on a tie of the preceding columns. Any SQL twin
    * of this operator (DuckDB row_number formulations — see
    * q_connector_dedup / q_connector_full) must spell `NULLS FIRST` on
    * ascending tie-break columns, because DuckDB's ASC default is NULLS
    * LAST and the survivor diverges the moment a nullable column decides
    * the tie.
    */
  def keepExtremum(df: DataFrame, keys: Seq[String], leading: Seq[String],
                   takeMax: Boolean): DataFrame = {
    val payload = df.columns.toSeq.filterNot(keys.contains)
    val ordered = leading ++ payload.filterNot(leading.contains)
    val s = struct(ordered.map(col): _*)
    df.groupBy(keys.map(col): _*)
      .agg((if (takeMax) max(s) else min(s)).as("__s"))
      .select(keys.map(col) ++ ordered.map(c => col(s"__s.$c").as(c)): _*)
  }

  /** Incremental view maintenance for ADDITIVE aggregates: merge a
    * materialized (count, scaled-sum) state with a new delta batch's
    * partial aggregate by summing per key — never re-reading history.
    * Works because count and floor-scaled integer sums are commutative
    * monoids (exact longs — the float-sum version would drift per merge
    * order). At 100 TB this is the difference between touching the delta
    * and re-scanning the table: state size ∝ keys, update cost ∝ delta.
    */
  def mergeAdditiveState(state: DataFrame, deltaAgg: DataFrame,
                         keys: Seq[String], addCols: Seq[String]): DataFrame =
    state.unionByName(deltaAgg)
      .groupBy(keys.map(col): _*)
      .agg(sum(col(addCols.head)).as(addCols.head),
        addCols.tail.map(c => sum(col(c)).as(c)): _*)

  /** IVM for MIN/MAX state under INSERTS: extrema form a commutative
    * semigroup under least/greatest, so an insert batch folds into the
    * state exactly like the additive case — one groupBy over state ∪
    * delta partial-aggregate, cost ∝ delta. Both inputs carry
    * (keys..., mn, mx).
    */
  def mergeExtremaState(state: DataFrame, deltaAgg: DataFrame, keys: Seq[String]): DataFrame =
    state.unionByName(deltaAgg)
      .groupBy(keys.map(col): _*)
      .agg(min(col("mn")).as("mn"), max(col("mx")).as("mx"))

  /** IVM for MIN/MAX state under DELETES — the non-invertible case: a
    * retraction can't be subtracted from an extremum, so the scalable
    * contract is recompute-on-retract per key:
    *
    *  - a delete key whose deleted values lie STRICTLY inside the
    *    state's (mn, mx) interval cannot move either extremum → state
    *    row kept untouched, no base access;
    *  - a delete key that touches its extremum (deleted min ≤ mn or
    *    deleted max ≥ mx — ties included, since state keeps no
    *    multiplicity) recomputes from `remaining` (the post-delete base)
    *    restricted to JUST those keys — cost ∝ touched keys' rows, not
    *    |base|;
    *  - a key with no remaining rows drops out of the view.
    */
  def retractExtremaState(state: DataFrame, deletes: DataFrame, remaining: DataFrame,
                          keys: Seq[String], valCol: String): DataFrame = {
    val kc = keys.map(col)
    val delAgg = deletes.groupBy(kc: _*)
      .agg(min(col(valCol)).as("__dmn"), max(col(valCol)).as("__dmx"))
    // both branches read the classified state — materialize the small
    // (one row per key) join once, and release it before returning: the
    // caller loops this per delete-batch, so a leaked persist here
    // accumulates one cached join per batch for the life of the session
    val joined = state.join(delAgg, keys, "left").persist()
    try {
      val interior = col("__dmn").isNull || (col("__dmn") > col("mn") && col("__dmx") < col("mx"))
      val untouched = joined.filter(interior).select(kc :+ col("mn") :+ col("mx"): _*)
      val touchedKeys = joined.filter(!interior).select(kc: _*)
      val recomputed = remaining.join(touchedKeys, keys) // restrict BEFORE aggregating
        .groupBy(kc: _*)
        .agg(min(col(valCol)).as("mn"), max(col(valCol)).as("mx"))
      // state is one row per key — localCheckpoint materializes it (so the
      // unpersist below can't force a recompute) and truncates lineage,
      // which a repeated IVM loop needs anyway (state = f(state) per batch)
      untouched.unionByName(recomputed).localCheckpoint()
    } finally joined.unpersist()
  }

  /** Incremental JOIN maintenance — the classic delta rule for a
    * materialized inner-join view J = A ⋈ B:
    *
    *   ΔJ = ΔA ⋈ B_old  ∪  A_old ⋈ ΔB  ∪  ΔA ⋈ ΔB
    *
    * (insert-only deltas). Returned as the delta rows to append to the
    * old view; J_new = J_old ∪ ΔJ. Cost ∝ |ΔA|·selectivity + |ΔB|·
    * selectivity — never a re-join of the full base tables. At 100 TB
    * both base sides are bucketed by the join keys, so each of the three
    * delta joins is a co-located probe of only the buckets the delta
    * touches; when a delta is small it broadcasts and the base is never
    * shuffled at all.
    */
  def deltaJoin(aOld: DataFrame, dA: DataFrame, bOld: DataFrame, dB: DataFrame,
                keys: Seq[String]): DataFrame =
    dA.join(bOld, keys)
      .unionByName(aOld.join(dB, keys))
      .unionByName(dA.join(dB, keys))

  /** SCD2 validity intervals from a change stream: each key's records
    * ordered by version become [valid_from, valid_to) rows, the last one
    * open-ended (is_current). One window pass, keyed shuffle only.
    */
  def scd2(changes: DataFrame, keys: Seq[String],
           versionCol: String, tieBreak: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(versionCol), col(tieBreak))
    changes
      .withColumn("valid_from", col(versionCol))
      .withColumn("valid_to", lead(col(versionCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }
}
