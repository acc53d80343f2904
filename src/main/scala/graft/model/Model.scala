package graft.model

/** Declarative query/pipeline model — the Scala analogue of the reference's
  * type system (reference: src/types.ts:98-308). The reference expresses a
  * query as a `Connector` object: projection (`fields`), conjunctive
  * `filters`, multi-key `sort`, `limit` and pagination
  * (src/types.ts:242-264). Here the same declarative surface compiles to a
  * Spark logical plan (see [[graft.engine.QueryBuilder]]) instead of being
  * compiled per-adapter into SQL/Mongo/REST dialects.
  */

/** One conjunctive predicate — reference src/types.ts:151-155.
  * Operator strings match the reference's cross-adapter union
  * (src/types.ts:157-199; SURVEY §2.2 F2-F4).
  */
final case class Filter(field: String, operator: String, value: Any = null)

/** Multi-key sort entry — reference src/types.ts:232-235. */
final case class Sort(field: String, ascending: Boolean = true)
object Sort {
  def asc(f: String): Sort = Sort(f, ascending = true)
  def desc(f: String): Sort = Sort(f, ascending = false)
}

/** Pagination config — reference src/types.ts:236-241. Under Spark, paging
  * is replaced by partitioned scans; `itemsPerPage` survives only as the
  * sink-side batch cap (reference src/index.ts:479-524, SURVEY §2.1 K3).
  */
final case class Pagination(itemsPerPage: Int = 1000, pageType: String = "offset")

/** A named transformation step — reference src/types.ts:201-230 and
  * src/utils/transform.ts. Parameters are carried loosely (like the
  * reference's per-type option objects); [[graft.transform.Transforms]]
  * validates per type at plan-build time.
  */
final case class Transformation(
    `type`: String,
    field: String = null,
    to: String = null,
    properties: Seq[String] = Nil,
    glue: String = " ",
    delimiter: String = ",",
    search: String = null,
    replace: String = null,
    prefix: String = null,
    suffix: String = null,
    pattern: String = null,
    start: Int = 0,
    end: Int = Int.MaxValue,
    fields: Seq[String] = Nil
)

/** Declarative aggregate — EXTENSION beyond the reference (SURVEY §7.1
  * "adds Agg/Join/Window specs as extensions"; the reference has no
  * aggregation surface, §2.5). `function` is allowlisted in
  * [[graft.engine.QueryBuilder.aggToColumn]]; sums/avgs run through
  * [[graft.ops.ExactAgg]] so declarative results are order-independent.
  */
final case class AggSpec(function: String, field: String = null, as: String = null)

/** Declarative GROUP BY with HAVING (post-aggregation filters reuse the
  * Filter operator registry against the agg output names).
  */
final case class GroupBySpec(
    fields: Seq[String],
    aggs: Seq[AggSpec],
    having: Seq[Filter] = Nil
)

/** Declarative equi-join to another table — EXTENSION (SURVEY §2.4: the
  * reference has no joins). `broadcastRight` marks a dimension-sized
  * right side for a broadcast-hash join (no fact shuffle).
  */
final case class JoinSpec(
    table: String,
    leftOn: String,
    rightOn: String,
    joinType: String = "inner",            // inner|left|right|full|left_semi|left_anti
    broadcastRight: Boolean = false
)

/** Declarative window function — EXTENSION (SURVEY §7.1; §2.5: the
  * reference has no windows). `function` is allowlisted in
  * [[graft.engine.QueryBuilder.windowToColumn]]; `orderBy` should be
  * key-complete for deterministic ranks (SURVEY §7.4).
  */
final case class WindowFnSpec(
    function: String,                      // row_number|rank|dense_rank|lag|lead|sum|avg|min|max|count
    field: String = null,                  // null for rank-family
    as: String = null,
    partitionBy: Seq[String] = Nil,
    orderBy: Seq[Sort] = Nil,
    offset: Int = 1                        // lag/lead distance
)

/** Declarative exact dedup — EXTENSION: keep ONE row per key,
  * deterministically (the minimum remaining-column tuple — a groupBy
  * struct-min, so it partial-aggregates map-side; `dropDuplicates`'s
  * arbitrary-survivor semantics can never pass a bit-exact oracle).
  */
final case class DedupSpec(keys: Seq[String])

/** Declarative latest-wins upsert reduction — EXTENSION: reduce a change
  * set to its newest row per key (greatest (versionCols..., payload...)
  * tuple — Merge.latest, map-side combinable), the query-side verb of
  * the reference's `action: "sync"` destination merge.
  */
final case class UpsertSpec(keys: Seq[String], versionCols: Seq[String])

/** Declarative reproducible sample — EXTENSION: keep rows whose salted
  * content hash lands under `percent` of the bucket space. No RNG state:
  * the same (salt, column) always selects the same rows on any engine,
  * any partitioning, any cluster size.
  */
final case class SampleSpec(column: String, percent: Int, salt: String = "graft")

/** The query half of a pipeline endpoint — reference src/types.ts:242-264.
  * `table` names a testdata parquet table (or any registered source path).
  * `joins`, `groupBy` and `windows` are extensions (SURVEY §7.1) — the
  * declarative surface a reference user grows into once joins/aggs/
  * windows exist.
  */
final case class Connector(
    table: String,
    fields: Seq[String] = Nil,             // empty => endpoint defaults / all
    filters: Seq[Filter] = Nil,            // always AND-combined (SURVEY §2.2 F1)
    sort: Seq[Sort] = Nil,
    limit: Long = 1000000L,                // DEFAULT_CONFIG.TOTAL_ITEMS_LIMIT, src/index.ts:31-34
    offset: Long = 0L,
    transformations: Seq[Transformation] = Nil,
    joins: Seq[JoinSpec] = Nil,
    groupBy: Option[GroupBySpec] = None,
    windows: Seq[WindowFnSpec] = Nil,      // applied after joins, before groupBy
    sample: Option[SampleSpec] = None,     // applied after transforms, before dedup
    upsert: Option[UpsertSpec] = None,     // applied after sample, before dedup
    dedup: Option[DedupSpec] = None        // applied before joins
)

/** A named queryable endpoint with default projection — reference
  * src/types.ts:123-137 (Endpoint) and the defaultFields copy-down at
  * src/index.ts:200-206: an empty Connector.fields takes the endpoint's
  * defaults.
  */
final case class Endpoint(
    name: String,
    table: String,
    defaultFields: Seq[String] = Nil
)

/** Retry policy — reference src/index.ts:376-379 defaults. */
final case class ErrorHandling(maxRetries: Int = 0, retryIntervalMs: Long = 1000L)

/** Typed pipeline event — reference src/types.ts:267-272. */
final case class PipelineEvent(
    eventType: String,                     // start|extract|transform|load|error|complete|info
    message: String,
    dataCount: Option[Long] = None,
    timestampMs: Long = System.currentTimeMillis()
)

/** An extract→transform→load pipeline — reference src/types.ts:274-301. */
final case class PipelineSpec(
    source: Option[Connector] = None,
    target: Option[SinkSpec] = None,
    errorHandling: ErrorHandling = ErrorHandling()
)

/** Sink half — reference upload surface (SURVEY §2.1 K1-K4). */
final case class SinkSpec(
    format: String,                        // parquet|csv|json|jdbc|foreach
    path: String = null,
    mode: String = "",                     // "" = format default (overwrite for file/jdbc; upsert sinks merge and REJECT an explicit overwrite)
    itemsPerBatch: Int = 0,                // 0 => no batch cap (reference src/index.ts:480-489)
    options: Map[String, String] = Map.empty
)
