package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.QueryBuilder.scan
import graft.ops.Merge

/** Incremental-sync load semantics: orders is treated as a change stream
  * of per-customer state updates versioned by (o_orderdate, o_orderkey).
  * q_merge_upsert merges a pre-reduced base snapshot with a raw delta
  * batch (exercising upsert's associativity — exactly how periodic sync
  * batches land); q_scd2_history derives type-2 validity intervals.
  */
object MergeQueries {

  private val cutoff = "1999-01-01"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_merge_upsert" -> ((s: SparkSession, d: String) => {
      val o = scan(s, d, "orders")
      val base = o.filter(col("o_orderdate") < lit(cutoff).cast("timestamp"))
      val delta = o.filter(col("o_orderdate") >= lit(cutoff).cast("timestamp"))
      val baseState = Merge.latest(base, Seq("o_custkey"), Seq("o_orderdate", "o_orderkey"))
      Merge.upsert(baseState, delta, Seq("o_custkey"), Seq("o_orderdate", "o_orderkey"))
        .orderBy(col("o_custkey"))
    }),

    // incremental view maintenance: the per-customer (orders, revenue)
    // view built by folding THREE yearly delta batches into the state via
    // mergeAdditiveState — equals the from-scratch aggregate (the oracle)
    // because exact long counters form a commutative monoid. Revenue kept
    // as floor-scaled integer cents×10⁴ inside the state; one division at
    // the read edge
    "q_ivm_agg" -> ((s: SparkSession, d: String) => {
      val o = scan(s, d, "orders")
      val cuts = Seq("1900-01-01", "1998-01-01", "2000-01-01", "9999-01-01")
      val deltas = cuts.sliding(2).map { case Seq(lo, hi) =>
        o.filter(col("o_orderdate") >= lit(lo).cast("timestamp") &&
          col("o_orderdate") < lit(hi).cast("timestamp"))
          .groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n_orders"),
            sum(floor(col("o_totalprice") * lit(1000000.0)).cast("long")).as("rev_scaled"))
      }.toSeq
      val state = deltas.reduce((st, delta) =>
        graft.ops.Merge.mergeAdditiveState(st, delta, Seq("o_custkey"), Seq("n_orders", "rev_scaled")))
      state.select(col("o_custkey"), col("n_orders"),
          (col("rev_scaled").cast("double") / lit(1000000.0)).as("revenue"))
        .orderBy(col("o_custkey"))
    }),

    // IVM beyond additive aggregates: per-customer MIN/MAX order value
    // maintained through an INSERT batch (semigroup fold, cost ∝ delta)
    // and then a DELETE batch (recompute-on-retract: only keys whose
    // deleted values touch their extremum re-read their base rows —
    // interior deletes keep state without any base access). Equals the
    // from-scratch aggregate over the post-delete table (the oracle).
    "q_ivm_minmax" -> ((s: SparkSession, d: String) => {
      val oo = scan(s, d, "orders")
      val o = oo.select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      val early = oo.filter(col("o_orderdate") < lit(cutoff).cast("timestamp"))
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      val late = oo.filter(col("o_orderdate") >= lit(cutoff).cast("timestamp"))
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      def agg(df: org.apache.spark.sql.DataFrame) = df.groupBy(col("o_custkey"))
        .agg(min(col("o_totalprice")).as("mn"), max(col("o_totalprice")).as("mx"))
      // 1. state from the initial load, 2. fold in the insert batch
      val afterInserts = Merge.mergeExtremaState(agg(early), agg(late), Seq("o_custkey"))
      // 3. delete batch: every 10th order retracts
      val deletes = o.filter(col("o_orderkey") % 10 === 0)
      val remaining = o.filter(col("o_orderkey") % 10 =!= 0)
      Merge.retractExtremaState(afterInserts, deletes, remaining,
          Seq("o_custkey"), "o_totalprice")
        .orderBy(col("o_custkey"))
    }),

    // incremental JOIN maintenance: the orders⋈customer view maintained
    // through one delta batch on EACH side via the delta rule
    // ΔJ = ΔA⋈B_old ∪ A_old⋈ΔB ∪ ΔA⋈ΔB; J_old ∪ ΔJ equals the
    // from-scratch join of the updated tables (the oracle). Neither base
    // table is ever re-joined whole — each term touches a delta
    "q_ivm_join" -> ((s: SparkSession, d: String) => {
      val o = scan(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      val c = scan(s, d, "customer")
        .select(col("c_custkey").as("o_custkey"), col("c_name"), col("c_acctbal"))
      val aOld = o.filter(col("o_orderkey") % 10 =!= 0)
      val dA = o.filter(col("o_orderkey") % 10 === 0)
      val bOld = c.filter(col("o_custkey") % 7 =!= 0)
      val dB = c.filter(col("o_custkey") % 7 === 0)
      val jOld = aOld.join(bOld, Seq("o_custkey"))
      jOld.unionByName(Merge.deltaJoin(aOld, dA, bOld, dB, Seq("o_custkey")))
        .orderBy(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          col("c_name"), col("c_acctbal"))
    }),

    // snapshot diff — the sync-validation op: classify every key across
    // two table versions as added / removed / changed / unchanged via ONE
    // full outer join on the key with md5 payload fingerprints (no
    // column-by-column compare ships across the shuffle)
    "q_table_diff" -> ((s: SparkSession, d: String) => {
      val o = scan(s, d, "orders")
      def snap(hi: String) = o.filter(col("o_orderdate") < lit(hi).cast("timestamp"))
        .select(col("o_custkey"),
          // per-customer state fingerprint: latest order key + count
          col("o_orderkey"), col("o_totalprice"))
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n"), max(col("o_orderkey")).as("last_key"))
        .select(col("o_custkey"),
          md5(concat_ws(":", col("n"), col("last_key")).cast("binary")).as("fp"))
      val a = snap("1998-01-01").select(col("o_custkey"), col("fp").as("fp_a"))
      val b = snap("2000-01-01").select(col("o_custkey"), col("fp").as("fp_b"))
      a.join(b, Seq("o_custkey"), "full_outer")
        .select(col("o_custkey"),
          when(col("fp_a").isNull, "added")
            .when(col("fp_b").isNull, "removed")
            .when(col("fp_a") =!= col("fp_b"), "changed")
            .otherwise("unchanged").as("status"))
        .groupBy(col("status")).agg(count(lit(1)).as("n_keys"))
        .orderBy(col("status"))
    }),

    // INCREMENTALLY-MAINTAINED table-checksum manifest: because xor is
    // its own inverse, the q_dq_checksum manifest is exactly maintainable
    // under BOTH inserts and deletes without touching the base — new
    // manifest = base ⊕ deleted-rows manifest ⊕ inserted-rows manifest,
    // counts/bytes additive. Cost ∝ |delta|; the oracle recomputes the
    // manifest from scratch on the post-delta corpus
    "q_ivm_checksum" -> ((s: SparkSession, d: String) => {
      val docs = scan(s, d, "documents")
      def manifest(df: DataFrame) = df.select(col("source"), col("n_chars"),
          graft.ops.Dedup.hex60(md5(concat(col("doc_id").cast("string"),
            lit(":"), col("text")).cast("binary"))).as("h"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n"), expr("bit_xor(h)").as("x"),
          sum(col("n_chars")).as("b"))
      val m0 = manifest(docs.filter(col("doc_id") % 10 =!= 1)) // indexed base
      val md = manifest(docs.filter(col("doc_id") % 10 === 2)) // departing batch
      val mi = manifest(docs.filter(col("doc_id") % 10 === 1)) // arriving batch
      def nz(c: String) = coalesce(col(c), lit(0L))
      m0.select(col("source"), col("n").as("n0"), col("x").as("x0"), col("b").as("b0"))
        .join(md.select(col("source"), col("n").as("nd"), col("x").as("xd"), col("b").as("bd")),
          Seq("source"), "full_outer")
        .join(mi.select(col("source"), col("n").as("ni"), col("x").as("xi"), col("b").as("bi")),
          Seq("source"), "full_outer")
        .select(col("source"),
          (nz("n0") - nz("nd") + nz("ni")).cast("long").as("n_rows"),
          nz("x0").bitwiseXOR(nz("xd")).bitwiseXOR(nz("xi")).cast("long").as("xor60"),
          (nz("b0") - nz("bd") + nz("bi")).cast("long").as("n_bytes"))
        // a source whose rows ALL departed maintains to (0, 0, 0) —
        // drop it like the recompute would
        .filter(col("n_rows") > 0)
        .orderBy(col("source"))
    }),

    "q_scd2_history" -> ((s: SparkSession, d: String) => {
      Merge.scd2(
          scan(s, d, "orders")
            .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("o_totalprice")),
          Seq("o_custkey"), "o_orderdate", "o_orderkey")
        .select(col("o_custkey"), col("o_orderkey"), col("valid_from"),
          col("valid_to"), col("is_current"))
        .orderBy(col("o_custkey"), col("valid_from"), col("o_orderkey"))
    }),

    // CDC NET-EFFECT APPLY: collapse an insert/update/delete change log
    // to final state — latest record per key wins (Merge.latest's
    // struct-max, map-side combinable), and a last-op DELETE removes
    // the key entirely. The op stream is synthesized from orders
    // (orderkey is the monotone change sequence); the census of
    // surviving ops rides the same pass. This is the Debezium-feed
    // apply step; cost ∝ changes, one combinable groupBy
    "q_merge_cdc" -> ((s: SparkSession, d: String) => {
      val log = scan(s, d, "orders").select(
        col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        when(col("o_orderkey") % 10 === 0, "D")
          .when(col("o_orderkey") % 3 === 0, "I")
          .otherwise("U").as("op"))
      Merge.latest(log, Seq("o_custkey"), Seq("o_orderkey"))
        .filter(col("op") =!= "D")
        .select(col("o_custkey"), col("o_orderkey"), col("op"))
        .orderBy(col("o_custkey"))
    }),

    // SCD2 POINT-IN-TIME LOOKUP (the Kimball type-2 dimension join):
    // each event picks the history version whose validity interval
    // covers its timestamp — ts ∈ [valid_from, valid_to), open-ended
    // current row. Because per-key intervals PARTITION the timeline
    // (zero-length rows from same-date ties match nothing), every
    // event matches at most one version. The join is equi on the key
    // with the interval residual — blocked by key, never all-pairs
    "q_scd2_asof" -> ((s: SparkSession, d: String) => {
      val hist = Merge.scd2(
        scan(s, d, "orders")
          .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate")),
        Seq("o_custkey"), "o_orderdate", "o_orderkey")
      scan(s, d, "events").select(col("event_id"), col("user_id"), col("ts"))
        .join(hist, col("user_id") === col("o_custkey")
          && col("ts") >= col("valid_from")
          && (col("valid_to").isNull || col("ts") < col("valid_to")))
        .select(col("event_id"), col("user_id"), col("ts"),
          col("o_orderkey"), col("valid_from"))
        .orderBy(col("event_id"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    // from-scratch recompute over the post-delta corpus (base minus the
    // %2 deletes plus the %1 inserts = everything but %2)
    "q_ivm_checksum" ->
      s"""SELECT source, CAST(COUNT(*) AS BIGINT) AS n_rows,
         |  CAST(bit_xor(${DedupQueries.sqlHex60Public("md5(doc_id::VARCHAR || ':' || text)")}) AS BIGINT) AS xor60,
         |  CAST(SUM(n_chars) AS BIGINT) AS n_bytes
         |FROM documents WHERE doc_id % 10 <> 2
         |GROUP BY source ORDER BY source""".stripMargin,
    "q_merge_upsert" ->
      """SELECT o_custkey, o_orderdate, o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
        |FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
        |                                   ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |      FROM orders) t
        |WHERE rn = 1 ORDER BY o_custkey""".stripMargin,
    "q_ivm_agg" ->
      """SELECT o_custkey, COUNT(*) AS n_orders,
        |  CAST(CAST(SUM(CAST(floor(o_totalprice * 1000000.0) AS BIGINT)) AS BIGINT) AS DOUBLE)
        |    / 1000000.0 AS revenue
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    "q_ivm_minmax" ->
      """SELECT o_custkey, min(o_totalprice) AS mn, max(o_totalprice) AS mx
        |FROM orders WHERE o_orderkey % 10 <> 0
        |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    "q_ivm_join" ->
      """SELECT o.o_custkey, o.o_orderkey, o.o_totalprice, c.c_name, c.c_acctbal
        |FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        |ORDER BY o.o_custkey, o.o_orderkey, o.o_totalprice, c.c_name, c.c_acctbal""".stripMargin,
    "q_table_diff" ->
      """WITH sa AS (SELECT o_custkey,
        |              md5(CAST(count(*) AS VARCHAR) || ':' || CAST(max(o_orderkey) AS VARCHAR)) AS fp
        |            FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |            GROUP BY o_custkey),
        |sb AS (SELECT o_custkey,
        |         md5(CAST(count(*) AS VARCHAR) || ':' || CAST(max(o_orderkey) AS VARCHAR)) AS fp
        |       FROM orders WHERE o_orderdate < TIMESTAMP '2000-01-01 00:00:00'
        |       GROUP BY o_custkey),
        |d AS (SELECT CASE WHEN sa.fp IS NULL THEN 'added'
        |             WHEN sb.fp IS NULL THEN 'removed'
        |             WHEN sa.fp <> sb.fp THEN 'changed'
        |             ELSE 'unchanged' END AS status
        |      FROM sa FULL OUTER JOIN sb ON sa.o_custkey = sb.o_custkey)
        |SELECT status, COUNT(*) AS n_keys FROM d GROUP BY status ORDER BY status""".stripMargin,
    "q_scd2_history" ->
      """SELECT o_custkey, o_orderkey, o_orderdate AS valid_from,
        |  lead(o_orderdate) OVER (PARTITION BY o_custkey
        |                          ORDER BY o_orderdate, o_orderkey) AS valid_to,
        |  lead(o_orderdate) OVER (PARTITION BY o_custkey
        |                          ORDER BY o_orderdate, o_orderkey) IS NULL AS is_current
        |FROM orders
        |ORDER BY o_custkey, valid_from, o_orderkey""".stripMargin,

    "q_merge_cdc" ->
      """WITH log AS (SELECT o_custkey, o_orderkey,
        |    CASE WHEN o_orderkey % 10 = 0 THEN 'D'
        |         WHEN o_orderkey % 3 = 0 THEN 'I' ELSE 'U' END AS op
        |  FROM orders),
        |r AS (SELECT *, row_number() OVER (PARTITION BY o_custkey
        |                                   ORDER BY o_orderkey DESC) AS rn
        |      FROM log)
        |SELECT o_custkey, o_orderkey, op FROM r
        |WHERE rn = 1 AND op <> 'D' ORDER BY o_custkey""".stripMargin,

    "q_scd2_asof" ->
      """WITH h AS (
        |  SELECT o_custkey, o_orderkey, o_orderdate AS valid_from,
        |    lead(o_orderdate) OVER (PARTITION BY o_custkey
        |                            ORDER BY o_orderdate, o_orderkey) AS valid_to
        |  FROM orders)
        |SELECT e.event_id, e.user_id, e.ts, h.o_orderkey, h.valid_from
        |FROM events e JOIN h ON e.user_id = h.o_custkey
        |  AND e.ts >= h.valid_from
        |  AND (h.valid_to IS NULL OR e.ts < h.valid_to)
        |ORDER BY e.event_id""".stripMargin
  )
}
