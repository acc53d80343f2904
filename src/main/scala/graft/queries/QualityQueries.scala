package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.QueryBuilder.scan

/** Data-quality audit tier — the checks a sync engine runs after landing
  * a batch (the reference trusts the source; a warehouse can't):
  * referential integrity via anti-joins and key-uniqueness via
  * groupBy-HAVING. Both are one-shuffle shapes that scale linearly.
  */
object QualityQueries {

  /** Benford first-digit expectation in ppm — log10(1 + 1/d) computed
    * once here and inlined into BOTH plans (no engine runs log10).
    */
  private val benfordPpm: Seq[(Int, Long)] =
    (1 to 9).map(d => d -> math.round(math.log10(1 + 1.0 / d) * 1e6))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // LUHN-GATED card-number detection — the refinement that separates
    // a real PII scanner from a digit-run regex (most 13-16 digit runs
    // are ids, not cards; the Luhn mod-10 checksum is the standard
    // false-positive gate). The checksum is one codegen'd HOF fold over
    // the reversed digit string — pure integers, no UDF. Fixture: a
    // synthetic 15-digit "card" per customer whose validity varies
    // naturally with the key
    "q_dq_luhn" -> ((s: SparkSession, d: String) => {
      scan(s, d, "customer")
        .withColumn("msg", concat(lit("ref 4"),
          lpad((col("c_custkey") * 7919 % 100000000000000L).cast("string"), 14, "0"),
          lit(" end")))
        .withColumn("card", regexp_extract(col("msg"), "[0-9]{13,16}", 0))
        .withColumn("luhn_sum", expr(
          """aggregate(sequence(1, length(card)), 0, (acc, i) -> acc +
            |  CASE WHEN i % 2 = 1 THEN ascii(substr(reverse(card), i, 1)) - 48
            |       ELSE IF((ascii(substr(reverse(card), i, 1)) - 48) * 2 > 9,
            |               (ascii(substr(reverse(card), i, 1)) - 48) * 2 - 9,
            |               (ascii(substr(reverse(card), i, 1)) - 48) * 2) END)"""
            .stripMargin))
        .select(col("c_custkey"), col("card"),
          col("luhn_sum").cast("long").as("luhn_sum"),
          (col("luhn_sum") % 10 === 0).as("luhn_valid"))
        .orderBy(col("c_custkey"))
    }),

    // FRESHNESS / staleness census (the ops-side data-quality gauge
    // every ingestion SLA alerts on): per event type, last-seen event
    // time and its lag in whole days behind the corpus frontier — one
    // combinable aggregation + a broadcast 1-row frontier
    "q_dq_freshness" -> ((s: SparkSession, d: String) => {
      val e = scan(s, d, "events")
      val frontier = e.agg(max(col("ts")).as("frontier"))
      e.groupBy(col("event_type"))
        .agg(max(col("ts")).as("last_ts"), count(lit(1)).as("n_events"))
        .crossJoin(broadcast(frontier))
        .withColumn("staleness_days",
          datediff(col("frontier").cast("date"), col("last_ts").cast("date")).cast("long"))
        .select(col("event_type"), col("last_ts"), col("n_events"), col("staleness_days"))
        .orderBy(col("event_type"))
    }),

    // orphan-FK audit: each check is an anti-join counted into one
    // (check_name, n_violations) report row; checks union lazily so the
    // whole audit is a single job
    "q_dq_orphans" -> ((s: SparkSession, d: String) => {
      val l = scan(s, d, "lineitem")
      val o = scan(s, d, "orders")
      val c = scan(s, d, "customer")
      val sup = scan(s, d, "supplier")
      def check(name: String, child: DataFrame, key: String, parent: DataFrame, pkey: String) =
        child.join(parent, child(key) === parent(pkey), "left_anti")
          .agg(count(lit(1)).as("n_violations"))
          .select(lit(name).as("check_name"), col("n_violations"))
      check("lineitem_orders", l, "l_orderkey", o, "o_orderkey")
        .unionAll(check("orders_customer", o, "o_custkey", c, "c_custkey"))
        .unionAll(check("lineitem_supplier", l, "l_suppkey", sup, "s_suppkey"))
        .orderBy(col("check_name"))
    }),

    // key-uniqueness audit: lineitem's (l_orderkey, l_linenumber) is NOT
    // unique in this corpus — report every violating key with its
    // multiplicity (the detail a dedup step consumes)
    "q_dq_dupes" -> ((s: SparkSession, d: String) => {
      scan(s, d, "lineitem")
        .groupBy(col("l_orderkey"), col("l_linenumber"))
        .agg(count(lit(1)).as("n_copies"))
        .filter(col("n_copies") > 1)
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // DISTRIBUTION-DRIFT census (the ingest monitor): order totals of
    // the pre-1995 snapshot vs everything after, binned into 16 fixed
    // [0, 600k) bins, floor-ppm shares and the per-bin |Δshare| whose
    // half-sum is the exact total-variation distance — TVD, not
    // PSI/KL, so no ln() and both engines agree bit-for-bit
    "q_dq_drift" -> ((s: SparkSession, d: String) => {
      val o = scan(s, d, "orders")
      val cut = lit("1995-01-01").cast("date")
      graft.ops.Drift.driftCensus(
        o.filter(col("o_orderdate") < cut),
        o.filter(col("o_orderdate") >= cut),
        col("o_totalprice"), lo = 0.0, hi = 600000.0, nBins = 16)
        .orderBy(col("bin"))
    }),

    // POPULATION STABILITY INDEX over the same fixed binning — the
    // industry drift score q_dq_drift's TVD deliberately avoided
    // "because PSI needs ln()": the staged fixed-point log generator
    // (UlmTokenizer.costStages, shared bit-exactly with the DuckDB
    // oracle) retired that constraint. Per bin: shares floored at
    // 1 ppm (the Laplace guard — an empty bin would send PSI to ∞),
    // dlog_cb = round(100·log2(max/min share)), psi_term =
    // |p−q|·dlog_cb, so PSI in bits = Σ terms / 1e8 (·ln2 for nats).
    // Still two nBins-row histograms — the log runs on 16 rows
    "q_dq_psi" -> ((s: SparkSession, d: String) => {
      import graft.ops.Drift
      val o = scan(s, d, "orders")
      val cut = lit("1995-01-01").cast("date")
      Drift.psiOfHists(
        Drift.histogram(o.filter(col("o_orderdate") < cut),
          col("o_totalprice"), lo = 0.0, hi = 600000.0, nBins = 16),
        Drift.histogram(o.filter(col("o_orderdate") >= cut),
          col("o_totalprice"), lo = 0.0, hi = 600000.0, nBins = 16))
    }),

    // K-ANONYMITY census (Sweeney 2002) over customer quasi-identifiers
    // (mktsegment, nationkey, acctbal-band): ONE rollup pass computes the
    // equivalence classes of the whole generalization ladder at once —
    // rung 0 = full QI tuple, each higher rung drops the next-most-
    // identifying column (exactly ROLLUP's nesting), rung 3 = fully
    // suppressed. Per rung: class count, smallest class, rows in classes
    // below k=5 and their floor-ppm share. Map-side combinable; the
    // re-aggregation input is class-count-sized, not row-sized
    "q_dq_kanon" -> ((s: SparkSession, d: String) => {
      val k = 5
      val c = scan(s, d, "customer").select(
        col("c_mktsegment").as("seg"), col("c_nationkey").as("nat"),
        floor(col("c_acctbal") / 1000).cast("long").as("band"))
      val classes = c.rollup(col("seg"), col("nat"), col("band"))
        .agg(count(lit(1)).as("n"),
          (grouping(col("seg")) * 4 + grouping(col("nat")) * 2
            + grouping(col("band"))).as("gid"))
      classes.groupBy(col("gid"))
        .agg(
          count(lit(1)).as("n_classes"),
          min(col("n")).as("min_class_size"),
          sum(when(col("n") < k, col("n")).otherwise(lit(0L))).as("n_at_risk"),
          sum(col("n")).as("n_rows"))
        .select(
          when(col("gid") === 0, "seg+nation+band")
            .when(col("gid") === 1, "seg+nation")
            .when(col("gid") === 3, "seg")
            .otherwise("suppressed").as("qi_level"),
          col("gid").cast("int").as("rung"),
          col("n_classes").cast("long").as("n_classes"),
          col("min_class_size").cast("long").as("min_class_size"),
          col("n_at_risk").cast("long").as("n_at_risk"),
          expr("n_at_risk * 1000000 div n_rows").as("risk_ppm"),
          (col("min_class_size") >= k).as("k_anonymous"))
        .orderBy(col("rung"))
    }),

    // OUT-OF-ORDER ARRIVAL census: does the assigned event_id sequence
    // agree with event TIME per user? Adjacent inversions (previous id
    // greater than the next) over the (µs, event_id)-ordered per-user
    // stream — the audit that sizes a streaming deploy's watermark and
    // catches producer clock skew. One per-user window + two
    // combinable aggregations; the second runs over the user census.
    // 1-row corpus verdict: users clean/dirty, inversion ppm
    "q_dq_sequence" -> ((s: SparkSession, d: String) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
      val perUser = scan(s, d, "events")
        .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
        .withColumn("prev", lag(col("event_id"), 1).over(w))
        .filter(col("prev").isNotNull)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(when(col("prev") > col("event_id"), 1L).otherwise(0L)).as("n_inv"))
      perUser.agg(count(lit(1)).as("n_users"),
          sum(when(col("n_inv") === 0, 1L).otherwise(0L)).as("n_users_clean"),
          sum(col("n_pairs")).as("n_pairs"),
          sum(col("n_inv")).as("n_inversions"))
        .withColumn("inv_ppm", expr("n_inversions * 1000000 div n_pairs"))
    }),

    // L-DIVERSITY census (Machanavajjhala 2007) — k-anonymity's known
    // hole: a QI class of 5 identical rows is still a disclosure if all
    // 5 share the SENSITIVE value. QI = (nation, acctbal-band),
    // sensitive = market segment; per class the distinct sensitive
    // count, rolled into the auditor's histogram (diversity level →
    // classes/rows, worst class size, at-risk flag vs l=3). Two
    // combinable aggregations; the second runs over the class census,
    // not rows — dimension-sized at any data scale
    "q_dq_ldiversity" -> ((s: SparkSession, d: String) => {
      val l = 3
      val classes = scan(s, d, "customer")
        .groupBy(col("c_nationkey").as("nat"),
          floor(col("c_acctbal") / 1000).cast("long").as("band"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("c_mktsegment")).as("ldiv"))
      classes.groupBy(col("ldiv"))
        .agg(count(lit(1)).as("n_classes"),
          sum(col("n")).as("n_rows"),
          min(col("n")).as("min_class_size"))
        .select(col("ldiv").cast("long"), col("n_classes").cast("long"),
          col("n_rows").cast("long"), col("min_class_size").cast("long"),
          (col("ldiv") < l).as("at_risk"))
        .orderBy(col("ldiv"))
    }),

    // T-CLOSENESS census (Li 2007) — l-diversity's known hole: a class
    // whose sensitive values are DISTINCT but all extreme (every acctbal
    // in the top band) still discloses. t-closeness bounds the Earth
    // Mover's Distance between each QI class's sensitive distribution
    // and the GLOBAL one. Sensitive attribute = ordinal acctbal band,
    // where ordinal EMD has the closed form
    //   EMD = (1/(m-1)) * sum_i |CumP_i - CumQ_i|
    // — exact in integers after cross-multiplying by n_g*N: the running
    // cumdiff is sum_{j<=i} (c_j*N - C_j*n_g), and the final bucket's
    // cumdiff is identically 0, so summing |cumdiff| over ALL buckets
    // equals the i<m sum. Shape: one row-level aggregation to the
    // (class, band) census, then everything runs on a dimension-sized
    // grid (classes x global bands, broadcast nested-loop — ~125x11
    // rows at ANY data scale). BIGINT bound: |cumdiff| <= n_g*N (~2e13
    // at sf100, fits); the ppm numerator would not (m*n_g*N*1e6 ~ 2e19),
    // so it is DECIMAL(38,0)-widened — matching the oracle, whose
    // SUM OVER already rides HUGEINT
    "q_dq_tcloseness" -> ((s: SparkSession, d: String) => {
      import org.apache.spark.sql.expressions.Window
      val tPpm = 200000L // t = 0.2
      val rows = scan(s, d, "customer").select(
        col("c_mktsegment").as("seg"), col("c_nationkey").as("nat"),
        floor(col("c_acctbal") / 1000).cast("long").as("band"))
      val cls = rows.groupBy(col("seg"), col("nat"), col("band"))
        .agg(count(lit(1)).as("c"))
      val classTot = cls.groupBy(col("seg"), col("nat"))
        .agg(sum(col("c")).as("n_g"))
      val glob = rows.groupBy(col("band")).agg(count(lit(1)).as("cg"))
      val tot = rows.agg(count(lit(1)).as("n_tot"),
        countDistinct(col("band")).as("m"))
      val grid = classTot.crossJoin(broadcast(glob))
        .join(cls, Seq("seg", "nat", "band"), "left_outer")
        .withColumn("c", coalesce(col("c"), lit(0L)))
        .crossJoin(broadcast(tot))
      val w = Window.partitionBy(col("seg"), col("nat")).orderBy(col("band"))
      grid
        .withColumn("cum",
          sum(col("c") * col("n_tot") - col("cg") * col("n_g")).over(w))
        .groupBy(col("seg"), col("nat"))
        .agg(max(col("n_g")).as("n_rows"),
          sum(abs(col("cum"))).as("emd_num"),
          max(col("n_g") * col("n_tot") * (col("m") - 1)).as("emd_den"))
        .select(col("seg"), col("nat").cast("long").as("nat"),
          col("n_rows").cast("long").as("n_rows"),
          expr("""CAST(CAST(emd_num AS DECIMAL(38,0)) * 1000000
                 |  div emd_den AS BIGINT)""".stripMargin).as("emd_ppm"))
        .withColumn("t_violation", col("emd_ppm") > tPpm)
        .orderBy(col("seg"), col("nat"))
    }),

    // RIGHT-TO-BE-FORGOTTEN propagation manifest: a deletion request for
    // a customer set must cascade through every table that references it
    // (orders → their lineitems; events by user). One broadcast of the
    // forget set, one flagged pass per table — at 100 TB the tombstone
    // sets ride broadcast/bloom semi-joins, the fact tables are scanned
    // once each, and the output is the 4-row audit a compliance job logs
    "q_dq_forget" -> ((s: SparkSession, d: String) => {
      val cust = scan(s, d, "customer")
      val orders = scan(s, d, "orders")
      val del = cust.filter(col("c_custkey") % 97 === 3)
        .select(col("c_custkey").as("__k"))
      val odel = orders.join(broadcast(del), col("o_custkey") === col("__k"), "left_semi")
        .select(col("o_orderkey").as("__k"))
      def audit(name: String, df: DataFrame, key: String, dels: DataFrame) =
        df.join(broadcast(dels), col(key) === col("__k"), "left_outer")
          .agg(
            sum(when(col("__k").isNotNull, 1L).otherwise(0L)).cast("long").as("n_delete"),
            sum(when(col("__k").isNull, 1L).otherwise(0L)).cast("long").as("n_keep"))
          .select(lit(name).as("table_name"), col("n_delete"), col("n_keep"))
      audit("customer", cust, "c_custkey", del)
        .unionAll(audit("events", scan(s, d, "events"), "user_id", del))
        .unionAll(audit("lineitem", scan(s, d, "lineitem"), "l_orderkey", odel))
        .unionAll(audit("orders", orders, "o_custkey", del))
        .orderBy(col("table_name"))
    }),

    // DECLARATIVE CONSTRAINT SUITE (the Deequ/dbt-tests shape): the
    // suite is data (case-class rules); the engine folds all row-scoped
    // checks into ONE codegen'd aggregation, uniqueness into one
    // combinable groupBy, and the FK into one anti-join — never a job
    // per rule (see ops/Constraints.scala)
    "q_dq_constraints" -> ((s: SparkSession, d: String) => {
      import graft.ops.Constraints
      import graft.ops.Constraints._
      Constraints.report(scan(s, d, "lineitem"), Seq(
          Check.notNull("l_orderkey"),
          Check.inRange("l_quantity", 1, 30),
          Check.inSet("l_returnflag", Seq("A", "N", "R")),
          Check.matches("l_linestatus", "^[OF]$"),
          Unique(Seq("l_orderkey", "l_linenumber")),
          ForeignKey("l_orderkey", scan(s, d, "orders"), "o_orderkey", "orders")))
        .orderBy(col("rule"))
    }),

    // ROW-LEVEL QUARANTINE (dead-letter split): the same suite's
    // row-scoped checks stamp every row with a violation BITMAP in one
    // map pass; clean rows flow on, the rest carry a machine-readable
    // reason. Census by bitmap — which rule COMBINATIONS fire together
    "q_dq_quarantine" -> ((s: SparkSession, d: String) => {
      import graft.ops.Constraints
      import graft.ops.Constraints.Check
      Constraints.rowAudit(scan(s, d, "lineitem"), Seq(
          Check.notNull("l_orderkey"),                     // bit 0
          Check.inRange("l_quantity", 1, 30),              // bit 1
          Check.inSet("l_returnflag", Seq("A", "N", "R")), // bit 2
          Check.inRange("l_discount", 0.0, 0.05)))         // bit 3
        .groupBy(col("violation_bits"), col("is_clean"))
        .agg(count(lit(1)).as("n_rows"))
        .orderBy(col("violation_bits"))
    }),

    // JOIN-SIZE PRE-FLIGHT: exact predicted cardinality of
    // lineitem ⋈ orders from the two key-count relations — Σ na·nb over
    // matching keys, plus the hottest key's share (the AQE-style skew
    // diagnostic, runnable BEFORE committing to the shuffle). Both
    // count relations are map-side-combinable and key-sized
    "q_profile_join_size" -> ((s: SparkSession, d: String) => {
      val a = scan(s, d, "lineitem")
        .groupBy(col("l_orderkey").as("k")).agg(count(lit(1)).as("na"))
      val b = scan(s, d, "orders")
        .groupBy(col("o_orderkey").as("k")).agg(count(lit(1)).as("nb"))
      a.join(b, "k").select((col("na") * col("nb")).as("prod"))
        .agg(sum(col("prod")).cast("long").as("est_rows"),
          count(lit(1)).as("n_match_keys"),
          max(col("prod")).cast("long").as("max_key_rows"))
        .withColumn("hot_key_ppm", expr("max_key_rows * 1000000 div est_rows"))
    }),

    // PSEUDONYMIZED-EXPORT audit (ops/Pseudonym.scala): customer and
    // orders stamp c_custkey/o_custkey with the same keyed-hash token in
    // independent map-only passes (no mapping table, no extra shuffle);
    // the audit proves per segment that (a) the token is injective here
    // (n_tokens = n_customers — a collision would silently merge two
    // identities) and (b) the token join reproduces the raw-key join
    // exactly (n_orders_tok = n_orders_raw), plus an order-independent
    // xor checksum of the token set for replica comparison
    "q_dq_pseudonym" -> ((s: SparkSession, d: String) => {
      import graft.ops.Pseudonym
      val salt = "epoch1"
      import graft.ops.CacheScope.ScopedPersist
      // r18: the tokenized customer relation feeds THREE consumers (the
      // census, the token-equality join, the raw-key join) and was
      // recomputed — with its per-row crypto token — for each; persist
      // once (guide §5 / the vocab_growth recompute-removal pattern)
      val ct = scan(s, d, "customer").select(
        col("c_mktsegment").as("segment"),
        col("c_custkey"),
        Pseudonym.token(col("c_custkey"), salt).as("tok"))
        .scopedPersist()
      val ot = scan(s, d, "orders").select(
        col("o_custkey"), Pseudonym.token(col("o_custkey"), salt).as("otok"))
      val base = ct.groupBy(col("segment")).agg(
        count(lit(1)).as("n_customers"),
        countDistinct(col("tok")).as("n_tokens"),
        expr("bit_xor(tok)").as("tokens_xor"))
      val viaTok = ot.join(ct, col("otok") === col("tok"))
        .groupBy(col("segment")).agg(count(lit(1)).as("n_orders_tok"))
      val viaRaw = scan(s, d, "orders").join(ct, col("o_custkey") === col("c_custkey"))
        .groupBy(col("segment")).agg(count(lit(1)).as("n_orders_raw"))
      base.join(viaTok, Seq("segment")).join(viaRaw, Seq("segment"))
        .orderBy(col("segment"))
    }),

    // ε-DP NOISY-COUNT release (ops/DpRelease.scala): per-segment
    // customer counts + two-sided geometric noise (the discrete
    // Laplace; sensitivity-1 counts ⇒ ε-DP exactly, all-integer so no
    // float-Laplace leak). The draw is the keyed group hash pushed
    // through a precomputed inverse-CDF threshold table, unrolled into
    // one codegen'd projection — and inlined into the oracle, so the
    // release is bit-exact replayable (same salt ⇒ same release)
    "q_dq_dpcount" -> ((s: SparkSession, d: String) =>
      graft.ops.DpRelease.noisyCount(
        scan(s, d, "customer"), "c_mktsegment", salt = "release1", eps = 1.0)
        .orderBy(col("grp"))),

    // ROW-LEVEL SECURITY audit (ops/RowPolicy.scala): three roles'
    // policies (data, not code) compiled into filter+mask plans over
    // customer; the audit proves per role WHAT each view exposes —
    // visible rows, an order-independent xor of the visible keys, and
    // an xor over the (masked or raw) name column, which differs
    // between roles seeing the same rows iff masking is applied and
    // role-scoped. The filter is a plain Catalyst predicate, so RLS
    // participates in pushdown/pruning (asserted in PlanQualitySpec)
    "q_dq_rls" -> ((s: SparkSession, d: String) => {
      import graft.ops.RowPolicy, graft.ops.RowPolicy.Policy
      val salt = "rls1"
      val cust = scan(s, d, "customer")
      val policies = Seq(
        Policy("analyst_eu", "c_nationkey < 10", Seq("c_name")),
        Policy("analyst_us", "c_nationkey >= 10 AND c_mktsegment = 'BUILDING'", Seq("c_name")),
        Policy("auditor", "true", Seq.empty))
      policies.map { p =>
        RowPolicy.enforce(cust, p, salt)
          // hashes whatever the view exposes: the raw name for auditor,
          // the role-salted token string for analysts — same rows,
          // different masks ⇒ different names_xor
          .select(col("c_custkey"), graft.ops.Dedup.hex60(
            md5(col("c_name").cast("string").cast("binary"))).as("h"))
          .agg(count(lit(1)).as("n_visible"),
            expr("bit_xor(c_custkey)").as("keys_xor"),
            expr("bit_xor(h)").as("names_xor"))
          .select(lit(p.role).as("role"), col("n_visible"),
            col("keys_xor"), col("names_xor"))
      }.reduce(_ unionAll _).orderBy(col("role"))
    }),

    // SOURCE-vs-DERIVED RECONCILIATION: o_totalprice against the sum
    // recomputed from the order's lineitems — the header/detail audit
    // every finance warehouse runs after load. One combinable groupBy
    // on the detail side, one join on the header key, exact
    // floor-scaled cent diffs bucketed into a census (match /
    // near / off-by-more + headers with no details at all)
    "q_dq_reconcile" -> ((s: SparkSession, d: String) => {
      val detail = scan(s, d, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100))
          .cast("long").as("detail_cents"))
      scan(s, d, "orders")
        .select(col("o_orderkey"), floor(col("o_totalprice") * 100).cast("long").as("header_cents"))
        .join(detail, col("o_orderkey") === col("l_orderkey"), "left_outer")
        // mismatch magnitude binned by DIGIT COUNT of the cent diff —
        // an order-of-magnitude histogram with no log() (length of the
        // integer's decimal string is exact on both engines)
        .select(when(col("detail_cents").isNull, "no_details")
          .when(col("header_cents") === col("detail_cents"), "exact")
          .otherwise(concat(lit("diff_digits_"),
            length(abs(col("header_cents") - col("detail_cents")).cast("string"))))
          .as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)).as("n_orders"))
        .orderBy(col("bucket"))
    }),

    // PARTITION-GAP census (ingest completeness): the daily event spine
    // from min to max day, zero-days counted and the LONGEST gap run
    // measured via gaps-and-islands on the day index — the check a
    // backfill scheduler runs before declaring a table current. All
    // windows run on the day-grain spine (constant size in data)
    "q_dq_gaps" -> ((s: SparkSession, d: String) => {
      import org.apache.spark.sql.expressions.Window
      // the audited slice is the SPARSE high-value purchases (so real
      // gaps exist); the spine spans the whole table's time range
      val daily = scan(s, d, "events")
        .filter(col("event_type") === "purchase" && col("value") > 250)
        .groupBy(date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
      val bounds = scan(s, d, "events")
        .agg(date_trunc("day", min(col("ts"))).as("d0"),
          date_trunc("day", max(col("ts"))).as("d1"))
      val spine = bounds
        .select(explode(sequence(col("d0"), col("d1"), expr("INTERVAL 1 DAY"))).as("day"))
      val filled = spine.join(daily, Seq("day"), "left")
        .select(col("day"), coalesce(col("n"), lit(0L)).as("n"))
      val w = Window.orderBy(col("day"))
      val runs = filled
        .withColumn("idx", row_number().over(w))
        .filter(col("n") === 0)
        .withColumn("grp", col("idx") - row_number().over(w))
        .groupBy(col("grp")).agg(count(lit(1)).as("run_len"))
      val gapStats = runs.agg(
        coalesce(max(col("run_len")), lit(0L)).cast("long").as("longest_gap"),
        count(lit(1)).as("n_gap_runs"))
      filled.agg(count(lit(1)).as("n_days"),
          sum(when(col("n") === 0, 1L).otherwise(0L)).cast("long").as("n_empty_days"))
        .crossJoin(broadcast(gapStats))
    }),

    // BENFORD'S-LAW first-digit census (the fraud-analytics screen):
    // leading digit taken from the INTEGER part's decimal string (a
    // double's string form differs across engines; a long's never
    // does), observed ppm share vs the Benford expectation — the
    // expectation constants are computed ONCE on the driver and
    // inlined into both plans, so no log10() runs in either engine
    "q_dq_benford" -> ((s: SparkSession, d: String) => {
      val digitPpm = benfordPpm.foldLeft(lit(null).cast("long")) { case (acc, (dig, ppm)) =>
        when(col("digit") === dig, ppm).otherwise(acc)
      }
      val counts = scan(s, d, "orders")
        .filter(col("o_totalprice") >= 1)
        .select(substring(floor(col("o_totalprice")).cast("long").cast("string"), 1, 1)
          .cast("int").as("digit"))
        .groupBy(col("digit")).agg(count(lit(1)).as("n"))
      val tot = counts.agg(sum(col("n")).as("n_total"))
      counts.crossJoin(broadcast(tot))
        .withColumn("share_ppm", expr("n * 1000000 div n_total"))
        .withColumn("benford_ppm", digitPpm)
        .withColumn("dev_ppm", abs(col("share_ppm") - col("benford_ppm")))
        .select(col("digit"), col("n"), col("share_ppm"),
          col("benford_ppm"), col("dev_ppm"))
        .orderBy(col("digit"))
    }),

    // TABLE CHECKSUM manifest — the replication/copy audit: per source,
    // the row count, byte mass, and an ORDER-INDEPENDENT 60-bit content
    // checksum (bit_xor over per-row md5-hex60) — two table copies match
    // iff their manifests match, with no sort and no row shipping. One
    // map-side-combinable pass (xor is associative+commutative)
    "q_dq_checksum" -> ((s: SparkSession, d: String) => {
      scan(s, d, "documents")
        .select(col("source"), col("n_chars"),
          graft.ops.Dedup.hex60(md5(concat(col("doc_id").cast("string"),
            lit(":"), col("text")).cast("binary"))).as("h"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_rows"),
          expr("bit_xor(h)").as("xor60"),
          sum(col("n_chars")).as("n_bytes"))
        .orderBy(col("source"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    // checksum replay over the same synthetic card; DuckDB spells the
    // fold as list_sum over a transformed range — identical arithmetic
    "q_dq_luhn" ->
      """WITH m AS (SELECT c_custkey,
        |    'ref 4' || lpad(CAST(c_custkey * 7919 % 100000000000000 AS VARCHAR), 14, '0')
        |      || ' end' AS msg
        |  FROM customer),
        |c AS (SELECT c_custkey, regexp_extract(msg, '[0-9]{13,16}', 0) AS card FROM m),
        |l AS (SELECT c_custkey, card,
        |    CAST(list_sum(list_transform(range(1, length(card) + 1), i ->
        |      CASE WHEN i % 2 = 1 THEN ascii(substring(reverse(card), CAST(i AS INT), 1)) - 48
        |           ELSE CASE WHEN (ascii(substring(reverse(card), CAST(i AS INT), 1)) - 48) * 2 > 9
        |                     THEN (ascii(substring(reverse(card), CAST(i AS INT), 1)) - 48) * 2 - 9
        |                     ELSE (ascii(substring(reverse(card), CAST(i AS INT), 1)) - 48) * 2 END
        |      END)) AS BIGINT) AS luhn_sum
        |  FROM c)
        |SELECT c_custkey, card, luhn_sum, luhn_sum % 10 = 0 AS luhn_valid
        |FROM l ORDER BY c_custkey""".stripMargin,

    "q_dq_freshness" ->
      """WITH f AS (SELECT MAX(ts) AS frontier FROM events),
        |g AS (SELECT event_type, MAX(ts) AS last_ts,
        |        CAST(COUNT(*) AS BIGINT) AS n_events
        |      FROM events GROUP BY event_type)
        |SELECT g.event_type, g.last_ts, g.n_events,
        |  CAST(CAST(f.frontier AS DATE) - CAST(g.last_ts AS DATE) AS BIGINT) AS staleness_days
        |FROM g CROSS JOIN f ORDER BY g.event_type""".stripMargin,

    "q_dq_orphans" ->
      """SELECT 'lineitem_orders' AS check_name,
        |  CAST(count(*) FILTER (WHERE NOT EXISTS
        |    (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)) AS BIGINT) AS n_violations
        |FROM lineitem
        |UNION ALL
        |SELECT 'orders_customer',
        |  CAST(count(*) FILTER (WHERE NOT EXISTS
        |    (SELECT 1 FROM customer WHERE c_custkey = o_custkey)) AS BIGINT)
        |FROM orders
        |UNION ALL
        |SELECT 'lineitem_supplier',
        |  CAST(count(*) FILTER (WHERE NOT EXISTS
        |    (SELECT 1 FROM supplier WHERE s_suppkey = l_suppkey)) AS BIGINT)
        |FROM lineitem
        |ORDER BY check_name""".stripMargin,
    "q_dq_dupes" ->
      """SELECT l_orderkey, l_linenumber, COUNT(*) AS n_copies
        |FROM lineitem GROUP BY l_orderkey, l_linenumber
        |HAVING COUNT(*) > 1
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_dq_drift" ->
      """WITH b AS (
        |  SELECT CAST(LEAST(15, GREATEST(0,
        |           CAST(floor((o_totalprice - 0.0) / 37500.0) AS INTEGER))) AS BIGINT) AS bin,
        |         o_orderdate < DATE '1995-01-01' AS is_base
        |  FROM orders),
        |h AS (SELECT bin,
        |        CAST(count(*) FILTER (WHERE is_base) AS BIGINT) AS n_base,
        |        CAST(count(*) FILTER (WHERE NOT is_base) AS BIGINT) AS n_cur
        |      FROM b GROUP BY bin),
        |t AS (SELECT CAST(SUM(n_base) AS BIGINT) AS tb,
        |             CAST(SUM(n_cur) AS BIGINT) AS tc FROM h)
        |SELECT bin, n_base, n_cur,
        |  CAST(n_base * 1000000 // greatest(tb, 1) AS BIGINT) AS base_ppm,
        |  CAST(n_cur * 1000000 // greatest(tc, 1) AS BIGINT) AS cur_ppm,
        |  CAST(abs(n_base * 1000000 // greatest(tb, 1)
        |         - n_cur * 1000000 // greatest(tc, 1)) AS BIGINT) AS diff_ppm
        |FROM h, t ORDER BY bin""".stripMargin,

    "q_dq_psi" -> {
      import graft.ops.UlmTokenizer
      val staged = UlmTokenizer.costStages("rmax", "rmin", UlmTokenizer.Duck)
        .foldLeft("SELECT * FROM j2") { case (acc, (n, e)) =>
          s"SELECT *, $e AS $n FROM ($acc)" }
      raw"""WITH b AS (
           |  SELECT CAST(LEAST(15, GREATEST(0,
           |           CAST(floor((o_totalprice - 0.0) / 37500.0) AS INTEGER))) AS BIGINT) AS bin,
           |         o_orderdate < DATE '1995-01-01' AS is_base
           |  FROM orders),
           |h AS (SELECT bin,
           |        CAST(count(*) FILTER (WHERE is_base) AS BIGINT) AS n_base,
           |        CAST(count(*) FILTER (WHERE NOT is_base) AS BIGINT) AS n_cur
           |      FROM b GROUP BY bin),
           |t AS (SELECT CAST(SUM(n_base) AS BIGINT) AS tb,
           |             CAST(SUM(n_cur) AS BIGINT) AS tc FROM h),
           |c0 AS (SELECT bin, n_base, n_cur,
           |         CAST(n_base * 1000000 // greatest(tb, 1) AS BIGINT) AS base_ppm,
           |         CAST(n_cur * 1000000 // greatest(tc, 1) AS BIGINT) AS cur_ppm
           |       FROM h, t),
           |j AS (SELECT *, greatest(base_ppm, 1) AS pp, greatest(cur_ppm, 1) AS qq
           |      FROM c0),
           |j2 AS (SELECT *, greatest(pp, qq) AS rmax, least(pp, qq) AS rmin FROM j),
           |st AS MATERIALIZED ($staged),
           |p AS (SELECT bin, n_base, n_cur, base_ppm, cur_ppm,
           |        CAST(cost_cb AS BIGINT) AS dlog_cb,
           |        CAST(abs(pp - qq) * cost_cb AS BIGINT) AS psi_term
           |      FROM st),
           |tt AS (SELECT CAST(SUM(psi_term) AS BIGINT) AS psi_total FROM p)
           |SELECT p.*, tt.psi_total FROM p, tt ORDER BY bin""".stripMargin
    },

    "q_dq_kanon" ->
      """WITH c AS (SELECT c_mktsegment AS seg, c_nationkey AS nat,
        |                  CAST(floor(c_acctbal / 1000) AS BIGINT) AS band
        |           FROM customer),
        |cl AS (SELECT seg, nat, band, COUNT(*) AS n,
        |              GROUPING(seg) * 4 + GROUPING(nat) * 2 + GROUPING(band) AS gid
        |       FROM c GROUP BY ROLLUP(seg, nat, band)),
        |r AS (SELECT gid, CAST(COUNT(*) AS BIGINT) AS n_classes,
        |             CAST(MIN(n) AS BIGINT) AS min_class_size,
        |             CAST(COALESCE(SUM(n) FILTER (WHERE n < 5), 0) AS BIGINT) AS n_at_risk,
        |             CAST(SUM(n) AS BIGINT) AS n_rows
        |      FROM cl GROUP BY gid)
        |SELECT CASE gid WHEN 0 THEN 'seg+nation+band' WHEN 1 THEN 'seg+nation'
        |                WHEN 3 THEN 'seg' ELSE 'suppressed' END AS qi_level,
        |  CAST(gid AS INT) AS rung, n_classes, min_class_size, n_at_risk,
        |  CAST(n_at_risk * 1000000 // n_rows AS BIGINT) AS risk_ppm,
        |  min_class_size >= 5 AS k_anonymous
        |FROM r ORDER BY rung""".stripMargin,

    "q_dq_sequence" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
        |p AS (SELECT user_id, event_id,
        |        lag(event_id, 1) OVER (PARTITION BY user_id
        |          ORDER BY us, event_id) AS prev
        |      FROM e),
        |u AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_pairs,
        |        CAST(COALESCE(SUM(CASE WHEN prev > event_id THEN 1 ELSE 0 END), 0)
        |          AS BIGINT) AS n_inv
        |      FROM p WHERE prev IS NOT NULL GROUP BY user_id)
        |SELECT CAST(count(*) AS BIGINT) AS n_users,
        |  CAST(COALESCE(SUM(CASE WHEN n_inv = 0 THEN 1 ELSE 0 END), 0) AS BIGINT)
        |    AS n_users_clean,
        |  CAST(SUM(n_pairs) AS BIGINT) AS n_pairs,
        |  CAST(SUM(n_inv) AS BIGINT) AS n_inversions,
        |  CAST(SUM(n_inv) * 1000000 // SUM(n_pairs) AS BIGINT) AS inv_ppm
        |FROM u""".stripMargin,

    "q_dq_ldiversity" ->
      """WITH cl AS (SELECT c_nationkey AS nat,
        |              CAST(floor(c_acctbal / 1000) AS BIGINT) AS band,
        |              CAST(COUNT(*) AS BIGINT) AS n,
        |              CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT) AS ldiv
        |            FROM customer GROUP BY 1, 2)
        |SELECT ldiv, CAST(COUNT(*) AS BIGINT) AS n_classes,
        |  CAST(SUM(n) AS BIGINT) AS n_rows,
        |  CAST(MIN(n) AS BIGINT) AS min_class_size,
        |  ldiv < 3 AS at_risk
        |FROM cl GROUP BY ldiv ORDER BY ldiv""".stripMargin,

    "q_dq_tcloseness" ->
      """WITH r AS (SELECT c_mktsegment AS seg, c_nationkey AS nat,
        |             CAST(floor(c_acctbal / 1000) AS BIGINT) AS band
        |           FROM customer),
        |cls AS (SELECT seg, nat, band, CAST(count(*) AS BIGINT) AS c
        |        FROM r GROUP BY 1, 2, 3),
        |ct AS (SELECT seg, nat, CAST(SUM(c) AS BIGINT) AS n_g
        |       FROM cls GROUP BY 1, 2),
        |g AS (SELECT band, CAST(count(*) AS BIGINT) AS cg FROM r GROUP BY 1),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n_tot,
        |             CAST(count(DISTINCT band) AS BIGINT) AS m FROM r),
        |grid AS (SELECT ct.seg, ct.nat, g.band, ct.n_g, g.cg,
        |           COALESCE(cls.c, 0) AS c, t.n_tot, t.m
        |         FROM ct CROSS JOIN g
        |         LEFT JOIN cls ON cls.seg = ct.seg AND cls.nat = ct.nat
        |                      AND cls.band = g.band
        |         CROSS JOIN t),
        |cum AS (SELECT seg, nat, n_g, n_tot, m,
        |          SUM(c * n_tot - cg * n_g) OVER (PARTITION BY seg, nat
        |            ORDER BY band) AS cum
        |        FROM grid)
        |SELECT seg, CAST(nat AS BIGINT) AS nat, CAST(MAX(n_g) AS BIGINT) AS n_rows,
        |  CAST(SUM(abs(cum)) * 1000000
        |    // MAX(n_g * n_tot * (m - 1)) AS BIGINT) AS emd_ppm,
        |  CAST(SUM(abs(cum)) * 1000000
        |    // MAX(n_g * n_tot * (m - 1)) AS BIGINT) > 200000 AS t_violation
        |FROM cum GROUP BY seg, nat ORDER BY seg, nat""".stripMargin,

    "q_dq_forget" ->
      """WITH del AS (SELECT c_custkey FROM customer WHERE c_custkey % 97 = 3),
        |odel AS (SELECT o_orderkey FROM orders
        |         WHERE o_custkey IN (SELECT c_custkey FROM del))
        |SELECT 'customer' AS table_name,
        |  CAST(count(*) FILTER (WHERE c_custkey IN (SELECT c_custkey FROM del)) AS BIGINT) AS n_delete,
        |  CAST(count(*) FILTER (WHERE c_custkey NOT IN (SELECT c_custkey FROM del)) AS BIGINT) AS n_keep
        |FROM customer
        |UNION ALL
        |SELECT 'events',
        |  CAST(count(*) FILTER (WHERE user_id IN (SELECT c_custkey FROM del)) AS BIGINT),
        |  CAST(count(*) FILTER (WHERE user_id NOT IN (SELECT c_custkey FROM del)) AS BIGINT)
        |FROM events
        |UNION ALL
        |SELECT 'lineitem',
        |  CAST(count(*) FILTER (WHERE l_orderkey IN (SELECT o_orderkey FROM odel)) AS BIGINT),
        |  CAST(count(*) FILTER (WHERE l_orderkey NOT IN (SELECT o_orderkey FROM odel)) AS BIGINT)
        |FROM lineitem
        |UNION ALL
        |SELECT 'orders',
        |  CAST(count(*) FILTER (WHERE o_custkey IN (SELECT c_custkey FROM del)) AS BIGINT),
        |  CAST(count(*) FILTER (WHERE o_custkey NOT IN (SELECT c_custkey FROM del)) AS BIGINT)
        |FROM orders
        |ORDER BY table_name""".stripMargin,

    "q_dq_constraints" ->
      """WITH rep AS (
        |  SELECT 'not_null:l_orderkey' AS rule,
        |    CAST(count(*) FILTER (WHERE l_orderkey IS NULL) AS BIGINT) AS n_violations
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'range:l_quantity',
        |    CAST(count(*) FILTER (WHERE NOT (l_quantity IS NULL
        |      OR (l_quantity >= 1 AND l_quantity <= 30))) AS BIGINT)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'in_set:l_returnflag',
        |    CAST(count(*) FILTER (WHERE NOT (l_returnflag IS NULL
        |      OR l_returnflag IN ('A', 'N', 'R'))) AS BIGINT)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'regex:l_linestatus',
        |    CAST(count(*) FILTER (WHERE NOT (l_linestatus IS NULL
        |      OR regexp_matches(l_linestatus, '^[OF]$'))) AS BIGINT)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'unique:l_orderkey+l_linenumber',
        |    CAST(COALESCE((SELECT SUM(n - 1) FROM (
        |      SELECT COUNT(*) AS n FROM lineitem
        |      GROUP BY l_orderkey, l_linenumber) t WHERE n > 1), 0) AS BIGINT)
        |  UNION ALL
        |  SELECT 'fk:l_orderkey->orders.o_orderkey',
        |    CAST(count(*) FILTER (WHERE l_orderkey IS NOT NULL AND NOT EXISTS
        |      (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)) AS BIGINT)
        |  FROM lineitem)
        |SELECT rule, n_violations, n_violations = 0 AS pass
        |FROM rep ORDER BY rule""".stripMargin,

    "q_dq_quarantine" ->
      """WITH b AS (SELECT
        |    CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END
        |  + CASE WHEN NOT (l_quantity IS NULL
        |          OR (l_quantity >= 1 AND l_quantity <= 30)) THEN 2 ELSE 0 END
        |  + CASE WHEN NOT (l_returnflag IS NULL
        |          OR l_returnflag IN ('A', 'N', 'R')) THEN 4 ELSE 0 END
        |  + CASE WHEN NOT (l_discount IS NULL
        |          OR (l_discount >= 0.0 AND l_discount <= 0.05)) THEN 8 ELSE 0 END
        |    AS violation_bits
        |  FROM lineitem)
        |SELECT CAST(violation_bits AS BIGINT) AS violation_bits,
        |  violation_bits = 0 AS is_clean, CAST(COUNT(*) AS BIGINT) AS n_rows
        |FROM b GROUP BY violation_bits ORDER BY violation_bits""".stripMargin,

    "q_profile_join_size" ->
      """WITH a AS (SELECT l_orderkey AS k, COUNT(*) AS na FROM lineitem GROUP BY 1),
        |b AS (SELECT o_orderkey AS k, COUNT(*) AS nb FROM orders GROUP BY 1),
        |j AS (SELECT a.na * b.nb AS prod FROM a JOIN b USING (k))
        |SELECT CAST(SUM(prod) AS BIGINT) AS est_rows,
        |  CAST(COUNT(*) AS BIGINT) AS n_match_keys,
        |  CAST(MAX(prod) AS BIGINT) AS max_key_rows,
        |  CAST(MAX(prod) * 1000000 // SUM(prod) AS BIGINT) AS hot_key_ppm
        |FROM j""".stripMargin,

    "q_dq_pseudonym" ->
      s"""WITH ct AS (SELECT c_mktsegment AS segment, c_custkey,
         |  ${DedupQueries.sqlHex60Public("md5('epoch1:' || c_custkey::VARCHAR)")} AS tok
         |  FROM customer),
         |ot AS (SELECT o_custkey,
         |  ${DedupQueries.sqlHex60Public("md5('epoch1:' || o_custkey::VARCHAR)")} AS otok
         |  FROM orders),
         |base AS (SELECT segment, CAST(COUNT(*) AS BIGINT) AS n_customers,
         |  CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_tokens,
         |  CAST(bit_xor(tok) AS BIGINT) AS tokens_xor
         |  FROM ct GROUP BY segment),
         |vt AS (SELECT segment, CAST(COUNT(*) AS BIGINT) AS n_orders_tok
         |  FROM ot JOIN ct ON otok = tok GROUP BY segment),
         |vr AS (SELECT segment, CAST(COUNT(*) AS BIGINT) AS n_orders_raw
         |  FROM orders JOIN ct ON o_custkey = c_custkey GROUP BY segment)
         |SELECT segment, n_customers, n_tokens, tokens_xor, n_orders_tok, n_orders_raw
         |FROM base JOIN vt USING (segment) JOIN vr USING (segment)
         |ORDER BY segment""".stripMargin,

    "q_dq_dpcount" ->
      s"""WITH thr(k, t) AS (VALUES ${graft.ops.DpRelease.sqlThresholdRows(1.0)}),
         |c AS (SELECT c_mktsegment AS grp, CAST(COUNT(*) AS BIGINT) AS n_true,
         |  ${DedupQueries.sqlHex60Public("md5('release1:' || c_mktsegment)")} AS u
         |  FROM customer GROUP BY c_mktsegment)
         |SELECT grp, CAST(GREATEST(
         |    n_true + (SELECT COUNT(*) FROM thr WHERE t <= u) - 65, 0) AS BIGINT)
         |  AS n_noisy
         |FROM c ORDER BY grp""".stripMargin,

    "q_dq_rls" -> {
      def h60(e: String) = DedupQueries.sqlHex60Public(e)
      s"""WITH eu AS (SELECT c_custkey,
         |    CAST(${h60("md5('rls1/analyst_eu:' || c_name)")} AS VARCHAR) AS name_v
         |  FROM customer WHERE c_nationkey < 10),
         |us AS (SELECT c_custkey,
         |    CAST(${h60("md5('rls1/analyst_us:' || c_name)")} AS VARCHAR) AS name_v
         |  FROM customer WHERE c_nationkey >= 10 AND c_mktsegment = 'BUILDING'),
         |au AS (SELECT c_custkey, c_name AS name_v FROM customer)
         |SELECT 'analyst_eu' AS role, CAST(COUNT(*) AS BIGINT) AS n_visible,
         |  CAST(bit_xor(c_custkey) AS BIGINT) AS keys_xor,
         |  CAST(bit_xor(${h60("md5(name_v)")}) AS BIGINT) AS names_xor FROM eu
         |UNION ALL
         |SELECT 'analyst_us', CAST(COUNT(*) AS BIGINT),
         |  CAST(bit_xor(c_custkey) AS BIGINT),
         |  CAST(bit_xor(${h60("md5(name_v)")}) AS BIGINT) FROM us
         |UNION ALL
         |SELECT 'auditor', CAST(COUNT(*) AS BIGINT),
         |  CAST(bit_xor(c_custkey) AS BIGINT),
         |  CAST(bit_xor(${h60("md5(name_v)")}) AS BIGINT) FROM au
         |ORDER BY role""".stripMargin
    },

    "q_dq_reconcile" ->
      """WITH det AS (SELECT l_orderkey,
        |    CAST(SUM(floor(l_extendedprice * (1.0 - l_discount) * 100)) AS BIGINT) AS detail_cents
        |  FROM lineitem GROUP BY l_orderkey),
        |b AS (SELECT CASE
        |    WHEN detail_cents IS NULL THEN 'no_details'
        |    WHEN CAST(floor(o_totalprice * 100) AS BIGINT) = detail_cents THEN 'exact'
        |    ELSE 'diff_digits_' || length(CAST(
        |      abs(CAST(floor(o_totalprice * 100) AS BIGINT) - detail_cents) AS VARCHAR))
        |    END AS bucket
        |  FROM orders LEFT JOIN det ON o_orderkey = l_orderkey)
        |SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_orders
        |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin,

    "q_dq_gaps" ->
      """WITH daily AS (SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |                 CAST(COUNT(*) AS BIGINT) AS n
        |               FROM events
        |               WHERE event_type = 'purchase' AND value > 250 GROUP BY 1),
        |b AS (SELECT CAST(date_trunc('day', min(ts)) AS TIMESTAMP) AS d0,
        |             CAST(date_trunc('day', max(ts)) AS TIMESTAMP) AS d1 FROM events),
        |spine AS (SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS TIMESTAMP) AS day
        |          FROM b),
        |filled AS (SELECT s.day, COALESCE(d.n, 0) AS n
        |           FROM spine s LEFT JOIN daily d ON s.day = d.day),
        |idxd AS (SELECT day, n, row_number() OVER (ORDER BY day) AS idx FROM filled),
        |z AS (SELECT idx, idx - row_number() OVER (ORDER BY day) AS grp
        |      FROM idxd WHERE n = 0),
        |runs AS (SELECT grp, CAST(COUNT(*) AS BIGINT) AS run_len FROM z GROUP BY grp),
        |g AS (SELECT CAST(COALESCE(MAX(run_len), 0) AS BIGINT) AS longest_gap,
        |             CAST(COUNT(*) AS BIGINT) AS n_gap_runs FROM runs),
        |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
        |             CAST(COUNT(*) FILTER (WHERE n = 0) AS BIGINT) AS n_empty_days
        |      FROM filled)
        |SELECT n_days, n_empty_days, longest_gap, n_gap_runs
        |FROM t CROSS JOIN g""".stripMargin,

    "q_dq_benford" ->
      s"""WITH c AS (SELECT CAST(substring(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit,
         |             CAST(COUNT(*) AS BIGINT) AS n
         |           FROM orders WHERE o_totalprice >= 1 GROUP BY 1),
         |t AS (SELECT CAST(SUM(n) AS BIGINT) AS n_total FROM c),
         |e(digit, benford_ppm) AS (VALUES ${benfordPpm.map { case (d, p) => s"($d, ${p}::BIGINT)" }.mkString(", ")})
         |SELECT c.digit, n,
         |  CAST(n * 1000000 // n_total AS BIGINT) AS share_ppm,
         |  benford_ppm,
         |  CAST(abs(n * 1000000 // n_total - benford_ppm) AS BIGINT) AS dev_ppm
         |FROM c CROSS JOIN t JOIN e ON e.digit = c.digit
         |ORDER BY c.digit""".stripMargin,

    "q_dq_checksum" ->
      s"""SELECT source, CAST(COUNT(*) AS BIGINT) AS n_rows,
         |  CAST(bit_xor(${DedupQueries.sqlHex60Public("md5(doc_id::VARCHAR || ':' || text)")}) AS BIGINT) AS xor60,
         |  CAST(SUM(n_chars) AS BIGINT) AS n_bytes
         |FROM documents GROUP BY source ORDER BY source""".stripMargin
  )
}
