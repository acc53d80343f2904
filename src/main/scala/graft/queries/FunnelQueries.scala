package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.CacheScope.ScopedPersist
import graft.engine.QueryBuilder.scan
import graft.ops.ExactAgg.{dsum, sqlDsum, sqlDsumScaled, sqlDsumScaledOver}

/** Event-analytics tier over the events table: ordered funnel conversion
  * and weekly cohort retention — the product-analytics workloads an
  * analytics engine is expected to run at warehouse scale. Both are
  * chains of keyed aggregations/joins (every step shuffles on user_id,
  * AQE coalesces the repeats) — no per-user state machines, no UDFs.
  */
object FunnelQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // WEEKLY COHORT RETENTION MATRIX — the product-analytics staple
    // q_agg_retention's day-over-day readout generalizes to: users
    // grouped by first-seen week (the cohort), each cohort traced
    // across age-in-weeks, cell = distinct active users with the
    // cohort-relative share in floor-ppm. Shape: one distinct
    // (user, week) census (map-side combinable), one min-per-user
    // aggregate, one user-keyed join — every relation after the census
    // is user- or cell-sized, never event-sized
    "q_events_cohort" -> ((s: SparkSession, d: String) => {
      val acts = scan(s, d, "events")
        .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
        .distinct().scopedPersist()
      val first = acts.groupBy(col("user_id")).agg(min(col("wk")).as("w0"))
        .scopedPersist()
      val m = acts.join(first, Seq("user_id"))
        .select(col("w0"),
          expr("CAST(datediff(wk, w0) div 7 AS BIGINT)").as("age"),
          col("user_id"))
        .groupBy(col("w0"), col("age"))
        .agg(countDistinct(col("user_id")).as("n_active"))
      val sizes = first.groupBy(col("w0")).agg(count(lit(1)).as("cohort_n"))
      m.join(sizes, Seq("w0"))
        .select(col("w0").as("cohort_week"), col("age"),
          col("n_active").cast("long").as("n_active"), col("cohort_n"),
          expr("n_active * 1000000 div cohort_n").as("retention_ppm"))
        .orderBy(col("cohort_week"), col("age"))
    }),

    // FIRST/LAST-TOUCH ATTRIBUTION: for every purchase, the earliest and
    // the latest preceding view/click by the same user — one window pass
    // over per-user event streams (ROWS … 1 PRECEDING; ignoreNulls picks
    // the touch rows). The id and type windows share the null pattern,
    // so both always come from the same touch row
    "q_events_attribution" -> ((s: SparkSession, d: String) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val isTouch = col("event_type").isin("view", "click")
      val tId = when(isTouch, col("event_id"))
      val tType = when(isTouch, col("event_type"))
      scan(s, d, "events")
        .withColumn("first_touch_id", first(tId, ignoreNulls = true).over(w))
        .withColumn("first_touch_type", first(tType, ignoreNulls = true).over(w))
        .withColumn("last_touch_id", last(tId, ignoreNulls = true).over(w))
        .withColumn("last_touch_type", last(tType, ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"),
          col("first_touch_id"), col("first_touch_type"),
          col("last_touch_id"), col("last_touch_type"))
        .orderBy(col("event_id"))
    }),

    // ordered funnel view → click → purchase with a 6-hour conversion
    // window per step: each stage's timestamp must strictly follow the
    // previous stage's AND land within the window (min-ts chaining, the
    // standard unordered-log formulation); output = users per stage
    "q_funnel" -> ((s: SparkSession, d: String) => {
      val ev = scan(s, d, "events")
      val win = expr("INTERVAL 6 HOURS")
      def stageMin(tpe: String) = ev.filter(col("event_type") === tpe)
      val v = stageMin("view").groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
      val c = stageMin("click").join(v, Seq("user_id"))
        .filter(col("ts") > col("t1") && col("ts") <= col("t1") + win)
        .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
      val p = stageMin("purchase").join(c, Seq("user_id"))
        .filter(col("ts") > col("t2") && col("ts") <= col("t2") + win)
        .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
      val users = ev.select(col("user_id")).distinct()
      users
        .join(v.select(col("user_id"), lit(1).as("s1")), Seq("user_id"), "left")
        .join(c.select(col("user_id"), lit(1).as("s2")), Seq("user_id"), "left")
        .join(p.select(col("user_id"), lit(1).as("s3")), Seq("user_id"), "left")
        .select(col("user_id"),
          (coalesce(col("s1"), lit(0)) + coalesce(col("s2"), lit(0)) +
            coalesce(col("s3"), lit(0))).as("stage"))
        .groupBy(col("stage")).agg(count(lit(1)).as("n_users"))
        .orderBy(col("stage"))
    }),

    // weekly cohort retention on the PURCHASE stream (first-any-event
    // cohorts are degenerate here — every user is active from week 1):
    // cohort = first purchase week; cell (cohort, k) = distinct cohort
    // users purchasing again k weeks in
    "q_cohort" -> ((s: SparkSession, d: String) => {
      val ev = scan(s, d, "events").filter(col("event_type") === "purchase")
      val first = ev.groupBy(col("user_id"))
        .agg(date_trunc("week", min(col("ts"))).as("cohort_week"))
      val active = ev.select(col("user_id"), date_trunc("week", col("ts")).as("week")).distinct()
      active.join(first, Seq("user_id"))
        .select(col("cohort_week"),
          expr("datediff(week, cohort_week) div 7").cast("long").as("week_offset"),
          col("user_id"))
        .groupBy(col("cohort_week"), col("week_offset"))
        .agg(countDistinct(col("user_id")).as("n_active"))
        .orderBy(col("cohort_week"), col("week_offset"))
    }),

    // two-sample A/B comparison (arm = user_id parity): means/variances
    // from exact single-pass sums (value² < 1e7 keeps the decimal path
    // safe), z-statistic on identical IEEE arithmetic both engines
    "q_ab_test" -> ((s: SparkSession, d: String) => {
      val ev = scan(s, d, "events")
      val arm0 = pmod(col("user_id"), lit(2)) === 0
      def cnt(c: org.apache.spark.sql.Column) = sum(when(c, 1L).otherwise(0L))
      def dsumIf(c: org.apache.spark.sql.Column, v: org.apache.spark.sql.Column) =
        dsum(when(c, v).otherwise(lit(0.0)))
      ev.agg(
          cnt(arm0).as("n0"), cnt(!arm0).as("n1"),
          dsumIf(arm0, col("value")).as("sx0"), dsumIf(!arm0, col("value")).as("sx1"),
          dsumIf(arm0, col("value") * col("value")).as("sxx0"),
          dsumIf(!arm0, col("value") * col("value")).as("sxx1"))
        .select(col("n0"), col("n1"),
          (col("sx0") / col("n0")).as("mean0"),
          (col("sx1") / col("n1")).as("mean1"),
          ((col("sx0") / col("n0") - col("sx1") / col("n1")) /
            sqrt((col("sxx0") / col("n0") - (col("sx0") / col("n0")) * (col("sx0") / col("n0"))) / col("n0") +
              (col("sxx1") / col("n1") - (col("sx1") / col("n1")) * (col("sx1") / col("n1"))) / col("n1")))
            .as("z_score"))
    }),

    // Pareto concentration: suppliers ranked by exact revenue, cumulative
    // share of the total — the "how few keys carry 80%" skew diagnostic.
    // The global window runs over the SUPPLIER aggregate (dimension-sized
    // by construction), never the fact table
    "q_pareto" -> ((s: SparkSession, d: String) => {
      import org.apache.spark.sql.expressions.Window
      val l = scan(s, d, "lineitem")
      // persisted: both the broadcast total and the windowed branch read
      // rev, and it costs a full fact scan + groupBy per consumer (the
      // aggregate itself is supplier-count-sized — cheap to cache)
      val rev = l.groupBy(col("l_suppkey"))
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
        .scopedPersist()
      val w = Window.orderBy(col("revenue").desc, col("l_suppkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // revenue is a computed double ~1e7: floor-scaled, not decimal-cast
      val total = rev.agg(graft.ops.ExactAgg.dsumScaled(col("revenue"), 3).as("total"))
      rev.crossJoin(broadcast(total))
        .withColumn("cum", graft.ops.ExactAgg.dsumScaledOver(col("revenue"), w, scale = 3))
        .withColumn("cum_share", col("cum") / col("total"))
        .filter(col("cum_share") <= 0.8)
        .select(col("l_suppkey"), col("revenue"), col("cum_share"))
        .orderBy(col("cum_share"))
    }),

    // GINI CONCENTRATION COEFFICIENT of supplier revenue (the single
    // number q_pareto's cumulative-share curve summarizes): with
    // revenue exact in floor-milli longs and ascending rank by
    // (revenue, suppkey), G = (2·Σr·x − (n+1)·Σx)/(n·Σx) — every sum a
    // bigint (Σr·x ≲ 5·10¹⁷ at sf1 supplier counts; DECIMAL(38) past
    // that), ONE double division at the end. The rank window runs over
    // the supplier-count relation, never the fact table
    "q_agg_gini" -> ((s: SparkSession, d: String) => {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.types.DecimalType
      val rev = scan(s, d, "lineitem")
        .groupBy(col("l_suppkey"))
        .agg(sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 1000.0)
          .cast(DecimalType(38, 0))).cast("long").as("rev_milli"))
      rev
        .withColumn("r", row_number().over(
          Window.orderBy(col("rev_milli").asc, col("l_suppkey").asc)).cast("long"))
        .agg(count(lit(1)).as("n_suppliers"),
          sum(col("rev_milli")).as("total_rev_milli"),
          sum(col("r") * col("rev_milli")).as("srx"))
        .select(col("n_suppliers"), col("total_rev_milli"),
          ((lit(2L) * col("srx") - (col("n_suppliers") + 1L) * col("total_rev_milli"))
            .cast("double")
            / (col("n_suppliers") * col("total_rev_milli")).cast("double")).as("gini"))
    }),

    // HERFINDAHL–HIRSCHMAN INDEX (the antitrust concentration number;
    // Gini above measures inequality of the distribution, HHI measures
    // dominance): HHI = Σ(revᵢ/Σrev)². Squares of milli-long revenues
    // overflow int64, so each factor casts to DECIMAL(19,0) and the
    // product/sum stay exact decimals (19+19 ≤ 38 digits on BOTH
    // engines — DuckDB rejects a 38×38 product outright); the two
    // divisions at the end are one fixed double expression. Also emits
    // 1/HHI — the "effective number of competitors"
    "q_agg_hhi" -> ((s: SparkSession, d: String) => {
      import org.apache.spark.sql.types.DecimalType
      val rev = scan(s, d, "lineitem")
        .groupBy(col("l_suppkey"))
        .agg(sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 1000.0)
          .cast(DecimalType(38, 0))).cast("long").as("rev_milli"))
      rev.agg(count(lit(1)).as("n_suppliers"),
          sum(col("rev_milli")).as("sx"),
          sum(col("rev_milli").cast(DecimalType(19, 0))
            * col("rev_milli").cast(DecimalType(19, 0))).as("sq"))
        .select(col("n_suppliers"),
          (col("sq").cast("double")
            / (col("sx").cast("double") * col("sx").cast("double"))).as("hhi"),
          ((col("sx").cast("double") * col("sx").cast("double"))
            / col("sq").cast("double")).as("effective_n"))
    }),

    // MARKET-BASKET association mining (Agrawal 1994's support/lift,
    // minus the apriori iteration — pairs only): brand pairs bought in
    // the same order, with ppm support and lift. The pair expansion is
    // IN-ROW over each order's sorted distinct-brand array (orders hold
    // ~4 items ⇒ ~6 pairs — cost linear in orders, never an all-pairs
    // or a fact×fact self-join shuffle); counts are one combinable
    // groupBy; the brand marginals and the order total are
    // dimension-sized broadcasts. Lift is factored
    // ((n_pair·1e6 div n_a) · N) div n_b so every intermediate stays
    // under ~1e16 even at 10¹² orders — overflow-safe at 100 TB, and
    // the oracle replays the same factoring bit-for-bit. The ppm
    // support threshold is scale-invariant (a count threshold would
    // silently admit everything at 10× data)
    "q_basket_pairs" -> ((s: SparkSession, d: String) => {
      val lab = scan(s, d, "lineitem").select(col("l_orderkey"), col("l_partkey"))
        .join(broadcast(scan(s, d, "part").select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey").as("okey"), col("p_brand").as("item"))
      val baskets = lab.groupBy(col("okey"))
        .agg(array_sort(collect_set(col("item"))).as("items"))
        .scopedPersist()
      val tot = baskets.agg(count(lit(1)).as("n_orders"))
      val itemCounts = baskets.select(explode(col("items")).as("item"))
        .groupBy(col("item")).agg(count(lit(1)).as("n_item"))
      val pairCounts = baskets
        .select(explode(expr(
          """flatten(transform(items, (x, i) ->
            |  transform(slice(items, i + 2, size(items)),
            |    y -> struct(x AS item_a, y AS item_b))))""".stripMargin)).as("pr"))
        .groupBy(col("pr.item_a").as("item_a"), col("pr.item_b").as("item_b"))
        .agg(count(lit(1)).as("n_pair"))
      pairCounts
        .join(broadcast(itemCounts.select(col("item").as("item_a"), col("n_item").as("n_a"))), Seq("item_a"))
        .join(broadcast(itemCounts.select(col("item").as("item_b"), col("n_item").as("n_b"))), Seq("item_b"))
        .crossJoin(broadcast(tot))
        .select(col("item_a"), col("item_b"), col("n_pair"),
          expr("n_pair * 1000000 div n_orders").as("support_ppm"),
          expr("((n_pair * 1000000 div n_a) * n_orders) div n_b").as("lift_ppm"))
        .filter(col("support_ppm") >= 1000)
        .orderBy(col("item_a"), col("item_b"))
    }),

    // POINT-IN-TIME FEATURE AGGREGATE (the leakage-free feature-store
    // join): for every purchase, the same user's view count over the 7
    // STRICTLY PRECEDING calendar days — future rows can never leak
    // because a view on day D reaches only anchors on D+1..D+7, via a
    // bounded 7-way day explode into an equi-join on (user, day). No
    // range join, no per-user sort; ×7 linear fan-out is the
    // q_ts_rolling_dau contribute-to-buckets shape. Output: the
    // conversion-context histogram (views_7d capped at 10 → purchases,
    // users)
    // KAPLAN–MEIER SURVIVAL CURVE (product-limit estimator, 1958) —
    // the churn/retention readout in EXACT LOG SPACE: the product
    // Π(1 − d_t/n_t) becomes the SUM Σ(cb(n_t − d_t) − cb(n_t)) in
    // integer centibits from the shared staged log (single-count args
    // only, run once per DISTINCT at-risk/survivor count). A user's
    // "death" day is their last observed event day; at-risk counts
    // come from one reverse prefix sum over the DAY dimension (tiny —
    // windows there are free; the user census is the only
    // corpus-sized pass). The terminal day (everyone remaining dies,
    // S→0, log undefined) contributes no term and is flagged — the
    // convention the oracle mirrors definitionally
    "q_events_survival" -> ((s: SparkSession, d: String) => {
      import org.apache.spark.sql.expressions.Window
      import graft.ops.UlmTokenizer
      val users = scan(s, d, "events")
        .groupBy(col("user_id"))
        .agg(max(date_trunc("day", col("ts"))).as("last_day"))
      val deaths = users.groupBy(col("last_day").as("day"))
        .agg(count(lit(1)).as("d"))
      val tot = deaths.agg(sum(col("d")).as("nu"))
      val wd = Window.orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val risk = deaths.crossJoin(broadcast(tot))
        .withColumn("below", coalesce(sum(col("d")).over(wd), lit(0L)))
        .withColumn("n_risk", col("nu") - col("below"))
        .withColumn("surv", col("n_risk") - col("d"))
        .scopedPersist()
      val vals = risk.select(col("n_risk").as("v"))
        .union(risk.filter(col("surv") >= 1).select(col("surv")))
        .distinct()
      // driver-side cb over the per-day risk/survivor counts
      // (UlmTokenizer.cbTableLocal — the q_text_kl LocalRelation move)
      val cb = UlmTokenizer.cbTableLocal(vals, "q_events_survival cb values")
      risk
        .join(broadcast(cb.select(col("v").as("n_risk"), col("cb").as("cb_n"))),
          Seq("n_risk"))
        .join(broadcast(cb.select(col("v").as("surv"), col("cb").as("cb_s"))),
          Seq("surv"), "left_outer")
        .withColumn("term",
          when(col("surv") >= 1, col("cb_s") - col("cb_n")).otherwise(0L))
        .withColumn("s_cb", sum(col("term")).over(
          Window.orderBy(col("day")).rowsBetween(Window.unboundedPreceding, 0)))
        .select(col("day"), col("n_risk"), col("d").as("n_deaths"),
          col("s_cb"),
          when(col("surv") === 0L, 1L).otherwise(0L).as("terminal"))
        .orderBy(col("day"))
    }),

    // CIDR LONGEST-PREFIX-MATCH CENSUS — the IP-enrichment join every
    // clickstream/geo pipeline runs: events carry a deterministic
    // synthetic IPv4 (Knuth multiplicative hash of event_id mod 2^32 —
    // products < 2^63, ANSI-legal on both engines), matched against a
    // three-tier prefix table (/4 full cover, /12 and /20 carve-outs,
    // all from range() formulas so the oracle rebuilds the dim
    // bit-identically) with REAL routing semantics: overlapping blocks
    // resolve to the most specific prefix via per-event argmax (ties
    // impossible — same-length blocks are disjoint by construction).
    // Shape: broadcast range join against the 48-row dim + one
    // map-side-combinable census; the fact table never shuffles
    "q_events_cidr" -> ((s: SparkSession, d: String) => {
      val ev = scan(s, d, "events").select(col("event_id"), col("user_id"))
      cidrMatched(s, ev).groupBy(col("block"), col("plen"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"))
        .crossJoin(broadcast(ev.agg(count(lit(1)).as("nt"))))
        .withColumn("share_ppm", expr("n_events * 1000000 div nt"))
        .select(col("block"), col("plen").cast("int").as("plen"),
          col("n_events"), col("n_users"), col("share_ppm"))
        .orderBy(col("block"))
    }),

    "q_feature_pit" -> ((s: SparkSession, d: String) => {
      val e = scan(s, d, "events")
        .select(col("user_id"), col("event_id"), col("event_type"),
          date_trunc("day", col("ts")).as("day"))
      val va = e.filter(col("event_type") === "view")
        .select(col("user_id").as("vuid"),
          explode(sequence(col("day") + expr("INTERVAL 1 DAY"),
            col("day") + expr("INTERVAL 7 DAYS"),
            expr("INTERVAL 1 DAY"))).as("aday"))
        .groupBy(col("vuid"), col("aday")).agg(count(lit(1)).as("nv"))
      e.filter(col("event_type") === "purchase")
        .join(va, col("user_id") === col("vuid") && col("day") === col("aday"),
          "left")
        .select(col("user_id"), coalesce(col("nv"), lit(0L)).as("nv"))
        .groupBy(least(col("nv"), lit(10L)).as("views_7d"))
        .agg(count(lit(1)).as("n_purchases"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("views_7d"))
    }),

    // INTER-EVENT DWELL census (the latency-histogram readout): gap to
    // the same user's next event in exact integer microseconds, rolled
    // per source event_type into count / min / max / sum plus fixed
    // SLA buckets (<1s, 1–60s, 1–60m, ≥1h). Same per-user window
    // shuffle shape as q_events_markov; the tie-break is (µs,
    // event_id) in BOTH engines, so the lead() pairing is identical.
    // Exact integers end-to-end — the mean is deferred (sum_us ÷ n is
    // the consumer's division)
    "q_events_dwell" -> ((s: SparkSession, d: String) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
      scan(s, d, "events")
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
        .withColumn("gap", lead(col("us"), 1).over(w) - col("us"))
        .filter(col("gap").isNotNull)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          min(col("gap")).as("min_us"), max(col("gap")).as("max_us"),
          sum(col("gap")).as("sum_us"),
          sum(when(col("gap") < 1000000L, 1L).otherwise(0L)).as("lt_1s"),
          sum(when(col("gap") >= 1000000L && col("gap") < 60000000L, 1L)
            .otherwise(0L)).as("s_1_60"),
          sum(when(col("gap") >= 60000000L && col("gap") < 3600000000L, 1L)
            .otherwise(0L)).as("m_1_60"),
          sum(when(col("gap") >= 3600000000L, 1L).otherwise(0L)).as("ge_1h"))
        .orderBy(col("event_type"))
    }),

    // BEHAVIOR TRANSITION MATRIX (first-order Markov census): for each
    // consecutive event pair in a user's stream, count (from → to) and
    // row-normalize to ppm — the Sankey/flow diagram and the base of
    // Markov-chain attribution. ONE window pass over per-user streams
    // (the q_events_attribution shuffle shape); the normalizing window
    // runs over the |types|² transition matrix, not the events
    "q_events_markov" -> ((s: SparkSession, d: String) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val trans = scan(s, d, "events")
        .withColumn("dst_type", lead(col("event_type"), 1).over(w))
        .filter(col("dst_type").isNotNull)
        .groupBy(col("event_type").as("src_type"), col("dst_type"))
        .agg(count(lit(1)).as("n"))
      trans
        .withColumn("p_ppm",
          expr("n * 1000000 div sum(n) over (partition by src_type)"))
        .select(col("src_type"), col("dst_type"), col("n"), col("p_ppm"))
        .orderBy(col("src_type"), col("dst_type"))
    }),

    // CONVERSION-LATENCY distribution: first view → first subsequent
    // purchase per user, hour-bucketed histogram with cumulative ppm —
    // the "how long does conversion take" complement to q_funnel's
    // "how many convert". Two user-keyed aggregations (AQE reuses the
    // shuffle); the cumulative window runs over the ~hour-count
    // histogram, never the events. All-integer (seconds → floor hours,
    // floor ppm)
    "q_funnel_latency" -> ((s: SparkSession, d: String) => {
      val ev = scan(s, d, "events")
      val firstView = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("tv"))
      val conv = ev.filter(col("event_type") === "purchase")
        .join(firstView, Seq("user_id"))
        .filter(col("ts") >= col("tv"))
        .groupBy(col("user_id"), col("tv")).agg(min(col("ts")).as("tp"))
        .select(expr("(unix_timestamp(tp) - unix_timestamp(tv)) div 3600").as("delta_hr"))
      val hist = conv.groupBy(col("delta_hr")).agg(count(lit(1)).as("n_users"))
      val tot = hist.agg(sum(col("n_users")).as("n_total"))
      hist.crossJoin(broadcast(tot))
        .withColumn("cum_ppm",
          expr("sum(n_users) over (order by delta_hr rows between unbounded preceding and current row) * 1000000 div n_total"))
        .select(col("delta_hr"), col("n_users"), col("cum_ppm"))
        .orderBy(col("delta_hr"))
    }),

    // PATH MINING: the top-20 most-travelled 3-step event sequences —
    // the product-flow (Sankey) report, one window pass over per-user
    // streams (two leads share the attribution shuffle), one
    // combinable path count, and the global top-k plans as
    // TakeOrderedAndProject (never a full sort)
    "q_events_paths" -> ((s: SparkSession, d: String) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      scan(s, d, "events")
        .withColumn("e2", lead(col("event_type"), 1).over(w))
        .withColumn("e3", lead(col("event_type"), 2).over(w))
        .filter(col("e2").isNotNull && col("e3").isNotNull)
        .select(concat_ws(">", col("event_type"), col("e2"), col("e3")).as("path"))
        .groupBy(col("path")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("path"))
        .limit(20)
    }),

    // RFM SEGMENTATION (Hughes 1994 — the classic CRM segmentation):
    // per customer recency/frequency/monetary, quintiled by
    // deterministic ntile (metric + custkey tie-break, identical
    // semantics both engines), censused into the ≤125 segment cells.
    // The per-customer aggregate is one combinable pass; the quintile
    // windows run on the CUSTOMER DIMENSION (not the fact table) —
    // at jumbo dimension sizes the bin assignment would switch to the
    // broadcast-quantile-boundaries shape of q_feature_bins
    "q_rfm" -> ((s: SparkSession, d: String) => {
      import org.apache.spark.sql.expressions.Window
      val o = scan(s, d, "orders")
      val maxd = o.agg(max(col("o_orderdate")).as("dmax"))
      val rfm = o.groupBy(col("o_custkey"))
        .agg(max(col("o_orderdate")).as("last_order"),
          count(lit(1)).as("f"),
          sum(floor(col("o_totalprice") * 100)).cast("long").as("m_cents"))
        .crossJoin(broadcast(maxd))
        .withColumn("r_days",
          datediff(col("dmax").cast("date"), col("last_order").cast("date")).cast("long"))
      rfm
        .withColumn("r_q", ntile(5).over(Window.orderBy(col("r_days").asc, col("o_custkey"))))
        .withColumn("f_q", ntile(5).over(Window.orderBy(col("f").desc, col("o_custkey"))))
        .withColumn("m_q", ntile(5).over(Window.orderBy(col("m_cents").desc, col("o_custkey"))))
        .groupBy(col("r_q"), col("f_q"), col("m_q"))
        .agg(count(lit(1)).as("n_customers"),
          sum(col("m_cents")).cast("long").as("cell_cents"))
        .orderBy(col("r_q"), col("f_q"), col("m_q"))
    })
  )

  /** The q_events_cidr prefix dim: three tiers from range() formulas
    * (the oracle rebuilds them bit-identically). */
  private[queries] def cidrBlocks(s: SparkSession): DataFrame = {
    def tier(plen: Int, span: Long, loExpr: org.apache.spark.sql.Column) =
      s.range(16).select(
        concat(lit(s"b${plen}_"), lpad(col("id").cast("string"), 2, "0")).as("block"),
        lit(plen).as("plen"), loExpr.as("lo"), (loExpr + span - 1).as("hi"))
    val k = col("id")
    tier(4, 1L << 28, k * (1L << 28))
      .unionAll(tier(12, 1L << 20, k * (1L << 28) + (k * 5 % 16) * (1L << 20)))
      .unionAll(tier(20, 1L << 12,
        k * (1L << 28) + (k * 5 % 16) * (1L << 20) + (k * 3 % 16) * (1L << 12)))
  }

  /** Longest-prefix-match of an (event_id, user_id) relation against
    * [[cidrBlocks]]: broadcast range join + per-event struct-max argmax
    * (tie-free — same-length blocks are disjoint). Per-row decision, so
    * batch slicing can't change it (the q_stream_cidr contract). */
  private[queries] def cidrMatched(s: SparkSession, ev: DataFrame): DataFrame = {
    val withIp = ev.withColumn("ip",
      col("event_id") * 2654435761L % 4294967296L)
    withIp.join(broadcast(cidrBlocks(s)),
        col("ip") >= col("lo") && col("ip") <= col("hi"))
      .groupBy(col("event_id"), col("user_id"))
      .agg(max(struct(col("plen"), col("block"))).as("m"))
      .select(col("event_id"), col("user_id"),
        col("m.block").as("block"), col("m.plen").as("plen"))
  }

  val oracleSql: Map[String, String] = Map(
    "q_events_cohort" ->
      """WITH a AS (SELECT DISTINCT user_id,
        |    CAST(date_trunc('week', ts) AS TIMESTAMP) AS wk FROM events),
        |f AS (SELECT user_id, MIN(wk) AS w0 FROM a GROUP BY user_id),
        |m AS (SELECT f.w0,
        |        CAST(date_diff('day', f.w0, a.wk) // 7 AS BIGINT) AS age,
        |        CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_active
        |      FROM a JOIN f USING (user_id) GROUP BY f.w0, age),
        |sz AS (SELECT w0, CAST(COUNT(*) AS BIGINT) AS cohort_n FROM f
        |       GROUP BY w0)
        |SELECT m.w0 AS cohort_week, m.age, m.n_active, sz.cohort_n,
        |  CAST(m.n_active * 1000000 // sz.cohort_n AS BIGINT) AS retention_ppm
        |FROM m JOIN sz USING (w0) ORDER BY cohort_week, age""".stripMargin,

    "q_events_attribution" ->
      """WITH t AS (
        |  SELECT event_id, user_id, event_type, ts,
        |    CASE WHEN event_type IN ('view', 'click') THEN event_id END AS tid,
        |    CASE WHEN event_type IN ('view', 'click') THEN event_type END AS ttype
        |  FROM events),
        |a AS (
        |  SELECT event_id, user_id, event_type,
        |    first_value(tid IGNORE NULLS) OVER w AS first_touch_id,
        |    first_value(ttype IGNORE NULLS) OVER w AS first_touch_type,
        |    last_value(tid IGNORE NULLS) OVER w AS last_touch_id,
        |    last_value(ttype IGNORE NULLS) OVER w AS last_touch_type
        |  FROM t
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        |SELECT event_id, user_id, first_touch_id, first_touch_type,
        |       last_touch_id, last_touch_type
        |FROM a WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin,

    "q_funnel" ->
      """WITH ev AS (SELECT user_id, event_type,
        |              make_timestamp(epoch_us(ts)) AS ts FROM events),
        |v AS (SELECT user_id, min(ts) AS t1 FROM ev WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, min(e.ts) AS t2
        |      FROM ev e JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'click' AND e.ts > v.t1
        |        AND e.ts <= v.t1 + INTERVAL 6 HOUR GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(e.ts) AS t3
        |      FROM ev e JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts > c.t2
        |        AND e.ts <= c.t2 + INTERVAL 6 HOUR GROUP BY e.user_id),
        |u AS (SELECT DISTINCT user_id FROM ev)
        |SELECT (CASE WHEN v.user_id IS NULL THEN 0 ELSE 1 END
        |      + CASE WHEN c.user_id IS NULL THEN 0 ELSE 1 END
        |      + CASE WHEN p.user_id IS NULL THEN 0 ELSE 1 END) AS stage,
        |  COUNT(*) AS n_users
        |FROM u LEFT JOIN v ON u.user_id = v.user_id
        |       LEFT JOIN c ON u.user_id = c.user_id
        |       LEFT JOIN p ON u.user_id = p.user_id
        |GROUP BY stage ORDER BY stage""".stripMargin,
    "q_ab_test" -> {
      def d(cond: String, v: String) = sqlDsum(s"CASE WHEN $cond THEN $v ELSE 0.0 END")
      s"""WITH a AS (SELECT
         |  CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
         |  CAST(SUM(CASE WHEN user_id % 2 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         |  ${d("user_id % 2 = 0", "value")} AS sx0,
         |  ${d("user_id % 2 <> 0", "value")} AS sx1,
         |  ${d("user_id % 2 = 0", "value * value")} AS sxx0,
         |  ${d("user_id % 2 <> 0", "value * value")} AS sxx1
         |  FROM events)
         |SELECT n0, n1, sx0 / n0 AS mean0, sx1 / n1 AS mean1,
         |  (sx0 / n0 - sx1 / n1) /
         |  sqrt((sxx0 / n0 - (sx0 / n0) * (sx0 / n0)) / n0
         |     + (sxx1 / n1 - (sx1 / n1) * (sx1 / n1)) / n1) AS z_score
         |FROM a""".stripMargin
    },
    "q_agg_hhi" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 1000.0)
        |      AS DECIMAL(38,0))) AS BIGINT) AS rev_milli
        |  FROM lineitem GROUP BY l_suppkey),
        |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_suppliers,
        |        CAST(SUM(rev_milli) AS BIGINT) AS sx,
        |        SUM(CAST(rev_milli AS DECIMAL(19,0)) * CAST(rev_milli AS DECIMAL(19,0))) AS sq
        |      FROM rev)
        |SELECT n_suppliers,
        |  CAST(sq AS DOUBLE) / (CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS hhi,
        |  (CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) / CAST(sq AS DOUBLE) AS effective_n
        |FROM m""".stripMargin,

    "q_agg_gini" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 1000.0)
        |      AS DECIMAL(38,0))) AS BIGINT) AS rev_milli
        |  FROM lineitem GROUP BY l_suppkey),
        |rk AS (SELECT rev_milli,
        |         CAST(row_number() OVER (ORDER BY rev_milli ASC, l_suppkey ASC) AS BIGINT) AS r
        |       FROM rev),
        |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_suppliers,
        |        CAST(SUM(rev_milli) AS BIGINT) AS total_rev_milli,
        |        CAST(SUM(r * rev_milli) AS BIGINT) AS srx
        |      FROM rk)
        |SELECT n_suppliers, total_rev_milli,
        |  CAST(2 * srx - (n_suppliers + 1) * total_rev_milli AS DOUBLE)
        |    / CAST(n_suppliers * total_rev_milli AS DOUBLE) AS gini
        |FROM m""".stripMargin,

    "q_pareto" ->
      s"""WITH rev AS (SELECT l_suppkey, ${sqlDsum("l_extendedprice * (1 - l_discount)")} AS revenue
         |             FROM lineitem GROUP BY l_suppkey),
         |t AS (SELECT ${sqlDsumScaled("revenue", 3)} AS total FROM rev),
         |cum AS (SELECT l_suppkey, revenue,
         |          ${sqlDsumScaledOver("revenue", "w", 3)} / total AS cum_share
         |        FROM rev, t
         |        WINDOW w AS (ORDER BY revenue DESC, l_suppkey
         |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         |SELECT l_suppkey, revenue, cum_share FROM cum
         |WHERE cum_share <= 0.8 ORDER BY cum_share""".stripMargin,
    "q_cohort" ->
      """WITH first AS (SELECT user_id, CAST(date_trunc('week', min(ts)) AS TIMESTAMP) AS cohort_week
        |               FROM events WHERE event_type = 'purchase' GROUP BY user_id),
        |active AS (SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS TIMESTAMP) AS week
        |           FROM events WHERE event_type = 'purchase')
        |SELECT cohort_week,
        |  CAST(date_diff('day', cohort_week, week) // 7 AS BIGINT) AS week_offset,
        |  CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_active
        |FROM active a JOIN first f ON a.user_id = f.user_id
        |GROUP BY cohort_week, week_offset
        |ORDER BY cohort_week, week_offset""".stripMargin,

    "q_basket_pairs" ->
      """WITH lab AS (SELECT DISTINCT l_orderkey AS okey, p_brand AS item
        |             FROM lineitem JOIN part ON l_partkey = p_partkey),
        |n AS (SELECT CAST(COUNT(DISTINCT okey) AS BIGINT) AS n_orders FROM lab),
        |ic AS (SELECT item, CAST(COUNT(*) AS BIGINT) AS n_item FROM lab GROUP BY item),
        |pc AS (SELECT a.item AS item_a, b.item AS item_b, CAST(COUNT(*) AS BIGINT) AS n_pair
        |       FROM lab a JOIN lab b ON a.okey = b.okey AND a.item < b.item
        |       GROUP BY 1, 2)
        |SELECT item_a, item_b, n_pair,
        |  CAST(n_pair * 1000000 // n_orders AS BIGINT) AS support_ppm,
        |  CAST(((n_pair * 1000000 // ia.n_item) * n_orders) // ib.n_item AS BIGINT) AS lift_ppm
        |FROM pc CROSS JOIN n
        |  JOIN ic ia ON ia.item = item_a
        |  JOIN ic ib ON ib.item = item_b
        |WHERE n_pair * 1000000 // n_orders >= 1000
        |ORDER BY item_a, item_b""".stripMargin,

    "q_feature_pit" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
        |             CAST(date_trunc('day', ts) AS TIMESTAMP) AS day FROM events),
        |v AS (SELECT user_id,
        |        CAST(unnest(generate_series(day + INTERVAL 1 DAY,
        |          day + INTERVAL 7 DAY, INTERVAL 1 DAY)) AS TIMESTAMP) AS aday
        |      FROM e WHERE event_type = 'view'),
        |va AS (SELECT user_id, aday, CAST(count(*) AS BIGINT) AS nv
        |       FROM v GROUP BY 1, 2),
        |p AS (SELECT e.user_id, COALESCE(va.nv, 0) AS nv
        |      FROM e LEFT JOIN va ON va.user_id = e.user_id AND va.aday = e.day
        |      WHERE e.event_type = 'purchase')
        |SELECT CAST(LEAST(nv, 10) AS BIGINT) AS views_7d,
        |  CAST(count(*) AS BIGINT) AS n_purchases,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM p GROUP BY 1 ORDER BY 1""".stripMargin,

    // same survivor/at-risk censuses, same staged log, same terminal
    // convention
    "q_events_survival" -> {
      import graft.ops.UlmTokenizer
      val staged = UlmTokenizer.costStages("v", "1", UlmTokenizer.Duck)
        .foldLeft("SELECT * FROM vals") { case (acc, (n, e)) =>
          s"SELECT *, $e AS $n FROM ($acc)" }
      s"""WITH u AS (SELECT user_id,
         |    CAST(date_trunc('day', MAX(ts)) AS TIMESTAMP) AS last_day
         |  FROM events GROUP BY user_id),
         |dd AS (SELECT last_day AS day, CAST(count(*) AS BIGINT) AS d
         |       FROM u GROUP BY last_day),
         |t AS (SELECT CAST(SUM(d) AS BIGINT) AS nu FROM dd),
         |r AS (SELECT day, d, nu - CAST(COALESCE(SUM(d) OVER (ORDER BY day
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         |        AS n_risk
         |      FROM dd, t),
         |r2 AS (SELECT *, n_risk - d AS surv FROM r),
         |vals AS (SELECT DISTINCT v FROM (
         |    SELECT n_risk AS v FROM r2
         |    UNION SELECT surv FROM r2 WHERE surv >= 1)),
         |st AS MATERIALIZED ($staged),
         |cbt AS (SELECT v, CAST(cost_cb AS BIGINT) AS cb FROM st),
         |tm AS (SELECT r2.day, r2.n_risk, r2.d, r2.surv,
         |         CASE WHEN r2.surv >= 1 THEN cs.cb - cn.cb ELSE 0 END AS term
         |       FROM r2 JOIN cbt cn ON cn.v = r2.n_risk
         |            LEFT JOIN cbt cs ON cs.v = r2.surv)
         |SELECT day, n_risk, d AS n_deaths,
         |  CAST(SUM(term) OVER (ORDER BY day) AS BIGINT) AS s_cb,
         |  CAST(CASE WHEN surv = 0 THEN 1 ELSE 0 END AS BIGINT) AS terminal
         |FROM tm ORDER BY day""".stripMargin
    },

    // dim rebuilt from the same range() formulas; LPM via window rank
    // (same tie-free ordering as the engine's struct-max)
    "q_events_cidr" ->
      """WITH t4 AS (SELECT 'b4_' || lpad(CAST(k AS VARCHAR), 2, '0') AS block,
        |    4 AS plen, k * 268435456 AS lo, k * 268435456 + 268435455 AS hi
        |  FROM (SELECT unnest(range(0, 16)) AS k)),
        |t12 AS (SELECT 'b12_' || lpad(CAST(k AS VARCHAR), 2, '0') AS block,
        |    12 AS plen, k * 268435456 + (k * 5 % 16) * 1048576 AS lo,
        |    k * 268435456 + (k * 5 % 16) * 1048576 + 1048575 AS hi
        |  FROM (SELECT unnest(range(0, 16)) AS k)),
        |t20 AS (SELECT 'b20_' || lpad(CAST(k AS VARCHAR), 2, '0') AS block,
        |    20 AS plen,
        |    k * 268435456 + (k * 5 % 16) * 1048576 + (k * 3 % 16) * 4096 AS lo,
        |    k * 268435456 + (k * 5 % 16) * 1048576 + (k * 3 % 16) * 4096 + 4095 AS hi
        |  FROM (SELECT unnest(range(0, 16)) AS k)),
        |blocks AS (SELECT * FROM t4 UNION ALL SELECT * FROM t12
        |           UNION ALL SELECT * FROM t20),
        |ev AS (SELECT event_id, user_id,
        |         event_id * 2654435761 % 4294967296 AS ip FROM events),
        |nt AS (SELECT CAST(count(*) AS BIGINT) AS nt FROM ev),
        |m AS (SELECT ev.event_id, ev.user_id, b.block, b.plen,
        |        row_number() OVER (PARTITION BY ev.event_id
        |          ORDER BY b.plen DESC, b.block) AS rn
        |      FROM ev JOIN blocks b ON ev.ip >= b.lo AND ev.ip <= b.hi),
        |best AS (SELECT * FROM m WHERE rn = 1)
        |SELECT block, CAST(plen AS INT) AS plen,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        |  CAST(count(*) * 1000000 // MAX(nt.nt) AS BIGINT) AS share_ppm
        |FROM best, nt GROUP BY block, plen ORDER BY block""".stripMargin,

    "q_events_dwell" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
        |             epoch_us(ts) AS us FROM events),
        |g AS (SELECT event_type,
        |        lead(us, 1) OVER (PARTITION BY user_id ORDER BY us, event_id)
        |          - us AS gap
        |      FROM e)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(min(gap) AS BIGINT) AS min_us,
        |  CAST(max(gap) AS BIGINT) AS max_us,
        |  CAST(sum(gap) AS BIGINT) AS sum_us,
        |  CAST(count(*) FILTER (WHERE gap < 1000000) AS BIGINT) AS lt_1s,
        |  CAST(count(*) FILTER (WHERE gap >= 1000000 AND gap < 60000000)
        |    AS BIGINT) AS s_1_60,
        |  CAST(count(*) FILTER (WHERE gap >= 60000000 AND gap < 3600000000)
        |    AS BIGINT) AS m_1_60,
        |  CAST(count(*) FILTER (WHERE gap >= 3600000000) AS BIGINT) AS ge_1h
        |FROM g WHERE gap IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_events_markov" ->
      """WITH t AS (
        |  SELECT event_type AS src_type,
        |    lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst_type
        |  FROM events),
        |c AS (SELECT src_type, dst_type, CAST(COUNT(*) AS BIGINT) AS n
        |      FROM t WHERE dst_type IS NOT NULL GROUP BY 1, 2)
        |SELECT src_type, dst_type, n,
        |  CAST(n * 1000000 // SUM(n) OVER (PARTITION BY src_type) AS BIGINT) AS p_ppm
        |FROM c ORDER BY src_type, dst_type""".stripMargin,

    "q_funnel_latency" ->
      """WITH fv AS (SELECT user_id, MIN(ts) AS tv FROM events
        |            WHERE event_type = 'view' GROUP BY user_id),
        |cv AS (SELECT e.user_id, tv, MIN(e.ts) AS tp
        |       FROM events e JOIN fv USING (user_id)
        |       WHERE e.event_type = 'purchase' AND e.ts >= tv
        |       GROUP BY e.user_id, tv),
        |dh AS (SELECT date_diff('second', tv, tp) // 3600 AS delta_hr FROM cv),
        |h AS (SELECT CAST(delta_hr AS BIGINT) AS delta_hr,
        |             CAST(COUNT(*) AS BIGINT) AS n_users FROM dh GROUP BY 1),
        |t AS (SELECT CAST(SUM(n_users) AS BIGINT) AS n_total FROM h)
        |SELECT delta_hr, n_users,
        |  CAST(SUM(n_users) OVER (ORDER BY delta_hr
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 1000000 // n_total
        |    AS BIGINT) AS cum_ppm
        |FROM h CROSS JOIN t ORDER BY delta_hr""".stripMargin,

    "q_events_paths" ->
      """WITH t AS (
        |  SELECT event_type AS e1,
        |    lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e2,
        |    lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e3
        |  FROM events)
        |SELECT e1 || '>' || e2 || '>' || e3 AS path, CAST(COUNT(*) AS BIGINT) AS n
        |FROM t WHERE e2 IS NOT NULL AND e3 IS NOT NULL
        |GROUP BY 1 ORDER BY n DESC, path LIMIT 20""".stripMargin,

    "q_rfm" ->
      """WITH m AS (SELECT MAX(o_orderdate) AS dmax FROM orders),
        |rfm AS (SELECT o_custkey, MAX(o_orderdate) AS last_order,
        |          CAST(COUNT(*) AS BIGINT) AS f,
        |          CAST(SUM(floor(o_totalprice * 100)) AS BIGINT) AS m_cents
        |        FROM orders GROUP BY o_custkey),
        |rd AS (SELECT o_custkey, f, m_cents,
        |         CAST(datediff('day', CAST(last_order AS DATE), CAST(dmax AS DATE)) AS BIGINT) AS r_days
        |       FROM rfm CROSS JOIN m),
        |q AS (SELECT
        |        ntile(5) OVER (ORDER BY r_days ASC, o_custkey) AS r_q,
        |        ntile(5) OVER (ORDER BY f DESC, o_custkey) AS f_q,
        |        ntile(5) OVER (ORDER BY m_cents DESC, o_custkey) AS m_q,
        |        m_cents
        |      FROM rd)
        |SELECT CAST(r_q AS INT) AS r_q, CAST(f_q AS INT) AS f_q, CAST(m_q AS INT) AS m_q,
        |  CAST(COUNT(*) AS BIGINT) AS n_customers,
        |  CAST(SUM(m_cents) AS BIGINT) AS cell_cents
        |FROM q GROUP BY 1, 2, 3 ORDER BY r_q, f_q, m_q""".stripMargin
  )
}
