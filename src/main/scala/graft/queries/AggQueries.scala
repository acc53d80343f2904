package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.QueryBuilder.scan
import graft.ops.CacheScope.ScopedPersist
import graft.ops.ExactAgg._

/** Aggregation surface (SURVEY §2.5 — absent in the reference). All double
  * sums/avgs go through ExactAgg so results are order-independent and
  * hash-match the oracle (and are reproducible run-to-run at cluster
  * scale). Group-bys are partial-aggregated map-side by Spark's
  * HashAggregate automatically.
  */
object AggQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1 shape — the canonical scan-heavy aggregation
    "q_agg_q1" -> ((s: SparkSession, d: String) => {
      scan(s, d, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).as("sum_charge"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_extendedprice")).as("avg_price"),
          davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order")
        )
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // HAVING: post-aggregation filter
    "q_agg_having" -> ((s: SparkSession, d: String) => {
      scan(s, d, "orders")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total_spent"))
        .filter(col("n_orders") >= 12)
        .orderBy(col("o_custkey"))
    }),

    // distinct aggregation
    "q_agg_distinct" -> ((s: SparkSession, d: String) => {
      scan(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n_rows")
        )
        .orderBy(col("l_returnflag"))
    }),

    // exact percentiles (interpolated): Spark's percentile and DuckDB's
    // quantile_cont share the lower + (upper-lower)*frac definition over
    // identical doubles, so the values hash-match. The exact variant
    // sorts per group — at 100 TB prefer approx_percentile (sketch,
    // partial-aggregated) and bound it the way SketchSpec bounds HLL
    "q_agg_median" -> ((s: SparkSession, d: String) => {
      scan(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          percentile(col("l_quantity"), lit(0.5)).as("med_qty"),
          percentile(col("l_extendedprice"), lit(0.25)).as("p25_price"),
          percentile(col("l_extendedprice"), lit(0.75)).as("p75_price"),
          count(lit(1)).as("n")
        )
        .orderBy(col("l_returnflag"))
    }),

    // exact WEIGHTED MEDIAN (weight = revenue cents): the smallest
    // quantity whose cumulative weight reaches half the group total —
    // the robust center the plain median misses when rows carry unequal
    // mass. Exact-integer end to end: weights are cents, the cumulative
    // runs over the (flag, qty) census (≤ 3×50 rows — windows over the
    // CENSUS, never the fact table), pick = min qty with 2·cum ≥ total
    "q_agg_wmedian" -> ((s: SparkSession, d: String) => {
      import org.apache.spark.sql.expressions.Window
      val g = scan(s, d, "lineitem")
        .groupBy(col("l_returnflag"), col("l_quantity").cast("long").as("qty"))
        .agg(sum(floor(col("l_extendedprice") * 100).cast("long")).as("w"))
      val cumW = Window.partitionBy(col("l_returnflag")).orderBy(col("qty"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val totW = Window.partitionBy(col("l_returnflag"))
      g.withColumn("cw", sum(col("w")).over(cumW))
        .withColumn("tw", sum(col("w")).over(totW))
        .filter(col("cw") * 2 >= col("tw"))
        .groupBy(col("l_returnflag"))
        .agg(min(col("qty")).as("wmedian_qty"),
          max(col("tw")).as("total_weight_cents"))
        .orderBy(col("l_returnflag"))
    }),

    // WEIGHTED QUARTILES (exact): smallest value whose cumulative
    // weight reaches 1/4 resp. 3/4 of the group's revenue mass, plus
    // the weighted IQR — q_agg_wmedian's siblings, same census spine
    // (windows over ≤ 3×50 rows, integer cents weights, cross-
    // multiplied thresholds)
    "q_agg_wpct" -> ((s: SparkSession, d: String) => {
      import org.apache.spark.sql.expressions.Window
      val g = scan(s, d, "lineitem")
        .groupBy(col("l_returnflag"), col("l_quantity").cast("long").as("qty"))
        .agg(sum(floor(col("l_extendedprice") * 100).cast("long")).as("w"))
      val cumW = Window.partitionBy(col("l_returnflag")).orderBy(col("qty"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val totW = Window.partitionBy(col("l_returnflag"))
      g.withColumn("cw", sum(col("w")).over(cumW))
        .withColumn("tw", sum(col("w")).over(totW))
        .groupBy(col("l_returnflag"))
        .agg(min(when(col("cw") * 4 >= col("tw"), col("qty"))).as("wp25"),
          min(when(col("cw") * 4 >= col("tw") * 3, col("qty"))).as("wp75"))
        .withColumn("wiqr", col("wp75") - col("wp25"))
        .orderBy(col("l_returnflag"))
    }),

    // ROBUST MEANS, exact: winsorized (values clamped to [p05, p95])
    // and 5%-trimmed (outermost n div 20 ROWS cut on each side — ties
    // handled by rank-interval overlap on the census, so the row count
    // trimmed is exact, not value-class-approximate). Everything runs
    // on the (flag, qty) CENSUS: nearest-rank percentiles are the
    // smallest value with 20·cum ≥ n (resp. ≥ 19·n), per-class kept
    // rows = |[cum−cnt, cum] ∩ [lo, hi]|, and the means leave integers
    // only in the final milli-scaled division
    "q_agg_robust" -> ((s: SparkSession, d: String) => {
      import org.apache.spark.sql.expressions.Window
      val g = scan(s, d, "lineitem")
        .groupBy(col("l_returnflag"), col("l_quantity").cast("long").as("qty"))
        .agg(count(lit(1)).as("cnt"))
      val cumW = Window.partitionBy(col("l_returnflag")).orderBy(col("qty"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val totW = Window.partitionBy(col("l_returnflag"))
      val census = g.withColumn("cum", sum(col("cnt")).over(cumW))
        .withColumn("n", sum(col("cnt")).over(totW))
      val bounds = census.groupBy(col("l_returnflag"))
        .agg(min(when(col("cum") * 20 >= col("n"), col("qty"))).as("p05"),
          min(when(col("cum") * 20 >= col("n") * 19, col("qty"))).as("p95"))
      census.join(broadcast(bounds), Seq("l_returnflag"))
        .withColumn("lo", expr("n div 20"))
        .withColumn("hi", col("n") - col("lo"))
        .withColumn("kept", greatest(lit(0L),
          least(col("cum"), col("hi")) - greatest(col("cum") - col("cnt"), col("lo"))))
        .withColumn("clamped", greatest(col("p05"), least(col("qty"), col("p95"))))
        .groupBy(col("l_returnflag"))
        .agg(max(col("p05")).as("p05"), max(col("p95")).as("p95"),
          max(col("n")).as("n"),
          sum(col("clamped") * col("cnt")).as("ws"),
          sum(col("qty") * col("kept")).as("ts"),
          sum(col("kept")).as("tn"))
        .select(col("l_returnflag"), col("p05"), col("p95"), col("n"),
          expr("ws * 1000 div n").as("winsor_milli"),
          expr("ts * 1000 div tn").as("trim_milli"))
        .orderBy(col("l_returnflag"))
    }),

    // exact MODE per group, deterministic tie-break (highest count, then
    // smallest value) as a struct-max — two map-side-combinable
    // aggregations, no window, no sort
    "q_agg_mode" -> ((s: SparkSession, d: String) => {
      val counts = scan(s, d, "lineitem")
        .groupBy(col("l_returnflag"), col("l_quantity"))
        .agg(count(lit(1)).as("cnt"))
      counts.groupBy(col("l_returnflag"))
        .agg(max(struct(col("cnt"), (-col("l_quantity")).as("negq"))).as("m"))
        .select(col("l_returnflag"), col("m.cnt").as("mode_cnt"),
          (-col("m.negq")).as("mode_qty"))
        .orderBy(col("l_returnflag"))
    }),

    // equi-depth FEATURE BINNING: exact quartile boundaries from one
    // broadcast-back aggregate, then bin assignment as a codegen'd
    // when-chain — the ML featurization primitive (no per-row quantile
    // state, no sampling)
    "q_feature_bins" -> ((s: SparkSession, d: String) => {
      val o = scan(s, d, "orders")
      val qs = o.agg(
        percentile(col("o_totalprice"), lit(0.25)).as("q1"),
        percentile(col("o_totalprice"), lit(0.5)).as("q2"),
        percentile(col("o_totalprice"), lit(0.75)).as("q3"))
      o.crossJoin(broadcast(qs))
        .withColumn("bin",
          when(col("o_totalprice") < col("q1"), 0)
            .when(col("o_totalprice") < col("q2"), 1)
            .when(col("o_totalprice") < col("q3"), 2)
            .otherwise(3).cast("long"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n"),
          min(col("o_totalprice")).as("lo"), max(col("o_totalprice")).as("hi"))
        .orderBy(col("bin"))
    }),

    // WEIGHT OF EVIDENCE / INFORMATION VALUE (the credit-scoring
    // feature census; Siddiqi 2006) — per categorical bin, woe =
    // log2(g/G) − log2(b/B) in EXACT integer centibits, decomposed into
    // SINGLE-count logs (woe_cb = cb(g) + cb(B) − cb(b) − cb(G), each
    // cb = round(100·log2(count)) from the shared staged fixed-point
    // generator — no ratio ever feeds the log, the PMI discipline), and
    // the IV contribution (g·10⁶ div G − b·10⁶ div B)·woe_cb as a pure
    // integer product (counts ≤ 8.8e12 stay in the generator's
    // headroom; the product ≤ 10⁶·~2100 fits easily). Outcome =
    // order fell through (status F), bins = o_orderpriority — every
    // bin carries both classes at every SF so log(0) can't arise.
    // One map-side-combinable groupBy; logs once per DISTINCT count
    "q_feature_woe" -> ((s: SparkSession, d: String) => {
      import graft.ops.UlmTokenizer
      val byBin = scan(s, d, "orders")
        .select(col("o_orderpriority").as("bin"),
          when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("bad"))
        .groupBy(col("bin"))
        .agg(sum(lit(1L) - col("bad")).as("g"), sum(col("bad")).as("b"))
        .scopedPersist()
      val tot = byBin.agg(sum(col("g")).as("gt"), sum(col("b")).as("bt"))
      val cand = byBin.crossJoin(broadcast(tot)).scopedPersist()
      val vals = cand.select(col("g").as("v")).union(cand.select(col("b")))
        .union(cand.select(col("gt"))).union(cand.select(col("bt"))).distinct()
      // driver-side cb over the per-bin count set (cbTableLocal; a
      // degenerate all-good/all-bad bin's 0 maps to cb = 0, exactly the
      // staged chain's value, so the inner joins keep it)
      val cb = UlmTokenizer.cbTableLocal(vals, "q_feature_woe cb values")
      cand
        .join(broadcast(cb.select(col("v").as("g"), col("cb").as("cb_g"))), Seq("g"))
        .join(broadcast(cb.select(col("v").as("b"), col("cb").as("cb_b"))), Seq("b"))
        .join(broadcast(cb.select(col("v").as("gt"), col("cb").as("cb_gt"))), Seq("gt"))
        .join(broadcast(cb.select(col("v").as("bt"), col("cb").as("cb_bt"))), Seq("bt"))
        .select(col("bin"), col("g").as("n_good"), col("b").as("n_bad"),
          (col("cb_g") + col("cb_bt") - col("cb_b") - col("cb_gt")).as("woe_cb"),
          ((expr("g * 1000000 div gt") - expr("b * 1000000 div bt"))
            * (col("cb_g") + col("cb_bt") - col("cb_b") - col("cb_gt")))
            .as("iv_contrib"))
        .orderBy(col("bin"))
    }),

    // EXACT two-sample KOLMOGOROV–SMIRNOV (the classic distribution-
    // drift test, here F-vs-O order cohorts over price cents): D is a
    // pure rational — max over values of |cum1·n2 − cum2·n1| scaled by
    // n1·n2 — so the statistic AND the α=0.05 verdict (squared
    // comparison against 1.358², no sqrt) are exact integers. The
    // cumulative distribution runs as a DISTRIBUTED two-level prefix
    // sum (16384-cent bucket census → tiny bucket-prefix window →
    // within-bucket windows partitioned by bucket), never a global
    // single-task window — the Selection-family pattern. 100 TB note:
    // the d_num² comparison runs in DECIMAL(38,0)/HUGEINT
    "q_agg_ks" -> ((s: SparkSession, d: String) => {
      import org.apache.spark.sql.expressions.Window
      val o = scan(s, d, "orders").select(
        floor(col("o_totalprice") * 100).cast("long").as("v"),
        when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("w1"),
        when(col("o_orderstatus") =!= "F", 1L).otherwise(0L).as("w2"))
      val vals = o.groupBy(col("v"))
        .agg(sum(col("w1")).as("d1"), sum(col("w2")).as("d2"))
        .withColumn("b", expr("v div 16384"))
      val bt = vals.groupBy(col("b"))
        .agg(sum(col("d1")).as("s1"), sum(col("d2")).as("s2"))
      val wb = Window.orderBy(col("b"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val bpre = bt // bucket census: dimension-sized, window is fine
        .withColumn("p1", coalesce(sum(col("s1")).over(wb), lit(0L)))
        .withColumn("p2", coalesce(sum(col("s2")).over(wb), lit(0L)))
        .select(col("b"), col("p1"), col("p2"))
      val tot = vals.agg(sum(col("d1")).as("n1"), sum(col("d2")).as("n2"))
      val wv = Window.partitionBy(col("b")).orderBy(col("v"))
      vals.join(broadcast(bpre), Seq("b"))
        .withColumn("cum1", col("p1") + sum(col("d1")).over(wv))
        .withColumn("cum2", col("p2") + sum(col("d2")).over(wv))
        .crossJoin(broadcast(tot))
        .select(abs(col("cum1") * col("n2") - col("cum2") * col("n1")).as("dev"),
          col("n1"), col("n2"))
        .groupBy(col("n1"), col("n2"))
        .agg(max(col("dev")).as("d_num"))
        .select(col("n1").cast("long").as("n1"), col("n2").cast("long").as("n2"),
          col("d_num").cast("long").as("d_num"),
          expr("""CAST(CAST(d_num AS DECIMAL(38,0)) * 1000000
                 |  div (CAST(n1 AS DECIMAL(38,0)) * n2) AS BIGINT)""".stripMargin)
            .as("d_ppm"),
          expr("""CAST(d_num AS DECIMAL(38,0)) * CAST(d_num AS DECIMAL(38,0))
                 |  * 1000000
                 |  > CAST(1844164 AS DECIMAL(38,0)) * (n1 + n2) * n1 * n2"""
            .stripMargin).as("reject_95"))
    }),

    // LORENZ CURVE DECILES (the distributional report under q_agg_gini's
    // single number: what share of total order value does the bottom
    // d/10 of orders hold?): value census → two-level distributed
    // prefix (count AND value cumsums) → each census row lands in
    // decile ⌈cum_cnt·10/n⌉ and each decile reports its boundary row's
    // cumulative value share in exact ppm (struct-argmax picks the
    // boundary — no second pass). Same census machinery as q_agg_ks;
    // nothing data-sized crosses a single-task window
    "q_agg_lorenz" -> ((s: SparkSession, d: String) => {
      import org.apache.spark.sql.expressions.Window
      val vals = scan(s, d, "orders")
        .select(floor(col("o_totalprice") * 100).cast("long").as("v"))
        .groupBy(col("v")).agg(count(lit(1)).as("c"))
        .withColumn("b", expr("v div 16384"))
      val bt = vals.groupBy(col("b"))
        .agg(sum(col("c")).as("sc"), sum(col("c") * col("v")).as("sv"))
      val wb = Window.orderBy(col("b"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val bpre = bt
        .withColumn("pc", coalesce(sum(col("sc")).over(wb), lit(0L)))
        .withColumn("pv", coalesce(sum(col("sv")).over(wb), lit(0L)))
        .select(col("b"), col("pc"), col("pv"))
      val tot = vals.agg(sum(col("c")).as("n"),
        sum(col("c") * col("v")).as("tv"))
      val wv = Window.partitionBy(col("b")).orderBy(col("v"))
      vals.join(broadcast(bpre), Seq("b"))
        .withColumn("cumc", col("pc") + sum(col("c")).over(wv))
        .withColumn("cumv", col("pv") + sum(col("c") * col("v")).over(wv))
        .crossJoin(broadcast(tot))
        .withColumn("decile", expr("(cumc * 10 + n - 1) div n"))
        .groupBy(col("decile"))
        .agg(max(struct(col("cumc"), col("cumv"), col("n"), col("tv"))).as("m"))
        .select(col("decile"), col("m.cumc").as("cum_orders"),
          expr("CAST(CAST(m.cumv AS DECIMAL(38,0)) * 1000000 div m.tv AS BIGINT)")
            .as("cum_value_ppm"))
        .orderBy(col("decile"))
    }),

    // COEFFICIENT OF VARIATION per priority class (the scale-free
    // spread number that lets a 10-dollar and a 10k-dollar segment be
    // compared): emitted as CV² in exact integer ppm — (n·Q − S²)·10⁶
    // div S² with DECIMAL(38,0) widening — no sqrt, no float (callers
    // take one client-side sqrt for CV). One grouped census
    "q_agg_cv" -> ((s: SparkSession, d: String) => {
      scan(s, d, "orders")
        .select(col("o_orderpriority").as("pr"),
          floor(col("o_totalprice") * 100).cast("long").as("v"))
        .groupBy(col("pr"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"),
          sum(expr("CAST(v AS DECIMAL(38,0)) * v")).as("qv"))
        .select(col("pr"), col("n"),
          expr("""CAST((CAST(n AS DECIMAL(38,0)) * qv
                 |  - CAST(sv AS DECIMAL(38,0)) * sv) * 1000000
                 |  div (CAST(sv AS DECIMAL(38,0)) * sv) AS BIGINT)"""
            .stripMargin).as("cv2_ppm"))
        .orderBy(col("pr"))
    }),

    // BOWLEY QUARTILE SKEWNESS + KELLY's decile variant (the robust
    // asymmetry readouts no third moment can poison): (Q3 + Q1 − 2·med)
    // / (Q3 − Q1) and the P90/P10 analogue, per order priority. The
    // quartiles are exact interpolated percentiles (identical
    // interpolation over identical integers in both engines — the
    // q_agg_median contract); each coefficient is ONE fixed-order
    // double expression. One grouped percentile aggregation
    "q_agg_bowley" -> ((s: SparkSession, d: String) => {
      scan(s, d, "orders")
        .select(col("o_orderpriority").as("pr"),
          floor(col("o_totalprice") * 100).cast("long").as("v"))
        .groupBy(col("pr"))
        .agg(count(lit(1)).as("n"),
          percentile(col("v"), lit(0.25)).as("q1"),
          percentile(col("v"), lit(0.5)).as("med"),
          percentile(col("v"), lit(0.75)).as("q3"),
          percentile(col("v"), lit(0.1)).as("p10"),
          percentile(col("v"), lit(0.9)).as("p90"))
        .select(col("pr"), col("n"),
          expr("(q3 + q1 - 2 * med) / (q3 - q1)").as("bowley"),
          expr("(p90 + p10 - 2 * med) / (p90 - p10)").as("kelly"))
        .orderBy(col("pr"))
    }),

    // ATKINSON INEQUALITY INDEX (ε = 0.5 — the welfare-weighted
    // inequality number beside q_agg_gini/q_agg_hhi, from the Atkinson
    // 1970 family): A = 1 − (Σ√x/n)²/μ = 1 − (Σ√x)²/(n·Σx) over order
    // price cents. The per-value √ is floor(sqrt(x)) — the
    // temperatureMixture isqrt discipline: correctly-rounded double
    // sqrt of the same integer in both engines, floored, summed as
    // exact integers — and the index lands as one DECIMAL(38,0) ppm
    // quotient. One scan, one 1-row agg
    "q_agg_atkinson" -> ((s: SparkSession, d: String) => {
      scan(s, d, "orders")
        .select(floor(col("o_totalprice") * 100).cast("long").as("v"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"),
          sum(floor(sqrt(col("v").cast("double"))).cast("long")).as("sq"))
        .select(col("n"), col("sv"), col("sq"),
          (lit(1000000L) - expr(
            """CAST(CAST(sq AS DECIMAL(38,0)) * sq * 1000000
              |  div (CAST(n AS DECIMAL(38,0)) * sv) AS BIGINT)""".stripMargin))
            .as("a_ppm"))
    }),

    // HUBER M-ESTIMATOR of location (the robust mean between q_agg_mad's
    // median and the plain average — downweights outliers instead of
    // ignoring or absorbing them): 3 IRLS rounds in PURE-INTEGER ppm —
    // weight w = 10⁶ inside the band |v−μ| ≤ k, else k·10⁶ div |v−μ|;
    // μ' = Σw·v div Σw with DECIMAL(38,0) sums (Σw·v ≈ 10⁶·Σv would
    // overflow BIGINT at sf1×10). Both engines run the identical
    // truncating-division recursion, so every round's μ is bit-equal.
    // Each round is one scan + one scalar broadcast — map-side
    // combinable, no shuffle beyond the 1-row agg; k = μ₀/10 is the
    // deterministic tuning band. 100 TB: rounds × one-pass, cached base
    "q_agg_huber" -> ((s: SparkSession, d: String) => {
      import graft.ops.CacheScope.ScopedPersist
      val base = scan(s, d, "lineitem")
        .select(floor(col("l_extendedprice") * 100).cast("long").as("v"))
        .scopedPersist()
      val m0 = base.agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
        .select(col("n"), expr("s div n").as("mu0"),
          expr("(s div n) div 10").as("k"))
      def round(prev: DataFrame, i: Int): DataFrame = {
        val carried = prev.columns.map(c => max(col(c)).as(c))
        base.crossJoin(broadcast(prev))
          .withColumn("ad", abs(col("v") - col(s"mu${i - 1}")))
          .withColumn("w", expr(
            "CASE WHEN ad <= k THEN 1000000L ELSE k * 1000000L div ad END"))
          .agg(carried.head, carried.tail :+
            expr("""CAST(SUM(CAST(w AS DECIMAL(38,0)) * v)
                   |  div SUM(CAST(w AS DECIMAL(38,0))) AS BIGINT)"""
              .stripMargin).as(s"mu$i"): _*)
      }
      val m3 = round(round(round(m0, 1), 2), 3)
      val carried = m3.columns.map(c => max(col(c)).as(c))
      base.crossJoin(broadcast(m3))
        .agg(carried.head, carried.tail :+
          sum(when(abs(col("v") - col("mu3")) > col("k"), 1L).otherwise(0L))
            .as("n_outliers"): _*)
        .select(col("n"), col("k"), col("mu0"), col("mu1"), col("mu2"),
          col("mu3"), col("n_outliers"))
    }),

    // WALD–WOLFOWITZ RUNS TEST (is the daily series RANDOM around its
    // center, or does it trend/oscillate — the independence check the
    // location tests above assume away): days are classed above/below
    // the MEAN via the exact integer predicate n·cnt > S (the mean as
    // cutpoint keeps every comparison integer; the classical test
    // permits any fixed cutpoint), runs counted by one lag pass over
    // the day order, and z² = D²(N−1)/(2·n1·n2·(2·n1·n2−N)) with
    // D = R·N − 2·n1·n2 − N spelled as integer ppm. Day-grain lag +
    // one 1-row agg
    "q_agg_runs" -> ((s: SparkSession, d: String) => {
      import org.apache.spark.sql.expressions.Window
      val daily = scan(s, d, "events")
        .groupBy(date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as("cnt"))
      val g = daily.agg(count(lit(1)).as("n"), sum(col("cnt")).as("s"))
      val bits = daily.crossJoin(broadcast(g))
        .select(col("day"),
          when(col("n") * col("cnt") > col("s"), 1L).otherwise(0L).as("b"))
      val w = Window.orderBy(col("day"))
      bits
        .withColumn("chg",
          when(lag(col("b"), 1).over(w).isNull, 1L)
            .otherwise(when(col("b") =!= lag(col("b"), 1).over(w), 1L).otherwise(0L)))
        .agg(sum(col("chg")).as("r"), sum(col("b")).as("n1"),
          sum(lit(1L) - col("b")).as("n2"))
        .withColumn("nn", col("n1") + col("n2"))
        .withColumn("dd",
          col("r") * col("nn") - lit(2) * col("n1") * col("n2") - col("nn"))
        .select(col("r").as("n_runs"), col("n1"), col("n2"),
          expr("""dd * dd * (nn - 1) * 1000000
                 |  div (2 * n1 * n2 * (2 * n1 * n2 - nn))""".stripMargin)
            .as("z2_ppm"),
          expr("""dd * dd * (nn - 1) * 10000
                 |  > 38416 * 2 * n1 * n2 * (2 * n1 * n2 - nn)""".stripMargin)
            .as("reject_95"))
    }),

    // WILCOXON SIGNED-RANK (the paired test that uses magnitudes where
    // q_agg_signtest only uses directions — same daily purchase-vs-view
    // pairs): zero diffs dropped per the classical test, |diff| ranks
    // tie-averaged as ALL-INTEGER doubled ranks (2B + c + 1 per
    // distinct magnitude — the q_agg_mannwhitney census trick), W⁺
    // carried as 2W⁺, tie term Σ(t³−t), and the z² verdict spelled as
    // one integer cross-multiplication against the tie-corrected
    // variance (2n(n+1)(2n+1) − T)/3·16. Day-grain: the magnitude
    // census is dimension-sized, so the window is trivially safe
    "q_agg_wilcoxon" -> ((s: SparkSession, d: String) => {
      import org.apache.spark.sql.expressions.Window
      val diffs = scan(s, d, "events")
        .filter(col("event_type").isin("purchase", "view"))
        .groupBy(date_trunc("day", col("ts")).as("day"))
        .agg((sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          - sum(when(col("event_type") === "view", 1L).otherwise(0L))).as("diff"))
        .filter(col("diff") =!= 0)
        .select(abs(col("diff")).as("a"),
          when(col("diff") > 0, 1L).otherwise(0L).as("pos"))
      val vals = diffs.groupBy(col("a"))
        .agg(count(lit(1)).as("c"), sum(col("pos")).as("cp"))
      val wv = Window.orderBy(col("a"))
      vals
        .withColumn("below",
          coalesce(sum(col("c")).over(wv.rowsBetween(Window.unboundedPreceding, -1)),
            lit(0L)))
        .agg(sum(col("c")).as("n"),
          sum(col("cp") * (lit(2) * col("below") + col("c") + lit(1))).as("w2p"),
          sum(col("c") * col("c") * col("c") - col("c")).as("tie_t"))
        .withColumn("dd", lit(2) * col("w2p") - col("n") * (col("n") + lit(1)))
        .select(col("n"), col("w2p"), col("tie_t"),
          expr("""CAST(CAST(dd AS DECIMAL(38,0)) * dd * 3 * 1000000
                 |  div (2 * n * (n + 1) * (2 * n + 1) - tie_t) AS BIGINT)"""
            .stripMargin).as("z2_ppm"),
          expr("""CAST(dd AS DECIMAL(38,0)) * dd * 3 * 10000
                 |  > CAST(38416 AS DECIMAL(38,0))
                 |    * (2 * n * (n + 1) * (2 * n + 1) - tie_t)""".stripMargin)
            .as("reject_95"))
    }),

    // HODGES–LEHMANN pseudo-median (the rank-based location estimator
    // between the median's robustness and the mean's efficiency —
    // median of all Walsh averages (x_i+x_j)/2, i ≤ j): daily event
    // counts. Walsh SUMS stay integer (hl_x2 = exact interpolated
    // median of x_i+x_j; the /2 happens once at the end as one double
    // division), and the pair table is |days|² — CONSTANT in data
    // volume, the q_agg_kendall day-grain contract. Both engines
    // interpolate percentiles identically over identical integers
    "q_agg_hodgeslehmann" -> ((s: SparkSession, d: String) => {
      import graft.ops.CacheScope.ScopedPersist
      val daily = scan(s, d, "events")
        .groupBy(date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as("cnt"))
        .scopedPersist()
      val a = daily.select(col("day").as("da"), col("cnt").as("ca"))
      val b = daily.select(col("day").as("db"), col("cnt").as("cb"))
      a.crossJoin(b).filter(col("da") <= col("db"))
        .select((col("ca") + col("cb")).as("walsh_x2"))
        .agg(count(lit(1)).as("n_pairs"),
          percentile(col("walsh_x2"), lit(0.5)).as("hl_x2"))
        .select(col("n_pairs"), col("hl_x2"),
          (col("hl_x2") / lit(2.0)).as("hl"))
    }),

    // SPEARMAN'S ρ (the third member of the correlation family —
    // Pearson on RANKS, between q_agg_covar's linearity and
    // q_agg_kendall's concordance): daily view vs purchase counts,
    // each series tie-average-ranked with doubled ranks via RANGE-frame
    // windows (the q_agg_friedman construction, global frame), then
    // the exact integer Pearson machinery on the rank pairs — emitted
    // as SIGNED ρ² in ppm (sign(cov)·cov²·10⁶ div (vx·vy), the
    // q_win_rollcorr discipline — no sqrt, no float). Day-grain
    "q_agg_spearman" -> ((s: SparkSession, d: String) => {
      import org.apache.spark.sql.expressions.Window
      val daily = scan(s, d, "events")
        .groupBy(date_trunc("day", col("ts")).as("day"))
        .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("x"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("y"))
      def rank2(c: String): org.apache.spark.sql.Column =
        lit(2) * count(lit(1)).over(Window.orderBy(col(c))
          .rangeBetween(Window.unboundedPreceding, -1)) +
          count(lit(1)).over(Window.partitionBy(col(c))) + lit(1)
      daily
        .withColumn("rx", rank2("x"))
        .withColumn("ry", rank2("y"))
        .agg(count(lit(1)).as("n"), sum(col("rx")).as("sx"),
          sum(col("ry")).as("sy"), sum(col("rx") * col("ry")).as("sxy"),
          sum(col("rx") * col("rx")).as("sxx"),
          sum(col("ry") * col("ry")).as("syy"))
        .withColumn("cov", col("n") * col("sxy") - col("sx") * col("sy"))
        .withColumn("vx", col("n") * col("sxx") - col("sx") * col("sx"))
        .withColumn("vy", col("n") * col("syy") - col("sy") * col("sy"))
        .select(col("n"),
          expr("""CAST(CASE WHEN cov < 0 THEN -1 ELSE 1 END
                 |  * (CAST(cov AS DECIMAL(38,0)) * cov * 1000000
                 |     div (CAST(vx AS DECIMAL(38,0)) * vy)) AS BIGINT)"""
            .stripMargin).as("rho2s_ppm"))
    }),

    // KENDALL'S τ-b (the rank-correlation robust to outliers that
    // Pearson's q_agg_covar isn't, with tie correction): daily purchase
    // vs view counts, pairs = day pairs. ALL-INTEGER: concordant /
    // discordant / tie censuses from the i<j day self-join (day-grain —
    // the pair table is |days|², CONSTANT in data volume), tie terms
    // Σt(t−1)/2 from per-value censuses, and τ-b² = (C−D)²/((n0−n1)(n0−n2))
    // emitted as one cross-multiplied ppm quotient plus its sign — no
    // sqrt, no float. 100 TB: only the day census touches data
    "q_agg_kendall" -> ((s: SparkSession, d: String) => {
      import graft.ops.CacheScope.ScopedPersist
      val daily = scan(s, d, "events")
        .filter(col("event_type").isin("purchase", "view"))
        .groupBy(date_trunc("day", col("ts")).as("day"))
        .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("p"),
          sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("v"))
        .scopedPersist()
      val a = daily.select(col("day").as("da"), col("p").as("pa"), col("v").as("va"))
      val b = daily.select(col("day").as("db"), col("p").as("pb"), col("v").as("vb"))
      val cd = a.crossJoin(b).filter(col("da") < col("db"))
        .agg(
          sum(when((col("pa") - col("pb")) * (col("va") - col("vb")) > 0, 1L)
            .otherwise(0L)).as("c"),
          sum(when((col("pa") - col("pb")) * (col("va") - col("vb")) < 0, 1L)
            .otherwise(0L)).as("d"),
          count(lit(1)).as("n0"))
      val tp = daily.groupBy(col("p")).agg(count(lit(1)).as("t"))
        .agg(coalesce(sum(expr("t * (t - 1) div 2")), lit(0L)).as("n1"))
      val tv = daily.groupBy(col("v")).agg(count(lit(1)).as("t"))
        .agg(coalesce(sum(expr("t * (t - 1) div 2")), lit(0L)).as("n2"))
      cd.crossJoin(broadcast(tp)).crossJoin(broadcast(tv))
        .select(col("c"), col("d"), col("n0"), col("n1"), col("n2"),
          expr("""CAST(CAST(c - d AS DECIMAL(38,0)) * (c - d) * 1000000
                 |  div (CAST(n0 - n1 AS DECIMAL(38,0)) * (n0 - n2)) AS BIGINT)"""
            .stripMargin).as("taub2_ppm"),
          expr("CAST(CASE WHEN c > d THEN 1 WHEN c < d THEN -1 ELSE 0 END AS BIGINT)")
            .as("tau_sign"))
    }),

    // PAIRED SIGN TEST (the assumption-free "is A consistently above
    // B" check — here daily purchase vs view event counts, pairs =
    // days): count days purchases exceed views and vice versa (ties
    // dropped, per the classical test), verdict from the normal
    // approximation z² = (n⁺−n⁻)²/(n⁺+n⁻) spelled as one integer
    // cross-multiplication — no float anywhere. One day-grain census +
    // one 1-row agg
    "q_agg_signtest" -> ((s: SparkSession, d: String) => {
      scan(s, d, "events")
        .filter(col("event_type").isin("purchase", "view"))
        .groupBy(date_trunc("day", col("ts")).as("day"))
        .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("p"),
          sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("v"))
        .agg(count(lit(1)).as("n_days"),
          sum(when(col("p") > col("v"), 1L).otherwise(0L)).as("n_pos"),
          sum(when(col("p") < col("v"), 1L).otherwise(0L)).as("n_neg"),
          sum(when(col("p") === col("v"), 1L).otherwise(0L)).as("n_tie"))
        .select(col("n_days"), col("n_pos"), col("n_neg"), col("n_tie"),
          expr("(n_pos - n_neg) * (n_pos - n_neg) * 1000000 div (n_pos + n_neg)")
            .as("z2_ppm"),
          expr("(n_pos - n_neg) * (n_pos - n_neg) * 10000 > 38416 * (n_pos + n_neg)")
            .as("reject_95"))
    }),

    // MOOD'S MEDIAN TEST (the blunt-but-assumption-free k-sample
    // check beside q_agg_kruskal: classify every event above/below the
    // GRAND median of value cents, then χ² on the 2×k table): the
    // cutpoint is the exact interpolated median (both engines
    // interpolate identically over identical integers — the
    // q_agg_median contract), the table censuses are integers, and χ²
    // uses the q_profile_cramersv zero-cell-inclusive integer cell
    // formula (n·O − r·c)²·10⁶ div (n·r·c) with the df = k−1 = 4
    // verdict. Two combinable censuses + a dimension-sized grid
    "q_agg_mood" -> ((s: SparkSession, d: String) => {
      val ev = scan(s, d, "events")
        .select(col("event_type"), floor(col("value") * 100).cast("long").as("v"))
      val med = ev.agg(percentile(col("v"), lit(0.5)).as("med"))
      val cls = ev.crossJoin(broadcast(med))
        .select(col("event_type"),
          when(col("v").cast("double") > col("med"), lit("above"))
            .otherwise(lit("below")).as("side"))
      val pm = cls.groupBy(col("event_type")).agg(count(lit(1)).as("np"))
      val sm = cls.groupBy(col("side")).agg(count(lit(1)).as("ns"))
      val cl = cls.groupBy(col("event_type"), col("side"))
        .agg(count(lit(1)).as("c"))
      val t = cls.agg(count(lit(1)).as("nt"))
      pm.crossJoin(sm).join(cl, Seq("event_type", "side"), "left")
        .na.fill(0L, Seq("c"))
        .crossJoin(broadcast(t))
        .withColumn("cell_ppm", expr(
          """CAST((CAST(nt AS DECIMAL(38,0)) * c - CAST(np AS DECIMAL(38,0)) * ns)
            |  * (CAST(nt AS DECIMAL(38,0)) * c - CAST(np AS DECIMAL(38,0)) * ns)
            |  * 1000000 div (CAST(nt AS DECIMAL(38,0)) * np * ns) AS BIGINT)"""
            .stripMargin))
        .agg(max(col("nt")).as("n_rows"),
          countDistinct(col("event_type")).as("k"),
          sum(col("cell_ppm")).as("chi2_ppm"))
        .select(col("n_rows"), col("k"), col("chi2_ppm"),
          (col("chi2_ppm") > lit(9488000L)).as("reject_95"))
    }),

    // KRUSKAL–WALLIS (the k-sample rank ANOVA at FULL value
    // cardinality — Friedman ranks within day blocks, this ranks all
    // events' value cents in one pooled ordering): per-value census
    // with 5 per-type counts, pooled doubled ranks 2B + c + 1 via the
    // SAME distributed two-level prefix sum as q_agg_ks, per-group
    // rank sums R₂ⱼ, and the tie-corrected H in integer ppm (q_j =
    // R₂ⱼ² div n_j stays BIGINT; sums widen to DECIMAL(38,0); the
    // correction (N³−N)/(N³−N−T) is one cross-multiplication). df = 4
    // verdict. The ranking shuffle is value-census-sized — never a
    // global single-task sort
    "q_agg_kruskal" -> ((s: SparkSession, d: String) => {
      import org.apache.spark.sql.expressions.Window
      val types = Seq("click", "signup", "error", "view", "purchase")
      val ev = scan(s, d, "events").select(
        floor(col("value") * 100).cast("long").as("v"), col("event_type"))
      val vals = ev.groupBy(col("v"))
        .agg(types.map(t =>
          sum(when(col("event_type") === t, 1L).otherwise(0L)).as(s"d_$t")).head,
          types.map(t =>
            sum(when(col("event_type") === t, 1L).otherwise(0L)).as(s"d_$t")).tail: _*)
        .withColumn("c", types.map(t => col(s"d_$t")).reduce(_ + _))
        .withColumn("b", expr("v div 16384"))
      val bt = vals.groupBy(col("b")).agg(sum(col("c")).as("sc"))
      val wb = Window.orderBy(col("b"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val bpre = bt.withColumn("p", coalesce(sum(col("sc")).over(wb), lit(0L)))
        .select(col("b"), col("p"))
      val wv = Window.partitionBy(col("b")).orderBy(col("v"))
      val ranked = vals.join(broadcast(bpre), Seq("b"))
        .withColumn("rank2",
          lit(2) * (col("p") + sum(col("c")).over(wv) - col("c")) + col("c") + lit(1))
      val agg = ranked.agg(
        types.map(t => sum(col(s"d_$t") * col("rank2")).as(s"r2_$t")).head,
        types.map(t => sum(col(s"d_$t") * col("rank2")).as(s"r2_$t")).tail ++
          types.map(t => sum(col(s"d_$t")).as(s"n_$t")) :+
          sum(col("c") * col("c") * col("c") - col("c")).as("tie_t"): _*)
      agg
        .withColumn("nn", types.map(t => col(s"n_$t")).reduce(_ + _))
        .withColumn("s6", types.map(t =>
          expr(s"CAST(CAST(r2_$t AS DECIMAL(38,0)) * r2_$t div n_$t AS DECIMAL(38,0))"))
          .reduce(_ + _))
        .withColumn("h0_ppm", expr(
          "CAST(3 * s6 * 1000000 div (CAST(nn AS DECIMAL(38,0)) * (nn + 1)) AS BIGINT)"
          ) - lit(3) * (col("nn") + lit(1)) * lit(1000000L))
        .withColumn("h_ppm", expr(
          // sign-decomposed: h0 can round below zero on near-identical
          // groups, and truncating vs floor division disagree there
          """CASE WHEN h0_ppm < 0 THEN -1 ELSE 1 END
            |  * CAST(CAST(abs(h0_ppm) AS DECIMAL(38,0))
            |      * (CAST(nn AS DECIMAL(38,0)) * nn * nn - nn)
            |      div (CAST(nn AS DECIMAL(38,0)) * nn * nn - nn - tie_t) AS BIGINT)"""
            .stripMargin))
        .select(col("nn").as("n"), col("tie_t"), col("h_ppm"),
          (col("h_ppm") > lit(9488000L)).as("reject_95"))
    }),

    // FRIEDMAN TEST (the k-related-samples test completing the tier:
    // are the FIVE event types systematically ordered in volume, with
    // days as blocks?): per day the 5 type counts are ranked (doubled
    // ranks 2B + c + 1 with B/c from RANGE-frame windows so ties
    // average exactly — the within-block twin of the q_agg_mannwhitney
    // census), the full day × type grid is materialized with 0-count
    // fills (a missing cell is a real lowest rank, not a dropped row),
    // and χ²_F = 3·ΣR₂²/(nk(k+1)) − 3n(k+1) lands as integer ppm with
    // the df = 4 verdict. Classical no-tie-correction form, identical
    // in both engines. Day-grain: the grid is 5·days rows
    "q_agg_friedman" -> ((s: SparkSession, d: String) => {
      import org.apache.spark.sql.expressions.Window
      val ev = scan(s, d, "events")
      val daily = ev.groupBy(date_trunc("day", col("ts")).as("day"),
        col("event_type")).agg(count(lit(1)).as("cnt"))
      val days = ev.select(date_trunc("day", col("ts")).as("day")).distinct()
      import s.implicits._
      val types = Seq("click", "signup", "error", "view", "purchase")
        .toDF("event_type")
      val grid = days.crossJoin(types)
        .join(daily, Seq("day", "event_type"), "left")
        .na.fill(0L, Seq("cnt"))
      val wB = Window.partitionBy(col("day")).orderBy(col("cnt"))
        .rangeBetween(Window.unboundedPreceding, -1)
      val wC = Window.partitionBy(col("day"), col("cnt"))
      grid
        .withColumn("rank2",
          lit(2) * count(lit(1)).over(wB) + count(lit(1)).over(wC) + lit(1))
        .groupBy(col("event_type"))
        .agg(sum(col("rank2")).as("r2"), count(lit(1)).as("nd"))
        .agg(max(col("nd")).as("n"), count(lit(1)).as("k"),
          sum(expr("r2 * r2")).as("sr2"))
        .select(col("n"), col("k"),
          expr("""3 * sr2 * 1000000 div (n * k * (k + 1))
                 |  - 3 * n * (k + 1) * 1000000""".stripMargin).as("chi2_ppm"),
          expr("""3 * sr2 * 1000000 div (n * k * (k + 1))
                 |  - 3 * n * (k + 1) * 1000000 > 9488000""".stripMargin)
            .as("reject_95"))
    }),

    // ANDERSON–DARLING two-sample (the TAIL-sensitive member of the
    // KS/CvM trio — the 1/(H(1−H)) weight blows up at the extremes, so
    // tail drift dominates the statistic): same census and two-level
    // prefix as q_agg_ks; each pooled value contributes
    // (c·dev²·10⁶) div (cumN·(N−cumN)) — an integer ppm term both
    // engines truncate identically (the per-value division replaces an
    // unreachable common denominator; the DEFINITION is the shared
    // integer recipe) — summed in DECIMAL(38,0), normalized by n1·n2,
    // verdict at the α=0.05 critical value 2.492. The all-mass last
    // value (cumN = N) is excluded per the standard formula
    "q_agg_ad" -> ((s: SparkSession, d: String) => {
      import org.apache.spark.sql.expressions.Window
      val o = scan(s, d, "orders").select(
        floor(col("o_totalprice") * 100).cast("long").as("v"),
        when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("w1"),
        when(col("o_orderstatus") =!= "F", 1L).otherwise(0L).as("w2"))
      val vals = o.groupBy(col("v"))
        .agg(sum(col("w1")).as("d1"), sum(col("w2")).as("d2"))
        .withColumn("b", expr("v div 16384"))
      val bt = vals.groupBy(col("b"))
        .agg(sum(col("d1")).as("s1"), sum(col("d2")).as("s2"))
      val wb = Window.orderBy(col("b"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val bpre = bt
        .withColumn("p1", coalesce(sum(col("s1")).over(wb), lit(0L)))
        .withColumn("p2", coalesce(sum(col("s2")).over(wb), lit(0L)))
        .select(col("b"), col("p1"), col("p2"))
      val tot = vals.agg(sum(col("d1")).as("n1"), sum(col("d2")).as("n2"))
      val wv = Window.partitionBy(col("b")).orderBy(col("v"))
      vals.join(broadcast(bpre), Seq("b"))
        .withColumn("cum1", col("p1") + sum(col("d1")).over(wv))
        .withColumn("cum2", col("p2") + sum(col("d2")).over(wv))
        .crossJoin(broadcast(tot))
        .withColumn("cum", col("cum1") + col("cum2"))
        .withColumn("nn", col("n1") + col("n2"))
        .filter(col("cum") < col("nn"))
        .select(col("n1"), col("n2"),
          expr("""CAST(CAST(d1 + d2 AS DECIMAL(38,0))
                 |  * (cum1 * n2 - cum2 * n1) * (cum1 * n2 - cum2 * n1)
                 |  * 1000000 div (CAST(cum AS DECIMAL(38,0)) * (nn - cum))
                 |  AS DECIMAL(38,0))""".stripMargin).as("term"))
        .groupBy(col("n1"), col("n2"))
        .agg(sum(col("term")).as("s"))
        .select(col("n1"), col("n2"),
          expr("CAST(s div (CAST(n1 AS DECIMAL(38,0)) * n2) AS BIGINT)")
            .as("ad_ppm"),
          expr("s div (CAST(n1 AS DECIMAL(38,0)) * n2) > 2492000")
            .as("reject_95"))
    }),

    // CRAMÉR–VON MISES two-sample (the whole-distribution counterpart
    // to q_agg_ks's single worst gap — T integrates (F1−F2)² over every
    // pooled observation, so diffuse drift KS's max can miss still
    // registers): same F-vs-O price-cents census, same distributed
    // two-level prefix sum; the only new term is the count-weighted
    // Σ c·dev² in DECIMAL(38,0), and T and the α=0.05 verdict
    // (T > 0.461) are pure integer ppm cross-multiplications
    "q_agg_cvm" -> ((s: SparkSession, d: String) => {
      import org.apache.spark.sql.expressions.Window
      val o = scan(s, d, "orders").select(
        floor(col("o_totalprice") * 100).cast("long").as("v"),
        when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("w1"),
        when(col("o_orderstatus") =!= "F", 1L).otherwise(0L).as("w2"))
      val vals = o.groupBy(col("v"))
        .agg(sum(col("w1")).as("d1"), sum(col("w2")).as("d2"))
        .withColumn("b", expr("v div 16384"))
      val bt = vals.groupBy(col("b"))
        .agg(sum(col("d1")).as("s1"), sum(col("d2")).as("s2"))
      val wb = Window.orderBy(col("b"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val bpre = bt
        .withColumn("p1", coalesce(sum(col("s1")).over(wb), lit(0L)))
        .withColumn("p2", coalesce(sum(col("s2")).over(wb), lit(0L)))
        .select(col("b"), col("p1"), col("p2"))
      val tot = vals.agg(sum(col("d1")).as("n1"), sum(col("d2")).as("n2"))
      val wv = Window.partitionBy(col("b")).orderBy(col("v"))
      vals.join(broadcast(bpre), Seq("b"))
        .withColumn("cum1", col("p1") + sum(col("d1")).over(wv))
        .withColumn("cum2", col("p2") + sum(col("d2")).over(wv))
        .crossJoin(broadcast(tot))
        .select(col("n1"), col("n2"),
          // decimal FIRST, then the two long factors — a long×long dev²
          // would overflow before any cast could widen it
          expr("""CAST(d1 + d2 AS DECIMAL(38,0))
                 |  * (cum1 * n2 - cum2 * n1) * (cum1 * n2 - cum2 * n1)"""
            .stripMargin).as("term"))
        .groupBy(col("n1"), col("n2"))
        .agg(sum(col("term")).as("s"))
        .select(col("n1"), col("n2"),
          expr("""CAST(s * 1000000 div (CAST(n1 AS DECIMAL(38,0)) * n2
                 |  * (n1 + n2) * (n1 + n2)) AS BIGINT)""".stripMargin)
            .as("t_ppm"),
          expr("""s * 1000 > CAST(461 AS DECIMAL(38,0)) * n1 * n2
                 |  * (n1 + n2) * (n1 + n2)""".stripMargin).as("reject_95"))
    }),

    // EXACT MANN–WHITNEY U (Wilcoxon rank-sum — the nonparametric
    // location test next to q_agg_ks's distribution test, same F-vs-O
    // order cohorts over price cents): tie-corrected and ALL-INTEGER.
    // 2·ranksum folds the value census (d1·(2·below + c + 1) per
    // distinct value), the tie term Σ(c³−c) rides the same census, and
    // the z² ≥ 1.96² verdict is two integer ppm quotients multiplied —
    // no sqrt, no float anywhere, so both engines compute bit-identical
    // integers. The exclusive-prefix `below` runs as the SAME
    // distributed two-level prefix sum as q_agg_ks (16384-cent bucket
    // census → tiny bucket-prefix window → within-bucket windows
    // partitioned by bucket) — never a global single-task window.
    // 100 TB note: dev² and the quotient product run in
    // DECIMAL(38,0)/HUGEINT; both quotients themselves fit BIGINT
    "q_agg_mannwhitney" -> ((s: SparkSession, d: String) => {
      import org.apache.spark.sql.expressions.Window
      val o = scan(s, d, "orders").select(
        floor(col("o_totalprice") * 100).cast("long").as("v"),
        when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("w1"),
        when(col("o_orderstatus") =!= "F", 1L).otherwise(0L).as("w2"))
      val vals = o.groupBy(col("v"))
        .agg(sum(col("w1")).as("d1"), sum(col("w2")).as("d2"))
        .withColumn("b", expr("v div 16384"))
      val bt = vals.groupBy(col("b"))
        .agg((sum(col("d1")) + sum(col("d2"))).as("sc"))
      val wb = Window.orderBy(col("b"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val bpre = bt // bucket census: dimension-sized, window is fine
        .withColumn("p", coalesce(sum(col("sc")).over(wb), lit(0L)))
        .select(col("b"), col("p"))
      val wv = Window.partitionBy(col("b")).orderBy(col("v"))
      vals.join(broadcast(bpre), Seq("b"))
        .withColumn("below",
          col("p") + sum(col("d1") + col("d2")).over(wv) - col("d1") - col("d2"))
        .agg(sum(col("d1")).as("n1"), sum(col("d2")).as("n2"),
          sum(col("d1") * (lit(2) * col("below") + col("d1") + col("d2") + lit(1)))
            .as("r2"),
          sum((col("d1") + col("d2")) * (col("d1") + col("d2")) * (col("d1") + col("d2"))
            - col("d1") - col("d2")).as("tie_t"))
        .withColumn("n", col("n1") + col("n2"))
        .withColumn("u1_x2", col("r2") - col("n1") * (col("n1") + lit(1)))
        .withColumn("dev", col("u1_x2") - col("n1") * col("n2"))
        .withColumn("d1q", expr(
          "CAST(CAST(dev AS DECIMAL(38,0)) * dev * 1000000 div (n1 * n2) AS BIGINT)"))
        .withColumn("d2q", expr(
          """CAST(CAST(3 AS DECIMAL(38,0)) * n * (n - 1) * 1000000
            |  div (CAST(n AS DECIMAL(38,0)) * (n - 1) * (n + 1) - tie_t) AS BIGINT)"""
            .stripMargin))
        .select(col("n1"), col("n2"), col("u1_x2"), col("tie_t"),
          expr("CAST(CAST(d1q AS DECIMAL(38,0)) * d2q div 1000000 AS BIGINT)")
            .as("z2_ppm"),
          expr("CAST(d1q AS DECIMAL(38,0)) * d2q div 1000000 > 3841600")
            .as("reject_95"))
    }),

    // EXACT AUC-ROC (the binary-classifier ranking metric) — AUC is
    // the Mann–Whitney U statistic normalized (Hanley & McNeil 1982),
    // so the SAME all-integer doubled-rank census computes it exactly:
    // auc_ppm = (2·ranksum⁺ − n⁺(n⁺+1))·10⁶ div (2·n⁺·n⁻) with
    // tie-averaged ranks from the distributed two-level prefix sum —
    // no sort of the full relation, no float. The "model" is a
    // deterministic keyed-hash score with a label-dependent shift, so
    // both engines replay the predictions bit-identically and the
    // metric itself is the thing under test. DECIMAL(38,0) headroom on
    // the ppm products (the MW discipline).
    // Score domain is % 80000 (+15000 shift → 95k values), NOT the
    // % 800000 the point-metric eval queries use: the rank census is
    // min(rows, |domain|)-sized, and the tighter domain saturates it by
    // ~100k rows, so from sf0.1 up the census — and the window spine
    // over it — is CONSTANT-size while only the combinable first
    // groupBy sees the data (r13 sweep: the 800k domain left the census
    // row-bound through sf1, norm_ratio 11.7× and climbing). AUC over
    // tied scores stays exact via the tie-averaged doubled ranks
    "q_eval_auc" -> ((s: SparkSession, d: String) => {
      import org.apache.spark.sql.expressions.Window
      val o = scan(s, d, "orders").select(
        (graft.ops.Dedup.hex60(md5(concat(lit("sc:"),
          col("o_orderkey").cast("string")).cast("binary"))) % 80000L
          + when(col("o_orderstatus") === "F", 15000L).otherwise(0L)).as("v"),
        when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("w1"),
        when(col("o_orderstatus") =!= "F", 1L).otherwise(0L).as("w2"))
      // vals feeds BOTH the bucket spine and the final rank join — without
      // the persist the scan+hash+census chain runs twice (the r14 profile
      // of this family's wall)
      val vals = o.groupBy(col("v"))
        .agg(sum(col("w1")).as("d1"), sum(col("w2")).as("d2"))
        .withColumn("b", expr("v div 2048"))
        .scopedPersist()
      val bt = vals.groupBy(col("b"))
        .agg((sum(col("d1")) + sum(col("d2"))).as("sc"))
      val wb = Window.orderBy(col("b"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val bpre = bt.withColumn("p", coalesce(sum(col("sc")).over(wb), lit(0L)))
        .select(col("b"), col("p"))
      val wv = Window.partitionBy(col("b")).orderBy(col("v"))
      vals.join(broadcast(bpre), Seq("b"))
        .withColumn("below",
          col("p") + sum(col("d1") + col("d2")).over(wv) - col("d1") - col("d2"))
        .agg(sum(col("d1")).as("n1"), sum(col("d2")).as("n2"),
          sum(col("d1") * (lit(2) * col("below") + col("d1") + col("d2") + lit(1)))
            .as("r2"))
        .withColumn("u1_x2", col("r2") - col("n1") * (col("n1") + lit(1)))
        .select(col("n1").as("n_pos"), col("n2").as("n_neg"), col("u1_x2"),
          expr("CAST(CAST(u1_x2 AS DECIMAL(38,0)) * 1000000 div (2 * n1 * n2) AS BIGINT)")
            .as("auc_ppm"),
          expr("CAST(CAST(u1_x2 AS DECIMAL(38,0)) * 1000000 div (n1 * n2) - 1000000 AS BIGINT)")
            .as("gini_ppm"))
    }),

    // McNEMAR PAIRED-MODEL TEST — the "is model B actually better on
    // the SAME items" readout an eval harness runs before swapping
    // models (two models on the same eval set are PAIRED; comparing
    // their marginal accuracies wastes the pairing): two deterministic
    // keyed-hash classifiers over identical orders rows (B carries a
    // larger label shift, so it is genuinely stronger), the 2×2
    // concordance census, and the exact-integer McNemar statistic
    // (b−c)²·10⁶ div (b+c), with the continuity-corrected variant
    // using max(|b−c|−1, 0). One combinable aggregation.
    // BIGINT headroom: (b−c)²·10⁶ stays under 2⁶³ while |b−c| < 3.04e6
    // discordant items — ~3M rows of pure one-sided disagreement between
    // two models on the SAME items, far beyond any eval set (the
    // q_text_jsd bound-note convention); past it Spark wraps where DuckDB
    // errors, so the bound is documented here rather than guarded
    "q_eval_mcnemar" -> ((s: SparkSession, d: String) => {
      val scored = scan(s, d, "orders").select(
        when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("y"),
        (graft.ops.Dedup.hex60(md5(concat(lit("sc:"),
          col("o_orderkey").cast("string")).cast("binary"))) % 800000L
          + when(col("o_orderstatus") === "F", 150000L).otherwise(0L)).as("sa"),
        (graft.ops.Dedup.hex60(md5(concat(lit("sc2:"),
          col("o_orderkey").cast("string")).cast("binary"))) % 800000L
          + when(col("o_orderstatus") === "F", 250000L).otherwise(0L)).as("sb"))
      scored.select(
          (when(col("sa") >= 400000L, 1L).otherwise(0L) === col("y")).as("ca"),
          (when(col("sb") >= 400000L, 1L).otherwise(0L) === col("y")).as("cb"))
        .agg(count(lit(1)).as("n_items"),
          sum(when(col("ca") && col("cb"), 1L).otherwise(0L)).as("both_right"),
          sum(when(!col("ca") && !col("cb"), 1L).otherwise(0L)).as("both_wrong"),
          sum(when(col("ca") && !col("cb"), 1L).otherwise(0L)).as("a_only"),
          sum(when(!col("ca") && col("cb"), 1L).otherwise(0L)).as("b_only"))
        .select(col("n_items"), col("both_right"), col("both_wrong"),
          col("a_only"), col("b_only"),
          expr("(b_only - a_only) * (b_only - a_only) * 1000000" +
            " div greatest(a_only + b_only, 1)").as("mcnemar_x2_ppm"),
          expr("greatest(abs(b_only - a_only) - 1, 0)" +
            " * greatest(abs(b_only - a_only) - 1, 0) * 1000000" +
            " div greatest(a_only + b_only, 1)").as("mcnemar_cc_ppm"),
          expr("CASE WHEN b_only > a_only THEN 1 WHEN b_only < a_only THEN -1" +
            " ELSE 0 END").as("better_model"))
    }),

    // PAIRED BOOTSTRAP SIGNIFICANCE TEST (Koehn 2004) — the eval-harness
    // standard for "is model B actually better, or is the gap noise":
    // B = 100 bootstrap replicas of the SAME items, fraction of replicas
    // where B's accuracy beats A's, plus the exact 95% CI on the
    // accuracy gap. Poissonized resampling (the classic one-pass
    // spelling: per (item, replica) an independent Poisson(1) weight
    // replaces multinomial draws) keeps it a single combinable
    // aggregation into B groups — no per-replica pass, no shuffle of the
    // items. The "randomness" is the keyed 60-bit hash mapped through
    // the fixed cumulative-Poisson(1) ppm thresholds, so both engines
    // replay every weight identically. Replica stats and the gap are
    // exact integers (sign-split division, the κ convention); the CI
    // bounds are exact selections (ranks ceil(2.5)=3 and ceil(97.5)=98
    // of the 100 replica gaps) over the B-row census — at 100 TB the
    // only data-sized work is the one partial-aggregated pass, and the
    // census is B rows regardless of corpus size
    "q_eval_bootstrap" -> ((s: SparkSession, d: String) => {
      import org.apache.spark.sql.expressions.Window
      val scored = scan(s, d, "orders").select(col("o_orderkey"),
        when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("y"),
        (graft.ops.Dedup.hex60(md5(concat(lit("sc:"),
          col("o_orderkey").cast("string")).cast("binary"))) % 800000L
          + when(col("o_orderstatus") === "F", 150000L).otherwise(0L)).as("sa"),
        (graft.ops.Dedup.hex60(md5(concat(lit("sc2:"),
          col("o_orderkey").cast("string")).cast("binary"))) % 800000L
          + when(col("o_orderstatus") === "F", 250000L).otherwise(0L)).as("sb"))
        .select(col("o_orderkey"),
          when((when(col("sa") >= 400000L, 1L).otherwise(0L)) === col("y"), 1L)
            .otherwise(0L).as("ca"),
          when((when(col("sb") >= 400000L, 1L).otherwise(0L)) === col("y"), 1L)
            .otherwise(0L).as("cb"))
      val reps = scored.select(col("o_orderkey"), col("ca"), col("cb"),
          explode(sequence(lit(0), lit(99))).as("r"))
        .withColumn("u", graft.ops.Dedup.hex60(md5(concat(lit("bs:"),
          col("o_orderkey").cast("string"), lit(":"), col("r").cast("string"))
          .cast("binary"))) % 1000000L)
        .withColumn("w", expr(
          """CASE WHEN u < 367879 THEN 0 WHEN u < 735758 THEN 1
            | WHEN u < 919698 THEN 2 WHEN u < 981011 THEN 3
            | WHEN u < 996340 THEN 4 WHEN u < 999405 THEN 5
            | WHEN u < 999916 THEN 6 ELSE 7 END"""
            .stripMargin.replace("\n", " ")))
      val byRep = reps.groupBy(col("r"))
        .agg(sum(col("w") * col("ca")).as("na"),
          sum(col("w") * col("cb")).as("nb"), sum(col("w")).as("nw"))
        .withColumn("d_ppm", expr(
          """CASE WHEN nb >= na THEN (nb - na) * 1000000 div GREATEST(nw, 1)
            | ELSE -((na - nb) * 1000000 div GREATEST(nw, 1)) END"""
            .stripMargin.replace("\n", " ")))
      val ranked = byRep.withColumn("rk",
        row_number().over(Window.orderBy(col("d_ppm"), col("r"))))
      ranked.agg(count(lit(1)).as("n_replicas"),
          sum(when(col("d_ppm") > 0, 1L).otherwise(0L)).as("n_b_better"),
          expr("CASE WHEN SUM(d_ppm) >= 0 THEN SUM(d_ppm) div COUNT(1)" +
            " ELSE -((-SUM(d_ppm)) div COUNT(1)) END").as("mean_diff_ppm"),
          max(when(col("rk") === 3, col("d_ppm"))).as("ci_lo_ppm"),
          max(when(col("rk") === 98, col("d_ppm"))).as("ci_hi_ppm"))
        .select(col("n_replicas"), col("n_b_better"),
          expr("n_b_better * 1000000 div n_replicas").as("p_b_better_ppm"),
          col("mean_diff_ppm"), col("ci_lo_ppm"), col("ci_hi_ppm"))
    }),

    // EXPECTED-CALIBRATION-ERROR READOUT (Guo et al. 2017, the binned
    // reliability diagram) over the same deterministic predictions:
    // per decile-of-score bin, accuracy and mean confidence as exact
    // floor-ppm integers, the |gap| and its n-weighted mass (Σ weighted
    // div N IS the ECE). One map-side-combinable census — at 100 TB the
    // bins relation is 10 rows
    "q_eval_ece" -> ((s: SparkSession, d: String) => {
      scan(s, d, "orders").select(
          (graft.ops.Dedup.hex60(md5(concat(lit("sc:"),
            col("o_orderkey").cast("string")).cast("binary"))) % 800000L
            + when(col("o_orderstatus") === "F", 150000L).otherwise(0L)).as("score"),
          when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("y"))
        .withColumn("bin", expr("score div 100000"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n"), sum(col("y")).as("n_pos"),
          sum(col("score")).as("sum_score"))
        .select(col("bin"), col("n"), col("n_pos"),
          expr("n_pos * 1000000 div n").as("acc_ppm"),
          expr("sum_score div n").as("conf_ppm"),
          expr("abs(n_pos * 1000000 div n - sum_score div n)").as("gap_ppm"),
          expr("n * abs(n_pos * 1000000 div n - sum_score div n)").as("weighted_gap"))
        .orderBy(col("bin"))
    }),

    // BRIER SCORE + LOG-LOSS over the same deterministic predictions —
    // the two proper scoring rules beside AUC's ranking view. Brier is
    // a pure integer sum of squared ppm gaps (DECIMAL(38,0) headroom:
    // (10⁶)²·n rows). Log-loss reports in CENTIBITS per example:
    // ll_cb(y=1) = cb(10⁶) − cb(score) and ll_cb(y=0) = cb(10⁶) −
    // cb(10⁶ − score), each cb = round(100·log2(count)) from the shared
    // staged generator run once per DISTINCT score value — the score
    // domain is bounded (< 10⁶) independent of row count, so the log
    // table is constant-size at any SF. Scores of 0 would be -inf:
    // the +1 clamp (cb over score+1) is the standard epsilon, applied
    // identically in the oracle
    "q_eval_scoring" -> ((s: SparkSession, d: String) => {
      import graft.ops.UlmTokenizer
      val p = scan(s, d, "orders").select(
          (graft.ops.Dedup.hex60(md5(concat(lit("sc:"),
            col("o_orderkey").cast("string")).cast("binary"))) % 800000L
            + when(col("o_orderstatus") === "F", 150000L).otherwise(0L)).as("score"),
          when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("y"))
        .withColumn("p1", col("score") + 1L) // clamp: log arg >= 1
        .withColumn("p0", lit(1000001L) - col("score"))
        .scopedPersist()
      // (r18 audit: the cbTableLocal LocalRelation move was tried and
      // reverted HERE — unlike the other cb sites this distinct set is
      // score-valued, ~2 per order row at small SF (~300k values), so
      // collect + local-relation broadcast cost more than the staged
      // chain saves; the distributed spelling stays)
      val vals = p.select(col("p1").as("v")).union(p.select(col("p0"))).distinct()
      var cbt = vals
      UlmTokenizer.costStages("v", "1", UlmTokenizer.Spark).foreach {
        case (nm, e) => cbt = cbt.withColumn(nm, expr(e))
      }
      val cb = cbt.select(col("v"), col("cost_cb").cast("long").as("cb"))
        .scopedPersist()
      // cb(10^6) = round(100·log2(10^6)) = 1993 — the fixed numerator
      val scored = p
        .join(broadcast(cb.select(col("v").as("p1"), col("cb").as("cb1"))), Seq("p1"))
        .join(broadcast(cb.select(col("v").as("p0"), col("cb").as("cb0"))), Seq("p0"))
        .select(col("score"), col("y"),
          when(col("y") === 1L, lit(1993L) - col("cb1"))
            .otherwise(lit(1993L) - col("cb0")).as("ll_cb"),
          (col("score") - col("y") * 1000000L).as("gap"))
      scored.agg(count(lit(1)).as("n"),
          expr("CAST(SUM(CAST(gap AS DECIMAL(38,0)) * gap) AS DECIMAL(38,0))").as("brier_num"),
          sum(col("ll_cb")).as("ll_cb_sum"))
        .select(col("n"),
          expr("CAST(brier_num div n AS BIGINT)").as("brier_pp12"),
          col("ll_cb_sum"),
          expr("ll_cb_sum * 1000 div n").as("ll_mcb_mean"))
    }),

    // 1-D WASSERSTEIN / EARTH-MOVER DISTANCE (the drift measure KS's
    // max understates: EMD integrates |F₁−F₂| over the VALUE axis, so
    // a small-but-everywhere shift scores, not just the worst point):
    // EMD = Σ_v |cum₁(v)·n₂ − cum₂(v)·n₁| · gap(v) / (n₁·n₂), exact —
    // cumulative counts from the SAME two-level prefix spine as
    // q_agg_ks, the value gap from a within-bucket lead with the next
    // bucket's first value as the boundary fallback (the bucket dim is
    // tiny, broadcast), and the weighted sum in DECIMAL(38,0) (terms
    // reach ~10¹⁸ at sf1). Reported as floor-ppm of a cent
    "q_agg_emd" -> ((s: SparkSession, d: String) => {
      import org.apache.spark.sql.expressions.Window
      val o = scan(s, d, "orders").select(
        floor(col("o_totalprice") * 100).cast("long").as("v"),
        when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("w1"),
        when(col("o_orderstatus") =!= "F", 1L).otherwise(0L).as("w2"))
      val vals = o.groupBy(col("v"))
        .agg(sum(col("w1")).as("d1"), sum(col("w2")).as("d2"))
        .withColumn("b", expr("v div 16384"))
      val bt = vals.groupBy(col("b"))
        .agg(sum(col("d1")).as("s1"), sum(col("d2")).as("s2"),
          min(col("v")).as("first_v"))
      val wb = Window.orderBy(col("b"))
      val bpre = bt
        .withColumn("p1", coalesce(sum(col("s1")).over(
          wb.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .withColumn("p2", coalesce(sum(col("s2")).over(
          wb.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .withColumn("next_first", lead(col("first_v"), 1).over(Window.orderBy(col("b"))))
        .select(col("b"), col("p1"), col("p2"), col("next_first"))
      val wv = Window.partitionBy(col("b")).orderBy(col("v"))
      val tot = vals.agg(sum(col("d1")).as("n1"), sum(col("d2")).as("n2"))
      vals.join(broadcast(bpre), Seq("b"))
        .withColumn("cum1", col("p1") + sum(col("d1")).over(
          wv.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("cum2", col("p2") + sum(col("d2")).over(
          wv.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("lead_v", coalesce(lead(col("v"), 1).over(wv), col("next_first")))
        .filter(col("lead_v").isNotNull) // the global max value carries no gap
        .crossJoin(broadcast(tot))
        .withColumn("term", expr(
          """abs(CAST(cum1 AS DECIMAL(38,0)) * n2
            |  - CAST(cum2 AS DECIMAL(38,0)) * n1) * (lead_v - v)""".stripMargin))
        .agg(max(col("n1")).as("n1"), max(col("n2")).as("n2"),
          sum(col("term")).as("emd_num"))
        .select(col("n1"), col("n2"),
          expr("CAST(emd_num * 1000000 div (CAST(n1 AS DECIMAL(38,0)) * n2) AS BIGINT)")
            .as("emd_cents_ppm"))
    }),

    // DECISION-STUMP SPLIT SCAN (the CART/GBDT inner loop, Breiman
    // 1984) — for every candidate threshold over a numeric feature,
    // the EXACT information gain in centibit-scaled integers:
    // 100·n·H(n, c₁) = n·cb(n) − c₁·cb(c₁) − c₀·cb(c₀) (each cb from
    // the shared staged log; 0·cb(0) ≡ 0 via the left-join guard), and
    // gain(t) = parent − left − right over prefix sums of the
    // distinct-value census. The census and the log table are bounded
    // by the FEATURE DOMAIN (acctbal has ~11k floor values at any SF),
    // so the scan costs one corpus pass + domain-sized work — the shape
    // that lets a 100 TB feature store scan splits per feature. Top-5
    // thresholds by gain, deterministic tie-break
    "q_feature_split" -> ((s: SparkSession, d: String) => {
      import org.apache.spark.sql.expressions.Window
      import graft.ops.UlmTokenizer
      val c = scan(s, d, "customer").select(
        floor(col("c_acctbal")).cast("long").as("v"),
        when(col("c_mktsegment") === "BUILDING", 1L).otherwise(0L).as("y"))
      val census = c.groupBy(col("v"))
        .agg(count(lit(1)).as("n"), sum(col("y")).as("c1"))
      val tot = census.agg(sum(col("n")).as("nn"), sum(col("c1")).as("cc1"))
      val wv = Window.orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val cand = census
        .withColumn("nl", sum(col("n")).over(wv))
        .withColumn("c1l", sum(col("c1")).over(wv))
        .crossJoin(broadcast(tot))
        .filter(col("nl") < col("nn")) // right side nonempty
        .withColumn("c0l", col("nl") - col("c1l"))
        .withColumn("nr", col("nn") - col("nl"))
        .withColumn("c1r", col("cc1") - col("c1l"))
        .withColumn("c0r", col("nr") - col("c1r"))
        .scopedPersist()
      val vals = Seq("nl", "c1l", "c0l", "nr", "c1r", "c0r")
        .map(cn => cand.filter(col(cn) >= 1).select(col(cn).as("v2")))
        .reduce(_ union _)
        .union(tot.select(col("nn").as("v2")))
        .union(tot.filter(col("cc1") >= 1).select(col("cc1")))
        .union(tot.filter(col("nn") - col("cc1") >= 1).select(col("nn") - col("cc1")))
        .distinct().withColumnRenamed("v2", "v")
      // driver-side cb over the (already >= 1 filtered) count set
      val cb = UlmTokenizer.cbTableLocal(vals, "q_feature_split cb values")
      def cbOf(cn: String, as: String) = broadcast(
        cb.select(col("v").as(cn), col("cb").as(as)))
      // parent 100·n·H as a 1-row relation through the same cb table
      val parent = tot
        .join(cbOf("nn", "cb_nn"), Seq("nn"))
        .join(cbOf("cc1", "cb_c1"), Seq("cc1"), "left_outer")
        .withColumn("c0", col("nn") - col("cc1"))
        .join(cbOf("c0", "cb_c0"), Seq("c0"), "left_outer")
        .select((col("nn") * col("cb_nn")
          - col("cc1") * coalesce(col("cb_c1"), lit(0L))
          - col("c0") * coalesce(col("cb_c0"), lit(0L))).as("parent_ent"))
      cand
        .join(cbOf("nl", "cb_nl"), Seq("nl"))
        .join(cbOf("c1l", "cb_c1l"), Seq("c1l"), "left_outer")
        .join(cbOf("c0l", "cb_c0l"), Seq("c0l"), "left_outer")
        .join(cbOf("nr", "cb_nr"), Seq("nr"))
        .join(cbOf("c1r", "cb_c1r"), Seq("c1r"), "left_outer")
        .join(cbOf("c0r", "cb_c0r"), Seq("c0r"), "left_outer")
        .crossJoin(broadcast(parent))
        .withColumn("gain_scaled", col("parent_ent")
          - (col("nl") * col("cb_nl")
            - col("c1l") * coalesce(col("cb_c1l"), lit(0L))
            - col("c0l") * coalesce(col("cb_c0l"), lit(0L)))
          - (col("nr") * col("cb_nr")
            - col("c1r") * coalesce(col("cb_c1r"), lit(0L))
            - col("c0r") * coalesce(col("cb_c0r"), lit(0L))))
        .select(col("v").as("threshold"), col("nl").as("n_left"),
          col("c1l").as("c1_left"), col("nr").as("n_right"),
          col("c1r").as("c1_right"), col("gain_scaled"))
        .orderBy(col("gain_scaled").desc, col("threshold"))
        .limit(5)
    }),

    // CONFUSION-MATRIX SCORING at the operating threshold (500k ppm):
    // tp/fp/fn/tn plus the derived metrics, every one an EXACT integer
    // — precision/recall/F1 as floor-ppm, Matthews correlation as
    // sign + squared ppm (mcc² = (tp·tn − fp·fn)²·10⁶ over the four
    // marginals, DECIMAL(38,0) headroom so no sqrt and no float), and
    // Cohen's kappa cross-multiplied to a single quotient with the
    // numerator SIGN-DECOMPOSED (it can go negative; floor-div and
    // trunc-div disagree there — the Kruskal lesson). One combinable
    // 4-counter aggregation over the deterministic predictions
    "q_eval_confusion" -> ((s: SparkSession, d: String) => {
      scan(s, d, "orders").select(
          (graft.ops.Dedup.hex60(md5(concat(lit("sc:"),
            col("o_orderkey").cast("string")).cast("binary"))) % 800000L
            + when(col("o_orderstatus") === "F", 150000L).otherwise(0L)).as("score"),
          when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("y"))
        .withColumn("pred", when(col("score") >= 500000L, 1L).otherwise(0L))
        .agg(sum(when(col("y") === 1L && col("pred") === 1L, 1L).otherwise(0L)).as("tp"),
          sum(when(col("y") === 0L && col("pred") === 1L, 1L).otherwise(0L)).as("fp"),
          sum(when(col("y") === 1L && col("pred") === 0L, 1L).otherwise(0L)).as("fn"),
          sum(when(col("y") === 0L && col("pred") === 0L, 1L).otherwise(0L)).as("tn"))
        .withColumn("n", expr("tp + fp + fn + tn"))
        .withColumn("mnum", expr(
          "CAST(tp AS DECIMAL(38,0)) * tn - CAST(fp AS DECIMAL(38,0)) * fn"))
        .withColumn("knum", expr(
          """CAST(n AS DECIMAL(38,0)) * (tp + tn)
            |  - (CAST(tp + fp AS DECIMAL(38,0)) * (tp + fn)
            |     + CAST(fn + tn AS DECIMAL(38,0)) * (fp + tn))""".stripMargin))
        .withColumn("kden", expr(
          """CAST(n AS DECIMAL(38,0)) * n
            |  - (CAST(tp + fp AS DECIMAL(38,0)) * (tp + fn)
            |     + CAST(fn + tn AS DECIMAL(38,0)) * (fp + tn))""".stripMargin))
        .select(col("tp"), col("fp"), col("fn"), col("tn"),
          expr("tp * 1000000 div (tp + fp)").as("precision_ppm"),
          expr("tp * 1000000 div (tp + fn)").as("recall_ppm"),
          expr("2 * tp * 1000000 div (2 * tp + fp + fn)").as("f1_ppm"),
          expr("CAST(sign(mnum) AS BIGINT)").as("mcc_sign"),
          expr("""CAST(mnum * mnum * 1000000
                 |  div (CAST(tp + fp AS DECIMAL(38,0)) * (tp + fn)
                 |       * (tn + fp) * (tn + fn)) AS BIGINT)""".stripMargin)
            .as("mcc_sq_ppm"),
          expr("CAST(CAST(sign(knum) AS BIGINT) * (abs(knum) * 1000000 div kden) AS BIGINT)")
            .as("kappa_ppm"))
    }),

    // PR-AUC / AVERAGE PRECISION (step-wise, descending distinct
    // thresholds — the convention documented HERE and mirrored
    // definitionally in the oracle): AP = Σ_v Δtp(v)·P(v) / n⁺ with
    // P(v) = tp(v)·10⁶ div (tp(v) + fp(v)) per distinct score v. The
    // descending cumulative counts come from the SAME ascending
    // two-level prefix spine (tp(v) = n⁺ − pos_below(v)), so no global
    // descending sort is ever taken — the census relation is bounded
    // by the score domain, not the row count
    "q_eval_prauc" -> ((s: SparkSession, d: String) => {
      import org.apache.spark.sql.expressions.Window
      // same 95k-value bounded score domain as q_eval_auc (see there):
      // the census saturates at |domain| rows, so the window spine is
      // constant-size at any SF past ~100k rows
      val o = scan(s, d, "orders").select(
        (graft.ops.Dedup.hex60(md5(concat(lit("sc:"),
          col("o_orderkey").cast("string")).cast("binary"))) % 80000L
          + when(col("o_orderstatus") === "F", 15000L).otherwise(0L)).as("v"),
        when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("w1"),
        when(col("o_orderstatus") =!= "F", 1L).otherwise(0L).as("w2"))
      val vals = o.groupBy(col("v"))
        .agg(sum(col("w1")).as("d1"), sum(col("w2")).as("d2"))
        .withColumn("b", expr("v div 2048"))
        .scopedPersist() // three consumers: spine, totals, rank join
      val bt = vals.groupBy(col("b"))
        .agg(sum(col("d1")).as("s1"), sum(col("d2")).as("s2"))
      val wb = Window.orderBy(col("b"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val bpre = bt
        .withColumn("p1", coalesce(sum(col("s1")).over(wb), lit(0L)))
        .withColumn("p2", coalesce(sum(col("s2")).over(wb), lit(0L)))
        .select(col("b"), col("p1"), col("p2"))
      val wv = Window.partitionBy(col("b")).orderBy(col("v"))
      val tot = vals.agg(sum(col("d1")).as("n1"), sum(col("d2")).as("n2"))
      vals.join(broadcast(bpre), Seq("b"))
        .withColumn("below1", col("p1") + sum(col("d1")).over(wv) - col("d1"))
        .withColumn("below2", col("p2") + sum(col("d2")).over(wv) - col("d2"))
        .crossJoin(broadcast(tot))
        .withColumn("tp", col("n1") - col("below1"))
        .withColumn("fp", col("n2") - col("below2"))
        .withColumn("term", col("d1") * expr("tp * 1000000 div (tp + fp)"))
        .agg(sum(col("term")).as("num"), max(col("n1")).as("n_pos"))
        .select(col("n_pos"), col("num").as("ap_num"),
          expr("num div n_pos").as("ap_ppm"))
    }),

    // FEATURE LIFT screening (the campaign-targeting / feature-triage
    // readout): per acctbal band, the purchase-conversion rate and its
    // LIFT over the global rate — all cross-multiplied integer ppm
    // (lift = k_bin·n_tot·1e6 div (n_bin·k_tot)), so no float rate ever
    // decides a ranking. One broadcast semi-join flags converters, one
    // combinable band census, one 1-row global broadcast back
    "q_feature_lift" -> ((s: SparkSession, d: String) => {
      val buyers = scan(s, d, "events")
        .filter(col("event_type") === "purchase")
        .select(col("user_id").as("__b")).distinct()
      val flagged = scan(s, d, "customer")
        .join(broadcast(buyers), col("c_custkey") === col("__b"), "left_outer")
        .select(floor(col("c_acctbal") / 1000).cast("long").as("band"),
          when(col("__b").isNotNull, 1L).otherwise(0L).as("cv"))
      val bands = flagged.groupBy(col("band"))
        .agg(count(lit(1)).as("n"), sum(col("cv")).as("k"))
      val tot = bands.agg(sum(col("n")).as("n_tot"), sum(col("k")).as("k_tot"))
      bands.crossJoin(broadcast(tot))
        .select(col("band"), col("n").cast("long").as("n"),
          col("k").cast("long").as("n_converted"),
          expr("k * 1000000 div n").as("rate_ppm"),
          // k·n_tot·1e6 passes 2^63 near sf100 (k ~ 3e7, n_tot ~ 1.5e8)
          // — DECIMAL(38,0)-widened like the KS/Wilcoxon ppm numerators
          expr("""CAST(CAST(k AS DECIMAL(38,0)) * n_tot * 1000000
                 |  div (CAST(n AS DECIMAL(38,0)) * k_tot) AS BIGINT)"""
            .stripMargin).as("lift_ppm"))
        .orderBy(col("band"))
    }),

    // EXACT GROUPED PERCENTILES AT HIGH CARDINALITY (p50/p95/p99 of
    // price cents per returnflag): the census-window median trick
    // stops scaling once the value domain is row-sized, so this runs
    // Selection.kthSmallest's two-phase distributed selection — bucket
    // histogram of the high bits, cumulative window over the
    // groups×4096 census, then a rank of ONLY the boundary bucket's
    // rows (~n/4096). No per-group sort anywhere; ranks are integer
    // formulas ((n+1) div 2, ceil-by-int-div for p95/p99) spelled
    // identically in the oracle's row_number form
    "q_agg_pct_exact" -> ((s: SparkSession, d: String) => {
      import graft.ops.Selection
      val li = scan(s, d, "lineitem").select(col("l_returnflag"),
        floor(col("l_extendedprice") * 100).cast("long").as("cents"))
      Selection.kthSmallest(li, "l_returnflag", "cents", Seq(
          "p50" -> ((n: org.apache.spark.sql.Column) => Selection.idiv(n + 1, 2)),
          "p95" -> ((n: org.apache.spark.sql.Column) => Selection.idiv(n * 95 + 99, 100)),
          "p99" -> ((n: org.apache.spark.sql.Column) => Selection.idiv(n * 99 + 99, 100))))
        .groupBy(col("__g").as("l_returnflag"))
        .agg(max(when(col("__t") === "p50", col("__v"))).as("p50_cents"),
          max(when(col("__t") === "p95", col("__v"))).as("p95_cents"),
          max(when(col("__t") === "p99", col("__v"))).as("p99_cents"))
        .orderBy(col("l_returnflag"))
    }),

    // HIGH-CARDINALITY MAD (median absolute deviation) — the robust
    // dispersion statistic at price-cents cardinality, as TWO chained
    // two-phase selections: the grouped median first, then the median
    // of |x − median| over the derived deviations (same machinery,
    // second pass). Nothing sorts the fact table in either pass;
    // everything is exact integers
    "q_agg_mad_hc" -> ((s: SparkSession, d: String) => {
      import graft.ops.Selection
      def med = (n: org.apache.spark.sql.Column) => Selection.idiv(n + 1, 2)
      val li = scan(s, d, "lineitem").select(col("l_returnflag"),
        floor(col("l_extendedprice") * 100).cast("long").as("cents"))
      val m = Selection.kthSmallest(li, "l_returnflag", "cents",
          Seq("p50" -> med))
        .select(col("__g"), col("__v").as("med_cents"))
      val dev = li.join(broadcast(m), col("l_returnflag") === col("__g"))
        .select(col("l_returnflag"), abs(col("cents") - col("med_cents")).as("dev"))
      Selection.kthSmallest(dev, "l_returnflag", "dev", Seq("p50" -> med))
        .select(col("__g").as("l_returnflag"), col("__v").as("mad_cents"))
        .join(m.select(col("__g").as("l_returnflag"), col("med_cents")),
          Seq("l_returnflag"))
        .select(col("l_returnflag"), col("med_cents"), col("mad_cents"))
        .orderBy(col("l_returnflag"))
    }),

    // HIGH-CARDINALITY WINSORIZED MEAN — q_agg_robust's clamp at
    // nearest-rank p05/p95, but over price cents (millions of distinct
    // values), where the census-window trick is a per-group sort: the
    // thresholds come from the same two-phase selection as
    // q_agg_pct_exact, then ONE clamp-sum pass. Composition story:
    // Selection.kthSmallest is the reusable order-statistic primitive,
    // robust aggregation is a broadcast-join + codegen'd clamp away
    "q_agg_winsor_hc" -> ((s: SparkSession, d: String) => {
      import graft.ops.Selection
      val li = scan(s, d, "lineitem").select(col("l_returnflag"),
        floor(col("l_extendedprice") * 100).cast("long").as("cents"))
      val th = Selection.kthSmallest(li, "l_returnflag", "cents", Seq(
          "p05" -> ((n: org.apache.spark.sql.Column) => Selection.idiv(n * 5 + 99, 100)),
          "p95" -> ((n: org.apache.spark.sql.Column) => Selection.idiv(n * 95 + 99, 100))))
        .groupBy(col("__g"))
        .agg(max(when(col("__t") === "p05", col("__v"))).as("lo"),
          max(when(col("__t") === "p95", col("__v"))).as("hi"))
      li.join(broadcast(th), col("l_returnflag") === col("__g"))
        .withColumn("w", greatest(col("lo"), least(col("hi"), col("cents"))))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          max(col("lo")).as("p05_cents"), max(col("hi")).as("p95_cents"),
          sum(col("w")).as("wsum_cents"))
        .withColumn("wmean_cents", expr("wsum_cents div n"))
        .orderBy(col("l_returnflag"))
    }),

    // LEAVE-ONE-OUT TARGET ENCODING audit (the feature-store leakage
    // guard): encode o_orderpriority by the mean target over the OTHER
    // rows of its group — enc_i = (S_g − x_i)/(n_g − 1) — exact in
    // integer cents with the division deferred to the final floor.
    // Per group: n, floor-cent min/max of the encoding, and the count
    // of rows whose LOO encoding exceeds the GLOBAL mean, decided by a
    // decimal(38) cross-multiply (no doubles, no overflow at any SF:
    // the int64 headroom runs out near sf1 — S_g·n ≈ 9e18).
    // One broadcast of the 5-row group table + the 1-row global
    // aggregate; the fact table is scanned twice, shuffled never
    "q_feature_loo" -> ((s: SparkSession, d: String) => {
      val o = scan(s, d, "orders").select(col("o_orderpriority").as("pri"),
        floor(col("o_totalprice") * 100).cast("long").as("cents"))
      val g = o.groupBy(col("pri"))
        .agg(sum(col("cents")).as("sg"), count(lit(1)).as("ng"))
      val glob = o.agg(sum(col("cents")).as("stot"), count(lit(1)).as("ntot"))
      o.join(broadcast(g), "pri").crossJoin(broadcast(glob))
        .withColumn("num", col("sg") - col("cents"))
        .withColumn("den", col("ng") - 1)
        .groupBy(col("pri"))
        .agg(count(lit(1)).as("n"),
          min(expr("CASE WHEN den = 0 THEN NULL ELSE num div den END"))
            .as("enc_min_cents"),
          max(expr("CASE WHEN den = 0 THEN NULL ELSE num div den END"))
            .as("enc_max_cents"),
          sum(when(col("num").cast("decimal(38,0)") * col("ntot").cast("decimal(38,0)")
              > col("stot").cast("decimal(38,0)") * col("den").cast("decimal(38,0)"),
            1L).otherwise(0L)).as("n_above_global"))
        .orderBy(col("pri"))
    }),

    // ROLLUP: hierarchical subtotals; null grouping rows ordered NULLS
    // FIRST on both sides (Spark's asc default; DuckDB needs it spelled)
    "q_agg_rollup" -> ((s: SparkSession, d: String) => {
      scan(s, d, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    }),

    // CUBE: all grouping-set combinations
    "q_agg_cube" -> ((s: SparkSession, d: String) => {
      scan(s, d, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)
    }),

    // min/max/count stats (exact for doubles regardless of order)
    "q_agg_stats" -> ((s: SparkSession, d: String) => {
      scan(s, d, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(
          min(col("o_totalprice")).as("min_price"),
          max(col("o_totalprice")).as("max_price"),
          min(col("o_orderdate")).as("first_date"),
          max(col("o_orderdate")).as("last_date"),
          count(lit(1)).as("n")
        )
        .orderBy(col("o_orderstatus"))
    }),

    // arg-max/arg-min: value of one column at another's extremum (the
    // ordering key is unique, so the pick is deterministic)
    "q_agg_argmax" -> ((s: SparkSession, d: String) => {
      scan(s, d, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(
          max_by(col("o_totalprice"), col("o_orderkey")).as("latest_price"),
          min_by(col("o_totalprice"), col("o_orderkey")).as("first_price"),
          max(col("o_orderkey")).as("max_key"))
        .orderBy(col("o_orderstatus"))
    }),

    // covariance/correlation assembled from exact decimal sums — the
    // built-in covar_pop/corr accumulate doubles (partitioning-dependent
    // low bits); this formulation is deterministic at any scale
    "q_agg_covar" -> ((s: SparkSession, d: String) => {
      scan(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).cast("double").as("n"),
          dsum(col("l_quantity")).as("sx"),
          dsum(col("l_extendedprice")).as("sy"),
          dsum(col("l_quantity") * col("l_extendedprice")).as("sxy"),
          dsum(col("l_quantity") * col("l_quantity")).as("sxx"),
          // price² ≈ 1e9: needs the floor-scaled path (see ExactAgg)
          dsumScaled(col("l_extendedprice") * col("l_extendedprice")).as("syy"))
        .select(
          col("l_returnflag"),
          ((col("sxy") - col("sx") * col("sy") / col("n")) / col("n")).as("covar_pop"),
          ((col("sxy") - col("sx") * col("sy") / col("n")) /
            (sqrt(col("sxx") - col("sx") * col("sx") / col("n")) *
              sqrt(col("syy") - col("sy") * col("sy") / col("n")))).as("corr"))
        .orderBy(col("l_returnflag"))
    }),

    // robust dispersion: MAD = median(|x − median(x)|) — the outlier
    // threshold that survives heavy tails (stddev doesn't). Two exact
    // interpolated-percentile passes; the tiny per-group median table
    // broadcasts back for the deviation pass
    "q_agg_mad" -> ((s: SparkSession, d: String) => {
      val li = scan(s, d, "lineitem")
      val med = li.groupBy(col("l_returnflag"))
        .agg(percentile(col("l_quantity"), lit(0.5)).as("med"))
      li.join(broadcast(med), Seq("l_returnflag"))
        .groupBy(col("l_returnflag"), col("med"))
        .agg(percentile(abs(col("l_quantity") - col("med")), lit(0.5)).as("mad"))
        .select(col("l_returnflag"), col("med"), col("mad"))
        .orderBy(col("l_returnflag"))
    }),

    // deterministic stddev/variance twin (built-ins accumulate doubles)
    "q_agg_stddev" -> ((s: SparkSession, d: String) => {
      scan(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).cast("double").as("n"),
          dsum(col("l_quantity")).as("sx"),
          dsum(col("l_quantity") * col("l_quantity")).as("sxx"))
        .select(
          col("l_returnflag"),
          (col("sxx") / col("n") - (col("sx") / col("n")) * (col("sx") / col("n"))).as("var_pop"),
          sqrt(col("sxx") / col("n") - (col("sx") / col("n")) * (col("sx") / col("n"))).as("stddev_pop"))
        .orderBy(col("l_returnflag"))
    }),

    // date_trunc time-bucket aggregation (the batch shape of streaming windows)
    "q_agg_bydate" -> ((s: SparkSession, d: String) => {
      scan(s, d, "events")
        .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .orderBy(col("day"), col("event_type"))
    }),

    // higher central moments (variance/skewness/kurtosis) as a numerically
    // careful TWO-PASS plan: exact-decimal mean first, then floor-scaled
    // central sums against the broadcast mean. Spark's built-in skewness/
    // kurtosis use a streaming one-pass update whose float accumulation is
    // engine- and partition-order-specific — unusable under a bit-exact
    // oracle; this shape is deterministic anywhere. No pow(): x^1.5 via
    // sqrt(v)*v (libm pow is platform-dependent)
    "q_agg_moments" -> ((s: SparkSession, d: String) => {
      val l = scan(s, d, "lineitem")
      val means = l.groupBy(col("l_returnflag"))
        .agg(dsum(col("l_quantity")).as("sx"), count(lit(1)).as("n"))
        .select(col("l_returnflag"), (col("sx") / col("n")).as("mean"), col("n"))
      val dev = col("l_quantity") - col("mean")
      val cm = l.join(broadcast(means), Seq("l_returnflag"))
        .groupBy(col("l_returnflag"))
        .agg(
          dsumScaled(dev * dev).as("m2s"),
          dsumScaled(dev * dev * dev).as("m3s"),
          dsumScaled(dev * dev * dev * dev).as("m4s"))
      cm.join(means, Seq("l_returnflag"))
        .select(
          col("l_returnflag"), col("mean"), col("n"),
          (col("m2s") / col("n")).as("variance"),
          ((col("m3s") / col("n")) /
            (sqrt(col("m2s") / col("n")) * (col("m2s") / col("n")))).as("skewness"),
          ((col("m4s") / col("n")) /
            ((col("m2s") / col("n")) * (col("m2s") / col("n")))).as("kurtosis"))
        .orderBy(col("l_returnflag"))
    }),

    // contingency table (df.stat.crosstab — the DataFrame stat surface)
    "q_crosstab" -> ((s: SparkSession, d: String) => {
      scan(s, d, "lineitem").stat.crosstab("l_returnflag", "l_linestatus")
        .orderBy(col("l_returnflag_l_linestatus"))
    }),

    // skew-safe exact distinct count: two-phase (distinct pairs first,
    // then count per key). COUNT(DISTINCT) over a skewed key funnels one
    // key's whole value stream through one reducer; phase 1 here shuffles
    // on (key, value) — the hot key's values spread across ALL reducers —
    // and phase 2 counts tiny pre-deduped rows. Same exact answer
    "q_agg_2phase_distinct" -> ((s: SparkSession, d: String) => {
      scan(s, d, "lineitem")
        .select(col("l_returnflag"), col("l_partkey")).distinct()
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_parts"))
        .orderBy(col("l_returnflag"))
    }),

    // string aggregation (group-concat): collected set sorted before the
    // join so the concatenation is order-deterministic on any engine
    "q_agg_stringagg" -> ((s: SparkSession, d: String) => {
      scan(s, d, "customer")
        .groupBy(col("c_nationkey").cast("int").as("nk"))
        .agg(array_join(array_sort(collect_set(col("c_mktsegment"))), ",").as("segments"),
          countDistinct(col("c_mktsegment")).as("n_segments"))
        .orderBy(col("nk"))
    }),

    // IQR OUTLIER CENSUS (Tukey fences): per-segment quartiles in one
    // aggregate, 1.5·IQR fences, then the broadcast-back pass counts
    // fence-breakers — the boxplot diagnostic as a two-pass census
    // (quantile state per group, then one codegen'd scan; never per-row
    // quantile windows). Spark `percentile` ≡ DuckDB `quantile_cont`
    // exactly (the q_agg_median precedent), fence arithmetic is IEEE
    "q_agg_iqr" -> ((s: SparkSession, d: String) => {
      val c = scan(s, d, "customer")
      val q = c.groupBy(col("c_mktsegment"))
        .agg(percentile(col("c_acctbal"), lit(0.25)).as("q1"),
          percentile(col("c_acctbal"), lit(0.75)).as("q3"))
        .withColumn("lo", col("q1") - lit(1.5) * (col("q3") - col("q1")))
        .withColumn("hi", col("q3") + lit(1.5) * (col("q3") - col("q1")))
      c.join(broadcast(q), Seq("c_mktsegment"))
        .groupBy(col("c_mktsegment"), col("q1"), col("q3"), col("lo"), col("hi"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("c_acctbal") < col("lo") || col("c_acctbal") > col("hi"), 1L)
            .otherwise(0L)).cast("long").as("n_outliers"))
        .withColumn("outlier_ppm", expr("n_outliers * 1000000 div n"))
        .orderBy(col("c_mktsegment"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q_agg_q1" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${sqlDsum("l_quantity")} AS sum_qty,
         |  ${sqlDsum("l_extendedprice")} AS sum_base_price,
         |  ${sqlDsum("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
         |  ${sqlDsum("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS sum_charge,
         |  ${sqlDavg("l_quantity")} AS avg_qty,
         |  ${sqlDavg("l_extendedprice")} AS avg_price,
         |  ${sqlDavg("l_discount")} AS avg_disc,
         |  COUNT(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_agg_having" ->
      s"""SELECT o_custkey, COUNT(*) AS n_orders, ${sqlDsum("o_totalprice")} AS total_spent
         |FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 12
         |ORDER BY o_custkey""".stripMargin,
    "q_agg_distinct" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
        |       COUNT(DISTINCT l_suppkey) AS n_supps, COUNT(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_agg_median" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.5) AS med_qty,
        |  quantile_cont(l_extendedprice, 0.25) AS p25_price,
        |  quantile_cont(l_extendedprice, 0.75) AS p75_price,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_agg_mad" ->
      """WITH m AS (SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS med
        |           FROM lineitem GROUP BY 1)
        |SELECT l.l_returnflag, m.med,
        |  quantile_cont(abs(l.l_quantity - m.med), 0.5) AS mad
        |FROM lineitem l JOIN m ON l.l_returnflag = m.l_returnflag
        |GROUP BY l.l_returnflag, m.med ORDER BY l.l_returnflag""".stripMargin,

    "q_agg_wmedian" ->
      """WITH g AS (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS qty,
        |             CAST(SUM(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS w
        |           FROM lineitem GROUP BY 1, 2),
        |c AS (SELECT l_returnflag, qty, w,
        |        SUM(w) OVER (PARTITION BY l_returnflag ORDER BY qty
        |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
        |        SUM(w) OVER (PARTITION BY l_returnflag) AS tw
        |      FROM g)
        |SELECT l_returnflag, CAST(MIN(qty) AS BIGINT) AS wmedian_qty,
        |  CAST(MAX(tw) AS BIGINT) AS total_weight_cents
        |FROM c WHERE cw * 2 >= tw
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_agg_wpct" ->
      """WITH g AS (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS qty,
        |             CAST(SUM(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS w
        |           FROM lineitem GROUP BY 1, 2),
        |c AS (SELECT l_returnflag, qty, w,
        |        SUM(w) OVER (PARTITION BY l_returnflag ORDER BY qty
        |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
        |        SUM(w) OVER (PARTITION BY l_returnflag) AS tw
        |      FROM g)
        |SELECT l_returnflag,
        |  CAST(MIN(CASE WHEN cw * 4 >= tw THEN qty END) AS BIGINT) AS wp25,
        |  CAST(MIN(CASE WHEN cw * 4 >= tw * 3 THEN qty END) AS BIGINT) AS wp75,
        |  CAST(MIN(CASE WHEN cw * 4 >= tw * 3 THEN qty END)
        |    - MIN(CASE WHEN cw * 4 >= tw THEN qty END) AS BIGINT) AS wiqr
        |FROM c GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_agg_robust" ->
      """WITH g AS (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS qty,
        |             CAST(COUNT(*) AS BIGINT) AS cnt
        |           FROM lineitem GROUP BY 1, 2),
        |c AS (SELECT *, SUM(cnt) OVER (PARTITION BY l_returnflag ORDER BY qty
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |        SUM(cnt) OVER (PARTITION BY l_returnflag) AS n
        |      FROM g),
        |b AS (SELECT l_returnflag,
        |        MIN(CASE WHEN cum * 20 >= n THEN qty END) AS p05,
        |        MIN(CASE WHEN cum * 20 >= n * 19 THEN qty END) AS p95
        |      FROM c GROUP BY l_returnflag),
        |k AS (SELECT c.l_returnflag, c.qty, c.cnt, c.cum, c.n, b.p05, b.p95,
        |        n // 20 AS lo, n - n // 20 AS hi
        |      FROM c JOIN b USING (l_returnflag)),
        |r AS (SELECT l_returnflag, p05, p95, n,
        |        GREATEST(0, LEAST(cum, hi) - GREATEST(cum - cnt, lo)) AS kept,
        |        GREATEST(p05, LEAST(qty, p95)) AS clamped, qty, cnt
        |      FROM k)
        |SELECT l_returnflag, CAST(MAX(p05) AS BIGINT) AS p05,
        |  CAST(MAX(p95) AS BIGINT) AS p95, CAST(MAX(n) AS BIGINT) AS n,
        |  CAST(SUM(clamped * cnt) * 1000 // MAX(n) AS BIGINT) AS winsor_milli,
        |  CAST(SUM(qty * kept) * 1000 // SUM(kept) AS BIGINT) AS trim_milli
        |FROM r GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_agg_mode" ->
      """WITH c AS (SELECT l_returnflag, l_quantity, CAST(COUNT(*) AS BIGINT) AS cnt
        |           FROM lineitem GROUP BY 1, 2),
        |r AS (SELECT *, row_number() OVER (PARTITION BY l_returnflag
        |        ORDER BY cnt DESC, l_quantity ASC) AS rn FROM c)
        |SELECT l_returnflag, cnt AS mode_cnt, l_quantity AS mode_qty
        |FROM r WHERE rn = 1 ORDER BY l_returnflag""".stripMargin,

    "q_feature_bins" ->
      """WITH q AS (SELECT quantile_cont(o_totalprice, 0.25) AS q1,
        |                  quantile_cont(o_totalprice, 0.5) AS q2,
        |                  quantile_cont(o_totalprice, 0.75) AS q3 FROM orders)
        |SELECT CAST(CASE WHEN o_totalprice < q1 THEN 0
        |                 WHEN o_totalprice < q2 THEN 1
        |                 WHEN o_totalprice < q3 THEN 2 ELSE 3 END AS BIGINT) AS bin,
        |  COUNT(*) AS n, MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
        |FROM orders, q GROUP BY 1 ORDER BY bin""".stripMargin,

    // same decomposition, same staged log over DISTINCT counts; the
    // floor-div terms are nonnegative so `div` vs `//` agree
    "q_feature_woe" -> {
      import graft.ops.UlmTokenizer
      val staged = UlmTokenizer.costStages("v", "1", UlmTokenizer.Duck)
        .foldLeft("SELECT * FROM vals") { case (acc, (n, e)) =>
          s"SELECT *, $e AS $n FROM ($acc)" }
      s"""WITH bb AS (SELECT o_orderpriority AS bin,
         |    CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 0 ELSE 1 END) AS BIGINT) AS g,
         |    CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS b
         |  FROM orders GROUP BY o_orderpriority),
         |tot AS (SELECT CAST(SUM(g) AS BIGINT) AS gt, CAST(SUM(b) AS BIGINT) AS bt FROM bb),
         |cand AS (SELECT bb.*, tot.gt, tot.bt FROM bb, tot),
         |vals AS (SELECT DISTINCT v FROM (
         |    SELECT g AS v FROM cand UNION SELECT b FROM cand
         |    UNION SELECT gt FROM cand UNION SELECT bt FROM cand)),
         |st AS MATERIALIZED ($staged),
         |cbt AS (SELECT v, CAST(cost_cb AS BIGINT) AS cb FROM st)
         |SELECT bin, g AS n_good, b AS n_bad,
         |  CAST(x1.cb + x4.cb - x2.cb - x3.cb AS BIGINT) AS woe_cb,
         |  CAST((g * 1000000 // gt - b * 1000000 // bt)
         |    * (x1.cb + x4.cb - x2.cb - x3.cb) AS BIGINT) AS iv_contrib
         |FROM cand
         |JOIN cbt x1 ON x1.v = cand.g
         |JOIN cbt x2 ON x2.v = cand.b
         |JOIN cbt x3 ON x3.v = cand.gt
         |JOIN cbt x4 ON x4.v = cand.bt
         |ORDER BY bin""".stripMargin
    },

    "q_agg_ks" ->
      """WITH o AS (SELECT CAST(floor(o_totalprice * 100) AS BIGINT) AS v,
        |    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS w1,
        |    CASE WHEN o_orderstatus != 'F' THEN 1 ELSE 0 END AS w2
        |  FROM orders),
        |vals AS (SELECT v, CAST(SUM(w1) AS BIGINT) AS d1,
        |           CAST(SUM(w2) AS BIGINT) AS d2 FROM o GROUP BY v),
        |t AS (SELECT CAST(SUM(d1) AS BIGINT) AS n1,
        |        CAST(SUM(d2) AS BIGINT) AS n2 FROM vals),
        |c AS (SELECT v, SUM(d1) OVER (ORDER BY v) AS cum1,
        |        SUM(d2) OVER (ORDER BY v) AS cum2 FROM vals),
        |dd AS (SELECT CAST(MAX(abs(cum1 * t.n2 - cum2 * t.n1)) AS BIGINT)
        |         AS d_num FROM c, t)
        |SELECT t.n1, t.n2, dd.d_num,
        |  CAST(dd.d_num::HUGEINT * 1000000 // (t.n1::HUGEINT * t.n2)
        |    AS BIGINT) AS d_ppm,
        |  dd.d_num::HUGEINT * dd.d_num::HUGEINT * 1000000::HUGEINT
        |    > 1844164::HUGEINT * (t.n1 + t.n2)::HUGEINT
        |      * t.n1::HUGEINT * t.n2::HUGEINT AS reject_95
        |FROM dd, t""".stripMargin,

    "q_agg_cv" ->
      """WITH v AS (SELECT o_orderpriority AS pr,
        |    CAST(floor(o_totalprice * 100) AS BIGINT) AS v FROM orders),
        |a AS (SELECT pr, CAST(COUNT(*) AS BIGINT) AS n,
        |        CAST(SUM(v) AS BIGINT) AS sv, SUM(v::HUGEINT * v) AS qv
        |      FROM v GROUP BY pr)
        |SELECT pr, n,
        |  CAST((n::HUGEINT * qv - sv::HUGEINT * sv) * 1000000
        |    // (sv::HUGEINT * sv) AS BIGINT) AS cv2_ppm
        |FROM a ORDER BY pr""".stripMargin,

    "q_agg_bowley" ->
      """WITH v AS (SELECT o_orderpriority AS pr,
        |    CAST(floor(o_totalprice * 100) AS BIGINT) AS v FROM orders),
        |q AS (SELECT pr, CAST(COUNT(*) AS BIGINT) AS n,
        |        quantile_cont(v, 0.25) AS q1, quantile_cont(v, 0.5) AS med,
        |        quantile_cont(v, 0.75) AS q3, quantile_cont(v, 0.1) AS p10,
        |        quantile_cont(v, 0.9) AS p90
        |      FROM v GROUP BY pr)
        |SELECT pr, n,
        |  (q3 + q1 - 2 * med) / (q3 - q1) AS bowley,
        |  (p90 + p10 - 2 * med) / (p90 - p10) AS kelly
        |FROM q ORDER BY pr""".stripMargin,

    "q_agg_lorenz" ->
      """WITH vals AS (SELECT CAST(floor(o_totalprice * 100) AS BIGINT) AS v,
        |                CAST(COUNT(*) AS BIGINT) AS c
        |              FROM orders GROUP BY 1),
        |t AS (SELECT CAST(SUM(c) AS BIGINT) AS n,
        |        CAST(SUM(c * v) AS BIGINT) AS tv FROM vals),
        |cum AS (SELECT v, SUM(c) OVER (ORDER BY v) AS cumc,
        |          SUM(c * v) OVER (ORDER BY v) AS cumv FROM vals),
        |d AS (SELECT (cumc * 10 + t.n - 1) // t.n AS decile, cumc, cumv,
        |        t.n, t.tv
        |      FROM cum, t),
        |m AS (SELECT decile, MAX(cumc) AS cum_orders FROM d GROUP BY decile)
        |SELECT CAST(m.decile AS BIGINT) AS decile,
        |  CAST(m.cum_orders AS BIGINT) AS cum_orders,
        |  CAST(d.cumv::HUGEINT * 1000000 // d.tv AS BIGINT) AS cum_value_ppm
        |FROM m JOIN d ON m.decile = d.decile AND m.cum_orders = d.cumc
        |ORDER BY m.decile""".stripMargin,

    "q_agg_atkinson" ->
      """WITH v AS (SELECT CAST(floor(o_totalprice * 100) AS BIGINT) AS v
        |           FROM orders),
        |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(v) AS BIGINT) AS sv,
        |        CAST(SUM(CAST(floor(sqrt(CAST(v AS DOUBLE))) AS BIGINT))
        |          AS BIGINT) AS sq
        |      FROM v)
        |SELECT n, sv, sq,
        |  1000000 - CAST(sq::HUGEINT * sq * 1000000 // (n::HUGEINT * sv)
        |    AS BIGINT) AS a_ppm
        |FROM a""".stripMargin,

    "q_agg_mood" ->
      """WITH ev AS (SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS v
        |            FROM events),
        |med AS (SELECT quantile_cont(v, 0.5) AS med FROM ev),
        |cls AS (SELECT event_type,
        |          CASE WHEN CAST(v AS DOUBLE) > med.med THEN 'above'
        |               ELSE 'below' END AS side
        |        FROM ev, med),
        |pm AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS np
        |       FROM cls GROUP BY 1),
        |sm AS (SELECT side, CAST(COUNT(*) AS BIGINT) AS ns FROM cls GROUP BY 1),
        |cl AS (SELECT event_type, side, CAST(COUNT(*) AS BIGINT) AS c
        |       FROM cls GROUP BY 1, 2),
        |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS nt FROM cls),
        |g AS (SELECT pm.event_type, sm.side, pm.np, sm.ns,
        |        COALESCE(cl.c, 0) AS c, t.nt
        |      FROM pm CROSS JOIN sm
        |      LEFT JOIN cl ON pm.event_type = cl.event_type AND sm.side = cl.side
        |      CROSS JOIN t),
        |cp AS (SELECT nt,
        |         CAST((nt::HUGEINT * c - np::HUGEINT * ns)
        |           * (nt::HUGEINT * c - np::HUGEINT * ns) * 1000000
        |           // (nt::HUGEINT * np * ns) AS BIGINT) AS cell_ppm,
        |         event_type
        |       FROM g),
        |a AS (SELECT CAST(MAX(nt) AS BIGINT) AS n_rows,
        |        CAST(COUNT(DISTINCT event_type) AS BIGINT) AS k,
        |        CAST(SUM(cell_ppm) AS BIGINT) AS chi2_ppm FROM cp)
        |SELECT n_rows, k, chi2_ppm, chi2_ppm > 9488000 AS reject_95
        |FROM a""".stripMargin,

    "q_agg_kruskal" -> {
      val ts = Seq("click", "signup", "error", "view", "purchase")
      s"""WITH ev AS (SELECT CAST(floor(value * 100) AS BIGINT) AS v, event_type
         |            FROM events),
         |vals AS (SELECT v,
         |${ts.map(t => s"    CAST(SUM(CASE WHEN event_type = '$t' THEN 1 ELSE 0 END) AS BIGINT) AS d_$t").mkString(",\n")}
         |  FROM ev GROUP BY v),
         |c AS (SELECT *, ${ts.map(t => s"d_$t").mkString(" + ")} AS c FROM vals),
         |r AS (SELECT *, 2 * (SUM(c) OVER (ORDER BY v) - c) + c + 1 AS rank2
         |      FROM c),
         |a AS (SELECT
         |${ts.map(t => s"    CAST(SUM(d_$t * rank2) AS BIGINT) AS r2_$t").mkString(",\n")},
         |${ts.map(t => s"    CAST(SUM(d_$t) AS BIGINT) AS n_$t").mkString(",\n")},
         |    CAST(SUM(c * c * c - c) AS BIGINT) AS tie_t
         |  FROM r),
         |g AS (SELECT ${ts.map(t => s"n_$t").mkString(" + ")} AS nn, tie_t,
         |    ${ts.map(t => s"(r2_$t::HUGEINT * r2_$t // n_$t)").mkString("\n      + ")} AS s6
         |  FROM a),
         |h AS (SELECT nn, tie_t,
         |    CAST(3 * s6 * 1000000 // (nn::HUGEINT * (nn + 1)) AS BIGINT)
         |      - 3 * (nn + 1) * 1000000 AS h0_ppm
         |  FROM g)
         |SELECT nn AS n, tie_t,
         |  (CASE WHEN h0_ppm < 0 THEN -1 ELSE 1 END)
         |    * CAST(abs(h0_ppm)::HUGEINT * (nn::HUGEINT * nn * nn - nn)
         |        // (nn::HUGEINT * nn * nn - nn - tie_t) AS BIGINT) AS h_ppm,
         |  (CASE WHEN h0_ppm < 0 THEN -1 ELSE 1 END)
         |    * CAST(abs(h0_ppm)::HUGEINT * (nn::HUGEINT * nn * nn - nn)
         |        // (nn::HUGEINT * nn * nn - nn - tie_t) AS BIGINT) > 9488000
         |    AS reject_95
         |FROM h""".stripMargin
    },

    "q_agg_friedman" ->
      """WITH daily AS (SELECT date_trunc('day', ts) AS day, event_type,
        |                 CAST(COUNT(*) AS BIGINT) AS cnt
        |               FROM events GROUP BY 1, 2),
        |days AS (SELECT DISTINCT date_trunc('day', ts) AS day FROM events),
        |ty AS (SELECT unnest(['click', 'signup', 'error', 'view', 'purchase'])
        |         AS event_type),
        |grid AS (SELECT days.day, ty.event_type, COALESCE(daily.cnt, 0) AS cnt
        |         FROM days CROSS JOIN ty
        |         LEFT JOIN daily ON days.day = daily.day
        |           AND ty.event_type = daily.event_type),
        |r AS (SELECT event_type,
        |        2 * COUNT(*) OVER (PARTITION BY day ORDER BY cnt
        |              RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |          + COUNT(*) OVER (PARTITION BY day, cnt) + 1 AS rank2
        |      FROM grid),
        |a AS (SELECT event_type, CAST(SUM(rank2) AS BIGINT) AS r2,
        |        CAST(COUNT(*) AS BIGINT) AS nd FROM r GROUP BY event_type),
        |g AS (SELECT CAST(MAX(nd) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS k,
        |        CAST(SUM(r2 * r2) AS BIGINT) AS sr2 FROM a)
        |SELECT n, k,
        |  CAST(3 * sr2 * 1000000 // (n * k * (k + 1))
        |    - 3 * n * (k + 1) * 1000000 AS BIGINT) AS chi2_ppm,
        |  3 * sr2 * 1000000 // (n * k * (k + 1)) - 3 * n * (k + 1) * 1000000
        |    > 9488000 AS reject_95
        |FROM g""".stripMargin,

    "q_agg_ad" ->
      """WITH o AS (SELECT CAST(floor(o_totalprice * 100) AS BIGINT) AS v,
        |    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS w1,
        |    CASE WHEN o_orderstatus != 'F' THEN 1 ELSE 0 END AS w2
        |  FROM orders),
        |vals AS (SELECT v, CAST(SUM(w1) AS BIGINT) AS d1,
        |           CAST(SUM(w2) AS BIGINT) AS d2 FROM o GROUP BY v),
        |t AS (SELECT CAST(SUM(d1) AS BIGINT) AS n1,
        |        CAST(SUM(d2) AS BIGINT) AS n2 FROM vals),
        |c AS (SELECT v, d1, d2, SUM(d1) OVER (ORDER BY v) AS cum1,
        |        SUM(d2) OVER (ORDER BY v) AS cum2 FROM vals),
        |f AS (SELECT d1, d2, cum1, cum2, cum1 + cum2 AS cum,
        |        t.n1, t.n2, t.n1 + t.n2 AS nn
        |      FROM c, t WHERE cum1 + cum2 < t.n1 + t.n2),
        |s AS (SELECT MAX(n1) AS n1, MAX(n2) AS n2,
        |        SUM((d1 + d2)::HUGEINT
        |          * (cum1 * n2 - cum2 * n1) * (cum1 * n2 - cum2 * n1)
        |          * 1000000 // (cum::HUGEINT * (nn - cum))) AS s
        |      FROM f)
        |SELECT n1, n2,
        |  CAST(s // (n1::HUGEINT * n2) AS BIGINT) AS ad_ppm,
        |  s // (n1::HUGEINT * n2) > 2492000 AS reject_95
        |FROM s""".stripMargin,

    "q_agg_cvm" ->
      """WITH o AS (SELECT CAST(floor(o_totalprice * 100) AS BIGINT) AS v,
        |    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS w1,
        |    CASE WHEN o_orderstatus != 'F' THEN 1 ELSE 0 END AS w2
        |  FROM orders),
        |vals AS (SELECT v, CAST(SUM(w1) AS BIGINT) AS d1,
        |           CAST(SUM(w2) AS BIGINT) AS d2 FROM o GROUP BY v),
        |t AS (SELECT CAST(SUM(d1) AS BIGINT) AS n1,
        |        CAST(SUM(d2) AS BIGINT) AS n2 FROM vals),
        |c AS (SELECT v, d1, d2, SUM(d1) OVER (ORDER BY v) AS cum1,
        |        SUM(d2) OVER (ORDER BY v) AS cum2 FROM vals),
        |s AS (SELECT SUM((d1 + d2)::HUGEINT
        |          * (cum1 * t.n2 - cum2 * t.n1) * (cum1 * t.n2 - cum2 * t.n1))
        |        AS s, MAX(t.n1) AS n1, MAX(t.n2) AS n2
        |      FROM c, t)
        |SELECT n1, n2,
        |  CAST(s * 1000000 // (n1::HUGEINT * n2 * (n1 + n2) * (n1 + n2))
        |    AS BIGINT) AS t_ppm,
        |  s * 1000 > 461::HUGEINT * n1 * n2 * (n1 + n2) * (n1 + n2) AS reject_95
        |FROM s""".stripMargin,

    "q_agg_runs" ->
      """WITH daily AS (SELECT date_trunc('day', ts) AS day,
        |                 CAST(COUNT(*) AS BIGINT) AS cnt
        |               FROM events GROUP BY 1),
        |g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(cnt) AS BIGINT) AS s
        |      FROM daily),
        |b AS (SELECT day, CASE WHEN g.n * cnt > g.s THEN 1 ELSE 0 END AS b
        |      FROM daily, g),
        |c AS (SELECT b, CASE WHEN lag(b) OVER (ORDER BY day) IS NULL THEN 1
        |                WHEN b != lag(b) OVER (ORDER BY day) THEN 1 ELSE 0 END
        |          AS chg
        |      FROM b),
        |a AS (SELECT CAST(SUM(chg) AS BIGINT) AS r, CAST(SUM(b) AS BIGINT) AS n1,
        |        CAST(SUM(1 - b) AS BIGINT) AS n2 FROM c),
        |z AS (SELECT r, n1, n2, n1 + n2 AS nn,
        |        r * (n1 + n2) - 2 * n1 * n2 - (n1 + n2) AS dd FROM a)
        |SELECT r AS n_runs, n1, n2,
        |  CAST(dd * dd * (nn - 1) * 1000000
        |    // (2 * n1 * n2 * (2 * n1 * n2 - nn)) AS BIGINT) AS z2_ppm,
        |  dd * dd * (nn - 1) * 10000 > 38416 * 2 * n1 * n2 * (2 * n1 * n2 - nn)
        |    AS reject_95
        |FROM z""".stripMargin,

    "q_agg_wilcoxon" ->
      """WITH daily AS (SELECT date_trunc('day', ts) AS day,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      - SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS diff
        |  FROM events WHERE event_type IN ('purchase', 'view') GROUP BY 1),
        |d AS (SELECT abs(diff) AS a,
        |        CASE WHEN diff > 0 THEN 1 ELSE 0 END AS pos
        |      FROM daily WHERE diff != 0),
        |vals AS (SELECT a, CAST(COUNT(*) AS BIGINT) AS c,
        |           CAST(SUM(pos) AS BIGINT) AS cp FROM d GROUP BY a),
        |r AS (SELECT a, c, cp,
        |        COALESCE(SUM(c) OVER (ORDER BY a
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
        |      FROM vals),
        |g AS (SELECT CAST(SUM(c) AS BIGINT) AS n,
        |        CAST(SUM(cp * (2 * below + c + 1)) AS BIGINT) AS w2p,
        |        CAST(SUM(c * c * c - c) AS BIGINT) AS tie_t FROM r),
        |z AS (SELECT n, w2p, tie_t, 2 * w2p - n * (n + 1) AS dd FROM g)
        |SELECT n, w2p, tie_t,
        |  CAST(dd::HUGEINT * dd * 3 * 1000000
        |    // (2 * n * (n + 1) * (2 * n + 1) - tie_t) AS BIGINT) AS z2_ppm,
        |  dd::HUGEINT * dd * 3 * 10000
        |    > 38416::HUGEINT * (2 * n * (n + 1) * (2 * n + 1) - tie_t)
        |    AS reject_95
        |FROM z""".stripMargin,

    "q_agg_hodgeslehmann" ->
      """WITH daily AS (SELECT date_trunc('day', ts) AS day,
        |                 CAST(COUNT(*) AS BIGINT) AS cnt
        |               FROM events GROUP BY 1),
        |w AS (SELECT a.cnt + b.cnt AS walsh_x2
        |      FROM daily a JOIN daily b ON a.day <= b.day)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |  quantile_cont(walsh_x2, 0.5) AS hl_x2,
        |  quantile_cont(walsh_x2, 0.5) / 2.0 AS hl
        |FROM w""".stripMargin,

    "q_agg_spearman" ->
      """WITH daily AS (SELECT date_trunc('day', ts) AS day,
        |    CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS x,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS y
        |  FROM events GROUP BY 1),
        |r AS (SELECT
        |    2 * COUNT(*) OVER (ORDER BY x
        |          RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      + COUNT(*) OVER (PARTITION BY x) + 1 AS rx,
        |    2 * COUNT(*) OVER (ORDER BY y
        |          RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      + COUNT(*) OVER (PARTITION BY y) + 1 AS ry
        |  FROM daily),
        |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(rx) AS BIGINT) AS sx,
        |        CAST(SUM(ry) AS BIGINT) AS sy,
        |        CAST(SUM(rx * ry) AS BIGINT) AS sxy,
        |        CAST(SUM(rx * rx) AS BIGINT) AS sxx,
        |        CAST(SUM(ry * ry) AS BIGINT) AS syy FROM r),
        |c AS (SELECT n, n * sxy - sx * sy AS cov, n * sxx - sx * sx AS vx,
        |        n * syy - sy * sy AS vy FROM a)
        |SELECT n,
        |  CAST(CASE WHEN cov < 0 THEN -1 ELSE 1 END
        |    * (cov::HUGEINT * cov * 1000000 // (vx::HUGEINT * vy)) AS BIGINT)
        |    AS rho2s_ppm
        |FROM c""".stripMargin,

    "q_agg_kendall" ->
      """WITH daily AS (SELECT date_trunc('day', ts) AS day,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS p,
        |    CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS v
        |  FROM events WHERE event_type IN ('purchase', 'view') GROUP BY 1),
        |cd AS (SELECT
        |    CAST(SUM(CASE WHEN (a.p - b.p) * (a.v - b.v) > 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS c,
        |    CAST(SUM(CASE WHEN (a.p - b.p) * (a.v - b.v) < 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS d,
        |    CAST(COUNT(*) AS BIGINT) AS n0
        |  FROM daily a JOIN daily b ON a.day < b.day),
        |tp AS (SELECT CAST(COALESCE(SUM(t * (t - 1) // 2), 0) AS BIGINT) AS n1
        |       FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM daily GROUP BY p)),
        |tv AS (SELECT CAST(COALESCE(SUM(t * (t - 1) // 2), 0) AS BIGINT) AS n2
        |       FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM daily GROUP BY v))
        |SELECT c, d, n0, n1, n2,
        |  CAST((c - d)::HUGEINT * (c - d) * 1000000
        |    // ((n0 - n1)::HUGEINT * (n0 - n2)) AS BIGINT) AS taub2_ppm,
        |  CAST(CASE WHEN c > d THEN 1 WHEN c < d THEN -1 ELSE 0 END AS BIGINT)
        |    AS tau_sign
        |FROM cd, tp, tv""".stripMargin,

    "q_agg_signtest" ->
      """WITH daily AS (SELECT date_trunc('day', ts) AS day,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS p,
        |    CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS v
        |  FROM events WHERE event_type IN ('purchase', 'view') GROUP BY 1),
        |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
        |        CAST(SUM(CASE WHEN p > v THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
        |        CAST(SUM(CASE WHEN p < v THEN 1 ELSE 0 END) AS BIGINT) AS n_neg,
        |        CAST(SUM(CASE WHEN p = v THEN 1 ELSE 0 END) AS BIGINT) AS n_tie
        |      FROM daily)
        |SELECT n_days, n_pos, n_neg, n_tie,
        |  CAST((n_pos - n_neg) * (n_pos - n_neg) * 1000000 // (n_pos + n_neg)
        |    AS BIGINT) AS z2_ppm,
        |  (n_pos - n_neg) * (n_pos - n_neg) * 10000 > 38416 * (n_pos + n_neg)
        |    AS reject_95
        |FROM a""".stripMargin,

    "q_agg_huber" ->
      """WITH v AS MATERIALIZED (
        |  SELECT CAST(floor(l_extendedprice * 100) AS BIGINT) AS v FROM lineitem),
        |g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(v) AS BIGINT) AS s
        |      FROM v),
        |m0 AS (SELECT n, s // n AS mu0, (s // n) // 10 AS k FROM g),
        |r1 AS MATERIALIZED (
        |  SELECT m0.n, m0.k, m0.mu0,
        |    CAST(SUM((CASE WHEN abs(v - mu0) <= k THEN 1000000::HUGEINT
        |               ELSE k * 1000000 // abs(v - mu0) END) * v)
        |      // SUM(CASE WHEN abs(v - mu0) <= k THEN 1000000::HUGEINT
        |            ELSE k * 1000000 // abs(v - mu0) END) AS BIGINT) AS mu1
        |  FROM v, m0 GROUP BY m0.n, m0.k, m0.mu0),
        |r2 AS MATERIALIZED (
        |  SELECT r1.n, r1.k, r1.mu0, r1.mu1,
        |    CAST(SUM((CASE WHEN abs(v - mu1) <= k THEN 1000000::HUGEINT
        |               ELSE k * 1000000 // abs(v - mu1) END) * v)
        |      // SUM(CASE WHEN abs(v - mu1) <= k THEN 1000000::HUGEINT
        |            ELSE k * 1000000 // abs(v - mu1) END) AS BIGINT) AS mu2
        |  FROM v, r1 GROUP BY r1.n, r1.k, r1.mu0, r1.mu1),
        |r3 AS MATERIALIZED (
        |  SELECT r2.n, r2.k, r2.mu0, r2.mu1, r2.mu2,
        |    CAST(SUM((CASE WHEN abs(v - mu2) <= k THEN 1000000::HUGEINT
        |               ELSE k * 1000000 // abs(v - mu2) END) * v)
        |      // SUM(CASE WHEN abs(v - mu2) <= k THEN 1000000::HUGEINT
        |            ELSE k * 1000000 // abs(v - mu2) END) AS BIGINT) AS mu3
        |  FROM v, r2 GROUP BY r2.n, r2.k, r2.mu0, r2.mu1, r2.mu2)
        |SELECT r3.n, r3.k, r3.mu0, r3.mu1, r3.mu2, r3.mu3,
        |  CAST(SUM(CASE WHEN abs(v - mu3) > k THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_outliers
        |FROM v, r3
        |GROUP BY r3.n, r3.k, r3.mu0, r3.mu1, r3.mu2, r3.mu3""".stripMargin,

    // plain-window naive mirror: inclusive cumulatives + global lead
    "q_agg_emd" ->
      """WITH o AS (SELECT CAST(floor(o_totalprice * 100) AS BIGINT) AS v,
        |    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS w1,
        |    CASE WHEN o_orderstatus != 'F' THEN 1 ELSE 0 END AS w2
        |  FROM orders),
        |vals AS (SELECT v, CAST(SUM(w1) AS BIGINT) AS d1,
        |           CAST(SUM(w2) AS BIGINT) AS d2 FROM o GROUP BY v),
        |t AS (SELECT CAST(SUM(d1) AS BIGINT) AS n1,
        |        CAST(SUM(d2) AS BIGINT) AS n2 FROM vals),
        |c AS (SELECT v, SUM(d1) OVER (ORDER BY v) AS cum1,
        |        SUM(d2) OVER (ORDER BY v) AS cum2,
        |        lead(v) OVER (ORDER BY v) AS lead_v
        |      FROM vals),
        |terms AS (SELECT abs(cum1::HUGEINT * n2 - cum2::HUGEINT * n1)
        |            * (lead_v - v) AS term
        |          FROM c, t WHERE lead_v IS NOT NULL)
        |SELECT n1, n2,
        |  CAST(SUM(term) * 1000000 // (n1::HUGEINT * n2) AS BIGINT) AS emd_cents_ppm
        |FROM terms, t GROUP BY n1, n2""".stripMargin,

    // same census, prefix sums as one plain window (oracle-side
    // naivety), same staged log with the 0-count left-join guard
    "q_feature_split" -> {
      import graft.ops.UlmTokenizer
      val staged = UlmTokenizer.costStages("v", "1", UlmTokenizer.Duck)
        .foldLeft("SELECT * FROM vals") { case (acc, (n, e)) =>
          s"SELECT *, $e AS $n FROM ($acc)" }
      s"""WITH c AS (SELECT CAST(floor(c_acctbal) AS BIGINT) AS v,
         |    CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS y
         |  FROM customer),
         |census AS (SELECT v, CAST(count(*) AS BIGINT) AS n,
         |             CAST(SUM(y) AS BIGINT) AS c1 FROM c GROUP BY v),
         |t AS (SELECT CAST(SUM(n) AS BIGINT) AS nn,
         |        CAST(SUM(c1) AS BIGINT) AS cc1 FROM census),
         |cand AS (SELECT v,
         |    SUM(n) OVER (ORDER BY v) AS nl, SUM(c1) OVER (ORDER BY v) AS c1l,
         |    nn, cc1
         |  FROM census, t),
         |c2 AS (SELECT v, nl, c1l, nl - c1l AS c0l, nn - nl AS nr,
         |         cc1 - c1l AS c1r, (nn - nl) - (cc1 - c1l) AS c0r, nn, cc1
         |       FROM cand WHERE nl < nn),
         |vals AS (SELECT DISTINCT v FROM (
         |    SELECT nl AS v FROM c2 WHERE nl >= 1
         |    UNION SELECT c1l FROM c2 WHERE c1l >= 1
         |    UNION SELECT c0l FROM c2 WHERE c0l >= 1
         |    UNION SELECT nr FROM c2 WHERE nr >= 1
         |    UNION SELECT c1r FROM c2 WHERE c1r >= 1
         |    UNION SELECT c0r FROM c2 WHERE c0r >= 1
         |    UNION SELECT nn FROM t
         |    UNION SELECT cc1 FROM t WHERE cc1 >= 1
         |    UNION SELECT nn - cc1 FROM t WHERE nn - cc1 >= 1)),
         |st AS MATERIALIZED ($staged),
         |cbt AS (SELECT v, CAST(cost_cb AS BIGINT) AS cb FROM st),
         |parent AS (SELECT t.nn * pn.cb
         |    - t.cc1 * COALESCE(p1.cb, 0)
         |    - (t.nn - t.cc1) * COALESCE(p0.cb, 0) AS parent_ent
         |  FROM t JOIN cbt pn ON pn.v = t.nn
         |       LEFT JOIN cbt p1 ON p1.v = t.cc1
         |       LEFT JOIN cbt p0 ON p0.v = t.nn - t.cc1),
         |g AS (SELECT c2.v AS threshold, c2.nl AS n_left, c2.c1l AS c1_left,
         |        c2.nr AS n_right, c2.c1r AS c1_right,
         |        parent.parent_ent
         |          - (c2.nl * xnl.cb - c2.c1l * COALESCE(x1l.cb, 0)
         |             - c2.c0l * COALESCE(x0l.cb, 0))
         |          - (c2.nr * xnr.cb - c2.c1r * COALESCE(x1r.cb, 0)
         |             - c2.c0r * COALESCE(x0r.cb, 0)) AS gain_scaled
         |      FROM c2
         |      JOIN cbt xnl ON xnl.v = c2.nl
         |      LEFT JOIN cbt x1l ON x1l.v = c2.c1l
         |      LEFT JOIN cbt x0l ON x0l.v = c2.c0l
         |      JOIN cbt xnr ON xnr.v = c2.nr
         |      LEFT JOIN cbt x1r ON x1r.v = c2.c1r
         |      LEFT JOIN cbt x0r ON x0r.v = c2.c0r
         |      CROSS JOIN parent)
         |SELECT threshold, CAST(n_left AS BIGINT) AS n_left,
         |  CAST(c1_left AS BIGINT) AS c1_left,
         |  CAST(n_right AS BIGINT) AS n_right,
         |  CAST(c1_right AS BIGINT) AS c1_right,
         |  CAST(gain_scaled AS BIGINT) AS gain_scaled
         |FROM g ORDER BY gain_scaled DESC, threshold LIMIT 5""".stripMargin
    },

    // same confusion counters; HUGEINT carries the mcc/kappa products,
    // kappa's numerator sign-decomposed identically
    "q_eval_confusion" -> {
      val hv = DedupQueries.sqlHex60Public("md5('sc:' || CAST(o_orderkey AS VARCHAR))")
      s"""WITH p AS (SELECT ($hv) % 800000
         |      + CASE WHEN o_orderstatus = 'F' THEN 150000 ELSE 0 END AS score,
         |    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
         |  FROM orders),
         |c AS (SELECT
         |    CAST(SUM(CASE WHEN y = 1 AND score >= 500000 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         |    CAST(SUM(CASE WHEN y = 0 AND score >= 500000 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         |    CAST(SUM(CASE WHEN y = 1 AND score < 500000 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
         |    CAST(SUM(CASE WHEN y = 0 AND score < 500000 THEN 1 ELSE 0 END) AS BIGINT) AS tn
         |  FROM p),
         |d AS (SELECT *, tp + fp + fn + tn AS n,
         |        tp::HUGEINT * tn - fp::HUGEINT * fn AS mnum,
         |        n2.knum, n2.kden
         |      FROM c, LATERAL (SELECT
         |        (tp + fp + fn + tn)::HUGEINT * (tp + tn)
         |          - ((tp + fp)::HUGEINT * (tp + fn) + (fn + tn)::HUGEINT * (fp + tn)) AS knum,
         |        (tp + fp + fn + tn)::HUGEINT * (tp + fp + fn + tn)
         |          - ((tp + fp)::HUGEINT * (tp + fn) + (fn + tn)::HUGEINT * (fp + tn)) AS kden) n2)
         |SELECT tp, fp, fn, tn,
         |  CAST(tp * 1000000 // (tp + fp) AS BIGINT) AS precision_ppm,
         |  CAST(tp * 1000000 // (tp + fn) AS BIGINT) AS recall_ppm,
         |  CAST(2 * tp * 1000000 // (2 * tp + fp + fn) AS BIGINT) AS f1_ppm,
         |  CAST(sign(mnum) AS BIGINT) AS mcc_sign,
         |  CAST(mnum * mnum * 1000000
         |    // ((tp + fp)::HUGEINT * (tp + fn) * (tn + fp) * (tn + fn)) AS BIGINT)
         |    AS mcc_sq_ppm,
         |  CAST(CAST(sign(knum) AS BIGINT) * (abs(knum) * 1000000 // kden) AS BIGINT)
         |    AS kappa_ppm
         |FROM d""".stripMargin
    },

    // definitional mirror of the engine's step-wise AP (plain window
    // over the distinct-score census — oracle-side naivety is fine)
    "q_eval_prauc" -> {
      val hv = DedupQueries.sqlHex60Public("md5('sc:' || CAST(o_orderkey AS VARCHAR))")
      s"""WITH o AS (SELECT ($hv) % 80000
         |      + CASE WHEN o_orderstatus = 'F' THEN 15000 ELSE 0 END AS v,
         |    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS w1,
         |    CASE WHEN o_orderstatus != 'F' THEN 1 ELSE 0 END AS w2
         |  FROM orders),
         |vals AS (SELECT v, CAST(SUM(w1) AS BIGINT) AS d1,
         |           CAST(SUM(w2) AS BIGINT) AS d2 FROM o GROUP BY v),
         |t AS (SELECT CAST(SUM(d1) AS BIGINT) AS n1 FROM vals),
         |cum AS (SELECT v, d1,
         |          SUM(d1) OVER (ORDER BY v DESC) AS tp,
         |          SUM(d2) OVER (ORDER BY v DESC) AS fp
         |        FROM vals),
         |terms AS (SELECT d1 * (tp * 1000000 // (tp + fp)) AS term FROM cum)
         |SELECT n1 AS n_pos, CAST(SUM(term) AS BIGINT) AS ap_num,
         |  CAST(SUM(term) // n1 AS BIGINT) AS ap_ppm
         |FROM terms, t GROUP BY n1""".stripMargin
    },

    // same clamps, same staged log over the bounded score domain
    "q_eval_scoring" -> {
      import graft.ops.UlmTokenizer
      val hv = DedupQueries.sqlHex60Public("md5('sc:' || CAST(o_orderkey AS VARCHAR))")
      val staged = UlmTokenizer.costStages("v", "1", UlmTokenizer.Duck)
        .foldLeft("SELECT * FROM vals") { case (acc, (n, e)) =>
          s"SELECT *, $e AS $n FROM ($acc)" }
      s"""WITH p AS (SELECT ($hv) % 800000
         |      + CASE WHEN o_orderstatus = 'F' THEN 150000 ELSE 0 END AS score,
         |    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
         |  FROM orders),
         |p2 AS (SELECT score, y, score + 1 AS p1, 1000001 - score AS p0 FROM p),
         |vals AS (SELECT DISTINCT v FROM (
         |    SELECT p1 AS v FROM p2 UNION SELECT p0 FROM p2)),
         |st AS MATERIALIZED ($staged),
         |cbt AS (SELECT v, CAST(cost_cb AS BIGINT) AS cb FROM st),
         |s2 AS (SELECT score, y,
         |        CASE WHEN y = 1 THEN 1993 - c1.cb ELSE 1993 - c0.cb END AS ll_cb,
         |        score - y * 1000000 AS gap
         |      FROM p2 JOIN cbt c1 ON c1.v = p2.p1 JOIN cbt c0 ON c0.v = p2.p0)
         |SELECT CAST(count(*) AS BIGINT) AS n,
         |  CAST(SUM(gap::HUGEINT * gap) // count(*) AS BIGINT) AS brier_pp12,
         |  CAST(SUM(ll_cb) AS BIGINT) AS ll_cb_sum,
         |  CAST(SUM(ll_cb) * 1000 // count(*) AS BIGINT) AS ll_mcb_mean
         |FROM s2""".stripMargin
    },

    // same keyed-hash classifiers; Poisson(1) weights from the fixed
    // cumulative ppm thresholds; the gap and mean divisions sign-split
    "q_eval_bootstrap" -> {
      val ha = DedupQueries.sqlHex60Public("md5('sc:' || CAST(o_orderkey AS VARCHAR))")
      val hb = DedupQueries.sqlHex60Public("md5('sc2:' || CAST(o_orderkey AS VARCHAR))")
      val hu = DedupQueries.sqlHex60Public(
        "md5('bs:' || CAST(o_orderkey AS VARCHAR) || ':' || CAST(r AS VARCHAR))")
      s"""WITH o AS (SELECT o_orderkey,
         |    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y,
         |    ($ha) % 800000
         |      + CASE WHEN o_orderstatus = 'F' THEN 150000 ELSE 0 END AS sa,
         |    ($hb) % 800000
         |      + CASE WHEN o_orderstatus = 'F' THEN 250000 ELSE 0 END AS sb
         |  FROM orders),
         |c AS (SELECT o_orderkey,
         |    CASE WHEN (CASE WHEN sa >= 400000 THEN 1 ELSE 0 END) = y
         |      THEN 1 ELSE 0 END AS ca,
         |    CASE WHEN (CASE WHEN sb >= 400000 THEN 1 ELSE 0 END) = y
         |      THEN 1 ELSE 0 END AS cb FROM o),
         |reps AS (SELECT c.o_orderkey, c.ca, c.cb, rr.r,
         |    ($hu) % 1000000 AS u
         |  FROM c, (SELECT unnest(range(0, 100)) AS r) rr),
         |wts AS (SELECT r, ca, cb,
         |    CASE WHEN u < 367879 THEN 0 WHEN u < 735758 THEN 1
         |      WHEN u < 919698 THEN 2 WHEN u < 981011 THEN 3
         |      WHEN u < 996340 THEN 4 WHEN u < 999405 THEN 5
         |      WHEN u < 999916 THEN 6 ELSE 7 END AS w
         |  FROM reps),
         |byrep AS (SELECT r, CAST(SUM(w * ca) AS BIGINT) AS na,
         |    CAST(SUM(w * cb) AS BIGINT) AS nb, CAST(SUM(w) AS BIGINT) AS nw
         |  FROM wts GROUP BY r),
         |gaps AS (SELECT r,
         |    CAST(CASE WHEN nb >= na
         |      THEN (nb - na) * 1000000 // GREATEST(nw, 1)
         |      ELSE -((na - nb) * 1000000 // GREATEST(nw, 1)) END AS BIGINT)
         |      AS d_ppm
         |  FROM byrep),
         |rk AS (SELECT d_ppm, ROW_NUMBER() OVER (ORDER BY d_ppm, r) AS rk
         |  FROM gaps)
         |SELECT CAST(COUNT(*) AS BIGINT) AS n_replicas,
         |  CAST(SUM(CASE WHEN d_ppm > 0 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_b_better,
         |  CAST(SUM(CASE WHEN d_ppm > 0 THEN 1 ELSE 0 END) * 1000000
         |    // COUNT(*) AS BIGINT) AS p_b_better_ppm,
         |  CAST(CASE WHEN SUM(d_ppm) >= 0 THEN SUM(d_ppm) // COUNT(*)
         |    ELSE -((-SUM(d_ppm)) // COUNT(*)) END AS BIGINT) AS mean_diff_ppm,
         |  CAST(MAX(CASE WHEN rk = 3 THEN d_ppm END) AS BIGINT) AS ci_lo_ppm,
         |  CAST(MAX(CASE WHEN rk = 98 THEN d_ppm END) AS BIGINT) AS ci_hi_ppm
         |FROM rk""".stripMargin
    },

    // same doubled-rank census; gini's subtraction stays on the
    // nonnegative floor-quotient so // and div agree
    "q_eval_mcnemar" -> {
      val ha = DedupQueries.sqlHex60Public("md5('sc:' || CAST(o_orderkey AS VARCHAR))")
      val hb = DedupQueries.sqlHex60Public("md5('sc2:' || CAST(o_orderkey AS VARCHAR))")
      s"""WITH o AS (SELECT
         |    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y,
         |    ($ha) % 800000
         |      + CASE WHEN o_orderstatus = 'F' THEN 150000 ELSE 0 END AS sa,
         |    ($hb) % 800000
         |      + CASE WHEN o_orderstatus = 'F' THEN 250000 ELSE 0 END AS sb
         |  FROM orders),
         |c AS (SELECT
         |    (CASE WHEN sa >= 400000 THEN 1 ELSE 0 END) = y AS ca,
         |    (CASE WHEN sb >= 400000 THEN 1 ELSE 0 END) = y AS cb FROM o),
         |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
         |    CAST(SUM(CASE WHEN ca AND cb THEN 1 ELSE 0 END) AS BIGINT) AS both_right,
         |    CAST(SUM(CASE WHEN NOT ca AND NOT cb THEN 1 ELSE 0 END) AS BIGINT) AS both_wrong,
         |    CAST(SUM(CASE WHEN ca AND NOT cb THEN 1 ELSE 0 END) AS BIGINT) AS a_only,
         |    CAST(SUM(CASE WHEN NOT ca AND cb THEN 1 ELSE 0 END) AS BIGINT) AS b_only
         |  FROM c)
         |SELECT n_items, both_right, both_wrong, a_only, b_only,
         |  CAST((b_only - a_only) * (b_only - a_only) * 1000000
         |    // GREATEST(a_only + b_only, 1) AS BIGINT) AS mcnemar_x2_ppm,
         |  CAST(GREATEST(ABS(b_only - a_only) - 1, 0)
         |    * GREATEST(ABS(b_only - a_only) - 1, 0) * 1000000
         |    // GREATEST(a_only + b_only, 1) AS BIGINT) AS mcnemar_cc_ppm,
         |  CAST(CASE WHEN b_only > a_only THEN 1 WHEN b_only < a_only THEN -1
         |    ELSE 0 END AS INT) AS better_model
         |FROM a""".stripMargin
    },

    "q_eval_auc" -> {
      val hv = DedupQueries.sqlHex60Public("md5('sc:' || CAST(o_orderkey AS VARCHAR))")
      s"""WITH o AS (SELECT ($hv) % 80000
         |      + CASE WHEN o_orderstatus = 'F' THEN 15000 ELSE 0 END AS v,
         |    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS w1,
         |    CASE WHEN o_orderstatus != 'F' THEN 1 ELSE 0 END AS w2
         |  FROM orders),
         |vals AS (SELECT v, CAST(SUM(w1) AS BIGINT) AS d1,
         |           CAST(SUM(w2) AS BIGINT) AS d2 FROM o GROUP BY v),
         |c AS (SELECT v, d1, d2,
         |        SUM(d1 + d2) OVER (ORDER BY v) - d1 - d2 AS below FROM vals),
         |a AS (SELECT CAST(SUM(d1) AS BIGINT) AS n1, CAST(SUM(d2) AS BIGINT) AS n2,
         |        CAST(SUM(d1 * (2 * below + d1 + d2 + 1)) AS BIGINT) AS r2 FROM c),
         |b AS (SELECT n1, n2, r2 - n1 * (n1 + 1) AS u1_x2 FROM a)
         |SELECT n1 AS n_pos, n2 AS n_neg, u1_x2,
         |  CAST(u1_x2::HUGEINT * 1000000 // (2 * n1 * n2) AS BIGINT) AS auc_ppm,
         |  CAST(u1_x2::HUGEINT * 1000000 // (n1 * n2) - 1000000 AS BIGINT) AS gini_ppm
         |FROM b""".stripMargin
    },

    "q_eval_ece" -> {
      val hv = DedupQueries.sqlHex60Public("md5('sc:' || CAST(o_orderkey AS VARCHAR))")
      s"""WITH p AS (SELECT ($hv) % 800000
         |      + CASE WHEN o_orderstatus = 'F' THEN 150000 ELSE 0 END AS score,
         |    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
         |  FROM orders),
         |g AS (SELECT score // 100000 AS bin, CAST(count(*) AS BIGINT) AS n,
         |        CAST(SUM(y) AS BIGINT) AS n_pos,
         |        CAST(SUM(score) AS BIGINT) AS sum_score
         |      FROM p GROUP BY 1)
         |SELECT bin, n, n_pos,
         |  CAST(n_pos * 1000000 // n AS BIGINT) AS acc_ppm,
         |  CAST(sum_score // n AS BIGINT) AS conf_ppm,
         |  CAST(abs(n_pos * 1000000 // n - sum_score // n) AS BIGINT) AS gap_ppm,
         |  CAST(n * abs(n_pos * 1000000 // n - sum_score // n) AS BIGINT) AS weighted_gap
         |FROM g ORDER BY bin""".stripMargin
    },

    "q_agg_mannwhitney" ->
      """WITH o AS (SELECT CAST(floor(o_totalprice * 100) AS BIGINT) AS v,
        |    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS w1,
        |    CASE WHEN o_orderstatus != 'F' THEN 1 ELSE 0 END AS w2
        |  FROM orders),
        |vals AS (SELECT v, CAST(SUM(w1) AS BIGINT) AS d1,
        |           CAST(SUM(w2) AS BIGINT) AS d2 FROM o GROUP BY v),
        |c AS (SELECT v, d1, d2,
        |        SUM(d1 + d2) OVER (ORDER BY v) - d1 - d2 AS below FROM vals),
        |a AS (SELECT CAST(SUM(d1) AS BIGINT) AS n1, CAST(SUM(d2) AS BIGINT) AS n2,
        |        CAST(SUM(d1 * (2 * below + d1 + d2 + 1)) AS BIGINT) AS r2,
        |        CAST(SUM((d1 + d2) * (d1 + d2) * (d1 + d2) - d1 - d2) AS BIGINT)
        |          AS tie_t FROM c),
        |b AS (SELECT n1, n2, r2 - n1 * (n1 + 1) AS u1_x2, tie_t, n1 + n2 AS n
        |      FROM a),
        |z AS (SELECT n1, n2, u1_x2, tie_t,
        |        CAST((u1_x2 - n1 * n2)::HUGEINT * (u1_x2 - n1 * n2)
        |          * 1000000 // (n1 * n2) AS BIGINT) AS d1q,
        |        CAST(3::HUGEINT * n * (n - 1) * 1000000
        |          // (n::HUGEINT * (n - 1) * (n + 1) - tie_t) AS BIGINT) AS d2q
        |      FROM b)
        |SELECT n1, n2, u1_x2, tie_t,
        |  CAST(d1q::HUGEINT * d2q // 1000000 AS BIGINT) AS z2_ppm,
        |  d1q::HUGEINT * d2q // 1000000 > 3841600 AS reject_95
        |FROM z""".stripMargin,

    "q_feature_lift" ->
      """WITH b AS (SELECT DISTINCT user_id FROM events
        |           WHERE event_type = 'purchase'),
        |f AS (SELECT CAST(floor(c_acctbal / 1000) AS BIGINT) AS band,
        |        CASE WHEN c_custkey IN (SELECT user_id FROM b)
        |             THEN 1 ELSE 0 END AS cv
        |      FROM customer),
        |bands AS (SELECT band, CAST(count(*) AS BIGINT) AS n,
        |            CAST(COALESCE(SUM(cv), 0) AS BIGINT) AS k
        |          FROM f GROUP BY band),
        |t AS (SELECT CAST(SUM(n) AS BIGINT) AS n_tot,
        |        CAST(SUM(k) AS BIGINT) AS k_tot FROM bands)
        |SELECT band, n, k AS n_converted,
        |  CAST(k * 1000000 // n AS BIGINT) AS rate_ppm,
        |  CAST(k::HUGEINT * n_tot * 1000000 // (n::HUGEINT * k_tot)
        |    AS BIGINT) AS lift_ppm
        |FROM bands, t ORDER BY band""".stripMargin,

    "q_agg_pct_exact" ->
      """WITH r AS (SELECT l_returnflag AS g,
        |             CAST(floor(l_extendedprice * 100) AS BIGINT) AS v
        |           FROM lineitem),
        |n AS (SELECT g, CAST(count(*) AS BIGINT) AS n FROM r GROUP BY g),
        |rk AS (SELECT g, v, row_number() OVER (PARTITION BY g ORDER BY v) AS rn
        |       FROM r)
        |SELECT rk.g AS l_returnflag,
        |  CAST(MIN(CASE WHEN rn = (n + 1) // 2 THEN v END) AS BIGINT) AS p50_cents,
        |  CAST(MIN(CASE WHEN rn = (95 * n + 99) // 100 THEN v END) AS BIGINT)
        |    AS p95_cents,
        |  CAST(MIN(CASE WHEN rn = (99 * n + 99) // 100 THEN v END) AS BIGINT)
        |    AS p99_cents
        |FROM rk JOIN n ON n.g = rk.g GROUP BY rk.g ORDER BY 1""".stripMargin,

    "q_agg_mad_hc" ->
      """WITH r AS (SELECT l_returnflag AS g,
        |             CAST(floor(l_extendedprice * 100) AS BIGINT) AS v
        |           FROM lineitem),
        |n AS (SELECT g, CAST(count(*) AS BIGINT) AS n FROM r GROUP BY g),
        |rk AS (SELECT g, v, row_number() OVER (PARTITION BY g ORDER BY v) AS rn
        |       FROM r),
        |m AS (SELECT rk.g,
        |        CAST(MIN(CASE WHEN rn = (n + 1) // 2 THEN v END) AS BIGINT) AS med
        |      FROM rk JOIN n ON n.g = rk.g GROUP BY rk.g),
        |dv AS (SELECT r.g, ABS(r.v - m.med) AS dev
        |       FROM r JOIN m ON m.g = r.g),
        |dk AS (SELECT g, dev, row_number() OVER (PARTITION BY g ORDER BY dev) AS rn
        |       FROM dv)
        |SELECT dk.g AS l_returnflag, m.med AS med_cents,
        |  CAST(MIN(CASE WHEN dk.rn = (n.n + 1) // 2 THEN dk.dev END) AS BIGINT)
        |    AS mad_cents
        |FROM dk JOIN n ON n.g = dk.g JOIN m ON m.g = dk.g
        |GROUP BY dk.g, m.med ORDER BY 1""".stripMargin,

    "q_agg_winsor_hc" ->
      """WITH r AS (SELECT l_returnflag AS g,
        |             CAST(floor(l_extendedprice * 100) AS BIGINT) AS v
        |           FROM lineitem),
        |n AS (SELECT g, CAST(count(*) AS BIGINT) AS n FROM r GROUP BY g),
        |rk AS (SELECT g, v, row_number() OVER (PARTITION BY g ORDER BY v) AS rn
        |       FROM r),
        |th AS (SELECT rk.g,
        |         CAST(MIN(CASE WHEN rn = (5 * n + 99) // 100 THEN v END) AS BIGINT)
        |           AS lo,
        |         CAST(MIN(CASE WHEN rn = (95 * n + 99) // 100 THEN v END) AS BIGINT)
        |           AS hi
        |       FROM rk JOIN n ON n.g = rk.g GROUP BY rk.g)
        |SELECT r.g AS l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |  th.lo AS p05_cents, th.hi AS p95_cents,
        |  CAST(SUM(GREATEST(th.lo, LEAST(th.hi, r.v))) AS BIGINT) AS wsum_cents,
        |  CAST(SUM(GREATEST(th.lo, LEAST(th.hi, r.v))) // count(*) AS BIGINT)
        |    AS wmean_cents
        |FROM r JOIN th ON th.g = r.g
        |GROUP BY r.g, th.lo, th.hi ORDER BY 1""".stripMargin,

    "q_feature_loo" ->
      """WITH o AS (SELECT o_orderpriority AS pri,
        |             CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
        |           FROM orders),
        |g AS (SELECT pri, CAST(SUM(cents) AS BIGINT) AS sg,
        |             CAST(COUNT(*) AS BIGINT) AS ng FROM o GROUP BY pri),
        |gl AS (SELECT CAST(SUM(cents) AS BIGINT) AS stot,
        |              CAST(COUNT(*) AS BIGINT) AS ntot FROM o),
        |r AS (SELECT o.pri, o.cents, g.sg - o.cents AS num, g.ng - 1 AS den,
        |             gl.stot, gl.ntot
        |      FROM o JOIN g ON g.pri = o.pri CROSS JOIN gl)
        |SELECT pri, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(MIN(CASE WHEN den = 0 THEN NULL ELSE num // den END) AS BIGINT)
        |    AS enc_min_cents,
        |  CAST(MAX(CASE WHEN den = 0 THEN NULL ELSE num // den END) AS BIGINT)
        |    AS enc_max_cents,
        |  CAST(COALESCE(SUM(CASE WHEN CAST(num AS HUGEINT) * ntot
        |                              > CAST(stot AS HUGEINT) * den
        |                         THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_above_global
        |FROM r GROUP BY pri ORDER BY pri""".stripMargin,

    "q_agg_rollup" ->
      s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n, ${sqlDsum("l_quantity")} AS sum_qty
         |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
         |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "q_agg_cube" ->
      s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n, ${sqlDsum("o_totalprice")} AS total
         |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
         |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,
    "q_agg_stats" ->
      """SELECT o_orderstatus, MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price,
        |       MIN(o_orderdate) AS first_date, MAX(o_orderdate) AS last_date, COUNT(*) AS n
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_agg_stddev" ->
      s"""WITH sums AS (
         |  SELECT l_returnflag, CAST(COUNT(*) AS DOUBLE) AS n,
         |    ${sqlDsum("l_quantity")} AS sx,
         |    ${sqlDsum("l_quantity * l_quantity")} AS sxx
         |  FROM lineitem GROUP BY l_returnflag)
         |SELECT l_returnflag,
         |  sxx / n - (sx / n) * (sx / n) AS var_pop,
         |  sqrt(sxx / n - (sx / n) * (sx / n)) AS stddev_pop
         |FROM sums ORDER BY l_returnflag""".stripMargin,
    "q_agg_covar" ->
      s"""WITH sums AS (
         |  SELECT l_returnflag,
         |    CAST(COUNT(*) AS DOUBLE) AS n,
         |    ${sqlDsum("l_quantity")} AS sx,
         |    ${sqlDsum("l_extendedprice")} AS sy,
         |    ${sqlDsum("l_quantity * l_extendedprice")} AS sxy,
         |    ${sqlDsum("l_quantity * l_quantity")} AS sxx,
         |    ${sqlDsumScaled("l_extendedprice * l_extendedprice")} AS syy
         |  FROM lineitem GROUP BY l_returnflag)
         |SELECT l_returnflag,
         |  (sxy - sx * sy / n) / n AS covar_pop,
         |  (sxy - sx * sy / n) /
         |    (sqrt(sxx - sx * sx / n) * sqrt(syy - sy * sy / n)) AS corr
         |FROM sums ORDER BY l_returnflag""".stripMargin,
    "q_agg_argmax" ->
      """SELECT o_orderstatus,
        |  max_by(o_totalprice, o_orderkey) AS latest_price,
        |  min_by(o_totalprice, o_orderkey) AS first_price,
        |  MAX(o_orderkey) AS max_key
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_agg_bydate" ->
      s"""SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type, COUNT(*) AS n, ${sqlDsum("value")} AS sum_value
         |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin,
    "q_agg_moments" ->
      s"""WITH means AS (
         |  SELECT l_returnflag, ${sqlDsum("l_quantity")} / COUNT(*) AS mean, COUNT(*) AS n
         |  FROM lineitem GROUP BY l_returnflag),
         |cm AS (
         |  SELECT l.l_returnflag,
         |    ${sqlDsumScaled("(l_quantity - mean) * (l_quantity - mean)")} AS m2s,
         |    ${sqlDsumScaled("(l_quantity - mean) * (l_quantity - mean) * (l_quantity - mean)")} AS m3s,
         |    ${sqlDsumScaled("(l_quantity - mean) * (l_quantity - mean) * (l_quantity - mean) * (l_quantity - mean)")} AS m4s
         |  FROM lineitem l JOIN means m ON l.l_returnflag = m.l_returnflag
         |  GROUP BY l.l_returnflag)
         |SELECT c.l_returnflag, mean, n,
         |  m2s / n AS variance,
         |  (m3s / n) / (sqrt(m2s / n) * (m2s / n)) AS skewness,
         |  (m4s / n) / ((m2s / n) * (m2s / n)) AS kurtosis
         |FROM cm c JOIN means m ON c.l_returnflag = m.l_returnflag
         |ORDER BY c.l_returnflag""".stripMargin,
    "q_crosstab" ->
      """SELECT CAST(l_returnflag AS VARCHAR) AS l_returnflag_l_linestatus,
        |  CAST(COUNT(*) FILTER (WHERE l_linestatus = 'F') AS BIGINT) AS "F",
        |  CAST(COUNT(*) FILTER (WHERE l_linestatus = 'O') AS BIGINT) AS "O"
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_agg_2phase_distinct" ->
      """SELECT l_returnflag, COUNT(*) AS n_parts
        |FROM (SELECT DISTINCT l_returnflag, l_partkey FROM lineitem)
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_agg_stringagg" ->
      """SELECT CAST(c_nationkey AS INT) AS nk,
        |  array_to_string(list_sort(list(DISTINCT c_mktsegment)), ',') AS segments,
        |  CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT) AS n_segments
        |FROM customer GROUP BY 1 ORDER BY nk""".stripMargin,
    "q_agg_iqr" ->
      """WITH q AS (SELECT c_mktsegment,
        |             quantile_cont(c_acctbal, 0.25) AS q1,
        |             quantile_cont(c_acctbal, 0.75) AS q3
        |           FROM customer GROUP BY 1),
        |f AS (SELECT c_mktsegment, q1, q3,
        |        q1 - 1.5 * (q3 - q1) AS lo, q3 + 1.5 * (q3 - q1) AS hi FROM q)
        |SELECT c.c_mktsegment, q1, q3, lo, hi,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(COUNT(*) FILTER (WHERE c_acctbal < lo OR c_acctbal > hi) AS BIGINT) AS n_outliers,
        |  CAST(COUNT(*) FILTER (WHERE c_acctbal < lo OR c_acctbal > hi) * 1000000
        |    // COUNT(*) AS BIGINT) AS outlier_ppm
        |FROM customer c JOIN f USING (c_mktsegment)
        |GROUP BY 1, 2, 3, 4, 5 ORDER BY c.c_mktsegment""".stripMargin
  )
}
