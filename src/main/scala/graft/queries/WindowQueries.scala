package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.QueryBuilder.scan
import graft.ops.ExactAgg

/** Window-function surface (SURVEY §2.5 — absent in the reference). Frame
  * orderings include a unique key (o_orderkey) so ranks and running sums
  * are deterministic.
  */
object WindowQueries {

  private def perCustomer = Window.partitionBy(col("o_custkey"))
    .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // CROSTON'S METHOD (Croston 1972) — intermittent-demand forecasting,
    // the sibling q_ts_holt can't replace: when most days have ZERO
    // demand, SES over the raw series biases toward zero; Croston
    // smooths demand SIZES and demand INTERVALS separately and
    // forecasts size/interval. With α = 1/2 the SES recursion has a
    // CLOSED dyadic form (s_n = (d_1 + Σ_{j≥2} 2^(j-2)·d_j) / 2^(n-1)),
    // so the whole method is one weighted sum per series — fully
    // relational, no iteration — over the last 40 demand events (the
    // 2^-40 tail is sub-integer at x6 scale; bounding the window is
    // also the bounded-state form a stream would keep). Pure integers;
    // the x6 divisions widen through DECIMAL(38). Series = per-user
    // purchase demand on the FIXED user_id < 8 slab (the r7 fixed-slab
    // scale rule — per-user purchases stay genuinely intermittent,
    // ~3-day gaps, at EVERY scale factor, where any corpus-wide
    // grouping densifies as the corpus grows)
    "q_ts_croston" -> ((s: SparkSession, d: String) => {
      import org.apache.spark.sql.expressions.Window
      val K = 40
      val dd = scan(s, d, "events")
        .filter(col("event_type") === "purchase" && col("user_id") < 8)
        .select(col("user_id").as("store"),
          date_trunc("day", col("ts")).as("day"))
        .groupBy(col("store"), col("day")).agg(count(lit(1)).as("dem"))
      val wAsc = Window.partitionBy(col("store")).orderBy(col("day"))
      val withGap = dd
        .withColumn("gap",
          coalesce(expr("CAST(datediff(day, lag(day) OVER " +
            "(PARTITION BY store ORDER BY day)) AS BIGINT)"), lit(1L)))
        .withColumn("rn_desc", row_number().over(
          Window.partitionBy(col("store")).orderBy(col("day").desc)))
      val win = withGap.filter(col("rn_desc") <= K)
        .withColumn("j", row_number().over(wAsc))
      val agg = win.groupBy(col("store")).agg(
        max(col("j")).as("m"),
        sum(when(col("j") === 1, col("dem"))
          .otherwise(expr("shiftleft(CAST(1 AS BIGINT), CAST(j - 2 AS INT)) * dem")))
          .as("snum"),
        sum(when(col("j") === 1, col("gap"))
          .otherwise(expr("shiftleft(CAST(1 AS BIGINT), CAST(j - 2 AS INT)) * gap")))
          .as("inum"))
      val nTot = dd.groupBy(col("store")).agg(count(lit(1)).as("n_demand"))
      nTot.join(agg, Seq("store"))
        .select(col("store"), col("n_demand"), col("m"),
          expr("CAST(CAST(snum AS DECIMAL(38,0)) * 1000000 div " +
            "shiftleft(CAST(1 AS BIGINT), CAST(m - 1 AS INT)) AS BIGINT)")
            .as("size_x6"),
          expr("CAST(CAST(inum AS DECIMAL(38,0)) * 1000000 div " +
            "shiftleft(CAST(1 AS BIGINT), CAST(m - 1 AS INT)) AS BIGINT)")
            .as("interval_x6"),
          expr("CAST(CAST(snum AS DECIMAL(38,0)) * 1000000 div inum AS BIGINT)")
            .as("croston_x6"))
        .orderBy(col("store"))
    }),

    "q_win_rank" -> ((s: SparkSession, d: String) => {
      scan(s, d, "orders")
        .withColumn("rn", row_number().over(perCustomer))
        .withColumn("rk", rank().over(Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate").asc)))
        .withColumn("drk", dense_rank().over(Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate").asc)))
        .select(col("o_custkey"), col("o_orderkey"), col("rn"), col("rk"), col("drk"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    "q_win_lag_lead" -> ((s: SparkSession, d: String) => {
      scan(s, d, "orders")
        .withColumn("prev_price", lag(col("o_totalprice"), 1).over(perCustomer))
        .withColumn("next_price", lead(col("o_totalprice"), 1).over(perCustomer))
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("prev_price"), col("next_price"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // running total within customer — exact decimal running sum
    "q_win_runsum" -> ((s: SparkSession, d: String) => {
      val frame = perCustomer.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      scan(s, d, "orders")
        .withColumn("running_total", ExactAgg.dsumOver(col("o_totalprice"), frame))
        .withColumn("cum_n", count(lit(1)).over(frame))
        .select(col("o_custkey"), col("o_orderkey"), col("running_total"), col("cum_n"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // ntile quartiles of customers by balance (global window — fine for a
    // report-shaped output; partition-less windows don't scale and real
    // pipelines would bucket first, so keep the output small)
    "q_win_ntile" -> ((s: SparkSession, d: String) => {
      scan(s, d, "customer")
        .withColumn("quartile", ntile(4).over(Window.orderBy(col("c_acctbal").asc, col("c_custkey").asc)))
        .select(col("c_custkey"), col("c_acctbal"), col("quartile"))
        .orderBy(col("c_custkey"))
    }),

    // first/last/nth value over a full-partition frame — frame-boundary
    // semantics (last_value needs the unbounded-following frame or it
    // degenerates to the current row on both engines)
    "q_win_nth" -> ((s: SparkSession, d: String) => {
      val full = perCustomer.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      scan(s, d, "orders")
        .withColumn("first_key", first(col("o_orderkey")).over(full))
        .withColumn("last_key", last(col("o_orderkey")).over(full))
        .withColumn("second_key", nth_value(col("o_orderkey"), 2).over(full))
        .select(col("o_custkey"), col("o_orderkey"),
          col("first_key"), col("last_key"), col("second_key"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // rank ratios — exact divisions, identical IEEE on both engines
    "q_win_pct" -> ((s: SparkSession, d: String) => {
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
      scan(s, d, "orders")
        .withColumn("pr", percent_rank().over(w))
        .withColumn("cd", cume_dist().over(w))
        .select(col("o_custkey"), col("o_orderkey"), col("pr"), col("cd"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // sliding row-frame average (3-row centered window)
    "q_win_frame" -> ((s: SparkSession, d: String) => {
      val frame = perCustomer.rowsBetween(-1, 1)
      scan(s, d, "orders")
        .withColumn("sum3", ExactAgg.dsumOver(col("o_totalprice"), frame))
        .withColumn("n3", count(lit(1)).over(frame))
        .select(col("o_custkey"), col("o_orderkey"), col("sum3"), col("n3"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // RANGE-frame window (value range, not row count): per customer,
    // order count and cents total within the 30 days PRECEDING each
    // order — the frame irregular event spacing needs, where a ROWS
    // frame is simply wrong (it counts neighbors, not days). Bounds on
    // the integer day index; ties (same-day orders) share one frame by
    // RANGE semantics on both engines; sums in exact cents
    "q_win_range" -> ((s: SparkSession, d: String) => {
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("di"))
        .rangeBetween(-30, 0)
      scan(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          datediff(col("o_orderdate").cast("date"),
            lit("1992-01-06").cast("date")).cast("long").as("di"),
          floor(col("o_totalprice") * 100).cast("long").as("cents"))
        .withColumn("sum30_cents", sum(col("cents")).over(w))
        .withColumn("n30", count(lit(1)).over(w))
        .select(col("o_custkey"), col("o_orderkey"), col("di"),
          col("sum30_cents"), col("n30"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // rolling population stddev over the trailing 4 orders (current + 3
    // prior): the sums are exact decimals, the moment formula runs on
    // identical doubles both sides
    "q_win_rollstd" -> ((s: SparkSession, d: String) => {
      val frame = perCustomer.rowsBetween(-3, 0)
      val n = count(lit(1)).over(frame).cast("double")
      val sx = ExactAgg.dsumOver(col("o_totalprice"), frame)
      // price² is a computed double ~1e9+: floor-scaled, not decimal-cast
      val sxx = ExactAgg.dsumScaledOver(col("o_totalprice") * col("o_totalprice"), frame, scale = 3)
      scan(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          sqrt(greatest(sxx / n - (sx / n) * (sx / n), lit(0.0))).as("roll_std"),
          n.cast("long").as("n_window"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // ratio-to-report: each order's share of its customer's exact total
    "q_win_ratio" -> ((s: SparkSession, d: String) => {
      val byCust = Window.partitionBy(col("o_custkey"))
      scan(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          (col("o_totalprice") / ExactAgg.dsumOver(col("o_totalprice"), byCust)).as("share"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // EWMA (α = 1/2) per user over the event-time-ordered value stream.
    // Halving is EXACT in binary floating point, and both engines fold
    // left-to-right over the same ordered list (Spark `aggregate` with
    // the first element as init ≡ DuckDB `list_reduce`), so this
    // inherently-sequential statistic still hash-matches bit-for-bit.
    // A non-dyadic α would need the floor-scaling treatment instead
    "q_ewma" -> ((s: SparkSession, d: String) => {
      val evs = array_sort(collect_list(struct(col("ts"), col("event_id"), col("value"))))
      scan(s, d, "events")
        .groupBy(col("user_id"))
        .agg(evs.as("evs"))
        .select(col("user_id"),
          size(col("evs")).as("n"),
          aggregate(
            slice(col("evs"), lit(2), size(col("evs")) - 1),
            element_at(col("evs"), 1).getField("value"),
            (acc, e) => acc / lit(2) + e.getField("value") / lit(2)).as("ewma"))
        .orderBy(col("user_id"))
    }),

    // time-series resample + forward-fill: high-value events (> 150)
    // bucketed to days leave gaps; a generated day×type spine left-joins
    // the sparse aggregate, missing counts become 0, and the last seen
    // daily sum carries forward (last(ignoreNulls) over an ordered
    // frame). The spine is dimension-sized — the fact table never feels
    // the cross join
    "q_ts_resample" -> ((s: SparkSession, d: String) => {
      val ev = scan(s, d, "events").filter(col("value") > 150)
      val daily = ev.groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
        .agg(count(lit(1)).as("n"), ExactAgg.dsum(col("value")).as("sum_value"))
      val bounds = scan(s, d, "events")
        .agg(date_trunc("day", min(col("ts"))).as("d0"), date_trunc("day", max(col("ts"))).as("d1"))
      val spine = bounds.select(explode(sequence(col("d0"), col("d1"), expr("INTERVAL 1 DAY"))).as("day"))
      val types = scan(s, d, "events").select(col("event_type")).distinct()
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      spine.crossJoin(types)
        .join(daily, Seq("day", "event_type"), "left")
        .select(col("day"), col("event_type"),
          coalesce(col("n"), lit(0L)).as("n"),
          last(col("sum_value"), ignoreNulls = true).over(w).as("ffill_sum"))
        .orderBy(col("day"), col("event_type"))
    }),

    // time-series ANOMALY flags: daily event counts vs their own rolling
    // 7-day window — spike iff squared deviation from the rolling mean
    // exceeds k²·variance (k=2). sqrt-FREE on purpose: mean/variance come
    // from exact integer rolling sums, and comparing (x-μ)² > k²σ²
    // avoids the one operation whose rounding could differ. The day
    // grain makes the global window tiny (state ∝ days, not events)
    "q_ts_anomaly" -> ((s: SparkSession, d: String) => {
      val daily = scan(s, d, "events")
        .groupBy(date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.orderBy(col("day")).rowsBetween(-6, Window.currentRow)
      daily
        .withColumn("rsum", sum(col("cnt")).over(w))
        .withColumn("rsumsq", sum(col("cnt") * col("cnt")).over(w))
        .withColumn("n", count(lit(1)).over(w))
        .withColumn("mean", col("rsum").cast("double") / col("n").cast("double"))
        .withColumn("variance",
          (col("rsumsq").cast("double") -
            col("rsum").cast("double") * col("rsum").cast("double") / col("n").cast("double"))
            / col("n").cast("double"))
        .withColumn("is_spike",
          (col("cnt").cast("double") - col("mean")) * (col("cnt").cast("double") - col("mean"))
            > lit(4.0) * col("variance"))
        .select(col("day"), col("cnt"), col("mean"), col("variance"), col("is_spike"))
        .orderBy(col("day"))
    }),

    // CUSUM change-point detection (Page 1954) over daily event counts
    // — the SEQUENTIAL drift detector (q_dq_drift's TVD census compares
    // two fixed snapshots; CUSUM accumulates evidence day by day and is
    // what a monitoring job runs). The recursion
    // S⁺_t = max(0, S⁺_{t-1} + (x_t − k − slack)) is NOT a built-in
    // window function, but it telescopes: with prefix sum P_t of the
    // drifts, S⁺_t = P_t − min(0, min_{j≤t} P_j) — two exact-integer
    // running windows, no recursion, engine-portable. The reference
    // level k is the series' own global mean (floor), slack = k/20 (5%);
    // both windows run over the DAY-grain series (state ∝ days, not
    // events — the q_ts_anomaly precedent). Alarm: S⁺ > 8·slack
    "q_ts_cusum" -> ((s: SparkSession, d: String) => {
      val daily = scan(s, d, "events")
        .groupBy(date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as("cnt"))
      val ref = daily.agg(expr("sum(cnt) div count(1)").as("k"))
        .withColumn("slack", greatest(expr("k div 20"), lit(1L)))
      val run = Window.orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      daily.crossJoin(broadcast(ref))
        .withColumn("drift", col("cnt") - col("k") - col("slack"))
        .withColumn("p", sum(col("drift")).over(run))
        .withColumn("s_plus", col("p") - least(lit(0L), min(col("p")).over(run)))
        .withColumn("is_alarm", col("s_plus") > col("slack") * 8L)
        .select(col("day"), col("cnt"), col("s_plus"), col("is_alarm"))
        .orderBy(col("day"))
    }),

    // CHANGEPOINT DETECTION (binary-segmentation first split, the
    // CUSUM-argmax form): per event type, the day t maximizing
    // |n·pre_t − t·S| — the n-scaled cumulative deviation from the
    // series mean, whose argmax is the classic single-changepoint
    // estimator. Pure integers end to end (the ×n scaling clears the
    // rational mean, magnitudes ≤ n_days·total_events ≪ 2^63), ties
    // broken to the earliest day via a struct-max argmax — no second
    // pass, no window over the fact table (day-grain census only)
    "q_ts_changepoint" -> ((s: SparkSession, d: String) => {
      val daily = scan(s, d, "events")
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as("cnt"))
      val seq = Window.partitionBy(col("event_type")).orderBy(col("day"))
      val run = seq.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tot = Window.partitionBy(col("event_type"))
      daily
        .withColumn("t", row_number().over(seq).cast("long"))
        .withColumn("pre", sum(col("cnt")).over(run))
        .withColumn("n", count(lit(1)).over(tot))
        .withColumn("s", sum(col("cnt")).over(tot))
        .withColumn("c", col("n") * col("pre") - col("t") * col("s"))
        .groupBy(col("event_type"))
        .agg(max(struct(abs(col("c")).as("absc"), (-col("t")).as("nt"),
            col("day"), col("c"))).as("m"),
          max(col("n")).as("n_days"))
        .select(col("event_type"), col("m.day").as("change_day"),
          col("m.c").as("c_scaled"), col("n_days"))
        .orderBy(col("event_type"))
    }),

    // OHLC RESAMPLING (financial bars): per-day open/high/low/close of
    // order totals — open/close via min_by/max_by on the UNIQUE intraday
    // sequence key (o_orderkey), so the bar is deterministic on both
    // engines without any window sort; one combinable aggregation
    "q_ts_ohlc" -> ((s: SparkSession, d: String) => {
      scan(s, d, "orders")
        .groupBy(date_trunc("day", col("o_orderdate")).as("day"))
        .agg(
          min_by(col("o_totalprice"), col("o_orderkey")).as("open_px"),
          max(col("o_totalprice")).as("high_px"),
          min(col("o_totalprice")).as("low_px"),
          max_by(col("o_totalprice"), col("o_orderkey")).as("close_px"),
          count(lit(1)).as("n_trades"),
          ExactAgg.dsum(col("o_totalprice")).as("volume"))
        .orderBy(col("day"))
    }),

    // MANN–KENDALL TREND TEST (Mann 1945; the standard nonparametric
    // monotone-trend detector): S = Σ sign(x_j − x_i) over day pairs
    // i<j — exact integers via a self-join on the DAY-GRAIN series
    // (pairs ∝ days², constant in data size at fixed history; ~7M
    // pairs even for a decade of days). Tie-corrected variance kept
    // ×18 in integers; only the final z divides/sqrts in IEEE doubles
    // ROLLING OLS TREND SLOPE (the local trend detector a metrics
    // pipeline runs per series): over each event type's last-7-observed
    // -days frame, the exact least-squares slope of daily count vs day
    // index — num = n·Σxy − Σx·Σy, den = n·Σx² − (Σx)², emitted as
    // sign-decomposed ppm (sign · |num|·1e6 div den) so BOTH engines
    // truncate toward zero identically (Spark div truncates, DuckDB //
    // floors — they disagree on negatives unless the sign is factored
    // out). Five combinable frame sums over one day-grain window; the
    // day census, not the fact table, is what the window sorts
    "q_win_slope" -> ((s: SparkSession, d: String) => {
      import org.apache.spark.sql.expressions.Window
      val daily = scan(s, d, "events")
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("di", datediff(col("day").cast("date"),
          lit("1992-01-06").cast("date")).cast("long"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("di"))
        .rowsBetween(-6, 0)
      daily
        .withColumn("n", count(lit(1)).over(w))
        .withColumn("sx", sum(col("di")).over(w))
        .withColumn("sy", sum(col("cnt")).over(w))
        .withColumn("sxy", sum(col("di") * col("cnt")).over(w))
        .withColumn("sxx", sum(col("di") * col("di")).over(w))
        .withColumn("num", col("n") * col("sxy") - col("sx") * col("sy"))
        .withColumn("den", col("n") * col("sxx") - col("sx") * col("sx"))
        .select(col("event_type"), col("day"), col("cnt").cast("long").as("cnt"),
          col("n").cast("long").as("n_window"),
          when(col("n") < 2, lit(null).cast("long"))
            .otherwise((when(col("num") >= 0, 1L).otherwise(-1L) *
              expr("abs(num) * 1000000 div den")).cast("long")).as("slope_ppm"))
        .orderBy(col("event_type"), col("day"))
    }),

    "q_ts_trend" -> ((s: SparkSession, d: String) => {
      val daily = scan(s, d, "events")
        .groupBy(date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as("cnt"))
      val a = daily.select(col("day").as("da"), col("cnt").as("ca"))
      val b = daily.select(col("day").as("db"), col("cnt").as("cb"))
      val sPairs = a.join(b, col("da") < col("db"))
        .agg(sum(signum(col("cb") - col("ca")).cast("long")).as("s_stat"))
      val ties = daily.groupBy(col("cnt")).agg(count(lit(1)).as("t"))
        .agg(sum(col("t") * (col("t") - 1) * (lit(2) * col("t") + 5)).cast("long").as("tie18"))
      val nRow = daily.agg(count(lit(1)).as("n_days"))
      sPairs.crossJoin(broadcast(nRow)).crossJoin(broadcast(ties))
        .withColumn("var18",
          col("n_days") * (col("n_days") - 1) * (lit(2) * col("n_days") + 5) - col("tie18"))
        .withColumn("z",
          when(col("s_stat") > 0, (col("s_stat") - 1).cast("double"))
            .when(col("s_stat") < 0, (col("s_stat") + 1).cast("double"))
            .otherwise(lit(0.0))
            / sqrt(col("var18").cast("double") / 18.0))
        .select(col("n_days"), col("s_stat"), col("var18"), col("z"),
          (abs(col("z")) > 1.96).as("has_trend"))
    }),

    // FORECAST BACKTEST (model-selection census): one-step-ahead naive
    // (x_{t-1}) vs seasonal-naive (x_{t-7}) baselines over the daily
    // series, scored by milli-MAE and milli-bias on the days where both
    // have a forecast — the which-baseline-wins report every
    // forecasting deploy starts from (Hyndman's "never skip the naive
    // baseline"). Lags and error sums are exact integers over the
    // day-grain series; each method is scored on the SAME eval days so
    // the comparison is apples-to-apples
    "q_ts_forecast" -> ((s: SparkSession, d: String) => {
      val daily = scan(s, d, "events")
        .groupBy(date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.orderBy(col("day"))
      val scored = daily
        .withColumn("f_naive", lag(col("cnt"), 1).over(w))
        .withColumn("f_seasonal", lag(col("cnt"), 7).over(w))
        .filter(col("f_naive").isNotNull && col("f_seasonal").isNotNull)
      scored.select(lit("naive_1").as("method"),
          (col("cnt") - col("f_naive")).as("err"))
        .unionAll(scored.select(lit("seasonal_7").as("method"),
          (col("cnt") - col("f_seasonal")).as("err")))
        .groupBy(col("method"))
        .agg(count(lit(1)).as("n_days"),
          // floor(double-division), NOT integer div: bias can be
          // negative, and Spark's `div` truncates toward zero where
          // DuckDB's `//` floors — floor() of the IEEE quotient is the
          // one spelling both engines agree on for signed values
          expr("floor(sum(abs(err)) * 1000 / count(1))").cast("long").as("mae_milli"),
          expr("floor(sum(err) * 1000 / count(1))").cast("long").as("bias_milli"))
        .orderBy(col("method"))
    }),

    // ROLLING DISTINCT ACTIVES (7-day DAU/WAU): distinct users per
    // trailing 7-day window, ending each day the window is fully
    // inside the data range. COUNT(DISTINCT) is not a window function
    // anywhere — the scalable exact idiom is contribute-to-buckets:
    // each (user, active-day) pair (already deduped, so ∝ actives not
    // events) explodes to the ≤7 report days it supports, then ONE
    // combinable distinct-count per bucket. Cost ∝ 7 × active-pairs —
    // linear, shuffle on (report_day), no per-day rescans. The sketch
    // path (HLL per day + merge) is q_agg_approx_distinct's shape;
    // this is the exact tier
    "q_ts_rolling_dau" -> ((s: SparkSession, d: String) => {
      val actives = scan(s, d, "events")
        .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
        .distinct()
      val bounds = scan(s, d, "events")
        .agg(date_trunc("day", min(col("ts"))).as("d0"),
          date_trunc("day", max(col("ts"))).as("d1"))
      actives
        .select(col("user_id"),
          explode(sequence(col("day"), col("day") + expr("INTERVAL 6 DAYS"),
            expr("INTERVAL 1 DAY"))).as("report_day"))
        .groupBy(col("report_day"))
        .agg(countDistinct(col("user_id")).as("wau"))
        .crossJoin(broadcast(bounds))
        // full windows only: report_day spans [day, day+6], so it is
        // complete iff d0+6 <= report_day <= d1
        .filter(col("report_day") >= col("d0") + expr("INTERVAL 6 DAYS")
          && col("report_day") <= col("d1"))
        .select(col("report_day"), col("wau"))
        .orderBy(col("report_day"))
    }),

    // LONGEST ACTIVITY STREAK census (gaps-and-islands over the
    // distinct active-day relation): within a user, day_index −
    // row_number is constant exactly along a run of consecutive days,
    // so one window + two combinable aggregations yield each user's
    // longest streak; the output is the retention team's histogram
    // (streak length → users). State ∝ users × active days — the
    // distinct census, never the event table; the per-user window
    // sorts ≤ #calendar-days rows
    "q_ts_streaks" -> ((s: SparkSession, d: String) => {
      val days = scan(s, d, "events")
        .select(col("user_id"),
          datediff(date_trunc("day", col("ts")).cast("date"),
            lit("1992-01-06").cast("date")).cast("long").as("di"))
        .distinct()
      val w = Window.partitionBy(col("user_id")).orderBy(col("di"))
      val runs = days.withColumn("grp", col("di") - row_number().over(w))
        .groupBy(col("user_id"), col("grp")).agg(count(lit(1)).as("len"))
      runs.groupBy(col("user_id")).agg(max(col("len")).as("longest"))
        .groupBy(col("longest")).agg(count(lit(1)).as("n_users"))
        .orderBy(col("longest"))
    }),

    // CLASSICAL SEASONAL DECOMPOSITION (one-iteration STL shape,
    // Cleveland 1990 simplified to moving averages): over the daily
    // series, trend = centered 7-day moving average (only where the
    // full window exists), seasonal = per-weekday mean of the
    // detrended series, remainder = the rest. Everything stays in
    // exact integers until ONE final division per component: the
    // 7-day window carries the integer sum (trend = sum/7.0), the
    // detrended series is kept ×7 (7·cnt − trend7, integer), and the
    // weekday means divide integer sums once — so both engines
    // compute identical IEEE doubles with no ordered double
    // accumulation anywhere. Weekday comes from portable date
    // arithmetic (days since a fixed Monday, mod 7), not the
    // engine-specific dayofweek numbering. State ∝ days, not events
    "q_ts_stl" -> ((s: SparkSession, d: String) => {
      val daily = scan(s, d, "events")
        .groupBy(date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as("cnt"))
      val w7 = Window.orderBy(col("day")).rowsBetween(-3, 3)
      val t = daily
        .withColumn("dow", pmod(datediff(col("day").cast("date"),
          lit("1992-01-06").cast("date")), lit(7)).cast("long"))
        .withColumn("t7", sum(col("cnt")).over(w7))
        .withColumn("nw", count(lit(1)).over(w7))
        .withColumn("trend",
          when(col("nw") === 7, col("t7").cast("double") / lit(7.0)))
        .withColumn("detr7",
          when(col("nw") === 7, lit(7L) * col("cnt") - col("t7")))
      val seasonal = t.filter(col("detr7").isNotNull)
        .groupBy(col("dow"))
        .agg(sum(col("detr7")).as("s_num"),
          (lit(7L) * count(lit(1))).as("s_den"))
        .withColumn("seasonal",
          col("s_num").cast("double") / col("s_den").cast("double"))
        .select(col("dow"), col("seasonal"))
      t.join(broadcast(seasonal), Seq("dow"), "left")
        .select(col("day"), col("cnt"), col("dow"), col("trend"), col("seasonal"),
          (col("cnt").cast("double") - col("trend") - col("seasonal")).as("remainder"))
        .orderBy(col("day"))
    }),

    // AUTOCORRELATION FUNCTION r_1..r_7 (the seasonality/memory
    // diagnostic every forecasting pipeline runs first): with the
    // standard estimator r_k = Σ(x_t−μ)(x_{t+k}−μ) / Σ(x_t−μ)², both
    // sides are kept EXACT by scaling out the rational mean μ = S/n:
    // n²·num_k = n²·Σx_t·x_{t+k} − n·S·Σ(x_t+x_{t+k}) + m_k·S² and
    // n²·den = n²·Q − n·S² are pure bigint (S, Q = global sum /
    // sum-of-squares), so r_k is ONE double division. All 7 lags come
    // from a single window pass stacked to (lag, x, xl) rows — one
    // scan, one tiny shuffle. Bigint headroom: day-grain keeps
    // n²·Σxy ≲ 10¹⁷ even at sf1 ×100 (switch the sums to
    // DECIMAL(38,0) if the series ever leaves day grain)
    "q_ts_acf" -> ((s: SparkSession, d: String) => {
      val daily = scan(s, d, "events")
        .groupBy(date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.orderBy(col("day"))
      val lagged = (1 to 7).foldLeft(daily) { (df, k) =>
        df.withColumn(s"l$k", lag(col("cnt"), k).over(w))
      }
      val stacked = lagged.select(col("cnt"),
        expr("stack(7, 1L, l1, 2L, l2, 3L, l3, 4L, l4, 5L, l5, 6L, l6, 7L, l7) AS (lag, xl)"))
        .filter(col("xl").isNotNull)
      val globals = daily.agg(
        count(lit(1)).as("n"), sum(col("cnt")).as("s"),
        sum(col("cnt") * col("cnt")).as("q"))
      stacked.groupBy(col("lag"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("cnt") * col("xl")).as("sxy"),
          sum(col("cnt") + col("xl")).as("sxpy"))
        .crossJoin(broadcast(globals))
        .select(col("lag"), col("n_pairs"),
          ((col("n") * col("n") * col("sxy") - col("n") * col("s") * col("sxpy")
            + col("n_pairs") * col("s") * col("s")).cast("double")
            / (col("n") * col("n") * col("q") - col("n") * col("s") * col("s")).cast("double"))
            .as("r"))
        .orderBy(col("lag"))
    }),

    // LJUNG–BOX PORTMANTEAU TEST (the "is there ANY autocorrelation
    // left" gate run on forecast residuals and raw series alike):
    // Q(K) = n(n+2)·Σ_{k≤K} r_k²/(n−k) for K = 1..7, with each r_k the
    // SAME exact rational as q_ts_acf (bigint cross-multiplied means,
    // one double division). Float discipline: each per-lag term is one
    // double expression, and the cumulative Q(K) is written as an
    // EXPLICIT left-associated sum q1+…+qK over a 7-column pivot —
    // never a windowed float sum, whose accumulation order (segment
    // trees in one engine, sequential frames in the other) is not
    // cross-engine portable. Verdict vs χ²₀.₀₅(K). Day-grain state: the
    // heavy lifting is one scan + one tiny shuffle, like q_ts_acf
    "q_ts_ljungbox" -> ((s: SparkSession, d: String) => {
      val daily = scan(s, d, "events")
        .groupBy(date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.orderBy(col("day"))
      val lagged = (1 to 7).foldLeft(daily) { (df, k) =>
        df.withColumn(s"l$k", lag(col("cnt"), k).over(w))
      }
      val stacked = lagged.select(col("cnt"),
        expr("stack(7, 1L, l1, 2L, l2, 3L, l3, 4L, l4, 5L, l5, 6L, l6, 7L, l7) AS (lag, xl)"))
        .filter(col("xl").isNotNull)
      val globals = daily.agg(
        count(lit(1)).as("n"), sum(col("cnt")).as("s"),
        sum(col("cnt") * col("cnt")).as("q"))
      val perLag = stacked.groupBy(col("lag"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("cnt") * col("xl")).as("sxy"),
          sum(col("cnt") + col("xl")).as("sxpy"))
        .crossJoin(broadcast(globals))
        .select(col("lag"), col("n"),
          ((col("n") * col("n") * col("sxy") - col("n") * col("s") * col("sxpy")
            + col("n_pairs") * col("s") * col("s")).cast("double")
            / (col("n") * col("n") * col("q") - col("n") * col("s") * col("s")).cast("double"))
            .as("r"))
        .withColumn("qk",
          expr("CAST(n * (n + 2) AS DOUBLE) * r * r / CAST(n - lag AS DOUBLE)"))
      val wide = perLag.groupBy(col("n"))
        .agg(max(when(col("lag") === 1, col("qk"))).as("q1"),
          (2 to 7).map(k => max(when(col("lag") === k, col("qk"))).as(s"q$k")): _*)
      val stackArgs = (1 to 7).map(k =>
        s"${k}L, " + (1 to k).map(j => s"q$j").mkString(" + ")).mkString(", ")
      wide.selectExpr(s"stack(7, $stackArgs) AS (lag, q_lb)")
        .withColumn("crit", expr(
          """CASE lag WHEN 1 THEN CAST(3.841 AS DOUBLE)
            |  WHEN 2 THEN CAST(5.991 AS DOUBLE) WHEN 3 THEN CAST(7.815 AS DOUBLE)
            |  WHEN 4 THEN CAST(9.488 AS DOUBLE) WHEN 5 THEN CAST(11.070 AS DOUBLE)
            |  WHEN 6 THEN CAST(12.592 AS DOUBLE) ELSE CAST(14.067 AS DOUBLE)
            |END""".stripMargin))
        .select(col("lag"), col("q_lb"), col("crit"),
          (col("q_lb") > col("crit")).as("reject_95"))
        .orderBy(col("lag"))
    }),

    // ROLLING CORRELATION (the moving co-movement monitor between two
    // series — here daily view vs purchase counts over a 14-day frame):
    // emitted as SIGNED corr² in ppm — sign(cov)·cov²·10⁶ div (vx·vy)
    // with cov = nΣxy − ΣxΣy etc. all exact integers from window sums,
    // so no sqrt and no float ever enters (the square preserves the
    // magnitude ordering and the sign carries the direction; callers
    // wanting r take one client-side sqrt). DECIMAL(38,0) widening for
    // the squared products; full-frame days only. Day-grain windows
    "q_win_rollcorr" -> ((s: SparkSession, d: String) => {
      val daily = scan(s, d, "events")
        .groupBy(date_trunc("day", col("ts")).as("day"))
        .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("x"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("y"))
      val w = Window.orderBy(col("day")).rowsBetween(-13, 0)
      daily
        .withColumn("n", count(lit(1)).over(w))
        .withColumn("sx", sum(col("x")).over(w))
        .withColumn("sy", sum(col("y")).over(w))
        .withColumn("sxy", sum(col("x") * col("y")).over(w))
        .withColumn("sxx", sum(col("x") * col("x")).over(w))
        .withColumn("syy", sum(col("y") * col("y")).over(w))
        .withColumn("cov", col("n") * col("sxy") - col("sx") * col("sy"))
        .withColumn("vx", col("n") * col("sxx") - col("sx") * col("sx"))
        .withColumn("vy", col("n") * col("syy") - col("sy") * col("sy"))
        .filter(col("n") === 14 && col("vx") > 0 && col("vy") > 0)
        .select(col("day"),
          expr("""CAST(CASE WHEN cov < 0 THEN -1 ELSE 1 END
                 |  * (CAST(cov AS DECIMAL(38,0)) * cov * 1000000
                 |     div (CAST(vx AS DECIMAL(38,0)) * vy)) AS BIGINT)"""
            .stripMargin).as("corr2s_ppm"))
        .orderBy(col("day"))
    }),

    // DAILY ACTIVITY CONCENTRATION (Gini over per-user event counts,
    // tracked day by day — the "is traffic becoming whale-dominated"
    // drift monitor; q_agg_gini's time-series twin): per day the exact
    // integer Gini (2Σiₓxᵢ − (n+1)Σx)·10⁶ div (n·Σx) with ranks from a
    // row_number PARTITIONED BY day ordered by (count, user) — the
    // deterministic tie-break both engines share. Day-partitioned
    // windows (users-per-day-sized, never global)
    "q_ts_dailygini" -> ((s: SparkSession, d: String) => {
      val daily = scan(s, d, "events")
        .groupBy(date_trunc("day", col("ts")).as("day"), col("user_id"))
        .agg(count(lit(1)).as("c"))
      val w = Window.partitionBy(col("day"))
        .orderBy(col("c"), col("user_id"))
      daily
        .withColumn("i", row_number().over(w).cast("long"))
        .groupBy(col("day"))
        .agg(count(lit(1)).as("n_users"), sum(col("c")).as("n_events"),
          sum(col("i") * col("c")).as("ic"))
        .select(col("day"), col("n_users"), col("n_events"),
          expr("""CAST((CAST(2 AS DECIMAL(38,0)) * ic
                 |  - (n_users + 1) * CAST(n_events AS DECIMAL(38,0))) * 1000000
                 |  div (CAST(n_users AS DECIMAL(38,0)) * n_events) AS BIGINT)"""
            .stripMargin).as("gini_ppm"))
        .orderBy(col("day"))
    }),

    // INTER-ARRIVAL GAP DISTRIBUTION (the traffic-model census behind
    // session-gap and rate-limit tuning): per-user consecutive event
    // gaps in exact MICROSECONDS (unix_micros/epoch_us — the µs-exact
    // cross-engine pair), ordered by (ts, event_id) so equal
    // timestamps can't flip the lag, then one global census — gap
    // count, exact interpolated median/p90, max. The lag partitions
    // by user (no global window); the census is one combinable agg
    "q_ts_interarrival" -> ((s: SparkSession, d: String) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
      scan(s, d, "events")
        .select(col("user_id"), col("event_id"),
          expr("unix_micros(ts)").as("us"))
        .withColumn("gap", col("us") - lag(col("us"), 1).over(w))
        .filter(col("gap").isNotNull)
        .agg(countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_gaps"),
          percentile(col("gap"), lit(0.5)).as("med_gap_us"),
          percentile(col("gap"), lit(0.9)).as("p90_gap_us"),
          max(col("gap")).as("max_gap_us"))
    }),

    // DAILY VWAP (the volume-weighted price benchmark execution desks
    // compare fills against — here per ship day over lineitem):
    // Σ(price_cents·qty) div Σqty in EXACT integers (DECIMAL(38,0)
    // for the product sum — cents·qty·rows passes BIGINT at ~sf100),
    // plus a 7-day rolling VWAP from the same two cumulative sums —
    // ratio-of-sums, NOT average-of-ratios, in both engines. Day-grain
    "q_ts_vwap" -> ((s: SparkSession, d: String) => {
      val daily = scan(s, d, "lineitem")
        .groupBy(date_trunc("day", col("l_shipdate")).as("day"))
        .agg(sum(expr(
          "CAST(CAST(floor(l_extendedprice * 100) AS BIGINT) AS DECIMAL(38,0)) * CAST(l_quantity AS BIGINT)"))
          .as("pv"),
          sum(col("l_quantity").cast("long")).as("qty"))
      val w7 = Window.orderBy(col("day")).rowsBetween(-6, 0)
      daily
        .withColumn("n7", count(lit(1)).over(w7))
        .withColumn("pv7", sum(col("pv")).over(w7))
        .withColumn("q7", sum(col("qty")).over(w7))
        .filter(col("n7") === 7)
        .select(col("day"), col("qty"),
          expr("CAST(pv div qty AS BIGINT)").as("vwap_cents"),
          expr("CAST(pv7 div q7 AS BIGINT)").as("vwap7_cents"))
        .orderBy(col("day"))
    }),

    // STOCHASTIC OSCILLATOR %K/%D (the bounded momentum indicator over
    // q_ts_ohlc's daily bars, here on order price cents): %K =
    // (close − low₁₄)·10⁶ div (high₁₄ − low₁₄) in exact integer ppm
    // over the 14-day frame, %D = the 3-day mean of %K spelled as
    // (k + k₋₁ + k₋₂) div 3 — pure integers end to end, full-frame
    // rows only, degenerate flat frames (high = low) excluded in both
    // engines. Day-grain windows
    "q_ts_stochastic" -> ((s: SparkSession, d: String) => {
      val daily = scan(s, d, "orders")
        .select(date_trunc("day", col("o_orderdate")).as("day"),
          floor(col("o_totalprice") * 100).cast("long").as("cents"),
          col("o_orderkey"))
        .groupBy(col("day"))
        .agg(max(col("cents")).as("hi"), min(col("cents")).as("lo"),
          max_by(col("cents"), col("o_orderkey")).as("close"))
      val w14 = Window.orderBy(col("day")).rowsBetween(-13, 0)
      val wk = Window.orderBy(col("day"))
      daily
        .withColumn("n14", count(lit(1)).over(w14))
        .withColumn("hi14", max(col("hi")).over(w14))
        .withColumn("lo14", min(col("lo")).over(w14))
        .filter(col("n14") === 14 && col("hi14") > col("lo14"))
        .withColumn("k_ppm",
          expr("(close - lo14) * 1000000 div (hi14 - lo14)"))
        .withColumn("k1", lag(col("k_ppm"), 1).over(wk))
        .withColumn("k2", lag(col("k_ppm"), 2).over(wk))
        .filter(col("k2").isNotNull)
        .select(col("day"), col("close"), col("hi14"), col("lo14"),
          col("k_ppm"), expr("(k_ppm + k1 + k2) div 3").as("d_ppm"))
        .orderBy(col("day"))
    }),

    // MAXIMUM DRAWDOWN (the peak-to-trough risk readout over a running
    // balance — here the cumulative purchase-minus-error cents flow):
    // equity = running sum, peak = running max, drawdown = peak −
    // equity, all EXACT integers over the day-grain census; the report
    // emits the worst drawdown, its (earliest) trough day, and the
    // final equity. Day-grain: windows run over ~hundreds of rows
    // regardless of data volume
    "q_ts_drawdown" -> ((s: SparkSession, d: String) => {
      val daily = scan(s, d, "events")
        .filter(col("event_type").isin("purchase", "error"))
        .groupBy(date_trunc("day", col("ts")).as("day"))
        .agg(sum(when(col("event_type") === "purchase",
            floor(col("value") * 100).cast("long"))
          .otherwise(-floor(col("value") * 100).cast("long"))).as("flow"))
      val w = Window.orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val dd = daily
        .withColumn("equity", sum(col("flow")).over(w))
        .withColumn("peak", max(col("equity")).over(w))
        .withColumn("dd", col("peak") - col("equity"))
      val mx = dd.agg(max(col("dd")).as("max_dd"))
      dd.crossJoin(broadcast(mx))
        .agg(count(lit(1)).as("n_days"), max(col("max_dd")).as("max_dd"),
          min(when(col("dd") === col("max_dd"), col("day"))).as("trough_day"),
          max(struct(col("day"), col("equity"))).as("last"))
        .select(col("n_days"), col("max_dd"), col("trough_day"),
          col("last.equity").as("equity_end"))
    }),

    // PARTIAL AUTOCORRELATION φ_11..φ_33 (the AR-order diagnostic next
    // to q_ts_acf — "how much does lag k explain once lags < k are
    // regressed out"): Durbin–Levinson unrolled to 3 lags over the SAME
    // exact-rational r_k as q_ts_acf. Float discipline: each φ is one
    // NAMED intermediate computed by an identical expression tree in
    // both engines (explicit CAST(1 AS DOUBLE) — a bare 1.0 literal is
    // DECIMAL in both dialects and changes the arithmetic), so every
    // division happens on bit-equal operands. Same one-scan day-grain
    // cost shape as q_ts_acf
    "q_ts_pacf" -> ((s: SparkSession, d: String) => {
      val daily = scan(s, d, "events")
        .groupBy(date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.orderBy(col("day"))
      val lagged = (1 to 3).foldLeft(daily) { (df, k) =>
        df.withColumn(s"l$k", lag(col("cnt"), k).over(w))
      }
      val stacked = lagged.select(col("cnt"),
        expr("stack(3, 1L, l1, 2L, l2, 3L, l3) AS (lag, xl)"))
        .filter(col("xl").isNotNull)
      val globals = daily.agg(
        count(lit(1)).as("n"), sum(col("cnt")).as("s"),
        sum(col("cnt") * col("cnt")).as("q"))
      val perLag = stacked.groupBy(col("lag"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("cnt") * col("xl")).as("sxy"),
          sum(col("cnt") + col("xl")).as("sxpy"))
        .crossJoin(broadcast(globals))
        .select(col("lag"),
          ((col("n") * col("n") * col("sxy") - col("n") * col("s") * col("sxpy")
            + col("n_pairs") * col("s") * col("s")).cast("double")
            / (col("n") * col("n") * col("q") - col("n") * col("s") * col("s")).cast("double"))
            .as("r"))
      perLag.groupBy()
        .agg(max(when(col("lag") === 1, col("r"))).as("r1"),
          max(when(col("lag") === 2, col("r"))).as("r2"),
          max(when(col("lag") === 3, col("r"))).as("r3"))
        .withColumn("p22",
          expr("(r2 - r1 * r1) / (CAST(1 AS DOUBLE) - r1 * r1)"))
        .withColumn("p21", expr("r1 - p22 * r1"))
        .withColumn("p33", expr(
          """(r3 - p21 * r2 - p22 * r1)
            |  / (CAST(1 AS DOUBLE) - p21 * r1 - p22 * r2)""".stripMargin))
        .selectExpr("stack(3, 1L, r1, 2L, p22, 3L, p33) AS (lag, pacf)")
        .orderBy(col("lag"))
    }),

    // FIXED-FREQUENCY DFT POWER (the spectral seasonality detector —
    // "how much of the variance is weekly/biweekly/monthly", the
    // frequency-domain view next to q_ts_acf's lag domain): Goertzel-
    // style single-bin DFT at periods 7/14/30 over the MEAN-REMOVED
    // day series. ALL-INTEGER: deviations are scaled by n (n·cnt − S),
    // the cos/sin tables are 1e6 fixed-point literals shared verbatim
    // with the oracle (trigCase — no libm trig at query time in either
    // engine), and the Parseval-normalized power fraction
    // (C² + S²) / (n·Sc²·Σdev²) is one DECIMAL(38,0) ppm quotient.
    // Day-grain census: one scan, three 1-row aggs over a ~dimension-
    // sized dev table
    "q_ts_dft" -> ((s: SparkSession, d: String) => {
      import graft.ops.CacheScope.ScopedPersist
      val daily = scan(s, d, "events")
        .groupBy(date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as("cnt"))
      val g = daily.agg(count(lit(1)).as("n"), sum(col("cnt")).as("s"))
      val dev = daily.crossJoin(broadcast(g))
        .select(
          datediff(col("day").cast("date"), lit("1992-01-06").cast("date"))
            .cast("long").as("t"),
          (col("n") * col("cnt") - col("s")).as("dev"), col("n"))
        .scopedPersist()
      Seq(7, 14, 30).map { p =>
        dev.agg(max(col("n")).as("n"),
            sum(expr(s"""dev * (${trigCase("t", p, sin = false)})""")).as("c_num"),
            sum(expr(s"""dev * (${trigCase("t", p, sin = true)})""")).as("s_num"),
            sum(expr("dev * dev")).as("qq"))
          .select(lit(p.toLong).as("period"), col("c_num"), col("s_num"),
            expr("""CAST((CAST(c_num AS DECIMAL(38,0)) * c_num
                   |  + CAST(s_num AS DECIMAL(38,0)) * s_num) * 1000000
                   |  div (CAST(n AS DECIMAL(38,0)) * 1000000000000 * qq) AS BIGINT)"""
              .stripMargin).as("power_ppm"))
      }.reduce(_ unionAll _).orderBy(col("period"))
    }),

    // ROBUST ANOMALY FLAGS (median/MAD — the detector q_ts_anomaly's
    // rolling mean/variance can't be: a burst of outlier days inflates
    // the variance and masks itself, while the median absolute
    // deviation barely moves). Per event_type: med and MAD over the
    // day-grain series (exact interpolated percentiles), flag days
    // with |x − med| > 3 × 1.4826 × MAD, spelled 10000·|x−med| >
    // 44478·MAD in fixed-point so the only floats are the two
    // percentile values themselves. Two aggregations over day counts —
    // state ∝ days × types
    "q_ts_anomaly_mad" -> ((s: SparkSession, d: String) => {
      val daily = scan(s, d, "events")
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as("cnt"))
      val med = daily.groupBy(col("event_type"))
        .agg(percentile(col("cnt"), lit(0.5)).as("med"))
      val mad = daily.join(med, Seq("event_type"))
        .groupBy(col("event_type"))
        .agg(percentile(abs(col("cnt") - col("med")), lit(0.5)).as("mad"),
          // med is group-constant (joined in); max = that constant
          max(col("med")).as("med"))
      daily.join(mad, Seq("event_type"))
        .select(col("event_type"), col("day"), col("cnt"), col("med"), col("mad"),
          (lit(10000.0) * abs(col("cnt") - col("med")) > lit(44478.0) * col("mad"))
            .as("is_anomaly"))
        .orderBy(col("event_type"), col("day"))
    }),

    // ROLLING MEDIAN FILTER (the robust smoother — one outlier day
    // can't move it, unlike q_ts_stl's moving average): exact
    // interpolated median over the centered 7-day frame (the
    // q_agg_median percentile path — both engines interpolate
    // identically over integer counts). Emitted only where the full
    // window exists, like the STL trend. Window state ∝ days
    "q_ts_rollmedian" -> ((s: SparkSession, d: String) => {
      val daily = scan(s, d, "events")
        .groupBy(date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as("cnt"))
      val w7 = Window.orderBy(col("day")).rowsBetween(-3, 3)
      daily
        .withColumn("nw", count(lit(1)).over(w7))
        .withColumn("med7",
          when(col("nw") === 7, percentile(col("cnt"), lit(0.5)).over(w7)))
        .select(col("day"), col("cnt"), col("med7"))
        .orderBy(col("day"))
    }),

    // BURST EXTRACTION (elevated-activity intervals — the incident
    // report next to the point alarms of q_ts_anomaly/_mad): days
    // strictly above the series' own p90 (the only float is the exact
    // interpolated percentile), grouped into maximal consecutive runs
    // by gaps-and-islands (day-ordinal minus rank — no self-join),
    // each burst emitting its span, length, peak and volume.
    // Day-grain: state ∝ days
    "q_ts_bursts" -> ((s: SparkSession, d: String) => {
      val daily = scan(s, d, "events")
        .groupBy(date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as("cnt"))
      val med = daily.agg(percentile(col("cnt"), lit(0.9)).as("p90"))
      val flagged = daily.crossJoin(broadcast(med))
        .filter(col("cnt").cast("double") > col("p90"))
        .withColumn("dn", datediff(col("day").cast("date"),
          lit("1992-01-06").cast("date")).cast("long"))
        .withColumn("grp",
          col("dn") - row_number().over(Window.orderBy(col("day"))))
      flagged.groupBy(col("grp"))
        .agg(min(col("day")).as("burst_start"),
          max(col("day")).as("burst_end"),
          count(lit(1)).as("n_days"),
          max(col("cnt")).as("peak_cnt"),
          sum(col("cnt")).as("total_cnt"))
        .drop("grp")
        .select(col("burst_start"), col("burst_end"), col("n_days"),
          col("peak_cnt"), col("total_cnt"))
        .orderBy(col("burst_start"))
    }),

    // PEAK CONCURRENCY (interval stabbing by boundary sweep — the
    // capacity question "how many sessions were open at once, and
    // when?"): each session emits (+1 at start, −1 at end), the global
    // sweep is one running sum over the 2×sessions boundary stream
    // (session-scale, never event-scale), peak = max, with ties at the
    // same instant resolved opens-before-closes (inclusive ends) and
    // the reported instant = the EARLIEST at the peak. Daily grain in
    // the output keeps the report bounded; the running sweep itself is
    // the textbook O(n log n) shape
    "q_ts_concurrency" -> ((s: SparkSession, d: String) => {
      val sessions = graft.streaming.StreamOps.sessionize(
        scan(s, d, "events"), gapSeconds = 6 * 3600)
      val bounds = sessions
        .select(col("session_start").as("t"), lit(1L).as("delta"))
        .unionAll(sessions.select(col("session_end").as("t"), lit(-1L).as("delta")))
      val sweep = Window.orderBy(col("t").asc, col("delta").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      bounds
        .withColumn("open", sum(col("delta")).over(sweep))
        .groupBy(date_trunc("day", col("t")).as("day"))
        .agg(max(col("open")).as("peak_open"),
          min_by(col("t"), struct((-col("open")).as("negopen"), col("t"))).as("peak_at"))
        .orderBy(col("day"))
    }),

    // HOLT DOUBLE EXPONENTIAL SMOOTHING (level + trend — the
    // forecasting step up from q_ewma's single smoother, and the
    // model q_ts_forecast's naive baselines are judged against):
    // l_t = (l₋+b₋)/2 + x_t/2, b_t = 0.75·b₋ + 0.25·(l_t−l₋), with
    // α=1/2, β=1/4 chosen DYADIC so every multiply is by an exactly
    // representable constant and both engines' identical left folds
    // (aggregate ≡ list_reduce, the q_ewma precedent — here with a
    // STRUCT accumulator for the coupled recursions) produce
    // bit-identical doubles. State ∝ types × days; the fold runs
    // in-row over each type's collected day series
    "q_ts_holt" -> ((s: SparkSession, d: String) => {
      val daily = scan(s, d, "events")
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).cast("double").as("cnt"))
      val evs = array_sort(collect_list(struct(col("day"), col("cnt"))))
      def l(acc: org.apache.spark.sql.Column) = acc.getField("l")
      def b(acc: org.apache.spark.sql.Column) = acc.getField("b")
      daily.groupBy(col("event_type"))
        .agg(evs.as("evs"))
        .select(col("event_type"),
          size(col("evs")).as("n_days"),
          aggregate(
            slice(col("evs"), lit(2), size(col("evs")) - 1),
            struct(element_at(col("evs"), 1).getField("cnt").as("l"), lit(0.0).as("b")),
            (acc, e) => {
              val nl = (l(acc) + b(acc)) / lit(2.0) + e.getField("cnt") / lit(2.0)
              struct(nl.as("l"),
                (b(acc) * lit(0.75) + (nl - l(acc)) * lit(0.25)).as("b"))
            }).as("hw"))
        .select(col("event_type"), col("n_days"),
          col("hw.l").as("level"), col("hw.b").as("trend"),
          (col("hw.l") + col("hw.b")).as("forecast_1"))
        .orderBy(col("event_type"))
    }),

    // HOLT–WINTERS triple exponential smoothing (additive seasonality,
    // period 7) — the q_ts_holt recursion plus a seasonal state, made
    // index-free by a ROTATING ring: the accumulator is
    // [l, b, s₁..s₇] with the CURRENT day's seasonal always at ring
    // head; each step consumes the head and appends the re-estimated
    // seasonal, so no position argument is needed in either engine's
    // fold. Dyadic smoothing constants (α=1/2, β=1/4, γ=1/2) keep
    // every step a halving/quartering — bit-identical doubles under
    // the identical sequential fold on both sides (the q_ts_holt LIST-
    // accumulator rule applies: every new element references only the
    // OLD accumulator, nl inlined). Seeds: l₀ = mean of the first 7
    // observed days, b₀ = 0, sᵢ = yᵢ − l₀; seasonality runs on the
    // OBSERVED day index (the q_ts_ccf convention). State ∝ days
    "q_ts_hw" -> ((s: SparkSession, d: String) => {
      val daily = scan(s, d, "events")
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).cast("double").as("cnt"))
      val evs = array_sort(collect_list(struct(col("day"), col("cnt"))))
      daily.groupBy(col("event_type")).agg(evs.as("evs"))
        .filter(size(col("evs")) >= 8)
        .select(col("event_type"), size(col("evs")).as("n_days"),
          transform(col("evs"), e => e.getField("cnt")).as("ys"))
        .select(col("event_type"), col("n_days"),
          (aggregate(slice(col("ys"), 1, 7), lit(0.0), (a, y) => a + y)
            / lit(7.0)).as("l0"), col("ys"))
        .select(col("event_type"), col("n_days"),
          aggregate(
            slice(col("ys"), lit(8), size(col("ys")) - 7),
            concat(array(col("l0"), lit(0.0)),
              transform(slice(col("ys"), 1, 7), y => y - col("l0"))),
            (acc, y) => {
              val l = element_at(acc, 1)
              val b = element_at(acc, 2)
              val sOld = element_at(acc, 3)
              val nl = (y - sOld) / lit(2.0) + (l + b) / lit(2.0)
              val nb = (nl - l) / lit(4.0) + b * lit(0.75)
              val ns = (y - nl) / lit(2.0) + sOld / lit(2.0)
              concat(array(nl, nb), slice(acc, 4, 6), array(ns))
            }).as("hw"))
        .select(col("event_type"), col("n_days"),
          element_at(col("hw"), 1).as("level"),
          element_at(col("hw"), 2).as("trend"),
          element_at(col("hw"), 3).as("s_next"),
          (element_at(col("hw"), 1) + element_at(col("hw"), 2)
            + element_at(col("hw"), 3)).as("forecast_1"))
        .orderBy(col("event_type"))
    }),

    // CROSS-CORRELATION FUNCTION (lead–lag diagnostic: does 'view'
    // activity LEAD 'purchase' activity, and by how many days?):
    // r_k = corr(x_t, y_{t+k}) for k ∈ −3..+3 over the OBSERVED daily
    // series — lags shift by observed-row offset, not calendar days, so
    // a day with zero events of both types (none exist in this data) is
    // skipped rather than coalesced to 0; both engines share the
    // convention. Same
    // exactness spine as q_ts_acf — both rational means scaled out, so
    // the lag-windowed numerator n²Σxy − n·Sy·ΣX_k − n·Sx·ΣY_k +
    // m_k·Sx·Sy and the full-series variance terms n²Q − n·S² are
    // pure bigints; the only floats are ONE product (as doubles —
    // the n²-scaled variance product overflows int64) and ONE
    // IEEE-exact sqrt. One window pass builds all 7 shifts
    "q_ts_ccf" -> ((s: SparkSession, d: String) => {
      val daily = scan(s, d, "events")
        .filter(col("event_type").isin("view", "purchase"))
        .groupBy(date_trunc("day", col("ts")).as("day"))
        .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("x"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("y"))
      val w = Window.orderBy(col("day"))
      val shifted = (-3 to 3).foldLeft(daily) { (df, k) =>
        val c = if (k >= 0) lead(col("y"), k).over(w) else lag(col("y"), -k).over(w)
        df.withColumn(s"s${k + 3}", c)
      }
      val stacked = shifted.select(col("x"),
        expr("stack(7, -3L, s0, -2L, s1, -1L, s2, 0L, s3, 1L, s4, 2L, s5, 3L, s6) AS (lag, yl)"))
        .filter(col("yl").isNotNull)
      val globals = daily.agg(
        count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("qx"), sum(col("y") * col("y")).as("qy"))
      stacked.groupBy(col("lag"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("x") * col("yl")).as("pxy"),
          sum(col("x")).as("px"), sum(col("yl")).as("py"))
        .crossJoin(broadcast(globals))
        .select(col("lag"), col("n_pairs"),
          ((col("n") * col("n") * col("pxy") - col("n") * col("sy") * col("px")
            - col("n") * col("sx") * col("py") + col("n_pairs") * col("sx") * col("sy"))
            .cast("double")
            / sqrt((col("n") * col("n") * col("qx") - col("n") * col("sx") * col("sx")).cast("double")
              * (col("n") * col("n") * col("qy") - col("n") * col("sy") * col("sy")).cast("double")))
            .as("r"))
        .orderBy(col("lag"))
    }),

    // THEIL–SEN ROBUST TREND (Sen 1968; the median-of-pairwise-slopes
    // estimator — immune to the outlier days that wreck OLS): per
    // event_type daily series, slope over every day pair i<j as ONE
    // IEEE division of exact integers (Δcnt / Δdays), then the exact
    // median (the q_agg_median percentile path — both engines
    // interpolate identically). Pairs ∝ days² per type — constant in
    // data volume at fixed history, the same bound as q_ts_trend's
    // Mann–Kendall pass (which tests trend EXISTENCE; this estimates
    // its magnitude — the two ship together)
    "q_ts_theilsen" -> ((s: SparkSession, d: String) => {
      val daily = scan(s, d, "events")
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as("cnt"))
      val a = daily.select(col("event_type"), col("day").as("da"), col("cnt").as("ca"))
      val b = daily.select(col("event_type").as("et_b"), col("day").as("db"), col("cnt").as("cb"))
      a.join(b, col("event_type") === col("et_b") && col("da") < col("db"))
        .withColumn("slope",
          (col("cb") - col("ca")).cast("double")
            / datediff(col("db").cast("date"), col("da").cast("date")).cast("double"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_pairs"),
          percentile(col("slope"), lit(0.5)).as("slope_med"))
        .orderBy(col("event_type"))
    })
  )

  /** The Holt–Winters replay over a daily census restricted by
    * `dailyWhere` — shared by q_ts_hw (all observed days) and
    * q_stream_hw (closed days only: the streaming fold can only
    * consume a day once the watermark proves it complete).
    */
  /** q_win_slope's oracle, parameterized on the daily-census predicate
    * — shared verbatim by the batch query (`""`) and the streaming twin
    * q_stream_slope (closed-days-only), so the incremental ≡ batch
    * contract is literal, the hwOracleSql pattern.
    */
  /** Integer-scaled trig tables for the fixed-frequency DFT: cos/sin of
    * 2πj/p rounded to 1e6 fixed point, emitted as the SAME literal CASE
    * expression into both the engine plan and the DuckDB oracle — the
    * constants are definitionally shared, so no libm trig runs in
    * either engine at query time and the sums stay pure integer.
    */
  private def trigConsts(p: Int, sin: Boolean): Seq[Long] =
    (0 until p).map { j =>
      val a = 2.0 * math.Pi * j / p
      math.round((if (sin) math.sin(a) else math.cos(a)) * 1e6)
    }

  private def trigCase(colName: String, p: Int, sin: Boolean): String =
    s"CASE CAST($colName % $p AS INT) " +
      trigConsts(p, sin).zipWithIndex
        .map { case (v, j) => s"WHEN $j THEN $v" }.mkString(" ") +
      " END"

  private[queries] def slopeOracleSql(dailyWhere: String): String =
    s"""WITH daily AS (SELECT event_type,
       |    CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       |    CAST(count(*) AS BIGINT) AS cnt
       |  FROM events $dailyWhere GROUP BY 1, 2),
       |x AS (SELECT *, CAST(CAST(day AS DATE) - DATE '1992-01-06' AS BIGINT) AS di
       |      FROM daily),
       |wf AS (SELECT event_type, day, cnt,
       |         CAST(COUNT(*) OVER w AS BIGINT) AS n,
       |         CAST(SUM(di) OVER w AS BIGINT) AS sx,
       |         CAST(SUM(cnt) OVER w AS BIGINT) AS sy,
       |         CAST(SUM(di * cnt) OVER w AS BIGINT) AS sxy,
       |         CAST(SUM(di * di) OVER w AS BIGINT) AS sxx
       |       FROM x WINDOW w AS (PARTITION BY event_type ORDER BY di
       |         ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
       |SELECT event_type, day, cnt, n AS n_window,
       |  CASE WHEN n < 2 THEN NULL
       |       ELSE CAST((CASE WHEN n * sxy - sx * sy >= 0 THEN 1 ELSE -1 END)
       |         * (abs(n * sxy - sx * sy) * 1000000 // (n * sxx - sx * sx))
       |         AS BIGINT) END AS slope_ppm
       |FROM wf ORDER BY event_type, day""".stripMargin

  private[queries] def hwOracleSql(dailyWhere: String): String =
      s"""WITH daily AS (SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |                 CAST(COUNT(*) AS DOUBLE) AS cnt
        |               FROM events $dailyWhere GROUP BY 1, 2),
        |g AS (SELECT event_type, list(cnt ORDER BY day) AS ys
        |      FROM daily GROUP BY event_type HAVING count(*) >= 8),
        |i AS (SELECT event_type, ys, CAST(len(ys) AS INT) AS n_days,
        |        list_reduce(ys[1:7], (a, y) -> a + y) / CAST(7.0 AS DOUBLE) AS l0
        |      FROM g),
        |sd AS (SELECT event_type, n_days,
        |         list_prepend(
        |           list_concat([l0, CAST(0.0 AS DOUBLE)],
        |             list_transform(ys[1:7], y -> y - l0)),
        |           list_transform(ys[8:], y -> [y])) AS es
        |       FROM i),
        |r AS (SELECT event_type, n_days,
        |        list_reduce(es, (acc, x) ->
        |          list_concat(list_concat(
        |            [(x[1] - acc[3]) / CAST(2.0 AS DOUBLE)
        |               + (acc[1] + acc[2]) / CAST(2.0 AS DOUBLE),
        |             ((x[1] - acc[3]) / CAST(2.0 AS DOUBLE)
        |                + (acc[1] + acc[2]) / CAST(2.0 AS DOUBLE) - acc[1])
        |               / CAST(4.0 AS DOUBLE)
        |               + acc[2] * CAST(0.75 AS DOUBLE)],
        |            acc[4:9]),
        |            [(x[1] - ((x[1] - acc[3]) / CAST(2.0 AS DOUBLE)
        |                + (acc[1] + acc[2]) / CAST(2.0 AS DOUBLE)))
        |               / CAST(2.0 AS DOUBLE)
        |               + acc[3] / CAST(2.0 AS DOUBLE)])) AS hw
        |      FROM sd)
        |SELECT event_type, n_days, hw[1] AS level, hw[2] AS trend,
        |  hw[3] AS s_next, hw[1] + hw[2] + hw[3] AS forecast_1
        |FROM r ORDER BY event_type""".stripMargin

    val oracleSql: Map[String, String] = Map(
    "q_ts_croston" ->
      """WITH dd AS (SELECT user_id AS store,
        |    CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS dem
        |  FROM events WHERE event_type = 'purchase' AND user_id < 8
        |  GROUP BY 1, 2),
        |g AS (SELECT store, day, dem,
        |        CAST(COALESCE(date_diff('day',
        |          lag(day) OVER (PARTITION BY store ORDER BY day), day), 1)
        |          AS BIGINT) AS gap,
        |        ROW_NUMBER() OVER (PARTITION BY store ORDER BY day DESC)
        |          AS rn_desc
        |      FROM dd),
        |w AS (SELECT store, day, dem, gap,
        |        ROW_NUMBER() OVER (PARTITION BY store ORDER BY day) AS j
        |      FROM g WHERE rn_desc <= 40),
        |a AS (SELECT store, CAST(MAX(j) AS BIGINT) AS m,
        |        CAST(SUM(CASE WHEN j = 1 THEN dem
        |          ELSE (CAST(1 AS BIGINT) << CAST(j - 2 AS INT)) * dem END)
        |          AS BIGINT) AS snum,
        |        CAST(SUM(CASE WHEN j = 1 THEN gap
        |          ELSE (CAST(1 AS BIGINT) << CAST(j - 2 AS INT)) * gap END)
        |          AS BIGINT) AS inum
        |      FROM w GROUP BY store),
        |nt AS (SELECT store, CAST(COUNT(*) AS BIGINT) AS n_demand FROM dd
        |       GROUP BY store)
        |SELECT nt.store, nt.n_demand, a.m,
        |  CAST(CAST(snum AS HUGEINT) * 1000000
        |    // (CAST(1 AS BIGINT) << CAST(m - 1 AS INT)) AS BIGINT) AS size_x6,
        |  CAST(CAST(inum AS HUGEINT) * 1000000
        |    // (CAST(1 AS BIGINT) << CAST(m - 1 AS INT)) AS BIGINT)
        |    AS interval_x6,
        |  CAST(CAST(snum AS HUGEINT) * 1000000 // inum AS BIGINT) AS croston_x6
        |FROM nt JOIN a USING (store) ORDER BY store""".stripMargin,
    "q_win_rank" ->
      """SELECT o_custkey, o_orderkey,
        |  row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn,
        |  rank() OVER (PARTITION BY o_custkey ORDER BY o_orderdate) AS rk,
        |  dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_orderdate) AS drk
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_win_lag_lead" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  lag(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price,
        |  lead(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_price
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_win_runsum" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) OVER
        |    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
        |  COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_n
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_win_ntile" ->
      """SELECT c_custkey, c_acctbal,
        |  ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS quartile
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_win_pct" ->
      """SELECT o_custkey, o_orderkey,
        |  percent_rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey) AS pr,
        |  cume_dist() OVER (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey) AS cd
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_win_frame" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) OVER
        |    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |     ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS DOUBLE) AS sum3,
        |  COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |     ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS n3
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_win_range" ->
      """WITH o AS (SELECT o_custkey, o_orderkey,
        |             CAST(CAST(o_orderdate AS DATE) - DATE '1992-01-06' AS BIGINT) AS di,
        |             CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
        |           FROM orders)
        |SELECT o_custkey, o_orderkey, di,
        |  CAST(SUM(cents) OVER w AS BIGINT) AS sum30_cents,
        |  CAST(COUNT(*) OVER w AS BIGINT) AS n30
        |FROM o
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY di
        |             RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_win_nth" ->
      """SELECT o_custkey, o_orderkey,
        |  first_value(o_orderkey) OVER w AS first_key,
        |  last_value(o_orderkey) OVER w AS last_key,
        |  nth_value(o_orderkey, 2) OVER w AS second_key
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_win_rollstd" -> {
      val sx = "CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) OVER w AS DOUBLE)"
      val n = "CAST(COUNT(*) OVER w AS DOUBLE)"
      s"""SELECT o_custkey, o_orderkey,
         |  sqrt(greatest(
         |    ${ExactAgg.sqlDsumScaledOver("o_totalprice * o_totalprice", "w", 3)} / $n
         |    - ($sx / $n) * ($sx / $n), 0.0)) AS roll_std,
         |  CAST(COUNT(*) OVER w AS BIGINT) AS n_window
         |FROM orders
         |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         |             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
         |ORDER BY o_custkey, o_orderkey""".stripMargin
    },
    "q_win_ratio" ->
      """SELECT o_custkey, o_orderkey,
        |  o_totalprice / CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6)))
        |                      OVER (PARTITION BY o_custkey) AS DOUBLE) AS share
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_ewma" ->
      """WITH g AS (SELECT user_id,
        |             list(value ORDER BY epoch_us(ts), event_id) AS vals
        |           FROM events GROUP BY user_id)
        |SELECT user_id, CAST(len(vals) AS INT) AS n,
        |  list_reduce(vals, (acc, x) -> acc / 2 + x / 2) AS ewma
        |FROM g ORDER BY user_id""".stripMargin,
    "q_ts_anomaly" ->
      """WITH daily AS (SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |                 CAST(COUNT(*) AS BIGINT) AS cnt
        |               FROM events GROUP BY 1),
        |r AS (SELECT day, cnt,
        |        CAST(SUM(cnt) OVER w AS BIGINT) AS rsum,
        |        CAST(SUM(cnt * cnt) OVER w AS BIGINT) AS rsumsq,
        |        CAST(COUNT(*) OVER w AS BIGINT) AS n
        |      FROM daily
        |      WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)),
        |m AS (SELECT day, cnt,
        |        CAST(rsum AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
        |        (CAST(rsumsq AS DOUBLE) -
        |          CAST(rsum AS DOUBLE) * CAST(rsum AS DOUBLE) / CAST(n AS DOUBLE))
        |          / CAST(n AS DOUBLE) AS variance
        |      FROM r)
        |SELECT day, cnt, mean, variance,
        |  (CAST(cnt AS DOUBLE) - mean) * (CAST(cnt AS DOUBLE) - mean) > 4.0 * variance AS is_spike
        |FROM m ORDER BY day""".stripMargin,

    // argmax replay: same n-scaled integer deviation, row_number over
    // (|c| desc, day asc) — the engine's struct-max tie order verbatim
    "q_ts_changepoint" ->
      """WITH daily AS (SELECT event_type,
        |                 CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |                 CAST(COUNT(*) AS BIGINT) AS cnt
        |               FROM events GROUP BY 1, 2),
        |w AS (SELECT event_type, day, cnt,
        |        CAST(row_number() OVER sq AS BIGINT) AS t,
        |        CAST(SUM(cnt) OVER (PARTITION BY event_type ORDER BY day
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS pre,
        |        CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
        |        CAST(SUM(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS s
        |      FROM daily
        |      WINDOW sq AS (PARTITION BY event_type ORDER BY day)),
        |c AS (SELECT event_type, day, n, CAST(n * pre - t * s AS BIGINT) AS c FROM w),
        |r AS (SELECT *, row_number() OVER (PARTITION BY event_type
        |        ORDER BY abs(c) DESC, day ASC) AS rn FROM c)
        |SELECT event_type, day AS change_day, c AS c_scaled, n AS n_days
        |FROM r WHERE rn = 1 ORDER BY event_type""".stripMargin,

    "q_ts_cusum" ->
      """WITH daily AS (SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |                 CAST(COUNT(*) AS BIGINT) AS cnt
        |               FROM events GROUP BY 1),
        |ref AS (SELECT CAST(SUM(cnt) // COUNT(*) AS BIGINT) AS k,
        |               CAST(GREATEST(SUM(cnt) // COUNT(*) // 20, 1) AS BIGINT) AS slack
        |        FROM daily),
        |p AS (SELECT day, cnt, k, slack,
        |        CAST(SUM(cnt - k - slack) OVER w AS BIGINT) AS p
        |      FROM daily CROSS JOIN ref
        |      WINDOW w AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |s AS (SELECT day, cnt, slack,
        |        CAST(p - LEAST(0, MIN(p) OVER (ORDER BY day
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS BIGINT) AS s_plus
        |      FROM p)
        |SELECT day, cnt, s_plus, s_plus > slack * 8 AS is_alarm
        |FROM s ORDER BY day""".stripMargin,

    "q_ts_ohlc" ->
      s"""SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
         |  min_by(o_totalprice, o_orderkey) AS open_px,
         |  MAX(o_totalprice) AS high_px,
         |  MIN(o_totalprice) AS low_px,
         |  max_by(o_totalprice, o_orderkey) AS close_px,
         |  CAST(COUNT(*) AS BIGINT) AS n_trades,
         |  ${ExactAgg.sqlDsum("o_totalprice")} AS volume
         |FROM orders GROUP BY 1 ORDER BY day""".stripMargin,

    "q_win_slope" -> slopeOracleSql(""),


    "q_ts_trend" ->
      """WITH daily AS (SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |                 CAST(COUNT(*) AS BIGINT) AS cnt
        |               FROM events GROUP BY 1),
        |sp AS (SELECT CAST(SUM(CASE WHEN b.cnt > a.cnt THEN 1
        |                            WHEN b.cnt < a.cnt THEN -1 ELSE 0 END) AS BIGINT) AS s_stat
        |       FROM daily a JOIN daily b ON a.day < b.day),
        |ti AS (SELECT CAST(COALESCE(SUM(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT) AS tie18
        |       FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM daily GROUP BY cnt)),
        |nr AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM daily),
        |v AS (SELECT s_stat, n_days,
        |        n_days * (n_days - 1) * (2 * n_days + 5) - tie18 AS var18
        |      FROM sp CROSS JOIN nr CROSS JOIN ti)
        |SELECT n_days, s_stat, CAST(var18 AS BIGINT) AS var18,
        |  (CASE WHEN s_stat > 0 THEN CAST(s_stat - 1 AS DOUBLE)
        |        WHEN s_stat < 0 THEN CAST(s_stat + 1 AS DOUBLE)
        |        ELSE 0.0 END) / sqrt(CAST(var18 AS DOUBLE) / 18.0) AS z,
        |  abs((CASE WHEN s_stat > 0 THEN CAST(s_stat - 1 AS DOUBLE)
        |        WHEN s_stat < 0 THEN CAST(s_stat + 1 AS DOUBLE)
        |        ELSE 0.0 END) / sqrt(CAST(var18 AS DOUBLE) / 18.0)) > 1.96 AS has_trend
        |FROM v""".stripMargin,

    "q_ts_forecast" ->
      """WITH daily AS (SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |                 CAST(COUNT(*) AS BIGINT) AS cnt
        |               FROM events GROUP BY 1),
        |l AS (SELECT day, cnt,
        |        lag(cnt, 1) OVER (ORDER BY day) AS f_naive,
        |        lag(cnt, 7) OVER (ORDER BY day) AS f_seasonal
        |      FROM daily),
        |s AS (SELECT * FROM l WHERE f_naive IS NOT NULL AND f_seasonal IS NOT NULL),
        |e AS (SELECT 'naive_1' AS method, cnt - f_naive AS err FROM s
        |      UNION ALL
        |      SELECT 'seasonal_7', cnt - f_seasonal FROM s)
        |SELECT method, CAST(COUNT(*) AS BIGINT) AS n_days,
        |  CAST(floor(SUM(abs(err)) * 1000 / COUNT(*)) AS BIGINT) AS mae_milli,
        |  CAST(floor(SUM(err) * 1000 / COUNT(*)) AS BIGINT) AS bias_milli
        |FROM e GROUP BY method ORDER BY method""".stripMargin,

    "q_ts_resample" ->
      s"""WITH ev AS (SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
         |              COUNT(*) AS n, ${ExactAgg.sqlDsum("value")} AS sum_value
         |            FROM events WHERE value > 150 GROUP BY 1, 2),
         |b AS (SELECT CAST(date_trunc('day', min(ts)) AS TIMESTAMP) AS d0,
         |             CAST(date_trunc('day', max(ts)) AS TIMESTAMP) AS d1 FROM events),
         |spine AS (SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS TIMESTAMP) AS day FROM b),
         |types AS (SELECT DISTINCT event_type FROM events),
         |grid AS (SELECT day, event_type FROM spine CROSS JOIN types)
         |SELECT g.day, g.event_type,
         |  CAST(coalesce(e.n, 0) AS BIGINT) AS n,
         |  last_value(e.sum_value IGNORE NULLS) OVER (PARTITION BY g.event_type ORDER BY g.day
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ffill_sum
         |FROM grid g LEFT JOIN ev e ON g.day = e.day AND g.event_type = e.event_type
         |ORDER BY g.day, g.event_type""".stripMargin,

    "q_ts_rolling_dau" ->
      """WITH actives AS (SELECT DISTINCT user_id,
        |                   CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
        |                 FROM events),
        |b AS (SELECT CAST(date_trunc('day', min(ts)) AS TIMESTAMP) AS d0,
        |             CAST(date_trunc('day', max(ts)) AS TIMESTAMP) AS d1 FROM events),
        |e AS (SELECT user_id,
        |        CAST(unnest(generate_series(day, day + INTERVAL 6 DAY, INTERVAL 1 DAY))
        |          AS TIMESTAMP) AS report_day
        |      FROM actives)
        |SELECT report_day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau
        |FROM e CROSS JOIN b
        |WHERE report_day >= d0 + INTERVAL 6 DAY AND report_day <= d1
        |GROUP BY report_day ORDER BY report_day""".stripMargin,

    "q_ts_streaks" ->
      """WITH days AS (SELECT DISTINCT user_id,
        |                CAST(CAST(date_trunc('day', ts) AS DATE)
        |                  - DATE '1992-01-06' AS BIGINT) AS di
        |              FROM events),
        |runs AS (SELECT user_id,
        |           di - row_number() OVER (PARTITION BY user_id ORDER BY di) AS grp
        |         FROM days),
        |rl AS (SELECT user_id, grp, CAST(count(*) AS BIGINT) AS len
        |       FROM runs GROUP BY 1, 2),
        |lg AS (SELECT user_id, max(len) AS longest FROM rl GROUP BY 1)
        |SELECT CAST(longest AS BIGINT) AS longest,
        |       CAST(count(*) AS BIGINT) AS n_users
        |FROM lg GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_ts_stl" ->
      """WITH daily AS (SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |                 CAST(COUNT(*) AS BIGINT) AS cnt
        |               FROM events GROUP BY 1),
        |t AS (SELECT day, cnt,
        |        CAST(((CAST(day AS DATE) - DATE '1992-01-06') % 7 + 7) % 7 AS BIGINT) AS dow,
        |        CAST(SUM(cnt) OVER w AS BIGINT) AS t7,
        |        CAST(COUNT(*) OVER w AS BIGINT) AS nw
        |      FROM daily
        |      WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |t2 AS (SELECT day, cnt, dow,
        |         CASE WHEN nw = 7 THEN CAST(t7 AS DOUBLE) / 7.0 END AS trend,
        |         CASE WHEN nw = 7 THEN 7 * cnt - t7 END AS detr7
        |       FROM t),
        |se AS (SELECT dow,
        |         CAST(SUM(detr7) AS DOUBLE) / CAST(7 * COUNT(*) AS DOUBLE) AS seasonal
        |       FROM t2 WHERE detr7 IS NOT NULL GROUP BY dow)
        |SELECT t2.day, t2.cnt, t2.dow, t2.trend, se.seasonal,
        |  CAST(t2.cnt AS DOUBLE) - t2.trend - se.seasonal AS remainder
        |FROM t2 LEFT JOIN se ON t2.dow = se.dow
        |ORDER BY t2.day""".stripMargin,

    "q_ts_acf" ->
      ("""WITH daily AS (SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |                 CAST(COUNT(*) AS BIGINT) AS cnt
        |               FROM events GROUP BY 1),
        |l AS (SELECT cnt,
        |""".stripMargin
        + (1 to 7).map(k => s"        lag(cnt, $k) OVER (ORDER BY day) AS l$k").mkString(",\n")
        + "\n      FROM daily),\n"
        + "st AS (\n"
        + (1 to 7).map(k =>
            s"  SELECT CAST($k AS BIGINT) AS lag, cnt, l$k AS xl FROM l WHERE l$k IS NOT NULL")
          .mkString("\n  UNION ALL\n")
        + "),\n"
        + """g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(cnt) AS BIGINT) AS s,
        |             CAST(SUM(cnt * cnt) AS BIGINT) AS q FROM daily),
        |p AS (SELECT lag, CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |        CAST(SUM(cnt * xl) AS BIGINT) AS sxy,
        |        CAST(SUM(cnt + xl) AS BIGINT) AS sxpy
        |      FROM st GROUP BY lag)
        |SELECT lag, n_pairs,
        |  CAST(n * n * sxy - n * s * sxpy + n_pairs * s * s AS DOUBLE)
        |    / CAST(n * n * q - n * s * s AS DOUBLE) AS r
        |FROM p CROSS JOIN g ORDER BY lag""".stripMargin),

    "q_ts_ljungbox" ->
      ("""WITH daily AS (SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |                 CAST(COUNT(*) AS BIGINT) AS cnt
        |               FROM events GROUP BY 1),
        |l AS (SELECT cnt,
        |""".stripMargin
        + (1 to 7).map(k => s"        lag(cnt, $k) OVER (ORDER BY day) AS l$k").mkString(",\n")
        + "\n      FROM daily),\n"
        + "st AS (\n"
        + (1 to 7).map(k =>
            s"  SELECT CAST($k AS BIGINT) AS lag, cnt, l$k AS xl FROM l WHERE l$k IS NOT NULL")
          .mkString("\n  UNION ALL\n")
        + "),\n"
        + """g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(cnt) AS BIGINT) AS s,
        |             CAST(SUM(cnt * cnt) AS BIGINT) AS q FROM daily),
        |p AS (SELECT lag, CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |        CAST(SUM(cnt * xl) AS BIGINT) AS sxy,
        |        CAST(SUM(cnt + xl) AS BIGINT) AS sxpy
        |      FROM st GROUP BY lag),
        |r AS (SELECT lag, g.n,
        |        CAST(g.n * g.n * p.sxy - g.n * g.s * p.sxpy + p.n_pairs * g.s * g.s AS DOUBLE)
        |          / CAST(g.n * g.n * g.q - g.n * g.s * g.s AS DOUBLE) AS r
        |      FROM p CROSS JOIN g),
        |qk AS (SELECT lag, CAST(n * (n + 2) AS DOUBLE) * r * r
        |         / CAST(n - lag AS DOUBLE) AS qk FROM r),
        |w AS (SELECT
        |""".stripMargin
        + (1 to 7).map(k => s"        max(CASE WHEN lag = $k THEN qk END) AS q$k").mkString(",\n")
        + "\n      FROM qk),\n"
        + "u AS (\n"
        + (1 to 7).map(k =>
            s"  SELECT CAST($k AS BIGINT) AS lag, " +
              (1 to k).map(j => s"q$j").mkString(" + ") + " AS q_lb FROM w")
          .mkString("\n  UNION ALL\n")
        + """)
        |SELECT lag, q_lb,
        |  CASE lag WHEN 1 THEN CAST(3.841 AS DOUBLE)
        |    WHEN 2 THEN CAST(5.991 AS DOUBLE) WHEN 3 THEN CAST(7.815 AS DOUBLE)
        |    WHEN 4 THEN CAST(9.488 AS DOUBLE) WHEN 5 THEN CAST(11.070 AS DOUBLE)
        |    WHEN 6 THEN CAST(12.592 AS DOUBLE) ELSE CAST(14.067 AS DOUBLE)
        |  END AS crit,
        |  q_lb > (CASE lag WHEN 1 THEN CAST(3.841 AS DOUBLE)
        |    WHEN 2 THEN CAST(5.991 AS DOUBLE) WHEN 3 THEN CAST(7.815 AS DOUBLE)
        |    WHEN 4 THEN CAST(9.488 AS DOUBLE) WHEN 5 THEN CAST(11.070 AS DOUBLE)
        |    WHEN 6 THEN CAST(12.592 AS DOUBLE) ELSE CAST(14.067 AS DOUBLE)
        |  END) AS reject_95
        |FROM u ORDER BY lag""".stripMargin),

    "q_ts_dailygini" ->
      """WITH daily AS (SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |                 user_id, CAST(COUNT(*) AS BIGINT) AS c
        |               FROM events GROUP BY 1, 2),
        |r AS (SELECT day, c,
        |        CAST(ROW_NUMBER() OVER (PARTITION BY day ORDER BY c, user_id)
        |          AS BIGINT) AS i
        |      FROM daily),
        |a AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS n_users,
        |        CAST(SUM(c) AS BIGINT) AS n_events,
        |        CAST(SUM(i * c) AS BIGINT) AS ic
        |      FROM r GROUP BY day)
        |SELECT day, n_users, n_events,
        |  CAST((2::HUGEINT * ic - (n_users + 1)::HUGEINT * n_events) * 1000000
        |    // (n_users::HUGEINT * n_events) AS BIGINT) AS gini_ppm
        |FROM a ORDER BY day""".stripMargin,

    "q_ts_interarrival" ->
      """WITH g AS (SELECT user_id,
        |    epoch_us(ts) - lag(epoch_us(ts))
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
        |  FROM events)
        |SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
        |  CAST(COUNT(*) AS BIGINT) AS n_gaps,
        |  quantile_cont(gap, 0.5) AS med_gap_us,
        |  quantile_cont(gap, 0.9) AS p90_gap_us,
        |  CAST(MAX(gap) AS BIGINT) AS max_gap_us
        |FROM g WHERE gap IS NOT NULL""".stripMargin,

    "q_ts_vwap" ->
      """WITH daily AS (SELECT CAST(date_trunc('day', l_shipdate) AS TIMESTAMP)
        |                 AS day,
        |    SUM(CAST(floor(l_extendedprice * 100) AS BIGINT)::HUGEINT
        |        * CAST(l_quantity AS BIGINT)) AS pv,
        |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        |  FROM lineitem GROUP BY 1),
        |w AS (SELECT day, qty, pv,
        |        COUNT(*) OVER f AS n7,
        |        SUM(pv) OVER f AS pv7, SUM(qty) OVER f AS q7
        |      FROM daily
        |      WINDOW f AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
        |SELECT day, qty,
        |  CAST(pv // qty AS BIGINT) AS vwap_cents,
        |  CAST(pv7 // q7 AS BIGINT) AS vwap7_cents
        |FROM w WHERE n7 = 7 ORDER BY day""".stripMargin,

    "q_ts_stochastic" ->
      """WITH daily AS (SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP)
        |                 AS day,
        |    CAST(MAX(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS hi,
        |    CAST(MIN(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS lo,
        |    CAST(max_by(CAST(floor(o_totalprice * 100) AS BIGINT), o_orderkey)
        |      AS BIGINT) AS close
        |  FROM orders GROUP BY 1),
        |w AS (SELECT day, close,
        |        COUNT(*) OVER f AS n14,
        |        CAST(MAX(hi) OVER f AS BIGINT) AS hi14,
        |        CAST(MIN(lo) OVER f AS BIGINT) AS lo14
        |      FROM daily
        |      WINDOW f AS (ORDER BY day ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)),
        |k AS (SELECT day, close, hi14, lo14,
        |        CAST((close - lo14) * 1000000 // (hi14 - lo14) AS BIGINT) AS k_ppm
        |      FROM w WHERE n14 = 14 AND hi14 > lo14),
        |kk AS (SELECT day, close, hi14, lo14, k_ppm,
        |         lag(k_ppm, 1) OVER (ORDER BY day) AS k1,
        |         lag(k_ppm, 2) OVER (ORDER BY day) AS k2
        |       FROM k)
        |SELECT day, close, hi14, lo14, k_ppm,
        |  CAST((k_ppm + k1 + k2) // 3 AS BIGINT) AS d_ppm
        |FROM kk WHERE k2 IS NOT NULL ORDER BY day""".stripMargin,

    "q_win_rollcorr" ->
      """WITH daily AS (SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |    CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS x,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS y
        |  FROM events GROUP BY 1),
        |w AS (SELECT day,
        |        CAST(COUNT(*) OVER f AS BIGINT) AS n,
        |        CAST(SUM(x) OVER f AS BIGINT) AS sx,
        |        CAST(SUM(y) OVER f AS BIGINT) AS sy,
        |        CAST(SUM(x * y) OVER f AS BIGINT) AS sxy,
        |        CAST(SUM(x * x) OVER f AS BIGINT) AS sxx,
        |        CAST(SUM(y * y) OVER f AS BIGINT) AS syy
        |      FROM daily
        |      WINDOW f AS (ORDER BY day ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)),
        |c AS (SELECT day, n * sxy - sx * sy AS cov,
        |        n * sxx - sx * sx AS vx, n * syy - sy * sy AS vy
        |      FROM w WHERE n = 14)
        |SELECT day,
        |  CAST(CASE WHEN cov < 0 THEN -1 ELSE 1 END
        |    * (cov::HUGEINT * cov * 1000000 // (vx::HUGEINT * vy)) AS BIGINT)
        |    AS corr2s_ppm
        |FROM c WHERE vx > 0 AND vy > 0
        |ORDER BY day""".stripMargin,

    "q_ts_drawdown" ->
      """WITH daily AS (SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |    CAST(SUM(CASE WHEN event_type = 'purchase'
        |          THEN CAST(floor(value * 100) AS BIGINT)
        |          ELSE -CAST(floor(value * 100) AS BIGINT) END) AS BIGINT) AS flow
        |  FROM events WHERE event_type IN ('purchase', 'error') GROUP BY 1),
        |e AS (SELECT day, SUM(flow) OVER (ORDER BY day) AS equity FROM daily),
        |p AS (SELECT day, equity,
        |        MAX(equity) OVER (ORDER BY day) - equity AS dd FROM e),
        |m AS (SELECT CAST(MAX(dd) AS BIGINT) AS max_dd FROM p)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_days, m.max_dd,
        |  MIN(CASE WHEN p.dd = m.max_dd THEN p.day END) AS trough_day,
        |  CAST(MAX(CASE WHEN p.day = (SELECT MAX(day) FROM p) THEN p.equity END)
        |    AS BIGINT) AS equity_end
        |FROM p, m GROUP BY m.max_dd""".stripMargin,

    "q_ts_pacf" ->
      ("""WITH daily AS (SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |                 CAST(COUNT(*) AS BIGINT) AS cnt
        |               FROM events GROUP BY 1),
        |l AS (SELECT cnt,
        |""".stripMargin
        + (1 to 3).map(k => s"        lag(cnt, $k) OVER (ORDER BY day) AS l$k").mkString(",\n")
        + "\n      FROM daily),\n"
        + "st AS (\n"
        + (1 to 3).map(k =>
            s"  SELECT CAST($k AS BIGINT) AS lag, cnt, l$k AS xl FROM l WHERE l$k IS NOT NULL")
          .mkString("\n  UNION ALL\n")
        + "),\n"
        + """g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(cnt) AS BIGINT) AS s,
        |             CAST(SUM(cnt * cnt) AS BIGINT) AS q FROM daily),
        |p AS (SELECT lag, CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |        CAST(SUM(cnt * xl) AS BIGINT) AS sxy,
        |        CAST(SUM(cnt + xl) AS BIGINT) AS sxpy
        |      FROM st GROUP BY lag),
        |r AS (SELECT lag,
        |        CAST(g.n * g.n * p.sxy - g.n * g.s * p.sxpy + p.n_pairs * g.s * g.s AS DOUBLE)
        |          / CAST(g.n * g.n * g.q - g.n * g.s * g.s AS DOUBLE) AS r
        |      FROM p CROSS JOIN g),
        |w AS (SELECT max(CASE WHEN lag = 1 THEN r END) AS r1,
        |        max(CASE WHEN lag = 2 THEN r END) AS r2,
        |        max(CASE WHEN lag = 3 THEN r END) AS r3 FROM r),
        |c1 AS (SELECT r1, r2, r3,
        |         (r2 - r1 * r1) / (CAST(1 AS DOUBLE) - r1 * r1) AS p22 FROM w),
        |c2 AS (SELECT r1, r2, r3, p22, r1 - p22 * r1 AS p21 FROM c1),
        |c3 AS (SELECT r1, p22,
        |         (r3 - p21 * r2 - p22 * r1)
        |           / (CAST(1 AS DOUBLE) - p21 * r1 - p22 * r2) AS p33 FROM c2)
        |SELECT CAST(1 AS BIGINT) AS lag, r1 AS pacf FROM c3
        |UNION ALL SELECT CAST(2 AS BIGINT), p22 FROM c3
        |UNION ALL SELECT CAST(3 AS BIGINT), p33 FROM c3
        |ORDER BY lag""".stripMargin),

    "q_ts_dft" -> {
      def block(p: Int): String =
        s"""SELECT CAST($p AS BIGINT) AS period, CAST(MAX(n) AS BIGINT) AS n,
           |  CAST(SUM(dev * (${trigCase("t", p, sin = false)})) AS BIGINT) AS c_num,
           |  CAST(SUM(dev * (${trigCase("t", p, sin = true)})) AS BIGINT) AS s_num,
           |  CAST(SUM(dev * dev) AS BIGINT) AS qq
           |FROM dev""".stripMargin
      """WITH daily AS (SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |                 CAST(COUNT(*) AS BIGINT) AS cnt
        |               FROM events GROUP BY 1),
        |g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(cnt) AS BIGINT) AS s
        |      FROM daily),
        |dev AS (SELECT CAST(datediff('day', DATE '1992-01-06', CAST(day AS DATE))
        |                 AS BIGINT) AS t,
        |          g.n * cnt - g.s AS dev, g.n
        |        FROM daily, g),
        |p AS (
        |""".stripMargin +
        Seq(7, 14, 30).map(block).mkString("\n  UNION ALL\n") +
        """)
        |SELECT period, c_num, s_num,
        |  CAST((c_num::HUGEINT * c_num + s_num::HUGEINT * s_num) * 1000000
        |    // (n::HUGEINT * 1000000000000 * qq) AS BIGINT) AS power_ppm
        |FROM p ORDER BY period""".stripMargin
    },

    "q_ts_anomaly_mad" ->
      """WITH daily AS (SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |                 CAST(COUNT(*) AS BIGINT) AS cnt
        |               FROM events GROUP BY 1, 2),
        |med AS (SELECT event_type, quantile_cont(cnt, 0.5) AS med
        |        FROM daily GROUP BY event_type),
        |mad AS (SELECT d.event_type, m.med,
        |          quantile_cont(abs(d.cnt - m.med), 0.5) AS mad
        |        FROM daily d JOIN med m ON d.event_type = m.event_type
        |        GROUP BY d.event_type, m.med)
        |SELECT d.event_type, d.day, d.cnt, a.med, a.mad,
        |  10000.0 * abs(d.cnt - a.med) > 44478.0 * a.mad AS is_anomaly
        |FROM daily d JOIN mad a ON d.event_type = a.event_type
        |ORDER BY d.event_type, d.day""".stripMargin,

    "q_ts_rollmedian" ->
      """WITH daily AS (SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |                 CAST(COUNT(*) AS BIGINT) AS cnt
        |               FROM events GROUP BY 1),
        |r AS (SELECT day, cnt,
        |        CAST(COUNT(*) OVER w AS BIGINT) AS nw,
        |        quantile_cont(cnt, 0.5) OVER w AS q
        |      FROM daily
        |      WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING))
        |SELECT day, cnt, CASE WHEN nw = 7 THEN q END AS med7
        |FROM r ORDER BY day""".stripMargin,

    "q_ts_bursts" ->
      """WITH daily AS (SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |                 CAST(COUNT(*) AS BIGINT) AS cnt
        |               FROM events GROUP BY 1),
        |m AS (SELECT quantile_cont(cnt, 0.9) AS p90 FROM daily),
        |f AS (SELECT day, cnt,
        |        CAST(CAST(day AS DATE) - DATE '1992-01-06' AS BIGINT)
        |          - row_number() OVER (ORDER BY day) AS grp
        |      FROM daily CROSS JOIN m
        |      WHERE CAST(cnt AS DOUBLE) > p90)
        |SELECT MIN(day) AS burst_start, MAX(day) AS burst_end,
        |  CAST(COUNT(*) AS BIGINT) AS n_days,
        |  CAST(MAX(cnt) AS BIGINT) AS peak_cnt,
        |  CAST(SUM(cnt) AS BIGINT) AS total_cnt
        |FROM f GROUP BY grp ORDER BY burst_start""".stripMargin,

    "q_ts_concurrency" ->
      s"""WITH lagged AS (
         |  SELECT user_id, event_id, ts,
         |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
         |  FROM events),
         |flagged AS (
         |  SELECT *, CASE WHEN prev_ts IS NULL
         |                   OR epoch_us(ts) - epoch_us(prev_ts) > ${6 * 3600}::BIGINT * 1000000
         |                 THEN 1 ELSE 0 END AS new_session
         |  FROM lagged),
         |numbered AS (
         |  SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
         |  FROM flagged),
         |sessions AS (
         |  SELECT MIN(ts) AS session_start, MAX(ts) AS session_end
         |  FROM numbered GROUP BY user_id, session_idx),
         |bounds AS (
         |  SELECT session_start AS t, CAST(1 AS BIGINT) AS delta FROM sessions
         |  UNION ALL
         |  SELECT session_end, CAST(-1 AS BIGINT) FROM sessions),
         |sweep AS (
         |  SELECT t, CAST(SUM(delta) OVER (ORDER BY t ASC, delta DESC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS open
         |  FROM bounds),
         |p AS (
         |  SELECT CAST(date_trunc('day', t) AS TIMESTAMP) AS day, t, open,
         |    MAX(open) OVER (PARTITION BY CAST(date_trunc('day', t) AS TIMESTAMP)) AS pk
         |  FROM sweep)
         |SELECT day, MAX(open) AS peak_open,
         |  MIN(CASE WHEN open = pk THEN t END) AS peak_at
         |FROM p GROUP BY day ORDER BY day""".stripMargin,

    "q_ts_hw" -> hwOracleSql(""),


    "q_ts_holt" ->
      """WITH daily AS (SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |                 CAST(COUNT(*) AS DOUBLE) AS cnt
        |               FROM events GROUP BY 1, 2),
        |-- [l, b] LIST accumulator, NOT a named struct: DuckDB v1.0's
        |-- list_reduce evaluates a struct-returning lambda field by
        |-- field with acc REBOUND to the new value in between (the 'b'
        |-- expression would see the new 'l'); list results evaluate
        |-- all elements against the old accumulator, matching Spark
        |g AS (SELECT event_type,
        |        list([cnt, CAST(0.0 AS DOUBLE)] ORDER BY day) AS es
        |      FROM daily GROUP BY event_type),
        |r AS (SELECT event_type, CAST(len(es) AS INT) AS n_days,
        |        list_reduce(es, (acc, e) ->
        |          [(acc[1] + acc[2]) / CAST(2.0 AS DOUBLE) + e[1] / CAST(2.0 AS DOUBLE),
        |           acc[2] * CAST(0.75 AS DOUBLE)
        |             + ((acc[1] + acc[2]) / CAST(2.0 AS DOUBLE) + e[1] / CAST(2.0 AS DOUBLE)
        |                - acc[1]) * CAST(0.25 AS DOUBLE)]) AS hw
        |      FROM g)
        |SELECT event_type, n_days, hw[1] AS level, hw[2] AS trend,
        |  hw[1] + hw[2] AS forecast_1
        |FROM r ORDER BY event_type""".stripMargin,

    "q_ts_ccf" ->
      ("""WITH daily AS (SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |                 CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS x,
        |                 CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS y
        |               FROM events WHERE event_type IN ('view', 'purchase')
        |               GROUP BY 1),
        |sh AS (SELECT x,
        |""".stripMargin
        + (-3 to 3).map { k =>
            val fn = if (k >= 0) s"lead(y, $k)" else s"lag(y, ${-k})"
            s"        $fn OVER (ORDER BY day) AS s${k + 3}"
          }.mkString(",\n")
        + "\n      FROM daily),\nst AS (\n"
        + (-3 to 3).map(k =>
            s"  SELECT CAST($k AS BIGINT) AS lag, x, s${k + 3} AS yl FROM sh WHERE s${k + 3} IS NOT NULL")
          .mkString("\n  UNION ALL\n")
        + "),\n"
        + """g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |             CAST(SUM(x * x) AS BIGINT) AS qx, CAST(SUM(y * y) AS BIGINT) AS qy
        |      FROM daily),
        |p AS (SELECT lag, CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |        CAST(SUM(x * yl) AS BIGINT) AS pxy,
        |        CAST(SUM(x) AS BIGINT) AS px, CAST(SUM(yl) AS BIGINT) AS py
        |      FROM st GROUP BY lag)
        |SELECT lag, n_pairs,
        |  CAST(n * n * pxy - n * sy * px - n * sx * py + n_pairs * sx * sy AS DOUBLE)
        |    / sqrt(CAST(n * n * qx - n * sx * sx AS DOUBLE)
        |         * CAST(n * n * qy - n * sy * sy AS DOUBLE)) AS r
        |FROM p CROSS JOIN g ORDER BY lag""".stripMargin),

    "q_ts_theilsen" ->
      """WITH daily AS (SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |                 CAST(COUNT(*) AS BIGINT) AS cnt
        |               FROM events GROUP BY 1, 2),
        |pr AS (SELECT a.event_type,
        |         CAST(b.cnt - a.cnt AS DOUBLE)
        |           / CAST(CAST(b.day AS DATE) - CAST(a.day AS DATE) AS DOUBLE) AS slope
        |       FROM daily a JOIN daily b
        |         ON a.event_type = b.event_type AND a.day < b.day)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |  quantile_cont(slope, 0.5) AS slope_med
        |FROM pr GROUP BY event_type ORDER BY event_type""".stripMargin
  )
}
