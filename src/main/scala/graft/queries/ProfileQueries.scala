package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.QueryBuilder
import graft.engine.QueryBuilder.scan
import graft.model.{Connector, Endpoint, Sort}
import graft.ops.ExactAgg._

/** Data-profiling + endpoint-catalog queries: per-column statistics in
  * one pass (the scan-once profile shape that matters at 100 TB — never
  * one job per column), fixed-width histograms, and the reference's
  * endpoint defaultFields resolution (P3).
  */
object ProfileQueries {

  /** Zone-map predicate window in days from the 1992-01-06 Monday
    * epoch: [1994-03-01, 1994-03-31], one shared constant pair so the
    * engine literal and the oracle literal cannot drift.
    */
  private val zmLo: Long = java.time.temporal.ChronoUnit.DAYS.between(
    java.time.LocalDate.of(1992, 1, 6), java.time.LocalDate.of(1994, 3, 1))
  private val zmHi: Long = zmLo + 30

  private val endpoints = Map(
    "customers" -> Endpoint("customers", "customer",
      defaultFields = Seq("c_custkey", "c_name", "c_mktsegment")))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // one-pass multi-column profile (null counts, distincts, ranges)
    "q_profile" -> ((s: SparkSession, d: String) => {
      scan(s, d, "orders").agg(
        count(lit(1)).as("n_rows"),
        count(col("o_custkey")).as("custkey_nonnull"),
        countDistinct(col("o_custkey")).as("custkey_distinct"),
        countDistinct(col("o_orderstatus")).as("status_distinct"),
        min(col("o_totalprice")).as("price_min"),
        max(col("o_totalprice")).as("price_max"),
        dsum(col("o_totalprice")).as("price_sum"),
        min(col("o_orderdate")).as("date_min"),
        max(col("o_orderdate")).as("date_max"))
    }),

    // ALL-COLUMN COMPLETENESS census in ONE Expand pass (the Deequ-
    // style profiler shape): every column unpivoted to (colname,
    // value-as-string), then a two-level census — rows / nulls /
    // distinct non-nulls per column. Cross-engine safety note: the
    // string rendering only has to be INJECTIVE within each engine
    // (only the COUNTS leave the plan, never the renderings), so
    // double/timestamp casts are safe even though the two engines
    // format them differently. One Expand + two combinable
    // aggregations — never a job per column
    "q_profile_completeness" -> ((s: SparkSession, d: String) => {
      val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority")
      val stackArgs = cols.map(c => s"'$c', CAST($c AS STRING)").mkString(", ")
      scan(s, d, "orders")
        .select(expr(s"stack(${cols.size}, $stackArgs) AS (colname, v)"))
        .groupBy(col("colname"), col("v")).agg(count(lit(1)).as("c"))
        .groupBy(col("colname"))
        .agg(sum(col("c")).as("n_rows"),
          sum(when(col("v").isNull, col("c")).otherwise(0L)).as("n_null"),
          count(when(col("v").isNotNull, lit(1))).as("n_distinct"))
        .orderBy(col("colname"))
    }),

    // PER-COLUMN TOP VALUES (the profiler's "most frequent values"
    // panel): every column's top-3 values by count in ONE Expand pass
    // over (colname, value) — the q_profile_completeness unpivot
    // composed with the TopKPerKey physical operator (per-partition
    // heaps prune to ≤3 rows per column BEFORE the shuffle; a window
    // would ship the whole value census). Columns restricted to
    // int/string renderings, which both engines format identically —
    // unlike the completeness census, the VALUES cross engines here
    "q_profile_topvals" -> ((s: SparkSession, d: String) => {
      val cols = Seq("o_orderstatus", "o_orderpriority", "o_custkey")
      val stackArgs = cols.map(c => s"'$c', CAST($c AS STRING)").mkString(", ")
      val census = scan(s, d, "orders")
        .select(expr(s"stack(${cols.size}, $stackArgs) AS (colname, v)"))
        .groupBy(col("colname"), col("v")).agg(count(lit(1)).as("cnt"))
      graft.plans.TopKPerKey.topKPerKey(census,
          keyCols = Seq("colname"), sorts = Seq(("cnt", false), ("v", true)), k = 3)
        .select(col("colname"), col("v"), col("cnt"))
        .orderBy(col("colname"), col("cnt").desc, col("v"))
    }),

    // key-skew profile: per-key frequency distribution of a join key —
    // the diagnostic that picks the hot-key threshold for
    // Joins.saltedJoin (max/avg ratio >> 1 ⇒ salt those keys). Two
    // aggregations (key counts, then stats over counts), both
    // partial-aggregated; exact percentiles over integer counts
    "q_profile_skew" -> ((s: SparkSession, d: String) => {
      val counts = scan(s, d, "lineitem")
        .groupBy(col("l_orderkey")).agg(count(lit(1)).as("n"))
      counts.agg(
        count(lit(1)).as("n_keys"),
        min(col("n")).as("min_n"),
        max(col("n")).as("max_n"),
        percentile(col("n").cast("double"), lit(0.5)).as("p50_n"),
        percentile(col("n").cast("double"), lit(0.99)).as("p99_n"),
        (max(col("n")).cast("double") /
          (sum(col("n")).cast("double") / count(lit(1)).cast("double"))).as("max_over_avg"))
    }),

    // ZONE-MAP SKIPPING EFFECTIVENESS census — the quantified layout
    // decision behind every 100 TB lakehouse: for a canonical
    // one-month shipdate predicate, how many "files" (simulated
    // row-groups: 4096-order-key ingest chunks vs 30-day date
    // partitions) could a min/max zone map prove empty, and what row
    // fraction do they hold? One scan per layout collapsing map-side
    // to the file census (files, not rows, cross the shuffle); the
    // verdict is the ingest layout's ~0 ppm vs the date layout's
    // near-total skip — the measured case for sorting before landing
    "q_profile_zonemap" -> ((s: SparkSession, d: String) => {
      import org.apache.spark.sql.Column
      val li = scan(s, d, "lineitem").select(
        col("l_orderkey"),
        datediff(col("l_shipdate").cast("date"),
          lit("1992-01-06").cast("date")).cast("long").as("di"))
      def census(label: String, fileId: Column): DataFrame = {
        val skip = col("hi_di") < zmLo || col("lo_di") > zmHi
        li.groupBy(fileId.as("f"))
          .agg(min(col("di")).as("lo_di"), max(col("di")).as("hi_di"),
            count(lit(1)).as("n"))
          .agg(count(lit(1)).as("n_files"), sum(col("n")).as("n_rows"),
            sum(when(skip, 1L).otherwise(0L)).as("n_files_skip"),
            sum(when(skip, col("n")).otherwise(0L)).as("n_rows_skip"))
          .select(lit(label).as("layout"), col("n_files").cast("long"),
            col("n_rows").cast("long"), col("n_files_skip").cast("long"),
            col("n_rows_skip").cast("long"),
            expr("n_rows_skip * 1000000 div n_rows").as("skip_ppm"))
      }
      census("ingest", expr("l_orderkey div 4096"))
        .unionAll(census("shipdate", expr("di div 30")))
        .orderBy(col("layout"))
    }),

    // fixed-width histogram (single pass, no per-bin jobs)
    "q_histogram" -> ((s: SparkSession, d: String) => {
      scan(s, d, "orders")
        .groupBy(floor(col("o_totalprice") / 50000.0).cast("long").as("bin"))
        .agg(count(lit(1)).as("n"),
          min(col("o_totalprice")).as("lo"),
          max(col("o_totalprice")).as("hi"))
        .orderBy(col("bin"))
    }),

    // P3: empty fields resolve to the endpoint's defaultFields
    "q_endpoint_defaults" -> ((s: SparkSession, d: String) => {
      QueryBuilder.buildFromEndpoint(s, d, endpoints, "customers",
        Connector(table = null, sort = Seq(Sort.asc("c_custkey")), limit = 0))
    }),

    // PARTITION-KEY ADVISOR — the table-layout decision a 100 TB write
    // runs once: for each candidate partitioning (lang / source /
    // lang×source), the partition count, size extremes, and max/avg
    // skew in floor-ppm, all from ONE cube pass (each rollup level IS
    // one candidate's partition census). High skew ⇒ hot partitions;
    // too many tiny partitions ⇒ the small-file problem the compaction
    // planner below exists to fix
    "q_profile_partition_advisor" -> ((s: SparkSession, d: String) => {
      val docs = scan(s, d, "documents")
      val classes = docs.cube(col("lang"), col("source"))
        .agg(count(lit(1)).as("n"),
          (grouping(col("lang")) * 2 + grouping(col("source"))).as("gid"))
        .filter(col("gid") < 3)
      classes.groupBy(col("gid"))
        .agg(count(lit(1)).as("n_partitions"),
          min(col("n")).as("min_rows"), max(col("n")).as("max_rows"),
          sum(col("n")).as("total"))
        .select(
          when(col("gid") === 0, "lang+source")
            .when(col("gid") === 1, "source").otherwise("lang").as("candidate"),
          col("n_partitions").cast("long").as("n_partitions"),
          col("min_rows").cast("long").as("min_rows"),
          col("max_rows").cast("long").as("max_rows"),
          expr("max_rows * n_partitions * 1000000 div total").as("skew_ppm"))
        .orderBy(col("candidate"))
    }),

    // SMALL-FILE COMPACTION planner (the Delta/Iceberg OPTIMIZE shape):
    // census the per-source "files" of the corpus (n_docs, bytes), then
    // bin-pack them into merge groups of ~total/6 bytes by
    // largest-first sequential fill — group = floor(cumsum_before /
    // target), the first-fit-decreasing approximation whose group size
    // is bounded by target + max_file. The windows here run over the
    // FILE MANIFEST (#files rows — metadata-scale, exactly what a real
    // table service bin-packs on the driver), never over the data; the
    // only data-sized work is the one map-side-combinable census
    "q_profile_compaction" -> ((s: SparkSession, d: String) => {
      import org.apache.spark.sql.expressions.Window
      val m = scan(s, d, "documents")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("bytes"))
      val fill = Window.orderBy(col("bytes").desc, col("source").asc)
      val planned = m
        .withColumn("cum_before", coalesce(
          sum(col("bytes")).over(fill.rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
        .withColumn("total", sum(col("bytes")).over(
          Window.partitionBy().rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
        .withColumn("grp", expr("cum_before div (total div 6 + 1)").cast("int"))
      val byGrp = Window.partitionBy(col("grp"))
      planned
        .withColumn("grp_bytes", sum(col("bytes")).over(byGrp))
        .withColumn("grp_files", count(lit(1)).over(byGrp))
        .select(col("source"), col("n_docs"), col("bytes"), col("grp"),
          col("grp_bytes"), col("grp_files"))
        .orderBy(col("grp"), col("bytes").desc, col("source"))
    }),

    // COLUMN LINEAGE (ops/Lineage.scala): walk the analyzed plan of a
    // representative join+filter+agg report and resolve every output
    // column to the (source table, source column) leaves it references
    // — plan metadata only, driver-side, O(plan) regardless of data
    // size. The oracle is the hand-derived lineage as a VALUES table:
    // if the walker mis-propagates through Project/Aggregate/Join, the
    // hash gate catches it
    "q_profile_lineage" -> ((s: SparkSession, d: String) => {
      val report = scan(s, d, "customer")
        .join(scan(s, d, "orders"), col("c_custkey") === col("o_custkey"))
        .filter(col("o_orderstatus") =!= "X")
        .groupBy(col("c_mktsegment"))
        .agg(
          sum(col("o_totalprice")).as("revenue"),
          countDistinct(col("o_orderkey")).as("n_orders"),
          max(col("c_acctbal") + col("o_totalprice")).as("max_combined"))
        .select(col("c_mktsegment").as("segment"), col("revenue"),
          col("n_orders"), col("max_combined"))
      val rows = graft.ops.Lineage.columnLineage(report)
      s.createDataFrame(rows).toDF("out_col", "src_table", "src_col")
        .orderBy(col("out_col"), col("src_table"), col("src_col"))
    }),

    // PII-PROPAGATION audit (Lineage.piiFlow): the lineage walk joined
    // against a declared sensitive-column register — every edge of a
    // derived report flagged is_pii when its source leaf is sensitive.
    // `contact` embeds c_name (PII) and c_mktsegment (not): the audit
    // must flag exactly the c_name edge, proving taint tracking is
    // per-EDGE, not per-output-column
    "q_profile_pii_flow" -> ((s: SparkSession, d: String) => {
      val pii = Set("customer" -> "c_name", "customer" -> "c_address",
        "customer" -> "c_acctbal")
      val report = scan(s, d, "orders")
        .join(scan(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"),
          concat(col("c_name"), lit(" <"), col("c_mktsegment"), lit(">")).as("contact"),
          col("o_totalprice").as("amount"))
      val rows = graft.ops.Lineage.piiFlow(report, pii)
      s.createDataFrame(rows).toDF("out_col", "src_table", "src_col", "is_pii")
        .orderBy(col("out_col"), col("src_table"), col("src_col"))
    }),

    // SCAN-ONCE CORRELATION MATRIX: Pearson r for every pair of three
    // lineitem measures from ONE codegen'd aggregation (count + 9
    // moment sums) — never a pass per pair, the only shape that
    // survives a 100 TB profile job. Sums are exact order-independent
    // scaled decimals (ExactAgg.dsumScaled — per-row double products
    // are IEEE-identical cross-engine, the dsum(l_extendedprice·(1−d))
    // precedent); the closed-form r from those sums is a fixed chain of
    // IEEE double ops, so both engines agree bit-for-bit with NO
    // tolerance. The 1-row moment relation explodes to 3 pair rows
    // in-plan (no driver round-trip)
    "q_profile_corr" -> ((s: SparkSession, d: String) => {
      import graft.ops.ExactAgg.dsumScaled
      val li = scan(s, d, "lineitem").select(
        col("l_quantity").as("x1"),
        col("l_extendedprice").as("x2"),
        col("l_discount").as("x3"))
      val m = li.agg(
        count(lit(1)).cast("double").as("n"),
        dsumScaled(col("x1"), 4).as("s1"), dsumScaled(col("x2"), 4).as("s2"),
        dsumScaled(col("x3"), 4).as("s3"),
        dsumScaled(col("x1") * col("x1"), 4).as("s11"),
        dsumScaled(col("x2") * col("x2"), 4).as("s22"),
        dsumScaled(col("x3") * col("x3"), 4).as("s33"),
        dsumScaled(col("x1") * col("x2"), 4).as("s12"),
        dsumScaled(col("x1") * col("x3"), 4).as("s13"),
        dsumScaled(col("x2") * col("x3"), 4).as("s23"))
      def r(sx: String, sy: String, sxx: String, syy: String, sxy: String) =
        expr(s"(n * $sxy - $sx * $sy) / sqrt((n * $sxx - $sx * $sx) * (n * $syy - $sy * $sy))")
      m.select(explode(array(
          struct(lit("l_quantity").as("col_x"), lit("l_extendedprice").as("col_y"),
            r("s1", "s2", "s11", "s22", "s12").as("pearson_r")),
          struct(lit("l_quantity").as("col_x"), lit("l_discount").as("col_y"),
            r("s1", "s3", "s11", "s33", "s13").as("pearson_r")),
          struct(lit("l_extendedprice").as("col_x"), lit("l_discount").as("col_y"),
            r("s2", "s3", "s22", "s33", "s23").as("pearson_r")))).as("p"))
        .select(col("p.col_x"), col("p.col_y"), col("p.pearson_r"))
        .orderBy(col("col_x"), col("col_y"))
    }),

    // POISSON-BOOTSTRAP confidence interval (Chamandy 2012 — Google's
    // distributed bootstrap): 32 resamples of mean(acctbal) from ONE
    // scan — per-row Poisson(1) weights come from ONE keyed md5 per row
    // (each resample's uniform is an integer remix of the shared hash)
    // through the inverse-CDF threshold table (no resampling shuffle,
    // no data movement; B weighted sums in one combinable aggregation), the CI
    // is the [2nd, 31st] order statistic of the 32 resample means.
    // Deterministic end-to-end: the thresholds are inlined into the
    // oracle, so the ERROR BAR itself is bit-exact reproducible
    "q_profile_bootstrap" -> ((s: SparkSession, d: String) => {
      val c = scan(s, d, "customer")
      graft.ops.Bootstrap.bootstrapMeans(c, col("c_custkey"),
          floor(col("c_acctbal") * 100).cast("long"), b = 32, salt = "boot1")
        .select(col("n"),
          floor(col("sx") * 10.0 / col("n")).cast("long").as("mean_milli"),
          floor(element_at(col("means"), 2) * 10.0).cast("long").as("ci_lo_milli"),
          floor(element_at(col("means"), 31) * 10.0).cast("long").as("ci_hi_milli"))
    }),

    // GROUPED OLS (price ~ quantity per return flag): slope/intercept/
    // R² in closed form from the same scan-once moment sums as
    // q_profile_corr — grouped regression never needs an iterative
    // solver or a pass per group; exact decimal sums, IEEE closed form
    "q_profile_regression" -> ((s: SparkSession, d: String) => {
      import graft.ops.ExactAgg.dsumScaled
      val m = scan(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).cast("double").as("n"),
          dsumScaled(col("l_quantity"), 4).as("sx"),
          dsumScaled(col("l_extendedprice"), 4).as("sy"),
          dsumScaled(col("l_quantity") * col("l_quantity"), 4).as("sxx"),
          dsumScaled(col("l_extendedprice") * col("l_extendedprice"), 4).as("syy"),
          dsumScaled(col("l_quantity") * col("l_extendedprice"), 4).as("sxy"))
      m.select(col("l_returnflag"),
          expr("(n * sxy - sx * sy) / (n * sxx - sx * sx)").as("beta"),
          expr("(sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n").as("alpha"),
          expr("((n * sxy - sx * sy) * (n * sxy - sx * sy)) / ((n * sxx - sx * sx) * (n * syy - sy * sy))").as("r2"))
        .orderBy(col("l_returnflag"))
    }),

    // FUNCTIONAL-DEPENDENCY / CANDIDATE-KEY discovery (TANE's distinct-
    // count pruning test, Huhtala 1999): A→B holds iff |π_A| = |π_{A,B}|,
    // and A is a key iff |π_A| = |R| — so the WHOLE candidate lattice
    // slice checks in ONE scan of multiple count-distincts (Catalyst
    // Expand; never a job per candidate). surplus = extra dependent
    // combinations (the g1-style violation mass); strength_ppm =
    // floor(det·1e6/ext) so an approximate FD is graded, not just
    // rejected. "→ *" rows are key checks (ext = row count).
    "q_profile_fds" -> ((s: SparkSession, d: String) => {
      val m = scan(s, d, "orders").agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("o_orderkey")).as("cd_ok"),
        countDistinct(col("o_custkey"), col("o_orderdate")).as("cd_cust_date"),
        countDistinct(col("o_orderkey"), col("o_custkey")).as("cd_ok_cust"),
        countDistinct(col("o_custkey")).as("cd_cust"),
        countDistinct(col("o_custkey"), col("o_orderpriority")).as("cd_cust_prio"),
        countDistinct(col("o_orderdate")).as("cd_date"),
        countDistinct(col("o_orderdate"), col("o_orderstatus")).as("cd_date_status"),
        countDistinct(col("o_orderstatus")).as("cd_status"),
        countDistinct(col("o_orderstatus"), col("o_orderpriority")).as("cd_status_prio"))
      def cand(name: String, det: String, ext: String) =
        struct(lit(name).as("candidate"), col(det).as("det_groups"), col(ext).as("ext_groups"))
      m.select(explode(array(
          cand("o_orderkey -> *", "cd_ok", "n_rows"),
          cand("o_custkey,o_orderdate -> *", "cd_cust_date", "n_rows"),
          cand("o_orderkey -> o_custkey", "cd_ok", "cd_ok_cust"),
          cand("o_custkey -> o_orderpriority", "cd_cust", "cd_cust_prio"),
          cand("o_orderdate -> o_orderstatus", "cd_date", "cd_date_status"),
          cand("o_orderstatus -> o_orderpriority", "cd_status", "cd_status_prio"))).as("c"))
        .select(col("c.candidate").as("candidate"),
          col("c.det_groups").as("det_groups"),
          col("c.ext_groups").as("ext_groups"),
          (col("c.ext_groups") - col("c.det_groups")).as("surplus"),
          (col("c.ext_groups") === col("c.det_groups")).as("holds"),
          floor(col("c.det_groups") * lit(1000000L) / col("c.ext_groups")).as("strength_ppm"))
        .orderBy(col("candidate"))
    }),

    // INCLUSION-DEPENDENCY (foreign-key candidate) discovery — the SINDY
    // shape (Kruse 2015): every (child, parent) candidate's values union
    // into ONE tagged relation, one (pair, value)-keyed combinable
    // aggregation marks each distinct value child-side/parent-side, and
    // the per-pair rollup counts child values missing from the parent.
    // Cost: one shuffle over Σ per-pair distinct keys — never a join per
    // candidate, no side broadcast; containment_ppm grades partial FKs
    // (an orphan census) instead of just rejecting them.
    "q_profile_inds" -> ((s: SparkSession, d: String) => {
      def side(t: String, c: String, pair: String, child: Boolean) =
        scan(s, d, t).select(lit(pair).as("pair"), col(c).cast("long").as("v"),
          lit(if (child) 1L else 0L).as("is_child"))
      val tagged =
        side("lineitem", "l_orderkey", "lineitem.l_orderkey < orders.o_orderkey", child = true)
          .unionAll(side("orders", "o_orderkey", "lineitem.l_orderkey < orders.o_orderkey", child = false))
          .unionAll(side("orders", "o_custkey", "orders.o_custkey < customer.c_custkey", child = true))
          .unionAll(side("customer", "c_custkey", "orders.o_custkey < customer.c_custkey", child = false))
          .unionAll(side("customer", "c_custkey", "customer.c_custkey < orders.o_custkey", child = true))
          .unionAll(side("orders", "o_custkey", "customer.c_custkey < orders.o_custkey", child = false))
          .unionAll(side("lineitem", "l_suppkey", "lineitem.l_suppkey < supplier.s_suppkey", child = true))
          .unionAll(side("supplier", "s_suppkey", "lineitem.l_suppkey < supplier.s_suppkey", child = false))
          .unionAll(side("events", "user_id", "events.user_id < customer.c_custkey", child = true))
          .unionAll(side("customer", "c_custkey", "events.user_id < customer.c_custkey", child = false))
          // the reversed direction is the orphan census: orders no
          // lineitem ever references are "missing" children here
          .unionAll(side("orders", "o_orderkey", "orders.o_orderkey < lineitem.l_orderkey", child = true))
          .unionAll(side("lineitem", "l_orderkey", "orders.o_orderkey < lineitem.l_orderkey", child = false))
      tagged
        .groupBy(col("pair"), col("v"))
        .agg(max(col("is_child")).as("in_child"),
          max(lit(1L) - col("is_child")).as("in_parent"))
        .groupBy(col("pair"))
        .agg(sum(col("in_child")).as("child_distinct"),
          sum(col("in_child") * (lit(1L) - col("in_parent"))).as("missing"))
        .select(col("pair"), col("child_distinct"), col("missing"),
          (col("missing") === lit(0L)).as("contained"),
          floor((col("child_distinct") - col("missing")) * lit(1000000L)
            / col("child_distinct")).as("containment_ppm"))
        .orderBy(col("pair"))
    }),

    // CHI-SQUARE INDEPENDENCE profile of two categoricals (priority ×
    // status): one combinable groupBy builds the contingency table; the
    // marginal windows run over the |A|×|B| cells, never the fact rows.
    // Expected counts multiply AS DOUBLES (long·long marginal products
    // would overflow past ~10¹⁹ cell-pairs at warehouse scale); every
    // double op is IEEE-deterministic, so the oracle hash-matches
    "q_profile_chisq" -> ((s: SparkSession, d: String) => {
      import org.apache.spark.sql.expressions.Window
      val cells = scan(s, d, "orders")
        .groupBy(col("o_orderpriority").as("pr"), col("o_orderstatus").as("st"))
        .agg(count(lit(1)).as("n"))
      cells
        .withColumn("np", sum(col("n")).over(Window.partitionBy(col("pr"))).cast("double"))
        .withColumn("ns", sum(col("n")).over(Window.partitionBy(col("st"))).cast("double"))
        .withColumn("nt", sum(col("n")).over(
          Window.partitionBy().rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
          .cast("double"))
        .withColumn("expected", col("np") * col("ns") / col("nt"))
        .withColumn("contrib",
          (col("n").cast("double") - col("expected")) * (col("n").cast("double") - col("expected"))
            / col("expected"))
        .select(col("pr"), col("st"), col("n"), col("expected"), col("contrib"))
        .orderBy(col("pr"), col("st"))
    }),

    // DUPLICATE-COLUMN DETECTION (the schema-redundancy profiler —
    // derived/copied columns that double storage and mislead feature
    // selection): each audited column folds to a 4-part multiset
    // signature (rows, nulls, Σhex60(md5(v)), and the independently-
    // salted Σhex60(md5('dup2:'||v))) — equal signatures ⇔ equal value
    // multisets up to hash collision (two independent 60-bit hash sums
    // make a silent collision astronomically unlikely, and the oracle
    // recomputes both from raw values). One stack() pass per table
    // (never a job per
    // column — the q_profile_gini shape), then a signature self-join
    // over the |columns|-row census. The planted derivation
    // upper(l_returnflag) = l_returnflag is the positive control
    "q_profile_dupcols" -> ((s: SparkSession, d: String) => {
      val fromOrders = scan(s, d, "orders").select(expr(
        "stack(3, 'orders.status', o_orderstatus, " +
          "'orders.status_norm', upper(o_orderstatus), " +
          "'orders.priority', o_orderpriority) AS (col_name, v)"))
      val fromLineitem = scan(s, d, "lineitem").select(expr(
        "stack(4, 'lineitem.returnflag', l_returnflag, " +
          "'lineitem.returnflag_norm', upper(l_returnflag), " +
          "'lineitem.linestatus', l_linestatus, " +
          "'lineitem.linenumber', CAST(l_linenumber AS STRING)) AS (col_name, v)"))
      // two-level census: the md5 pair runs once per DISTINCT (column,
      // value) — the audited columns are categorical, so the hash cost
      // collapses from rows to cardinality (measured 107 s → ~linear
      // scan cost at sf1 when hashing per row); the count-weighted sum
      // Σc·h is the same multiset signature
      val sig = fromOrders.unionAll(fromLineitem)
        .groupBy(col("col_name"), col("v")).agg(count(lit(1)).as("c"))
        .withColumn("h", graft.ops.Dedup.hex60(md5(col("v").cast("binary"))))
        .withColumn("h2", graft.ops.Dedup.hex60(
          md5(concat(lit("dup2:"), col("v")).cast("binary"))))
        .groupBy(col("col_name"))
        .agg(sum(col("c")).as("n_rows"),
          sum(when(col("v").isNull, col("c")).otherwise(0L)).as("n_nulls"),
          sum(expr("c * CAST(h AS DECIMAL(38,0))")).as("hsum"),
          sum(expr("c * CAST(h2 AS DECIMAL(38,0))")).as("h2sum"))
      val a = sig.select(col("col_name").as("col_a"), col("n_rows"),
        col("n_nulls"), col("hsum"), col("h2sum"))
      val b = sig.select(col("col_name").as("col_b"), col("n_rows").as("nb"),
        col("n_nulls").as("ub"), col("hsum").as("hb"), col("h2sum").as("qb"))
      a.join(b, col("n_rows") === col("nb") && col("n_nulls") === col("ub")
          && col("hsum") === col("hb") && col("h2sum") === col("qb")
          && col("col_a") < col("col_b"))
        .select(col("col_a"), col("col_b"), col("n_rows"))
        .orderBy(col("col_a"), col("col_b"))
    }),

    // CRAMÉR'S V (the effect size q_profile_chisq's raw χ² can't give —
    // χ² grows with n, V ∈ [0,1] doesn't): priority × status. ALL-
    // INTEGER: each cell contributes (n·O − r·c)²·10⁶ div (n·r·c) —
    // exact χ² ppm per cell, identical integer ops in both engines —
    // and V² = χ²/(n·(min(r,c)−1)) stays in ppm (no sqrt: the effect
    // verdict thresholds on V², 0.1²/0.3²/0.5²). The grid is the FULL
    // margin cross product with empty cells coalesced to 0 (a census
    // that skips empty cells understates χ² by E per missing cell).
    // Margins and cells are three map-side-combinable censuses; the
    // grid is levels² — dimension-sized at any data scale
    "q_profile_cramersv" -> ((s: SparkSession, d: String) => {
      val o = scan(s, d, "orders")
      val pm = o.groupBy(col("o_orderpriority").as("pr")).agg(count(lit(1)).as("np"))
      val sm = o.groupBy(col("o_orderstatus").as("st")).agg(count(lit(1)).as("ns"))
      val cl = o.groupBy(col("o_orderpriority").as("pr"), col("o_orderstatus").as("st"))
        .agg(count(lit(1)).as("c"))
      val t = o.agg(count(lit(1)).as("nt"))
      pm.crossJoin(sm).join(cl, Seq("pr", "st"), "left")
        .na.fill(0L, Seq("c"))
        .crossJoin(broadcast(t))
        .withColumn("cell_ppm", expr(
          """CAST((CAST(nt AS DECIMAL(38,0)) * c - CAST(np AS DECIMAL(38,0)) * ns)
            |  * (CAST(nt AS DECIMAL(38,0)) * c - CAST(np AS DECIMAL(38,0)) * ns)
            |  * 1000000 div (CAST(nt AS DECIMAL(38,0)) * np * ns) AS BIGINT)"""
            .stripMargin))
        .agg(max(col("nt")).as("n_rows"),
          countDistinct(col("pr")).as("r_levels"),
          countDistinct(col("st")).as("c_levels"),
          sum(col("cell_ppm")).as("chi2_ppm"))
        .withColumn("v2_ppm",
          expr("chi2_ppm div (n_rows * (least(r_levels, c_levels) - 1))"))
        .select(col("n_rows"), col("r_levels"), col("c_levels"),
          col("chi2_ppm"), col("v2_ppm"),
          expr("""CASE WHEN v2_ppm > 250000 THEN 'large'
                 |  WHEN v2_ppm > 90000 THEN 'medium'
                 |  WHEN v2_ppm > 10000 THEN 'small'
                 |  ELSE 'negligible' END""".stripMargin).as("effect"))
    }),

    // CATEGORICAL IMBALANCE PROFILE (feature-selection census): per
    // column — Gini impurity 1 − Σp², top-value share, distinct ratio.
    // Gini instead of Shannon entropy ON PURPOSE: entropy needs log(),
    // which is libm-dependent and breaks the bit-exact oracle (the
    // same reason Drift.scala uses TVD, not KL), while Gini is pure
    // rational arithmetic — bigint sums and ONE IEEE division. The
    // stack() unpivot reads each table ONCE for all its columns (never
    // a job per column — the q_profile shape), counts are map-side
    // combinable, and the census the ratios run over is |columns| ×
    // |distinct values| — tiny. N² fits bigint to ~3×10⁹ rows per
    // census; shard by date or move to DECIMAL(38) past that
    // SHANNON ENTROPY PROFILE — the statistic q_profile_gini
    // approximates with Gini impurity "ON PURPOSE: entropy needs
    // log()": the staged fixed-point log retired that constraint (the
    // PSI/PMI precedent), so this op reports the real per-column
    // entropy in integer centibits — H_cb = cb(N) − ⌊Σ c·cb(c) ⁄ N⌋
    // (the log-sum identity: H = log2 N − (1/N)Σc·log2 c) — plus the
    // normalized fraction of the column's own log2(distinct) ceiling.
    // Same one-pass stack() unpivot; the logs run once per DISTINCT
    // count value over the |columns|×|levels| census
    "q_profile_entropy" -> ((s: SparkSession, d: String) => {
      import graft.ops.UlmTokenizer
      import graft.ops.CacheScope.ScopedPersist
      val fromOrders = scan(s, d, "orders").select(expr(
        "stack(2, 'orders.o_orderstatus', o_orderstatus, " +
          "'orders.o_orderpriority', o_orderpriority) AS (col_name, v)"))
      val fromLineitem = scan(s, d, "lineitem").select(expr(
        "stack(2, 'lineitem.l_returnflag', l_returnflag, " +
          "'lineitem.l_linestatus', l_linestatus) AS (col_name, v)"))
      val census = fromOrders.unionAll(fromLineitem)
        .groupBy(col("col_name"), col("v"))
        .agg(count(lit(1)).as("c"))
        .scopedPersist()
      val colAgg = census.groupBy(col("col_name"))
        .agg(sum(col("c")).as("n"), count(lit(1)).as("n_distinct"))
        .scopedPersist()
      val vals = census.select(col("c").as("v2"))
        .union(colAgg.select(col("n")))
        .union(colAgg.select(col("n_distinct"))).distinct()
      // driver-side cb over the distinct-count set (cbTableLocal)
      val cb = graft.ops.UlmTokenizer
        .cbTableLocal(vals, "q_profile_entropy cb values")
        .withColumnRenamed("v", "v2")
      val wc = census
        .join(broadcast(cb.select(col("v2").as("c"), col("cb"))), Seq("c"))
        .groupBy(col("col_name"))
        .agg(sum(col("c") * col("cb")).as("sum_ccb"))
      colAgg.join(wc, Seq("col_name"))
        .join(broadcast(cb.select(col("v2").as("n"), col("cb").as("cb_n"))), Seq("n"))
        .join(broadcast(cb.select(col("v2").as("n_distinct"),
          col("cb").as("cb_d"))), Seq("n_distinct"))
        .select(col("col_name"), col("n"), col("n_distinct"),
          expr("cb_n - sum_ccb div n").as("h_cb"),
          expr("CASE WHEN cb_d = 0 THEN 0 ELSE " +
            "(cb_n - sum_ccb div n) * 1000000 div cb_d END").as("h_norm_ppm"))
        .orderBy(col("col_name"))
    }),

    "q_profile_gini" -> ((s: SparkSession, d: String) => {
      val fromOrders = scan(s, d, "orders").select(expr(
        "stack(2, 'orders.o_orderstatus', o_orderstatus, " +
          "'orders.o_orderpriority', o_orderpriority) AS (col_name, v)"))
      val fromLineitem = scan(s, d, "lineitem").select(expr(
        "stack(2, 'lineitem.l_returnflag', l_returnflag, " +
          "'lineitem.l_linestatus', l_linestatus) AS (col_name, v)"))
      fromOrders.unionAll(fromLineitem)
        .groupBy(col("col_name"), col("v"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("col_name"))
        .agg(sum(col("c")).as("n"),
          count(lit(1)).as("n_distinct"),
          sum(col("c") * col("c")).as("sumc2"),
          max(col("c")).as("max_c"))
        .select(col("col_name"), col("n"), col("n_distinct"),
          ((col("n") * col("n") - col("sumc2")).cast("double")
            / (col("n") * col("n")).cast("double")).as("gini"),
          expr("max_c * 1000000 div n").as("top_share_ppm"),
          expr("n_distinct * 1000000 div n").as("distinct_ppm"))
        .orderBy(col("col_name"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q_profile" ->
      s"""SELECT COUNT(*) AS n_rows,
         |  COUNT(o_custkey) AS custkey_nonnull,
         |  COUNT(DISTINCT o_custkey) AS custkey_distinct,
         |  COUNT(DISTINCT o_orderstatus) AS status_distinct,
         |  MIN(o_totalprice) AS price_min, MAX(o_totalprice) AS price_max,
         |  ${sqlDsum("o_totalprice")} AS price_sum,
         |  MIN(o_orderdate) AS date_min, MAX(o_orderdate) AS date_max
         |FROM orders""".stripMargin,
    "q_profile_completeness" ->
      """WITH s AS (
        |  SELECT 'o_orderkey' AS colname, o_orderkey::VARCHAR AS v FROM orders
        |  UNION ALL SELECT 'o_custkey', o_custkey::VARCHAR FROM orders
        |  UNION ALL SELECT 'o_orderstatus', o_orderstatus FROM orders
        |  UNION ALL SELECT 'o_totalprice', o_totalprice::VARCHAR FROM orders
        |  UNION ALL SELECT 'o_orderdate', o_orderdate::VARCHAR FROM orders
        |  UNION ALL SELECT 'o_orderpriority', o_orderpriority FROM orders),
        |c AS (SELECT colname, v, CAST(count(*) AS BIGINT) AS c
        |      FROM s GROUP BY 1, 2)
        |SELECT colname, CAST(sum(c) AS BIGINT) AS n_rows,
        |  CAST(COALESCE(sum(c) FILTER (WHERE v IS NULL), 0) AS BIGINT) AS n_null,
        |  CAST(count(*) FILTER (WHERE v IS NOT NULL) AS BIGINT) AS n_distinct
        |FROM c GROUP BY colname ORDER BY colname""".stripMargin,

    "q_profile_topvals" ->
      """WITH s AS (
        |  SELECT 'o_orderstatus' AS colname, o_orderstatus AS v FROM orders
        |  UNION ALL SELECT 'o_orderpriority', o_orderpriority FROM orders
        |  UNION ALL SELECT 'o_custkey', o_custkey::VARCHAR FROM orders),
        |c AS (SELECT colname, v, CAST(count(*) AS BIGINT) AS cnt
        |      FROM s GROUP BY 1, 2),
        |r AS (SELECT *, row_number() OVER (PARTITION BY colname
        |        ORDER BY cnt DESC, v) AS rn FROM c)
        |SELECT colname, v, cnt FROM r WHERE rn <= 3
        |ORDER BY colname, cnt DESC, v""".stripMargin,

    "q_profile_zonemap" ->
      s"""WITH li AS (SELECT l_orderkey,
         |  CAST(CAST(l_shipdate AS DATE) - DATE '1992-01-06' AS BIGINT) AS di
         |  FROM lineitem),
         |ing AS (SELECT l_orderkey // 4096 AS f, MIN(di) AS lo_di,
         |          MAX(di) AS hi_di, COUNT(*) AS n FROM li GROUP BY 1),
         |dt AS (SELECT di // 30 AS f, MIN(di) AS lo_di,
         |         MAX(di) AS hi_di, COUNT(*) AS n FROM li GROUP BY 1),
         |s AS (
         |  SELECT 'ingest' AS layout, CAST(COUNT(*) AS BIGINT) AS n_files,
         |    CAST(SUM(n) AS BIGINT) AS n_rows,
         |    CAST(COALESCE(SUM(CASE WHEN hi_di < $zmLo OR lo_di > $zmHi
         |      THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_files_skip,
         |    CAST(COALESCE(SUM(CASE WHEN hi_di < $zmLo OR lo_di > $zmHi
         |      THEN n ELSE 0 END), 0) AS BIGINT) AS n_rows_skip
         |  FROM ing
         |  UNION ALL
         |  SELECT 'shipdate', CAST(COUNT(*) AS BIGINT),
         |    CAST(SUM(n) AS BIGINT),
         |    CAST(COALESCE(SUM(CASE WHEN hi_di < $zmLo OR lo_di > $zmHi
         |      THEN 1 ELSE 0 END), 0) AS BIGINT),
         |    CAST(COALESCE(SUM(CASE WHEN hi_di < $zmLo OR lo_di > $zmHi
         |      THEN n ELSE 0 END), 0) AS BIGINT)
         |  FROM dt)
         |SELECT layout, n_files, n_rows, n_files_skip, n_rows_skip,
         |  CAST(n_rows_skip * 1000000 // n_rows AS BIGINT) AS skip_ppm
         |FROM s ORDER BY layout""".stripMargin,

    "q_histogram" ->
      """SELECT CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS bin,
        |       COUNT(*) AS n, MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
        |FROM orders GROUP BY 1 ORDER BY bin""".stripMargin,
    "q_profile_skew" ->
      """WITH c AS (SELECT l_orderkey, COUNT(*) AS n FROM lineitem GROUP BY l_orderkey)
        |SELECT COUNT(*) AS n_keys, MIN(n) AS min_n, MAX(n) AS max_n,
        |  quantile_cont(n::DOUBLE, 0.5) AS p50_n,
        |  quantile_cont(n::DOUBLE, 0.99) AS p99_n,
        |  MAX(n)::DOUBLE / (SUM(n)::DOUBLE / COUNT(*)::DOUBLE) AS max_over_avg
        |FROM c""".stripMargin,
    "q_endpoint_defaults" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |ORDER BY c_custkey""".stripMargin,
    "q_profile_partition_advisor" ->
      """WITH cl AS (SELECT lang, source, COUNT(*) AS n,
        |              GROUPING(lang) * 2 + GROUPING(source) AS gid
        |            FROM documents GROUP BY CUBE(lang, source)),
        |r AS (SELECT gid, CAST(COUNT(*) AS BIGINT) AS n_partitions,
        |             CAST(MIN(n) AS BIGINT) AS min_rows,
        |             CAST(MAX(n) AS BIGINT) AS max_rows,
        |             CAST(SUM(n) AS BIGINT) AS total
        |      FROM cl WHERE gid < 3 GROUP BY gid)
        |SELECT CASE gid WHEN 0 THEN 'lang+source' WHEN 1 THEN 'source'
        |                ELSE 'lang' END AS candidate,
        |  n_partitions, min_rows, max_rows,
        |  CAST(max_rows * n_partitions * 1000000 // total AS BIGINT) AS skew_ppm
        |FROM r ORDER BY candidate""".stripMargin,
    "q_profile_compaction" ->
      """WITH m AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |                  CAST(SUM(n_chars) AS BIGINT) AS bytes
        |           FROM documents GROUP BY source),
        |c AS (SELECT *,
        |        COALESCE(SUM(bytes) OVER (ORDER BY bytes DESC, source ASC
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before,
        |        SUM(bytes) OVER () AS total
        |      FROM m),
        |g AS (SELECT *, CAST(cum_before // (total // 6 + 1) AS INT) AS grp FROM c)
        |SELECT source, n_docs, bytes, grp,
        |  CAST(SUM(bytes) OVER (PARTITION BY grp) AS BIGINT) AS grp_bytes,
        |  CAST(COUNT(*) OVER (PARTITION BY grp) AS BIGINT) AS grp_files
        |FROM g ORDER BY grp, bytes DESC, source""".stripMargin,
    "q_profile_lineage" ->
      """SELECT * FROM (VALUES
        |  ('max_combined', 'customer', 'c_acctbal'),
        |  ('max_combined', 'orders', 'o_totalprice'),
        |  ('n_orders', 'orders', 'o_orderkey'),
        |  ('revenue', 'orders', 'o_totalprice'),
        |  ('segment', 'customer', 'c_mktsegment'))
        |AS t(out_col, src_table, src_col)
        |ORDER BY out_col, src_table, src_col""".stripMargin,
    "q_profile_pii_flow" ->
      """SELECT * FROM (VALUES
        |  ('amount', 'orders', 'o_totalprice', false),
        |  ('contact', 'customer', 'c_mktsegment', false),
        |  ('contact', 'customer', 'c_name', true),
        |  ('o_orderkey', 'orders', 'o_orderkey', false))
        |AS t(out_col, src_table, src_col, is_pii)
        |ORDER BY out_col, src_table, src_col""".stripMargin,
    "q_profile_corr" -> {
      def ds(e: String) = graft.ops.ExactAgg.sqlDsumScaled(e, 4)
      def r(sx: String, sy: String, sxx: String, syy: String, sxy: String) =
        s"(n * $sxy - $sx * $sy) / sqrt((n * $sxx - $sx * $sx) * (n * $syy - $sy * $sy))"
      s"""WITH m AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         |  ${ds("l_quantity")} AS s1, ${ds("l_extendedprice")} AS s2,
         |  ${ds("l_discount")} AS s3,
         |  ${ds("l_quantity * l_quantity")} AS s11,
         |  ${ds("l_extendedprice * l_extendedprice")} AS s22,
         |  ${ds("l_discount * l_discount")} AS s33,
         |  ${ds("l_quantity * l_extendedprice")} AS s12,
         |  ${ds("l_quantity * l_discount")} AS s13,
         |  ${ds("l_extendedprice * l_discount")} AS s23
         |  FROM lineitem)
         |SELECT * FROM (
         |  SELECT 'l_quantity' AS col_x, 'l_extendedprice' AS col_y,
         |    ${r("s1", "s2", "s11", "s22", "s12")} AS pearson_r FROM m
         |  UNION ALL
         |  SELECT 'l_quantity', 'l_discount',
         |    ${r("s1", "s3", "s11", "s33", "s13")} FROM m
         |  UNION ALL
         |  SELECT 'l_extendedprice', 'l_discount',
         |    ${r("s2", "s3", "s22", "s33", "s23")} FROM m)
         |ORDER BY col_x, col_y""".stripMargin
    },
    "q_profile_bootstrap" -> {
      // ONE md5 per customer row (the r8 fix: was one per row×resample);
      // per-resample uniforms come from Bootstrap.sqlRemix — the same
      // constants and modulus the engine codegens
      val u0 = DedupQueries.sqlHex60Public("md5('boot1:' || c_custkey::VARCHAR)")
      s"""WITH b AS (SELECT unnest(range(0, 32)) AS bi),
         |r AS (SELECT CAST(floor(c_acctbal * 100) AS BIGINT) AS x,
         |             CAST($u0 AS BIGINT) AS u FROM customer),
         |u2 AS (SELECT bi, x,
         |         CAST(${graft.ops.Bootstrap.sqlRemix("u", "bi")} AS BIGINT) AS ub
         |       FROM r CROSS JOIN b),
         |w AS (SELECT bi, x,
         |        CAST(${graft.ops.Bootstrap.sqlWeightExpr("ub")} AS BIGINT) AS w
         |      FROM u2),
         |m AS (SELECT bi, SUM(w) AS sw, SUM(w * x) AS swx FROM w GROUP BY bi),
         |s AS (SELECT list_sort(list(CAST(swx AS DOUBLE) / CAST(sw AS DOUBLE))) AS means
         |      FROM m),
         |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
         |             CAST(SUM(CAST(floor(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS sx
         |      FROM customer)
         |SELECT n, CAST(floor(sx * 10.0 / n) AS BIGINT) AS mean_milli,
         |  CAST(floor(means[2] * 10.0) AS BIGINT) AS ci_lo_milli,
         |  CAST(floor(means[31] * 10.0) AS BIGINT) AS ci_hi_milli
         |FROM t CROSS JOIN s""".stripMargin
    },

    "q_profile_regression" -> {
      def ds(e: String) = graft.ops.ExactAgg.sqlDsumScaled(e, 4)
      s"""WITH m AS (SELECT l_returnflag, CAST(COUNT(*) AS DOUBLE) AS n,
         |  ${ds("l_quantity")} AS sx, ${ds("l_extendedprice")} AS sy,
         |  ${ds("l_quantity * l_quantity")} AS sxx,
         |  ${ds("l_extendedprice * l_extendedprice")} AS syy,
         |  ${ds("l_quantity * l_extendedprice")} AS sxy
         |  FROM lineitem GROUP BY l_returnflag)
         |SELECT l_returnflag,
         |  (n * sxy - sx * sy) / (n * sxx - sx * sx) AS beta,
         |  (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n AS alpha,
         |  ((n * sxy - sx * sy) * (n * sxy - sx * sy))
         |    / ((n * sxx - sx * sx) * (n * syy - sy * sy)) AS r2
         |FROM m ORDER BY l_returnflag""".stripMargin
    },

    "q_profile_fds" ->
      """WITH m AS (SELECT COUNT(*) AS n_rows,
        |  COUNT(DISTINCT o_orderkey) AS cd_ok,
        |  COUNT(DISTINCT (o_custkey, o_orderdate)) AS cd_cust_date,
        |  COUNT(DISTINCT (o_orderkey, o_custkey)) AS cd_ok_cust,
        |  COUNT(DISTINCT o_custkey) AS cd_cust,
        |  COUNT(DISTINCT (o_custkey, o_orderpriority)) AS cd_cust_prio,
        |  COUNT(DISTINCT o_orderdate) AS cd_date,
        |  COUNT(DISTINCT (o_orderdate, o_orderstatus)) AS cd_date_status,
        |  COUNT(DISTINCT o_orderstatus) AS cd_status,
        |  COUNT(DISTINCT (o_orderstatus, o_orderpriority)) AS cd_status_prio
        |  FROM orders),
        |c AS (
        |  SELECT 'o_orderkey -> *' AS candidate, cd_ok AS det_groups, n_rows AS ext_groups FROM m
        |  UNION ALL SELECT 'o_custkey,o_orderdate -> *', cd_cust_date, n_rows FROM m
        |  UNION ALL SELECT 'o_orderkey -> o_custkey', cd_ok, cd_ok_cust FROM m
        |  UNION ALL SELECT 'o_custkey -> o_orderpriority', cd_cust, cd_cust_prio FROM m
        |  UNION ALL SELECT 'o_orderdate -> o_orderstatus', cd_date, cd_date_status FROM m
        |  UNION ALL SELECT 'o_orderstatus -> o_orderpriority', cd_status, cd_status_prio FROM m)
        |SELECT candidate, det_groups, ext_groups,
        |  ext_groups - det_groups AS surplus,
        |  ext_groups = det_groups AS holds,
        |  CAST(FLOOR(det_groups * 1000000 / ext_groups) AS BIGINT) AS strength_ppm
        |FROM c ORDER BY candidate""".stripMargin,

    "q_profile_inds" ->
      """WITH u AS (
        |  SELECT pair, v, is_child FROM (
        |    SELECT 'lineitem.l_orderkey < orders.o_orderkey' AS pair, CAST(l_orderkey AS BIGINT) AS v, 1 AS is_child FROM lineitem
        |    UNION ALL SELECT 'lineitem.l_orderkey < orders.o_orderkey', CAST(o_orderkey AS BIGINT), 0 FROM orders
        |    UNION ALL SELECT 'orders.o_custkey < customer.c_custkey', CAST(o_custkey AS BIGINT), 1 FROM orders
        |    UNION ALL SELECT 'orders.o_custkey < customer.c_custkey', CAST(c_custkey AS BIGINT), 0 FROM customer
        |    UNION ALL SELECT 'customer.c_custkey < orders.o_custkey', CAST(c_custkey AS BIGINT), 1 FROM customer
        |    UNION ALL SELECT 'customer.c_custkey < orders.o_custkey', CAST(o_custkey AS BIGINT), 0 FROM orders
        |    UNION ALL SELECT 'lineitem.l_suppkey < supplier.s_suppkey', CAST(l_suppkey AS BIGINT), 1 FROM lineitem
        |    UNION ALL SELECT 'lineitem.l_suppkey < supplier.s_suppkey', CAST(s_suppkey AS BIGINT), 0 FROM supplier
        |    UNION ALL SELECT 'events.user_id < customer.c_custkey', CAST(user_id AS BIGINT), 1 FROM events
        |    UNION ALL SELECT 'events.user_id < customer.c_custkey', CAST(c_custkey AS BIGINT), 0 FROM customer
        |    UNION ALL SELECT 'orders.o_orderkey < lineitem.l_orderkey', CAST(o_orderkey AS BIGINT), 1 FROM orders
        |    UNION ALL SELECT 'orders.o_orderkey < lineitem.l_orderkey', CAST(l_orderkey AS BIGINT), 0 FROM lineitem)),
        |per_value AS (SELECT pair, v, MAX(is_child) AS in_child,
        |    MAX(1 - is_child) AS in_parent
        |  FROM u GROUP BY pair, v),
        |per_pair AS (SELECT pair,
        |    CAST(SUM(in_child) AS BIGINT) AS child_distinct,
        |    CAST(SUM(in_child * (1 - in_parent)) AS BIGINT) AS missing
        |  FROM per_value GROUP BY pair)
        |SELECT pair, child_distinct, missing,
        |  missing = 0 AS contained,
        |  CAST(FLOOR((child_distinct - missing) * 1000000 / child_distinct) AS BIGINT) AS containment_ppm
        |FROM per_pair ORDER BY pair""".stripMargin,

    "q_profile_chisq" ->
      """WITH c AS (SELECT o_orderpriority AS pr, o_orderstatus AS st,
        |             CAST(COUNT(*) AS BIGINT) AS n
        |           FROM orders GROUP BY 1, 2),
        |w AS (SELECT pr, st, n,
        |        CAST(SUM(n) OVER (PARTITION BY pr) AS DOUBLE) AS np,
        |        CAST(SUM(n) OVER (PARTITION BY st) AS DOUBLE) AS ns,
        |        CAST(SUM(n) OVER () AS DOUBLE) AS nt
        |      FROM c)
        |SELECT pr, st, n, np * ns / nt AS expected,
        |  (CAST(n AS DOUBLE) - np * ns / nt) * (CAST(n AS DOUBLE) - np * ns / nt)
        |    / (np * ns / nt) AS contrib
        |FROM w ORDER BY pr, st""".stripMargin,

    "q_profile_dupcols" -> {
      val h1 = DedupQueries.sqlHex60Public("md5(v)")
      val h2 = DedupQueries.sqlHex60Public("md5('dup2:' || v)")
      s"""WITH u AS (
         |  SELECT 'orders.status' AS col_name, o_orderstatus AS v FROM orders
         |  UNION ALL SELECT 'orders.status_norm', upper(o_orderstatus) FROM orders
         |  UNION ALL SELECT 'orders.priority', o_orderpriority FROM orders
         |  UNION ALL SELECT 'lineitem.returnflag', l_returnflag FROM lineitem
         |  UNION ALL SELECT 'lineitem.returnflag_norm', upper(l_returnflag)
         |    FROM lineitem
         |  UNION ALL SELECT 'lineitem.linestatus', l_linestatus FROM lineitem
         |  UNION ALL SELECT 'lineitem.linenumber', l_linenumber::VARCHAR
         |    FROM lineitem),
         |cv AS (SELECT col_name, v, CAST(COUNT(*) AS BIGINT) AS c
         |       FROM u GROUP BY col_name, v),
         |sig AS (SELECT col_name, CAST(SUM(c) AS BIGINT) AS n_rows,
         |    CAST(SUM(CASE WHEN v IS NULL THEN c ELSE 0 END) AS BIGINT) AS n_nulls,
         |    SUM(c * ($h1)::HUGEINT) AS hsum, SUM(c * ($h2)::HUGEINT) AS h2sum
         |  FROM cv GROUP BY col_name)
         |SELECT a.col_name AS col_a, b.col_name AS col_b, a.n_rows
         |FROM sig a JOIN sig b ON a.n_rows = b.n_rows AND a.n_nulls = b.n_nulls
         |  AND a.hsum = b.hsum AND a.h2sum = b.h2sum AND a.col_name < b.col_name
         |ORDER BY col_a, col_b""".stripMargin
    },

    "q_profile_cramersv" ->
      """WITH pm AS (SELECT o_orderpriority AS pr, CAST(COUNT(*) AS BIGINT) AS np
        |            FROM orders GROUP BY 1),
        |sm AS (SELECT o_orderstatus AS st, CAST(COUNT(*) AS BIGINT) AS ns
        |       FROM orders GROUP BY 1),
        |cl AS (SELECT o_orderpriority AS pr, o_orderstatus AS st,
        |         CAST(COUNT(*) AS BIGINT) AS c
        |       FROM orders GROUP BY 1, 2),
        |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS nt FROM orders),
        |g AS (SELECT pm.pr, sm.st, pm.np, sm.ns, COALESCE(cl.c, 0) AS c, t.nt
        |      FROM pm CROSS JOIN sm
        |      LEFT JOIN cl ON pm.pr = cl.pr AND sm.st = cl.st
        |      CROSS JOIN t),
        |cp AS (SELECT pr, st, nt,
        |         CAST((nt::HUGEINT * c - np::HUGEINT * ns)
        |           * (nt::HUGEINT * c - np::HUGEINT * ns) * 1000000
        |           // (nt::HUGEINT * np * ns) AS BIGINT) AS cell_ppm
        |       FROM g),
        |a AS (SELECT CAST(MAX(nt) AS BIGINT) AS n_rows,
        |        CAST(COUNT(DISTINCT pr) AS BIGINT) AS r_levels,
        |        CAST(COUNT(DISTINCT st) AS BIGINT) AS c_levels,
        |        CAST(SUM(cell_ppm) AS BIGINT) AS chi2_ppm FROM cp)
        |SELECT n_rows, r_levels, c_levels, chi2_ppm,
        |  CAST(chi2_ppm // (n_rows * (LEAST(r_levels, c_levels) - 1)) AS BIGINT)
        |    AS v2_ppm,
        |  CASE WHEN chi2_ppm // (n_rows * (LEAST(r_levels, c_levels) - 1)) > 250000
        |         THEN 'large'
        |       WHEN chi2_ppm // (n_rows * (LEAST(r_levels, c_levels) - 1)) > 90000
        |         THEN 'medium'
        |       WHEN chi2_ppm // (n_rows * (LEAST(r_levels, c_levels) - 1)) > 10000
        |         THEN 'small'
        |       ELSE 'negligible' END AS effect
        |FROM a""".stripMargin,

    "q_profile_entropy" -> {
      import graft.ops.UlmTokenizer
      val staged = UlmTokenizer.costStages("v2", "1", UlmTokenizer.Duck)
        .foldLeft("SELECT * FROM vals") { case (acc, (n, e)) =>
          s"SELECT *, $e AS $n FROM ($acc)" }
      raw"""WITH u AS (SELECT 'orders.o_orderstatus' AS col_name, o_orderstatus AS v FROM orders
           |           UNION ALL
           |           SELECT 'orders.o_orderpriority', o_orderpriority FROM orders
           |           UNION ALL
           |           SELECT 'lineitem.l_returnflag', l_returnflag FROM lineitem
           |           UNION ALL
           |           SELECT 'lineitem.l_linestatus', l_linestatus FROM lineitem),
           |census AS (SELECT col_name, v, CAST(COUNT(*) AS BIGINT) AS c
           |           FROM u GROUP BY col_name, v),
           |ca AS (SELECT col_name, CAST(SUM(c) AS BIGINT) AS n,
           |         CAST(COUNT(*) AS BIGINT) AS n_distinct
           |       FROM census GROUP BY col_name),
           |vals AS (SELECT DISTINCT v2 FROM (
           |    SELECT c AS v2 FROM census UNION SELECT n FROM ca
           |    UNION SELECT n_distinct FROM ca)),
           |st AS MATERIALIZED ($staged),
           |cbt AS (SELECT v2, CAST(cost_cb AS BIGINT) AS cb FROM st),
           |wc AS (SELECT census.col_name,
           |         CAST(SUM(census.c * cbt.cb) AS BIGINT) AS sum_ccb
           |       FROM census JOIN cbt ON cbt.v2 = census.c
           |       GROUP BY census.col_name)
           |SELECT ca.col_name, ca.n, ca.n_distinct,
           |  CAST(x1.cb - sum_ccb // n AS BIGINT) AS h_cb,
           |  CAST(CASE WHEN x2.cb = 0 THEN 0 ELSE
           |    (x1.cb - sum_ccb // n) * 1000000 // x2.cb END AS BIGINT)
           |    AS h_norm_ppm
           |FROM ca JOIN wc ON wc.col_name = ca.col_name
           |JOIN cbt x1 ON x1.v2 = ca.n
           |JOIN cbt x2 ON x2.v2 = ca.n_distinct
           |ORDER BY ca.col_name""".stripMargin
    },

    "q_profile_gini" ->
      """WITH u AS (SELECT 'orders.o_orderstatus' AS col_name, o_orderstatus AS v FROM orders
        |           UNION ALL
        |           SELECT 'orders.o_orderpriority', o_orderpriority FROM orders
        |           UNION ALL
        |           SELECT 'lineitem.l_returnflag', l_returnflag FROM lineitem
        |           UNION ALL
        |           SELECT 'lineitem.l_linestatus', l_linestatus FROM lineitem),
        |c AS (SELECT col_name, v, CAST(COUNT(*) AS BIGINT) AS c FROM u GROUP BY 1, 2),
        |g AS (SELECT col_name, CAST(SUM(c) AS BIGINT) AS n,
        |        CAST(COUNT(*) AS BIGINT) AS n_distinct,
        |        CAST(SUM(c * c) AS BIGINT) AS sumc2,
        |        CAST(MAX(c) AS BIGINT) AS max_c
        |      FROM c GROUP BY col_name)
        |SELECT col_name, n, n_distinct,
        |  CAST(n * n - sumc2 AS DOUBLE) / CAST(n * n AS DOUBLE) AS gini,
        |  CAST(max_c * 1000000 // n AS BIGINT) AS top_share_ppm,
        |  CAST(n_distinct * 1000000 // n AS BIGINT) AS distinct_ppm
        |FROM g ORDER BY col_name""".stripMargin
  )
}
