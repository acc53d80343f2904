package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.CacheScope.ScopedPersist
import graft.engine.QueryBuilder.scan
import graft.ops.ExactAgg._

/** Canonical TPC-H query shapes over the synthetic tables (Q1 lives in
  * AggQueries as q_agg_q1; the star join is q_join_star). Dates are
  * shifted to the testdata's 1995-2001 span; columns the synthetic
  * schema lacks (shippriority, shipmode) are dropped. All money math is
  * exact-decimal so results hash-match DuckDB.
  */
object TpchQueries {

  private val cutoff = "1997-06-01"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Q3 shape — shipping-priority-style top-10 unshipped orders:
    // 3-way join, revenue agg, top-k by revenue
    "q_tpch_q3" -> ((s: SparkSession, d: String) => {
      val c = scan(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = scan(s, d, "orders")
        .filter(col("o_orderdate") < lit(cutoff).cast("timestamp"))
      val l = scan(s, d, "lineitem")
        .filter(col("l_shipdate") > lit(cutoff).cast("timestamp"))
      c.join(o, c("c_custkey") === o("o_custkey"))
        .join(l, o("o_orderkey") === l("l_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
        .limit(10)
    }),

    // Q6 shape — forecasting revenue change: pure scan + filter + one sum
    "q_tpch_q6" -> ((s: SparkSession, d: String) => {
      scan(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) &&
          col("l_quantity") < 24)
        .agg(dsum(col("l_extendedprice") * col("l_discount")).as("revenue"),
          count(lit(1)).as("n"))
    }),

    // Q10 shape — returned-item reporting: top-20 customers by lost revenue
    "q_tpch_q10" -> ((s: SparkSession, d: String) => {
      val c = scan(s, d, "customer")
      val o = scan(s, d, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-07-01").cast("timestamp"))
      val l = scan(s, d, "lineitem").filter(col("l_returnflag") === "R")
      c.join(o, c("c_custkey") === o("o_custkey"))
        .join(l, o("o_orderkey") === l("l_orderkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"))
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),

    // Q14 shape — promotion effect: conditional revenue share, a ratio of
    // two exact decimal sums (one deterministic double division)
    "q_tpch_q14" -> ((s: SparkSession, d: String) => {
      val l = scan(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-02-01").cast("timestamp"))
      val p = scan(s, d, "part")
      val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
      l.join(p, l("l_partkey") === p("p_partkey"))
        .agg(
          (lit(100.0) *
            dsum(when(col("p_type").startsWith("PROMO"), rev).otherwise(lit(0.0))) /
            dsum(rev)).as("promo_revenue_pct"),
          count(lit(1)).as("n"))
    }),

    // Q4 shape — order-priority checking. The synthetic schema has no
    // l_commitdate/l_receiptdate, so "late" = shipped >75 days after the
    // order date. Semi-join (EXISTS) so multi-lineitem orders count once;
    // Spark plans the extra range conjunct as a post-probe filter on the
    // equi semi-join — no nested loop.
    "q_tpch_q4" -> ((s: SparkSession, d: String) => {
      val o = scan(s, d, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      val l = scan(s, d, "lineitem")
      o.join(l, o("o_orderkey") === l("l_orderkey") &&
          l("l_shipdate") > o("o_orderdate") + expr("INTERVAL 75 DAYS"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority"))
    }),

    // Q5 shape — local-supplier volume: the full snowflake join
    // (customer⋈orders⋈lineitem⋈supplier⋈nation⋈region) with the
    // c_nationkey=s_nationkey locality constraint. nation/region are
    // broadcast (tiny dims); the fact-fact joins shuffle on their keys.
    "q_tpch_q5" -> ((s: SparkSession, d: String) => {
      val c = scan(s, d, "customer")
      val o = scan(s, d, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      val l = scan(s, d, "lineitem")
      val sup = scan(s, d, "supplier")
      val n = scan(s, d, "nation")
      val r = scan(s, d, "region").filter(col("r_name") === "ASIA")
      c.join(o, c("c_custkey") === o("o_custkey"))
        .join(l, o("o_orderkey") === l("l_orderkey"))
        .join(sup, l("l_suppkey") === sup("s_suppkey") &&
          c("c_nationkey") === sup("s_nationkey"))
        .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    // Q7 shape — volume shipping between two nations, both directions,
    // grouped by year. Two independent broadcast joins against nation
    // (customer side and supplier side) + a pair-set filter.
    "q_tpch_q7" -> ((s: SparkSession, d: String) => {
      val l = scan(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      val o = scan(s, d, "orders")
      val c = scan(s, d, "customer")
      val sup = scan(s, d, "supplier")
      val n1 = scan(s, d, "nation").select(
        col("n_nationkey").as("supp_nk"), col("n_name").as("supp_nation"))
      val n2 = scan(s, d, "nation").select(
        col("n_nationkey").as("cust_nk"), col("n_name").as("cust_nation"))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(sup, l("l_suppkey") === sup("s_suppkey"))
        .join(broadcast(n1), sup("s_nationkey") === col("supp_nk"))
        .join(broadcast(n2), c("c_nationkey") === col("cust_nk"))
        .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
        .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
    }),

    // Q12 shape — shipping-mode priority mix. No l_shipmode in the
    // synthetic schema; l_returnflag stands in as the mode column.
    // Conditional counts (map-side combinable) after one fact-fact join.
    "q_tpch_q12" -> ((s: SparkSession, d: String) => {
      val o = scan(s, d, "orders")
      val l = scan(s, d, "lineitem")
        .filter(col("l_returnflag").isin("A", "R") &&
          col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      val isHigh = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      o.join(l, o("o_orderkey") === l("l_orderkey"))
        .groupBy(col("l_returnflag"))
        .agg(sum(when(isHigh, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(!isHigh, 1L).otherwise(0L)).as("low_line_count"))
        .orderBy(col("l_returnflag"))
    }),

    // Q18 shape — large-volume customers: groupBy-HAVING on the fact
    // table first (map-side partial agg shrinks the shuffle), then join
    // the small surviving key set back to orders/customer.
    "q_tpch_q18" -> ((s: SparkSession, d: String) => {
      val l = scan(s, d, "lineitem")
      val big = l.groupBy(col("l_orderkey"))
        .agg(dsum(col("l_quantity")).as("sum_qty"))
        .filter(col("sum_qty") > 300)
      val o = scan(s, d, "orders")
      val c = scan(s, d, "customer")
      c.join(o, c("c_custkey") === o("o_custkey"))
        .join(big, o("o_orderkey") === big("l_orderkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"), col("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderdate"), col("o_orderkey"))
        .limit(100)
    }),

    // Q8 shape — national market share: NATION_1 suppliers' fraction of
    // ASIA-customer revenue per year. Nested conditional share of an
    // exact sum; nation dims broadcast twice (supplier + customer side).
    "q_tpch_q8" -> ((s: SparkSession, d: String) => {
      val l = scan(s, d, "lineitem")
      val o = scan(s, d, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val c = scan(s, d, "customer")
      val sup = scan(s, d, "supplier")
      val n1 = scan(s, d, "nation").select(
        col("n_nationkey").as("supp_nk"), col("n_name").as("supp_nation"))
      val n2 = scan(s, d, "nation").select(
        col("n_nationkey").as("cust_nk"), col("n_regionkey").as("cust_rk"))
      val r = scan(s, d, "region").filter(col("r_name") === "ASIA")
      val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(sup, l("l_suppkey") === sup("s_suppkey"))
        .join(broadcast(n1), sup("s_nationkey") === col("supp_nk"))
        .join(broadcast(n2), c("c_nationkey") === col("cust_nk"))
        .join(broadcast(r), col("cust_rk") === r("r_regionkey"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg((dsum(when(col("supp_nation") === "NATION_1", rev).otherwise(lit(0.0))) /
          dsum(rev)).as("mkt_share"))
        .orderBy(col("o_year"))
    }),

    // Q13 shape — customer order-count distribution: LEFT join so
    // zero-order customers land in the c_count=0 bucket, then a second
    // aggregation over the first's output
    "q_tpch_q13" -> ((s: SparkSession, d: String) => {
      val c = scan(s, d, "customer")
      val o = scan(s, d, "orders").filter(col("o_orderpriority") =!= "1-URGENT")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count")) // count(col) skips nulls
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),

    // Q22 shape — "lapsed high-balance customers": scalar-subquery
    // average (broadcast single row) + anti-join against RECENT orders
    // (every customer has some order in this corpus; the 2000+ window
    // keeps the anti-join non-trivially populated)
    "q_tpch_q22" -> ((s: SparkSession, d: String) => {
      val c = scan(s, d, "customer")
      val avgBal = c.filter(col("c_acctbal") > 0.0)
        .agg((dsum(col("c_acctbal")) / count(lit(1))).as("avg_bal"))
      val o = scan(s, d, "orders")
        .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
      c.crossJoin(broadcast(avgBal))
        .filter(col("c_acctbal") > col("avg_bal"))
        .join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey").cast("int").as("nk"))
        .agg(count(lit(1)).as("numcust"), dsum(col("c_acctbal")).as("totacctbal"))
        .orderBy(col("nk"))
    }),

    // Q15 shape — top supplier(s) by quarterly revenue: per-supplier
    // exact revenue, global max as a broadcast scalar, equality join.
    // Exact decimal sums make the double equality safe cross-engine
    "q_tpch_q15" -> ((s: SparkSession, d: String) => {
      val l = scan(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      val rev = l.groupBy(col("l_suppkey"))
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("total_revenue"))
      val top = rev.agg(max(col("total_revenue")).as("mx"))
      val sup = scan(s, d, "supplier")
      rev.crossJoin(broadcast(top))
        .filter(col("total_revenue") === col("mx"))
        .join(sup, col("l_suppkey") === sup("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
        .orderBy(col("s_suppkey"))
    }),

    // Q17 shape — small-quantity-order revenue: the correlated per-part
    // average expressed as its scale shape (pre-aggregated per-part avg
    // joined back) rather than a re-executed correlated subquery
    "q_tpch_q17" -> ((s: SparkSession, d: String) => {
      val l = scan(s, d, "lineitem")
      val p = scan(s, d, "part").filter(col("p_brand") === "Brand#23")
      val perPart = l.groupBy(col("l_partkey").as("avg_pk"))
        .agg((dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"))
      l.join(p, l("l_partkey") === p("p_partkey"))
        .join(perPart, l("l_partkey") === col("avg_pk"))
        .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
        .agg((dsum(col("l_extendedprice")) / lit(7.0)).as("avg_yearly"),
          count(lit(1)).as("n"))
    }),

    // Q19 shape — discounted revenue over an OR-of-ANDs join predicate.
    // The p_partkey=l_partkey equi-conjunct is common to every disjunct,
    // so Catalyst still plans a hash join with the OR as a post-filter.
    "q_tpch_q19" -> ((s: SparkSession, d: String) => {
      val l = scan(s, d, "lineitem")
      val p = scan(s, d, "part")
      val m1 = col("p_brand") === "Brand#12" && col("p_size").between(1, 15) &&
        col("l_quantity").between(1, 21)
      val m2 = col("p_brand") === "Brand#23" && col("p_size").between(1, 25) &&
        col("l_quantity").between(10, 30)
      val m3 = col("p_brand") === "Brand#34" && col("p_size").between(1, 35) &&
        col("l_quantity").between(20, 40)
      l.join(p, l("l_partkey") === p("p_partkey") && (m1 || m2 || m3))
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
          count(lit(1)).as("n"))
    }),

    // Q2 shape — minimum-cost supplier: for each qualifying part, the
    // EUROPE supplier(s) offering the regional minimum supply cost
    // (correlated min expressed as per-part pre-agg + equality join back)
    "q_tpch_q2" -> ((s: SparkSession, d: String) => {
      val eurSup = scan(s, d, "supplier")
        .join(scan(s, d, "nation"), col("s_nationkey") === col("n_nationkey"))
        .join(scan(s, d, "region").filter(col("r_name") === "EUROPE"),
          col("n_regionkey") === col("r_regionkey"))
      // offers feeds BOTH the per-part min and the probe side — persist
      // or the partsupp derivation + 3-way dim join runs twice
      val offers = partsupp(s, d).join(eurSup, col("ps_suppkey") === col("s_suppkey")).scopedPersist()
      val p = scan(s, d, "part").filter(col("p_size") <= 25 && col("p_type") === "LARGE")
      val minCost = offers.groupBy(col("ps_partkey").as("mc_pk"))
        .agg(min(col("ps_supplycost")).as("min_cost"))
      offers
        .join(p, col("ps_partkey") === col("p_partkey"))
        .join(minCost, col("ps_partkey") === col("mc_pk"))
        .filter(col("ps_supplycost") === col("min_cost"))
        .select(col("s_acctbal"), col("s_name"), col("n_name"),
          col("p_partkey"), col("p_brand"), col("ps_supplycost"))
        .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
        .limit(100)
    }),

    // Q9 shape — product-type profit by nation and year:
    // revenue minus derived supply cost, 6-way join
    "q_tpch_q9" -> ((s: SparkSession, d: String) => {
      val l = scan(s, d, "lineitem")
      val p = scan(s, d, "part").filter(col("p_name").contains("widget"))
      val o = scan(s, d, "orders")
      val sup = scan(s, d, "supplier")
      val n = scan(s, d, "nation")
      l.join(p, l("l_partkey") === p("p_partkey"))
        .join(partsupp(s, d),
          l("l_partkey") === col("ps_partkey") && l("l_suppkey") === col("ps_suppkey"))
        .join(sup, l("l_suppkey") === sup("s_suppkey"))
        .join(n, col("s_nationkey") === col("n_nationkey"))
        .join(o, l("l_orderkey") === o("o_orderkey"))
        .groupBy(col("n_name"), year(col("o_orderdate")).as("o_year"))
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")) -
          col("ps_supplycost") * col("l_quantity")).as("sum_profit"))
        .orderBy(col("n_name"), col("o_year").desc)
    }),

    // Q11 shape — important stock identification: per-part inventory
    // value of one nation's suppliers, kept where it exceeds a fraction
    // of that nation's total (global total as a broadcast 1-row scalar).
    // value magnitude reaches ~1e7 ⇒ floor-scaled exact sums
    "q_tpch_q11" -> ((s: SparkSession, d: String) => {
      val natSup = scan(s, d, "supplier")
        .join(scan(s, d, "nation").filter(col("n_name") === "NATION_3"),
          col("s_nationkey") === col("n_nationkey"))
      val ps = partsupp(s, d).join(natSup, col("ps_suppkey") === col("s_suppkey"))
      val perPart = ps.groupBy(col("ps_partkey"))
        .agg(dsumScaled(col("ps_supplycost") * col("ps_availqty")).as("value"))
        .scopedPersist() // consumed by the global total AND the filter branch
      val total = perPart.agg(dsum(col("value")).as("total_value"))
      perPart.crossJoin(broadcast(total))
        .filter(col("value") > col("total_value") * 0.001)
        .select(col("ps_partkey"), col("value"))
        .orderBy(col("value").desc, col("ps_partkey"))
    }),

    // Q16 shape — parts/supplier relationship: distinct suppliers able
    // to supply each (brand, type, size) combo, excluding flagged
    // suppliers (synthetic stand-in for the complaints predicate:
    // every 10th supplier key)
    "q_tpch_q16" -> ((s: SparkSession, d: String) => {
      val p = scan(s, d, "part")
        .filter(col("p_brand") =!= "Brand#2" && col("p_type") =!= "PROMO" &&
          col("p_size").isin(1, 5, 9, 15, 23, 36, 45, 49))
      val flagged = scan(s, d, "supplier")
        .filter(pmod(col("s_suppkey"), lit(10)) === 0).select(col("s_suppkey"))
      partsupp(s, d)
        .join(p, col("ps_partkey") === col("p_partkey"))
        .join(flagged, col("ps_suppkey") === col("s_suppkey"), "left_anti")
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("ps_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
    }),

    // Q20 shape — potential part promotion: suppliers whose derived
    // stock exceeds half of what they shipped of 'small …' parts in
    // 1996, restricted to one nation
    "q_tpch_q20" -> ((s: SparkSession, d: String) => {
      val shipped = scan(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(dsum(col("l_quantity")).as("qty_1996"))
      val smallParts = scan(s, d, "part")
        .filter(col("p_name").startsWith("small")).select(col("p_partkey"))
      val excess = partsupp(s, d)
        .join(smallParts, col("ps_partkey") === col("p_partkey"))
        .join(shipped,
          col("ps_partkey") === col("l_partkey") && col("ps_suppkey") === col("l_suppkey"))
        .filter(col("ps_availqty") > col("qty_1996") * 0.5)
        .select(col("ps_suppkey")).distinct()
      scan(s, d, "supplier")
        .join(scan(s, d, "nation").filter(col("n_name") === "NATION_1"),
          col("s_nationkey") === col("n_nationkey"))
        .join(excess, col("s_suppkey") === col("ps_suppkey"), "left_semi")
        .select(col("s_name"))
        .orderBy(col("s_name"))
    }),

    // Q21 shape — suppliers who kept orders waiting: the ONLY late
    // supplier (ship > order date + 90 days — the synthetic schema has
    // no commit/receipt dates) in a finished multi-supplier order.
    // Per-order supplier/late-supplier counts replace the EXISTS /
    // NOT EXISTS pair — one aggregation instead of two correlated probes
    "q_tpch_q21" -> ((s: SparkSession, d: String) => {
      val o = scan(s, d, "orders").filter(col("o_orderstatus") === "F")
      val l = scan(s, d, "lineitem")
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .withColumn("late",
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
        .scopedPersist() // consumed by the per-order census AND the late-row probe
      val perOrder = l.groupBy(col("l_orderkey").as("po_ok"))
        .agg(countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(when(col("late"), col("l_suppkey"))).as("n_late"))
      val lateRows = l.filter(col("late"))
        .select(col("l_orderkey"), col("l_suppkey")).distinct()
      val sup = scan(s, d, "supplier")
        .join(scan(s, d, "nation").filter(col("n_name") === "NATION_2"),
          col("s_nationkey") === col("n_nationkey"))
      lateRows
        .join(perOrder, col("l_orderkey") === col("po_ok"))
        .filter(col("n_supp") >= 2 && col("n_late") === 1)
        .join(sup, col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(100)
    })
  )

  /** Derived partsupp: the synthetic testdata lacks the table, so BOTH
    * engines derive the identical one — distinct (part, supplier) pairs
    * from lineitem with hash-deterministic availqty/supplycost. All
    * integer arithmetic on positive keys, so the derivations are
    * bit-equal and every partsupp-dependent TPC-H shape becomes
    * oracle-checkable.
    */
  private def partsupp(s: SparkSession, d: String): DataFrame =
    scan(s, d, "lineitem")
      .select(col("l_partkey").as("ps_partkey"), col("l_suppkey").as("ps_suppkey"))
      .distinct()
      .withColumn("ps_availqty",
        (pmod(col("ps_partkey") * 31 + col("ps_suppkey") * 17, lit(9999)) + 1).cast("int"))
      .withColumn("ps_supplycost",
        pmod(col("ps_partkey") * 7 + col("ps_suppkey") * 13, lit(100000)).cast("double") / 100.0)
      // persisted: five TPC-H shapes (q2 twice, q9, q11, q16, q20) each
      // re-derive this identical plan; registering it in the cache
      // manager makes the distinct-over-lineitem run once per session
      // (the bench family cache holds it for the whole q_tpch_* family)
      // instead of once per consumer
      .scopedPersist()

  /** DuckDB twin of [[partsupp]] for oracle CTEs. */
  private val psCte =
    """ps0 AS (SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey FROM lineitem),
      |partsupp AS (SELECT ps_partkey, ps_suppkey,
      |  CAST((ps_partkey * 31 + ps_suppkey * 17) % 9999 + 1 AS INT) AS ps_availqty,
      |  CAST((ps_partkey * 7 + ps_suppkey * 13) % 100000 AS DOUBLE) / 100.0 AS ps_supplycost
      |  FROM ps0)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q_tpch_q3" ->
      s"""SELECT l_orderkey, o_orderdate, ${sqlDsum("l_extendedprice * (1 - l_discount)")} AS revenue
         |FROM customer, orders, lineitem
         |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey AND o_orderkey = l_orderkey
         |  AND o_orderdate < TIMESTAMP '$cutoff 00:00:00'
         |  AND l_shipdate > TIMESTAMP '$cutoff 00:00:00'
         |GROUP BY l_orderkey, o_orderdate
         |ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10""".stripMargin,
    "q_tpch_q6" ->
      s"""SELECT ${sqlDsum("l_extendedprice * l_discount")} AS revenue, COUNT(*) AS n
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
         |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,
    "q_tpch_q10" ->
      s"""SELECT c_custkey, c_name, c_acctbal,
         |  ${sqlDsum("l_extendedprice * (1 - l_discount)")} AS revenue, COUNT(*) AS n_items
         |FROM customer, orders, lineitem
         |WHERE c_custkey = o_custkey AND o_orderkey = l_orderkey AND l_returnflag = 'R'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
         |GROUP BY c_custkey, c_name, c_acctbal
         |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "q_tpch_q14" ->
      s"""SELECT 100.0 *
         |    ${sqlDsum("CASE WHEN starts_with(p_type, 'PROMO') THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END")}
         |    / ${sqlDsum("l_extendedprice * (1 - l_discount)")} AS promo_revenue_pct,
         |  COUNT(*) AS n
         |FROM lineitem, part
         |WHERE l_partkey = p_partkey
         |  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND l_shipdate < TIMESTAMP '1996-02-01 00:00:00'""".stripMargin,
    "q_tpch_q4" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 75 DAY)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q_tpch_q5" ->
      s"""SELECT n_name, ${sqlDsum("l_extendedprice * (1 - l_discount)")} AS revenue
         |FROM customer, orders, lineitem, supplier, nation, region
         |WHERE c_custkey = o_custkey AND o_orderkey = l_orderkey
         |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
         |  AND r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
         |GROUP BY n_name
         |ORDER BY revenue DESC, n_name""".stripMargin,
    "q_tpch_q7" ->
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |  CAST(year(l_shipdate) AS INT) AS l_year,
         |  ${sqlDsum("l_extendedprice * (1 - l_discount)")} AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation n1 ON s_nationkey = n1.n_nationkey
         |JOIN nation n2 ON c_nationkey = n2.n_nationkey
         |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
         |  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
         |GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
         |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,
    "q_tpch_q12" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM orders, lineitem
        |WHERE o_orderkey = l_orderkey
        |  AND l_returnflag IN ('A','R')
        |  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q_tpch_q18" ->
      s"""SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN (SELECT l_orderkey, ${sqlDsum("l_quantity")} AS sum_qty
         |      FROM lineitem GROUP BY l_orderkey
         |      HAVING ${sqlDsum("l_quantity")} > 300) big
         |  ON o_orderkey = big.l_orderkey
         |ORDER BY o_totalprice DESC, o_orderdate, o_orderkey LIMIT 100""".stripMargin,
    "q_tpch_q8" ->
      s"""SELECT CAST(year(o_orderdate) AS INT) AS o_year,
         |  ${sqlDsum("CASE WHEN n1.n_name = 'NATION_1' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END")}
         |    / ${sqlDsum("l_extendedprice * (1 - l_discount)")} AS mkt_share
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation n1 ON s_nationkey = n1.n_nationkey
         |JOIN nation n2 ON c_nationkey = n2.n_nationkey
         |JOIN region ON n2.n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         |GROUP BY year(o_orderdate) ORDER BY o_year""".stripMargin,
    "q_tpch_q13" ->
      """SELECT c_count, COUNT(*) AS custdist
        |FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |      FROM customer
        |      LEFT JOIN (SELECT * FROM orders WHERE o_orderpriority <> '1-URGENT') o
        |        ON c_custkey = o.o_custkey
        |      GROUP BY c_custkey)
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q_tpch_q22" ->
      s"""SELECT CAST(c_nationkey AS INT) AS nk, COUNT(*) AS numcust,
         |  ${sqlDsum("c_acctbal")} AS totacctbal
         |FROM customer
         |WHERE c_acctbal > (SELECT ${sqlDsum("c_acctbal")} / COUNT(*)
         |                   FROM customer WHERE c_acctbal > 0.0)
         |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
         |                  AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
         |GROUP BY c_nationkey ORDER BY nk""".stripMargin,
    "q_tpch_q15" ->
      s"""WITH rev AS (SELECT l_suppkey, ${sqlDsum("l_extendedprice * (1 - l_discount)")} AS total_revenue
         |             FROM lineitem
         |             WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         |               AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
         |             GROUP BY l_suppkey)
         |SELECT s_suppkey, s_name, total_revenue
         |FROM rev JOIN supplier ON l_suppkey = s_suppkey
         |WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
         |ORDER BY s_suppkey""".stripMargin,
    "q_tpch_q17" ->
      s"""WITH pp AS (SELECT l_partkey AS avg_pk,
         |              ${sqlDsum("l_quantity")} / COUNT(*) AS avg_qty
         |            FROM lineitem GROUP BY l_partkey)
         |SELECT ${sqlDsum("l_extendedprice")} / 7.0 AS avg_yearly, COUNT(*) AS n
         |FROM lineitem
         |JOIN part ON l_partkey = p_partkey
         |JOIN pp ON l_partkey = avg_pk
         |WHERE p_brand = 'Brand#23' AND l_quantity < 0.2 * avg_qty""".stripMargin,
    "q_tpch_q19" ->
      s"""SELECT ${sqlDsum("l_extendedprice * (1 - l_discount)")} AS revenue, COUNT(*) AS n
         |FROM lineitem, part
         |WHERE p_partkey = l_partkey
         |  AND ((p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 21)
         |    OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 30)
         |    OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 40))""".stripMargin,
    "q_tpch_q2" ->
      s"""WITH $psCte,
         |eur AS (SELECT ps_partkey, ps_suppkey, ps_supplycost, s_acctbal, s_name, n_name
         |        FROM partsupp
         |        JOIN supplier ON ps_suppkey = s_suppkey
         |        JOIN nation ON s_nationkey = n_nationkey
         |        JOIN region ON n_regionkey = r_regionkey
         |        WHERE r_name = 'EUROPE'),
         |mc AS (SELECT ps_partkey AS mc_pk, min(ps_supplycost) AS min_cost
         |       FROM eur GROUP BY ps_partkey)
         |SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, ps_supplycost
         |FROM eur
         |JOIN part ON ps_partkey = p_partkey
         |JOIN mc ON ps_partkey = mc_pk
         |WHERE p_size <= 25 AND p_type = 'LARGE' AND ps_supplycost = min_cost
         |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100""".stripMargin,
    "q_tpch_q9" ->
      s"""WITH $psCte
         |SELECT n_name, CAST(year(o_orderdate) AS INT) AS o_year,
         |  ${sqlDsum("l_extendedprice * (1 - l_discount) - ps_supplycost * l_quantity")} AS sum_profit
         |FROM lineitem
         |JOIN part ON l_partkey = p_partkey
         |JOIN partsupp ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN orders ON l_orderkey = o_orderkey
         |WHERE p_name LIKE '%widget%'
         |GROUP BY n_name, o_year
         |ORDER BY n_name, o_year DESC""".stripMargin,
    "q_tpch_q11" ->
      s"""WITH $psCte,
         |pp AS (SELECT ps_partkey, ${sqlDsumScaled("ps_supplycost * ps_availqty")} AS value
         |       FROM partsupp
         |       JOIN supplier ON ps_suppkey = s_suppkey
         |       JOIN nation ON s_nationkey = n_nationkey
         |       WHERE n_name = 'NATION_3'
         |       GROUP BY ps_partkey)
         |SELECT ps_partkey, value FROM pp
         |WHERE value > (SELECT ${sqlDsum("value")} FROM pp) * 0.001
         |ORDER BY value DESC, ps_partkey""".stripMargin,
    "q_tpch_q16" ->
      s"""WITH $psCte
         |SELECT p_brand, p_type, p_size, COUNT(DISTINCT ps_suppkey) AS supplier_cnt
         |FROM partsupp JOIN part ON ps_partkey = p_partkey
         |WHERE p_brand <> 'Brand#2' AND p_type <> 'PROMO'
         |  AND p_size IN (1, 5, 9, 15, 23, 36, 45, 49)
         |  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_suppkey % 10 = 0)
         |GROUP BY p_brand, p_type, p_size
         |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    "q_tpch_q20" ->
      s"""WITH $psCte,
         |shipped AS (SELECT l_partkey, l_suppkey, ${sqlDsum("l_quantity")} AS qty_1996
         |            FROM lineitem
         |            WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         |              AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
         |            GROUP BY l_partkey, l_suppkey),
         |excess AS (SELECT DISTINCT ps_suppkey
         |           FROM partsupp
         |           JOIN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%') p
         |             ON ps_partkey = p_partkey
         |           JOIN shipped ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
         |           WHERE ps_availqty > qty_1996 * 0.5)
         |SELECT s_name
         |FROM supplier
         |JOIN nation ON s_nationkey = n_nationkey
         |WHERE n_name = 'NATION_1' AND s_suppkey IN (SELECT ps_suppkey FROM excess)
         |ORDER BY s_name""".stripMargin,
    "q_tpch_q21" ->
      s"""WITH lw AS (SELECT l_orderkey, l_suppkey,
         |              l_shipdate > o_orderdate + INTERVAL 90 DAY AS late
         |            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |            WHERE o_orderstatus = 'F'),
         |per_order AS (SELECT l_orderkey AS po_ok,
         |                COUNT(DISTINCT l_suppkey) AS n_supp,
         |                COUNT(DISTINCT CASE WHEN late THEN l_suppkey END) AS n_late
         |              FROM lw GROUP BY l_orderkey),
         |late_rows AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lw WHERE late)
         |SELECT s_name, COUNT(*) AS numwait
         |FROM late_rows
         |JOIN per_order ON l_orderkey = po_ok
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |WHERE n_supp >= 2 AND n_late = 1 AND n_name = 'NATION_2'
         |GROUP BY s_name
         |ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin
  )
}
