package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
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
    })
  )

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
         |    OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 40))""".stripMargin
  )
}
