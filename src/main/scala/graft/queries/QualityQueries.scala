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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
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
    })
  )

  val oracleSql: Map[String, String] = Map(
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
        |FROM h, t ORDER BY bin""".stripMargin
  )
}
