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

    "q_dq_checksum" ->
      s"""SELECT source, CAST(COUNT(*) AS BIGINT) AS n_rows,
         |  CAST(bit_xor(${DedupQueries.sqlHex60Public("md5(doc_id::VARCHAR || ':' || text)")}) AS BIGINT) AS xor60,
         |  CAST(SUM(n_chars) AS BIGINT) AS n_bytes
         |FROM documents GROUP BY source ORDER BY source""".stripMargin
  )
}
