package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model._
import graft.engine.QueryBuilder

/** Reference-parity queries: the complete Connector surface — projection
  * (P1-P3), every filter operator (F1-F6), multi-key sort, limit, offset,
  * top-k (SURVEY §2.2/§2.5). Each query is the declarative model compiled
  * by [[graft.engine.QueryBuilder]]; every oracle is the equivalent ANSI
  * SQL. All sorts are key-complete so tie order can't diverge from the
  * oracle (SURVEY §7.4).
  */
object RefParity {
  private def q(c: Connector)(spark: SparkSession, dir: String): DataFrame =
    QueryBuilder.build(spark, dir, c)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // P1 projection + stable order
    "q_scan_project" -> q(Connector(
      table = "lineitem",
      fields = Seq("l_orderkey", "l_linenumber", "l_quantity"),
      // (l_orderkey, l_linenumber) is not unique in the synthetic data —
      // sort on every selected column so output order is value-deterministic
      sort = Seq(Sort.asc("l_orderkey"), Sort.asc("l_linenumber"), Sort.asc("l_quantity")),
      limit = 500
    )) _,

    // F2 comparison operators =, <, >=
    "q_filter_cmp" -> q(Connector(
      table = "lineitem",
      fields = Seq("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_returnflag"),
      filters = Seq(
        Filter("l_quantity", "<", 24),
        Filter("l_returnflag", "=", "N"),
        Filter("l_discount", ">=", 0.05)
      ),
      sort = Seq(Sort.asc("l_orderkey"), Sort.asc("l_linenumber"),
        Sort.asc("l_quantity"), Sort.asc("l_discount"), Sort.asc("l_returnflag")),
      limit = 0
    )) _,

    // F2 !=, <=, >
    "q_filter_ops" -> q(Connector(
      table = "orders",
      fields = Seq("o_orderkey", "o_orderstatus", "o_totalprice"),
      filters = Seq(
        Filter("o_orderstatus", "!=", "F"),
        Filter("o_totalprice", ">", 1000.0),
        Filter("o_custkey", "<=", 500)
      ),
      sort = Seq(Sort.asc("o_orderkey")),
      limit = 0
    )) _,

    // F3 contains / not_contains / starts_with
    "q_filter_strings" -> q(Connector(
      table = "part",
      fields = Seq("p_partkey", "p_name", "p_type", "p_brand"),
      filters = Seq(
        Filter("p_type", "contains", "ECO"),
        Filter("p_name", "not_contains", "red"),
        Filter("p_brand", "starts_with", "Brand#1")
      ),
      sort = Seq(Sort.asc("p_partkey")),
      limit = 0
    )) _,

    // F4 in / not_in / between
    "q_filter_set" -> q(Connector(
      table = "customer",
      fields = Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"),
      filters = Seq(
        Filter("c_nationkey", "in", Seq(1, 3, 5, 7)),
        Filter("c_acctbal", "between", Seq(100.0, 5000.0)),
        Filter("c_mktsegment", "not_in", Seq("AUTOMOBILE", "MACHINERY"))
      ),
      sort = Seq(Sort.asc("c_custkey")),
      limit = 0
    )) _,

    // F4 null tests + not_between
    "q_filter_null" -> q(Connector(
      table = "events",
      fields = Seq("event_id", "user_id", "event_type", "value"),
      filters = Seq(
        Filter("props", "is_not_null"),
        Filter("value", "not_between", Seq(10.0, 1000.0))
      ),
      sort = Seq(Sort.asc("event_id")),
      limit = 0
    )) _,

    // Top-K: multi-key sort desc + limit → Spark plans TakeOrderedAndProject
    "q_topk" -> q(Connector(
      table = "lineitem",
      fields = Seq("l_orderkey", "l_linenumber", "l_extendedprice"),
      sort = Seq(Sort.desc("l_extendedprice"), Sort.asc("l_orderkey"), Sort.asc("l_linenumber")),
      limit = 100
    )) _,

    // Offset pagination analogue (reference page math, src/index.ts:230)
    "q_offset" -> q(Connector(
      table = "orders",
      fields = Seq("o_orderkey", "o_custkey", "o_totalprice"),
      sort = Seq(Sort.asc("o_orderkey")),
      offset = 100,
      limit = 50
    )) _,

    // Flagship e2e: the reference's canonical table_query shape
    // (adapters/postgresql/src/index.ts:147-190) — filter+project+sort+limit
    "q_connector_e2e" -> q(Connector(
      table = "lineitem",
      fields = Seq("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_returnflag"),
      filters = Seq(Filter("l_quantity", "<", 24), Filter("l_returnflag", "=", "N")),
      sort = Seq(Sort.desc("l_extendedprice"), Sort.asc("l_orderkey"), Sort.asc("l_linenumber"),
        Sort.asc("l_quantity"), Sort.asc("l_returnflag")),
      limit = 100
    )) _,

    // SURVEY §7.1 extension surface, fully declared as the JSON a
    // reference user would write: filter → broadcast join → groupBy with
    // ExactAgg sums → HAVING → sort. Parsed through ConnectorJson so the
    // whole declarative path (JSON → model → Catalyst plan) is verified
    "q_connector_join_agg" -> ((spark: SparkSession, dir: String) => {
      val json =
        """{
          |  "table": "orders",
          |  "filters": [{"field": "o_totalprice", "operator": ">", "value": 1000}],
          |  "joins": [{"table": "customer", "leftOn": "o_custkey",
          |             "rightOn": "c_custkey", "type": "inner", "broadcast": true}],
          |  "groupBy": {
          |    "fields": ["c_mktsegment", "o_orderstatus"],
          |    "aggs": [
          |      {"function": "count", "as": "n"},
          |      {"function": "sum", "field": "o_totalprice", "as": "revenue"},
          |      {"function": "avg", "field": "o_totalprice", "as": "avg_price"},
          |      {"function": "count_distinct", "field": "o_custkey", "as": "n_cust"}
          |    ],
          |    "having": [{"field": "n", "operator": ">=", "value": 10}]
          |  },
          |  "sort": [{"field": "c_mktsegment", "type": "asc"},
          |           {"field": "o_orderstatus", "type": "asc"}]
          |}""".stripMargin
      QueryBuilder.build(spark, dir, ConnectorJson.parse(json))
    }),

    // declarative windows (the third §7.1 extension): per-customer order
    // rank + running revenue, straight from JSON
    "q_connector_window" -> ((spark: SparkSession, dir: String) => {
      val json =
        """{
          |  "table": "orders",
          |  "windows": [
          |    {"function": "row_number", "as": "rn",
          |     "partitionBy": ["o_custkey"],
          |     "orderBy": [{"field": "o_orderdate", "type": "asc"},
          |                 {"field": "o_orderkey", "type": "asc"}]},
          |    {"function": "sum", "field": "o_totalprice", "as": "running_rev",
          |     "partitionBy": ["o_custkey"],
          |     "orderBy": [{"field": "o_orderdate", "type": "asc"},
          |                 {"field": "o_orderkey", "type": "asc"}]}
          |  ],
          |  "fields": ["o_custkey", "o_orderkey", "rn", "running_rev"],
          |  "sort": [{"field": "o_custkey", "type": "asc"},
          |           {"field": "o_orderkey", "type": "asc"}]
          |}""".stripMargin
      QueryBuilder.build(spark, dir, ConnectorJson.parse(json))
    }),

    // declarative sample + exact dedup, straight from JSON — the
    // reference user's "clean this extract" config: reproducible salted
    // hash-sample, then one deterministic survivor per (orderkey, line)
    "q_connector_dedup" -> ((spark: SparkSession, dir: String) => {
      val json =
        """{
          |  "table": "lineitem",
          |  "sample": {"column": "l_orderkey", "percent": 40, "salt": "s42"},
          |  "dedup": {"keys": ["l_orderkey", "l_linenumber"]},
          |  "fields": ["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"],
          |  "sort": [{"field": "l_orderkey", "type": "asc"},
          |           {"field": "l_linenumber", "type": "asc"}]
          |}""".stripMargin
      QueryBuilder.build(spark, dir, ConnectorJson.parse(json))
    }),

    // the WHOLE declarative surface in one JSON config: filter → sample →
    // dedup → broadcast join → window → projection → sort — what a
    // reference user's full pipeline definition compiles to
    "q_connector_full" -> ((spark: SparkSession, dir: String) => {
      val json =
        """{
          |  "table": "orders",
          |  "filters": [{"field": "o_totalprice", "operator": ">", "value": 1000.0}],
          |  "sample": {"column": "o_orderkey", "percent": 50, "salt": "full"},
          |  "dedup": {"keys": ["o_custkey"]},
          |  "joins": [{"table": "customer", "leftOn": "o_custkey",
          |             "rightOn": "c_custkey", "type": "left", "broadcast": true}],
          |  "windows": [
          |    {"function": "rank", "as": "price_rank",
          |     "partitionBy": ["c_mktsegment"],
          |     "orderBy": [{"field": "o_totalprice", "type": "desc"},
          |                 {"field": "o_orderkey", "type": "asc"}]}
          |  ],
          |  "fields": ["o_custkey", "o_orderkey", "c_mktsegment", "o_totalprice", "price_rank"],
          |  "sort": [{"field": "o_custkey", "type": "asc"}]
          |}""".stripMargin
      QueryBuilder.build(spark, dir, ConnectorJson.parse(json))
    }),

    // the reference's sync action as a declarative JSON verb: filter the
    // change set, reduce to the latest row per key (upsert), project and
    // sort — the whole incremental-sync read side in one config
    "q_connector_sync" -> ((spark: SparkSession, dir: String) => {
      val json =
        """{
          |  "table": "orders",
          |  "filters": [{"field": "o_orderstatus", "operator": "!=", "value": "P"}],
          |  "upsert": {"keys": ["o_custkey"], "versionCols": ["o_orderdate", "o_orderkey"]},
          |  "fields": ["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"],
          |  "sort": [{"field": "o_custkey", "type": "asc"}]
          |}""".stripMargin
      QueryBuilder.build(spark, dir, ConnectorJson.parse(json))
    }),

    // declarative left join + projection (no aggregation): the other
    // extension shape, also via JSON
    "q_connector_join" -> ((spark: SparkSession, dir: String) => {
      val json =
        """{
          |  "table": "customer",
          |  "joins": [{"table": "nation", "leftOn": "c_nationkey",
          |             "rightOn": "n_nationkey", "type": "left", "broadcast": true}],
          |  "fields": ["c_custkey", "c_name", "n_name"],
          |  "sort": [{"field": "c_custkey", "type": "asc"}],
          |  "limit": 1000
          |}""".stripMargin
      QueryBuilder.build(spark, dir, ConnectorJson.parse(json))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q_scan_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_quantity LIMIT 500""".stripMargin,
    "q_filter_cmp" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag FROM lineitem
        |WHERE l_quantity < 24 AND l_returnflag = 'N' AND l_discount >= 0.05
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag""".stripMargin,
    "q_filter_ops" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |WHERE o_orderstatus <> 'F' AND o_totalprice > 1000.0 AND o_custkey <= 500
        |ORDER BY o_orderkey""".stripMargin,
    "q_filter_strings" ->
      """SELECT p_partkey, p_name, p_type, p_brand FROM part
        |WHERE p_type LIKE '%ECO%' AND p_name NOT LIKE '%red%' AND p_brand LIKE 'Brand#1%'
        |ORDER BY p_partkey""".stripMargin,
    "q_filter_set" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM customer
        |WHERE c_nationkey IN (1,3,5,7) AND c_acctbal BETWEEN 100.0 AND 5000.0
        |  AND c_mktsegment NOT IN ('AUTOMOBILE','MACHINERY')
        |ORDER BY c_custkey""".stripMargin,
    "q_filter_null" ->
      """SELECT event_id, user_id, event_type, value FROM events
        |WHERE props IS NOT NULL AND value NOT BETWEEN 10.0 AND 1000.0
        |ORDER BY event_id""".stripMargin,
    "q_topk" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 100""".stripMargin,
    "q_offset" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_orderkey LIMIT 50 OFFSET 100""".stripMargin,
    "q_connector_e2e" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag FROM lineitem
        |WHERE l_quantity < 24 AND l_returnflag = 'N'
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber, l_quantity, l_returnflag
        |LIMIT 100""".stripMargin,
    "q_connector_join_agg" ->
      s"""SELECT c_mktsegment, o_orderstatus, COUNT(*) AS n,
         |  ${graft.ops.ExactAgg.sqlDsum("o_totalprice")} AS revenue,
         |  ${graft.ops.ExactAgg.sqlDavg("o_totalprice")} AS avg_price,
         |  COUNT(DISTINCT o_custkey) AS n_cust
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |WHERE o_totalprice > 1000
         |GROUP BY c_mktsegment, o_orderstatus
         |HAVING COUNT(*) >= 10
         |ORDER BY c_mktsegment, o_orderstatus""".stripMargin,
    "q_connector_sync" ->
      """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice
        |FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
        |                                   ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |      FROM orders WHERE o_orderstatus <> 'P') t
        |WHERE rn = 1 ORDER BY o_custkey""".stripMargin,
    "q_connector_join" ->
      """SELECT c_custkey, c_name, n_name
        |FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey
        |ORDER BY c_custkey LIMIT 1000""".stripMargin,
    "q_connector_full" -> {
      val samplePred = DedupQueries.sqlHex60Public("md5('full:' || CAST(o_orderkey AS VARCHAR))")
      s"""WITH f AS (SELECT * FROM orders WHERE o_totalprice > 1000.0),
         |s AS (SELECT * FROM f WHERE $samplePred % 100 < 50),
         |dd AS (SELECT * FROM (
         |  SELECT *, row_number() OVER (PARTITION BY o_custkey
         |    ORDER BY o_orderkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority) AS rn
         |  FROM s) WHERE rn = 1),
         |j AS (SELECT dd.*, c_mktsegment FROM dd LEFT JOIN customer ON o_custkey = c_custkey)
         |SELECT o_custkey, o_orderkey, c_mktsegment, o_totalprice,
         |  CAST(rank() OVER (PARTITION BY c_mktsegment
         |                    ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS price_rank
         |FROM j ORDER BY o_custkey""".stripMargin
    },
    "q_connector_dedup" ->
      s"""WITH sampled AS (
         |  SELECT * FROM lineitem
         |  WHERE ${DedupQueries.sqlHex60Public("md5('s42:' || CAST(l_orderkey AS VARCHAR))")} % 100 < 40),
         |dd AS (
         |  SELECT *, row_number() OVER (PARTITION BY l_orderkey, l_linenumber
         |    ORDER BY l_partkey, l_suppkey, l_quantity, l_extendedprice, l_discount,
         |             l_tax, l_returnflag, l_linestatus, l_shipdate) AS rn
         |  FROM sampled)
         |SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
         |FROM dd WHERE rn = 1
         |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_connector_window" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(row_number() OVER w AS INT) AS rn,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) OVER
        |    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_rev
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin
  )
}
