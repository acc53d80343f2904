package graft

import graft.model._
import graft.engine.QueryBuilder
import graft.sources.{SourceDef, SourceRegistry, Vault}

/** JSON config front-end + registry/vault error semantics (reference:
  * adapter-not-found src/index.ts:388, missing credentials
  * src/index.ts:334-351).
  */
class ConnectorJsonSpec extends SparkSpec {

  test("JSON connector parses and runs identically to the Scala model") {
    val json =
      """{
        |  "table": "lineitem",
        |  "fields": ["l_orderkey", "l_linenumber", "l_quantity"],
        |  "filters": [
        |    {"field": "l_quantity", "operator": "<", "value": 24},
        |    {"field": "l_returnflag", "operator": "=", "value": "N"}
        |  ],
        |  "sort": [{"field": "l_orderkey", "type": "asc"},
        |           {"field": "l_linenumber", "type": "asc"},
        |           {"field": "l_quantity", "type": "asc"}],
        |  "limit": 50
        |}""".stripMargin
    val fromJson = QueryBuilder.build(spark, sf001, ConnectorJson.parse(json)).collect().toSeq
    val fromModel = QueryBuilder.build(spark, sf001, Connector(
      table = "lineitem",
      fields = Seq("l_orderkey", "l_linenumber", "l_quantity"),
      filters = Seq(Filter("l_quantity", "<", 24L), Filter("l_returnflag", "=", "N")),
      sort = Seq(Sort.asc("l_orderkey"), Sort.asc("l_linenumber"), Sort.asc("l_quantity")),
      limit = 50)).collect().toSeq
    assert(fromJson == fromModel)
    assert(fromJson.nonEmpty)
  }

  test("JSON transformations round-trip (concat/uppercase)") {
    val json =
      """{"table": "region",
        |  "transformations": [
        |    {"type": "concat", "properties": ["r_name", "r_name"], "glue": "-", "to": "double_name"},
        |    {"type": "uppercase", "field": "double_name", "to": "double_name"}],
        |  "fields": ["r_regionkey", "double_name"],
        |  "sort": [{"field": "r_regionkey"}], "limit": 0}""".stripMargin
    val rows = QueryBuilder.build(spark, sf001, ConnectorJson.parse(json)).collect()
    assert(rows.length == 5)
    assert(rows.forall(r => r.getString(1) == (r.getString(1).toUpperCase)))
    assert(rows.head.getString(1).contains("-"))
  }

  test("connector JSON without table is rejected") {
    intercept[IllegalArgumentException] { ConnectorJson.parse("""{"fields": ["x"]}""") }
  }

  test("extended connector JSON parses joins and groupBy (SURVEY §7.1 extensions)") {
    val c = ConnectorJson.parse(
      """{
        |  "table": "orders",
        |  "joins": [{"table": "customer", "leftOn": "o_custkey",
        |             "rightOn": "c_custkey", "type": "left", "broadcast": true}],
        |  "groupBy": {
        |    "fields": ["c_mktsegment"],
        |    "aggs": [{"function": "count", "as": "n"},
        |             {"function": "sum", "field": "o_totalprice", "as": "rev"}],
        |    "having": [{"field": "n", "operator": ">", "value": 5}]
        |  }
        |}""".stripMargin)
    assert(c.joins == Seq(JoinSpec("customer", "o_custkey", "c_custkey", "left", broadcastRight = true)))
    val g = c.groupBy.get
    assert(g.fields == Seq("c_mktsegment"))
    assert(g.aggs == Seq(AggSpec("count", null, "n"), AggSpec("sum", "o_totalprice", "rev")))
    assert(g.having == Seq(Filter("n", ">", 5L)))
  }

  test("connector JSON parses sample and dedup specs; dedup keeps one row per key") {
    val c = ConnectorJson.parse(
      """{
        |  "table": "lineitem",
        |  "sample": {"column": "l_orderkey", "percent": 40, "salt": "s42"},
        |  "dedup": {"keys": ["l_orderkey", "l_linenumber"]}
        |}""".stripMargin)
    assert(c.sample.contains(SampleSpec("l_orderkey", 40, "s42")))
    assert(c.dedup.contains(DedupSpec(Seq("l_orderkey", "l_linenumber"))))
    val df = graft.engine.QueryBuilder.build(spark, sf001, c)
    import org.apache.spark.sql.functions._
    val dupKeys = df.groupBy(col("l_orderkey"), col("l_linenumber"))
      .count().filter(col("count") > 1).count()
    assert(dupKeys == 0, "dedup left duplicate keys")
    // sampling is a strict, reproducible subset
    val full = graft.engine.QueryBuilder.build(spark, sf001, c.copy(sample = None))
    assert(df.count() < full.count())
    assert(df.count() == graft.engine.QueryBuilder.build(spark, sf001, c).count())
  }

  test("declarative broadcast join plans as BroadcastHashJoin") {
    val df = graft.engine.QueryBuilder.build(spark, sf001, Connector(
      "orders",
      joins = Seq(JoinSpec("customer", "o_custkey", "c_custkey", broadcastRight = true)),
      groupBy = Some(GroupBySpec(Seq("c_mktsegment"), Seq(AggSpec("count", as = "n"))))))
    assert(df.queryExecution.executedPlan.toString().contains("BroadcastHashJoin"))
    assert(df.count() > 0)
  }

  test("unknown source name errors like adapter-not-found") {
    val reg = new SourceRegistry()
    intercept[IllegalArgumentException] { reg.load(spark, "nope") }
  }

  test("missing credentials key is a hard error (vault semantics)") {
    val reg = new SourceRegistry(new Vault(Map.empty))
      .register("s", SourceDef("parquet", s"$sf001/region.parquet", credentialsKey = "absent"))
    intercept[IllegalArgumentException] { reg.load(spark, "s") }
  }

  test("registry loads registered parquet sources with credentials merged") {
    val reg = new SourceRegistry(new Vault(Map("k" -> Map("mergeSchema" -> "false"))))
      .register("regions", SourceDef("parquet", s"$sf001/region.parquet", credentialsKey = "k"))
    assert(reg.load(spark, "regions").count() == 5)
  }
}
