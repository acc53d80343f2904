package graft

import graft.model._
import graft.engine.QueryBuilder

/** Connector→DataFrame compilation: every filter operator (SURVEY §2.2),
  * sort/limit/offset, and plan-quality assertions (pushdown reaches the
  * parquet scan — the property the reference hand-codes per adapter).
  */
class QueryBuilderSpec extends SparkSpec {

  private def build(c: Connector) = QueryBuilder.build(spark, sf001, c)

  test("filter operators compile and run") {
    val ops = Seq(
      Filter("l_quantity", "=", 10),
      Filter("l_quantity", "!=", 10),
      Filter("l_quantity", ">", 10),
      Filter("l_quantity", ">=", 10),
      Filter("l_quantity", "<", 10),
      Filter("l_quantity", "<=", 10),
      Filter("l_returnflag", "contains", "N"),
      Filter("l_returnflag", "not_contains", "N"),
      Filter("l_returnflag", "starts_with", "N"),
      Filter("l_returnflag", "in", Seq("N", "R")),
      Filter("l_returnflag", "not_in", Seq("N", "R")),
      Filter("l_quantity", "between", Seq(5, 15)),
      Filter("l_quantity", "not_between", Seq(5, 15)),
      Filter("l_returnflag", "is_null"),
      Filter("l_returnflag", "is_not_null")
    )
    val total = build(Connector("lineitem", limit = 0)).count()
    ops.foreach { f =>
      val n = build(Connector("lineitem", filters = Seq(f), limit = 0)).count()
      assert(n >= 0 && n <= total, s"$f")
    }
    // complementary pairs partition the table
    def cnt(f: Filter) = build(Connector("lineitem", filters = Seq(f), limit = 0)).count()
    assert(cnt(Filter("l_quantity", "=", 10)) + cnt(Filter("l_quantity", "!=", 10)) == total)
    assert(cnt(Filter("l_quantity", "between", Seq(5, 15))) + cnt(Filter("l_quantity", "not_between", Seq(5, 15))) == total)
    assert(cnt(Filter("l_returnflag", "is_null")) + cnt(Filter("l_returnflag", "is_not_null")) == total)
  }

  test("unsupported operator is rejected (allowlist, not passthrough)") {
    intercept[IllegalArgumentException] {
      build(Connector("lineitem", filters = Seq(Filter("l_quantity", "LIKE OR 1=1", 1))))
    }
  }

  test("multi-key sort + limit (top-k)") {
    val rows = build(Connector(
      "lineitem",
      fields = Seq("l_extendedprice", "l_orderkey"),
      sort = Seq(Sort.desc("l_extendedprice"), Sort.asc("l_orderkey")),
      limit = 10
    )).collect()
    assert(rows.length == 10)
    val prices = rows.map(_.getDouble(0)).toSeq
    assert(prices == prices.sorted.reverse)
  }

  test("offset skips rows deterministically") {
    val all = build(Connector("orders", fields = Seq("o_orderkey"), sort = Seq(Sort.asc("o_orderkey")), limit = 30))
      .collect().map(_.getLong(0)).toSeq
    val page2 = build(Connector("orders", fields = Seq("o_orderkey"), sort = Seq(Sort.asc("o_orderkey")), offset = 10, limit = 10))
      .collect().map(_.getLong(0)).toSeq
    assert(page2 == all.slice(10, 20))
  }

  test("default projection keeps all columns; fields project (P1/P3)") {
    assert(build(Connector("region", limit = 0)).columns.toSeq == Seq("r_regionkey", "r_name"))
    assert(build(Connector("region", fields = Seq("r_name"), limit = 0)).columns.toSeq == Seq("r_name"))
  }

  test("plan quality: filter + projection push into the parquet scan") {
    val df = build(Connector(
      "lineitem",
      fields = Seq("l_orderkey", "l_quantity"),
      filters = Seq(Filter("l_quantity", "<", 24)),
      limit = 0
    ))
    val physical = df.queryExecution.executedPlan.toString()
    assert(physical.contains("PushedFilters: [IsNotNull(l_quantity), LessThan(l_quantity,24.0)]"),
      s"predicate not pushed:\n$physical")
    // scan must read only the two needed columns
    assert(physical.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"),
      s"columns not pruned:\n$physical")
  }
}
