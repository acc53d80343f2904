package graft

import org.apache.spark.sql.AnalysisException
import graft.model._
import graft.engine.QueryBuilder

/** Error-quality contract: bad configs fail at plan time with clear
  * errors, not at execution or silently.
  */
class ErrorPathSpec extends SparkSpec {

  test("filter on a nonexistent column fails analysis") {
    intercept[AnalysisException] {
      QueryBuilder.build(spark, sf001, Connector(
        "region", filters = Seq(Filter("no_such_col", "=", 1)))).collect()
    }
  }

  test("projection of a nonexistent field fails analysis") {
    intercept[AnalysisException] {
      QueryBuilder.build(spark, sf001, Connector(
        "region", fields = Seq("nope"))).collect()
    }
  }

  test("scan of an unknown table fails with path error") {
    intercept[AnalysisException] {
      QueryBuilder.scan(spark, sf001, "no_such_table").collect()
    }
  }

  test("transformation referencing a missing field fails analysis") {
    intercept[AnalysisException] {
      QueryBuilder.build(spark, sf001, Connector(
        "region",
        transformations = Seq(Transformation("uppercase", field = "ghost", to = "g")))).collect()
    }
  }

  test("between filter requires exactly two bounds") {
    intercept[Exception] {
      QueryBuilder.build(spark, sf001, Connector(
        "region", filters = Seq(Filter("r_regionkey", "between", Seq(1))))).collect()
    }
  }

  test("unknown aggregate function is a plan-time allowlist error") {
    val e = intercept[IllegalArgumentException] {
      QueryBuilder.build(spark, sf001, Connector(
        "orders", groupBy = Some(GroupBySpec(Seq("o_orderstatus"),
          Seq(AggSpec("median_of_medians", "o_totalprice"))))))
    }
    assert(e.getMessage.contains("unsupported aggregate function"))
  }

  test("unknown join type is a plan-time allowlist error") {
    val e = intercept[IllegalArgumentException] {
      QueryBuilder.build(spark, sf001, Connector(
        "orders", joins = Seq(JoinSpec("customer", "o_custkey", "c_custkey",
          joinType = "sideways"))))
    }
    assert(e.getMessage.contains("unsupported join type"))
  }

  test("groupBy without aggregates is rejected") {
    intercept[IllegalArgumentException] {
      QueryBuilder.build(spark, sf001, Connector(
        "orders", groupBy = Some(GroupBySpec(Seq("o_orderstatus"), Nil))))
    }
  }

  test("unknown window function is a plan-time allowlist error") {
    val e = intercept[IllegalArgumentException] {
      QueryBuilder.build(spark, sf001, Connector(
        "orders", windows = Seq(WindowFnSpec("percentile_disc", "o_totalprice",
          partitionBy = Seq("o_custkey"), orderBy = Seq(Sort.asc("o_orderkey"))))))
    }
    assert(e.getMessage.contains("unsupported window function"))
  }

  test("rank-family window without orderBy is rejected") {
    intercept[IllegalArgumentException] {
      QueryBuilder.build(spark, sf001, Connector(
        "orders", windows = Seq(WindowFnSpec("row_number", partitionBy = Seq("o_custkey")))))
    }
  }

  test("sample percent outside [0,100] is a plan-time error") {
    intercept[IllegalArgumentException] {
      QueryBuilder.build(spark, sf001, Connector(
        "orders", sample = Some(SampleSpec("o_orderkey", 150))))
    }
  }

  test("dedup without keys is a plan-time error") {
    intercept[IllegalArgumentException] {
      QueryBuilder.build(spark, sf001, Connector("orders", dedup = Some(DedupSpec(Nil))))
    }
  }
}
