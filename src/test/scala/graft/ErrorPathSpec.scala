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
}
