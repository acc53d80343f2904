package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.model.{Connector, Filter, Sort}
import graft.sources.MongoFind

/** Golden-JSON checks for the Mongo find-command compiler against the
  * reference's buildMongoQuery/buildProjection/buildSort semantics
  * (adapters/mongodb/src/index.ts:99-151) — no wire connection needed.
  */
class MongoFindSpec extends AnyFunSuite {

  private def q(filters: Filter*): String =
    MongoFind.compile(Connector("t", filters = filters.toSeq)).queryJson

  test("reference operator set compiles to the exact find documents") {
    assert(q(Filter("a", "=", 5L)) == """{"a":5}""")
    assert(q(Filter("a", ">", 5L)) == """{"a":{"$gt":5}}""")
    assert(q(Filter("a", "<", 5L)) == """{"a":{"$lt":5}}""")
    assert(q(Filter("a", ">=", 5L)) == """{"a":{"$gte":5}}""")
    assert(q(Filter("a", "<=", 5L)) == """{"a":{"$lte":5}}""")
    assert(q(Filter("a", "!=", "x")) == """{"a":{"$ne":"x"}}""")
    // unknown operator falls back to equality — the reference's default branch
    assert(q(Filter("a", "weird_op", "v")) == """{"a":"v"}""")
  }

  test("filters AND-merge per field; later filter on the same field overwrites (Object.assign)") {
    assert(q(Filter("a", ">", 1L), Filter("b", "=", "x")) == """{"a":{"$gt":1},"b":"x"}""")
    assert(q(Filter("a", ">", 1L), Filter("a", "<", 9L)) == """{"a":{"$lt":9}}""")
  }

  test("extended operator set: in/nin, between, regex, null checks") {
    assert(q(Filter("a", "in", Seq(1L, 2L))) == """{"a":{"$in":[1,2]}}""")
    assert(q(Filter("a", "not_in", Seq("x", "y"))) == """{"a":{"$nin":["x","y"]}}""")
    assert(q(Filter("a", "between", Seq(1L, 9L))) == """{"a":{"$gte":1,"$lte":9}}""")
    assert(q(Filter("a", "contains", "a.b")) == """{"a":{"$regex":"a\\.b"}}""")
    assert(q(Filter("a", "starts_with", "It")) == """{"a":{"$regex":"^It"}}""")
    assert(q(Filter("a", "is_null", null)) == """{"a":{"$eq":null}}""")
    assert(q(Filter("a", "is_not_null", null)) == """{"a":{"$ne":null}}""")
  }

  test("between with a malformed value is a clear error, not a MatchError") {
    val e1 = intercept[IllegalArgumentException] { q(Filter("a", "between", 5L)) }
    assert(e1.getMessage.contains("[lo, hi]"))
    val e2 = intercept[IllegalArgumentException] { q(Filter("a", "between", Seq(1L, 2L, 3L))) }
    assert(e2.getMessage.contains("[lo, hi]"))
  }

  test("projection, sort, limit, skip assemble like the reference cursor chain") {
    val cmd = MongoFind.compile(Connector("t",
      fields = Seq("a", "b"),
      sort = Seq(Sort("a", ascending = true), Sort("b", ascending = false)),
      limit = 100L, offset = 20L))
    assert(cmd.projectionJson.contains("""{"a":1,"b":1}"""))
    assert(cmd.sortJson.contains("""{"a":1,"b":-1}"""))
    assert(cmd.limit.contains(100L) && cmd.skip.contains(20L))
    // no fields / no sort → no projection / no sort stage, like the reference
    val bare = MongoFind.compile(Connector("t"))
    assert(bare.projection.isEmpty && bare.sort.isEmpty && bare.skip.isEmpty)
  }
}
