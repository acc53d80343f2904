package graft

import graft.model.{Connector, Filter, Sort}
import graft.sources.{MongoFind, MongoFindInterpreter}

/** Execute-and-compare: the golden find-documents from MongoFindSpec,
  * actually RUN against a local DataFrame with Mongo matching rules —
  * proving the compiled dialect is executable, not just well-formed.
  */
class MongoFindInterpreterSpec extends SparkSpec {
  import spark.implicits._

  // name: String (nullable), qty: Long (nullable via Option)
  private lazy val df = Seq(
    (1L, Some("alpha"), Some(10L)),
    (2L, Some("beta.x"), Some(20L)),
    (3L, None: Option[String], Some(30L)),
    (4L, Some("It starts"), None: Option[Long]),
    (5L, Some("gamma"), Some(20L))
  ).toDF("id", "name", "qty")

  private def run(c: Connector): Seq[Long] =
    MongoFindInterpreter.execute(df, MongoFind.compile(c))
      .select("id").as[Long].collect().toSeq

  test("comparisons, equality and AND-merge execute with find semantics") {
    assert(run(Connector("t", filters = Seq(Filter("qty", ">", 10L)))).sorted == Seq(2L, 3L, 5L))
    assert(run(Connector("t", filters = Seq(Filter("name", "=", "alpha")))) == Seq(1L))
    assert(run(Connector("t", filters =
      Seq(Filter("qty", ">=", 20L), Filter("id", "<", 5L)))).sorted == Seq(2L, 3L))
    // same-field overwrite (Object.assign): > 10 then < 30 keeps only < 30
    assert(run(Connector("t", filters =
      Seq(Filter("qty", ">", 10L), Filter("qty", "<", 30L)))).sorted == Seq(1L, 2L, 5L))
  }

  test("$ne and $nin match null fields; $in with null matches missing (Mongo, not SQL)") {
    assert(run(Connector("t", filters = Seq(Filter("qty", "!=", 20L)))).sorted
      == Seq(1L, 3L, 4L)) // doc 4 (qty null) MATCHES $ne — absent-or-different
    assert(run(Connector("t", filters = Seq(Filter("qty", "not_in", Seq(10L, 30L))))).sorted
      == Seq(2L, 4L, 5L))
    assert(run(Connector("t", filters = Seq(Filter("qty", "in", Seq(10L, 30L))))).sorted
      == Seq(1L, 3L))
  }

  test("$nin with null IN the list excludes null fields (null equals null in find matching)") {
    // {qty: {$nin: [null, 10]}}: doc 4 (qty null) must NOT match — null
    // is in the list — while plain $nin without null still matches it
    assert(run(Connector("t", filters =
      Seq(Filter("qty", "not_in", Seq(null, 10L))))).sorted == Seq(2L, 3L, 5L))
    assert(run(Connector("t", filters =
      Seq(Filter("qty", "in", Seq(null, 10L))))).sorted == Seq(1L, 4L))
  }

  test("between, regex quoting, and null checks execute") {
    assert(run(Connector("t", filters = Seq(Filter("qty", "between", Seq(15L, 25L))))).sorted
      == Seq(2L, 5L))
    // contains 'a.x' must match the literal dot (quoting survives execution)
    assert(run(Connector("t", filters = Seq(Filter("name", "contains", "a.x")))) == Seq(2L))
    assert(run(Connector("t", filters = Seq(Filter("name", "starts_with", "It")))) == Seq(4L))
    assert(run(Connector("t", filters = Seq(Filter("name", "is_null", null)))) == Seq(3L))
    assert(run(Connector("t", filters = Seq(Filter("name", "is_not_null", null)))).sorted
      == Seq(1L, 2L, 4L, 5L))
  }

  test("cursor chain: projection, BSON-order sort, skip before limit") {
    val cmd = MongoFind.compile(Connector("t",
      fields = Seq("id", "qty"),
      sort = Seq(Sort("qty", ascending = true), Sort("id", ascending = false)),
      limit = 2L, offset = 1L))
    val out = MongoFindInterpreter.execute(df, cmd)
    assert(out.columns.toSeq == Seq("id", "qty"))
    // qty asc nulls-first: 4(null), 1(10), 5(20), 2(20), 3(30) — id desc
    // breaks the 20-tie; skip 1 then limit 2 → docs 1, 5
    assert(out.select("id").as[Long].collect().toSeq == Seq(1L, 5L))
    // descending sort puts nulls last (BSON order)
    val desc = MongoFind.compile(Connector("t", sort = Seq(Sort("qty", ascending = false))))
    assert(MongoFindInterpreter.execute(df, desc)
      .select("id").as[Long].collect().last == 4L)
  }
}
