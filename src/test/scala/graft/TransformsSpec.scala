package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.model.Transformation
import graft.transform.Transforms

/** Golden vectors ported from the reference's transform suite
  * (reference: tests/transform.test.ts:5-217; FIXTURES.md §1.1). Pins the
  * JS-fidelity edge cases: concat falsy-skip, toNumber prefix-parse,
  * extract group-fallback and slice, literal-delimiter split.
  */
class TransformsSpec extends SparkSpec {
  import spark.implicits._

  // tests/transform.test.ts:5-20 fixture
  private lazy val people = Seq(
    ("Jorge", "Lukas", "jorge@supercoolsoftware.com", "260", "  Lucky  "),
    ("Jane", "Doe", "jane.doe@example.com", "261", "JD ")
  ).toDF("firstname", "lastname", "email", "id", "nickname")

  private def run(t: Transformation, outCol: String): Seq[Any] =
    Transforms.applyAll(people, Seq(t)).select(outCol).collect().map(_.get(0)).toSeq

  test("concat joins with glue (transform.test.ts concat)") {
    assert(run(Transformation("concat", properties = Seq("firstname", "lastname"), glue = " ", to = "full"), "full")
      == Seq("Jorge Lukas", "Jane Doe"))
  }

  test("concat skips falsy values (transform.ts:24 filter(Boolean))") {
    val df = Seq(("Jorge", null: String, "", "0"), ("Jane", "X", "y", "1"))
      .toDF("a", "b", "c", "d")
    val out = Transforms.applyAll(df,
      Seq(Transformation("concat", properties = Seq("a", "b", "c", "d"), glue = "-", to = "j")))
      .select("j").as[String].collect().toSeq
    assert(out == Seq("Jorge", "Jane-X-y-1")) // null, '', '0' all dropped
  }

  test("uppercase / lowercase / trim with null→''") {
    assert(run(Transformation("uppercase", field = "firstname", to = "u"), "u") == Seq("JORGE", "JANE"))
    assert(run(Transformation("lowercase", field = "firstname", to = "l"), "l") == Seq("jorge", "jane"))
    assert(run(Transformation("trim", field = "nickname", to = "t"), "t") == Seq("Lucky", "JD"))
  }

  test("split on literal delimiter (transform.ts:79-89; regex metachars quoted)") {
    val out = run(Transformation("split", field = "email", to = "parts", delimiter = "."), "parts")
    assert(out.head == Seq("jorge@supercoolsoftware", "com"))
    assert(out(1) == Seq("jane", "doe@example", "com"))
  }

  test("replace is global regex (transform.ts:91-101)") {
    assert(run(Transformation("replace", field = "email", to = "r", search = "o", replace = "0"), "r")
      == Seq("j0rge@superc00ls0ftware.c0m", "jane.d0e@example.c0m"))
  }

  test("addPrefix / addSuffix (transform.ts:103-125)") {
    assert(run(Transformation("addPrefix", field = "id", to = "p", prefix = "ID-"), "p") == Seq("ID-260", "ID-261"))
    assert(run(Transformation("addSuffix", field = "id", to = "s", suffix = "-X"), "s") == Seq("260-X", "261-X"))
  }

  test("toNumber: JS parseFloat prefix-parse || 0 (transform.ts:127-137)") {
    val df = Seq("260", "12abc", "abc", "", "  3.5e2xyz", "-4.25", "0", "NaNish").toDF("v")
    val out = Transforms.applyAll(df, Seq(Transformation("toNumber", field = "v", to = "n")))
      .select("n").as[Double].collect().toSeq
    assert(out == Seq(260.0, 12.0, 0.0, 0.0, 350.0, -4.25, 0.0, 0.0))
  }

  test("extract: regex group 1, fallback group 0, no-match '' (transform.ts:139-148)") {
    assert(run(Transformation("extract", field = "email", to = "user", pattern = "^(.+)@"), "user")
      == Seq("jorge", "jane.doe"))
    // pattern without capture group → whole match
    val df = Seq("abc123def").toDF("v")
    val out = Transforms.applyAll(df, Seq(Transformation("extract", field = "v", to = "d", pattern = "[0-9]+")))
      .select("d").as[String].collect().toSeq
    assert(out == Seq("123"))
    assert(run(Transformation("extract", field = "firstname", to = "x", pattern = "[0-9]+"), "x") == Seq("", ""))
  }

  test("extract: slice [start,end) (transform.ts:150-155)") {
    assert(run(Transformation("extract", field = "email", to = "s5", start = 0, end = 5), "s5")
      == Seq("jorge", "jane."))
  }

  test("mergeObjects builds struct (transform.ts:157-172)") {
    val out = Transforms.applyAll(people,
      Seq(Transformation("mergeObjects", to = "obj", fields = Seq("firstname", "lastname"))))
      .select("obj").collect().toSeq
    assert(out.map(_.getStruct(0)) == Seq(Row("Jorge", "Lukas"), Row("Jane", "Doe")))
  }

  test("renameKey copies dotted path, original kept (transform.ts:31-41)") {
    val nested = people.withColumn("user", struct(col("firstname").as("name")))
    val out = Transforms.applyAll(nested, Seq(Transformation("renameKey", field = "user.name", to = "username")))
    assert(out.select("username").as[String].collect().toSeq == Seq("Jorge", "Jane"))
    assert(out.columns.contains("user")) // copy, not rename
  }

  test("unknown transform type warns and skips (transform.ts:174-176)") {
    val out = Transforms.applyAll(people, Seq(Transformation("nope", field = "id")))
    assert(out.columns.toSeq == people.columns.toSeq)
  }

  test("transforms apply sequentially in declaration order (transform.ts:14-17)") {
    val out = Transforms.applyAll(people, Seq(
      Transformation("uppercase", field = "firstname", to = "x"),
      Transformation("addSuffix", field = "x", to = "x", suffix = "!")
    )).select("x").as[String].collect().toSeq
    assert(out == Seq("JORGE!", "JANE!"))
  }
}
