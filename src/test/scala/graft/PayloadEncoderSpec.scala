package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema
import org.apache.spark.sql.types._
import graft.sinks.{PayloadEncoders, Sinks}

/** Golden tests for the per-service upload payload encoders (K4). Every
  * expected string below was produced by executing the REFERENCE's own
  * encoding logic (gmail/src/index.ts:326-330 raw-email chain;
  * stripe/src/index.ts:197-217 appendObject + :444-457 upload loop with
  * Node's URLSearchParams) over the same inputs — byte-for-byte goldens,
  * not re-derived expectations.
  */
class PayloadEncoderSpec extends SparkSpec {

  test("gmail raw message: base64url without padding, reference vectors") {
    assert(PayloadEncoders.gmailRawMessage("alice@example.com", "Hello", "Line one\nLine two") ==
      "VG86IGFsaWNlQGV4YW1wbGUuY29tDQpTdWJqZWN0OiBIZWxsbw0KDQpMaW5lIG9uZQpMaW5lIHR3bw")
    // multi-byte UTF-8 in subject AND body; the encoded form exercises both
    // substitutions ('+'→'-', '/'→'_') of the reference's regex chain
    assert(PayloadEncoders.gmailRawMessage(
      "bob@example.com", "Répondez s'il vous plaît ✓", "Emoji 🚀 body & <html> ~tilde~") ==
      "VG86IGJvYkBleGFtcGxlLmNvbQ0KU3ViamVjdDogUsOpcG9uZGV6IHMnaWwgdm91cyBwbGHDrnQg4pyTDQoNCkVtb2ppIPCfmoAgYm9keSAmIDxodG1sPiB-dGlsZGV-")
    // empty subject/body still emit the full header block
    assert(PayloadEncoders.gmailRawMessage("c@d.e", "", "") ==
      "VG86IGNAZC5lDQpTdWJqZWN0OiANCg0K")
    // a payload whose standard base64 ends in '=' padding: must be stripped
    assert(PayloadEncoders.gmailRawMessage("x@y.z", "subject with spaces", "exact padding test ab") ==
      "VG86IHhAeS56DQpTdWJqZWN0OiBzdWJqZWN0IHdpdGggc3BhY2VzDQoNCmV4YWN0IHBhZGRpbmcgdGVzdCBhYg")
  }

  test("stripe form encoding: bracket expansion, JS number strings, null skips (reference vectors)") {
    // nested array-of-objects + metadata map + null leaf — the adapter's
    // canonical price-with-tiers shape
    assert(PayloadEncoders.stripeFormEncode(Seq(
      "name" -> "Gold Plan",
      "active" -> true,
      "amount" -> 1999,
      "tiers" -> Seq(
        Map("up_to" -> 5, "unit_amount" -> 100),
        Map("up_to" -> "inf", "unit_amount" -> 75.5)),
      "metadata" -> Map("env" -> "prod", "note" -> "a&b=c d"),
      "nothing" -> null)) ==
      "name=Gold+Plan&active=true&amount=1999&tiers%5B0%5D%5Bup_to%5D=5&tiers%5B0%5D%5Bunit_amount%5D=100&tiers%5B1%5D%5Bup_to%5D=inf&tiers%5B1%5D%5Bunit_amount%5D=75.5&metadata%5Benv%5D=prod&metadata%5Bnote%5D=a%26b%3Dc+d")
    // WHATWG component encoding: space→'+', '~'→%7E, '*'/'-'/'.'/'_' kept,
    // multi-byte UTF-8 percent-encoded uppercase; deep nesting brackets
    assert(PayloadEncoders.stripeFormEncode(Seq(
      "description" -> "Ünïcode ✓ 100% + plus/slash",
      "nested" -> Map("deep" -> Map("list" -> Seq("x y", "~*-._"))),
      "flag" -> false,
      "zero" -> 0)) ==
      "description=%C3%9Cn%C3%AFcode+%E2%9C%93+100%25+%2B+plus%2Fslash&nested%5Bdeep%5D%5Blist%5D%5B0%5D=x+y&nested%5Bdeep%5D%5Blist%5D%5B1%5D=%7E*-._&flag=false&zero=0")
    // empty containers vanish; empty string survives; negative double
    assert(PayloadEncoders.stripeFormEncode(Seq(
      "empty_obj" -> Map.empty[String, Any],
      "empty_arr" -> Seq.empty[Any],
      "s" -> "",
      "neg" -> -12.5)) == "s=&neg=-12.5")
  }

  test("jsDoubleString matches Node String(number) across the ECMA notation thresholds") {
    // every expected string below is Node's String(v) output, verbatim
    val vectors = Seq[(Double, String)](
      1999.0 -> "1999", 75.5 -> "75.5", -12.5 -> "-12.5", 0.0 -> "0", -0.0 -> "0",
      12345678.5 -> "12345678.5",     // Java would print 1.23456785E7
      1e7 -> "10000000", 0.1 -> "0.1", 123.456 -> "123.456",
      1e-4 -> "0.0001",               // Java would print 1.0E-4
      0.000001234 -> "0.000001234", -0.000001 -> "-0.000001",
      1e-7 -> "1e-7", 1.5e-7 -> "1.5e-7", 5e-7 -> "5e-7",
      1e19 -> "10000000000000000000", // toLong would saturate here
      1.2345678901234567e19 -> "12345678901234567000",
      9007199254740993.0 -> "9007199254740992",
      1e21 -> "1e+21", 1.5e22 -> "1.5e+22")
    for ((v, want) <- vectors)
      assert(PayloadEncoders.jsDoubleString(v) == want,
        s"String($v): got ${PayloadEncoders.jsDoubleString(v)}, want $want")
  }

  test("decimal and float columns encode like JS numbers, not like their Java toString") {
    // DecimalType scale must not leak ("1999.00" would diverge from the
    // reference's String(1999) and Stripe's integer-cents contract)
    assert(PayloadEncoders.stripeFormEncode(Seq(
      "amount" -> new java.math.BigDecimal("1999.00"),
      "rate" -> new java.math.BigDecimal("0.0750"),
      "f" -> 0.1f)) == "amount=1999&rate=0.075&f=0.1")
  }

  test("stripe form encoding over a Spark Row: struct fields in schema order, arrays by index") {
    val tierType = StructType(Seq(
      StructField("up_to", IntegerType), StructField("unit_amount", IntegerType)))
    val schema = StructType(Seq(
      StructField("name", StringType),
      StructField("amount", IntegerType),
      StructField("tiers", ArrayType(tierType)),
      StructField("note", StringType)))
    val row: Row = new GenericRowWithSchema(Array[Any](
      "Gold Plan", 1999,
      Seq(
        new GenericRowWithSchema(Array[Any](5, 100), tierType),
        new GenericRowWithSchema(Array[Any](null, 75), tierType)),
      null), schema)
    // null leaf inside the struct and the null top-level column both skip
    assert(PayloadEncoders.stripeFormEncode(row) ==
      "name=Gold+Plan&amount=1999&tiers%5B0%5D%5Bup_to%5D=5&tiers%5B0%5D%5Bunit_amount%5D=100&tiers%5B1%5D%5Bunit_amount%5D=75")
  }

  test("gmail upload sink: one encoded POST per row through the retrying batcher") {
    import spark.implicits._
    PayloadEncoderSpec.posted.clear()
    val df = Seq(
      ("alice@example.com", "Hello", "Line one\nLine two"),
      ("c@d.e", "", "")).toDF("to", "subject", "body").repartition(1)
    Sinks.gmailUploadSink(df)(raw => PayloadEncoderSpec.posted.add(raw))
    val sent = PayloadEncoderSpec.posted.toArray.map(_.toString).toSet
    assert(sent == Set(
      "VG86IGFsaWNlQGV4YW1wbGUuY29tDQpTdWJqZWN0OiBIZWxsbw0KDQpMaW5lIG9uZQpMaW5lIHR3bw",
      "VG86IGNAZC5lDQpTdWJqZWN0OiANCg0K"))
  }

  test("stripe upload sink: form-encoded body per row, nested struct from a real DataFrame") {
    import spark.implicits._
    PayloadEncoderSpec.posted.clear()
    val df = Seq((("prod", "a&b=c d"), "Gold Plan", 1999))
      .toDF("metadata", "name", "amount")
      .selectExpr("name", "amount", "named_struct('env', metadata._1, 'note', metadata._2) AS metadata")
    Sinks.stripeUploadSink(df)(body => PayloadEncoderSpec.posted.add(body))
    assert(PayloadEncoderSpec.posted.toArray.map(_.toString).toSeq ==
      Seq("name=Gold+Plan&amount=1999&metadata%5Benv%5D=prod&metadata%5Bnote%5D=a%26b%3Dc+d"))
  }

  // ---- JSON envelope encoders (HubSpot / Zoho / Xero / GitHub K4) ----

  private def mkRow(fields: (String, Any)*): Row = {
    val schema = StructType(fields.map { case (n, v) =>
      StructField(n, v match {
        case _: String  => StringType
        case _: Int     => IntegerType
        case _: Long    => LongType
        case _: Double  => DoubleType
        case _: Boolean => BooleanType
        case _          => StringType
      }, nullable = true)
    })
    new GenericRowWithSchema(fields.map(_._2).toArray, schema)
  }

  test("hubspot batch body: {inputs: [...]} with JSON.stringify escapes and JS numbers") {
    val rows = Seq(
      mkRow("email" -> "a@b.c", "firstname" -> "Ann", "score" -> 42),
      mkRow("email" -> "d@e.f", "firstname" -> "Bo \"Bob\"\nJr", "score" -> 7))
    assert(PayloadEncoders.hubspotBatchBody(rows) ==
      """{"inputs":[{"email":"a@b.c","firstname":"Ann","score":42},""" +
      """{"email":"d@e.f","firstname":"Bo \"Bob\"\nJr","score":7}]}""")
    // null property is KEPT as JSON null (stringify drops only undefined);
    // doubles print in ECMA notation (no trailing .0); unicode passes raw
    assert(PayloadEncoders.hubspotBatchBody(Seq(
      mkRow("name" -> null, "amount" -> 19.0, "note" -> "✓ 100%"))) ==
      """{"inputs":[{"name":null,"amount":19,"note":"✓ 100%"}]}""")
    assert(PayloadEncoders.hubspotBatchBody(Nil) == """{"inputs":[]}""")
    // non-finite doubles render as null, exactly as JSON.stringify does
    // (bare NaN/Infinity would not even be valid JSON)
    assert(PayloadEncoders.hubspotBatchBody(Seq(
      mkRow("a" -> Double.NaN, "b" -> Double.PositiveInfinity,
        "c" -> Double.NegativeInfinity, "d" -> Float.NaN, "e" -> 1.5))) ==
      """{"inputs":[{"a":null,"b":null,"c":null,"d":null,"e":1.5}]}""")
  }

  test("zoho batch body: {data: [...]} and the 100-item POST-route cap") {
    assert(PayloadEncoders.zohoBatchBody("Leads",
      Seq(mkRow("Last_Name" -> "Ng", "Company" -> "Acme"))) ==
      """{"data":[{"Last_Name":"Ng","Company":"Acme"}]}""")
    val cap = intercept[IllegalArgumentException] {
      PayloadEncoders.zohoBatchBody("Leads",
        (1 to 101).map(i => mkRow("Last_Name" -> s"n$i")))
    }
    assert(cap.getMessage ==
      "Number of items per page (101), exceeds the maximum number allowed " +
        "for the Leads endpoint of the Zoho adapter (100)")
    // exactly at the cap is legal
    assert(PayloadEncoders.zohoBatchBody("Leads",
      (1 to 100).map(i => mkRow("Last_Name" -> s"n$i"))).startsWith("""{"data":["""))
  }

  test("xero batch body: envelope key is the path's resource segment") {
    assert(PayloadEncoders.xeroBatchBody("/Invoices",
      Seq(mkRow("Type" -> "ACCREC", "Total" -> 250.5))) ==
      """{"Invoices":[{"Type":"ACCREC","Total":250.5}]}""")
    // deeper path still takes segment [1], as path.split('/')[1] does
    assert(PayloadEncoders.xeroBatchBody("/Contacts/{ContactID}",
      Seq(mkRow("Name" -> "Acme"))) == """{"Contacts":[{"Name":"Acme"}]}""")
    intercept[IllegalArgumentException] {
      PayloadEncoders.xeroBatchBody("", Seq(mkRow("Name" -> "x")))
    }
  }

  test("github issue body: title must be a non-empty string, item posts bare") {
    assert(PayloadEncoders.githubIssueBody(
      mkRow("title" -> "Crash on load", "body" -> "steps…", "labels" -> null)) ==
      """{"title":"Crash on load","body":"steps…","labels":null}""")
    // the reference's falsy/type check: absent, empty (falsy), non-string
    val missing = intercept[IllegalArgumentException] {
      PayloadEncoders.githubIssueBody(mkRow("body" -> "no title"))
    }
    assert(missing.getMessage == "Each upload item must have a 'title' string field")
    intercept[IllegalArgumentException] {
      PayloadEncoders.githubIssueBody(mkRow("title" -> "", "body" -> "b"))
    }
    intercept[IllegalArgumentException] {
      PayloadEncoders.githubIssueBody(mkRow("title" -> 42, "body" -> "b"))
    }
  }
}

object PayloadEncoderSpec {
  // local-mode test: executors share the JVM, so a static collector sees
  // every send (same pattern as PipelineRunnerSpec.attempts)
  val posted = new java.util.concurrent.ConcurrentLinkedQueue[String]()
}
