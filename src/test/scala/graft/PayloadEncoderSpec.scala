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
}

object PayloadEncoderSpec {
  // local-mode test: executors share the JVM, so a static collector sees
  // every send (same pattern as PipelineRunnerSpec.attempts)
  val posted = new java.util.concurrent.ConcurrentLinkedQueue[String]()
}
