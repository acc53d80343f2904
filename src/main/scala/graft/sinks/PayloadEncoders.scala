package graft.sinks

import java.net.URLEncoder
import java.nio.charset.StandardCharsets
import java.util.Base64
import org.apache.spark.sql.Row
import scala.collection.mutable.ArrayBuffer

/** Per-service upload payload encoders (SURVEY §2.1 K4) — the byte-level
  * encodings the reference's Gmail and Stripe adapters apply to each
  * upload item before the HTTP POST. These are pure functions of the row:
  * the transport (`Sinks.foreachBatchSink`'s send hook) stays generic,
  * and the encodings are golden-tested against vectors produced by the
  * reference's own logic.
  *
  *  - Gmail (adapters/gmail/src/index.ts:326-330): an RFC-2822-shaped
  *    `To:`/`Subject:` header block + blank line + body, UTF-8 encoded,
  *    then base64url WITHOUT padding (standard base64 with `+`→`-`,
  *    `/`→`_`, trailing `=` stripped — exactly the reference's regex
  *    chain, not RFC 4648 §5 directly).
  *  - Stripe (adapters/stripe/src/index.ts:197-217 `appendObject`,
  *    434-478 upload): `application/x-www-form-urlencoded` with
  *    Rails/Stripe bracket expansion — arrays become `k[0]`, `k[1]`…,
  *    nested objects `k[sub]`, recursively; null/undefined leaves are
  *    skipped; scalars are stringified with JavaScript `String(...)`
  *    semantics (integral doubles print with no decimal point). Both
  *    keys and values are percent-encoded by the WHATWG urlencoded
  *    serializer, which `URLEncoder.encode(…, UTF-8)` matches
  *    byte-for-byte (space→`+`, alnum and `*-._` kept, uppercase hex).
  */
object PayloadEncoders {

  /** Base64url without padding, via the reference's exact substitution
    * chain (gmail/src/index.ts:329-330). */
  def base64Url(bytes: Array[Byte]): String =
    Base64.getEncoder.encodeToString(bytes)
      .replace('+', '-').replace('/', '_').replaceAll("=+$", "")

  /** The Gmail `raw` message field for one (to, subject, body) item
    * (gmail/src/index.ts:326-330). */
  def gmailRawMessage(to: String, subject: String, body: String): String =
    base64Url(s"To: $to\r\nSubject: $subject\r\n\r\n$body"
      .getBytes(StandardCharsets.UTF_8))

  /** WHATWG urlencoded-serializer component encoding (= what
    * `URLSearchParams.toString()` applies to each key and value). */
  private def component(s: String): String = URLEncoder.encode(s, "UTF-8")

  def formUrlEncode(pairs: Seq[(String, String)]): String =
    pairs.map { case (k, v) => s"${component(k)}=${component(v)}" }.mkString("&")

  /** JavaScript `String(double)` per ECMA-262 Number::toString: the
    * shortest round-trip digit string, plain decimal for exponents in
    * (-7, 21], exponent notation (`1e+21`, `5e-7`) outside. Java's
    * `Double.toString` produces the same shortest digits but flips to
    * scientific notation at 1e7/1e-3 — this reformats those digits to
    * the JS thresholds, so `String(12345678.5)` is "12345678.5" (not
    * "1.23456785E7") and `String(1e19)` is the full 20-digit integer
    * (no `toLong` saturation). Golden-tested against Node `String()`. */
  private[graft] def jsDoubleString(d: Double): String = {
    if (d == 0.0) return "0" // JS String(-0) is "0"
    if (d.isNaN || d.isInfinite) return d.toString // "NaN"/"Infinity" match JS
    val neg = d < 0
    val s = math.abs(d).toString
    val (mant, e10) = s.indexOf('E') match {
      case -1 => (s, 0)
      case i  => (s.substring(0, i), s.substring(i + 1).toInt)
    }
    val dot = mant.indexOf('.')
    val digitsRaw = mant.replace(".", "")
    val intLen = if (dot == -1) mant.length else dot
    val lead = digitsRaw.indexWhere(_ != '0')
    val digits = digitsRaw.substring(lead).reverse.dropWhile(_ == '0').reverse
    val n = intLen - lead + e10 // value = 0.<digits> × 10^n
    val k = digits.length
    val core =
      if (n >= 1 && n <= 21) {
        if (k <= n) digits + "0" * (n - k)
        else digits.substring(0, n) + "." + digits.substring(n)
      } else if (n >= -5 && n <= 0) {
        "0." + "0" * (-n) + digits
      } else {
        val exp = n - 1
        val m = if (k == 1) digits else digits.substring(0, 1) + "." + digits.substring(1)
        m + "e" + (if (exp >= 0) "+" + exp.toString else exp.toString)
      }
    if (neg) "-" + core else core
  }

  /** JS `String(number)` for the numeric types a form item can carry.
    * Floats go through their shortest float repr first (so 0.1f encodes
    * "0.1", not the raw widening 0.100000001…); DecimalType values strip
    * trailing scale zeros (a DecimalType(10,2) 1999 encodes "1999", not
    * "1999.00" — JSON numbers carry no scale). */
  private def jsNumberString(v: Any): String = v match {
    case d: Double => jsDoubleString(d)
    case f: Float  => jsDoubleString(f.toString.toDouble)
    case bd: java.math.BigDecimal => bd.stripTrailingZeros.toPlainString
    case other => other.toString
  }

  /** Flatten one upload item to ordered (bracketed-key, value) pairs,
    * mirroring the reference's type dispatch: the TOP level appends only
    * strings/numbers/booleans and recurses into objects
    * (stripe/src/index.ts:448-456); NESTED levels also stringify any
    * other non-null scalar (`String(propertyValue)`, index.ts:213-215).
    * Null leaves are skipped at every level; empty containers contribute
    * nothing. Scala carriers for "object": Row (schema order — the
    * carrier to prefer, always deterministic), Seq/Array (by index), Map
    * (its iteration order; `Object.entries` insertion order holds for
    * Scala's specialized ≤4-entry Maps and for `ListMap` — pass a
    * `ListMap` or a Row when an object has more than 4 keys and key
    * order must match the reference byte-for-byte, since a general
    * immutable HashMap does not iterate in insertion order). */
  def stripeFormPairs(item: Seq[(String, Any)]): Seq[(String, String)] = {
    val out = ArrayBuffer.empty[(String, String)]
    def appendNested(name: String, v: Any): Unit = v match {
      case null => ()
      case seq: Seq[_]      => seq.zipWithIndex.foreach { case (x, i) => appendNested(s"$name[$i]", x) }
      case arr: Array[_]    => arr.zipWithIndex.foreach { case (x, i) => appendNested(s"$name[$i]", x) }
      case m: Map[_, _]     => m.foreach { case (k, x) => appendNested(s"$name[$k]", x) }
      case r: Row =>
        r.schema.fieldNames.zipWithIndex.foreach { case (f, i) => appendNested(s"$name[$f]", r.get(i)) }
      case n @ (_: Double | _: Float | _: java.math.BigDecimal) => out += name -> jsNumberString(n)
      case other            => out += name -> other.toString
    }
    item.foreach {
      case (_, null) => ()
      case (k, v: String) => out += k -> v
      case (k, n @ (_: Int | _: Long | _: Short | _: Byte | _: Double | _: Float | _: java.math.BigDecimal)) =>
        out += k -> jsNumberString(n)
      case (k, b: Boolean) => out += k -> b.toString
      case (k, obj @ (_: Seq[_] | _: Array[_] | _: Map[_, _] | _: Row)) => appendNested(k, obj)
      case _ => () // non-encodable top-level type: skipped, as JS typeof dispatch does
    }
    out.toSeq
  }

  /** One upload item → the POST body string the Stripe adapter sends. */
  def stripeFormEncode(item: Seq[(String, Any)]): String =
    formUrlEncode(stripeFormPairs(item))

  /** A DataFrame row as an upload item: field order is schema order,
    * nested structs/arrays/maps recurse via [[stripeFormPairs]]. */
  def stripeFormEncode(row: Row): String =
    stripeFormEncode(row.schema.fieldNames.toSeq.map(f => f -> row.get(row.fieldIndex(f))))

  // ---- JSON envelope encoders (the remaining K4 wrappers) -------------
  //
  // HubSpot, Zoho, and Xero POST their whole upload batch as one JSON
  // body whose single envelope key wraps the item array; GitHub POSTs
  // each item bare but validates a `title` string first. The JSON itself
  // is what `JSON.stringify` (axios's serializer) produces: object keys
  // in insertion order (= Row schema order here), doubles in ECMA
  // Number::toString notation, strings with the stringify escape set
  // (`"` `\` and C0 controls only — `/` and non-ASCII pass through).

  /** JSON string literal with `JSON.stringify`'s exact escape set. */
  private[graft] def jsonQuote(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"'  => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\b' => sb.append("\\b")
      case '\f' => sb.append("\\f")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
      case c    => sb.append(c)
    }
    sb.append('"').toString
  }

  /** One value as `JSON.stringify` renders it. Rows serialize as objects
    * in schema order (the deterministic carrier); Seq/Array as arrays;
    * Map in iteration order (pass `ListMap` when key order matters,
    * same caveat as [[stripeFormPairs]]). Null renders as JSON null —
    * stringify keeps null properties and drops only `undefined`, which
    * has no Scala carrier here. Non-finite doubles render as `null`,
    * exactly as `JSON.stringify(NaN)` / `stringify(Infinity)` do —
    * bare `NaN` in the body would not even be valid JSON. */
  private[graft] def jsonValue(v: Any): String = v match {
    case null            => "null"
    case d: Double if d.isNaN || d.isInfinite => "null"
    case f: Float  if f.isNaN || f.isInfinite => "null"
    case s: String       => jsonQuote(s)
    case b: Boolean      => b.toString
    case n @ (_: Double | _: Float | _: java.math.BigDecimal) => jsNumberString(n)
    case n @ (_: Int | _: Long | _: Short | _: Byte) => n.toString
    case seq: Seq[_]     => seq.map(jsonValue).mkString("[", ",", "]")
    case arr: Array[_]   => arr.map(jsonValue).mkString("[", ",", "]")
    case m: Map[_, _]    =>
      m.map { case (k, x) => s"${jsonQuote(k.toString)}:${jsonValue(x)}" }
        .mkString("{", ",", "}")
    case r: Row =>
      r.schema.fieldNames.zipWithIndex
        .map { case (f, i) => s"${jsonQuote(f)}:${jsonValue(r.get(i))}" }
        .mkString("{", ",", "}")
    case other           => jsonQuote(other.toString)
  }

  /** HubSpot batch-create body: `{"inputs": [...items]}` — the whole
    * upload batch in one POST (hubspot/src/index.ts:532-537). */
  def hubspotBatchBody(items: Seq[Row]): String =
    s"""{"inputs":${items.map(jsonValue).mkString("[", ",", "]")}}"""

  /** Zoho create body: `{"data": [...items]}`, rejecting batches over
    * the POST-route page cap BEFORE any bytes go out, with the
    * reference's message shape (zoho/src/index.ts:481-483, cap = 100 at
    * index.ts:14). */
  def zohoBatchBody(endpointId: String, items: Seq[Row],
      maxItemsPerPage: Int = 100): String = {
    if (items.length > maxItemsPerPage)
      throw new IllegalArgumentException(
        s"Number of items per page (${items.length}), exceeds the maximum " +
          s"number allowed for the $endpointId endpoint of the Zoho adapter " +
          s"($maxItemsPerPage)")
    s"""{"data":${items.map(jsonValue).mkString("[", ",", "]")}}"""
  }

  /** Xero body: the envelope key is the RESOURCE SEGMENT of the endpoint
    * path — `path.split('/')[1]`, so "/Invoices" wraps as
    * `{"Invoices": [...]}` (xero/src/index.ts:408-411). */
  def xeroBatchBody(endpointPath: String, items: Seq[Row]): String = {
    val resource = endpointPath.split('/').lift(1).getOrElse(
      throw new IllegalArgumentException(
        s"Xero endpoint path '$endpointPath' has no resource segment"))
    s"""{${jsonQuote(resource)}:${items.map(jsonValue).mkString("[", ",", "]")}}"""
  }

  /** GitHub issue-create item: each row POSTs individually after the
    * reference's validation — a falsy or non-string `title` (absent
    * field, null, empty string) fails the whole upload
    * (github/src/index.ts:226-228). */
  def githubIssueBody(item: Row): String = {
    val ok = item.schema.fieldNames.contains("title") && {
      item.getAs[Any]("title") match {
        case s: String => s.nonEmpty // JS: "" is falsy
        case _         => false
      }
    }
    if (!ok) throw new IllegalArgumentException(
      "Each upload item must have a 'title' string field")
    jsonValue(item)
  }
}
