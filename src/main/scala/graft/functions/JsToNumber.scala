package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the reference's `toNumber` transform —
  * JS `parseFloat(String(v)) || 0` (reference src/utils/transform.ts:
  * 127-137): longest numeric prefix after leading whitespace, else 0;
  * NaN and -0 also collapse to 0 via `|| 0`.
  *
  * This is tier (b) of the custom-operator preference order (custom
  * Expression with doGenCode beats a Scala UDF): the parse runs inside
  * whole-stage codegen with no boxing or Row round-trip, unlike the
  * regexp_extract composition in Transforms.toNumber (kept for the
  * declarative transform path) or a UDF.
  */
case class JsToNumber(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"js_to_number expects STRING, got ${child.dataType.sql}")
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def prettyName: String = "js_to_number"
  override protected def withNewChildInternal(newChild: Expression): JsToNumber =
    copy(child = newChild)

  // null input → 0 (JS: parseFloat(String(null)) -> NaN -> || 0)
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0.0
    else JsToNumber.parse(v.asInstanceOf[UTF8String].toString)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val c = child.genCode(ctx)
    ev.copy(
      code =
        code"""
          ${c.code}
          double ${ev.value} = ${c.isNull} ? 0.0 :
            graft.functions.JsToNumber.parse(${c.value}.toString());
        """,
      isNull = FalseLiteral)
  }
}

object JsToNumber {
  /** The JS parseFloat prefix-parse, shared by interpreted eval and
    * generated code.
    */
  def parse(s: String): Double = {
    var i = 0
    val n = s.length
    while (i < n && (s.charAt(i) == ' ' || s.charAt(i) == '\t' || s.charAt(i) == '\n' ||
      s.charAt(i) == '\r' || s.charAt(i) == '\f' || s.charAt(i) == '\u000b')) i += 1
    val start = i
    if (i < n && (s.charAt(i) == '+' || s.charAt(i) == '-')) i += 1
    var digits = false
    while (i < n && s.charAt(i).isDigit) { i += 1; digits = true }
    if (i < n && s.charAt(i) == '.') {
      i += 1
      while (i < n && s.charAt(i).isDigit) { i += 1; digits = true }
    }
    if (!digits) return 0.0
    // optional exponent — only if well-formed
    if (i < n && (s.charAt(i) == 'e' || s.charAt(i) == 'E')) {
      var j = i + 1
      if (j < n && (s.charAt(j) == '+' || s.charAt(j) == '-')) j += 1
      var expDigits = false
      while (j < n && s.charAt(j).isDigit) { j += 1; expDigits = true }
      if (expDigits) i = j
    }
    val d = java.lang.Double.parseDouble(s.substring(start, i))
    if (d.isNaN || d == 0.0) 0.0 else d // JS `|| 0`
  }
}
