package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst twin of `Dedup.hex60` — parse the first 15 hex digits
  * of an md5 hex string into a 60-bit non-negative long, in one byte
  * loop inside whole-stage codegen.
  *
  * This is the single most-executed expression in the dedup tier: it
  * runs once per (doc, shingle) row in MinHash, SimHash and n-gram
  * Jaccard — O(total tokens) in the corpus, billions of rows at 100 TB.
  * The portable Column composition it replaces (15 × substring + instr +
  * cast + multiply, `ops/Dedup.scala:58-61`) allocates 30 UTF8Strings
  * per row; this reads 15 bytes. Semantics are IDENTICAL for md5 output
  * (lowercase hex), so the DuckDB oracles are unchanged — `Hex60Spec`
  * pins the equivalence on random md5s.
  */
case class Hex60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_hex60 expects STRING (md5 hex), got ${child.dataType.sql}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hex60"
  override protected def withNewChildInternal(newChild: Expression): Hex60 =
    copy(child = newChild)

  override protected def nullSafeEval(input: Any): Any =
    Hex60.parse(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Hex60.parse($c)")
}

object Hex60 {
  /** Shared by interpreted eval and generated code. Hex digits beyond
    * [0-9a-f] follow the composition's instr()-1 arithmetic so even
    * malformed input agrees between the two implementations.
    */
  def parse(s: UTF8String): Long = {
    var acc = 0L
    var i = 0
    val n = s.numBytes()
    while (i < 15) {
      val d =
        if (i >= n) 0 // substring past end → "" ; instr(x, "") = 1 → digit 0
        else {
          val b: Int = s.getByte(i) & 0xff
          if (b >= '0' && b <= '9') b - '0'
          else if (b >= 'a' && b <= 'f') b - 'a' + 10
          else -1 // instr miss → -1, matching hexDigitAt
        }
      acc = acc * 16 + d
      i += 1
    }
    acc
  }
}
