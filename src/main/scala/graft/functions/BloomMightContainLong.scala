package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst bloom-filter probe for `Joins.bloomPrefilteredSemiJoin`
  * — `mightContainLong` inside whole-stage codegen instead of the boxed
  * Scala UDF it replaces (`udf((k: java.lang.Long) => ...)`), which paid
  * Long boxing + a lambda dispatch per probe row and, worse, put a
  * non-codegen ScalaUDF node in the middle of the fact-side scan stage.
  *
  * The filter rides a [[Broadcast]] (one copy per executor, not one per
  * task): the expression holds the broadcast handle; generated code
  * resolves `value()` ONCE into a mutable-state field at stage init and
  * probes a plain field thereafter. Null keys yield null (a filter drops
  * them — same outcome as the old UDF's `false`).
  *
  * Not registered in the function registry: the broadcast handle is a
  * constructor argument, not an Expression child, so SQL-text access
  * doesn't apply — use [[BloomMightContainLong.probe]] from the Column
  * API.
  */
case class BloomMightContainLong(bloom: Broadcast[BloomFilter], child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_might_contain expects BIGINT key, got ${child.dataType.sql}")
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_might_contain"
  override protected def withNewChildInternal(newChild: Expression): BloomMightContainLong =
    copy(child = newChild)

  override protected def nullSafeEval(input: Any): Any =
    bloom.value.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("graftBloomBc", bloom,
      classOf[Broadcast[BloomFilter]].getName)
    val filterVar = ctx.addMutableState(classOf[BloomFilter].getName, "graftBloom",
      v => s"$v = (${classOf[BloomFilter].getName}) $bcRef.value();")
    defineCodeGen(ctx, ev, c => s"$filterVar.mightContainLong($c)")
  }
}

object BloomMightContainLong {
  /** Column-API entry point. */
  def probe(bloom: Broadcast[BloomFilter],
            key: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.GraftPlanShim.column(
      BloomMightContainLong(bloom,
        org.apache.spark.sql.graft.GraftPlanShim.expression(key)))
}
