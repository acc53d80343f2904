package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Cast, Coalesce, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ByteType, DoubleType, IntegerType, LongType, ShortType, StringType}

/** Optimizer rule: `js_to_number(CAST(intCol AS STRING))` ≡
  * `COALESCE(CAST(intCol AS DOUBLE), 0.0)` — drop the string round-trip.
  *
  * Sound only for integral children: an integral's string form always
  * parses fully and `|| 0` maps 0 to 0 exactly. (Floating children are
  * NOT rewritten: parseFloat(String(-0.0)) || 0 is 0.0 but a direct
  * cast keeps -0.0.) The COALESCE preserves JsToNumber's null contract —
  * JS parseFloat(null-ish) || 0 yields 0.0 and the result is
  * non-nullable, whereas a bare cast would propagate NULL and flip
  * nullability. For non-nullable children the optimizer folds the
  * COALESCE away. This is the pattern the reference's pipelines hit
  * constantly — `toNumber` applied to stringified numeric fields — and
  * the rewrite turns a per-row string format+parse into a no-op cast
  * inside codegen.
  */
object SimplifyJsToNumber extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case JsToNumber(c @ Cast(child, StringType, _, _))
          if Seq(ByteType, ShortType, IntegerType, LongType).contains(child.dataType) =>
        if (child.nullable) Coalesce(Seq(Cast(child, DoubleType), Literal(0.0)))
        else Cast(child, DoubleType)
    }
}
