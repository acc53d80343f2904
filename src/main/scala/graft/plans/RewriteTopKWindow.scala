package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, IntegerLiteral, LessThan, LessThanOrEqual, RowNumber, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: the idiomatic per-key top-k pattern
  *
  *   Project(cols without rn,
  *     Filter(rn <= k,
  *       Window([row_number() as rn], partitionBy ps, orderBy os)))
  *
  * is rewritten to `TopKPerKeyPlan(ps, os, k, child)` — swapping the
  * full-shuffle + per-partition-sort window plan for the partial/final
  * bounded-heap operator (see TopKPerKey scaladoc for the cost model).
  *
  * Fires only when provably safe:
  *  - the Window computes exactly ONE expression and it is row_number
  *    (rank/dense_rank admit >k rows on ties — different semantics);
  *  - the filter is `rn <= lit` or `rn < lit` on that attribute;
  *  - the projection DROPS rn (TopKPerKey emits no rank column);
  *  - the partition spec is non-empty (global top-k already plans as
  *    TakeOrderedAndProject, which is better).
  *
  * Tie behavior matches: row_number breaks orderSpec ties arbitrarily,
  * and the heap keeps an arbitrary k among order-equal rows — identical
  * result sets whenever the caller's orderSpec is total, identical
  * nondeterminism class when it is not.
  */
object RewriteTopKWindow extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(projectList, Filter(cond, w: Window))
        if w.partitionSpec.nonEmpty && w.windowExpressions.size == 1 =>
      val rewrite = for {
        alias <- w.windowExpressions.head match {
          case a @ Alias(WindowExpression(RowNumber(), _), _) => Some(a)
          case _ => None
        }
        rn = alias.toAttribute
        k <- cond match {
          case LessThanOrEqual(a: AttributeReference, IntegerLiteral(v))
            if a.semanticEquals(rn) => Some(v)
          case LessThan(a: AttributeReference, IntegerLiteral(v))
            if a.semanticEquals(rn) => Some(v - 1)
          case _ => None
        }
        if k > 0 && !projectList.exists(_.references.contains(rn))
      } yield Project(projectList,
        TopKPerKeyPlan(w.partitionSpec, w.orderSpec, k, w.child))
      rewrite.getOrElse(p)
  }
}
