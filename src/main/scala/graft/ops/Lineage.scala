package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Expression, ExprId, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Column-level lineage, derived from the ANALYZED logical plan — the
  * governance capability a 100 TB warehouse needs before it can answer
  * "which source columns feed this report column" (impact analysis,
  * PII propagation audits, minimal re-backfills).
  *
  * Because graft declares every operator as a Catalyst plan (the whole
  * point of the Spark-first design), lineage needs no side bookkeeping:
  * one walk over `df.queryExecution.analyzed` resolves each output
  * attribute to the set of (source table, source column) leaves it
  * transitively references. The walk is pure plan metadata — it runs on
  * the driver in O(plan size), touches zero data, and therefore costs
  * the same at sf0.001 and at 100 TB.
  *
  * Resolution rules: a named projection/aggregate/window expression
  * maps to the union of its referenced attributes' origins; generators
  * (explode etc.) map their generated attributes to the generator's
  * inputs; Union merges origins positionally; every other node passes
  * its children's attribute map through unchanged. Leaves are file
  * relations, named by the scan path's basename (`.../orders.parquet`
  * → `orders`) — the same naming the oracle tables use.
  */
object Lineage {

  private type Origins = Map[ExprId, Set[(String, String)]]

  /** (output column, source table, source column) triples for every
    * output column of `df`, sorted for deterministic presentation.
    * An output with no file-relation ancestry (pure literal) yields no
    * rows — it has no lineage by definition.
    */
  def columnLineage(df: DataFrame): Seq[(String, String, String)] = {
    val plan = df.queryExecution.analyzed
    val m = build(plan)
    plan.output.flatMap { a =>
      m.getOrElse(a.exprId, Set.empty).toSeq.map { case (t, c) => (a.name, t, c) }
    }.sorted
  }

  /** [[columnLineage]] annotated against a declared sensitive-column
    * set: every (output, source) edge flagged `is_pii` when the source
    * leaf is in `pii`. An output column is PII-tainted iff ANY of its
    * edges is — the propagation audit that decides what a derived
    * report is allowed to ship.
    */
  def piiFlow(df: DataFrame, pii: Set[(String, String)]): Seq[(String, String, String, Boolean)] =
    columnLineage(df).map { case (out, t, c) => (out, t, c, pii((t, c))) }

  private def build(plan: LogicalPlan): Origins = plan match {
    case lr: LogicalRelation =>
      val table = lr.relation match {
        case h: HadoopFsRelation =>
          h.location.rootPaths.headOption
            .map(_.getName.stripSuffix(".parquet"))
            .getOrElse("<relation>")
        case other => other.getClass.getSimpleName
      }
      lr.output.map(a => a.exprId -> Set(table -> a.name)).toMap
    case p: Project =>
      withNamed(merged(p.children), p.projectList)
    case a: Aggregate =>
      withNamed(merged(a.children), a.aggregateExpressions)
    case w: Window =>
      withNamed(merged(w.children), w.windowExpressions)
    case g: Generate =>
      val c = merged(g.children)
      c ++ g.generatorOutput.map(a => a.exprId -> refs(g.generator, c)).toMap
    case u: Union =>
      val childMaps = u.children.map(build)
      val positional = u.output.zipWithIndex.map { case (a, i) =>
        a.exprId -> u.children.zip(childMaps)
          .map { case (ch, m) => m.getOrElse(ch.output(i).exprId, Set.empty[(String, String)]) }
          .reduce(_ ++ _)
      }.toMap
      // positional LAST: Union reuses the first child's exprIds for its
      // own output, so the first child's (single-branch) entry must not
      // shadow the merged cross-branch origins
      childMaps.foldLeft(Map.empty: Origins)(_ ++ _) ++ positional
    case other =>
      merged(other.children)
  }

  private def withNamed(c: Origins, exprs: Seq[NamedExpression]): Origins =
    c ++ exprs.map(ne => ne.toAttribute.exprId -> refs(ne, c)).toMap

  private def refs(e: Expression, c: Origins): Set[(String, String)] =
    e.references.toSeq.flatMap(a => c.getOrElse(a.exprId, Set.empty[(String, String)])).toSet

  private def merged(children: Seq[LogicalPlan]): Origins =
    children.map(build).foldLeft(Map.empty: Origins)(_ ++ _)
}
