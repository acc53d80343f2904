package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Row-level security + column masking, compiled into the plan — the
  * access-control member of the privacy tier (k-anonymity measures
  * risk, [[Pseudonym]] protects keys, [[DpRelease]] protects released
  * aggregates; this enforces WHO SEES WHICH ROWS/COLUMNS).
  *
  * A policy is DATA (role, row predicate, masked columns) — the
  * Constraints-engine pattern — and enforcement is a plain Catalyst
  * rewrite: the predicate becomes a `filter` (so it participates in
  * predicate pushdown and reaches the parquet scan like any user
  * filter — enforced-at-the-source, not post-hoc), and each masked
  * column is replaced by its [[Pseudonym]] keyed-hash token under a
  * role-scoped salt. Masked values stay JOINABLE within a role's view
  * (same value ⇒ same token) but are unreadable and unlinkable across
  * roles (different salt per role).
  *
  * At 100 TB this in-plan design is the whole game: a view-layer or
  * post-filter RLS would scan everything and drop rows after the read;
  * the compiled filter prunes partitions and row groups first.
  */
object RowPolicy {

  /** One role's access rule: `predicate` is a SQL boolean over the
    * table's columns; `masked` columns are token-replaced (cast to
    * string, so the masked view's schema is stable across types).
    */
  final case class Policy(role: String, predicate: String, masked: Seq[String])

  /** The view `p.role` is allowed to see: filter + mask, both in-plan. */
  def enforce(df: DataFrame, p: Policy, salt: String): DataFrame =
    p.masked.foldLeft(df.filter(expr(p.predicate))) { (acc, c) =>
      acc.withColumn(c, Pseudonym.token(col(c), s"$salt/${p.role}").cast("string"))
    }
}
