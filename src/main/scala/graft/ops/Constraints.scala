package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality CONSTRAINT engine (the Deequ/dbt-tests
  * shape): a constraint suite is data — a list of case-class rules —
  * and the engine compiles it into the minimum number of passes:
  *
  *  - row-scoped rules (not-null, range, set membership, regex,
  *    custom predicate) fold into ONE codegen'd aggregation over the
  *    table — one violation counter per rule, no per-rule jobs;
  *  - uniqueness is one map-side-combinable groupBy on the key;
  *  - referential integrity is one broadcast/shuffle anti-join per
  *    referenced table.
  *
  * Every rule also exposes its row-level predicate, so the same suite
  * drives [[rowAudit]] — the quarantine/dead-letter split: each row
  * gets a violation BITMAP (bit i = rule i failed), and the pipeline
  * routes bitmap==0 rows onward and the rest to the DLQ with a
  * machine-readable reason. At 100 TB the audit is the same single
  * pass; the bitmap is one long column.
  *
  * Reference seam: the reference trusts its sources entirely (no
  * validation anywhere in src/index.ts); this tier is what a warehouse
  * must add the moment data lands from 13 heterogeneous adapters.
  */
object Constraints {

  sealed trait Rule { def name: String }

  /** Row-scoped rule: `pred` must hold for every row. */
  final case class Check(name: String, pred: Column) extends Rule

  object Check {
    def notNull(c: String): Check = Check(s"not_null:$c", col(c).isNotNull)
    def inRange(c: String, lo: Double, hi: Double): Check =
      Check(s"range:$c", col(c).isNull || (col(c) >= lo && col(c) <= hi))
    def inSet(c: String, values: Seq[String]): Check =
      Check(s"in_set:$c", col(c).isNull || col(c).isin(values: _*))
    def matches(c: String, regex: String): Check =
      Check(s"regex:$c", col(c).isNull || col(c).rlike(regex))
  }

  /** Key-uniqueness rule (one groupBy). */
  final case class Unique(cols: Seq[String]) extends Rule {
    val name = s"unique:${cols.mkString("+")}"
  }

  /** Referential rule: every non-null `col` value exists in
    * `parent.parentCol` (one anti-join).
    */
  final case class ForeignKey(colName: String, parent: DataFrame,
                              parentCol: String, parentName: String) extends Rule {
    val name = s"fk:$colName->$parentName.$parentCol"
  }

  /** Evaluate the suite into a (rule, n_violations, pass) report.
    * Row-scoped checks share one aggregation; each Unique/ForeignKey
    * contributes one more job, all map-side-combinable or semi-join
    * shaped. Rows are emitted in rule-declaration order via unionAll
    * of single-row frames (lazy — Spark runs them as one action when
    * the report is consumed).
    */
  def report(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val checks = rules.collect { case c: Check => c }
    val parts: Seq[DataFrame] =
      (if (checks.nonEmpty) {
        val aggs = checks.map(c =>
          sum(when(!c.pred, 1L).otherwise(0L)).cast("long").as(c.name))
        val wide = df.agg(aggs.head, aggs.tail: _*)
        Seq(wide.select(array(checks.map(c =>
            struct(lit(c.name).as("rule"), col(c.name).as("n_violations"))): _*)
          .as("a"))
          .select(explode(col("a")).as("r"))
          .select(col("r.rule"), col("r.n_violations")))
      } else Nil) ++
      rules.collect {
        case u: Unique =>
          df.groupBy(u.cols.map(col): _*).agg(count(lit(1)).as("__n"))
            .filter(col("__n") > 1)
            .agg(coalesce(sum(col("__n") - 1), lit(0L)).cast("long").as("n_violations"))
            .select(lit(u.name).as("rule"), col("n_violations"))
        case f: ForeignKey =>
          df.filter(col(f.colName).isNotNull)
            .join(f.parent.select(col(f.parentCol).as("__pk")),
              col(f.colName) === col("__pk"), "left_anti")
            .agg(count(lit(1)).cast("long").as("n_violations"))
            .select(lit(f.name).as("rule"), col("n_violations"))
      }
    parts.reduce(_ unionAll _)
      .withColumn("pass", col("n_violations") === 0L)
  }

  /** Row-level audit for ROW-SCOPED checks: adds `violation_bits`
    * (bit i set ⇔ checks(i) failed — stable rule order is the
    * contract) and `is_clean`. The quarantine split is then two
    * filters over one pass; reasons decode client-side from the suite.
    */
  def rowAudit(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.size <= 63, s"rowAudit: at most 63 rules, got ${checks.size}")
    val bits = checks.zipWithIndex.map { case (c, i) =>
      when(!c.pred, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
    df.withColumn("violation_bits", bits)
      .withColumn("is_clean", col("violation_bits") === 0L)
  }
}
