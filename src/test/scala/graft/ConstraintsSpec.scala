package graft

import org.apache.spark.sql.functions._
import graft.ops.Constraints
import graft.ops.Constraints._

/** Constraint-engine semantics on crafted rows: exact violation counts
  * per rule class, bitmap composition in rowAudit, and the one-pass
  * plan shape for row-scoped checks.
  */
class ConstraintsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val rows = Seq(
    (Some(1L), 10.0, "A"),   // clean
    (Some(1L), 99.0, "A"),   // range violation (and dup key with row 1)
    (None, 5.0, "A"),        // null key
    (Some(2L), 50.0, "X"),   // range + set violations
    (Some(9L), 20.0, "N")    // orphan FK (parent has 1, 2)
  ).toDF("k", "v", "flag")

  private lazy val parent = Seq(1L, 2L).toDF("pk")

  test("report: exact violation counts per rule class") {
    val rep = Constraints.report(rows, Seq(
        Check.notNull("k"),
        Check.inRange("v", 0, 60),
        Check.inSet("flag", Seq("A", "N", "R")),
        Unique(Seq("k")),
        ForeignKey("k", parent, "pk", "parent")))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(rep("not_null:k") == ((1L, false)))
    assert(rep("range:v") == ((1L, false)))          // only 99.0 (null-escape holds)
    assert(rep("in_set:flag") == ((1L, false)))      // only "X"
    assert(rep("unique:k") == ((1L, false)))         // k=1 twice -> 1 extra copy
    assert(rep("fk:k->parent.pk") == ((1L, false)))  // k=9; null k not counted
  }

  test("report: clean suite passes everything") {
    val rep = Constraints.report(rows.filter(col("k") === 1L && col("v") < 60),
        Seq(Check.notNull("k"), Check.inRange("v", 0, 60)))
      .collect().map(r => r.getString(0) -> r.getBoolean(2)).toMap
    assert(rep.values.forall(identity), s"unexpected failures: $rep")
  }

  test("rowAudit: bitmap composes independent rule failures") {
    val audited = Constraints.rowAudit(rows, Seq(
        Check.notNull("k"),               // bit 0
        Check.inRange("v", 0, 60),        // bit 1
        Check.inSet("flag", Seq("A", "N", "R")))) // bit 2
      .select(col("v"), col("violation_bits"), col("is_clean"))
      .collect().map(r => r.getDouble(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(audited(10.0) == ((0L, true)))
    assert(audited(99.0) == ((2L, false)))
    assert(audited(5.0) == ((1L, false)))
    assert(audited(50.0) == ((4L, false))) // 50 <= 60: only the set rule fires
    assert(audited(20.0) == ((0L, true)))
  }

  test("row-scoped checks fold into one aggregation, not one job per rule") {
    val plan = Constraints.report(rows, Seq(
        Check.notNull("k"), Check.inRange("v", 0, 60),
        Check.inSet("flag", Seq("A")), Check.matches("flag", "^[A-Z]$")))
      .queryExecution.executedPlan.toString()
    // 4 rules, ONE partial/final aggregate pair over one scan
    assert("HashAggregate|SortAggregate".r.findAllIn(plan).size <= 2,
      s"per-rule aggregation jobs:\n${plan.take(1500)}")
  }
}
