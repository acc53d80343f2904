package graft

import org.apache.spark.sql.functions._
import graft.engine.QueryBuilder.scan
import graft.ops.Lineage

/** Column-lineage walker (ops/Lineage.scala): the analyzed-plan walk
  * must resolve outputs through project/filter/join/agg, merge union
  * branches positionally, attribute generator outputs to the generator
  * input, and give literals no lineage.
  */
class LineageSpec extends SparkSpec {

  private val d = sf001

  test("join + aggregate + alias resolves to the right leaf columns") {
    val report = scan(spark, d, "customer")
      .join(scan(spark, d, "orders"), col("c_custkey") === col("o_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(sum(col("o_totalprice")).as("revenue"),
        max(col("c_acctbal") + col("o_totalprice")).as("mix"))
      .select(col("c_mktsegment").as("segment"), col("revenue"), col("mix"))
    val got = Lineage.columnLineage(report).toSet
    assert(got == Set(
      ("segment", "customer", "c_mktsegment"),
      ("revenue", "orders", "o_totalprice"),
      ("mix", "customer", "c_acctbal"),
      ("mix", "orders", "o_totalprice")))
  }

  test("filter/sort/limit are pass-through; literals have no lineage") {
    val q = scan(spark, d, "nation")
      .filter(col("n_regionkey") > 0)
      .orderBy(col("n_name"))
      .limit(5)
      .select(col("n_name"), lit(1).as("one"))
    val got = Lineage.columnLineage(q)
    assert(got == Seq(("n_name", "nation", "n_name")))
  }

  test("union merges origins positionally across branches") {
    val a = scan(spark, d, "customer").select(col("c_name").as("name"))
    val b = scan(spark, d, "supplier").select(col("s_name").as("name"))
    val got = Lineage.columnLineage(a.unionAll(b)).toSet
    assert(got == Set(
      ("name", "customer", "c_name"),
      ("name", "supplier", "s_name")))
  }

  test("generator output attributes trace to the exploded input column") {
    val q = scan(spark, d, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
    val got = Lineage.columnLineage(q).toSet
    assert(got == Set(
      ("doc_id", "documents", "doc_id"),
      ("word", "documents", "text")))
  }

  test("piiFlow flags exactly the edges whose source leaf is sensitive") {
    val q = scan(spark, d, "orders")
      .join(scan(spark, d, "customer"), col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"),
        concat(col("c_name"), lit("/"), col("c_mktsegment")).as("contact"))
    val flow = Lineage.piiFlow(q, Set("customer" -> "c_name")).toSet
    assert(flow == Set(
      ("o_orderkey", "orders", "o_orderkey", false),
      ("contact", "customer", "c_name", true),
      ("contact", "customer", "c_mktsegment", false)))
  }

  test("window expressions reference both partition input and value input") {
    import org.apache.spark.sql.expressions.Window
    val q = scan(spark, d, "orders")
      .select(col("o_orderkey"),
        sum(col("o_totalprice"))
          .over(Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate")))
          .as("run"))
    val got = Lineage.columnLineage(q).toSet
    assert(got.contains(("run", "orders", "o_totalprice")))
    assert(got.contains(("o_orderkey", "orders", "o_orderkey")))
  }
}
