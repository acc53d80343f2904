package graft

import org.apache.spark.sql.functions._

/** The scale generator guards the 100× gate's own validity: broken FK
  * reseeding would deflate join selectivity (fake speedups), and
  * un-decorrelated replica payloads inflate near-dup pair counts
  * quadratically in the factor (the artifact the r7 gate initially
  * measured as 50-75× "super-linear" operators).
  */
class GenScaleSpec extends SparkSpec {

  private lazy val out: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_genscale_test").toString
    GenScale.generate(spark, sf001, dir, factor = 2)
    dir
  }

  test("replication doubles fact rows, copies fixed dims, keeps ids distinct") {
    def n(t: String, d: String) = spark.read.parquet(s"$d/$t.parquet").count()
    for (t <- Seq("customer", "orders", "lineitem", "events", "documents", "embeddings"))
      assert(n(t, out) == 2 * n(t, sf001), t)
    for (t <- Seq("region", "nation"))
      assert(n(t, out) == n(t, sf001), t)
    val docs = spark.read.parquet(s"$out/documents.parquet")
    assert(docs.select("doc_id").distinct().count() == docs.count())
  }

  test("foreign keys stay consistent within replicas — zero orphans, same join selectivity") {
    val l = spark.read.parquet(s"$out/lineitem.parquet")
    val o = spark.read.parquet(s"$out/orders.parquet")
    val c = spark.read.parquet(s"$out/customer.parquet")
    assert(l.join(o, l("l_orderkey") === o("o_orderkey"), "left_anti").count() == 0)
    assert(o.join(c, o("o_custkey") === c("c_custkey"), "left_anti").count() == 0)
    // selectivity preserved: the join output doubles exactly, never squares
    val small = spark.read.parquet(s"$sf001/lineitem.parquet")
      .join(spark.read.parquet(s"$sf001/orders.parquet"),
        col("l_orderkey") === col("o_orderkey")).count()
    assert(l.join(o, l("l_orderkey") === o("o_orderkey")).count() == 2 * small)
    // events.user_id references customer (the r7 advice finding): it must
    // shift by cOff so replica-k events join replica-k customers. Orphan
    // count and events↔customer selectivity must be replica-invariant.
    val e = spark.read.parquet(s"$out/events.parquet")
    val (e0, c0) = (spark.read.parquet(s"$sf001/events.parquet"),
      spark.read.parquet(s"$sf001/customer.parquet"))
    val orphans0 = e0.join(c0, e0("user_id") === c0("c_custkey"), "left_anti").count()
    assert(e.join(c, e("user_id") === c("c_custkey"), "left_anti").count() == 2 * orphans0)
    val hits0 = e0.join(c0, e0("user_id") === c0("c_custkey")).count()
    assert(e.join(c, e("user_id") === c("c_custkey")).count() == 2 * hits0,
      "events↔customer join must double exactly, never cross replicas")
  }

  test("replica payloads are decorrelated: tagged doc tokens, rotated embeddings") {
    val docs = spark.read.parquet(s"$out/documents.parquet")
    val base = spark.read.parquet(s"$sf001/documents.parquet")
    val dOff = base.agg(max("doc_id")).head().getLong(0) + 1
    // replica 1 of a doc shares no whitespace tokens with its source
    val src = base.filter(col("doc_id") === 0).select("text").head().getString(0)
    val rep = docs.filter(col("doc_id") === dOff).select("text").head().getString(0)
    val (st, rt) = (src.split("\\s+").toSet, rep.split("\\s+").toSet)
    assert(st.nonEmpty && (st & rt).isEmpty, "replica shares tokens with its source")
    // embeddings: replica is a rotation — same multiset of values, different order
    val emb = spark.read.parquet(s"$out/embeddings.parquet")
    val vOff = spark.read.parquet(s"$sf001/embeddings.parquet")
      .agg(max("vec_id")).head().getLong(0) + 1
    val v0 = emb.filter(col("vec_id") === 0).select("embedding").head()
      .getSeq[Float](0)
    val v1 = emb.filter(col("vec_id") === vOff).select("embedding").head()
      .getSeq[Float](0)
    assert(v0 != v1, "replica embedding identical to source")
    assert(v0.sorted == v1.sorted, "rotation must preserve the value multiset")
    assert(v1 == (v0.drop(7) ++ v0.take(7)), "replica 1 must be the 7-step rotation")
  }
}
