package graft

import org.apache.spark.sql.functions._

/** k-anonymity census invariants: the one-pass rollup ladder must agree
  * with a naive per-rung recompute, and generalization can only merge
  * equivalence classes, so rows-at-risk is non-increasing up the ladder.
  */
class PrivacySpec extends SparkSpec {

  private lazy val rungs =
    graft.queries.QualityQueries.queries("q_dq_kanon")(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => r.getAs[Int]("rung") ->
        (r.getAs[Long]("n_classes"), r.getAs[Long]("min_class_size"),
          r.getAs[Long]("n_at_risk"), r.getAs[Long]("risk_ppm")))
      .toMap

  test("rollup ladder matches a naive per-rung recompute") {
    val c = graft.engine.QueryBuilder.scan(spark, "/root/testdata/sf0.001", "customer")
      .select(col("c_mktsegment").as("seg"), col("c_nationkey").as("nat"),
        floor(col("c_acctbal") / 1000).cast("long").as("band"))
    def naive(cols: Seq[String]): (Long, Long, Long) = {
      val sizes =
        (if (cols.isEmpty) c.groupBy() else c.groupBy(cols.map(col): _*))
          .agg(count(lit(1)).as("n")).select(col("n")).collect().map(_.getLong(0))
      (sizes.length.toLong, sizes.min, sizes.filter(_ < 5).sum)
    }
    val expect = Map(
      0 -> naive(Seq("seg", "nat", "band")),
      1 -> naive(Seq("seg", "nat")),
      3 -> naive(Seq("seg")),
      7 -> naive(Seq.empty))
    expect.foreach { case (rung, (nc, mn, risk)) =>
      val (gNc, gMn, gRisk, _) = rungs(rung)
      assert((gNc, gMn, gRisk) == ((nc, mn, risk)), s"rung $rung disagrees with naive")
    }
  }

  test("generalization is monotone: rows-at-risk never grows up the ladder") {
    val ordered = Seq(0, 1, 3, 7).map(r => rungs(r)._3)
    assert(ordered.zip(ordered.tail).forall { case (finer, coarser) => coarser <= finer },
      s"at-risk counts not monotone: $ordered")
    // the fully-suppressed rung is one class holding every row
    assert(rungs(7)._1 == 1L && rungs(7)._3 == 0L)
  }

  test("forget manifest: cascades are referentially exact and cover every row") {
    import org.apache.spark.sql.functions._
    val d = "/root/testdata/sf0.001"
    val got = graft.queries.QualityQueries.queries("q_dq_forget")(spark, d)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val cust = graft.engine.QueryBuilder.scan(spark, d, "customer")
    val orders = graft.engine.QueryBuilder.scan(spark, d, "orders")
    val delKeys = cust.filter(col("c_custkey") % 97 === 3)
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    val delOrders = orders.collect()
      .filter(r => delKeys.contains(r.getAs[Long]("o_custkey")))
      .map(r => r.getAs[Long]("o_orderkey")).toSet
    val liKeys = graft.engine.QueryBuilder.scan(spark, d, "lineitem")
      .select("l_orderkey").collect().map(_.getLong(0))
    assert(got("customer")._1 == delKeys.size.toLong)
    assert(got("orders")._1 == delOrders.size.toLong)
    assert(got("lineitem")._1 == liKeys.count(delOrders.contains).toLong)
    // delete + keep covers each table exactly
    got.foreach { case (t, (nd, nk)) =>
      val total = t match {
        case "customer" => cust.count(); case "orders" => orders.count()
        case "lineitem" => liKeys.length.toLong
        case "events" => graft.engine.QueryBuilder.scan(spark, d, "events").count()
      }
      assert(nd + nk == total, s"$t: $nd + $nk != $total")
    }
  }

  test("table checksum is partition/order-invariant and content-sensitive") {
    import org.apache.spark.sql.functions._
    val d = "/root/testdata/sf0.001"
    def manifest(df: org.apache.spark.sql.DataFrame) = df
      .select(col("source"), col("n_chars"),
        graft.ops.Dedup.hex60(md5(concat(col("doc_id").cast("string"),
          lit(":"), col("text")).cast("binary"))).as("h"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_rows"), expr("bit_xor(h)").as("xor60"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val docs = graft.engine.QueryBuilder.scan(spark, d, "documents")
    val base = manifest(docs)
    assert(manifest(docs.repartition(17)) == base, "checksum not partition-invariant")
    // flipping one row's text must change exactly that source's checksum
    val mutated = docs.withColumn("text",
      when(col("doc_id") === 0, concat(col("text"), lit("X"))).otherwise(col("text")))
    val changedSrc = docs.filter(col("doc_id") === 0).select("source").head().getString(0)
    val m = manifest(mutated)
    assert(m(changedSrc) != base(changedSrc), "checksum blind to a content change")
    assert((m - changedSrc) == (base - changedSrc), "unrelated sources changed")
  }
}
