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
}
