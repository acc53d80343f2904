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

  test("pseudonym: injective on testdata keys, join-preserving, salt-rotating") {
    import org.apache.spark.sql.functions._
    import graft.ops.Pseudonym
    val d = "/root/testdata/sf0.001"
    val cust = graft.engine.QueryBuilder.scan(spark, d, "customer")
    val orders = graft.engine.QueryBuilder.scan(spark, d, "orders")
    // injectivity: distinct tokens == distinct keys (a collision would
    // silently merge two identities)
    val ct = cust.select(col("c_custkey"),
      Pseudonym.token(col("c_custkey"), "e1").as("tok"))
    val Array(nKeys, nToks) = ct
      .agg(countDistinct(col("c_custkey")), countDistinct(col("tok")))
      .head().toSeq.map(_.asInstanceOf[Long]).toArray
    assert(nKeys == nToks, s"token collision: $nKeys keys -> $nToks tokens")
    // FK-join preservation: orders x customer via token == via raw key
    val ot = orders.select(Pseudonym.token(col("o_custkey"), "e1").as("otok"))
    val viaTok = ot.join(ct, col("otok") === col("tok")).count()
    val viaRaw = orders.join(cust, col("o_custkey") === col("c_custkey")).count()
    assert(viaTok == viaRaw, s"token join $viaTok != raw join $viaRaw")
    // determinism: a second stamping pass produces identical tokens
    val again = cust.select(Pseudonym.token(col("c_custkey"), "e1").as("tok2"))
    assert(ct.join(again, col("tok") === col("tok2")).count() == nKeys)
    // salt rotation: epochs are unlinkable — no token survives rotation
    val rotated = cust.select(Pseudonym.token(col("c_custkey"), "e2").as("tok2"))
    assert(ct.join(rotated, col("tok") === col("tok2")).count() == 0L,
      "rotated epoch shares tokens with the old epoch")
  }

  test("RLS: predicate filters rows, masks are role-scoped, auditor sees raw") {
    import org.apache.spark.sql.functions._
    import graft.ops.RowPolicy, graft.ops.RowPolicy.Policy
    val d = "/root/testdata/sf0.001"
    val cust = graft.engine.QueryBuilder.scan(spark, d, "customer")
    val eu = RowPolicy.enforce(cust, Policy("eu", "c_nationkey < 10", Seq("c_name")), "s1")
    val eu2 = RowPolicy.enforce(cust, Policy("eu2", "c_nationkey < 10", Seq("c_name")), "s1")
    val open = RowPolicy.enforce(cust, Policy("all", "true", Seq.empty), "s1")
    // row predicate enforced
    assert(eu.filter(col("c_nationkey") >= 10).count() == 0)
    assert(eu.count() == cust.filter(col("c_nationkey") < 10).count())
    // mask applied: no raw name survives in the masked view
    val rawNames = cust.select("c_name").distinct()
    assert(eu.select("c_name").distinct()
      .join(rawNames, Seq("c_name"), "left_semi").count() == 0)
    // deterministic within a role (joinable), unlinkable across roles
    val a = eu.select(col("c_custkey"), col("c_name").as("m1"))
    val b = eu2.select(col("c_custkey").as("k2"), col("c_name").as("m2"))
    val joined = a.join(b, col("c_custkey") === col("k2"))
    assert(joined.filter(col("m1") === col("m2")).count() == 0,
      "different roles share mask tokens")
    // auditor view is the identity
    assert(open.exceptAll(cust).count() == 0 && cust.exceptAll(open).count() == 0)
  }

  test("DP release: threshold-table inverse CDF, bounded noise, deterministic replay") {
    import org.apache.spark.sql.functions._
    import graft.ops.DpRelease
    val thr = DpRelease.thresholds(1.0)
    assert(thr.size == 2 * DpRelease.B + 1)
    assert(thr.head._2 == 0L, "CDF strictly below -B must be 0")
    assert(thr.map(_._2) == thr.map(_._2).sorted, "thresholds not monotone")
    assert(thr.last._2 < (1L << 60))
    // the engine's noise must equal a driver-side replay of the same
    // table for every group, and stay within the [-B, B] support
    val d = "/root/testdata/sf0.001"
    val cust = graft.engine.QueryBuilder.scan(spark, d, "customer")
    val got = DpRelease.noisyCount(cust, "c_mktsegment", "release1", 1.0)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val trueCounts = cust.groupBy(col("c_mktsegment")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    trueCounts.foreach { case (seg, n) =>
      val u = cust.sparkSession.range(1)
        .select(DpRelease.uniform(lit(seg), "release1")).head().getLong(0)
      val noise = thr.count(_._2 <= u) - (DpRelease.B + 1)
      assert(math.abs(noise) <= DpRelease.B)
      assert(got(seg) == math.max(n + noise, 0L), s"$seg: engine != replay")
    }
    // same salt ⇒ identical release; fresh salt ⇒ a different draw
    val again = DpRelease.noisyCount(cust, "c_mktsegment", "release1", 1.0)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == got, "release not deterministic under a fixed salt")
    val fresh = DpRelease.noisyCount(cust, "c_mktsegment", "release2", 1.0)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(fresh != got, "independent salts produced the identical draw (improbable)")
  }
}
