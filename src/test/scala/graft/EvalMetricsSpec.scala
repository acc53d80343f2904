package graft

import graft.queries.{AggQueries, StreamQueries}

/** Metric laws over the eval tier's actual outputs at sf0.001 — the
  * cross-metric identities that must hold no matter what the
  * deterministic predictions look like: AUC/Gini coupling, confusion
  * totals vs the relation size, ECE bin mass, PR-AUC ≥ base rate,
  * Brier bounds, and batch ≡ stream for the mergeable confusion.
  */
class EvalMetricsSpec extends SparkSpec {

  private def run(name: String) =
    AggQueries.queries(name)(spark, sf001).collect()

  test("AUC in [0, 1e6]; Gini = 2·AUC − 1e6 up to the floor-div unit") {
    val r = run("q_eval_auc")(0)
    val (auc, gini) = (r.getAs[Long]("auc_ppm"), r.getAs[Long]("gini_ppm"))
    assert(auc >= 0L && auc <= 1000000L)
    // 2·floor(x/2) ∈ {floor(x)−1, floor(x)}: resid ∈ {−1, 0}
    val resid = 2 * auc - 1000000L - gini
    assert(resid == 0L || resid == -1L, s"auc/gini coupling off: $resid")
    // the label-shifted score must actually rank better than chance
    assert(auc > 500000L, s"shifted predictions should beat chance, auc=$auc")
  }

  test("confusion totals equal the orders count; F1 between P and R") {
    val r = run("q_eval_confusion")(0)
    val n = Seq("tp", "fp", "fn", "tn").map(r.getAs[Long](_)).sum
    val orders = graft.engine.QueryBuilder.scan(spark, sf001, "orders").count()
    assert(n == orders, s"confusion mass $n != orders $orders")
    val (p, rc, f1) = (r.getAs[Long]("precision_ppm"),
      r.getAs[Long]("recall_ppm"), r.getAs[Long]("f1_ppm"))
    assert(f1 >= math.min(p, rc) - 1 && f1 <= math.max(p, rc) + 1,
      s"F1 $f1 outside [$p, $rc]")
    assert(math.abs(r.getAs[Long]("kappa_ppm")) <= 1000000L)
    assert(r.getAs[Long]("mcc_sq_ppm") <= 1000000L)
  }

  test("streaming confusion monitor equals the batch confusion exactly") {
    val b = run("q_eval_confusion")(0)
    val s = StreamQueries.queries("q_stream_eval")(spark, sf001).collect()(0)
    Seq("tp", "fp", "fn", "tn", "precision_ppm", "recall_ppm", "f1_ppm",
      "mcc_sign", "mcc_sq_ppm", "kappa_ppm").foreach { c =>
      assert(b.getAs[Long](c) == s.getAs[Long](c), s"batch/stream diverge on $c")
    }
  }

  test("ECE bins cover every row; confidences are within their bins") {
    val rows = run("q_eval_ece")
    val n = rows.map(_.getAs[Long]("n")).sum
    val orders = graft.engine.QueryBuilder.scan(spark, sf001, "orders").count()
    assert(n == orders)
    rows.foreach { r =>
      val (bin, conf) = (r.getAs[Long]("bin"), r.getAs[Long]("conf_ppm"))
      assert(conf >= bin * 100000 && conf < (bin + 1) * 100000,
        s"conf $conf outside bin $bin")
      assert(r.getAs[Long]("acc_ppm") <= 1000000L)
    }
  }

  test("PR-AUC is a valid AP: within (0, 1e6], at least the base rate - 1") {
    val r = run("q_eval_prauc")(0)
    val ap = r.getAs[Long]("ap_ppm")
    assert(ap > 0L && ap <= 1000000L)
    // AP of any ranker >= positive base rate (up to floor-div units)
    val c = run("q_eval_confusion")(0)
    val n1 = c.getAs[Long]("tp") + c.getAs[Long]("fn")
    val n = n1 + c.getAs[Long]("fp") + c.getAs[Long]("tn")
    assert(ap >= n1 * 1000000L / n - 1, s"AP $ap below base rate")
  }

  test("Brier and log-loss are within their proper-score ranges") {
    val r = run("q_eval_scoring")(0)
    val brier = r.getAs[Long]("brier_pp12")
    assert(brier >= 0L && brier <= 1000000000000L, s"brier $brier")
    val llMean = r.getAs[Long]("ll_mcb_mean")
    // mean log-loss in millicentibits: 0 (perfect) .. 1993000 (certain-wrong)
    assert(llMean >= 0L && llMean <= 1993000L, s"log-loss $llMean")
  }

  test("McNemar: concordance mass conserved, B wins by construction, CC <= raw") {
    val r = run("q_eval_mcnemar")(0)
    val parts = Seq("both_right", "both_wrong", "a_only", "b_only")
      .map(r.getAs[Long](_))
    assert(parts.sum == r.getAs[Long]("n_items"), "2x2 census mass lost")
    // model B carries a 250k label shift vs A's 150k — it must be the
    // stronger paired model on the same items
    assert(r.getAs[Int]("better_model") == 1, "B should win")
    assert(r.getAs[Long]("mcnemar_cc_ppm") <= r.getAs[Long]("mcnemar_x2_ppm"),
      "continuity correction must not increase the statistic")
  }

  test("paired bootstrap: B wins by construction, CI ordered, census complete") {
    val r = run("q_eval_bootstrap")(0)
    assert(r.getAs[Long]("n_replicas") == 100L)
    val p = r.getAs[Long]("p_b_better_ppm")
    assert(p >= 0L && p <= 1000000L)
    // model B carries the larger label shift (250k vs 150k) on the SAME
    // items — the bootstrap must call it better in most replicas
    assert(p > 500000L, s"B should win most replicas, p=$p")
    val (lo, hi) = (r.getAs[Long]("ci_lo_ppm"), r.getAs[Long]("ci_hi_ppm"))
    assert(lo <= hi, s"CI inverted: [$lo, $hi]")
    // the mean gap is positive and inside the ±1e6 ppm range
    val m = r.getAs[Long]("mean_diff_ppm")
    assert(m > 0L && math.abs(m) <= 1000000L, s"mean gap $m")
  }

  test("JSD is symmetric-bounded: both KL(.||M) halves >= 0, total <= 2 bits") {
    val r = graft.queries.TextQueries.queries("q_text_jsd")(spark, sf001)
      .collect()(0)
    val (p, q) = (r.getAs[Long]("kl_p_m_cbppm"), r.getAs[Long]("kl_q_m_cbppm"))
    // each KL(.||M) is >= 0 in exact arithmetic; the fixed-point
    // estimate can dip below zero by (weight-floor x cb-rounding)
    // slack — bound each half by the 1-bit ceiling instead, and pin
    // positivity on the SUM (the quantity the mixture designer reads)
    assert(math.abs(p) <= 100000000L && math.abs(q) <= 100000000L,
      s"KL half beyond the 1-bit ceiling: $p / $q")
    val jsd = r.getAs[Long]("jsd_x2_cbppm")
    assert(jsd == p + q, "doubled JSD must be the exact sum")
    // JSD <= 1 bit = 100 cb; weights sum to ~1e6 ppm; doubled => 2e8
    assert(jsd > 0 && jsd <= 200000000L, s"JSD out of range: $jsd")
  }

  test("MAP@10 laws: AP bounded by 1e6, zero iff no hits, exact when all hit") {
    val rows = graft.queries.SearchQueries.queries("q_text_map")(spark, sf001)
      .collect()
    assert(rows.length == 20, "one row per query term")
    rows.foreach { r =>
      val (nRel, hits, ap) = (r.getAs[Long]("n_rel"), r.getAs[Long]("hits"),
        r.getAs[Long]("ap_ppm"))
      assert(ap >= 0 && ap <= 1000000L, s"AP out of range: $ap")
      assert((hits == 0) == (ap == 0), "AP zero iff no hits")
      // perfect retrieval: if every sys rank 1..n_rel is a hit in order,
      // AP = 1e6 exactly; conversely AP = 1e6 requires full recall
      if (ap == 1000000L) assert(hits == math.min(nRel, 10))
    }
  }
}
