package graft

import graft.queries.PrefQueries

/** Structural laws over the preference (RLHF) tier at sf0.001: matrix
  * completeness, Copeland mass conservation, Bradley–Terry convergence
  * on a known 2-model instance, BT/Copeland directional agreement with
  * the embedded strength gradient, and Fleiss' kappa bounds.
  */
class PrefSpec extends SparkSpec {

  private def run(name: String) =
    PrefQueries.queries(name)(spark, sf001).collect()

  test("win-rate matrix covers all 10 unordered pairs; rates bounded") {
    val rows = run("q_pref_winrate")
    assert(rows.length == 10, s"expected 10 pairs, got ${rows.length}")
    rows.foreach { r =>
      val (n, w, ppm) = (r.getAs[Long]("n_games"), r.getAs[Long]("n_wins_lo"),
        r.getAs[Long]("winrate_ppm"))
      assert(w >= 0 && w <= n, "wins outside [0, games]")
      assert(ppm == w * 1000000L / n, "rate is not the exact floor ppm")
    }
  }

  test("copeland mass conservation: every pair awards exactly 2 points") {
    val rows = run("q_pref_copeland")
    assert(rows.length == 5)
    assert(rows.forall(_.getAs[Int]("n_opponents") == 4))
    val total = rows.map(r => r.getAs[Int]("copeland2")).sum
    assert(total == 20, s"2 points x 10 pairs, got $total")
  }

  test("btMm converges on a known 2-model instance (75/25 wins -> 3:1)") {
    val p = PrefQueries.btMm(Seq((0, 1, 100L)), Map(0 -> 75L, 1 -> 25L),
      Seq(0, 1), iters = 10)
    assert(p(0) + p(1) >= 4999998L && p(0) + p(1) <= 5000000L,
      s"normalization drift: ${p(0) + p(1)}")
    val ratioPct = p(0) * 100 / p(1)
    assert(ratioPct >= 295 && ratioPct <= 305,
      s"BT should recover 3:1 odds, got $ratioPct/100")
  }

  test("BT strengths recover the embedded gradient and agree with Copeland") {
    val bt = run("q_pref_btl").map(r =>
      r.getAs[Int]("model") -> (r.getAs[Long]("p_micro"), r.getAs[Int]("rank"))).toMap
    assert(bt.values.map(_._1).sum <= 5000000L &&
      bt.values.map(_._1).sum >= 4999990L, "strengths must renormalize to 5e6")
    // winner formula gives +10 ppm-of-100 edge per strength-index step:
    // the top-ranked BT model must be a strictly stronger index than
    // the bottom-ranked one
    val top = bt.minBy(_._2._2)._1
    val bottom = bt.maxBy(_._2._2)._1
    assert(top > bottom, s"gradient inverted: top=$top bottom=$bottom")
    val cope = run("q_pref_copeland").map(r =>
      r.getAs[Int]("model") -> r.getAs[Int]("copeland2")).toMap
    assert(cope(top) >= cope(bottom),
      "BT and Copeland disagree on top vs bottom")
  }

  test("streaming preference monitor equals the batch win-rate matrix") {
    val b = run("q_pref_winrate").map(_.toSeq).toSeq
    val s0 = graft.queries.StreamQueries.queries("q_stream_pref")(spark, sf001)
      .collect().map(_.toSeq).toSeq
    assert(b == s0, "batch/stream win-rate matrices diverge")
  }

  test("curriculum phases are equal-count and monotone in score") {
    val rows = graft.queries.DedupQueries.queries("q_mix_curriculum")(spark, sf001)
      .collect()
    assert(rows.map(_.getAs[Int]("phase")).toSeq == Seq(1, 2, 3, 4))
    val counts = rows.map(_.getAs[Long]("n_docs"))
    assert(counts.max - counts.min <= 1, s"phases unbalanced: ${counts.toSeq}")
    // non-increasing quality across phases (a boundary score may span
    // two phases, so >= on the adjacent min/max)
    rows.sliding(2).foreach { case Array(hi, lo) =>
      assert(hi.getAs[Long]("min_score_ppm") >= lo.getAs[Long]("max_score_ppm"),
        "curriculum order inverted")
    }
  }

  test("fleiss kappa bounded and positive under the structured raters") {
    val r = run("q_eval_fleiss")(0)
    val (pbar, pe, k) = (r.getAs[Long]("pbar_ppm"), r.getAs[Long]("pe_ppm"),
      r.getAs[Long]("kappa_ppm"))
    assert(pbar >= 0 && pbar <= 1000000L && pe >= 0 && pe <= 1000000L)
    // 80% of ratings copy the item's base category -> agreement well
    // above chance
    assert(k > 0 && k <= 1000000L, s"kappa out of range: $k")
    assert(pbar > pe, "observed agreement must exceed chance here")
  }
}
