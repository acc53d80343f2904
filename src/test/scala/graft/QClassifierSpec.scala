package graft

import org.apache.spark.sql.functions._
import graft.ops.QClassifier
import graft.queries.QClassifierQueries

/** Convergence and scoring laws for the quality-classifier tier (the
  * PrefSpec BT convention: a known instance the training MUST solve,
  * plus structural laws over the real corpus outputs).
  */
class QClassifierSpec extends SparkSpec {
  import spark.implicits._

  // hex60('lr:fast') % 32 and hex60('lr:slow') % 32 — the buckets the
  // seed-rule tokens land in (collision-audited: 'fast' shares 8 only
  // with the rare 'dup'; 'slow' has 31 alone in the corpus vocabulary)
  private val FAST_BUCKET = 8L
  private val SLOW_BUCKET = 31L

  test("hash-bucket constants match hex60 (guard against salt drift)") {
    val r = Seq("fast", "slow").toDF("w")
      .select(col("w"), pmod(graft.ops.Dedup.hex60(
        md5(concat(lit("lr:"), col("w")).cast("binary"))), lit(32L)).as("b"))
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r("fast") == FAST_BUCKET && r("slow") == SLOW_BUCKET,
      s"bucket constants drifted: $r")
  }

  test("known separable instance: 8 GD iterations solve it exactly") {
    // hand-built corpus: confident docs (margin ±2) for training, plus
    // margin-1 probes the model must generalize to. Filler tokens vary
    // so the hash features are not degenerate.
    val docs = Seq(
      (1L, "fast fast data table join"), // m=+2 seed pos
      (2L, "fast fast fast slow key value"), // m=+2 seed pos
      (3L, "slow slow row scan merge"), // m=-2 seed neg
      (4L, "slow slow slow fast agg window sort"), // m=-2 seed neg
      (5L, "fast fast batch group column stream"), // m=+2 seed pos
      (6L, "slow slow query hash part line"), // m=-2 seed neg
      (7L, "fast data table"), // m=+1 probe (not trained on)
      (8L, "slow row scan") // m=-1 probe
    ).toDF("doc_id", "text")
    val (w, n) = QClassifier.trainedModel(docs, "spec:known-instance")
    assert(n == 6, s"confident-seed filter wrong: n=$n")
    assert(w(FAST_BUCKET) > 0L, s"w_fast should be positive: ${w(FAST_BUCKET)}")
    assert(w(SLOW_BUCKET) < 0L, s"w_slow should be negative: ${w(SLOW_BUCKET)}")
    val scored = QClassifier.scoreAll(docs, "spec:known-instance")
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    // all six seeds fit exactly; both margin-1 probes generalize
    Seq(1L, 2L, 5L, 7L).foreach(d => assert(scored(d), s"doc $d should keep"))
    Seq(3L, 4L, 6L, 8L).foreach(d => assert(!scored(d), s"doc $d should drop"))
  }

  test("sf0.001 training reaches a perfect seed fit and recovers the rule's signs") {
    val rows = QClassifierQueries.queries("q_text_qclassifier")(spark, sf001)
      .collect()
    assert(rows.length == 33, "one row per feature + bias")
    val w = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(w(FAST_BUCKET) > 0L && w(SLOW_BUCKET) < 0L,
      s"seed-token weights lost the rule: fast=${w(FAST_BUCKET)} slow=${w(SLOW_BUCKET)}")
    // the seed tokens must carry the two LARGEST absolute weights — the
    // model concentrated its mass on the actual signal, not collisions
    val top2 = w.toSeq.sortBy { case (_, v) => -math.abs(v) }.take(2).map(_._1).toSet
    assert(top2 == Set(FAST_BUCKET, SLOW_BUCKET), s"top-|w| buckets: $top2")
    // measured (and simulator-verified): GD fits every confident seed
    val acc = rows.head.getLong(4)
    assert(acc == 1000000L, s"train_acc_ppm=$acc — 8 iterations should fit the seeds exactly")
  }

  test("scoring census laws: mass conserved, agreement >= keep-side floor") {
    val rows = QClassifierQueries.queries("q_text_qscore")(spark, sf001).collect()
    assert(rows.nonEmpty)
    val nDocs = rows.map(_.getLong(1)).sum
    val docs = graft.engine.QueryBuilder.scan(spark, sf001, "documents").count()
    assert(nDocs == docs, s"census mass $nDocs != documents $docs")
    rows.foreach { r =>
      val (n, keep, agree) = (r.getLong(1), r.getLong(2), r.getLong(5))
      assert(keep <= n && agree <= n)
      assert(r.getLong(3) <= 1000000L && r.getLong(6) <= 1000000L)
    }
    // corpus-level distillation fidelity: the trained model agrees with
    // the seed rule on >= 80% of ALL docs (simulator-measured ~90%;
    // anything near the class prior means training silently collapsed)
    val agreePpm = rows.map(_.getLong(5)).sum * 1000000L / nDocs
    assert(agreePpm >= 800000L, s"corpus agreement $agreePpm ppm — model collapsed?")
  }

  test("cartography census: mass = seeds, regions partition every bin, var >= 0") {
    val docs = graft.engine.QueryBuilder.scan(spark, sf001, "documents")
      .select(col("doc_id"), col("text"))
    val nSeeds = QClassifier.seedLabels(docs).count()
    val rows = QClassifierQueries.queries("q_text_cartography")(spark, sf001)
      .collect()
    assert(rows.map(_.getLong(1)).sum == nSeeds, "census must cover every seed doc")
    rows.foreach { r =>
      val (n, e, a, h) = (r.getLong(1), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(e + a + h == n, s"regions must partition bin ${r.getLong(0)}")
      assert(r.getLong(2) >= 0L, "variance is non-negative by Cauchy-Schwarz")
    }
  }

  test("5-fold CV: folds partition the seeds, out-of-fold accuracy beats chance") {
    val docs = graft.engine.QueryBuilder.scan(spark, sf001, "documents")
      .select(col("doc_id"), col("text"))
    val nSeeds = QClassifier.seedLabels(docs).count()
    val rows = QClassifierQueries.queries("q_text_cv")(spark, sf001).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      // each row: train on the other 4 folds, test on this one
      assert(r.getLong(1) + r.getLong(2) == nSeeds,
        s"fold ${r.getLong(0)}: n_train + n_test != seeds")
      assert(r.getLong(3) <= r.getLong(2))
    }
    assert(rows.map(_.getLong(2)).sum == nSeeds, "test folds must partition seeds")
    // macro-average out-of-fold accuracy: the distilled rule generalizes
    val macroAcc = rows.map(_.getLong(4)).sum / 5
    assert(macroAcc >= 700000L, s"out-of-fold accuracy collapsed: $macroAcc ppm")
  }

  test("one-pass scoring plan: broadcast weight join, no shuffle before the doc agg") {
    val docs = graft.engine.QueryBuilder.scan(spark, sf001, "documents")
      .select(col("doc_id"), col("text"))
    QClassifier.trainedModel(docs, sf001) // ensure memo (training is not the plan under test)
    val plan = QClassifier.scoreAll(docs, sf001)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("BroadcastHashJoin"),
      s"weights must broadcast:\n${plan.take(1500)}")
    assert(!plan.contains("SortMergeJoin"),
      s"no shuffled join in the scoring pass:\n${plan.take(1500)}")
  }
}
