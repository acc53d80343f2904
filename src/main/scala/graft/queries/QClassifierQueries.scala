package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.QueryBuilder.scan
import graft.ops.QClassifier

/** Quality-classifier tier (see [[graft.ops.QClassifier]] for the full
  * training/arithmetic contract): the DCLM/FineWeb-style keep/drop gate
  * as two relational readouts —
  *
  *  - q_text_qclassifier: the TRAINING run. Output = the final weight
  *    vector (33 rows) + the seed-set fit census, every value exact
  *    integer, so the oracle's unrolled-CTE replay of all 8 GD
  *    iterations must reproduce each weight bit-for-bit.
  *  - q_text_qscore: the SCORING run — the trained model broadcast over
  *    the WHOLE corpus (memoized per JVM; at 100 TB this is the query
  *    that touches everything, and it is one map-side pass + a
  *    source-keyed census), with the seed-rule agreement audit the
  *    distillation is judged by.
  */
object QClassifierQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_text_qclassifier" -> ((s: SparkSession, d: String) => {
      val docs = scan(s, d, "documents").select(col("doc_id"), col("text"))
      val (w, n) = QClassifier.trainedModel(docs, d)
      import s.implicits._
      val wdf = w.toSeq.sortBy(_._1).toDF("f", "w_micro")
      // seed-set fit census: score the confident-label docs with the
      // final weights (one more broadcast pass over the seed subset)
      val lab = QClassifier.seedMargin(docs).filter(abs(col("m")) >= 2)
        .select(col("doc_id"), when(col("m") >= 2, 1L).otherwise(0L).as("y"))
      val fit = QClassifier.scoreAll(docs, d).join(lab, "doc_id")
        .agg(sum(when((col("sig_ppm") >= 500000L) === (col("y") === 1L), 1L)
          .otherwise(0L)).as("n_right"))
        .select(lit(n).as("n_train"), col("n_right"),
          expr("n_right * 1000000 div " + n).as("train_acc_ppm"))
      wdf.crossJoin(broadcast(fit))
        .select(col("f"), col("w_micro"), col("n_train"), col("n_right"),
          col("train_acc_ppm"))
        .orderBy(col("f"))
    }),

    "q_text_qscore" -> ((s: SparkSession, d: String) => {
      val docs = scan(s, d, "documents")
      val scored = QClassifier.scoreAll(
        docs.select(col("doc_id"), col("text")), d)
      // seed-rule verdict over ALL docs (margin sign, no confidence
      // floor) — the agreement column audits how faithfully the model
      // generalizes the rule beyond its confident training slice
      val seed = QClassifier.seedMargin(docs.select(col("doc_id"), col("text")))
        .select(col("doc_id"), (col("m") > 0).as("seed_keep"))
      scored.join(seed, "doc_id")
        .join(docs.select(col("doc_id"), col("source")), "doc_id")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("keep"), 1L).otherwise(0L)).as("n_keep"),
          sum(when(col("seed_keep"), 1L).otherwise(0L)).as("n_seed_keep"),
          sum(when(col("keep") === col("seed_keep"), 1L).otherwise(0L))
            .as("n_agree"))
        .select(col("source"), col("n_docs"), col("n_keep"),
          expr("n_keep * 1000000 div n_docs").as("keep_ppm"),
          col("n_seed_keep"), col("n_agree"),
          expr("n_agree * 1000000 div n_docs").as("agree_ppm"))
        .orderBy(col("source"))
    }),

    // DATASET CARTOGRAPHY (Swayamdipta et al. 2020) — per-item
    // confidence (mean true-class probability across training) and
    // variability (its variance) over the classifier's recorded weight
    // trajectory, binned into the paper's easy / ambiguous /
    // hard-to-learn regions. The window is the LAST HALF of the
    // trajectory (t = 5..8): with 8 full-batch iterations the first
    // half is the optimization transit every item shares, and variance
    // over it measures the optimizer, not the item (measured: all-8
    // std ≈ 245k ppm for every doc, vs a discriminating ~47k-std band
    // post-transit). All exact integers: c_t = y·σ_t + (1−y)(1e6−σ_t),
    // conf = Σc div 4, var_pp2 = (4Σc² − (Σc)²) div 16 (non-negative
    // by Cauchy–Schwarz, so floor ≡ truncation). One broadcast join of
    // the 132-row (f, t, w) trajectory against the seed features — at
    // 100 TB the pass is one shuffle of (doc, t) partials, census 10
    // rows
    "q_text_cartography" -> ((s: SparkSession, d: String) => {
      val docs = scan(s, d, "documents").select(col("doc_id"), col("text"))
      val (traj, _) = QClassifier.trainedTrajectory(docs, d)
      import s.implicits._
      val wdf = traj.zipWithIndex.collect {
        case (w, i) if i + 1 >= 5 =>
          w.toSeq.map { case (f, wv) => (f, (i + 1).toLong, wv) }
      }.flatten.toDF("f", "t", "w")
      val lab = QClassifier.seedLabels(docs)
      val tf = QClassifier.featurize(docs).join(lab, "doc_id")
      val c = tf.join(broadcast(wdf), "f")
        .groupBy(col("doc_id"), col("t"))
        .agg(sum(col("x") * col("w")).as("zz"), min(col("y")).as("y"))
        .select(col("doc_id"),
          QClassifier.planSigSpark(QClassifier.tdivSql("zz", "1000000")).as("sig"),
          col("y"))
        .select(col("doc_id"),
          when(col("y") === 1L, col("sig")).otherwise(lit(1000000L) - col("sig"))
            .as("c"))
      val per = c.groupBy(col("doc_id"))
        .agg(sum(col("c")).as("sc"), sum(col("c") * col("c")).as("sc2"))
        .select(col("doc_id"), expr("sc div 4").as("conf"),
          expr("(4 * sc2 - sc * sc) div 16").as("var_pp2"))
        .withColumn("region",
          when(col("var_pp2") >= QClassifier.CARTO_VAR_AMBIG, "ambiguous")
            .when(col("conf") >= 500000L, "easy").otherwise("hard"))
      per.groupBy(least(expr("conf div 100000"), lit(9L)).as("conf_bin"))
        .agg(count(lit(1)).as("n_docs"),
          expr("sum(var_pp2) div count(1)").as("avg_var_pp2"),
          sum(when(col("region") === "easy", 1L).otherwise(0L)).as("n_easy"),
          sum(when(col("region") === "ambiguous", 1L).otherwise(0L)).as("n_ambiguous"),
          sum(when(col("region") === "hard", 1L).otherwise(0L)).as("n_hard"))
        .orderBy(col("conf_bin"))
    }),

    // K-FOLD CROSS-VALIDATION of the trained classifier (k = 5, folds
    // by keyed hash): each fold's model trains on the other 4/5 of the
    // confident seeds and is scored on the HELD-OUT fold — the honest
    // generalization estimate for the distilled gate, per fold. The
    // fold models are dir-memoized; at 100 TB this is k trainings over
    // seed SUBSETS plus k broadcast scoring passes over the held-out
    // slices — no pass over the unlabeled corpus at all
    "q_text_cv" -> ((s: SparkSession, d: String) => {
      val docs = scan(s, d, "documents").select(col("doc_id"), col("text"))
      val models = QClassifier.foldModelsAll(docs, d, 5)
      import s.implicits._
      // every held-out doc scored by ITS OWN fold's model in one pass:
      // the (m, f, w) table broadcasts and the join pins m = fold(doc)
      val wdf = models.toSeq.flatMap { case (m, (w, _)) =>
        w.toSeq.map { case (f, wv) => (m.toLong, f, wv) }
      }.toDF("m", "f", "w")
      val ntr = models.toSeq.map { case (m, (_, n)) => (m.toLong, n) }
        .toDF("fold", "n_train")
      val lab = QClassifier.seedLabels(docs)
        .withColumn("fold", QClassifier.foldOf(5))
      val feats = QClassifier.featurize(docs).join(lab, "doc_id")
      val scored = feats
        .join(broadcast(wdf),
          feats("f") === wdf("f") && feats("fold") === wdf("m"))
        .groupBy(feats("doc_id"), feats("fold"))
        .agg(sum(feats("x") * wdf("w")).as("zz"), min(feats("y")).as("y"))
        .select(col("fold"),
          (QClassifier.planSigSpark(QClassifier.tdivSql("zz", "1000000"))
            >= 500000L).as("pred"), (col("y") === 1L).as("truth"))
      // fold SPINE from the model table (one row per fold by
      // construction), not from the scored census: a fold with zero
      // held-out seed docs (hash assignment at tiny SFs) must still
      // emit its row with n_test = 0 — the oracle's mdl-table left
      // join does, so an inner join here would be a row-count
      // divergence (ADVICE r14)
      val census = scored.groupBy(col("fold"))
        .agg(count(lit(1)).as("n_test"),
          sum(when(col("pred") === col("truth"), 1L).otherwise(0L)).as("n_right"))
      ntr.join(census, Seq("fold"), "left")
        .select(col("fold"), col("n_train"),
          coalesce(col("n_test"), lit(0L)).as("n_test"),
          coalesce(col("n_right"), lit(0L)).as("n_right"))
        .withColumn("acc_ppm", expr("n_right * 1000000 div GREATEST(n_test, 1)"))
        .orderBy(col("fold"))
    })
  )

  private def hex60(e: String): String = DedupQueries.sqlHex60Public(e)
  private val T = QClassifier.ITERS

  val oracleSql: Map[String, String] = Map(
    "q_text_qclassifier" ->
      s"""WITH ${QClassifier.oracleCtes(hex60)},
         |${QClassifier.oracleGdStages},
         |zf AS (SELECT tf.doc_id, CAST(SUM(tf.x * it$T.w) AS BIGINT) AS zz,
         |    MIN(tf.y) AS y
         |  FROM tf JOIN it$T USING (f) GROUP BY tf.doc_id),
         |fit AS (SELECT CAST(SUM(CASE WHEN
         |      ((${QClassifier.planSigDuck(
              "CASE WHEN zz >= 0 THEN zz // 1000000 ELSE -((-zz) // 1000000) END")}) >= 500000)
         |      = (y = 1) THEN 1 ELSE 0 END) AS BIGINT) AS n_right
         |  FROM zf)
         |SELECT it$T.f, it$T.w AS w_micro,
         |  (SELECT n FROM ntr) AS n_train, fit.n_right,
         |  CAST(fit.n_right * 1000000 // (SELECT n FROM ntr) AS BIGINT)
         |    AS train_acc_ppm
         |FROM it$T, fit ORDER BY it$T.f""".stripMargin,

    "q_text_qscore" ->
      s"""WITH ${QClassifier.oracleCtes(hex60)},
         |${QClassifier.oracleGdStages},
         |za AS (SELECT feats.doc_id, CAST(SUM(feats.x * it$T.w) AS BIGINT) AS zz
         |  FROM feats JOIN it$T USING (f) GROUP BY feats.doc_id),
         |sc AS (SELECT doc_id,
         |    (${QClassifier.planSigDuck(
              "CASE WHEN zz >= 0 THEN zz // 1000000 ELSE -((-zz) // 1000000) END")}) >= 500000
         |      AS keep
         |  FROM za),
         |sd AS (SELECT doc_id, m > 0 AS seed_keep FROM lab0)
         |SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(CASE WHEN sc.keep THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
         |  CAST(SUM(CASE WHEN sc.keep THEN 1 ELSE 0 END) * 1000000 // COUNT(*)
         |    AS BIGINT) AS keep_ppm,
         |  CAST(SUM(CASE WHEN sd.seed_keep THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_seed_keep,
         |  CAST(SUM(CASE WHEN sc.keep = sd.seed_keep THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_agree,
         |  CAST(SUM(CASE WHEN sc.keep = sd.seed_keep THEN 1 ELSE 0 END)
         |    * 1000000 // COUNT(*) AS BIGINT) AS agree_ppm
         |FROM sc JOIN sd USING (doc_id) JOIN documents d USING (doc_id)
         |GROUP BY d.source ORDER BY d.source""".stripMargin,

    "q_text_cartography" -> {
      val sig = QClassifier.planSigDuck(
        "CASE WHEN zz >= 0 THEN zz // 1000000 ELSE -((-zz) // 1000000) END")
      val trajArms = (5 to T).map { t =>
        s"""SELECT tf.doc_id, CAST(SUM(tf.x * it$t.w) AS BIGINT) AS zz,
           |    MIN(tf.y) AS y
           |  FROM tf JOIN it$t USING (f) GROUP BY tf.doc_id""".stripMargin
      }.mkString("\n  UNION ALL\n")
      s"""WITH ${QClassifier.oracleCtes(hex60)},
         |${QClassifier.oracleGdStages},
         |traj AS MATERIALIZED (
         |  $trajArms),
         |cs AS (SELECT doc_id,
         |    CAST(CASE WHEN y = 1 THEN ($sig)
         |      ELSE 1000000 - ($sig) END AS BIGINT) AS c
         |  FROM traj),
         |per AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS sc,
         |    CAST(SUM(c * c) AS BIGINT) AS sc2 FROM cs GROUP BY doc_id),
         |st AS (SELECT doc_id, CAST(sc // 4 AS BIGINT) AS conf,
         |    CAST((4 * sc2 - sc * sc) // 16 AS BIGINT) AS var_pp2 FROM per),
         |rg AS (SELECT conf, var_pp2,
         |    CASE WHEN var_pp2 >= ${QClassifier.CARTO_VAR_AMBIG} THEN 'ambiguous'
         |      WHEN conf >= 500000 THEN 'easy' ELSE 'hard' END AS region
         |  FROM st)
         |SELECT CAST(LEAST(conf // 100000, 9) AS BIGINT) AS conf_bin,
         |  CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(var_pp2) // COUNT(*) AS BIGINT) AS avg_var_pp2,
         |  CAST(SUM(CASE WHEN region = 'easy' THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_easy,
         |  CAST(SUM(CASE WHEN region = 'ambiguous' THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_ambiguous,
         |  CAST(SUM(CASE WHEN region = 'hard' THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_hard
         |FROM rg GROUP BY 1 ORDER BY conf_bin""".stripMargin
    },

    "q_text_cv" -> {
      val hf = hex60("md5('cv:' || CAST(doc_id AS VARCHAR))")
      val sig = QClassifier.planSigDuck(
        "CASE WHEN zz >= 0 THEN zz // 1000000 ELSE -((-zz) // 1000000) END")
      val foldChains = (0 until 5).map { f =>
        s"""tff$f AS MATERIALIZED (SELECT tf.doc_id, tf.f, tf.x, tf.y
           |  FROM tf JOIN folds USING (doc_id) WHERE folds.fold != $f),
           |ntrf$f AS (SELECT CAST(GREATEST(COUNT(DISTINCT doc_id), 1) AS BIGINT)
           |  AS n FROM tff$f),
           |${QClassifier.oracleGdStagesOver(s"tff$f", s"ntrf$f", s"f${f}_")},
           |tst$f AS (SELECT tf.doc_id,
           |    CAST(SUM(tf.x * itf${f}_${T}.w) AS BIGINT) AS zz, MIN(tf.y) AS y
           |  FROM tf JOIN itf${f}_$T USING (f)
           |    JOIN folds ON folds.doc_id = tf.doc_id AND folds.fold = $f
           |  GROUP BY tf.doc_id),
           |res$f AS (SELECT CAST($f AS BIGINT) AS fold,
           |    (SELECT n FROM ntrf$f) AS n_train,
           |    CAST(COUNT(*) AS BIGINT) AS n_test,
           |    CAST(COALESCE(SUM(CASE WHEN (($sig) >= 500000) = (y = 1)
           |      THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_right
           |  FROM tst$f)""".stripMargin
      }.mkString(",\n")
      val unionArms = (0 until 5).map(f =>
        s"SELECT fold, n_train, n_test, n_right," +
          s" CAST(n_right * 1000000 // GREATEST(n_test, 1) AS BIGINT) AS acc_ppm" +
          s" FROM res$f").mkString("\n  UNION ALL ")
      s"""WITH ${QClassifier.oracleCtes(hex60)},
         |folds AS MATERIALIZED (SELECT doc_id,
         |    CAST(($hf) % 5 AS BIGINT) AS fold FROM lab),
         |$foldChains
         |$unionArms
         |ORDER BY fold""".stripMargin
    }
  )
}
