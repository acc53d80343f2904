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
         |GROUP BY d.source ORDER BY d.source""".stripMargin
  )
}
