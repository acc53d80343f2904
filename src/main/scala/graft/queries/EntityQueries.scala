package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.QueryBuilder.scan
import graft.ops.EntityResolution

/** Entity-resolution (record linkage) tier over the customer table — the
  * canonical post-load job for the reference's CRM-facing adapters
  * (adapters/hubspot/src/index.ts, adapters/stripe/src/index.ts sync
  * contact/customer objects from two systems; the warehouse must link
  * and merge them). Fellegi–Sunter blocking → agreement vectors →
  * integer score → threshold → components → golden record, all in exact
  * arithmetic so DuckDB replays every stage.
  *
  * The messy input is derived deterministically from the clean customer
  * table ([[EntityResolution.dirtyRecords]]) by the same recipe in both
  * engines — corruption classes: case-flip, nulled segment,
  * cents-rounded balance.
  */
object EntityQueries {

  import EntityResolution._

  private def records(s: SparkSession, d: String): (DataFrame, Int) = {
    val customer = scan(s, d, "customer")
    // metadata-scale driver action (cf. the embed query's adaptive LSH
    // depth): the count only picks the blocking suffix length
    val n = customer.count()
    (dirtyRecords(customer), suffixLen(n))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // candidate pairs with their full agreement vector + score — the
    // auditable middle of the pipeline (clerical-review surface)
    "q_er_candidates" -> ((s: SparkSession, d: String) => {
      val (recs, len) = records(s, d)
      candidates(recs, len).orderBy(col("rec_a"), col("rec_b"))
    }),

    // thresholded matches (score >= 6)
    "q_er_matches" -> ((s: SparkSession, d: String) => {
      val (recs, len) = records(s, d)
      matches(candidates(recs, len))
        .select(col("rec_a"), col("rec_b"), col("score"))
        .orderBy(col("rec_a"), col("rec_b"))
    }),

    // golden records: one survivor row per linked entity (+ singletons)
    "q_er_golden" -> ((s: SparkSession, d: String) => {
      val (recs, len) = records(s, d)
      golden(recs, matches(candidates(recs, len)))
        .orderBy(col("entity_id"))
    })
  )

  private val suffixSql = suffixLenSql("SELECT count(*) FROM customer")

  private val erCtes =
    s"""${EntityResolution.dirtyRecordsSql},
       |${EntityResolution.candidatesSql(suffixSql)}""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q_er_candidates" ->
      s"""WITH $erCtes
         |SELECT rec_a, rec_b, name_agree, bal_agree, seg_agree, score
         |FROM scored ORDER BY rec_a, rec_b""".stripMargin,

    "q_er_matches" ->
      s"""WITH $erCtes
         |SELECT rec_a, rec_b, score FROM scored
         |WHERE score >= $matchThreshold ORDER BY rec_a, rec_b""".stripMargin,

    "q_er_golden" ->
      s"""WITH RECURSIVE $erCtes,
         |matched AS (SELECT rec_a, rec_b FROM scored WHERE score >= $matchThreshold),
         |edges AS (
         |  SELECT rec_a AS a, rec_b AS b FROM matched
         |  UNION SELECT rec_b, rec_a FROM matched),
         |reach(src, dst) AS (
         |  SELECT a, b FROM edges
         |  UNION
         |  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
         |lab AS (SELECT src AS rec_id, least(src, min(dst)) AS cluster
         |        FROM reach GROUP BY src),
         |labeled AS (
         |  SELECT r.rec_id, r.segment, r.bal_cents,
         |         coalesce(l.cluster, r.rec_id) AS cluster
         |  FROM records r LEFT JOIN lab l ON l.rec_id = r.rec_id),
         |entity AS (
         |  SELECT cluster AS entity_id, COUNT(*) AS n_records,
         |         min(segment) AS merged_segment,
         |         max(bal_cents) AS best_bal_cents
         |  FROM labeled GROUP BY cluster)
         |SELECT e.entity_id, r.name AS canonical_name, r.nation,
         |       e.merged_segment, e.best_bal_cents, e.n_records
         |FROM entity e JOIN records r ON r.rec_id = e.entity_id
         |ORDER BY entity_id""".stripMargin
  )
}
