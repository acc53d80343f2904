package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.QueryBuilder.scan
import graft.ops.{Dedup, TextAnalysis}

/** The flagship LLM-training-data pipeline, end to end in one lazy plan
  * chain: quality filter → exact dedup (fingerprint, min-id survivor) →
  * near-dup removal (MinHash-LSH pairs → connected components → keep
  * cluster canonical) → deterministic hash-sample. Every stage is the
  * oracle-checked operator from its own query; this composes them the
  * way a production corpus-cleaning job would, with one DuckDB oracle
  * for the whole chain.
  */
object CorpusQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_corpus_clean" -> ((s: SparkSession, d: String) => {
      val docs = scan(s, d, "documents")

      // 1. quality gate: enough words, some stopword signal
      val quality = docs
        .withColumn("n_words", TextAnalysis.tokenCountWs(col("text")))
        .withColumn("stop_ratio", TextAnalysis.stopwordRatio(col("text"), TextAnalysis.defaultStopwords))
        .filter(col("n_words") >= 20 && col("stop_ratio") > 0.0)

      // 2. exact dedup: keep min doc_id per normalized fingerprint.
      // fp feeds BOTH the min-id groupBy and the join back; keepExact
      // feeds the near-dup input AND the final anti-join — persist each
      // once or the regex-heavy quality stage re-runs per consumer
      val fp = quality.withColumn("fp", TextAnalysis.fingerprint(col("text"))).persist()
      val keepExact = fp.groupBy(col("fp")).agg(min(col("doc_id")).as("doc_id"))
        .join(fp.select("doc_id", "lang", "source", "n_words"), "doc_id")
        .persist()

      // 3. near-dup removal: minhash pairs over survivors → CC →
      //    drop every doc that is not its cluster's canonical (min id)
      val pairs = Dedup.minhashDedup(
        keepExact.select(col("doc_id"), lit(null).as("unused"))
          .join(scan(s, d, "documents").select("doc_id", "text"), "doc_id"),
        "doc_id", "text", threshold = 0.5)
      val clusters = Dedup.connectedComponents(pairs)
      val dropNearDups = clusters.filter(col("doc_id") =!= col("cluster")).select("doc_id")
      val deduped = keepExact.join(dropNearDups, Seq("doc_id"), "left_anti")

      // 4. reproducible 50% sample by content-free hash
      deduped
        .filter(Dedup.hex60(md5(concat(lit("corpus:"), col("doc_id").cast("string")).cast("binary"))) % 2 === 0)
        .select(col("doc_id"), col("lang"), col("source"), col("n_words").cast("long").as("n_words"))
        .orderBy(col("doc_id"))
    })
  )

  private val stopList = TextAnalysis.defaultStopwords.map(w => s"'$w'").mkString("[", ",", "]")

  val oracleSql: Map[String, String] = Map(
    "q_corpus_clean" -> {
      // reuse the minhash CTE text over the exact-dedup survivors
      val minhash = DedupQueries.minhashCtesOver("survivors_text")
      raw"""WITH RECURSIVE qual AS (
           |  SELECT doc_id, lang, source, text,
           |    CASE WHEN length(trim(text)) = 0 THEN 0
           |         ELSE len(string_split_regex(trim(text), '\s+')) END AS n_words,
           |    len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
           |        w -> list_contains($stopList, w))) AS n_stop
           |  FROM documents),
           |quality AS (
           |  SELECT * FROM qual
           |  WHERE n_words >= 20
           |    AND CAST(n_stop AS DOUBLE) / greatest(CAST(n_words AS DOUBLE), 1.0) > 0.0),
           |fp AS (SELECT *, md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fpv FROM quality),
           |keep_exact AS (
           |  SELECT f.* FROM fp f
           |  JOIN (SELECT fpv, MIN(doc_id) AS doc_id FROM fp GROUP BY fpv) k
           |    ON f.doc_id = k.doc_id),
           |survivors_text AS (SELECT doc_id, text FROM keep_exact),
           |$minhash,
           |edges AS (
           |  SELECT doc_a AS a, doc_b AS b FROM pairsq
           |  UNION SELECT doc_b, doc_a FROM pairsq),
           |reach(src, dst) AS (
           |  SELECT a, b FROM edges
           |  UNION
           |  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
           |clusters AS (
           |  SELECT src AS doc_id, least(src, min(dst)) AS cluster
           |  FROM reach GROUP BY src),
           |near_dups AS (SELECT doc_id FROM clusters WHERE doc_id <> cluster),
           |deduped AS (
           |  SELECT k.* FROM keep_exact k
           |  WHERE NOT EXISTS (SELECT 1 FROM near_dups n WHERE n.doc_id = k.doc_id))
           |SELECT doc_id, lang, source, CAST(n_words AS BIGINT) AS n_words
           |FROM deduped
           |WHERE ${DedupQueries.sqlHex60Public("md5('corpus:' || doc_id::VARCHAR)")} % 2 = 0
           |ORDER BY doc_id""".stripMargin
    }
  )
}
