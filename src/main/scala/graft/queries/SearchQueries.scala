package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.QueryBuilder.scan

/** Text-retrieval queries: inverted-index keyword search with AND
  * semantics and df-normalized relevance ranking (a log-free tf·(N/df)
  * score — log() is libm-dependent and would break the bit-exact oracle;
  * the ranking ORDER is the same monotone transform), plus the
  * cross-modal text⋈embedding join.
  */
object SearchQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // term stats: the inverted index a search layer builds once
    "q_text_termstats" -> ((s: SparkSession, d: String) => {
      val words = scan(s, d, "documents")
        .select(col("doc_id"), explode(split(trim(lower(col("text"))), "\\s+")).as("term"))
      words.groupBy(col("term"))
        .agg(count(lit(1)).as("tf_total"),
          countDistinct(col("doc_id")).as("df"))
        .filter(col("df") >= 5)
        .orderBy(col("term"))
    }),

    // AND-semantics keyword search ranked by Σ tf·(N/df), ties by doc_id
    "q_text_search" -> ((s: SparkSession, d: String) => {
      val docs = scan(s, d, "documents")
      val nDocs = docs.count() // small metadata count; N is a plan constant
      val terms = Seq("spark", "window")
      val words = docs
        .select(col("doc_id"), explode(split(trim(lower(col("text"))), "\\s+")).as("term"))
        .filter(col("term").isin(terms: _*))
      val df_ = words.groupBy("term").agg(countDistinct(col("doc_id")).as("df"))
      val tf = words.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      tf.join(df_, "term")
        .withColumn("w", col("tf").cast("double") * (lit(nDocs.toDouble) / col("df").cast("double")))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_terms"), graft.ops.ExactAgg.dsum(col("w"), 6).as("score"))
        .filter(col("n_terms") === terms.length) // AND semantics
        .select(col("doc_id"), col("score"))
        .orderBy(col("score").desc, col("doc_id"))
        .limit(50)
    }),

    // BM25-shaped ranked retrieval (OR semantics): tf saturation (k1) +
    // doc-length normalization (b) + RATIONAL idf (N-df+0.5)/(df+0.5) —
    // the log() of textbook BM25 is libm-dependent and would break the
    // bit-exact oracle; the rational idf is the same monotone ranking
    // signal. Per-term weights are floor-scaled to integers (1e9) before
    // the per-doc sum, so the distributed summation is order-independent
    // and hash-matches DuckDB exactly
    "q_text_bm25" -> ((s: SparkSession, d: String) => {
      val k1 = 1.2
      val b = 0.75
      val terms = Seq("spark", "window")
      val docs = scan(s, d, "documents")
      val nDocs = docs.count() // metadata-scale driver constants
      val words = docs
        .select(col("doc_id"), explode(split(trim(lower(col("text"))), "\\s+")).as("term"))
      val nWords = words.count()
      val avgdl = nWords.toDouble / nDocs.toDouble
      val dl = words.groupBy("doc_id").agg(count(lit(1)).cast("double").as("dl"))
      val ws = words.filter(col("term").isin(terms: _*))
      val dfq = ws.groupBy("term").agg(countDistinct(col("doc_id")).cast("double").as("df"))
      val tf = ws.groupBy("doc_id", "term").agg(count(lit(1)).cast("double").as("tf"))
      val idf = (lit(nDocs.toDouble) - col("df") + lit(0.5)) / (col("df") + lit(0.5))
      val sat = (col("tf") * lit(k1 + 1.0)) /
        (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / lit(avgdl)))
      tf.join(dfq, "term").join(dl, "doc_id")
        .withColumn("w9", floor(idf * sat * lit(1e9)).cast("long"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_terms"), sum(col("w9")).as("score_x9"))
        .orderBy(col("score_x9").desc, col("doc_id"))
        .limit(50)
    }),

    // cross-modal: documents joined to their embedding rows
    "q_multimodal_join" -> ((s: SparkSession, d: String) => {
      val docs = scan(s, d, "documents")
      val emb = scan(s, d, "embeddings")
      docs.join(emb, docs("doc_id") === emb("vec_id"))
        .select(col("doc_id"), col("lang"), col("label"),
          col("n_chars"), size(col("embedding")).as("dims"))
        .orderBy(col("doc_id"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q_text_termstats" ->
      raw"""WITH w AS (
           |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
           |  FROM documents)
           |SELECT term, COUNT(*) AS tf_total, COUNT(DISTINCT doc_id) AS df
           |FROM w GROUP BY term HAVING COUNT(DISTINCT doc_id) >= 5
           |ORDER BY term""".stripMargin,
    "q_text_search" ->
      raw"""WITH n AS (SELECT COUNT(*)::DOUBLE AS n_docs FROM documents),
           |w AS (
           |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
           |  FROM documents),
           |f AS (SELECT doc_id, term FROM w WHERE term IN ('spark', 'window')),
           |dfreq AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM f GROUP BY term),
           |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM f GROUP BY doc_id, term),
           |scored AS (
           |  SELECT tf.doc_id, COUNT(*) AS n_terms,
           |    CAST(SUM(CAST(CAST(tf.tf AS DOUBLE) * (n.n_docs / CAST(d.df AS DOUBLE))
           |        AS DECIMAL(30,6))) AS DOUBLE) AS score
           |  FROM tf JOIN dfreq d ON tf.term = d.term CROSS JOIN n
           |  GROUP BY tf.doc_id)
           |SELECT doc_id, score FROM scored WHERE n_terms = 2
           |ORDER BY score DESC, doc_id LIMIT 50""".stripMargin,
    "q_text_bm25" ->
      raw"""WITH w AS (
           |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
           |  FROM documents),
           |consts AS (
           |  SELECT (SELECT COUNT(*)::DOUBLE FROM documents) AS n_docs,
           |         ((SELECT COUNT(*)::DOUBLE FROM w)
           |          / (SELECT COUNT(*)::DOUBLE FROM documents)) AS avgdl),
           |dl AS (SELECT doc_id, COUNT(*)::DOUBLE AS dl FROM w GROUP BY doc_id),
           |f AS (SELECT doc_id, term FROM w WHERE term IN ('spark', 'window')),
           |dfreq AS (SELECT term, COUNT(DISTINCT doc_id)::DOUBLE AS df FROM f GROUP BY term),
           |tf AS (SELECT doc_id, term, COUNT(*)::DOUBLE AS tf FROM f GROUP BY doc_id, term),
           |weighted AS (
           |  SELECT tf.doc_id,
           |    CAST(floor(
           |      ((c.n_docs - d.df + 0.5) / (d.df + 0.5))
           |      * ((tf.tf * 2.2) / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * l.dl / c.avgdl)))
           |      * 1e9) AS BIGINT) AS w9
           |  FROM tf
           |    JOIN dfreq d ON tf.term = d.term
           |    JOIN dl l ON l.doc_id = tf.doc_id
           |    CROSS JOIN consts c)
           |SELECT doc_id, COUNT(*) AS n_terms, CAST(SUM(w9) AS BIGINT) AS score_x9
           |FROM weighted GROUP BY doc_id
           |ORDER BY score_x9 DESC, doc_id LIMIT 50""".stripMargin,
    "q_multimodal_join" ->
      """SELECT doc_id, lang, label, n_chars, CAST(len(embedding) AS INT) AS dims
        |FROM documents JOIN embeddings ON doc_id = vec_id
        |ORDER BY doc_id""".stripMargin
  )
}
