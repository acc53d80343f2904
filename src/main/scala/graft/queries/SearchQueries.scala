package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
    "q_text_bm25" -> ((s: SparkSession, d: String) =>
      bm25Scored(s, d)
        .orderBy(col("score_x9").desc, col("doc_id"))
        .limit(50)),

    // RECIPROCAL RANK FUSION (Cormack, Clarke & Buettcher, SIGIR 2009):
    // the standard hybrid-retrieval combiner — one lexical arm (the BM25
    // integer scores above), one vector arm (brute cosine vs query
    // vector 0, the q_sim_topk shape), each truncated to its top-100,
    // fused by Σ floor(1e6/(60+rank)). Ranks come from a row_number over
    // an ALREADY-LIMITED 100-row relation (the blessed tiny-side window
    // — never a global window over the corpus), and the fused score is
    // an exact integer, so the result hash-matches DuckDB with no
    // floating-point fusion drift. Docs present in only one arm keep a
    // null rank on the other (full outer join), contributing 0.
    "q_text_rrf" -> ((s: SparkSession, d: String) => {
      import org.apache.spark.sql.expressions.Window
      val emb = scan(s, d, "embeddings")
      val lex = bm25Scored(s, d)
        .orderBy(col("score_x9").desc, col("doc_id")).limit(RRF_N)
        .withColumn("r_lex",
          row_number().over(Window.orderBy(col("score_x9").desc, col("doc_id"))))
        .select(col("doc_id"), col("r_lex"))
      val vec = graft.ops.Similarity.bruteTopK(
          emb.filter(col("vec_id") =!= 0), "vec_id", "embedding",
          emb.filter(col("vec_id") === 0), "embedding", k = RRF_N)
        .withColumn("r_vec",
          row_number().over(Window.orderBy(col("cosine").desc, col("vec_id"))))
        .select(col("vec_id").as("doc_id"), col("r_vec"))
      def contrib(r: Column): Column =
        coalesce(floor(lit(1000000.0) / (lit(RRF_K) + r)), lit(0L))
      lex.join(vec, Seq("doc_id"), "full_outer")
        .withColumn("rrf_x6", contrib(col("r_lex")) + contrib(col("r_vec")))
        .select(col("doc_id"), col("r_lex"), col("r_vec"), col("rrf_x6"))
        .orderBy(col("rrf_x6").desc, col("doc_id"))
        .limit(20)
    }),

    // TF-IDF KEYWORD EXTRACTION: top-5 terms per doc by the log-free
    // tf·(N/df) weight (floor-scaled to integer — same monotone ranking,
    // bit-exact cross-engine), selected through the TopKPerKey PHYSICAL
    // operator: partial per-partition heaps prune to ≤5 rows per doc per
    // partition BEFORE the shuffle — a window rank would shuffle the
    // whole (doc, term) relation and keep every row until the filter
    "q_text_keywords" -> ((s: SparkSession, d: String) => {
      val docs = scan(s, d, "documents")
      val nDocs = docs.count() // metadata-scale plan constant
      val words = docs
        .select(col("doc_id"), explode(split(trim(lower(col("text"))), "\\s+")).as("term"))
      val tf = words.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val dfq = words.groupBy("term").agg(countDistinct(col("doc_id")).as("df"))
      val scored = tf.join(dfq, "term")
        .withColumn("tfidf_x9",
          floor(col("tf").cast("double")
            * (lit(nDocs.toDouble) / col("df").cast("double")) * lit(1e9)).cast("long"))
      graft.plans.TopKPerKey.topKPerKey(scored,
          keyCols = Seq("doc_id"), sorts = Seq(("tfidf_x9", false), ("term", true)), k = 5)
        .select(col("doc_id"), col("term"), col("tfidf_x9"))
        .orderBy(col("doc_id"), col("tfidf_x9").desc, col("term"))
    }),

    // RETRIEVAL-EVAL HARNESS (MRR@10 / hits@1 census): the IR-quality
    // number a search deploy publishes. Query set = the 20 highest-df
    // terms (deterministic: df desc, term asc); "relevant" doc per
    // query = the LONGEST doc containing the term (n_chars desc,
    // doc_id asc — a synthetic relevance independent of the ranking
    // signal, so the metric is non-trivial); ranking = per-term tf
    // (within a single-term query idf is a constant), top-10 selected
    // through the TopKPerKey physical operator, ranks from a window
    // over the ≤ 20×10 survivor relation (the blessed tiny window).
    // Reciprocal ranks are exact integers: floor(1e6 / rank)
    "q_text_mrr" -> ((s: SparkSession, d: String) => {
      import org.apache.spark.sql.expressions.Window
      val docs = scan(s, d, "documents")
      val words = docs.select(col("doc_id"),
        explode(split(trim(lower(col("text"))), "\\s+")).as("term"))
      val tf = words.groupBy(col("term"), col("doc_id")).agg(count(lit(1)).as("tf"))
      val dfq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val qset = dfq.orderBy(col("df").desc, col("term").asc).limit(20)
        .select(col("term"))
      val rel = tf.join(broadcast(qset), Seq("term"))
        .join(docs.select(col("doc_id"), col("n_chars")), Seq("doc_id"))
        .groupBy(col("term"))
        .agg(max(struct(col("n_chars"), (-col("doc_id")).as("negid"))).as("m"))
        .select(col("term"), (-col("m.negid")).as("rel_doc"))
      val ranked = graft.plans.TopKPerKey.topKPerKey(
          tf.join(broadcast(qset), Seq("term")),
          keyCols = Seq("term"), sorts = Seq(("tf", false), ("doc_id", true)), k = 10)
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("term")).orderBy(col("tf").desc, col("doc_id"))))
      rel.join(
          ranked.select(col("term"), col("doc_id").as("rel_doc"), col("rank")),
          Seq("term", "rel_doc"), "left")
        .select(col("term"), col("rel_doc"),
          coalesce(col("rank"), lit(0)).cast("long").as("rank_in_top10"),
          coalesce(expr("1000000 div rank"), lit(0)).cast("long").as("rr_x6"))
        .orderBy(col("term"))
    }),

    // MEAN-AVERAGE-PRECISION@10 — the third classic retrieval-eval
    // readout beside MRR@10 and nDCG@10, completing the family: per
    // query term AP = (1/min(n_rel,10)) Σ_{hit at rank k} P@k, kept
    // EXACT by scaling every precision by 2520 = lcm(1..10) (2520/k
    // and the cumulative-hit numerators are integers — no float, no
    // tolerance). Same deterministic sys/ideal rankings and TopKPerKey
    // pruning as q_text_ndcg; the AP windows run over the ≤ 20×10
    // survivor relation only
    "q_text_map" -> ((s: SparkSession, d: String) => {
      import org.apache.spark.sql.expressions.Window
      val docs = scan(s, d, "documents")
      val words = docs.select(col("doc_id"),
        explode(split(trim(lower(col("text"))), "\\s+")).as("term"))
      val tf = words.groupBy(col("term"), col("doc_id")).agg(count(lit(1)).as("tf"))
      val dfq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val qset = dfq.orderBy(col("df").desc, col("term").asc).limit(20)
        .select(col("term"))
      val matches = tf.join(broadcast(qset), Seq("term"))
        .join(docs.select(col("doc_id"), col("n_chars")), Seq("doc_id"))
      val ideal = graft.plans.TopKPerKey.topKPerKey(matches,
          keyCols = Seq("term"), sorts = Seq(("n_chars", false), ("doc_id", true)), k = 10)
        .select(col("term"), col("doc_id"))
      val sys = graft.plans.TopKPerKey.topKPerKey(
          tf.join(broadcast(qset), Seq("term")),
          keyCols = Seq("term"), sorts = Seq(("tf", false), ("doc_id", true)), k = 10)
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("term")).orderBy(col("tf").desc, col("doc_id"))))
        .select(col("term"), col("doc_id"), col("rank"))
      val nrel = ideal.groupBy(col("term")).agg(count(lit(1)).as("n_rel"))
      val hits = sys.join(ideal, Seq("term", "doc_id"))
        .withColumn("cumhits", row_number().over(
          Window.partitionBy(col("term")).orderBy(col("rank"))))
        .withColumn("contrib", col("cumhits") * expr("2520 div rank"))
      val ap = hits.groupBy(col("term"))
        .agg(count(lit(1)).as("hits"), sum(col("contrib")).as("ap_x2520"))
      nrel.join(ap, Seq("term"), "left")
        .select(col("term"), col("n_rel"),
          coalesce(col("hits"), lit(0L)).as("hits"),
          coalesce(col("ap_x2520"), lit(0L)).as("ap_x2520"),
          expr("coalesce(ap_x2520, CAST(0 AS BIGINT)) * 1000000 div (2520 * least(n_rel, 10))")
            .as("ap_ppm"))
        .orderBy(col("term"))
    }),

    // RANKING-QUALITY COMPLETENESS: nDCG@10 + recall@10 per query,
    // beside q_text_mrr's MRR@10 — the graded-relevance metrics a
    // retrieval eval publishes. Graded relevance derives from the same
    // synthetic signal as MRR's single relevant doc (longer = more
    // relevant, independent of the tf ranking signal): the term's ideal
    // top-10 by (n_chars desc, doc_id) carries gains 2^rel−1 = 7/3/1
    // (rank 1 / ranks 2-3 / ranks 4-10), everything else 0. The
    // 1/log2(r+1) discount runs in FIXED POINT: round(1e6/log2(r+1))
    // literals emitted into BOTH engines from [[ndcgW]] (the q_ts_dft
    // trig-table discipline — zero query-time libm, bit-exact compare).
    // Both rankings go through TopKPerKey (partial per-partition heaps
    // prune before the shuffle); the row_number windows run over the
    // ≤ 20×10 SURVIVOR relations only — PlanQualitySpec asserts no
    // corpus-wide window
    "q_text_ndcg" -> ((s: SparkSession, d: String) => {
      import org.apache.spark.sql.expressions.Window
      val docs = scan(s, d, "documents")
      val words = docs.select(col("doc_id"),
        explode(split(trim(lower(col("text"))), "\\s+")).as("term"))
      val tf = words.groupBy(col("term"), col("doc_id")).agg(count(lit(1)).as("tf"))
      val dfq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val qset = dfq.orderBy(col("df").desc, col("term").asc).limit(20)
        .select(col("term"))
      val matches = tf.join(broadcast(qset), Seq("term"))
        .join(docs.select(col("doc_id"), col("n_chars")), Seq("doc_id"))
      val ideal = graft.plans.TopKPerKey.topKPerKey(matches,
          keyCols = Seq("term"), sorts = Seq(("n_chars", false), ("doc_id", true)), k = 10)
        .withColumn("irank", row_number().over(
          Window.partitionBy(col("term")).orderBy(col("n_chars").desc, col("doc_id"))))
        .withColumn("gain",
          when(col("irank") === 1, 7L).when(col("irank") <= 3, 3L).otherwise(1L))
        .select(col("term"), col("doc_id"), col("irank"), col("gain"))
      val sys = graft.plans.TopKPerKey.topKPerKey(
          tf.join(broadcast(qset), Seq("term")),
          keyCols = Seq("term"), sorts = Seq(("tf", false), ("doc_id", true)), k = 10)
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("term")).orderBy(col("tf").desc, col("doc_id"))))
        .select(col("term"), col("doc_id"), col("rank"))
      val wTab = typedLit(ndcgW)
      val dcg = sys
        .join(ideal.select(col("term"), col("doc_id"), col("gain")),
          Seq("term", "doc_id"), "left")
        .withColumn("wr", element_at(wTab, col("rank").cast("int")))
        .groupBy(col("term"))
        .agg(sum(coalesce(col("gain"), lit(0L)) * col("wr")).as("dcg_x6"))
      val idcg = ideal
        .withColumn("wr", element_at(wTab, col("irank").cast("int")))
        .groupBy(col("term"))
        .agg(count(lit(1)).as("n_rel"), sum(col("gain") * col("wr")).as("idcg_x6"))
      val hits = sys.join(ideal.select(col("term"), col("doc_id")), Seq("term", "doc_id"))
        .groupBy(col("term")).agg(count(lit(1)).as("hits"))
      idcg.join(dcg, Seq("term")).join(hits, Seq("term"), "left")
        .select(col("term"), col("n_rel"),
          coalesce(col("hits"), lit(0L)).as("hits"),
          expr("coalesce(hits, CAST(0 AS BIGINT)) * 1000000 div n_rel").as("recall_ppm"),
          col("dcg_x6"), col("idcg_x6"),
          expr("dcg_x6 * 1000000 div idcg_x6").as("ndcg_ppm"))
        .orderBy(col("term"))
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

  // RRF constants shared by the Scala pipeline and the oracle SQL
  private val RRF_K = 60 // the standard k=60 damping from the RRF paper
  private val RRF_N = 100 // per-arm candidate depth

  /** nDCG rank discounts round(1e6 / log2(r+1)), r = 1..10 — ONE table
    * emitted as literals into both the engine expression and the oracle
    * SQL (the shared fixed-point trig-table discipline from q_ts_dft:
    * both sides compare on identical integers, no query-time libm). */
  private val ndcgW: Seq[Long] =
    (1 to 10).map(r => math.round(1e6 / (math.log(r + 1.0) / math.log(2.0))))
  private def ndcgWValues: String =
    (1 to 10).map(r => s"(${r}, ${ndcgW(r - 1)})").mkString(", ")

  /** Per-doc BM25 integer scores (doc_id, n_terms, score_x9) — the body
    * shared by q_text_bm25 (ranked list) and q_text_rrf (lexical arm).
    * See the q_text_bm25 comment for the rational-idf / integer-weight
    * rationale.
    */
  private def bm25Scored(s: SparkSession, d: String): DataFrame = {
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
  }

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
      s"""WITH $bm25Ctes
         |SELECT doc_id, n_terms, score_x9 FROM scored
         |ORDER BY score_x9 DESC, doc_id LIMIT 50""".stripMargin,

    "q_text_rrf" ->
      s"""WITH $bm25Ctes,
         |lexr AS (
         |  SELECT doc_id, CAST(row_number() OVER (ORDER BY score_x9 DESC, doc_id) AS INT) AS r_lex
         |  FROM (SELECT doc_id, score_x9 FROM scored
         |        ORDER BY score_x9 DESC, doc_id LIMIT $RRF_N)),
         |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |pairs AS (
         |  SELECT e.vec_id AS id_a, 0 AS id_b, e.embedding AS va, q.qv AS vb
         |  FROM embeddings e, q WHERE e.vec_id <> 0),
         |${SimilarityQueries.sqlCosineCtes},
         |vecr AS (
         |  SELECT doc_id, CAST(row_number() OVER (ORDER BY cosine DESC, doc_id) AS INT) AS r_vec
         |  FROM (SELECT id_a AS doc_id, cosine FROM cos
         |        ORDER BY cosine DESC, id_a LIMIT $RRF_N)),
         |fused AS (
         |  SELECT COALESCE(l.doc_id, v.doc_id) AS doc_id, l.r_lex, v.r_vec,
         |    COALESCE(CAST(floor(1000000.0 / ($RRF_K + l.r_lex)) AS BIGINT), 0)
         |    + COALESCE(CAST(floor(1000000.0 / ($RRF_K + v.r_vec)) AS BIGINT), 0) AS rrf_x6
         |  FROM lexr l FULL OUTER JOIN vecr v ON l.doc_id = v.doc_id)
         |SELECT doc_id, r_lex, r_vec, rrf_x6 FROM fused
         |ORDER BY rrf_x6 DESC, doc_id LIMIT 20""".stripMargin,
    "q_multimodal_join" ->
      """SELECT doc_id, lang, label, n_chars, CAST(len(embedding) AS INT) AS dims
        |FROM documents JOIN embeddings ON doc_id = vec_id
        |ORDER BY doc_id""".stripMargin,

    "q_text_mrr" ->
      raw"""WITH w AS (
           |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
           |  FROM documents),
           |tf AS (SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
           |       FROM w GROUP BY 1, 2),
           |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
           |q AS (SELECT term FROM dfq ORDER BY df DESC, term LIMIT 20),
           |relr AS (SELECT t.term, t.doc_id,
           |           row_number() OVER (PARTITION BY t.term
           |             ORDER BY d.n_chars DESC, t.doc_id) AS rr
           |         FROM tf t JOIN q USING (term)
           |              JOIN documents d ON d.doc_id = t.doc_id),
           |rel AS (SELECT term, doc_id AS rel_doc FROM relr WHERE rr = 1),
           |rk AS (SELECT t.term, t.doc_id,
           |         row_number() OVER (PARTITION BY t.term
           |           ORDER BY t.tf DESC, t.doc_id) AS rn
           |       FROM tf t JOIN q USING (term)),
           |rk10 AS (SELECT * FROM rk WHERE rn <= 10)
           |SELECT r.term, r.rel_doc,
           |  CAST(COALESCE(k.rn, 0) AS BIGINT) AS rank_in_top10,
           |  CAST(COALESCE(1000000 // k.rn, 0) AS BIGINT) AS rr_x6
           |FROM rel r LEFT JOIN rk10 k ON k.term = r.term AND k.doc_id = r.rel_doc
           |ORDER BY r.term""".stripMargin,

    "q_text_map" ->
      raw"""WITH w AS (
           |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
           |  FROM documents),
           |tf AS (SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
           |       FROM w GROUP BY 1, 2),
           |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
           |q AS (SELECT term FROM dfq ORDER BY df DESC, term LIMIT 20),
           |m AS (SELECT t.term, t.doc_id, t.tf, d.n_chars
           |      FROM tf t JOIN q USING (term)
           |           JOIN documents d ON d.doc_id = t.doc_id),
           |ir AS (SELECT term, doc_id,
           |         row_number() OVER (PARTITION BY term
           |           ORDER BY n_chars DESC, doc_id) AS irank FROM m),
           |ideal AS (SELECT term, doc_id FROM ir WHERE irank <= 10),
           |sr AS (SELECT term, doc_id,
           |         row_number() OVER (PARTITION BY term
           |           ORDER BY tf DESC, doc_id) AS rank FROM m),
           |sys AS (SELECT * FROM sr WHERE rank <= 10),
           |nrel AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS n_rel
           |         FROM ideal GROUP BY term),
           |h AS (SELECT s.term, s.rank,
           |        row_number() OVER (PARTITION BY s.term ORDER BY s.rank) AS cumhits
           |      FROM sys s JOIN ideal i ON i.term = s.term AND i.doc_id = s.doc_id),
           |ap AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS hits,
           |         CAST(SUM(cumhits * (2520 // rank)) AS BIGINT) AS ap_x2520
           |       FROM h GROUP BY term)
           |SELECT n.term, n.n_rel,
           |  CAST(COALESCE(ap.hits, 0) AS BIGINT) AS hits,
           |  CAST(COALESCE(ap.ap_x2520, 0) AS BIGINT) AS ap_x2520,
           |  CAST(COALESCE(ap.ap_x2520, 0) * 1000000
           |    // (2520 * LEAST(n.n_rel, 10)) AS BIGINT) AS ap_ppm
           |FROM nrel n LEFT JOIN ap ON ap.term = n.term
           |ORDER BY n.term""".stripMargin,

    "q_text_ndcg" ->
      raw"""WITH wt(r, wr) AS (VALUES $ndcgWValues),
           |w AS (
           |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
           |  FROM documents),
           |tf AS (SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
           |       FROM w GROUP BY 1, 2),
           |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
           |q AS (SELECT term FROM dfq ORDER BY df DESC, term LIMIT 20),
           |m AS (SELECT t.term, t.doc_id, t.tf, d.n_chars
           |      FROM tf t JOIN q USING (term)
           |           JOIN documents d ON d.doc_id = t.doc_id),
           |ir AS (SELECT term, doc_id,
           |         row_number() OVER (PARTITION BY term
           |           ORDER BY n_chars DESC, doc_id) AS irank FROM m),
           |ideal AS (SELECT term, doc_id, irank,
           |            CASE WHEN irank = 1 THEN 7 WHEN irank <= 3 THEN 3 ELSE 1 END AS gain
           |          FROM ir WHERE irank <= 10),
           |sr AS (SELECT term, doc_id,
           |         row_number() OVER (PARTITION BY term
           |           ORDER BY tf DESC, doc_id) AS rank FROM m),
           |sys AS (SELECT * FROM sr WHERE rank <= 10),
           |dcg AS (SELECT s.term,
           |          CAST(SUM(COALESCE(i.gain, 0) * wt.wr) AS BIGINT) AS dcg_x6
           |        FROM sys s JOIN wt ON wt.r = s.rank
           |          LEFT JOIN ideal i ON i.term = s.term AND i.doc_id = s.doc_id
           |        GROUP BY s.term),
           |idcg AS (SELECT i.term, CAST(COUNT(*) AS BIGINT) AS n_rel,
           |           CAST(SUM(i.gain * wt.wr) AS BIGINT) AS idcg_x6
           |         FROM ideal i JOIN wt ON wt.r = i.irank GROUP BY i.term),
           |h AS (SELECT s.term, CAST(COUNT(*) AS BIGINT) AS hits
           |      FROM sys s JOIN ideal i ON i.term = s.term AND i.doc_id = s.doc_id
           |      GROUP BY s.term)
           |SELECT idcg.term, idcg.n_rel,
           |  CAST(COALESCE(h.hits, 0) AS BIGINT) AS hits,
           |  CAST(COALESCE(h.hits, 0) * 1000000 // idcg.n_rel AS BIGINT) AS recall_ppm,
           |  dcg.dcg_x6, idcg.idcg_x6,
           |  CAST(dcg.dcg_x6 * 1000000 // idcg.idcg_x6 AS BIGINT) AS ndcg_ppm
           |FROM idcg JOIN dcg ON dcg.term = idcg.term
           |  LEFT JOIN h ON h.term = idcg.term
           |ORDER BY idcg.term""".stripMargin,

    "q_text_keywords" ->
      raw"""WITH n AS (SELECT COUNT(*)::DOUBLE AS n_docs FROM documents),
           |w AS (
           |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
           |  FROM documents),
           |tf AS (SELECT doc_id, term, count(*) AS tf FROM w GROUP BY doc_id, term),
           |dfq AS (SELECT term, count(DISTINCT doc_id) AS df FROM w GROUP BY term),
           |scored AS (
           |  SELECT tf.doc_id, tf.term,
           |    CAST(floor(CAST(tf.tf AS DOUBLE) * (n.n_docs / CAST(d.df AS DOUBLE)) * 1e9)
           |      AS BIGINT) AS tfidf_x9
           |  FROM tf JOIN dfq d ON tf.term = d.term CROSS JOIN n),
           |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
           |        ORDER BY tfidf_x9 DESC, term) AS rn FROM scored)
           |SELECT doc_id, term, tfidf_x9 FROM r WHERE rn <= 5
           |ORDER BY doc_id, tfidf_x9 DESC, term""".stripMargin
  )

  /** DuckDB spelling of [[bm25Scored]], ending in
    * `scored(doc_id, n_terms, score_x9)` — shared by the q_text_bm25 and
    * q_text_rrf oracles so the two can't drift.
    */
  private lazy val bm25Ctes: String =
    raw"""w AS (
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
         |    CROSS JOIN consts c),
         |scored AS (
         |  SELECT doc_id, COUNT(*) AS n_terms, CAST(SUM(w9) AS BIGINT) AS score_x9
         |  FROM weighted GROUP BY doc_id)""".stripMargin
}
