package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.CacheScope.ScopedPersist
import graft.engine.QueryBuilder.scan
import graft.ops.TextAnalysis._

/** Text-analysis queries over the documents table, each with an exact
  * DuckDB oracle spelling the same deterministic formula.
  */
object TextQueries {

  /** Hot-group cap for q_source_overlap: fingerprints shared by more
    * distinct sources than this are dropped before the in-row pair
    * expansion (shared by the Scala plan and the oracle SQL so the two
    * can't drift). 64 is far above the testdata's source vocabulary but
    * bounds the expansion at 64² structs per row at open-domain scale.
    */
  val OverlapMaxSources = 64

  /** Per-doc corpus-LM fluency scores (CCNet/KenLM shape; bit-exact
    * integer inverse-probability) — shared by q_text_lmscore and the
    * perplexity-tier manifest q_text_ppl_buckets. */
  private def lmScores(s: SparkSession, d: String): DataFrame = {
      import graft.ops.CacheScope.ScopedPersist
      val ws = split(trim(lower(col("text"))), "\\s+")
      // zip_with over two slices, NOT transform+element_at: element_at
      // inside a lambda re-evaluates the split expression per ELEMENT
      // (no subexpression elimination across lambda scopes — measured
      // 9.3 s cold at sf0.1, O(tokens²) splitting per doc); zip_with
      // evaluates each slice argument once per row — 4.7 s cold, 2×
      val bigrams = when(size(ws) >= 2,
        zip_with(slice(ws, lit(1), size(ws) - 1), slice(ws, lit(2), size(ws) - 1),
          (a, b) => struct(a.as("p"), b.as("w"))))
        .otherwise(array().cast("array<struct<p:string,w:string>>"))
      val inst = scan(s, d, "documents")
        .select(col("doc_id"), explode(bigrams).as("b"))
        .select(col("doc_id"), xxhash64(col("b.p")).as("g1"),
          xxhash64(col("b.p"), col("b.w")).as("g2"))
      val perDoc = inst.groupBy(col("doc_id"), col("g1"), col("g2"))
        .agg(count(lit(1)).as("c")).scopedPersist()
      // both LM tables derive from the VOCABULARY-sized bigram census —
      // c1(prefix) = Σ c2 over its bigrams — so the per-bigram rate is
      // built with vocab-sized shuffles and the instance-sized perDoc
      // relation is joined exactly ONCE (an earlier spelling joined the
      // instance relation against both count tables)
      val cnt2 = perDoc.groupBy(col("g1"), col("g2")).agg(sum(col("c")).as("c2"))
      val cnt1 = cnt2.groupBy(col("g1")).agg(sum(col("c2")).as("c1"))
      val rate = cnt2.join(cnt1, Seq("g1"))
        .select(col("g2"), expr("(1000000 * c1) div c2").as("inv"))
      perDoc.join(rate, Seq("g2"))
        .groupBy(col("doc_id"))
        .agg(sum(col("c")).as("n_bigrams"),
          sum(col("c") * col("inv")).as("score_sum"))
        .withColumn("avg_inv_p",
          col("score_sum").cast("double") / col("n_bigrams").cast("double"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // FEATURE HASHING (the hashing trick, Weinberger et al. 2009 — the
    // fastText-style featurizer quality classifiers train on): every
    // token hashed into D=1024 buckets via the portable 60-bit md5
    // parse (native codegen'd graft_hex60 on the hot path), plus the
    // collision audit every deployment wants: buckets used, worst
    // bucket, words sharing a bucket, collision ppm, and the per-doc
    // nnz mass. One explode → hash → map-side-combinable groupBys,
    // O(token instances), no UDFs — at 100 TB this IS the featurizer
    // (the dimensionality is fixed; no vocabulary is ever collected)
    "q_text_feathash" -> ((s: SparkSession, d: String) => {
      val D = 1024L
      val toks = scan(s, d, "documents")
        .select(col("doc_id"),
          explode(graft.ops.CorpusOps.words(lower(col("text")))).as("w"))
        .where(col("w").rlike("^[a-z]+$"))
      val tb = toks.withColumn("b", pmod(graft.ops.Dedup.hex60(
        md5(concat(lit("fh:"), col("w")).cast("binary"))), lit(D)))
      val buckets = tb.select(col("w"), col("b")).distinct()
        .groupBy(col("b")).agg(count(lit(1)).as("nw"))
      val census = buckets.agg(
        sum(col("nw")).as("n_words"),
        count(lit(1)).as("n_buckets_used"),
        max(col("nw")).as("max_bucket_words"),
        sum(when(col("nw") >= 2, col("nw")).otherwise(0L)).as("collided_words"))
      census
        .crossJoin(broadcast(tb.groupBy(col("doc_id"))
          .agg(countDistinct(col("b")).as("nnz"))
          .agg(sum(col("nnz")).as("sum_doc_nnz"))))
        .crossJoin(broadcast(tb.agg(count(lit(1)).as("n_token_instances"))))
        .select(col("n_words"), col("n_buckets_used"), col("max_bucket_words"),
          col("collided_words"),
          expr("collided_words * 1000000 div n_words").as("collision_ppm"),
          col("sum_doc_nnz"), col("n_token_instances"))
    }),

    // CODE-VS-PROSE DETECTION (the corpus-routing filter every LLM
    // pipeline runs — code wants different dedup/mixing than prose):
    // per doc, bracket/semicolon density and indented-line fraction in
    // exact integer ppm (regex counts — identical RE2/Java semantics
    // for these classes — and one multiline ^-anchor for indentation),
    // with the routing verdict as pure threshold logic. Map-only: one
    // codegen'd projection, no shuffle before the final sort
    "q_text_codefrac" -> ((s: SparkSession, d: String) => {
      scan(s, d, "documents")
        .filter(col("n_chars") > 0)
        .select(col("doc_id"), col("n_chars"),
          size(split(col("text"), "\n", -1)).cast("long").as("n_lines"),
          size(expr("""regexp_extract_all(text, '[{}()\\[\\];]', 0)"""))
            .cast("long").as("n_braces"),
          size(expr("""regexp_extract_all(text, '(?m)^(  |\t)', 0)"""))
            .cast("long").as("n_indent"))
        .withColumn("brace_ppm", expr("n_braces * 1000000 div n_chars"))
        .withColumn("indent_ppm", expr("n_indent * 1000000 div n_lines"))
        .select(col("doc_id"), col("n_lines"), col("n_braces"), col("n_indent"),
          col("brace_ppm"), col("indent_ppm"),
          (col("brace_ppm") > 20000 || col("indent_ppm") > 300000).as("is_codey"))
        .orderBy(col("doc_id"))
    }),

    // CHAR-BIGRAM CONDITIONAL ENTROPY per doc, in integer CENTIBITS —
    // the compressibility/repetitiveness quality signal (low entropy =
    // templated or repetitive text; the gzip-ratio heuristic without
    // the unreplayable codec): H = Σ c(ab)·cb(ab) / Σ c(ab) with
    // cb(ab) = round(100·log2(c(a·)/c(ab))) from the SAME fixed-point
    // staged-log generator the ULM tokenizer shares with its oracle
    // (UlmTokenizer.costStages — ProfileQueries once used Gini "because
    // entropy needs log()"; the generator retired that constraint).
    // Bigrams run over the eligible-word stream, within words only
    "q_text_entropy" -> ((s: SparkSession, d: String) => {
      import graft.ops.UlmTokenizer
      val docs = scan(s, d, "documents")
      val w0 = docs.select(col("doc_id"),
          explode(split(trim(lower(col("text"))), "\\s+")).as("w"))
        .where(col("w").rlike("^[a-z]+$") && length(col("w")) >= 2)
      val bg = w0.select(col("doc_id"),
          explode(sequence(lit(1), length(col("w")) - 1)).as("i"), col("w"))
        .select(col("doc_id"), expr("substr(w, i, 2)").as("b"))
      val cs = bg.groupBy(col("doc_id"), col("b")).agg(count(lit(1)).as("c"))
      val pf = cs.groupBy(col("doc_id"), expr("substr(b, 1, 1)").as("a"))
        .agg(sum(col("c")).as("t"))
      var j = cs.as("cs").join(pf.as("pf"),
        col("cs.doc_id") === col("pf.doc_id") &&
          expr("substr(cs.b, 1, 1)") === col("pf.a"))
        .select(col("cs.doc_id").as("doc_id"), col("cs.b").as("b"),
          col("cs.c").as("c"), col("pf.t").as("t"))
      UlmTokenizer.costStages("t", "c", UlmTokenizer.Spark).foreach {
        case (n, e) => j = j.withColumn(n, expr(e))
      }
      val h = j.groupBy(col("doc_id"))
        .agg(sum(col("c")).as("n_bigrams"),
          sum(col("c") * col("cost_cb")).as("hsum"))
      docs.select(col("doc_id"), col("lang")).join(h, Seq("doc_id"), "left")
        .select(col("doc_id"), col("lang"),
          coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
          coalesce(expr("hsum div n_bigrams"), lit(0L)).as("h_cb"))
        .orderBy(col("doc_id"))
    }),

    // CONCAT-AND-CHUNK PACKING census (the GPT-style pretraining data
    // layout: every doc's tokens concatenated in doc_id order, sliced
    // into fixed 512-token contexts): how many docs get split across a
    // context boundary, how many boundary crossings the corpus pays,
    // and the tail padding of the last chunk. The global token offset
    // is a DISTRIBUTED two-level prefix sum (doc_id-bucket census →
    // tiny bucket-prefix window → within-bucket windows) — never a
    // global single-task window, the q_agg_ks spine. Empty docs carry
    // no tokens and are excluded from the span census
    "q_text_pack" -> ((s: SparkSession, d: String) => {
      import org.apache.spark.sql.expressions.Window
      val C = 512
      val dt = scan(s, d, "documents").select(col("doc_id"),
        when(length(trim(col("text"))) === 0, 0L)
          .otherwise(size(split(trim(col("text")), "\\s+")).cast("long"))
          .as("n_tok"))
        .withColumn("b", expr("doc_id div 1024"))
      val bt = dt.groupBy(col("b")).agg(sum(col("n_tok")).as("s"))
      val wb = Window.orderBy(col("b"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val bpre = bt.withColumn("p", coalesce(sum(col("s")).over(wb), lit(0L)))
        .select(col("b"), col("p"))
      val wv = Window.partitionBy(col("b")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val off = dt.join(broadcast(bpre), Seq("b"))
        .withColumn("st", col("p") + coalesce(sum(col("n_tok")).over(wv), lit(0L)))
      val spans = off.filter(col("n_tok") > 0)
        .withColumn("spans",
          expr(s"(st + n_tok - 1) div $C - st div $C + 1"))
      spans.agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("total_tokens"),
          sum(when(col("spans") === 1, 1L).otherwise(0L)).as("span1_docs"),
          sum(when(col("spans") === 2, 1L).otherwise(0L)).as("span2_docs"),
          sum(when(col("spans") >= 3, 1L).otherwise(0L)).as("span3p_docs"),
          sum(col("spans") - 1).as("n_crossings"))
        .select(col("n_docs"), col("total_tokens"),
          lit(C.toLong).as("chunk_len"),
          expr(s"(total_tokens + ${C - 1}) div $C").as("n_chunks"),
          col("span1_docs"), col("span2_docs"), col("span3p_docs"),
          col("n_crossings"),
          expr("(span2_docs + span3p_docs) * 1000000 div n_docs")
            .as("split_doc_ppm"),
          expr(s"((total_tokens + ${C - 1}) div $C) * $C - total_tokens")
            .as("tail_pad_tokens"))
    }),

    // ZIPF EXPONENT — least-squares slope of the log-log rank-frequency
    // line over the top-64 terms, the vocabulary-health readout (a
    // natural corpus sits near −1; template floods flatten it, dedup
    // failures steepen it). x = cb(rank), y = cb(count) through the
    // shared staged log; the slope is the EXACT rational
    // (nΣxy−ΣxΣy)/(nΣx²−(Σx)²) — numerator/denominator reported as
    // witnesses, magnitude sign-decomposed because Spark div truncates
    // while DuckDB // floors on negatives
    "q_text_zipf_slope" -> ((s: SparkSession, d: String) => {
      import org.apache.spark.sql.expressions.Window
      import graft.ops.UlmTokenizer
      import graft.ops.CacheScope.ScopedPersist
      val census = scan(s, d, "documents")
        .select(explode(split(trim(lower(col("text"))), "\\s+")).as("w"))
        .where(col("w").rlike("^[a-z]+$"))
        .groupBy(col("w")).agg(count(lit(1)).as("c"))
      val top = census.orderBy(col("c").desc, col("w")).limit(64)
        .withColumn("r", row_number().over( // 64 rows — tiny
          Window.orderBy(col("c").desc, col("w"))))
        .scopedPersist()
      val vals = top.select(col("r").cast("long").as("v"))
        .union(top.select(col("c"))).distinct()
      // driver-side cb over the 64-row rank/count set (cbTableLocal)
      val cb = UlmTokenizer.cbTableLocal(vals, "q_text_zipf_slope cb values")
      val pts = top
        .join(broadcast(cb.select(col("v").cast("int").as("r"), col("cb").as("x"))), Seq("r"))
        .join(broadcast(cb.select(col("v").as("c"), col("cb").as("y"))), Seq("c"))
      pts.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"))
        .select(col("n"),
          (col("n") * col("sxy") - col("sx") * col("sy")).as("slope_num"),
          (col("n") * col("sxx") - col("sx") * col("sx")).as("slope_den"))
        .select(col("n").as("n_terms"), col("slope_num"), col("slope_den"),
          when(col("slope_num") < 0, -1L).otherwise(1L).as("slope_sign"),
          expr("abs(slope_num) * 1000000 div slope_den").as("slope_mag_x6"))
    }),

    // VOCABULARY KL DIVERGENCE between language slices — the domain-
    // shift score over unigram distributions (the corpus-mixture
    // cousin of q_dq_psi's 16-bin PSI): add-1 smoothing over the UNION
    // vocabulary (every term present on both sides, so no ∞ terms),
    // both directions reported. log2(p/q) decomposes into SINGLE-count
    // cbs — cb(cp)+cb(Nq)−cb(cq)−cb(Np) — through the shared staged
    // generator, once per DISTINCT count value. Term mass in floor-ppm;
    // the statistic is a defined integer, replayed exactly
    "q_text_kl" -> ((s: SparkSession, d: String) => {
      import graft.ops.UlmTokenizer
      import graft.ops.CacheScope.ScopedPersist
      val tk = scan(s, d, "documents").filter(col("lang").isin("en", "de"))
        .select(col("lang"),
          explode(split(trim(lower(col("text"))), "\\s+")).as("w"))
        .where(col("w").rlike("^[a-z]+$"))
      val c = tk.groupBy(col("lang"), col("w")).agg(count(lit(1)).as("n"))
        .scopedPersist()
      val vocab = c.select(col("w")).distinct()
      val m = vocab
        .join(c.filter(col("lang") === "en").select(col("w"), col("n").as("ne")),
          Seq("w"), "left")
        .join(c.filter(col("lang") === "de").select(col("w"), col("n").as("nd")),
          Seq("w"), "left")
        .select(col("w"), (coalesce(col("ne"), lit(0L)) + 1L).as("cp"),
          (coalesce(col("nd"), lit(0L)) + 1L).as("cq"))
        .scopedPersist()
      val tot = m.agg(sum(col("cp")).as("np"), sum(col("cq")).as("nq"))
      val vals = m.select(col("cp").as("v")).union(m.select(col("cq")))
        .union(tot.select(col("np"))).union(tot.select(col("nq"))).distinct()
      // cb computed on the driver over the distinct-count set (see
      // UlmTokenizer.cbTableLocal): the four broadcast joins below then
      // build over a LocalRelation instead of four analyzed copies of
      // the staged-log census subtree
      val cb = UlmTokenizer.cbTableLocal(vals, "q_text_kl cb values")
      val j = m.crossJoin(broadcast(tot))
        .join(broadcast(cb.select(col("v").as("cp"), col("cb").as("cb_p"))), Seq("cp"))
        .join(broadcast(cb.select(col("v").as("cq"), col("cb").as("cb_q"))), Seq("cq"))
        .join(broadcast(cb.select(col("v").as("np"), col("cb").as("cb_np"))), Seq("np"))
        .join(broadcast(cb.select(col("v").as("nq"), col("cb").as("cb_nq"))), Seq("nq"))
      val agg = j.agg(
        count(lit(1)).as("n_vocab"),
        sum(expr("(cp * 1000000 div np) * (cb_p + cb_nq - cb_q - cb_np)"))
          .as("kl_en_de"),
        sum(expr("(cq * 1000000 div nq) * (cb_q + cb_np - cb_p - cb_nq)"))
          .as("kl_de_en"))
      agg.select(lit("de_to_en").as("direction"), col("n_vocab"),
          col("kl_de_en").as("kl_cb_ppm"))
        .unionByName(agg.select(lit("en_to_de").as("direction"), col("n_vocab"),
          col("kl_en_de").as("kl_cb_ppm")))
        .orderBy(col("direction"))
    }),

    // JENSEN-SHANNON DIVERGENCE between the en/de unigram
    // distributions — the symmetric, bounded mixing diagnostic beside
    // q_text_kl's directed KL (JSD is what a mixture designer actually
    // thresholds: 0 ≤ JSD ≤ 1 bit). Same +1-smoothed census and
    // integer-centibit machinery; the mixture M = (P+Q)/2 enters
    // through the ratio identity p/m = 2·cp·nq ⁄ (cp·nq + cq·np), so
    // each word needs cb() of two exact integer products and the cb
    // table stays vocab-sized. Emitted DOUBLED (jsd_x2 = KL(P‖M) +
    // KL(Q‖M)) — no halving division whose floor could diverge on a
    // near-zero negative sum. Bound note: costStages needs t·2²⁰ in
    // int64, i.e. products under ~8.8e12 — held here with 100× margin;
    // a deployment past that rescales counts first
    "q_text_jsd" -> ((s: SparkSession, d: String) => {
      import graft.ops.UlmTokenizer
      import graft.ops.CacheScope.ScopedPersist
      val tk = scan(s, d, "documents").filter(col("lang").isin("en", "de"))
        .select(col("lang"),
          explode(split(trim(lower(col("text"))), "\\s+")).as("w"))
        .where(col("w").rlike("^[a-z]+$"))
      val c = tk.groupBy(col("lang"), col("w")).agg(count(lit(1)).as("n"))
        .scopedPersist()
      val vocab = c.select(col("w")).distinct()
      val m0 = vocab
        .join(c.filter(col("lang") === "en").select(col("w"), col("n").as("ne")),
          Seq("w"), "left")
        .join(c.filter(col("lang") === "de").select(col("w"), col("n").as("nd")),
          Seq("w"), "left")
        .select(col("w"), (coalesce(col("ne"), lit(0L)) + 1L).as("cp"),
          (coalesce(col("nd"), lit(0L)) + 1L).as("cq"))
      val tot = m0.agg(sum(col("cp")).as("np"), sum(col("cq")).as("nq"))
      val m = m0.crossJoin(broadcast(tot))
        .select(col("cp"), col("cq"), col("np"), col("nq"),
          (col("cp") * col("nq") * 2).as("a1"),
          (col("cq") * col("np") * 2).as("a2"),
          (col("cp") * col("nq") + col("cq") * col("np")).as("a0"))
        .scopedPersist()
      val vals = m.select(col("a1").as("v")).union(m.select(col("a2")))
        .union(m.select(col("a0"))).distinct()
      // driver-side cb over the distinct-product set (UlmTokenizer
      // .cbTableLocal — the q_text_kl LocalRelation discipline)
      val cb = UlmTokenizer.cbTableLocal(vals, "q_text_jsd cb values")
      m.join(broadcast(cb.select(col("v").as("a1"), col("cb").as("cb1"))), Seq("a1"))
        .join(broadcast(cb.select(col("v").as("a2"), col("cb").as("cb2"))), Seq("a2"))
        .join(broadcast(cb.select(col("v").as("a0"), col("cb").as("cb0"))), Seq("a0"))
        .agg(count(lit(1)).as("n_vocab"),
          sum(expr("(cp * 1000000 div np) * (cb1 - cb0)")).as("kl_p_m"),
          sum(expr("(cq * 1000000 div nq) * (cb2 - cb0)")).as("kl_q_m"))
        .select(col("n_vocab"), col("kl_p_m").as("kl_p_m_cbppm"),
          col("kl_q_m").as("kl_q_m_cbppm"),
          (col("kl_p_m") + col("kl_q_m")).as("jsd_x2_cbppm"))
    }),

    // SFT CHAT-TEMPLATE ASSEMBLY CENSUS — the packing audit an
    // instruction-tuning pipeline runs before serialization: each doc's
    // token stream is segmented into alternating user/assistant turns
    // of formula-driven lengths (turn j wants 5 + (id+3j)%10 tokens;
    // the last turn keeps the remainder), every turn pays a 2-marker
    // template overhead, and a 64-token context budget admits whole
    // turns greedily. Reports per doc: turn count, per-role token
    // mass (assistant tokens ARE the loss-mask mass — the SFT
    // masking rule), template overhead, and how much survives the
    // budget. The greedy recurrence is RELATIONAL on both engines:
    // turn boundaries are prefix sums over an exploded turn index
    // (bounded by n/5 — per-doc, the ROUGE window construction),
    // never a driver loop
    "q_text_sft" -> ((s: SparkSession, d: String) => {
      import org.apache.spark.sql.expressions.Window
      val wj = Window.partitionBy(col("doc_id")).orderBy(col("j"))
      val dn = scan(s, d, "documents")
        .filter(length(trim(col("text"))) > 0)
        .select(col("doc_id"),
          size(split(trim(col("text")), "\\s+")).cast("long").as("n"))
      dn.select(col("doc_id"), col("n"),
          explode(sequence(lit(0L), expr("n div 5"))).as("j"))
        .withColumn("lj", lit(5L) + (col("doc_id") + lit(3L) * col("j")) % 10L)
        .withColumn("cum", coalesce(sum(col("lj")).over(
          wj.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .filter(col("cum") < col("n"))
        .withColumn("len", least(col("lj"), col("n") - col("cum")))
        .withColumn("wtpl", col("len") + 2L)
        .withColumn("cumt", sum(col("wtpl")).over(wj))
        .groupBy(col("doc_id"))
        .agg(max(col("n")).as("n_toks"),
          count(lit(1)).as("n_turns"),
          sum(when(col("j") % 2 === 0, col("len")).otherwise(0L)).as("user_toks"),
          sum(when(col("j") % 2 === 1, col("len")).otherwise(0L)).as("asst_toks"),
          (count(lit(1)) * 2).as("overhead_toks"),
          sum(when(col("cumt") <= 64, 1L).otherwise(0L)).as("turns_in_budget"),
          sum(when(col("cumt") <= 64, col("wtpl")).otherwise(0L)).as("toks_in_budget"))
        .orderBy(col("doc_id"))
    }),

    // TF-IDF TOP TERMS (Spärck Jones 1972) — the classic term-weighting
    // readout beside BM25's ranked retrieval and PMI's associations:
    // score(d, w) = tf(d, w) · idf_cb(w) with idf_cb = round(100·
    // log2(N / df)) EXACT in integer centibits from the shared staged
    // fixed-point log (N ≥ df always, so the generator's t ≥ c
    // contract holds by construction; no libm, replayed bit-identically
    // by the oracle). The log runs once per DISTINCT df value — a
    // vocabulary-distinct-sized relation broadcast back, the
    // hash-per-distinct discipline — so the corpus-sized work is two
    // map-side-combinable groupBys and one broadcast join. Global
    // top-50 by integer score, full tie-break
    "q_text_tfidf" -> ((s: SparkSession, d: String) => {
      import graft.ops.UlmTokenizer
      val tf = scan(s, d, "documents")
        .filter(length(trim(col("text"))) > 0)
        .select(col("doc_id"), explode(split(trim(lower(col("text"))), "\\s+")).as("w"))
        .where(col("w").rlike("^[a-z]+$"))
        .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("tf"))
        .scopedPersist() // feeds df census AND the scored join
      val dfc = tf.groupBy(col("w")).agg(count(lit(1)).as("df")).scopedPersist()
      val n = tf.agg(countDistinct(col("doc_id")).as("nn"))
      // driver-side idf: collect the doc total (1 row) and the distinct
      // df values (vocab-bounded), replay cb(nn, df) via costCbLocal —
      // nn >= df >= 1 always, so the staged chain and the Scala replay
      // are the same int64 ops (the cbTableLocal discipline, pair form)
      val nnVal = n.collect()(0).getLong(0)
      val idf = s.createDataFrame(
        graft.ops.CorpusOps.collectBounded(
            dfc.select(col("df")).distinct(), "q_text_tfidf df values")
          .map(_.getLong(0)).toIndexedSeq
          .map(dfv => (dfv, UlmTokenizer.costCbLocal(nnVal, dfv))))
        .toDF("df", "idf_cb")
      tf.join(dfc, Seq("w"))
        .join(broadcast(idf), Seq("df"))
        .select(col("doc_id"), col("w"), col("tf").cast("long").as("tf"),
          col("df").cast("long").as("df"), col("idf_cb"),
          (col("tf") * col("idf_cb")).as("score_cb"))
        .orderBy(col("score_cb").desc, col("doc_id"), col("w"))
        .limit(50)
    }),

    // PPMI COLLOCATIONS (Church & Hanks 1990) — top adjacent-bigram
    // associations by pointwise mutual information IN LOG SPACE: the
    // statistic q_text_collocations approximates with exact lift
    // "because log() is banned by the libm rule" — the staged
    // fixed-point generator retired that rule, so this op reports the
    // real additive PMI (centibits, comparable across pairs and
    // corpora, where lift is multiplicative and scale-bound).
    // PMI decomposes into SINGLE-count logs — pmi_cb = cb(c_ab) +
    // 2·cb(N) − cb(N_bi) − cb(c_a) − cb(c_b), each cb = round(100·
    // log2(count)) from the shared staged generator — so no product
    // ever feeds the fixed-point log (c_ab·N² would blow its 2^43
    // headroom; bare counts stay legal to ~8.8e12 tokens, the 100 TB
    // census range). The log runs once per DISTINCT count value (tiny
    // relation, broadcast back); candidates floored at c_ab ≥ 5;
    // bigrams via lead() over per-doc windows — docs are small, the
    // ROUGE construction
    "q_text_pmi" -> ((s: SparkSession, d: String) => {
      import org.apache.spark.sql.expressions.Window
      import graft.ops.UlmTokenizer
      val tr = scan(s, d, "documents")
        .filter(length(trim(col("text"))) > 0)
        .select(col("doc_id"), posexplode(split(trim(lower(col("text"))), "\\s+")))
        .withColumnRenamed("col", "w")
      val tf = tr.where(col("w").rlike("^[a-z]+$"))
        .withColumn("p2", row_number().over(
          Window.partitionBy(col("doc_id")).orderBy(col("pos"))))
      val bi = tf.withColumn("nx", lead(col("w"), 1).over(
          Window.partitionBy(col("doc_id")).orderBy(col("p2"))))
        .where(col("nx").isNotNull)
      // cand feeds the distinct-value union (5 branches) AND the five
      // cb joins — 11 plan references; persist or the nested join tree
      // replicates into a driver-OOM-sized plan (the lineage lesson)
      val ua = tf.groupBy(col("w")).agg(count(lit(1)).as("c")).scopedPersist()
      val bc = bi.groupBy(col("w"), col("nx")).agg(count(lit(1)).as("c_ab"))
        .scopedPersist()
      val tot = ua.agg(sum(col("c")).as("n"))
        .crossJoin(bc.agg(sum(col("c_ab")).as("nbt")))
      val cand = bc.filter(col("c_ab") >= 5)
        .join(ua.select(col("w"), col("c").as("c_a")), Seq("w"))
        .join(ua.select(col("w").as("nx"), col("c").as("c_b")), Seq("nx"))
        .crossJoin(broadcast(tot))
        .scopedPersist()
      val vals = cand.select(col("c_ab").as("v"))
        .union(cand.select(col("c_a"))).union(cand.select(col("c_b")))
        .union(tot.select(col("n"))).union(tot.select(col("nbt")))
        .distinct()
      // driver-side cb (cbTableLocal): five broadcast joins below build
      // over a LocalRelation instead of five analyzed census copies
      val cb = UlmTokenizer.cbTableLocal(vals, "q_text_pmi cb values")
      cand
        .join(broadcast(cb.select(col("v").as("c_ab"), col("cb").as("cb_ab"))), Seq("c_ab"))
        .join(broadcast(cb.select(col("v").as("c_a"), col("cb").as("cb_a"))), Seq("c_a"))
        .join(broadcast(cb.select(col("v").as("c_b"), col("cb").as("cb_b"))), Seq("c_b"))
        .join(broadcast(cb.select(col("v").as("n"), col("cb").as("cb_n"))), Seq("n"))
        .join(broadcast(cb.select(col("v").as("nbt"), col("cb").as("cb_nb"))), Seq("nbt"))
        .withColumn("pmi_cb", col("cb_ab") + lit(2L) * col("cb_n")
          - col("cb_nb") - col("cb_a") - col("cb_b"))
        .filter(col("pmi_cb") > 0)
        .select(col("w").as("a"), col("nx").as("b"), col("c_ab"), col("pmi_cb"))
        .orderBy(col("pmi_cb").desc, col("a"), col("b")).limit(20)
    }),

    // WEIGHTED SAMPLING WITHOUT REPLACEMENT (Efraimidis & Spirakis,
    // IPL 2006) — the corpus subsampler that picks docs ∝ token count
    // (importance sampling by length; swap any weight in): key =
    // u^(1/w) kept top-k ⇔ smallest (−ln u)/w, here an INTEGER
    // priority cb·10^6 div w with cb = round(100·log2(2^40/(h40+1)))
    // from the shared staged log over a 40-bit md5 slice (2^40·2^20
    // stays in int64 — the full 60-bit hash would overflow the
    // generator's fixed-point headroom). One hash + one constant-depth
    // log per row, global top-k via TakeOrdered — no shuffle beyond
    // the k-row partials; deterministic, so the draw itself replays
    "q_text_wsample" -> ((s: SparkSession, d: String) => {
      import graft.ops.{Dedup, UlmTokenizer}
      var c = scan(s, d, "documents").select(col("doc_id"),
          when(length(trim(col("text"))) === 0, 0L)
            .otherwise(size(split(trim(col("text")), "\\s+")).cast("long"))
            .as("n_tok"))
        .filter(col("n_tok") > 0)
        .withColumn("h", Dedup.hex60(md5(
          concat(lit("ws:"), col("doc_id").cast("string")).cast("binary"))))
        .withColumn("hm1", expr("h % 1099511627776 + 1"))
      UlmTokenizer.costStages("1099511627776", "hm1", UlmTokenizer.Spark)
        .foreach { case (n, e) => c = c.withColumn(n, expr(e)) }
      c.select(col("doc_id"), col("n_tok"),
          col("cost_cb").cast("long").as("dlog_cb"),
          expr("CAST(cost_cb AS BIGINT) * 1000000 div n_tok").as("prio"))
        .orderBy(col("prio"), col("doc_id")).limit(20)
    }),

    // HAPAX LEGOMENA census (the vocabulary-richness readout corpus
    // linguists and dedup pipelines both watch — a corpus whose hapax
    // share collapses is template-flooded): corpus-wide term census →
    // counts of once/twice/thrice-seen terms (Zipf's tail), vocabulary
    // size, token total, and the hapax share of VOCABULARY in exact
    // ppm. Two map-side-combinable aggregations — the q_text_termstats
    // shape
    "q_text_hapax" -> ((s: SparkSession, d: String) => {
      scan(s, d, "documents")
        .filter(length(trim(col("text"))) > 0)
        .select(explode(split(trim(lower(col("text"))), "\\s+")).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("c"))
        .agg(count(lit(1)).as("n_vocab"), sum(col("c")).as("n_tokens"),
          sum(when(col("c") === 1, 1L).otherwise(0L)).as("n_hapax"),
          sum(when(col("c") === 2, 1L).otherwise(0L)).as("n_dis"),
          sum(when(col("c") === 3, 1L).otherwise(0L)).as("n_tris"))
        .select(col("n_vocab"), col("n_tokens"), col("n_hapax"), col("n_dis"),
          col("n_tris"),
          expr("n_hapax * 1000000 div n_vocab").as("hapax_vocab_ppm"))
    }),

    // ROUGE-1/2 (the summarization-eval overlap metrics, run as a
    // candidate-vs-reference census over adjacent doc pairs): multiset
    // n-gram overlap Σ min(c_a, c_b), with P/R/F1 as EXACT integer ppm
    // — F1 = 2·ov/(n_a+n_b) needs no float at all. Bigrams come from a
    // lead() over (doc, pos) — the same construction in both engines,
    // dodging the 0-vs-1-based array-index split. One token explode +
    // gram census + pair equi-join, all partial-aggregated
    "q_text_rouge" -> ((s: SparkSession, d: String) => {
      import org.apache.spark.sql.expressions.Window
      val docs = scan(s, d, "documents")
        .filter(length(trim(col("text"))) > 0)
        .select(col("doc_id"), split(trim(lower(col("text"))), "\\s+").as("toks"))
      val toks = docs.select(col("doc_id"),
        posexplode(col("toks")).as(Seq("pos", "w")))
      val wv = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      val uni = toks.select(col("doc_id"), col("w").as("g"), lit(1L).as("k"))
      val bi = toks.withColumn("nx", lead(col("w"), 1).over(wv))
        .filter(col("nx").isNotNull)
        .select(col("doc_id"), concat(col("w"), lit(" "), col("nx")).as("g"),
          lit(2L).as("k"))
      val grams = uni.unionAll(bi)
        .groupBy(col("doc_id"), col("k"), col("g")).agg(count(lit(1)).as("c"))
      val a = grams.filter(col("doc_id") % 2 === 0)
        .select(col("doc_id").as("doc_a"), col("k"), col("g"), col("c").as("ca"))
      val b = grams.filter(col("doc_id") % 2 === 1)
        .select((col("doc_id") - 1).as("doc_a"), col("k"), col("g"),
          col("c").as("cb"))
      val ov = a.join(b, Seq("doc_a", "k", "g"))
        .groupBy(col("doc_a"), col("k"))
        .agg(sum(least(col("ca"), col("cb"))).as("ov"))
      val tot = grams
        .withColumn("doc_a", col("doc_id") - col("doc_id") % 2)
        .groupBy(col("doc_a"), col("k"))
        .agg(sum(when(col("doc_id") % 2 === 0, col("c"))).as("na"),
          sum(when(col("doc_id") % 2 === 1, col("c"))).as("nb"))
        .filter(col("na").isNotNull && col("nb").isNotNull)
      tot.join(ov, Seq("doc_a", "k"), "left")
        .na.fill(0L, Seq("ov"))
        .select(col("doc_a"), (col("doc_a") + 1).as("doc_b"), col("k"),
          col("na"), col("nb"), col("ov"),
          expr("ov * 1000000 div na").as("p_ppm"),
          expr("ov * 1000000 div nb").as("r_ppm"),
          expr("2 * ov * 1000000 div (na + nb)").as("f1_ppm"))
        .orderBy(col("doc_a"), col("k"))
    }),

    "q_text_tokens" -> ((s: SparkSession, d: String) => {
      scan(s, d, "documents")
        .select(
          col("doc_id"),
          col("n_chars"),
          tokenCountWs(col("text")).cast("long").as("n_ws_tokens"),
          tokenCountBpe(col("text")).cast("long").as("n_bpe_tokens")
        )
        .orderBy(col("doc_id"))
    }),

    "q_text_quality" -> ((s: SparkSession, d: String) => {
      scan(s, d, "documents")
        .select(
          col("doc_id"),
          stopwordCount(col("text"), defaultStopwords).cast("long").as("n_stop"),
          stopwordRatio(col("text"), defaultStopwords).as("stop_ratio"),
          punctRatio(col("text")).as("punct_ratio"),
          avgWordLen(col("text")).as("avg_wlen"),
          qualityScore(col("text")).as("quality")
        )
        .orderBy(col("doc_id"))
    }),

    // language-ID CONFUSION MATRIX — the eval loop for the classifier:
    // labeled lang × predicted lang counts (one map pass + one tiny
    // groupBy). Off-diagonal mass = where the n-gram heuristic fails
    "q_langid_confusion" -> ((s: SparkSession, d: String) => {
      scan(s, d, "documents")
        .select(col("lang"), langId(col("text")).as("pred_lang"))
        .groupBy(col("lang"), col("pred_lang"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy(col("lang"), col("pred_lang"))
    }),

    "q_text_langid" -> ((s: SparkSession, d: String) => {
      val df = scan(s, d, "documents")
      val scored = langScores(col("text")).foldLeft(df) { case (acc, (lang, score)) =>
        acc.withColumn(s"score_$lang", score.cast("long"))
      }
      scored
        .withColumn("pred_lang", langId(col("text")))
        .select(col("doc_id"), col("lang"), col("pred_lang"),
          col("score_en"), col("score_de"), col("score_fr"), col("score_es"), col("score_zh"))
        .orderBy(col("doc_id"))
    }),

    // edit-distance fuzzy match: nation-name pairs within levenshtein 6 —
    // the record-linkage primitive (blocked by first letter here; at
    // corpus scale the block key is the join key, never all-pairs)
    "q_text_levenshtein" -> ((s: SparkSession, d: String) => {
      val n = scan(s, d, "nation").select(col("n_name"))
      val a = n.select(col("n_name").as("name_a"))
        .withColumn("__blk", substring(col("name_a"), 1, 1))
      val b = n.select(col("n_name").as("name_b"))
        .withColumn("__blk", substring(col("name_b"), 1, 1))
      a.join(b, Seq("__blk"))
        .filter(col("name_a") < col("name_b"))
        .withColumn("lev", levenshtein(col("name_a"), col("name_b")))
        .filter(col("lev") <= 6)
        .select(col("name_a"), col("name_b"), col("lev"))
        .orderBy(col("name_a"), col("name_b"))
    }),

    // corpus heavy hitters: top-30 tokens by frequency with deterministic
    // tie-break — vocabulary statistics for tokenizer/quality work. The
    // groupBy is partial-aggregated map-side; top-k is
    // TakeOrderedAndProject (no global sort materialization)
    "q_text_heavyhitters" -> ((s: SparkSession, d: String) => {
      scan(s, d, "documents")
        .select(explode(split(trim(lower(col("text"))), "\\s+")).as("token"))
        .filter(col("token") =!= "")
        .groupBy(col("token"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("token").asc)
        .limit(30)
    }),

    // CHAT-TURN STRUCTURE validation (the instruct-data hygiene pass):
    // documents rendered as role-tagged conversations (6 words/turn,
    // user/assistant alternating), then PARSED BACK by a real
    // line-splitting role parser — per doc: turn counts by role,
    // alternation check, milli-avg words per turn. The oracle computes
    // every output from the word-count FORMULA without parsing a line
    // (the media-fixture convention), so a parser bug cannot mirror
    "q_text_turns" -> ((s: SparkSession, d: String) => {
      val ws = split(trim(lower(col("text"))), "\\s+")
      val words = filter(ws, w => w =!= "")
      // render: turn t = words [6t, 6t+6), role alternates from 'user'
      val rendered = when(size(words) === 0, lit(""))
        .otherwise(concat_ws("\n",
          transform(sequence(lit(0), floor((size(words) - 1) / 6).cast("int")),
            t => concat(
              when(t % 2 === 0, lit("user: ")).otherwise(lit("assistant: ")),
              array_join(slice(words, t * 6 + 1, lit(6)), " ")))))
      // parse: real line walk — split, per-line role regexp + body census
      val lines = filter(split(col("chat"), "\n"), l => l =!= "")
      val roles = transform(lines, l => regexp_extract(l, "^(user|assistant): ", 1))
      val bodies = transform(lines,
        l => size(filter(split(regexp_replace(l, "^(user|assistant): ", ""), " "),
          w => w =!= "")))
      scan(s, d, "documents")
        .withColumn("chat", rendered)
        .withColumn("__roles", roles)
        .withColumn("__bodies", bodies)
        .select(col("doc_id"),
          size(col("__roles")).cast("long").as("n_turns"),
          size(filter(col("__roles"), r => r === "user")).cast("long").as("n_user"),
          size(filter(col("__roles"), r => r === "assistant")).cast("long").as("n_assistant"),
          coalesce(element_at(col("__roles"), 1) === "user", lit(false)).as("starts_user"),
          // alternation: no adjacent pair of equal roles
          (size(col("__roles")) <= 1 ||
            !exists(zip_with(slice(col("__roles"), lit(1), size(col("__roles")) - 1),
              slice(col("__roles"), lit(2), size(col("__roles")) - 1),
              (a, b) => a === b), x => x)).as("alternation_ok"),
          when(size(col("__roles")) === 0, lit(0L)).otherwise(
            expr("aggregate(__bodies, 0L, (a, x) -> a + x) * 1000 div size(__roles)"))
            .as("avg_words_milli"))
        .orderBy(col("doc_id"))
    }),

    // VOCABULARY COVERAGE census (the tokenizer-sizing curve's
    // operating point): fraction of token instances covered by the
    // top-1000 corpus words, per language — the number that says how
    // big a closed vocabulary must be before OOV stops dominating a
    // language. Census → total-order top-1000 (count desc, word asc:
    // the rank-1000 boundary is deterministic) → broadcast semi-probe
    // of the instance stream → per-lang floor-ppm ratio, all integer
    "q_text_vocab_coverage" -> ((s: SparkSession, d: String) => {
      val toks = scan(s, d, "documents")
        .select(col("lang"), explode(split(trim(lower(col("text"))), "\\s+")).as("w"))
        .filter(col("w") =!= "")
      val vocab = toks.groupBy(col("w")).agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("w").asc).limit(1000)
        .select(col("w"), lit(1L).as("__in"))
      toks.join(broadcast(vocab), Seq("w"), "left")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_tokens"),
          sum(coalesce(col("__in"), lit(0L))).as("n_covered"))
        .withColumn("coverage_ppm", expr("n_covered * 1000000 div n_tokens"))
        .orderBy(col("lang"))
    }),

    // COUNT-MIN SKETCH, computed relationally and EXACTLY deterministic:
    // each of 3 hash rows buckets every token into 64 cells; a cell is an
    // order-independent SUM, and a token's estimate is the MIN over its 3
    // cells — so unlike most sketches the whole structure is bit-stable
    // under any partitioning and fully oracle-checkable, including the
    // CMS invariant estimate >= exact (never_under is literally asserted
    // per row). The 192-cell table is what a 100 TB stream would keep as
    // its frequency state (vs the unbounded exact token table)
    "q_text_cms" -> ((s: SparkSession, d: String) => {
      val CmsRows = 3
      val CmsW = 64
      def bucket(i: Int, tok: org.apache.spark.sql.Column) =
        graft.ops.Dedup.hex60(md5(concat(lit(s"cms$i:"), tok).cast("binary"))) % CmsW
      // exact per-token counts FIRST (the one shuffle the query already
      // needs for `top`), then the 3 md5 buckets are computed over
      // DISTINCT tokens and the cells SUM those counts — md5 cost is
      // 3×vocabulary instead of 3×token-instances, and the explode that
      // reaches the cell groupBy is vocabulary-sized, not corpus-sized
      val tokCnt = scan(s, d, "documents")
        .select(explode(split(trim(lower(col("text"))), "\\s+")).as("token"))
        .filter(col("token") =!= "")
        .groupBy(col("token")).agg(count(lit(1)).as("exact_cnt")).scopedPersist()
      val cells = tokCnt
        .select(col("exact_cnt"), explode(array((0 until CmsRows).map(i =>
          struct(lit(i).as("i"), bucket(i, col("token")).as("b"))): _*)).as("rb"))
        .groupBy(col("rb.i").as("i"), col("rb.b").as("b"))
        .agg(sum(col("exact_cnt")).as("cell"))
      val top = tokCnt
        .orderBy(col("exact_cnt").desc, col("token").asc).limit(10)
      top.select(col("token"), col("exact_cnt"),
          explode(array((0 until CmsRows).map(i =>
            struct(lit(i).as("i"), bucket(i, col("token")).as("b"))): _*)).as("rb"))
        .select(col("token"), col("exact_cnt"), col("rb.i").as("i"), col("rb.b").as("b"))
        .join(cells, Seq("i", "b"))
        .groupBy(col("token"), col("exact_cnt"))
        .agg(min(col("cell")).as("cms_est"))
        .withColumn("never_under", col("cms_est") >= col("exact_cnt"))
        .orderBy(col("exact_cnt").desc, col("token"))
    }),

    // CORPUS-LM FLUENCY SCORE — the CCNet/KenLM filtering-stage shape:
    // a bigram LM is "trained" on the corpus itself (prefix + bigram
    // instance counts), and each doc is scored by its mean INVERSE
    // conditional probability Σ floor(1e6·c(prev)/c(prev,w)) / n —
    // high score = rare continuations = disfluent/garbled text, the
    // docs a perplexity filter drops. All-integer scoring (the floor
    // is exact `div` on both engines; the final mean is one division
    // of exact longs), so the oracle is bit-exact — no cross-engine
    // ln()/log() drift, which is why this isn't spelled as log-perplexity.
    // Scale shape: per-(doc,gram) counts combine map-side; the two LM
    // count tables aggregate from that same persisted relation; grams
    // ride as xxhash64 longs (the boilerplate/decontaminate pattern)
    // while the oracle joins RAW strings — a collision fails the
    // compare instead of hiding in it.
    "q_text_lmscore" -> ((s: SparkSession, d: String) =>
      lmScores(s, d).orderBy(col("doc_id"))),

    // CCNet-style PERPLEXITY TIERS (head / middle / tail thirds per
    // language, fluent docs first): the bucketing CCNet uses to keep
    // head+middle and route tail to re-filtering. Rank = exact integer
    // score ratio with doc_id tie-break -> deterministic ntile(3).
    // Scale note: the ntile window sorts DOC-level rows per language —
    // fine through sf1 (1.5x at the 10x gate) but a hot language is one
    // reducer's sort at web scale; the drop-in fix there is broadcast
    // tercile THRESHOLDS (approx quantiles) + a map-side bucket assign,
    // traded here for the exact, engine-agnostic ntile the oracle pins
    "q_text_ppl_buckets" -> ((s: SparkSession, d: String) => {
      import org.apache.spark.sql.expressions.Window
      val tier = ntile(3).over(
        Window.partitionBy(col("lang")).orderBy(col("avg_inv_p"), col("doc_id")))
      lmScores(s, d)
        .join(scan(s, d, "documents").select(col("doc_id"), col("lang")), Seq("doc_id"))
        .withColumn("tier", tier)
        .select(col("doc_id"), col("lang"),
          when(col("tier") === 1, "head").when(col("tier") === 2, "middle")
            .otherwise("tail").as("ppl_bucket"))
        .orderBy(col("doc_id"))
    }),

    // METADATA LABEL-NOISE AUDIT — per source, how often the declared
    // `lang` disagrees with the n-gram language detector: the "is this
    // crawl's metadata trustworthy" QA gate a corpus pipeline runs
    // before using declared labels for mixture decisions. One codegen'd
    // map pass + a source-sized groupBy — nothing shuffles but the
    // per-source partial counts
    "q_label_noise" -> ((s: SparkSession, d: String) => {
      scan(s, d, "documents")
        .withColumn("pred_lang", langId(col("text")))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("pred_lang") =!= col("lang"), 1L).otherwise(0L)).as("n_mismatch"))
        .withColumn("mismatch_rate",
          col("n_mismatch").cast("double") / col("n_docs").cast("double"))
        .orderBy(col("source"))
    }),

    // CROSS-SOURCE OVERLAP MATRIX — corpus forensics: which crawl
    // sources mirror each other's content? For every source pair, the
    // number of prefix fingerprints present in BOTH. Scale shape: one
    // distinct + one groupBy on the fingerprint; source pairs are
    // expanded IN-ROW from the per-fp sorted source set — no fp
    // self-join, and fps shared by more than OverlapMaxSources sources
    // are dropped (hot-group cap + observe'd drop count — see
    // CorpusOps.sourceOverlap) so a viral fingerprint at open-domain
    // source cardinality can't build an S²-struct row either
    "q_source_overlap" -> ((s: SparkSession, d: String) => {
      graft.ops.CorpusOps.sourceOverlap(
        scan(s, d, "documents")
          .select(prefixFingerprint(col("text"), 5).as("fp"), col("source")),
        "fp", "source", maxSources = OverlapMaxSources)
        .orderBy(col("source_a"), col("source_b"))
    }),

    // fingerprint clusters: md5 over the 5-word normalized prefix, keep
    // clusters with >1 member (group sizes, not pairs — scales linearly).
    // Prefix (not whole-text) fingerprint so the query exercises real
    // collisions at sf0.01, where no two docs are exact dups
    "q_text_fingerprint" -> ((s: SparkSession, d: String) => {
      scan(s, d, "documents")
        .select(col("doc_id"), prefixFingerprint(col("text"), 5).as("fp"))
        .groupBy(col("fp"))
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("canonical_doc"))
        .filter(col("n_docs") > 1)
        .orderBy(col("fp"))
    }),

    // hashed-feature LINEAR-MODEL scoring — the plan shape of a
    // fastText-style quality classifier at corpus scale: per-token
    // weights w(t) ∈ [-1, 1] looked up by hash (an honest stand-in for a
    // trained weight table — a real model broadcasts its weights and the
    // plan is otherwise identical), doc score = Σ w(t) / n. The weight
    // sum is an exact integer fold inside one array expression: per-doc,
    // map-side, shuffle-free — 100 TB scoring is a single codegen'd pass
    "q_text_score" -> ((s: SparkSession, d: String) => {
      val toks = split(trim(lower(col("text"))), "\\s+")
      val wsum = aggregate(
        transform(toks, t =>
          graft.ops.Dedup.hex60(md5(concat(lit("w:"), t).cast("binary"))) % 2001L - 1000L),
        lit(0L), (acc, x) => acc + x)
      scan(s, d, "documents")
        .select(col("doc_id"), size(toks).cast("long").as("n_toks"), wsum.as("w_sum"))
        .withColumn("score", col("w_sum").cast("double") / (lit(1000.0) * col("n_toks")))
        .withColumn("keep", col("score") > 0.0)
        .orderBy(col("doc_id"))
    }),

    // READABILITY census (Flesch–Kincaid grade, Kincaid 1975): per-doc
    // grade from three regexp counts (words, sentence terminators,
    // vowel-group syllable proxy — the classic heuristic), rolled up
    // per source. One codegen'd map pass over the corpus + one
    // combinable aggregate; the grade is a fixed IEEE chain over exact
    // integer counts, floored to milli — grades can be NEGATIVE for
    // trivial text, so ratios use floor(double /), never integer div
    "q_text_readability" -> ((s: SparkSession, d: String) => {
      val words = size(split(trim(lower(col("text"))), "\\s+")).cast("long")
      val sents = greatest(regexp_count(col("text"), lit("[.!?]+")), lit(1)).cast("long")
      val syls = regexp_count(lower(col("text")), lit("[aeiouy]+")).cast("long")
      val grade = floor((lit(0.39) * words.cast("double") / sents.cast("double")
        + lit(11.8) * syls.cast("double") / words.cast("double")
        - lit(15.59)) * 1000.0).cast("long")
      scan(s, d, "documents")
        .select(col("source"), grade.as("grade_milli"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          expr("cast(floor(sum(grade_milli) / count(1)) as long)").as("avg_grade_milli"),
          min(col("grade_milli")).as("min_grade_milli"),
          max(col("grade_milli")).as("max_grade_milli"))
        .orderBy(col("source"))
    }),

    // RAG chunking: 120-char windows every 90 chars (25% overlap) —
    // the retrieval-index preprocessing pass; map-only, no shuffle
    // (see CorpusOps.chunkText)
    "q_text_chunks" -> ((s: SparkSession, d: String) =>
      graft.ops.CorpusOps.chunkText(scan(s, d, "documents"), "doc_id", "text",
          size = 120, stride = 90)
        .orderBy(col("doc_id"), col("chunk_id")))
  ) ++ Map(

    // COLLOCATION MINING — bigram association strength as exact lift
    // P(ab)/(P(a)P(b)), the log-free PMI (pointwise mutual information
    // = log(lift); the ranking is identical and log() is banned by the
    // libm rule). Token-instance-bound: one in-row bigram zip + two
    // combinable censuses; unigram ranks join back word-sized; the
    // lift multiplies exact integers AS DOUBLES in a fixed order (the
    // q_profile_chisq precedent — long products would overflow on
    // hapax pairs at corpus scale). Support floor 5, top-200 with
    // key-complete tie-break
    "q_text_collocations" -> ((s: SparkSession, d: String) => {
      import graft.ops.CacheScope.ScopedPersist
      val toks = scan(s, d, "documents")
        .select(split(trim(lower(col("text"))), "\\s+").as("ws"))
        .scopedPersist() // feeds bigram census, unigram census, n_uni
      val pc = toks.filter(size(col("ws")) >= 2)
        .select(explode(expr(
          "transform(sequence(0, size(ws) - 2), i -> struct(ws[i] AS w1, ws[i + 1] AS w2))")).as("z"))
        .select(col("z.w1").as("w1"), col("z.w2").as("w2"))
        .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c_ab"))
      val uni = toks.select(explode(col("ws")).as("w"))
      val uc = uni.groupBy(col("w")).agg(count(lit(1)).as("c"))
      val g = uni.agg(count(lit(1)).as("n_uni"))
        .crossJoin(pc.agg(sum(col("c_ab")).as("n_bi")))
      pc.filter(col("c_ab") >= 5)
        .join(uc.select(col("w").as("w1"), col("c").as("c_a")), Seq("w1"))
        .join(uc.select(col("w").as("w2"), col("c").as("c_b")), Seq("w2"))
        .crossJoin(broadcast(g))
        .select(col("w1"), col("w2"), col("c_ab"), col("c_a"), col("c_b"),
          ((col("c_ab").cast("double") * col("n_uni").cast("double") * col("n_uni").cast("double"))
            / (col("n_bi").cast("double") * col("c_a").cast("double") * col("c_b").cast("double")))
            .as("lift"))
        .orderBy(col("lift").desc, col("w1"), col("w2")).limit(200)
    })
  )

  private val stopList = defaultStopwords.map(w => s"'$w'").mkString("[", ",", "]")

  /** Shared corpus-LM CTE chain (through `sc`: per-doc n_bigrams +
    * integer score_sum) — q_text_lmscore / q_text_ppl_buckets oracles. */
  private lazy val lmCtes: String =
    raw"""w AS (
         |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ws
         |  FROM documents),
         |bgidx AS (
         |  SELECT doc_id, ws, unnest(range(1, len(ws))) AS i
         |  FROM w WHERE len(ws) >= 2),
         |bg AS (SELECT doc_id, ws[i] AS p, ws[i+1] AS wd FROM bgidx),
         |inst AS (SELECT doc_id, p, wd, COUNT(*) AS c FROM bg GROUP BY 1, 2, 3),
         |cnt2 AS (SELECT p, wd, CAST(SUM(c) AS BIGINT) AS c2 FROM inst GROUP BY 1, 2),
         |cnt1 AS (SELECT p, CAST(SUM(c) AS BIGINT) AS c1 FROM inst GROUP BY 1),
         |sc AS (
         |  SELECT i.doc_id, CAST(SUM(i.c) AS BIGINT) AS n_bigrams,
         |    CAST(SUM(i.c * ((1000000 * cnt1.c1) // cnt2.c2)) AS BIGINT) AS score_sum
         |  FROM inst i
         |    JOIN cnt2 ON cnt2.p = i.p AND cnt2.wd = i.wd
         |    JOIN cnt1 ON cnt1.p = i.p
         |  GROUP BY i.doc_id)""".stripMargin

  /** Shared DuckDB langid CTEs (`t` scores, `m` adds the max) + the
    * argmax CASE — one spelling for the per-doc and confusion oracles.
    */
  private lazy val langidCtes: String = {
    val markers = graft.ops.TextAnalysis.defaultMarkers
    val scoreExprs = markers.map { case (lang, ws) =>
      val list = ws.map(w => s"'$w'").mkString("[", ",", "]")
      s"len(list_filter(string_split_regex(trim(lower(text)), '\\s+'), w -> list_contains($list, w))) AS score_$lang"
    }.mkString(",\n    ")
    val maxExpr = markers.map { case (l, _) => s"score_$l" }.mkString("greatest(", ", ", ")")
    s"""t AS (
       |  SELECT doc_id, lang, source,
       |    $scoreExprs
       |  FROM documents),
       |m AS (SELECT *, $maxExpr AS __mx FROM t)""".stripMargin
  }

  private lazy val langidCaseExpr: String =
    graft.ops.TextAnalysis.defaultMarkers.map { case (l, _) =>
      s"WHEN score_$l = __mx AND __mx > 0 THEN '$l'"
    }.mkString("CASE ", " ", " ELSE 'und' END")

  val oracleSql: Map[String, String] = Map(
    // the staged fixed-point log replays as NESTED subqueries (one per
    // stage — lateral aliases would inline exponentially, the vocabCte
    // lesson), everything else is a plain bigram census
    "q_text_entropy" -> {
      import graft.ops.UlmTokenizer
      val inner0 = "SELECT doc_id, b, c, t FROM j"
      val staged = UlmTokenizer.costStages("t", "c", UlmTokenizer.Duck)
        .foldLeft(inner0) { case (acc, (n, e)) => s"SELECT *, $e AS $n FROM ($acc)" }
      raw"""WITH w0 AS (SELECT doc_id,
           |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS w
           |  FROM documents),
           |wf AS (SELECT doc_id, w FROM w0
           |       WHERE regexp_full_match(w, '[a-z]+') AND length(w) >= 2),
           |bg AS (SELECT doc_id, substr(w, CAST(i AS INT), 2) AS b
           |       FROM (SELECT doc_id, w, unnest(range(1, length(w))) AS i FROM wf)),
           |cs AS (SELECT doc_id, b, CAST(COUNT(*) AS BIGINT) AS c FROM bg GROUP BY 1, 2),
           |pf AS (SELECT doc_id, substr(b, 1, 1) AS a, CAST(SUM(c) AS BIGINT) AS t
           |       FROM cs GROUP BY 1, 2),
           |j AS (SELECT cs.doc_id, cs.b, cs.c, pf.t
           |      FROM cs JOIN pf ON pf.doc_id = cs.doc_id AND pf.a = substr(cs.b, 1, 1)),
           |st AS MATERIALIZED ($staged),
           |h AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,
           |        CAST(SUM(c * cost_cb) AS BIGINT) AS hsum
           |      FROM st GROUP BY doc_id)
           |SELECT d.doc_id, d.lang,
           |  CAST(COALESCE(h.n_bigrams, 0) AS BIGINT) AS n_bigrams,
           |  CAST(COALESCE(h.hsum // h.n_bigrams, 0) AS BIGINT) AS h_cb
           |FROM documents d LEFT JOIN h USING (doc_id)
           |ORDER BY d.doc_id""".stripMargin
    },

    "q_text_zipf_slope" -> {
      import graft.ops.UlmTokenizer
      val staged = UlmTokenizer.costStages("v", "1", UlmTokenizer.Duck)
        .foldLeft("SELECT * FROM vals") { case (acc, (n, e)) =>
          s"SELECT *, $e AS $n FROM ($acc)" }
      raw"""WITH tk AS (SELECT unnest(string_split_regex(trim(lower(text)), '\s+'))
           |              AS w
           |            FROM documents),
           |c AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM tk
           |      WHERE regexp_full_match(w, '[a-z]+') GROUP BY w),
           |top AS (SELECT w, c,
           |          CAST(ROW_NUMBER() OVER (ORDER BY c DESC, w) AS BIGINT) AS r
           |        FROM c ORDER BY c DESC, w LIMIT 64),
           |vals AS (SELECT DISTINCT v FROM (
           |    SELECT r AS v FROM top UNION SELECT c FROM top)),
           |st AS MATERIALIZED ($staged),
           |cbt AS (SELECT v, CAST(cost_cb AS BIGINT) AS cb FROM st),
           |pts AS (SELECT x1.cb AS x, x2.cb AS y FROM top
           |        JOIN cbt x1 ON x1.v = top.r
           |        JOIN cbt x2 ON x2.v = top.c),
           |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
           |        CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
           |        CAST(SUM(x * y) AS BIGINT) AS sxy,
           |        CAST(SUM(x * x) AS BIGINT) AS sxx
           |      FROM pts)
           |SELECT n AS n_terms,
           |  CAST(n * sxy - sx * sy AS BIGINT) AS slope_num,
           |  CAST(n * sxx - sx * sx AS BIGINT) AS slope_den,
           |  CAST(CASE WHEN n * sxy - sx * sy < 0 THEN -1 ELSE 1 END AS BIGINT)
           |    AS slope_sign,
           |  CAST(abs(n * sxy - sx * sy) * 1000000 // (n * sxx - sx * sx)
           |    AS BIGINT) AS slope_mag_x6
           |FROM a""".stripMargin
    },

    // same census/cb machinery as q_text_kl, with the mixture entering
    // as the exact product-ratio identity
    "q_text_jsd" -> {
      import graft.ops.UlmTokenizer
      val staged = UlmTokenizer.costStages("v", "1", UlmTokenizer.Duck)
        .foldLeft("SELECT * FROM vals") { case (acc, (n, e)) =>
          s"SELECT *, $e AS $n FROM ($acc)" }
      raw"""WITH tk AS (SELECT lang,
           |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS w
           |  FROM documents WHERE lang IN ('en', 'de')),
           |c AS (SELECT lang, w, CAST(COUNT(*) AS BIGINT) AS n FROM tk
           |      WHERE regexp_full_match(w, '[a-z]+') GROUP BY lang, w),
           |vc AS (SELECT DISTINCT w FROM c),
           |m0 AS (SELECT vc.w,
           |        COALESCE(e.n, 0) + 1 AS cp, COALESCE(g.n, 0) + 1 AS cq
           |      FROM vc
           |      LEFT JOIN (SELECT w, n FROM c WHERE lang = 'en') e ON e.w = vc.w
           |      LEFT JOIN (SELECT w, n FROM c WHERE lang = 'de') g ON g.w = vc.w),
           |tot AS (SELECT CAST(SUM(cp) AS BIGINT) AS np,
           |               CAST(SUM(cq) AS BIGINT) AS nq FROM m0),
           |m AS (SELECT cp, cq, np, nq,
           |        CAST(cp * nq * 2 AS BIGINT) AS a1,
           |        CAST(cq * np * 2 AS BIGINT) AS a2,
           |        CAST(cp * nq + cq * np AS BIGINT) AS a0
           |      FROM m0 CROSS JOIN tot),
           |vals AS (SELECT DISTINCT v FROM (
           |    SELECT a1 AS v FROM m UNION SELECT a2 FROM m
           |    UNION SELECT a0 FROM m)),
           |st AS MATERIALIZED ($staged),
           |cbt AS (SELECT v, CAST(cost_cb AS BIGINT) AS cb FROM st)
           |SELECT CAST(COUNT(*) AS BIGINT) AS n_vocab,
           |  CAST(SUM((cp * 1000000 // np) * (x1.cb - x0.cb)) AS BIGINT)
           |    AS kl_p_m_cbppm,
           |  CAST(SUM((cq * 1000000 // nq) * (x2.cb - x0.cb)) AS BIGINT)
           |    AS kl_q_m_cbppm,
           |  CAST(SUM((cp * 1000000 // np) * (x1.cb - x0.cb))
           |     + SUM((cq * 1000000 // nq) * (x2.cb - x0.cb)) AS BIGINT)
           |    AS jsd_x2_cbppm
           |FROM m JOIN cbt x1 ON x1.v = m.a1
           |  JOIN cbt x2 ON x2.v = m.a2
           |  JOIN cbt x0 ON x0.v = m.a0""".stripMargin
    },

    "q_text_kl" -> {
      import graft.ops.UlmTokenizer
      val staged = UlmTokenizer.costStages("v", "1", UlmTokenizer.Duck)
        .foldLeft("SELECT * FROM vals") { case (acc, (n, e)) =>
          s"SELECT *, $e AS $n FROM ($acc)" }
      raw"""WITH tk AS (SELECT lang,
           |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS w
           |  FROM documents WHERE lang IN ('en', 'de')),
           |c AS (SELECT lang, w, CAST(COUNT(*) AS BIGINT) AS n FROM tk
           |      WHERE regexp_full_match(w, '[a-z]+') GROUP BY lang, w),
           |vc AS (SELECT DISTINCT w FROM c),
           |m AS (SELECT vc.w,
           |        COALESCE(e.n, 0) + 1 AS cp, COALESCE(g.n, 0) + 1 AS cq
           |      FROM vc
           |      LEFT JOIN (SELECT w, n FROM c WHERE lang = 'en') e ON e.w = vc.w
           |      LEFT JOIN (SELECT w, n FROM c WHERE lang = 'de') g ON g.w = vc.w),
           |tot AS (SELECT CAST(SUM(cp) AS BIGINT) AS np,
           |               CAST(SUM(cq) AS BIGINT) AS nq FROM m),
           |vals AS (SELECT DISTINCT v FROM (
           |    SELECT cp AS v FROM m UNION SELECT cq FROM m
           |    UNION SELECT np FROM tot UNION SELECT nq FROM tot)),
           |st AS MATERIALIZED ($staged),
           |cbt AS (SELECT v, CAST(cost_cb AS BIGINT) AS cb FROM st),
           |j AS (SELECT m.cp, m.cq, tot.np, tot.nq,
           |        x1.cb AS cb_p, x2.cb AS cb_q, x3.cb AS cb_np, x4.cb AS cb_nq
           |      FROM m CROSS JOIN tot
           |      JOIN cbt x1 ON x1.v = m.cp
           |      JOIN cbt x2 ON x2.v = m.cq
           |      JOIN cbt x3 ON x3.v = tot.np
           |      JOIN cbt x4 ON x4.v = tot.nq),
           |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_vocab,
           |        CAST(SUM((cp * 1000000 // np) * (cb_p + cb_nq - cb_q - cb_np))
           |          AS BIGINT) AS kl_en_de,
           |        CAST(SUM((cq * 1000000 // nq) * (cb_q + cb_np - cb_p - cb_nq))
           |          AS BIGINT) AS kl_de_en
           |      FROM j)
           |SELECT direction, n_vocab, kl_cb_ppm FROM (
           |  SELECT 'de_to_en' AS direction, n_vocab, kl_de_en AS kl_cb_ppm FROM a
           |  UNION ALL
           |  SELECT 'en_to_de', n_vocab, kl_en_de FROM a
           |) ORDER BY direction""".stripMargin
    },

    // the same relational recurrence: exploded turn index, window
    // prefix sums, greedy budget admission
    "q_text_sft" ->
      raw"""WITH dn AS (SELECT doc_id,
           |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n
           |  FROM documents WHERE length(trim(text)) > 0),
           |tj AS (SELECT doc_id, n, unnest(range(0, n // 5 + 1)) AS j FROM dn),
           |lj AS (SELECT doc_id, n, j,
           |         CAST(5 + (doc_id + 3 * j) % 10 AS BIGINT) AS lj FROM tj),
           |cm AS (SELECT *, CAST(COALESCE(SUM(lj) OVER (PARTITION BY doc_id
           |         ORDER BY j ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           |         AS BIGINT) AS cum FROM lj),
           |t AS (SELECT doc_id, n, j, LEAST(lj, n - cum) AS len, cum
           |      FROM cm WHERE cum < n),
           |t2 AS (SELECT *, len + 2 AS wtpl,
           |         SUM(len + 2) OVER (PARTITION BY doc_id ORDER BY j) AS cumt
           |       FROM t)
           |SELECT doc_id, CAST(MAX(n) AS BIGINT) AS n_toks,
           |  CAST(COUNT(*) AS BIGINT) AS n_turns,
           |  CAST(COALESCE(SUM(CASE WHEN j % 2 = 0 THEN len ELSE 0 END), 0) AS BIGINT) AS user_toks,
           |  CAST(COALESCE(SUM(CASE WHEN j % 2 = 1 THEN len ELSE 0 END), 0) AS BIGINT) AS asst_toks,
           |  CAST(COUNT(*) * 2 AS BIGINT) AS overhead_toks,
           |  CAST(COALESCE(SUM(CASE WHEN cumt <= 64 THEN 1 ELSE 0 END), 0) AS BIGINT) AS turns_in_budget,
           |  CAST(COALESCE(SUM(CASE WHEN cumt <= 64 THEN wtpl ELSE 0 END), 0) AS BIGINT) AS toks_in_budget
           |FROM t2 GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // same word stream, same staged log over DISTINCT df values; the
    // nested-subquery staging (never lateral aliases) per the vocabCte
    // lesson
    "q_text_tfidf" -> {
      import graft.ops.UlmTokenizer
      val staged = UlmTokenizer.costStages("nn", "dfv", UlmTokenizer.Duck)
        .foldLeft("SELECT * FROM vals") { case (acc, (n, e)) =>
          s"SELECT *, $e AS $n FROM ($acc)" }
      raw"""WITH d AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS toks
           |           FROM documents WHERE length(trim(text)) > 0),
           |w AS (SELECT doc_id, unnest(toks) AS w FROM d),
           |tf AS (SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS tf
           |       FROM w WHERE regexp_full_match(w, '[a-z]+') GROUP BY doc_id, w),
           |dfc AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY w),
           |nn0 AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS nn FROM tf),
           |vals AS (SELECT DISTINCT df AS dfv, nn FROM dfc, nn0),
           |st AS MATERIALIZED ($staged),
           |idf AS (SELECT dfv AS df, CAST(cost_cb AS BIGINT) AS idf_cb FROM st)
           |SELECT tf.doc_id, tf.w, tf.tf, dfc.df, idf.idf_cb,
           |  CAST(tf.tf * idf.idf_cb AS BIGINT) AS score_cb
           |FROM tf JOIN dfc ON dfc.w = tf.w JOIN idf ON idf.df = dfc.df
           |ORDER BY score_cb DESC, doc_id, tf.w LIMIT 50""".stripMargin
    },

    "q_text_pmi" -> {
      import graft.ops.UlmTokenizer
      val staged = UlmTokenizer.costStages("v", "1", UlmTokenizer.Duck)
        .foldLeft("SELECT * FROM vals") { case (acc, (n, e)) =>
          s"SELECT *, $e AS $n FROM ($acc)" }
      raw"""WITH d AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+')
           |             AS toks
           |           FROM documents WHERE length(trim(text)) > 0),
           |t0 AS (SELECT doc_id, toks, unnest(range(1, len(toks) + 1)) AS pos
           |       FROM d),
           |tr AS (SELECT doc_id, pos, toks[pos] AS w FROM t0),
           |tf AS (SELECT doc_id,
           |         row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS p2, w
           |       FROM tr WHERE regexp_full_match(w, '[a-z]+')),
           |bi AS (SELECT doc_id, w,
           |         lead(w) OVER (PARTITION BY doc_id ORDER BY p2) AS nx
           |       FROM tf),
           |ua AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM tf GROUP BY w),
           |bc AS (SELECT w, nx, CAST(COUNT(*) AS BIGINT) AS c_ab FROM bi
           |       WHERE nx IS NOT NULL GROUP BY w, nx),
           |nn AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM ua),
           |nb AS (SELECT CAST(SUM(c_ab) AS BIGINT) AS nbt FROM bc),
           |cand AS (SELECT bc.w, bc.nx, bc.c_ab, a.c AS c_a, b.c AS c_b,
           |           nn.n, nb.nbt
           |         FROM bc JOIN ua a ON a.w = bc.w JOIN ua b ON b.w = bc.nx,
           |           nn, nb
           |         WHERE bc.c_ab >= 5),
           |vals AS (SELECT DISTINCT v FROM (
           |    SELECT c_ab AS v FROM cand UNION SELECT c_a FROM cand
           |    UNION SELECT c_b FROM cand UNION SELECT n FROM cand
           |    UNION SELECT nbt FROM cand)),
           |st AS MATERIALIZED ($staged),
           |cbt AS (SELECT v, CAST(cost_cb AS BIGINT) AS cb FROM st),
           |j AS (SELECT cand.w AS a, cand.nx AS b, cand.c_ab,
           |        x1.cb + 2 * x4.cb - x5.cb - x2.cb - x3.cb AS pmi_cb
           |      FROM cand
           |      JOIN cbt x1 ON x1.v = cand.c_ab
           |      JOIN cbt x2 ON x2.v = cand.c_a
           |      JOIN cbt x3 ON x3.v = cand.c_b
           |      JOIN cbt x4 ON x4.v = cand.n
           |      JOIN cbt x5 ON x5.v = cand.nbt)
           |SELECT a, b, c_ab, CAST(pmi_cb AS BIGINT) AS pmi_cb FROM j
           |WHERE pmi_cb > 0 ORDER BY pmi_cb DESC, a, b LIMIT 20""".stripMargin
    },

    "q_text_wsample" -> {
      import graft.ops.UlmTokenizer
      val h = DedupQueries.sqlHex60Public("md5('ws:' || CAST(doc_id AS VARCHAR))")
      val staged = UlmTokenizer.costStages("1099511627776", "hm1",
          UlmTokenizer.Duck)
        .foldLeft("SELECT * FROM hh") { case (acc, (n, e)) =>
          s"SELECT *, $e AS $n FROM ($acc)" }
      raw"""WITH dt AS (SELECT doc_id,
           |    CASE WHEN length(trim(text)) = 0 THEN 0
           |         ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tok
           |  FROM documents),
           |df AS (SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok FROM dt
           |       WHERE n_tok > 0),
           |hh AS (SELECT doc_id, n_tok, ($h) % 1099511627776 + 1 AS hm1 FROM df),
           |st AS MATERIALIZED ($staged),
           |p AS (SELECT doc_id, n_tok, CAST(cost_cb AS BIGINT) AS dlog_cb,
           |        CAST(CAST(cost_cb AS BIGINT) * 1000000 // n_tok AS BIGINT)
           |          AS prio
           |      FROM st)
           |SELECT doc_id, n_tok, dlog_cb, prio FROM p
           |ORDER BY prio, doc_id LIMIT 20""".stripMargin
    },

    "q_text_pack" ->
      raw"""WITH dt AS (SELECT doc_id,
           |    CASE WHEN length(trim(text)) = 0 THEN 0
           |         ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tok
           |  FROM documents),
           |o AS (SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok,
           |        CAST(COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
           |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           |          AS BIGINT) AS st
           |      FROM dt),
           |sp AS (SELECT n_tok, st,
           |         (st + n_tok - 1) // 512 - st // 512 + 1 AS spans
           |       FROM o WHERE n_tok > 0),
           |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           |        CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
           |        CAST(SUM(CASE WHEN spans = 1 THEN 1 ELSE 0 END) AS BIGINT)
           |          AS span1_docs,
           |        CAST(SUM(CASE WHEN spans = 2 THEN 1 ELSE 0 END) AS BIGINT)
           |          AS span2_docs,
           |        CAST(SUM(CASE WHEN spans >= 3 THEN 1 ELSE 0 END) AS BIGINT)
           |          AS span3p_docs,
           |        CAST(SUM(spans - 1) AS BIGINT) AS n_crossings
           |      FROM sp)
           |SELECT n_docs, total_tokens, CAST(512 AS BIGINT) AS chunk_len,
           |  CAST((total_tokens + 511) // 512 AS BIGINT) AS n_chunks,
           |  span1_docs, span2_docs, span3p_docs, n_crossings,
           |  CAST((span2_docs + span3p_docs) * 1000000 // n_docs AS BIGINT)
           |    AS split_doc_ppm,
           |  CAST(((total_tokens + 511) // 512) * 512 - total_tokens AS BIGINT)
           |    AS tail_pad_tokens
           |FROM a""".stripMargin,

    // same 60-bit md5 parse, same bucket arithmetic, pure integers
    "q_text_feathash" -> {
      val hb = DedupQueries.sqlHex60Public("md5('fh:' || w)")
      raw"""WITH tok AS (SELECT doc_id,
           |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS w
           |  FROM documents),
           |t AS (SELECT doc_id, w, $hb % 1024 AS b FROM tok
           |      WHERE regexp_full_match(w, '[a-z]+')),
           |bk AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS nw
           |       FROM (SELECT DISTINCT w, b FROM t) GROUP BY b),
           |c AS (SELECT CAST(SUM(nw) AS BIGINT) AS n_words,
           |        CAST(COUNT(*) AS BIGINT) AS n_buckets_used,
           |        CAST(MAX(nw) AS BIGINT) AS max_bucket_words,
           |        CAST(COALESCE(SUM(CASE WHEN nw >= 2 THEN nw ELSE 0 END), 0)
           |          AS BIGINT) AS collided_words
           |      FROM bk),
           |dn AS (SELECT CAST(SUM(nnz) AS BIGINT) AS sum_doc_nnz FROM (
           |         SELECT doc_id, COUNT(DISTINCT b) AS nnz FROM t GROUP BY doc_id)),
           |ti AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_token_instances FROM t)
           |SELECT c.n_words, c.n_buckets_used, c.max_bucket_words,
           |  c.collided_words,
           |  CAST(c.collided_words * 1000000 // c.n_words AS BIGINT) AS collision_ppm,
           |  dn.sum_doc_nnz, ti.n_token_instances
           |FROM c, dn, ti""".stripMargin
    },

    "q_text_codefrac" ->
      """WITH f AS (SELECT doc_id, n_chars,
        |    CAST(len(string_split(text, chr(10))) AS BIGINT) AS n_lines,
        |    CAST(len(regexp_extract_all(text, '[{}()\[\];]')) AS BIGINT)
        |      AS n_braces,
        |    CAST(len(regexp_extract_all(text, '(?m)^(  |\t)')) AS BIGINT)
        |      AS n_indent
        |  FROM documents WHERE n_chars > 0),
        |p AS (SELECT doc_id, n_lines, n_braces, n_indent,
        |        CAST(n_braces * 1000000 // n_chars AS BIGINT) AS brace_ppm,
        |        CAST(n_indent * 1000000 // n_lines AS BIGINT) AS indent_ppm
        |      FROM f)
        |SELECT doc_id, n_lines, n_braces, n_indent, brace_ppm, indent_ppm,
        |  brace_ppm > 20000 OR indent_ppm > 300000 AS is_codey
        |FROM p ORDER BY doc_id""".stripMargin,

    "q_text_hapax" ->
      """WITH w AS (SELECT unnest(string_split_regex(trim(lower(text)), '\s+'))
        |             AS w
        |           FROM documents WHERE length(trim(text)) > 0),
        |c AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM w GROUP BY w),
        |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_vocab,
        |        CAST(SUM(c) AS BIGINT) AS n_tokens,
        |        CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
        |        CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dis,
        |        CAST(SUM(CASE WHEN c = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_tris
        |      FROM c)
        |SELECT n_vocab, n_tokens, n_hapax, n_dis, n_tris,
        |  CAST(n_hapax * 1000000 // n_vocab AS BIGINT) AS hapax_vocab_ppm
        |FROM a""".stripMargin,

    "q_text_rouge" ->
      """WITH d AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+')
        |             AS toks
        |           FROM documents WHERE length(trim(text)) > 0),
        |t0 AS (SELECT doc_id, toks,
        |         unnest(range(1, len(toks) + 1)) AS pos FROM d),
        |t AS (SELECT doc_id, pos, toks[pos] AS w FROM t0),
        |bi0 AS (SELECT doc_id, pos, w,
        |          lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS nx
        |        FROM t),
        |grams AS (
        |  SELECT doc_id, CAST(1 AS BIGINT) AS k, w AS g FROM t
        |  UNION ALL
        |  SELECT doc_id, CAST(2 AS BIGINT), w || ' ' || nx FROM bi0
        |  WHERE nx IS NOT NULL),
        |gc AS (SELECT doc_id, k, g, CAST(COUNT(*) AS BIGINT) AS c
        |       FROM grams GROUP BY doc_id, k, g),
        |ov AS (SELECT a.doc_id AS doc_a, a.k,
        |         CAST(SUM(LEAST(a.c, b.c)) AS BIGINT) AS ov
        |       FROM gc a JOIN gc b ON a.doc_id % 2 = 0
        |         AND b.doc_id = a.doc_id + 1 AND a.k = b.k AND a.g = b.g
        |       GROUP BY a.doc_id, a.k),
        |tot AS (SELECT doc_id - doc_id % 2 AS doc_a, k,
        |          CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN c END) AS BIGINT) AS na,
        |          CAST(SUM(CASE WHEN doc_id % 2 = 1 THEN c END) AS BIGINT) AS nb
        |        FROM gc GROUP BY 1, 2)
        |SELECT tot.doc_a, tot.doc_a + 1 AS doc_b, tot.k, tot.na, tot.nb,
        |  COALESCE(ov.ov, 0) AS ov,
        |  CAST(COALESCE(ov.ov, 0) * 1000000 // tot.na AS BIGINT) AS p_ppm,
        |  CAST(COALESCE(ov.ov, 0) * 1000000 // tot.nb AS BIGINT) AS r_ppm,
        |  CAST(2 * COALESCE(ov.ov, 0) * 1000000 // (tot.na + tot.nb) AS BIGINT)
        |    AS f1_ppm
        |FROM tot LEFT JOIN ov ON tot.doc_a = ov.doc_a AND tot.k = ov.k
        |WHERE tot.na IS NOT NULL AND tot.nb IS NOT NULL
        |ORDER BY tot.doc_a, tot.k""".stripMargin,

    "q_text_tokens" ->
      """SELECT doc_id, n_chars,
        |  CASE WHEN length(trim(text)) = 0 THEN 0
        |       ELSE len(string_split_regex(trim(text), '\s+')) END AS n_ws_tokens,
        |  len(regexp_extract_all(text, '[a-z]+|[A-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS n_bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_text_quality" ->
      s"""WITH t AS (
         |  SELECT doc_id, text,
         |    len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
         |        w -> list_contains($stopList, w))) AS n_stop,
         |    CASE WHEN length(trim(text)) = 0 THEN 0
         |         ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_ws,
         |    len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) AS n_punct
         |  FROM documents)
         |SELECT doc_id, CAST(n_stop AS BIGINT) AS n_stop,
         |  CAST(n_stop AS DOUBLE) / greatest(CAST(n_ws AS DOUBLE), 1.0) AS stop_ratio,
         |  CAST(n_punct AS DOUBLE) / greatest(CAST(length(text) AS DOUBLE), 1.0) AS punct_ratio,
         |  CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE)
         |    / greatest(CAST(n_ws AS DOUBLE), 1.0) AS avg_wlen,
         |  (CAST(n_stop AS DOUBLE) / greatest(CAST(n_ws AS DOUBLE), 1.0)) * 2.0
         |    - (CAST(n_punct AS DOUBLE) / greatest(CAST(length(text) AS DOUBLE), 1.0)) * 4.0
         |    - abs(CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE)
         |          / greatest(CAST(n_ws AS DOUBLE), 1.0) - 5.0) * 0.1 AS quality
         |FROM t ORDER BY doc_id""".stripMargin,
    "q_text_langid" ->
      s"""WITH $langidCtes
         |SELECT doc_id, lang, $langidCaseExpr AS pred_lang,
         |  CAST(score_en AS BIGINT) AS score_en, CAST(score_de AS BIGINT) AS score_de,
         |  CAST(score_fr AS BIGINT) AS score_fr, CAST(score_es AS BIGINT) AS score_es,
         |  CAST(score_zh AS BIGINT) AS score_zh
         |FROM m ORDER BY doc_id""".stripMargin,

    "q_langid_confusion" ->
      s"""WITH $langidCtes,
         |p AS (SELECT lang, $langidCaseExpr AS pred_lang FROM m)
         |SELECT lang, pred_lang, COUNT(*) AS n_docs
         |FROM p GROUP BY lang, pred_lang ORDER BY lang, pred_lang""".stripMargin,


    // FORMULA replay (never parses a line): with nw nonempty words,
    // turns = ceil(nw/6), roles alternate from user, avg = nw·1000/turns
    "q_text_turns" ->
      raw"""WITH w AS (SELECT doc_id,
           |        list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> x <> '') AS ws
           |      FROM documents),
           |n AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS nw FROM w),
           |t AS (SELECT doc_id, nw,
           |        CASE WHEN nw = 0 THEN 0 ELSE (nw + 5) // 6 END AS n_turns FROM n)
           |SELECT doc_id, CAST(n_turns AS BIGINT) AS n_turns,
           |  CAST((n_turns + 1) // 2 AS BIGINT) AS n_user,
           |  CAST(n_turns // 2 AS BIGINT) AS n_assistant,
           |  nw > 0 AS starts_user,
           |  TRUE AS alternation_ok,
           |  CAST(CASE WHEN n_turns = 0 THEN 0 ELSE nw * 1000 // n_turns END AS BIGINT)
           |    AS avg_words_milli
           |FROM t ORDER BY doc_id""".stripMargin,

    "q_text_vocab_coverage" ->
      raw"""WITH t AS (SELECT lang, unnest(string_split_regex(trim(lower(text)), '\s+')) AS w
           |           FROM documents),
           |tt AS (SELECT lang, w FROM t WHERE w <> ''),
           |v AS (SELECT w FROM (SELECT w, count(*) AS c FROM tt GROUP BY w
           |                     ORDER BY c DESC, w ASC LIMIT 1000))
           |SELECT lang, CAST(count(*) AS BIGINT) AS n_tokens,
           |  CAST(SUM(CASE WHEN w IN (SELECT w FROM v) THEN 1 ELSE 0 END) AS BIGINT) AS n_covered,
           |  CAST(SUM(CASE WHEN w IN (SELECT w FROM v) THEN 1 ELSE 0 END) * 1000000
           |    // count(*) AS BIGINT) AS coverage_ppm
           |FROM tt GROUP BY lang ORDER BY lang""".stripMargin,

    "q_label_noise" ->
      s"""WITH $langidCtes,
         |p AS (SELECT source, lang, $langidCaseExpr AS pred_lang FROM m)
         |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(CASE WHEN pred_lang <> lang THEN 1 ELSE 0 END) AS BIGINT) AS n_mismatch,
         |  CAST(SUM(CASE WHEN pred_lang <> lang THEN 1 ELSE 0 END) AS DOUBLE)
         |    / CAST(COUNT(*) AS DOUBLE) AS mismatch_rate
         |FROM p GROUP BY source ORDER BY source""".stripMargin,
    "q_text_levenshtein" ->
      """SELECT a.n_name AS name_a, b.n_name AS name_b,
        |       CAST(levenshtein(a.n_name, b.n_name) AS INT) AS lev
        |FROM nation a JOIN nation b
        |  ON substring(a.n_name, 1, 1) = substring(b.n_name, 1, 1)
        | AND a.n_name < b.n_name
        |WHERE levenshtein(a.n_name, b.n_name) <= 6
        |ORDER BY name_a, name_b""".stripMargin,
    "q_text_heavyhitters" ->
      raw"""SELECT token, COUNT(*) AS cnt
           |FROM (SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
           |      FROM documents)
           |WHERE token <> ''
           |GROUP BY token
           |ORDER BY cnt DESC, token ASC LIMIT 30""".stripMargin,
    "q_text_cms" -> {
      def b(i: Int) = DedupQueries.sqlHex60Public(s"md5('cms$i:' || token)") + " % 64"
      raw"""WITH toks AS (
           |  SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
           |  FROM documents),
           |tk AS (SELECT token FROM toks WHERE token <> ''),
           |rb AS (
           |  SELECT token, 0 AS i, ${b(0)} AS bk FROM tk
           |  UNION ALL SELECT token, 1, ${b(1)} FROM tk
           |  UNION ALL SELECT token, 2, ${b(2)} FROM tk),
           |cells AS (SELECT i, bk, CAST(count(*) AS BIGINT) AS cell FROM rb GROUP BY i, bk),
           |top AS (SELECT token, CAST(count(*) AS BIGINT) AS exact_cnt FROM tk
           |        GROUP BY token ORDER BY exact_cnt DESC, token LIMIT 10),
           |est AS (
           |  SELECT t.token, t.exact_cnt, MIN(c.cell) AS cms_est
           |  FROM top t
           |  JOIN (SELECT token, 0 AS i, ${b(0)} AS bk FROM top
           |        UNION ALL SELECT token, 1, ${b(1)} FROM top
           |        UNION ALL SELECT token, 2, ${b(2)} FROM top) tb ON tb.token = t.token
           |  JOIN cells c ON c.i = tb.i AND c.bk = tb.bk
           |  GROUP BY t.token, t.exact_cnt)
           |SELECT token, exact_cnt, cms_est, cms_est >= exact_cnt AS never_under
           |FROM est ORDER BY exact_cnt DESC, token""".stripMargin
    },

    // raw-string bigram joins; `//` is DuckDB's floor division, exact
    // on the positive BIGINTs here like Spark's `div`
    "q_text_lmscore" ->
      s"""WITH $lmCtes
         |SELECT doc_id, n_bigrams, score_sum,
         |  CAST(score_sum AS DOUBLE) / CAST(n_bigrams AS DOUBLE) AS avg_inv_p
         |FROM sc ORDER BY doc_id""".stripMargin,

    // tier replay: same deterministic rank (exact score ratio, doc_id
    // tie-break) -> ntile(3) per language, standard SQL bucket sizing
    // on both engines
    "q_text_ppl_buckets" ->
      s"""WITH $lmCtes,
         |scl AS (SELECT sc.doc_id, d.lang,
         |          CAST(score_sum AS DOUBLE) / CAST(n_bigrams AS DOUBLE) AS avg_inv_p
         |        FROM sc JOIN documents d USING (doc_id)),
         |t AS (SELECT doc_id, lang,
         |        ntile(3) OVER (PARTITION BY lang ORDER BY avg_inv_p, doc_id) AS tier
         |      FROM scl)
         |SELECT doc_id, lang,
         |  CASE tier WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS ppl_bucket
         |FROM t ORDER BY doc_id""".stripMargin,

    // oracle pairs via fp self-join (clearer SQL); the engine's in-row
    // expansion over the sorted source set is pair-for-pair equivalent.
    // The hot-group cap is mirrored: fps shared by more than
    // OverlapMaxSources distinct sources are excluded on both sides
    "q_source_overlap" ->
      raw"""WITH f AS (
           |  SELECT DISTINCT md5(array_to_string(
           |           (string_split_regex(trim(lower(text)), '\s+'))[1:5], ' ')) AS fp,
           |         source
           |  FROM documents),
           |g AS (SELECT fp FROM f GROUP BY fp
           |      HAVING COUNT(*) BETWEEN 2 AND $OverlapMaxSources)
           |SELECT a.source AS source_a, b.source AS source_b,
           |  CAST(COUNT(*) AS BIGINT) AS n_shared
           |FROM f a JOIN f b ON a.fp = b.fp AND a.source < b.source
           |JOIN g ON g.fp = a.fp
           |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_text_fingerprint" ->
      raw"""SELECT md5(array_to_string(
           |         (string_split_regex(trim(lower(text)), '\s+'))[1:5], ' ')) AS fp,
           |       COUNT(*) AS n_docs, MIN(doc_id) AS canonical_doc
           |FROM documents
           |GROUP BY 1 HAVING COUNT(*) > 1
           |ORDER BY fp""".stripMargin,
    "q_text_score" ->
      raw"""WITH w AS (
           |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS t
           |  FROM documents),
           |s AS (
           |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_toks,
           |    CAST(SUM(${DedupQueries.sqlHex60Public("md5('w:' || t)")} % 2001 - 1000) AS BIGINT) AS w_sum
           |  FROM w GROUP BY doc_id)
           |SELECT doc_id, n_toks, w_sum,
           |  CAST(w_sum AS DOUBLE) / (1000.0 * n_toks) AS score,
           |  (CAST(w_sum AS DOUBLE) / (1000.0 * n_toks) > 0.0) AS keep
           |FROM s ORDER BY doc_id""".stripMargin,

    "q_text_readability" ->
      raw"""WITH g AS (
           |  SELECT source,
           |    CAST(floor((0.39 * CAST(w AS DOUBLE) / CAST(s AS DOUBLE)
           |      + 11.8 * CAST(sy AS DOUBLE) / CAST(w AS DOUBLE)
           |      - 15.59) * 1000.0) AS BIGINT) AS grade_milli
           |  FROM (
           |    SELECT source,
           |      CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS BIGINT) AS w,
           |      CAST(GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1) AS BIGINT) AS s,
           |      CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT) AS sy
           |    FROM documents))
           |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           |  CAST(floor(SUM(grade_milli) / COUNT(*)) AS BIGINT) AS avg_grade_milli,
           |  CAST(MIN(grade_milli) AS BIGINT) AS min_grade_milli,
           |  CAST(MAX(grade_milli) AS BIGINT) AS max_grade_milli
           |FROM g GROUP BY source ORDER BY source""".stripMargin,

    "q_text_chunks" ->
      """WITH b AS (SELECT doc_id, text, CAST(length(text) AS BIGINT) AS len FROM documents),
        |n AS (SELECT doc_id, text,
        |        CASE WHEN len <= 120 THEN 1
        |             ELSE (len - 120 + 90 - 1) // 90 + 1 END AS n_chunks
        |      FROM b),
        |e AS (SELECT doc_id, text,
        |        CAST(unnest(generate_series(0, n_chunks - 1)) AS BIGINT) AS chunk_id
        |      FROM n)
        |SELECT doc_id, chunk_id,
        |  CAST(1 + chunk_id * 90 AS BIGINT) AS chunk_start,
        |  substring(text, CAST(1 + chunk_id * 90 AS INTEGER), 120) AS chunk_text
        |FROM e ORDER BY doc_id, chunk_id""".stripMargin,

    "q_text_collocations" ->
      raw"""WITH toks AS (SELECT string_split_regex(trim(lower(text)), '\s+') AS ws
           |              FROM documents),
           |bi AS (SELECT unnest(list_zip(ws[1:len(ws)-1], ws[2:len(ws)])) AS z
           |       FROM toks WHERE len(ws) >= 2),
           |pc AS (SELECT z[1] AS w1, z[2] AS w2, CAST(COUNT(*) AS BIGINT) AS c_ab
           |       FROM bi GROUP BY 1, 2),
           |uni AS (SELECT unnest(ws) AS w FROM toks),
           |uc AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM uni GROUP BY w),
           |g AS (SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM uni) AS n_uni,
           |             (SELECT CAST(SUM(c_ab) AS BIGINT) FROM pc) AS n_bi)
           |SELECT pc.w1, pc.w2, pc.c_ab, a.c AS c_a, b.c AS c_b,
           |  (CAST(pc.c_ab AS DOUBLE) * CAST(g.n_uni AS DOUBLE) * CAST(g.n_uni AS DOUBLE))
           |    / (CAST(g.n_bi AS DOUBLE) * CAST(a.c AS DOUBLE) * CAST(b.c AS DOUBLE)) AS lift
           |FROM pc JOIN uc a ON pc.w1 = a.w JOIN uc b ON pc.w2 = b.w CROSS JOIN g
           |WHERE pc.c_ab >= 5
           |ORDER BY lift DESC, pc.w1, pc.w2 LIMIT 200""".stripMargin
  )
}
