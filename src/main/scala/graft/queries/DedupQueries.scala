package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.CacheScope.ScopedPersist
import graft.engine.QueryBuilder.scan
import graft.ops.{CorpusOps, Dedup, TextAnalysis}

/** Dedup queries over the documents table (SURVEY §2.5 "Dedup" north-star
  * tier). Oracle SQL is generated from the same constants as the Scala
  * pipeline so the two can't drift.
  */
object DedupQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // exact dedup with deterministic min-id survivor
    "q_dedup_exact" -> ((s: SparkSession, d: String) => {
      val docs = scan(s, d, "documents")
      Dedup.exactDedup(docs, TextAnalysis.fingerprint(col("text")), col("doc_id"))
        .select(col("__key").as("fp"), col("keep_id"), col("group_size"))
        .orderBy(col("fp"))
    }),

    // MinHash-LSH near-dup pairs, exact-Jaccard verified
    "q_dedup_minhash" -> ((s: SparkSession, d: String) => {
      Dedup.minhashDedup(scan(s, d, "documents"), "doc_id", "text",
        threshold = 0.5, k = 3, numSeeds = 12, rowsPerBand = 3)
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    // CANDIDATE-SIMILARITY HISTOGRAM (the threshold-sensitivity curve):
    // exact Jaccard over ALL banding candidates, bucketed on the
    // RATIONAL value (bucket = 20·inter div union — a float floor can
    // misbucket ties; integer division cannot). This is the readout a
    // dedup deploy tunes against: how many pairs each 0.05 threshold
    // step adds or removes. Candidate volume is banding-bounded (the
    // same S-curve pipeline q_dedup_minhash verifies), never all-pairs;
    // the shingle relation is the family's shared persisted stage
    "q_dedup_pairhist" -> ((s: SparkSession, d: String) => {
      val sh = Dedup.hashedShingleTable(
        scan(s, d, "documents"), "doc_id", "text").scopedPersist()
      val cands = Dedup.bandCandidates(Dedup.minhashBands(sh))
      Dedup.pairJaccard(cands, sh)
        .withColumn("u", col("na") + col("nb") - col("inter"))
        .groupBy(expr("inter * 20 div u").as("bucket"))
        .agg(count(lit(1)).as("n_pairs"),
          min(expr("inter * 1000000 div u")).as("min_ppm"),
          max(expr("inter * 1000000 div u")).as("max_ppm"))
        .orderBy(col("bucket"))
    }),

    // APPROX-vs-EXACT DEDUP EVAL: MinHash-LSH pairs graded against the
    // lossless PPJoin ground truth at the SAME threshold (shingle
    // Jaccard >= 1/2) — the recall number a 100 TB dedup pipeline must
    // publish before trusting banding (verified pairs make precision 1
    // by construction; banding misses are the honest loss). Graded on a
    // FIXED absolute-id eval slab (doc_id < 2000 — the r7 scale rule:
    // exact ground truth on the full corpus is the thing you CAN'T
    // afford at 100 TB; you grade recall on a constant-size slab, so
    // the eval's cost is corpus-size-independent past sf0.1)
    "q_dedup_recall" -> ((s: SparkSession, d: String) => {
      val docs = scan(s, d, "documents").filter(col("doc_id") < 2000)
      val exact = Dedup.ppJoin(
          Dedup.hashedShingleTable(docs, "doc_id", "text")
            .select(col("doc_id"), col("sh").as("w")).distinct(),
          tauNum = 1, tauDen = 2)
        .select(col("doc_a"), col("doc_b"))
      val approx = Dedup.minhashDedup(docs, "doc_id", "text",
          threshold = 0.5, k = 3, numSeeds = 12, rowsPerBand = 3)
        .select(col("doc_a"), col("doc_b"), lit(1L).as("__hit"))
      val nApprox = approx.agg(count(lit(1)).as("n_approx"))
      exact.join(approx, Seq("doc_a", "doc_b"), "left")
        .agg(count(lit(1)).as("n_exact"),
          sum(coalesce(col("__hit"), lit(0L))).as("n_found"))
        .crossJoin(broadcast(nApprox))
        .select(col("n_exact"), col("n_approx"), col("n_found"),
          expr("n_found * 1000000 div n_exact").as("recall_ppm"),
          expr("n_found * 1000000 div n_approx").as("precision_ppm"))
    }),

    // CONTENT-LEVEL SOURCE MIRROR RATE: verified near-dup pairs
    // (MinHash-LSH + exact Jaccard) attributed to their source pair —
    // the evidence-grade companion of q_source_overlap's fingerprint
    // census: "source X republishes source Y" shows up as a heavy
    // off-diagonal cell. Pair volume ∝ duplicates (not corpus); the two
    // source lookups are dimension joins; the matrix is sources². Named
    // into the q_dedup bench family deliberately: the persisted
    // hashedShingleTable subplan is byte-identical to q_dedup_minhash's,
    // so the cache manager shares it — the pair pipeline is paid once
    // per family, not once per query.
    "q_dedup_source_mirror" -> ((s: SparkSession, d: String) => {
      val docs = scan(s, d, "documents")
      val pairs = Dedup.minhashDedup(docs, "doc_id", "text",
        threshold = 0.5, k = 3, numSeeds = 12, rowsPerBand = 3)
      val src = docs.select(col("doc_id"), col("source"))
      pairs
        .join(src.select(col("doc_id").as("doc_a"), col("source").as("sa")), Seq("doc_a"))
        .join(src.select(col("doc_id").as("doc_b"), col("source").as("sb")), Seq("doc_b"))
        .groupBy(least(col("sa"), col("sb")).as("source_a"),
          greatest(col("sa"), col("sb")).as("source_b"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy(col("source_a"), col("source_b"))
    }),

    // SimHash signatures per doc (60-bit, shingle features)
    "q_dedup_simhash_sig" -> ((s: SparkSession, d: String) => {
      Dedup.simhash(scan(s, d, "documents"), "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    // SimHash near-dup pairs (chunk-blocked, hamming <= 3)
    "q_dedup_simhash" -> ((s: SparkSession, d: String) => {
      Dedup.simhashPairs(Dedup.simhash(scan(s, d, "documents"), "doc_id", "text"))
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    // SimHash pairs with a cheap exact PRE-PARTITION key composed into
    // the chunk join (blockCols — the web-scale Σ(N_block²)/2^15 shape,
    // SCALE.md): same operator, candidates confined to a language
    "q_dedup_simhash_blocked" -> ((s: SparkSession, d: String) => {
      val docs = scan(s, d, "documents")
      val sims = Dedup.simhash(docs, "doc_id", "text")
        .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      Dedup.simhashPairs(sims, blockCols = Seq("lang"))
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    // exact n-gram Jaccard similarity join (inverted index + DF cap)
    "q_dedup_ngram" -> ((s: SparkSession, d: String) => {
      Dedup.ngramJaccard(scan(s, d, "documents"), "doc_id", "text",
        threshold = 0.8, k = 3, maxDocFreq = 100)
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    // EXACT set-similarity join (PPJoin, lossless): shingle-set Jaccard
    // >= 1/2 with the tau-DERIVED prefix length (m − ⌈τm⌉ + 1) — unlike
    // q_dedup_prefix's fixed-6 heuristic, the prefix lemma GUARANTEES
    // every qualifying pair is found; and unlike q_dedup_minhash,
    // recall is 1 by construction. tau rides as an exact rational so
    // every threshold test is an integer cross-multiplication; tokens
    // travel as 60-bit shingle hashes while the oracle keeps raw
    // strings (collision ⇒ loud mismatch, the q_text_cms convention)
    "q_dedup_ppjoin" -> ((s: SparkSession, d: String) =>
      Dedup.ppJoin(
          Dedup.hashedShingleTable(scan(s, d, "documents"), "doc_id", "text")
            .select(col("doc_id"), col("sh").as("w")).distinct(),
          tauNum = 1, tauDen = 2)
        .orderBy(col("doc_a"), col("doc_b"))),

    // PREFIX-FILTER near-dup (PPJoin family): candidates share one of
    // each doc's 6 globally-rarest shingles, then exact-Jaccard verify —
    // the third independent blocking strategy next to banding (minhash)
    // and stop-shingle cut (ngram)
    "q_dedup_prefix" -> ((s: SparkSession, d: String) => {
      val sh = Dedup.hashedShingleTable(scan(s, d, "documents"), "doc_id", "text")
        .scopedPersist()
      Dedup.pairJaccard(Dedup.prefixFilterPairs(sh, r = 6), sh)
        .filter(col("jaccard") >= 0.5)
        .select(col("doc_a"), col("doc_b"), col("jaccard"))
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    // pairs → clusters: connected components over the minhash near-dup
    // graph (keep-one-per-cluster is then a join + filter)
    "q_dedup_clusters" -> ((s: SparkSession, d: String) => {
      val pairs = Dedup.minhashDedup(scan(s, d, "documents"), "doc_id", "text",
        threshold = 0.5, k = 3, numSeeds = 12, rowsPerBand = 3)
      Dedup.connectedComponents(pairs).orderBy(col("doc_id"))
    }),

    // per-doc n-gram NOVELTY: fraction of a doc's distinct 3-grams whose
    // global first occurrence (min doc id) is this doc — the
    // memorization-risk / marginal-value census (floor-permille exact).
    // In the dedup family so the plan-identical hashed shingle table is
    // a cache hit off the persisted minhash pipeline
    "q_dedup_novelty" -> ((s: SparkSession, d: String) => {
      graft.ops.CorpusOps.gramNovelty(scan(s, d, "documents"), "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    // QUALITY-AWARE survivor selection: keep the best-quality member of
    // each near-dup cluster (integer quality — exact argmax), not the
    // lowest id; singletons pass through. Same pair pipeline as
    // q_dedup_minhash/clusters — the family cache pays it once
    "q_dedup_survivor" -> ((s: SparkSession, d: String) => {
      val docs = scan(s, d, "documents")
      val pairs = Dedup.minhashDedup(docs, "doc_id", "text",
        threshold = 0.5, k = 3, numSeeds = 12, rowsPerBand = 3)
      Dedup.qualitySurvivors(docs, "doc_id", pairs,
        TextAnalysis.qualityScoreInt(col("text")))
        .orderBy(col("cluster"))
    }),

    // INCREMENTAL MinHash-index maintenance: the retained corpus's band
    // index is updated for a delete+insert delta WITHOUT re-hashing the
    // unchanged corpus — departed ids leave by anti-join on the id,
    // arrivals are banded alone. Per-doc signatures are independent, so
    // maintained ≡ full recompute (the oracle recomputes from scratch on
    // the final corpus); at 100 TB the update cost is ∝ |delta|, not
    // |index|. Output: the full maintained index, row by row — every
    // (doc, band) entry and its signature must equal the from-scratch
    // rebuild, not just per-band cardinalities
    "q_index_maintain" -> ((s: SparkSession, d: String) => {
      import graft.ops.CacheScope.ScopedPersist
      val docs = scan(s, d, "documents")
      // r18 (r17 verdict #6): per-doc signatures are filter-commutable
      // (shingling never crosses docs), so base and arrival signatures
      // derive from ONE full-corpus shingle table — the exact persisted
      // subplan q_dedup_minhash/clusters/survivor already share via the
      // family cache — instead of re-shingling two disjoint slices per
      // invocation. The maintenance structure (anti-join of departures,
      // union of newly banded arrivals) is unchanged; results identical
      // because bands(filter(docs)) ≡ filter(bands(docs)) per doc.
      val sh = Dedup.hashedShingleTable(docs, "doc_id", "text").scopedPersist()
      val dels = docs.filter(col("doc_id") % 10 === 2).select(col("doc_id"))
      val baseBands = Dedup.minhashBands(sh.filter(col("doc_id") % 10 =!= 1))
      val maintained = baseBands
        .join(dels, Seq("doc_id"), "left_anti")
        .unionByName(Dedup.minhashBands(sh.filter(col("doc_id") % 10 === 1)))
      maintained.select(col("doc_id"), col("band"), col("band_sig"))
        .orderBy(col("doc_id"), col("band"))
    }),

    // deterministic hash-sampling: reproducible downsampling (md5-based,
    // no RNG state — identical on any cluster/run)
    "q_sample_hash" -> ((s: SparkSession, d: String) => {
      scan(s, d, "documents")
        .filter(Dedup.hex60(md5(concat(lit("sample:"), col("doc_id").cast("string")).cast("binary"))) % 10 < 3)
        .select(col("doc_id"), col("lang"), col("source"))
        .orderBy(col("doc_id"))
    }),

    // NEYMAN OPTIMAL ALLOCATION (the survey-sampling design the flat
    // rates below can't give: sample budget ∝ stratum size × stratum
    // spread, so volatile strata get more draws): strata = customer
    // nations, variable = acctbal cents. The weight N_h·σ_h collapses
    // to ONE integer isqrt(N·Q − S²) per stratum (the temperatureMixture
    // floor-sqrt discipline: both engines take the correctly-rounded
    // double sqrt of the SAME integer, so the floor matches bit-exactly
    // even past 2⁵³), and the 1000-draw budget lands via LARGEST-
    // REMAINDER rounding (base = B·w div Z, +1 to the top B−Σbase
    // remainders, nation-asc tie-break) so allocations are integers
    // summing EXACTLY to B. One stratum census + dimension-sized
    // window — nothing data-sized shuffles
    "q_sample_neyman" -> ((s: SparkSession, d: String) => {
      import org.apache.spark.sql.expressions.Window
      val st = scan(s, d, "customer")
        .select(col("c_nationkey").as("nation"),
          floor(col("c_acctbal") * 100).cast("long").as("v"))
        .groupBy(col("nation"))
        .agg(count(lit(1)).as("n_pop"), sum(col("v")).as("sv"),
          sum(expr("v * v")).as("qv"))
        .withColumn("w", floor(sqrt(expr(
          "CAST(CAST(n_pop AS DECIMAL(38,0)) * qv - CAST(sv AS DECIMAL(38,0)) * sv AS DOUBLE)")))
          .cast("long"))
      val z = st.agg(sum(col("w")).as("z"))
      val based = st.crossJoin(broadcast(z))
        .withColumn("base", expr("(1000 * w) div z"))
        .withColumn("rem", expr("(1000 * w) % z"))
      val extra = based.agg((lit(1000L) - sum(col("base"))).as("extra"))
      based.crossJoin(broadcast(extra))
        .withColumn("rk", row_number().over(
          Window.orderBy(col("rem").desc, col("nation").asc)).cast("long"))
        .select(col("nation"), col("n_pop"), col("w"),
          (col("base") + when(col("rk") <= col("extra"), 1L).otherwise(0L))
            .as("alloc"))
        .orderBy(col("nation"))
    }),

    // STRATIFIED hash-sampling: per-stratum rates (the corpus-mixing
    // primitive — e.g. upsample rare languages): en keeps 50%, others
    // 10%, decided by the same RNG-free md5 predicate per row. The rate
    // map is pure Column logic, so at 100 TB this is a single codegen'd
    // filter — no per-group sampleBy driver machinery
    "q_sample_stratified" -> ((s: SparkSession, d: String) => {
      val bucket = Dedup.hex60(
        md5(concat(lit("strat:"), col("doc_id").cast("string")).cast("binary"))) % 10
      val keep = when(col("lang") === "en", bucket < 5).otherwise(bucket < 1)
      scan(s, d, "documents")
        .filter(keep)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_sampled"), min(col("doc_id")).as("first_doc"))
        .orderBy(col("lang"))
    }),

    // WEIGHTED reproducible sampling: P(keep) ∝ n_chars (quality-weighted
    // corpus mixing). Deterministic: the doc's hash bucket in [0, 1e6) is
    // compared against floor(weight·1e6/max_weight) — identical floors of
    // identical doubles on both engines, no RNG
    "q_sample_weighted" -> ((s: SparkSession, d: String) => {
      val docs = scan(s, d, "documents")
      val maxW = docs.agg(max(col("n_chars")).as("max_chars"))
      val bucket = Dedup.hex60(
        md5(concat(lit("wt:"), col("doc_id").cast("string")).cast("binary"))) % 1000000L
      docs.crossJoin(broadcast(maxW))
        .filter(bucket < floor(col("n_chars").cast("double") * lit(1000000.0) /
          col("max_chars").cast("double")))
        .select(col("doc_id"), col("n_chars"))
        .orderBy(col("doc_id"))
    }),

    // per-group CAP (corpus balancing: at most K docs per source), order
    // decided by the content-free hash so the cap is reproducible — and
    // enforced by the custom TopKPerKey operator, so each partition ships
    // at most K candidates per source to the shuffle
    "q_sample_capped" -> ((s: SparkSession, d: String) => {
      val h = Dedup.hex60(
        md5(concat(lit("cap:"), col("doc_id").cast("string")).cast("binary")))
      val ranked = graft.plans.TopKPerKey.topKPerKey(
        scan(s, d, "documents").withColumn("__h", h),
        keyCols = Seq("source"), sorts = Seq(("__h", true), ("doc_id", true)), k = 10)
      ranked.select(col("doc_id"), col("source"))
        .orderBy(col("source"), col("doc_id"))
    }),

    // EXACT CLASS-BALANCED UNDERSAMPLE: every language shrunk to the
    // minority language's count — kept rows are the m smallest
    // content-free hash keys per class, selected by the two-phase
    // bucket-census algorithm (CorpusOps.balancedSample) instead of a
    // per-class global sort. Output is the per-class set WITNESS
    // (count + id sum + 60-bit xor), so the oracle — which spells the
    // same set with a plain window rank — certifies set equality, not
    // just sizes
    "q_sample_balanced" -> ((s: SparkSession, d: String) => {
      graft.ops.CorpusOps.balancedSample(
        scan(s, d, "documents"), "lang", "doc_id")
        .groupBy(col("__cls").as("lang"))
        .agg(count(lit(1)).as("n_kept"),
          sum(col("__id")).as("id_sum"),
          expr("bit_xor(__h)").as("h_xor"))
        .orderBy(col("lang"))
    }),

    // Deterministic TRAIN/VAL/TEST split (80/10/10) by content-free
    // hash — the assignment is a pure function of doc_id, so any
    // cluster/run/partitioning reproduces the identical split, new docs
    // never reshuffle old ones, and the three sets are disjoint by
    // construction. Report: per-split doc/char counts + id range
    "q_split_assign" -> ((s: SparkSession, d: String) => {
      val b = Dedup.hex60(
        md5(concat(lit("split:"), col("doc_id").cast("string")).cast("binary"))) % 100
      val split = when(b < 80, lit("train")).when(b < 90, lit("val")).otherwise(lit("test"))
      scan(s, d, "documents")
        .withColumn("split", split)
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"),
          min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
        .orderBy(col("split"))
    }),

    // Hash-SHARD layout report: the writer-side balance check before
    // sharding a corpus into N fixed output shards (shard = content-free
    // hash of the key — co-locates re-runs, never depends on input
    // order). share = each shard's byte fraction; a healthy layout is
    // ~1/N everywhere — skew here means a hot shard at write time
    "q_shard_balance" -> ((s: SparkSession, d: String) => {
      val docs = scan(s, d, "documents")
      val shard = Dedup.hex60(
        md5(concat(lit("shard:"), col("doc_id").cast("string")).cast("binary"))) % 16
      val per = docs.groupBy(shard.as("shard"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("chars"))
      val tot = docs.agg(sum(col("n_chars")).as("__total"))
      per.crossJoin(broadcast(tot))
        .withColumn("share", col("chars").cast("double") / col("__total").cast("double"))
        .select(col("shard"), col("n_docs"), col("chars"), col("share"))
        .orderBy(col("shard"))
    }),

    // DOMAIN MIXING to a token budget: per-language keep-rate
    // min(1, budget·w_lang / tokens_lang) derived FROM the data (one
    // broadcast-back aggregate), rows kept by the RNG-free md5 predicate.
    // fr's weight deliberately overshoots its corpus share so the rate
    // caps at 1.0 — the upsample-rare-domain edge. Output: the realized
    // mixture (per-lang kept rows/tokens + the ppm rate applied)
    "q_mix_budget" -> ((s: SparkSession, d: String) => {
      val w = when(col("lang") === "en", 0.40)
        .when(col("lang") === "fr", 0.35)
        .when(col("lang") === "de", 0.10)
        .when(col("lang") === "es", 0.10)
        .otherwise(0.05)
      graft.ops.CorpusOps.mixtureSample(
        scan(s, d, "documents"), "doc_id", "lang",
        TextAnalysis.tokenCountWs(col("text")), budget = 12000.0, weight = w)
        .filter(col("keep"))
        .groupBy(col("lang"), col("rate_ppm"))
        .agg(count(lit(1)).as("n_kept"), sum(col("toks")).as("toks_kept"))
        .orderBy(col("lang"))
    }),

    // DEDUP-AWARE SAMPLING WEIGHTS ("count every document once"): each
    // doc weighs 1/|its exact-dup cluster| — the correction that stops
    // a mirrored source from dominating the mixture by replication.
    // Per-source census of raw vs unique vs EFFECTIVE doc mass
    // (Σ floor(1e6/csize), exact integers). Same fingerprint definition
    // as q_dedup_exact, so the cluster sizes are the dedup tier's own
    "q_mix_dedup_weight" -> ((s: SparkSession, d: String) => {
      val fp = scan(s, d, "documents").select(col("doc_id"), col("source"),
        md5(regexp_replace(lower(col("text")), "[^a-z0-9]", "")).as("fp"))
      val csize = fp.groupBy(col("fp")).agg(count(lit(1)).as("csize"))
      fp.join(csize, Seq("fp"))
        .withColumn("w_ppm", expr("1000000 div csize"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("csize") === 1, 1L).otherwise(0L)).as("n_unique"),
          sum(col("w_ppm")).as("effective_docs_ppm"))
        .orderBy(col("source"))
    }),

    // TEMPERATURE-SMOOTHED mixture (α = 0.5): domain weights ∝ isqrt of
    // the domain's token mass — the mBERT/XLM-R low-resource upsampling
    // shape, with integer-sqrt weights so both engines agree bit-exactly
    // (see CorpusOps.temperatureMixture). Output: realized per-lang
    // mixture + the ppm rate applied
    "q_mix_alpha" -> ((s: SparkSession, d: String) => {
      graft.ops.CorpusOps.temperatureMixture(
        scan(s, d, "documents"), "doc_id", "lang",
        TextAnalysis.tokenCountWs(col("text")), budget = 12000.0)
        .filter(col("keep"))
        .groupBy(col("lang"), col("rate_ppm"))
        .agg(count(lit(1)).as("n_kept"), sum(col("toks")).as("toks_kept"))
        .orderBy(col("lang"))
    }),

    // CURRICULUM PHASE ASSIGNMENT — the easy-to-hard data-ordering
    // census a staged pre-train run reads: docs ranked by a
    // deterministic quality proxy (alpha-word fraction in exact ppm),
    // split into 4 equal-count phases, per-phase doc/token mass and
    // score range. The global rank is NEVER a corpus-wide window: it
    // is the two-level prefix (cum count over the SMALL distinct-score
    // census + a row_number partitioned by score — the q_eval_auc
    // discipline), and the phase formula ((rank−1)·4 div N)+1 is
    // spelled identically in both engines (no NTILE semantics to match)
    "q_mix_curriculum" -> ((s: SparkSession, d: String) => {
      import org.apache.spark.sql.expressions.Window
      val scored = scan(s, d, "documents").select(col("doc_id"),
          size(CorpusOps.words(col("text"))).cast("long").as("n_words"),
          size(filter(CorpusOps.words(lower(col("text"))),
            w => w.rlike("^[a-z]+$"))).cast("long").as("n_alpha"))
        .withColumn("score_ppm",
          expr("n_alpha * 1000000 div greatest(n_words, 1)"))
      val census = scored.groupBy(col("score_ppm")).agg(count(lit(1)).as("c"))
      val wc = Window.orderBy(col("score_ppm").desc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val cum = census
        .withColumn("cum_before", coalesce(sum(col("c")).over(wc), lit(0L)))
        .select(col("score_ppm"), col("cum_before"))
      val total = scored.agg(count(lit(1)).as("n"))
      val ws = Window.partitionBy(col("score_ppm")).orderBy(col("doc_id"))
      scored.withColumn("rw", row_number().over(ws))
        .join(broadcast(cum), Seq("score_ppm"))
        .crossJoin(broadcast(total))
        .withColumn("phase",
          expr("((cum_before + rw - 1) * 4) div n + 1").cast("int"))
        .groupBy(col("phase"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_words")).as("n_tokens"),
          min(col("score_ppm")).as("min_score_ppm"),
          max(col("score_ppm")).as("max_score_ppm"))
        .orderBy(col("phase"))
    }),

    // DATA-CONSTRAINED EPOCH ALLOCATION (Muennighoff 2023): per-lang
    // repeat counts under a 2x-corpus token budget — α=0.5 flattened
    // target shares converted to milli-epoch repeats, capped at 4
    // epochs. Exact integer milli-epochs; dimension-sized after one
    // combinable groupBy (see CorpusOps.epochAllocation)
    "q_mix_epochs" -> ((s: SparkSession, d: String) => {
      graft.ops.CorpusOps.epochAllocation(
        scan(s, d, "documents"), "lang",
        TextAnalysis.tokenCountWs(col("text")), budgetX = 2L)
        .orderBy(col("lang"))
    }),

    // LSH BANDING RECALL EVAL — the S-curve check every MinHash deploy
    // runs: on an eval slice (doc_id < 100, all shared-shingle pairs =
    // the COMPLETE truth set, since J>0 requires a shared shingle),
    // compare the banding pipeline's verified pairs against the exact
    // Jaccard>=0.5 ground truth. found ⊆ truth by construction (the
    // verify step is exact), so recall_ppm is the banding's candidate
    // recall — the number that says whether 12 seeds x 3 rows/band is
    // enough before scaling the index out
    "q_dedup_lsh_recall" -> ((s: SparkSession, d: String) => {
      val docs = scan(s, d, "documents").filter(col("doc_id") < 100)
      val sh = Dedup.hashedShingleTable(docs, "doc_id", "text").scopedPersist()
      val sharedPairs = sh.select(col("doc_id").as("doc_a"), col("sh"))
        .join(sh.select(col("doc_id").as("doc_b"), col("sh")), "sh")
        .filter(col("doc_a") < col("doc_b"))
        .select("doc_a", "doc_b").distinct()
      val truth = Dedup.pairJaccard(sharedPairs, sh).filter(col("jaccard") >= 0.5)
      val found = Dedup.pairJaccard(
          Dedup.bandCandidates(Dedup.minhashBands(sh)), sh)
        .filter(col("jaccard") >= 0.5)
      truth.agg(count(lit(1)).as("n_truth"))
        .crossJoin(found.agg(count(lit(1)).as("n_found"))) // 1-row scalars
        .select(col("n_truth").cast("long"), col("n_found").cast("long"),
          expr("n_found * 1000000 div greatest(n_truth, 1)").as("recall_ppm"))
    }),

    // UNIMAX language sampling (Chung 2023): water-filling the 1x-corpus
    // token budget over languages ascending by size with a 2-epoch cap —
    // small languages up-sample to the cap, never beyond; the head
    // language absorbs the slack. The sequential loop runs over the
    // 5-row language census (driver metadata); integer math replayed by
    // the oracle's recursive CTE (see CorpusOps.unimaxAllocation)
    "q_mix_unimax" -> ((s: SparkSession, d: String) => {
      graft.ops.CorpusOps.unimaxAllocation(
        scan(s, d, "documents"), "lang",
        TextAnalysis.tokenCountWs(col("text")), budgetX = 1L, maxEpochs = 2L)
        .orderBy(col("lang"))
    }),

    // TEMPERATURE-SCALED LANGUAGE SAMPLING (the mC4/mT5 mixing rule,
    // Xue 2021): w_i ∝ n_i^α with α = 1/2 — the standard softening
    // between proportional (α=1) and uniform (α=0) that UniMax's
    // water-filling replaced but production multilingual mixes still
    // run. n_i^(1/2) computed as the EXACT integer square root
    // (floor(sqrt) with a ±1 integer correction, so no engine's float
    // sqrt rounding can leak into the weights); everything downstream
    // is cross-multiplied ppm integer arithmetic on the 5-row language
    // census — dimension-sized at any corpus scale
    "q_mix_temp" -> ((s: SparkSession, d: String) => {
      import org.apache.spark.sql.expressions.Window
      val cens = scan(s, d, "documents")
        .select(col("lang"), TextAnalysis.tokenCountWs(col("text")).as("toks"))
        .groupBy(col("lang")).agg(sum(col("toks")).as("n"))
        .withColumn("s0", floor(sqrt(col("n").cast("double"))).cast("long"))
        .withColumn("isq",
          when(col("s0") * col("s0") > col("n"), col("s0") - 1)
            .when((col("s0") + 1) * (col("s0") + 1) <= col("n"), col("s0") + 1)
            .otherwise(col("s0")))
      val w = Window.partitionBy() // 5-row census, not a data-scale window
      cens
        .withColumn("totn", sum(col("n")).over(w))
        .withColumn("tots", sum(col("isq")).over(w))
        .withColumn("raw_ppm", expr("n * 1000000 div totn"))
        .withColumn("temp_ppm", expr("isq * 1000000 div tots"))
        .select(col("lang"), col("n").cast("long").as("n_tokens"),
          col("isq").cast("long").as("isqrt_tokens"),
          col("raw_ppm"), col("temp_ppm"),
          expr("temp_ppm * 1000000 div greatest(raw_ppm, 1)").as("boost_ppm"))
        .orderBy(col("lang"))
    }),

    // DSIR IMPORTANCE SELECTION (Xie et al. 2023 hashed-n-gram data
    // selection): raw (non-English-labeled) docs scored by the
    // fixed-point likelihood ratio of the 256-bucket hashed-unigram
    // target vs raw distributions, then kept in score order up to a
    // 5000-token budget. Census + per-doc profile fold from one
    // persisted (doc, bucket) relation; the weight table is 256 rows
    // broadcast; the budget prefix is the distributed range-partitioned
    // cumsum (no single-task global window) — see CorpusOps.dsirSelect
    "q_mix_dsir" -> ((s: SparkSession, d: String) => {
      graft.ops.CorpusOps.dsirSelect(
        scan(s, d, "documents"), "doc_id", "text",
        isTarget = col("lang") === "en", buckets = 256, tokenBudget = 5000L)
        .orderBy(col("doc_id"))
    }),

    // WINNOWING (MOSS) FINGERPRINT CENSUS: per-doc count of selected
    // fingerprints — the index-size budget a winnowing-based dedup pays
    // (~2/(w+1) of gram instances; see Dedup.winnowFingerprints). The
    // fingerprint relation is persisted and byte-identical to
    // q_dedup_winnow's, so the family cache shares the expensive
    // gram-hash-window stage between the two
    "q_dedup_winnow_fp" -> ((s: SparkSession, d: String) => {
      winnowFp(s, d)
        .groupBy("doc_id").agg(count(lit(1)).as("n_fp"))
        .orderBy(col("doc_id"))
    }),

    // WINNOWING NEAR-DUP CANDIDATES: pairs sharing >= 3 selected
    // fingerprints through the doc-frequency-capped inverted index —
    // the positional counterpart of q_dedup_minhash (catches long
    // shared RUNS at any offset rather than whole-doc set similarity)
    "q_dedup_winnow" -> ((s: SparkSession, d: String) => {
      Dedup.winnowPairs(winnowFp(s, d), minShared = WINNOW_MIN_SHARED,
          maxDocFreq = WINNOW_MAX_DF)
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    // ASYMMETRIC CONTAINMENT (Broder 1997's containment coefficient
    // over the winnowed fingerprint sets): |fpA ∩ fpB| / |fpA| —
    // catches "A is a chunk of B" (quotes, excerpts, page-in-page),
    // which symmetric Jaccard under-scores when |B| >> |A|. Same capped
    // inverted index as q_dedup_winnow; denominators are the UNCAPPED
    // per-doc fingerprint sizes (the doc's true sketch mass). The
    // persisted fingerprint relation is plan-identical across the three
    // winnow queries — one family cache build
    "q_dedup_containment" -> ((s: SparkSession, d: String) => {
      val fp = winnowFp(s, d)
      val rare = fp.groupBy("fp").agg(count(lit(1)).as("df"))
        .filter(col("df") <= WINNOW_MAX_DF)
      val f = fp.join(rare.select("fp"), "fp")
      val inter = f.select(col("fp"), col("doc_id").as("doc_a"))
        .join(f.select(col("fp"), col("doc_id").as("doc_b")), "fp")
        .filter(col("doc_a") < col("doc_b"))
        .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_shared"))
      val sizes = fp.groupBy("doc_id").agg(count(lit(1)).as("n"))
      inter
        .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "na"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "nb"), "doc_b")
        .withColumn("cont_a", col("n_shared").cast("double") / col("na").cast("double"))
        .withColumn("cont_b", col("n_shared").cast("double") / col("nb").cast("double"))
        .filter(greatest(col("cont_a"), col("cont_b")) >= 0.5)
        .select("doc_a", "doc_b", "n_shared", "cont_a", "cont_b")
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    // TRAIN/TEST SPLIT LEAKAGE AUDIT (the Lee et al. 2022 finding that
    // motivated corpus dedup: near-dups straddling the split boundary
    // leak eval answers into training). Verified MinHash near-dup pairs
    // (same params as q_dedup_minhash — the persisted shingle/band
    // subplans are plan-identical, so the family cache pays the pair
    // pipeline once) tagged with each side's hash-split assignment
    // (same predicate as q_split_assign); emitted pairs are exactly the
    // cross-split ones a pipeline must quarantine
    "q_dedup_split_leakage" -> ((s: SparkSession, d: String) => {
      def splitOf(c: Column): Column = {
        val b = Dedup.hex60(
          md5(concat(lit("split:"), c.cast("string")).cast("binary"))) % 100
        when(b < 80, lit("train")).when(b < 90, lit("val")).otherwise(lit("test"))
      }
      Dedup.minhashDedup(scan(s, d, "documents"), "doc_id", "text",
          threshold = 0.5, k = 3, numSeeds = 12, rowsPerBand = 3)
        .withColumn("split_a", splitOf(col("doc_a")))
        .withColumn("split_b", splitOf(col("doc_b")))
        .filter(col("split_a") =!= col("split_b"))
        .select(col("doc_a"), col("doc_b"), col("split_a"), col("split_b"), col("jaccard"))
        .orderBy(col("doc_a"), col("doc_b"))
    })
  )

  // winnowing constants shared by the Scala pipeline and the oracle SQL
  private val WINNOW_K = 4
  private val WINNOW_W = 8
  private val WINNOW_MIN_SHARED = 3L
  private val WINNOW_MAX_DF = 64L

  /** The shared winnowed fingerprint relation (persisted; identical
    * logical plan across both winnow queries → family cache hit, the
    * staticNearDupIndex pattern).
    */
  private def winnowFp(s: SparkSession, d: String): DataFrame =
    Dedup.winnowFingerprints(scan(s, d, "documents"), "doc_id", "text",
      k = WINNOW_K, w = WINNOW_W).persist()

  // ---- oracle SQL builders (same constants as the Scala ops) ----

  /** Shared CTE prefix: distinct word-3-shingles per doc, over any
    * (doc_id, text) relation.
    */
  private def shingleCtesOver(src: String): String =
    raw"""w AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ws FROM $src),
         |shl AS (SELECT doc_id, list_distinct(CASE WHEN len(ws) >= 3
         |    THEN [ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] for i in range(1, len(ws) - 1)]
         |    ELSE [array_to_string(ws, ' ')] END) AS shs FROM w),
         |sh AS (SELECT doc_id, unnest(shs) AS sh FROM shl)""".stripMargin

  private val shingleCtes = shingleCtesOver("documents")

  private val jaccardTail =
    """sizes AS (SELECT doc_id, count(*) AS n FROM shh GROUP BY doc_id),
      |inter AS (
      |  SELECT c.doc_a, c.doc_b, count(*) AS inter
      |  FROM cand c JOIN shh A ON A.doc_id = c.doc_a
      |              JOIN shh B ON B.doc_id = c.doc_b AND B.sh = A.sh
      |  GROUP BY c.doc_a, c.doc_b)""".stripMargin

  /** DuckDB spelling of TextAnalysis.qualityScoreInt over `text`:
    * 2 × stopword hits − punctuation count, all-BIGINT.
    */
  private[queries] val qualityIntSql: String = {
    val stopList = TextAnalysis.defaultStopwords.map(w => s"'$w'").mkString("[", ",", "]")
    raw"""(2 * len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
         |      w -> list_contains($stopList, w)))
         |  - len(regexp_extract_all(text, '[^a-zA-Z0-9\s]')))""".stripMargin
  }

  /** DuckDB spelling of Dedup.hex60: first 15 md5 hex digits → 60-bit
    * bigint via digit-arithmetic (portable; no engine hex parsing).
    */
  private def sqlHex60(h: String): String =
    (0 until 15).map { d =>
      s"(strpos('0123456789abcdef', substring($h, ${d + 1}, 1)) - 1)::BIGINT * ${1L << (4 * (14 - d))}"
    }.mkString("(", " + ", ")")

  /** sqlHex60 for reuse from other query families. */
  def sqlHex60Public(h: String): String = sqlHex60(h)


  /** Full minhash pipeline as CTEs over any (doc_id, text) relation,
    * ending in `pairsq(doc_a, doc_b, jaccard)`.
    */
  def minhashCtesOver(src: String): String =
    minhashCtes.replace(shingleCtes, shingleCtesOver(src))

  /** Full minhash pipeline as CTEs ending in `pairsq(doc_a, doc_b,
    * jaccard)` — shared by the pairs query and the cluster (CC) query.
    */
  private[queries] lazy val minhashCtes: String = {
    val m = Dedup.minhashMod
    val minExprs = (0 until 12).map(s => s"min((h0 * ${2 * s + 1} + $s) % $m) AS mh$s").mkString(", ")
    val bandSelects = (0 until 4).map { b =>
      val mhs = (b * 3 until b * 3 + 3).map(s => s"mh$s::VARCHAR").mkString(" || ',' || ")
      s"SELECT doc_id, $b AS band, md5($mhs) AS band_sig FROM sigs"
    }.mkString("\n  UNION ALL ")
    s"""$shingleCtes,
       |shh AS (SELECT doc_id, ${sqlHex60("md5(sh)")} AS sh FROM sh),
       |based AS (SELECT doc_id, sh % $m AS h0 FROM shh),
       |sigs AS (SELECT doc_id, $minExprs FROM based GROUP BY doc_id),
       |bands AS (
       |  $bandSelects),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id),
       |$jaccardTail,
       |pairsq AS (
       |  SELECT i.doc_a, i.doc_b,
       |    CAST(i.inter AS DOUBLE) / CAST(sa.n + sb.n - i.inter AS DOUBLE) AS jaccard
       |  FROM inter i JOIN sizes sa ON sa.doc_id = i.doc_a
       |               JOIN sizes sb ON sb.doc_id = i.doc_b
       |  WHERE CAST(i.inter AS DOUBLE) / CAST(sa.n + sb.n - i.inter AS DOUBLE) >= 0.5)""".stripMargin
  }

  private def simhashSql: String = {
    val nb = Dedup.simhashBits
    val bitSums = (0 until nb).map { i =>
      s"SUM((((hl >> $i) & 1) * 2 - 1)) AS s$i"
    }.mkString(", ")
    val simExpr = (0 until nb).map { i =>
      s"(CASE WHEN s$i > 0 THEN CAST(${1L << i} AS BIGINT) ELSE 0 END)"
    }.mkString(" + ")
    s"""WITH $shingleCtes,
       |hashed AS (SELECT doc_id, ${sqlHex60("md5(sh)")} AS hl FROM sh),
       |sums AS (SELECT doc_id, $bitSums FROM hashed GROUP BY doc_id),
       |sims AS (SELECT doc_id, $simExpr AS simhash FROM sums)""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    "q_dedup_exact" ->
      """SELECT md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fp,
        |       MIN(doc_id) AS keep_id, COUNT(*) AS group_size
        |FROM documents GROUP BY 1 ORDER BY fp""".stripMargin,

    "q_dedup_minhash" -> s"""WITH $minhashCtes
         |SELECT doc_a, doc_b, jaccard FROM pairsq ORDER BY doc_a, doc_b""".stripMargin,

    "q_dedup_pairhist" -> s"""WITH $minhashCtes,
         |h AS (SELECT i.inter, sa.n + sb.n - i.inter AS u
         |      FROM inter i JOIN sizes sa ON sa.doc_id = i.doc_a
         |                   JOIN sizes sb ON sb.doc_id = i.doc_b)
         |SELECT CAST(inter * 20 // u AS BIGINT) AS bucket,
         |  CAST(count(*) AS BIGINT) AS n_pairs,
         |  CAST(min(inter * 1000000 // u) AS BIGINT) AS min_ppm,
         |  CAST(max(inter * 1000000 // u) AS BIGINT) AS max_ppm
         |FROM h GROUP BY 1 ORDER BY 1""".stripMargin,

    // ground truth re-derived NAIVELY from the same sh relation the
    // banding replay consumes (no prefix filter) — so a banding recall
    // bug OR a ppJoin losslessness bug breaks the match
    "q_dedup_recall" ->
      s"""WITH ds AS (SELECT doc_id, text FROM documents WHERE doc_id < 2000),
         |${minhashCtesOver("ds")},
         |mm AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS m FROM sh GROUP BY doc_id),
         |ipx AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(count(*) AS BIGINT) AS inter
         |        FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
         |        GROUP BY 1, 2),
         |ex AS (SELECT doc_a, doc_b
         |       FROM ipx JOIN mm ma ON ma.doc_id = doc_a JOIN mm mb ON mb.doc_id = doc_b
         |       WHERE inter * 2 >= (ma.m + mb.m - inter) * 1),
         |ap AS (SELECT doc_a, doc_b FROM pairsq),
         |j AS (SELECT e.doc_a, e.doc_b,
         |        CASE WHEN a.doc_a IS NOT NULL THEN 1 ELSE 0 END AS hit
         |      FROM ex e LEFT JOIN ap a ON a.doc_a = e.doc_a AND a.doc_b = e.doc_b)
         |SELECT CAST(count(*) AS BIGINT) AS n_exact,
         |  (SELECT CAST(count(*) AS BIGINT) FROM ap) AS n_approx,
         |  CAST(SUM(hit) AS BIGINT) AS n_found,
         |  CAST(SUM(hit) * 1000000 // count(*) AS BIGINT) AS recall_ppm,
         |  CAST(SUM(hit) * 1000000 // (SELECT count(*) FROM ap) AS BIGINT) AS precision_ppm
         |FROM j""".stripMargin,

    "q_dedup_source_mirror" ->
      s"""WITH $minhashCtes,
         |sp AS (SELECT da.source AS sa, db.source AS sb
         |       FROM pairsq p
         |       JOIN documents da ON da.doc_id = p.doc_a
         |       JOIN documents db ON db.doc_id = p.doc_b)
         |SELECT least(sa, sb) AS source_a, greatest(sa, sb) AS source_b,
         |  CAST(COUNT(*) AS BIGINT) AS n_pairs
         |FROM sp GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_dedup_clusters" ->
      s"""WITH RECURSIVE $minhashCtes,
         |edges AS (
         |  SELECT doc_a AS a, doc_b AS b FROM pairsq
         |  UNION SELECT doc_b, doc_a FROM pairsq),
         |reach(src, dst) AS (
         |  SELECT a, b FROM edges
         |  UNION
         |  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a)
         |SELECT src AS doc_id, least(src, min(dst)) AS cluster
         |FROM reach GROUP BY src ORDER BY doc_id""".stripMargin,

    // engine joins on hashed gram ids (join-key-only); the oracle groups
    // the RAW gram strings, so a hash collision that changed any count
    // would fail the compare rather than be mirrored by it
    "q_dedup_novelty" ->
      s"""WITH ${shingleCtesOver("documents")},
         |fo AS (SELECT sh, min(doc_id) AS first_doc FROM sh GROUP BY sh),
         |per AS (
         |  SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
         |    CAST(SUM(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
         |  FROM sh s JOIN fo f ON f.sh = s.sh
         |  GROUP BY s.doc_id)
         |SELECT doc_id, n_grams, n_novel,
         |  CAST(n_novel * 1000 // n_grams AS BIGINT) AS novelty_permille
         |FROM per ORDER BY doc_id""".stripMargin,

    "q_dedup_survivor" ->
      s"""WITH RECURSIVE $minhashCtes,
         |edges AS (
         |  SELECT doc_a AS a, doc_b AS b FROM pairsq
         |  UNION SELECT doc_b, doc_a FROM pairsq),
         |reach(src, dst) AS (
         |  SELECT a, b FROM edges
         |  UNION
         |  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
         |lab AS (SELECT src AS doc_id, least(src, min(dst)) AS cluster
         |        FROM reach GROUP BY src),
         |ql AS (SELECT doc_id, $qualityIntSql AS q FROM documents),
         |labeled AS (
         |  SELECT ql.doc_id, ql.q, coalesce(l.cluster, ql.doc_id) AS cluster
         |  FROM ql LEFT JOIN lab l ON l.doc_id = ql.doc_id),
         |ent AS (SELECT cluster, CAST(count(*) AS BIGINT) AS n_members,
         |               max(q) AS best_q
         |        FROM labeled GROUP BY cluster),
         |surv AS (SELECT l.cluster, min(l.doc_id) AS survivor_id
         |         FROM labeled l JOIN ent e
         |           ON e.cluster = l.cluster AND l.q = e.best_q
         |         GROUP BY l.cluster)
         |SELECT e.cluster AS cluster, s.survivor_id, CAST(e.best_q AS BIGINT) AS best_q,
         |       e.n_members
         |FROM ent e JOIN surv s ON s.cluster = e.cluster
         |ORDER BY e.cluster""".stripMargin,

    "q_sample_hash" ->
      s"""SELECT doc_id, lang, source FROM documents
         |WHERE ${sqlHex60("md5('sample:' || doc_id::VARCHAR)")} % 10 < 3
         |ORDER BY doc_id""".stripMargin,

    "q_sample_neyman" ->
      """WITH st AS (SELECT c_nationkey AS nation,
        |    CAST(COUNT(*) AS BIGINT) AS n_pop,
        |    CAST(SUM(CAST(floor(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS sv,
        |    CAST(SUM(CAST(floor(c_acctbal * 100) AS BIGINT)
        |           * CAST(floor(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS qv
        |  FROM customer GROUP BY 1),
        |w AS (SELECT nation, n_pop,
        |        CAST(floor(sqrt(CAST(n_pop::HUGEINT * qv - sv::HUGEINT * sv
        |          AS DOUBLE))) AS BIGINT) AS w
        |      FROM st),
        |z AS (SELECT CAST(SUM(w) AS BIGINT) AS z FROM w),
        |b AS (SELECT nation, n_pop, w,
        |        (1000 * w) // z.z AS base, (1000 * w) % z.z AS rem
        |      FROM w, z),
        |x AS (SELECT CAST(1000 - SUM(base) AS BIGINT) AS extra FROM b),
        |r AS (SELECT nation, n_pop, w, base, extra,
        |        CAST(ROW_NUMBER() OVER (ORDER BY rem DESC, nation ASC) AS BIGINT)
        |          AS rk
        |      FROM b, x)
        |SELECT nation, n_pop, w,
        |  CAST(base + CASE WHEN rk <= extra THEN 1 ELSE 0 END AS BIGINT) AS alloc
        |FROM r ORDER BY nation""".stripMargin,

    "q_sample_stratified" ->
      s"""SELECT lang, COUNT(*) AS n_sampled, MIN(doc_id) AS first_doc
         |FROM documents
         |WHERE CASE WHEN lang = 'en'
         |           THEN ${sqlHex60("md5('strat:' || doc_id::VARCHAR)")} % 10 < 5
         |           ELSE ${sqlHex60("md5('strat:' || doc_id::VARCHAR)")} % 10 < 1 END
         |GROUP BY lang ORDER BY lang""".stripMargin,

    "q_sample_weighted" ->
      s"""SELECT doc_id, n_chars FROM documents
         |WHERE ${sqlHex60("md5('wt:' || doc_id::VARCHAR)")} % 1000000 <
         |  floor(CAST(n_chars AS DOUBLE) * 1000000.0 /
         |        CAST((SELECT max(n_chars) FROM documents) AS DOUBLE))
         |ORDER BY doc_id""".stripMargin,

    "q_sample_capped" ->
      s"""SELECT doc_id, source FROM (
         |  SELECT doc_id, source,
         |    row_number() OVER (PARTITION BY source
         |      ORDER BY ${sqlHex60("md5('cap:' || doc_id::VARCHAR)")}, doc_id) AS rn
         |  FROM documents)
         |WHERE rn <= 10 ORDER BY source, doc_id""".stripMargin,

    "q_index_maintain" ->
      s"""WITH corpus2 AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 2),
         |${minhashCtesOver("corpus2")}
         |SELECT doc_id, band, band_sig
         |FROM bands ORDER BY doc_id, band""".stripMargin,

    "q_sample_balanced" ->
      s"""WITH r AS (SELECT lang, doc_id,
         |             ${sqlHex60("md5('bal:' || doc_id::VARCHAR)")} AS h
         |           FROM documents),
         |m AS (SELECT CAST(min(cnt) AS BIGINT) AS m
         |      FROM (SELECT count(*) AS cnt FROM r GROUP BY lang)),
         |rk AS (SELECT lang, doc_id, h,
         |         row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rn
         |       FROM r)
         |SELECT lang, CAST(count(*) AS BIGINT) AS n_kept,
         |  CAST(sum(doc_id) AS BIGINT) AS id_sum,
         |  CAST(bit_xor(h) AS BIGINT) AS h_xor
         |FROM rk, m WHERE rn <= m GROUP BY lang ORDER BY lang""".stripMargin,

    "q_split_assign" ->
      s"""WITH s AS (
         |  SELECT *,
         |    CASE WHEN ${sqlHex60("md5('split:' || doc_id::VARCHAR)")} % 100 < 80 THEN 'train'
         |         WHEN ${sqlHex60("md5('split:' || doc_id::VARCHAR)")} % 100 < 90 THEN 'val'
         |         ELSE 'test' END AS split
         |  FROM documents)
         |SELECT split, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS n_chars,
         |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
         |FROM s GROUP BY split ORDER BY split""".stripMargin,

    "q_shard_balance" ->
      s"""WITH s AS (
         |  SELECT ${sqlHex60("md5('shard:' || doc_id::VARCHAR)")} % 16 AS shard, n_chars
         |  FROM documents),
         |per AS (SELECT shard, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS chars
         |        FROM s GROUP BY shard)
         |SELECT shard, n_docs, chars,
         |  CAST(chars AS DOUBLE) / CAST((SELECT SUM(n_chars) FROM documents) AS DOUBLE) AS share
         |FROM per ORDER BY shard""".stripMargin,

    "q_mix_budget" ->
      s"""WITH t AS (
         |  SELECT doc_id, lang,
         |    CAST(CASE WHEN length(trim(text)) = 0 THEN 0
         |              ELSE len(string_split_regex(trim(text), '\\s+')) END AS BIGINT) AS toks
         |  FROM documents),
         |tot AS (SELECT lang, CAST(SUM(toks) AS BIGINT) AS T FROM t GROUP BY lang),
         |r AS (
         |  SELECT lang,
         |    LEAST(1000000, CAST(floor(12000.0 *
         |      (CASE lang WHEN 'en' THEN 0.40 WHEN 'fr' THEN 0.35
         |                 WHEN 'de' THEN 0.10 WHEN 'es' THEN 0.10 ELSE 0.05 END)
         |      * 1000000.0 / CAST(T AS DOUBLE)) AS BIGINT)) AS rate_ppm
         |  FROM tot)
         |SELECT t.lang, r.rate_ppm, COUNT(*) AS n_kept, CAST(SUM(t.toks) AS BIGINT) AS toks_kept
         |FROM t JOIN r ON r.lang = t.lang
         |WHERE ${sqlHex60("md5('mix:' || doc_id::VARCHAR)")} % 1000000 < r.rate_ppm
         |GROUP BY t.lang, r.rate_ppm
         |ORDER BY t.lang""".stripMargin,

    "q_mix_dedup_weight" ->
      """WITH fp AS (SELECT doc_id, source,
        |        md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fp
        |      FROM documents),
        |cs AS (SELECT fp, CAST(count(*) AS BIGINT) AS csize FROM fp GROUP BY fp)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(CASE WHEN csize = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
        |  CAST(SUM(1000000 // csize) AS BIGINT) AS effective_docs_ppm
        |FROM fp JOIN cs USING (fp)
        |GROUP BY source ORDER BY source""".stripMargin,

    // `//` is DuckDB floor division = Spark `div` on the non-negative
    // BIGINTs here; the window cumsum is the oracle spelling of the
    // engine's distributed two-phase prefix (same global order, same sum)
    "q_mix_dsir" ->
      s"""WITH w AS (
         |  SELECT doc_id, lang = 'en' AS is_t,
         |    unnest(string_split_regex(trim(lower(text)), '\\s+')) AS t
         |  FROM documents),
         |tk AS (SELECT doc_id, is_t, ${sqlHex60("md5('dsir:' || t)")} % 256 AS b
         |       FROM w WHERE t <> ''),
         |pdb AS (SELECT doc_id, is_t, b, CAST(COUNT(*) AS BIGINT) AS c FROM tk GROUP BY 1, 2, 3),
         |census AS (SELECT b,
         |    CAST(SUM(CASE WHEN is_t THEN c ELSE 0 END) AS BIGINT) AS ct,
         |    CAST(SUM(CASE WHEN NOT is_t THEN c ELSE 0 END) AS BIGINT) AS cr
         |  FROM pdb GROUP BY b),
         |tot AS (SELECT CAST(SUM(ct) AS BIGINT) AS tot_t,
         |               CAST(SUM(cr) AS BIGINT) AS tot_r FROM census),
         |wt AS (SELECT b, CAST((10000 * ((10000 * (ct + 1)) // (tot_t + 256)))
         |    // greatest((10000 * (cr + 1)) // (tot_r + 256), 1) AS BIGINT) AS llr
         |  FROM census, tot),
         |sc AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_toks,
         |    CAST(SUM(c * llr) AS BIGINT) AS llr_sum
         |  FROM pdb JOIN wt USING (b) WHERE NOT is_t GROUP BY doc_id),
         |sel AS (SELECT doc_id, n_toks, llr_sum // n_toks AS score,
         |    CAST(SUM(n_toks) OVER (ORDER BY llr_sum // n_toks DESC, doc_id) AS BIGINT) AS cum_toks
         |  FROM sc)
         |SELECT doc_id, n_toks, score, cum_toks
         |FROM sel WHERE cum_toks <= 5000 ORDER BY doc_id""".stripMargin,

    // same two-level-prefix rank and identical phase formula — no NTILE
    "q_mix_curriculum" ->
      raw"""WITH sc AS (
           |  SELECT doc_id,
           |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_words,
           |    CAST(len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
           |      w -> regexp_full_match(w, '[a-z]+'))) AS BIGINT) AS n_alpha
           |  FROM documents),
           |s2 AS (SELECT doc_id, n_words,
           |    CAST(n_alpha * 1000000 // GREATEST(n_words, 1) AS BIGINT) AS score_ppm
           |  FROM sc),
           |cen AS (SELECT score_ppm, CAST(COUNT(*) AS BIGINT) AS c
           |        FROM s2 GROUP BY score_ppm),
           |cum AS (SELECT score_ppm,
           |    CAST(COALESCE(SUM(c) OVER (ORDER BY score_ppm DESC
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           |      AS cum_before
           |  FROM cen),
           |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM s2),
           |rk AS (SELECT doc_id, n_words, score_ppm,
           |    ROW_NUMBER() OVER (PARTITION BY score_ppm ORDER BY doc_id) AS rw
           |  FROM s2),
           |ph AS (SELECT rk.score_ppm, rk.n_words,
           |    CAST(((cum.cum_before + rk.rw - 1) * 4) // tot.n + 1 AS INT) AS phase
           |  FROM rk JOIN cum USING (score_ppm), tot)
           |SELECT phase, CAST(COUNT(*) AS BIGINT) AS n_docs,
           |  CAST(SUM(n_words) AS BIGINT) AS n_tokens,
           |  CAST(MIN(score_ppm) AS BIGINT) AS min_score_ppm,
           |  CAST(MAX(score_ppm) AS BIGINT) AS max_score_ppm
           |FROM ph GROUP BY phase ORDER BY phase""".stripMargin,

    "q_mix_alpha" ->
      s"""WITH t AS (
         |  SELECT doc_id, lang,
         |    CAST(CASE WHEN length(trim(text)) = 0 THEN 0
         |              ELSE len(string_split_regex(trim(text), '\\s+')) END AS BIGINT) AS toks
         |  FROM documents),
         |tot AS (SELECT lang, CAST(SUM(toks) AS BIGINT) AS T,
         |               CAST(floor(sqrt(CAST(SUM(toks) AS DOUBLE))) AS BIGINT) AS sq
         |        FROM t GROUP BY lang),
         |z AS (SELECT CAST(SUM(sq) AS BIGINT) AS Z FROM tot),
         |r AS (
         |  SELECT lang,
         |    CASE WHEN T > 0 THEN
         |      LEAST(1000000, CAST(floor(12000.0 * CAST(sq AS DOUBLE) / CAST(Z AS DOUBLE)
         |        * 1000000.0 / CAST(T AS DOUBLE)) AS BIGINT))
         |    ELSE 0 END AS rate_ppm
         |  FROM tot, z)
         |SELECT t.lang, r.rate_ppm, COUNT(*) AS n_kept, CAST(SUM(t.toks) AS BIGINT) AS toks_kept
         |FROM t JOIN r ON r.lang = t.lang
         |WHERE ${sqlHex60("md5('mixa:' || doc_id::VARCHAR)")} % 1000000 < r.rate_ppm
         |GROUP BY t.lang, r.rate_ppm
         |ORDER BY t.lang""".stripMargin,

    "q_mix_epochs" ->
      s"""WITH t AS (
         |  SELECT lang,
         |    CAST(CASE WHEN length(trim(text)) = 0 THEN 0
         |              ELSE len(string_split_regex(trim(text), '\\s+')) END AS BIGINT) AS toks
         |  FROM documents),
         |tot AS (SELECT lang, CAST(SUM(toks) AS BIGINT) AS n_tokens,
         |               CAST(floor(sqrt(CAST(SUM(toks) AS DOUBLE))) AS BIGINT) AS sq
         |        FROM t GROUP BY lang),
         |z AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total,
         |             CAST(SUM(sq) AS BIGINT) AS Z FROM tot),
         |r AS (SELECT lang, n_tokens,
         |        CAST((total * 2 // Z) * sq AS BIGINT) AS target_tokens
         |      FROM tot, z),
         |e AS (SELECT lang, n_tokens, target_tokens,
         |        CAST(LEAST(4000, target_tokens * 1000 // greatest(n_tokens, 1)) AS BIGINT)
         |          AS epochs_x1000
         |      FROM r)
         |SELECT lang, n_tokens, target_tokens, epochs_x1000,
         |  CAST(epochs_x1000 * n_tokens // 1000 AS BIGINT) AS alloc_tokens
         |FROM e ORDER BY lang""".stripMargin,

    // same banding pipeline CTEs over the eval slice; the truth side
    // re-derives exact Jaccard for EVERY shared-shingle pair
    "q_dedup_lsh_recall" ->
      s"""WITH ev AS (SELECT doc_id, text FROM documents WHERE doc_id < 100),
         |${minhashCtesOver("ev")},
         |truthp AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |           FROM shh a JOIN shh b ON a.sh = b.sh AND a.doc_id < b.doc_id),
         |tinter AS (SELECT p.doc_a, p.doc_b, count(*) AS inter
         |           FROM truthp p JOIN shh A ON A.doc_id = p.doc_a
         |                         JOIN shh B ON B.doc_id = p.doc_b AND B.sh = A.sh
         |           GROUP BY p.doc_a, p.doc_b),
         |truth AS (SELECT i.doc_a, i.doc_b
         |          FROM tinter i JOIN sizes sa ON sa.doc_id = i.doc_a
         |                        JOIN sizes sb ON sb.doc_id = i.doc_b
         |          WHERE CAST(i.inter AS DOUBLE)
         |                / CAST(sa.n + sb.n - i.inter AS DOUBLE) >= 0.5)
         |SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM truth) AS n_truth,
         |       (SELECT CAST(COUNT(*) AS BIGINT) FROM pairsq) AS n_found,
         |       CAST((SELECT COUNT(*) FROM pairsq) * 1000000
         |            // greatest((SELECT COUNT(*) FROM truth), 1) AS BIGINT) AS recall_ppm""".stripMargin,

    // the water-filling loop replayed as a recursive CTE over the
    // size-ascending language census — same Long floor division
    "q_mix_unimax" ->
      s"""WITH RECURSIVE t AS (
         |  SELECT lang,
         |    CAST(CASE WHEN length(trim(text)) = 0 THEN 0
         |              ELSE len(string_split_regex(trim(text), '\\s+')) END AS BIGINT) AS toks
         |  FROM documents),
         |tot AS (SELECT lang, CAST(SUM(toks) AS BIGINT) AS n FROM t GROUP BY lang),
         |ord AS (SELECT lang, n,
         |          CAST(row_number() OVER (ORDER BY n, lang) AS BIGINT) AS i,
         |          CAST(COUNT(*) OVER () AS BIGINT) AS L,
         |          CAST(SUM(n) OVER () AS BIGINT) AS B
         |        FROM tot),
         |rec(i, rem, lang, n, alloc) AS (
         |  SELECT CAST(0 AS BIGINT), (SELECT B FROM ord LIMIT 1),
         |         CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
         |  UNION ALL
         |  SELECT o.i, r.rem - LEAST(2 * o.n, r.rem // (o.L - r.i)),
         |         o.lang, o.n, LEAST(2 * o.n, r.rem // (o.L - r.i))
         |  FROM rec r JOIN ord o ON o.i = r.i + 1)
         |SELECT lang, n AS n_tokens, alloc AS alloc_tokens,
         |  CAST(alloc * 1000000 // greatest(n, 1) AS BIGINT) AS epochs_ppm
         |FROM rec WHERE i > 0 ORDER BY lang""".stripMargin,

    // same whitespace token census; exact isqrt replayed with the same
    // ±1 integer correction so float sqrt can never decide a weight
    "q_mix_temp" ->
      s"""WITH t AS (
         |  SELECT lang,
         |    CAST(CASE WHEN length(trim(text)) = 0 THEN 0
         |              ELSE len(string_split_regex(trim(text), '\\s+')) END AS BIGINT) AS toks
         |  FROM documents),
         |tot AS (SELECT lang, CAST(SUM(toks) AS BIGINT) AS n FROM t GROUP BY lang),
         |i0 AS (SELECT lang, n,
         |         CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT) AS s0 FROM tot),
         |i1 AS (SELECT lang, n,
         |         CASE WHEN s0 * s0 > n THEN s0 - 1
         |              WHEN (s0 + 1) * (s0 + 1) <= n THEN s0 + 1
         |              ELSE s0 END AS isq
         |       FROM i0),
         |w AS (SELECT lang, n, isq, SUM(n) OVER () AS totn,
         |        SUM(isq) OVER () AS tots FROM i1),
         |p AS (SELECT lang, n, isq,
         |        CAST(n * 1000000 // totn AS BIGINT) AS raw_ppm,
         |        CAST(isq * 1000000 // tots AS BIGINT) AS temp_ppm
         |      FROM w)
         |SELECT lang, n AS n_tokens, isq AS isqrt_tokens, raw_ppm, temp_ppm,
         |  CAST(temp_ppm * 1000000 // greatest(raw_ppm, 1) AS BIGINT) AS boost_ppm
         |FROM p ORDER BY lang""".stripMargin,

    "q_dedup_simhash_sig" ->
      s"""$simhashSql
         |SELECT doc_id, simhash FROM sims ORDER BY doc_id""".stripMargin,

    "q_dedup_simhash" ->
      s"""$simhashSql,
         |chunked AS (
         |  SELECT doc_id, simhash, t.j, (simhash >> (15*t.j)) & 32767 AS c
         |  FROM sims CROSS JOIN (SELECT unnest(range(0,4)) AS j) t),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |         a.simhash AS sim_a, b.simhash AS sim_b
         |  FROM chunked a JOIN chunked b ON a.j = b.j AND a.c = b.c AND a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b, CAST(bit_count(xor(sim_a, sim_b)) AS INT) AS hamming
         |FROM cand WHERE bit_count(xor(sim_a, sim_b)) <= 3
         |ORDER BY doc_a, doc_b""".stripMargin,

    // same census, candidates additionally confined to a.lang = b.lang —
    // mirrors simhashPairs(blockCols = Seq("lang")) exactly
    "q_dedup_simhash_blocked" ->
      s"""$simhashSql,
         |simsl AS (SELECT s.doc_id, s.simhash, d.lang
         |          FROM sims s JOIN documents d USING (doc_id)),
         |chunked AS (
         |  SELECT doc_id, simhash, lang, t.j, (simhash >> (15*t.j)) & 32767 AS c
         |  FROM simsl CROSS JOIN (SELECT unnest(range(0,4)) AS j) t),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |         a.simhash AS sim_a, b.simhash AS sim_b
         |  FROM chunked a JOIN chunked b
         |    ON a.j = b.j AND a.c = b.c AND a.lang = b.lang AND a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b, CAST(bit_count(xor(sim_a, sim_b)) AS INT) AS hamming
         |FROM cand WHERE bit_count(xor(sim_a, sim_b)) <= 3
         |ORDER BY doc_a, doc_b""".stripMargin,

    "q_dedup_prefix" ->
      s"""WITH $shingleCtes,
         |shh AS (SELECT doc_id, ${sqlHex60("md5(sh)")} AS sh FROM sh),
         |freq AS (SELECT sh, count(*) AS df FROM shh GROUP BY sh),
         |pfx AS (SELECT doc_id, sh FROM (
         |    SELECT s.doc_id, s.sh,
         |      row_number() OVER (PARTITION BY s.doc_id ORDER BY f.df, s.sh) AS rn
         |    FROM shh s JOIN freq f ON f.sh = s.sh) t WHERE rn <= 6),
         |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |         FROM pfx a JOIN pfx b ON a.sh = b.sh AND a.doc_id < b.doc_id),
         |sizes AS (SELECT doc_id, count(*) AS n FROM shh GROUP BY doc_id),
         |inter AS (
         |  SELECT c.doc_a, c.doc_b, count(*) AS inter
         |  FROM cand c JOIN shh a ON a.doc_id = c.doc_a
         |              JOIN shh b ON b.doc_id = c.doc_b AND b.sh = a.sh
         |  GROUP BY c.doc_a, c.doc_b)
         |SELECT i.doc_a, i.doc_b,
         |  CAST(i.inter AS DOUBLE) / CAST(sa.n + sb.n - i.inter AS DOUBLE) AS jaccard
         |FROM inter i JOIN sizes sa ON sa.doc_id = i.doc_a
         |             JOIN sizes sb ON sb.doc_id = i.doc_b
         |WHERE CAST(i.inter AS DOUBLE) / CAST(sa.n + sb.n - i.inter AS DOUBLE) >= 0.5
         |ORDER BY doc_a, doc_b""".stripMargin,

    // the oracle is the NAIVE inverted-index join over ALL shared RAW
    // shingles (no prefix filter, no hashing) — sound ground truth
    // precisely because the engine's prefix filter claims losslessness
    // and its hashes claim collision-freedom; either bug hash-mismatches
    // instead of mirroring
    "q_dedup_ppjoin" ->
      s"""WITH $shingleCtes,
         |m AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS m FROM sh GROUP BY doc_id),
         |ip AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(count(*) AS BIGINT) AS inter
         |       FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
         |       GROUP BY 1, 2)
         |SELECT doc_a, doc_b, inter,
         |  CAST(ma.m + mb.m - inter AS BIGINT) AS uni,
         |  CAST(inter * 1000000 // (ma.m + mb.m - inter) AS BIGINT) AS jaccard_ppm
         |FROM ip JOIN m ma ON ma.doc_id = doc_a JOIN m mb ON mb.doc_id = doc_b
         |WHERE inter * 2 >= (ma.m + mb.m - inter) * 1
         |ORDER BY doc_a, doc_b""".stripMargin,

    "q_dedup_ngram" ->
      s"""WITH $shingleCtes,
         |shi AS (SELECT doc_id, ${sqlHex60("md5(sh)")} AS sh FROM sh),
         |rare AS (SELECT sh FROM (SELECT sh, count(*) AS df FROM shi GROUP BY sh) WHERE df <= 100),
         |shf AS (SELECT s.doc_id, s.sh FROM shi s JOIN rare r ON s.sh = r.sh),
         |sizes AS (SELECT doc_id, count(*) AS n FROM shf GROUP BY doc_id),
         |inter AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
         |  FROM shf a JOIN shf b ON a.sh = b.sh AND a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id)
         |SELECT i.doc_a, i.doc_b,
         |  CAST(i.inter AS DOUBLE) / CAST(sa.n + sb.n - i.inter AS DOUBLE) AS jaccard
         |FROM inter i JOIN sizes sa ON sa.doc_id = i.doc_a
         |             JOIN sizes sb ON sb.doc_id = i.doc_b
         |WHERE CAST(i.inter AS DOUBLE) / CAST(sa.n + sb.n - i.inter AS DOUBLE) >= 0.8
         |ORDER BY doc_a, doc_b""".stripMargin,

    "q_dedup_winnow_fp" ->
      s"""WITH $winnowFpCtes
         |SELECT doc_id, count(*) AS n_fp FROM fp GROUP BY doc_id
         |ORDER BY doc_id""".stripMargin,

    "q_dedup_winnow" ->
      s"""WITH $winnowFpCtes,
         |rare AS (SELECT fp FROM (SELECT fp, count(*) AS df FROM fp GROUP BY fp)
         |         WHERE df <= $WINNOW_MAX_DF),
         |f AS (SELECT p.doc_id, p.fp FROM fp p JOIN rare r ON p.fp = r.fp),
         |pairs AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
         |  FROM f a JOIN f b ON a.fp = b.fp AND a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id)
         |SELECT doc_a, doc_b, n_shared FROM pairs
         |WHERE n_shared >= $WINNOW_MIN_SHARED
         |ORDER BY doc_a, doc_b""".stripMargin,

    "q_dedup_containment" ->
      s"""WITH $winnowFpCtes,
         |rare AS (SELECT fp FROM (SELECT fp, count(*) AS df FROM fp GROUP BY fp)
         |         WHERE df <= $WINNOW_MAX_DF),
         |f AS (SELECT p.doc_id, p.fp FROM fp p JOIN rare r ON p.fp = r.fp),
         |inter AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
         |  FROM f a JOIN f b ON a.fp = b.fp AND a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id),
         |sizes AS (SELECT doc_id, count(*) AS n FROM fp GROUP BY doc_id),
         |scored AS (
         |  SELECT i.doc_a, i.doc_b, i.n_shared,
         |    CAST(i.n_shared AS DOUBLE) / CAST(sa.n AS DOUBLE) AS cont_a,
         |    CAST(i.n_shared AS DOUBLE) / CAST(sb.n AS DOUBLE) AS cont_b
         |  FROM inter i JOIN sizes sa ON sa.doc_id = i.doc_a
         |               JOIN sizes sb ON sb.doc_id = i.doc_b)
         |SELECT doc_a, doc_b, n_shared, cont_a, cont_b FROM scored
         |WHERE greatest(cont_a, cont_b) >= 0.5
         |ORDER BY doc_a, doc_b""".stripMargin,

    "q_dedup_split_leakage" -> {
      val splitCase =
        s"""CASE WHEN ${sqlHex60("md5('split:' || doc_id::VARCHAR)")} % 100 < 80 THEN 'train'
           |     WHEN ${sqlHex60("md5('split:' || doc_id::VARCHAR)")} % 100 < 90 THEN 'val'
           |     ELSE 'test' END""".stripMargin
      s"""WITH $minhashCtes,
         |splits AS (SELECT doc_id, $splitCase AS split FROM documents)
         |SELECT p.doc_a, p.doc_b, sa.split AS split_a, sb.split AS split_b, p.jaccard
         |FROM pairsq p JOIN splits sa ON sa.doc_id = p.doc_a
         |              JOIN splits sb ON sb.doc_id = p.doc_b
         |WHERE sa.split <> sb.split
         |ORDER BY p.doc_a, p.doc_b""".stripMargin
    }
  )

  /** DuckDB spelling of Dedup.winnowFingerprints, ending in
    * `fp(doc_id, fp)` — positional k-grams, md5→60-bit ids, trailing
    * w-window min selection. Same constants as the Scala pipeline.
    */
  private lazy val winnowFpCtes: String = {
    val k = WINNOW_K; val w = WINNOW_W
    raw"""w AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ws FROM documents),
         |gl AS (SELECT doc_id, list_transform(range(1, len(ws) - ${k - 2}),
         |         i -> array_to_string(list_slice(ws, i, i + ${k - 1}), ' ')) AS gs
         |       FROM w WHERE len(ws) >= $k),
         |g AS (SELECT doc_id, CAST(unnest(range(1, len(gs) + 1)) AS BIGINT) AS pos,
         |        unnest(gs) AS gram FROM gl),
         |h AS (SELECT doc_id, pos, ${sqlHex60("md5(gram)")} AS h FROM g),
         |sel AS (SELECT doc_id, h, min(h) OVER (PARTITION BY doc_id ORDER BY pos
         |          ROWS BETWEEN ${w - 1} PRECEDING AND CURRENT ROW) AS wmin FROM h),
         |fp AS (SELECT DISTINCT doc_id, h AS fp FROM sel WHERE h = wmin)""".stripMargin
  }
}
