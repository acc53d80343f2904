package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.CacheScope.ScopedPersist
import graft.engine.QueryBuilder.scan
import graft.ops.{CorpusOps, Dedup, TextAnalysis}

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
      val fp = quality.withColumn("fp", TextAnalysis.fingerprint(col("text"))).scopedPersist()
      // carry `text` through the persisted survivors: the minhash stage
      // reads it straight from cache instead of re-scanning + re-joining
      // the raw documents table (was a second full scan)
      val keepExact = fp.groupBy(col("fp")).agg(min(col("doc_id")).as("doc_id"))
        .join(fp.select("doc_id", "lang", "source", "n_words", "text"), "doc_id")
        .scopedPersist()

      // 3. near-dup removal: minhash pairs over survivors → CC →
      //    drop every doc that is not its cluster's canonical (min id)
      val pairs = Dedup.minhashDedup(
        keepExact.select("doc_id", "text"), "doc_id", "text", threshold = 0.5)
      val clusters = Dedup.connectedComponents(pairs)
      val dropNearDups = clusters.filter(col("doc_id") =!= col("cluster")).select("doc_id")
      val deduped = keepExact.join(dropNearDups, Seq("doc_id"), "left_anti")

      // 4. reproducible 50% sample by content-free hash
      deduped
        .filter(Dedup.hex60(md5(concat(lit("corpus:"), col("doc_id").cast("string")).cast("binary"))) % 2 === 0)
        .select(col("doc_id"), col("lang"), col("source"), col("n_words").cast("long").as("n_words"))
        .orderBy(col("doc_id"))
    }),

    // END-TO-END CORPUS FUNNEL CENSUS — the one readout a dataset owner
    // actually reads before a training run: clean → langid → Gopher gate
    // → exact dedup → near-dup in ONE composed lazy pipeline, emitting
    // per-stage kept/dropped counts WITH drop attribution (which Gopher
    // rule fired) and the surviving per-language mixture weights. Every
    // stage survivor set is persisted ONCE and read by exactly two
    // consumers (its census and the next stage) — the shingle tier runs
    // once (FunnelPlanSpec pins it); censuses are 1-row aggs crossed
    // (the blessed 1-row cross), so the whole census is one job over
    // cached stage relations. Long-format output (stage_ord, stage,
    // metric, value) so the stage list can grow without a schema change
    "q_corpus_funnel" -> ((s: SparkSession, d: String) => corpusFunnel(s, d)),

    // PER-DOMAIN CONTRIBUTION CAP — the mixture-hygiene rule that stops
    // any one source from dominating the corpus: keep each source's K
    // best docs (here: longest, deterministic id tie-break) through the
    // custom TopKPerKey physical operator, so at 100 TB the map-side
    // bounded heaps ship <= partitions*sources*K rows to the shuffle
    // instead of the whole corpus (contrast the window-twin oracle)
    "q_corpus_cap" -> ((s: SparkSession, d: String) =>
      graft.plans.TopKPerKey.topKPerKey(
        scan(s, d, "documents").select(col("doc_id"), col("source"), col("n_chars")),
        keyCols = Seq("source"),
        sorts = Seq(("n_chars", false), ("doc_id", true)),
        k = 25)
        .orderBy(col("source"), col("n_chars").desc, col("doc_id"))),

    // Benchmark decontamination: docs from source 'src0' are the held-out
    // eval suite; flag every train doc sharing a 4-gram with it.
    "q_decontaminate" -> ((s: SparkSession, d: String) =>
      CorpusOps.decontaminate(scan(s, d, "documents"), "doc_id", "text",
          col("source") === "src0", n = 4)
        .orderBy(col("doc_id"))),

    // DETERMINISTIC RESUMABLE SHUFFLE ORDER (the data-order contract
    // behind reproducible training): each epoch's order is rank by
    // h = hex60(md5('ep<e>:' || doc_id)) — a keyed pseudo-random
    // permutation any worker can recompute — and a mid-epoch RESUME
    // materializes one batch (B = 64) at the epoch midpoint WITHOUT a
    // global sort: Selection.kthSmallest's two-phase distributed
    // selection finds the batch's two rank-boundary hash values
    // (census of 16k high-bit buckets, then rank only the boundary
    // bucket's rows), and one broadcast range filter pulls exactly the
    // B rows. The full-sort alternative is what this op exists to
    // avoid at 100 TB; the oracle IS that full sort (window rank)
    "q_shuffle_resume" -> ((s: SparkSession, d: String) => {
      import org.apache.spark.sql.expressions.Window
      import graft.ops.Selection
      val B = 64L
      val docs = scan(s, d, "documents").select(col("doc_id"))
      val perEpoch = Seq(0L, 1L).map { ep =>
        docs.select(lit(ep).as("epoch"), col("doc_id"),
          Dedup.hex60(md5(concat(lit(s"ep$ep:"),
            col("doc_id").cast("string")).cast("binary"))).as("h"))
      }.reduce(_ unionAll _)
      val bounds = Selection.kthSmallest(perEpoch, "epoch", "h", Seq(
          "lo" -> ((n: org.apache.spark.sql.Column) =>
            Selection.idiv(n, 2 * B) * B + 1),
          "hi" -> ((n: org.apache.spark.sql.Column) =>
            least(Selection.idiv(n, 2 * B) * B + B, n))),
        shift = 46)
      val wide = bounds.groupBy(col("__g").as("epoch"))
        .agg(max(when(col("__t") === "lo", col("__v"))).as("h_lo"),
          max(when(col("__t") === "hi", col("__v"))).as("h_hi"))
      perEpoch.join(broadcast(wide), Seq("epoch"))
        .filter(col("h") >= col("h_lo") && col("h") <= col("h_hi"))
        .withColumn("pos", row_number().over(
          Window.partitionBy(col("epoch")).orderBy(col("h"), col("doc_id")))
          .cast("long"))
        .select(col("epoch"), col("pos"), col("doc_id"), col("h"))
        .orderBy(col("epoch"), col("pos"))
    }),

    // ENCODING-HYGIENE census (the mojibake/artifact triage a web-crawl
    // ingest runs before any text op): per source, documents carrying
    // the UTF-8-as-Latin-1 mojibake signature (Ã followed by a
    // continuation-range char), U+FFFD replacement chars (a decoder
    // already gave up), C0 control chars, zero-width chars, and NBSP —
    // five codegen'd rlike flags in ONE map pass, no UDF. The corpus is
    // clean ASCII, so the fixture PLANTS each artifact class on a
    // disjoint id residue (id%11=3 mojibake, %13=5 replacement, %17=7
    // control, %19=9 zero-width+NBSP) — the census is non-trivial and
    // the oracle replants identically via chr() codepoints
    "q_text_mojibake" -> ((s: SparkSession, d: String) => {
      val t = scan(s, d, "documents")
        .withColumn("txt", concat(col("text"),
          when(col("doc_id") % 11 === 3, lit("\u00C3\u00A9")).otherwise(lit("")),
          when(col("doc_id") % 13 === 5, lit("\uFFFD")).otherwise(lit("")),
          when(col("doc_id") % 17 === 7, lit("\u0007")).otherwise(lit("")),
          when(col("doc_id") % 19 === 9, lit("\u200B\u00A0")).otherwise(lit(""))))
        .select(col("source"),
          col("txt").rlike("\\x{C3}[\\x{80}-\\x{BF}]").as("moji"),
          col("txt").rlike("\\x{FFFD}").as("repl"),
          col("txt").rlike("[\\x{00}-\\x{08}\\x{0B}\\x{0C}\\x{0E}-\\x{1F}]").as("ctrl"),
          col("txt").rlike("[\\x{200B}-\\x{200D}\\x{FEFF}]").as("zw"),
          col("txt").rlike("\\x{A0}").as("nbsp"))
      t.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("moji"), 1L).otherwise(0L)).as("n_mojibake"),
          sum(when(col("repl"), 1L).otherwise(0L)).as("n_replacement"),
          sum(when(col("ctrl"), 1L).otherwise(0L)).as("n_control"),
          sum(when(col("zw"), 1L).otherwise(0L)).as("n_zerowidth"),
          sum(when(col("nbsp"), 1L).otherwise(0L)).as("n_nbsp"),
          sum(when(!col("moji") && !col("repl") && !col("ctrl") &&
            !col("zw") && !col("nbsp"), 1L).otherwise(0L)).as("n_clean"))
        .orderBy(col("source"))
    }),

    // UNICODE NFC NORMALIZATION audit (the canonical-form gate next to
    // the mojibake census: combining sequences make byte-identical
    // dedup miss visually identical text): per source, docs NOT in NFC
    // and the code-unit mass normalization would reclaim. Engine runs
    // the real java.text.Normalizer through the typed mapPartitions
    // seam (narrow, no shuffle before the census); DuckDB replays with
    // nfc_normalize. Fixture plants BMP-only combining sequences
    // (e+U+0301, A+U+030A) and a precomposed control (U+00C5, already
    // NFC — must NOT flag) on disjoint id residues
    "q_text_nfc" -> ((s: SparkSession, d: String) => {
      import s.implicits._
      val t = scan(s, d, "documents").select(col("source"),
        concat(col("text"),
          when(col("doc_id") % 9 === 2, lit("e\u0301")).otherwise(lit("")),
          when(col("doc_id") % 9 === 4, lit("\u00C5")).otherwise(lit("")),
          when(col("doc_id") % 9 === 6, lit("A\u030A")).otherwise(lit("")))
          .as("txt"))
      val flagged = t.select(col("source"), col("txt")).as[(String, String)]
        .mapPartitions { it =>
          import java.text.Normalizer
          it.map { case (src, txt) =>
            val nfc = Normalizer.normalize(txt, Normalizer.Form.NFC)
            (src, if (nfc != txt) 1L else 0L, (txt.length - nfc.length).toLong)
          }
        }.toDF("source", "nn", "delta")
      flagged.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("nn")).as("n_not_nfc"),
          sum(col("delta")).as("n_units_saved"))
        .orderBy(col("source"))
    }),

    // Gopher-style repetition quality signals per document.
    "q_text_gopher" -> ((s: SparkSession, d: String) =>
      CorpusOps.repetitionStats(scan(s, d, "documents"), "doc_id", "text")
        .orderBy(col("doc_id"))),

    // GOPHER FILTER DECISION: the composite keep/drop verdict the stats
    // above feed (CorpusOps.gopherFilter — five within-doc rules, one
    // shuffle-free map pass), aggregated to the per-source quality
    // census a pipeline operator reads before a mixing decision
    "q_text_gopher_filter" -> ((s: SparkSession, d: String) =>
      CorpusOps.gopherFilter(scan(s, d, "documents"), "doc_id", "text",
          keepCols = Seq("source"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("keep").as("n_keep"),
          sum("bad_wc").as("n_bad_wc"), sum("bad_mwl").as("n_bad_mwl"),
          sum("bad_ttr").as("n_bad_ttr"), sum("bad_dbf").as("n_bad_dbf"),
          sum("bad_twf").as("n_bad_twf"))
        .orderBy(col("source"))),

    // VOCABULARY GROWTH BY SOURCE (the Heaps-law census behind "does
    // source S add anything new?"): each distinct BIGRAM is attributed
    // to its alphabetically-first source; per source, the distinct and
    // total bigram mass plus the NEW bigrams it contributes and the
    // cumulative vocabulary in source order. (Bigrams, not unigrams —
    // the synthetic corpus draws from a ~31-word lexicon, so unigram
    // novelty is a degenerate all-in-the-first-source curve; the ~900
    // bigram combinations actually spread.) Two map-side-combinable
    // groupBys over the gram stream; the running sum is a window over
    // the ~20-row source dimension, never the corpus
    "q_text_vocab_growth" -> ((s: SparkSession, d: String) => {
      import org.apache.spark.sql.expressions.Window
      val terms = scan(s, d, "documents").select(col("source"),
        explode(CorpusOps.wordNgrams(
          split(trim(lower(col("text"))), "\\s+"), 2)).as("term"))
      // persisted: BOTH consumers (the per-source census and the
      // first-source attribution) derive from this relation, and Spark
      // plans don't dedupe common subtrees — without the persist the
      // corpus-sized explode+aggregate ran twice in one plan (r17; the
      // cached relation is (source, term, cnt), ~distinct-pair-sized)
      val perSource = terms.groupBy("source", "term").agg(count(lit(1)).as("cnt"))
        .scopedPersist()
      val firstSrc = perSource.groupBy("term").agg(min(col("source")).as("source"))
      val newTerms = firstSrc.groupBy("source").agg(count(lit(1)).as("n_new_terms"))
      perSource.groupBy("source")
        .agg(count(lit(1)).as("n_distinct_terms"), sum("cnt").as("n_tokens"))
        .join(newTerms, Seq("source"), "left")
        .withColumn("n_new_terms", coalesce(col("n_new_terms"), lit(0L)))
        .withColumn("cum_vocab", sum("n_new_terms").over(Window.orderBy("source")))
        .orderBy(col("source"))
    }),

    // Content-defined chunking (CDC) for partial-overlap dedup: a word is
    // a chunk BOUNDARY when its salted hash lands in 1/8 of the space —
    // so chunk boundaries depend on content, not position, and two docs
    // sharing a long passage produce identical chunk fingerprints even at
    // different offsets (what fixed-size chunking can never do). Output:
    // chunk fingerprints shared by ≥2 docs — the partial-duplication map.
    "q_text_cdc" -> ((s: SparkSession, d: String) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val chunks = scan(s, d, "documents")
        .select(col("doc_id"), posexplode(CorpusOps.words(col("text"))).as(Seq("pos", "w")))
        .withColumn("is_boundary",
          when(Dedup.hex60(md5(concat(lit("cdc:"), col("w")).cast("binary"))) % 8 === 0, 1L)
            .otherwise(0L))
        .withColumn("chunk_idx", sum(col("is_boundary")).over(w))
        .groupBy(col("doc_id"), col("chunk_idx"))
        .agg(md5(array_join(array_sort(collect_list(struct(col("pos"), col("w"))))
          .getField("w"), " ").cast("binary")).as("chunk_fp"))
      chunks.groupBy(col("chunk_fp"))
        .agg(countDistinct(col("doc_id")).as("n_docs"))
        .filter(col("n_docs") >= 2)
        .orderBy(col("chunk_fp"))
    }),

    // Vocabulary build + id encoding — the tokenizer-prep shape: rank the
    // corpus vocabulary by frequency (stable tie-break on the word), keep
    // the top 30 as the dictionary, re-encode each doc's first 12 words
    // as ids (OOV → 0). Dictionary is broadcast-sized by construction;
    // encoding is explode → broadcast-join → ordered re-assembly.
    "q_vocab_encode" -> ((s: SparkSession, d: String) => {
      import org.apache.spark.sql.expressions.Window
      val docs = scan(s, d, "documents")
      val words = docs.select(col("doc_id"),
        posexplode(CorpusOps.words(col("text"))).as(Seq("pos", "w")))
      val vocab = words.groupBy(col("w")).agg(count(lit(1)).as("cnt"))
        .withColumn("id", row_number().over(Window.orderBy(col("cnt").desc, col("w"))))
        .filter(col("id") <= 30)
        .select(col("w"), col("id"))
      words.filter(col("pos") < 12)
        .join(broadcast(vocab), Seq("w"), "left")
        .groupBy(col("doc_id"))
        .agg(array_join(
          transform(array_sort(collect_list(struct(col("pos"), coalesce(col("id"), lit(0)).as("id")))),
            e => e.getField("id").cast("string")), ",").as("ids_csv"))
        .orderBy(col("doc_id"))
    }),

    // Length-bucketed batch packing — the pre-training batcher: docs
    // bucketed by word-count range, numbered deterministically inside
    // each bucket, grouped into fixed-size batches. One window pass.
    "q_batch_pack" -> ((s: SparkSession, d: String) => {
      import org.apache.spark.sql.expressions.Window
      val n = size(CorpusOps.words(col("text")))
      val bucket = floor(n / lit(50)).cast("long")
      val w = Window.partitionBy(col("len_bucket")).orderBy(col("doc_id"))
      scan(s, d, "documents")
        .select(col("doc_id"), n.cast("long").as("n_words"), bucket.as("len_bucket"))
        .withColumn("rn", row_number().over(w))
        .withColumn("batch_id", floor((col("rn") - 1) / lit(8)).cast("long"))
        .select(col("doc_id"), col("n_words"), col("len_bucket"), col("batch_id"))
        .orderBy(col("doc_id"))
    }),

    // EXACT DUPLICATED-SPAN detection (the substring-dedup signal of
    // "Deduplicating Training Data Makes Language Models Better"): a
    // 5-gram position is duplicated when its gram occurs in >= 2 distinct
    // docs; consecutive duplicated positions merge into maximal spans
    // (gaps-and-islands window). Per doc: span count, longest span in
    // tokens, duplicated-position fraction — the "drop docs with long
    // verbatim overlaps" filter. Grams ride as 64-bit xxhash64 ids
    // (codegen'd, ~free per gram position vs the md5 hex60 it replaced);
    // every stage is an equi-join/groupBy on (doc, long) — no all-pairs
    // anywhere. Hash values never reach the output and the oracle keeps
    // raw gram strings, so a collision would FAIL the compare
    "q_text_dupspans" -> ((s: SparkSession, d: String) => {
      import org.apache.spark.sql.expressions.Window
      val grams = scan(s, d, "documents")
        .select(col("doc_id"),
          posexplode(CorpusOps.wordNgrams(CorpusOps.words(col("text")), 5)).as(Seq("pos", "gs")))
        .select(col("doc_id"), col("pos").cast("long").as("pos"),
          xxhash64(col("gs")).as("g"))
        .scopedPersist()
      val dupGrams = grams.groupBy(col("g"))
        .agg(countDistinct(col("doc_id")).as("df"))
        .filter(col("df") >= 2).select(col("g"))
      val dup = grams.join(dupGrams, Seq("g"), "left_semi")
      val isl = dup.withColumn("grp",
        col("pos") - row_number().over(Window.partitionBy(col("doc_id")).orderBy(col("pos"))))
      val spans = isl.groupBy(col("doc_id"), col("grp"))
        .agg((count(lit(1)) + lit(4)).as("span_toks"))
      val tot = grams.groupBy(col("doc_id")).agg(count(lit(1)).as("n_grams"))
      spans.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_spans"), max(col("span_toks")).as("max_span_toks"),
          sum(col("span_toks") - lit(4)).as("dup_grams"))
        .join(tot, Seq("doc_id"))
        .withColumn("dup_frac", col("dup_grams").cast("double") / col("n_grams").cast("double"))
        .orderBy(col("doc_id"))
    }),

    // EXACT-SUBSTRING dedup via DISTRIBUTED SUFFIX-ARRAY PREFIX
    // DOUBLING (Lee et al. 2022's ExactSubstr, the component
    // q_text_dupspans approximates with 5-gram runs): Manber–Myers
    // doubling assigns every token position an exact equality class for
    // its 2^j-window in log2(16) = 4 long-keyed sort/join rounds — the
    // shuffle carries two BIGINT class ids per position, never window
    // text. Duplicated-window starts, exact union coverage (the span
    // ExactSubstr removes), and the largest duplicated power-of-two
    // window per doc. Oracle = brute-force gram census at each level
    // over RAW strings, so a class-id bug hash-mismatches loudly.
    "q_text_suffix_dedup" -> ((s: SparkSession, d: String) =>
      CorpusOps.suffixDupStats(scan(s, d, "documents"), "doc_id", "text")
        .orderBy(col("doc_id"))),

    // removal twin: the ExactSubstr CLEANED CORPUS — every duplicated
    // 16-window keeps its canonical occurrence (the class
    // representative, min packed position — canonicality is free, the
    // class id IS the witness) and every other occurrence's covered
    // tokens are cut. Oracle recomputes the same keep/cut mask from the
    // raw level-16 gram census and reassembles the text.
    "q_text_suffix_rm" -> ((s: SparkSession, d: String) =>
      CorpusOps.suffixRemove(scan(s, d, "documents"), "doc_id", "text")
        .orderBy(col("doc_id"))),

    // ENCODE -> DECODE round-trip through the full BPE machinery. The
    // oracle is deliberately INDEPENDENT of BPE: it just concatenates
    // each doc's eligible words — so a bug anywhere in train, encode,
    // the merge table, or decode hash-mismatches instead of mirroring
    "q_bpe_roundtrip" -> ((s: SparkSession, d: String) => {
      val docs = scan(s, d, "documents")
      val merges = deepMerges(s, d)
      val enc = CorpusOps.bpeEncode(docs, "doc_id", "text", merges)
      docs.select(col("doc_id"))
        .join(enc, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(CorpusOps.bpeDecodeText(col("token_ids"), merges), lit(""))
            .as("decoded"))
        .orderBy(col("doc_id"))
    }),

    // Exact-substring dedup with REMOVAL semantics (Lee et al. 2022's
    // ExactSubstr, on the repo's 5-gram-run approximation): q_text_dupspans
    // FINDS the duplicated runs; this produces the cleaned corpus — one
    // canonical occurrence (min doc_id) survives, every other doc cuts
    // the covered tokens. See CorpusOps.removeDupSpans for the shape.
    "q_text_dupspans_rm" -> ((s: SparkSession, d: String) =>
      CorpusOps.removeDupSpans(scan(s, d, "documents"), "doc_id", "text", n = 5)
        .orderBy(col("doc_id"))),

    // T5-style span-corruption manifest (denoising pretrain inputs):
    // ~15% of tokens masked in merged spans, <extra_id_k> sentinels in
    // the corrupted input, masked spans as the target. Sampling is a
    // pure integer formula of (doc_id, position) so the oracle replays
    // it bit-for-bit — see CorpusOps.spanCorrupt
    "q_mask_spans" -> ((s: SparkSession, d: String) =>
      CorpusOps.spanCorrupt(scan(s, d, "documents"), "doc_id", "text")
        .orderBy(col("doc_id"))),

    // GPT-style CONCAT-AND-CHOP packing manifest: docs are concatenated
    // in deterministic order and chopped into fixed token windows; each
    // doc reports the bin and in-bin offset where it STARTS (docs may
    // span bins — that is the semantic). Packing is per-source so the
    // cumulative sum never needs a global total order: at 100 TB each
    // shard/source packs independently — one window pass, no global sort
    "q_pack_budget" -> ((s: SparkSession, d: String) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      scan(s, d, "documents")
        .select(col("doc_id"), col("source"),
          TextAnalysis.tokenCountWs(col("text")).cast("long").as("toks"))
        .withColumn("__cum", sum(col("toks")).over(w))
        .withColumn("bin", floor((col("__cum") - col("toks")) / lit(2048)).cast("long"))
        .withColumn("bin_offset", ((col("__cum") - col("toks")) % lit(2048)).cast("long"))
        .select(col("doc_id"), col("source"), col("toks"), col("bin"), col("bin_offset"))
        .orderBy(col("doc_id"))
    }),

    // BPE-style MERGE MINING — the first step of tokenizer training:
    // count every adjacent symbol pair across the corpus and rank the
    // merge candidates (the top pair is what a BPE trainer would merge
    // first). One explode → one groupBy; `cnt` partial-aggregates
    // map-side, while `n_docs` (countDistinct) costs a two-phase
    // distinct expansion on (pair, doc_id) — the per-pair doc breadth is
    // worth that second round. Rank order is total (count desc, pair
    // asc) so the result is exact
    "q_bpe_pairs" -> ((s: SparkSession, d: String) => {
      // (r18 audit: an explicit two-level groupBy reshape was tried and
      // reverted — the planner ALREADY rewrites the single countDistinct
      // as a (pair, doc_id) partial aggregate with no Expand; the plans
      // were node-for-node identical and the A/B flat)
      scan(s, d, "documents")
        .select(col("doc_id"),
          explode(CorpusOps.wordNgrams(CorpusOps.words(col("text")), 2)).as("pair"))
        .groupBy(col("pair"))
        .agg(count(lit(1)).as("cnt"), countDistinct(col("doc_id")).as("n_docs"))
        .orderBy(col("cnt").desc, col("pair"))
        .limit(30)
    }),

    // BPE TOKENIZER TRAINING — 3 greedy merge rounds over the word
    // vocabulary (q_bpe_pairs iterated: census → argmax → in-row greedy
    // merge via one delimited-string replacement → repeat). Everything
    // after the word census is vocabulary-sized; each round's argmax is
    // a 1-row collect — the merges ARE the trained model. See
    // CorpusOps.bpeTrain for why left-to-right replace-all is exactly
    // greedy BPE on both engines
    "q_bpe_merge" -> ((s: SparkSession, d: String) =>
      CorpusOps.bpeTrain(scan(s, d, "documents"), "text", rounds = 3)),

    // DEEP BPE TRAINING — the production-depth run of the q_bpe_merge
    // loop: 50 greedy merge rounds (a real tokenizer runs thousands;
    // see DeepRounds). Per-round lazy localCheckpoint keeps every
    // round's census O(vocab) instead of O(round · vocab) — without it
    // the train is quadratic in depth. ALWAYS retrains (never reads the
    // memo): this is the training query, and its bench/scale numbers
    // must carry the full loop cost — but it WRITES the memo, so the
    // consumers (encode/fertility/roundtrip) never cold-train when it
    // runs first (Bench runs trainers ahead of the registry)
    "q_bpe_train_deep" -> ((s: SparkSession, d: String) => {
      import s.implicits._
      val trained = CorpusOps.bpeTrain(scan(s, d, "documents"), "text", DeepRounds)
        .orderBy(col("step")).collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
      trainCache.put((d, DeepRounds), trained)
      trained.toDF("step", "sym_left", "sym_right", "freq").orderBy(col("step"))
    }),

    // BPE ENCODE — the ship step of the tokenizer loop: apply the deep
    // 50-merge model (same deterministic loop as q_bpe_train_deep; the
    // merge table is driver-side model metadata by construction) to every
    // token instance. The merge chain runs once per DISTINCT word
    // (vocabulary-sized, codegen'd nested replaces); instances get their
    // id arrays via a broadcast join back to the (doc, rank, word) stream
    "q_bpe_encode" -> ((s: SparkSession, d: String) => {
      val docs = scan(s, d, "documents")
      val merges = deepMerges(s, d)
      CorpusOps.bpeEncode(docs, "doc_id", "text", merges)
        .select(col("doc_id"),
          size(col("token_ids")).cast("long").as("n_tokens"),
          array_join(transform(col("token_ids"), _.cast("string")), ",").as("ids_csv"))
        .orderBy(col("doc_id"))
    }),

    // TOKENIZER FERTILITY census (chars per token, by language) — the
    // dial every multilingual tokenizer ships with: a BPE trained on
    // this corpus compresses languages unevenly, and fertility is how
    // you see it. Reuses the trained deep model; per-doc char mass
    // comes from a shuffle-free HOF fold over the SAME eligible-word
    // stream ENCODE consumes (cheap length() in the lambda — nothing
    // hash-heavy, the q_mix_dsir lesson); floor-ppm ratio is integer
    "q_bpe_fertility" -> ((s: SparkSession, d: String) => {
      val docs = scan(s, d, "documents")
      val merges = deepMerges(s, d)
      val enc = CorpusOps.bpeEncode(docs, "doc_id", "text", merges)
        .select(col("doc_id"), size(col("token_ids")).cast("long").as("n_tokens"))
      val chars = docs.select(col("doc_id"), col("lang"),
        aggregate(
          filter(CorpusOps.words(lower(col("text"))), w => w.rlike("^[a-z]+$")),
          lit(0L), (acc, w) => acc + length(w).cast("long")).as("n_chars_bpe"))
      chars.join(enc, Seq("doc_id"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("n_tokens"),
          sum(col("n_chars_bpe")).as("n_chars"))
        .withColumn("chars_per_token_ppm", expr("n_chars * 1000000 div n_tokens"))
        .orderBy(col("lang"))
    }),

    // VOCAB-PRUNING ABLATION — the tokenizer-budget question every
    // deployment asks: what does HALVING the merge table cost in
    // tokens? Both encodings (full 50-merge model vs the first 25
    // merges — BPE merge lists are rank-prefixed, so a prefix IS the
    // smaller model) run over the same distinct vocabulary, then per
    // language: token mass under each and the bloat ratio. The model
    // stays driver-side metadata; the chains are codegen'd per
    // DISTINCT word exactly like q_bpe_encode
    "q_bpe_prune" -> ((s: SparkSession, d: String) => {
      val docs = scan(s, d, "documents")
      val full = deepMerges(s, d)
      val encF = CorpusOps.bpeEncode(docs, "doc_id", "text", full)
        .select(col("doc_id"), size(col("token_ids")).cast("long").as("ntf"))
      val encP = CorpusOps.bpeEncode(docs, "doc_id", "text",
          full.take(DeepRounds / 2))
        .select(col("doc_id"), size(col("token_ids")).cast("long").as("ntp"))
      docs.select(col("doc_id"), col("lang"))
        .join(encF, Seq("doc_id")).join(encP, Seq("doc_id"))
        .groupBy(col("lang"))
        .agg(sum(col("ntf")).as("n_tokens_full"),
          sum(col("ntp")).as("n_tokens_pruned"))
        .withColumn("bloat_ppm",
          expr("n_tokens_pruned * 1000000 div n_tokens_full"))
        .orderBy(col("lang"))
    }),

    // Corpus-frequency BOILERPLATE filter signal: 3-grams present in >= 3
    // distinct docs are boilerplate; per doc, the fraction of gram
    // positions covered by them + the keep verdict. The within-corpus
    // twin of decontaminate (whose reference set is external)
    "q_text_boilerplate" -> ((s: SparkSession, d: String) => {
      CorpusOps.boilerplateStats(scan(s, d, "documents"), "doc_id", "text",
          n = 3, minDocFreq = 3)
        .withColumn("keep", col("boiler_frac") < 0.5)
        .orderBy(col("doc_id"))
    }),

    // PII scrub: emails/phones synthesized from customer fields (the corpus
    // tables contain none), then redacted + counted — the regex-scrub
    // semantics are what's under test.
    "q_text_pii" -> ((s: SparkSession, d: String) => {
      val c = scan(s, d, "customer")
      val msg = concat(col("c_name"), lit(" <"), lower(col("c_name")),
        lit("@mail.example.com> tel:555-"), col("c_custkey").cast("string"))
      c.select(col("c_custkey"),
          CorpusOps.piiRedact(msg).as("redacted"),
          CorpusOps.piiEmailCount(msg).as("n_emails"),
          CorpusOps.piiPhoneCount(msg).as("n_phones"))
        .orderBy(col("c_custkey"))
    })
  )

  private val stopList = TextAnalysis.defaultStopwords.map(w => s"'$w'").mkString("[", ",", "]")

  /** The q_corpus_funnel pipeline (see the registry comment). Factored
    * out so FunnelPlanSpec can plan-assert the single-pass claims. */
  def corpusFunnel(s: SparkSession, d: String): DataFrame = {
    val raw = scan(s, d, "documents").select(col("doc_id"), col("lang"), col("text"))
    // stage 1: quality gate (the q_corpus_clean rule)
    val quality = raw
      .withColumn("n_words", TextAnalysis.tokenCountWs(col("text")))
      .withColumn("stop_ratio",
        TextAnalysis.stopwordRatio(col("text"), TextAnalysis.defaultStopwords))
      .filter(col("n_words") >= 20 && col("stop_ratio") > 0.0)
      .select(col("doc_id"), col("lang"), col("text"))
      .scopedPersist()
    // stage 2: langid confirmation — the predicted label must agree with
    // the recorded one (mislabeled or mixed-language docs drop here)
    val langKept = quality
      .filter(TextAnalysis.langId(col("text")) === col("lang"))
      .scopedPersist()
    // stage 3: Gopher gate; the flag relation persists once and feeds
    // BOTH the keep filter and the drop attribution census
    val gflags = CorpusOps.gopherFilter(langKept, "doc_id", "text").scopedPersist()
    val gopherKept = langKept
      .join(gflags.filter(col("keep") === 1).select("doc_id"), Seq("doc_id"), "left_semi")
      .scopedPersist()
    // stage 4: exact dedup (min-id survivor per normalized fingerprint)
    val fp = gopherKept.withColumn("fp", TextAnalysis.fingerprint(col("text")))
      .scopedPersist()
    val exactKept = fp
      .join(fp.groupBy(col("fp")).agg(min(col("doc_id")).as("doc_id")).select("doc_id"),
        Seq("doc_id"), "left_semi")
      .scopedPersist()
    // stage 5: near-dup removal (minhash banding → exact-Jaccard verify →
    // CC → keep each cluster's canonical min id). The shingle tier lives
    // inside minhashDedup and runs exactly once.
    val pairs = Dedup.minhashDedup(exactKept.select("doc_id", "text"),
      "doc_id", "text", threshold = 0.5)
    val dropNear = Dedup.connectedComponents(pairs)
      .filter(col("doc_id") =!= col("cluster")).select("doc_id")
    val finalKept = exactKept.join(dropNear, Seq("doc_id"), "left_anti")
      .scopedPersist()
    val counts = raw.agg(count(lit(1)).as("n_raw"))
      .crossJoin(quality.agg(count(lit(1)).as("n_quality")))
      .crossJoin(langKept.agg(count(lit(1)).as("n_lang")))
      .crossJoin(gflags.agg(sum(col("keep")).as("n_gopher"),
        sum(col("bad_wc")).as("d_wc"), sum(col("bad_mwl")).as("d_mwl"),
        sum(col("bad_ttr")).as("d_ttr"), sum(col("bad_dbf")).as("d_dbf"),
        sum(col("bad_twf")).as("d_twf")))
      .crossJoin(exactKept.agg(count(lit(1)).as("n_exact")))
      .crossJoin(finalKept.agg(count(lit(1)).as("n_final")))
    val staged = counts.selectExpr(
      """stack(16,
        |  0, 'raw',     'n_docs',    n_raw,
        |  1, 'quality', 'n_kept',    n_quality,
        |  1, 'quality', 'n_dropped', n_raw - n_quality,
        |  2, 'langid',  'n_kept',    n_lang,
        |  2, 'langid',  'n_dropped', n_quality - n_lang,
        |  3, 'gopher',  'n_kept',    n_gopher,
        |  3, 'gopher',  'n_dropped', n_lang - n_gopher,
        |  3, 'gopher',  'drop_wc',   d_wc,
        |  3, 'gopher',  'drop_mwl',  d_mwl,
        |  3, 'gopher',  'drop_ttr',  d_ttr,
        |  3, 'gopher',  'drop_dbf',  d_dbf,
        |  3, 'gopher',  'drop_twf',  d_twf,
        |  4, 'exact',   'n_kept',    n_exact,
        |  4, 'exact',   'n_dropped', n_gopher - n_exact,
        |  5, 'neardup', 'n_kept',    n_final,
        |  5, 'neardup', 'n_dropped', n_exact - n_final
        |) AS (stage_ord, stage, metric, value)""".stripMargin)
    // stage 6: surviving mixture weights per language (floor ppm)
    val mixRows = finalKept.groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(finalKept.agg(count(lit(1)).as("nt"))))
      .select(lit(6).as("stage_ord"), lit("mix").as("stage"),
        concat(lit("w_"), col("lang"), lit("_ppm")).as("metric"),
        expr("n * 1000000 div nt").as("value"))
    staged.select(col("stage_ord"), col("stage"), col("metric"),
        col("value").cast("long").as("value"))
      .unionByName(mixRows)
      .orderBy(col("stage_ord"), col("metric"))
  }

  /** Shared BPE-training replay for the q_bpe_merge / q_bpe_encode
    * oracles: v0 = U+0001-delimited word census; each round r censuses
    * adjacent symbol pairs, picks the argmax (CTE m$r), and replays the
    * greedy merge (v$r). U+0001 can never collide with /[a-z]+/ words. */
  private val BpeSep = "\u0001"

  /** Shared ENCODE-side CTEs: the eligible word stream (wl/tk/tok), the
    * distinct vocabulary (vw), and the per-word merged symbol list
    * (encw) - used by the q_bpe_encode and q_bpe_fertility oracles.
    */
  /** ENCODE-side CTEs for an `nMerges`-round model: the eligible word
    * stream (wl/tk/tok), the distinct vocabulary (vw), and the per-word
    * merged symbol list (encw) — the merge chain is `nMerges` nested
    * replace() calls in rank order (innermost = rank 1, the same
    * left-to-right greedy scan the engine codegens). Used by the
    * q_bpe_encode and q_bpe_fertility oracles.
    */
  /** The rank-ordered nested-replace merge chain over a word `w` for an
    * `nMerges`-round model — shared by the single-model encode CTEs and
    * the two-model pruning oracle.
    */
  private def bpeChainSql(nMerges: Int): String = {
    val S = BpeSep
    (1 to nMerges).foldLeft(s"regexp_replace(w, '(.)', '$S\\1$S', 'g')") {
      (acc, r) =>
        s"replace($acc, '$S' || m$r.p1 || '$S$S' || m$r.p2 || '$S', '$S' || m$r.p1 || m$r.p2 || '$S')"
    }
  }

  private def bpeEncWordCtes(nMerges: Int): String = {
    val S = BpeSep
    val chain = bpeChainSql(nMerges)
    val tcols = (1 to nMerges).map(r => s"m$r.p1 || m$r.p2 AS t$r").mkString(",\n       ")
    val froms = ("vw" +: (1 to nMerges).map(r => s"m$r")).mkString(", ")
    s"""wl AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS ws FROM documents),
       |tk AS (SELECT doc_id, unnest(range(1, len(ws) + 1)) AS pos, ws FROM wl),
       |tok AS (SELECT doc_id, pos, ws[pos] AS w FROM tk WHERE regexp_full_match(ws[pos], '[a-z]+')),
       |vw AS (SELECT DISTINCT w FROM tok),
       |encw AS (SELECT w,
       |    string_split(trim($chain,
       |      '$S'), '$S$S') AS syms,
       |    $tcols
       |  FROM $froms)""".stripMargin
  }

  /** The symbol-text -> token-id CASE chain over `encw.syms` elements —
    * FIRST-wins in rank order, mirroring bpeEncodeIds' reverse.toMap.
    */
  private def bpeIdCaseSql(nMerges: Int): String =
    s"CASE ${(1 to nMerges).map(r => s"WHEN y = t$r THEN ${26 + r}").mkString(" ")} " +
      "ELSE ascii(y) - 96 END"

  /** `rounds` training rounds as CTEs. Every v$r / pc$r / m$r is
    * MATERIALIZED: v(r-1) is referenced twice per round (census + the
    * merge replay) and pc$r twice (argmax + emptiness sentinel), so an
    * inlined chain re-evaluates 2^rounds times — fine at 3 rounds,
    * fatal at 50 (the k-core oracle's lesson, applied to the deep
    * trainer).
    */
  private def bpeTrainCtes(rounds: Int): String = {
    val SEP = BpeSep
    val base =
      s"""v0 AS MATERIALIZED (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS c,
         |    regexp_replace(w, '(.)', '$SEP\\1$SEP', 'g') AS s
         |  FROM (SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS w FROM documents)
         |  WHERE regexp_full_match(w, '[a-z]+')
         |  GROUP BY w)""".stripMargin
    def round(r: Int) =
      s"""sy$r AS (SELECT c, string_split(trim(s, '$SEP'), '$SEP$SEP') AS a FROM v${r - 1}),
         |px$r AS (SELECT c, a, unnest(range(1, len(a))) AS i FROM sy$r WHERE len(a) >= 2),
         |pc$r AS MATERIALIZED (SELECT a[i] AS p1, a[i+1] AS p2, CAST(SUM(c) AS BIGINT) AS cnt
         |         FROM px$r GROUP BY 1, 2),
         |m$r AS MATERIALIZED ((SELECT p1, p2, cnt FROM pc$r ORDER BY cnt DESC, p1, p2 LIMIT 1)
         |        UNION ALL
         |        (SELECT '', '', CAST(0 AS BIGINT)
         |         WHERE (SELECT count(*) FROM pc$r) = 0)),
         |v$r AS MATERIALIZED (SELECT c, replace(s, '$SEP' || m.p1 || '$SEP$SEP' || m.p2 || '$SEP',
         |                          '$SEP' || m.p1 || m.p2 || '$SEP') AS s
         |        FROM v${r - 1}, m$r m)""".stripMargin
    (base +: (1 to rounds).map(round)).mkString(",\n")
  }

  /** The deep model's depth — a production tokenizer runs thousands of
    * rounds; 50 is enough to exercise the iterated shape (lineage
    * truncation, materialized oracle rounds, rank-ordered replay) well
    * past where the 3-round demo could hide an O(rounds²) defect.
    */
  val DeepRounds = 50

  /** Memoized deep-train replay per (dir, rounds): the merge table is
    * driver-side MODEL METADATA (a few KB), and encode / fertility /
    * roundtrip / train_deep all consume the same trained model — exactly
    * like a real pipeline training once and shipping the tokenizer. The
    * first q_bpe_* query in a run pays the training (the same
    * first-query-pays convention as the dedup family's persisted
    * pipelines); reruns against another dir (ScaleCurve's two sides)
    * train their own.
    */
  private val trainCache =
    scala.collection.concurrent.TrieMap.empty[(String, Int), Seq[(Int, String, String, Long)]]
  private def deepTrain(s: SparkSession, d: String): Seq[(Int, String, String, Long)] =
    trainCache.getOrElseUpdate((d, DeepRounds),
      CorpusOps.bpeTrain(scan(s, d, "documents"), "text", DeepRounds)
        .orderBy(col("step")).collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq)
  private def deepMerges(s: SparkSession, d: String): Seq[(String, String)] =
    deepTrain(s, d).map(t => (t._2, t._3))

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
    },

    // the funnel replayed as staged CTEs — each stage MATERIALIZED so
    // the census and the next stage both read one evaluation (the
    // inlined-CTE blowup lesson); langid/gopher/minhash spellings are
    // the same generators/SQL the standalone stage oracles use
    "q_corpus_funnel" -> {
      val markers = TextAnalysis.defaultMarkers
      val scoreExprs = markers.map { case (lang, ws) =>
        val list = ws.map(w => s"'$w'").mkString("[", ",", "]")
        raw"""len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
             |      w -> list_contains($list, w))) AS score_$lang""".stripMargin
      }.mkString(",\n    ")
      val maxExpr = markers.map { case (l, _) => s"score_$l" }
        .mkString("greatest(", ", ", ")")
      val caseExpr = markers.map { case (l, _) =>
        s"WHEN score_$l = __mx AND __mx > 0 THEN '$l'"
      }.mkString("CASE ", " ", " ELSE 'und' END")
      val minhash = DedupQueries.minhashCtesOver("survivors_text")
      raw"""WITH RECURSIVE qual AS (
           |  SELECT doc_id, lang, text,
           |    CASE WHEN length(trim(text)) = 0 THEN 0
           |         ELSE len(string_split_regex(trim(text), '\s+')) END AS n_words,
           |    len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
           |        w -> list_contains($stopList, w))) AS n_stop
           |  FROM documents),
           |quality AS MATERIALIZED (
           |  SELECT doc_id, lang, text FROM qual
           |  WHERE n_words >= 20
           |    AND CAST(n_stop AS DOUBLE) / greatest(CAST(n_words AS DOUBLE), 1.0) > 0.0),
           |lsc AS (SELECT doc_id, lang, text,
           |    $scoreExprs
           |  FROM quality),
           |lm AS (SELECT *, $maxExpr AS __mx FROM lsc),
           |langkept AS MATERIALIZED (
           |  SELECT doc_id, lang, text FROM lm WHERE ($caseExpr) = lang),
           |gw AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws FROM langkept),
           |gwx AS (SELECT doc_id, unnest(ws) AS wd FROM gw),
           |gwc AS (SELECT doc_id, wd, count(*) AS c FROM gwx GROUP BY doc_id, wd),
           |gwstats AS (SELECT doc_id, CAST(max(c) AS BIGINT) AS top_cnt,
           |              CAST(sum(c) AS BIGINT) AS total_words,
           |              CAST(count(*) AS BIGINT) AS distinct_words
           |            FROM gwc GROUP BY doc_id),
           |gmw AS (SELECT doc_id,
           |          CAST(list_sum(list_transform(ws, x -> len(x))) AS DOUBLE)
           |            / CAST(len(ws) AS DOUBLE) AS mwl FROM gw),
           |gbgx AS (SELECT doc_id,
           |           unnest(list_transform(range(1, len(ws)),
           |                  i -> array_to_string(list_slice(ws, i, i + 1), ' '))) AS g
           |         FROM gw),
           |gbgc AS (SELECT doc_id, g, count(*) AS c FROM gbgx GROUP BY doc_id, g),
           |gbstats AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS total_bigrams,
           |              CAST(count(*) AS BIGINT) AS distinct_bigrams
           |            FROM gbgc GROUP BY doc_id),
           |gkeep AS MATERIALIZED (
           |  SELECT gw.doc_id,
           |    CASE WHEN s.total_words BETWEEN 30 AND 90 THEN 0 ELSE 1 END AS bad_wc,
           |    CASE WHEN m.mwl BETWEEN 3.9 AND 5.0 THEN 0 ELSE 1 END AS bad_mwl,
           |    CASE WHEN CAST(s.distinct_words AS DOUBLE) / CAST(s.total_words AS DOUBLE) >= 0.35
           |         THEN 0 ELSE 1 END AS bad_ttr,
           |    CASE WHEN 1.0 - CAST(b.distinct_bigrams AS DOUBLE) / CAST(b.total_bigrams AS DOUBLE) <= 0.08
           |         THEN 0 ELSE 1 END AS bad_dbf,
           |    CASE WHEN CAST(s.top_cnt AS DOUBLE) / CAST(s.total_words AS DOUBLE) <= 0.12
           |         THEN 0 ELSE 1 END AS bad_twf
           |  FROM gw JOIN gwstats s USING (doc_id) JOIN gmw m USING (doc_id)
           |         JOIN gbstats b USING (doc_id)),
           |gk AS (SELECT *, CASE WHEN bad_wc + bad_mwl + bad_ttr + bad_dbf + bad_twf = 0
           |                      THEN 1 ELSE 0 END AS keep FROM gkeep),
           |gopherkept AS MATERIALIZED (
           |  SELECT l.doc_id, l.lang, l.text FROM langkept l
           |  JOIN gk g ON g.doc_id = l.doc_id AND g.keep = 1),
           |fpt AS (SELECT *, md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fpv
           |        FROM gopherkept),
           |exactkept AS MATERIALIZED (
           |  SELECT f.* FROM fpt f
           |  JOIN (SELECT fpv, MIN(doc_id) AS doc_id FROM fpt GROUP BY fpv) k
           |    ON f.doc_id = k.doc_id),
           |survivors_text AS (SELECT doc_id, text FROM exactkept),
           |$minhash,
           |edges AS (
           |  SELECT doc_a AS a, doc_b AS b FROM pairsq
           |  UNION SELECT doc_b, doc_a FROM pairsq),
           |reach(src, dst) AS (
           |  SELECT a, b FROM edges
           |  UNION
           |  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
           |cl AS (SELECT src AS doc_id, least(src, min(dst)) AS cluster
           |       FROM reach GROUP BY src),
           |near_dups AS (SELECT doc_id FROM cl WHERE doc_id <> cluster),
           |finalkept AS MATERIALIZED (
           |  SELECT e.doc_id, e.lang FROM exactkept e
           |  WHERE NOT EXISTS (SELECT 1 FROM near_dups n WHERE n.doc_id = e.doc_id)),
           |c_raw AS (SELECT CAST(count(*) AS BIGINT) AS v FROM documents),
           |c_q AS (SELECT CAST(count(*) AS BIGINT) AS v FROM quality),
           |c_l AS (SELECT CAST(count(*) AS BIGINT) AS v FROM langkept),
           |c_g AS (SELECT CAST(COALESCE(sum(keep), 0) AS BIGINT) AS v,
           |          CAST(COALESCE(sum(bad_wc), 0) AS BIGINT) AS d_wc,
           |          CAST(COALESCE(sum(bad_mwl), 0) AS BIGINT) AS d_mwl,
           |          CAST(COALESCE(sum(bad_ttr), 0) AS BIGINT) AS d_ttr,
           |          CAST(COALESCE(sum(bad_dbf), 0) AS BIGINT) AS d_dbf,
           |          CAST(COALESCE(sum(bad_twf), 0) AS BIGINT) AS d_twf
           |        FROM gk),
           |c_e AS (SELECT CAST(count(*) AS BIGINT) AS v FROM exactkept),
           |c_f AS (SELECT CAST(count(*) AS BIGINT) AS v FROM finalkept),
           |rows_ AS (
           |  SELECT 0 AS stage_ord, 'raw' AS stage, 'n_docs' AS metric,
           |         (SELECT v FROM c_raw) AS value
           |  UNION ALL SELECT 1, 'quality', 'n_kept', (SELECT v FROM c_q)
           |  UNION ALL SELECT 1, 'quality', 'n_dropped',
           |    (SELECT v FROM c_raw) - (SELECT v FROM c_q)
           |  UNION ALL SELECT 2, 'langid', 'n_kept', (SELECT v FROM c_l)
           |  UNION ALL SELECT 2, 'langid', 'n_dropped',
           |    (SELECT v FROM c_q) - (SELECT v FROM c_l)
           |  UNION ALL SELECT 3, 'gopher', 'n_kept', (SELECT v FROM c_g)
           |  UNION ALL SELECT 3, 'gopher', 'n_dropped',
           |    (SELECT v FROM c_l) - (SELECT v FROM c_g)
           |  UNION ALL SELECT 3, 'gopher', 'drop_wc', (SELECT d_wc FROM c_g)
           |  UNION ALL SELECT 3, 'gopher', 'drop_mwl', (SELECT d_mwl FROM c_g)
           |  UNION ALL SELECT 3, 'gopher', 'drop_ttr', (SELECT d_ttr FROM c_g)
           |  UNION ALL SELECT 3, 'gopher', 'drop_dbf', (SELECT d_dbf FROM c_g)
           |  UNION ALL SELECT 3, 'gopher', 'drop_twf', (SELECT d_twf FROM c_g)
           |  UNION ALL SELECT 4, 'exact', 'n_kept', (SELECT v FROM c_e)
           |  UNION ALL SELECT 4, 'exact', 'n_dropped',
           |    (SELECT v FROM c_g) - (SELECT v FROM c_e)
           |  UNION ALL SELECT 5, 'neardup', 'n_kept', (SELECT v FROM c_f)
           |  UNION ALL SELECT 5, 'neardup', 'n_dropped',
           |    (SELECT v FROM c_e) - (SELECT v FROM c_f)
           |  UNION ALL
           |  SELECT 6, 'mix', 'w_' || lang || '_ppm', n * 1000000 // nt
           |  FROM (SELECT lang, CAST(count(*) AS BIGINT) AS n
           |        FROM finalkept GROUP BY lang) x
           |       CROSS JOIN (SELECT v AS nt FROM c_f) t)
           |SELECT CAST(stage_ord AS INT) AS stage_ord, stage, metric,
           |  CAST(value AS BIGINT) AS value
           |FROM rows_ ORDER BY stage_ord, metric""".stripMargin
    },

    // oracle joins on RAW gram strings while the engine joins on
    // xxhash64 ids — intentionally NOT mirrored: a hash collision that
    // altered any overlap count would show up here as a mismatch
    "q_decontaminate" ->
      raw"""WITH w AS (SELECT doc_id, source, string_split_regex(trim(text), '\s+') AS ws FROM documents),
           |ng AS (SELECT doc_id, source,
           |         unnest(list_transform(range(1, len(ws) - 2),
           |                i -> array_to_string(list_slice(ws, i, i + 3), ' '))) AS g
           |       FROM w),
           |bench AS (SELECT DISTINCT g FROM ng WHERE source = 'src0'),
           |train AS (SELECT DISTINCT doc_id, g FROM ng WHERE source <> 'src0')
           |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_overlap
           |FROM train JOIN bench USING (g)
           |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // replant via chr() codepoints; nfc_normalize is DuckDB's NFC
    "q_text_nfc" ->
      """WITH t AS (SELECT source,
        |    text || CASE WHEN doc_id % 9 = 2 THEN 'e' || chr(769) ELSE '' END
        |         || CASE WHEN doc_id % 9 = 4 THEN chr(197) ELSE '' END
        |         || CASE WHEN doc_id % 9 = 6 THEN 'A' || chr(778) ELSE '' END
        |      AS txt
        |  FROM documents)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(COALESCE(SUM(CASE WHEN nfc_normalize(txt) != txt
        |    THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_not_nfc,
        |  CAST(COALESCE(SUM(length(txt) - length(nfc_normalize(txt))), 0)
        |    AS BIGINT) AS n_units_saved
        |FROM t GROUP BY source ORDER BY source""".stripMargin,

    // the full-sort twin: window rank per epoch over the same keyed
    // hash, sliced to the midpoint batch by the same integer formulas
    "q_shuffle_resume" -> {
      val hv = DedupQueries.sqlHex60Public(
        "md5('ep' || epoch || ':' || CAST(doc_id AS VARCHAR))")
      s"""WITH pe AS (SELECT CAST(epoch AS BIGINT) AS epoch, doc_id, $hv AS h
         |            FROM documents CROSS JOIN (SELECT unnest([0, 1]) AS epoch) e),
         |n AS (SELECT epoch, CAST(count(*) AS BIGINT) AS n FROM pe GROUP BY epoch),
         |r AS (SELECT pe.*, row_number() OVER (PARTITION BY epoch
         |        ORDER BY h, doc_id) AS rn FROM pe),
         |k AS (SELECT epoch, (n // 128) * 64 + 1 AS klo,
         |        LEAST((n // 128) * 64 + 64, n) AS khi FROM n)
         |SELECT r.epoch, CAST(rn - klo + 1 AS BIGINT) AS pos, doc_id, h
         |FROM r JOIN k ON r.epoch = k.epoch
         |WHERE rn BETWEEN klo AND khi
         |ORDER BY r.epoch, pos""".stripMargin
    },

    // identical replant via chr() codepoints; detection flags are the
    // same RE2 classes Spark's rlike evaluates
    "q_text_mojibake" ->
      raw"""WITH t AS (SELECT source,
           |    text || CASE WHEN doc_id % 11 = 3 THEN chr(195) || chr(169) ELSE '' END
           |         || CASE WHEN doc_id % 13 = 5 THEN chr(65533) ELSE '' END
           |         || CASE WHEN doc_id % 17 = 7 THEN chr(7) ELSE '' END
           |         || CASE WHEN doc_id % 19 = 9 THEN chr(8203) || chr(160) ELSE '' END
           |      AS txt
           |  FROM documents),
           |f AS (SELECT source,
           |    regexp_matches(txt, '\x{C3}[\x{80}-\x{BF}]') AS moji,
           |    regexp_matches(txt, '\x{FFFD}') AS repl,
           |    regexp_matches(txt, '[\x{00}-\x{08}\x{0B}\x{0C}\x{0E}-\x{1F}]') AS ctrl,
           |    regexp_matches(txt, '[\x{200B}-\x{200D}\x{FEFF}]') AS zw,
           |    regexp_matches(txt, '\x{A0}') AS nbsp
           |  FROM t)
           |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(COALESCE(SUM(CASE WHEN moji THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_mojibake,
           |  CAST(COALESCE(SUM(CASE WHEN repl THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_replacement,
           |  CAST(COALESCE(SUM(CASE WHEN ctrl THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_control,
           |  CAST(COALESCE(SUM(CASE WHEN zw THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_zerowidth,
           |  CAST(COALESCE(SUM(CASE WHEN nbsp THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_nbsp,
           |  CAST(COALESCE(SUM(CASE WHEN NOT moji AND NOT repl AND NOT ctrl
           |    AND NOT zw AND NOT nbsp THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_clean
           |FROM f GROUP BY source ORDER BY source""".stripMargin,

    "q_text_gopher" ->
      raw"""WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws FROM documents),
           |wx AS (SELECT doc_id, unnest(ws) AS wd FROM w),
           |wc AS (SELECT doc_id, wd, count(*) AS c FROM wx GROUP BY doc_id, wd),
           |wstats AS (SELECT doc_id, CAST(max(c) AS BIGINT) AS top_cnt,
           |             CAST(sum(c) AS BIGINT) AS total_words,
           |             CAST(count(*) AS BIGINT) AS distinct_words
           |           FROM wc GROUP BY doc_id),
           |bgx AS (SELECT doc_id,
           |          unnest(list_transform(range(1, len(ws)),
           |                 i -> array_to_string(list_slice(ws, i, i + 1), ' '))) AS g
           |        FROM w),
           |bgc AS (SELECT doc_id, g, count(*) AS c FROM bgx GROUP BY doc_id, g),
           |bstats AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS total_bigrams,
           |             CAST(count(*) AS BIGINT) AS distinct_bigrams
           |           FROM bgc GROUP BY doc_id)
           |SELECT doc_id,
           |  CAST(top_cnt AS DOUBLE) / CAST(total_words AS DOUBLE) AS top_word_frac,
           |  CAST(distinct_words AS DOUBLE) / CAST(total_words AS DOUBLE) AS type_token_ratio,
           |  1.0 - CAST(distinct_bigrams AS DOUBLE) / CAST(total_bigrams AS DOUBLE) AS dup_bigram_frac
           |FROM wstats JOIN bstats USING (doc_id) ORDER BY doc_id""".stripMargin,

    "q_text_gopher_filter" ->
      raw"""WITH w AS (SELECT doc_id, source, string_split_regex(trim(text), '\s+') AS ws FROM documents),
           |wx AS (SELECT doc_id, unnest(ws) AS wd FROM w),
           |wc AS (SELECT doc_id, wd, count(*) AS c FROM wx GROUP BY doc_id, wd),
           |wstats AS (SELECT doc_id, CAST(max(c) AS BIGINT) AS top_cnt,
           |             CAST(sum(c) AS BIGINT) AS total_words,
           |             CAST(count(*) AS BIGINT) AS distinct_words
           |           FROM wc GROUP BY doc_id),
           |mw AS (SELECT doc_id,
           |         CAST(list_sum(list_transform(ws, x -> len(x))) AS DOUBLE)
           |           / CAST(len(ws) AS DOUBLE) AS mwl FROM w),
           |bgx AS (SELECT doc_id,
           |          unnest(list_transform(range(1, len(ws)),
           |                 i -> array_to_string(list_slice(ws, i, i + 1), ' '))) AS g
           |        FROM w),
           |bgc AS (SELECT doc_id, g, count(*) AS c FROM bgx GROUP BY doc_id, g),
           |bstats AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS total_bigrams,
           |             CAST(count(*) AS BIGINT) AS distinct_bigrams
           |           FROM bgc GROUP BY doc_id),
           |flags AS (
           |  SELECT w.doc_id, w.source,
           |    CASE WHEN s.total_words BETWEEN 30 AND 90 THEN 0 ELSE 1 END AS bad_wc,
           |    CASE WHEN m.mwl BETWEEN 3.9 AND 5.0 THEN 0 ELSE 1 END AS bad_mwl,
           |    CASE WHEN CAST(s.distinct_words AS DOUBLE) / CAST(s.total_words AS DOUBLE) >= 0.35
           |         THEN 0 ELSE 1 END AS bad_ttr,
           |    CASE WHEN 1.0 - CAST(b.distinct_bigrams AS DOUBLE) / CAST(b.total_bigrams AS DOUBLE) <= 0.08
           |         THEN 0 ELSE 1 END AS bad_dbf,
           |    CASE WHEN CAST(s.top_cnt AS DOUBLE) / CAST(s.total_words AS DOUBLE) <= 0.12
           |         THEN 0 ELSE 1 END AS bad_twf
           |  FROM w JOIN wstats s USING (doc_id) JOIN mw m USING (doc_id)
           |         JOIN bstats b USING (doc_id)),
           |k AS (SELECT *, CASE WHEN bad_wc + bad_mwl + bad_ttr + bad_dbf + bad_twf = 0
           |                     THEN 1 ELSE 0 END AS keep FROM flags)
           |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(sum(keep) AS BIGINT) AS n_keep,
           |  CAST(sum(bad_wc) AS BIGINT) AS n_bad_wc,
           |  CAST(sum(bad_mwl) AS BIGINT) AS n_bad_mwl,
           |  CAST(sum(bad_ttr) AS BIGINT) AS n_bad_ttr,
           |  CAST(sum(bad_dbf) AS BIGINT) AS n_bad_dbf,
           |  CAST(sum(bad_twf) AS BIGINT) AS n_bad_twf
           |FROM k GROUP BY source ORDER BY source""".stripMargin,

    "q_text_vocab_growth" ->
      raw"""WITH w AS (SELECT source, string_split_regex(trim(lower(text)), '\s+') AS ws
           |           FROM documents),
           |t AS (SELECT source,
           |        unnest(list_transform(range(1, len(ws)),
           |               i -> array_to_string(list_slice(ws, i, i + 1), ' '))) AS term
           |      FROM w),
           |ps AS (SELECT source, term, count(*) AS cnt FROM t GROUP BY source, term),
           |fs AS (SELECT term, min(source) AS source FROM ps GROUP BY term),
           |nt AS (SELECT source, CAST(count(*) AS BIGINT) AS n_new_terms FROM fs GROUP BY source),
           |ss AS (SELECT source, CAST(count(*) AS BIGINT) AS n_distinct_terms,
           |         CAST(sum(cnt) AS BIGINT) AS n_tokens FROM ps GROUP BY source)
           |SELECT s.source, s.n_distinct_terms, s.n_tokens,
           |  COALESCE(n.n_new_terms, 0) AS n_new_terms,
           |  CAST(sum(COALESCE(n.n_new_terms, 0)) OVER (ORDER BY s.source) AS BIGINT) AS cum_vocab
           |FROM ss s LEFT JOIN nt n USING (source)
           |ORDER BY s.source""".stripMargin,

    "q_text_cdc" -> {
      val boundary = DedupQueries.sqlHex60Public("md5('cdc:' || wd)")
      raw"""WITH w AS (SELECT doc_id, CAST(unnest(range(1, len(ws) + 1)) - 1 AS INT) AS pos,
           |             unnest(ws) AS wd
           |           FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws FROM documents)),
           |b AS (SELECT doc_id, pos, wd,
           |        CASE WHEN $boundary % 8 = 0 THEN 1 ELSE 0 END AS is_boundary
           |      FROM w),
           |c AS (SELECT *, SUM(is_boundary) OVER (PARTITION BY doc_id ORDER BY pos
           |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS chunk_idx FROM b),
           |ch AS (SELECT doc_id, chunk_idx,
           |         md5(array_to_string(list(wd ORDER BY pos), ' ')) AS chunk_fp
           |       FROM c GROUP BY doc_id, chunk_idx)
           |SELECT chunk_fp, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
           |FROM ch GROUP BY chunk_fp HAVING COUNT(DISTINCT doc_id) >= 2
           |ORDER BY chunk_fp""".stripMargin
    },

    "q_vocab_encode" ->
      raw"""WITH d AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws FROM documents),
           |w AS (SELECT doc_id, CAST(unnest(range(1, len(ws) + 1)) - 1 AS INT) AS pos,
           |        unnest(ws) AS wd FROM d),
           |vocab AS (SELECT wd, CAST(row_number() OVER (ORDER BY count(*) DESC, wd) AS INT) AS id
           |          FROM w GROUP BY wd QUALIFY id <= 30),
           |enc AS (SELECT doc_id, pos, coalesce(v.id, 0) AS id
           |        FROM w LEFT JOIN vocab v USING (wd) WHERE pos < 12)
           |SELECT doc_id, array_to_string(list(id ORDER BY pos), ',') AS ids_csv
           |FROM enc GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_batch_pack" ->
      raw"""WITH s AS (SELECT doc_id,
           |  CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_words
           |  FROM documents),
           |b AS (SELECT doc_id, n_words, n_words // 50 AS len_bucket FROM s),
           |r AS (SELECT *, row_number() OVER (PARTITION BY len_bucket ORDER BY doc_id) AS rn FROM b)
           |SELECT doc_id, n_words, CAST(len_bucket AS BIGINT) AS len_bucket,
           |  CAST((rn - 1) // 8 AS BIGINT) AS batch_id
           |FROM r ORDER BY doc_id""".stripMargin,

    "q_text_dupspans" -> {
      raw"""WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws FROM documents),
           |gl AS (SELECT doc_id, list_transform(range(1, len(ws) - 3),
           |         i -> array_to_string(list_slice(ws, i, i + 4), ' ')) AS gs_list FROM w),
           |gx AS (SELECT doc_id, CAST(unnest(range(1, len(gs_list) + 1)) - 1 AS BIGINT) AS pos,
           |         unnest(gs_list) AS gs FROM gl),
           |g AS (SELECT doc_id, pos, gs AS g FROM gx),
           |dfq AS (SELECT g, count(DISTINCT doc_id) AS df FROM g GROUP BY g),
           |dup AS (SELECT g.doc_id, g.pos FROM g JOIN dfq USING (g) WHERE dfq.df >= 2),
           |isl AS (SELECT doc_id, pos,
           |          pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
           |        FROM dup),
           |spans AS (SELECT doc_id, grp, CAST(count(*) + 4 AS BIGINT) AS span_toks
           |          FROM isl GROUP BY doc_id, grp),
           |tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams FROM g GROUP BY doc_id),
           |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
           |          MAX(span_toks) AS max_span_toks,
           |          CAST(SUM(span_toks - 4) AS BIGINT) AS dup_grams
           |        FROM spans GROUP BY doc_id)
           |SELECT a.doc_id, a.n_spans, a.max_span_toks, a.dup_grams, t.n_grams,
           |  CAST(a.dup_grams AS DOUBLE) / CAST(t.n_grams AS DOUBLE) AS dup_frac
           |FROM agg a JOIN tot t USING (doc_id) ORDER BY a.doc_id""".stripMargin
    },

    // brute-force level census over raw gram strings, one level per
    // power of two up to the engine's minRun=16
    "q_text_suffix_dedup" -> {
      val levels = Seq(1, 2, 4, 8, 16)
      val levelCtes = levels.map { l =>
        val gram =
          if (l == 1) "ws[CAST(pos AS INT)]"
          else s"array_to_string(list_slice(ws, CAST(pos AS INT), CAST(pos + $l - 1 AS INT)), ' ')"
        s"""p$l AS (SELECT doc_id, CAST(unnest(range(1, len(ws) - $l + 2)) AS BIGINT) AS pos, ws
           |        FROM w WHERE len(ws) >= $l),
           |g$l AS (SELECT doc_id, pos, $gram AS g FROM p$l),
           |d$l AS (SELECT g$l.doc_id, g$l.pos
           |        FROM g$l JOIN (SELECT g, COUNT(*) AS c FROM g$l GROUP BY g) cg USING (g)
           |        WHERE cg.c >= 2)""".stripMargin
      }.mkString(",\n")
      val mpUnion = levels.map(l => s"SELECT doc_id, $l AS l FROM d$l")
        .mkString(" UNION ALL ")
      raw"""WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws FROM documents),
           |lens AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_tokens FROM w),
           |$levelCtes,
           |mp AS (SELECT doc_id, CAST(MAX(l) AS BIGINT) AS max_dup_len
           |       FROM ($mpUnion) GROUP BY doc_id),
           |cov AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_dup_starts,
           |          CAST(SUM(a) AS BIGINT) AS dup_cover_toks
           |        FROM (SELECT doc_id, pos,
           |                GREATEST(0, pos + 16 - GREATEST(COALESCE(
           |                  MAX(pos + 16) OVER (PARTITION BY doc_id ORDER BY pos
           |                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), pos), pos)) AS a
           |              FROM d16) GROUP BY doc_id)
           |SELECT l.doc_id, l.n_tokens,
           |  CAST(COALESCE(c.n_dup_starts, 0) AS BIGINT) AS n_dup_starts,
           |  CAST(COALESCE(c.dup_cover_toks, 0) AS BIGINT) AS dup_cover_toks,
           |  CAST(COALESCE(mp.max_dup_len, 0) AS BIGINT) AS max_dup_len,
           |  CAST(COALESCE(c.dup_cover_toks, 0) * 1000000 // l.n_tokens AS BIGINT)
           |    AS dup_cover_ppm
           |FROM lens l LEFT JOIN cov c USING (doc_id) LEFT JOIN mp USING (doc_id)
           |ORDER BY l.doc_id""".stripMargin
    },

    "q_text_suffix_rm" ->
      raw"""WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws FROM documents),
           |p16 AS (SELECT doc_id, CAST(unnest(range(1, len(ws) - 16 + 2)) AS BIGINT) AS pos, ws
           |        FROM w WHERE len(ws) >= 16),
           |g16 AS (SELECT doc_id, pos,
           |          array_to_string(list_slice(ws, CAST(pos AS INT), CAST(pos + 15 AS INT)), ' ') AS g
           |        FROM p16),
           |cg AS (SELECT g, COUNT(*) AS c, MIN(doc_id * 1048576 + pos) AS cangp
           |       FROM g16 GROUP BY g),
           |rm AS (SELECT DISTINCT g16.doc_id, CAST(unnest(range(pos, pos + 16)) AS BIGINT) AS pos
           |       FROM g16 JOIN cg USING (g)
           |       WHERE cg.c >= 2 AND g16.doc_id * 1048576 + g16.pos <> cg.cangp),
           |allpos AS (SELECT doc_id, CAST(unnest(range(1, len(ws) + 1)) AS BIGINT) AS pos, ws FROM w),
           |kept AS (SELECT a.doc_id,
           |           string_agg(a.ws[CAST(a.pos AS INT)], ' ' ORDER BY a.pos) AS cleaned_text
           |         FROM allpos a LEFT JOIN rm ON rm.doc_id = a.doc_id AND rm.pos = a.pos
           |         WHERE rm.pos IS NULL GROUP BY a.doc_id),
           |nrm AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_removed_toks
           |        FROM rm GROUP BY doc_id),
           |norm AS (SELECT doc_id, array_to_string(ws, ' ') AS norm FROM w)
           |SELECT n.doc_id,
           |  COALESCE(k.cleaned_text, '') AS cleaned_text,
           |  CAST(length(n.norm) - length(COALESCE(k.cleaned_text, '')) AS BIGINT)
           |    AS n_removed_chars,
           |  CAST(COALESCE(m.n_removed_toks, 0) AS BIGINT) AS n_removed_toks
           |FROM norm n LEFT JOIN kept k USING (doc_id) LEFT JOIN nrm m USING (doc_id)
           |ORDER BY n.doc_id""".stripMargin,

    "q_corpus_cap" ->
      """WITH ranked AS (
        |  SELECT doc_id, source, n_chars,
        |         row_number() OVER (PARTITION BY source
        |                            ORDER BY n_chars DESC, doc_id) AS rn
        |  FROM documents)
        |SELECT doc_id, source, n_chars
        |FROM ranked WHERE rn <= 25
        |ORDER BY source, n_chars DESC, doc_id""".stripMargin,

    // BPE-free replay: the round-trip oracle never touches merges —
    // eligible words concatenated IS what decode(encode(doc)) must equal
    "q_bpe_roundtrip" ->
      raw"""WITH w AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ws FROM documents),
           |e AS (SELECT doc_id, list_filter(ws, x -> regexp_full_match(x, '[a-z]+')) AS ew FROM w)
           |SELECT doc_id, COALESCE(array_to_string(ew, ''), '') AS decoded
           |FROM e ORDER BY doc_id""".stripMargin,

    // removal twin of q_text_dupspans — same census over RAW gram strings
    // (engine buckets on xxhash64: collision safety net), min-doc witness,
    // covered-index cut, char delta against the normalized rendering
    "q_text_dupspans_rm" ->
      raw"""WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws FROM documents),
           |gl AS (SELECT doc_id, list_transform(range(1, len(ws) - 3),
           |         i -> array_to_string(list_slice(ws, i, i + 4), ' ')) AS gs_list FROM w),
           |g AS (SELECT doc_id, CAST(unnest(range(1, len(gs_list) + 1)) - 1 AS BIGINT) AS pos,
           |        unnest(gs_list) AS g FROM gl),
           |cen AS (SELECT g, count(DISTINCT doc_id) AS df, MIN(doc_id) AS windoc
           |        FROM g GROUP BY g),
           |rmp AS (SELECT DISTINCT gg.doc_id, gg.pos + u.i AS idx
           |        FROM g gg JOIN cen USING (g), range(0, 5) AS u(i)
           |        WHERE cen.df >= 2 AND gg.doc_id <> cen.windoc),
           |rml AS (SELECT doc_id, list(idx) AS rmidx,
           |          CAST(count(*) AS BIGINT) AS n_removed_toks
           |        FROM rmp GROUP BY doc_id),
           |base AS (SELECT doc_id, ws, array_to_string(ws, ' ') AS norm FROM w),
           |cl AS (SELECT b.doc_id,
           |        COALESCE(array_to_string(list_filter(b.ws,
           |          (x, i) -> NOT list_contains(COALESCE(r.rmidx, []), CAST(i - 1 AS BIGINT))),
           |          ' '), '') AS cleaned_text,
           |        b.norm, CAST(COALESCE(r.n_removed_toks, 0) AS BIGINT) AS n_removed_toks
           |       FROM base b LEFT JOIN rml r USING (doc_id))
           |SELECT doc_id, cleaned_text,
           |  CAST(length(norm) - length(cleaned_text) AS BIGINT) AS n_removed_chars,
           |  n_removed_toks
           |FROM cl ORDER BY doc_id""".stripMargin,

    // formula replay: span starts/lengths recomputed from the same
    // small-integer arithmetic, islands merged, sentinels by ordinal
    "q_mask_spans" ->
      raw"""WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws FROM documents),
           |t AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS n,
           |        unnest(range(1, len(ws) + 1)) - 1 AS idx, ws FROM w),
           |tok AS (SELECT doc_id, n, idx, ws[CAST(idx + 1 AS INT)] AS tok FROM t),
           |st AS (SELECT doc_id, idx, 2 + (doc_id + idx) % 3 AS len, n FROM tok
           |       WHERE ((doc_id % 100003) * 31 + idx * 17 + 7) % 20 = 0),
           |mk AS (SELECT DISTINCT doc_id, idx + u.i AS midx
           |       FROM st, range(0, 4) AS u(i)
           |       WHERE u.i < st.len AND idx + u.i <= n - 1),
           |isl AS (SELECT doc_id, midx,
           |          midx - row_number() OVER (PARTITION BY doc_id ORDER BY midx) AS grp
           |        FROM mk),
           |sp AS (SELECT doc_id, grp, MIN(midx) AS s, MAX(midx) AS e
           |       FROM isl GROUP BY doc_id, grp),
           |spk AS (SELECT *, CAST(row_number() OVER (PARTITION BY doc_id ORDER BY s) - 1 AS BIGINT) AS k
           |        FROM sp),
           |pieces AS (
           |  SELECT tok.doc_id, idx AS key, tok AS piece FROM tok
           |  WHERE NOT EXISTS (SELECT 1 FROM mk
           |                    WHERE mk.doc_id = tok.doc_id AND mk.midx = tok.idx)
           |  UNION ALL
           |  SELECT doc_id, s AS key, '<extra_id_' || k || '>' FROM spk),
           |corr AS (SELECT doc_id, array_to_string(list(piece ORDER BY key), ' ') AS corrupted
           |         FROM pieces GROUP BY doc_id),
           |sptk AS (SELECT i.doc_id, i.grp,
           |           array_to_string(list(tok.tok ORDER BY i.midx), ' ') AS body
           |         FROM isl i JOIN tok ON tok.doc_id = i.doc_id AND tok.idx = i.midx
           |         GROUP BY i.doc_id, i.grp),
           |tgt AS (SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_spans,
           |          array_to_string(list('<extra_id_' || s.k || '> ' || b.body ORDER BY s.k), ' ') AS target
           |        FROM spk s JOIN sptk b ON b.doc_id = s.doc_id AND b.grp = s.grp
           |        GROUP BY s.doc_id),
           |nm AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_masked FROM mk GROUP BY doc_id),
           |base AS (SELECT doc_id, array_to_string(ws, ' ') AS norm FROM w)
           |SELECT b.doc_id,
           |  COALESCE(nm.n_masked, 0) AS n_masked,
           |  COALESCE(tgt.n_spans, 0) AS n_spans,
           |  COALESCE(corr.corrupted, b.norm) AS corrupted,
           |  COALESCE(tgt.target, '') AS target
           |FROM base b LEFT JOIN corr USING (doc_id)
           |LEFT JOIN tgt ON tgt.doc_id = b.doc_id
           |LEFT JOIN nm ON nm.doc_id = b.doc_id
           |ORDER BY b.doc_id""".stripMargin,

    "q_pack_budget" ->
      raw"""WITH t AS (SELECT doc_id, source,
           |  CAST(CASE WHEN length(trim(text)) = 0 THEN 0
           |            ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS toks
           |  FROM documents),
           |c AS (SELECT *, SUM(toks) OVER (PARTITION BY source ORDER BY doc_id
           |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM t)
           |SELECT doc_id, source, toks,
           |  CAST((cum - toks) // 2048 AS BIGINT) AS bin,
           |  CAST((cum - toks) % 2048 AS BIGINT) AS bin_offset
           |FROM c ORDER BY doc_id""".stripMargin,

    "q_bpe_pairs" ->
      raw"""WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws FROM documents),
           |bg AS (SELECT doc_id,
           |         unnest(list_transform(range(1, len(ws)),
           |                i -> array_to_string(list_slice(ws, i, i + 1), ' '))) AS pair
           |       FROM w)
           |SELECT pair, CAST(count(*) AS BIGINT) AS cnt,
           |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
           |FROM bg GROUP BY pair ORDER BY cnt DESC, pair LIMIT 30""".stripMargin,

    // 3 unrolled merge rounds; U+0001 is the symbol delimiter (words are
    // /[a-z]+/ so it can never collide). replace() is left-to-right
    // non-overlapping on both engines = greedy BPE (CorpusOps.bpeTrain)
    "q_bpe_merge" ->
      s"""WITH ${bpeTrainCtes(3)}
         |SELECT * FROM (
         |  SELECT 1 AS step, p1 AS sym_left, p2 AS sym_right, cnt AS freq FROM m1
         |  UNION ALL SELECT 2, p1, p2, cnt FROM m2
         |  UNION ALL SELECT 3, p1, p2, cnt FROM m3)
         |WHERE sym_left <> ''
         |ORDER BY step""".stripMargin,

    // DEEP-TRAIN replay: the same loop at DeepRounds depth — every
    // round MATERIALIZED (an inlined chain re-evaluates 2^50 times),
    // sentinel rounds past exhaustion filtered by sym_left <> ''
    "q_bpe_train_deep" ->
      s"""WITH ${bpeTrainCtes(DeepRounds)}
         |SELECT * FROM (
         |  SELECT 1 AS step, p1 AS sym_left, p2 AS sym_right, cnt AS freq FROM m1
         |${(2 to DeepRounds).map(r => s"  UNION ALL SELECT $r, p1, p2, cnt FROM m$r").mkString("\n")})
         |WHERE sym_left <> ''
         |ORDER BY step""".stripMargin,

    // ENCODE replay: retrain the same deep merge table (m1..m50 CTEs),
    // then apply them per DISTINCT word in rank order (nested replace =
    // the same left-to-right greedy scan) and map symbol text -> id with
    // a FIRST-wins CASE chain, exactly as CorpusOps.bpeEncodeIds does
    "q_bpe_encode" ->
      s"""WITH ${bpeTrainCtes(DeepRounds)},
         |${bpeEncWordCtes(DeepRounds)},
         |eid AS (SELECT w, list_transform(syms, y -> CAST(
         |    ${bpeIdCaseSql(DeepRounds)} AS VARCHAR)) AS ids FROM encw),
         |agg AS (SELECT t.doc_id, flatten(list(e.ids ORDER BY t.pos)) AS tids
         |        FROM tok t JOIN eid e USING (w) GROUP BY t.doc_id)
         |SELECT doc_id, CAST(len(tids) AS BIGINT) AS n_tokens,
         |  array_to_string(tids, ',') AS ids_csv
         |FROM agg ORDER BY doc_id""".stripMargin,

    // PRUNING ablation replay: one retrain, TWO merge chains over the
    // same distinct vocabulary (the 25-chain references only m1..m25 of
    // the 50 trained rounds — a rank prefix IS the smaller model)
    "q_bpe_prune" -> {
      val S = BpeSep
      val froms = ("vw" +: (1 to DeepRounds).map(r => s"m$r")).mkString(", ")
      s"""WITH ${bpeTrainCtes(DeepRounds)},
         |wl AS (SELECT doc_id, lang, string_split_regex(trim(lower(text)), '\\s+') AS ws
         |       FROM documents),
         |tk AS (SELECT doc_id, lang, unnest(range(1, len(ws) + 1)) AS pos, ws FROM wl),
         |tok AS (SELECT doc_id, lang, ws[pos] AS w FROM tk
         |        WHERE regexp_full_match(ws[pos], '[a-z]+')),
         |vw AS (SELECT DISTINCT w FROM tok),
         |encw AS (SELECT w,
         |    CAST(len(string_split(trim(${bpeChainSql(DeepRounds)},
         |      '$S'), '$S$S')) AS BIGINT) AS nf,
         |    CAST(len(string_split(trim(${bpeChainSql(DeepRounds / 2)},
         |      '$S'), '$S$S')) AS BIGINT) AS np
         |  FROM $froms)
         |SELECT t.lang, CAST(SUM(e.nf) AS BIGINT) AS n_tokens_full,
         |  CAST(SUM(e.np) AS BIGINT) AS n_tokens_pruned,
         |  CAST(SUM(e.np) * 1000000 // SUM(e.nf) AS BIGINT) AS bloat_ppm
         |FROM tok t JOIN encw e USING (w)
         |GROUP BY t.lang ORDER BY t.lang""".stripMargin
    },

    // FERTILITY census replay: same retrain + per-word merge chain; only
    // the symbol COUNT per word matters, aggregated to the language
    "q_bpe_fertility" ->
      s"""WITH ${bpeTrainCtes(DeepRounds)},
         |${bpeEncWordCtes(DeepRounds)},
         |wtok AS (SELECT w, len(syms) AS n_sym FROM encw),
         |per AS (SELECT t.doc_id, CAST(SUM(s.n_sym) AS BIGINT) AS n_tokens,
         |               CAST(SUM(length(t.w)) AS BIGINT) AS n_chars
         |        FROM tok t JOIN wtok s USING (w) GROUP BY t.doc_id)
         |SELECT d.lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(p.n_tokens) AS BIGINT) AS n_tokens,
         |  CAST(SUM(p.n_chars) AS BIGINT) AS n_chars,
         |  CAST(SUM(p.n_chars) * 1000000 // SUM(p.n_tokens) AS BIGINT) AS chars_per_token_ppm
         |FROM per p JOIN documents d USING (doc_id)
         |GROUP BY d.lang ORDER BY d.lang""".stripMargin,

    // oracle keeps RAW gram strings while the engine buckets on
    // xxhash64 ids — intentionally NOT mirrored (collision safety net)
    "q_text_boilerplate" ->
      raw"""WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws FROM documents),
           |g AS (SELECT doc_id,
           |        unnest(list_transform(range(1, len(ws) - 1),
           |               i -> array_to_string(list_slice(ws, i, i + 2), ' '))) AS gs
           |      FROM w),
           |pdg AS (SELECT doc_id, gs AS g, count(*) AS c FROM g GROUP BY doc_id, gs),
           |boiler AS (SELECT g FROM (SELECT g, count(*) AS df FROM pdg GROUP BY g)
           |           WHERE df >= 3),
           |tot AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_grams FROM pdg GROUP BY doc_id),
           |hits AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_boiler
           |         FROM pdg WHERE g IN (SELECT g FROM boiler) GROUP BY doc_id)
           |SELECT t.doc_id, t.n_grams,
           |  COALESCE(h.n_boiler, 0) AS n_boiler,
           |  CAST(COALESCE(h.n_boiler, 0) AS DOUBLE) / CAST(t.n_grams AS DOUBLE) AS boiler_frac,
           |  CAST(COALESCE(h.n_boiler, 0) AS DOUBLE) / CAST(t.n_grams AS DOUBLE) < 0.5 AS keep
           |FROM tot t LEFT JOIN hits h USING (doc_id) ORDER BY t.doc_id""".stripMargin,

    "q_text_pii" ->
      """WITH m AS (SELECT c_custkey,
        |  c_name || ' <' || lower(c_name) || '@mail.example.com> tel:555-' || CAST(c_custkey AS VARCHAR) AS msg
        |  FROM customer)
        |SELECT c_custkey,
        |  regexp_replace(regexp_replace(msg, '[a-z0-9._%+-]+@[a-z0-9.-]+', '[EMAIL]', 'g'),
        |                 '555-[0-9]+', '[PHONE]', 'g') AS redacted,
        |  CAST(len(regexp_extract_all(msg, '[a-z0-9._%+-]+@[a-z0-9.-]+')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(msg, '555-[0-9]+')) AS BIGINT) AS n_phones
        |FROM m ORDER BY c_custkey""".stripMargin
  )
}
