package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._
import CacheScope.ScopedPersist

/** Corpus-hygiene operators for training-data pipelines: benchmark
  * decontamination, Gopher-style repetition signals, and PII scrubbing.
  * Pure declarative plans — per-row Column expressions plus linear
  * explode→groupBy aggregations (map-side combinable), no UDFs, no
  * driver round-trips — so each has an exact DuckDB oracle.
  */
object CorpusOps {

  /** Driver-collect cap for the vocabulary-scale training censuses
    * (r17 verdict #8 / ADVICE): the Heaps-law bound on distinct [a-z]+
    * words is an expectation, not a guarantee — an adversarial 100 TB
    * corpus can push the census past driver heap. Overridable for specs
    * via the JVM property; the production bound (10M entries ≈ low-GB
    * driver heap) matches every production tokenizer trainer's
    * working-set assumption (HF tokenizers / SentencePiece collect the
    * same census in one process).
    */
  private[graft] def censusCap: Int =
    sys.props.get("graft.censusCap").map(_.toInt).getOrElse(10000000)

  /** Bounded driver collect: at most `cap + 1` rows ever cross to the
    * driver (the limit rides the plan), and hitting the cap fails
    * LOUDLY with a pointer at the distributed alternative instead of an
    * opaque driver OOM (the SCALE.md 1M-edge union-find gate pattern).
    */
  private[graft] def collectBounded(df: DataFrame, what: String,
      cap: Int = censusCap): Array[org.apache.spark.sql.Row] = {
    val rows = df.limit(cap + 1).collect()
    require(rows.length <= cap,
      s"$what: census exceeds $cap entries (driver-side training is for " +
        "Heaps-bounded vocabularies; shard the corpus or raise -Dgraft.censusCap " +
        "with driver heap to match — see SCALE.md, driver-gate pattern)")
    rows
  }

  /** Whitespace word array. */
  def words(text: Column): Column = split(trim(text), "\\s+")

  /** Overlapping word n-grams joined by single spaces; empty array when the
    * doc has fewer than n words (sequence() would otherwise count DOWN and
    * emit garbage slices).
    */
  def wordNgrams(ws: Column, n: Int): Column =
    when(size(ws) >= n,
      transform(sequence(lit(1), size(ws) - lit(n - 1)),
        i => array_join(slice(ws, i, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))

  /** Benchmark decontamination: for each train doc, how many of its
    * distinct word n-grams appear in the benchmark set. Docs with any
    * overlap are the ones a training pipeline must drop before eval.
    *
    * Scale shape: the benchmark n-gram set is eval-suite-sized (MBs) while
    * train is the 100 TB side — so it is broadcast and the whole op is one
    * linear scan + map-side hash probe + one groupBy on doc id. No
    * shuffle of the n-gram explosion itself. (If the bench set ever
    * outgrew broadcast, the same plan works as a shuffled equi-join on the
    * same 64-bit n-gram hash.) Grams ride as 64-bit xxhash64 ids from the
    * moment they leave the explode — the distinct, the broadcast and the
    * join key are all longs (~10× smaller than raw gram strings) — and
    * the explosion is persisted so the scan + explode run ONCE for both
    * the bench and train branches instead of twice. xxhash64 (not the
    * md5-based hex60 of the sibling operators) because it is codegen'd
    * and ~free per row, and nothing here needs a DuckDB-twin hash: the
    * hash values never reach the output, and the oracle joins on RAW
    * gram strings — deliberately, so a hash collision that changed any
    * overlap count would FAIL the oracle instead of being mirrored by it
    * (64-bit collision odds at any realistic gram count: negligible).
    */
  def decontaminate(docs: DataFrame, idCol: String, textCol: String,
                    isBench: Column, n: Int): DataFrame = {
    val ng = docs.select(col(idCol).as("doc_id"), isBench.as("is_bench"),
      explode(wordNgrams(words(col(textCol)), n)).as("__gs"))
      .select(col("doc_id"), col("is_bench"), xxhash64(col("__gs")).as("g"))
      .scopedPersist()
    val bench = ng.filter(col("is_bench")).select(col("g")).distinct()
    // broadcast-probe FIRST, distinct AFTER: the map-side hash probe drops
    // every non-overlapping gram instance before anything shuffles, so the
    // distinct's exchange carries only the (tiny) overlap set instead of
    // the whole train-side gram explosion — same distinct-pair semantics,
    // shuffle shrunk by the overlap fraction (at 100 TB: orders of
    // magnitude)
    ng.filter(!col("is_bench")).select(col("doc_id"), col("g"))
      .join(broadcast(bench), Seq("g"))
      .distinct()
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_overlap"))
  }

  /** Longest equal-run length in a SORTED array — the within-row twin of
    * `max(count) GROUP BY term`: one linear fold, no shuffle. The ""
    * sentinel is collision-safe: with run = 0, the first element scores 1
    * on either branch.
    */
  private def maxRunLength(sorted: Column): Column =
    aggregate(sorted,
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"), acc.getField("run") + 1L).otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"), greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))

  /** `size(wordNgrams(ws, 2)) > 0 ⟺ size(ws) >= 2` (the bigram array has
    * exactly size(ws)−1 elements when size(ws) ≥ 2, else it is empty), so
    * the has-bigrams gate can be tested BEFORE the bigram array exists.
    * Filtering on the bigram array itself made the optimizer push the
    * whole transform(sequence, array_join(slice(split…))) build into the
    * Filter node below the projection — every row built its bigram array
    * twice (once discarded after a size() test, once for real). The
    * word-count spelling pushes only one split() per row.
    */
  private def hasBigrams(textCol: Column): Column =
    size(words(textCol)) >= 2

  /** Gopher-style repetition signals, one row per doc:
    * top_word_frac (most frequent word / total words), type_token_ratio
    * (distinct/total words), dup_bigram_frac (1 - distinct/total bigrams).
    *
    * Every signal is a WITHIN-document statistic, so the whole thing is
    * one shuffle-free map pass of array expressions — size /
    * array_distinct / a sorted run-length fold for the top-word count —
    * instead of the two explode→two-level-groupBy pipelines + join it
    * replaces (measured 6× at sf0.1: per-doc terms never leave their
    * partition, nothing is exploded into the shuffle). Docs with no
    * bigrams (< 2 words) drop out, matching the old inner-join semantics
    * and the oracle. All ratios are exact-integer-count divisions —
    * bit-identical IEEE on both oracle sides.
    */
  def repetitionStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // gate on the word count BEFORE building the bigram array (see
    // hasBigrams: the old size(__bg) > 0 filter re-built the bigrams in
    // the pushed-down Filter node, once per row, just to read the size);
    // sort_array (native ordering) replaces array_sort, whose implicit
    // comparator lambda is interpreted per comparison — identical order
    // on the null-free arrays split() produces
    docs.filter(hasBigrams(col(textCol)))
      .select(col(idCol).as("doc_id"), words(col(textCol)).as("__ws"))
      .select(col("doc_id"), col("__ws"), wordNgrams(col("__ws"), 2).as("__bg"))
      .select(col("doc_id"),
        maxRunLength(sort_array(col("__ws"))).as("top_cnt"),
        size(col("__ws")).cast("long").as("total_words"),
        size(array_distinct(col("__ws"))).cast("long").as("distinct_words"),
        size(col("__bg")).cast("long").as("total_bigrams"),
        size(array_distinct(col("__bg"))).cast("long").as("distinct_bigrams"))
      .select(col("doc_id"),
        (col("top_cnt").cast("double") / col("total_words").cast("double")).as("top_word_frac"),
        (col("distinct_words").cast("double") / col("total_words").cast("double")).as("type_token_ratio"),
        (lit(1.0) - col("distinct_bigrams").cast("double") / col("total_bigrams").cast("double")).as("dup_bigram_frac"))
  }

  /** Gopher-style quality-filter DECISION (Rae et al. 2021 §A1.1 shape:
    * a conjunction of document-level bounds; thresholds re-calibrated to
    * this corpus so every rule discriminates). Emits one row per doc
    * with the five violation flags (1 = rule violated) and the composite
    * `keep` — the census consumers aggregate, and the pipeline's actual
    * filter is `keep = 1`. Rules:
    * word count ∈ [30, 90]; mean word length ∈ [3.9, 5.0]; type-token
    * ratio ≥ 0.35; duplicate-bigram fraction ≤ 0.08; top-word fraction
    * ≤ 0.12. Every signal is a within-doc statistic — one shuffle-free
    * codegen'd map pass (the [[repetitionStats]] fold pattern), and
    * every ratio is an exact-integer division, so the flags are
    * bit-identical on both oracle sides.
    */
  def gopherFilter(docs: DataFrame, idCol: String, textCol: String,
                   keepCols: Seq[String] = Nil): DataFrame = {
    val flag = (c: Column) => when(c, 0).otherwise(1)
    // same three spellings as repetitionStats: word-count pre-filter (no
    // bigram build in the pushed Filter), native sort_array, and the
    // word-length sum as length(concat_ws("", ws)) — one codegen'd
    // concat instead of an interpreted per-element fold (Σ length(w) ≡
    // length of the concatenation; split() arrays are null-free)
    docs.filter(hasBigrams(col(textCol)))
      .select(col(idCol).as("doc_id") +: keepCols.map(col) :+
        words(col(textCol)).as("__ws"): _*)
      .select(col("doc_id") +: keepCols.map(col) :+
        col("__ws") :+ wordNgrams(col("__ws"), 2).as("__bg"): _*)
      .select(col("doc_id") +: keepCols.map(col) :+
        size(col("__ws")).cast("long").as("wc") :+
        (length(concat_ws("", col("__ws"))).cast("double")
          / size(col("__ws")).cast("double")).as("mwl") :+
        (size(array_distinct(col("__ws"))).cast("double")
          / size(col("__ws")).cast("double")).as("ttr") :+
        (lit(1.0) - size(array_distinct(col("__bg"))).cast("double")
          / size(col("__bg")).cast("double")).as("dbf") :+
        (maxRunLength(sort_array(col("__ws"))).cast("double")
          / size(col("__ws")).cast("double")).as("twf"): _*)
      .select(col("doc_id") +: keepCols.map(col) :+
        flag(col("wc").between(30L, 90L)).as("bad_wc") :+
        flag(col("mwl").between(3.9, 5.0)).as("bad_mwl") :+
        flag(col("ttr") >= 0.35).as("bad_ttr") :+
        flag(col("dbf") <= 0.08).as("bad_dbf") :+
        flag(col("twf") <= 0.12).as("bad_twf"): _*)
      .withColumn("keep",
        when(col("bad_wc") + col("bad_mwl") + col("bad_ttr")
          + col("bad_dbf") + col("bad_twf") === 0, 1).otherwise(0))
  }

  /** Portable PII patterns (identical Java-regex / DuckDB-RE2 semantics:
    * plain character classes, greedy +, no lookaround). */
  val emailPattern = "[a-z0-9._%+-]+@[a-z0-9.-]+"
  val phonePattern = "555-[0-9]+"

  /** Redact emails then phones; global replace on both engines. */
  /** Static data-mixing (domain re-weighting to a token budget): each
    * domain keeps r_d = min(1, budget·w_d / T_d) of its rows, decided by
    * the RNG-free per-row md5 predicate — u(id) = hex60(md5('mix:'||id))
    * mod 1e6 < floor(budget·w_d·1e6 / T_d). Two passes over the corpus:
    * one map-side-combinable per-domain token aggregate (broadcast back —
    * domains are few), then a codegen'd filter. No RNG state, no shuffle
    * of the corpus itself; re-running on any partitioning keeps the
    * identical rows — the property a 100 TB mixing job needs for
    * reproducible training sets.
    *
    * `weight` is a Column over the domain column (e.g. a when-chain);
    * `tokens` the per-row token count. Output keeps every input column
    * plus `toks`, `rate_ppm`, `keep`.
    */
  def mixtureSample(docs: DataFrame, idCol: String, domainCol: String,
                    tokens: Column, budget: Double, weight: Column): DataFrame = {
    val t = docs.withColumn("toks", tokens.cast("long"))
    val totals = t.groupBy(col(domainCol)).agg(sum(col("toks")).as("__T"))
    t.join(broadcast(totals), Seq(domainCol))
      .withColumn("rate_ppm",
        least(lit(1000000L),
          floor(lit(budget) * weight * lit(1000000.0) / col("__T").cast("double")).cast("long")))
      .withColumn("keep",
        Dedup.hex60(md5(concat(lit("mix:"), col(idCol).cast("string")).cast("binary")))
          % 1000000 < col("rate_ppm"))
      .drop("__T")
  }

  /** TEMPERATURE-SMOOTHED mixture (the multilingual-rebalancing shape of
    * mBERT/XLM-R/mT5 exponent-smoothed sampling, α = 0.5): domain weights
    * w_d ∝ isqrt(T_d) instead of ∝ T_d, so low-resource domains are
    * upsampled relative to their raw share. Keep rate r_d =
    * min(1, budget·w_d / T_d), decided per row by the same RNG-free md5
    * predicate as [[mixtureSample]].
    *
    * Numerics are cross-engine exact BY CONSTRUCTION: the smoothed weight
    * uses floor(sqrt(T)) — sqrt is IEEE-correctly-rounded on both engines
    * and exact on BIGINT-scale inputs — so the normalizer Z = Σ isqrt(T)
    * is an INTEGER sum (order-independent, unlike a float Σ√T which would
    * vary in the last ULP with aggregation order), and the per-row rate
    * expression is a fixed-order scalar both engines round identically.
    * Same scale shape as mixtureSample: one per-domain aggregate
    * broadcast back + a codegen'd filter; the corpus never shuffles.
    */
  def temperatureMixture(docs: DataFrame, idCol: String, domainCol: String,
                         tokens: Column, budget: Double): DataFrame = {
    val t = docs.withColumn("toks", tokens.cast("long"))
    val totals = t.groupBy(col(domainCol)).agg(sum(col("toks")).as("__T"))
      .withColumn("__sq", floor(sqrt(col("__T").cast("double"))).cast("long"))
    val z = totals.agg(sum(col("__sq")).as("__Z")) // exact integer normalizer
    t.join(broadcast(totals), Seq(domainCol))
      .crossJoin(broadcast(z)) // 1-row scalar — the allowed broadcast-1-row shape
      // T = 0 (a domain whose docs are all empty) would make the rate
      // 0/0 = NaN → null after the long cast; such a domain has nothing
      // to keep, so pin its rate to 0 explicitly
      .withColumn("rate_ppm",
        when(col("__T") > 0L,
          least(lit(1000000L),
            floor(lit(budget) * col("__sq").cast("double") / col("__Z").cast("double")
              * lit(1000000.0) / col("__T").cast("double")).cast("long")))
          .otherwise(0L))
      .withColumn("keep",
        Dedup.hex60(md5(concat(lit("mixa:"), col(idCol).cast("string")).cast("binary")))
          % 1000000 < col("rate_ppm"))
      .drop("__T", "__sq", "__Z")
  }

  /** Corpus-frequency boilerplate signal (the C4/FineWeb "common span"
    * filter): an n-gram is boilerplate when it occurs in >= minDocFreq
    * DISTINCT docs; each doc reports how many of its n-gram positions
    * are covered by boilerplate grams. High boiler_frac = templated /
    * mirrored content a training pipeline should drop.
    *
    * Scale shape: grams are 64-bit xxhash64 ids (shrinks the shuffle
    * ~10× vs raw strings, and the hash is codegen'd and ~free per row —
    * measured 2× on the whole query vs the md5-based hex60, which at
    * gram-instance volume was the dominant cost); doc-frequency is one
    * groupBy over (doc, gram) partial counts; the probe back is an
    * inverted-index join on the gram id — the boilerplate set is
    * corpus-derived and can be huge, so it is NEVER broadcast (contrast
    * decontaminate, whose bench set is eval-sized). Everything is
    * equi-join/groupBy on a long key. Hash values never reach the
    * output, and the oracle joins RAW gram strings — a collision that
    * changed any count would fail it, not be mirrored by it.
    */
  def boilerplateStats(docs: DataFrame, idCol: String, textCol: String,
                       n: Int, minDocFreq: Long): DataFrame = {
    require(n >= 1, s"boilerplateStats: n-gram size must be >= 1, got $n")
    require(minDocFreq >= 1,
      s"boilerplateStats: minDocFreq must be >= 1 (1 marks EVERY gram boilerplate), got $minDocFreq")
    val grams = docs.select(col(idCol).as("doc_id"),
      explode(wordNgrams(words(col(textCol)), n)).as("__gs"))
      .select(col("doc_id"), xxhash64(col("__gs")).as("g"))
    // per-(doc, gram) position counts — map-side combinable, and the
    // single shuffled relation every later stage reuses
    val perDocGram = grams.groupBy(col("doc_id"), col("g"))
      .agg(count(lit(1)).as("c")).scopedPersist()
    val boiler = perDocGram.groupBy(col("g"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDocFreq)
      .select(col("g"), lit(true).as("__b"))
    // ONE doc-keyed aggregation: the boiler flag rides along on a left
    // join (boiler is groupBy-distinct per g, so no row multiplication)
    // and n_grams / n_boiler come out of the same groupBy — vs the
    // previous totals-aggregate + semi-join-aggregate + doc-keyed outer
    // join, which shuffled perDocGram by doc_id twice
    perDocGram.join(boiler, Seq("g"), "left")
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_grams"),
        coalesce(sum(when(col("__b"), col("c"))), lit(0L)).as("n_boiler"))
      .select(col("doc_id"), col("n_grams"), col("n_boiler"),
        (col("n_boiler").cast("double") /
          col("n_grams").cast("double")).as("boiler_frac"))
  }

  /** CROSS-SOURCE OVERLAP MATRIX: for every source pair, the number of
    * fingerprints present in BOTH sources. Input is any (fp, source)
    * relation; NULL fingerprints are excluded (a null text must not form
    * a "shared" group — SQL's fp self-join never matches NULL = NULL).
    *
    * Scale shape: one distinct + one groupBy on the fingerprint; source
    * pairs expand IN-ROW from the per-fp sorted source set — no fp
    * self-join, so a viral fingerprint can never square a join. The
    * in-row expansion is quadratic in the number of distinct sources
    * sharing a fingerprint, so it gets the same hot-group cap as
    * `Graph.coOccurrenceEdges`: fingerprints shared by more than
    * `maxSources` sources are DROPPED before the expansion (at
    * open-domain source cardinality a viral fp would otherwise build an
    * S²-struct array in a single row). The cut is never silent — the
    * dropped-fp count rides an `observe` metric on the same action
    * (scale-free, unlike a second counting pass over the corpus): pass
    * an [[Observation]] to read it programmatically, or watch the
    * default-named CollectMetrics node from a QueryExecutionListener.
    */
  def sourceOverlap(fps: DataFrame, fpCol: String, sourceCol: String,
                    maxSources: Int = 64,
                    obs: Option[Observation] = None): DataFrame = {
    require(maxSources >= 2, s"sourceOverlap: maxSources must be >= 2, got $maxSources")
    val sets = fps.select(col(fpCol).as("fp"), col(sourceCol).as("source"))
      .filter(col("fp").isNotNull)
      .distinct()
      .groupBy(col("fp"))
      .agg(array_sort(collect_set(col("source"))).as("ss"))
      .filter(size(col("ss")) >= 2)
    val dropMetric =
      coalesce(sum(when(size(col("ss")) > maxSources, 1L)), lit(0L)).as("n_dropped_fps")
    val watched = obs.fold(sets.observe("source_overlap_drops", dropMetric))(
      o => sets.observe(o, dropMetric))
    watched.filter(size(col("ss")) <= maxSources)
      .select(explode(flatten(transform(col("ss"), (a, i) =>
        transform(slice(col("ss"), i + 2, size(col("ss"))), b =>
          struct(a.as("source_a"), b.as("source_b")))))).as("p"))
      .groupBy(col("p.source_a").as("source_a"), col("p.source_b").as("source_b"))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Data-constrained EPOCH ALLOCATION (the Muennighoff et al. 2023
    * "Scaling Data-Constrained Language Models" shape): under a token
    * budget of `budgetX` × the corpus, give each domain a
    * temperature-flattened target share (α = 0.5 via integer sqrt, the
    * same exact arithmetic as [[temperatureMixture]]) and convert it to
    * a REPEAT count over the domain's own tokens, capped at
    * `maxEpochsX1000`/1000 epochs (the paper's ~4-epoch
    * diminishing-returns rail). The planning table every
    * data-constrained run derives before training: how many times each
    * source is repeated.
    *
    * Exact integer arithmetic throughout (milli-epoch fixed point;
    * budget-first division keeps every intermediate ≤ total·budgetX —
    * safe past 10¹⁴ tokens). Scale: one combinable groupBy to the
    * domain dimension; everything after is dimension-sized.
    */
  def epochAllocation(docs: DataFrame, domainCol: String, tokens: Column,
                      budgetX: Long = 2L, maxEpochsX1000: Long = 4000L): DataFrame = {
    require(budgetX >= 1, s"epochAllocation: budgetX must be >= 1, got $budgetX")
    require(maxEpochsX1000 >= 1000,
      s"epochAllocation: maxEpochsX1000 must allow >= 1 epoch, got $maxEpochsX1000")
    val totals = docs.select(col(domainCol), tokens.cast("long").as("__t"))
      .groupBy(col(domainCol)).agg(sum(col("__t")).as("n_tokens"))
      .withColumn("__sq", floor(sqrt(col("n_tokens").cast("double"))).cast("long"))
    val z = totals.agg(sum(col("n_tokens")).as("__total"), sum(col("__sq")).as("__Z"))
    totals.crossJoin(broadcast(z)) // 1-row scalar — the allowed shape
      .withColumn("target_tokens", expr(s"(__total * $budgetX div __Z) * __sq"))
      .withColumn("epochs_x1000", least(lit(maxEpochsX1000),
        expr("target_tokens * 1000 div greatest(n_tokens, 1)")))
      .withColumn("alloc_tokens", expr("epochs_x1000 * n_tokens div 1000"))
      .select(col(domainCol), col("n_tokens"), col("target_tokens"),
        col("epochs_x1000"), col("alloc_tokens"))
  }

  /** UniMax language sampling (Chung et al. 2023, "UniMax: Fairer and
    * More Effective Language Sampling for Large-Scale Multilingual
    * Pretraining"): water-filling budget allocation with a hard
    * per-language epoch cap. Languages are visited in ASCENDING corpus
    * size; each receives min(cap·n_l, fair share of the remaining
    * budget over the remaining languages) — small languages are
    * up-sampled to the cap and never beyond it, head languages absorb
    * the slack. All integer arithmetic (Long floor division), so the
    * allocation is bit-deterministic and replayable as a recursive SQL
    * over the same census.
    *
    * Scale: the census is ONE map-side-combinable groupBy; the
    * water-filling loop is inherently sequential over the
    * language DIMENSION (L rows — driver metadata, the same class as
    * kmeans seeds and IVF probe selection), never over the data.
    */
  def unimaxAllocation(docs: DataFrame, domainCol: String, tokens: Column,
                       budgetX: Long = 1L, maxEpochs: Long = 2L): DataFrame = {
    require(budgetX >= 1, s"unimaxAllocation: budgetX must be >= 1, got $budgetX")
    require(maxEpochs >= 1, s"unimaxAllocation: maxEpochs must be >= 1, got $maxEpochs")
    val census = docs.select(col(domainCol).cast("string").as("__d"), tokens.cast("long").as("__t"))
      .groupBy(col("__d")).agg(sum(col("__t")).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (d, n) => (n, d) } // ascending size, name tie-break
    val total = census.map(_._2).sum
    var rem = total * budgetX
    val alloc = census.zipWithIndex.map { case ((d, n), i) =>
      val fair = rem / (census.length - i) // positive Long division = floor
      val a = math.min(maxEpochs * n, fair)
      rem -= a
      (d, n, a, if (n > 0) a * 1000000L / n else 0L)
    }
    val sess = docs.sparkSession
    import sess.implicits._
    alloc.toSeq.toDF(domainCol, "n_tokens", "alloc_tokens", "epochs_ppm")
  }

  /** Per-doc n-gram NOVELTY — the fraction of a doc's distinct k-grams
    * whose global first occurrence (min doc id over the whole corpus) is
    * this doc. The memorization-risk / marginal-value census: a doc
    * whose grams all first appeared elsewhere adds nothing the model
    * hasn't seen (novelty 0 — the limit case of an exact duplicate);
    * curation pipelines rank arriving data by it (cf. the span-level
    * twin, ExactSubstr's duplicated-span fraction).
    *
    * Exact arithmetic: counts are longs, the ratio is floor-permille
    * integer division. Scale: the distinct (doc, gram-hash) relation is
    * instance-sized; first-owner is ONE map-side-combinable min per
    * gram; the join back is keyed by the gram hash — the same shape
    * (and cost) as the inverted-index probes of boilerplate/termstats.
    * The gram relation is the SAME hashed shingle table the minhash
    * family persists (plan-identical → cache-manager hit when run in
    * the dedup family, the q_dedup_source_mirror precedent); the hash
    * never reaches the output and the oracle groups RAW gram strings —
    * a collision that changed any count would FAIL the compare, not be
    * mirrored by it.
    */
  def gramNovelty(docs: DataFrame, idCol: String, textCol: String,
                  k: Int = 3): DataFrame = {
    val grams = Dedup.hashedShingleTable(docs, idCol, textCol, k).scopedPersist()
    val firstOwner = grams.groupBy(col("sh"))
      .agg(min(col("doc_id")).as("first_doc"))
    grams.join(firstOwner, "sh")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
          .cast("long").as("n_novel"))
      .withColumn("novelty_permille",
        expr("n_novel * 1000 div n_grams").cast("long"))
  }

  /** DSIR-style importance SELECTION (the hashed-n-gram data-selection
    * scheme of Xie et al. 2023, "Data Selection for Language Models via
    * Importance Resampling"): score every RAW doc by how much its hashed
    * unigram feature distribution resembles the TARGET distribution
    * relative to the raw distribution, then keep the highest-scoring
    * docs up to a token budget.
    *
    * Feature = token hashed into one of `buckets` cells. Per bucket b,
    * with add-one smoothing over target counts ct/CT and raw counts
    * cr/CR, the weight is the INTEGER-SURROGATE likelihood ratio
    *   llr(b) = (S·num) div max(den, 1),  num = (S·(ct+1)) div (CT+B),
    *   den = (S·(cr+1)) div (CR+B),  S = 10⁴
    * i.e. the ratio of the two per-bucket rates in fixed-point, the same
    * no-cross-engine-log()-drift trick as the LM fluency score (DSIR
    * proper sums log-ratios; the ratio surrogate keeps the same ranking
    * signal and is bit-exact on both engines). S = 10⁴ (not 10⁶) keeps
    * every intermediate ≤ S·(count+1) < 2⁶³ for corpora up to ~10¹⁵
    * tokens — no overflow at any realistic scale. A doc's score is the
    * mean llr over its token instances (integer div — sum-of-llr would
    * favor long docs).
    *
    * Scale shape: the bucket id is md5-hex60 (SEMANTIC — it selects the
    * weight, so the oracle must derive the identical bucket; contrast the
    * xxhash64 join-key-only hashes of decontaminate/boilerplate); the
    * census and the per-doc profile both fold from ONE persisted
    * (doc, bucket) count relation (map-side combinable); the weight
    * table is exactly `buckets` rows — broadcast. The token-budget cut
    * is a GLOBAL ordered prefix, computed distributedly: range-partition
    * by (score desc, id), per-partition running sums, then partition
    * offsets (a partition-count-sized relation) broadcast back — no
    * single-task whole-corpus window anywhere. The prefix is a pure
    * function of the global (score, id) order, so the output does not
    * depend on where the range boundaries fall.
    *
    * Output: one row per SELECTED raw doc — doc_id, n_toks, score,
    * cum_toks (running token total in selection order).
    */
  def dsirSelect(docs: DataFrame, idCol: String, textCol: String,
                 isTarget: Column, buckets: Int, tokenBudget: Long): DataFrame = {
    require(buckets >= 2, s"dsirSelect: need >= 2 feature buckets, got $buckets")
    require(tokenBudget >= 1, s"dsirSelect: tokenBudget must be >= 1, got $tokenBudget")
    val S = 10000L
    val toks = filter(words(lower(col(textCol))), t => t =!= "")
    // explode RAW tokens, bucket in the projection AFTER: md5 inside the
    // transform() lambda evaluates interpreted per element (higher-order
    // lambdas don't codegen), measured 11× slower than the codegen'd
    // post-explode projection at sf0.1 (3.4 s vs 0.3 s for the same rows)
    val inst = docs.select(col(idCol).as("doc_id"), isTarget.as("is_t"),
      explode(toks).as("__tk"))
      .select(col("doc_id"), col("is_t"),
        (Dedup.hex60(md5(concat(lit("dsir:"), col("__tk")).cast("binary")))
          % buckets.toLong).as("b"))
    val perDocB = inst.groupBy(col("doc_id"), col("is_t"), col("b"))
      .agg(count(lit(1)).as("c")).scopedPersist()
    // persisted: the buckets-row relation feeds BOTH the totals
    // aggregate and the crossJoin left side — without it the full
    // perDocB aggregation pass runs twice (Spark does not dedup the two
    // uncached census subtrees)
    val census = perDocB.groupBy(col("b"))
      .agg(sum(when(col("is_t"), col("c")).otherwise(0L)).as("ct"),
        sum(when(!col("is_t"), col("c")).otherwise(0L)).as("cr"))
      .scopedPersist()
    val totals = census.agg(sum(col("ct")).as("tot_t"), sum(col("cr")).as("tot_r"))
    val wt = census.crossJoin(broadcast(totals)) // 1-row scalar shape
      .select(col("b"), expr(
        s"($S * (($S * (ct + 1)) div (tot_t + $buckets))) " +
          s"div greatest(($S * (cr + 1)) div (tot_r + $buckets), 1)").as("llr"))
    val scored = perDocB.filter(!col("is_t"))
      .join(broadcast(wt), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_toks"), sum(col("c") * col("llr")).as("llr_sum"))
      .withColumn("score", expr("llr_sum div n_toks"))
    // distributed global prefix sum: partition ids are frozen by the
    // persist so the offsets and the local sums see the same layout
    val ranged = scored.repartitionByRange(col("score").desc, col("doc_id").asc)
      .withColumn("__pid", spark_partition_id())
      .scopedPersist()
    val ord = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__pid"))
      .orderBy(col("score").desc, col("doc_id").asc)
    val offsets = ranged.groupBy(col("__pid")).agg(sum(col("n_toks")).as("__pt"))
      .withColumn("__off", coalesce(sum(col("__pt")).over(
        org.apache.spark.sql.expressions.Window.orderBy(col("__pid"))
          .rowsBetween(Long.MinValue, -1)), lit(0L)))
      .select(col("__pid"), col("__off"))
    ranged.join(broadcast(offsets), Seq("__pid"))
      .withColumn("cum_toks", col("__off") + sum(col("n_toks")).over(ord))
      .filter(col("cum_toks") <= tokenBudget)
      .select(col("doc_id"), col("n_toks"), col("score"), col("cum_toks"))
  }

  /** BPE MERGE TRAINING — `rounds` greedy merge steps of byte-pair
    * encoding over the corpus word vocabulary (the tokenizer-TRAINING
    * loop; `q_bpe_pairs` is the one-shot census this iterates). Each
    * round: count adjacent symbol pairs weighted by word frequency, pick
    * the most frequent (ties → lexicographically smallest pair), merge
    * it greedily left-to-right in every word, repeat.
    *
    * The symbol sequence rides as a DELIMITED STRING — every symbol
    * wrapped in its own U+0001 pair ("␁a␁␁b␁…") — so the greedy
    * left-to-right merge is exactly ONE literal string replacement:
    * replace("␁p1␁␁p2␁" → "␁p1p2␁"). Left-to-right non-overlapping
    * replace-all IS greedy BPE semantics ("aaa" + (a,a) → [aa, a]), the
    * per-symbol delimiter pairs make adjacent matches share no
    * characters ("abab" merges BOTH pairs in one pass), and a pattern
    * can never match inside a merged symbol because symbol interiors
    * contain no delimiter. Both engines' replace() scan left-to-right,
    * so the oracle is bit-exact. Vocabulary is restricted to /[a-z]+/
    * word shapes (the standard letters-only pre-tokenization split; it
    * also guarantees U+0001 never collides with symbol text).
    *
    * Scale shape: everything after the word census is VOCABULARY-sized
    * (the HF-tokenizers trainer shape — count words once, train on the
    * vocab). r17: the merge loop runs ON THE DRIVER over the collected
    * (count, word) census — exactly where HuggingFace tokenizers and
    * SentencePiece run their merge/EM loops. The census collect is
    * vocabulary-sized (Heaps-law-bounded distinct [a-z]+ words: the
    * model's own working set, the same scale class as the per-round
    * argmax collects this loop already made), and the one corpus-sized
    * pass stays distributed. The former spelling ran every round as a
    * Spark pair-census job + 1-row argmax collect + localCheckpoint over
    * that same vocabulary-sized relation: 50 rounds = ~150 per-round
    * jobs of pure scheduling overhead (7.2 s at sf0.1 for a 31-word
    * vocabulary; guide §1.2 — fix the distributed algorithm first). The
    * greedy semantics are reproduced operation-for-operation (weighted
    * adjacent-pair census including within-word duplicates, argmax by
    * (cnt desc, p1 asc, p2 asc), left-to-right non-overlapping literal
    * replace — Java String.replace performs the same scan as the
    * quoted-literal regexp_replace), so the trained merge table is
    * bit-identical and the DuckDB oracle is untouched.
    */
  def bpeTrain(docs: DataFrame, textCol: String, rounds: Int): DataFrame = {
    require(rounds >= 1, s"bpeTrain: rounds must be >= 1, got $rounds")
    val spark = docs.sparkSession
    val Sep = "\u0001"
    // the one corpus-sized pass: distributed word census, collected at
    // vocabulary scale; each word enters as its delimited symbol string
    val vocab0: Array[(Long, String)] = collectBounded(docs
      .select(explode(words(lower(col(textCol)))).as("w"))
      .filter(col("w").rlike("^[a-z]+$"))
      .groupBy(col("w")).agg(count(lit(1)).as("c")), "bpeTrain")
      .map(r => (r.getLong(1), r.getString(0).map(ch => s"$Sep$ch$Sep").mkString))
    var cur = vocab0
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    val sepsep = java.util.regex.Pattern.quote(Sep + Sep)
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      // weighted adjacent-pair census -- every occurrence counts,
      // including duplicates within a word (the zip_with(slice, slice)
      // explode semantics)
      val cnt = scala.collection.mutable.HashMap.empty[(String, String), Long]
      cur.foreach { case (c, s) =>
        val syms = s.substring(1, s.length - 1).split(sepsep, -1)
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          cnt.update(k, cnt.getOrElse(k, 0L) + c)
          i += 1
        }
      }
      if (cnt.isEmpty) exhausted = true // every word is one symbol: nothing left to merge
      else {
        // argmax by (cnt desc, p1 asc, p2 asc): Java String compareTo on
        // [a-z]+ symbol text is the same binary order Spark's UTF8String
        // sort used, so ties break identically
        val ((p1, p2), c) = cnt.minBy { case ((a, b), n) => (-n, a, b) }
        out += ((r, p1, p2, c))
        // left-to-right non-overlapping LITERAL replace-all: Java
        // String.replace scans exactly like the quoted-literal
        // regexp_replace both engines ran -- greedy BPE semantics
        val pat = s"$Sep$p1$Sep$Sep$p2$Sep"
        val rep = s"$Sep$p1$p2$Sep"
        cur = cur.map { case (cc, s) => (cc, s.replace(pat, rep)) }
        r += 1
      }
    }
    import spark.implicits._
    out.toSeq.toDF("step", "sym_left", "sym_right", "freq")
  }

  /** BPE ENCODE — apply a TRAINED merge table to the corpus (the step a
    * training run actually ships; Sennrich et al. 2016 §3; reference
    * analogue: the split/replace transform pair, src/utils/transform.ts:
    * 79-101, is the schema). Merges apply in TRAINING RANK ORDER, each as
    * the same delimited-string left-to-right replace-all that bpeTrain
    * used — encode replays training exactly, so encode(train(corpus))
    * round-trips the training vocabulary by construction.
    *
    * Symbol ids are deterministic model metadata: 'a'..'z' -> 1..26,
    * merge step r -> 26 + r (symbol text = left || right). 0 is reserved
    * for OOV and never produced for in-alphabet words.
    *
    * Scale shape (the q_text_cms lesson): the merge chain — K nested
    * regexp_replace calls, all codegen'd — runs once per DISTINCT word
    * (vocabulary-sized, like the trainer), and token instances get their
    * id arrays by broadcast-joining the encoded vocabulary back to the
    * (doc, pos, word) stream. The merge table itself is driver state
    * (K rows) folded into the expression — nothing corpus-sized ships.
    */
  def bpeEncode(docs: DataFrame, idCol: String, textCol: String,
                merges: Seq[(String, String)], maxWords: Int = Int.MaxValue): DataFrame = {
    val toks = bpeWordStream(docs, idCol, textCol, maxWords)
    val vocab = toks.select(col("w")).distinct()
      .withColumn("ids", bpeEncodeIds(col("w"), merges))
    toks.join(broadcast(vocab), Seq("w"))
      .groupBy(col(idCol))
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("r"), col("ids")))),
        e => e.getField("ids"))).as("token_ids"))
  }

  /** The eligible-word stream shared by encode and its oracle: lowercased
    * whitespace words restricted to the /[a-z]+/ training alphabet, ranked
    * per doc by original position, first `maxWords` kept. */
  private[ops] def bpeWordStream(docs: DataFrame, idCol: String, textCol: String,
                            maxWords: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    docs.select(col(idCol),
        posexplode(words(lower(col(textCol)))).as(Seq("pos", "w")))
      .filter(col("w").rlike("^[a-z]+$"))
      .withColumn("r", row_number().over(
        Window.partitionBy(col(idCol)).orderBy(col("pos"))))
      .filter(col("r") <= maxWords)
      .select(col(idCol), col("r"), col("w"))
  }

  /** word -> array<int> of BPE token ids under the trained merge chain. */
  def bpeEncodeIds(word: Column, merges: Seq[(String, String)]): Column = {
    val Sep = ""
    val init = regexp_replace(word, "(.)", s"$Sep$$1$Sep")
    val merged = merges.foldLeft(init) { case (s, (p1, p2)) =>
      // quoted-literal replace-all: identical left-to-right non-overlapping
      // greedy scan on both engines (see bpeTrain); p1/p2 are [a-z]+ so the
      // replacement string needs no escaping
      regexp_replace(s,
        java.util.regex.Pattern.quote(s"$Sep$p1$Sep$Sep$p2$Sep"),
        s"$Sep$p1$p2$Sep")
    }
    val syms = split(trim(merged, Sep), java.util.regex.Pattern.quote(Sep + Sep))
    // text -> id is FIRST-wins: two steps can mint the same symbol text
    // ((a,bc) then (ab,c) both yield 'abc') and the delimited string can't
    // tell them apart — the oracle's CASE chain takes the first match, so
    // the map must too (reverse.toMap keeps the earliest step for a dup key)
    val mergedIds = merges.zipWithIndex.reverse
      .map { case ((p1, p2), i) => (p1 + p2, 27 + i) }.toMap
    val idOf: Column => Column =
      if (mergedIds.isEmpty) sym => ascii(sym) - lit(96)
      else sym => coalesce(element_at(typedLit(mergedIds), sym), ascii(sym) - lit(96))
    transform(syms, idOf)
  }

  /** BPE DECODE — the inverse of [[bpeEncodeIds]]: token ids back to
    * text. Ids are pure model metadata ('a'..'z' = 1..26, merge step r =
    * 26+r with symbol text left||right), so decoding is one broadcast
    * id→text map folded into a codegen'd transform + concat — no joins,
    * no shuffle beyond whatever the caller already has. Unknown ids
    * decode to the empty string (OOV id 0 included) rather than
    * corrupting neighbors.
    */
  def bpeDecodeText(ids: Column, merges: Seq[(String, String)]): Column = {
    val symText: Map[Int, String] =
      (1 to 26).map(i => i -> ('a' + i - 1).toChar.toString).toMap ++
        merges.zipWithIndex.map { case ((p1, p2), i) => (27 + i) -> (p1 + p2) }
    concat_ws("", transform(ids,
      id => coalesce(element_at(typedLit(symText), id), lit(""))))
  }

  /** Cross-doc exact-substring dedup with REMOVAL semantics (the shape of
    * Lee et al. 2022's ExactSubstr deduplication, adapted from suffix-array
    * maximal matches to the repo's 5-gram-run approximation): a token
    * position is duplicated iff one of the n-grams covering it appears in
    * >= 2 distinct docs AND this doc is not the gram's canonical witness
    * (min doc id — exactly one occurrence of every duplicated run
    * survives). Emits (id, cleaned_text, n_removed_chars, n_removed_toks)
    * for EVERY input doc; cleaned_text is the surviving tokens joined by
    * single spaces, and n_removed_chars is measured against the same
    * whitespace-normalized rendering so both engines count identically.
    *
    * Scale shape: one gram census shuffle (map-side-combinable), one
    * covered-index anti-join, one per-doc reassembly — every stage is
    * token-instance-bound, no per-token driver work, no all-pairs
    * anything. Grams are xxhash64'd (the oracle keeps raw strings — the
    * usual collision safety net).
    */
  def removeDupSpans(docs: DataFrame, idCol: String, textCol: String, n: Int = 5): DataFrame = {
    require(n >= 2, s"removeDupSpans: n-gram width must be >= 2, got $n")
    val base = docs.select(col(idCol), words(col(textCol)).as("ws"))
    val toks = base.select(col(idCol), posexplode(col("ws")).as(Seq("idx", "tok")))
    // read twice (census + covered-index join) — persist, or the
    // explode+hash subplan runs once per consumer
    val grams = base.select(col(idCol),
        posexplode(wordNgrams(col("ws"), n)).as(Seq("pos", "gs")))
      .select(col(idCol), col("pos"), xxhash64(col("gs")).as("g"))
      .scopedPersist()
    val census = grams.groupBy(col("g"))
      .agg(countDistinct(col(idCol)).as("df"), min(col(idCol)).as("windoc"))
      .filter(col("df") >= 2)
    val rm = grams.join(census, Seq("g"))
      .filter(col(idCol) =!= col("windoc"))
      .select(col(idCol), explode(sequence(col("pos"), col("pos") + lit(n - 1))).as("idx"))
      .distinct()
    val kept = toks.join(rm, Seq(idCol, "idx"), "left_anti")
      .groupBy(col(idCol))
      .agg(array_join(transform(array_sort(collect_list(struct(col("idx"), col("tok")))),
        e => e.getField("tok")), " ").as("cleaned_text"))
    val nRm = rm.groupBy(col(idCol)).agg(count(lit(1)).as("n_removed_toks"))
    docs.select(col(idCol), array_join(words(col(textCol)), " ").as("norm"))
      .join(kept, Seq(idCol), "left")
      .join(nRm, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("cleaned_text"), lit("")).as("cleaned_text"),
        (length(col("norm")) - length(coalesce(col("cleaned_text"), lit(""))))
          .cast("long").as("n_removed_chars"),
        coalesce(col("n_removed_toks"), lit(0L)).as("n_removed_toks"))
  }

  /** RAG-STYLE CHUNKING with overlap: split each doc into `size`-char
    * windows every `stride` chars (overlap = size − stride), the
    * retrieval-index preprocessing step every RAG/embedding pipeline
    * runs before embedding. Chunk count is a closed-form ceil —
    * n = ⌈(len − size)/stride⌉ + 1, floor 1 — so the op is ONE
    * map-side sequence-explode + substring per row: no shuffle, no
    * state, output ∝ input × (size/stride). The last chunk is the
    * natural short tail (substring clamps); chunk ids and starts are
    * per-doc ordinals, so downstream embedding joins are (doc_id,
    * chunk_id)-keyed.
    */
  def chunkText(docs: DataFrame, idCol: String, textCol: String,
                size: Int, stride: Int): DataFrame = {
    require(size >= 1 && stride >= 1 && stride <= size,
      s"chunkText: need 1 <= stride <= size, got size=$size stride=$stride")
    docs.select(col(idCol), col(textCol).as("t"), length(col(textCol)).cast("long").as("len"))
      .withColumn("n_chunks",
        when(col("len") <= size, lit(1L))
          .otherwise(expr(s"(len - $size + $stride - 1) div $stride + 1")))
      .select(col(idCol), col("t"),
        explode(sequence(lit(0L), col("n_chunks") - 1)).as("chunk_id"))
      .select(col(idCol), col("chunk_id"),
        (lit(1L) + col("chunk_id") * stride).as("chunk_start"),
        expr(s"substring(t, cast(1 + chunk_id * $stride as int), $size)").as("chunk_text"))
  }

  /** T5-style span corruption manifest (Raffel et al. 2020 §3.1.4's
    * denoising objective, as a DATA-PIPELINE op): deterministically
    * sample ~15% of each doc's tokens in spans (start every ~`startMod`
    * tokens, span length `minSpan`..`minSpan+spanMods-1`, overlaps
    * merged), replace each span with an ordinal `<extra_id_k>` sentinel
    * in the corrupted input, and emit the masked spans (sentinel +
    * tokens) as the target — the (inputs, targets) pair a denoising
    * pretrain run consumes.
    *
    * Sampling is a PURE INTEGER formula of (doc id, position) — not an
    * engine hash — so the oracle replays it bit-for-bit and the
    * manifest is reproducible across engines and runs. Every stage is
    * token-instance-bound: one anti-join for survivors, gaps-and-islands
    * for span assembly, per-doc ordered reassembly (the q_vocab_encode
    * shape); nothing is corpus-quadratic.
    */
  def spanCorrupt(docs: DataFrame, idCol: String, textCol: String,
                  startMod: Int = 20, minSpan: Int = 2, spanMods: Int = 3): DataFrame = {
    require(startMod >= 1 && minSpan >= 1 && spanMods >= 1,
      s"spanCorrupt: startMod/minSpan/spanMods must be >= 1, got $startMod/$minSpan/$spanMods")
    // NOTE for oracle authors: the q_mask_spans SQL replay enumerates
    // span offsets with range(0, 4) — widen it if minSpan+spanMods-1 > 4
    import org.apache.spark.sql.expressions.Window
    val base = docs.select(col(idCol), words(col(textCol)).as("ws"))
    // the corpus-wide token explosion feeds THREE consumers (starts,
    // the survivor anti-join, span-body assembly) — persist it, or the
    // split+explode subplan runs once per consumer
    val toks = base.select(col(idCol), size(col("ws")).as("n"),
      posexplode(col("ws")).as(Seq("idx", "tok")))
      .scopedPersist()
    // span starts + lengths: small-integer arithmetic only (no overflow
    // under ANSI; identical in DuckDB)
    val starts = toks
      .filter(((col(idCol) % 100003L) * 31 + col("idx") * 17 + 7) % startMod === 0)
      .select(col(idCol), col("idx"),
        (lit(minSpan) + (col(idCol) + col("idx")) % spanMods).as("len"), col("n"))
    val masked = starts.select(col(idCol),
        explode(sequence(col("idx"),
          least(col("idx") + col("len") - 1, col("n") - 1))).as("idx"))
      .distinct().scopedPersist() // feeds islands AND the survivor anti-join
    val isl = masked.withColumn("grp",
      col("idx") - row_number().over(Window.partitionBy(col(idCol)).orderBy(col("idx"))))
    val spans = isl.groupBy(col(idCol), col("grp"))
      .agg(min(col("idx")).as("s"), max(col("idx")).as("e"))
      .withColumn("k",
        row_number().over(Window.partitionBy(col(idCol)).orderBy(col("s"))) - 1)
      .scopedPersist() // sentinel rows + target assembly both read it
    val sentinel = concat(lit("<extra_id_"), col("k").cast("string"), lit(">"))
    // corrupted input: surviving tokens keyed by their index, sentinels
    // keyed by their span start (the start token is masked, so keys
    // never collide), one ordered reassembly per doc
    val pieces = toks.join(masked, Seq(idCol, "idx"), "left_anti")
      .select(col(idCol), col("idx").as("key"), col("tok").as("piece"))
      .unionByName(spans.select(col(idCol), col("s").as("key"), sentinel.as("piece")))
    val corrupted = pieces.groupBy(col(idCol))
      .agg(array_join(transform(array_sort(collect_list(struct(col("key"), col("piece")))),
        e => e.getField("piece")), " ").as("corrupted"))
    // target: per span, sentinel + its masked tokens; per doc, spans in order
    val spanToks = isl.join(toks.select(col(idCol), col("idx"), col("tok")), Seq(idCol, "idx"))
      .groupBy(col(idCol), col("grp"))
      .agg(array_join(transform(array_sort(collect_list(struct(col("idx"), col("tok")))),
        e => e.getField("tok")), " ").as("body"))
    val target = spans.join(spanToks, Seq(idCol, "grp"))
      .select(col(idCol), col("k"), col("s"), concat(sentinel, lit(" "), col("body")).as("piece"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_spans"),
        array_join(transform(array_sort(collect_list(struct(col("k"), col("piece")))),
          e => e.getField("piece")), " ").as("target"))
    val nMasked = masked.groupBy(col(idCol)).agg(count(lit(1)).as("n_masked"))
    docs.select(col(idCol), array_join(words(col(textCol)), " ").as("norm"))
      .join(corrupted, Seq(idCol), "left")
      .join(target, Seq(idCol), "left")
      .join(nMasked, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_masked"), lit(0L)).as("n_masked"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("corrupted"), col("norm")).as("corrupted"),
        coalesce(col("target"), lit("")).as("target"))
  }

  /** Exact class-balanced undersampling (the imbalanced-learning
    * "shrink every class to the minority size" primitive) WITHOUT a
    * per-class global sort: keep, per class, the m rows with the
    * smallest content-free hash keys (m = minority class count), found
    * by two-phase distributed selection. Phase 1 censuses the
    * 4096-bucket histogram of the hash's top 12 bits per class
    * (class×4096 rows — dimension-sized; the cumulative window runs
    * over THAT census, never rows) and locates the boundary bucket
    * where the cumulative count crosses m; phase 2 ranks only the
    * boundary bucket's rows (≈ n_class/4096). The kept set is exactly
    * the m smallest (hash, id) pairs per class — a plain window rank
    * spells the same set, which is what the oracle does; this shape
    * just refuses the majority class's full sort at 100 TB.
    *
    * Returns (__cls, __id, __h) of kept rows.
    */
  def balancedSample(df: DataFrame, classCol: String, idCol: String,
                     tag: String = "bal"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = Dedup.hex60(
      md5(concat(lit(tag + ":"), col(idCol).cast("string")).cast("binary")))
    val rows = df.select(col(classCol).as("__cls"), col(idCol).as("__id"),
        h.as("__h"))
      .withColumn("__b", shiftright(col("__h"), 48))
      .scopedPersist()
    val m = rows.groupBy(col("__cls")).agg(count(lit(1)).as("n_c"))
      .agg(min(col("n_c")).as("m")) // 1-row scalar
    val census = rows.groupBy(col("__cls"), col("__b"))
      .agg(count(lit(1)).as("bn"))
    val wc = Window.partitionBy(col("__cls")).orderBy(col("__b"))
    val cum = census.withColumn("cum", sum(col("bn")).over(wc))
      .crossJoin(broadcast(m))
    // boundary bucket + how many of its rows are still needed; both
    // derived from the census, so the relation is classes-sized
    val boundary = cum.filter(col("cum") >= col("m"))
      .groupBy(col("__cls")).agg(min(col("__b")).as("b_c"))
    val need = cum.join(boundary, Seq("__cls"))
      .filter(col("__b") === col("b_c"))
      .select(col("__cls"), col("b_c"),
        (col("m") - (col("cum") - col("bn"))).as("need"))
    val keptBelow = rows.join(broadcast(need), Seq("__cls"))
      .filter(col("__b") < col("b_c"))
    val wb = Window.partitionBy(col("__cls")).orderBy(col("__h"), col("__id"))
    val keptBoundary = rows.join(broadcast(need), Seq("__cls"))
      .filter(col("__b") === col("b_c"))
      .withColumn("__rn", row_number().over(wb))
      .filter(col("__rn") <= col("need"))
    keptBelow.select("__cls", "__id", "__h")
      .unionByName(keptBoundary.select("__cls", "__id", "__h"))
  }

  def piiRedact(c: Column): Column =
    regexp_replace(regexp_replace(c, emailPattern, "[EMAIL]"), phonePattern, "[PHONE]")

  def piiEmailCount(c: Column): Column = regexp_count(c, lit(emailPattern)).cast("long")
  def piiPhoneCount(c: Column): Column = regexp_count(c, lit(phonePattern)).cast("long")

  /** EXACT-SUBSTRING dedup statistics via DISTRIBUTED PREFIX DOUBLING —
    * the suffix-array construction of Lee et al. 2022 ("Deduplicating
    * Training Data Makes Language Models Better", ExactSubstr), run as
    * the Manber–Myers doubling recursion over the corpus token stream:
    * round j assigns every in-document token position an EQUALITY CLASS
    * for its 2^j-token window by pairing round j−1's classes at
    * (pos, pos + 2^(j−1)) — log2(minRun) sort/join rounds, each a
    * constant number of long-keyed shuffles. The shuffle payload is two
    * BIGINT class ids per position, never the window text (a 16-token
    * window is ~100 bytes; the class pair is 16 — the reason the paper
    * builds suffix structures instead of grouping raw n-grams at scale).
    * Class ids are exact (min packed position of the class, no hashing),
    * so a window is duplicated iff its class has ≥ 2 members — the same
    * census the suffix array's LCP run would yield, with the LCP capped
    * at minRun, which is all the ≥-threshold removal decision needs.
    *
    * Per doc: token count, duplicated-window starts (count ≥ 2 at
    * length minRun), exact token coverage of the union of duplicated
    * windows (the span ExactSubstr removes), and the largest
    * power-of-two duplicated window length ≤ minRun. Positions whose
    * window would overrun the document simply drop out of round j+1
    * (the inner join on the shifted partner), so every class is over
    * full windows only.
    *
    * Scale shape: rounds = log2(minRun) — corpus-size-INDEPENDENT; each
    * round's relations are token-stream-sized and shrink monotonically.
    * Per-round localCheckpoint truncates the doubling lineage (the
    * iterated-op discipline). The packed position doc_id·2^20 + pos
    * requires docs under 2^20 tokens — asserted.
    */
  /** Shared doubling core for the suffix tier: token stream, doc
    * lengths, per-level duplicated-start relations, and the final
    * class table (doc_id, pos, gp, cls, cnt) at window length minRun.
    */
  /** Session memo for the doubling result — q_text_suffix_dedup and
    * q_text_suffix_rm share one doubling per corpus instead of paying
    * the log-round build twice; the checkpointed relations are
    * token-stream-sized. Deterministic: the classes are a pure function
    * of the input.
    *
    * Bounded to ONE entry, keyed by (SparkSession identity, analyzed
    * semanticHash, cols, minRun): a new corpus (or a new session — a
    * hash collision across sessions would otherwise hand back
    * DataFrames bound to a stopped session) replaces the old one, and
    * replacement UNPERSISTS the evicted entry's relations — both the
    * scopedPersist'd token/length tables (plan-cache unpersist) and
    * every round's localCheckpoint RDD (LogicalRDD-level unpersist;
    * `clearCache()` never frees those), so multi-dir sessions
    * (ScaleCurve) don't accumulate token-stream-sized blocks for the
    * JVM lifetime. */
  private type SuffixEntry = (DataFrame, DataFrame, Seq[(Long, DataFrame)], DataFrame)
  private var suffixMemo: Option[((org.apache.spark.sql.SparkSession, Int, String, String, Int), SuffixEntry)] = None
  // harness storage clears destroy the memoized checkpoint blocks — drop
  // the entry so the next access rebuilds (see CacheScope.StorageMemos)
  StorageMemos.register(() => synchronized {
    suffixMemo.foreach { case (_, v) => releaseSuffixEntry(v) }
    suffixMemo = None
  })

  /** Free an evicted entry: unpersist the cached tables, then walk every
    * stored plan for LogicalRDD nodes (the localCheckpoint anchors) and
    * unpersist their RDDs. Never throws — eviction is best-effort. */
  private def releaseSuffixEntry(v: SuffixEntry): Unit = {
    val (toks, lens, contribs, t) = v
    try toks.unpersist() catch { case _: Throwable => () }
    try lens.unpersist() catch { case _: Throwable => () }
    (contribs.map(_._2) :+ t).foreach { df =>
      try df.queryExecution.analyzed.foreach {
        case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.unpersist(false); ()
        case _ => ()
      } catch { case _: Throwable => () }
    }
  }

  private def suffixDoubling(docs: DataFrame, idCol: String, textCol: String,
      minRun: Int): (DataFrame, DataFrame, Seq[(Long, DataFrame)], DataFrame) =
    synchronized {
      // session carried by REFERENCE (ADVICE r15: identityHashCode can be
      // reused after a stopped session is GC'd); the tuple's equality on
      // the session slot is reference equality since SparkSession doesn't
      // override equals
      val key = (docs.sparkSession,
        docs.queryExecution.analyzed.semanticHash(), idCol, textCol, minRun)
      suffixMemo match {
        case Some((k, v)) if k == key => v
        case prev =>
          val built = suffixDoublingBuild(docs, idCol, textCol, minRun)
          prev.foreach { case (_, v) => releaseSuffixEntry(v) }
          suffixMemo = Some(key -> built)
          built
      }
    }

  private def suffixDoublingBuild(docs: DataFrame, idCol: String, textCol: String,
      minRun: Int): (DataFrame, DataFrame, Seq[(Long, DataFrame)], DataFrame) = {
    require(minRun >= 2 && (minRun & (minRun - 1)) == 0,
      s"suffix doubling: minRun must be a power of two >= 2, got $minRun")
    val toks = docs.select(col(idCol).cast("long").as("doc_id"),
        posexplode(words(col(textCol))).as(Seq("pos0", "w")))
      .select(col("doc_id"), (col("pos0") + 1).cast("long").as("pos"), col("w"))
      .repartition(col("doc_id"))
      .scopedPersist()
    val lens = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("n_tokens"))
      .scopedPersist()
    // assert the packing invariant loudly (one metadata-scale row)
    val maxLen = lens.agg(max(col("n_tokens"))).head.getLong(0)
    require(maxLen < (1L << 20),
      s"suffix doubling: document of $maxLen tokens overflows the 2^20 position packing")
    val gpCol = (col("doc_id") * lit(1L << 20) + col("pos")).as("gp")
    // class at length 1 = the token itself; ids = min packed position
    def reclass(pairs: DataFrame, keys: Seq[String]): DataFrame = {
      val ids = pairs.groupBy(keys.map(col): _*)
        .agg(min(col("gp")).as("ncls"), count(lit(1)).as("cnt"))
      pairs.join(ids, keys)
        .select(col("doc_id"), col("pos"), col("gp"),
          col("ncls").as("cls"), col("cnt"))
    }
    var t = reclass(toks.withColumn("gp", gpCol), Seq("w"))
      .localCheckpoint(false)
    // (window length, duplicated-start positions at that length)
    val contribs = scala.collection.mutable.ArrayBuffer[(Long, DataFrame)](
      1L -> t.where(col("cnt") >= 2).select(col("doc_id"), col("pos")))
    var step = 1L
    while (step < minRun) {
      val partner = t.select(col("doc_id"), (col("pos") - step).as("pos"),
        col("cls").as("cls2"))
      val pairs = t.select(col("doc_id"), col("pos"), col("gp"), col("cls"))
        .join(partner, Seq("doc_id", "pos")) // inner: overruns drop out
      t = reclass(pairs, Seq("cls", "cls2")).localCheckpoint(false)
      step *= 2
      contribs += (step -> t.where(col("cnt") >= 2).select(col("doc_id"), col("pos")))
    }
    (toks, lens, contribs.toSeq, t)
  }

  def suffixDupStats(docs: DataFrame, idCol: String, textCol: String,
                     minRun: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (_, lens, contribs, _) = suffixDoubling(docs, idCol, textCol, minRun)
    // largest duplicated power-of-two window per doc
    val maxPow = contribs.map { case (l, df) => df.select(col("doc_id"), lit(l).as("dlen")) }
      .reduce(_ unionAll _)
      .groupBy(col("doc_id")).agg(max(col("dlen")).as("max_dup_len"))
    // duplicated minRun-window starts + exact union coverage per doc
    val dupStarts = contribs.last._2
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cover = dupStarts
      .withColumn("prev_end", max(col("pos") + lit(minRun.toLong)).over(w))
      .withColumn("add", greatest(lit(0L),
        col("pos") + lit(minRun.toLong)
          - greatest(coalesce(col("prev_end"), col("pos")), col("pos"))))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_dup_starts"), sum(col("add")).as("dup_cover_toks"))
    lens
      .join(cover, Seq("doc_id"), "left")
      .join(maxPow, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_dup_starts"), lit(0L)).as("n_dup_starts"),
        coalesce(col("dup_cover_toks"), lit(0L)).as("dup_cover_toks"),
        coalesce(col("max_dup_len"), lit(0L)).as("max_dup_len"),
        expr("coalesce(dup_cover_toks, CAST(0 AS BIGINT)) * 1000000 div n_tokens")
          .as("dup_cover_ppm"))
  }

  /** EXACT-SUBSTRING REMOVAL (the ExactSubstr cleaned corpus, suffix-
    * array edition of [[removeDupSpans]]): every duplicated minRun-token
    * window keeps its CANONICAL occurrence — the class representative,
    * which IS the class id (min packed position), so canonicality costs
    * nothing extra — and every other occurrence's covered tokens are
    * cut. Returns (doc_id, cleaned_text, n_removed_chars,
    * n_removed_toks); docs reconstruct from kept tokens in position
    * order. Same doubling core, same log-round scale shape.
    */
  def suffixRemove(docs: DataFrame, idCol: String, textCol: String,
                   minRun: Int = 16): DataFrame = {
    val (toks, _, _, t) = suffixDoubling(docs, idCol, textCol, minRun)
    val rm = t.where(col("cnt") >= 2 && col("gp") =!= col("cls"))
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + lit(minRun - 1L))).as("pos"))
      .distinct()
    val kept = toks.join(rm, Seq("doc_id", "pos"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(array_join(transform(array_sort(collect_list(struct(col("pos"), col("w")))),
        e => e.getField("w")), " ").as("cleaned_text"))
    val nRm = rm.groupBy(col("doc_id")).agg(count(lit(1)).as("n_removed_toks"))
    docs.select(col(idCol).cast("long").as("doc_id"),
        array_join(words(col(textCol)), " ").as("norm"))
      .join(kept, Seq("doc_id"), "left")
      .join(nRm, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cleaned_text"), lit("")).as("cleaned_text"),
        (length(col("norm")) - length(coalesce(col("cleaned_text"), lit(""))))
          .cast("long").as("n_removed_chars"),
        coalesce(col("n_removed_toks"), lit(0L)).as("n_removed_toks"))
  }
}
