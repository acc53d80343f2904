package graft

import org.apache.spark.sql.functions._
import graft.ops.CorpusOps

class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  test("wordNgrams: counts and short-doc guard") {
    val df = Seq("a b c d", "a b", "").toDF("t")
      .select(CorpusOps.wordNgrams(CorpusOps.words(col("t")), 3).as("ng"))
    val out = df.as[Seq[String]].collect()
    assert(out(0) == Seq("a b c", "b c d"))
    assert(out(1).isEmpty) // 2 words < n=3: guarded, no descending-sequence garbage
    assert(out(2).isEmpty)
  }

  test("decontaminate: overlap counted on distinct ngrams only") {
    val docs = Seq(
      (1L, "the quick brown fox jumps", false),
      (2L, "quick brown fox runs far away", false), // shares "quick brown fox"
      (3L, "totally unrelated words here now", false),
      (10L, "the quick brown fox sleeps", true) // benchmark doc
    ).toDF("doc_id", "text", "bench")
    val out = CorpusOps.decontaminate(docs, "doc_id", "text", col("bench"), 3)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 2L, 2L -> 1L)) // doc1: "the quick brown","quick brown fox"; doc2: one
  }

  test("bpeTrain: greedy left-to-right merges, argmax tie-break, weighted census") {
    // "aaa"×3 + "ab"×2 → round1 (a,a) cnt 6; greedy makes "aaa" [aa,a]
    // (NOT [aa,aa]), so round2 sees (aa,a) cnt 3; round3 picks up (a,b)
    val docs = Seq("aaa aaa aaa ab ab").toDF("text")
    val out = CorpusOps.bpeTrain(docs, "text", rounds = 3)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(out.toSeq == Seq((1, "a", "a", 6L), (2, "aa", "a", 3L), (3, "a", "b", 2L)))
  }

  test("bpeTrain: adjacent occurrences both merge in one pass; exhaustion stops early") {
    // "abab"×2: round1 (a,b) cnt 4 → BOTH pairs merge in the same round
    // ([ab,ab], not [ab,a,b]) so round2 is (ab,ab); after that every
    // word is one symbol and round3 has no pairs → 2 rows, not 3
    val docs = Seq("abab abab").toDF("text")
    val out = CorpusOps.bpeTrain(docs, "text", rounds = 3)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(out.toSeq == Seq((1, "a", "b", 4L), (2, "ab", "ab", 2L)))
  }

  test("bpeEncode: applies trained merges in rank order, ids flattened per doc") {
    // "aaa"×3, "ab"×3, "ba"×1 → round 1 (a,a)=6; round 2 ties (aa,a)=3
    // vs (a,b)=3 and p1-asc tie-break picks (a,b); round 3 (aa,a).
    // "aaa" segments to [aaa] (id 29 = step 3), "ab" to [ab] (id 28)
    val docs = Seq((1L, "aaa aaa aaa ab ab"), (2L, "ab ba")).toDF("doc_id", "text")
    val merges = CorpusOps.bpeTrain(docs, "text", rounds = 3)
      .orderBy("step").collect().map(r => (r.getString(1), r.getString(2))).toSeq
    assert(merges == Seq(("a", "a"), ("a", "b"), ("aa", "a")))
    val out = CorpusOps.bpeEncode(docs, "doc_id", "text", merges)
      .orderBy("doc_id").as[(Long, Seq[Int])].collect()
    assert(out(0) == ((1L, Seq(29, 29, 29, 28, 28))))
    assert(out(1) == ((2L, Seq(28, 2, 1)))) // "ba" has no (b,a) merge → letters
  }

  test("bpeEncode: encode(train(corpus)) round-trips every vocabulary word") {
    // every id sequence must decode (via the trained merge table) back to
    // its word, and every multi-char symbol id must be a trained step
    val docs = Seq(
      (1L, "the cat sat on the mat and the dog ran"),
      (2L, "then that other cat ran on and on"),
      (3L, "a dog and a cat and another dog")).toDF("doc_id", "text")
    val merges = CorpusOps.bpeTrain(docs, "text", rounds = 5)
      .orderBy("step").collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val symText: Map[Int, String] =
      (1 to 26).map(i => i -> ('a' + i - 1).toChar.toString).toMap ++
        merges.zipWithIndex.map { case ((p1, p2), i) => (27 + i) -> (p1 + p2) }
    val vocab = docs.select(explode(CorpusOps.words(lower(col("text")))).as("w"))
      .distinct().select(col("w"), CorpusOps.bpeEncodeIds(col("w"), merges).as("ids"))
      .as[(String, Seq[Int])].collect()
    assert(vocab.nonEmpty)
    vocab.foreach { case (w, ids) =>
      assert(ids.map(symText).mkString == w, s"decode mismatch for '$w'")
      assert(ids.forall(id => id >= 1 && id < 27 + merges.length))
    }
  }

  test("bpeTrain deep: 30 rounds stay well-formed — freqs non-increasing, every side a known symbol") {
    val docs = graft.engine.QueryBuilder.scan(spark, sf001, "documents")
    val out = CorpusOps.bpeTrain(docs, "text", rounds = 30)
      .orderBy(col("step")).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(out.map(_._1).toSeq == (1 to 30), "steps must be consecutive (no premature exhaustion)")
    // classic BPE invariant: the chosen pair count never increases round
    // to round (a freshly minted pair (ab,c) inherits at most (b,c)'s
    // count; existing pairs only lose occurrences)
    assert(out.sliding(2).forall { case Array(a, b) => b._4 <= a._4 },
      s"merge freqs increased: ${out.map(_._4).toSeq}")
    // every merge side is a single char or a previously minted symbol —
    // the merge table is a valid derivation chain (what encode replays)
    val known = scala.collection.mutable.Set.empty[String] ++ ('a' to 'z').map(_.toString)
    out.foreach { case (step, p1, p2, _) =>
      assert(known(p1) && known(p2), s"step $step merges unknown symbol ($p1, $p2)")
      known += p1 + p2
    }
  }

  test("bpeDecodeText inverts bpeEncodeIds; unknown ids decode to empty, not garbage") {
    val merges = Seq(("t", "h"), ("th", "e"))
    val out = Seq("the", "tht").toDF("w")
      .select(CorpusOps.bpeDecodeText(
        CorpusOps.bpeEncodeIds(col("w"), merges), merges).as("d"))
      .as[String].collect()
    assert(out.toSeq == Seq("the", "tht"))
    val oov = Seq(Seq(28, 0, 99, 1)).toDF("ids")
      .select(CorpusOps.bpeDecodeText(col("ids"), merges).as("d"))
      .as[String].collect().head
    assert(oov == "thea") // 28="the", 0/99 skipped, 1="a"
  }

  test("bpeEncodeIds: duplicated merged-symbol text resolves FIRST-wins") {
    // (b,c) then (a,bc) then (ab,c): steps 2 and 3 both mint text "abc";
    // the delimited string can't tell them apart, so text->id must take
    // the EARLIEST step (id 28), matching the oracle's CASE chain
    val merges = Seq(("b", "c"), ("a", "bc"), ("ab", "c"))
    val out = Seq("abc").toDF("w")
      .select(CorpusOps.bpeEncodeIds(col("w"), merges).as("ids"))
      .as[Seq[Int]].collect().head
    assert(out == Seq(28))
  }

  test("bpeEncode: maxWords keeps the first N eligible words only") {
    val docs = Seq((1L, "aa bb X7 cc dd")).toDF("doc_id", "text") // X7 ineligible
    val out = CorpusOps.bpeEncode(docs, "doc_id", "text", Nil, maxWords = 2)
      .as[(Long, Seq[Int])].collect().head
    assert(out == ((1L, Seq(1, 1, 2, 2)))) // aa bb; cc/dd beyond the cap
  }

  test("removeDupSpans: min-doc witness keeps one occurrence, others cut covered tokens") {
    val docs = Seq(
      (1L, "one two three four five six alpha beta"),
      (2L, "zzz one two three four five six qqq rrr sss ttt"),
      (3L, "totally different words in this third doc"),
      // within-doc repetition only: df counts DISTINCT docs, so untouched
      (4L, "p q r s t p q r s t")).toDF("doc_id", "text")
    val out = CorpusOps.removeDupSpans(docs, "doc_id", "text", n = 5)
      .orderBy("doc_id").as[(Long, String, Long, Long)].collect()
    // doc 1 is the canonical witness for the shared run: unchanged
    assert(out(0) == ((1L, "one two three four five six alpha beta", 0L, 0L)))
    // doc 2's grams at pos 1,2 are duplicated -> tokens 1..6 cut
    assert(out(1) == ((2L, "zzz qqq rrr sss ttt",
      "zzz one two three four five six qqq rrr sss ttt".length - "zzz qqq rrr sss ttt".length, 6L)))
    assert(out(2)._2 == "totally different words in this third doc" && out(2)._3 == 0L)
    assert(out(3)._2 == "p q r s t p q r s t" && out(3)._4 == 0L)
  }

  test("removeDupSpans: fully-duplicated doc empties; every input doc is emitted") {
    val docs = Seq(
      (10L, "a b c d e"), // exactly one 5-gram, canonical
      (20L, "a b c d e"), // same run -> everything cut
      (30L, "xx yy")).toDF("doc_id", "text") // < n tokens: no grams, kept
    val out = CorpusOps.removeDupSpans(docs, "doc_id", "text", n = 5)
      .orderBy("doc_id").as[(Long, String, Long, Long)].collect()
    assert(out.length == 3)
    assert(out(0) == ((10L, "a b c d e", 0L, 0L)))
    assert(out(1) == ((20L, "", 9L, 5L)))
    assert(out(2) == ((30L, "xx yy", 0L, 0L)))
  }

  test("spanCorrupt: formula-predicted spans, ordinal sentinels, targets carry the masked tokens") {
    // doc_id 0: starts where (idx*17 + 7) % 20 == 0 -> idx 9 hits
    // (9*17+7 = 160); len = 2 + (0+9)%3 = 2 -> mask idx 9,10
    val toks = (0 until 14).map(i => s"w$i")
    val docs = Seq((0L, toks.mkString(" "))).toDF("doc_id", "text")
    val out = CorpusOps.spanCorrupt(docs, "doc_id", "text")
      .as[(Long, Long, Long, String, String)].collect().head
    assert(out._2 == 2L && out._3 == 1L)
    val expectedCorrupted =
      (toks.take(9) ++ Seq("<extra_id_0>") ++ toks.drop(11)).mkString(" ")
    assert(out._4 == expectedCorrupted)
    assert(out._5 == "<extra_id_0> w9 w10")
  }

  test("spanCorrupt invariants: reconstruction, masking bounds, unmasked docs unchanged") {
    val docs = Seq(
      (1L, (0 until 60).map(i => s"t$i").mkString(" ")),
      (2L, "only three words"), // short doc may mask nothing
      (3L, "")).toDF("doc_id", "text")
    val out = CorpusOps.spanCorrupt(docs, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Long, String, String)].collect()
    assert(out.length == 3) // every doc emitted
    val norms = Map(1L -> (0 until 60).map(i => s"t$i").mkString(" "),
      2L -> "only three words", 3L -> "")
    out.foreach { case (id, nMasked, nSpans, corrupted, target) =>
      // sentinel sequences agree between input and target, and splicing
      // each target body back over its sentinel reconstructs the doc
      // exactly (doc tokens here never collide with the sentinel shape)
      val sent = "<extra_id_\\d+>".r
      val sentinels = sent.findAllIn(corrupted).toSeq
      assert(sentinels == sent.findAllIn(target).toSeq)
      assert(sentinels.length == nSpans)
      if (nMasked == 0) assert(target.isEmpty && nSpans == 0)
      // keep EMPTY bodies (an empty-text doc's lone "" token can be
      // masked, giving a sentinel with an empty span body)
      val bodies = target.split("<extra_id_\\d+>", -1).toSeq.drop(1).map(_.trim)
      assert(bodies.length == nSpans, s"doc $id bodies=$bodies")
      var spliced = corrupted
      sentinels.zip(bodies).foreach { case (sk, body) => spliced = spliced.replace(sk, body) }
      assert(spliced == norms(id), s"doc $id: '$spliced' != '${norms(id)}'")
    }
    // the long doc must actually be masked at roughly the target rate
    val (_, nMasked1, _, _, _) = out(0)
    assert(nMasked1 >= 3 && nMasked1 <= 60 * 4 / 10, s"rate off: $nMasked1/60")
  }

  test("dsirSelect: budget prefix is exact and invariant under input partitioning") {
    // target docs establish the "wanted" distribution; raw docs that share
    // the target's vocabulary must outscore the unrelated ones
    val target = (1 to 5).map(i => (100L + i, "alpha beta gamma delta", true))
    val similar = (1 to 4).map(i => (i.toLong, "alpha beta gamma epsilon", false))
    val noise = (5 to 8).map(i => (i.toLong, s"zeta$i eta$i theta$i iota$i kappa$i", false))
    val docs = (target ++ similar ++ noise).toDF("doc_id", "text", "is_t")
    val out = CorpusOps.dsirSelect(docs, "doc_id", "text", col("is_t"),
      buckets = 64, tokenBudget = 12L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    // 4-token docs, 12-token budget → exactly the 3 best-scoring raw docs,
    // which must be target-vocabulary docs, with an exact running total
    assert(out.map(_._1).toSet.subsetOf(similar.map(_._1).toSet), out.toSeq.toString)
    assert(out.map(_._3).sorted.toSeq == Seq(4L, 8L, 12L), out.toSeq.toString)
    // the two-phase distributed prefix must be a pure function of the
    // global (score, id) order: any input partitioning → same selection
    val out2 = CorpusOps.dsirSelect(docs.repartition(7), "doc_id", "text", col("is_t"),
      buckets = 64, tokenBudget = 12L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(out.sortBy(_._1).toSeq == out2.sortBy(_._1).toSeq)
  }

  test("sourceOverlap: viral fingerprint is capped, drop count observed, small groups kept") {
    // one fp shared by 1000 sources (the open-domain viral case), one by 3
    val viral = (1 to 1000).map(i => ("fpV", s"host$i"))
    val small = Seq(("fpS", "a"), ("fpS", "b"), ("fpS", "c"),
      ("fpS", "a"), // duplicate (fp, source) row — must not double-count
      (null.asInstanceOf[String], "a"), (null.asInstanceOf[String], "b")) // null fp: no group
    val fps = (viral ++ small).toDF("fp", "source")
    val obs = new org.apache.spark.sql.Observation()
    val out = CorpusOps.sourceOverlap(fps, "fp", "source", maxSources = 64, obs = Some(obs))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    // the viral fp contributes NO pairs (1000 > 64 → dropped, not 499500 structs in one row)
    assert(out == Set(("a", "b", 1L), ("a", "c", 1L), ("b", "c", 1L)))
    // and the cut is not silent: exactly one dropped fp is observed
    assert(obs.get("n_dropped_fps") == 1L)
  }

  test("repetitionStats: exact fractions on a crafted doc") {
    val docs = Seq((1L, "a a a b")).toDF("doc_id", "text")
    val r = CorpusOps.repetitionStats(docs, "doc_id", "text").head()
    assert(r.getAs[Double]("top_word_frac") == 0.75) // 'a' 3 of 4
    assert(r.getAs[Double]("type_token_ratio") == 0.5) // 2 distinct of 4
    // bigrams: "a a","a a","a b" → 2 distinct of 3
    assert(math.abs(r.getAs[Double]("dup_bigram_frac") - (1.0 - 2.0 / 3.0)) < 1e-15)
  }

  test("mixtureSample: rate caps at 1e6 ppm, keep is deterministic and rate-bound") {
    val docs = (1L to 300L).map { i =>
      (i, if (i % 3 == 0) "big" else "small", "w " * (if (i % 3 == 0) 50 else 5))
    }.toDF("id", "domain", "text")
    val toks = CorpusOps.words(col("text"))
    val w = when(col("domain") === "big", 0.2).otherwise(0.8)
    val out = CorpusOps.mixtureSample(docs, "id", "domain",
      size(toks), budget = 2000.0, weight = w)
    val rates = out.select(col("domain"), col("rate_ppm")).distinct()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // small: 200 docs × 5 toks = 1000; budget share 1600 > 1000 → capped
    assert(rates("small") == 1000000L)
    // big: 100 × 50 = 5000; 400/5000 = 0.08 → 80000 ppm
    assert(rates("big") == 80000L)
    // capped domain keeps everything; determinism across evaluations
    val kept1 = out.filter(col("keep")).select(col("id")).collect().map(_.getLong(0)).toSet
    val kept2 = out.filter(col("keep")).select(col("id")).collect().map(_.getLong(0)).toSet
    assert(kept1 == kept2)
    assert((1L to 300L).filter(i => i % 3 != 0).forall(kept1.contains))
  }

  test("temperatureMixture: alpha=0.5 upsamples the low-resource domain, exact integer rates") {
    // big: 100 docs × 50 toks = 5000; small: 200 × 5 = 1000
    val docs = (1L to 300L).map { i =>
      (i, if (i % 3 == 0) "big" else "small", "w " * (if (i % 3 == 0) 50 else 5))
    }.toDF("id", "domain", "text")
    val out = CorpusOps.temperatureMixture(docs, "id", "domain",
      size(CorpusOps.words(col("text"))), budget = 2000.0)
    val rates = out.select(col("domain"), col("rate_ppm")).distinct()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // isqrt weights: sq(big)=floor(√5000)=70, sq(small)=floor(√1000)=31, Z=101
    // big:   floor(2000·70/101·1e6/5000)  = 277227 ppm
    // small: floor(2000·31/101·1e6/1000)  = 613861 ppm
    assert(rates("big") == 277227L, s"big rate: ${rates("big")}")
    assert(rates("small") == 613861L, s"small rate: ${rates("small")}")
    // α-smoothing property: vs proportional budget share (w_d = T_d/ΣT),
    // the LOW-resource domain's rate must be strictly higher and the
    // high-resource domain's strictly lower
    val propSmall = math.floor(2000.0 * 1000 / 6000 * 1e6 / 1000).toLong // 333333
    val propBig = math.floor(2000.0 * 5000 / 6000 * 1e6 / 5000).toLong   // 333333
    assert(rates("small") > propSmall && rates("big") < propBig)
    // determinism: same keep set on re-evaluation
    val k1 = out.filter(col("keep")).select(col("id")).collect().map(_.getLong(0)).toSet
    val k2 = out.filter(col("keep")).select(col("id")).collect().map(_.getLong(0)).toSet
    assert(k1 == k2 && k1.nonEmpty)
  }

  test("temperatureMixture: zero-token domain gets rate 0, never NaN") {
    val docs = Seq(
      (1L, "full", "a b c d"),
      (2L, "empty", ""), // whole domain has zero tokens
      (3L, "empty", " ")
    ).toDF("id", "domain", "text")
    val toks = when(length(trim(col("text"))) === 0, 0)
      .otherwise(size(CorpusOps.words(col("text"))))
    val out = CorpusOps.temperatureMixture(docs, "id", "domain", toks, budget = 10.0)
    val rates = out.select(col("domain"), col("rate_ppm")).distinct()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rates("empty") == 0L, s"zero-token domain rate: ${rates("empty")}")
    assert(rates("full") > 0L)
    assert(out.filter(col("domain") === "empty" && col("keep")).count() == 0)
  }

  test("boilerplateStats: exact fractions, short docs excluded, no-hit docs zero") {
    val docs = Seq(
      (1L, "x y z a b"),       // grams: "x y z","y z a","z a b"
      (2L, "x y z c d"),       // shares "x y z" with docs 1 and 3
      (3L, "q x y z r"),       // contains "x y z" mid-doc
      (4L, "u v w u v w u v"), // no gram shared with other docs
      (5L, "one two")          // < 3 words → no grams → absent from output
    ).toDF("doc_id", "text")
    val out = CorpusOps.boilerplateStats(docs, "doc_id", "text", n = 3, minDocFreq = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getAs[Double]("boiler_frac")))).toMap
    // "x y z" appears in 3 distinct docs → boilerplate at minDocFreq=3
    assert(out(1L) == ((3L, 1L, 1.0 / 3.0)))
    assert(out(2L) == ((3L, 1L, 1.0 / 3.0)))
    assert(out(3L) == ((3L, 1L, 1.0 / 3.0)))
    assert(out(4L) == ((6L, 0L, 0.0))) // repeated within ONE doc: df=1, not boilerplate
    assert(!out.contains(5L))
  }

  test("gopherFilter: each rule fires independently; clean doc keeps") {
    // 40 distinct 4-char words: wc=40 ∈ [30,90], mwl=4.0, ttr=1.0,
    // dbf=0.0, twf=1/40 — passes every rule
    val clean = (0 until 40).map(i => f"w$i%03d").mkString(" ")
    val short = (0 until 10).map(i => f"w$i%03d").mkString(" ")   // wc=10 < 30
    val longw = (0 until 40).map(i => f"wording$i%03d").mkString(" ") // mwl=10
    // one word 60 times + 10 fillers: wc=70, ttr=11/70≈0.16 < 0.35,
    // twf=60/70≈0.86 > 0.12, dbf≈0.84 > 0.08 — three rules fire at once
    val repet = (Seq.fill(60)("dup0") ++ (0 until 10).map(i => f"w$i%03d")).mkString(" ")
    val docs = Seq((1L, clean), (2L, short), (3L, longw), (4L, repet))
      .toDF("doc_id", "text")
    val out = CorpusOps.gopherFilter(docs, "doc_id", "text")
      .select("doc_id", "bad_wc", "bad_mwl", "bad_ttr", "bad_dbf", "bad_twf", "keep")
      .as[(Long, Int, Int, Int, Int, Int, Int)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 0, 0, 0, 0, 0, 1)))
    assert(out(2L)._2 == 1 && out(2L)._7 == 0) // short: bad_wc fires
    assert(out(3L)._3 == 1 && out(3L)._7 == 0) // long words: bad_mwl fires
    val r4 = out(4L)
    assert(r4._4 == 1 && r4._5 == 1 && r4._6 == 1 && r4._7 == 0) // ttr+dbf+twf
  }

  test("epochAllocation: cap binds the tiny domain, zero-token domain allocates 0") {
    val docs = Seq(
      ("big", 100L), ("big", 100L), ("big", 100L), ("big", 100L), // 400 tokens
      ("small", 4L),                                              // 4 tokens
      ("empty", 0L)
    ).toDF("domain", "toks")
    val out = CorpusOps.epochAllocation(docs, "domain", col("toks"), budgetX = 2L)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("target_tokens"),
          r.getAs[Long]("epochs_x1000"), r.getAs[Long]("alloc_tokens"))).toMap
    // sq: big=20, small=2, empty=0 → Z=22; budget = 808 // 22 = 36 per sq unit
    assert(out("big") == ((400L, 720L, 1800L, 720L)))   // 1.8 epochs, uncapped
    assert(out("small") == ((4L, 72L, 4000L, 16L)))      // 18x demand → capped at 4.0
    assert(out("empty") == ((0L, 0L, 0L, 0L)))           // nothing to repeat
    // allocation never exceeds the cap x own tokens
    assert(out.values.forall { case (n, _, e, a) => e <= 4000L && a <= 4L * n })
  }

  test("gramNovelty: first-owner attribution, exact duplicate scores 0") {
    val docs = Seq(
      (1L, "a b c d e"),        // grams: abc bcd cde — all first here
      (2L, "a b c d e"),        // exact dup of 1 → novelty 0
      (3L, "a b c x y z"),      // abc seen (doc 1); bcx cxy xyz novel → 3/4
      (4L, "p q r")             // single novel gram → 1/1
    ).toDF("doc_id", "text")
    val out = CorpusOps.gramNovelty(docs, "doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_grams"), r.getAs[Long]("n_novel"),
          r.getAs[Long]("novelty_permille"))).toMap
    assert(out(1L) == ((3L, 3L, 1000L)))
    assert(out(2L) == ((3L, 0L, 0L)))
    assert(out(3L) == ((4L, 3L, 750L)))
    assert(out(4L) == ((1L, 1L, 1000L)))
    // partitioning never changes the census
    val re = CorpusOps.gramNovelty(docs.repartition(7), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(re == out.map { case (id, (g, n, p)) => (id, g, n, p) }.toSet)
  }

  test("piiRedact: emails then phones, global") {
    val df = Seq("mail a.b@x.co and c@y.io or 555-123 then 555-9").toDF("t")
      .select(CorpusOps.piiRedact(col("t")).as("r"),
        CorpusOps.piiEmailCount(col("t")).as("e"),
        CorpusOps.piiPhoneCount(col("t")).as("p"))
    val row = df.head()
    assert(row.getString(0) == "mail [EMAIL] and [EMAIL] or [PHONE] then [PHONE]")
    assert(row.getLong(1) == 2L && row.getLong(2) == 2L)
  }

  test("bpe fertility: per-lang masses tie out to the encode census; ratio bounded") {
    val fert = graft.queries.CorpusQueries.queries("q_bpe_fertility")(spark, sf001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(fert.nonEmpty)
    // every token is >= 1 char, so chars/token >= 1 (ppm >= 1e6); merges
    // only ever shorten, so fertility stays below the longest word
    assert(fert.forall(_._5 >= 1000000L), s"fertility below 1 char/token: $fert")
    assert(fert.forall(t => t._3 >= t._2), "fewer tokens than docs")
    // Σ tokens over langs == Σ per-doc tokens from the encode query
    val encTotal = graft.queries.CorpusQueries.queries("q_bpe_encode")(spark, sf001)
      .agg(org.apache.spark.sql.functions.sum("n_tokens")).head().getLong(0)
    assert(fert.map(_._3).sum == encTotal, "fertility token mass != encode token mass")
  }

  test("unimaxAllocation: hand-computed water-filling with cap") {
    import spark.implicits._
    // one doc per language carrying its whole token mass via n
    val docs = Seq(("a", 10L), ("b", 100L), ("c", 1000L)).toDF("lang", "n")
    val got = CorpusOps.unimaxAllocation(docs, "lang", col("n"),
        budgetX = 1L, maxEpochs = 2L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // B=1110: a gets min(20, 1110/3=370)=20; b gets min(200, 1090/2=545)=200;
    // c absorbs the remaining 890 (0.89 epochs)
    assert(got == Set(("a", 10L, 20L, 2000000L), ("b", 100L, 200L, 2000000L),
      ("c", 1000L, 890L, 890000L)), s"got $got")
    // conservation: capped languages at exactly cap, budget fully spent here
    assert(got.toSeq.map(_._3).sum == 1110L)
  }

  test("suffixDupStats: verbatim twins, cross-doc runs, within-doc repeats, unique docs") {
    def toks(prefix: String, n: Int): Seq[String] = (1 to n).map(i => s"$prefix$i")
    val shared = toks("s", 8) // an 8-token run planted in docs 1 and 3
    val docs = Seq(
      (1L, (toks("a", 4) ++ shared ++ toks("b", 8)).mkString(" ")), // 20 toks
      (2L, (toks("a", 4) ++ shared ++ toks("b", 8)).mkString(" ")), // verbatim twin of 1
      (3L, (toks("c", 6) ++ shared ++ toks("d", 6)).mkString(" ")), // shares only the run
      (4L, toks("u", 10).mkString(" ")),                            // fully unique
      (5L, (toks("r", 8) ++ toks("r", 8)).mkString(" "))            // within-doc 8-repeat
    ).toDF("doc_id", "text")
    val got = graft.ops.CorpusOps.suffixDupStats(docs, "doc_id", "text", minRun = 16)
      .orderBy(col("doc_id"))
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    // (doc_id, n_tokens, n_dup_starts, dup_cover_toks, max_dup_len, ppm)
    assert(got(0) == ((1L, 20L, 5L, 20L, 16L, 1000000L)), s"doc1 ${got(0)}")
    assert(got(1) == ((2L, 20L, 5L, 20L, 16L, 1000000L)), s"doc2 ${got(1)}")
    // doc 3: the shared 8-run duplicates at levels <= 8, but no 16-window
    assert(got(2) == ((3L, 20L, 0L, 0L, 8L, 0L)), s"doc3 ${got(2)}")
    assert(got(3) == ((4L, 10L, 0L, 0L, 0L, 0L)), s"doc4 ${got(3)}")
    // doc 5: within-doc repetition is a duplication too (occurrence
    // count >= 2, the ExactSubstr census), capped below 16
    assert(got(4)._1 == 5L && got(4)._5 == 8L && got(4)._3 == 0L, s"doc5 ${got(4)}")

    // removal twin: the canonical (min packed position) occurrence
    // survives; the twin doc loses every covered token
    val rm = graft.ops.CorpusOps.suffixRemove(docs, "doc_id", "text", minRun = 16)
      .orderBy(col("doc_id"))
      .as[(Long, String, Long, Long)].collect()
    assert(rm(0)._4 == 0L, s"canonical doc1 must keep everything: ${rm(0)}")
    assert(rm(1)._4 == 20L && rm(1)._2 == "", s"twin doc2 fully cut: ${rm(1)}")
    assert(rm(2)._4 == 0L && rm(3)._4 == 0L && rm(4)._4 == 0L,
      s"sub-threshold docs untouched: ${rm.toSeq}")
  }

  test("collectBounded: census over the cap fails loudly, under the cap collects (r17 verdict #8)") {
    import spark.implicits._
    val five = Seq("a", "b", "c", "d", "e").toDF("w")
    val e = intercept[IllegalArgumentException] {
      graft.ops.CorpusOps.collectBounded(five, "specCensus", cap = 4)
    }
    assert(e.getMessage.contains("specCensus") && e.getMessage.contains("exceeds 4"),
      s"guard must name the census and the cap: ${e.getMessage}")
    assert(graft.ops.CorpusOps.collectBounded(five, "specCensus", cap = 5).length == 5)
    // the production cap default is the documented 10M bound
    assert(graft.ops.CorpusOps.censusCap == 10000000)
  }
}
