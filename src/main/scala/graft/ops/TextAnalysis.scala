package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: token counting,
  * quality scoring, language ID, fingerprinting. All pure Column
  * expressions (codegen-friendly, no UDFs) with deterministic arithmetic
  * so each has an exact DuckDB oracle. Designed to run per-row over
  * billions of documents — no shuffles, no driver round-trips.
  */
object TextAnalysis {

  /** Whitespace tokens. */
  def wsTokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCountWs(text: Column): Column =
    when(length(trim(text)) === 0, 0).otherwise(size(wsTokens(text)))

  /** BPE-ish token count: letter runs, digit runs, and single
    * non-alphanumeric marks — a cheap proxy for subword tokenizers. The
    * pattern is kept dialect-portable (Java regex == RE2 here).
    */
  val bpeTokenPattern = "[a-z]+|[A-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"
  def tokenCountBpe(text: Column): Column = regexp_count(text, lit(bpeTokenPattern))

  /** Quality features (ratios in [0,1], identical IEEE arithmetic both
    * sides of the oracle).
    */
  def punctRatio(text: Column): Column =
    regexp_count(text, lit("[^a-zA-Z0-9\\s]")).cast("double") /
      greatest(length(text).cast("double"), lit(1.0))

  def stopwordCount(text: Column, stopwords: Seq[String]): Column = {
    val words = wsTokens(lower(text))
    size(filter(words, w => w.isInCollection(stopwords)))
  }

  def stopwordRatio(text: Column, stopwords: Seq[String]): Column =
    stopwordCount(text, stopwords).cast("double") /
      greatest(tokenCountWs(text).cast("double"), lit(1.0))

  def avgWordLen(text: Column): Column =
    length(regexp_replace(text, "\\s+", "")).cast("double") /
      greatest(tokenCountWs(text).cast("double"), lit(1.0))

  val defaultStopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is")

  /** Composite quality score — the shape a filtering pipeline thresholds
    * on: rewards stopword presence and moderate word length, penalizes
    * punctuation soup.
    */
  def qualityScore(text: Column, stopwords: Seq[String] = defaultStopwords): Column =
    stopwordRatio(text, stopwords) * lit(2.0) -
      punctRatio(text) * lit(4.0) -
      abs(avgWordLen(text) - lit(5.0)) * lit(0.1)

  /** Integer quality score — the exact-arithmetic twin of
    * [[qualityScore]] for consumers that must COMPARE qualities
    * engine-portably (survivor argmax in quality-aware dedup): 2× the
    * stopword hit count minus the punctuation count. Monotone in the
    * same signals, but a total order DuckDB replays bit-for-bit — no
    * IEEE tie hazards in the argmax.
    */
  def qualityScoreInt(text: Column, stopwords: Seq[String] = defaultStopwords): Column =
    stopwordCount(text, stopwords).cast("long") * 2 -
      regexp_count(text, lit("[^a-zA-Z0-9\\s]")).cast("long")

  /** Language-ID by marker-word hits: score(lang) = count of tokens in
    * that language's marker list; predict the argmax, ties broken by list
    * order, zero hits → "und". A real n-gram model would replace the
    * marker lists; the plumbing (argmax over per-lang scores, deterministic
    * tie-break) is what matters for the pipeline.
    */
  val defaultMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "es" -> Seq("el", "los", "las", "y", "es"),
    "zh" -> Seq("的", "是", "了")
  )

  def langScores(text: Column, markers: Seq[(String, Seq[String])] = defaultMarkers): Seq[(String, Column)] =
    markers.map { case (lang, ws) =>
      lang -> size(filter(wsTokens(lower(text)), w => w.isInCollection(ws)))
    }

  def langId(text: Column, markers: Seq[(String, Seq[String])] = defaultMarkers): Column = {
    val scores = langScores(text, markers)
    // nested CASE: walk langs in declaration order, first one hitting the
    // max score wins (deterministic tie-break); zero hits → "und"
    val maxScore = greatest(scores.map(_._2): _*)
    val firstMax = scores.foldRight(lit("und")) { case ((lang, score), elseCol) =>
      when(score === maxScore && maxScore > 0, lit(lang)).otherwise(elseCol)
    }
    firstMax
  }

  /** Content fingerprint: md5 of the normalized text (lowercase, strip
    * non-alphanumerics). Exact-dup detection key.
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(text), "[^a-z0-9]", "").cast("binary"))

  /** Prefix fingerprint: md5 over the first `nWords` whitespace tokens of
    * the lowercased text — a coarser near-dup key (same-opening docs
    * collide) used when exact dups are rare. At scale it is a groupBy
    * key like [[fingerprint]]: linear, no pairwise compare.
    */
  def prefixFingerprint(text: Column, nWords: Int): Column =
    md5(array_join(
      slice(split(trim(lower(text)), "\\s+"), 1, nWords), " ").cast("binary"))
}
