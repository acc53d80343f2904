package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-hygiene operators for training-data pipelines: benchmark
  * decontamination, Gopher-style repetition signals, and PII scrubbing.
  * Pure declarative plans — per-row Column expressions plus linear
  * explode→groupBy aggregations (map-side combinable), no UDFs, no
  * driver round-trips — so each has an exact DuckDB oracle.
  */
object CorpusOps {

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
    * outgrew broadcast, the same plan works as a shuffled equi-join on a
    * 64-bit n-gram hash.)
    */
  def decontaminate(docs: DataFrame, idCol: String, textCol: String,
                    isBench: Column, n: Int): DataFrame = {
    val ng = docs.select(col(idCol).as("doc_id"), isBench.as("is_bench"),
      explode(wordNgrams(words(col(textCol)), n)).as("g"))
    val bench = ng.filter(col("is_bench")).select(col("g")).distinct()
    val train = ng.filter(!col("is_bench")).select(col("doc_id"), col("g")).distinct()
    train.join(broadcast(bench), Seq("g"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_overlap"))
  }

  /** Gopher-style repetition signals, one row per doc:
    * top_word_frac (most frequent word / total words), type_token_ratio
    * (distinct/total words), dup_bigram_frac (1 - distinct/total bigrams).
    * Two explode→two-level-groupBy pipelines joined on doc id; partial
    * aggregation shrinks each shuffle to ~distinct-terms-per-doc. All
    * ratios are exact-integer-count divisions — bit-identical IEEE on both
    * oracle sides.
    */
  def repetitionStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ws = words(col(textCol))
    val wc = docs.select(col(idCol).as("doc_id"), explode(ws).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
    val wstats = wc.groupBy(col("doc_id")).agg(
      max(col("c")).as("top_cnt"),
      sum(col("c")).as("total_words"),
      count(lit(1)).as("distinct_words"))
    val bg = docs.select(col(idCol).as("doc_id"), explode(wordNgrams(ws, 2)).as("g"))
      .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
    val bstats = bg.groupBy(col("doc_id")).agg(
      sum(col("c")).as("total_bigrams"),
      count(lit(1)).as("distinct_bigrams"))
    wstats.join(bstats, Seq("doc_id"))
      .select(col("doc_id"),
        (col("top_cnt").cast("double") / col("total_words").cast("double")).as("top_word_frac"),
        (col("distinct_words").cast("double") / col("total_words").cast("double")).as("type_token_ratio"),
        (lit(1.0) - col("distinct_bigrams").cast("double") / col("total_bigrams").cast("double")).as("dup_bigram_frac"))
  }

  /** Portable PII patterns (identical Java-regex / DuckDB-RE2 semantics:
    * plain character classes, greedy +, no lookaround). */
  val emailPattern = "[a-z0-9._%+-]+@[a-z0-9.-]+"
  val phonePattern = "555-[0-9]+"

  /** Redact emails then phones; global replace on both engines. */
  def piiRedact(c: Column): Column =
    regexp_replace(regexp_replace(c, emailPattern, "[EMAIL]"), phonePattern, "[PHONE]")

  def piiEmailCount(c: Column): Column = regexp_count(c, lit(emailPattern)).cast("long")
  def piiPhoneCount(c: Column): Column = regexp_count(c, lit(phonePattern)).cast("long")
}
