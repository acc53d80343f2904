package graft

import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** MinHash band-index algebra: per-doc signatures are independent, so an
  * index maintained incrementally (anti-join deletes, band only the
  * arriving delta) must be row-identical to a full recompute over the
  * final corpus — the invariant `q_index_maintain` exercises end-to-end
  * against DuckDB, checked here on crafted edges (empty delta, delete-
  * then-reinsert, repartitioned input).
  */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def bands(df: org.apache.spark.sql.DataFrame) =
    Dedup.minhashBands(Dedup.hashedShingleTable(df, "doc_id", "text"))

  private def asSet(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_id", "band", "band_sig").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet

  test("incremental band maintenance == full recompute") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon eta"),
      (3L, "one two three four five six seven"),
      (4L, "cat dog bird fish lion tiger bear"),
      (5L, "red green blue cyan magenta yellow")
    ).toDF("doc_id", "text")
    val base = docs.filter($"doc_id" <= 4)
    val dels = Seq(2L).toDF("doc_id")
    val ins = docs.filter($"doc_id" === 5)
    val maintained = bands(base).join(dels, Seq("doc_id"), "left_anti")
      .unionByName(bands(ins))
    val recompute = bands(docs.filter($"doc_id" =!= 2))
    assert(asSet(maintained) == asSet(recompute))
    // delete-then-reinsert round-trips to the original index
    val reinserted = maintained
      .unionByName(bands(docs.filter($"doc_id" === 2)))
      .join(Seq(5L).toDF("doc_id"), Seq("doc_id"), "left_anti")
    assert(asSet(reinserted) == asSet(bands(base)))
    // empty delta is a no-op, and partitioning never changes the result
    val noop = bands(base)
      .join(spark.emptyDataset[Long].toDF("doc_id"), Seq("doc_id"), "left_anti")
    assert(asSet(noop) == asSet(bands(base.repartition(7))))
  }

  test("simhashPairs blockCols: candidates confined to a block, default unchanged") {
    // identical signatures (hamming 0) in DIFFERENT languages vs a true
    // same-language near-pair — the block key must cut the former only
    val sims = Seq(
      (1L, 0x0F0F0F0FL, "en"), (2L, 0x0F0F0F0FL, "de"), // cross-block twin
      (3L, 0x70F0F0F0L, "en"), (4L, 0x70F0F0F1L, "en")  // in-block, hamming 1
    ).toDF("doc_id", "simhash", "lang")
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val unblocked = pairSet(Dedup.simhashPairs(sims))
    assert(unblocked == Set((1L, 2L), (3L, 4L)))
    val blocked = pairSet(Dedup.simhashPairs(sims, blockCols = Seq("lang")))
    assert(blocked == Set((3L, 4L))) // the cross-language twin never forms
    // candidate volume drops, recall within a block is untouched
    assert(blocked.size < unblocked.size)
  }

  test("ppJoin is LOSSLESS: equals brute-force Jaccard >= 3/5 on a crafted corpus") {
    // near-dups (1,2), exact word-set dup (3,4 — different order/case),
    // disjoint (5), and a doc sharing only stopword-ish common tokens (6)
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over a lazy dog"),
      (3L, "alpha beta gamma delta"),
      (4L, "Delta GAMMA beta alpha"),
      (5L, "totally unrelated content lives here"),
      (6L, "the over a")).toDF("doc_id", "text")
    def wordSet(t: String) = t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSet
    val sets = docs.collect().map(r => r.getLong(0) -> wordSet(r.getString(1))).toMap
    val brute = (for {
      a <- sets.keys; b <- sets.keys if a < b
      inter = (sets(a) & sets(b)).size; uni = (sets(a) | sets(b)).size
      if inter * 5 >= uni * 3
    } yield (a, b, inter.toLong, uni.toLong)).toSet
    // word sets here (the crafted corpus is heterogeneous); the shipped
    // query feeds shingle sets — ppJoin is generic over the token relation
    val toks = docs.select(col("doc_id"),
        explode(array_distinct(split(trim(lower(col("text"))), "\\s+"))).as("w"))
      .filter(col("w") =!= "")
    val got = Dedup.ppJoin(toks, 3, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == brute, s"ppJoin=$got brute=$brute")
    assert(brute.exists { case (a, b, _, _) => (a, b) == (3L, 4L) },
      "fixture lost its exact word-set dup")
  }

  test("winnowing: coverage guarantee, density, and offset-invariant run detection") {
    // 40 distinct words → 37 4-gram positions per doc
    val words = (0 until 40).map(i => s"w$i").mkString(" ")
    val shifted = "pre1 pre2 pre3 pre4 pre5 " + words // same run, different offset
    val unrelated = (0 until 40).map(i => s"u$i").mkString(" ")
    val docs = Seq((1L, words), (2L, shifted), (3L, unrelated)).toDF("doc_id", "text")
    val k = 4; val w = 8
    val fp = Dedup.winnowFingerprints(docs, "doc_id", "text", k, w)
    val perDoc = fp.groupBy("doc_id").count().as[(Long, Long)].collect().toMap
    // coverage: every w consecutive positions select >= 1 fingerprint,
    // so a doc with n gram positions has >= n/w and (selection is a
    // trailing-window min) <= n fingerprints; density ~2/(w+1)
    assert(perDoc(1L) >= 37 / w && perDoc(1L) <= 37)
    // offset invariance: doc 2 contains doc 1's entire word run shifted
    // by 5 — every fingerprint of doc 1 whose window lies inside the
    // shared run must also be selected in doc 2 modulo the w-window
    // boundary, so the pair share is large while unrelated share is 0
    val pairs = Dedup.winnowPairs(fp, minShared = 3, maxDocFreq = 64)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
    // determinism: repartitioning never changes the fingerprint set
    val fp2 = Dedup.winnowFingerprints(docs.repartition(7), "doc_id", "text", k, w)
    assert(fp.as[(Long, Long)].collect().toSet == fp2.as[(Long, Long)].collect().toSet)
  }

  test("qualitySurvivors: best-of-cluster argmax, tie -> min id, singleton pass-through") {
    val docs = Seq(
      (1L, 5L), (2L, 9L), (3L, 9L), // cluster {1,2,3}: best q=9, tie 2 vs 3 -> 2
      (4L, -2L),                    // singleton, negative quality fine
      (5L, 0L), (6L, 7L)            // cluster {5,6}: survivor 6
    ).toDF("doc_id", "q0")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("doc_a", "doc_b")
    val out = Dedup.qualitySurvivors(docs, "doc_id", pairs, col("q0")).collect()
      .map(r => r.getAs[Long]("cluster") ->
        (r.getAs[Long]("survivor_id"), r.getAs[Long]("best_q"),
          r.getAs[Long]("n_members"))).toMap
    assert(out == Map(
      1L -> ((2L, 9L, 3L)),
      4L -> ((4L, -2L, 1L)),
      5L -> ((6L, 7L, 2L))))
  }
}
