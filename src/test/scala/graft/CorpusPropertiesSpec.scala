package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.ops.{CorpusOps, Dedup}

/** Property-style invariants over generated inputs (scalacheck Gen with
  * pinned seeds, each property batched into ONE DataFrame so a 200-case
  * sweep costs one Spark action, not 200 jobs).
  */
class CorpusPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def sample[T](g: Gen[T], seed: Long): T =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private val wordGen: Gen[String] =
    Gen.choose(1, 12).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))

  test("property: decode(encode(w)) == w for arbitrary words under arbitrary merge chains") {
    // merges need not come from training: ANY [a-z]+ pair chain preserves
    // the underlying characters, so decode must invert encode exactly
    val words = sample(Gen.listOfN(200, wordGen), 42L).distinct
    val mergeGen = Gen.listOfN(6, for {
      a <- Gen.choose(1, 3).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
      b <- Gen.choose(1, 3).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
    } yield (a, b))
    for (seed <- Seq(1L, 7L, 99L)) {
      val merges = sample(mergeGen, seed)
      val out = words.toDF("w")
        .select(col("w"), CorpusOps.bpeDecodeText(
          CorpusOps.bpeEncodeIds(col("w"), merges), merges).as("d"))
        .as[(String, String)].collect()
      out.foreach { case (w, d) => assert(d == w, s"seed $seed broke '$w' -> '$d'") }
    }
  }

  test("property: removeDupSpans emits every doc, never grows text, counts chars exactly") {
    // tiny vocabulary forces heavy 5-gram collisions across docs
    val docGen = Gen.choose(3, 30).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c", "dd", "ee")).map(_.mkString(" ")))
    val docs = sample(Gen.listOfN(50, docGen), 11L).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val norm = docs.toMap
    val out = CorpusOps.removeDupSpans(docs.toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, String, Long, Long)].collect()
    assert(out.length == docs.length) // every input doc emitted
    out.foreach { case (id, cleaned, nChars, nToks) =>
      val orig = norm(id)
      assert(cleaned.length <= orig.length, s"doc $id grew")
      assert(nChars == orig.length - cleaned.length, s"doc $id char count off")
      assert(nToks >= 0 && nChars >= 0)
      // surviving text is a subsequence of the original token stream
      val origToks = orig.split("\\s+").toSeq
      val keptToks = if (cleaned.isEmpty) Nil else cleaned.split("\\s+").toSeq
      def isSubseq(xs: Seq[String], ys: Seq[String]): Boolean = {
        var j = 0
        xs.foreach { x => if (j < ys.length && ys(j) == x) j += 1 }
        j == ys.length
      }
      assert(isSubseq(origToks, keptToks), s"doc $id not a subsequence")
    }
    // the min-doc witness of every duplicated run survives somewhere:
    // total kept tokens > 0 when there was any input
    assert(out.map(_._2.length).sum > 0)
  }

  test("property: blocked simhash candidates are a subset of unblocked ones") {
    val sigGen = for {
      id <- Gen.choose(1L, 500L)
      sig <- Gen.choose(0L, (1L << 60) - 1)
      lang <- Gen.oneOf("en", "de", "fr")
    } yield (id, sig, lang)
    val sims = sample(Gen.listOfN(120, sigGen), 5L)
      .distinctBy(_._1).toDF("doc_id", "simhash", "lang")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val unblocked = pairs(Dedup.simhashPairs(sims))
    val blocked = pairs(Dedup.simhashPairs(sims, blockCols = Seq("lang")))
    assert(blocked.subsetOf(unblocked))
  }

  test("property: unimax allocation conserves budget, respects the cap, fills ascending") {
    val censusGen = Gen.choose(2, 8).flatMap(n =>
      Gen.listOfN(n, Gen.choose(0L, 100000L)))
    for (seed <- Seq(3L, 21L, 77L, 123L)) {
      val ns = sample(censusGen, seed).zipWithIndex
        .map { case (n, i) => (s"l$i", n) }
      val docs = ns.toDF("lang", "n")
      val out = CorpusOps.unimaxAllocation(docs, "lang", col("n"),
          budgetX = 1L, maxEpochs = 2L)
        .as[(String, Long, Long, Long)].collect()
      val total = ns.map(_._2).sum
      val byLang = ns.toMap
      // per-language: never above the cap, never negative
      out.foreach { case (l, n, a, ppm) =>
        assert(n == byLang(l))
        assert(a >= 0L && a <= 2L * n, s"seed $seed: $l alloc $a over cap")
        assert(ppm <= 2000000L)
      }
      // conservation: never exceeds the budget...
      val spent = out.map(_._3).sum
      assert(spent <= total, s"seed $seed: overspent $spent > $total")
      // ...and if any language is BELOW its cap, the budget is exhausted
      // up to integer-division remainders (one unit per language)
      if (out.exists { case (_, n, a, _) => a < 2L * n })
        assert(total - spent < out.length.toLong,
          s"seed $seed: left ${total - spent} unspent with slack available")
    }
  }

  test("property: checksum xor-merge of a random partition of rows equals the whole") {
    // split rows into arbitrary batches; merging per-batch (count, xor)
    // partials must equal the single-pass manifest — the invariant
    // q_stream_checksum/q_ivm_checksum stand on
    val rowsGen = Gen.listOfN(60, for {
      id <- Gen.choose(0L, 1000000L); w <- wordGen; b <- Gen.choose(0, 3)
    } yield (id, w, b))
    for (seed <- Seq(5L, 55L)) {
      val rows = sample(rowsGen, seed).distinctBy(_._1)
      def manifest(part: Seq[(Long, String, Int)]): (Long, Long) = {
        val hs = part.toDF("doc_id", "text", "b")
          .select(Dedup.hex60(md5(concat(col("doc_id").cast("string"),
            lit(":"), col("text")).cast("binary"))).as("h"))
          .as[Long].collect()
        (hs.length.toLong, hs.foldLeft(0L)(_ ^ _))
      }
      val whole = manifest(rows)
      val batches = rows.grouped(17).toSeq.map(manifest)
      val merged = (batches.map(_._1).sum, batches.map(_._2).foldLeft(0L)(_ ^ _))
      assert(merged == whole, s"seed $seed: partial merge diverged")
    }
  }
}
