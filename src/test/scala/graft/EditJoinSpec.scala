package graft

import org.apache.spark.sql.functions._
import graft.ops.{CorpusOps, EntityResolution, Graph}

/** Ed-Join (q-gram prefix-filtered edit-distance join), nodeJaccard, and
  * chunkText: each checked against a brute-force reference computed
  * in-spec, so the filters (prefix lemma, hot-group cap, chunk math) are
  * proven lossless on inputs that exercise their edge cases —
  * insert/delete shifts for Ed-Join, not just substitutions.
  */
class EditJoinSpec extends SparkSpec {
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1)(i => i)
    for (j <- 1 to b.length) {
      var prev = dp(0); dp(0) = j
      for (i <- 1 to a.length) {
        val cur = dp(i)
        dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    dp(a.length)
  }

  test("editJoin recovers exactly the brute-force pairs (subs, inserts, deletes)") {
    val names = Seq(
      (1L, "warehouse-alpha"), (2L, "warehouse-alphb"),   // substitution, d=1
      (3L, "warehouse-alpha1"),                           // insertion vs 1
      (4L, "warehouse-alph"),                             // deletion vs 1
      (5L, "warehous-alpha"),                             // deletion mid vs 1
      (6L, "completely-different-string"),
      (7L, "another-unrelated-value"),
      (8L, "warehouse-delta"),                            // d=4 from alpha: excluded
      (9L, "xwarehouse-alpha")                            // prefix insert vs 1
    ).toDF("id", "s")
    val d = 1
    val got = EntityResolution.editJoin(names, "id", "s", d = d, q = 3)
      .select("id_a", "id_b", "dist").as[(Long, Long, Int)].collect().toSet
    val rows = names.as[(Long, String)].collect()
    val want = (for {
      (ia, sa) <- rows; (ib, sb) <- rows
      if ia < ib && sa.length >= 6 && sb.length >= 6
      dd = lev(sa, sb) if dd <= d
    } yield (ia, ib, dd)).toSet
    assert(want.nonEmpty, "fixture must produce true pairs")
    assert(got == want)
  }

  test("deletionJoin (FastSS d=1) == brute force, including repeated-char runs") {
    val names = Seq(
      (1L, "warehouse-alpha"), (2L, "warehouse-alphb"),
      (3L, "warehouse-alpha1"), (4L, "warehouse-alph"),
      (5L, "warehous-alpha"), (6L, "completely-different-string"),
      (7L, "aaaa"), (8L, "aaa"), (9L, "aaab"),   // duplicate deletion variants
      (10L, "xwarehouse-alpha"), (11L, "ab"), (12L, "b")
    ).toDF("id", "s")
    val got = EntityResolution.deletionJoin(names, "id", "s")
      .select("id_a", "id_b", "dist").as[(Long, Long, Int)].collect().toSet
    val rows = names.as[(Long, String)].collect()
    val want = (for {
      (ia, sa) <- rows; (ib, sb) <- rows
      if ia < ib
      dd = lev(sa, sb) if dd <= 1
    } yield (ia, ib, dd)).toSet
    assert(want.nonEmpty)
    assert(got == want)
  }

  test("editJoin d=2 widens the result and stays brute-force-exact") {
    val names = (0 until 40).map(i => (i.toLong, f"record-id-$i%04d")).toDF("id", "s")
    val got = EntityResolution.editJoin(names, "id", "s", d = 2, q = 2)
      .select("id_a", "id_b", "dist").as[(Long, Long, Int)].collect().toSet
    val rows = names.as[(Long, String)].collect()
    val want = (for {
      (ia, sa) <- rows; (ib, sb) <- rows
      if ia < ib && sa.length >= 6 && sb.length >= 6
      dd = lev(sa, sb) if dd <= 2
    } yield (ia, ib, dd)).toSet
    assert(want.nonEmpty)
    assert(got == want)
  }

  test("nodeJaccard matches brute force and the cap drops hot groups") {
    val m = Seq(
      // group 1 is hot (all nodes) — predicts nothing
      (1L, 10L), (1L, 11L), (1L, 12L), (1L, 13L),
      (2L, 10L), (2L, 11L),
      (3L, 10L), (3L, 11L), (3L, 12L),
      (4L, 12L), (4L, 13L)
    ).toDF("g", "n")
    val got = Graph.nodeJaccard(m, "g", "n", minShared = 1L, maxGroupSize = 3L)
      .select("s1", "s2", "common", "d1", "d2", "jaccard_ppm")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    // brute force over groups 2,3,4 only (group 1 capped out):
    // node -> kept groups it belongs to
    val memb = Map(10L -> Set(2L, 3L), 11L -> Set(2L, 3L), 12L -> Set(3L, 4L), 13L -> Set(4L))
    val want = (for {
      a <- memb.keySet; b <- memb.keySet if a < b
      common = (memb(a) intersect memb(b)).size.toLong if common >= 1
      da = memb(a).size.toLong; db = memb(b).size.toLong
    } yield (a, b, common, da, db, common * 1000000L / (da + db - common))).toSet
    assert(got == want)
  }

  test("chunkText covers every char, overlaps by size-stride, short docs = 1 chunk") {
    val docs = Seq(
      (1L, "a" * 50),            // < size: one chunk
      (2L, "b" * 120),           // == size: one chunk
      (3L, ("abcdefghij" * 13)), // 130 chars: 2 chunks, tail short
      (4L, "x" * 300)            // 3 chunks
    ).toDF("doc_id", "text")
    val chunks = CorpusOps.chunkText(docs, "doc_id", "text", size = 120, stride = 90)
      .select("doc_id", "chunk_id", "chunk_start", "chunk_text")
      .as[(Long, Long, Long, String)].collect().sortBy(c => (c._1, c._2))
    val byDoc = chunks.groupBy(_._1)
    assert(byDoc(1L).length == 1 && byDoc(2L).length == 1)
    assert(byDoc(3L).length == 2 && byDoc(4L).length == 3)
    for ((id, text) <- Seq((3L, "abcdefghij" * 13), (4L, "x" * 300))) {
      val cs = byDoc(id)
      // starts step by stride; each chunk is the real substring
      cs.foreach { case (_, cid, start, ct) =>
        assert(start == 1 + cid * 90)
        assert(ct == text.substring((start - 1).toInt,
          math.min(text.length, (start - 1 + 120).toInt)))
      }
      // exact coverage: union of [start, start+len) is [0, len)
      val covered = cs.flatMap { case (_, _, start, ct) =>
        (start - 1) until (start - 1 + ct.length)
      }.toSet
      assert(covered == (0L until text.length.toLong).toSet)
    }
  }
}
