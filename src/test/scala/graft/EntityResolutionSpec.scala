package graft

import org.apache.spark.sql.functions._
import graft.ops.EntityResolution
import graft.ops.EntityResolution._

/** Fellegi–Sunter entity-resolution invariants on crafted records — the
  * engine half of what `q_er_candidates`/`q_er_matches`/`q_er_golden`
  * check end-to-end against DuckDB: blocking never separates a record
  * from its corrupted mirror (recall = 1 for the modeled noise), the
  * integer score discriminates true pairs from same-block chance pairs,
  * golden output covers the whole input exactly once with min-non-null /
  * max survivorship, and the adaptive suffix length steps where its cap
  * says it does.
  */
class EntityResolutionSpec extends SparkSpec {
  import spark.implicits._

  // crafted "clean CRM" table in the customer schema; digit tails spread
  // the keys across blocks (same shape as the real c_name values)
  private lazy val customers = (1L to 40L)
    .map { k =>
      val seg = Seq("BUILDING", "AUTOMOBILE", "MACHINERY", "HOUSEHOLD", "FURNITURE")(
        (k % 5).toInt)
      (k, f"Customer#$k%09d", (k % 7).toInt, seg, 100.0 + k * 13.37)
    }
    .toDF("c_custkey", "c_name", "c_nationkey", "c_mktsegment", "c_acctbal")

  test("every corrupted mirror blocks with and matches its clean twin") {
    val recs = dirtyRecords(customers)
    assert(recs.count() == 80) // clean + mirror per key

    val matched = matches(candidates(recs, suffix = 2))
      .select("rec_a", "rec_b").as[(Long, Long)].collect().toSet
    // the (2k, 2k+1) twin pair must survive blocking AND threshold for
    // every key — recall 1.0 over the modeled corruption classes
    val twins = (1L to 40L).map(k => (2 * k, 2 * k + 1)).toSet
    assert(twins.subsetOf(matched), s"missing twins: ${twins -- matched}")
  }

  test("the corruption classes actually occur and never break the match") {
    val recs = dirtyRecords(customers)
    val dirty = recs.filter(col("rec_id") % 2 === 1)
    val caseFlipped = dirty.filter(col("name") =!= lower(col("name")) &&
      col("name") === upper(col("name"))).count()
    val nulledSeg = dirty.filter(col("segment").isNull).count()
    val rounded = dirty.filter(col("bal_cents") % 100 === 0).count()
    // the md5 classes all fire on 40 keys (h%3, h%4, h%2)
    assert(caseFlipped > 0 && nulledSeg > 0 && rounded > 0,
      s"case=$caseFlipped nullseg=$nulledSeg rounded=$rounded")
  }

  test("same-block chance pairs score below the threshold") {
    // two DIFFERENT entities sharing nation and the 2-digit suffix "11":
    // names at lev distance 2 (…001211 vs …003411), balances $5k apart,
    // different segments → score = wNation = 1 only
    val clash = Seq(
      (1211L, "Customer#000001211", 1, "BUILDING", 100.0),
      (3411L, "Customer#000003411", 1, "MACHINERY", 5100.0))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_mktsegment", "c_acctbal")
    val cands = candidates(dirtyRecords(clash), suffix = 2)
    val cross = cands.filter(
      (col("rec_a") / 2).cast("long") =!= (col("rec_b") / 2).cast("long"))
    assert(cross.count() > 0, "blocking should produce the chance pair")
    assert(cross.filter(col("score") >= matchThreshold).count() == 0)
    // and matches() therefore keeps only the twin pairs
    val m = matches(cands).select("rec_a", "rec_b").as[(Long, Long)].collect().toSet
    assert(m == Set((2422L, 2423L), (6822L, 6823L)))
  }

  test("golden records partition the input: coverage, survivorship, canon") {
    val recs = dirtyRecords(customers)
    val g = golden(recs, matches(candidates(recs, suffix = 2)))
    val rows = g.collect()
    // exactly one entity per customer (all twins linked), covering all rows
    assert(rows.length == 40)
    assert(rows.map(_.getAs[Long]("n_records")).sum == 80)
    // entity_id is the min-id (clean, even) member; canonical name is its name
    assert(rows.forall(_.getAs[Long]("entity_id") % 2 == 0))
    val byId = rows.map(r => r.getAs[Long]("entity_id") -> r).toMap
    val cleanRows = recs.filter(col("rec_id") % 2 === 0)
      .select("rec_id", "name", "segment", "bal_cents")
      .collect().map(r => r.getLong(0) -> r).toMap
    for ((id, r) <- byId) {
      assert(r.getAs[String]("canonical_name") == cleanRows(id).getString(1))
      // merged segment null-fills from the clean side (min over non-null)
      assert(r.getAs[String]("merged_segment") == cleanRows(id).getString(2))
      // best balance: max(clean, possibly-rounded mirror) == clean value
      assert(r.getAs[Long]("best_bal_cents") == cleanRows(id).getLong(3))
    }
  }

  test("unmatched records pass through as singleton entities") {
    val recs = dirtyRecords(customers)
    // drop every dirty mirror: no pairs can form, all 40 become singletons
    val solo = recs.filter(col("rec_id") % 2 === 0)
    val g = golden(solo, matches(candidates(solo, suffix = 2)))
    assert(g.count() == 40)
    assert(g.filter(col("n_records") =!= 1).count() == 0)
  }

  test("scoreAcross == self-join candidates restricted to clean x dirty") {
    val recs = dirtyRecords(customers)
    val clean = recs.filter(col("rec_id") % 2 === 0)
    val dirty = recs.filter(col("rec_id") % 2 === 1)
    val across = scoreAcross(clean, dirty, suffix = 2)
      .filter(col("score") >= matchThreshold)
      .select("clean_id", "arriving_id", "score")
      .as[(Long, Long, Int)].collect().toSet
    // the self-join path, restricted to (even, odd) pairs in either order
    val self = matches(candidates(recs, suffix = 2))
      .select("rec_a", "rec_b", "score").as[(Long, Long, Int)].collect()
      .flatMap { case (a, b, sc) =>
        if (a % 2 == 0 && b % 2 == 1) Some((a, b, sc))
        else if (a % 2 == 1 && b % 2 == 0) Some((b, a, sc))
        else None
      }.toSet
    assert(across == self && across.nonEmpty)
  }

  test("block key is stable under case corruption, adaptive length steps at caps") {
    val df = Seq(("Customer#000000123", "CUSTOMER#000000123"))
      .toDF("clean", "flipped")
      .select(blockKey(col("clean"), 3).as("a"), blockKey(col("flipped"), 3).as("b"))
    val r = df.head()
    assert(r.getString(0) == "123" && r.getString(1) == "123")

    assert(suffixLen(100) == 2)
    assert(suffixLen(5000) == 2)
    assert(suffixLen(5001) == 3)
    assert(suffixLen(50001) == 4)
    assert(suffixLen(500001) == 5)
    assert(suffixLen(5000001) == 6)
    assert(suffixLen(Long.MaxValue / 2) == 6) // capped
    // SQL twin is generated from the same constants
    val sql = suffixLenSql("SELECT 42")
    assert(sql.contains("<= 5000 THEN 2") && sql.contains("<= 5000000 THEN 5")
      && sql.contains("ELSE 6"))
  }
}
