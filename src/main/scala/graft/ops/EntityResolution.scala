package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import CacheScope.ScopedPersist

/** Entity resolution (record linkage) over structured records — the
  * Fellegi–Sunter (1969) pipeline: blocking → field-agreement vectors →
  * integer-weighted match score → threshold → connected components →
  * survivorship (golden record).
  *
  * This is the capability the reference's CRM-facing adapters
  * (adapters/hubspot/src/index.ts, adapters/stripe/src/index.ts — contact
  * and customer objects) feed into downstream: the same person synced
  * from two systems arrives as two rows that disagree in case, missing
  * fields, and rounded amounts, and the warehouse must link and merge
  * them. The reference itself stops at extract/load; linkage is the
  * canonical first post-load job, so it is implemented here as a
  * first-class operator tier.
  *
  * Determinism: every signal is exact — integer cents, integer
  * levenshtein, string equality — so the DuckDB oracle replays the whole
  * pipeline bit-for-bit. No floats anywhere past the initial
  * round(bal*100) cast.
  *
  * Scale design (100 TB): the only join is a blocked equi-join on
  * (nation, digit-suffix) whose suffix LENGTH grows with the record
  * count (adaptive blocking, same pattern as the embedding near-dup's
  * adaptive LSH depth): expected block size stays O(1), so candidate
  * volume stays O(N) while recall is exact for the corruption classes
  * modeled (case, nulls, rounding never touch the blocking digits).
  * Matching components are resolved by [[Dedup.connectedComponents]]
  * (distributed min-label above the documented edge gate); survivorship
  * is one groupBy + one dimension join back on the min-id label.
  */
object EntityResolution {

  /** Fellegi–Sunter integer agreement weights and the match threshold.
    * name (lev ≤ 1 case-insensitive) is the strongest signal; balance
    * within a dollar next; segment equality weakest (5 segments → high
    * chance agreement); nation contributes 1 and is 1 for every in-block
    * pair by construction. True duplicate pairs score 6 (segment nulled)
    * or 7; chance-collision pairs need name AND balance agreement to
    * reach 6, which the score decomposition in q_er_candidates makes
    * auditable.
    */
  val wName = 3
  val wBal = 2
  val wSeg = 1
  val wNation = 1
  val matchThreshold = 6

  /** Balance agreement tolerance in cents (covers cents-rounding drift). */
  val balTolCents = 100L

  /** Smallest suffix length L in [2, 6] with nRecords ≤ 50·10^L — keeps
    * expected block size constant as the record count grows (25 nations ×
    * 10^L suffixes ≥ N/2 blocks). 2 at sf0.01, 3 at sf0.1, 4 at sf1.
    */
  def suffixLen(nRecords: Long): Int = {
    var l = 2
    var cap = 50L * 100L
    while (l < 6 && nRecords > cap) { l += 1; cap *= 10L }
    l
  }

  /** SQL CASE expression computing [[suffixLen]] over a scalar subquery —
    * generated from the same constants so engine and oracle cannot drift.
    */
  def suffixLenSql(countSql: String): String = {
    val arms = (2 until 6).map(l => s"WHEN ($countSql) <= ${50L * math.pow(10, l).toLong} THEN $l")
    s"CASE ${arms.mkString(" ")} ELSE 6 END"
  }

  /** The messy-ingest twin of a clean customer table: every clean record
    * (rec_id = 2·key, the "system of record" side) plus a corrupted
    * mirror (rec_id = 2·key+1, the "second CRM" side) whose fields are
    * deterministically damaged by hash class: case-flipped name (h%3=0),
    * nulled segment (h%4=0), cents-rounded balance (h%2=0). The digits
    * that identify the entity are never damaged — account numbers are
    * the reliable field in real CRM pairs; names/amounts are not.
    */
  def dirtyRecords(customer: DataFrame): DataFrame = {
    val balCents = round(col("c_acctbal") * 100).cast("long")
    val clean = customer.select(
      (col("c_custkey") * 2).as("rec_id"),
      col("c_name").as("name"),
      col("c_nationkey").as("nation"),
      col("c_mktsegment").as("segment"),
      balCents.as("bal_cents"))
    val h = Dedup.hex60(md5(concat(lit("er:"), col("c_custkey").cast("string")).cast("binary")))
    val dirty = customer.select(
      (col("c_custkey") * 2 + 1).as("rec_id"),
      when(h % 3 === 0, upper(col("c_name"))).otherwise(col("c_name")).as("name"),
      col("c_nationkey").as("nation"),
      when(h % 4 === 0, lit(null).cast("string")).otherwise(col("c_mktsegment")).as("segment"),
      when(h % 2 === 0, balCents - balCents % 100).otherwise(balCents).as("bal_cents"))
    clean.unionAll(dirty)
  }

  /** Shared SQL for [[dirtyRecords]] as a CTE body over `customer`. */
  def dirtyRecordsSql: String = {
    val h = graft.queries.DedupQueries.sqlHex60Public("md5('er:' || c_custkey::VARCHAR)")
    s"""records AS (
       |  SELECT c_custkey * 2 AS rec_id, c_name AS name, c_nationkey AS nation,
       |         c_mktsegment AS segment, CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
       |  FROM customer
       |  UNION ALL
       |  SELECT c_custkey * 2 + 1,
       |         CASE WHEN $h % 3 = 0 THEN upper(c_name) ELSE c_name END,
       |         c_nationkey,
       |         CASE WHEN $h % 4 = 0 THEN NULL ELSE c_mktsegment END,
       |         CASE WHEN $h % 2 = 0
       |              THEN CAST(round(c_acctbal * 100) AS BIGINT) - CAST(round(c_acctbal * 100) AS BIGINT) % 100
       |              ELSE CAST(round(c_acctbal * 100) AS BIGINT) END
       |  FROM customer)""".stripMargin
  }

  /** Blocking key: the last `len` digits of the record's name digits.
    * Case corruption only touches letters, so the key is stable across
    * the modeled noise; its length is the adaptive scale knob.
    */
  def blockKey(name: Column, len: Int): Column =
    substring(regexp_replace(name, "[^0-9]", ""), -len, len)

  private def blockedSide(records: DataFrame, suffix: Int, p: String): DataFrame =
    records.withColumn("blk", blockKey(col("name"), suffix)).select(
      col("rec_id").as(s"${p}id"), col("name").as(s"${p}name"),
      col("nation"), col("segment").as(s"${p}seg"),
      col("bal_cents").as(s"${p}bal"), col("blk"))

  /** Agreement vector + integer score over an a_/b_-prefixed joined pair
    * relation — the one scoring definition every entry point shares.
    */
  private def scored(joined: DataFrame): DataFrame =
    joined.select(
      col("a_id"), col("b_id"),
      when(levenshtein(lower(col("a_name")), lower(col("b_name"))) <= 1, 1)
        .otherwise(0).as("name_agree"),
      when(abs(col("a_bal") - col("b_bal")) <= balTolCents, 1).otherwise(0).as("bal_agree"),
      when(col("a_seg").isNotNull && col("b_seg").isNotNull && col("a_seg") === col("b_seg"), 1)
        .otherwise(0).as("seg_agree"))
      .withColumn("score",
        col("name_agree") * wName + col("bal_agree") * wBal +
          col("seg_agree") * wSeg + lit(wNation))

  /** Candidate pairs via the blocked self-join, each carrying the exact
    * agreement vector and its integer Fellegi–Sunter score. One shuffle
    * keyed by (nation, blk); block sizes are O(1) by construction.
    */
  def candidates(records: DataFrame, suffix: Int): DataFrame =
    scored(blockedSide(records, suffix, "a_")
        .join(blockedSide(records, suffix, "b_"), Seq("nation", "blk"))
        .filter(col("a_id") < col("b_id")))
      .withColumnRenamed("a_id", "rec_a").withColumnRenamed("b_id", "rec_b")

  /** Cross-relation scoring: every (clean, arriving) pair sharing a
    * block, scored by the same definition as [[candidates]] — the
    * incremental-linkage probe (a micro-batch of arriving records
    * against the static system-of-record side). No id-order filter: the
    * two relations are disjoint by construction.
    */
  def scoreAcross(clean: DataFrame, arriving: DataFrame, suffix: Int): DataFrame =
    scored(blockedSide(clean, suffix, "a_")
        .join(blockedSide(arriving, suffix, "b_"), Seq("nation", "blk")))
      .withColumnRenamed("a_id", "clean_id").withColumnRenamed("b_id", "arriving_id")

  /** The agreement/score SQL column list over aliases `a`/`b` — the one
    * scoring definition in SQL, mirroring [[scored]].
    */
  private def agreeSql: String =
    s"""    CASE WHEN levenshtein(lower(a.name), lower(b.name)) <= 1 THEN 1 ELSE 0 END AS name_agree,
       |    CASE WHEN abs(a.bal_cents - b.bal_cents) <= $balTolCents THEN 1 ELSE 0 END AS bal_agree,
       |    CASE WHEN a.segment IS NOT NULL AND b.segment IS NOT NULL AND a.segment = b.segment
       |         THEN 1 ELSE 0 END AS seg_agree,
       |    CASE WHEN levenshtein(lower(a.name), lower(b.name)) <= 1 THEN $wName ELSE 0 END +
       |    CASE WHEN abs(a.bal_cents - b.bal_cents) <= $balTolCents THEN $wBal ELSE 0 END +
       |    CASE WHEN a.segment IS NOT NULL AND b.segment IS NOT NULL AND a.segment = b.segment
       |         THEN $wSeg ELSE 0 END + $wNation AS score""".stripMargin

  /** The `blocked` CTE body: records + their block key. */
  def blockedSql(suffixSql: String): String =
    s"""blocked AS (
       |  SELECT *, right(regexp_replace(name, '[^0-9]', '', 'g'), $suffixSql) AS blk
       |  FROM records)""".stripMargin

  /** Shared SQL: blocking + candidates + agreement vector + score, as
    * CTEs ending in `scored(rec_a, rec_b, name_agree, bal_agree,
    * seg_agree, score)`. `suffixSql` is a SQL expression for the block
    * suffix length (see [[suffixLenSql]]).
    */
  def candidatesSql(suffixSql: String): String =
    s"""${blockedSql(suffixSql)},
       |scored AS (
       |  SELECT a.rec_id AS rec_a, b.rec_id AS rec_b,
       |$agreeSql
       |  FROM blocked a JOIN blocked b
       |    ON a.nation = b.nation AND a.blk = b.blk AND a.rec_id < b.rec_id)""".stripMargin

  /** SQL twin of [[scoreAcross]] with the clean (even) side as `a` and
    * the arriving dirty (odd) side as `b`: CTEs ending in
    * `crossed(clean_id, arriving_id, name_agree, bal_agree, seg_agree,
    * score)`.
    */
  def crossScoreSql(suffixSql: String): String =
    s"""${blockedSql(suffixSql)},
       |crossed AS (
       |  SELECT a.rec_id AS clean_id, b.rec_id AS arriving_id,
       |$agreeSql
       |  FROM blocked a JOIN blocked b
       |    ON a.nation = b.nation AND a.blk = b.blk
       |   AND a.rec_id % 2 = 0 AND b.rec_id % 2 = 1)""".stripMargin

  /** Matched pairs: candidates at or above the threshold. */
  def matches(cands: DataFrame): DataFrame =
    cands.filter(col("score") >= matchThreshold)

  /** Golden records: matched pairs → connected components (min-id
    * labels) → one survivor row per entity. Survivorship rules:
    * canonical name/nation come from the min-id member (the
    * system-of-record side by id construction), merged segment is the
    * min non-null across members (null-filling from any source), best
    * balance is the max (most-complete amount wins over a rounded one),
    * n_records counts the merged rows. Unmatched records pass through as
    * singleton entities — an ER output must cover the whole input.
    */
  def golden(records: DataFrame, matchedPairs: DataFrame): DataFrame = {
    val cc = Dedup.connectedComponents(
      matchedPairs.select(col("rec_a").as("doc_a"), col("rec_b").as("doc_b")))
      .select(col("doc_id").as("rec_id"), col("cluster"))
    val labeled = records.join(cc, Seq("rec_id"), "left_outer")
      .withColumn("cluster", coalesce(col("cluster"), col("rec_id")))
    val agg = labeled.groupBy(col("cluster").as("entity_id"))
      .agg(count(lit(1)).as("n_records"),
        min(col("segment")).as("merged_segment"),
        max(col("bal_cents")).as("best_bal_cents"))
    val canon = records.select(col("rec_id").as("entity_id"),
      col("name").as("canonical_name"), col("nation"))
    agg.join(canon, Seq("entity_id"))
      .select(col("entity_id"), col("canonical_name"), col("nation"),
        col("merged_segment"), col("best_bal_cents"), col("n_records"))
  }

  /** EDIT-DISTANCE SIMILARITY JOIN for d=1 via DELETION NEIGHBORHOODS
    * (FastSS, Bocek et al. 2007): ed(s,t) ≤ 1 ⟺ s and t share a member
    * of their 1-deletion families D(x) = {x} ∪ {x minus one char}
    * (substitution: delete the differing position from both; insert/
    * delete: the shorter string IS a member of the longer one's family).
    * Sharing a variant only bounds ed ≤ 2, so candidates still verify
    * with exact levenshtein.
    *
    * Why this exists alongside [[editJoin]]: prefix filtering's
    * candidate volume is Σ freq² over PREFIX grams, which degrades on
    * low-gram-entropy corpora (ids/names = constant prefix + short
    * number: the q·d+1 rarest grams still land ~15 strings per bucket).
    * Deletion blocking's buckets are the strings one edit apart from a
    * shared variant — candidate volume ≈ the ed ≤ 2 pair count itself,
    * the information-theoretic floor. Cost: (len+1)× row expansion
    * (like shingling) and ONE equi-join — no census, no rank windows.
    * d=1 only (d-deletion families grow |s|^d; use editJoin past that).
    */
  def deletionJoin(records: DataFrame, idCol: String, strCol: String): DataFrame = {
    val base = records.select(col(idCol).as("id"), col(strCol).as("s"))
    // i = 0 keeps the string itself; i in 1..len deletes position i.
    // The variant travels as an xxhash64 (narrow shuffle key; a
    // collision only ADDS a candidate, which the exact verify removes)
    // WITH its deletion position: FastSS's position refinement — a true
    // ed ≤ 1 pair always has a witness with EITHER an identity side
    // (insert/delete case) OR equal-or-adjacent deletion positions
    // (substitution: (p,p); char-run edits shift by at most 1) — while
    // far-apart double deletions are exactly-ed-2 pairs, pruned HERE,
    // inside the join's codegen pipeline, before the pair-distinct
    // shuffle they would otherwise dominate (5-8× of the output at the
    // 100× gate's digit-dense corpus)
    // persisted: the self-join below reads this relation as BOTH sides,
    // and Spark plans don't dedupe common subtrees — without the persist
    // the (len+1)× posexplode + distinct ran twice per invocation
    val variants = base.select(col("id"),
        posexplode(expr("transform(sequence(0, length(s)), " +
          "i -> if(i = 0, s, concat(substring(s, 1, i - 1), substring(s, i + 1))))"))
          .as(Seq("pos", "v")))
      .select(col("id"), col("pos"), xxhash64(col("v")).as("vh"))
      .distinct()
      .scopedPersist()
    val cands = variants
      .join(variants.select(col("id").as("id_b"), col("pos").as("pos_b"), col("vh")), Seq("vh"))
      .filter(col("id") < col("id_b"))
      .filter(col("pos") === 0 || col("pos_b") === 0 ||
        abs(col("pos") - col("pos_b")) <= 1)
      .select(col("id").as("id_a"), col("id_b")).distinct()
    cands
      .join(base.select(col("id").as("id_a"), col("s").as("sa")), Seq("id_a"))
      .join(base.select(col("id").as("id_b"), col("s").as("sb")), Seq("id_b"))
      .withColumn("dist", levenshtein(col("sa"), col("sb")))
      .filter(col("dist") <= 1)
      .select(col("id_a"), col("id_b"), col("dist"))
  }

  /** EDIT-DISTANCE SIMILARITY JOIN via q-gram prefix filtering (the
    * Ed-Join family — Gravano et al. 2001's q-gram count bound, Xiao et
    * al. VLDB'08's prefix filter): all pairs with levenshtein ≤ `d`,
    * WITHOUT the N² cross join.
    *
    * Why it's sound: one edit destroys at most q of a string's
    * positional q-grams, so ed(s,t) ≤ d ⟹ the gram MULTISETS differ by
    * ≤ q·d elements per side ⟹ under ANY global total order on grams,
    * the (q·d+1)-smallest grams of s and of t must share an element
    * (the classic prefix-filter lemma with overlap bound
    * τ = |G(s)| − q·d). Multisets become sets by tagging each gram with
    * its occurrence index. The order used is (global frequency asc,
    * gram) — rarest-first, which is also what makes it FAST: candidate
    * volume is Σ over PREFIX grams of freq², and prefixes
    * systematically avoid the hot grams ("Customer#" here, stopword
    * shingles in a corpus) that would square a naive gram join.
    *
    * Contract: strings shorter than q·(d+1) chars have fewer than
    * q·d+1 grams and are excluded (callers filter; at that length the
    * residual cross join is metadata-scale anyway).
    *
    * Scale: gram census + rank join shuffle by gram (combinable
    * counts), per-string prefix selection is one window by id, the
    * candidate join touches only rare grams, and the final verify runs
    * levenshtein on candidates only. No driver materialization.
    */
  def editJoin(records: DataFrame, idCol: String, strCol: String,
               d: Int, q: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(d >= 1 && q >= 2, s"editJoin: need d >= 1, q >= 2, got d=$d q=$q")
    val prefixLen = q * d + 1
    val base = records
      .select(col(idCol).as("id"), col(strCol).as("s"))
      .filter(length(col("s")) >= q * (d + 1))
    val grams = base.select(col("id"),
        posexplode(expr(s"transform(sequence(1, length(s) - ${q - 1}), i -> substring(s, i, $q))")))
      .withColumnRenamed("col", "gram")
      .withColumn("occ", row_number().over(
        Window.partitionBy(col("id"), col("gram")).orderBy(col("pos"))))
      .select(col("id"), concat_ws("#", col("gram"), col("occ")).as("gk"))
    val census = grams.groupBy(col("gk")).agg(count(lit(1)).as("freq"))
    val prefix = grams.join(census, Seq("gk"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("freq"), col("gk"))))
      .filter(col("rk") <= prefixLen)
      .select(col("id"), col("gk"))
    val cands = prefix.join(prefix.select(col("id").as("id_b"), col("gk")), Seq("gk"))
      .filter(col("id") < col("id_b"))
      .select(col("id").as("id_a"), col("id_b")).distinct()
    cands
      .join(base.select(col("id").as("id_a"), col("s").as("sa")), Seq("id_a"))
      .join(base.select(col("id").as("id_b"), col("s").as("sb")), Seq("id_b"))
      .filter(abs(length(col("sa")) - length(col("sb"))) <= d)
      .withColumn("dist", levenshtein(col("sa"), col("sb")))
      .filter(col("dist") <= d)
      .select(col("id_a"), col("id_b"), col("dist"))
  }
}
