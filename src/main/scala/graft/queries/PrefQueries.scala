package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.QueryBuilder.scan

/** Preference-data (RLHF) tier: the readouts a preference-ranking
  * pipeline runs over pairwise model comparisons — win-rate matrix,
  * Copeland pairwise-majority score, Bradley–Terry strengths via the
  * MM algorithm (Hunter 2004) in EXACT integer arithmetic, and Fleiss'
  * kappa over multi-annotator labels (the annotation-QA gate before any
  * of it is trusted). Reference analogue: the same post-load aggregation
  * seam as the CRM joins (SURVEY §2.5); the comparisons themselves are
  * derived deterministically from `orders` so both engines replay the
  * identical game log.
  *
  * Derivation (shared by engine and oracle): order row → one game
  * between model a = o_custkey%5 and b = (a + 1 + o_orderkey%4) % 5
  * (always ≠ a); a wins iff (o_orderkey·31 + o_custkey·7) % 100 <
  * 50 + 10(a−b) — an embedded ground-truth strength gradient, so the
  * estimators have real signal to recover. All scores are floor-ppm /
  * micro-unit integers: cross-engine hashable, no float drift.
  *
  * 100 TB shape: every query reduces the game log with one combinable
  * aggregation to a ≤ 25-row pair/model matrix; the BT iteration runs
  * on that matrix (driver-side, metadata-scale — the k-row-seed
  * convention), never on the log.
  */
object PrefQueries {

  // games per model pair, canonical (lo < hi) orientation — the one
  // distributed pass every estimator below shares. Takes the orders
  // RELATION so the streaming monitor can apply it per micro-batch
  private[queries] def canonGamesOf(orders: DataFrame): DataFrame =
    orders.select(
        (col("o_custkey") % 5).cast("int").as("a"),
        ((col("o_custkey") % 5 + 1 + col("o_orderkey") % 4) % 5).cast("int").as("b"),
        when((col("o_orderkey") * 31 + col("o_custkey") * 7) % 100 <
          lit(50) + lit(10) * (col("o_custkey") % 5 -
            (col("o_custkey") % 5 + 1 + col("o_orderkey") % 4) % 5), 1L)
          .otherwise(0L).as("win_a"))
      .select(
        least(col("a"), col("b")).as("lo"),
        greatest(col("a"), col("b")).as("hi"),
        when(col("a") < col("b"), col("win_a"))
          .otherwise(lit(1L) - col("win_a")).as("win_lo"))

  private def canonGames(s: SparkSession, d: String): DataFrame =
    canonGamesOf(scan(s, d, "orders"))

  /** Bradley–Terry MM iteration in exact Long arithmetic — identical
    * on both engines (the oracle unrolls the same recurrence as CTE
    * stages): d_ij = n_ij·10⁹ div (p_i+p_j) floored per term, p'_i =
    * w_i·10⁹ div Σd, renormalized to Σp = 5·10⁶, max(·,1) floors.
    * Inputs are the ≤ 10-row pair matrix and 5-row win vector.
    */
  private[graft] def btMm(pairs: Seq[(Int, Int, Long)], wins: Map[Int, Long],
                            models: Seq[Int], iters: Int): Map[Int, Long] = {
    val sym = pairs.flatMap { case (lo, hi, n) => Seq((lo, hi, n), (hi, lo, n)) }
    var p = models.map(_ -> 1000000L).toMap
    (0 until iters).foreach { _ =>
      val praw = models.map { i =>
        val si = sym.collect { case (mi, mj, n) if mi == i =>
          n * 1000000000L / (p(i) + p(mj))
        }.sum
        i -> math.max(wins.getOrElse(i, 0L) * 1000000000L / math.max(si, 1L), 1L)
      }.toMap
      val tot = praw.values.sum
      p = models.map(i => i -> math.max(praw(i) * 5000000L / tot, 1L)).toMap
    }
    p
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // WIN-RATE MATRIX — the first readout of any pairwise-preference
    // dataset (model-arena style): per unordered model pair, games,
    // low-model wins, exact floor-ppm win rate. One combinable groupBy
    "q_pref_winrate" -> ((s: SparkSession, d: String) =>
      canonGames(s, d)
        .groupBy(col("lo").as("model_lo"), col("hi").as("model_hi"))
        .agg(count(lit(1)).as("n_games"), sum(col("win_lo")).as("n_wins_lo"))
        .withColumn("winrate_ppm", expr("n_wins_lo * 1000000 div n_games"))
        .orderBy(col("model_lo"), col("model_hi"))),

    // COPELAND SCORE — the tournament ranking that needs no model at
    // all: an opponent is "beaten" iff the pairwise majority goes your
    // way; copeland2 = 2·beaten + tied (integer, no halves). The
    // sanity anchor the BT strengths must agree with directionally
    "q_pref_copeland" -> ((s: SparkSession, d: String) => {
      val pairs = canonGames(s, d)
        .groupBy(col("lo"), col("hi"))
        .agg(sum(col("win_lo")).as("wl"),
          (count(lit(1)) - sum(col("win_lo"))).as("wh"))
      val dir = pairs.select(col("lo").as("model"),
          when(col("wl") > col("wh"), 1L).otherwise(0L).as("beat"),
          when(col("wl") === col("wh"), 1L).otherwise(0L).as("tie"))
        .unionAll(pairs.select(col("hi").as("model"),
          when(col("wh") > col("wl"), 1L).otherwise(0L).as("beat"),
          when(col("wl") === col("wh"), 1L).otherwise(0L).as("tie")))
      dir.groupBy(col("model"))
        .agg(count(lit(1)).cast("int").as("n_opponents"),
          sum(col("beat")).cast("int").as("n_beat"),
          sum(col("tie")).cast("int").as("n_tied"))
        .withColumn("copeland2",
          (col("n_beat") * 2 + col("n_tied")).cast("int"))
        .orderBy(col("model"))
    }),

    // BRADLEY–TERRY STRENGTHS (Hunter 2004 MM, 10 iterations) — the
    // canonical preference-strength model behind RLHF reward baselines
    // and arena leaderboards, in exact micro-unit integers so DuckDB
    // replays every division. The game log reduces to a ≤ 10-row pair
    // matrix + 5-row win vector distributively; ONLY that matrix is
    // collected (metadata-scale, the k-row-seed convention) and the MM
    // loop runs on it — at 100 TB the iteration cost is independent of
    // the log size
    "q_pref_btl" -> ((s: SparkSession, d: String) => {
      val pairRows = canonGames(s, d).groupBy(col("lo"), col("hi"))
        .agg(count(lit(1)).as("n"), sum(col("win_lo")).as("wl"))
        .collect()
      val pairs = pairRows.map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSeq
      val winLo = pairRows.map(r => (r.getInt(0), r.getLong(3)))
      val winHi = pairRows.map(r => (r.getInt(1), r.getLong(2) - r.getLong(3)))
      val wins = (winLo ++ winHi).groupBy(_._1).map { case (m, xs) => m -> xs.map(_._2).sum }
      val games = pairs.flatMap { case (lo, hi, n) => Seq((lo, n), (hi, n)) }
        .groupBy(_._1).map { case (m, xs) => m -> xs.map(_._2).sum }
      val models = (0 until 5).toSeq
      val p = btMm(pairs, wins, models, iters = 10)
      val ranked = models.sortBy(m => (-p(m), m)).zipWithIndex
        .map { case (m, i) => m -> (i + 1) }.toMap
      import s.implicits._
      models.map(m => (m, wins.getOrElse(m, 0L), games.getOrElse(m, 0L),
          p(m), ranked(m)))
        .toDF("model", "w", "n_games", "p_micro", "rank")
        .select(col("model"), col("w"), col("n_games"), col("p_micro"),
          col("rank").cast("int").as("rank"))
        .orderBy(col("model"))
    }),

    // FLEISS' KAPPA (Fleiss 1971) — inter-annotator agreement over 3
    // deterministic raters × 4 categories, the QA gate on any human-
    // labeled preference/classification set. Exact floor-ppm chain:
    // P̄ = (ΣΣn_ic² − N·n) / (N·n(n−1)), Pe = Σp_c², κ = (P̄−Pe)/(1−Pe),
    // every division a single floor on non-negative integers (the sign
    // of the κ numerator is handled explicitly so engine truncation
    // and oracle floor can never diverge). One combinable census
    "q_eval_fleiss" -> ((s: SparkSession, d: String) => {
      val ratings = scan(s, d, "orders")
        .select(col("o_orderkey").as("item"),
          explode(sequence(lit(0), lit(2))).as("r"))
        .withColumn("cat",
          when((col("item") * 7 + col("r") * 13) % 10 < 2,
            (col("item") + col("r")) % 4).otherwise(col("item") % 4))
      val nic = ratings.groupBy(col("item"), col("cat"))
        .agg(count(lit(1)).as("c"))
      val s2n = nic.agg(sum(col("c") * col("c")).as("s2"),
        countDistinct(col("item")).as("n_items"))
      val pc = nic.groupBy(col("cat")).agg(sum(col("c")).as("colsum"))
        .crossJoin(broadcast(s2n.select(col("n_items").as("ni"))))
        .select(expr("colsum * 1000000 div (3 * ni)").as("pc_ppm"))
        .agg(sum(expr("pc_ppm * pc_ppm")).as("pc2"))
      s2n.crossJoin(broadcast(pc))
        .select(col("n_items"),
          expr("(s2 - 3 * n_items) * 1000000 div (6 * n_items)").as("pbar_ppm"),
          expr("pc2 div 1000000").as("pe_ppm"))
        .select(col("n_items"), col("pbar_ppm"), col("pe_ppm"),
          // degenerate-data guard: if every rating lands in ONE category
          // pe_ppm = 10⁶ and the bare denominator is 0 (Spark NULL vs a
          // DuckDB error — a silent divergence); GREATEST(·,1) applied
          // IDENTICALLY in both engines keeps the division total
          expr("""CASE WHEN pbar_ppm >= pe_ppm
                 |THEN (pbar_ppm - pe_ppm) * 1000000 div GREATEST(1000000 - pe_ppm, 1)
                 |ELSE -((pe_ppm - pbar_ppm) * 1000000 div GREATEST(1000000 - pe_ppm, 1))
                 |END""".stripMargin.replace("\n", " ")).as("kappa_ppm"))
    })
  )

  // shared oracle CTEs: the identical game derivation
  private val gamesCtes =
    """games AS (
      |  SELECT CAST(o_custkey % 5 AS INT) AS a,
      |    CAST((o_custkey % 5 + 1 + o_orderkey % 4) % 5 AS INT) AS b,
      |    CASE WHEN (o_orderkey * 31 + o_custkey * 7) % 100
      |              < 50 + 10 * (o_custkey % 5
      |                           - (o_custkey % 5 + 1 + o_orderkey % 4) % 5)
      |         THEN 1 ELSE 0 END AS win_a
      |  FROM orders),
      |canon AS (
      |  SELECT LEAST(a, b) AS lo, GREATEST(a, b) AS hi,
      |    CAST(CASE WHEN a < b THEN win_a ELSE 1 - win_a END AS BIGINT) AS win_lo
      |  FROM games)""".stripMargin

  // Bradley–Terry oracle: the SAME 10 MM iterations, unrolled as CTE
  // stages (recursive CTEs with aggregation over the recursive relation
  // are engine-dependent; unrolled stages are not). Every stage is
  // MATERIALIZED — each references the previous twice, so inlined CTEs
  // would re-evaluate the whole chain 2^rounds times (the documented
  // DuckDB iterated-CTE failure mode)
  private val btlSql: String = {
    val steps = (0 until 10).map { k =>
      s"""s$k AS MATERIALIZED (SELECT i.model AS model,
         |  CAST(COALESCE(SUM(np.n * 1000000000 // (i.p + j.p)), 0) AS BIGINT) AS s
         |  FROM it$k i LEFT JOIN np ON np.mi = i.model
         |    LEFT JOIN it$k j ON j.model = np.mj
         |  GROUP BY i.model),
         |pr$k AS MATERIALIZED (SELECT w.model,
         |  CAST(GREATEST(w.w * 1000000000 // GREATEST(s$k.s, 1), 1) AS BIGINT) AS praw
         |  FROM w JOIN s$k ON s$k.model = w.model),
         |it${k + 1} AS MATERIALIZED (SELECT model,
         |  CAST(GREATEST(praw * 5000000 //
         |    (SELECT CAST(SUM(praw) AS BIGINT) FROM pr$k), 1) AS BIGINT) AS p
         |  FROM pr$k)""".stripMargin
    }.mkString(",\n")
    s"""WITH $gamesCtes,
       |pairs AS MATERIALIZED (SELECT lo, hi, CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM(win_lo) AS BIGINT) AS wl
       |  FROM canon GROUP BY lo, hi),
       |np AS MATERIALIZED (SELECT lo AS mi, hi AS mj, n FROM pairs
       |  UNION ALL SELECT hi, lo, n FROM pairs),
       |mdl AS (SELECT CAST(unnest(range(0, 5)) AS INT) AS model),
       |w AS MATERIALIZED (SELECT mdl.model,
       |    CAST(COALESCE(SUM(wv), 0) AS BIGINT) AS w
       |  FROM mdl LEFT JOIN (
       |    SELECT lo AS model, wl AS wv FROM pairs
       |    UNION ALL SELECT hi, n - wl FROM pairs) x ON x.model = mdl.model
       |  GROUP BY mdl.model),
       |g AS (SELECT mdl.model, CAST(COALESCE(SUM(np.n), 0) AS BIGINT) AS n_games
       |  FROM mdl LEFT JOIN np ON np.mi = mdl.model GROUP BY mdl.model),
       |it0 AS MATERIALIZED (SELECT CAST(unnest(range(0, 5)) AS INT) AS model,
       |  CAST(1000000 AS BIGINT) AS p),
       |$steps
       |SELECT w.model, w.w, g.n_games, it10.p AS p_micro,
       |  CAST(ROW_NUMBER() OVER (ORDER BY it10.p DESC, w.model) AS INT) AS rank
       |FROM w JOIN g ON g.model = w.model JOIN it10 ON it10.model = w.model
       |ORDER BY w.model""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    "q_pref_winrate" ->
      s"""WITH $gamesCtes
         |SELECT lo AS model_lo, hi AS model_hi,
         |  CAST(COUNT(*) AS BIGINT) AS n_games,
         |  CAST(SUM(win_lo) AS BIGINT) AS n_wins_lo,
         |  CAST(SUM(win_lo) * 1000000 // COUNT(*) AS BIGINT) AS winrate_ppm
         |FROM canon GROUP BY lo, hi ORDER BY model_lo, model_hi""".stripMargin,

    "q_pref_copeland" ->
      s"""WITH $gamesCtes,
         |pairs AS (SELECT lo, hi, SUM(win_lo) AS wl,
         |    COUNT(*) - SUM(win_lo) AS wh
         |  FROM canon GROUP BY lo, hi),
         |dir AS (
         |  SELECT lo AS model, CASE WHEN wl > wh THEN 1 ELSE 0 END AS beat,
         |    CASE WHEN wl = wh THEN 1 ELSE 0 END AS tie FROM pairs
         |  UNION ALL
         |  SELECT hi, CASE WHEN wh > wl THEN 1 ELSE 0 END,
         |    CASE WHEN wl = wh THEN 1 ELSE 0 END FROM pairs)
         |SELECT model, CAST(COUNT(*) AS INT) AS n_opponents,
         |  CAST(SUM(beat) AS INT) AS n_beat, CAST(SUM(tie) AS INT) AS n_tied,
         |  CAST(2 * SUM(beat) + SUM(tie) AS INT) AS copeland2
         |FROM dir GROUP BY model ORDER BY model""".stripMargin,

    "q_pref_btl" -> btlSql,

    "q_eval_fleiss" ->
      """WITH ratings AS (
        |  SELECT o_orderkey AS item, r,
        |    CASE WHEN (o_orderkey * 7 + r * 13) % 10 < 2
        |         THEN (o_orderkey + r) % 4 ELSE o_orderkey % 4 END AS cat
        |  FROM orders, (SELECT unnest(range(0, 3)) AS r)),
        |nic AS (SELECT item, cat, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM ratings GROUP BY item, cat),
        |s2n AS (SELECT CAST(SUM(c * c) AS BIGINT) AS s2,
        |    CAST(COUNT(DISTINCT item) AS BIGINT) AS n_items FROM nic),
        |pc AS (SELECT CAST(SUM(pcp * pcp) AS BIGINT) AS pc2 FROM (
        |  SELECT SUM(c) * 1000000 // (3 * (SELECT n_items FROM s2n)) AS pcp
        |  FROM nic GROUP BY cat)),
        |m AS (SELECT n_items,
        |    CAST((s2 - 3 * n_items) * 1000000 // (6 * n_items) AS BIGINT) AS pbar_ppm,
        |    CAST(pc2 // 1000000 AS BIGINT) AS pe_ppm
        |  FROM s2n, pc)
        |SELECT n_items, pbar_ppm, pe_ppm,
        |  CAST(CASE WHEN pbar_ppm >= pe_ppm
        |    THEN (pbar_ppm - pe_ppm) * 1000000 // GREATEST(1000000 - pe_ppm, 1)
        |    ELSE -((pe_ppm - pbar_ppm) * 1000000 // GREATEST(1000000 - pe_ppm, 1))
        |  END AS BIGINT) AS kappa_ppm
        |FROM m""".stripMargin
  )
}
