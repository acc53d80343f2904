package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import CacheScope.ScopedPersist

/** Similarity search over embedding columns (Array[Float]).
  *
  * Numerics are engineered for cross-engine determinism: per-element
  * products are computed in double (exact IEEE, identical everywhere),
  * each term is scaled by 1e12 and floored to a long (floor of identical
  * doubles is identical on every engine — unlike double→decimal casts,
  * where Spark rounds the *shortest string* representation via
  * java.math.BigDecimal while DuckDB rounds the exact binary value, which
  * diverges on boundary cases), and the long sum is exact and
  * order-independent. So a distributed Spark sum equals a single-node
  * DuckDB sum bit-for-bit, and cluster runs are reproducible regardless
  * of partitioning. The 1e12 scale cancels in the cosine ratio.
  *
  * Scale design: brute-force top-k is the per-query baseline (one pass,
  * no shuffle, TakeOrderedAndProject); the LSH path buckets vectors by
  * 16 deterministic random-hyperplane signs so a query probes only its
  * bucket — the 100 TB shape (bucket = partition key).
  */
object Similarity {

  private val SCALE = 1e12

  /** Scaled exact dot product: Σ floor(a_i·b_i·1e12) as a long.
    * Order-independent; |terms| must stay < 2^53/1e12 ≈ 9e3 per element
    * pair (fine for unit-ish embeddings).
    */
  def scaledDot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a.cast("array<double>"), b.cast("array<double>"),
        (x, y) => floor(x * y * lit(SCALE)).cast("long")),
      lit(0L),
      (acc, x) => acc + x
    )

  /** Deterministic cosine similarity (the 1e12 scales cancel). */
  def cosine(a: Column, b: Column): Column =
    scaledDot(a, b).cast("double") /
      (sqrt(scaledDot(a, a).cast("double")) * sqrt(scaledDot(b, b).cast("double")))

  // ------------------------------------------------------ hyperplane LSH

  /** Deterministic ±1 hyperplane component for (plane, dim): +1 iff the
    * first hex digit of md5("plane_dim") is >= 8. Same formula is
    * spelled in the oracle SQL, so Spark and DuckDB build the identical
    * hyperplane set with no shipped state.
    */
  def hyperplaneSign(plane: Int, dim: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"${plane}_${dim}".getBytes("UTF-8"))
    val firstDigit = (hex(0) >> 4) & 0xf
    if (firstDigit >= 8) 1.0 else -1.0
  }

  def signRow(plane: Int, dims: Int): Seq[Double] =
    (0 until dims).map(j => hyperplaneSign(plane, j))

  /** BINARY SIGN QUANTIZATION, 32 dims per BIGINT half: bit k of half h
    * is 1 iff v[32h + k] ≥ 0. Two 32-bit halves instead of one 64-bit
    * word keep every packed value in [0, 2^32) — no shift-into-sign-bit
    * hazard, and the DuckDB oracle's SUM-of-powers replay needs no
    * HUGEINT. A 64-dim float vector (256 bytes) becomes 16 bytes; the
    * Hamming distance is two XOR+popcounts — the memory/bandwidth shape
    * that makes billion-vector first-pass retrieval affordable, with
    * exact cosine re-ranking only the shortlist (Hamming distance on
    * sign bits is a monotone proxy for angular distance in expectation).
    */
  def signPackHalf(v: Column, half: Int): Column =
    (0 until 32).map { k =>
      when(element_at(v.cast("array<double>"), 32 * half + k + 1) >= 0,
        lit(1L << k)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Random-hyperplane LSH bucket id (numPlanes bits): bit i = 1 iff
    * dot(v, plane_i) > 0, with the dot in exact scaled-integer arithmetic.
    */
  def lshBucket(v: Column, dims: Int, numPlanes: Int = 16): Column =
    (0 until numPlanes).map { i =>
      val signs = array(signRow(i, dims).map(lit): _*)
      when(scaledDot(v, signs) > 0L, lit(1L << i)).otherwise(0L)
    }.reduce(_ + _)

  /** Brute-force cosine top-k against one query vector (broadcast): one
    * scan of the corpus, TakeOrderedAndProject — the correctness
    * baseline any ANN variant is measured against.
    */
  def bruteTopK(corpus: DataFrame, idCol: String, vecCol: String,
                query: DataFrame, queryVecCol: String, k: Int): DataFrame = {
    val q = broadcast(query.select(col(queryVecCol).as("__qv")))
    corpus.crossJoin(q)
      .withColumn("cosine", cosine(col(vecCol), col("__qv")))
      .select(col(idCol), col("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }

  /** LSH-bucketed ANN: candidates = corpus rows in the query's bucket;
    * exact cosine re-rank of the bucket only. At scale the corpus is
    * written bucket-partitioned so a query reads one partition.
    */
  def lshTopK(corpus: DataFrame, idCol: String, vecCol: String, dims: Int,
              query: DataFrame, queryVecCol: String, k: Int, numPlanes: Int = 16): DataFrame = {
    val q = broadcast(query.select(col(queryVecCol).as("__qv"),
      lshBucket(col(queryVecCol), dims, numPlanes).as("__qb")))
    corpus
      .withColumn("__b", lshBucket(col(vecCol), dims, numPlanes))
      .join(q, col("__b") === col("__qb"))
      .withColumn("cosine", cosine(col(vecCol), col("__qv")))
      .select(col(idCol), col("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }

  /** Blocked k-NN JOIN: top-k neighbors for EVERY query row at once —
    * the batch shape real pipelines run (embedding table vs itself or a
    * probe set), not one vector at a time. Both sides are bucketed by
    * the same hyperplane LSH; candidates are same-bucket pairs (equi-
    * join — at 100 TB both tables are written partitioned by bucket, so
    * the join is co-located), then an exact cosine re-rank keeps the
    * top-k per query via row_number. Recall is bucket-limited like any
    * single-probe LSH; raise recall by lowering numPlanes or probing
    * neighbor buckets.
    */
  def knnJoin(corpus: DataFrame, idCol: String, vecCol: String,
              queries: DataFrame, qIdCol: String, qVecCol: String,
              dims: Int, k: Int, numPlanes: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("__cv"),
      lshBucket(col(vecCol), dims, numPlanes).as("__b"))
    val q = queries.select(col(qIdCol).as("query_id"), col(qVecCol).as("__qv"),
      lshBucket(col(qVecCol), dims, numPlanes).as("__b"))
    val scored = q.join(c, Seq("__b"))
      .filter(col("query_id") =!= col("corpus_id"))
      .withColumn("cosine", cosine(col("__qv"), col("__cv")))
      .select(col("query_id"), col("corpus_id"), col("cosine"))
    // per-query top-k via the custom partial/final operator: candidates
    // are pruned to ≤ k per query per partition BEFORE the shuffle (the
    // row_number window alone would shuffle every candidate pair); the
    // tiny survivor set then gets its rank from a window over ≤ k rows
    val topk = graft.plans.TopKPerKey.topKPerKey(scored,
      keyCols = Seq("query_id"), sorts = Seq(("cosine", false), ("corpus_id", true)), k = k)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id").asc)
    topk.withColumn("rank", row_number().over(w))
      .select(col("query_id"), col("rank"), col("corpus_id"), col("cosine"))
  }

  /** Margin-based bitext/pair mining (Artetxe & Schwenk 2019, the
    * LASER/CCMatrix recipe): candidate (x, y) cross-side pairs from a
    * shared-LSH-bucket equi-join (at 100 TB both sides live bucket-
    * partitioned, so candidates are co-located — never the all-pairs
    * cross product), each side's k-NN lists and their mean similarity
    * computed over the SAME candidate set, then pairs kept only if
    * MUTUAL (x ∈ kNN(y) ∧ y ∈ kNN(x)) with margin =
    * cos(x,y) / ((avg_k(x) + avg_k(y)) / 2) > 1. All margin arithmetic
    * is scaled-integer (floor(cos·1e12), integer avg, floor-ppm ratio) —
    * order-independent and bit-equal on any engine; candidates are
    * pre-filtered to cos > 0 so every denominator is positive (margin
    * mining only ever considers positive-similarity neighbors).
    * Candidate generation is one bucketed join; both top-k passes ride
    * the TopKPerKey partial/final operator (≤ k rows per key cross the
    * shuffle); the per-side averages are k-row aggregates.
    */
  def bitextMine(xs: DataFrame, xIdCol: String, xVecCol: String,
                 ys: DataFrame, yIdCol: String, yVecCol: String,
                 dims: Int, k: Int, numPlanes: Int = 16): DataFrame = {
    val xb = xs.select(col(xIdCol).as("x_id"), col(xVecCol).as("__xv"),
      lshBucket(col(xVecCol), dims, numPlanes).as("__b"))
    val yb = ys.select(col(yIdCol).as("y_id"), col(yVecCol).as("__yv"),
      lshBucket(col(yVecCol), dims, numPlanes).as("__b"))
    val cand = xb.join(yb, Seq("__b"))
      .withColumn("cosine", cosine(col("__xv"), col("__yv")))
      .filter(col("cosine") > 0)
      .withColumn("cs", floor(col("cosine") * lit(SCALE)).cast("long"))
      .select(col("x_id"), col("y_id"), col("cosine"), col("cs"))
      .scopedPersist() // consumed by both directions' top-k below
    val topX = graft.plans.TopKPerKey.topKPerKey(cand,
      keyCols = Seq("x_id"), sorts = Seq(("cosine", false), ("y_id", true)), k = k)
    val topY = graft.plans.TopKPerKey.topKPerKey(cand,
      keyCols = Seq("y_id"), sorts = Seq(("cosine", false), ("x_id", true)), k = k)
    val avgX = topX.groupBy(col("x_id"))
      .agg(expr("sum(cs) div count(1)").as("__ax"))
    val avgY = topY.groupBy(col("y_id"))
      .agg(expr("sum(cs) div count(1)").as("__ay"))
    topX.join(topY.select(col("x_id"), col("y_id")), Seq("x_id", "y_id"))
      .join(avgX, Seq("x_id"))
      .join(avgY, Seq("y_id"))
      .withColumn("margin_ppm", expr("(cs * 2000000) div (__ax + __ay)"))
      .filter(col("margin_ppm") > 1000000L)
      .select(col("x_id"), col("y_id"), col("cosine"), col("margin_ppm"))
      .orderBy(col("margin_ppm").desc, col("x_id"), col("y_id"))
  }

  /** Driver-side twins of scaledDot/cosine — same IEEE double ops and
    * floor-scaling, so coordination decisions made on the driver (e.g.
    * IVF probe selection) agree bit-for-bit with in-plan arithmetic.
    */
  def scaledDotLocal(a: Seq[Float], b: Seq[Float]): Long = {
    var s = 0L
    var i = 0
    while (i < a.length) { s += math.floor(a(i).toDouble * b(i).toDouble * SCALE).toLong; i += 1 }
    s
  }
  def cosineLocal(a: Seq[Float], b: Seq[Float]): Double =
    scaledDotLocal(a, b).toDouble /
      (math.sqrt(scaledDotLocal(a, a).toDouble) * math.sqrt(scaledDotLocal(b, b).toDouble))

  def scaledDotLocalD(a: Seq[Double], b: Seq[Double]): Long = {
    var s = 0L
    var i = 0
    while (i < a.length) { s += math.floor(a(i) * b(i) * SCALE).toLong; i += 1 }
    s
  }

  /** IVF-style ANN: a deterministic coarse quantizer (the K vectors with
    * the smallest ids act as centroids — no trained state to ship, no
    * RNG), every vector is assigned to its max-cosine centroid (ties →
    * lowest centroid index), and a query probes only the `probes`
    * centroids nearest to it, re-ranking those cells exactly. At 100 TB
    * the corpus is written partitioned by `cell`, so a query reads
    * probes/K of the data. Swap the seed rule for k-means centroids and
    * nothing else changes.
    */
  /** Max-cosine cell assignment over a precomputed self-norm column —
    * seed norms are driver-side constants and the vector's norm is read
    * from `n2Col` once, so assignment costs 1 dot per (row, seed)
    * instead of 3.
    */
  def ivfCells(vecCol: String, n2Col: String, seeds: Seq[(Int, Seq[Float])]): Column =
    cellsForCentroids(vecCol, n2Col,
      seeds.map { case (i, sv) => i -> sv.map(_.toDouble) })

  /** Same max-cosine assignment against driver-side DOUBLE centroids
    * (k-means refinement produces fractional centroids that were never
    * float vectors). Centroids ride the plan as literal arrays — at any
    * scale this is a broadcast-free map-side pass.
    */
  def cellsForCentroids(vecCol: String, n2Col: String, seeds: Seq[(Int, Seq[Double])]): Column = {
    val cosArr = centroidCosArr(vecCol, n2Col, seeds)
    // r17: single-evaluation argmax fold — the former
    // array_position(cosArr, array_max(cosArr)) referenced the k-dot
    // cosine array TWICE, and HOF expressions are CodegenFallback, so
    // both references re-evaluated all k dots per row. Strict > keeps
    // the FIRST maximum (the same lowest-index tie-break), and Spark's
    // NaN ordering (NaN > x for any non-NaN, first NaN then sticks)
    // selects the first NaN in both spellings — assignment identical.
    aggregate(
      zip_with(cosArr, sequence(lit(0), lit(seeds.size - 1)),
        (c, i) => struct(c.as("c"), i.as("i"))),
      struct(lit(Double.NegativeInfinity).as("c"), lit(-1).as("i")),
      (acc, x) => when(x.getField("c") > acc.getField("c"), x).otherwise(acc))
      .getField("i").cast("int")
  }

  /** The max cosine itself — the value [[cellsForCentroids]] argmaxes.
    * Low best-cosine = the vector sits far from every centroid: the
    * embedding-space outlier signal.
    */
  def bestCentroidCosine(vecCol: String, n2Col: String, seeds: Seq[(Int, Seq[Double])]): Column =
    array_max(centroidCosArr(vecCol, n2Col, seeds))

  private def centroidCosArr(vecCol: String, n2Col: String,
                             seeds: Seq[(Int, Seq[Double])]): Column = {
    // an empty centroid set would silently yield null cells downstream
    require(seeds.nonEmpty, "centroid cosine: empty centroid set (corpus smaller than k?)")
    // r17 (guide §1.2 order-of-operations, applied to PLAN cost): the
    // centroid table rides as ONE array<array<double>> literal indexed
    // by a HOF loop instead of k independently-expanded
    // aggregate(zip_with(vec, array(64 lits))) branches — k×dims×~5
    // expression nodes collapse to ~100, which is what the optimizer
    // and codegen walk on EVERY invocation (at bench scale the corpus
    // is 2k rows, so plan cost dominated these queries; at 100 TB the
    // executed bytecode is the same tight fold either way). Arithmetic
    // is replayed exactly: floor(x·y·1e12) longs summed, divided by the
    // same driver-computed seed norms — results bit-identical.
    val seedLit = typedlit(seeds.map(_._2))
    val normLit = typedlit(seeds.map { case (_, sv) =>
      math.sqrt(scaledDotLocalD(sv, sv).toDouble) })
    transform(sequence(lit(0), lit(seeds.size - 1)), si =>
      aggregate(
        zip_with(col(vecCol).cast("array<double>"), element_at(seedLit, si + 1),
          (x, y) => floor(x * y * lit(SCALE)).cast("long")),
        lit(0L), (acc, x) => acc + x).cast("double") /
        (sqrt(col(n2Col).cast("double")) * element_at(normLit, si + 1)))
  }

  // ----------------------------------------- deterministic k-means (Lloyd)

  private val MEAN_SCALE = 1e6

  /** Distributed Lloyd iterations with NO randomness and NO float-sum
    * nondeterminism: seeds are the k smallest-id vectors; each refinement
    * assigns every vector to its max-cosine centroid (one codegen'd
    * map-side pass — centroids are plan literals), then recomputes each
    * centroid as the per-dimension mean via EXACT scaled-integer sums
    * (Σ floor(x·1e6) as long — order-independent, so any partitioning of
    * a 1000-executor sum gives the bit-identical centroid), collected at
    * k×dims rows per round (metadata-scale, like the IVF seed collect).
    * Cells that lose all members keep their previous centroid.
    *
    * Per round: one shuffle of k×dims grouped longs. The quadratic step
    * k-means usually implies never happens on the executors — the argmax
    * is against k literals.
    */
  def kmeansCentroids(corpus: DataFrame, idCol: String, vecCol: String,
                      k: Int, refinements: Int = 1): Seq[(Int, Seq[Double])] = {
    require(k >= 1, s"kmeansCentroids: k must be >= 1, got $k")
    require(refinements >= 0, s"kmeansCentroids: refinements must be >= 0, got $refinements")
    import org.apache.spark.sql.Row
    var seeds: Seq[(Int, Seq[Double])] = corpus.select(col(idCol), col(vecCol))
      .orderBy(col(idCol)).limit(k).collect()
      .zipWithIndex.map { case (r: Row, i) => i -> r.getSeq[Float](1).map(_.toDouble).toSeq }.toSeq
    (0 until refinements).foreach { _ =>
      val sums = corpus
        .withColumn("__n2", scaledDot(col(vecCol), col(vecCol)))
        .withColumn("__cell", cellsForCentroids(vecCol, "__n2", seeds))
        .select(col("__cell"),
          posexplode(col(vecCol).cast("array<double>")).as(Seq("__d", "__x")))
        .groupBy(col("__cell"), col("__d"))
        .agg(sum(floor(col("__x") * lit(MEAN_SCALE)).cast("long")).as("s"),
          count(lit(1)).as("c"))
        .collect() // ≤ k × dims rows
      val byCellDim = sums.map(r =>
        (r.getInt(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3))).toMap
      seeds = seeds.map { case (i, old) =>
        i -> old.indices.map { d =>
          byCellDim.get((i, d)) match {
            case Some((s, c)) => s.toDouble / (MEAN_SCALE * c)
            case None         => old(d) // emptied cell keeps its centroid
          }
        }.toSeq
      }
    }
    seeds
  }

  /** SemDeDup-style semantic dedup: k-means-cluster the embeddings, then
    * inside each cluster mark every vector that has a ≥ tau cosine to a
    * LOWER-id cluster-mate as a duplicate (greedy keep-first — the
    * deterministic version of the SemDeDup prune rule). The pairwise step
    * is cluster-scoped: cost Σ|cell|², never corpus², and at 100 TB the
    * corpus is written partitioned by cell so the pair join is co-located.
    * Output: (id, cell, is_dup) — filter !is_dup for the survivor set.
    */
  def semDedup(corpus: DataFrame, idCol: String, vecCol: String,
               k: Int, refinements: Int, tau: Double): DataFrame = {
    val seeds = kmeansCentroids(corpus, idCol, vecCol, k, refinements)
    val assigned = corpus
      .withColumn("__n2", scaledDot(col(vecCol), col(vecCol)))
      .withColumn("cell", cellsForCentroids(vecCol, "__n2", seeds))
      .scopedPersist() // consumed three times: both pair sides + the output spine
    val a = assigned.select(col("cell"), col(idCol).as("__aid"),
      col(vecCol).as("__av"), col("__n2").as("__an"))
    val b = assigned.select(col("cell"), col(idCol).as("__bid"),
      col(vecCol).as("__bv"), col("__n2").as("__bn"))
    val dups = a.join(b, "cell").filter(col("__aid") < col("__bid"))
      .filter(scaledDot(col("__av"), col("__bv")).cast("double") /
        (sqrt(col("__an").cast("double")) * sqrt(col("__bn").cast("double"))) >= tau)
      .select(col("__bid").as(idCol)).distinct()
      .withColumn("__dup", lit(true))
    assigned.select(col(idCol), col("cell"))
      .join(dups, Seq(idCol), "left")
      .withColumn("is_dup", coalesce(col("__dup"), lit(false)))
      .select(col(idCol), col("cell"), col("is_dup"))
  }

  def ivfTopK(corpus: DataFrame, idCol: String, vecCol: String,
              query: DataFrame, queryVecCol: String, k: Int,
              numCells: Int = 16, probes: Int = 2): DataFrame = {
    import org.apache.spark.sql.Row
    // deterministic centroids: the numCells smallest-id vectors
    val seeds = corpus.select(col(idCol), col(vecCol))
      .orderBy(col(idCol)).limit(numCells).collect()
      .zipWithIndex.map { case (r: Row, i) => i -> r.getSeq[Float](1) }.toSeq
    val qv = query.select(col(queryVecCol)).head().getSeq[Float](0)
    val qNorm = math.sqrt(scaledDotLocal(qv, qv).toDouble)
    // probe selection on the driver, with the same arithmetic as the plan
    val probeCells = seeds.map { case (i, sv) => (cosineLocal(qv, sv), i) }
      .sortBy { case (c, i) => (-c, i) }.take(probes).map(_._2)
    corpus
      .withColumn("__n2", scaledDot(col(vecCol), col(vecCol)))
      .withColumn("__cell", ivfCells(vecCol, "__n2", seeds))
      .filter(col("__cell").isin(probeCells: _*))
      .withColumn("cosine",
        scaledDot(col(vecCol), array(qv.map(v => lit(v.toDouble)): _*)).cast("double") /
          (sqrt(col("__n2").cast("double")) * lit(qNorm)))
      .select(col(idCol), col("__cell").as("cell"), col("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }

  /** The full production ANN stack in one plan — coarse prune →
    * compressed-domain scan → exact re-rank:
    *
    *   1. IVF: probe only the `probes` cells nearest the query
    *      (probes/numCells of the corpus read, cell-partitioned layout);
    *   2. ADC: inside the probed cells, rank by PQ asymmetric distance —
    *      Σ_m lut[m][code_m] over the 8-byte code column, no float
    *      vector touched ([[Quantize.adcDistance]], 32× less I/O);
    *   3. exact re-rank: the `shortlist` best ADC candidates get the
    *      true scaled-integer cosine; top-k of those is the answer.
    *
    * Every boundary decision (cell argmax, code argmin, LUT entries,
    * shortlist and final ranks) is floor-scaled integer or exact IEEE
    * arithmetic shared with the driver twins — bit-reproducible on any
    * partitioning, and DuckDB-provable end to end.
    */
  def ivfAdcTopK(corpus: DataFrame, idCol: String, vecCol: String,
                 query: DataFrame, queryVecCol: String, k: Int,
                 shortlist: Int = 50, numCells: Int = 16, probes: Int = 4,
                 pqM: Int = 8, pqK: Int = 8): DataFrame = {
    import org.apache.spark.sql.Row
    require(pqK <= numCells, "codebook rows are reused from the seed collect: pqK <= numCells")
    val seeds = corpus.select(col(idCol), col(vecCol))
      .orderBy(col(idCol)).limit(numCells).collect()
      .zipWithIndex.map { case (r: Row, i) => i -> r.getSeq[Float](1) }.toSeq
    // both are "the K smallest-id vectors" — one driver collect serves both
    val codebook = seeds.take(pqK).map(_._2.map(_.toDouble).toSeq)
    val qv = query.select(col(queryVecCol)).head().getSeq[Float](0)
    val qNorm = math.sqrt(scaledDotLocal(qv, qv).toDouble)
    val probeCells = seeds.map { case (i, sv) => (cosineLocal(qv, sv), i) }
      .sortBy { case (c, i) => (-c, i) }.take(probes).map(_._2)
    val luts = Quantize.adcLuts(qv.map(_.toDouble).toSeq, codebook, pqM)
    val vd = col(vecCol).cast("array<double>")
    val pruned = corpus
      .withColumn("__n2", scaledDot(col(vecCol), col(vecCol)))
      .withColumn("__cell", ivfCells(vecCol, "__n2", seeds))
      .filter(col("__cell").isin(probeCells: _*))
      // codes MATERIALIZE in their own projection before the ADC lookup:
      // adcDistance reads element m of its codes argument once per
      // subspace, and higher-order functions are CodegenFallback — an
      // inlined pqCodes expression would re-evaluate the full M×K argmin
      // per subspace (M× the work, measured 2× wall on q_embed_adc r17);
      // a column reference is one evaluation + M cheap lookups, and
      // CollapseProject keeps multi-referenced non-cheap projections
      .withColumn("__codes", Quantize.pqCodes(vd, codebook, pqM))
      .withColumn("adc_dist", Quantize.adcDistance(col("__codes"), luts))
    val short = pruned
      .orderBy(col("adc_dist").asc, col(idCol).asc)
      .limit(shortlist)
    short
      .withColumn("cosine",
        scaledDot(col(vecCol), array(qv.map(v => lit(v.toDouble)): _*)).cast("double") /
          (sqrt(col("__n2").cast("double")) * lit(qNorm)))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
      .select(col(idCol), col("__cell").as("cell"), col("adc_dist"), col("cosine"))
  }

  /** Embedding near-dup pairs within equality blocks (e.g. a cluster
    * label, language, or LSH bucket): pairwise cosine only inside each
    * block — never a global cross product.
    */
  def blockedNearDup(corpus: DataFrame, idCol: String, vecCol: String,
                     blockCol: String, threshold: Double): DataFrame = {
    // self-norms computed once per vector before the self-join (1 dot per
    // pair instead of 3); same longs, so oracle values are unchanged
    val withNorm = corpus.select(col(blockCol).as("__blk"), col(idCol).as("__id"),
      col(vecCol).as("__v"), scaledDot(col(vecCol), col(vecCol)).as("__n"))
    val a = withNorm.toDF("__blk", "id_a", "__va", "__na")
    val b = withNorm.toDF("__blk", "id_b", "__vb", "__nb")
    a.join(b, Seq("__blk"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", scaledDot(col("__va"), col("__vb")).cast("double") /
        (sqrt(col("__na").cast("double")) * sqrt(col("__nb").cast("double"))))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }

  /** Threshold RANGE search: every (corpus, query) pair with cosine >=
    * tau — the retrieval dual of top-k. The query set is the small side
    * by construction (eval probes, seed exemplars), so it is broadcast
    * and the whole op is ONE map-side pass over the corpus: no shuffle,
    * no corpus² — each corpus row is tested against every query with a
    * codegen'd dot product and emitted only above the bound. (Top-k
    * wants an index — ivfTopK; a range query must touch every corpus
    * row anyway, so the scan IS the optimal plan; the win is keeping it
    * shuffle-free.)
    */
  def rangeSearch(corpus: DataFrame, idCol: String, vecCol: String,
                  queries: DataFrame, qidCol: String, qvecCol: String,
                  tau: Double): DataFrame = {
    val c = corpus.select(col(idCol).as("id_a"), col(vecCol).as("__va"),
      scaledDot(col(vecCol), col(vecCol)).as("__na"))
    val q = queries.select(col(qidCol).as("id_b"), col(qvecCol).as("__vb"),
      scaledDot(col(qvecCol), col(qvecCol)).as("__nb"))
    c.crossJoin(broadcast(q))
      .withColumn("cosine", scaledDot(col("__va"), col("__vb")).cast("double") /
        (sqrt(col("__na").cast("double")) * sqrt(col("__nb").cast("double"))))
      .filter(col("cosine") >= tau)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }

  /** MAXIMAL MARGINAL RELEVANCE selection (Carbonell & Goldstein 1998)
    * — the diversity-aware top-k every RAG retrieval stack ships:
    * greedily pick the candidate maximizing λ·cos(q,d) − (1−λ)·max over
    * already-selected s of cos(d,s), k rounds.
    *
    * Determinism: every cosine is the scaledDot fixed-point spine
    * (bigint dot, IEEE sqrt/divide), the MMR score is one fixed double
    * expression, and ties break on lowest id — so the greedy trajectory
    * is replayable, and the DuckDB oracle unrolls the same k rounds.
    *
    * Scale shape: each round is ONE distributed argmax over the
    * candidate relation (corpus-sized scan, combinable max(struct)),
    * with only the k selected (id, vector) rows ever touching the
    * driver — the IVF-seed precedent (metadata ∝ k·dims, never ∝
    * corpus). The selected vectors re-enter the plan as broadcast
    * literals, so round r adds one codegen'd cosine column, not a join.
    */
  def mmrSelect(corpus: DataFrame, idCol: String, vecCol: String,
                query: DataFrame, queryVecCol: String,
                k: Int, lambda: Double): DataFrame = {
    require(k >= 1 && lambda >= 0 && lambda <= 1,
      s"mmrSelect: need k >= 1 and lambda in [0,1], got k=$k lambda=$lambda")
    val spark = corpus.sparkSession
    val q = broadcast(query.select(col(queryVecCol).as("__qv")))
    val cand = corpus.crossJoin(q)
      .select(col(idCol).as("id"), col(vecCol).as("v"),
        cosine(col("v"), col("__qv")).as("rel"))
    var picked = List.empty[(Long, Double, Double)] // (id, rel, mmr score)
    var selVecs = List.empty[Seq[Float]]
    var remaining = cand
    for (_ <- 1 to k) {
      val simSel = selVecs.map(sv =>
        cosine(col("v"), typedLit(sv))) match {
        case Nil => lit(0.0)
        case cs  => cs.reduce(greatest(_, _))
      }
      val score = lit(lambda) * col("rel") - lit(1.0 - lambda) * simSel
      val best = remaining.withColumn("score", score)
        .orderBy(col("score").desc, col("id").asc)
        .limit(1)
        .select(col("id"), col("v"), col("rel"), col("score"))
        .collect()(0) // 1 row: the round's argmax — metadata-scale
      val id = best.getLong(0)
      picked :+= ((id, best.getDouble(2), best.getDouble(3)))
      selVecs :+= best.getSeq[Float](1)
      remaining = remaining.filter(col("id") =!= id)
    }
    import spark.implicits._
    picked.zipWithIndex
      .map { case ((id, rel, s), i) => (i + 1L, id, rel, s) }
      .toDF("rank", "vec_id", "relevance", "mmr_score")
  }
}
