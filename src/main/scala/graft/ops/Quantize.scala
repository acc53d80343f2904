package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding compression operators: symmetric int8 quantization and
  * product quantization (PQ) code assignment — the storage-side half of
  * similarity search at 100 TB (a 64-dim float corpus shrinks 4× as int8
  * and 32× as 8-byte PQ codes; candidate scans then run over codes, with
  * exact re-rank only on survivors).
  *
  * Determinism contract (same rules as [[Similarity]]): every boundary
  * decision (quantized value, nearest-centroid argmin) happens on
  * floor-scaled integer arithmetic over identical IEEE doubles, never on
  * engine-formatted decimals — so DuckDB reproduces Spark's codes
  * bit-for-bit, and codes don't depend on partitioning or plan shape.
  */
object Quantize {

  private val Scale = 1e12

  /** Per-vector max |x| (double). */
  def maxAbs(vd: Column): Column = array_max(transform(vd, x => abs(x)))

  /** Symmetric int8 scale: maxabs/127, 0 for the all-zero vector. */
  def int8Scale(vd: Column): Column = {
    val m = maxAbs(vd)
    when(m === 0.0, 0.0).otherwise(m / lit(127.0))
  }

  /** Quantized levels floor(x·127/maxabs) ∈ [-127, 127] as longs.
    * Floor (not round): round() detours through decimal formatting and
    * diverges between engines; floor of identical doubles is identical.
    */
  def int8Levels(vd: Column): Column = {
    val m = maxAbs(vd)
    transform(vd, x =>
      when(m === 0.0, lit(0L))
        .otherwise(floor(x * lit(127.0) / m).cast("long")))
  }

  /** Total reconstruction error Σ_i floor(|x_i − q_i·scale|·1e12) as a
    * long — an order-independent exact sum, comparable across engines.
    * Guarded for the empty vector (sequence(1, 0) would count DOWN and
    * index past the array — same pitfall CorpusOps.wordNgrams guards).
    */
  def int8ReconError(vd: Column, qs: Column, scale: Column): Column =
    when(size(vd) === 0, lit(0L)).otherwise(
      aggregate(
        transform(sequence(lit(1), size(vd)), i =>
          floor(abs(element_at(vd, i) - element_at(qs, i).cast("double") * scale) * lit(Scale))
            .cast("long")),
        lit(0L), (acc, x) => acc + x))

  /** Scaled exact squared L2 distance between a vector slice and a
    * literal centroid: Σ floor((x−y)²·1e12) as a long.
    */
  def scaledSqDist(a: Column, centroid: Seq[Double]): Column =
    aggregate(
      zip_with(a, array(centroid.map(lit): _*),
        (x, y) => floor((x - y) * (x - y) * lit(Scale)).cast("long")),
      lit(0L), (acc, x) => acc + x)

  /** PQ code for one subspace: index of the nearest centroid (scaled-L2
    * argmin, first-minimum = lowest index on ties). `centroids` are the
    * m-th subvectors of the codebook rows, in codebook order.
    */
  def pqSubCode(sub: Column, centroids: Seq[Seq[Double]]): Column = {
    val dists = array(centroids.map(c => scaledSqDist(sub, c)): _*)
    (array_position(dists, array_min(dists)) - 1).cast("int")
  }

  /** All M PQ codes for a vector of dims = M · subDim, as an int array.
    * codebook(k) is the k-th codebook vector (full dims); subvector m of
    * row k is centroid k of subspace m. Codebook rows are driver-side
    * constants (metadata scale — same pattern as IVF seeds), so this is
    * a pure per-row expression: no shuffle, no UDF.
    */
  def pqCodes(vd: Column, codebook: Seq[Seq[Double]], m: Int): Column = {
    require(codebook.nonEmpty && codebook.head.length % m == 0, "dims must divide into m subspaces")
    val subDim = codebook.head.length / m
    val codes = (0 until m).map { mi =>
      val sub = slice(vd, mi * subDim + 1, subDim)
      pqSubCode(sub, codebook.map(_.slice(mi * subDim, (mi + 1) * subDim)))
    }
    array(codes: _*)
  }

  // ------------------------------------------------- asymmetric distance

  /** ADC lookup tables for one query vector: lut(m)(k) = scaled squared
    * L2 distance between the query's m-th subvector and centroid k of
    * subspace m. Driver-side longs (M·K values — metadata scale),
    * computed with the exact floor-scaled arithmetic the Spark and
    * DuckDB sides use, so all three agree bit-for-bit.
    */
  def adcLuts(query: Seq[Double], codebook: Seq[Seq[Double]], m: Int): Seq[Seq[Long]] = {
    require(codebook.nonEmpty && codebook.head.length % m == 0, "dims must divide into m subspaces")
    val subDim = codebook.head.length / m
    (0 until m).map { mi =>
      val qs = query.slice(mi * subDim, (mi + 1) * subDim)
      codebook.map { row =>
        val cs = row.slice(mi * subDim, (mi + 1) * subDim)
        qs.zip(cs).map { case (x, y) => math.floor((x - y) * (x - y) * Scale).toLong }.sum
      }
    }
  }

  /** ADC distance of a PQ-coded vector to the query behind `luts`:
    * Σ_m lut(m)(code_m). The whole scan reads ONLY the code column —
    * at 100 TB that is the 32×-compressed candidate sweep (8 bytes per
    * vector instead of 256), with exact re-rank reserved for the
    * survivors. Pure literal-array lookups + an 8-term sum: codegen'd,
    * no shuffle, no UDF.
    */
  def adcDistance(codes: Column, luts: Seq[Seq[Long]]): Column =
    luts.zipWithIndex.map { case (lut, mi) =>
      element_at(array(lut.map(lit): _*), element_at(codes, mi + 1) + 1)
    }.reduce(_ + _)

  /** Per-dimension winsorization (outlier clipping) over the first
    * `dims` embedding components — the feature-normalization pass before
    * quantization (a single outlier otherwise stretches the int8 range
    * and crushes resolution for every other value). Bounds are EXACT
    * rank-selected order statistics — the value at 0-based sorted index
    * floor(p·(n-1)) — so there is no interpolation arithmetic to diverge
    * between engines and the result is partitioning-independent (equal
    * values at the cut rank yield the same bound whatever their tie
    * order). Two passes: a per-dimension sort (parallel across dims;
    * at extreme scale swap the exact rank for a mergeable sketch, the
    * clip pass is unchanged), then a broadcast join + codegen'd clip.
    * Output: one row per (id, dim) with x, lo, hi, clipped.
    */
  /** FEATURE-STANDARDIZATION census (the z-scoring audit a feature
    * pipeline runs before training): per dimension, n, mean, and the
    * 3σ-outlier count, all deterministic. Values enter fixed point
    * once (xs = ⌊x·10⁶⌋, the scaledDot discipline), so the per-dim
    * sums Σxs / Σxs² are exact order-free bigints; the outlier test
    * |x−μ| > 3σ is compared as (n·xs − S)² > 9·(n·Q − S²) with both
    * sides as fixed-order doubles (n·Q exceeds int64 at corpus scale;
    * correctly-rounded double products are engine-identical). One
    * explode pass + one 64-row broadcast back — no window, no sort.
    */
  def standardizeCensus(emb: DataFrame, idCol: String, vecCol: String,
                        dims: Int): DataFrame = {
    val xs = emb.select(col(idCol),
        posexplode(slice(col(vecCol), 1, dims).cast("array<double>")).as(Seq("dim", "x")))
      .withColumn("xs", floor(col("x") * lit(1e6)).cast("long"))
    val st = xs.groupBy(col("dim"))
      .agg(count(lit(1)).as("n"), sum(col("xs")).as("sd"),
        sum(col("xs") * col("xs")).as("qd"))
    val dev = (col("n") * col("xs") - col("sd")).cast("double")
    xs.join(broadcast(st), Seq("dim"))
      .withColumn("lhs", dev * dev)
      .withColumn("rhs",
        lit(9.0) * (col("n").cast("double") * col("qd").cast("double")
          - col("sd").cast("double") * col("sd").cast("double")))
      .groupBy(col("dim"))
      .agg(max(col("n")).as("n_vecs"),
        (max(col("sd")).cast("double")
          / (max(col("n")).cast("double") * lit(1e6))).as("mu"),
        sum(when(col("lhs") > col("rhs"), 1L).otherwise(0L)).as("n_outliers3"))
  }

  /** TOP PRINCIPAL COMPONENT by distributed power iteration, all-
    * integer: vectors enter 1e4 fixed point once (⌊x·10⁴⌋ — coarser
    * than standardizeCensus's 1e6 so the raw second-moment sums stay
    * BIGINT to ~10⁹ rows), the scaled covariance C = n·P − S·Sᵀ is
    * exact DECIMAL(38,0), and each iteration renormalizes by max-abs
    * with a SIGN-DECOMPOSED ppm division (sign(u)·(|u|·10⁶ div m) —
    * truncating div and floor div disagree on negatives across engines,
    * so the division only ever sees magnitudes; the q_win_slope rule).
    *
    * Scale shape: the ONLY data-sized pass is the in-row outer-product
    * expansion (flatten(transform×transform)) feeding a dims²-group
    * partial aggregation — map-side combine collapses each partition to
    * ≤ dims² rows before the shuffle, so 100 TB moves dims² × partitions
    * rows, never n·dims². Everything after is dimension-sized (dims² ≤
    * 4096 rows) broadcast arithmetic; iterations cost nothing at scale.
    */
  def pcaTopComponent(emb: DataFrame, vecCol: String, dims: Int,
                      iters: Int): DataFrame = {
    import graft.ops.CacheScope.ScopedPersist
    val spark = emb.sparkSession
    val q = emb.select(expr(
        s"transform(slice($vecCol, 1, $dims), x -> CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT))")
        .as("q"))
      .scopedPersist()
    // UPPER TRIANGLE only (j >= i): the outer product is symmetric, so
    // emitting dims(dims+1)/2 structs per row instead of dims² halves
    // the in-row explosion and the partial-agg input; the mirror is a
    // free union over the dims²-sized AGGREGATED relation
    val pairsU = q.select(expr(
        """explode(flatten(transform(q, (xi, i) ->
          |  transform(slice(q, i + 1, size(q) - i), (xj, j) ->
          |    named_struct('i', i, 'j', i + j, 'p', xi * xj)))))"""
          .stripMargin).as("e"))
      .select(col("e.i").as("i"), col("e.j").as("j"), col("e.p").as("p"))
      .groupBy(col("i"), col("j")).agg(sum(col("p")).as("p"))
    val pairs = pairsU.unionAll(pairsU.where(col("i") =!= col("j"))
      .select(col("j").as("i"), col("i").as("j"), col("p")))
    val marg = q.select(posexplode(col("q")).as(Seq("mi", "x")))
      .groupBy(col("mi")).agg(sum(col("x")).as("s"))
    val nn = q.agg(count(lit(1)).as("n"))
    val c = pairs
      .join(broadcast(marg.select(col("mi"), col("s").as("si"))), col("i") === col("mi"))
      .drop("mi")
      .join(broadcast(marg.select(col("mi"), col("s").as("sj"))), col("j") === col("mi"))
      .crossJoin(broadcast(nn))
      .select(col("i"), col("j"),
        expr("CAST(n AS DECIMAL(38,0)) * p - CAST(si AS DECIMAL(38,0)) * sj").as("c"))
      .scopedPersist()
    var v = spark.range(dims).select(col("id").cast("int").as("vi"),
      lit(1000000L).cast("decimal(38,0)").as("v"))
    for (r <- 1 to iters) {
      val u = c.join(v, col("j") === col("vi"))
        .groupBy(col("i")).agg(sum(expr("c * v")).as("u"))
      val m = u.agg(max(abs(col("u"))).as("m"))
      v = u.crossJoin(broadcast(m))
        .select(col("i").as("vi"),
          expr("""CAST(CASE WHEN u < 0 THEN -1 ELSE 1 END
                 |  * (abs(u) * 1000000 div m) AS DECIMAL(38,0))""".stripMargin)
            .as("v"))
    }
    v.select(col("vi").cast("long").as("dim"), col("v").cast("long").as("v_ppm"))
  }

  def winsorize(emb: DataFrame, idCol: String, vecCol: String,
                dims: Int, pLo: Double, pHi: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val x = emb.select(col(idCol),
      posexplode(slice(col(vecCol), 1, dims).cast("array<double>")).as(Seq("dim", "x")))
    val w = Window.partitionBy(col("dim")).orderBy(col("x"))
    val cw = Window.partitionBy(col("dim"))
    val bounds = x.select(col("dim"), col("x"))
      .withColumn("rn", row_number().over(w) - 1)
      .withColumn("cnt", count(lit(1)).over(cw))
      .groupBy(col("dim"))
      .agg(
        min(when(col("rn") === floor(lit(pLo) * (col("cnt") - 1)), col("x"))).as("lo"),
        min(when(col("rn") === floor(lit(pHi) * (col("cnt") - 1)), col("x"))).as("hi"))
    x.join(broadcast(bounds), Seq("dim"))
      .withColumn("clipped", least(greatest(col("x"), col("lo")), col("hi")))
  }
}
