package graft

import org.apache.spark.sql.SparkSession

/** Scale-curve gate: measure every registered query at two scale
  * factors and flag super-linear growth — the operator-level version of
  * the "would this survive a 100× scale-up" question, as a number
  * instead of prose (SCALE.md's arguments become a measured check).
  *
  * Between sf0.01 and sf0.1 the data grows 10×; a well-shaped operator
  * on local[32] should grow wall-clock well below that (partial
  * aggregation, pruning and spare cores absorb most of it). A ratio
  * far above the data growth means something is quadratic — a pair
  * explosion, a hot group, an un-pruned scan — exactly the class of
  * defect that kills at 100 TB while staying invisible in a
  * single-scale bench.
  *
  * Usage: runMain graft.ScaleCurve [smallDir] [largeDir] [flagRatio]
  * [nameRegex]. Emits the summary JSON line FIRST (same
  * truncation-proofing as Bench), then per-query detail; sub-2s
  * large-side queries are never flagged (timer noise, not a scale
  * signal).
  */
object ScaleCurve {
  def main(args: Array[String]): Unit = {
    val small = args.lift(0).getOrElse("/root/testdata/sf0.01")
    val large = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val flagRatioArg = args.lift(2).filterNot(_ == "auto").map(_.toDouble)
    val nameFilter = args.lift(3).map(_.r)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.build(cpus)
    // box-health probe, same fixed action as Bench (see warmup_sec there)
    val warmupSec = {
      val t0 = System.nanoTime()
      spark.range(1000000L).selectExpr("sum(id)").collect()
      math.round((System.nanoTime() - t0) / 1e6) / 1000.0
    }

    def time(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame, dir: String): Double = {
      val t0 = System.nanoTime()
      fn(spark, dir).count()
      (System.nanoTime() - t0) / 1e9
    }

    // Token-volume normalization (r9 verdict punch #4): the documents
    // table's TEXT mass grows faster than its row count between scale
    // factors (sf1 docs are wider), so a token-volume-bound operator's
    // honest wall-clock ratio exceeds the row-growth bar without being
    // super-linear. Probe both sides once, and for the families whose
    // input is documents.text flag on the BYTE-normalized ratio
    // (ratio × row_growth ⁄ byte_growth) instead of the raw one — the
    // adjudication that used to be prose, as a measured number.
    val docTextFamilies = Set(
      "q_text", "q_dedup", "q_corpus", "q_bpe", "q_mix", "q_mask",
      "q_pack", "q_batch", "q_shuffle", "q_index", "q_langid", "q_ulm",
      "q_decontaminate", "q_label", "q_source", "q_shard", "q_split",
      "q_sample")
    def docProbe(dir: String): (Long, Long) = {
      val r = spark.read.parquet(s"$dir/documents.parquet")
        .selectExpr("sum(octet_length(text))", "count(*)").collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    val (bytesSmall, docRowsSmall) = docProbe(small)
    val (bytesLarge, docRowsLarge) = docProbe(large)
    val byteGrowth = bytesLarge.toDouble / bytesSmall
    val rowGrowth = docRowsLarge.toDouble / docRowsSmall
    val textNorm = rowGrowth / byteGrowth // < 1 when docs widen with sf
    // GROWTH-DERIVED default flag bar (r15 verdict #2): the old fixed 15
    // was a 100×-sweep constant — at a 10× step it only catches >1.5×
    // superlinearity (q_dedup_ppjoin read 15.16× and still passed). Wall
    // growing more than 20% past the DATA growth is the superlinear
    // signal at any step size, so the default is row_growth × 1.2: 12 at
    // a 10× step, 120 at 100× (a linear 100×-growth wall is fine — the
    // historical 15 bar demanded 6.7× sublinearity there, which is why
    // its flags needed adjudication). An explicit numeric arg still
    // overrides, or pass "auto" to name the derived default.
    val flagRatio = flagRatioArg.getOrElse(math.rint(rowGrowth * 1.2 * 100) / 100)

    val picked = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => nameFilter.forall(_.findFirstIn(n).isDefined) }
    var errors = List.empty[String]
    // Bench's family-boundary cache policy (family = first two name
    // segments): within a family, identical persisted subplans are
    // shared via the cache manager; once the run moves past a family its
    // caches drop. Without this, op-internal persists (outside any
    // CacheScope here) accumulate for the whole run and later queries
    // measure under earlier families' storage pressure — observed as a
    // 4× inflated q_profile_gini after q_graph_jaccard's sf1 persists
    def family(n: String): String = n.split("_").take(2).mkString("_")
    // FULL storage clear: the cache manager (persisted Datasets) plus
    // every persistent RDD still registered — this is where
    // localCheckpoint blocks live, and three rounds of ER-family flags
    // (golden → clusters → editjoin, r11–r13) were exactly residual
    // checkpoint blocks from EARLIER families inflating the large-side
    // measurement; each flag adjudicated clean by a manual isolated
    // re-run. Clearing both at the boundary removes the pressure at its
    // source instead of adjudicating it after the fact.
    def clearStorage(): Unit = {
      // memo invalidation FIRST: unpersisting a localCheckpoint destroys
      // its only copy, so any memo still holding the DataFrame would hand
      // out CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND on its next use
      graft.ops.StorageMemos.invalidateAll()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }
    var lastFamily = ""
    val rows = picked.flatMap { case (name, fn) =>
      if (lastFamily.nonEmpty && family(name) != lastFamily) clearStorage()
      lastFamily = family(name)
      try {
        // small first warms codegen/caches for the shared plan shape, so
        // the large-side number isn't charged compile time
        val ts = time(fn, small)
        val tl = time(fn, large)
        // noise floor on the denominator: sub-0.2s timings are scheduler
        // jitter, and dividing by them manufactures fake ratios
        val ratio = tl / math.max(ts, 0.2)
        val norm = if (docTextFamilies(family(name))) ratio * textNorm else ratio
        Some((name, ts, tl, ratio, norm))
      } catch {
        case e: Throwable =>
          errors ::= name
          System.err.println(s"SCALECURVE ERROR $name: ${e.getClass.getName}: ${e.getMessage}")
          None
      }
    }
    val flagged = rows.filter { case (_, _, tl, _, nr) => nr > flagRatio && tl > 2.0 }
    // Self-adjudication (r13 verdict punch #3): every flag is re-run
    // ISOLATED — storage fully cleared, nothing sharing the session —
    // and BOTH ratios land in the same JSON. A flag whose isolated norm
    // drops back under the bar was harness storage pressure, not a
    // scale defect; one that reproduces isolated is real. Replaces the
    // manual scalecurve_*_isolated.json adjudication files of r11–r13.
    val qmap = picked.toMap
    // crash-safe: an adjudication failure records as NOT-clean with a
    // sentinel ratio instead of killing the sweep after 25 minutes of
    // good measurements (r14: the pre-registry memo bug did exactly that)
    val adjudicated = flagged.map { case (name, _, _, _, _) =>
      clearStorage()
      System.gc()
      name -> (try {
        val its = time(qmap(name), small)
        val itl = time(qmap(name), large)
        val ir = itl / math.max(its, 0.2)
        val inr = if (docTextFamilies(family(name))) ir * textNorm else ir
        (math.rint(ir * 100) / 100, math.rint(inr * 100) / 100, inr <= flagRatio)
      } catch {
        case e: Throwable =>
          System.err.println(s"SCALECURVE ADJUDICATION ERROR $name: " +
            s"${e.getClass.getName}: ${e.getMessage}")
          (-1.0, -1.0, false)
      })
    }.toMap
    lazy val flaggedJson = flagged.map { case (n, _, _, _, _) =>
      val (ir, inr, clean) = adjudicated(n)
      s"""{"name":"$n","isolated_ratio":$ir,"isolated_norm_ratio":$inr,""" +
        s""""isolated_clean":$clean}"""
    }.mkString(",")
    val summary =
      s"""{"metric":"scalecurve","flag_ratio":$flagRatio,"warmup_sec":$warmupSec,"n_queries":${rows.size},""" +
        s""""n_flagged":${flagged.size},"flagged":[$flaggedJson],""" +
        s""""n_errors":${errors.size},"small":"$small","large":"$large",""" +
        s""""bytes_small":$bytesSmall,"bytes_large":$bytesLarge,""" +
        s""""doc_rows_small":$docRowsSmall,"doc_rows_large":$docRowsLarge,""" +
        s""""byte_growth":${math.rint(byteGrowth * 100) / 100},""" +
        s""""row_growth":${math.rint(rowGrowth * 100) / 100}}"""
    val detail = rows.map { case (n, ts, tl, r, nr) =>
      val iso = adjudicated.get(n).map { case (ir, inr, clean) =>
        s""","isolated_ratio":$ir,"isolated_norm_ratio":$inr,"isolated_clean":$clean"""
      }.getOrElse("")
      s""""$n":{"t_small":$ts,"t_large":$tl,"ratio":${math.rint(r * 100) / 100}""" +
        s""","norm_ratio":${math.rint(nr * 100) / 100}$iso}"""
    }.mkString("{\"metric\":\"scalecurve_detail\",\"queries\":{", ",", "}}")
    GraftSession.emitJsonLines("tools/scalecurve_last.json", Seq(summary, detail))
    graft.sources.rest.StubServer.stop()
    spark.stop()
    if (flagged.nonEmpty) System.err.println(
      s"SCALECURVE: ${flagged.size} super-linear queries (isolated re-run inline): " +
        flagged.map { case (n, _, _, _, _) =>
          val (_, inr, clean) = adjudicated(n)
          s"$n(iso_norm=$inr${if (clean) ", clean" else ", REPRODUCED"})"
        }.mkString(", "))
    System.exit(0)
  }
}
