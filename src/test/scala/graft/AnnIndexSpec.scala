package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.ops.{AnnIndex, Similarity}

/** AnnIndex persist/reload: the round-trip must be lossless — a reloaded
  * index serves bit-identical answers to the in-plan IVF-PQ stack, delta
  * ingest under frozen centroids equals a from-scratch assignment, and
  * the cell filter on the reloaded postings prunes at the partition
  * level (the 100 TB read-probes/numCells story).
  */
class AnnIndexSpec extends SparkSpec {

  private lazy val emb = graft.engine.QueryBuilder.scan(spark, sf001, "embeddings")
  private def tmp(): String =
    Files.createTempDirectory("annidx").toString

  test("build -> reload -> query is bit-identical to the in-plan ivfAdcTopK") {
    val corpus = emb.filter(col("vec_id") =!= 0)
    val dir = tmp()
    AnnIndex.build(corpus, "vec_id", "embedding", dir)
    val idx = AnnIndex.load(spark, dir)
    val qv = emb.filter(col("vec_id") === 0).select("embedding").head().getSeq[Float](0)
    val reloaded = AnnIndex.adcQuery(idx, qv, k = 10, shortlist = 50, probes = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    val inPlan = Similarity.ivfAdcTopK(corpus, "vec_id", "embedding",
        emb.filter(col("vec_id") === 0), "embedding",
        k = 10, shortlist = 50, numCells = 16, probes = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(reloaded == inPlan, "persist/reload must not change a single bit of the answer")
  }

  test("reloaded centroids and codebook equal the build-time driver state") {
    val corpus = emb.filter(col("vec_id") =!= 0)
    val dir = tmp()
    AnnIndex.build(corpus, "vec_id", "embedding", dir)
    val idx = AnnIndex.load(spark, dir)
    val direct = corpus.select(col("vec_id"), col("embedding"))
      .orderBy("vec_id").limit(16).collect()
      .zipWithIndex.map { case (r, i) => i -> r.getSeq[Float](1).toSeq }.toSeq
    assert(idx.seeds == direct)
    assert(idx.codebook == direct.take(8).map(_._2.map(_.toDouble)))
  }

  test("delta ingest under frozen centroids equals from-scratch assignment with the same seeds") {
    val corpus = emb.filter(col("vec_id") =!= 0)
    val base = corpus.filter(col("vec_id") % 2 === 0)
    val delta = corpus.filter(col("vec_id") % 2 === 1)
    val dir = tmp()
    AnnIndex.build(base, "vec_id", "embedding", dir)
    val idx = AnnIndex.load(spark, dir)
    AnnIndex.assignWithSeeds(delta, "vec_id", "embedding", idx.seeds)
      .write.mode("append").partitionBy("cell").parquet(s"$dir/postings")
    val appended = spark.read.parquet(s"$dir/postings")
      .select("vec_id", "cell", "code", "n2").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2), r.getLong(3))).sortBy(_._1).toSeq
    // ground truth: one assignment pass over the UNION with the same seeds
    val direct = AnnIndex.assignWithSeeds(corpus, "vec_id", "embedding", idx.seeds)
      .select("vec_id", "cell", "code", "n2").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2), r.getLong(3))).sortBy(_._1).toSeq
    assert(appended == direct)
  }

  test("cell filter on reloaded postings prunes partitions (scan reads a subset of files)") {
    val corpus = emb.filter(col("vec_id") =!= 0)
    val dir = tmp()
    AnnIndex.build(corpus, "vec_id", "embedding", dir)
    val idx = AnnIndex.load(spark, dir)
    val pruned = idx.postings.filter(col("cell").isin(0, 1))
    // physical scan must carry the cell partition filter, not a post-scan filter
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"),
      s"expected a partition filter on cell in:\n$plan")
    val cells = pruned.select("cell").distinct().collect().map(_.getInt(0)).toSet
    assert(cells.subsetOf(Set(0, 1)))
  }

  test("staging dirs are session-scoped and keyed by a full-path digest") {
    import graft.queries.AnnQueries
    // "Aa" and "BB" have the same 32-bit String.hashCode — the r16 keying
    // (hex(hashCode)) would silently serve one dataset's index for the
    // other; the SHA-256 digest keying must not
    assert("Aa".hashCode == "BB".hashCode)
    assert(AnnQueries.mainDir("Aa") != AnnQueries.mainDir("BB"))
    // every dir lives under the per-JVM session scratch root — no other
    // process can name (and therefore corrupt) this JVM's artifacts
    val sess = graft.engine.Staging.session
    assert(sess.contains("graft_sess_"), s"session root not per-JVM-tagged: $sess")
    Seq(AnnQueries.mainDir(sf001), AnnQueries.deltaDir(sf001),
        AnnQueries.recallDir(sf001)).foreach { p =>
      assert(p.startsWith(s"$sess/graft_ann/"), p)
    }
  }

  test("corrupted/concurrent-writer artifact is detected and rebuilt") {
    val q = graft.queries.AnnQueries.queries("q_ann_stats")
    val before = q(spark, sf001).collect().map(_.toString).toSeq
    val dir = graft.queries.AnnQueries.mainDir(sf001)
    // hostile writer: clobber the completion marker (what a concurrent
    // process's in-flight rebuild, or a torn/partial build, looks like —
    // build() deletes the marker first and rewrites it last)
    Files.write(AnnIndex.markerPath(dir), "intruder".getBytes("UTF-8"))
    val after = q(spark, sf001).collect().map(_.toString).toSeq
    assert(after == before, "serving after a corrupted artifact must rebuild, not drift")
    assert(!AnnIndex.readMarker(dir).contains("intruder"),
      "the corrupted marker must have been replaced by a fresh build")
    // hostile deletion: remove the artifact wholesale — same contract
    import scala.jdk.CollectionConverters._
    val p = java.nio.file.Paths.get(dir)
    Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    val rebuilt = q(spark, sf001).collect().map(_.toString).toSeq
    assert(rebuilt == before)
  }

  test("delta census is a pure function of (session, dataset): a torn delta segment heals") {
    val q = graft.queries.AnnQueries.queries("q_ann_delta")
    val before = q(spark, sf001).collect().map(_.toString).toSeq
    // hostile interleave: scribble extra bytes into the delta segment dir
    // (a partially-failed concurrent writer); the next invocation must
    // overwrite the segment and produce the identical census — the r16
    // blind append would have silently aggregated the leftovers
    val seg = java.nio.file.Paths.get(graft.queries.AnnQueries.deltaDir(sf001), "postings_delta")
    assert(Files.exists(seg), s"expected a delta segment at $seg")
    import scala.jdk.CollectionConverters._
    val part = Files.walk(seg).iterator().asScala
      .find(f => f.getFileName.toString.endsWith(".parquet")).get
    Files.copy(part, part.resolveSibling("part-duplicated-by-intruder.snappy.parquet"))
    val again = q(spark, sf001).collect().map(_.toString).toSeq
    assert(again == before,
      "a duplicated/partial segment file must be overwritten, never aggregated")
  }

  test("distortion equals the ADC distance of a vector to its own codes") {
    val corpus = emb.filter(col("vec_id") =!= 0)
    val dir = tmp()
    AnnIndex.build(corpus, "vec_id", "embedding", dir)
    val idx = AnnIndex.load(spark, dir)
    val rows = idx.postings
      .withColumn("dist", AnnIndex.distortion(col("embedding"), idx.codebook))
      .select("vec_id", "embedding", "code", "dist").limit(20).collect()
    rows.foreach { r =>
      val v = r.getSeq[Float](1).map(_.toDouble)
      val codes = r.getSeq[Int](2)
      val expected = (0 until AnnIndex.PqM).map { mi =>
        val sub = v.slice(mi * 8, (mi + 1) * 8)
        val cs = idx.codebook(codes(mi)).slice(mi * 8, (mi + 1) * 8)
        sub.zip(cs).map { case (x, y) => math.floor((x - y) * (x - y) * 1e12).toLong }.sum
      }.sum
      assert(r.getLong(3) == expected, s"vec ${r.getLong(0)}")
    }
  }
}
