package graft

import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** Similarity numerics: the driver-side arithmetic twins must agree
  * bit-for-bit with the in-plan expressions (IVF probe selection depends
  * on it), and the ANN variants must agree with brute force on recall of
  * the top hit when the bucket/cell contains it.
  */
class SimilaritySpec extends SparkSpec {

  private lazy val emb = graft.engine.QueryBuilder.scan(spark, sf001, "embeddings")

  test("scaledDotLocal/cosineLocal equal the in-plan expressions exactly") {
    val rows = emb.orderBy("vec_id").limit(10)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1))
    val q = rows.head._2
    val planCos = emb.filter(col("vec_id").isin(rows.map(_._1): _*))
      .withColumn("c", Similarity.cosine(col("embedding"), array(q.map(v => lit(v.toDouble)): _*)))
      .select("vec_id", "c").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.foreach { case (id, v) =>
      assert(Similarity.cosineLocal(q, v) == planCos(id), s"vec $id")
    }
  }

  test("lshBucket is stable across evaluations and in [0, 2^16)") {
    val b1 = emb.select(col("vec_id"), Similarity.lshBucket(col("embedding"), 64).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b2 = emb.select(col("vec_id"), Similarity.lshBucket(col("embedding"), 64).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(b1 == b2)
    assert(b1.values.forall(b => b >= 0 && b < 65536))
  }

  test("kmeansCentroids is partition-invariant (exact integer sums)") {
    val c1 = Similarity.kmeansCentroids(emb, "vec_id", "embedding", k = 4, refinements = 2)
    val c2 = Similarity.kmeansCentroids(emb.repartition(13), "vec_id", "embedding",
      k = 4, refinements = 2)
    assert(c1 == c2, "centroids must be bit-identical on any partitioning")
    // refinement actually moved the centroids off the raw seed vectors
    val seedsOnly = Similarity.kmeansCentroids(emb, "vec_id", "embedding",
      k = 4, refinements = 0)
    assert(c1 != seedsOnly)
  }

  test("semDedup: every dup has a lower-id cluster-mate at >= tau; survivors don't") {
    val tau = 0.30
    val out = Similarity.semDedup(emb, "vec_id", "embedding",
      k = 4, refinements = 1, tau = tau)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2)))
    assert(out.length == emb.count())
    val byCell = out.groupBy(_._2)
    val vecs = emb.select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    byCell.values.foreach { members =>
      members.foreach { case (id, _, isDup) =>
        val hasCloseEarlier = members.exists { case (other, _, _) =>
          other < id && Similarity.cosineLocal(vecs(other), vecs(id)) >= tau
        }
        assert(hasCloseEarlier == isDup, s"vec $id flagged $isDup")
      }
    }
    assert(out.exists(_._3) && out.exists(!_._3), "need both dups and survivors")
  }

  test("semDedup plan: the pairwise step is an equi-join on the cluster cell ONLY") {
    val df = Similarity.semDedup(emb, "vec_id", "embedding",
      k = 4, refinements = 1, tau = 0.30)
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val s = plan.toString()
    // the Σ|cell|² candidate step must never degrade to all-pairs: no
    // cartesian, no nested-loop — at 100 TB that is the entire contract
    assert(!s.contains("CartesianProduct") && !s.contains("BroadcastNestedLoopJoin"),
      s"semDedup pair step degraded to all-pairs:\n${s.take(1500)}")
    // and the equi-join that builds candidates keys on `cell` alone
    // (the id inequality and the cosine threshold are FILTERS, not keys)
    val joins = plan.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }
    assert(joins.nonEmpty, "expected join operators in the semDedup plan")
    val pairJoin = joins.find(j => j.leftKeys.nonEmpty &&
      j.leftKeys.forall(_.toString.contains("cell")))
    assert(pairJoin.isDefined,
      s"no equi-join keyed on cell:\n${joins.map(j => j.leftKeys.mkString(",")).mkString("; ")}")
    assert(pairJoin.get.leftKeys.size == 1, "pair join must key on cell ONLY")
  }

  test("ivfTopK results are a subset of brute-force ranking, identically scored") {
    val corpus = emb.filter(col("vec_id") =!= 0)
    val query = emb.filter(col("vec_id") === 0)
    val brute = Similarity.bruteTopK(corpus, "vec_id", "embedding", query, "embedding", 100)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val ivf = Similarity.ivfTopK(corpus, "vec_id", "embedding", query, "embedding", 10)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(ivf.nonEmpty)
    ivf.foreach { case (id, c) =>
      assert(!brute.contains(id) || brute(id) == c, s"vec $id scored differently")
    }
  }

  test("rangeSearch: exhaustive above the bound, broadcast query side, no self-pairs") {
    val corpus = emb.filter(col("vec_id") >= 5)
    val queries = emb.filter(col("vec_id") < 5)
    val got = Similarity.rangeSearch(corpus, "vec_id", "embedding",
      queries, "vec_id", "embedding", tau = 0.2)
    // exhaustive: every (corpus, query) cosine >= tau is present, none below
    val qv = queries.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1))
    val cv = corpus.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1))
    val expect = (for ((qid, q) <- qv; (cid, v) <- cv
                       if Similarity.cosineLocal(q, v) >= 0.2)
      yield (cid, qid)).toSet
    val gotSet = got.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gotSet == expect)
    assert(gotSet.forall { case (a, b) => a != b })
    // plan: the query side must be broadcast — a shuffle here would be
    // a corpus-sized exchange at 100 TB
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("Broadcast"), s"expected broadcast join:\n$plan")
  }

  test("bitextMine: mutual-kNN + margin>1 keeps dominant pairs, drops weak/asymmetric ones") {
    import spark.implicits._
    // componentwise ±1 multiplication by plane 0's sign row is an
    // isometry (cosines unchanged) that parks every vector in the
    // dot>0 bucket of a 1-plane LSH — the whole set is one candidate
    // block, so the margin semantics are tested without bucket loss
    val s0 = Similarity.signRow(0, 4)
    def mk(w: Seq[Double]): Seq[Float] =
      w.zip(s0).map { case (a, s) => (a * s).toFloat }
    val xs = Seq(10L -> mk(Seq(1.0, 0.0, 0.0, 0.0)),
                 20L -> mk(Seq(0.0, 1.0, 0.0, 0.0))).toDF("vec_id", "embedding")
    val ys = Seq(101L -> mk(Seq(0.9, 0.1, 0.0, 0.0)),
                 102L -> mk(Seq(0.6, 0.55, 0.0, 0.0)),
                 103L -> mk(Seq(0.1, 0.9, 0.0, 0.0))).toDF("vec_id", "embedding")
    val got = Similarity.bitextMine(xs, "vec_id", "embedding",
        ys, "vec_id", "embedding", dims = 4, k = 2, numPlanes = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    // x1↔y1 and x2↔y3 dominate their neighbor lists (margin > 1);
    // (x1,y2)/(x2,y2) are mutual but below-average → filtered
    assert(got.map(t => (t._1, t._2)).toSet == Set((10L, 101L), (20L, 103L)),
      s"wrong mined pairs: ${got.mkString(",")}")
    assert(got.forall(_._3 > 1000000L))
  }

  test("q_mix_cluster: per-cell cap of 5 and exactly the naive best-by-quality slice") {
    val got = graft.queries.SimilarityQueries.queries("q_mix_cluster")(spark, sf001)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val byCell = got.groupBy(_._1)
    assert(byCell.values.forall(_.length <= 5))
    // naive recompute: full assignment + quality sort per cell
    val e = graft.engine.QueryBuilder.scan(spark, sf001, "embeddings")
    val docs = graft.engine.QueryBuilder.scan(spark, sf001, "documents")
    val seeds = Similarity.kmeansCentroids(e, "vec_id", "embedding", k = 8, refinements = 1)
    val cells = e.withColumn("__n2", Similarity.scaledDot(col("embedding"), col("embedding")))
      .select(col("vec_id"), Similarity.cellsForCentroids("embedding", "__n2", seeds).as("cell"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val quality = docs.select(col("doc_id"),
        graft.ops.TextAnalysis.qualityScoreInt(col("text")).as("q"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val naive = cells.toSeq.map { case (id, cell) => (cell, id, quality(id)) }
      .groupBy(_._1).flatMap { case (cell, members) =>
        members.sortBy(m => (-m._3, m._2)).take(5).zipWithIndex
          .map { case ((c, id, q), i) => (c, i + 1, id, q) }
      }.toSet
    assert(got.toSet == naive, "engine selection differs from naive per-cell slice")
  }
}
