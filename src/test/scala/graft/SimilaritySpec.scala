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
}
