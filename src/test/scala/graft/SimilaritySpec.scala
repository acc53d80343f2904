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
}
