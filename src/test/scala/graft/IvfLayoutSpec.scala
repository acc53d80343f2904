package graft

import org.apache.spark.sql.functions._
import graft.engine.QueryBuilder.scan
import graft.ops.Similarity

/** The file-layout half of the IVF ANN story: the corpus written
  * partitioned by coarse-quantizer cell, so a probe-P query prunes to
  * P/K of the files at the SCAN level (q_sim_ivf asserts the in-plan
  * math; this asserts the disk layout actually delivers the read
  * reduction a 100 TB deployment banks on).
  */
class IvfLayoutSpec extends SparkSpec {

  test("cell-partitioned embeddings: probe query touches only its cells' files") {
    val emb = scan(spark, sf001, "embeddings")
    val seeds = emb.select(col("vec_id"), col("embedding"))
      .orderBy(col("vec_id")).limit(8).collect()
      .zipWithIndex.map { case (r, i) => i -> r.getSeq[Float](1) }.toSeq
    val withCell = emb
      .withColumn("__n2", Similarity.scaledDot(col("embedding"), col("embedding")))
      .withColumn("cell", Similarity.ivfCells("embedding", "__n2", seeds))
      .drop("__n2")
    val base = java.nio.file.Files.createTempDirectory("graft_ivf").toString + "/emb"
    withCell.write.partitionBy("cell").parquet(base)

    val table = spark.read.parquet(base)
    val probed = table.filter(col("cell").isin(0, 3))
    val plan = probed.queryExecution.executedPlan.toString()
    assert(plan.contains("PartitionFilters: [cell"), plan.take(1500))

    val touched = probed.select(input_file_name()).distinct().count()
    val all = table.select(input_file_name()).distinct().count()
    assert(touched < all, s"probe touched every file ($touched/$all)")
    assert(touched <= all / 2, s"probe read too much: $touched of $all files")
    // parity: partition-pruned read returns exactly the probed cells' rows
    assert(probed.count() == withCell.filter(col("cell").isin(0, 3)).count())
  }
}
