package graft

import org.apache.spark.sql.functions._

/** One-off A/B harness for the two distributed connected-components
  * engines (min-label propagation vs Kiveris large-star/small-star) on
  * the two graph regimes that matter:
  *
  *  - DENSE/SHALLOW: suppliers co-appearing in the same order
  *    (minShared = 2) — the near-dup-cluster regime CC is used for in
  *    this repo. Expect min-label to win: diameter ~3, each round is one
  *    grouped join vs star's two.
  *  - DEEP CHAIN: a synthetic path graph — diameter = n, the regime
  *    where min-label's round count explodes and star contraction's
  *    O(log n) rounds win. min-label is attempted with a 25-round
  *    budget and reported DNF when it (correctly, loudly) refuses.
  *
  * Dev tooling like TimeOne — results recorded in
  * Dedup.connectedComponentsStar's scaladoc; not part of any query path.
  *
  * Usage: runMain graft.CcBench [sfDir] [chainNodes]
  */
object CcBench {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val chainNodes = args.lift(1).map(_.toLong).getOrElse(3000000L)
    val spark = GraftSession.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.range(100000).selectExpr("sum(id)").collect()

    val dense = graft.ops.Graph.coOccurrenceEdges(
        spark.read.parquet(s"$dir/lineitem.parquet"),
        "l_orderkey", "l_suppkey", 2L, maxGroupSize = 100000)
      .select(col("s1").as("doc_a"), col("s2").as("doc_b"))
      .persist()
    println(s"CCBENCH dense dir=$dir edges=${dense.count()}")
    (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      val a = graft.ops.Dedup.connectedComponents(dense, forceDistributed = true)
      val ca = a.agg(count(lit(1)), countDistinct(col("cluster"))).collect()(0)
      println(f"CCBENCH dense minlabel run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s " +
        s"nodes=${ca.getLong(0)} components=${ca.getLong(1)}")
      val t1 = System.nanoTime()
      val b = graft.ops.Dedup.connectedComponentsStar(dense)
      val cb = b.agg(count(lit(1)), countDistinct(col("cluster"))).collect()(0)
      println(f"CCBENCH dense star     run$i: ${(System.nanoTime() - t1) / 1e9}%.2f s " +
        s"nodes=${cb.getLong(0)} components=${cb.getLong(1)}")
    }

    // deep chain: (i, i+1) for i < n-1 — diameter n-1
    val chain = spark.range(chainNodes - 1)
      .select(col("id").as("doc_a"), (col("id") + 1).as("doc_b")).persist()
    println(s"CCBENCH chain nodes=$chainNodes edges=${chain.count()}")
    val t2 = System.nanoTime()
    val sc = graft.ops.Dedup.connectedComponentsStar(chain)
    val cs = sc.agg(count(lit(1)), countDistinct(col("cluster"))).collect()(0)
    println(f"CCBENCH chain star: ${(System.nanoTime() - t2) / 1e9}%.2f s " +
      s"nodes=${cs.getLong(0)} components=${cs.getLong(1)}")
    val t3 = System.nanoTime()
    try {
      val ml = graft.ops.Dedup.connectedComponents(chain, maxIter = 25,
        forceDistributed = true)
      ml.agg(count(lit(1))).collect()
      println(f"CCBENCH chain minlabel: ${(System.nanoTime() - t3) / 1e9}%.2f s")
    } catch {
      case e: IllegalStateException =>
        println(f"CCBENCH chain minlabel: DNF after ${(System.nanoTime() - t3) / 1e9}%.2f s " +
          s"(${e.getMessage.take(60)}…)")
    }
    spark.stop()
    System.exit(0)
  }
}
