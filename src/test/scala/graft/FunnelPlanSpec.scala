package graft

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.QueryStageExec
import org.apache.spark.sql.execution.columnar.{InMemoryRelation, InMemoryTableScanExec}
import graft.queries.CorpusQueries

/** q_corpus_funnel plan assertions — the single-pass claims: every
  * stage survivor set is cache-fed to its consumers, the raw documents
  * table is scanned a fixed number of times no matter how many stages
  * consume survivors, and the shingle tier (the expensive hash
  * explosion) is built in exactly ONE cached relation and never appears
  * in uncached top-level work. Plan strings nest cached plans, so every
  * walk here stops at the cache boundary (InMemoryRelation /
  * InMemoryTableScanExec; QueryStageExec re-entered per the AQE
  * gotcha).
  */
class FunnelPlanSpec extends SparkSpec {

  /** Logical fragment above any cache boundary: (plan text, cache
    * nodes, file-scan leaves of the documents table). */
  private def topLogical(p: LogicalPlan): (String, Seq[InMemoryRelation], Int) = {
    val sb = new StringBuilder
    val imrs = scala.collection.mutable.ArrayBuffer[InMemoryRelation]()
    var docScans = 0
    def go(n: LogicalPlan): Unit = n match {
      case i: InMemoryRelation => imrs += i
      case other =>
        other match {
          case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
            l.relation match {
              case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation
                if fs.location.rootPaths.exists(_.toString.contains("documents")) =>
                docScans += 1
              case _ => ()
            }
          case _ => ()
        }
        sb.append(other.simpleString(Int.MaxValue)).append('\n')
        other.children.foreach(go)
    }
    go(p)
    (sb.toString, imrs.toSeq, docScans)
  }

  /** Physical fragment above any cache boundary. AdaptiveSparkPlanExec
    * and QueryStageExec hide their subtree from .children — step
    * through both (the AqeSkewJoinSpec gotcha). */
  private def topPhysical(p: SparkPlan): String = {
    val sb = new StringBuilder
    def go(n: SparkPlan): Unit = n match {
      case _: InMemoryTableScanExec => ()
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        go(a.executedPlan)
      case q: QueryStageExec => go(q.plan)
      case other =>
        sb.append(other.simpleString(Int.MaxValue)).append('\n')
        other.children.foreach(go)
    }
    go(p)
    sb.toString
  }

  test("funnel: stages are cache-fed, documents scanned twice, shingle tier built once") {
    spark.catalog.clearCache()
    val df = CorpusQueries.corpusFunnel(spark, sf001)
    val (top, imrs, docScans) = topLogical(df.queryExecution.optimizedPlan)
    // the raw census is the ONLY direct read of the source table above a
    // cache boundary — the quality build is itself cached, and everything
    // downstream reads a cached stage
    assert(docScans == 1, s"documents scanned $docScans times above caches:\n${top.take(1500)}")
    // shingle hashing (graft_hex60 over exploded shingles) never runs in
    // uncached top-level work — banding and the Jaccard verify read the
    // cached shingle relation
    assert(!top.contains("graft_hex60"),
      s"shingle hashing recomputed above the cache boundary:\n${top.take(1500)}")
    // every stage survivor set persisted: quality, langkept, gopher
    // flags, gopherkept, fingerprints, exactkept, finalkept, shingles.
    // Caches NEST (the shingle cache is read inside finalkept's cached
    // build), so enumerate them transitively through nested cache scans
    val seen = scala.collection.mutable.LinkedHashMap[Int, InMemoryRelation]()
    def collectCaches(i: InMemoryRelation): Unit = {
      val key = System.identityHashCode(i.cacheBuilder)
      if (!seen.contains(key)) {
        seen.put(key, i)
        def goPhys(n: SparkPlan): Unit = n match {
          case s: InMemoryTableScanExec => collectCaches(s.relation)
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            goPhys(a.executedPlan)
          case q: QueryStageExec => goPhys(q.plan)
          case other => other.children.foreach(goPhys)
        }
        goPhys(i.cacheBuilder.cachedPlan)
      }
    }
    imrs.foreach(collectCaches)
    assert(seen.size >= 7,
      s"expected >= 7 distinct cached stage relations, got ${seen.size}")
    // The shingle tier itself never appears in ANY reachable fragment:
    // it ran exactly once at pipeline-build time — minhashDedup persists
    // the hashed shingle table for its three consumers (Dedup.scala) and
    // connectedComponents' per-round localCheckpoint truncates the
    // lineage, so the neardup stage's cached build reads a checkpointed
    // RDD, not a shingle recomputation. Assert both halves: no
    // graft_hex60 in any cached fragment, and the finalkept build is
    // checkpoint-backed (ExistingRDD scan present).
    val fragments = seen.values.map(i => topPhysical(i.cacheBuilder.cachedPlan)).toSeq
    assert(fragments.forall(!_.contains("graft_hex60")),
      "shingle hashing recomputed inside a cached stage build")
    assert(fragments.exists(_.contains("ExistingRDD")),
      "neardup stage is not checkpoint-backed — the iterated CC lineage would regrow")
    spark.catalog.clearCache()
  }

  test("funnel: census is internally consistent") {
    spark.catalog.clearCache()
    val rows = CorpusQueries.corpusFunnel(spark, sf001).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    def v(stage: String, metric: String): Long =
      rows.find(r => r._2 == stage && r._3 == metric).get._4
    val kept = Seq(v("raw", "n_docs"), v("quality", "n_kept"), v("langid", "n_kept"),
      v("gopher", "n_kept"), v("exact", "n_kept"), v("neardup", "n_kept"))
    assert(kept == kept.sorted.reverse, s"kept counts not monotone: $kept")
    // each stage's dropped = previous kept - this kept
    Seq("quality", "langid", "gopher", "exact", "neardup").zipWithIndex.foreach {
      case (st, i) => assert(v(st, "n_dropped") == kept(i) - kept(i + 1), st)
    }
    // gopher attribution: every dropped doc fails >= 1 rule
    val attributed = Seq("drop_wc", "drop_mwl", "drop_ttr", "drop_dbf", "drop_twf")
      .map(v("gopher", _)).sum
    assert(attributed >= v("gopher", "n_dropped"), "attribution undercounts drops")
    // mixture weights are floor-ppm over the final survivors
    val mix = rows.filter(_._2 == "mix").map(_._4)
    assert(mix.nonEmpty && mix.sum <= 1000000L && mix.forall(_ > 0))
    spark.catalog.clearCache()
  }
}
