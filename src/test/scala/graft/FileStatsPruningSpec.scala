package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Parquet min/max stats pruning — the scan-side lever that, with a
  * sorted layout, turns a selective filter into row-group skips. Assert
  * it end-to-end: same data, same filter — sorted layout's SCAN emits a
  * small fraction of the rows the scattered layout's scan emits (the
  * vectorized reader prunes whole row groups by footer stats before any
  * row reaches the Filter operator).
  */
class FileStatsPruningSpec extends SparkSpec {

  private def scanOutputRows(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect() // execute THIS df: metrics live on its executed plan
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scans = plan.collect { case s: FileSourceScanExec => s }
    assert(scans.nonEmpty, "no FileSourceScanExec in plan")
    scans.map(_.metrics("numOutputRows").value).sum
  }

  test("sorted parquet + pushed range filter: row-group stats prune the scan") {
    val n = 400000L
    val df = spark.range(n).select(col("id").as("k"), (col("id") * 2).as("v"))
    val base = java.nio.file.Files.createTempDirectory("graft_rgprune").toString

    // small row groups (64 KB ≈ a few k rows) so stats granularity is
    // visible at test scale; same setting for both layouts
    val rg = "parquet.block.size" -> (64 * 1024).toString
    // sorted: each of 8 files covers a contiguous k-range; row groups
    // within each file carry tight min/max k stats
    df.repartitionByRange(8, col("k")).sortWithinPartitions(col("k"))
      .write.option(rg._1, rg._2).parquet(s"$base/sorted")
    // scattered: hash-shuffled AND hash-sorted within files, so every
    // row group spans nearly the full k domain — stats can prune nothing
    df.repartition(8, col("v")).sortWithinPartitions(pmod(hash(col("v")), lit(997)))
      .write.option(rg._1, rg._2).parquet(s"$base/scattered")

    val pred = col("k").between(1000, 1999) // 1000 of 400k rows = 0.25%
    val sortedRead = spark.read.parquet(s"$base/sorted").filter(pred)
    // pushdown must reach the reader for stats pruning to exist at all
    val pushed = sortedRead.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s.metadata.get("PushedFilters").getOrElse("")
    }.mkString
    assert(pushed.contains("GreaterThanOrEqual(k,1000"), s"filter not pushed: $pushed")

    val sortedRows = scanOutputRows(sortedRead)
    val scatteredRows = scanOutputRows(spark.read.parquet(s"$base/scattered").filter(pred))
    // sorted: at most a couple of row groups survive (row group ≈ 128MB
    // OR parquet.page/row-count limits; with 50k rows/file the k-range
    // sits inside one). scattered: stats prune nothing → scan emits ~all
    assert(sortedRows < n / 10, s"sorted scan emitted $sortedRows rows — no row-group pruning")
    assert(scatteredRows > n / 2, s"scattered scan unexpectedly pruned: $scatteredRows")
    assert(sortedRows * 10 < scatteredRows,
      s"no pruning win: sorted=$sortedRows scattered=$scatteredRows")
  }
}
