package graft

import org.apache.spark.sql.functions._
import graft.ops.Layout

class CompactionSpec extends SparkSpec {

  test("compact: collapses a many-small-files table, preserves rows exactly, files sized to target") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_compact").toString + "/t"
    // simulate an accreted sink: 64 tiny files
    spark.range(100000L).select(col("id"), (col("id") % 97).as("k"))
      .repartition(64).write.parquet(base)
    val before = spark.read.parquet(base)
    val beforeFiles = before.inputFiles.length
    val beforeRows = before.as[(Long, Long)].collect().toSet
    assert(beforeFiles >= 60, s"setup: expected ~64 files, got $beforeFiles")

    val n = Layout.compact(spark, base, targetFileBytes = 512L * 1024, sortCols = Seq("id"))
    val after = spark.read.parquet(base)
    assert(after.inputFiles.length.toLong == n)
    assert(after.inputFiles.length < beforeFiles / 4,
      s"no compaction: $beforeFiles -> ${after.inputFiles.length}")
    assert(after.as[(Long, Long)].collect().toSet == beforeRows, "rows changed")
    // no leftover temp dir
    assert(!new java.io.File(base + "__compacting").exists())
  }
}
