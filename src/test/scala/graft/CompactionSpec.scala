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

  test("compaction planner: covers every file, groups bounded by target + max file") {
    val rows = graft.queries.ProfileQueries.queries("q_profile_compaction")(
        spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("bytes"),
        r.getAs[Int]("grp"), r.getAs[Long]("grp_bytes"), r.getAs[Long]("grp_files")))
    assert(rows.map(_._1).distinct.length == rows.length, "a file was planned twice")
    val total = rows.map(_._2).sum
    val target = total / 6 + 1
    val maxFile = rows.map(_._2).max
    val byGrp = rows.groupBy(_._3)
    byGrp.foreach { case (g, members) =>
      // the emitted group totals must be the true member sums...
      assert(members.head._4 == members.map(_._2).sum, s"grp $g bytes inconsistent")
      assert(members.head._5 == members.length.toLong, s"grp $g file count inconsistent")
      // ...and sequential-fill bounds every group by target + one file
      assert(members.head._4 <= target + maxFile, s"grp $g overflows the bin bound")
    }
    assert(byGrp.values.map(_.head._4).sum == total, "group totals don't cover the table")
  }
}
