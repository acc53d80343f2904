package graft

import org.apache.spark.sql.functions._
import graft.ops.Layout

/** Z-order layout: correctness of the interleave and the locality claim —
  * a 2-D box predicate over a z-clustered table touches a small fraction
  * of the files, while the same box over a hash-scattered layout touches
  * (nearly) all of them. File count is the proxy for the row-group/file
  * pruning a 100 TB scan gets from min/max stats.
  */
class ZOrderSpec extends SparkSpec {

  test("zorder2 interleaves bits (golden values)") {
    import spark.implicits._
    val rows = Seq((0, 0), (1, 0), (0, 1), (1, 1), (2, 0), (0, 2), (3, 3), (255, 255))
      .toDF("a", "b")
      .select(col("a"), col("b"), Layout.zorder2(col("a"), col("b"), 8).as("z"))
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    def morton(a: Int, b: Int): Long =
      (0 until 8).map(i => (((a >> i) & 1).toLong << (2 * i + 1)) | (((b >> i) & 1).toLong << (2 * i))).sum
    Seq((0, 0), (1, 0), (0, 1), (1, 1), (2, 0), (0, 2), (3, 3), (255, 255)).foreach { case (a, b) =>
      assert(rows((a, b)) == morton(a, b), s"($a,$b)")
    }
  }

  test("z-clustered layout localizes a 2-D box query to few files") {
    import spark.implicits._
    val n = 200000
    // uniform 2-D grid in [0,1024)²
    val df = spark.range(n).select(
      (pmod(hash(col("id")), lit(1024))).cast("int").as("x"),
      (pmod(hash(col("id") * 7 + 3), lit(1024))).cast("int").as("y"))

    val base = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    Layout.writeZOrdered(df, "x", "y", s"$base/zsorted", numFiles = 32, bits = 10)
    df.repartition(32).write.parquet(s"$base/scattered") // hash-scattered twin

    def filesTouched(path: String): Long =
      spark.read.parquet(path)
        .filter(col("x").between(100, 163) && col("y").between(200, 263))
        .select(input_file_name()).distinct().count()

    val zFiles = filesTouched(s"$base/zsorted")
    val rFiles = filesTouched(s"$base/scattered")
    // the box is (64/1024)² ≈ 0.4% of the plane: z-layout confines it to
    // a handful of files; the scattered layout smears it over all 32
    assert(zFiles <= 8, s"z-ordered box touched $zFiles files")
    assert(rFiles >= 24, s"scattered box touched only $rFiles files")
    assert(zFiles < rFiles / 2, s"no locality win: z=$zFiles scattered=$rFiles")
  }
}
