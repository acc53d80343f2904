package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators for multi-dimensional locality — the write-side
  * lever that makes 100 TB scans cheap. A table range-partitioned and
  * sorted by a Z-order (Morton) key keeps rows close in BOTH dimensions
  * close in the file layout, so a 2-D box predicate touches a few files
  * and parquet row-group stats prune the rest — where a 1-D sort only
  * prunes on its leading column.
  *
  * The interleave is pure integer Column arithmetic (shift/and/add), so
  * it is codegen'd, deterministic, and has an exact DuckDB spelling for
  * the oracle.
  */
object Layout {

  /** 2-D Morton (Z-order) key: interleave the low `bits` bits of two
    * non-negative int columns — a's bit i lands at position 2i+1, b's at
    * 2i. 16+16 bits → a 32-bit z-value in a long.
    */
  def zorder2(a: Column, b: Column, bits: Int = 16): Column =
    (0 until bits).map { i =>
      shiftright(a.cast("long"), i).bitwiseAND(1) * lit(1L << (2 * i + 1)) +
        shiftright(b.cast("long"), i).bitwiseAND(1) * lit(1L << (2 * i))
    }.reduce(_ + _)

  /** DuckDB spelling of [[zorder2]] for oracle SQL. */
  def sqlZorder2(a: String, b: String, bits: Int = 16): String =
    (0 until bits).map { i =>
      s"((($a)::BIGINT >> $i) & 1) * ${1L << (2 * i + 1)} + " +
        s"((($b)::BIGINT >> $i) & 1) * ${1L << (2 * i)}"
    }.mkString("(", " + ", ")")

  /** Write `df` clustered by the z-value of (aCol, bCol): range-partition
    * into `numFiles` on the z-key and sort within partitions — the layout
    * a 100 TB table uses so 2-D box queries read O(box) files.
    */
  def writeZOrdered(df: DataFrame, aCol: String, bCol: String,
                    path: String, numFiles: Int, bits: Int = 16): Unit =
    df.withColumn("__z", zorder2(col(aCol), col(bCol), bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
