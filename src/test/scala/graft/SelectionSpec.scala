package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.ops.{CorpusOps, Selection}

/** Two-phase distributed selection: Selection.kthSmallest must equal
  * sorted-array indexing for every rank, and CorpusOps.balancedSample
  * must keep exactly the minority count per class — including when the
  * requested rank lands exactly on a bucket boundary, the off-by-one
  * regime the census/boundary split can get wrong.
  */
class SelectionSpec extends SparkSpec {
  import spark.implicits._

  private def med(n: Column): Column = Selection.idiv(n + 1, 2)

  test("kthSmallest matches sorted-array indexing at every rank shape") {
    // deterministic multiset WITH ties and a value at a bucket edge:
    // shift=2 → buckets of 4; 8 sits first-in-bucket, 7 last-in-bucket
    val vals = Seq(3L, 7L, 7L, 8L, 1L, 12L, 8L, 0L, 15L, 4L, 4L, 4L)
    val df = vals.zipWithIndex.map { case (v, i) => ("g", v, i) }
      .toDF("g", "v", "i")
    val sorted = vals.sorted
    val targets: Seq[(String, Column => Column)] = Seq(
      "min" -> ((_: Column) => lit(1L)),
      "med" -> med,
      "p75" -> ((n: Column) => Selection.idiv(n * 75 + 99, 100)),
      "max" -> ((n: Column) => n))
    val got = Selection.kthSmallest(df, "g", "v", targets, shift = 2)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    val n = vals.size
    assert(got("min") == sorted.head)
    assert(got("med") == sorted(((n + 1) / 2) - 1))
    assert(got("p75") == sorted(((75 * n + 99) / 100) - 1))
    assert(got("max") == sorted.last)
  }

  test("kthSmallest is per-group and survives skewed group sizes") {
    val big = (1L to 1000L).map(v => ("big", v))
    val tiny = Seq(("tiny", 42L), ("tiny", 7L), ("tiny", 99L))
    val df = (big ++ tiny).toDF("g", "v")
    val got = Selection.kthSmallest(df, "g", "v", Seq("med" -> med), shift = 4)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got("big") == 500L) // (1000+1) div 2 = rank 500
    assert(got("tiny") == 42L)
  }

  test("idiv rank formulas: exact floor/ceil semantics, also near 2^53") {
    val df = Seq(1L).toDF("x")
    def eval(c: Column): Long = df.select(c.as("k")).head().getLong(0)
    // ceil-by-integers: (95n + 99) div 100 — exact multiples stay put,
    // non-multiples round up
    assert(eval(Selection.idiv(lit(20L) * 95 + 99, 100)) == 19L) // 0.95·20 = 19 exactly
    assert(eval(Selection.idiv(lit(21L) * 95 + 99, 100)) == 20L) // ceil(19.95)
    // the intermediate double division stays exact at the top of the
    // long-rank range because the numerator is a multiple of b
    val a = (1L << 53) - 2L
    assert(eval(Selection.idiv(lit(a), 2)) == a / 2)
  }

  test("balancedSample keeps exactly the minority count per class") {
    val rows = (1 to 40).map(i => ("a", i.toLong)) ++
      (1 to 7).map(i => ("b", 1000L + i)) ++
      (1 to 19).map(i => ("c", 2000L + i))
    val df = rows.toDF("cls", "id")
    val kept = CorpusOps.balancedSample(df, "cls", "id")
    val counts = kept.groupBy("__cls").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("a" -> 7L, "b" -> 7L, "c" -> 7L))
    // kept set is exactly the m smallest (hash, id) pairs per class —
    // cross-check against a plain window rank
    import org.apache.spark.sql.expressions.Window
    val h = graft.ops.Dedup.hex60(
      md5(concat(lit("bal:"), col("id").cast("string")).cast("binary")))
    val w = Window.partitionBy(col("cls")).orderBy(col("h"), col("id"))
    val expect = df.withColumn("h", h)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 7)
      .select(col("cls"), col("id")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val got = kept.select(col("__cls"), col("__id")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == expect)
  }
}
