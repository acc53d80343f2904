package graft

import org.apache.spark.sql.functions._

/** Schema evolution on the landed tables — the sync-engine reality that
  * upstream APIs grow fields: older parquet files lack the new column,
  * mergeSchema unions the versions and back-fills nulls, and writes keep
  * working against the widened schema.
  */
class SchemaEvolutionSpec extends SparkSpec {
  import spark.implicits._

  test("mergeSchema unions column sets across file generations; old rows null-fill") {
    val base = java.nio.file.Files.createTempDirectory("graft_evolve").toString + "/t"
    // generation 1: (id, name)
    Seq((1L, "a"), (2L, "b")).toDF("id", "name")
      .write.parquet(s"$base/gen=1")
    // generation 2 adds a column the API grew: (id, name, score)
    Seq((3L, "c", 0.5), (4L, "d", 0.7)).toDF("id", "name", "score")
      .write.parquet(s"$base/gen=2")

    val merged = spark.read.option("mergeSchema", "true").parquet(base)
    assert(merged.columns.toSet == Set("id", "name", "score", "gen"))
    val rows = merged.select(col("id"), col("score")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(rows(1L).isEmpty && rows(2L).isEmpty, "gen-1 rows must null-fill the new column")
    assert(rows(3L).contains(0.5) && rows(4L).contains(0.7))
    // the widened schema keeps aggregating correctly across generations
    assert(merged.filter(col("score").isNotNull).count() == 2)
    assert(merged.count() == 4)
  }
}
