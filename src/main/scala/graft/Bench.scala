package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.build(cpus)
    // warm the JVM/codegen/FS paths so the first timed query isn't
    // charged ~4s of session startup, and touch every table's footer so
    // per-query numbers measure the plan, not first-read of the file
    spark.range(1000000L).selectExpr("sum(id)").collect()
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count() catch { case _: Throwable => }
    }
    var errors = List.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      // a broken query must fail LOUDLY, not benchmark as "fast"
      try { fn(spark, sfDir).count() } catch {
        case e: Throwable =>
          errors ::= name
          System.err.println(s"BENCH ERROR $name: ${e.getClass.getName}: ${e.getMessage}")
      }
      // NOTE: no clearCache here — identical persisted subplans (e.g. the
      // hashed shingle table) are intentionally shared across the dedup
      // queries via the cache manager, matching the round-1 methodology;
      // Verify (untimed) clears between queries instead
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val totalLine =
      s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},"n_errors":${errors.size},"sf":"$sfDir"}"""
    val detailLine =
      s"""{"metric":"detail","queries":$qs,"errors":[${errors.map("\"" + _ + "\"").mkString(",")}],"sf":"$sfDir"}"""
    // the compact total line FIRST — r3's capture window cut mid-way
    // through the (long) detail line and lost the total entirely; detail
    // after, and a full copy on disk so no capture window can lose it
    GraftSession.emitJsonLines("tools/bench_last.json", Seq(totalLine, detailLine))
    graft.sources.rest.StubServer.stop() // don't let the REST stub pin the JVM
    spark.stop()
    System.exit(0) // insurance: never let a leaked non-daemon thread stall the driver's round
  }
}
