package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.PipelineRunner
import graft.model._

/** End-to-end pipeline query: the full E→T→L runner (extract + declarative
  * transforms + parquet sink with batch cap + read-back), mirroring the
  * reference's download→upload round-trip test
  * (adapters/postgresql/tests/integration.test.ts:229-277).
  */
object PipelineQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pipeline_roundtrip" -> ((s: SparkSession, d: String) => {
      val out = s"/tmp/graft_pipe_${Integer.toHexString(d.hashCode)}"
      val runner = new PipelineRunner(s, d)
      val spec = PipelineSpec(
        source = Some(Connector(
          table = "customer",
          filters = Seq(Filter("c_acctbal", ">", 0.0)),
          transformations = Seq(
            Transformation("concat", properties = Seq("c_name", "c_mktsegment"),
              glue = "|", to = "name_seg"),
            Transformation("uppercase", field = "c_mktsegment", to = "seg_upper")),
          limit = 0
        )),
        target = Some(SinkSpec("parquet", out, itemsPerBatch = 500)),
        errorHandling = ErrorHandling(maxRetries = 1)
      )
      val res = runner.run(spec)
      require(res.loaded && res.rows > 0, s"pipeline did not load: $res")
      s.read.parquet(out).orderBy(col("c_custkey"))
    }),

    // TWO scheduled sync runs into a declarative upsert sink: each run
    // extracts a slice of orders and latest-wins-merges it into the same
    // hash-bucketed target (cost ∝ batch — Sinks "upsert" format over
    // BucketedTarget). Because the merge is associative and commutative,
    // the final state ≡ latest order per customer over ALL orders
    // regardless of how the runs sliced them — the reference's repeated
    // `action: "sync"` schedule, end to end through the runner.
    "q_pipeline_sync" -> ((s: SparkSession, d: String) => {
      import org.apache.hadoop.fs.Path
      val out = s"/tmp/graft_pipesync_${Integer.toHexString(d.hashCode)}"
      val fs = new Path(out).getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new Path(out), true)
      val runner = new PipelineRunner(s, d)
      val sink = SinkSpec("upsert", out, options = Map(
        "keys" -> "o_custkey",
        "versionCols" -> "o_orderdate,o_orderkey",
        "numBuckets" -> "8"))
      def sync(filters: Seq[Filter]): Unit = {
        val res = runner.run(PipelineSpec(
          source = Some(Connector("orders", filters = filters, limit = 0)),
          target = Some(sink)))
        require(res.loaded, s"sync run did not load: $res")
      }
      sync(Seq(Filter("o_orderkey", "<=", 30000L)))
      sync(Seq(Filter("o_orderkey", ">", 30000L)))
      new graft.ops.BucketedTarget(s, out, 8,
        Seq("o_custkey"), Seq("o_orderdate", "o_orderkey"))
        .read().orderBy(col("o_custkey"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q_pipeline_roundtrip" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
        |       c_name || '|' || c_mktsegment AS name_seg,
        |       upper(c_mktsegment) AS seg_upper
        |FROM customer WHERE c_acctbal > 0.0
        |ORDER BY c_custkey""".stripMargin,
    "q_pipeline_sync" ->
      """SELECT o_custkey, o_orderdate, o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
        |FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
        |                                   ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |      FROM orders) t
        |WHERE rn = 1 ORDER BY o_custkey""".stripMargin
  )
}
