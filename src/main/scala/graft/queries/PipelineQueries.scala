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
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q_pipeline_roundtrip" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
        |       c_name || '|' || c_mktsegment AS name_seg,
        |       upper(c_mktsegment) AS seg_upper
        |FROM customer WHERE c_acctbal > 0.0
        |ORDER BY c_custkey""".stripMargin
  )
}
