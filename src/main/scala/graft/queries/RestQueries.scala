package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.rest.StubServer

/** REST-source queries: the DSv2 paginated reader against the
  * deterministic in-process stub. The stub data is a closed formula over
  * id = 1..250, so the oracle is generative DuckDB SQL (range table
  * function) — no parquet needed.
  */
object RestQueries {

  private val schemaDdl = "id BIGINT, name STRING, value DOUBLE"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // offset pagination, 100-row pages over 250 rows → 3 pages + stop on short page
    "q_rest_offset" -> ((s: SparkSession, _: String) => {
      s.read.format("graft.sources.rest.RestSource")
        .option("schema", schemaDdl)
        .option("url", StubServer.url("/rows"))
        .option("itemsPerPage", "100")
        .load()
        .orderBy(col("id"))
    }),

    // cursor pagination: opaque nextOffset chain (stops on missing cursor)
    "q_rest_cursor" -> ((s: SparkSession, _: String) => {
      s.read.format("graft.sources.rest.RestSource")
        .option("schema", schemaDdl)
        .option("url", StubServer.url("/cursor-rows"))
        .option("pageType", "cursor")
        .option("itemsPerPage", "60")
        .load()
        .orderBy(col("id"))
    }),

    // parallel ingest: 4 offset-range partitions page concurrently — the
    // distributed scale path the reference's serial loop cannot take
    "q_rest_parallel" -> ((s: SparkSession, _: String) => {
      s.read.format("graft.sources.rest.RestSource")
        .option("schema", schemaDdl)
        .option("url", StubServer.url("/rows"))
        .option("itemsPerPage", "40")
        .option("totalLimit", "250")
        .option("parallelism", "4")
        .load()
        .orderBy(col("id"))
    }),

    // STREAMING ingest from the REST source (MicroBatchStream facet):
    // AvailableNow drains what the API holds now through the same
    // offset-range reader — the reference's "scheduled sync" as a real
    // Structured Streaming source with a checkpointable row offset
    "q_rest_stream" -> ((s: SparkSession, _: String) => {
      val stream = s.readStream.format("graft.sources.rest.RestSource")
        .option("schema", schemaDdl)
        .option("url", StubServer.url("/rows"))
        .option("itemsPerPage", "100")
        .load()
      graft.streaming.StreamOps.runToMemory(s, stream, "mem_rest_stream", "append")
        .orderBy(col("id"))
    }),

    // filter pushdown: the predicate compiles into f_id_gte/f_id_lte
    // query params, the server filters before paginating, and the engine
    // re-applies the residual — fetches ~60 rows instead of 250
    "q_rest_filtered" -> ((s: SparkSession, _: String) => {
      s.read.format("graft.sources.rest.RestSource")
        .option("schema", schemaDdl)
        .option("url", StubServer.url("/rows"))
        .option("itemsPerPage", "100")
        .load()
        .filter(col("id") >= 100 && col("id") <= 160 && col("name").startsWith("Item1"))
        .orderBy(col("id"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q_rest_offset" ->
      """SELECT i AS id, 'Item' || i AS name, CAST(i AS DOUBLE) * 0.5 AS value
        |FROM (SELECT unnest(range(1, 251)) AS i)
        |ORDER BY id""".stripMargin,
    "q_rest_cursor" ->
      """SELECT i AS id, 'Item' || i AS name, CAST(i AS DOUBLE) * 0.5 AS value
        |FROM (SELECT unnest(range(1, 251)) AS i)
        |ORDER BY id""".stripMargin,
    "q_rest_filtered" ->
      """SELECT i AS id, 'Item' || i AS name, CAST(i AS DOUBLE) * 0.5 AS value
        |FROM (SELECT unnest(range(1, 251)) AS i)
        |WHERE i BETWEEN 100 AND 160 AND starts_with('Item' || i, 'Item1')
        |ORDER BY id""".stripMargin,
    "q_rest_parallel" ->
      """SELECT i AS id, 'Item' || i AS name, CAST(i AS DOUBLE) * 0.5 AS value
        |FROM (SELECT unnest(range(1, 251)) AS i)
        |ORDER BY id""".stripMargin,
    "q_rest_stream" ->
      """SELECT i AS id, 'Item' || i AS name, CAST(i AS DOUBLE) * 0.5 AS value
        |FROM (SELECT unnest(range(1, 251)) AS i)
        |ORDER BY id""".stripMargin
  )
}
