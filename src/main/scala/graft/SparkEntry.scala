package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.model.{Connector, Filter, Sort}
import graft.engine.QueryBuilder

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries are organized per operator family under graft.queries and
  * merged here.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's canonical table_query shape
    * (adapters/postgresql/src/index.ts:147-190) on Spark.
    */
  def entry(spark: SparkSession): DataFrame =
    QueryBuilder.build(spark, "/root/testdata/sf0.001", Connector(
      table = "lineitem",
      fields = Seq("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_returnflag"),
      filters = Seq(Filter("l_quantity", "<", 24), Filter("l_returnflag", "=", "N")),
      sort = Seq(Sort.desc("l_extendedprice"), Sort.asc("l_orderkey"), Sort.asc("l_linenumber")),
      limit = 100
    ))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.RefParity.queries ++
      graft.queries.TransformQueries.queries ++
      graft.queries.JoinQueries.queries ++
      graft.queries.AggQueries.queries ++
      graft.queries.WindowQueries.queries ++
      graft.queries.SetOpQueries.queries ++
      graft.queries.TextQueries.queries ++
      graft.queries.DedupQueries.queries ++
      graft.queries.SimilarityQueries.queries ++
      graft.queries.StreamQueries.queries ++
      graft.queries.MultimodalQueries.queries ++
      graft.queries.PipelineQueries.queries ++
      graft.queries.SqlFunctionQueries.queries ++
      graft.queries.RestQueries.queries ++
      graft.queries.AdvancedQueries.queries ++
      graft.queries.TypedQueries.queries ++
      graft.queries.FormatQueries.queries ++
      graft.queries.ProfileQueries.queries ++
      graft.queries.SearchQueries.queries ++
      graft.queries.CorpusQueries.queries ++
      graft.queries.UlmQueries.queries ++
      graft.queries.TpchQueries.queries ++
      graft.queries.GraphQueries.queries ++
      graft.queries.QuantizeQueries.queries ++
      graft.queries.MergeQueries.queries ++
      graft.queries.QualityQueries.queries ++
      graft.queries.FunnelQueries.queries ++
      graft.queries.EntityQueries.queries ++
      graft.queries.PrefQueries.queries ++
      graft.queries.QClassifierQueries.queries ++
      graft.queries.AnnQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    graft.queries.RefParity.oracleSql ++
      graft.queries.TransformQueries.oracleSql ++
      graft.queries.JoinQueries.oracleSql ++
      graft.queries.AggQueries.oracleSql ++
      graft.queries.WindowQueries.oracleSql ++
      graft.queries.SetOpQueries.oracleSql ++
      graft.queries.TextQueries.oracleSql ++
      graft.queries.DedupQueries.oracleSql ++
      graft.queries.SimilarityQueries.oracleSql ++
      graft.queries.StreamQueries.oracleSql ++
      graft.queries.MultimodalQueries.oracleSql ++
      graft.queries.PipelineQueries.oracleSql ++
      graft.queries.SqlFunctionQueries.oracleSql ++
      graft.queries.RestQueries.oracleSql ++
      graft.queries.AdvancedQueries.oracleSql ++
      graft.queries.TypedQueries.oracleSql ++
      graft.queries.FormatQueries.oracleSql ++
      graft.queries.ProfileQueries.oracleSql ++
      graft.queries.SearchQueries.oracleSql ++
      graft.queries.CorpusQueries.oracleSql ++
      graft.queries.UlmQueries.oracleSql ++
      graft.queries.TpchQueries.oracleSql ++
      graft.queries.GraphQueries.oracleSql ++
      graft.queries.QuantizeQueries.oracleSql ++
      graft.queries.MergeQueries.oracleSql ++
      graft.queries.QualityQueries.oracleSql ++
      graft.queries.FunnelQueries.oracleSql ++
      graft.queries.EntityQueries.oracleSql ++
      graft.queries.PrefQueries.oracleSql ++
      graft.queries.QClassifierQueries.oracleSql ++
      graft.queries.AnnQueries.oracleSql
}
