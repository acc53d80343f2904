package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model._
import graft.engine.QueryBuilder

/** Transform-library queries (SURVEY §2.3 T1-T12) with DuckDB oracles.
  * Each runs the declarative Transformation pipeline through
  * [[graft.engine.QueryBuilder]]; the oracle re-states the same scalar
  * semantics in ANSI SQL. JS-edge-case fidelity (falsy-skip, prefix-parse)
  * is pinned separately by ScalaTest golden vectors — these queries verify
  * the common path against DuckDB on real data.
  */
object TransformQueries {
  private def q(c: Connector)(spark: SparkSession, dir: String): DataFrame =
    QueryBuilder.build(spark, dir, c)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // T3/T4/T5/T8/T9: case ops, trim, prefix/suffix
    "q_t_strings" -> q(Connector(
      table = "customer",
      transformations = Seq(
        Transformation("uppercase", field = "c_name", to = "name_upper"),
        Transformation("lowercase", field = "c_mktsegment", to = "seg_lower"),
        Transformation("trim", field = "c_name", to = "name_trim"),
        Transformation("addPrefix", field = "c_name", to = "name_pref", prefix = "cust:"),
        Transformation("addSuffix", field = "c_mktsegment", to = "seg_suff", suffix = "!")
      ),
      fields = Seq("c_custkey", "name_upper", "seg_lower", "name_trim", "name_pref", "seg_suff"),
      sort = Seq(Sort.asc("c_custkey")),
      limit = 0
    )) _,

    // T1 concat with glue
    "q_t_concat" -> q(Connector(
      table = "customer",
      transformations = Seq(
        Transformation("concat", properties = Seq("c_name", "c_mktsegment"), glue = "-", to = "name_seg")
      ),
      fields = Seq("c_custkey", "name_seg"),
      sort = Seq(Sort.asc("c_custkey")),
      limit = 0
    )) _,

    // T10 toNumber: full-parse path (numeric string) + no-parse path (text → 0)
    "q_t_tonumber" -> ((spark: SparkSession, dir: String) => {
      val base = QueryBuilder.scan(spark, dir, "customer")
        .withColumn("bal_str", col("c_acctbal").cast("string"))
      val withT = graft.transform.Transforms.applyAll(base, Seq(
        Transformation("toNumber", field = "bal_str", to = "bal_num"),
        Transformation("toNumber", field = "c_mktsegment", to = "seg_num")
      ))
      withT.select(col("c_custkey"), col("bal_num"), col("seg_num")).orderBy(col("c_custkey"))
    }),

    // T11 extract: regex group-1, and slice [0,5)
    "q_t_extract" -> q(Connector(
      table = "part",
      transformations = Seq(
        Transformation("extract", field = "p_type", to = "type_first", pattern = "^([A-Z]+)"),
        Transformation("extract", field = "p_name", to = "name_slice", start = 0, end = 5)
      ),
      fields = Seq("p_partkey", "type_first", "name_slice"),
      sort = Seq(Sort.asc("p_partkey")),
      limit = 0
    )) _,

    // T6 split (literal delimiter) + T7 regex replace (global).
    // The split array is serialized with array_join in the FINAL projection
    // only (the driver's pandas compare can't sort ndarray cells); the
    // array-typed column itself is produced and spec-checked upstream.
    "q_t_split_replace" -> ((spark: SparkSession, dir: String) => {
      q(Connector(
        table = "part",
        transformations = Seq(
          Transformation("split", field = "p_type", to = "type_words", delimiter = " "),
          Transformation("replace", field = "p_name", to = "name_repl", search = "a", replace = "A")
        ),
        fields = Seq("p_partkey", "type_words", "name_repl"),
        sort = Seq(Sort.asc("p_partkey")),
        limit = 0
      ))(spark, dir)
        .withColumn("type_words", array_join(col("type_words"), "|"))
    }),

    // T12 mergeObjects → struct; T2 renameKey via dotted path back out.
    // The struct is flattened to scalar fields in the FINAL projection only
    // (driver's pandas compare can't sort dict cells); struct production
    // itself is exercised by the merge + dotted-path access.
    "q_t_merge_rename" -> ((spark: SparkSession, dir: String) => {
      val base = QueryBuilder.scan(spark, dir, "customer")
      val merged = graft.transform.Transforms.applyAll(base, Seq(
        Transformation("mergeObjects", to = "obj", fields = Seq("c_name", "c_mktsegment")),
        Transformation("renameKey", field = "obj.c_name", to = "extracted")
      ))
      merged.select(col("c_custkey"),
          col("obj.c_name").as("obj_name"),
          col("obj.c_mktsegment").as("obj_seg"),
          col("extracted"))
        .orderBy(col("c_custkey"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q_t_strings" ->
      """SELECT c_custkey, upper(c_name) AS name_upper, lower(c_mktsegment) AS seg_lower,
        |       trim(c_name) AS name_trim, 'cust:' || c_name AS name_pref,
        |       c_mktsegment || '!' AS seg_suff
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_t_concat" ->
      """SELECT c_custkey, c_name || '-' || c_mktsegment AS name_seg
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_t_tonumber" ->
      """SELECT c_custkey, CAST(c_acctbal AS DOUBLE) AS bal_num, CAST(0.0 AS DOUBLE) AS seg_num
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_t_extract" ->
      """SELECT p_partkey, regexp_extract(p_type, '^([A-Z]+)', 1) AS type_first,
        |       substring(p_name, 1, 5) AS name_slice
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_t_split_replace" ->
      """SELECT p_partkey,
        |       array_to_string(string_split(p_type, ' '), '|') AS type_words,
        |       regexp_replace(p_name, 'a', 'A', 'g') AS name_repl
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_t_merge_rename" ->
      """SELECT c_custkey,
        |       c_name AS obj_name, c_mktsegment AS obj_seg,
        |       c_name AS extracted
        |FROM customer ORDER BY c_custkey""".stripMargin
  )
}
