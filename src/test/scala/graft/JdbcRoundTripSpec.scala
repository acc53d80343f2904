package graft

import org.apache.spark.sql.functions._
import graft.model.SinkSpec
import graft.sinks.Sinks
import graft.sources.{SourceDef, SourceRegistry, Vault}

/** JDBC source/sink exercised END-TO-END against embedded Derby (the one
  * JDBC engine on the offline classpath — it ships with Spark for the
  * Hive metastore). This is the S6/S7 (PostgreSQL/MySQL table scan) and
  * K1 (SQL batch INSERT sink) execution path: Spark's `jdbc` format is
  * dialect-negotiated, so the identical wiring drives Postgres/MySQL by
  * swapping url/driver — exactly how the reference's DB adapters differ
  * only in connection config (adapters/postgresql/src/index.ts:63-90 vs
  * adapters/mysql: same queryTable shape).
  */
class JdbcRoundTripSpec extends SparkSpec {

  private val driver = "org.apache.derby.jdbc.EmbeddedDriver"

  private def dbUrl(name: String) =
    s"jdbc:derby:/tmp/graft_derby_$name;create=true"

  test("JDBC sink writes and source reads back, exact values (K1 + S6/S7 path)") {
    val url = dbUrl("roundtrip")
    val df = spark.range(1, 101)
      .select(col("id"), concat(lit("name"), col("id")).as("name"),
        (col("id").cast("double") * 1.5).as("val"))

    // K1: the Sinks.write jdbc branch (batch INSERTs under the hood)
    Sinks.write(df, SinkSpec(format = "jdbc", options = Map(
      "url" -> url, "dbtable" -> "t_round", "driver" -> driver)))

    // S6/S7: the SourceRegistry jdbc format, credentials via the vault
    // (user/password merged at bind time, never in the SourceDef)
    val vault = new Vault(Map("derby_creds" -> Map("user" -> "app", "password" -> "app")))
    val reg = new SourceRegistry(vault).register("jtable", SourceDef(
      format = "jdbc",
      options = Map("url" -> url, "dbtable" -> "t_round", "driver" -> driver),
      credentialsKey = "derby_creds"))
    val back = reg.load(spark, "jtable")

    assert(back.count() == 100)
    val rows = back.orderBy("id").collect()
    assert(rows.head.getLong(0) == 1L && rows.head.getString(1) == "name1"
      && rows.head.getDouble(2) == 1.5)
    assert(rows.last.getLong(0) == 100L && rows.last.getDouble(2) == 150.0)
  }

  test("JDBC source pushes filters + projection into the remote query") {
    val url = dbUrl("pushdown")
    spark.range(1, 1001).select(col("id"), (col("id") % 7).as("grp"))
      .write.format("jdbc").mode("overwrite")
      .options(Map("url" -> url, "dbtable" -> "t_push", "driver" -> driver))
      .save()
    val df = spark.read.format("jdbc")
      .options(Map("url" -> url, "dbtable" -> "t_push", "driver" -> driver))
      .load()
      .filter(col("grp") === 3).select("id")
    // the JDBC relation compiles the predicate into the remote WHERE —
    // visible as PushedFilters in the scan node (at 100 TB this is the
    // difference between shipping 1/7th of a table and all of it)
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("PushedFilters") && plan.toLowerCase.contains("grp"), plan)
    assert(df.count() == 143)
  }

  test("partitioned JDBC read: parallel range scan wiring (numPartitions)") {
    val url = dbUrl("partitioned")
    spark.range(1, 1001).select(col("id"), (col("id") * 2).as("v"))
      .write.format("jdbc").mode("overwrite")
      .options(Map("url" -> url, "dbtable" -> "t_part", "driver" -> driver))
      .save()
    // the scale shape for S6/S7: split the table into per-executor range
    // queries instead of one serial cursor
    val df = spark.read.format("jdbc")
      .options(Map("url" -> url, "dbtable" -> "t_part", "driver" -> driver,
        "partitionColumn" -> "id", "lowerBound" -> "1", "upperBound" -> "1001",
        "numPartitions" -> "4"))
      .load()
    assert(df.rdd.getNumPartitions == 4)
    assert(df.count() == 1000)
    assert(df.agg(sum("v")).head().getLong(0) == (1L to 1000L).map(_ * 2).sum)
  }
}
