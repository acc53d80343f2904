package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scale-up generator for the scale-curve gate: replicate
  * an existing SF directory `factor`× with RESEEDED keys, so the gate
  * can span sf0.1 → sf1 (100× against sf0.01) without touching the
  * read-only driver testdata.
  *
  * Reseeding rules (replica k ∈ [0, factor)):
  *  - every primary key is offset by k · (max(key)+1) of its table, and
  *    every foreign key by the SAME offset as the key it references —
  *    joins match exactly within a replica, never across, so join
  *    selectivity and group sizes are preserved while row counts scale
  *    linearly (the property a scale GATE needs: cost should scale with
  *    data, not with replica count artifacts);
  *  - region/nation are TPC-H-style fixed dimensions — copied, not
  *    replicated;
  *  - `documents.text` gets every token suffixed with the replica tag
  *    for k > 0: within-replica duplicate/shingle structure is identical
  *    to the source, but replicas are NOT near-dups of each other —
  *    without this, every doc would gain factor-1 near-identical copies
  *    and pair counts would grow quadratically in `factor`, a property
  *    of the synthetic data rather than of the operators under test;
  *  - events keep their timestamps (windows get linearly denser — the
  *    realistic read) and embeddings keep their vectors (ids reseed).
  *
  * Usage: runMain graft.GenScale <srcDir> <outDir> [factor]
  */
object GenScale {

  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse(s"${graft.engine.Staging.root}/graft_sf1")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = GraftSession.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    generate(spark, src, out, factor)
    spark.stop()
    System.exit(0)
  }

  def generate(spark: SparkSession, src: String, out: String, factor: Int): Unit = {
    def read(t: String) = spark.read.parquet(s"$src/$t.parquet")
    // Fact tables are written as 32 hash-partitioned files (keyed on the
    // table's primary key — deterministic content per file, unlike
    // round-robin). The narrow replicate plan otherwise emits ONE part
    // file per table, and a single-file single-row-group parquet is ONE
    // Spark input partition no matter the byte settings — every sf1
    // sweep measurement then times a SERIALIZED scan+expression chain
    // (measured: q_eval_auc 26 s at sf1 on one task; the r13 eval-tier
    // flags were mostly this). No 100 TB table is one file; the gate
    // should measure the operator's scaling on a realistic multi-file
    // layout, not a degenerate one.
    def write(t: String, df: DataFrame, key: String = ""): Unit = {
      val shaped = if (key.isEmpty) df else df.repartition(32, col(key))
      shaped.write.mode("overwrite").parquet(s"$out/$t.parquet")
      println(s"[genscale] $t written")
    }
    def keySpace(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).head().getLong(0) + 1L

    // fixed dimensions: copy
    write("region", read("region"))
    write("nation", read("nation"))

    val customer = read("customer"); val cOff = keySpace(customer, "c_custkey")
    val supplier = read("supplier"); val sOff = keySpace(supplier, "s_suppkey")
    val part = read("part"); val pOff = keySpace(part, "p_partkey")
    val orders = read("orders"); val oOff = keySpace(orders, "o_orderkey")

    // cross-join each table with the replica index k and offset keys;
    // column order is preserved so the output schema ≡ the source schema
    def replicate(df: DataFrame, offsets: Map[String, Long]): DataFrame = {
      val ks = spark.range(factor).select(col("id").as("__k"))
      val cols = df.columns.map { c =>
        offsets.get(c) match {
          case Some(off) => (col(c) + col("__k") * off).as(c)
          case None => col(c)
        }
      }
      df.crossJoin(broadcast(ks)).select(cols.toIndexedSeq: _*)
    }

    // c_name is DERIVED from c_custkey in TPC-H ('Customer#%09d'), so the
    // faithful replica rewrites it from the offset key. Without this every
    // replica duplicates the source's names verbatim and the ER tier's
    // edit-distance pair count grows QUADRATICALLY in the replica count —
    // a generator artifact (the documents/embeddings decorrelation rule),
    // observed as q_er_editjoin's only r14 100× flag (isolated 16.9×;
    // within-replica ER structure is preserved exactly by this rewrite).
    write("customer",
      replicate(customer, Map("c_custkey" -> cOff))
        .withColumn("c_name", format_string("Customer#%09d", col("c_custkey"))),
      "c_custkey")
    write("supplier", replicate(supplier, Map("s_suppkey" -> sOff)), "s_suppkey")
    write("part", replicate(part, Map("p_partkey" -> pOff)), "p_partkey")
    write("orders", replicate(orders, Map("o_orderkey" -> oOff, "o_custkey" -> cOff)), "o_orderkey")
    write("lineitem", replicate(read("lineitem"),
      Map("l_orderkey" -> oOff, "l_partkey" -> pOff, "l_suppkey" -> sOff)),
      "l_orderkey")

    // user_id is a FOREIGN key into customer (q_stream_static_join joins
    // it to c_custkey, q_join_asof to o_custkey) — it must shift by the
    // REFERENCED key's space (cOff), not its own: replica-k events then
    // join replica-k customers/orders, preserving the invariant that
    // joins match exactly within a replica, never across. (Events cover
    // a prefix of the user space, so within each replica the covered
    // fraction — and every join's selectivity — is unchanged.)
    val events = read("events")
    write("events", replicate(events, Map(
      "event_id" -> keySpace(events, "event_id"),
      "user_id" -> cOff)), "event_id")

    val docs = read("documents")
    val dOff = keySpace(docs, "doc_id")
    val ks = spark.range(factor).select(col("id").as("__k"))
    // k = 0 keeps the source text verbatim; k > 0 suffixes every token
    // with the replica tag so replicas share no shingles with each other
    // (see scaladoc); empty/null docs stay as-is
    val tag = concat(lit("·r"), col("__k"))
    val newText = when(col("text").isNull || col("__k") === 0 || trim(col("text")) === "",
      col("text"))
      .otherwise(concat_ws(" ",
        transform(split(trim(col("text")), "\\s+"), w => concat(w, tag))))
    val docCols = docs.columns.map {
      case "doc_id" => (col("doc_id") + col("__k") * dOff).as("doc_id")
      case "text" => newText.as("text")
      case "n_chars" => when(col("text").isNull, col("n_chars"))
        .otherwise(length(newText).cast("long")).as("n_chars")
      case c => col(c)
    }
    write("documents", docs.crossJoin(broadcast(ks)).select(docCols.toIndexedSeq: _*), "doc_id")

    // embeddings: ids reseed AND vectors ROTATE (circular dim shift by
    // 7k, norm- and distribution-preserving) for k > 0 — replicating
    // identical vectors would give every vector factor-1 exact twins,
    // inflating near-dup/ANN pair counts quadratically in `factor` (the
    // r7 gate measured 50-75× at factor 10): a data artifact, not an
    // operator property. Rotated replicas decorrelate (cosine ≈ a
    // random pair's) while per-dim marginals stay realistic.
    val emb = read("embeddings")
    val vOff = keySpace(emb, "vec_id")
    val ksV = spark.range(factor).select(col("id").as("__k"))
    val dim = size(col("embedding"))
    val sh = (col("__k") * lit(7) % dim).cast("int")
    val rotated = when(col("__k") === 0 || dim <= lit(1), col("embedding"))
      .otherwise(concat(slice(col("embedding"), sh + 1, dim - sh),
        slice(col("embedding"), lit(1), sh)))
    val embCols = emb.columns.map {
      case "vec_id" => (col("vec_id") + col("__k") * vOff).as("vec_id")
      case "embedding" => rotated.as("embedding")
      case c => col(c)
    }
    write("embeddings", emb.crossJoin(broadcast(ksV)).select(embCols.toIndexedSeq: _*), "vec_id")
  }
}
