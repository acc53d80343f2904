package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.QueryBuilder.scan
import graft.ops.Multimodal

/** Multimodal plumbing queries: binary payload ingest, stub decode via a
  * typed mapPartitions pipeline, frame sampling. Payloads here are UTF-8
  * text bytes (ASCII corpus), so every byte-level operation has an exact
  * varchar oracle in DuckDB.
  */
object MultimodalQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ingest → typed partition-wise decode → features
    "q_multimodal_features" -> ((s: SparkSession, d: String) => {
      Multimodal.extractFeatures(
        Multimodal.asMedia(scan(s, d, "documents"), "doc_id", "text"))
        .orderBy(col("media_id"))
    }),

    // frame sampling: 16-byte frames, every 4th
    "q_multimodal_frames" -> ((s: SparkSession, d: String) => {
      Multimodal.sampleFrames(
        Multimodal.asMedia(scan(s, d, "documents"), "doc_id", "text"),
        frameBytes = 16, stride = 4)
        .select(col("media_id"), col("frame_idx"),
          length(col("frame")).as("frame_len"),
          md5(col("frame")).as("frame_md5"))
        .orderBy(col("media_id"), col("frame_idx"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q_multimodal_features" ->
      """WITH h AS (SELECT doc_id, text, md5(text) AS hex FROM documents)
        |SELECT doc_id AS media_id, 'text/plain' AS mime,
        |  CAST(length(text) AS BIGINT) AS n_bytes,
        |  hex AS content_hash,
        |  [ CAST((strpos('0123456789abcdef', substring(hex, 2*i + 1, 1)) - 1) * 16
        |       + (strpos('0123456789abcdef', substring(hex, 2*i + 2, 1)) - 1) AS DOUBLE) / 255.0
        |    for i in range(0, 8) ] AS embedding
        |FROM h ORDER BY media_id""".stripMargin,
    "q_multimodal_frames" ->
      """WITH f AS (
        |  SELECT doc_id, text, CAST(ceil(length(text) / 16.0) AS INT) AS n_frames
        |  FROM documents),
        |idx AS (
        |  SELECT doc_id, text, unnest([i for i in range(0, n_frames) if i % 4 = 0]) AS frame_idx
        |  FROM f)
        |SELECT doc_id AS media_id, CAST(frame_idx AS INT) AS frame_idx,
        |  CAST(length(substring(text, CAST(frame_idx AS INT) * 16 + 1, 16)) AS INT) AS frame_len,
        |  md5(substring(text, CAST(frame_idx AS INT) * 16 + 1, 16)) AS frame_md5
        |FROM idx ORDER BY media_id, frame_idx""".stripMargin
  )
}
