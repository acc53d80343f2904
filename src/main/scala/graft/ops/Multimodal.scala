package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque binary payloads with
  * typed metadata, decode/feature-extract as partition-wise typed
  * pipelines, frame sampling as in-plan binary slicing.
  *
  * The actual codec call is STUBBED (this container ships no image/audio
  * libraries): [[decodeStub]] derives deterministic pseudo-features from
  * the bytes, so the Spark-side contract — schema, Encoders, partition
  * batching, feature shape — is real and oracle-testable, and swapping in
  * a JNI/library decoder changes one function. At 100 TB the payloads
  * stay columnar binary (parquet/ORC binary columns read lazily), decode
  * runs data-local per partition, and nothing round-trips the driver.
  */
object Multimodal {

  /** A media row: payload + typed metadata (reference analogue: S3
    * object get returning {key, content: Buffer},
    * adapters/s3/src/index.ts:156-178).
    */
  final case class MediaRow(media_id: Long, mime: String, payload: Array[Byte])

  /** Extracted features. `embedding` stands in for a model output. */
  final case class MediaFeatures(media_id: Long, mime: String, n_bytes: Long,
                                 content_hash: String, embedding: Array[Double])

  /** Wrap a text table as binary media (what an ingest job does with
    * real image/audio bytes).
    */
  def asMedia(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).as("media_id"),
      lit("text/plain").as("mime"),
      col(textCol).cast("binary").as("payload"))

  /** STUB decoder — deterministic pseudo-features from the raw bytes
    * (byte length, md5, an 8-dim "embedding" from the md5 nibbles). A
    * real implementation would decode/resize here; everything around it
    * (typed Dataset in, typed Dataset out, per-partition batching) is the
    * production shape.
    */
  def decodeStub(rows: Iterator[MediaRow]): Iterator[MediaFeatures] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    rows.map { r =>
      md.reset()
      val digest = md.digest(r.payload)
      val hex = digest.map("%02x".format(_)).mkString
      val emb = (0 until 8).map(i => ((digest(i) & 0xff) / 255.0)).toArray
      MediaFeatures(r.media_id, r.mime, r.payload.length.toLong, hex, emb)
    }
  }

  /** The decode pipeline: DataFrame → typed partition-wise decode →
    * DataFrame. One narrow stage, no shuffle.
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions(decodeStub).toDF()
  }

  /** STUB "resize": deterministic byte-level downsample — keep every
    * `stride`-th byte of the payload (a real implementation decodes and
    * rescales pixels here; the plumbing — binary in, smaller binary out,
    * pure in-plan expression, no driver round-trip — is the production
    * shape). Exactly oracle-checkable since payloads are text bytes.
    */
  def resizeStub(media: DataFrame, stride: Int): DataFrame =
    media.withColumn("resized",
      expr(s"""filter(transform(sequence(1, length(payload)),
              |  i -> IF((i - 1) % $stride = 0, substring(payload, i, 1), null)),
              |  x -> x IS NOT NULL)""".stripMargin)
        .cast("array<string>"))
      .withColumn("resized", concat_ws("", col("resized")).cast("binary"))
      .select(col("media_id"), col("mime"),
        length(col("payload")).as("orig_bytes"),
        length(col("resized")).as("resized_bytes"),
        col("resized"))

  /** Frame sampling: slice the payload into fixed-size frames and keep
    * every `stride`-th — in-plan binary arithmetic (posexplode over a
    * computed index range), the shape video frame-extraction takes
    * before a decoder sees each frame.
    */
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int): DataFrame =
    media
      .withColumn("n_frames",
        ceil(length(col("payload")).cast("double") / frameBytes).cast("int"))
      .withColumn("frame_idx",
        explode(filter(sequence(lit(0), col("n_frames") - 1), i => i % stride === 0)))
      .withColumn("frame",
        expr(s"substring(payload, frame_idx * $frameBytes + 1, $frameBytes)"))
      .select(col("media_id"), col("frame_idx"), col("frame"))
}
