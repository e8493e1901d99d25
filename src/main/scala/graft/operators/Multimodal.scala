package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal binary-column plumbing (SURVEY.md §2 P12).
 *
 * Images/audio/video are opaque `binary` payloads with a typed metadata
 * struct; decode / feature-extraction runs BATCHED per partition so a real
 * decoder (JNI image lib, ONNX runtime, ...) amortizes model/codec init
 * across a batch — the Spark-side contract (schema, partitioning, batch
 * shape, encoder) is real and tested; only the innermost decode call is a
 * deterministic stub, because no media codec ships in this environment.
 *
 * Scale design: payloads never pass through a shuffle — feature extraction
 * is a narrow mapPartitions; downstream joins/groupBys should operate on
 * the (small) extracted features, with the binary column pruned away by
 * Catalyst column pruning (verified in the spec: the scan's ReadSchema
 * excludes `payload` when only features are selected).
 */
object Multimodal {

  /** Typed rows for the Dataset-side batched decode path. */
  final case class MediaRow(doc_id: Long, modality: String, payload: Array[Byte],
                            width: Int, height: Int, format: String)
  final case class MediaFeatures(doc_id: Long, modality: String, byte_len: Long,
                                 width: Int, height: Int, n_pixels: Long,
                                 payload_hash: String, brightness: Double)

  /**
   * Build a multimodal frame from the documents table: the text bytes act
   * as a deterministic fake payload; metadata derives from doc stats.
   * Columns: doc_id, modality, payload binary, meta struct(width, height, format).
   */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      when(col("doc_id") % 3 === 0, lit("image"))
        .when(col("doc_id") % 3 === 1, lit("audio"))
        .otherwise(lit("video")).as("modality"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        (col("n_chars") % 640 + 1).cast("int").as("width"),
        (col("doc_id") % 480 + 1).cast("int").as("height"),
        when(col("doc_id") % 3 === 0, lit("png"))
          .when(col("doc_id") % 3 === 1, lit("wav"))
          .otherwise(lit("mp4")).as("format")).as("meta"))

  /**
   * Expression-only feature extraction (no decode needed): payload length,
   * md5, pixel count from metadata. Codegen'd, oracle-checkable — the
   * fast path for features derivable without touching a codec.
   */
  def features(media: DataFrame): DataFrame =
    media.select(
      col("doc_id"), col("modality"),
      length(col("payload")).cast("long").as("byte_len"),
      col("meta.width").as("width"), col("meta.height").as("height"),
      (col("meta.width").cast("long") * col("meta.height").cast("long")).as("n_pixels"),
      md5(col("payload")).as("payload_hash"))

  /**
   * STUB decoder — deterministic stand-in for a real media decode
   * (???: replace with an actual codec when one is available). Produces a
   * fake "mean brightness" from the payload bytes so the batched plumbing
   * has a value to carry.
   */
  def decodeStub(payload: Array[Byte]): Double =
    if (payload.isEmpty) 0.0
    else payload.foldLeft(0L)((a, b) => a + (b & 0xff)).toDouble / payload.length

  /**
   * Batched decode path: groups each partition's rows into `batchSize`
   * slices and runs the decoder once per batch (the shape a real codec /
   * model-inference integration needs). Returns a typed Dataset.
   */
  def decodeBatched(spark: SparkSession, media: DataFrame,
                    batchSize: Int = 64): Dataset[MediaFeatures] = {
    import spark.implicits._
    val ds = media.select(col("doc_id"), col("modality"), col("payload"),
      col("meta.width").as("width"), col("meta.height").as("height"),
      col("meta.format").as("format")).as[MediaRow]
    ds.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // One codec/digest init per BATCH (the point of batching); rows
        // reuse it via reset.
        val md = java.security.MessageDigest.getInstance("MD5")
        batch.map { r =>
          md.reset()
          val hash = md.digest(r.payload).map("%02x".format(_)).mkString
          MediaFeatures(r.doc_id, r.modality, r.payload.length.toLong,
            r.width, r.height, r.width.toLong * r.height.toLong,
            hash, decodeStub(r.payload))
        }
      }
    }
  }
}
