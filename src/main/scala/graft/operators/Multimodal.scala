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
   * STUB decoder — deterministic stand-in for a real media decode of the
   * NON-IMAGE modalities (???: audio/video codecs don't ship in this
   * environment). Produces a fake "mean brightness" from the payload bytes
   * so the batched plumbing has a value to carry.
   */
  def decodeStub(payload: Array[Byte]): Double =
    if (payload.isEmpty) 0.0
    else payload.foldLeft(0L)((a, b) => a + (b & 0xff)).toDouble / payload.length

  /**
   * REAL image decode via `javax.imageio` (pure-JDK PNG/JPEG readers, no
   * external codec): returns (width, height, mean RGB brightness) or None
   * when the payload is not a decodable image (caller falls back to the
   * stub). This is the honest per-modality split: images decode for real;
   * audio/video remain stubbed.
   */
  def decodeImage(payload: Array[Byte]): Option[(Int, Int, Double)] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        var sum = 0.0
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            sum += (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3.0
            x += 1
          }
          y += 1
        }
        Some((w, h, sum / (w.toLong * h.toLong)))
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /**
   * Deterministic PNG generator (for tests/fixtures): pixel (x, y) of
   * image `seed` is a pure function of (x, y, seed), encoded by the JDK
   * PNG writer. Lossless format, so decode recovers the exact pixels.
   */
  def generatePng(width: Int, height: Int, seed: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val r = (x * 31 + y * 17 + seed) % 256
        val g = (x * 7 + y * 13 + seed * 3) % 256
        val b = (x ^ y) % 256
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

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
          // images decode for real (javax.imageio); metadata dims are
          // replaced by the DECODED dims. Non-images (and undecodable
          // payloads) fall back to the stub + declared metadata.
          val decoded =
            if (r.modality == "image") decodeImage(r.payload) else None
          decoded match {
            case Some((w, h, brightness)) =>
              MediaFeatures(r.doc_id, r.modality, r.payload.length.toLong,
                w, h, w.toLong * h.toLong, hash, brightness)
            case None =>
              MediaFeatures(r.doc_id, r.modality, r.payload.length.toLong,
                r.width, r.height, r.width.toLong * r.height.toLong,
                hash, decodeStub(r.payload))
          }
        }
      }
    }
  }
}
