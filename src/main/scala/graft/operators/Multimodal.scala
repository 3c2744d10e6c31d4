package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` + typed metadata.
  *
  * The decode step is STUBBED (no image/audio libs in this environment): a
  * real deployment replaces [[ImageDecode.decode]]'s body with an actual
  * codec call. Everything around it — the schema contract, the typed
  * Dataset batch shape, per-partition execution (one codec init per
  * partition, not per row), and the frame-sampling expressions — is real
  * and oracle/spec-tested. The stub derives pseudo-metadata
  * deterministically from md5(content) so results are reproducible and
  * DuckDB-verifiable.
  *
  * Scale notes: decode runs in `mapPartitions` so codec state is amortized
  * per partition and rows stream through without materializing the
  * partition; binary payloads stay columnar at rest (parquet binary) and
  * should be size-bucketed (`spark.sql.files.maxPartitionBytes`) so one
  * task never holds more than a few hundred MB of media.
  */
object Multimodal {

  final case class MediaRow(media_id: Long, kind: String, content: Array[Byte])
  final case class ImageMeta(media_id: Long, width: Int, height: Int,
                             channels: Int, brightness: Double)

  object ImageDecode {
    /** STUB decode: real impl would parse `content` with a codec. The fake
      * reads md5(content) bytes: width = 64 + (h[0] & 127),
      * height = 64 + (h[1] & 127), channels = 3,
      * brightness = (h[2] & 255) / 255.
      */
    def decode(m: MediaRow, md: MessageDigest): ImageMeta = {
      val h = md.digest(m.content)
      ImageMeta(m.media_id,
        64 + (h(0) & 0x7f),
        64 + (h(1) & 0x7f),
        3,
        (h(2) & 0xff) / 255.0)
    }
  }

  /** Per-partition decode: one MessageDigest ("codec") per partition. */
  def decodeImages(media: Dataset[MediaRow]): Dataset[ImageMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val md = MessageDigest.getInstance("MD5") // codec init, once/partition
      it.map(m => ImageDecode.decode(m, md))
    }
  }

  /** documents → media table (text bytes as payload), the test stand-in for
    * a real binary column.
    */
  def mediaFromDocuments(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      lit("image").as("kind"),
      encode(col("text"), "UTF-8").as("content"))
      .as[MediaRow]
  }

  /** Frame sampling for "video" media: pseudo frame count from the decoded
    * width (stand-in for container metadata), emit every `step`-th frame
    * index. Pure expressions — explode streams, no driver loop.
    */
  def sampleFrames(meta: DataFrame, step: Int): DataFrame =
    meta.select(col("media_id"),
      explode(sequence(lit(0), col("width") - 1, lit(step))).as("frame_idx"))

  /** Metadata-level resize: scale dims to fit `maxSide`, preserving aspect
    * ratio (integer floor), never upscaling.
    */
  def resizeMeta(meta: DataFrame, maxSide: Int): DataFrame = {
    val longest = greatest(col("width"), col("height"))
    val scale = when(longest > maxSide,
      lit(maxSide.toDouble) / longest.cast("double")).otherwise(1.0)
    meta
      .withColumn("out_width", floor(col("width") * scale).cast("int"))
      .withColumn("out_height", floor(col("height") * scale).cast("int"))
  }

  /** End-to-end: documents → media → stub-decode → features. */
  def imageFeatures(spark: SparkSession, docs: DataFrame): DataFrame =
    decodeImages(mediaFromDocuments(docs)).toDF()
      .withColumn("brightness", round(col("brightness"), 6))
}
