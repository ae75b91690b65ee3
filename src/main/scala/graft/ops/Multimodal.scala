package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.Tables

/** Multimodal-column plumbing: media payloads ride through the engine as
  * opaque `binary` columns with typed metadata alongside, and per-batch
  * decode / feature-extraction runs inside `mapPartitions` over a typed
  * Dataset — the Scala analogue of `mapInPandas` (partition-at-a-time
  * batches, decoder state initialized once per partition, never per row).
  *
  * The actual image/audio decode is STUBBED (no media libraries in this
  * environment): [[StubDecoder]] derives deterministic fake features from
  * the payload bytes. The Spark-side contract — schema, binary transport,
  * partition batching, once-per-partition decoder init — is real and
  * tested; swapping `StubDecoder` for a JNI/FFI decoder changes no plan
  * shape.
  */
object Multimodal {

  /** A media row as it would land from ingestion: payload + metadata. */
  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])

  /** Features produced by the (stubbed) per-partition decoder. */
  case class MediaFeatures(media_id: Long, kind: String, byte_len: Long,
      checksum: String, n_frames: Int, width: Int, height: Int)

  /** Deterministic stand-in for a real media decoder. One instance per
    * partition (constructed inside mapPartitions), mirroring how a real
    * decoder would hold codec state/buffers across a batch.
    */
  final class StubDecoder {
    private val digest = java.security.MessageDigest.getInstance("MD5")
    def decode(row: MediaRow): MediaFeatures = {
      digest.reset()
      val h = digest.digest(row.payload).map("%02x".format(_)).mkString
      val len = row.payload.length.toLong
      MediaFeatures(row.media_id, row.kind, len, h,
        n_frames = (len % 7 + 1).toInt,
        width = (len % 640 + 1).toInt,
        height = (len % 480 + 1).toInt)
    }
  }

  /** The mapInPandas-equivalent: partition-at-a-time decode with
    * once-per-partition decoder construction. Narrow (no shuffle); scales
    * with input splits.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val decoder = new StubDecoder
      rows.map(decoder.decode)
    }
  }

  /** Documents recast as a media table: text bytes as the opaque payload.
    * (Stand-in ingestion — the driver testdata has no binary table.)
    */
  def mediaFromDocuments(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select(col("doc_id").as("media_id"),
        when(col("doc_id") % 2 === 0, "image").otherwise("audio").as("kind"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRow]
  }

  /** Oracle-checkable slice of the multimodal path: the metadata/features
    * that are pure functions of the payload bytes. Expressed relationally
    * here (codegen'd, no mapPartitions) so DuckDB can replay it; the
    * Dataset pipeline above computes the same values via the decoder stub
    * (asserted equal in MultimodalSpec).
    */
  def multimodalMeta(spark: SparkSession, sfDir: String): DataFrame = {
    val len = octet_length(col("text")).cast("long")
    Tables.documents(spark, sfDir).select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 2 === 0, "image").otherwise("audio").as("kind"),
      len.as("byte_len"),
      md5(col("text")).as("checksum"),
      (len % 7 + 1).cast("int").as("n_frames"),
      (len % 640 + 1).cast("int").as("width"),
      (len % 480 + 1).cast("int").as("height"))
  }

  val multimodalMetaSql: String =
    """SELECT doc_id AS media_id,
      |       CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS kind,
      |       CAST(strlen(text) AS BIGINT) AS byte_len,
      |       md5(text) AS checksum,
      |       CAST(strlen(text) % 7 + 1 AS INTEGER) AS n_frames,
      |       CAST(strlen(text) % 640 + 1 AS INTEGER) AS width,
      |       CAST(strlen(text) % 480 + 1 AS INTEGER) AS height
      |FROM documents""".stripMargin
}
