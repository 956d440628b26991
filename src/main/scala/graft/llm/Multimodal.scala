package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` payloads with typed metadata.
  *
  * The decode step is a clearly-marked deterministic STUB (image/audio codec
  * libraries are not available in this environment); everything around it —
  * schema, batching, partition-parallel execution via `mapPartitions`, typed
  * `Dataset` encoders — is the real Spark plumbing a decoder would plug
  * into. At scale the decode is a narrow per-partition pass: no shuffle, and
  * partition sizing is controlled by the upstream source split size.
  */
object Multimodal {

  /** An opaque media payload + metadata row. */
  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])

  /** Extracted features for one media row (stub-decoded). */
  final case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
                                 checksum: Long, width: Int, height: Int)

  /** Byte-level metadata over a binary column — pure SQL expressions
    * (codegen'd), no decode: (media_id, n_bytes, digest, head_hex). */
  def binaryMeta(media: DataFrame, idCol: String = "media_id",
                 payloadCol: String = "payload"): DataFrame =
    media.select(
      col(idCol),
      length(col(payloadCol)).as("n_bytes"),
      md5(col(payloadCol)).as("digest"),
      upper(hex(substring(col(payloadCol), 1, 8))).as("head_hex"))

  /** STUB decoder: deterministic fake "decode" standing in for an image
    * codec. Real implementation would parse the container header; the
    * Spark-side contract (per-partition iterator→iterator, no driver
    * collect) is what matters here. */
  private def stubDecode(r: MediaRow): MediaFeatures = {
    // ??? <- real codec call goes here; deterministic fake below
    val checksum = r.payload.foldLeft(1469598103934665603L)((h, b) => (h ^ b) * 1099511628211L)
    MediaFeatures(r.media_id, r.kind, r.payload.length, checksum,
      width = math.abs(checksum % 1920).toInt + 1,
      height = math.abs(checksum % 1080).toInt + 1)
  }

  /** Partition-parallel feature extraction over opaque payloads. */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(stubDecode))
  }

  /** Fixture adapter: treat document text bytes as an opaque payload so the
    * multimodal path is exercised on real testdata. */
  def documentsAsMedia(spark: SparkSession, documents: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    documents.select(
      col("doc_id").as("media_id"),
      lit("text").as("kind"),
      col("text").cast("binary").as("payload")).as[MediaRow]
  }
}
