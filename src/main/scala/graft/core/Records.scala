package graft.core

import org.apache.spark.sql.types._

/** Typed record shapes of SURVEY.md §1.2 — the closed-schema `Dataset[T]`
  * surface for pipelines that want compile-time columns (the open-schema
  * `DataFrame` path remains primary, matching the reference's dynamic
  * records). [[graft.sources.Warc.WarcDoc]] is the text record
  * (loaders/commoncrawl_loader.py:135-143); these cover the HF image
  * record and the rejection envelope.
  */
object Records {

  /** HF-style image payload: `image.bytes` (image_metadata.py:38-41). */
  final case class ImagePayload(bytes: Array[Byte])

  /** Image record with optional pre-computed phash
    * (image_phash_dedup.py:47-51) and id fallback
    * (framework/operator.py:284-306).
    */
  final case class ImageRecord(id: String, image: ImagePayload, phash: Option[String])

  /** The `_rejection_details` envelope (framework/operator.py:259-262). */
  final case class RejectionDetails(
      reason: String, operator: String,
      dedup_key: Option[String], representative_id: Option[String])

  val imageRecordSchema: StructType = StructType(Seq(
    StructField("id", StringType, nullable = true),
    StructField("image", StructType(Seq(
      StructField("bytes", BinaryType, nullable = true))), nullable = true),
    StructField("phash", StringType, nullable = true)))

  val rejectionDetailsSchema: StructType = StructType(Seq(
    StructField("reason", StringType, nullable = false),
    StructField("operator", StringType, nullable = false),
    StructField("dedup_key", StringType, nullable = true),
    StructField("representative_id", StringType, nullable = true)))
}
