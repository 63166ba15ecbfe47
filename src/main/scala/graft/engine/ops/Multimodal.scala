package graft.engine.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.io.Tables

/** Multimodal-column plumbing (north-star addition): treat image/audio/
  * video payloads as opaque BINARY columns + a typed metadata struct, and
  * run decode / feature-extract as distributed per-row transforms.
  *
  * The container has no image/audio codecs, so the decode kernel is a
  * clearly-marked DETERMINISTIC STUB (xxhash64-derived pseudo-features);
  * everything around it — binary column handling, metadata struct schema,
  * batch-friendly column pipeline, partition-parallel execution, the
  * aggregation over extracted features — is real Spark and is what would
  * carry a real JNI/codec kernel at 100 TB. The stub is a Column
  * expression (not a UDF), so even the fake path stays in codegen.
  */
object Multimodal {
  private type Q = (SparkSession, String) => DataFrame

  /** documents.text re-cast as an opaque binary payload + typed metadata,
    * standing in for (image bytes, exif-ish struct). */
  def assets(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id").as("asset_id"),
      col("text").cast("binary").as("payload"),
      struct(
        lit("image/fake").as("mime"),
        (pmod(col("n_chars"), lit(640L)) + 1L).as("width"),
        (pmod(col("n_chars") * 7L, lit(480L)) + 1L).as("height"),
        col("source").as("origin")).as("meta"))

  /** STUB decode: a real implementation would decode `payload` via a
    * native codec (mapPartitions + JNI / off-heap buffers). Here:
    * 8 deterministic pseudo-features derived from the bytes. */
  private def decodeFeaturesStub(payload: org.apache.spark.sql.Column) =
    array((0 until 8).map(i =>
      (pmod(xxhash64(payload, lit(i)), lit(1000L)).cast("double") / 500.0 - 1.0)): _*)

  /** Non-oracle (binary + stubbed decode): full multimodal pipeline shape
    * — load binary, decode to features, "resize" (metadata transform),
    * aggregate per origin. Rows-only check. */
  private val qMultimodalPipeline: Q = (s, d) =>
    assets(s, d)
      .withColumn("features", decodeFeaturesStub(col("payload")))
      .withColumn("thumb_width", (col("meta.width") / 4).cast("long"))
      .groupBy(col("meta.origin").as("origin"))
      .agg(count(lit(1)).as("n_assets"),
           sum(octet_length(col("payload"))).as("total_bytes"),
           round(avg(element_at(col("features"), 1)), 4).as("avg_f0"),
           max("thumb_width").as("max_thumb_w"))
      .orderBy("origin")

  /** Oracle-checkable slice of the same pipeline: binary length + metadata
    * arithmetic only (no stubbed kernel involved). */
  private val qMultimodalMeta: Q = (s, d) =>
    assets(s, d).select(
      col("asset_id"),
      octet_length(col("payload")).cast("long").as("n_bytes"),
      col("meta.mime").as("mime"),
      col("meta.width").as("width"),
      col("meta.height").as("height"),
      (col("meta.width") * col("meta.height")).as("pixels"))
      .orderBy("asset_id")

  val queries: Map[String, Q] = Map(
    "q_multimodal_pipeline" -> qMultimodalPipeline,
    "q_multimodal_meta" -> qMultimodalMeta,
  )

  val oracle: Map[String, String] = Map(
    "q_multimodal_meta" ->
      """SELECT doc_id AS asset_id,
        |  octet_length(CAST(text AS BLOB)) AS n_bytes,
        |  'image/fake' AS mime,
        |  n_chars % 640 + 1 AS width,
        |  (n_chars * 7) % 480 + 1 AS height,
        |  (n_chars % 640 + 1) * ((n_chars * 7) % 480 + 1) AS pixels
        |FROM documents ORDER BY asset_id""".stripMargin,
  )
}
