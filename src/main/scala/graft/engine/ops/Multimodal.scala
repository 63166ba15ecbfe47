package graft.engine.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
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
    * 8 deterministic pseudo-features derived from the payload length —
    * engine-neutral integer arithmetic, so the WHOLE pipeline (not just
    * its metadata slice) is DuckDB-oracled; a real kernel changes only
    * this expression. */
  private def decodeFeaturesStub(payload: org.apache.spark.sql.Column) =
    array((0 until 8).map { i =>
      val x = octet_length(payload).cast("long") * lit(31L + 2L * i) + lit((i + 1) * 12345L)
      pmod(x, lit(1000L)).cast("double") / 500.0 - 1.0
    }: _*)

  /** Full multimodal pipeline shape — load binary, decode to features,
    * "resize" (metadata transform), aggregate per origin. Oracled: the
    * stub kernel is engine-neutral, and the feature sum goes through the
    * exact-decimal convention (features have 3-decimal granularity). */
  private val qMultimodalPipeline: Q = (s, d) =>
    assets(s, d)
      .withColumn("features", decodeFeaturesStub(col("payload")))
      .withColumn("thumb_width", (col("meta.width") / 4).cast("long"))
      .groupBy(col("meta.origin").as("origin"))
      .agg(count(lit(1)).as("n_assets"),
           sum(octet_length(col("payload"))).cast("long").as("total_bytes"),
           sum(element_at(col("features"), 1).cast("decimal(18,6)"))
             .cast("decimal(38,6)").cast("double").as("sum_f0"),
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

  // ------------------------------------------------ mapPartitions kernel
  /** Typed asset row for the partition-level decode path. */
  final case class Asset(asset_id: Long, payload: Array[Byte], width: Long, height: Long)
  /** Decoded output row: features + derived thumbnail dims. */
  final case class Decoded(asset_id: Long, features: Array[Double],
                           thumb_w: Long, thumb_h: Long, n_bytes: Long)

  /** Per-partition batch decode — the shape a native codec kernel (JNI /
    * off-heap, or a Python worker via mapInPandas on the PySpark surface)
    * plugs into: one iterator per partition, payloads processed in
    * BatchSize groups so a real kernel amortizes per-call setup across a
    * batch, nothing ever collected to the driver.
    *
    * The kernel itself is a clearly-marked DETERMINISTIC STUB (this
    * container ships no image/audio codecs): 8 pseudo-features from a
    * rolling polynomial over the payload bytes. Swapping in a real decoder
    * changes only the body of `decodeBatch`. */
  private val BatchSize = 64
  private def decodeBatch(batch: Seq[Asset]): Seq[Decoded] =
    // STUB: real impl would hand `batch.map(_.payload)` to a codec here.
    // The fake features use engine-neutral integer arithmetic over the
    // payload length + id, so the mapPartitions path itself is oracled.
    batch.map { a =>
      val n = a.payload.length.toLong
      val feats = Array.tabulate(8) { i =>
        ((n * (31L + 2L * i) + a.asset_id * (17L + i)) % 1000L).toDouble / 500.0 - 1.0
      }
      Decoded(a.asset_id, feats, a.width / 4, a.height / 4, n)
    }

  /** The typed decode pipeline as a Dataset transform (exposed for tests
    * and composition). */
  def decodeAssets(assets: Dataset[Asset]): Dataset[Decoded] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.grouped(BatchSize).flatMap(decodeBatch))
  }

  /** Full partition-parallel decode → feature aggregation per
    * thumbnail-width band. Oracled end-to-end (engine-neutral stub). */
  private val qMultimodalDecode: Q = (s, d) => {
    import s.implicits._
    val a = assets(s, d).select(
      col("asset_id"), col("payload"),
      col("meta.width").as("width"), col("meta.height").as("height")).as[Asset]
    decodeAssets(a)
      .groupBy((col("thumb_w") / 40).cast("long").as("w_band"))
      .agg(count(lit(1)).as("n_assets"),
           sum("n_bytes").as("total_bytes"),
           sum(element_at(col("features"), 1).cast("decimal(18,6)"))
             .cast("decimal(38,6)").cast("double").as("sum_f0"))
      .orderBy("w_band")
  }

  /** Frame sampling: treat each payload as a pseudo-video whose frame
    * count derives from the metadata, emit every `stride`-th frame index
    * with a per-frame pseudo-feature. Pure generator arithmetic
    * (`sequence` + `explode`) — the real decoder would replace the
    * feature column, not the row-generation shape, which is what must
    * scale (no driver loops, frames generated executor-side). */
  def frameSample(assets: DataFrame, stride: Int): DataFrame =
    assets
      .withColumn("n_frames", pmod(col("meta.width") * col("meta.height"), lit(240L)) + 1L)
      .select(col("asset_id"), col("n_frames"),
        explode(sequence(lit(0L), col("n_frames") - 1, lit(stride.toLong))).as("frame_no"))
      // STUB per-frame feature (real impl: decode frame `frame_no`)
      .withColumn("frame_sig", pmod(xxhash64(col("asset_id"), col("frame_no")), lit(1000L)))

  /** Oracle-checkable: frame sampling arithmetic (generator + stride). */
  private val qMultimodalFrames: Q = (s, d) =>
    frameSample(assets(s, d), stride = 10)
      .groupBy("asset_id")
      .agg(max("n_frames").as("n_frames"),
           count(lit(1)).as("n_sampled"),
           max("frame_no").as("last_frame"))
      .orderBy("asset_id")

  val queries: Map[String, Q] = Map(
    "q_multimodal_pipeline" -> qMultimodalPipeline,
    "q_multimodal_meta" -> qMultimodalMeta,
    "q_multimodal_decode" -> qMultimodalDecode,
    "q_multimodal_frames" -> qMultimodalFrames,
  )

  val oracle: Map[String, String] = Map(
    // f0 = ((n_bytes*31 + 12345) % 1000)/500 - 1: 3-decimal granularity, so
    // the exact-decimal sum convention applies cleanly
    "q_multimodal_pipeline" ->
      """SELECT source AS origin, count(*) AS n_assets,
        |  CAST(sum(octet_length(CAST(text AS BLOB))) AS BIGINT) AS total_bytes,
        |  CAST(CAST(sum(CAST(
        |    (octet_length(CAST(text AS BLOB)) * 31 + 12345) % 1000 / 500.0 - 1.0
        |  AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS sum_f0,
        |  CAST(max((n_chars % 640 + 1) // 4) AS BIGINT) AS max_thumb_w
        |FROM documents GROUP BY source ORDER BY origin""".stripMargin,

    "q_multimodal_decode" ->
      """SELECT CAST(((n_chars % 640 + 1) // 4) // 40 AS BIGINT) AS w_band,
        |  count(*) AS n_assets,
        |  CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
        |  CAST(CAST(sum(CAST(
        |    (n_bytes * 31 + doc_id * 17) % 1000 / 500.0 - 1.0
        |  AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS sum_f0
        |FROM (SELECT doc_id, n_chars, octet_length(CAST(text AS BLOB)) AS n_bytes
        |      FROM documents)
        |GROUP BY 1 ORDER BY w_band""".stripMargin,

    // frame count = (width*height) % 240 + 1 over the derived metadata;
    // sampled every 10th frame starting at 0
    "q_multimodal_frames" ->
      """SELECT asset_id, n_frames,
        |  CAST((n_frames + 9) // 10 AS BIGINT) AS n_sampled,
        |  CAST(((n_frames - 1) // 10) * 10 AS BIGINT) AS last_frame
        |FROM (
        |  SELECT doc_id AS asset_id,
        |    ((n_chars % 640 + 1) * ((n_chars * 7) % 480 + 1)) % 240 + 1 AS n_frames
        |  FROM documents)
        |ORDER BY asset_id""".stripMargin,

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
