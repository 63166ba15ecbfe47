package graft.engine.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.functions.{GimgDecode, GraftFunctions}
import graft.engine.io.Tables

/** Multimodal-column plumbing (north-star addition): treat image/audio/
  * video payloads as opaque BINARY columns + a typed metadata struct, and
  * run decode / feature-extract as distributed per-row transforms.
  *
  * Since r8 the decode kernel is a REAL byte parser, not a stub: assets
  * carry a GIMG-framed payload (magic + big-endian dims + channel byte +
  * row-major pixel bytes — the role an uncompressed BMP/PGM would play,
  * since the container ships no codec libraries) and [[GimgDecode]]
  * validates the frame and computes content statistics over the pixel
  * bytes in one native codegen'd pass. Malformed payloads decode to NULL
  * (quarantine-not-crash). Because the encoder derives pixels from the
  * fixture text deterministically, the ENTIRE decode path — header
  * arithmetic, truncation bound, pixel sum/min/max and the rolling
  * poly-hash — replays in DuckDB SQL: q_multimodal_pipeline and
  * q_multimodal_decode are hash-oracled end-to-end with no stubbed
  * feature anywhere.
  */
object Multimodal {
  private type Q = (SparkSession, String) => DataFrame

  /** Big-endian uint16 as 2 binary bytes (values < 65536). */
  private def be16(c: Column): Column = unhex(lpad(hex(c), 4, "0"))

  /** documents.text re-framed as a GIMG binary payload + typed metadata,
    * standing in for (image bytes, exif-ish struct). Pixel data = the
    * UTF-8 text bytes, truncated to the frame's width*height capacity
    * (the decoder's legal-truncation bound). */
  def assets(s: SparkSession, d: String): DataFrame = {
    val textBin = col("text").cast("binary")
    val w = pmod(col("n_chars"), lit(640L)) + 1L
    val h = pmod(col("n_chars") * 7L, lit(480L)) + 1L
    val px = textBin.substr(lit(1), least(octet_length(textBin).cast("long"), w * h).cast("int"))
    Tables.documents(s, d).select(
      col("doc_id").as("asset_id"),
      concat(
        lit(Array[Byte](0x47, 0x49, 0x4D, 0x47)), // "GIMG"
        be16(w), be16(h),
        lit(Array[Byte](1)),
        px).as("payload"),
      struct(
        lit("image/gimg").as("mime"),
        w.as("width"),
        h.as("height"),
        col("source").as("origin")).as("meta"))
  }

  /** Full multimodal pipeline — load binary, DECODE (real byte parse),
    * "resize" (metadata transform), aggregate per origin. The decoded
    * array is `[width, height, n_px, px_sum, px_min, px_max, px_hash]`;
    * n_bad counts quarantined (malformed → null) payloads, pinned 0 on
    * the fixture by the oracle. All-integer stats, hash-oracled. */
  private val qMultimodalPipeline: Q = (s, d) => {
    GraftFunctions.register(s)
    assets(s, d)
      .withColumn("f", call_function("gimg_decode", col("payload")))
      .withColumn("thumb_width", (col("meta.width") / 4).cast("long"))
      .groupBy(col("meta.origin").as("origin"))
      .agg(count(lit(1)).as("n_assets"),
           sum(octet_length(col("payload"))).cast("long").as("total_bytes"),
           count(when(col("f").isNull, lit(1))).as("n_bad"),
           sum(element_at(col("f"), 4)).cast("long").as("sum_px"),
           min(element_at(col("f"), 5)).as("min_px"),
           max(element_at(col("f"), 6)).as("max_px"),
           sum(element_at(col("f"), 7)).cast("long").as("sum_hash"),
           max("thumb_width").as("max_thumb_w"))
      .orderBy("origin")
  }

  /** Oracle-checkable slice of the same pipeline: frame size + metadata
    * arithmetic only (no pixel scan). */
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
  /** Decoded output row: pixel statistics + derived thumbnail dims. */
  final case class Decoded(asset_id: Long, px_sum: Long, px_min: Long, px_max: Long,
                           px_hash: Long, thumb_w: Long, thumb_h: Long, n_bytes: Long)

  /** Per-partition batch decode — the shape a heavier codec kernel (JNI /
    * off-heap, or a Python worker via mapInPandas on the PySpark surface)
    * plugs into: one iterator per partition, payloads processed in
    * BatchSize groups so per-call setup amortizes, nothing collected to
    * the driver. The kernel is the SAME real byte parser the native
    * expression uses ([[GimgDecode.decode]]); malformed payloads are
    * quarantined (dropped) rather than failing the partition. */
  private val BatchSize = 64
  private def decodeBatch(batch: Seq[Asset]): Seq[Decoded] =
    batch.flatMap { a =>
      Option(GimgDecode.decode(a.payload)).map { f =>
        Decoded(a.asset_id, px_sum = f(3), px_min = f(4), px_max = f(5),
          px_hash = f(6), thumb_w = a.width / 4, thumb_h = a.height / 4,
          n_bytes = a.payload.length.toLong)
      }
    }

  /** The typed decode pipeline as a Dataset transform (exposed for tests
    * and composition). */
  def decodeAssets(assets: Dataset[Asset]): Dataset[Decoded] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.grouped(BatchSize).flatMap(decodeBatch))
  }

  /** Full partition-parallel decode → pixel-stat aggregation per
    * thumbnail-width band. Hash-oracled end-to-end (the decoder's
    * output is a pure function of the text bytes and frame dims). */
  private val qMultimodalDecode: Q = (s, d) => {
    import s.implicits._
    val a = assets(s, d).select(
      col("asset_id"), col("payload"),
      col("meta.width").as("width"), col("meta.height").as("height")).as[Asset]
    decodeAssets(a)
      .groupBy((col("thumb_w") / 40).cast("long").as("w_band"))
      .agg(count(lit(1)).as("n_assets"),
           sum("n_bytes").cast("long").as("total_bytes"),
           sum("px_sum").cast("long").as("sum_px"),
           min("px_min").as("min_px"),
           max("px_max").as("max_px"),
           sum("px_hash").cast("long").as("sum_hash"))
      .orderBy("w_band")
  }

  /** Byte-content dedup over DECODED assets — the multimodal analogue of
    * `q_dedup_exact`: two assets are duplicates when their decoded
    * content fingerprints agree (frame dims, pixel count, pixel sum and
    * the rolling pixel poly-hash), regardless of which row/origin they
    * arrived under — the same-image-crawled-twice case container-level
    * byte equality also catches, PLUS re-encodes that preserve pixels
    * under different wrapper metadata. The fixture itself has no
    * duplicate assets, so the binding ingests a deterministic re-crawl
    * slice (every 10th asset again under a shifted id) — the collapse
    * branch fires on real groups, not vacuously (the r9 audit rule).
    *
    * Scale shape: decode is the same narrow per-row native pass every
    * other multimodal query uses; the dedup is one fingerprint-keyed
    * partial+final aggregate — no pairwise comparison anywhere. */
  private val qMultimodalDedup: Q = (s, d) => {
    GraftFunctions.register(s)
    val base = assets(s, d)
    val again = base.filter(col("asset_id") % 10 === 0)
      .withColumn("asset_id", col("asset_id") + lit(1000000L))
    base.unionByName(again)
      .withColumn("f", call_function("gimg_decode", col("payload")))
      .select(col("asset_id"),
        element_at(col("f"), 1).as("w"),
        element_at(col("f"), 2).as("h"),
        element_at(col("f"), 3).as("n_px"),
        element_at(col("f"), 4).as("px_sum"),
        element_at(col("f"), 7).as("px_hash"))
      .groupBy("w", "h", "n_px", "px_sum", "px_hash")
      .agg(min("asset_id").as("canonical_id"), count(lit(1)).as("n_copies"))
      .select("canonical_id", "n_copies", "px_hash")
      .orderBy("canonical_id")
  }

  /** Frame sampling: treat each payload as a pseudo-video whose frame
    * count derives from the metadata, emit every `stride`-th frame index
    * with a per-frame signature. Pure generator arithmetic (`sequence` +
    * `explode`) — a video decoder would replace the signature column,
    * not the row-generation shape, which is what must scale (no driver
    * loops, frames generated executor-side). */
  def frameSample(assets: DataFrame, stride: Int): DataFrame =
    assets
      .withColumn("n_frames", pmod(col("meta.width") * col("meta.height"), lit(240L)) + 1L)
      .select(col("asset_id"), col("n_frames"),
        explode(sequence(lit(0L), col("n_frames") - 1, lit(stride.toLong))).as("frame_no"))
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
    "q_multimodal_dedup" -> qMultimodalDedup,
  )

  // The decode replay: the corpus is ASCII (fixture contract, so UTF-8
  // byte i == unicode(char i)), pixels = the first least(len, w*h) text
  // bytes, and every statistic is an integer fold < 2^63 — the
  // poly_hash31 oracle discipline applied to image bytes.
  private val decodeCte =
    """WITH px AS (
      |  SELECT doc_id, source, n_chars,
      |    n_chars % 640 + 1 AS w,
      |    (n_chars * 7) % 480 + 1 AS h,
      |    [unicode(c) FOR c IN string_split(text, '')] AS codes
      |  FROM documents),
      |d AS (
      |  SELECT doc_id, source,
      |    w, h,
      |    9 + least(len(codes), w * h) AS n_bytes,
      |    codes[1:CAST(least(len(codes), w * h) AS BIGINT)] AS pxs
      |  FROM px),
      |stats AS (
      |  SELECT doc_id, source, w, h, n_bytes,
      |    CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), pxs), (s, c) -> s + c) AS BIGINT) AS px_sum,
      |    CAST(list_min(pxs) AS BIGINT) AS px_min,
      |    CAST(list_max(pxs) AS BIGINT) AS px_max,
      |    CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), pxs),
      |      (s, c) -> (s * 31 + c) % 2147483647) AS BIGINT) AS px_hash
      |  FROM d)
      |""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_multimodal_pipeline" -> (decodeCte +
      """SELECT source AS origin, count(*) AS n_assets,
        |  CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
        |  CAST(0 AS BIGINT) AS n_bad,
        |  CAST(sum(px_sum) AS BIGINT) AS sum_px,
        |  CAST(min(px_min) AS BIGINT) AS min_px,
        |  CAST(max(px_max) AS BIGINT) AS max_px,
        |  CAST(sum(px_hash) AS BIGINT) AS sum_hash,
        |  CAST(max(w // 4) AS BIGINT) AS max_thumb_w
        |FROM stats GROUP BY source ORDER BY origin""".stripMargin),

    "q_multimodal_decode" -> (decodeCte +
      """SELECT CAST((w // 4) // 40 AS BIGINT) AS w_band,
        |  count(*) AS n_assets,
        |  CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
        |  CAST(sum(px_sum) AS BIGINT) AS sum_px,
        |  CAST(min(px_min) AS BIGINT) AS min_px,
        |  CAST(max(px_max) AS BIGINT) AS max_px,
        |  CAST(sum(px_hash) AS BIGINT) AS sum_hash
        |FROM stats GROUP BY 1 ORDER BY w_band""".stripMargin),

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

    // re-ingest union (every 10th asset under a shifted id) → group by
    // the decoded content fingerprint; n_px replays as n_bytes - 9 (the
    // GIMG header)
    "q_multimodal_dedup" -> (decodeCte +
      """, all_assets AS (
        |  SELECT doc_id AS asset_id, w, h, n_bytes - 9 AS n_px, px_sum, px_hash FROM stats
        |  UNION ALL
        |  SELECT doc_id + 1000000, w, h, n_bytes - 9, px_sum, px_hash
        |  FROM stats WHERE doc_id % 10 = 0)
        |SELECT CAST(min(asset_id) AS BIGINT) AS canonical_id,
        |  count(*) AS n_copies,
        |  CAST(px_hash AS BIGINT) AS px_hash
        |FROM all_assets
        |GROUP BY w, h, n_px, px_sum, px_hash
        |ORDER BY canonical_id""".stripMargin),

    "q_multimodal_meta" ->
      """SELECT doc_id AS asset_id,
        |  CAST(9 + least(octet_length(CAST(text AS BLOB)),
        |                 (n_chars % 640 + 1) * ((n_chars * 7) % 480 + 1)) AS BIGINT) AS n_bytes,
        |  'image/gimg' AS mime,
        |  n_chars % 640 + 1 AS width,
        |  (n_chars * 7) % 480 + 1 AS height,
        |  (n_chars % 640 + 1) * ((n_chars * 7) % 480 + 1) AS pixels
        |FROM documents ORDER BY asset_id""".stripMargin,
  )
}
