package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/** Multimodal pipeline driver queries: binary ingest -> per-media
  * transforms (mapPartitions batches) -> corpus aggregation. Payloads
  * are deterministic (UTF-8 text bytes, ASCII-only corpus), so every
  * downstream number — byte histograms, frame-slice lengths, stub
  * decode/resize dimensions — is recomputable in SQL from the source
  * text alone; the oracle checks the full Spark-side plumbing (Dataset
  * encoders, mapPartitions batching, array-of-binary schemas) against
  * DuckDB's independent arithmetic. The decode stubs themselves are
  * additionally covered by MultimodalSpec. */
object MultimodalQueries extends QueryPack {

  /** Frames per media in `q_media_frame_stats`. */
  val NumFrames = 4
  /** Resize target for `q_media_decode_stats`. */
  val ResizeMaxDim = 32

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_media_byte_hist" -> ((s, dir) =>
      Multimodal.corpusByteHistogram(
        Multimodal.byteHistogram(
          Multimodal.fromDocuments(tbl(s, dir, "documents"))))),

    // Frame sampling: n evenly-sized payload slices per media — the
    // video/audio shard-prep shape ("shuffle features, not bytes": only
    // per-kind aggregates leave the executors). Slice lengths differ by
    // at most 1 (integer division); the oracle re-derives every frame
    // length from the text length.
    "q_media_frame_stats" -> ((s, dir) => {
      val fs = Multimodal.frameSample(
        Multimodal.fromDocuments(tbl(s, dir, "documents")), NumFrames)
      fs.select(col("media_id"),
          concat(lit(""),
            when(pmod(col("media_id"), lit(3)) === 0, "image")
              .when(pmod(col("media_id"), lit(3)) === 1, "audio")
              .otherwise("video")).as("kind"),
          col("n_frames"),
          transform(col("frames"), f => length(f)).as("flens"))
        .select(col("kind"), col("n_frames"),
          aggregate(col("flens"), lit(0L), (a, x) => a + x).as("total_bytes"),
          (array_max(col("flens")) - array_min(col("flens"))).as("skew"))
        .groupBy("kind")
        .agg(count(lit(1)).as("n_media"),
          sum("total_bytes").as("total_frame_bytes"),
          max("n_frames").as("frames_per_media"),
          sum(when(col("skew") > 0, 1L).otherwise(0L)).as("n_uneven"))
        .orderBy("kind")
    }),

    // Stub decode + resize over the image rows: dims and subsampled
    // pixel counts are pure integer arithmetic on payload length, so
    // DuckDB recomputes the whole decode/resize chain per image.
    "q_media_decode_stats" -> ((s, dir) => {
      val imgs = Multimodal.resizeStub(
        Multimodal.decodeImage(
          Multimodal.fromDocuments(tbl(s, dir, "documents"))), ResizeMaxDim)
      imgs.select(col("media_id"), col("width"), col("height"),
          length(col("pixels")).as("n_pix"))
        .agg(count(lit(1)).as("n_images"),
          sum("width").as("sum_w"), sum("height").as("sum_h"),
          sum("n_pix").as("sum_pix"))
    })
  )

  override def oracleSql: Map[String, String] = Map(
    // ASCII corpus: UTF-8 byte value == codepoint, so the media-payload
    // byte histogram equals per-character counts over the source text.
    "q_media_byte_hist" ->
      """WITH c AS (
        |  SELECT unnest(list_transform(range(1, length(text) + 1),
        |                i -> unicode(text[i:i]))) AS byte_val
        |  FROM documents
        |)
        |SELECT byte_val, count(*) AS n
        |FROM c GROUP BY byte_val ORDER BY byte_val""".stripMargin,

    "q_media_frame_stats" ->
      s"""WITH m AS (
         |  SELECT doc_id, length(text)::BIGINT AS len,
         |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
         |         ELSE 'video' END AS kind,
         |    list_transform(range($NumFrames), i ->
         |      ((i + 1) * length(text)::BIGINT) // $NumFrames
         |        - (i * length(text)::BIGINT) // $NumFrames) AS flens
         |  FROM documents
         |)
         |SELECT kind, count(*) AS n_media,
         |  sum(len)::BIGINT AS total_frame_bytes,
         |  max($NumFrames) AS frames_per_media,
         |  sum(CASE WHEN list_max(flens) - list_min(flens) > 0
         |           THEN 1 ELSE 0 END)::BIGINT AS n_uneven
         |FROM m GROUP BY kind ORDER BY kind""".stripMargin,

    "q_media_decode_stats" ->
      s"""WITH img AS (
         |  SELECT length(text)::BIGINT AS len,
         |    16 + length(text)::BIGINT % 64 AS w,
         |    16 + length(text)::BIGINT % 48 AS h
         |  FROM documents WHERE doc_id % 3 = 0
         |),
         |r AS (
         |  SELECT len, w, h,
         |    greatest(1, greatest(w, h) // $ResizeMaxDim) AS scale
         |  FROM img
         |)
         |SELECT count(*) AS n_images,
         |  sum(w // scale)::BIGINT AS sum_w,
         |  sum(h // scale)::BIGINT AS sum_h,
         |  sum(CASE WHEN least(64, len) = 0 THEN 0
         |           ELSE (least(64, len) - 1) // scale + 1 END)::BIGINT
         |    AS sum_pix
         |FROM r""".stripMargin
  )
}
