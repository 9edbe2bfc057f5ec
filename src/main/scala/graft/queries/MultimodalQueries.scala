package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.multimodal.Multimodal

/** Multimodal pipeline driver query: binary ingest -> per-media feature
  * extraction (mapPartitions batches) -> corpus aggregation. The payload
  * is deterministic (UTF-8 text bytes, ASCII-only corpus), so the byte
  * histogram is oracle-checkable as a character-frequency count in SQL —
  * the decode stubs themselves are covered by MultimodalSpec. */
object MultimodalQueries extends QueryPack {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_media_byte_hist" -> ((s, dir) =>
      Multimodal.corpusByteHistogram(
        Multimodal.byteHistogram(
          Multimodal.fromDocuments(tbl(s, dir, "documents")))))
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
        |FROM c GROUP BY byte_val ORDER BY byte_val""".stripMargin
  )
}
