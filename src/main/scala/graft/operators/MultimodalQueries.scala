package graft.operators

import graft.multimodal.Multimodal

/** Multimodal-column operators (SURVEY.md north-star family). The decode
  * step is a deterministic stub (no codecs in this container) — the oracle
  * mirrors its arithmetic over the same bytes, so the whole Spark-side
  * pipeline (binary column, typed Encoders, mapPartitions batching) is
  * verified end-to-end.
  */
object MultimodalQueries {

  val all: Seq[CatalogQuery] = Seq(
    CatalogQuery(
      "q30_multimodal_features",
      (s, d) => Multimodal.featuresQuery(s, d),
      Some("""
        |WITH b AS (
        |  SELECT doc_id,
        |    CASE (doc_id % 3) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |    CAST(length(text) AS BIGINT) AS byte_len,
        |    CAST(ascii(substr(text, 1, 1)) AS BIGINT) AS first,
        |    CAST(ascii(substr(text, 2, 1)) AS BIGINT) AS second,
        |    CAST(list_sum(list_transform(range(1, length(text) + 1),
        |                                 i -> ascii(substr(text, i, 1)))) AS BIGINT) AS byte_sum
        |  FROM documents)
        |SELECT doc_id, kind,
        |  16 + first % 64 AS width,
        |  16 + second % 64 AS height,
        |  least(16 + first % 64, 32) AS resized_w,
        |  least(16 + second % 64, 32) AS resized_h,
        |  byte_len, byte_sum, byte_sum % 997 AS feature
        |FROM b ORDER BY doc_id
        |""".stripMargin))
  )
}
