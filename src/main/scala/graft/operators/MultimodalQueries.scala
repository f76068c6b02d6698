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
        |    CAST(length(txt) AS BIGINT) AS byte_len,
        |    CAST(ascii(substr(txt, 1, 1)) AS BIGINT) AS first,
        |    CAST(ascii(substr(txt, 2, 1)) AS BIGINT) AS second,
        |    CAST(coalesce(list_sum(list_transform(range(1, length(txt) + 1),
        |                           i -> ascii(substr(txt, i, 1)))), 0)
        |      AS BIGINT) AS byte_sum
        |  FROM (SELECT doc_id, coalesce(text, '') AS txt FROM documents))
        |SELECT doc_id, kind,
        |  16 + first % 64 AS width,
        |  16 + second % 64 AS height,
        |  least(16 + first % 64, 32) AS resized_w,
        |  least(16 + second % 64, 32) AS resized_h,
        |  byte_len, byte_sum, byte_sum % 997 AS feature
        |FROM b ORDER BY doc_id
        |""".stripMargin)),

    // Frame sampling: payload sliced into 64-byte frames, every 4th kept,
    // per-frame feature emitted. Row-local fan-out (no shuffle); decode is
    // the same stubbed byte arithmetic the oracle mirrors.
    CatalogQuery(
      "q47_multimodal_frames",
      (s, d) => Multimodal.framesQuery(s, d),
      Some("""
        |WITH f AS (
        |  SELECT doc_id,
        |    CASE (doc_id % 3) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |    length(txt) AS len, txt AS text,
        |    unnest(range(0, CAST(ceil(length(txt) / 64.0) AS BIGINT))) AS frame_id
        |  FROM (SELECT doc_id, coalesce(text, '') AS txt FROM documents)),
        |sampled AS (
        |  SELECT doc_id, kind, frame_id,
        |    least(64, len - frame_id * 64) AS frame_len,
        |    CAST(list_sum(list_transform(range(1, least(64, len - frame_id * 64) + 1),
        |                                 i -> ascii(substr(text, frame_id * 64 + i, 1)))) AS BIGINT) AS frame_sum
        |  FROM f WHERE frame_id % 4 = 0)
        |SELECT doc_id, kind, CAST(frame_id AS BIGINT) AS frame_id,
        |  CAST(frame_len AS BIGINT) AS frame_len, frame_sum,
        |  frame_sum % 997 AS feature
        |FROM sampled ORDER BY doc_id, frame_id
        |""".stripMargin))
  )
}
