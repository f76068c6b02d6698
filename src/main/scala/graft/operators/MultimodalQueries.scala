package graft.operators

import graft.multimodal.Multimodal

/** Multimodal-column operators (SURVEY.md north-star family). Image rows
  * carry REAL PNG bytes decoded with the JDK's javax.imageio (incl. a
  * real nearest-neighbor thumbnail resize feeding the feature); audio
  * rows carry REAL RIFF/WAVE PCM16 bytes decoded with javax.sound
  * (signed-sample reconstruction + temporal downsample). Both
  * derivations come from doc_id, so the oracle predicts the DECODED
  * values arithmetically while the engine earns them by actually
  * decoding the streams. Video rows stay behind the deterministic stub
  * the oracle mirrors byte-for-byte (no JDK video codec exists). Either
  * way the Spark-side pipeline (binary column, typed Encoders,
  * mapPartitions batching) is verified end-to-end.
  */
object MultimodalQueries {

  val all: Seq[CatalogQuery] = Seq(
    CatalogQuery(
      "q30_multimodal_features",
      (s, d) => Multimodal.featuresQuery(s, d),
      Some("""
        |WITH b AS (
        |  -- stub-arm arithmetic over UTF-8 BYTES (hex(encode(..)) pairs),
        |  -- not code points: the engine's payload IS the UTF-8 byte
        |  -- array, and ascii()/length() diverge from it on any multibyte
        |  -- text (found by the r11 unicode twin)
        |  SELECT doc_id,
        |    CASE (doc_id % 3) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |    CAST(nb AS BIGINT) AS byte_len,
        |    CAST(CASE WHEN nb >= 1
        |      THEN CAST('0x' || substr(hx, 1, 2) AS INT) ELSE 0 END
        |      AS BIGINT) AS first,
        |    CAST(CASE WHEN nb >= 2
        |      THEN CAST('0x' || substr(hx, 3, 2) AS INT) ELSE 0 END
        |      AS BIGINT) AS second,
        |    CAST(coalesce(list_sum(list_transform(range(0, nb),
        |                           i -> CAST('0x' || substr(hx, i * 2 + 1, 2) AS INT))), 0)
        |      AS BIGINT) AS byte_sum
        |  FROM (SELECT doc_id, hex(encode(coalesce(text, ''))) AS hx,
        |               octet_length(encode(coalesce(text, ''))) AS nb
        |        FROM documents)),
        |img AS (
        |  -- the PNG fixture's derivation: w/h/fill are doc_id arithmetic,
        |  -- so the DECODED pixel statistics are predictable here while
        |  -- the engine recovers them from a genuine PNG round-trip
        |  SELECT doc_id,
        |    16 + doc_id % 40 AS w, 16 + (doc_id // 7) % 40 AS h,
        |    (doc_id % 251) + (doc_id % 241) + (doc_id % 239) AS fill
        |  FROM documents WHERE doc_id % 3 = 0),
        |aud AS (
        |  -- the WAV fixture's derivation: sample rate / length / sample
        |  -- values are doc_id arithmetic; the engine recovers them by
        |  -- decoding a genuine RIFF/WAVE PCM16 stream (sample i =
        |  -- base + i % 16, so sums are closed-form here)
        |  SELECT doc_id,
        |    8000 + (doc_id % 8) * 1000 AS sr,
        |    64 + doc_id % 64 AS n,
        |    doc_id % 31 AS base
        |  FROM documents WHERE doc_id % 3 = 1)
        |SELECT b.doc_id, kind,
        |  CASE kind WHEN 'image' THEN w WHEN 'audio' THEN sr
        |    ELSE 16 + first % 64 END AS width,
        |  CASE kind WHEN 'image' THEN h WHEN 'audio' THEN n
        |    ELSE 16 + second % 64 END AS height,
        |  CASE kind WHEN 'image' THEN least(w, 32) WHEN 'audio' THEN 1
        |    ELSE least(16 + first % 64, 32) END AS resized_w,
        |  CASE kind WHEN 'image' THEN least(h, 32)
        |    WHEN 'audio' THEN least(n, 32)
        |    ELSE least(16 + second % 64, 32) END AS resized_h,
        |  CAST(CASE kind WHEN 'image' THEN w * h * 3 WHEN 'audio' THEN n * 2
        |    ELSE byte_len END AS BIGINT) AS byte_len,
        |  CAST(CASE kind WHEN 'image' THEN w * h * fill
        |    WHEN 'audio' THEN n * base +
        |      list_sum(list_transform(range(0, n), i -> i % 16))
        |    ELSE byte_sum END AS BIGINT) AS byte_sum,
        |  -- image feature = RESIZED-raster channel sum (nearest-neighbor
        |  -- thumbnail; solid fill resamples to rw*rh*fill); audio
        |  -- feature = temporally DOWNSAMPLED sample sum (32 nearest-
        |  -- neighbor picks at j*n/32)
        |  CAST(CASE kind WHEN 'image'
        |       THEN (least(w, 32) * least(h, 32) * fill) % 997
        |    WHEN 'audio' THEN (32 * base +
        |      list_sum(list_transform(range(0, 32), j -> ((j * n) // 32) % 16)))
        |      % 997
        |    ELSE byte_sum % 997 END AS BIGINT) AS feature
        |FROM b LEFT JOIN img ON b.doc_id = img.doc_id
        |LEFT JOIN aud ON b.doc_id = aud.doc_id
        |ORDER BY b.doc_id
        |""".stripMargin)),

    // Frame sampling: payload sliced into 64-byte frames, every 4th kept,
    // per-frame feature emitted. Row-local fan-out (no shuffle); runs over
    // VIDEO rows only (images/audio are real PNG/WAV streams handled by
    // the q30 codecs, not frame-addressable byte windows); decode is the
    // same stubbed byte arithmetic the oracle mirrors.
    CatalogQuery(
      "q47_multimodal_frames",
      (s, d) => Multimodal.framesQuery(s, d),
      Some("""
        |WITH f AS (
        |  -- frames slice UTF-8 BYTES (the engine's payload), so length
        |  -- and per-frame sums go through hex(encode(..)) byte pairs,
        |  -- not code-point string ops (r11 unicode twin)
        |  SELECT doc_id, 'video' AS kind,
        |    octet_length(encode(txt)) AS len, hex(encode(txt)) AS hx,
        |    unnest(range(0, CAST(ceil(octet_length(encode(txt)) / 64.0) AS BIGINT))) AS frame_id
        |  FROM (SELECT doc_id, coalesce(text, '') AS txt FROM documents
        |        WHERE doc_id % 3 = 2)),
        |sampled AS (
        |  SELECT doc_id, kind, frame_id,
        |    least(64, len - frame_id * 64) AS frame_len,
        |    CAST(list_sum(list_transform(range(0, least(64, len - frame_id * 64)),
        |                                 i -> CAST('0x' || substr(hx, (frame_id * 64 + i) * 2 + 1, 2) AS INT))) AS BIGINT) AS frame_sum
        |  FROM f WHERE frame_id % 4 = 0)
        |SELECT doc_id, kind, CAST(frame_id AS BIGINT) AS frame_id,
        |  CAST(frame_len AS BIGINT) AS frame_len, frame_sum,
        |  frame_sum % 997 AS feature
        |FROM sampled ORDER BY doc_id, frame_id
        |""".stripMargin))
  )
}
