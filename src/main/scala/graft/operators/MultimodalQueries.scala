package graft.operators

import graft.multimodal.Multimodal

/** Multimodal-column operators (SURVEY.md north-star family). Every
  * modality now round-trips a REAL codec stream: image rows carry
  * genuine PNG bytes decoded with the JDK's javax.imageio (incl. a real
  * nearest-neighbor thumbnail resize feeding the feature); audio rows
  * genuine RIFF/WAVE PCM16 bytes decoded with javax.sound (signed-sample
  * reconstruction + temporal downsample); video rows genuine RIFF/AVI
  * containers demuxed by [[graft.multimodal.Avi]] (real chunk-tree walk,
  * strh/strf header parse, bottom-up stride-padded BGR raster
  * reconstruction per frame; MJPEG frames decode via javax.imageio on
  * the same path). All three derivations come from doc_id, so the
  * oracle predicts the DECODED values arithmetically while the engine
  * earns them by actually decoding the streams. The Spark-side pipeline
  * (binary column, typed Encoders, mapPartitions batching) is verified
  * end-to-end.
  */
object MultimodalQueries {

  val all: Seq[CatalogQuery] = Seq(
    // Cross-format image dedup by DECODED CONTENT (round-12): every
    // document becomes a real image whose pixels repeat every 97
    // doc_ids but whose bytes alternate between a genuine PNG and a
    // genuine BMP encoding — the engine decodes each stream
    // (javax.imageio), canonicalizes the raster (w:h: + row-major RGB),
    // hashes, and clusters; nfmt=2 clusters PROVE the dedup keys on
    // pixels, not stream bytes (a byte hash would scatter each picture
    // across two clusters). The oracle derives the (size, nfmt)
    // histogram from the seed arithmetic. Plan: row-local
    // synthesize+decode+hash, one content-keyed exchange, a tiny
    // histogram re-group — scale-invariant.
    CatalogQuery(
      "q135_image_content_dedup",
      (s, d) => Multimodal.imageDedupQuery(s, d),
      Some("""
        |WITH c AS (
        |  SELECT count(*) AS size, count(DISTINCT doc_id % 2) AS nfmt
        |  FROM documents GROUP BY doc_id % 97)
        |SELECT CAST(size AS BIGINT) AS size, CAST(nfmt AS BIGINT) AS nfmt,
        |  count(*) AS n_clusters
        |FROM c GROUP BY 1, 2 ORDER BY 1, 2
        |""".stripMargin)),

    CatalogQuery(
      "q30_multimodal_features",
      (s, d) => Multimodal.featuresQuery(s, d),
      Some("""
        |WITH img AS (
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
        |  FROM documents WHERE doc_id % 3 = 1),
        |vid AS (
        |  -- the AVI fixture's derivation: frame dims / count / per-frame
        |  -- solid gray v(f) = (doc_id % 200 + f*17) % 256 are doc_id
        |  -- arithmetic; the engine recovers them by demuxing a genuine
        |  -- RIFF/AVI container and raster-decoding every DIB frame.
        |  -- vsum = sum of v over all frames, vsamp = over every 2nd
        |  -- (the codec's temporal sampling)
        |  SELECT doc_id,
        |    8 + doc_id % 40 AS w, 8 + (doc_id // 5) % 40 AS h,
        |    2 + doc_id % 5 AS n,
        |    list_sum(list_transform(range(0, 2 + doc_id % 5),
        |      f -> (doc_id % 200 + f * 17) % 256)) AS vsum,
        |    list_sum(list_transform(range(0, 2 + doc_id % 5, 2),
        |      f -> (doc_id % 200 + f * 17) % 256)) AS vsamp
        |  FROM documents WHERE doc_id % 3 = 2)
        |SELECT d.doc_id,
        |  CASE (d.doc_id % 3) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
        |    ELSE 'video' END AS kind,
        |  CAST(CASE (d.doc_id % 3) WHEN 0 THEN img.w WHEN 1 THEN aud.sr
        |    ELSE vid.w END AS BIGINT) AS width,
        |  CAST(CASE (d.doc_id % 3) WHEN 0 THEN img.h WHEN 1 THEN aud.n
        |    ELSE vid.h END AS BIGINT) AS height,
        |  CAST(CASE (d.doc_id % 3) WHEN 0 THEN least(img.w, 32) WHEN 1 THEN 1
        |    ELSE least(vid.w, 32) END AS BIGINT) AS resized_w,
        |  CAST(CASE (d.doc_id % 3) WHEN 0 THEN least(img.h, 32)
        |    WHEN 1 THEN least(aud.n, 32)
        |    ELSE least(vid.h, 32) END AS BIGINT) AS resized_h,
        |  CAST(CASE (d.doc_id % 3) WHEN 0 THEN img.w * img.h * 3
        |    WHEN 1 THEN aud.n * 2
        |    ELSE vid.n * vid.w * vid.h * 3 END AS BIGINT) AS byte_len,
        |  CAST(CASE (d.doc_id % 3) WHEN 0 THEN img.w * img.h * fill
        |    WHEN 1 THEN aud.n * base +
        |      list_sum(list_transform(range(0, aud.n), i -> i % 16))
        |    ELSE vid.w * vid.h * 3 * vsum END AS BIGINT) AS byte_sum,
        |  -- image feature = RESIZED-raster channel sum (nearest-neighbor
        |  -- thumbnail; solid fill resamples to rw*rh*fill); audio
        |  -- feature = temporally DOWNSAMPLED sample sum (32 nearest-
        |  -- neighbor picks at j*n/32); video feature = thumbnail channel
        |  -- sum over every 2nd frame (temporal x spatial sampling)
        |  CAST(CASE (d.doc_id % 3) WHEN 0
        |       THEN (least(img.w, 32) * least(img.h, 32) * fill) % 997
        |    WHEN 1 THEN (32 * base +
        |      list_sum(list_transform(range(0, 32), j -> ((j * aud.n) // 32) % 16)))
        |      % 997
        |    ELSE (least(vid.w, 32) * least(vid.h, 32) * 3 * vsamp) % 997
        |    END AS BIGINT) AS feature
        |FROM documents d LEFT JOIN img ON d.doc_id = img.doc_id
        |LEFT JOIN aud ON d.doc_id = aud.doc_id
        |LEFT JOIN vid ON d.doc_id = vid.doc_id
        |ORDER BY d.doc_id
        |""".stripMargin)),

    // Frame sampling: REAL AVI demux + per-frame raster decode over video
    // rows, every 2nd frame kept (skipped frames are never decoded).
    // frame_len/frame_sum/feature are DECODED-pixel statistics; the
    // oracle predicts them from the synthesis arithmetic.
    CatalogQuery(
      "q47_multimodal_frames",
      (s, d) => Multimodal.framesQuery(s, d),
      Some("""
        |WITH vid AS (
        |  SELECT doc_id,
        |    8 + doc_id % 40 AS w, 8 + (doc_id // 5) % 40 AS h,
        |    2 + doc_id % 5 AS n
        |  FROM documents WHERE doc_id % 3 = 2),
        |f AS (
        |  SELECT doc_id, 'video' AS kind, w, h,
        |    unnest(range(0, n, 2)) AS frame_id
        |  FROM vid)
        |SELECT doc_id, kind, CAST(frame_id AS BIGINT) AS frame_id,
        |  CAST(w * h * 3 AS BIGINT) AS frame_len,
        |  CAST(w * h * 3 * ((doc_id % 200 + frame_id * 17) % 256)
        |    AS BIGINT) AS frame_sum,
        |  CAST((least(w, 32) * least(h, 32) * 3 *
        |        ((doc_id % 200 + frame_id * 17) % 256)) % 997
        |    AS BIGINT) AS feature
        |FROM f ORDER BY doc_id, frame_id
        |""".stripMargin))
  )
}
