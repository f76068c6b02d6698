package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media travels as an opaque `binary` column
  * plus a typed metadata struct; decode / feature-extract / resize run as
  * typed `mapPartitions` over the binary payload (the Scala analog of
  * `mapInPandas` batches — partition-at-a-time, no per-row driver hops).
  *
  * ==CODEC BOUNDARY==
  * IMAGE payloads are REAL: the fixture synthesizes genuine PNG bytes
  * per image row ([[PngSynth]]) and [[ImageCodec]] decodes them with the
  * JDK's `javax.imageio` (PNG/BMP/GIF readers ship with every JDK) —
  * real magic-byte sniffing, real decompression, real pixel access. The
  * image's dimensions and constant fill are derived from `doc_id`, so
  * the DuckDB oracle predicts the DECODED values arithmetically without
  * needing a decoder of its own; the engine still earns them by
  * round-tripping actual PNG bytes. Audio/video payloads remain behind
  * [[FakeDecoder]], a clearly-marked deterministic stub (no audio/video
  * codecs in this container); the schema, binary plumbing, batching and
  * Encoder surface around it are real either way.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  final case class MediaRecord(doc_id: Long, kind: String, payload: Array[Byte])

  /** Decoded/extracted features (what a real decoder would emit). */
  final case class MediaFeatures(
      doc_id: Long,
      kind: String,
      width: Long,
      height: Long,
      resized_w: Long,
      resized_h: Long,
      byte_len: Long,
      byte_sum: Long,
      feature: Long)

  /** Deterministic PNG synthesis for the image fixture: a solid-fill
    * RGB image whose dimensions and color derive from `doc_id` alone.
    * The bytes are a real PNG stream (written by the JDK encoder); the
    * derivation is what lets the SQL oracle predict the decoded values
    * without a decoder.
    */
  object PngSynth {
    def width(docId: Long): Int = (16 + docId % 40).toInt
    def height(docId: Long): Int = (16 + (docId / 7) % 40).toInt
    def rgb(docId: Long): (Int, Int, Int) =
      ((docId % 251).toInt, (docId % 241).toInt, (docId % 239).toInt)

    def encode(docId: Long): Array[Byte] = {
      val (w, h) = (width(docId), height(docId))
      val (r, g, b) = rgb(docId)
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val px = (r << 16) | (g << 8) | b
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { img.setRGB(x, y, px); x += 1 }
        y += 1
      }
      val out = new java.io.ByteArrayOutputStream(1024)
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
  }

  /** REAL image decode via the JDK's `javax.imageio` (PNG/BMP/GIF).
    * Magic-byte sniff first so non-image payloads never pay a decode
    * attempt; returns None when the bytes aren't a recognized image, at
    * which point the caller falls back to [[FakeDecoder]].
    */
  object ImageCodec {
    private def looksLikeImage(b: Array[Byte]): Boolean =
      b != null && b.length > 8 && (
        // PNG: \x89 P N G \r \n \x1a \n
        ((b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') ||
        // BMP: B M
        (b(0) == 'B' && b(1) == 'M') ||
        // GIF: G I F 8
        (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8'))

    def decode(r: MediaRecord): Option[MediaFeatures] = {
      if (!looksLikeImage(r.payload)) return None
      // a CORRUPT stream (sniffed magic, broken body) must degrade to
      // the fallback, never crash the partition — at corpus scale some
      // fraction of media bytes is always truncated or mangled
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
        catch { case _: java.io.IOException => null }
      if (img == null) return None // sniffed but unreadable: fall back
      val (w, h) = (img.getWidth, img.getHeight)
      // decoded-pixel statistics (NOT compressed-stream bytes): byte_len
      // is the decoded RGB byte count, byte_sum the per-channel pixel
      // sum — real pixel access over the decompressed raster
      var sum = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val px = img.getRGB(x, y)
          sum += ((px >> 16) & 0xff) + ((px >> 8) & 0xff) + (px & 0xff)
          x += 1
        }
        y += 1
      }
      Some(MediaFeatures(
        doc_id = r.doc_id,
        kind = r.kind,
        width = w.toLong,
        height = h.toLong,
        resized_w = math.min(w.toLong, 32L),
        resized_h = math.min(h.toLong, 32L),
        byte_len = w.toLong * h * 3,
        byte_sum = sum,
        feature = sum % 997L))
    }
  }

  /** STUB: stands in for a real audio/video decoder. Deterministic
    * arithmetic over the payload so the DuckDB oracle can mirror it.
    */
  object FakeDecoder {
    def decode(r: MediaRecord): MediaFeatures = {
      // defensive: a decoder must treat a missing payload as empty, not
      // throw mid-partition (real codec bindings get fed nulls too)
      val bytes = if (r.payload == null) Array.emptyByteArray else r.payload
      val first = if (bytes.nonEmpty) bytes(0) & 0xffL else 0L
      val second = if (bytes.length > 1) bytes(1) & 0xffL else 0L
      var sum = 0L
      var i = 0
      while (i < bytes.length) { sum += bytes(i) & 0xff; i += 1 }
      val w = 16L + first % 64
      val h = 16L + second % 64
      MediaFeatures(
        doc_id = r.doc_id,
        kind = r.kind,
        width = w,
        height = h,
        resized_w = math.min(w, 32L),
        resized_h = math.min(h, 32L),
        byte_len = bytes.length.toLong,
        byte_sum = sum,
        feature = sum % 997L)
    }
  }

  /** Decode + feature-extract, partition-at-a-time: real image codec
    * first (magic-sniffed), deterministic stub for everything else.
    */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(r =>
      ImageCodec.decode(r).getOrElse(FakeDecoder.decode(r))))
  }

  /** Build a media table from `documents`: image rows carry REAL PNG
    * bytes (synthesized per row from doc_id — see [[PngSynth]]; a real
    * pipeline would read image files into the same shape), audio/video
    * rows carry the UTF-8 text bytes the stub decoder consumes. The
    * synthesis runs executor-side inside the same typed map — row-local,
    * no shuffle, no driver involvement.
    */
  private def mediaBase(s: SparkSession, dir: String): Dataset[MediaRecord] = {
    import s.implicits._
    graft.Tables.documents(s, dir)
      .select(col("doc_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        // a media row's payload is bytes, never NULL: a NULL-text doc
        // derives an EMPTY payload (0 frames, zero features) in both
        // engines instead of NPE-ing the decoder
        encode(coalesce(col("text"), lit("")), "UTF-8").as("payload"))
      .as[MediaRecord]
  }

  def mediaFromDocuments(s: SparkSession, dir: String): Dataset[MediaRecord] = {
    import s.implicits._
    mediaBase(s, dir).mapPartitions(_.map(r =>
      if (r.kind == "image") r.copy(payload = PngSynth.encode(r.doc_id))
      else r))
  }

  /** The registered end-to-end pipeline: binary column in, features out. */
  def featuresQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    extractFeatures(mediaFromDocuments(s, dir))
      .toDF()
      .orderBy($"doc_id")
  }

  /** One sampled "video frame": fixed-size byte window of the payload. */
  final case class FrameSample(
      doc_id: Long,
      kind: String,
      frame_id: Long,
      frame_len: Long,
      frame_sum: Long,
      feature: Long)

  /** Frame sampling: slice the payload into `frameBytes` windows and keep
    * every `every`-th one, emitting a per-frame feature — the video
    * frame-sample shape (decode stubbed as byte arithmetic like
    * [[FakeDecoder]]; the slicing, fan-out and partition-wise batching are
    * the real pattern). Each input row fans out locally; no shuffle.
    */
  def sampleFrames(media: Dataset[MediaRecord],
      frameBytes: Int = 64, every: Int = 4): Dataset[FrameSample] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { r =>
      val len = r.payload.length
      val nFrames = (len + frameBytes - 1) / frameBytes
      (0 until nFrames).iterator.filter(_ % every == 0).map { f =>
        val start = f * frameBytes
        val end = math.min(start + frameBytes, len)
        var sum = 0L
        var i = start
        while (i < end) { sum += r.payload(i) & 0xff; i += 1 }
        FrameSample(r.doc_id, r.kind, f.toLong, (end - start).toLong, sum, sum % 997L)
      }
    })
  }

  /** Registered frame-sampling pipeline (q47). Frame sampling is a
    * time-series-media operation, so it runs over audio/video rows only:
    * image rows now carry real PNG streams (compressed, not
    * frame-addressable) and go through [[ImageCodec]] in q30 instead.
    */
  def framesQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // filter BEFORE the typed synthesis map — a column-level predicate
    // Catalyst folds into the scan region, and no PNG is ever encoded
    // for a row this query discards
    sampleFrames(mediaBase(s, dir).filter($"kind" =!= "image"))
      .toDF()
      .orderBy($"doc_id", $"frame_id")
  }
}
