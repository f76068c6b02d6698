package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media travels as an opaque `binary` column
  * plus a typed metadata struct; decode / feature-extract / resize run as
  * typed `mapPartitions` over the binary payload (the Scala analog of
  * `mapInPandas` batches — partition-at-a-time, no per-row driver hops).
  *
  * ==STUB BOUNDARY==
  * This container has no image/audio codecs, so [[FakeDecoder.decode]] is a
  * clearly-marked deterministic fake: it derives "decoded" dimensions and a
  * feature from the raw bytes. Everything AROUND the stub — the schema, the
  * binary column plumbing, partition-wise batching, the typed Encoder
  * surface, and downstream relational use of the features — is real and is
  * what these classes test.
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

  /** STUB: stands in for a real image/audio/video decoder. Deterministic
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

  /** Decode + feature-extract, partition-at-a-time. */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(FakeDecoder.decode))
  }

  /** Build a media table from `documents` (payload = UTF-8 text bytes; a
    * real pipeline would read image/audio files into the same shape).
    */
  def mediaFromDocuments(s: SparkSession, dir: String): Dataset[MediaRecord] = {
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

  /** Registered frame-sampling pipeline (q47). */
  def framesQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    sampleFrames(mediaFromDocuments(s, dir))
      .toDF()
      .orderBy($"doc_id", $"frame_id")
  }
}
