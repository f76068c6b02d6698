package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media travels as an opaque `binary` column
  * plus a typed metadata struct; decode / feature-extract / resize run as
  * typed `mapPartitions` over the binary payload (the Scala analog of
  * `mapInPandas` batches — partition-at-a-time, no per-row driver hops).
  *
  * ==CODEC BOUNDARY==
  * IMAGE and AUDIO payloads are REAL: the fixture synthesizes genuine
  * PNG bytes ([[PngSynth]]) decoded with the JDK's `javax.imageio`
  * (real magic sniffing, real decompression, real pixel access, real
  * nearest-neighbor thumbnail resize) and genuine RIFF/WAVE PCM16
  * bytes ([[WavSynth]]) decoded with the JDK's `javax.sound.sampled`
  * (real header parse, real signed-sample reconstruction, real
  * temporal downsample). VIDEO payloads are now REAL too: genuine
  * RIFF/AVI containers ([[AviSynth]] writes them, raw-DIB BI_RGB
  * frames) demuxed and per-frame decoded by [[graft.multimodal.Avi]]
  * (real chunk-tree walk, real `strh`/`strf` header parse, real
  * bottom-up stride-padded BGR raster reconstruction; MJPEG frames
  * decode through `javax.imageio` on the same path). All three
  * derivations come from `doc_id`, so the DuckDB oracle predicts the
  * DECODED values arithmetically without a media stack of its own; the
  * engine still earns them by round-tripping actual codec streams.
  * [[FakeDecoder]] remains only as the corrupt-payload fallback arm.
  */
object Multimodal {

  // ImageIO's default stream cache is DISK-backed: every read/write of an
  // in-memory image creates (and deletes) a temp file. The payloads here
  // are small byte arrays already in memory, so the file round-trip is
  // pure overhead — tens of thousands of temp files per multimodal query.
  // Process-wide and results-neutral (memory cache, same codec output).
  javax.imageio.ImageIO.setUseCache(false)

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
      // bulk raster fill: one array + one setRGB call, not w*h
      // per-pixel calls (each of which re-checks the color model)
      val row = Array.fill(w * h)(px)
      img.setRGB(0, 0, w, h, row, 0, w)
      val out = new java.io.ByteArrayOutputStream(1024)
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
  }

  /** Deterministic BMP synthesis: the SAME solid image as [[PngSynth]]
    * for one seed, through a DIFFERENT codec — the cross-format twin
    * for content dedup (identical decoded pixels, entirely different
    * compressed bytes).
    */
  object BmpSynth {
    def encode(seed: Long): Array[Byte] = {
      val (w, h) = (PngSynth.width(seed), PngSynth.height(seed))
      val (r, g, b) = PngSynth.rgb(seed)
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val px = (r << 16) | (g << 8) | b
      val row = Array.fill(w * h)(px)
      img.setRGB(0, 0, w, h, row, 0, w)
      val out = new java.io.ByteArrayOutputStream(1024)
      javax.imageio.ImageIO.write(img, "bmp", out)
      out.toByteArray
    }
  }

  /** Deterministic WAV synthesis for the audio fixture: PCM16 mono with
    * sample rate, length, and sample values all derived from `doc_id`.
    * The bytes are a real RIFF/WAVE stream (written by the JDK's
    * `AudioSystem` encoder); the derivation lets the SQL oracle predict
    * the DECODED values without an audio stack. Samples stay < 256 so
    * their byte-level layout (lo byte = value, hi byte = 0) is also
    * arithmetic if ever needed.
    */
  object WavSynth {
    def sampleRate(docId: Long): Int = (8000 + (docId % 8) * 1000).toInt
    def nSamples(docId: Long): Int = (64 + docId % 64).toInt
    def sample(docId: Long, i: Int): Short =
      ((docId % 31) + i % 16).toShort

    def encode(docId: Long): Array[Byte] = {
      val n = nSamples(docId)
      val pcm = new Array[Byte](n * 2)
      var i = 0
      while (i < n) {
        val s = sample(docId, i)
        pcm(i * 2) = (s & 0xff).toByte // little-endian lo
        pcm(i * 2 + 1) = ((s >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(
        sampleRate(docId).toFloat, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
      val out = new java.io.ByteArrayOutputStream(256)
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
  }

  /** Deterministic AVI synthesis for the video fixture: a real RIFF/AVI
    * container (written by [[Avi.write]]: full avih/strh/strf header
    * chain, movi frame chunks, idx1 index) holding `nFrames` solid-gray
    * raw-DIB frames whose dimensions, count, and per-frame gray value
    * all derive from `doc_id` — which is what lets the SQL oracle
    * predict the DECODED pixel statistics while the engine recovers
    * them from a genuine container demux + raster reconstruction.
    */
  object AviSynth {
    val Fps = 10
    def width(docId: Long): Int = (8 + docId % 40).toInt
    def height(docId: Long): Int = (8 + (docId / 5) % 40).toInt
    def nFrames(docId: Long): Int = (2 + docId % 5).toInt
    /** Solid gray value of frame `f` (all three channels). */
    def gray(docId: Long, f: Int): Int = ((docId % 200).toInt + f * 17) % 256

    def encode(docId: Long): Array[Byte] = {
      val (w, h) = (width(docId), height(docId))
      val frames = (0 until nFrames(docId)).map(f =>
        Avi.solidDibFrame(w, h, gray(docId, f)))
      Avi.write(w, h, Fps, compression = 0, frames)
    }
  }

  /** REAL video decode: [[Avi.demux]] parses the container, every frame
    * is raster-decoded, and the features aggregate over DECODED pixels.
    * Feature mapping for the shared [[MediaFeatures]] schema:
    * width/height = frame dimensions from the parsed `strf` header,
    * resized_w/h = thumbnail dims (<=32), byte_len = total decoded RGB
    * byte count across frames (nFrames*w*h*3), byte_sum = channel sum
    * over ALL decoded frames, feature = nearest-neighbor thumbnail
    * channel sum over every 2nd frame (temporal sampling x spatial
    * resize — the two reductions a video featurizer actually runs),
    * mod 997. A payload that demuxes but holds any undecodable frame
    * degrades to None (-> [[FakeDecoder]]), never a partition crash.
    */
  object VideoCodec {
    val FrameEvery = 2

    def decode(r: MediaRecord): Option[MediaFeatures] = {
      val s = Avi.demux(r.payload).getOrElse(return None)
      val (w, h) = (s.width, s.height)
      val (rw, rh) = (math.min(w, 32), math.min(h, 32))
      var byteSum = 0L
      var thumbSum = 0L
      var f = 0
      while (f < s.frames.length) {
        val raster = Avi.decodeFrame(s, f).getOrElse(return None)
        var i = 0
        while (i < raster.length) {
          val px = raster(i)
          byteSum += ((px >> 16) & 0xff) + ((px >> 8) & 0xff) + (px & 0xff)
          i += 1
        }
        if (f % FrameEvery == 0) {
          var y2 = 0
          while (y2 < rh) {
            val sy = y2 * h / rh
            var x2 = 0
            while (x2 < rw) {
              val px = raster(sy * w + x2 * w / rw)
              thumbSum += ((px >> 16) & 0xff) + ((px >> 8) & 0xff) + (px & 0xff)
              x2 += 1
            }
            y2 += 1
          }
        }
        f += 1
      }
      Some(MediaFeatures(
        doc_id = r.doc_id,
        kind = r.kind,
        width = w.toLong,
        height = h.toLong,
        resized_w = rw.toLong,
        resized_h = rh.toLong,
        byte_len = s.frames.length.toLong * w * h * 3,
        byte_sum = byteSum,
        feature = thumbSum % 997L))
    }
  }

  /** REAL audio decode via the JDK's `javax.sound.sampled` (WAV/PCM).
    * Magic-sniffed (RIFF....WAVE); corrupt streams degrade to the
    * fallback. Feature mapping for the shared [[MediaFeatures]] schema:
    * width = decoded sample rate, height = decoded frame count,
    * resized_w = channels, resized_h = temporal downsample length
    * (<=32), byte_len = decoded PCM byte count, byte_sum = sum of the
    * decoded sample VALUES, feature = nearest-neighbor-downsampled
    * sample sum mod 997 — the audio analog of the image thumbnail.
    */
  object AudioCodec {
    private def looksLikeWav(b: Array[Byte]): Boolean =
      b != null && b.length > 12 &&
        b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

    def decode(r: MediaRecord): Option[MediaFeatures] = {
      if (!looksLikeWav(r.payload)) return None
      val ais =
        try javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(r.payload))
        catch {
          case _: javax.sound.sampled.UnsupportedAudioFileException => return None
          case _: java.io.IOException => return None
        }
      try {
        val fmt = ais.getFormat
        if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1 ||
          fmt.isBigEndian) return None // only the fixture's PCM16LE mono
        val pcm = ais.readAllBytes()
        val n = pcm.length / 2
        val samples = new Array[Long](n)
        var sum = 0L
        var i = 0
        while (i < n) {
          val s = ((pcm(i * 2) & 0xff) | (pcm(i * 2 + 1) << 8)).toShort.toLong
          samples(i) = s
          sum += s
          i += 1
        }
        val rh = math.min(n, 32)
        var dsum = 0L
        var j = 0
        while (j < rh) { dsum += samples(j * n / rh); j += 1 }
        Some(MediaFeatures(
          doc_id = r.doc_id,
          kind = r.kind,
          width = fmt.getSampleRate.toLong,
          height = n.toLong,
          resized_w = fmt.getChannels.toLong,
          resized_h = rh.toLong,
          byte_len = pcm.length.toLong,
          byte_sum = sum,
          feature = ((dsum % 997L) + 997L) % 997L))
      } finally ais.close()
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
      // fraction of media bytes is always truncated or mangled. NonFatal,
      // not just IOException: codec plugins throw unchecked exceptions
      // (ArrayIndexOutOfBounds, NegativeArraySize) on mangled headers too
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
        catch { case scala.util.control.NonFatal(_) => null }
      if (img == null) return None // sniffed but unreadable: fall back
      val (w, h) = (img.getWidth, img.getHeight)
      // decoded-pixel statistics (NOT compressed-stream bytes): byte_len
      // is the decoded RGB byte count, byte_sum the per-channel pixel
      // sum — real pixel access over the decompressed raster, pulled as
      // ONE bulk getRGB transfer (per-pixel getRGB re-runs the color
      // model conversion on every call)
      val pixels = img.getRGB(0, 0, w, h, null, 0, w)
      var sum = 0L
      var i = 0
      while (i < pixels.length) {
        val px = pixels(i)
        sum += ((px >> 16) & 0xff) + ((px >> 8) & 0xff) + (px & 0xff)
        i += 1
      }
      // REAL resize: nearest-neighbor resample of the decoded raster to
      // the (<=32, <=32) thumbnail — deterministic integer sampling
      // (src = dst * srcDim / dstDim), no interpolation-library
      // ambiguity — and the feature comes from the RESIZED pixels, so a
      // wrong resample is a wrong feature, not dead metadata
      val (rw, rh) = (math.min(w, 32), math.min(h, 32))
      var rsum = 0L
      var y2 = 0
      while (y2 < rh) {
        val sy = y2 * h / rh
        var x2 = 0
        while (x2 < rw) {
          val px = pixels(sy * w + x2 * w / rw)
          rsum += ((px >> 16) & 0xff) + ((px >> 8) & 0xff) + (px & 0xff)
          x2 += 1
        }
        y2 += 1
      }
      Some(MediaFeatures(
        doc_id = r.doc_id,
        kind = r.kind,
        width = w.toLong,
        height = h.toLong,
        resized_w = rw.toLong,
        resized_h = rh.toLong,
        byte_len = w.toLong * h * 3,
        byte_sum = sum,
        feature = rsum % 997L))
    }
  }

  /** FALLBACK for payloads no codec recognizes (corrupt/truncated/alien
    * streams): deterministic arithmetic over the raw bytes, so degraded
    * rows are still predictable instead of crashing the partition. Since
    * r12 every fixture modality decodes through a REAL codec (PNG/BMP,
    * WAV, AVI); this arm only fires on mangled bytes.
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

  /** Decode + feature-extract, partition-at-a-time: real codecs first
    * (magic-sniffed image, then RIFF-sniffed WAV audio and AVI video),
    * deterministic byte-arithmetic fallback for anything unreadable.
    */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(r =>
      ImageCodec.decode(r)
        .orElse(AudioCodec.decode(r))
        .orElse(VideoCodec.decode(r))
        .getOrElse(FakeDecoder.decode(r))))
  }

  /** Build a media table from `documents`: image rows carry REAL PNG
    * bytes ([[PngSynth]]), audio rows REAL RIFF/WAVE bytes
    * ([[WavSynth]]), video rows REAL RIFF/AVI bytes ([[AviSynth]]) —
    * all synthesized per row from doc_id (a real pipeline would read
    * media files into the same shape). The synthesis runs executor-side
    * inside the same typed map — row-local, no shuffle, no driver
    * involvement.
    */
  private def mediaBase(s: SparkSession, dir: String): Dataset[MediaRecord] = {
    import s.implicits._
    // every payload is codec-synthesized from doc_id downstream, so this
    // scan prunes to the single doc_id column — no text bytes are read
    graft.Tables.documents(s, dir)
      .select(col("doc_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        lit(Array.emptyByteArray).as("payload"))
      .as[MediaRecord]
  }

  def mediaFromDocuments(s: SparkSession, dir: String): Dataset[MediaRecord] =
    synthesize(mediaBase(s, dir))

  private def synthesize(base: Dataset[MediaRecord]): Dataset[MediaRecord] = {
    import base.sparkSession.implicits._
    base.mapPartitions(_.map { r =>
      if (r.kind == "image") r.copy(payload = PngSynth.encode(r.doc_id))
      else if (r.kind == "audio") r.copy(payload = WavSynth.encode(r.doc_id))
      else r.copy(payload = AviSynth.encode(r.doc_id))
    })
  }

  /** The registered end-to-end pipeline: binary column in, features out. */
  def featuresQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    extractFeatures(mediaFromDocuments(s, dir))
      .toDF()
      .orderBy($"doc_id")
  }

  /** One sampled video frame's decoded statistics. */
  final case class FrameSample(
      doc_id: Long,
      kind: String,
      frame_id: Long,
      frame_len: Long,
      frame_sum: Long,
      feature: Long)

  /** REAL frame sampling: demux each AVI payload ([[Avi.demux]]) and
    * decode every `every`-th frame — skipped frames are never decoded
    * (the demuxer keeps frames as encoded chunk bytes until
    * [[Avi.decodeFrame]] is asked). Per sampled frame: frame_len = the
    * decoded RGB byte count, frame_sum = the decoded channel sum,
    * feature = the nearest-neighbor (<=32 x <=32) thumbnail channel sum
    * mod 997. A payload that fails to demux/decode contributes no rows
    * (a real pipeline drops undecodable media, it doesn't crash). Each
    * input row fans out locally; no shuffle.
    */
  def sampleFrames(media: Dataset[MediaRecord],
      every: Int = VideoCodec.FrameEvery): Dataset[FrameSample] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { r =>
      Avi.demux(r.payload).iterator.flatMap { s =>
        val (w, h) = (s.width, s.height)
        val (rw, rh) = (math.min(w, 32), math.min(h, 32))
        (0 until s.frames.length).iterator.filter(_ % every == 0).flatMap { f =>
          Avi.decodeFrame(s, f).map { raster =>
            var sum = 0L
            var i = 0
            while (i < raster.length) {
              val px = raster(i)
              sum += ((px >> 16) & 0xff) + ((px >> 8) & 0xff) + (px & 0xff)
              i += 1
            }
            var tsum = 0L
            var y2 = 0
            while (y2 < rh) {
              val sy = y2 * h / rh
              var x2 = 0
              while (x2 < rw) {
                val px = raster(sy * w + x2 * w / rw)
                tsum += ((px >> 16) & 0xff) + ((px >> 8) & 0xff) + (px & 0xff)
                x2 += 1
              }
              y2 += 1
            }
            FrameSample(r.doc_id, r.kind, f.toLong, w.toLong * h * 3, sum,
              tsum % 997L)
          }
        }
      }
    })
  }

  /** Registered frame-sampling pipeline (q47): video rows only, real
    * AVI demux + per-frame raster decode (see [[sampleFrames]]).
    */
  def framesQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // filter BEFORE the typed synthesis map — a column-level predicate
    // Catalyst folds into the scan region, and no AVI is ever encoded
    // for a row this query discards
    sampleFrames(mediaFromDocumentsKind(s, dir, "video"))
      .toDF()
      .orderBy($"doc_id", $"frame_id")
  }

  /** Synthesis restricted to one modality, filter pushed below the map. */
  private def mediaFromDocumentsKind(s: SparkSession, dir: String,
      kind: String): Dataset[MediaRecord] = {
    import s.implicits._
    synthesize(mediaBase(s, dir).filter($"kind" === kind))
  }

  /** One decoded image's identity: the codec is SNIFFED from the
    * stream magic (never trusted from metadata) and the content hash is
    * computed over the DECODED raster — `"w:h:"` header + row-major RGB
    * bytes through md5-prefix60 — so the same picture re-encoded by a
    * different codec hashes identically while any byte-level hash
    * scatters it. content_h is NULL-free: undecodable payloads are
    * dropped by the extractor (a dedup must not cluster garbage).
    */
  final case class ImageIdentity(doc_id: Long, fmt: String, content_h: Long)

  /** Decode + canonicalize + hash, partition-at-a-time — the
    * content-dedup kernel for image columns. At 100 TB this is the
    * dedup that survives re-encoding (PNG↔BMP↔quality-twiddled JPEG
    * re-uploads); byte hashing only catches the trivial copies.
    */
  def imageIdentities(media: Dataset[MediaRecord]): Dataset[ImageIdentity] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { r =>
      val b = r.payload
      val fmt =
        if (b != null && b.length > 8 &&
          (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') "png"
        else if (b != null && b.length > 2 && b(0) == 'B' && b(1) == 'M') "bmp"
        else "?"
      if (fmt == "?") Iterator.empty
      else {
        // NonFatal, not just IOException: a payload that passes the magic
        // sniff can still crash a codec plugin with an unchecked throw —
        // the contract is "undecodable payloads are dropped", not "crash
        // the task"
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
          catch { case scala.util.control.NonFatal(_) => null }
        if (img == null) Iterator.empty
        else {
          val (w, h) = (img.getWidth, img.getHeight)
          val pixels = img.getRGB(0, 0, w, h, null, 0, w)
          val header = s"$w:$h:".getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val canon = new Array[Byte](header.length + pixels.length * 3)
          System.arraycopy(header, 0, canon, 0, header.length)
          var i = 0
          var o = header.length
          while (i < pixels.length) {
            val px = pixels(i)
            canon(o) = ((px >> 16) & 0xff).toByte
            canon(o + 1) = ((px >> 8) & 0xff).toByte
            canon(o + 2) = (px & 0xff).toByte
            i += 1
            o += 3
          }
          Iterator.single(ImageIdentity(r.doc_id, fmt,
            graft.functions.Md5Util.prefix60(canon)))
        }
      }
    })
  }

  /** The registered cross-format image-dedup pipeline: every document
    * becomes an image whose CONTENT repeats every 97 doc_ids (the
    * realistic duplicate regime a crawl has) but whose BYTES alternate
    * between a real PNG and a real BMP encoding by row parity — so a
    * cluster with nfmt=2 proves the dedup keyed on decoded pixels, not
    * on stream bytes. Output: the (cluster size, formats-per-cluster)
    * histogram, which the oracle derives from the seed arithmetic while
    * the engine earns it by decoding every stream. Shape: row-local
    * synthesize+decode+hash, ONE content-keyed exchange, then the tiny
    * histogram re-group — the same plan at any corpus size.
    */
  def imageDedupQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = graft.Tables.documents(s, dir)
      .select(col("doc_id"), lit("image").as("kind"),
        lit(Array.emptyByteArray).as("payload"))
      .as[MediaRecord]
      .mapPartitions(_.map { r =>
        val seed = r.doc_id % 97
        r.copy(payload =
          if (r.doc_id % 2 == 0) PngSynth.encode(seed)
          else BmpSynth.encode(seed))
      })
    imageIdentities(media)
      .groupBy($"content_h")
      .agg(count(lit(1)).as("size"),
        countDistinct($"fmt").as("nfmt"))
      .groupBy($"size", $"nfmt")
      .agg(count(lit(1)).as("n_clusters"))
      .orderBy($"size", $"nfmt")
  }
}
