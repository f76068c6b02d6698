package graft.multimodal

import graft.SparkSpec
import graft.multimodal.Multimodal._

/** Pins the REAL codec paths: golden PNG round-trips through
  * javax.imageio (plus BMP as a second genuine format), golden WAV
  * through javax.sound, golden AVI through the [[Avi]] demuxer (raw-DIB
  * orientation/stride reconstruction + MJPEG frames via javax.imageio),
  * magic-sniff dispatch between the codecs and the corrupt-bytes
  * fallback, and the end-to-end q30/q47 pipelines producing
  * codec-decoded rows for every modality.
  */
class MultimodalSpec extends SparkSpec {

  test("golden PNG decode: synthesized bytes are a real PNG and decode to the derived stats") {
    val docId = 42L
    val bytes = PngSynth.encode(docId)
    // a genuine PNG stream, not a fake: magic + IHDR present
    assert((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G')
    assert(new String(bytes.slice(12, 16), "US-ASCII") == "IHDR")
    val f = ImageCodec.decode(MediaRecord(docId, "image", bytes))
      .getOrElse(fail("real PNG bytes must take the codec path"))
    val (w, h) = (16 + docId % 40, 16 + (docId / 7) % 40)
    val fill = (docId % 251) + (docId % 241) + (docId % 239)
    assert(f.width == w && f.height == h, s"got ${(f.width, f.height)}")
    assert(f.resized_w == math.min(w, 32) && f.resized_h == math.min(h, 32))
    assert(f.byte_len == w * h * 3)
    assert(f.byte_sum == w * h * fill, "decoded pixel sum must match the solid fill")
    // feature = RESIZED-raster sum: solid fill resamples to rw*rh*fill
    assert(f.feature == (math.min(w, 32) * math.min(h, 32) * fill) % 997)
  }

  test("nearest-neighbor resize samples the raster it claims to (non-uniform pin)") {
    // 4x1 image [10, 20, 30, 40] (red channel only) resized to 2x1:
    // nearest-neighbor picks src x = dst*4/2 = {0, 2} -> pixels 10, 30
    val img = new java.awt.image.BufferedImage(4, 1,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    Seq(10, 20, 30, 40).zipWithIndex.foreach { case (v, x) =>
      img.setRGB(x, 0, v << 16)
    }
    // widen to >32 so the resize actually triggers: tile the row 40 wide
    val wide = new java.awt.image.BufferedImage(40, 1,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 40) wide.setRGB(x, 0, img.getRGB(x % 4, 0))
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(wide, "png", out)
    val f = ImageCodec.decode(MediaRecord(1L, "image", out.toByteArray)).get
    assert(f.resized_w == 32 && f.resized_h == 1)
    // dst x in 0..31 samples src x = x2*40/32; replay the same arithmetic
    val expected = (0 until 32).map { x2 =>
      Seq(10, 20, 30, 40)((x2 * 40 / 32) % 4).toLong
    }.sum
    assert(f.feature == expected % 997,
      s"resized sum must come from the sampled raster; got ${f.feature}")
    // and the full-res sum is untouched by the resize
    assert(f.byte_sum == 10L * (40 / 4) + 20L * 10 + 30L * 10 + 40L * 10)
  }

  test("decoded dimensions come from the stream, not the derivation") {
    // hand-built 5x3 image written as PNG — dimensions unrelated to any
    // doc_id arithmetic; the codec must report what the stream says
    val img = new java.awt.image.BufferedImage(5, 3,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 3; x <- 0 until 5) img.setRGB(x, y, 0x010203)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    val f = ImageCodec.decode(MediaRecord(7L, "image", out.toByteArray)).get
    assert(f.width == 5 && f.height == 3)
    assert(f.byte_sum == 5L * 3 * (1 + 2 + 3))
  }

  test("BMP decodes through the same real codec (second genuine format)") {
    val img = new java.awt.image.BufferedImage(4, 4,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 4) img.setRGB(x, y, 0x102030)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", out)
    val bytes = out.toByteArray
    assert(bytes(0) == 'B' && bytes(1) == 'M')
    val f = ImageCodec.decode(MediaRecord(1L, "image", bytes)).get
    assert(f.width == 4 && f.height == 4)
    assert(f.byte_sum == 16L * (0x10 + 0x20 + 0x30))
  }

  test("non-image bytes fall through to the stub, and sniffed-but-corrupt bytes too") {
    val text = "just some text payload".getBytes("UTF-8")
    assert(ImageCodec.decode(MediaRecord(1L, "audio", text)).isEmpty)
    // PNG magic with a garbage body: ImageIO returns null -> fall back
    val corrupt = Array[Byte](0x89.toByte, 'P', 'N', 'G', 13, 10, 26, 10, 1, 2, 3, 4)
    assert(ImageCodec.decode(MediaRecord(1L, "image", corrupt)).isEmpty)
    // the dispatcher then yields the stub's arithmetic unchanged
    val viaStub = FakeDecoder.decode(MediaRecord(1L, "audio", text))
    assert(viaStub.byte_len == text.length.toLong)
  }

  test("golden WAV decode: synthesized bytes are a real RIFF stream and decode to derived stats") {
    val docId = 13L
    val bytes = WavSynth.encode(docId)
    assert(bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F')
    assert(bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E')
    val f = AudioCodec.decode(MediaRecord(docId, "audio", bytes))
      .getOrElse(fail("real WAV bytes must take the audio codec path"))
    val n = 64 + (docId % 64).toInt
    val base = docId % 31
    assert(f.width == 8000 + (docId % 8) * 1000, "sample rate from the decoded header")
    assert(f.height == n && f.resized_w == 1L && f.resized_h == 32L)
    assert(f.byte_len == n * 2L)
    assert(f.byte_sum == n * base + (0 until n).map(_ % 16).sum,
      "decoded sample-value sum")
    val dsum = (0 until 32).map(j => base + (j * n / 32) % 16).sum
    assert(f.feature == dsum % 997, "feature from the temporally downsampled samples")
  }

  test("corrupt WAV bytes fall back to the stub; negative samples sum correctly") {
    // RIFF magic with a garbage body
    val corrupt = "RIFFxxxxWAVEgarbage".getBytes("US-ASCII")
    assert(AudioCodec.decode(MediaRecord(1L, "audio", corrupt)).isEmpty)
    // hand-built PCM with a NEGATIVE sample: the decoder must read
    // signed 16-bit little-endian, not unsigned bytes
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val pcm = Array[Byte](0x0a, 0x00, 0xf6.toByte, 0xff.toByte) // +10, -10
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, 2L)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    val f = AudioCodec.decode(MediaRecord(1L, "audio", out.toByteArray)).get
    assert(f.height == 2 && f.byte_sum == 0L, s"10 + (-10) must sum to 0, got $f")
  }

  test("golden AVI decode: synthesized bytes are a real RIFF/AVI container decoding to derived stats") {
    val docId = 44L // 44 % 3 == 2 -> video
    val bytes = AviSynth.encode(docId)
    // a genuine AVI container: RIFF magic + 'AVI ' form type + hdrl list
    assert(bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F')
    assert(new String(bytes.slice(8, 12), "US-ASCII") == "AVI ")
    val s = Avi.demux(bytes).getOrElse(fail("real AVI bytes must demux"))
    val (w, h, n) = (8 + docId % 40, 8 + (docId / 5) % 40, 2 + docId % 5)
    assert(s.width == w && s.height == h, s"got ${(s.width, s.height)}")
    assert(s.frames.length == n && s.fps == 10.0 && s.compression == 0)
    val f = VideoCodec.decode(MediaRecord(docId, "video", bytes))
      .getOrElse(fail("demuxable AVI must take the video codec path"))
    def v(i: Int) = ((docId % 200) + i * 17) % 256
    val vsum = (0 until n.toInt).map(v(_)).sum
    val vsamp = (0 until n.toInt by 2).map(v(_)).sum
    assert(f.width == w && f.height == h)
    assert(f.resized_w == math.min(w, 32) && f.resized_h == math.min(h, 32))
    assert(f.byte_len == n * w * h * 3)
    assert(f.byte_sum == w * h * 3 * vsum, "decoded all-frame channel sum")
    assert(f.feature == (math.min(w, 32) * math.min(h, 32) * 3 * vsamp) % 997,
      "feature from thumbnails of every 2nd frame")
  }

  test("AVI demux reads dimensions and frame count from the stream, not the derivation") {
    // hand-built 5x3, 2-frame AVI — unrelated to doc_id arithmetic
    val frames = Seq(Avi.solidDibFrame(5, 3, 10), Avi.solidDibFrame(5, 3, 20))
    val bytes = Avi.write(5, 3, 25, 0, frames)
    val s = Avi.demux(bytes).get
    assert(s.width == 5 && s.height == 3 && s.frames.length == 2 && s.fps == 25.0)
    val f = VideoCodec.decode(MediaRecord(9L, "video", bytes)).get
    assert(f.byte_sum == 5L * 3 * 3 * (10 + 20))
  }

  test("DIB frames reconstruct bottom-up stride-padded BGR correctly (orientation pin)") {
    // 5 wide -> 15 row bytes -> stride 16 (padding exercised); top row
    // pure red, bottom row pure blue: a decoder that forgets the
    // bottom-up flip or the BGR order returns the wrong rasters
    val w = 5; val h = 2
    val topDown = Array.fill(w)(0xff0000) ++ Array.fill(w)(0x0000ff)
    val dib = Avi.rasterToDibFrame(w, h, topDown)
    assert(dib.length == Avi.stride(w) * h && Avi.stride(w) == 16)
    // DIB row 0 is the BOTTOM image row (blue), stored B,G,R
    assert((dib(0) & 0xff) == 0xff && (dib(2) & 0xff) == 0x00)
    val s = Avi.demux(Avi.write(w, h, 10, 0, Seq(dib))).get
    val raster = Avi.decodeFrame(s, 0).get
    assert(raster.toSeq == topDown.toSeq,
      "decoded raster must be top-down RGB, exactly the input")
  }

  test("MJPEG frames decode through javax.imageio on the same demux path") {
    val (w, h, v) = (24, 16, 100)
    val jpegs = (0 until 3).map { _ =>
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val px = (v << 16) | (v << 8) | v
      img.setRGB(0, 0, w, h, Array.fill(w * h)(px), 0, w)
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", out)
      out.toByteArray
    }
    val bytes = Avi.write(w, h, 10, Avi.FccMjpg, jpegs)
    val s = Avi.demux(bytes).get
    assert(s.compression == Avi.FccMjpg && s.frames.length == 3)
    val f = VideoCodec.decode(MediaRecord(1L, "video", bytes)).get
    assert(f.width == w && f.height == h && f.byte_len == 3L * w * h * 3)
    // JPEG is lossy: a uniform gray decodes near, not necessarily equal
    val exact = 3L * w * h * 3 * v
    assert(math.abs(f.byte_sum - exact) <= 3L * w * h * 3 * 8,
      s"JPEG round-trip must land near the encoded gray: ${f.byte_sum} vs $exact")
  }

  test("corrupt or truncated AVI bytes fall back to the stub arm") {
    // AVI magic with a garbage body
    val garbage = "RIFF    AVI garbage-here".getBytes("US-ASCII")
    assert(Avi.demux(garbage).isEmpty)
    // a valid file truncated mid-movi: demux stops cleanly -> headers
    // parse but the sole oversized frame chunk is dropped; the decode
    // then yields zero-frame features rather than a crash
    val whole = AviSynth.encode(44L)
    val truncated = whole.take(whole.length / 2) // ends mid-movi
    Avi.demux(truncated).foreach { s =>
      assert(s.frames.length < 2 + 44 % 5)
    }
    // and the dispatcher degrades to FakeDecoder for the garbage case
    val feats = VideoCodec.decode(MediaRecord(1L, "video", garbage))
    assert(feats.isEmpty)
  }

  test("q30 end-to-end: every modality carries codec-decoded values") {
    import org.apache.spark.sql.functions.col
    val out = Multimodal.featuresQuery(spark, sf0001)
    val img = out.filter(col("kind") === "image").limit(5).collect()
    assert(img.nonEmpty)
    img.foreach { r =>
      val id = r.getLong(0)
      val (w, h) = (16 + id % 40, 16 + (id / 7) % 40)
      val fill = (id % 251) + (id % 241) + (id % 239)
      assert(r.getLong(2) == w && r.getLong(3) == h, s"doc $id: ${r.toString}")
      assert(r.getLong(7) == w * h * fill)
    }
    // audio rows carry real WAV-decoded values: byte_len is the decoded
    // PCM byte count derived from doc_id, not the text length
    val audio = out.filter(col("kind") === "audio").limit(3).collect()
    audio.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(6) == (64 + id % 64) * 2, s"doc $id: $r")
      assert(r.getLong(2) == 8000 + (id % 8) * 1000)
    }
    // video rows carry real AVI-decoded values: byte_len is the decoded
    // raster byte count across frames
    val video = out.filter(col("kind") === "video").limit(3).collect()
    video.foreach { r =>
      val id = r.getLong(0)
      val (w, h, n) = (8 + id % 40, 8 + (id / 5) % 40, 2 + id % 5)
      assert(r.getLong(6) == n * w * h * 3, s"doc $id: $r")
      assert(r.getLong(2) == w && r.getLong(3) == h)
    }
  }

  test("q47 emits decoded per-frame rows for video only, every 2nd frame") {
    import org.apache.spark.sql.functions.col
    val frames = Multimodal.framesQuery(spark, sf0001)
    val kinds = frames.select("kind").distinct().collect().map(_.getString(0)).toSet
    assert(kinds == Set("video"), s"got $kinds")
    val rows = frames.filter(col("doc_id") === 44L).collect()
    val (w, h, n) = (8 + 44 % 40, 8 + (44 / 5) % 40, 2 + 44 % 5)
    assert(rows.map(_.getLong(2)).toSeq == (0 until n by 2).map(_.toLong))
    rows.foreach { r =>
      val f = r.getLong(2).toInt
      val v = (44 % 200 + f * 17) % 256
      assert(r.getLong(3) == w.toLong * h * 3)
      assert(r.getLong(4) == w.toLong * h * 3 * v, s"frame $f: $r")
      assert(r.getLong(5) == (math.min(w, 32).toLong * math.min(h, 32) * 3 * v) % 997)
    }
  }

  test("image content identity: PNG and BMP of one picture hash identically") {
    import Multimodal._
    import spark.implicits._
    val media = Seq(
      MediaRecord(1L, "image", PngSynth.encode(5L)),
      MediaRecord(2L, "image", BmpSynth.encode(5L)), // same pixels, other codec
      MediaRecord(3L, "image", PngSynth.encode(6L)), // different picture
      MediaRecord(4L, "image", Array[Byte](1, 2, 3)), // unrecognized: dropped
      MediaRecord(5L, "image", {
        // sniffs as PNG but the body is stomped: dropped, never clustered
        val b = PngSynth.encode(5L); java.util.Arrays.fill(b, 16, b.length, 0.toByte); b
      })).toDS()
    val ids = imageIdentities(media).collect().sortBy(_.doc_id)
    assert(ids.map(_.doc_id).toSeq == Seq(1L, 2L, 3L), s"got ${ids.toSeq}")
    val Seq(a, b, c) = ids.toSeq
    // cross-format collision is THE point: different bytes, same raster
    assert(!java.util.Arrays.equals(PngSynth.encode(5L), BmpSynth.encode(5L)))
    assert(a.content_h == b.content_h)
    assert(a.fmt == "png" && b.fmt == "bmp")
    assert(c.content_h != a.content_h, "different pictures must not collide")
  }
}
