package graft.multimodal

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

/** RIFF/AVI video container support, JDK-only.
  *
  * ==Why this exists==
  * Video was the catalog's one remaining multimodal stub ("no JDK video
  * codec exists"). That is true for H.264-class codecs, but an AVI
  * container with raw-DIB (BI_RGB) or MJPEG frames is fully decodable
  * with what the JDK ships: RIFF chunk parsing is plain byte work (the
  * same family as the WAV path — WAV *is* RIFF) and MJPEG frames are
  * JPEG streams `javax.imageio` decodes natively. So the video arm of
  * q30/q47 can round-trip REAL video files: a genuine AVI container is
  * synthesized per row ([[AviSynth]]), then demuxed ([[AviCodec.demux]]:
  * real chunk walk, real `strh`/`strf` header parse, real `movi` frame
  * extraction) and per-frame decoded (raw bottom-up stride-padded BGR
  * reconstruction for BI_RGB; `ImageIO` for MJPEG).
  *
  * The reference treats media payloads as opaque binary streams carried
  * through splits (GridFS chunk reads, core/src/main/java/com/mongodb/
  * hadoop/input/GridFSSplit.java); the decode stage itself is outside
  * its scope, so this is catalog surplus, built Spark-side as the same
  * partition-local `mapPartitions` codec boundary as image/audio.
  *
  * ==Format notes (public spec)==
  * AVI is `RIFF('AVI ' LIST('hdrl' avih LIST('strl' strh strf))
  * LIST('movi' 00db|00dc...) idx1)`. All integers little-endian. Raw
  * video frames ('00db') are DIB rasters: 24bpp BGR, rows padded to
  * 4-byte stride, stored BOTTOM-UP when biHeight > 0. MJPEG frames
  * ('00dc', biCompression fourcc 'MJPG') are standalone JPEG streams.
  */
object Avi {
  // in-memory MJPEG frames must not round-trip ImageIO's disk-backed
  // stream cache (a temp file per frame) — see the Multimodal init note
  javax.imageio.ImageIO.setUseCache(false)


  private[multimodal] def fourcc(s: String): Int =
    (s(0) & 0xff) | ((s(1) & 0xff) << 8) | ((s(2) & 0xff) << 16) | ((s(3) & 0xff) << 24)

  val FccRiff: Int = fourcc("RIFF")
  val FccAvi: Int = fourcc("AVI ")
  val FccList: Int = fourcc("LIST")
  val FccHdrl: Int = fourcc("hdrl")
  val FccAvih: Int = fourcc("avih")
  val FccStrl: Int = fourcc("strl")
  val FccStrh: Int = fourcc("strh")
  val FccStrf: Int = fourcc("strf")
  val FccMovi: Int = fourcc("movi")
  val FccIdx1: Int = fourcc("idx1")
  val FccVids: Int = fourcc("vids")
  val FccDib: Int = fourcc("DIB ")
  val FccMjpg: Int = fourcc("MJPG")
  val Fcc00db: Int = fourcc("00db")
  val Fcc00dc: Int = fourcc("00dc")

  /** 4-byte-aligned row stride of a 24bpp DIB. */
  def stride(w: Int): Int = ((w * 3 + 3) / 4) * 4

  // ---------------------------------------------------------------------
  // Writer
  // ---------------------------------------------------------------------

  private final class LeOut {
    val bos = new ByteArrayOutputStream(4096)
    def u32(v: Int): Unit = {
      bos.write(v & 0xff); bos.write((v >>> 8) & 0xff)
      bos.write((v >>> 16) & 0xff); bos.write((v >>> 24) & 0xff)
    }
    def u16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >>> 8) & 0xff) }
    def bytes(b: Array[Byte]): Unit = bos.write(b, 0, b.length)
    def size: Int = bos.size()
  }

  /** Write a real AVI file around pre-encoded frame chunks.
    *
    * @param frames each element is ONE frame's chunk payload — a raw
    *               bottom-up stride-padded BGR raster for BI_RGB, or a
    *               complete JPEG stream for MJPEG
    * @param compression 0 (BI_RGB) or [[FccMjpg]]
    */
  def write(w: Int, h: Int, fps: Int, compression: Int,
      frames: Seq[Array[Byte]]): Array[Byte] = {
    val n = frames.length
    val maxFrame = if (frames.isEmpty) 0 else frames.map(_.length).max
    val chunkId = if (compression == 0) Fcc00db else Fcc00dc
    val handler = if (compression == 0) FccDib else FccMjpg

    val strf = new LeOut // BITMAPINFOHEADER
    strf.u32(40); strf.u32(w); strf.u32(h); strf.u16(1); strf.u16(24)
    strf.u32(compression); strf.u32(stride(w) * h)
    strf.u32(0); strf.u32(0); strf.u32(0); strf.u32(0)

    val strh = new LeOut // AVIStreamHeader
    strh.u32(FccVids); strh.u32(handler); strh.u32(0)
    strh.u16(0); strh.u16(0) // priority, language
    strh.u32(0) // initial frames
    strh.u32(1); strh.u32(fps) // scale, rate
    strh.u32(0); strh.u32(n) // start, length
    strh.u32(maxFrame); strh.u32(-1) // bufsize, quality
    strh.u32(0) // sample size
    strh.u16(0); strh.u16(0); strh.u16(w); strh.u16(h) // rcFrame

    val avih = new LeOut // MainAVIHeader
    avih.u32(if (fps > 0) 1000000 / fps else 0) // µs per frame
    avih.u32(0); avih.u32(0) // max bytes/sec, padding granularity
    avih.u32(0x10) // AVIF_HASINDEX
    avih.u32(n); avih.u32(0); avih.u32(1) // total frames, initial, streams
    avih.u32(maxFrame); avih.u32(w); avih.u32(h)
    avih.u32(0); avih.u32(0); avih.u32(0); avih.u32(0) // reserved

    def chunk(id: Int, body: Array[Byte]): Array[Byte] = {
      val o = new LeOut
      o.u32(id); o.u32(body.length); o.bytes(body)
      if (body.length % 2 == 1) o.bos.write(0) // RIFF even padding
      o.bos.toByteArray
    }
    def list(kind: Int, body: Array[Byte]): Array[Byte] = {
      val o = new LeOut
      o.u32(FccList); o.u32(body.length + 4); o.u32(kind); o.bytes(body)
      o.bos.toByteArray
    }

    val strl = list(FccStrl,
      chunk(FccStrh, strh.bos.toByteArray) ++ chunk(FccStrf, strf.bos.toByteArray))
    val hdrl = list(FccHdrl, chunk(FccAvih, avih.bos.toByteArray) ++ strl)

    val moviBody = new LeOut
    // idx1 offsets are measured from the position of the 'movi' fourcc
    val offsets = new Array[Int](n)
    frames.zipWithIndex.foreach { case (f, i) =>
      offsets(i) = moviBody.size + 4 // +4: the fourcc itself precedes the body
      moviBody.bytes(chunk(chunkId, f))
    }
    val movi = list(FccMovi, moviBody.bos.toByteArray)

    val idx = new LeOut
    frames.zipWithIndex.foreach { case (f, i) =>
      idx.u32(chunkId); idx.u32(0x10) // AVIIF_KEYFRAME
      idx.u32(offsets(i)); idx.u32(f.length)
    }
    val idx1 = chunk(FccIdx1, idx.bos.toByteArray)

    val riffBody = hdrl ++ movi ++ idx1
    val out = new LeOut
    out.u32(FccRiff); out.u32(riffBody.length + 4); out.u32(FccAvi)
    out.bytes(riffBody)
    out.bos.toByteArray
  }

  /** Encode one solid-gray raw-DIB frame (bottom-up, stride-padded BGR). */
  def solidDibFrame(w: Int, h: Int, v: Int): Array[Byte] = {
    val st = stride(w)
    val out = new Array[Byte](st * h)
    val b = (v & 0xff).toByte
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val o = y * st + x * 3
        out(o) = b; out(o + 1) = b; out(o + 2) = b
        x += 1
      }
      y += 1
    }
    out
  }

  /** Encode an arbitrary top-down RGB raster as a raw-DIB frame (flips to
    * bottom-up, writes BGR, pads the stride) — the writer-side inverse of
    * [[decodeDibFrame]], used by specs to pin orientation.
    */
  def rasterToDibFrame(w: Int, h: Int, topDownRgb: Array[Int]): Array[Byte] = {
    val st = stride(w)
    val out = new Array[Byte](st * h)
    var y = 0
    while (y < h) {
      val srcRow = h - 1 - y // DIB row y stores image row (h-1-y)
      var x = 0
      while (x < w) {
        val px = topDownRgb(srcRow * w + x)
        val o = y * st + x * 3
        out(o) = (px & 0xff).toByte // B
        out(o + 1) = ((px >> 8) & 0xff).toByte // G
        out(o + 2) = ((px >> 16) & 0xff).toByte // R
        x += 1
      }
      y += 1
    }
    out
  }

  // ---------------------------------------------------------------------
  // Demuxer / decoder
  // ---------------------------------------------------------------------

  /** A demuxed AVI video stream: parsed headers + per-frame chunk bytes.
    * `frames` hold the still-encoded chunk payloads; decode lazily with
    * [[decodeFrame]] so a sampling consumer never decodes skipped frames.
    */
  final case class AviStream(
      width: Int,
      height: Int,
      bitCount: Int,
      compression: Int,
      fps: Double,
      frames: IndexedSeq[Array[Byte]])

  def looksLikeAvi(b: Array[Byte]): Boolean =
    b != null && b.length > 12 && {
      val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
      bb.getInt(0) == FccRiff && bb.getInt(8) == FccAvi
    }

  /** Parse the container: walk the RIFF chunk tree, read `strh`/`strf`
    * for the FIRST video stream, collect its `movi` frame chunks. Any
    * malformation (truncated chunk, missing headers, non-video stream)
    * returns None — at corpus scale some payloads are always mangled and
    * a demuxer that throws kills the whole partition.
    */
  def demux(bytes: Array[Byte]): Option[AviStream] = {
    if (!looksLikeAvi(bytes)) return None
    try demuxUnsafe(bytes)
    catch { case _: RuntimeException | _: IndexOutOfBoundsException => None }
  }

  private def demuxUnsafe(bytes: Array[Byte]): Option[AviStream] = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    var w = -1; var h = -1; var bits = -1; var comp = -1
    var scale = 0; var rate = 0
    var isVideoStream = false
    val frames = IndexedSeq.newBuilder[Array[Byte]]

    // depth-bounded recursive chunk walk over [from, to)
    def walk(from: Int, to: Int, depth: Int): Unit = {
      var p = from
      while (p + 8 <= to) {
        val id = bb.getInt(p)
        val sz = bb.getInt(p + 4)
        if (sz < 0 || p + 8 + sz > to) return // truncated: stop cleanly
        if (id == FccList && sz >= 4 && depth < 8) {
          val kind = bb.getInt(p + 8)
          if (kind == FccHdrl || kind == FccStrl || kind == FccMovi)
            walk(p + 12, p + 8 + sz, depth + 1)
        } else if (id == FccStrh && sz >= 48) {
          // only the FIRST stream's headers are consumed
          if (w < 0) {
            isVideoStream = bb.getInt(p + 8) == FccVids
            scale = bb.getInt(p + 28)
            rate = bb.getInt(p + 32)
          }
        } else if (id == FccStrf && sz >= 40 && w < 0) {
          // BITMAPINFOHEADER of the stream whose strh we just read
          w = bb.getInt(p + 12)
          h = bb.getInt(p + 16)
          bits = bb.getShort(p + 22) & 0xffff
          comp = bb.getInt(p + 24)
        } else if ((id & 0xffff) == (Fcc00db & 0xffff) &&
            ((id >>> 16) == (Fcc00db >>> 16) || (id >>> 16) == (Fcc00dc >>> 16))) {
          // a '00db'/'00dc' frame chunk of stream 00 (LE fourcc: the
          // '00' stream id is the LOW half, the db/dc type the HIGH)
          val f = new Array[Byte](sz)
          System.arraycopy(bytes, p + 8, f, 0, sz)
          frames += f
        }
        p += 8 + sz + (sz & 1) // chunks are even-aligned
      }
    }
    // RIFF body spans [12, 8 + riffSize)
    val riffSize = bb.getInt(4)
    val end = math.min(bytes.length, 8L + riffSize).toInt
    walk(12, end, 0)

    if (w <= 0 || h <= 0 || !isVideoStream) None
    else if (comp != 0 && comp != FccMjpg) None // unsupported codec
    else if (comp == 0 && bits != 24) None // only 24bpp raw supported
    else Some(AviStream(w, h, bits, comp,
      if (scale > 0) rate.toDouble / scale else 0.0, frames.result()))
  }

  /** Decode frame `i` to a top-down row-major RGB raster
    * (`r<<16 | g<<8 | b`), or None when the frame bytes are unreadable.
    *
    *  - BI_RGB: real DIB reconstruction — bottom-up row flip, 4-byte
    *    stride skip, BGR→RGB channel order.
    *  - MJPG: the chunk is a standalone JPEG stream; `javax.imageio`
    *    does the real entropy decode.
    */
  def decodeFrame(s: AviStream, i: Int): Option[Array[Int]] = {
    if (i < 0 || i >= s.frames.length) return None
    val f = s.frames(i)
    if (s.compression == 0) {
      val st = stride(s.width)
      if (f.length < st * s.height) return None
      val out = new Array[Int](s.width * s.height)
      var y = 0
      while (y < s.height) {
        val srcRow = s.height - 1 - y // bottom-up storage
        var x = 0
        while (x < s.width) {
          val o = srcRow * st + x * 3
          out(y * s.width + x) =
            ((f(o + 2) & 0xff) << 16) | ((f(o + 1) & 0xff) << 8) | (f(o) & 0xff)
          x += 1
        }
        y += 1
      }
      Some(out)
    } else { // MJPG
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(f))
        catch { case _: java.io.IOException => null }
      if (img == null || img.getWidth != s.width || img.getHeight != s.height) None
      else Some(img.getRGB(0, 0, s.width, s.height, null, 0, s.width)
        .map(_ & 0xffffff))
    }
  }
}
