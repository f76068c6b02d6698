package graft.files

import graft.bson.{BDoc, BsonCodec}

import java.io.{BufferedOutputStream, DataOutputStream, FileOutputStream, RandomAccessFile}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Path, Paths}

/** BSON dump-file IO: sequential doc writer with an optional `.splits`
  * side file of doc-boundary offsets, and a reader that can open at an
  * arbitrary byte offset and resync to the next document boundary.
  *
  * Behavior modeled on the reference's BSON split machinery
  * (core/.../splitter/BSONSplitter.java:222-437 — boundary snapping,
  * side-file cache; core/.../input/BSONFileRecordReader.java:95-223 —
  * positioned reads), re-expressed as plain JVM IO for Spark partitions.
  */
object BsonFiles {

  val MaxDocSize: Int = 16 * 1024 * 1024 // BSON spec document cap
  val MinDocSize: Int = 5

  /** Incremental dump writer: append docs one at a time with bounded
    * memory (the write path must never buffer a partition's worth of rows
    * — reference: MongoRecordWriter streams to its temp file,
    * core/.../output/MongoRecordWriter.java:49-120). `close()` finalizes
    * the `.splits` side file.
    */
  final class Appender(path: String, splitsEvery: Int = 64) {
    private val out = new DataOutputStream(
      new BufferedOutputStream(new FileOutputStream(path), 1 << 20))
    private val offsets = Vector.newBuilder[Long]
    private var pos = 0L
    private var n = 0L

    def append(d: BDoc): Unit = {
      if (n % splitsEvery == 0) offsets += pos
      val bytes = BsonCodec.encode(d)
      out.write(bytes)
      pos += bytes.length
      n += 1
    }

    def count: Long = n

    def close(): Long = {
      out.close()
      writeSplitsFile(path, offsets.result())
      n
    }
  }

  /** Write docs to `path`; returns the doc count. Side file
    * `.{name}.splits` stores one offset per `splitsEvery` docs.
    */
  def write(path: String, docs: Iterator[BDoc], splitsEvery: Int = 64): Long = {
    val app = new Appender(path, splitsEvery)
    try docs.foreach(app.append)
    finally app.close()
    app.count
  }

  private def splitsPath(path: String): Path = {
    val p = Paths.get(path)
    p.resolveSibling("." + p.getFileName.toString + ".splits")
  }

  private def writeSplitsFile(path: String, offsets: Vector[Long]): Unit = {
    val buf = ByteBuffer.allocate(offsets.length * 8).order(ByteOrder.LITTLE_ENDIAN)
    offsets.foreach(buf.putLong)
    Files.write(splitsPath(path), buf.array())
  }

  def readSplitsFile(path: String): Option[Vector[Long]] = {
    val sp = splitsPath(path)
    if (!Files.exists(sp)) None
    else {
      val bytes = Files.readAllBytes(sp)
      val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      val out = Vector.newBuilder[Long]
      while (buf.remaining() >= 8) out += buf.getLong
      Some(out.result())
    }
  }

  /** Every document-start offset of an uncompressed dump: the `.splits`
    * side file when present (stride-sampled boundaries — exact starts,
    * just not all of them), else ONE buffered sequential header skim
    * (read 4-byte length, skip payload). O(file) sequential IO, never
    * O(samples x docs) random walks.
    */
  def docOffsets(path: String): Vector[Long] = {
    readSplitsFile(path) match {
      case Some(offs) if offs.nonEmpty => offs
      case _ =>
        val len = Files.size(Paths.get(path))
        val in = new java.io.DataInputStream(new java.io.BufferedInputStream(
          Files.newInputStream(Paths.get(path)), 1 << 20))
        val out = Vector.newBuilder[Long]
        try {
          var pos = 0L
          while (pos + 4 <= len) {
            out += pos
            val b0 = in.read(); val b1 = in.read(); val b2 = in.read(); val b3 = in.read()
            val dlen = (b0 & 0xff) | ((b1 & 0xff) << 8) | ((b2 & 0xff) << 16) | ((b3 & 0xff) << 24)
            require(dlen >= MinDocSize && dlen <= MaxDocSize && pos + dlen <= len,
              s"corrupt BSON doc header at $pos in $path (len=$dlen)")
            in.skipNBytes(dlen - 4)
            pos += dlen
          }
        } finally in.close()
        out.result()
    }
  }

  /** Decode the single document starting at a KNOWN boundary offset (no
    * resync walk — callers must pass an offset from [[docOffsets]] /
    * the side file).
    */
  def readDocAt(path: String, offset: Long): BDoc = {
    val raf = new java.io.RandomAccessFile(path, "r")
    try {
      raf.seek(offset)
      val lenBuf = new Array[Byte](4)
      raf.readFully(lenBuf)
      val dlen = ByteBuffer.wrap(lenBuf).order(ByteOrder.LITTLE_ENDIAN).getInt
      require(dlen >= MinDocSize && dlen <= MaxDocSize,
        s"corrupt BSON doc header at $offset in $path (len=$dlen)")
      val bytes = new Array[Byte](dlen)
      raf.seek(offset)
      raf.readFully(bytes)
      BsonCodec.decode(bytes)
    } finally raf.close()
  }

  /** First document boundary at or after `target`: prefer the side file,
    * else scan-and-validate (the resync heuristic — a plausible int32
    * length, 0x00 terminator, and a plausible following header).
    */
  def startingPosition(path: String, target: Long): Long = {
    val fileLen = Files.size(Paths.get(path))
    if (target <= 0) return 0L
    if (target >= fileLen) return fileLen
    readSplitsFile(path) match {
      case Some(offsets) =>
        // first cached boundary >= target, then walk doc-by-doc from the
        // previous cached boundary for the exact one
        val prev = offsets.takeWhile(_ < target).lastOption.getOrElse(0L)
        walkToBoundary(path, prev, target, fileLen)
      case None =>
        walkToBoundary(path, 0L, target, fileLen)
    }
  }

  private def walkToBoundary(path: String, from: Long, target: Long, fileLen: Long): Long = {
    // buffered header skim (read 4-byte length, skip payload) — replaces
    // the per-document seek+read walk
    val fin = new java.io.FileInputStream(path)
    try {
      fin.getChannel.position(from)
      val in = new java.io.BufferedInputStream(fin, 1 << 20)
      var pos = from
      val lenBuf = new Array[Byte](4)
      while (pos < target) {
        if (in.readNBytes(lenBuf, 0, 4) < 4)
          throw new IllegalStateException(s"corrupt BSON doc header at $pos in $path")
        val len = (lenBuf(0) & 0xff) | ((lenBuf(1) & 0xff) << 8) |
          ((lenBuf(2) & 0xff) << 16) | ((lenBuf(3) & 0xff) << 24)
        require(len >= MinDocSize && len <= MaxDocSize && pos + len <= fileLen,
          s"corrupt BSON doc header at $pos in $path (len=$len)")
        in.skipNBytes(len - 4)
        pos += len
      }
      pos
    } finally fin.close()
  }

  /** Doc iterator that owns an OS resource: callers that may stop early
    * (limit pushdown, task kill) must call `close()` — exhaustion also
    * closes, so fully-drained iterators need no extra handling.
    */
  trait CloseableDocIterator extends Iterator[BDoc] with AutoCloseable

  /** Iterate docs whose START offset lies in [start, end). The reader may
    * read past `end` to finish the last document (standard split rule).
    * With `fields` set, non-listed fields are byte-skipped during decode
    * (projection pushdown into the decoder); entries may be DOTTED paths
    * — `"a.small"` decodes only that subfield of subdocument `a`, the
    * sibling subfields' bytes are never materialized
    * ([[BsonCodec.Proj]]).
    */
  def readRange(path: String, start: Long, end: Long,
      fields: Option[Set[String]] = None): CloseableDocIterator = {
    if (isCompressed(path)) {
      require(start == 0L, s"compressed BSON is unsplittable, got start=$start")
      return readCompressed(path)
    }
    // one trie per iterator, not per document
    val proj: Option[BsonCodec.Proj] = fields.map(BsonCodec.Proj.fromPaths)
    val fileLen = Files.size(Paths.get(path))
    val begin = startingPosition(path, start)
    new CloseableDocIterator {
      // split reads are SEQUENTIAL: one positioned stream + a 1 MiB
      // buffer replaces the former per-document seek+read pair on a
      // RandomAccessFile (two syscalls per doc — the dominant cost of
      // every store/dump scan at small doc sizes)
      private val fin = new java.io.FileInputStream(path)
      fin.getChannel.position(begin)
      private val in = new java.io.BufferedInputStream(fin, 1 << 20)
      private val lenBuf = new Array[Byte](4)
      private var closed = false
      private var pos = begin
      override def close(): Unit = if (!closed) { in.close(); closed = true }
      override def hasNext: Boolean = {
        val more = !closed && pos < math.min(end, fileLen)
        if (!more) close()
        more
      }
      override def next(): BDoc = {
        if (in.readNBytes(lenBuf, 0, 4) < 4)
          throw new java.io.EOFException(s"truncated BSON doc header at $pos in $path")
        val len = (lenBuf(0) & 0xff) | ((lenBuf(1) & 0xff) << 8) |
          ((lenBuf(2) & 0xff) << 16) | ((lenBuf(3) & 0xff) << 24)
        val bytes = new Array[Byte](len)
        System.arraycopy(lenBuf, 0, bytes, 0, 4)
        if (in.readNBytes(bytes, 4, len - 4) < len - 4)
          throw new java.io.EOFException(s"truncated BSON doc at $pos in $path")
        pos += len
        val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
        proj match {
          case Some(p) => BsonCodec.readDocProjected(buf, p)
          case None => BsonCodec.readDoc(buf)
        }
      }
    }
  }

  /** Number of documents in an uncompressed dump: ONE buffered header
    * skim (read each 4-byte length, skip the payload) — no decode, no
    * per-doc seeks. The stats source for collStats-style sizing.
    */
  def countDocs(path: String): Long = {
    val len = Files.size(Paths.get(path))
    val in = new java.io.BufferedInputStream(
      Files.newInputStream(Paths.get(path)), 1 << 20)
    val lenBuf = new Array[Byte](4)
    var n = 0L
    var pos = 0L
    try {
      while (pos + 4 <= len) {
        if (in.readNBytes(lenBuf, 0, 4) < 4)
          throw new IllegalStateException(s"corrupt BSON doc header at $pos in $path")
        val dlen = (lenBuf(0) & 0xff) | ((lenBuf(1) & 0xff) << 8) |
          ((lenBuf(2) & 0xff) << 16) | ((lenBuf(3) & 0xff) << 24)
        require(dlen >= MinDocSize && dlen <= MaxDocSize && pos + dlen <= len,
          s"corrupt BSON doc header at $pos in $path (len=$dlen)")
        in.skipNBytes(dlen - 4)
        pos += dlen
        n += 1
      }
    } finally in.close()
    n
  }

  def readAll(path: String): CloseableDocIterator =
    if (isCompressed(path)) readCompressed(path)
    else readRange(path, 0L, Files.size(Paths.get(path)))

  /** Compression codecs by file extension — the CompressionCodecFactory
    * analog (reference: BSONFileInputFormat.java:56-64 detects any
    * configured Hadoop codec). All are JVM-local decoders: gzip/deflate
    * from the JDK, bzip2/snappy/lz4/xz from commons-compress, zstd via
    * zstd-jni — every codec a standard Spark distribution ships.
    */
  val codecExtensions: Seq[String] =
    Seq(".gz", ".bz2", ".snappy", ".lz4", ".zst", ".zstd", ".xz", ".deflate")

  def isCompressed(path: String): Boolean =
    codecExtensions.exists(path.endsWith)

  private def codecStream(path: String, raw: java.io.InputStream): java.io.InputStream = {
    import org.apache.commons.compress.compressors.bzip2.BZip2CompressorInputStream
    import org.apache.commons.compress.compressors.lz4.FramedLZ4CompressorInputStream
    import org.apache.commons.compress.compressors.snappy.FramedSnappyCompressorInputStream
    import org.apache.commons.compress.compressors.xz.XZCompressorInputStream
    import org.apache.commons.compress.compressors.zstandard.ZstdCompressorInputStream
    if (path.endsWith(".gz")) new java.util.zip.GZIPInputStream(raw)
    else if (path.endsWith(".bz2")) new BZip2CompressorInputStream(raw, true)
    else if (path.endsWith(".snappy")) new FramedSnappyCompressorInputStream(raw)
    else if (path.endsWith(".lz4")) new FramedLZ4CompressorInputStream(raw, true)
    else if (path.endsWith(".zst") || path.endsWith(".zstd")) new ZstdCompressorInputStream(raw)
    else if (path.endsWith(".xz")) new XZCompressorInputStream(raw, true)
    else if (path.endsWith(".deflate")) new java.util.zip.InflaterInputStream(raw)
    else throw new IllegalArgumentException(s"no codec for $path")
  }

  /** Sequential decode of a compressed dump. Compressed files are
    * UNSPLITTABLE — always one split covering the whole stream (the
    * reference's rule, BSONFileInputFormat.java:56-64,106-113).
    */
  def readCompressed(path: String): CloseableDocIterator = {
    val in = codecStream(path,
      new java.io.BufferedInputStream(Files.newInputStream(Paths.get(path)), 1 << 20))
    new CloseableDocIterator {
      private var closed = false
      private var nextDoc: BDoc = advance()
      override def close(): Unit = if (!closed) { in.close(); closed = true }
      private def advance(): BDoc = {
        val lenBuf = new Array[Byte](4)
        val first = in.readNBytes(lenBuf, 0, 4)
        if (first < 4) { close(); return null }
        val len = ByteBuffer.wrap(lenBuf).order(ByteOrder.LITTLE_ENDIAN).getInt
        val rest = new Array[Byte](len - 4)
        if (in.readNBytes(rest, 0, len - 4) < len - 4) { close(); return null }
        val all = new Array[Byte](len)
        System.arraycopy(lenBuf, 0, all, 0, 4)
        System.arraycopy(rest, 0, all, 4, len - 4)
        BsonCodec.decode(all)
      }
      override def hasNext: Boolean = nextDoc != null
      override def next(): BDoc = {
        val d = nextDoc
        nextDoc = advance()
        d
      }
    }
  }

  /** Byte-range splits at `targetSize`, ends snapped later by the reader's
    * boundary resync (split rule: a doc belongs to the split containing
    * its first byte).
    */
  def planByteSplits(path: String, targetSize: Long): Seq[(Long, Long)] = {
    val len = Files.size(Paths.get(path))
    if (len == 0) Seq.empty
    else if (isCompressed(path)) Seq((0L, Long.MaxValue)) // unsplittable
    else {
      val n = math.max(1L, (len + targetSize - 1) / targetSize)
      (0L until n).map(i => (i * targetSize, math.min((i + 1) * targetSize, len)))
    }
  }
}
