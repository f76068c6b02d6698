package graft.source

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import java.io.RandomAccessFile
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util
import scala.jdk.CollectionConverters._

/** GridFS-style source: large files exposed as chunk rows (binary mode) or
  * delimiter-split token rows (text mode), one partition per chunk —
  * the scan surface of the reference's GridFSInputFormat
  * (core/.../GridFSInputFormat.java:41-154: per-chunk splits, binary
  * chunks or regex-delimited text tokens), re-expressed as a DSv2 source.
  *
  * Options: `path`, `mode` (binary|text), `chunk_size` (bytes, default
  * 1 MiB), `delimiter` (text mode literal, default "\n"),
  * `delimiter_regex` (text mode regex — GridFSInputFormat.java:284-320's
  * delimiter pattern; overrides `delimiter`), `whole_file` (one partition
  * per file, GridFSInputFormat.java:55-63). Text tokens that span a chunk
  * boundary belong to the chunk containing their first byte (the standard
  * record-split rule), so no token is lost or duplicated — including a
  * MULTI-BYTE delimiter straddling the boundary, which the regex reader
  * handles with a bounded backward window (the reference drops the
  * following token in that case).
  */
class GraftGridFsSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graftgridfs"
  override def supportsExternalMetadata(): Boolean = false

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftGridFsSource.schemaFor(options.getOrDefault("mode", "binary"))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GridFsTable(schema, properties.asScala.toMap)
}

object GraftGridFsSource {
  def schemaFor(mode: String): StructType = mode match {
    case "text" => StructType(Seq(
      StructField("file_name", StringType, nullable = false),
      StructField("chunk_id", IntegerType, nullable = false),
      StructField("token_id", LongType, nullable = false),
      StructField("token", StringType, nullable = false)))
    case _ => StructType(Seq(
      StructField("file_name", StringType, nullable = false),
      StructField("chunk_id", IntegerType, nullable = false),
      StructField("offset", LongType, nullable = false),
      StructField("length", LongType, nullable = false),
      StructField("content", BinaryType, nullable = false)))
  }

  def listFiles(path: String): Seq[String] = {
    val p = Paths.get(path)
    if (Files.isDirectory(p)) {
      val stream = Files.list(p)
      try stream.iterator().asScala
        .filter(Files.isRegularFile(_))
        .filterNot(_.getFileName.toString.startsWith("."))
        .map(_.toString).toSeq.sorted
      finally stream.close()
    } else if (Files.exists(p)) Seq(path)
    else Seq.empty
  }
}

final class GridFsTable(tableSchema: StructType, properties: Map[String, String])
    extends Table with SupportsRead {
  override def name(): String = s"graftgridfs:${properties.getOrElse("path", "?")}"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val opts = properties ++ options.asScala
    new ScanBuilder {
      override def build(): Scan = new GridFsScan(opts)
    }
  }
}

final class GridFsScan(options: Map[String, String]) extends Scan with Batch {
  private val mode = options.getOrElse("mode", "binary")
  private val chunkSize = options.get("chunk_size").map(_.toLong).getOrElse(1L << 20)
  private val wholeFile = options.get("whole_file").exists(_.toBoolean)
  // readers materialize chunk (+ lookahead) as one JVM array — refuse a
  // chunk_size that would overflow the Int cast instead of silently
  // truncating the buffer
  require(chunkSize > 0 && chunkSize <= Int.MaxValue.toLong - (16L << 20),
    s"chunk_size $chunkSize out of range (must fit a JVM array with lookahead)")

  override def readSchema(): StructType = GraftGridFsSource.schemaFor(mode)
  override def toBatch: Batch = this
  override def description(): String =
    s"GridFsScan mode=$mode chunk=$chunkSize wholeFile=$wholeFile"

  override def planInputPartitions(): Array[InputPartition] = {
    val files = GraftGridFsSource.listFiles(options.getOrElse("path",
      throw new IllegalArgumentException("path option required")))
    files.flatMap { f =>
      val len = Files.size(Paths.get(f))
      if (wholeFile) { // one split per file (GridFSInputFormat.java:55-63)
        // readers materialize one buffer/row for the whole split — a JVM
        // array caps at 2 GiB, so refuse loudly instead of overflowing
        require(len < Int.MaxValue.toLong,
          s"whole_file=true cannot read $f (${len}B >= 2GiB); use chunked mode")
        Seq(GridFsPartition(f, 0, 0L, len): InputPartition)
      }
      else {
        val n = math.max(1L, (len + chunkSize - 1) / chunkSize)
        (0L until n).map(i => GridFsPartition(f, i.toInt,
          i * chunkSize, math.min((i + 1) * chunkSize, len)): InputPartition)
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GridFsReaderFactory(mode, options.getOrElse("delimiter", "\n"),
      options.get("delimiter_regex"))
}

final class GridFsReaderFactory(mode: String, delimiter: String,
    delimiterRegex: Option[String] = None)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GridFsPartition]
    if (mode == "text") delimiterRegex match {
      case Some(re) => new GridFsRegexTextReader(p, re)
      case None => new GridFsTextReader(p, delimiter)
    }
    else new GridFsBinaryReader(p)
  }
}

final case class GridFsPartition(path: String, chunkId: Int, start: Long, end: Long)
    extends InputPartition

/** One row: the chunk's bytes. */
final class GridFsBinaryReader(p: GridFsPartition) extends PartitionReader[InternalRow] {
  private var done = false
  private var current: InternalRow = _

  override def next(): Boolean = {
    if (done) return false
    val raf = new RandomAccessFile(p.path, "r")
    try {
      val len = (p.end - p.start).toInt
      val bytes = new Array[Byte](len)
      raf.seek(p.start)
      raf.readFully(bytes)
      current = new GenericInternalRow(Array[Any](
        UTF8String.fromString(Paths.get(p.path).getFileName.toString),
        p.chunkId, p.start, len.toLong, bytes))
    } finally raf.close()
    done = true
    true
  }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}

/** Regex-delimited text tokens (the GridFSTextRecordReader pattern mode,
  * GridFSInputFormat.java:232-320), with the same ownership rule as the
  * literal reader: the chunk containing a token's first byte owns it.
  *
  * Offsets are byte-exact: the window decodes as ISO-8859-1 (1 byte = 1
  * char, lossless) for matching, and owned token byte-ranges re-decode as
  * UTF-8 for the row. A delimiter match straddling the chunk START is seen
  * whole via a `BackWindow`-byte backward extension — fixed-length
  * delimiters up to that size split exactly across boundaries (where the
  * reference's forward-only matcher drops the token after the boundary).
  */
final class GridFsRegexTextReader(p: GridFsPartition, pattern: String)
    extends PartitionReader[InternalRow] {
  private val Lookahead = 8L << 20
  private val BackWindow = 1 << 10
  private val fileLen = Files.size(Paths.get(p.path))

  private val bufStart = math.max(0L, p.start - BackWindow)
  private val bufEnd = math.min(fileLen, p.end + Lookahead)
  private val buf: Array[Byte] = {
    val raf = new RandomAccessFile(p.path, "r")
    try {
      val arr = new Array[Byte]((bufEnd - bufStart).toInt)
      raf.seek(bufStart)
      raf.readFully(arr)
      arr
    } finally raf.close()
  }

  /** Token (startRel, endRel) ranges owned by this chunk. */
  private val tokens: Iterator[(Int, Int)] = {
    val text = new String(buf, StandardCharsets.ISO_8859_1)
    val m = java.util.regex.Pattern.compile(pattern).matcher(text)
    def owned(startAbs: Long): Boolean =
      (startAbs == 0 && p.start == 0) || (startAbs > p.start && startAbs <= p.end)
    val out = Vector.newBuilder[(Int, Int)]
    var lastEnd = 0
    var stop = false
    while (!stop && m.find()) { // find() self-advances past zero-width matches
      if (owned(bufStart + lastEnd)) out += ((lastEnd, m.start))
      lastEnd = m.end
      if (bufStart + lastEnd > p.end) stop = true // next token starts beyond us
    }
    // tail token (no further delimiter): complete only if the window
    // reached EOF; an owned token running past the lookahead must FAIL,
    // not be silently dropped
    if (!stop && owned(bufStart + lastEnd) && lastEnd < buf.length) {
      if (bufEnd == fileLen) out += ((lastEnd, buf.length))
      else throw new IllegalStateException(
        s"token starting at byte ${bufStart + lastEnd} of ${p.path} exceeds the " +
          s"${Lookahead}B lookahead; raise chunk_size or use whole_file=true")
    }
    out.result().iterator
  }

  private var tokenIndex = 0L
  private var current: InternalRow = _

  override def next(): Boolean =
    if (!tokens.hasNext) false
    else {
      val (s, e) = tokens.next()
      current = new GenericInternalRow(Array[Any](
        UTF8String.fromString(Paths.get(p.path).getFileName.toString),
        p.chunkId, tokenIndex,
        UTF8String.fromString(new String(
          java.util.Arrays.copyOfRange(buf, s, e), StandardCharsets.UTF_8))))
      tokenIndex += 1
      true
    }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}

/** Tokens whose first byte lies in [start, end), delimiter-split; reads
  * past `end` (bounded lookahead) to finish a spanning token, skips the
  * partial token at the head of non-first chunks.
  */
final class GridFsTextReader(p: GridFsPartition, delimiter: String)
    extends PartitionReader[InternalRow] {
  private val Lookahead = 8L << 20
  private val delim = delimiter.getBytes(StandardCharsets.UTF_8)
  private val fileLen = Files.size(Paths.get(p.path))

  // Ownership rule: a token starting at byte s (preceded by a delimiter
  // ending at s) belongs to the chunk containing byte s-1 — i.e. chunk
  // [start,end) owns tokens with start < s <= end (chunk 0 also owns s=0).
  // The scan window begins delimLen-1 bytes BEFORE the chunk so a
  // delimiter straddling the boundary is still seen whole.
  private val bufStart = math.max(0L, p.start - (delim.length - 1))
  private val bufEnd = math.min(fileLen, p.end + Lookahead)
  private val buf: Array[Byte] = {
    val raf = new RandomAccessFile(p.path, "r")
    try {
      val arr = new Array[Byte]((bufEnd - bufStart).toInt)
      raf.seek(bufStart)
      raf.readFully(arr)
      arr
    } finally raf.close()
  }

  private def indexOfDelim(from: Int): Int = {
    var i = from
    while (i <= buf.length - delim.length) {
      var j = 0
      while (j < delim.length && buf(i + j) == delim(j)) j += 1
      if (j == delim.length) return i
      i += 1
    }
    -1
  }

  // relative cursor at the first owned token: chunk 0 starts at 0, later
  // chunks start after the first delimiter in the window (any delimiter
  // found there ends strictly after p.start, so the token it opens is ours)
  private var cur: Int =
    if (p.start == 0) 0
    else indexOfDelim(0) match {
      case -1 => buf.length
      case i => i + delim.length
    }
  private var tokenIndex = 0L
  private var current: InternalRow = _

  override def next(): Boolean = {
    val abs = bufStart + cur
    if (abs >= fileLen || abs > p.end || cur >= buf.length) return false
    val hit = indexOfDelim(cur)
    // a token running past the lookahead window must FAIL, not be
    // silently emitted truncated (the rest would never appear anywhere)
    if (hit == -1 && bufEnd < fileLen)
      throw new IllegalStateException(
        s"token starting at byte $abs of ${p.path} exceeds the ${Lookahead}B " +
          "lookahead; raise chunk_size or use whole_file=true")
    val tokenEnd = if (hit == -1) buf.length else hit
    current = new GenericInternalRow(Array[Any](
      UTF8String.fromString(Paths.get(p.path).getFileName.toString),
      p.chunkId, tokenIndex,
      UTF8String.fromBytes(java.util.Arrays.copyOfRange(buf, cur, tokenEnd))))
    tokenIndex += 1
    cur = if (hit == -1) buf.length else hit + delim.length
    true
  }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}
