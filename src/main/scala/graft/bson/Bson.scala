package graft.bson

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import scala.collection.immutable.ListMap
import scala.collection.mutable

/** A minimal BSON value ADT (document model of the reference engine).
  *
  * The wire encoding below follows the public BSON spec (bsonspec.org):
  * little-endian, int32-length-prefixed documents, 1-byte type tags,
  * cstring field names. Only the types the reference actually round-trips
  * are implemented (SURVEY.md §1.3 inventory).
  */
sealed trait BsonValue {
  /** Canonical type order for cross-type comparison — the MongoDB sort
    * order reimplemented from its published semantics (reference:
    * core/src/main/java/com/mongodb/hadoop/util/BSONComparator.java:56-92).
    */
  def typeOrder: Int = this match {
    case BMinKey => 0
    case BNull => 1
    case _: BInt32 | _: BInt64 | _: BDouble => 2
    case _: BString | _: BSymbol => 3
    case _: BDoc => 4
    case _: BArray => 5
    case _: BBinary => 6
    case _: BObjectId => 7
    case _: BBool => 8
    case _: BDate | _: BTimestamp => 9
    case _: BRegex => 10
    case BMaxKey => 12
  }
}

case object BMinKey extends BsonValue
case object BMaxKey extends BsonValue
case object BNull extends BsonValue
final case class BInt32(v: Int) extends BsonValue
final case class BInt64(v: Long) extends BsonValue
final case class BDouble(v: Double) extends BsonValue
final case class BString(v: String) extends BsonValue
final case class BSymbol(v: String) extends BsonValue
final case class BBool(v: Boolean) extends BsonValue
final case class BDate(millis: Long) extends BsonValue
final case class BTimestamp(seconds: Int, ordinal: Int) extends BsonValue
final case class BObjectId(hex: String) extends BsonValue {
  require(hex.length == 24, s"ObjectId must be 24 hex chars, got $hex")
}
final case class BBinary(bytes: Array[Byte]) extends BsonValue {
  override def equals(o: Any): Boolean = o match {
    case BBinary(b) => java.util.Arrays.equals(bytes, b)
    case _ => false
  }
  override def hashCode(): Int = java.util.Arrays.hashCode(bytes)
}
final case class BRegex(pattern: String, options: String) extends BsonValue
final case class BArray(items: Vector[BsonValue]) extends BsonValue
final case class BDoc(fields: ListMap[String, BsonValue]) extends BsonValue {
  def get(name: String): Option[BsonValue] = fields.get(name)

  /** Dotted-path field retrieval (the reference's key-extraction rule,
    * core/.../util/MongoPathRetriever.java:11-23).
    */
  def getPath(path: String): Option[BsonValue] = {
    // fast path: undotted names skip the split() allocation — this is
    // the per-doc-per-field call of every matcher/extractor hot loop
    if (path.indexOf('.') < 0) fields.get(path)
    else path.split('.').foldLeft(Option[BsonValue](this)) {
      case (Some(BDoc(f)), seg) => f.get(seg)
      case _ => None
    }
  }
}

object BDoc {
  val empty: BDoc = BDoc(ListMap.empty[String, BsonValue])
  def apply(kvs: (String, BsonValue)*): BDoc = BDoc(ListMap(kvs: _*))
}

/** Cross-type total ordering: MinKey < Null < numbers < string < doc <
  * array < binary < ObjectId < bool < date < regex < MaxKey; numbers of
  * different widths compare as doubles.
  */
object BsonOrdering extends Ordering[BsonValue] {
  override def compare(a: BsonValue, b: BsonValue): Int = {
    val ta = a.typeOrder
    val tb = b.typeOrder
    if (ta != tb) return Integer.compare(ta, tb)
    (a, b) match {
      case (BMinKey, BMinKey) | (BMaxKey, BMaxKey) | (BNull, BNull) => 0
      case (x: BsonValue, y: BsonValue) if ta == 2 =>
        java.lang.Double.compare(numeric(x), numeric(y))
      case (BString(x), BString(y)) => x.compareTo(y)
      case (BSymbol(x), BSymbol(y)) => x.compareTo(y)
      case (BString(x), BSymbol(y)) => x.compareTo(y)
      case (BSymbol(x), BString(y)) => x.compareTo(y)
      case (BBool(x), BBool(y)) => java.lang.Boolean.compare(x, y)
      case (BDate(x), BDate(y)) => java.lang.Long.compare(x, y)
      case (BTimestamp(xs, xo), BTimestamp(ys, yo)) =>
        val c = Integer.compare(xs, ys)
        if (c != 0) c else Integer.compare(xo, yo)
      case (BDate(x), BTimestamp(ys, _)) => java.lang.Long.compare(x, ys * 1000L)
      case (BTimestamp(xs, _), BDate(y)) => java.lang.Long.compare(xs * 1000L, y)
      case (BObjectId(x), BObjectId(y)) => x.compareTo(y)
      case (BRegex(xp, xo), BRegex(yp, yo)) =>
        val c = xp.compareTo(yp)
        if (c != 0) c else xo.compareTo(yo)
      case (BBinary(x), BBinary(y)) =>
        val c = Integer.compare(x.length, y.length)
        if (c != 0) c
        else java.util.Arrays.compareUnsigned(x, y)
      case (BArray(x), BArray(y)) => compareSeq(x, y)
      case (BDoc(x), BDoc(y)) =>
        // structural: compare (name, value) pairs in document order
        val xi = x.iterator
        val yi = y.iterator
        while (xi.hasNext && yi.hasNext) {
          val (xn, xv) = xi.next()
          val (yn, yv) = yi.next()
          val cn = xn.compareTo(yn)
          if (cn != 0) return cn
          val cv = compare(xv, yv)
          if (cv != 0) return cv
        }
        java.lang.Boolean.compare(xi.hasNext, yi.hasNext)
      case _ => 0
    }
  }

  private def compareSeq(x: Vector[BsonValue], y: Vector[BsonValue]): Int = {
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val c = compare(x(i), y(i))
      if (c != 0) return c
      i += 1
    }
    Integer.compare(x.length, y.length)
  }

  def numeric(v: BsonValue): Double = v match {
    case BInt32(x) => x.toDouble
    case BInt64(x) => x.toDouble
    case BDouble(x) => x
    case _ => Double.NaN
  }
}

/** BSON wire codec (spec subset; public bsonspec.org layout). */
object BsonCodec {
  // type tags per the BSON spec
  private val TDouble: Byte = 0x01
  private val TString: Byte = 0x02
  private val TDoc: Byte = 0x03
  private val TArray: Byte = 0x04
  private val TBinary: Byte = 0x05
  private val TObjectId: Byte = 0x07
  private val TBool: Byte = 0x08
  private val TDate: Byte = 0x09
  private val TNull: Byte = 0x0a
  private val TRegex: Byte = 0x0b
  private val TDbPointer: Byte = 0x0c
  private val TCode: Byte = 0x0d
  private val TSymbol: Byte = 0x0e
  private val TCodeWScope: Byte = 0x0f
  private val TInt32: Byte = 0x10
  private val TTimestamp: Byte = 0x11
  private val TInt64: Byte = 0x12
  private val TDecimal128: Byte = 0x13
  private val TMinKey: Byte = 0xff.toByte
  private val TMaxKey: Byte = 0x7f

  /** Growable little-endian byte sink with int32 backpatching: the whole
    * document (all nesting levels) encodes into ONE buffer — subdocument
    * lengths are patched in place after their body is written — instead
    * of one builder + copy per nesting level and a fresh 4/8-byte array
    * per numeric value (the encoder is the per-row cost of every store
    * write and every seeded server collection).
    */
  private final class ByteSink(initial: Int = 256) {
    private var arr = new Array[Byte](initial)
    private var len = 0
    private def ensure(n: Int): Unit =
      if (len + n > arr.length) {
        var cap = arr.length << 1
        while (cap < len + n) cap <<= 1
        arr = java.util.Arrays.copyOf(arr, cap)
      }
    def size: Int = len
    def putByte(b: Byte): Unit = { ensure(1); arr(len) = b; len += 1 }
    def putBytes(bs: Array[Byte]): Unit = {
      ensure(bs.length)
      System.arraycopy(bs, 0, arr, len, bs.length)
      len += bs.length
    }
    def putInt(v: Int): Unit = {
      ensure(4)
      arr(len) = v.toByte
      arr(len + 1) = (v >>> 8).toByte
      arr(len + 2) = (v >>> 16).toByte
      arr(len + 3) = (v >>> 24).toByte
      len += 4
    }
    def putLong(v: Long): Unit = {
      ensure(8)
      var i = 0
      while (i < 8) { arr(len + i) = (v >>> (8 * i)).toByte; i += 1 }
      len += 8
    }
    def patchInt(pos: Int, v: Int): Unit = {
      arr(pos) = v.toByte
      arr(pos + 1) = (v >>> 8).toByte
      arr(pos + 2) = (v >>> 16).toByte
      arr(pos + 3) = (v >>> 24).toByte
    }
    def result(): Array[Byte] = java.util.Arrays.copyOf(arr, len)
  }

  def encode(doc: BDoc): Array[Byte] = {
    val out = new ByteSink()
    writeDoc(out, doc)
    out.result()
  }

  private def writeDoc(out: ByteSink, doc: BDoc): Unit = {
    val start = out.size
    out.putInt(0) // length backpatched below
    doc.fields.foreach { case (name, v) => writeElement(out, name, v) }
    out.putByte(0x00)
    out.patchInt(start, out.size - start)
  }

  private def writeElement(out: ByteSink, name: String, v: BsonValue): Unit = {
    def header(tag: Byte): Unit = {
      out.putByte(tag)
      out.putBytes(name.getBytes(StandardCharsets.UTF_8))
      out.putByte(0x00)
    }
    v match {
      case BDouble(x) => header(TDouble); out.putLong(java.lang.Double.doubleToLongBits(x))
      case BString(x) => header(TString); writeString(out, x)
      case BSymbol(x) => header(TSymbol); writeString(out, x)
      case d: BDoc => header(TDoc); writeDoc(out, d)
      case BArray(items) =>
        // array = embedded doc keyed "0","1",...: write it directly with
        // length backpatching (no intermediate ListMap per array)
        header(TArray)
        val start = out.size
        out.putInt(0)
        var i = 0
        items.foreach { it => writeElement(out, Integer.toString(i), it); i += 1 }
        out.putByte(0x00)
        out.patchInt(start, out.size - start)
      case BBinary(bytes) =>
        header(TBinary); out.putInt(bytes.length); out.putByte(0x00); out.putBytes(bytes)
      case BObjectId(hex) =>
        header(TObjectId)
        var i = 0
        while (i < 24) {
          out.putByte(((Character.digit(hex.charAt(i), 16) << 4) |
            Character.digit(hex.charAt(i + 1), 16)).toByte)
          i += 2
        }
      case BBool(x) => header(TBool); out.putByte((if (x) 1 else 0).toByte)
      case BDate(ms) => header(TDate); out.putLong(ms)
      case BNull => header(TNull)
      case BRegex(p, o) =>
        header(TRegex)
        out.putBytes(p.getBytes(StandardCharsets.UTF_8)); out.putByte(0x00)
        out.putBytes(o.getBytes(StandardCharsets.UTF_8)); out.putByte(0x00)
      case BInt32(x) => header(TInt32); out.putInt(x)
      case BTimestamp(s, ord) => header(TTimestamp); out.putInt(ord); out.putInt(s)
      case BInt64(x) => header(TInt64); out.putLong(x)
      case BMinKey => header(TMinKey)
      case BMaxKey => header(TMaxKey)
    }
  }

  private def writeString(out: ByteSink, s: String): Unit = {
    val b = s.getBytes(StandardCharsets.UTF_8)
    out.putInt(b.length + 1)
    out.putBytes(b)
    out.putByte(0x00)
  }

  def decode(bytes: Array[Byte], offset: Int = 0): BDoc = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    buf.position(offset)
    readDoc(buf)
  }

  /** Decode a document at the buffer's current position (advances it). */
  def readDoc(buf: ByteBuffer): BDoc = {
    val start = buf.position()
    val len = buf.getInt
    val fields = ListMap.newBuilder[String, BsonValue]
    while (buf.position() < start + len - 1) {
      val tag = buf.get()
      val name = readCString(buf)
      fields += name -> readValue(buf, tag)
    }
    require(buf.get() == 0x00, "document not 0x00-terminated")
    BDoc(fields.result())
  }

  /** Projected decode: top-level fields failing `needed` are SKIPPED
    * byte-wise without materializing values — the file-scan analog of the
    * reference's cursor projection / lazy decoding
    * (core/.../input/BSONFileRecordReader.java:117-123 LazyBSONDecoder).
    */
  def readDocProjected(buf: ByteBuffer, needed: String => Boolean): BDoc = {
    val start = buf.position()
    val len = buf.getInt
    val fields = ListMap.newBuilder[String, BsonValue]
    while (buf.position() < start + len - 1) {
      val tag = buf.get()
      val name = readCString(buf)
      if (needed(name)) fields += name -> readValue(buf, tag)
      else skipValue(buf, tag)
    }
    require(buf.get() == 0x00, "document not 0x00-terminated")
    BDoc(fields.result())
  }

  /** A projection trie over (possibly dotted) field paths: at each doc
    * level either keep EVERYTHING below ([[Proj.All]]) or recurse per
    * listed field. Built from dotted path strings — `"a"` keeps all of
    * `a`, `"a.b"` keeps only `b` inside subdocument `a` (the rest of
    * `a`'s bytes are skipped without materializing) — with a plain head
    * subsuming any of its subpaths. Arrays and non-document values at
    * an interior node decode whole (array indices are not field names;
    * a scalar where a subpath expected a doc must still surface so the
    * matcher/codec sees the stored value).
    */
  sealed trait Proj extends Serializable
  object Proj {
    case object All extends Proj
    final case class Fields(m: Map[String, Proj]) extends Proj

    def fromPaths(paths: Iterable[String]): Proj = {
      val split = paths.toSeq.map(_.split('.').toList).filter(_.nonEmpty)
      build(split)
    }

    private def build(paths: Seq[List[String]]): Proj =
      if (paths.exists(_.isEmpty)) All // a full head subsumes subpaths
      else Fields(paths.groupBy(_.head).map { case (h, ps) =>
        h -> build(ps.map(_.tail))
      })
  }

  /** Nested projected decode: fields outside the trie are byte-skipped
    * at EVERY document level — `a.small` decodes without ever
    * materializing `a.big`'s bytes. The reference's lazy decoder only
    * went one level; this is the columnar-style subfield prune a
    * document store needs at corpus scale.
    */
  def readDocProjected(buf: ByteBuffer, proj: Proj): BDoc = proj match {
    case Proj.All => readDoc(buf)
    case Proj.Fields(m) =>
      val start = buf.position()
      val len = buf.getInt
      val fields = ListMap.newBuilder[String, BsonValue]
      while (buf.position() < start + len - 1) {
        val tag = buf.get()
        val name = readCString(buf)
        m.get(name) match {
          case None => skipValue(buf, tag)
          case Some(Proj.All) => fields += name -> readValue(buf, tag)
          case Some(sub: Proj.Fields) =>
            if (tag == TDoc) fields += name -> readDocProjected(buf, sub)
            else fields += name -> readValue(buf, tag)
        }
      }
      require(buf.get() == 0x00, "document not 0x00-terminated")
      BDoc(fields.result())
  }

  /** Advance past one value without decoding it. */
  private def skipValue(buf: ByteBuffer, tag: Byte): Unit = tag match {
    case TDouble | TDate | TInt64 => buf.position(buf.position() + 8)
    case TInt32 => buf.position(buf.position() + 4)
    case TTimestamp => buf.position(buf.position() + 8)
    case TBool => buf.position(buf.position() + 1)
    case TNull | TMinKey | TMaxKey => ()
    case TObjectId => buf.position(buf.position() + 12)
    case TString | TSymbol =>
      val n = buf.getInt
      buf.position(buf.position() + n)
    case TBinary =>
      val n = buf.getInt
      buf.position(buf.position() + 1 + n)
    case TDoc | TArray =>
      val n = buf.getInt
      buf.position(buf.position() + n - 4)
    case TRegex =>
      readCString(buf); readCString(buf); ()
    case TDbPointer =>
      val n = buf.getInt
      buf.position(buf.position() + n + 12)
    case TCode =>
      val n = buf.getInt
      buf.position(buf.position() + n)
    case TCodeWScope =>
      val n = buf.getInt
      buf.position(buf.position() + n - 4)
    case TDecimal128 => buf.position(buf.position() + 16)
    case other => throw new IllegalArgumentException(f"unsupported BSON tag 0x$other%02x")
  }

  private def readValue(buf: ByteBuffer, tag: Byte): BsonValue = tag match {
    case TDouble => BDouble(java.lang.Double.longBitsToDouble(buf.getLong))
    case TString => BString(readString(buf))
    case TSymbol => BSymbol(readString(buf))
    case TDoc => readDoc(buf)
    case TArray =>
      val d = readDoc(buf)
      BArray(d.fields.values.toVector)
    case TBinary =>
      val len = buf.getInt
      buf.get() // subtype
      val arr = new Array[Byte](len)
      buf.get(arr)
      BBinary(arr)
    case TObjectId =>
      val arr = new Array[Byte](12)
      buf.get(arr)
      BObjectId(hex24(arr))
    case TBool => BBool(buf.get() != 0)
    case TDate => BDate(buf.getLong)
    case TNull => BNull
    case TRegex => BRegex(readCString(buf), readCString(buf))
    case TInt32 => BInt32(buf.getInt)
    case TTimestamp =>
      val ord = buf.getInt
      val sec = buf.getInt
      BTimestamp(sec, ord)
    case TInt64 => BInt64(buf.getLong)
    // Foreign-tag tolerance: real mongodump output can contain stored JS,
    // DBPointers, and Decimal128 even when the pipeline never writes them;
    // a scan must degrade gracefully, not crash. Conversions follow the
    // reference (hive/.../BSONSerDe.java:427-435 maps Code/CodeWScope to
    // their code string dropping scope; pig/.../BSONLoader.java:252-256
    // maps DBRef to a {$ref,$id} map).
    case TDbPointer =>
      val ns = readString(buf)
      val arr = new Array[Byte](12)
      buf.get(arr)
      BDoc("$ref" -> BString(ns), "$id" -> BObjectId(hex24(arr)))
    case TCode => BString(readString(buf))
    case TCodeWScope =>
      val start = buf.position()
      val total = buf.getInt
      val code = readString(buf)
      buf.position(start + total) // drop the scope document
      BString(code)
    case TDecimal128 =>
      val low = buf.getLong
      val high = buf.getLong
      BDouble(decimal128ToDouble(low, high))
    case TMinKey => BMinKey
    case TMaxKey => BMaxKey
    case other => throw new IllegalArgumentException(f"unsupported BSON tag 0x$other%02x")
  }

  /** IEEE 754-2008 decimal128 (BID encoding, the BSON variant) to double —
    * lossy by design: Decimal128 degrades to the nearest double, like any
    * engine without a native decimal column. Non-canonical encodings (the
    * `11` combination prefix) represent zero per the spec.
    */
  private[bson] def decimal128ToDouble(low: Long, high: Long): Double = {
    val neg = (high & 0x8000000000000000L) != 0
    val combination = ((high >>> 58) & 0x1f).toInt
    if (combination == 0x1f) return Double.NaN
    if (combination == 0x1e) return if (neg) Double.NegativeInfinity else Double.PositiveInfinity
    if (((high >>> 61) & 0x3) == 0x3) return if (neg) -0.0 else 0.0
    val exponent = ((high >>> 49) & 0x3fff).toInt - 6176
    val sigHigh = high & 0x0001ffffffffffffL
    val sig = (BigInt(sigHigh) << 64) | (BigInt(low) & ((BigInt(1) << 64) - 1))
    val signed = if (neg) -sig else sig
    BigDecimal(signed, -exponent).toDouble
  }

  private def readString(buf: ByteBuffer): String = {
    val len = buf.getInt
    if (buf.hasArray) {
      // decode straight from the backing array — no intermediate copy
      val off = buf.arrayOffset() + buf.position()
      val s = new String(buf.array(), off, len - 1, StandardCharsets.UTF_8)
      buf.position(buf.position() + len)
      s
    } else {
      val arr = new Array[Byte](len - 1)
      buf.get(arr)
      buf.get() // trailing 0
      new String(arr, StandardCharsets.UTF_8)
    }
  }

  private val HexDigits = "0123456789abcdef".toCharArray

  /** 12 bytes → 24 lowercase hex chars (ObjectId), without the per-byte
    * format-string allocation of `f"$b%02x"`. */
  private def hex24(arr: Array[Byte]): String = {
    val cs = new Array[Char](24)
    var i = 0
    while (i < 12) {
      cs(2 * i) = HexDigits((arr(i) >> 4) & 0xf)
      cs(2 * i + 1) = HexDigits(arr(i) & 0xf)
      i += 1
    }
    new String(cs)
  }

  private def readCString(buf: ByteBuffer): String = {
    if (buf.hasArray) {
      // scan the backing array for the NUL, decode in one step (the
      // per-byte builder was the decoder's hottest allocation site —
      // one per field name per document)
      val arr = buf.array()
      val base = buf.arrayOffset() + buf.position()
      var i = base
      while (arr(i) != 0) i += 1
      val s = new String(arr, base, i - base, StandardCharsets.UTF_8)
      buf.position(buf.position() + (i - base) + 1)
      s
    } else {
      val sb = new mutable.ArrayBuilder.ofByte
      var b = buf.get()
      while (b != 0) { sb += b; b = buf.get() }
      new String(sb.result(), StandardCharsets.UTF_8)
    }
  }
}
