package graft.bson

import graft.SparkSpec
import graft.files.BsonFiles

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.nio.file.Files

/** Foreign-tag tolerance: a dump written by another producer can contain
  * DBPointer (0x0C), Code (0x0D), CodeWScope (0x0F) and Decimal128 (0x13)
  * elements this engine never writes. Scans must decode them gracefully
  * (reference degradations: code -> string, DBRef -> {$ref,$id}) and the
  * projected decoder must byte-skip them exactly.
  */
class ForeignTagsSpec extends SparkSpec {

  /** Hand-build a BSON doc: {pre: 1, code: <0x0D>, cws: <0x0F>, ref: <0x0C>,
    * dec: <0x13>, post: 2} with the foreign tags on the wire.
    */
  private def foreignDocBytes(): Array[Byte] = {
    val body = ByteBuffer.allocate(512).order(ByteOrder.LITTLE_ENDIAN)
    def cstr(s: String): Unit = { body.put(s.getBytes(StandardCharsets.UTF_8)); body.put(0.toByte) }
    def bstr(s: String): Unit = {
      val b = s.getBytes(StandardCharsets.UTF_8)
      body.putInt(b.length + 1); body.put(b); body.put(0.toByte)
    }
    body.put(0x10.toByte); cstr("pre"); body.putInt(1)
    // 0x0D Code
    body.put(0x0d.toByte); cstr("code"); bstr("function() { return 1; }")
    // 0x0F CodeWScope: int32 total, string code, scope doc {x:5}
    body.put(0x0f.toByte); cstr("cws")
    val scope = BsonCodec.encode(BDoc("x" -> BInt32(5)))
    val codeStr = "function(x) { return x; }"
    val codeB = codeStr.getBytes(StandardCharsets.UTF_8)
    body.putInt(4 + 4 + codeB.length + 1 + scope.length)
    bstr(codeStr); body.put(scope)
    // 0x0C DBPointer: string ns + 12-byte oid
    body.put(0x0c.toByte); cstr("ref"); bstr("db.other")
    val oid = (0 until 12).map(i => (i + 1).toByte).toArray
    body.put(oid)
    // 0x13 Decimal128: 12345 * 10^-2 = 123.45 (BID: exp biased 6176-2)
    body.put(0x13.toByte); cstr("dec")
    body.putLong(12345L)
    body.putLong((6176L - 2) << 49)
    body.put(0x10.toByte); cstr("post"); body.putInt(2)
    body.put(0.toByte) // terminator
    val bodyBytes = java.util.Arrays.copyOf(body.array(), body.position())
    val out = ByteBuffer.allocate(4 + bodyBytes.length).order(ByteOrder.LITTLE_ENDIAN)
    out.putInt(4 + bodyBytes.length)
    out.put(bodyBytes)
    out.array()
  }

  test("decode degrades foreign tags like the reference") {
    val d = BsonCodec.decode(foreignDocBytes())
    assert(d.get("pre") === Some(BInt32(1)))
    assert(d.get("code") === Some(BString("function() { return 1; }")))
    assert(d.get("cws") === Some(BString("function(x) { return x; }")),
      "CodeWScope keeps the code, drops the scope")
    assert(d.get("ref") === Some(BDoc(
      "$ref" -> BString("db.other"),
      "$id" -> BObjectId("0102030405060708090a0b0c"))))
    assert(d.get("dec") === Some(BDouble(123.45)))
    assert(d.get("post") === Some(BInt32(2)))
  }

  test("projected decode byte-skips every foreign tag exactly") {
    val buf = ByteBuffer.wrap(foreignDocBytes()).order(ByteOrder.LITTLE_ENDIAN)
    val d = BsonCodec.readDocProjected(buf, BsonCodec.Proj.fromPaths(Seq("pre", "post")))
    assert(d.fields.keySet === Set("pre", "post"),
      "skip widths must be exact or the following elements misparse")
    assert(d.get("post") === Some(BInt32(2)))
  }

  test("decimal128 special values: NaN, infinities, non-canonical zero") {
    assert(BsonCodec.decimal128ToDouble(0L, 0x7c00000000000000L).isNaN)
    assert(BsonCodec.decimal128ToDouble(0L, 0x7800000000000000L).isPosInfinity)
    assert(BsonCodec.decimal128ToDouble(0L, 0xf800000000000000L).isNegInfinity)
    assert(BsonCodec.decimal128ToDouble(123L, 0x6000000000000000L) === 0.0)
    // negative: -7 = sign bit + 7 * 10^0
    assert(BsonCodec.decimal128ToDouble(7L, 0x8000000000000000L | (6176L << 49)) === -7.0)
  }

  test("a dump containing all four foreign tags scans end-to-end") {
    val dir = Files.createTempDirectory("graft-foreign").toString
    val out = new java.io.FileOutputStream(s"$dir/data.bson")
    out.write(foreignDocBytes())
    // plus a normal doc so schema inference sees both shapes
    out.write(BsonCodec.encode(BDoc("pre" -> BInt32(9), "post" -> BInt32(8))))
    out.close()
    val df = spark.read.format("graftbson").load(dir)
    assert(df.count() === 2)
    val cols = df.columns.toSet
    assert(Set("pre", "code", "cws", "dec", "post").subsetOf(cols))
    val first = df.orderBy("post").collect()
    assert(first.length === 2)
  }
}
