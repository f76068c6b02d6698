package graft.bson

import graft.files.BsonFiles
import graft.store.BsonCollection
import org.scalatest.funsuite.AnyFunSuite

import java.nio.ByteBuffer
import java.nio.ByteOrder
import java.nio.file.Files

class ProjectedDecodeSpec extends AnyFunSuite {

  private val doc = BDoc(
    "_id" -> BInt64(1L),
    "s" -> BString("hello"),
    "nested" -> BDoc("a" -> BInt32(1), "b" -> BArray(Vector(BString("x")))),
    "bin" -> BBinary(Array.fill[Byte](64)(3)),
    "d" -> BDouble(2.5),
    "oid" -> BObjectId("ab" * 12),
    "ts" -> BTimestamp(100, 2),
    "re" -> BRegex("^a.*", "i"),
    "mk" -> BMinKey,
    "flag" -> BBool(true))

  test("projected decode keeps requested fields, byte-skips every other type") {
    val bytes = BsonCodec.encode(doc)
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val got = BsonCodec.readDocProjected(buf, Set("_id", "d"))
    assert(got == BDoc("_id" -> BInt64(1L), "d" -> BDouble(2.5)))
    // the cursor must land exactly at the end (skips were exact)
    assert(buf.position() == bytes.length)
  }

  test("projected decode of every single-field projection matches full decode") {
    val bytes = BsonCodec.encode(doc)
    doc.fields.keys.foreach { k =>
      val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      val got = BsonCodec.readDocProjected(buf, _ == k)
      assert(got == BDoc(k -> doc.fields(k)), s"projecting only $k")
      assert(buf.position() == bytes.length)
    }
  }

  test("readRange with fields applies projection while preserving doc count") {
    val path = Files.createTempFile("proj", ".bson").toString
    val docs = (0 until 200).map(i => BDoc(
      "_id" -> BInt32(i), "keep" -> BInt32(i * 2), "drop" -> BString("z" * 100)))
    BsonFiles.write(path, docs.iterator)
    val got = BsonFiles.readRange(path, 0, Long.MaxValue, Some(Set("_id", "keep"))).toSeq
    assert(got.size == 200)
    assert(got.head == BDoc("_id" -> BInt32(0), "keep" -> BInt32(0)))
  }

  test("unordered bulk continues past duplicate keys and reports them") {
    val dir = Files.createTempDirectory("bulk").toString
    val coll = new BsonCollection(dir)
    val d1 = BDoc("_id" -> BInt32(1), "v" -> BString("a"))
    val d1dup = BDoc("_id" -> BInt32(1), "v" -> BString("b"))
    val d2 = BDoc("_id" -> BInt32(2), "v" -> BString("c"))
    val r = coll.bulkWrite(Iterator(coll.InsertOne(d1), coll.InsertOne(d1dup),
      coll.InsertOne(d2)), ordered = false)
    assert(r.inserted == 2)
    assert(r.errors.size == 1 && r.errors.head.contains("duplicate key"))
    assert(coll.count() == 2)
    // ordered mode throws instead
    intercept[IllegalStateException] {
      coll.bulkWrite(Iterator(coll.InsertOne(d1)), ordered = true)
    }
  }
}
