package graft.bson

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import scala.collection.immutable.ListMap

/** Codec round-trip + ordering laws (the analog of the reference's
  * BSONWritableTest + BSONComparator semantics).
  */
class BsonSpec extends AnyFunSuite {

  private val leafGen: Gen[BsonValue] = Gen.oneOf(
    Gen.const(BNull),
    Gen.chooseNum(Int.MinValue, Int.MaxValue).map(BInt32.apply),
    Gen.chooseNum(Long.MinValue, Long.MaxValue).map(BInt64.apply),
    Gen.chooseNum(-1e9, 1e9).map(BDouble.apply),
    Gen.alphaNumStr.map(BString.apply),
    Gen.oneOf(true, false).map(BBool.apply),
    Gen.chooseNum(0L, 4102444800000L).map(BDate.apply),
    Gen.listOfN(12, Gen.chooseNum(0, 255)).map(bs => BObjectId(bs.map(b => f"$b%02x").mkString)),
    Gen.listOfN(8, Gen.chooseNum(-128, 127).map(_.toByte)).map(bs => BBinary(bs.toArray)),
    Gen.const(BMinKey), Gen.const(BMaxKey))

  private def valueGen(depth: Int): Gen[BsonValue] =
    if (depth <= 0) leafGen
    else Gen.frequency(
      6 -> leafGen,
      1 -> Gen.listOfN(3, valueGen(depth - 1)).map(xs => BArray(xs.toVector)),
      1 -> docGen(depth - 1).map(identity[BsonValue]))

  private def docGen(depth: Int): Gen[BDoc] =
    for {
      n <- Gen.chooseNum(0, 5)
      names <- Gen.listOfN(n, Gen.identifier.suchThat(_.nonEmpty))
      vals <- Gen.listOfN(n, valueGen(depth))
    } yield BDoc(ListMap(names.distinct.zip(vals): _*))

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(7L + i)))

  test("wire codec round-trips arbitrary documents") {
    samples(docGen(2), 300).foreach { doc =>
      val decoded = BsonCodec.decode(BsonCodec.encode(doc))
      assert(decoded == doc, s"round-trip mismatch for $doc")
    }
  }

  test("encoded form is spec-shaped: length prefix + 0x00 terminator") {
    samples(docGen(2), 50).foreach { doc =>
      val b = BsonCodec.encode(doc)
      val len = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
      assert(len == b.length)
      assert(b.last == 0x00)
    }
  }

  test("cross-type order: MinKey < null < number < string < doc < array < binary < oid < bool < date < MaxKey") {
    val ladder = Seq[BsonValue](
      BMinKey, BNull, BInt32(5), BString("x"),
      BDoc(ListMap("a" -> BInt32(1))), BArray(Vector(BInt32(1))),
      BBinary(Array[Byte](1)), BObjectId("0" * 24), BBool(false),
      BDate(0L), BMaxKey)
    for (i <- ladder.indices; j <- ladder.indices) {
      val c = BsonOrdering.compare(ladder(i), ladder(j))
      assert(math.signum(c) == math.signum(i.compareTo(j)),
        s"order violation between ${ladder(i)} and ${ladder(j)}")
    }
  }

  test("numbers of different widths compare as doubles") {
    assert(BsonOrdering.compare(BInt32(3), BInt64(3L)) == 0)
    assert(BsonOrdering.compare(BInt64(2L), BDouble(2.5)) < 0)
    assert(BsonOrdering.compare(BDouble(4.0), BInt32(3)) > 0)
  }

  test("ordering laws: antisymmetry + transitivity over random values") {
    val vs = samples(valueGen(1), 60)
    for (a <- vs; b <- vs) {
      assert(math.signum(BsonOrdering.compare(a, b)) ==
        -math.signum(BsonOrdering.compare(b, a)))
    }
    val sorted = vs.sorted(BsonOrdering)
    for (i <- 0 until sorted.length - 1) {
      assert(BsonOrdering.compare(sorted(i), sorted(i + 1)) <= 0)
    }
  }

  test("Row bridge: tz-less timestamps and dates round-trip via BSON datetime") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("ntz", TimestampNTZType), StructField("d", DateType)))
    val micros = 853286400000000L // 1997-01-14T00:00 wall clock, micros
    val days = 10000 // 1997-05-19, epoch days
    val doc = RowCodec.toBson(InternalRow(micros, days), schema)
    assert(doc.get("ntz").contains(BDate(853286400000L)), s"got $doc")
    assert(doc.get("d").contains(BDate(10000L * 86400000L)), s"got $doc")
    val back = RowCodec.toRow(doc, schema)
    assert(back.getLong(0) == micros, "ntz wall clock must survive")
    assert(back.getInt(1) == days, "epoch day must survive")
  }

  test("dotted-path retrieval") {
    val d = BDoc("a" -> BDoc("b" -> BDoc("c" -> BInt32(7))), "x" -> BInt32(1))
    assert(d.getPath("a.b.c").contains(BInt32(7)))
    assert(d.getPath("a.b").contains(BDoc("c" -> BInt32(7))))
    assert(d.getPath("a.z").isEmpty)
    assert(d.getPath("x").contains(BInt32(1)))
  }
}
