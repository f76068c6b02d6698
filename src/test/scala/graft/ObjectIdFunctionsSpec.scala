package graft

import graft.functions.GraftFunctions
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the ObjectId Catalyst expressions (the analog of the
  * reference's BSONWritableTest round-trip discipline). Uses raw ScalaCheck
  * generators with fixed seeds (no scalatest bridge in the offline cache).
  */
class ObjectIdFunctionsSpec extends SparkSpec {

  private val hexChar = Gen.oneOf("0123456789abcdefABCDEF".toSeq)
  private val validHex: Gen[String] = Gen.listOfN(24, hexChar).map(_.mkString)

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).map(i => g.pureApply(Gen.Parameters.default, Seed(42L + i)))

  test("to_objectid normalizes any valid 24-hex string to lowercase") {
    import spark.implicits._
    val xs = samples(validHex, 200)
    val got = xs.toDF("s")
      .select(GraftFunctions.to_objectid($"s").as("oid"))
      .collect().map(_.getString(0))
    assert(got.toSeq == xs.map(_.toLowerCase))
  }

  test("to_objectid rejects malformed input as null") {
    import spark.implicits._
    val junkGen = Gen.oneOf(
      Gen.alphaNumStr.suchThat(_.length != 24),
      Gen.listOfN(24, Gen.oneOf("ghijklmnop!@# ".toSeq)).map(_.mkString))
    val xs = samples(junkGen, 200)
    val got = xs.toDF("s")
      .select(GraftFunctions.to_objectid($"s").as("oid"))
      .collect().map(r => Option(r.getString(0)))
    assert(got.forall(_.isEmpty), s"junk accepted: ${xs.zip(got).filter(_._2.nonEmpty).take(3)}")
  }

  test("objectid_to_seconds extracts the leading 4-byte timestamp") {
    import spark.implicits._
    val ts = samples(Gen.chooseNum(0L, 0xffffffffL), 100)
    val oids = ts.map(t => f"$t%08x" + "a" * 16)
    val got = oids.toDF("oid")
      .select(GraftFunctions.objectid_to_seconds($"oid").as("sec"))
      .collect().map(_.getLong(0))
    assert(got.toSeq == ts)
  }

  test("round-trip law: objectid_to_seconds . to_objectid == seconds of raw hex") {
    import spark.implicits._
    val ts = samples(Gen.chooseNum(0L, 0xffffffffL), 100)
    val oids = ts.map(t => f"$t%08X" + "B" * 16) // uppercase input
    val got = oids.toDF("oid")
      .select(GraftFunctions.objectid_to_seconds(GraftFunctions.to_objectid($"oid")).as("sec"))
      .collect().map(_.getLong(0))
    assert(got.toSeq == ts)
  }

  test("SQL registration: functions callable from spark.sql") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT objectid_to_seconds(to_objectid('00000001AAAAAAAAAAAAAAAA')) AS s")
      .collect()
    assert(r.head.getLong(0) == 1L)
  }
}
