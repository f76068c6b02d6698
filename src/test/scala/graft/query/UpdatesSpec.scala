package graft.query

import graft.bson._
import org.scalatest.funsuite.AnyFunSuite

/** Update-modifier semantics (MongoUpdateWritable / JSONPigReplace
  * behavioral surface, reimplemented).
  */
class UpdatesSpec extends AnyFunSuite {

  test("$set sets and overwrites, including dotted paths") {
    val d = BDoc("_id" -> BInt32(1), "a" -> BInt32(2))
    val u = Updates.applyModifiers(d, BDoc("$set" -> BDoc("a" -> BInt32(9), "b.c" -> BString("x"))))
    assert(u.get("a").contains(BInt32(9)))
    assert(u.getPath("b.c").contains(BString("x")))
  }

  test("$inc adds with numeric widening; missing field starts from the increment") {
    val d = BDoc("n32" -> BInt32(5), "n64" -> BInt64(10L), "d" -> BDouble(0.5))
    val u = Updates.applyModifiers(d, BDoc("$inc" -> BDoc(
      "n32" -> BInt32(3), "n64" -> BInt32(1), "d" -> BDouble(0.25), "fresh" -> BInt32(7))))
    assert(u.get("n32").contains(BInt32(8)))
    assert(u.get("n64").contains(BInt64(11L)))
    assert(u.get("d").contains(BDouble(0.75)))
    assert(u.get("fresh").contains(BInt32(7)))
  }

  test("$unset removes; $push appends; $pushAll appends many") {
    val d = BDoc("a" -> BInt32(1), "tags" -> BArray(Vector(BString("x"))))
    val u1 = Updates.applyModifiers(d, BDoc("$unset" -> BDoc("a" -> BInt32(1))))
    assert(u1.get("a").isEmpty)
    val u2 = Updates.applyModifiers(d, BDoc("$push" -> BDoc("tags" -> BString("y"))))
    assert(u2.get("tags").contains(BArray(Vector(BString("x"), BString("y")))))
    val u3 = Updates.applyModifiers(d, BDoc("$pushAll" -> BDoc(
      "tags" -> BArray(Vector(BString("y"), BString("z"))))))
    assert(u3.get("tags").contains(BArray(Vector(BString("x"), BString("y"), BString("z")))))
  }

  test("upsert seed: equality fields of the query become the base doc") {
    val q = BQuery.And(Seq(BQuery.Eq("_id", BInt32(7)), BQuery.Eq("grp", BString("g"))))
    val seeded = Updates.upsertSeed(q, BDoc("$inc" -> BDoc("n" -> BInt32(1))))
    assert(seeded.get("_id").contains(BInt32(7)))
    assert(seeded.get("grp").contains(BString("g")))
    assert(seeded.get("n").contains(BInt32(1)))
  }

  test("replacement upsert carries the query _id") {
    val q = BQuery.Eq("_id", BInt32(3))
    val seeded = Updates.upsertSeed(q, BDoc("v" -> BString("new")))
    assert(seeded.get("_id").contains(BInt32(3)))
    assert(seeded.get("v").contains(BString("new")))
  }

  test("$addToSet adds only missing elements, supports $each") {
    val d = BDoc("a" -> BArray(Vector(BInt32(1), BInt32(2))))
    val r1 = Updates.applyModifiers(d, BDoc("$addToSet" -> BDoc("a" -> BInt32(2))))
    assert(r1.get("a").contains(BArray(Vector(BInt32(1), BInt32(2)))))
    val r2 = Updates.applyModifiers(d, BDoc("$addToSet" -> BDoc("a" ->
      BDoc("$each" -> BArray(Vector(BInt32(2), BInt32(3), BInt32(3)))))))
    assert(r2.get("a").contains(BArray(Vector(BInt32(1), BInt32(2), BInt32(3)))))
    val r3 = Updates.applyModifiers(BDoc.empty, BDoc("$addToSet" -> BDoc("a" -> BInt32(9))))
    assert(r3.get("a").contains(BArray(Vector(BInt32(9)))))
  }

  test("$pull removes by value and by operator condition; $pullAll by list") {
    val d = BDoc("a" -> BArray(Vector(BInt32(1), BInt32(5), BInt32(9), BInt32(5))))
    val byVal = Updates.applyModifiers(d, BDoc("$pull" -> BDoc("a" -> BInt32(5))))
    assert(byVal.get("a").contains(BArray(Vector(BInt32(1), BInt32(9)))))
    val byCond = Updates.applyModifiers(d,
      BDoc("$pull" -> BDoc("a" -> BDoc("$gte" -> BInt32(5)))))
    assert(byCond.get("a").contains(BArray(Vector(BInt32(1)))))
    val all = Updates.applyModifiers(d,
      BDoc("$pullAll" -> BDoc("a" -> BArray(Vector(BInt32(1), BInt32(9))))))
    assert(all.get("a").contains(BArray(Vector(BInt32(5), BInt32(5)))))
  }

  test("$pop trims first (-1) or last (1); $min/$max keep the bound") {
    val d = BDoc("a" -> BArray(Vector(BInt32(1), BInt32(2), BInt32(3))), "v" -> BInt32(5))
    assert(Updates.applyModifiers(d, BDoc("$pop" -> BDoc("a" -> BInt32(1))))
      .get("a").contains(BArray(Vector(BInt32(1), BInt32(2)))))
    assert(Updates.applyModifiers(d, BDoc("$pop" -> BDoc("a" -> BInt32(-1))))
      .get("a").contains(BArray(Vector(BInt32(2), BInt32(3)))))
    assert(Updates.applyModifiers(d, BDoc("$min" -> BDoc("v" -> BInt32(3))))
      .get("v").contains(BInt32(3)))
    assert(Updates.applyModifiers(d, BDoc("$min" -> BDoc("v" -> BInt32(7))))
      .get("v").contains(BInt32(5)))
    assert(Updates.applyModifiers(d, BDoc("$max" -> BDoc("v" -> BInt32(7))))
      .get("v").contains(BInt32(7)))
    // missing field: $min/$max set it
    assert(Updates.applyModifiers(BDoc.empty, BDoc("$max" -> BDoc("v" -> BInt32(7))))
      .get("v").contains(BInt32(7)))
  }

  test("$mul multiplies with widening; missing field becomes typed zero") {
    val d = BDoc("v" -> BInt32(6))
    assert(Updates.applyModifiers(d, BDoc("$mul" -> BDoc("v" -> BInt32(7))))
      .get("v").contains(BInt32(42)))
    assert(Updates.applyModifiers(d, BDoc("$mul" -> BDoc("v" -> BDouble(0.5))))
      .get("v").contains(BDouble(3.0)))
    assert(Updates.applyModifiers(BDoc.empty, BDoc("$mul" -> BDoc("v" -> BInt64(7L))))
      .get("v").contains(BInt64(0L)))
  }

  test("$rename moves a field, including dotted destinations") {
    val d = BDoc("a" -> BInt32(1), "b" -> BInt32(2))
    val r = Updates.applyModifiers(d, BDoc("$rename" -> BDoc("a" -> BString("c.x"))))
    assert(r.get("a").isEmpty)
    assert(r.getPath("c.x").contains(BInt32(1)))
    // renaming a missing field is a no-op
    assert(Updates.applyModifiers(d, BDoc("$rename" -> BDoc("zz" -> BString("y")))) === d)
  }

  test("unknown operators still fail loudly") {
    intercept[IllegalArgumentException] {
      Updates.applyModifiers(BDoc.empty, BDoc("$bit" -> BDoc("v" -> BInt32(1))))
    }
  }
}
