package graft.query

import graft.SparkSpec
import graft.bson._
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** [[ComputedCol]]'s evaluator IS the sandbox definition of the wire
  * `$set`/`$mod` arithmetic — this property pins it against Spark's own
  * `pmod`/`%` over the full int64 range (the int-exactness claim the
  * whole feature rests on), the width promotion, and the null rules.
  */
class ComputedColSpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("property: eval == Spark's pmod/% for every int64, both widths") {
    val longs = Gen.oneOf(
      Gen.choose(Long.MinValue, Long.MaxValue),
      Gen.choose(-1000L, 1000L),
      Gen.oneOf(Long.MinValue, Long.MaxValue, 0L, -1L, 1L))
    val ns = Gen.oneOf(Gen.choose(1L, 7L), Gen.choose(1L, 1000000L))
    val cases = samples(Gen.zip(longs, ns, Gen.oneOf("pmod", "mod")), 400)
    cases.foreach { case (a, n, fn) =>
      // Spark's documented semantics (Pmod/Remainder over longs): these
      // ARE the formulas Spark evaluates for a non-zero divisor
      val expected = fn match {
        case "pmod" => ((a % n) + n) % n
        case "mod" => a % n
      }
      val c = ComputedCol("o", fn, "v", n, "long")
      assert(c.eval(BDoc("v" -> BInt64(a))) == Some(BInt64(expected)),
        s"$fn($a, $n)")
      // int32 storage under a long-width bin promotes to int64 (mongo's
      // $mod widens to the int64 literal)
      if (a.isValidInt)
        assert(c.eval(BDoc("v" -> BInt32(a.toInt))) == Some(BInt64(expected)))
      // int-width bins stay int32 end-to-end
      if (a.isValidInt && n.isValidInt) {
        val ci = ComputedCol("o", fn, "v", n, "int")
        assert(ci.eval(BDoc("v" -> BInt32(a.toInt))) ==
          Some(BInt32(expected.toInt)), s"int $fn($a, $n)")
      }
      // null / missing -> null (the $mod arithmetic-operator rule)
      assert(c.eval(BDoc("v" -> BNull)).isEmpty)
      assert(c.eval(BDoc.empty).isEmpty)
    }
  }

  test("cross-check a sample against Spark's own expression evaluation") {
    import spark.implicits._
    val vals = Seq(Long.MinValue, Long.MinValue + 1, -1000000007L, -97L,
      -1L, 0L, 1L, 53L, 1000000009L, Long.MaxValue)
    val df = vals.toDF("v")
      .select($"v", pmod($"v", lit(97L)).as("p"), ($"v" % 97L).as("m"))
    df.collect().foreach { r =>
      val v = r.getLong(0)
      assert(ComputedCol("o", "pmod", "v", 97L).eval(BDoc("v" -> BInt64(v)))
        == Some(BInt64(r.getLong(1))), s"pmod($v, 97)")
      assert(ComputedCol("o", "mod", "v", 97L).eval(BDoc("v" -> BInt64(v)))
        == Some(BInt64(r.getLong(2))), s"mod($v, 97)")
    }
    // doubles: the server's double $mod (sign follows the dividend);
    // Spark's pmod/% over doubles use the same remainder
    val dv = Seq(-10.5, -0.25, 0.0, 3.75, 10.5)
    val dd = dv.toDF("v")
      .select($"v", pmod($"v", lit(4.0)).as("p"), ($"v" % 4.0).as("m"))
    // a double STORAGE under a long-width bin still computes double $mod
    dd.collect().foreach { r =>
      val v = r.getDouble(0)
      assert(ComputedCol("o", "pmod", "v", 4L).eval(BDoc("v" -> BDouble(v)))
        == Some(BDouble(r.getDouble(1))), s"pmod($v, 4)")
      assert(ComputedCol("o", "mod", "v", 4L).eval(BDoc("v" -> BDouble(v)))
        == Some(BDouble(r.getDouble(2))), s"mod($v, 4)")
    }
    // non-numeric storage fails loud (the server's $mod rule)
    intercept[IllegalArgumentException] {
      ComputedCol("o", "mod", "v", 4L).eval(BDoc("v" -> BString("x")))
    }
  }
}
