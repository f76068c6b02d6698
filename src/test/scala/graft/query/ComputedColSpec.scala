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

  test("date bins: eval == Spark's year/month/dayofmonth/date_trunc (UTC, proleptic)") {
    import spark.implicits._
    // calendar edges on purpose: pre-1970 (negative millis), pre-1582
    // (proleptic Gregorian — Spark and mongo's timelib both use it; no
    // Julian switch), leap days, year/quarter/week boundaries, far future
    val millis = Seq(
      -62135596800000L, // 0001-01-01
      -14831769600000L, // 1500-01-01 (pre-Gregorian-reform)
      -12219292800000L, // 1582-10-15 (reform date)
      -86400000L, -1L, 0L, 1L,
      951782400000L, // 2000-02-29 (leap)
      1583020800123L, // 2020-03-01 00:00:00.123
      1609459199999L, // 2020-12-31 23:59:59.999
      1640995200000L, // 2022-01-01 (a Saturday)
      4102444800000L) // 2100-01-01
    // build via timestamp_millis and read back via unix_millis — pure
    // numeric conversions, EXACTLY what the engine's BDate decode does
    // (java.sql.Timestamp would inject the hybrid Julian/Gregorian
    // rebase for pre-1582 instants, which neither the codec nor a
    // server performs)
    val tsm = timestamp_millis($"ms")
    val df = millis.toDF("ms")
      .select($"ms",
        year(tsm).as("y"), month(tsm).as("m"), dayofmonth(tsm).as("d"),
        hour(tsm).as("hh"), minute(tsm).as("mi"), second(tsm).as("ss"),
        dayofyear(tsm).as("doy"), dayofweek(tsm).as("dow"),
        weekofyear(tsm).as("woy"),
        unix_millis(date_trunc("year", tsm)).as("ty"),
        unix_millis(date_trunc("quarter", tsm)).as("tq"),
        unix_millis(date_trunc("month", tsm)).as("tm"),
        unix_millis(date_trunc("week", tsm)).as("tw"),
        unix_millis(date_trunc("day", tsm)).as("td"),
        unix_millis(date_trunc("hour", tsm)).as("th"),
        unix_millis(date_trunc("minute", tsm)).as("tmin"),
        unix_millis(date_trunc("second", tsm)).as("tsec"))
    df.collect().foreach { r =>
      val ms = r.getLong(0)
      val doc = BDoc("ts" -> BDate(ms))
      def f(fn: String, unit: String = "",
          t: String = "int"): Option[BsonValue] =
        ComputedCol("o", fn, "ts", 0L, t, unit).eval(doc)
      assert(f("year") == Some(BInt32(r.getInt(1))), s"year($ms)")
      assert(f("month") == Some(BInt32(r.getInt(2))), s"month($ms)")
      assert(f("dayofmonth") == Some(BInt32(r.getInt(3))), s"dom($ms)")
      // r18 second wave: time-of-day + day/week numbering fields —
      // $dayOfWeek is Sunday-1 like Spark's dayofweek; $isoWeek is the
      // ISO 8601 week like Spark's weekofyear (pre-1582 included)
      Seq(("hour", 4), ("minute", 5), ("second", 6), ("dayofyear", 7),
        ("dayofweek", 8), ("weekofyear", 9)).foreach { case (fn, i) =>
        assert(f(fn) == Some(BInt32(r.getInt(i))), s"$fn($ms)")
      }
      Seq(("year", 10), ("quarter", 11), ("month", 12), ("week", 13),
        ("day", 14), ("hour", 15), ("minute", 16), ("second", 17))
        .foreach { case (u, i) =>
          assert(f("date_trunc", u, "timestamp") ==
            Some(BDate(r.getLong(i))), s"date_trunc($u, $ms)")
        }
      // millisecond: the finest stored boundary — identity on BSON millis
      assert(f("date_trunc", "millisecond", "timestamp") == Some(BDate(ms)))
    }
    // DATE-out truncation (Spark's trunc(date, fmt)): the truncated
    // instant is a canonical midnight, so epoch-day decode is exact —
    // pinned against Spark's own trunc over the same edge instants
    val td = millis.toDF("ms")
      .select($"ms",
        unix_date(trunc(timestamp_millis($"ms").cast("date"), "year")).as("ty"),
        unix_date(trunc(timestamp_millis($"ms").cast("date"), "quarter")).as("tq"),
        unix_date(trunc(timestamp_millis($"ms").cast("date"), "month")).as("tm"),
        unix_date(trunc(timestamp_millis($"ms").cast("date"), "week")).as("tw"))
    td.collect().foreach { r =>
      val ms = r.getLong(0)
      // the stored DateType value is the canonical midnight of the day
      val dayMs = Math.floorDiv(ms, 86400000L) * 86400000L
      val doc = BDoc("d" -> BDate(dayMs))
      Seq(("year", 1), ("quarter", 2), ("month", 3), ("week", 4))
        .foreach { case (u, i) =>
          val got = ComputedCol("o", "date_trunc", "d", 0L, "date", u).eval(doc)
          assert(got == Some(BDate(r.getInt(i).toLong * 86400000L)),
            s"trunc($u, $ms)")
        }
    }
    // null / missing -> null (mongo's date-operator rule); non-date
    // storage fails loud (a live server's $year errors identically);
    // a BSON TIMESTAMP feeds its seconds (mongo accepts it)
    val y = ComputedCol("o", "year", "ts", 0L, "int")
    assert(y.eval(BDoc("ts" -> BNull)).isEmpty)
    assert(y.eval(BDoc.empty).isEmpty)
    intercept[IllegalArgumentException] { y.eval(BDoc("ts" -> BInt64(5L))) }
    assert(y.eval(BDoc("ts" -> BTimestamp(951782400, 1))) == Some(BInt32(2000)))
  }

  test("date bins: wire rendering, options round-trip, and the require matrix") {
    val y = ComputedCol("y", "year", "d", 0L, "int")
    assert(y.setExpr == BDoc("$year" -> BDoc(
      "date" -> BString("$d"), "timezone" -> BString("UTC"))))
    assert(y.describe == "y = year(d)")
    val tw = ComputedCol("w", "date_trunc", "ts", 0L, "timestamp", "week")
    // week MUST pin startOfWeek: "monday" (Spark's week starts Monday;
    // mongo's default is Sunday — a silent 1-day shift otherwise)
    assert(tw.setExpr == BDoc("$dateTrunc" -> BDoc(
      "date" -> BString("$ts"), "unit" -> BString("week"),
      "timezone" -> BString("UTC"), "startOfWeek" -> BString("monday"))))
    val th = ComputedCol("h", "date_trunc", "ts", 0L, "timestamp", "hour")
    assert(th.setExpr == BDoc("$dateTrunc" -> BDoc(
      "date" -> BString("$ts"), "unit" -> BString("hour"),
      "timezone" -> BString("UTC"))))
    assert(th.describe == "h = date_trunc(hour, ts)")
    // render/parse round-trip carries fn + unit + type
    val back = ComputedCol.parse(ComputedCol.render(Seq(y, tw,
      ComputedCol("b", "pmod", "v", 7L, "long"))))
    assert(back == Seq(y, tw, ComputedCol("b", "pmod", "v", 7L, "long")))
    // require matrix: bad unit / bad widths / pmod bound refuse loudly
    intercept[IllegalArgumentException] {
      ComputedCol("x", "date_trunc", "ts", 0L, "timestamp", "microsecond") }
    intercept[IllegalArgumentException] {
      ComputedCol("x", "year", "d", 0L, "long") }
    intercept[IllegalArgumentException] {
      ComputedCol("x", "date_trunc", "ts", 0L, "long", "hour") }
    intercept[IllegalArgumentException] {
      ComputedCol("x", "pmod", "v", (1L << 62) + 1L, "long") }
    intercept[IllegalArgumentException] {
      ComputedCol("x", "pmod", "v", 0L, "long") }
  }
}
