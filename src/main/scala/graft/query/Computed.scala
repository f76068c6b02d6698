package graft.query

import graft.bson._

import scala.collection.immutable.ListMap

/** A DERIVED column absorbed into a graft relation (r17/r18,
  * `graft.plans.ComputedKeyRelocate`): `out = fn(field[, n | unit])`
  * where `fn` is one of the EXACT bin functions —
  *
  * Integer bins (r17):
  *  - `pmod`: Spark's `pmod(col, n)` = non-negative remainder for n > 0;
  *  - `mod`: Spark's `col % n` (sign follows the dividend — Java, Spark,
  *    and mongo `$mod` all agree).
  *
  * Both are exact over int32/int64 for every input and every admitted
  * divisor 0 < n ≤ 2^62 (the pmod WIRE form `$add[$mod(a,n), n]` could
  * overflow int64 above that — refused, ADVICE r17), which is why the
  * integer surface stops here: a `floor(col / n)` bin routes through
  * `$divide`, whose DOUBLE arithmetic silently diverges from Spark's
  * exact integer division beyond 2^53 — refused rather than caveated.
  *
  * Date bins (r18, the treasury-canonical `groupBy(year(date))` shape —
  * reference examples/treasury_yield/.../TreasuryYieldMapper.java:47-53):
  *  - `year` / `month` / `dayofmonth`: mongo `$year`/`$month`/
  *    `$dayOfMonth` with an EXPLICIT `timezone: "UTC"` — exact integer
  *    calendar extraction over BSON datetimes (int64 UTC millis), equal
  *    to Spark's `year(col)`/`month(col)`/`dayofmonth(col)` under the
  *    engine's pinned UTC session (the capture rule verifies the
  *    analyzer-inserted timestamp→date cast is UTC). Both engines use
  *    the PROLEPTIC Gregorian calendar (Spark 3+: java.time; mongo:
  *    timelib) — including pre-1582 and pre-1970 (negative-millis)
  *    dates, pinned by ComputedColSpec and live shape #40.
  *  - `date_trunc`: mongo `$dateTrunc {date, unit, timezone: "UTC"[,
  *    startOfWeek: "monday"]}` with the default binSize 1 — truncation
  *    to the natural unit boundary, equal to Spark's
  *    `date_trunc(unit, ts)` under UTC. `week` pins `startOfWeek:
  *    "monday"` (Spark truncates to Monday; mongo's default is Sunday).
  *    Admitted units: year/quarter/month/week/day/hour/minute/second/
  *    millisecond (stored BSON datetimes are whole millis, so
  *    `millisecond` is the finest stored boundary; Spark's MICROSECOND
  *    level is refused at capture rather than claimed as an identity).
  *
  * The value materializes as a document field named `out` —
  *
  *  - `$set` stage first in every server pipeline that consumes it
  *    (grouped aggregates, `$lookup` join legs), so group keys, join
  *    keys, `$expr` ranges, and joined sort tails address it like any
  *    stored field;
  *  - injected by the READERS on plain cursor reads (both transports —
  *    the wire never ships it, the arithmetic is one op per row at
  *    decode);
  *  - evaluated by the fake transport before its pipeline equivalents,
  *    mirroring the `$set` position.
  *
  * Null/missing input → null output (mongo's rule for `$mod` and for
  * every date expression operator, pinned by the live gate);
  * wrong-typed STORED values throw — the fail-loud mixed-storage stance
  * (a server's `$mod` on a string / `$year` on an int errors the same
  * way), which the `assume_uniform_storage` capture gate makes
  * unreachable for engine-written data. A stored DOUBLE computes mongo's
  * double `$mod` (value parity with a live server); a stored BSON
  * TIMESTAMP feeds the date operators its seconds (mongo accepts
  * timestamps there — same value the TimestampType decode reads).
  */
final case class ComputedCol(out: String, fn: String, field: String,
    /** Divisor of the integer-bin fns; unused (0) for date fns. */
    n: Long = 0L,
    /** The OUT column's Spark width — "int", "long", or "timestamp".
      * For the `$mod` fns it decides the `$set` literal's BSON width,
      * and with it mongo's `$mod` result TYPE (int32 % int32 → int32;
      * anything % int64 → int64): an int-width bin over int32 storage
      * stays int32 on the wire and a long-width bin promotes to int64 —
      * exactly what the declared column decodes. The evaluator mirrors
      * the same promotion so the sandbox and a live server produce the
      * same BSON type, not just the same value. Date-field fns are
      * int32 ("int"); `date_trunc` yields a BSON datetime
      * ("timestamp"). */
    outType: String = "long",
    /** `date_trunc` unit (mongo `$dateTrunc` spelling); "" otherwise. */
    unit: String = "") {
  require(ComputedCol.Fns.contains(fn), s"unknown computed fn $fn")
  require(outType == "int" || outType == "long" || outType == "timestamp" ||
    outType == "date",
    s"computed outType must be int|long|timestamp|date, got $outType")
  if (ComputedCol.ModFns.contains(fn)) {
    require(n > 0, s"computed $fn divisor must be positive, got $n")
    // the pmod WIRE form is `$add[$mod(a,n), n]` then `$mod` again — for
    // n > 2^62 the inner `$add` can exceed int64 on a real server
    // (overflow error), so the 'exact for every int64' contract is only
    // true below the bound; the capture rule refuses above it, this
    // require keeps hand-set options honest (ADVICE r17)
    require(fn != "pmod" || n <= ComputedCol.MaxPmodDivisor,
      s"computed pmod divisor must be <= 2^62 (wire $$add overflow), got $n")
    require(outType != "timestamp", s"computed $fn cannot be timestamp-typed")
  } else if (fn == "date_trunc") {
    require(ComputedCol.TruncUnits.contains(unit),
      s"computed date_trunc unit must be one of ${ComputedCol.TruncUnits}, got '$unit'")
    // "date" out (r18, Spark's `trunc(date, fmt)`): the truncated BSON
    // datetime is a canonical midnight at unit ≥ day, so the DateType
    // decode (epoch-day floor) is exact — gated to the day-or-coarser
    // units Spark's trunc accepts
    require(outType == "timestamp" || (outType == "date" &&
        ComputedCol.DayOrCoarser.contains(unit)),
      s"computed date_trunc outType/unit mismatch: $outType/$unit")
  } else { // calendar-field extraction (year/month/…/weekofyear)
    require(outType == "int", s"computed $fn outType must be int, got $outType")
  }

  /** The computed value for one document — None = null (null/missing
    * input). Mirrors the wire rendering exactly: `$mod` type promotion
    * against the literal's width for the integer bins; UTC proleptic-
    * Gregorian calendar math (java.time — identical to Spark's) for the
    * date fns. */
  def eval(d: BDoc): Option[BsonValue] = d.getPath(field) match {
    case None | Some(BNull) => None
    case Some(v) if ComputedCol.ModFns.contains(fn) => v match {
      case BInt32(x) =>
        val r = modOf(x.toLong)
        Some(if (outType == "int") BInt32(r.toInt) else BInt64(r))
      case BInt64(x) => Some(BInt64(modOf(x)))
      case BDouble(x) =>
        // mongo $mod on doubles: double remainder (sign follows dividend)
        val m = x % n
        Some(BDouble(if (fn == "pmod" && m < 0) m + n else m))
      case other => throw new IllegalArgumentException(
        s"computed $fn($field, $n): non-numeric stored value $other " +
          "(a live server's $mod errors identically)")
    }
    case Some(v) => // date fns
      val ms = v match {
        case BDate(x) => x
        // mongo date operators accept BSON timestamps (seconds part) —
        // the same instant the TimestampType decode reads
        case BTimestamp(s, _) => s.toLong * 1000L
        case other => throw new IllegalArgumentException(
          s"computed $fn($field): non-date stored value $other " +
            "(a live server's date operators error identically)")
      }
      lazy val z = ComputedCol.utc(ms)
      fn match {
        case "year" => Some(BInt32(z.getYear))
        case "month" => Some(BInt32(z.getMonthValue))
        case "dayofmonth" => Some(BInt32(z.getDayOfMonth))
        case "hour" => Some(BInt32(z.getHour))
        case "minute" => Some(BInt32(z.getMinute))
        case "second" => Some(BInt32(z.getSecond))
        case "dayofyear" => Some(BInt32(z.getDayOfYear))
        // mongo $dayOfWeek AND Spark dayofweek: 1 = Sunday .. 7 =
        // Saturday (java.time: 1 = Monday .. 7 = Sunday — remap)
        case "dayofweek" =>
          Some(BInt32((z.getDayOfWeek.getValue % 7) + 1))
        // mongo $isoWeek AND Spark weekofyear: ISO 8601 week number
        case "weekofyear" => Some(BInt32(
          z.get(java.time.temporal.IsoFields.WEEK_OF_WEEK_BASED_YEAR)))
        case "date_trunc" => Some(BDate(ComputedCol.truncUtcMillis(ms, unit)))
      }
  }

  private def modOf(a: Long): Long = fn match {
    // branchy form, NOT ((a%n)+n)%n: Spark's Pmod never overflows (it
    // branches on r < 0), and the add form could for extreme divisors —
    // the evaluator must match Spark exactly (ADVICE r17)
    case "pmod" => val r = a % n; if (r < 0) r + n else r
    case "mod" => a % n
  }

  /** The document with the computed field set (null for null/missing
    * input — the `$set`-with-null shape a live server produces). */
  def inject(d: BDoc): BDoc =
    Updates.setField(d, out, eval(d).getOrElse(BNull))

  /** The aggregation expression of the `$set` stage entry. */
  def setExpr: BsonValue = fn match {
    case "pmod" | "mod" =>
      def lit: BsonValue =
        if (outType == "int") BInt32(n.toInt) else BInt64(n)
      def mod(e: BsonValue): BsonValue =
        BDoc("$mod" -> BArray(Vector(e, lit)))
      val base = mod(BString("$" + field))
      if (fn == "mod") base
      else mod(BDoc("$add" -> BArray(Vector(base, lit))))
    case f if ComputedCol.FieldOps.contains(f) =>
      // explicit timezone (UTC is mongo's default, but the engine's
      // whole calendar contract hangs on it — render it, don't imply it)
      BDoc(ComputedCol.FieldOps(f) -> BDoc(
        "date" -> BString("$" + field),
        "timezone" -> BString("UTC")))
    case "date_trunc" =>
      BDoc("$dateTrunc" -> BDoc(ListMap(
        (Seq[(String, BsonValue)](
          "date" -> BString("$" + field),
          "unit" -> BString(unit),
          "timezone" -> BString("UTC")) ++
          // Spark's week truncates to MONDAY; mongo's default startOfWeek
          // is Sunday — pin it (only legal alongside unit: "week")
          (if (unit == "week") Seq("startOfWeek" -> (BString("monday"): BsonValue))
           else Nil)): _*)))
  }

  /** Plan-description spelling (`PushedComputed: [...]`). */
  def describe: String = fn match {
    case "pmod" | "mod" => s"$out = $fn($field, $n)"
    case "date_trunc" => s"$out = date_trunc($unit, $field)"
    case _ => s"$out = $fn($field)"
  }
}

object ComputedCol {
  val ModFns: Set[String] = Set("pmod", "mod")

  /** Calendar-FIELD extractions (int32 out) and their aggregation
    * operators. Parity notes: `$dayOfWeek` and Spark's `dayofweek` both
    * number Sunday 1 .. Saturday 7; `$isoWeek` and Spark's `weekofyear`
    * are both the ISO 8601 week number (mongo's `$week` — the US rule —
    * deliberately has NO capture); quarter extraction has no mongo
    * operator (use `date_trunc(quarter)`). */
  val FieldOps: Map[String, String] = Map(
    "year" -> "$year", "month" -> "$month", "dayofmonth" -> "$dayOfMonth",
    "hour" -> "$hour", "minute" -> "$minute", "second" -> "$second",
    "dayofyear" -> "$dayOfYear", "dayofweek" -> "$dayOfWeek",
    "weekofyear" -> "$isoWeek")

  val DateFns: Set[String] = FieldOps.keySet + "date_trunc"
  val Fns: Set[String] = ModFns ++ DateFns

  /** Admitted `$dateTrunc` units (mongo spelling; Spark's MICROSECOND
    * level is refused at capture — no mongo unit below millisecond). */
  val TruncUnits: Set[String] = Set("year", "quarter", "month", "week",
    "day", "hour", "minute", "second", "millisecond")

  /** Units whose truncated instant is a canonical midnight — the legal
    * `outType = "date"` units (Spark's `trunc(date, fmt)` surface). */
  val DayOrCoarser: Set[String] = Set("year", "quarter", "month", "week", "day")

  /** Largest pmod divisor whose wire form `$add[$mod(a,n), n]` stays
    * inside int64 for every int64 input: |a % n| < n, so the sum is
    * < 2·n — bounded by 2^63 exactly when n ≤ 2^62. */
  val MaxPmodDivisor: Long = 1L << 62

  private[query] def utc(ms: Long): java.time.ZonedDateTime =
    java.time.Instant.ofEpochMilli(ms).atZone(java.time.ZoneOffset.UTC)

  /** `$dateTrunc` (binSize 1, UTC, startOfWeek monday) over UTC millis —
    * proleptic Gregorian via java.time, the same calendar Spark's
    * `date_trunc` uses, so sandbox and Spark agree bit-for-bit; sub-day
    * units truncate by floor-mod (exact for negative/pre-1970 millis —
    * the epoch sits on a midnight, and hours/minutes/seconds divide the
    * day evenly). */
  private[query] def truncUtcMillis(ms: Long, unit: String): Long = {
    import java.time._
    def dayStartMs(d: LocalDate): Long =
      d.atStartOfDay(ZoneOffset.UTC).toInstant.toEpochMilli
    lazy val z = utc(ms)
    unit match {
      case "year" => dayStartMs(LocalDate.of(z.getYear, 1, 1))
      case "quarter" =>
        dayStartMs(LocalDate.of(z.getYear, ((z.getMonthValue - 1) / 3) * 3 + 1, 1))
      case "month" => dayStartMs(LocalDate.of(z.getYear, z.getMonthValue, 1))
      case "week" => dayStartMs(z.toLocalDate.`with`(
        java.time.temporal.TemporalAdjusters.previousOrSame(DayOfWeek.MONDAY)))
      case "day" => ms - Math.floorMod(ms, 86400000L)
      case "hour" => ms - Math.floorMod(ms, 3600000L)
      case "minute" => ms - Math.floorMod(ms, 60000L)
      case "second" => ms - Math.floorMod(ms, 1000L)
      case "millisecond" => ms
    }
  }

  /** The relation option carrying the computed columns, JSON:
    * `[{"out": "bkt", "fn": "pmod", "field": "ts", "n": 600},
    *   {"out": "y", "fn": "year", "field": "d", "t": "int"}, ...]`. */
  val OptionKey = "computed_columns"

  def parse(json: String): Seq[ComputedCol] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    JsonMethods.parse(json).asInstanceOf[JArray].arr.map {
      case o: JObject =>
        val m = o.obj.toMap
        def str(k: String): String = m(k) match {
          case JString(s) => s
          case other => throw new IllegalArgumentException(
            s"computed_columns $k must be a string, got $other")
        }
        val n = m.get("n") match {
          case Some(JInt(x)) => x.toLong
          case Some(JLong(x)) => x
          case None => 0L
          case other => throw new IllegalArgumentException(
            s"computed_columns n must be an integer, got $other")
        }
        val t = m.get("t") match {
          case Some(JString(x)) => x
          case None => "long"
          case other => throw new IllegalArgumentException(
            s"computed_columns t must be a string, got $other")
        }
        val u = m.get("u") match {
          case Some(JString(x)) => x
          case None => ""
          case other => throw new IllegalArgumentException(
            s"computed_columns u must be a string, got $other")
        }
        ComputedCol(str("out"), str("fn"), str("field"), n, t, u)
      case other => throw new IllegalArgumentException(
        s"computed_columns entry must be an object, got $other")
    }
  }

  def render(cols: Seq[ComputedCol]): String = {
    import org.json4s.JsonDSL._
    import org.json4s.jackson.JsonMethods
    JsonMethods.compact(JsonMethods.render(cols.map(c =>
      ("out" -> c.out) ~ ("fn" -> c.fn) ~ ("field" -> c.field) ~
        ("n" -> c.n) ~ ("t" -> c.outType) ~ ("u" -> c.unit))))
  }

  /** Parse a relation options map (empty when the option is absent). */
  def fromOptions(opts: Map[String, String]): Seq[ComputedCol] =
    opts.get(OptionKey).map(parse).getOrElse(Nil)

  /** The `$set` stage materializing every computed column, or None. */
  def setStage(cols: Seq[ComputedCol]): Option[BDoc] =
    if (cols.isEmpty) None
    else Some(BDoc("$set" -> BDoc(ListMap(
      cols.map(c => c.out -> c.setExpr): _*))))

  /** Inject every computed field into a document (fake transport /
    * reader seam — the client-side mirror of [[setStage]]). */
  def injectAll(cols: Seq[ComputedCol], d: BDoc): BDoc =
    cols.foldLeft(d)((acc, c) => c.inject(acc))
}
