package graft.query

import graft.bson._

import scala.collection.immutable.ListMap

/** A DERIVED integer column absorbed into a graftserver relation
  * (r17, `graft.plans.ComputedKeyRelocate`): `out = fn(field, n)` where
  * `fn` is one of the INT-EXACT bin functions —
  *
  *  - `pmod`: Spark's `pmod(col, n)` = `((col % n) + n) % n` (always
  *    non-negative for n > 0);
  *  - `mod`: Spark's `col % n` (sign follows the dividend — Java, Spark,
  *    and mongo `$mod` all agree).
  *
  * Both are exact over int32/int64 for every input (no overflow for
  * 0 < n: |col % n| + n < 2·n ≪ 2^63), which is why the surface stops
  * here: a `floor(col / n)` bin routes through `$divide`, whose DOUBLE
  * arithmetic silently diverges from Spark's exact integer division
  * beyond 2^53 — refused rather than caveated.
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
  * Null/missing input → null output (mongo's arithmetic-operator rule,
  * pinned by the live gate); non-numeric STORED values throw — the
  * fail-loud mixed-storage stance (a server's `$mod` on a string errors
  * the same way), which the `assume_uniform_storage` capture gate makes
  * unreachable for engine-written data. A stored DOUBLE computes mongo's
  * double `$mod` (value parity with a live server; the decode layer
  * then applies its standard read semantics for the declared type).
  */
final case class ComputedCol(out: String, fn: String, field: String, n: Long,
    /** The OUT column's Spark width — "int" or "long". Decides the
      * `$set` literal's BSON width, and with it mongo's `$mod` result
      * TYPE (int32 % int32 → int32; anything % int64 → int64): an
      * int-width bin over int32 storage stays int32 on the wire and a
      * long-width bin promotes to int64 — exactly what the declared
      * column decodes. The evaluator mirrors the same promotion so the
      * sandbox and a live server produce the same BSON type, not just
      * the same value. */
    outType: String = "long") {
  require(ComputedCol.Fns.contains(fn), s"unknown computed fn $fn")
  require(n > 0, s"computed $fn divisor must be positive, got $n")
  // the pmod WIRE form is `$add[$mod(a,n), n]` then `$mod` again — for
  // n > 2^62 the inner `$add` can exceed int64 on a real server
  // (overflow error), so the 'exact for every int64' contract is only
  // true below the bound; the capture rule refuses above it, this
  // require keeps hand-set options honest (ADVICE r17)
  require(fn != "pmod" || n <= ComputedCol.MaxPmodDivisor,
    s"computed pmod divisor must be <= 2^62 (wire $$add overflow), got $n")
  require(outType == "int" || outType == "long",
    s"computed outType must be int|long, got $outType")

  /** The computed value for one document — None = null (null/missing
    * input). Mirrors the `$set` rendering exactly, including mongo's
    * `$mod` type promotion against the literal's width. */
  def eval(d: BDoc): Option[BsonValue] = d.getPath(field) match {
    case None | Some(BNull) => None
    case Some(BInt32(x)) =>
      val v = apply(x.toLong)
      Some(if (outType == "int") BInt32(v.toInt) else BInt64(v))
    case Some(BInt64(x)) => Some(BInt64(apply(x)))
    case Some(BDouble(x)) =>
      // mongo $mod on doubles: double remainder (sign follows dividend)
      val m = x % n
      Some(BDouble(if (fn == "pmod") ((m + n) % n) else m))
    case Some(other) => throw new IllegalArgumentException(
      s"computed $fn($field, $n): non-numeric stored value $other " +
        "(a live server's $mod errors identically)")
  }

  private def apply(a: Long): Long = fn match {
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
  def setExpr: BsonValue = {
    def lit: BsonValue =
      if (outType == "int") BInt32(n.toInt) else BInt64(n)
    def mod(e: BsonValue): BsonValue =
      BDoc("$mod" -> BArray(Vector(e, lit)))
    val base = mod(BString("$" + field))
    fn match {
      case "mod" => base
      case "pmod" =>
        mod(BDoc("$add" -> BArray(Vector(base, lit))))
    }
  }
}

object ComputedCol {
  val Fns: Set[String] = Set("pmod", "mod")

  /** Largest pmod divisor whose wire form `$add[$mod(a,n), n]` stays
    * inside int64 for every int64 input: |a % n| < n, so the sum is
    * < 2·n — bounded by 2^63 exactly when n ≤ 2^62. */
  val MaxPmodDivisor: Long = 1L << 62

  /** The relation option carrying the computed columns, JSON:
    * `[{"out": "bkt", "fn": "pmod", "field": "ts", "n": 600}, ...]`. */
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
        val n = m("n") match {
          case JInt(x) => x.toLong
          case JLong(x) => x
          case other => throw new IllegalArgumentException(
            s"computed_columns n must be an integer, got $other")
        }
        val t = m.get("t") match {
          case Some(JString(x)) => x
          case None => "long"
          case other => throw new IllegalArgumentException(
            s"computed_columns t must be a string, got $other")
        }
        ComputedCol(str("out"), str("fn"), str("field"), n, t)
      case other => throw new IllegalArgumentException(
        s"computed_columns entry must be an object, got $other")
    }
  }

  def render(cols: Seq[ComputedCol]): String = {
    import org.json4s.JsonDSL._
    import org.json4s.jackson.JsonMethods
    JsonMethods.compact(JsonMethods.render(cols.map(c =>
      ("out" -> c.out) ~ ("fn" -> c.fn) ~ ("field" -> c.field) ~
        ("n" -> c.n) ~ ("t" -> c.outType))))
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
