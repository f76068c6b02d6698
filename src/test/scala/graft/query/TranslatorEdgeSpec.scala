package graft.query

import graft.bson._
import org.apache.spark.sql.sources._
import org.scalatest.funsuite.AnyFunSuite

/** Pushdown soundness edges: every accepted filter is REMOVED from Spark's
  * post-scan evaluation, so a translation that widens the match set returns
  * wrong rows with no second line of defense. These cases pin the
  * refuse-or-exact rules.
  */
class TranslatorEdgeSpec extends AnyFunSuite {

  test("timestamp literals push with µs read semantics; sub-µs stays residual") {
    val exact = java.sql.Timestamp.valueOf("2024-01-02 03:04:05.123")
    assert(FilterTranslator.translate(GreaterThan("ts", exact)).isDefined)

    // sub-MICROsecond cannot be represented in TimestampType reads
    val sub = java.sql.Timestamp.valueOf("2024-01-02 03:04:05.1234567")
    assert(FilterTranslator.translate(GreaterThan("ts", sub)).isEmpty,
      "a sub-µs bound cannot compile to an exact read-µs comparison")
    assert(FilterTranslator.translate(EqualTo("ts", sub)).isEmpty)

    // µs-exact literals (Spark's own precision) push — the r13 ReadTime
    // nodes compare read MICROS, so the old whole-ms restriction is gone
    val instMicro = java.time.Instant.parse("2024-01-02T03:04:05.000123Z")
    assert(FilterTranslator.translate(LessThan("ts", instMicro)).isDefined)
    val instExact = java.time.Instant.parse("2024-01-02T03:04:05.123Z")
    assert(FilterTranslator.translate(LessThan("ts", instExact)).isDefined)
  }

  test("pushed TIMESTAMP filters read BOTH storages (BDate millis, BTimestamp seconds)") {
    val t = java.sql.Timestamp.valueOf("2024-01-02 03:04:05.0")
    val us = t.toInstant.toEpochMilli * 1000L
    val eq = FilterTranslator.translate(EqualTo("ts", t)).get
    // a bracketed Eq(BDate) would DROP the BTimestamp-backed row Spark's
    // read keeps (both read as the same microseconds)
    assert(eq.matches(BDoc("ts" -> BDate(us / 1000L))))
    assert(eq.matches(BDoc("ts" -> BTimestamp((us / 1000000L).toInt, 0))),
      "BTimestamp storage reading to the same micros must match")
    assert(!eq.matches(BDoc("ts" -> BDate(us / 1000L + 1L))))
    assert(!eq.matches(BDoc("ts" -> BString("2024"))))
    val gt = FilterTranslator.translate(GreaterThan("ts", t)).get
    assert(gt.matches(BDoc("ts" -> BTimestamp((us / 1000000L).toInt + 1, 0))))
    assert(!gt.matches(BDoc("ts" -> BDate(us / 1000L))))

    // the uniform-storage rewrite restores the exact bracket (renderable)
    // forms — every engine-written timestamp is a BDate
    val re = BQuery.uniformReadBracket(eq)
    assert(re == BQuery.Eq("ts", BDate(us / 1000L)), re.toString)
    val reIn = BQuery.uniformReadBracket(
      FilterTranslator.translate(In("ts", Array[Any](t))).get)
    assert(reIn == BQuery.In("ts", Seq(BDate(us / 1000L))), reIn.toString)
  }

  test("ASCII-bounded string RANGES rewrite to bracket forms under uniform storage (r14)") {
    // `name >= 'M'` — an all-ASCII bound: trichotomy against it agrees
    // across UTF-8-byte (Spark read), UTF-16-unit (engine bracket), and
    // server binary orders, so the bracket form is exact and renderable
    val gte = BQuery.uniformReadBracket(
      FilterTranslator.translate(GreaterThanOrEqual("name", "M")).get)
    assert(gte == BQuery.Gte("name", BString("M")), gte.toString)
    val lt = BQuery.uniformReadBracket(
      FilterTranslator.translate(LessThan("name", "Customer#42")).get)
    assert(lt == BQuery.Lt("name", BString("Customer#42")), lt.toString)

    // ADVERSARIAL: a bound containing a char ≥ U+E000 must REFUSE the
    // rewrite — comparing a supplementary character (U+10000, UTF-16
    // surrogate pair D800 DC00) against U+E000 disagrees between
    // UTF-8-byte order (U+10000 > U+E000) and UTF-16-unit order
    // (0xD800 < 0xE000): the read-semantics node must stay client-side
    val supp = "\uE000x"
    val kept = BQuery.uniformReadBracket(
      FilterTranslator.translate(GreaterThanOrEqual("name", supp)).get)
    assert(kept == BQuery.ReadStrCmp("name", supp, BQuery.ReadStrOp.Gte),
      s"non-ASCII bound must keep the read node: $kept")
    // and the read node itself orders the adversarial pair the Spark way
    val suppStr = new String(Character.toChars(0x10000))
    assert(kept.matches(BDoc("name" -> BString(suppStr))),
      "U+10000 >= U+E000 in UTF-8/code-point order (Spark's)")
    // any non-ASCII char in the bound refuses, conservatively
    assert(BQuery.uniformReadBracket(
      FilterTranslator.translate(LessThan("name", "café")).get)
      .isInstanceOf[BQuery.ReadStrCmp])
  }

  test("IN lists drop nulls; all-null IN and a = NULL match nothing") {
    val q = FilterTranslator.translate(In("a", Array(1, null, 2))).get
    assert(q === BQuery.In("a", Seq(BInt32(1), BInt32(2))))
    // a doc with explicit null must NOT match (Spark: IN with null is never true)
    assert(!q.matches(BDoc("a" -> BNull)))

    val allNull = FilterTranslator.translate(In("a", Array(null))).get
    assert(!allNull.matches(BDoc("a" -> BNull)) && !allNull.matches(BDoc("a" -> BInt32(1))))

    val eqNull = FilterTranslator.translate(EqualTo("a", null)).get
    assert(!eqNull.matches(BDoc("a" -> BNull)))
    assert(!eqNull.matches(BDoc.empty))
  }

  test("string predicates push as anchored regexes with exact semantics") {
    val sw = FilterTranslator.translate(StringStartsWith("s", "ab")).get
    assert(sw.matches(BDoc("s" -> BString("abc"))))
    assert(!sw.matches(BDoc("s" -> BString("xab"))))
    assert(!sw.matches(BDoc.empty))

    val ew = FilterTranslator.translate(StringEndsWith("s", "bc")).get
    assert(ew.matches(BDoc("s" -> BString("abc"))))
    assert(!ew.matches(BDoc("s" -> BString("bca"))))
    assert(!ew.matches(BDoc("s" -> BString("abc\n"))),
      "endsWith must not match before a trailing newline ($ would; \\z does not)")

    val ct = FilterTranslator.translate(StringContains("s", "b.c")).get
    assert(ct.matches(BDoc("s" -> BString("ab.cd"))))
    assert(!ct.matches(BDoc("s" -> BString("abxcd"))), "literal must be quoted, not regex-interpreted")
  }

  test("accepted/residual split reports string predicates as accepted") {
    val (q, accepted, residual) = FilterTranslator.split(Array(
      StringStartsWith("s", "a"),
      GreaterThan("ts", java.sql.Timestamp.valueOf("2024-01-02 03:04:05.1234567"))))
    assert(accepted.length === 1 && residual.length === 1)
    assert(q.isInstanceOf[BQuery.ReadStrRegex])
  }

  test("pushed string predicates see ObjectId/Symbol/Regex storage as the read-string") {
    // a foreign dump's ObjectId _id reads as its hex string — a pushed
    // equality/range on that string must keep exactly the rows Spark's
    // post-read comparison would (accepted filters are never re-checked)
    val hex = "6578616d706c65206f696431"
    val eq = FilterTranslator.translate(EqualTo("_id", hex)).get
    assert(eq.matches(BDoc("_id" -> BObjectId(hex))))
    assert(eq.matches(BDoc("_id" -> BString(hex))))
    assert(eq.matches(BDoc("_id" -> BSymbol(hex))))
    assert(!eq.matches(BDoc("_id" -> BObjectId("0" * 24))))

    val range = FilterTranslator.translate(GreaterThanOrEqual("_id", "60" + "0" * 22)).get
    assert(range.matches(BDoc("_id" -> BObjectId(hex))))
    assert(!range.matches(BDoc("_id" -> BObjectId("5f" + "0" * 22))))

    // regex storage reads as the pattern source string
    val sw = FilterTranslator.translate(StringStartsWith("p", "ab")).get
    assert(sw.matches(BDoc("p" -> BRegex("abc.*", "i"))))
    assert(!sw.matches(BDoc("p" -> BRegex("zbc", ""))))
    val peq = FilterTranslator.translate(EqualTo("p", "abc.*")).get
    assert(peq.matches(BDoc("p" -> BRegex("abc.*", "i"))))

    // long literals read-match BDate storage (RowCodec reads a date as
    // its milliseconds under a LongType column) alongside the int widths
    val leq = FilterTranslator.translate(EqualTo("t", 12345L)).get
    assert(leq.matches(BDoc("t" -> BDate(12345L))))
    assert(leq.matches(BDoc("t" -> BInt64(12345L))))
    assert(leq.matches(BDoc("t" -> BInt32(12345))))
    assert(!leq.matches(BDoc("t" -> BDate(1L))))
    val lgt = FilterTranslator.translate(GreaterThan("t", 100L)).get
    assert(lgt.matches(BDoc("t" -> BDate(150L))))
    assert(!lgt.matches(BDoc("t" -> BDate(50L))))
    assert(!lgt.matches(BDoc("t" -> BDouble(150.0))),
      "double storage is unreadable as long — read semantics never match it")

    // string ranges compare in UTF-8 BYTE order (Spark's), not Java's
    // UTF-16 code-unit order: U+FFFD < U+1F600 by code point although
    // 0xFFFD > 0xD83D by code unit
    val sup = "😀" // U+1F600
    val sgt = FilterTranslator.translate(GreaterThan("s", sup)).get
    assert(!sgt.matches(BDoc("s" -> BString("�"))))
    val slt = FilterTranslator.translate(LessThan("s", sup)).get
    assert(slt.matches(BDoc("s" -> BString("�"))))

    // typed (option-level JSON) queries keep Mongo bracket semantics: an
    // explicit $oid value matches ONLY ObjectId storage, and a plain
    // string value matches ONLY string/symbol storage (the read-string
    // departure lives in the ReadStr* nodes only the TRANSLATOR emits)
    assert(BQuery.Eq("_id", BObjectId(hex)).matches(BDoc("_id" -> BObjectId(hex))))
    assert(!BQuery.Eq("_id", BObjectId(hex)).matches(BDoc("_id" -> BString(hex))))
    assert(!BQuery.Eq("_id", BString(hex)).matches(BDoc("_id" -> BObjectId(hex))))
    assert(!BQuery.Regex("p", "ab").matches(BDoc("p" -> BRegex("abc", ""))))
  }

  test("pushed DATE filters compile to day-window ranges (read-day semantics, tz-free)") {
    val d = java.sql.Date.valueOf("2024-01-03")
    val day = d.toLocalDate.toEpochDay
    val midnight = BDate(day * 86400000L)
    val noon = BDate(day * 86400000L + 43200000L) // non-midnight storage
    val nextDay = BDate((day + 1) * 86400000L)
    val prev = BDate(day * 86400000L - 1L)

    // a DateType column reads the stored BDate's epoch-day FLOOR, so a
    // pushed `day = DATE d` must keep EVERY storage within the day —
    // raw-millis equality would drop the noon row Spark's read keeps
    val eq = FilterTranslator.translate(EqualTo("day", d)).get
    assert(eq.matches(BDoc("day" -> midnight)))
    assert(eq.matches(BDoc("day" -> noon)),
      "non-midnight storage reads as the same day and must match")
    assert(!eq.matches(BDoc("day" -> nextDay)))
    assert(!eq.matches(BDoc("day" -> prev)))
    assert(!eq.matches(BDoc("other" -> midnight)))

    val gt = FilterTranslator.translate(GreaterThan("day", d)).get
    assert(!gt.matches(BDoc("day" -> noon)) && gt.matches(BDoc("day" -> nextDay)))
    val gte = FilterTranslator.translate(GreaterThanOrEqual("day", d)).get
    assert(gte.matches(BDoc("day" -> midnight)) && !gte.matches(BDoc("day" -> prev)))
    val lt = FilterTranslator.translate(LessThan("day", d)).get
    assert(lt.matches(BDoc("day" -> prev)) && !lt.matches(BDoc("day" -> noon)))
    val lte = FilterTranslator.translate(LessThanOrEqual("day", d)).get
    assert(lte.matches(BDoc("day" -> noon)) && !lte.matches(BDoc("day" -> nextDay)))
    val ne = FilterTranslator.translate(Not(EqualTo("day", d))).get
    assert(!ne.matches(BDoc("day" -> noon)) && ne.matches(BDoc("day" -> nextDay)) &&
      ne.matches(BDoc("day" -> prev)))
    val in = FilterTranslator.translate(
      In("day", Array[Any](d, java.sql.Date.valueOf("2024-01-05")))).get
    assert(in.matches(BDoc("day" -> noon)))
    assert(!in.matches(BDoc("day" -> nextDay)))

    // LocalDate literals (java8 datetime API) translate identically
    val eqL = FilterTranslator.translate(
      EqualTo("day", java.time.LocalDate.of(2024, 1, 3))).get
    assert(eqL.matches(BDoc("day" -> noon)) && !eqL.matches(BDoc("day" -> nextDay)))
  }
}
