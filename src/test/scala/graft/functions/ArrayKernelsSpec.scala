package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge

/** The codegen'd kernels must stay bit-identical to the declarative
  * formulations they replaced — those are what the DuckDB oracle mirrors.
  */
class ArrayKernelsSpec extends SparkSpec {

  test("ShingleHashes equals hash of transform-generated shingle strings") {
    import spark.implicits._
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a b c",
      "one two",            // < 3 tokens -> no shingles
      "",
      "x  y z w",           // double space -> empty token, kept identically
      "héllo wörld ünïcode test").toDF("text")
    val kernel = docs
      .select(explode(Bridge.column(ShingleHashes(
        Bridge.expression(split($"text", " "))))).as("h"))
    val legacy = docs
      .select(split($"text", " ").as("t"))
      .filter(size($"t") >= 3)
      .select(explode(expr(
        "transform(sequence(0, size(t) - 3), i -> concat_ws(' ', t[i], t[i+1], t[i+2]))")).as("sh"))
      .select(Portable.hash60($"sh").as("h"))
    assert(kernel.collect().map(_.getLong(0)).sorted.toSeq ===
      legacy.collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("NGramHashes equals Md5Prefix60 over NGrams strings for widths 1-3") {
    import spark.implicits._
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a b c", "one two", "solo", "",
      "x  y z w",
      "héllo wörld ünïcode test").toDF("text")
    for (n <- 1 to 3) {
      val kernel = docs
        .select(explode(Bridge.column(NGramHashes(
          Bridge.expression(split($"text", " ")), n))).as("h"))
      val legacy = docs
        .select(explode(Bridge.column(NGrams(
          Bridge.expression(split($"text", " ")), n))).as("g"))
        .select(Portable.hash60($"g").as("h"))
      assert(kernel.collect().map(_.getLong(0)).sorted.toSeq ===
        legacy.collect().map(_.getLong(0)).sorted.toSeq, s"width $n")
    }
  }

  test("QuantFloats equals the transform-lambda quantizer on floats") {
    import spark.implicits._
    val df = Seq(
      Array(0.1f, -0.5f, 1.9999f, 0.0f, -1.0001f, Float.MinPositiveValue),
      Array.empty[Float]).toDF("v")
    val kernel = df.select(Bridge.column(QuantFloats(
      Bridge.expression($"v"), 1000.0)).as("q"))
    val legacy = df.select(expr(
      "transform(v, x -> CAST(floor(CAST(x AS DOUBLE) * 1000.0) AS BIGINT))").as("q"))
    assert(kernel.collect().map(_.getSeq[Long](0)).toSeq ===
      legacy.collect().map(_.getSeq[Long](0)).toSeq)
  }

  test("QuantFloats preserves null elements like the lambda and the oracle") {
    import spark.implicits._
    val df = Seq(1).toDF("x").select(
      expr("array(CAST(0.1 AS FLOAT), CAST(NULL AS FLOAT), CAST(2.0 AS FLOAT))").as("v"))
    val kernel = df.select(Bridge.column(QuantFloats(
      Bridge.expression($"v"), 1000.0)).as("q")).head.getSeq[Any](0)
    val legacy = df.select(expr(
      "transform(v, x -> CAST(floor(CAST(x AS DOUBLE) * 1000.0) AS BIGINT))").as("q"))
      .head.getSeq[Any](0)
    assert(kernel === legacy)
    assert(kernel(1) == null, "null element must stay null, not quantize to 0")
  }

  test("QuantFloats handles array<double> input") {
    import spark.implicits._
    val df = Seq(Array(0.1, -2.5)).toDF("v")
    val got = df.select(Bridge.column(QuantFloats(
      Bridge.expression($"v"), 1000.0)).as("q")).head.getSeq[Long](0)
    assert(got === Seq(100L, -2500L))
  }

  test("DistinctModP equals explode + mod + global distinct") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the quick brown fox"),
      (2L, "a b c a b c a b c"),     // repeated shingles -> must dedup
      (3L, "one two"),               // no shingles -> empty array
      (4L, "x y z")).toDF("doc_id", "text")
    val sh = Bridge.column(ShingleHashes(
      Bridge.expression(split($"text", " "))))
    val kernel = docs
      .select($"doc_id", explode(Bridge.column(DistinctModP(
        Bridge.expression(sh), Portable.P))).as("hp"))
    val legacy = docs
      .select($"doc_id", explode(sh).as("h60"))
      .select($"doc_id", ($"h60" % Portable.P).as("hp"))
      .distinct()
    assert(kernel.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq ===
      legacy.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq)
  }

  test("DistinctModP dedups values that collide only after the mod") {
    import spark.implicits._
    val p = 7L
    val df = Seq(Array(3L, 10L, 17L, 5L)).toDF("v") // 3,10,17 ≡ 3 (mod 7)
    val got = df.select(Bridge.column(DistinctModP(
      Bridge.expression($"v"), p)).as("d")).head.getSeq[Long](0)
    assert(got === Seq(3L, 5L))
  }

  test("CharSplit is bit-identical to regex split(str, \" \") incl. empties/unicode") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{split => resplit, col}
    val cases = Seq(
      "a b c", "", " ", "  ", "a", " a", "a ", "a  b", "  a  b  ",
      "caf\u00e9 na\u00efve \u4e2d\u6587 \ud83d\ude00ok", "tab\tand space", "a b\nc d")
    val df = cases.toDF("s")
    val got = df.select(Portable.spaceSplit(col("s")).as("t")).collect().map(_.getSeq[String](0))
    val want = df.select(resplit(col("s"), " ").as("t")).collect().map(_.getSeq[String](0))
    got.zip(want).zip(cases).foreach { case ((g, w), c) =>
      assert(g === w, s"mismatch on <$c>")
    }
    // codegen and interpreted paths agree
    val expr = graft.functions.CharSplit(
      org.apache.spark.sql.graft.Bridge.expression(col("s")), ' '.toByte)
    assert(expr.dataType.toString.contains("StringType"))
  }

  test("CollapseRuns equals the indexed-filter HOF formulation") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val cases = Seq(
      "the the cat", "a a a", "", " ", "a  a", "x", "a b a b", "b b  b b",
      "café café ok")
    val df = cases.toDF("s")
    val toks = Portable.spaceSplit($"s")
    val got = df.select(Portable.collapseRuns(toks).as("t"))
      .collect().map(_.getSeq[String](0))
    val want = df.select(filter(toks, (t, i) =>
        when(i === 0, lit(true)).otherwise(t =!= element_at(toks, i))).as("t"))
      .collect().map(_.getSeq[String](0))
    got.zip(want).zip(cases).foreach { case ((g, w), c) =>
      assert(g === w, s"mismatch on <$c>")
    }
  }

  test("TokenCounts equals explode+filter+groupBy term frequency") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val cases = Seq(
      (1L, "a b a  c b a"), (2L, ""), (3L, "   "), (4L, "solo"),
      (5L, " lead trail "), (6L, "café café 中文"),
      (7L, "x x x x x x x x"))
    val df = cases.toDF("doc_id", "s")
    val got = df
      .select($"doc_id", explode(Portable.tokenCounts($"s")).as("tc"))
      .select($"doc_id", $"tc.tok", $"tc.cnt")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val want = df
      .select($"doc_id", explode(Portable.spaceSplit($"s")).as("tok"))
      .filter($"tok" =!= "")
      .groupBy($"doc_id", $"tok").agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got === want)
    // docs with no tokens contribute nothing (not an empty-string token)
    assert(!got.exists(_._1 == 2L) && !got.exists(_._1 == 3L))
    // null text -> null array (not a crash), matching CharSplit
    val n = Seq((8L, null: String)).toDF("doc_id", "s")
      .select(Portable.tokenCounts($"s").as("tc")).collect()
    assert(n.head.isNullAt(0))
  }

  test("WinnowMins equals the distinct slice-min HOF formulation") {
    import spark.implicits._
    val cases = Seq(
      Seq(5L, 3L, 8L, 1L, 9L, 2L, 7L, 4L),   // mixed
      Seq(1L, 1L, 1L, 1L, 1L),               // all equal -> one fp
      Seq(9L, 8L, 7L, 6L, 5L, 4L),           // descending
      Seq(1L, 2L, 3L, 4L),                   // exactly one window
      Seq(1L, 2L, 3L),                       // n < w -> empty
      Seq.empty[Long])
    val df = cases.zipWithIndex.map { case (h, i) => (i.toLong, h) }.toDF("id", "h")
    val kernel = df.select($"id",
      Bridge.column(WinnowMins(Bridge.expression($"h"), 4)).as("fps"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).sorted).toMap
    val hof = df
      .select($"id",
        when(size($"h") >= 4,
          array_distinct(expr(
            "transform(sequence(1, size(h) - 3), i -> array_min(slice(h, i, 4)))")))
          .otherwise(typedLit(Seq.empty[Long])).as("fps"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).sorted).toMap
    assert(kernel === hof)
    // hand check: windows of [5,3,8,1,9,2,7,4] -> mins 1,1,1,1,2 -> {1,2}
    assert(kernel(0L) === Seq(1L, 2L))
    assert(kernel(4L).isEmpty && kernel(5L).isEmpty)
  }

  test("CharPairs equals the transform(sequence, substr) HOF formulation") {
    import spark.implicits._
    val toks = Seq("abab", "ab", "a", "", "héllo", "日本語テスト", "xy z")
      .toDF("tok")
    val kernel = toks
      .select($"tok", Bridge.column(CharPairs(Bridge.expression($"tok"))).as("p"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    val hof = toks
      .select($"tok", expr(
        """CASE WHEN length(tok) >= 2
          |THEN transform(sequence(1, length(tok) - 1), i -> substr(tok, i, 2))
          |ELSE array() END""".stripMargin).as("p"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    assert(kernel === hof)
    assert(kernel("abab") === List("ab", "ba", "ab"))
    assert(kernel("a").isEmpty && kernel("").isEmpty)
    assert(kernel("日本語テスト") === List("日本", "本語", "語テ", "テス", "スト"))
  }
}
