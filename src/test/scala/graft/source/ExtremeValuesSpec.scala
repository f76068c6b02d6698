package graft.source

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Extreme-value probes through this round's new paths: Long extremes
  * (MinValue/MaxValue — beyond the 2^53 double window, where any sneaky
  * double widening corrupts values), empty strings, empty arrays, and
  * fraction edges on the sample pushdown. Not a full oracle fixture —
  * targeted engine-vs-engine invariants that degenerate inputs must
  * keep.
  */
class ExtremeValuesSpec extends SparkSpec {

  private def freshDir(): String =
    Files.createTempDirectory("graft-extreme").toString

  test("Long.MaxValue/MinValue keys round-trip exactly through write, scan, TopN, grouped agg") {
    import spark.implicits._
    val dir = freshDir()
    val ks = Seq(Long.MinValue, Long.MinValue + 1, -1L, 0L, 1L,
      (1L << 53) + 1, Long.MaxValue - 1, Long.MaxValue)
    ks.map(k => (k, 1L)).toDF("_id", "one")
      .write.format("graftbson").option("id_column", "_id")
      .mode("append").save(dir)
    val df = spark.read.format("graftbson").schema("_id LONG, one LONG").load(dir)
    assert(df.collect().map(_.getLong(0)).sorted.toSeq == ks.sorted)
    // TopN pushdown selects by READ values: 2^53+1 and MaxValue-1 are
    // DISTINCT here (a double-widened compare would tie them)
    val top = df.orderBy($"_id".desc).limit(3)
    assert(top.queryExecution.executedPlan.toString.contains("PushedTopN"))
    assert(top.collect().map(_.getLong(0)).toSeq ==
      Seq(Long.MaxValue, Long.MaxValue - 1, (1L << 53) + 1))
    // grouped MIN/MAX partials fold exactly at the extremes
    val agg = df.agg(min($"_id").as("lo"), max($"_id").as("hi"),
      count(lit(1)).as("n")).collect().head
    assert(agg.getLong(0) == Long.MinValue && agg.getLong(1) == Long.MaxValue
      && agg.getLong(2) == ks.size.toLong)
  }

  test("SUM overflow at the Long edge faults loudly (ANSI), never wraps") {
    import spark.implicits._
    val dir = freshDir()
    Seq((1L, Long.MaxValue), (2L, 1L)).toDF("_id", "v")
      .write.format("graftbson").mode("append").save(dir)
    val e = intercept[Throwable] {
      spark.read.format("graftbson").schema("_id LONG, v LONG").load(dir)
        .agg(sum($"v")).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(m => m.contains("overflow") || m.contains("Overflow")),
      s"expected an overflow fault, got ${msgs(e)}")
  }

  test("empty strings and empty arrays survive the round-trip and the matchers") {
    import graft.bson._
    import graft.files.BsonFiles
    val dir = freshDir()
    BsonFiles.write(s"$dir/d.bson", Iterator(
      BDoc("_id" -> BInt64(1L), "s" -> BString(""), "a" -> BArray(Vector.empty)),
      BDoc("_id" -> BInt64(2L), "s" -> BString("x"),
        "a" -> BArray(Vector(BInt32(1))))))
    val df = spark.read.format("graftbson")
      .schema("_id LONG, s STRING, a ARRAY<INT>").load(dir)
    val rows = df.collect().sortBy(_.getLong(0))
    assert(rows(0).getString(1) == "" && rows(0).getSeq[Int](2).isEmpty)
    // option-query matchers on the degenerate shapes
    assert(spark.read.format("graftbson").schema("_id LONG, s STRING")
      .option("query", """{"s": ""}""").load(dir).count() == 1)
    assert(spark.read.format("graftbson").schema("_id LONG")
      .option("query", """{"a": {"$size": 0}}""").load(dir)
      .collect().map(_.getLong(0)).toSeq == Seq(1L))
    // empty string is a VALID sample key: it hashes like any other
    val s0 = spark.read.format("graftbson").schema("_id LONG, s STRING")
      .option("sample_key", "s").load(dir)
      .sample(withReplacement = false, 1.0, 7L)
    assert(s0.count() == 2, "a [0,1) window keeps every keyed row incl. ''")
  }

  test("sample fraction edges: 0.0 keeps nothing, 1.0 keeps everything") {
    import spark.implicits._
    val dir = freshDir()
    (0L until 100L).map(k => Tuple1(k)).toDF("_id")
      .write.format("graftbson").mode("append").save(dir)
    val df = spark.read.format("graftbson").schema("_id LONG")
      .option("sample_key", "_id").load(dir)
    assert(df.sample(withReplacement = false, 1.0, 3L).count() == 100L)
    assert(df.sample(withReplacement = false, 0.0, 3L).count() == 0L)
  }
}
