package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.apache.spark.unsafe.types.UTF8String

/** The native 60-bit md5-prefix hash must stay bit-identical to the
  * hex-string formula it replaced (`conv(substring(md5(c),1,15),16,10)`),
  * which is also the DuckDB oracle's definition — any drift silently breaks
  * every dedup/fingerprint oracle match.
  */
class Md5Prefix60Spec extends SparkSpec {

  test("Md5Util.prefix60 equals first-15-hex-chars-of-md5 parsed base 16") {
    val md = java.security.MessageDigest.getInstance("MD5")
    val samples = Seq("", "a", "hello world", "Weiß café € ñ", "x" * 1000) ++
      (0 until 200).map(i => s"shingle $i of doc ${i * 37}")
    samples.foreach { s =>
      val hex = md.digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
      val expected = java.lang.Long.parseLong(hex.substring(0, 15), 16)
      assert(Md5Util.prefix60(s.getBytes("UTF-8")) === expected, s"for input '$s'")
      assert(Md5Util.prefix60(UTF8String.fromString(s)) === expected)
    }
  }

  test("Portable.hash60 column matches legacy conv(substring(md5)) formula") {
    import spark.implicits._
    val df = (0 until 500).map(i => s"doc-$i content éè $i").toDF("s")
      .withColumn("fast", Portable.hash60($"s"))
      .withColumn("legacy", conv(substring(md5($"s"), 1, 15), 16, 10).cast(LongType))
    assert(df.filter($"fast" =!= $"legacy").count() === 0)
    // null propagates
    val n = Seq[Option[String]](None, Some("x")).toDF("s")
      .withColumn("h", Portable.hash60($"s")).collect()
    assert(n.exists(_.isNullAt(1)) && n.exists(!_.isNullAt(1)))
  }

  test("hash60 works on binary input and inside codegen pipelines") {
    import spark.implicits._
    val df = Seq("abc", "def").toDF("s")
      .withColumn("b", $"s".cast("binary"))
      .withColumn("hs", Portable.hash60($"s"))
      .withColumn("hb", Portable.hash60($"b"))
    assert(df.filter($"hs" =!= $"hb").count() === 0)
    // survives a shuffle + aggregation (exercises both codegen and eval paths)
    val agg = df.groupBy($"hs").count().count()
    assert(agg === 2)
  }
}
