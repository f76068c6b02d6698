package graft.source

import graft.SparkSpec

import java.nio.file.{Files, Paths}

/** Regex-delimited GridFS text mode + whole-file splits
  * (GridFSInputFormat.java:41-80,284-320 parity). The crossing cases pin
  * the ownership rule: every token appears exactly once, even when the
  * delimiter itself straddles a chunk boundary.
  */
class GridFsRegexSpec extends SparkSpec {

  private def writeFile(content: String): String = {
    val dir = Files.createTempDirectory("graft-gridfs-re").toString
    Files.write(Paths.get(dir, "doc.txt"), content.getBytes("UTF-8"))
    dir
  }

  private def tokens(dir: String, opts: Map[String, String]): Seq[String] = {
    var r = spark.read.format("graftgridfs").option("mode", "text")
    opts.foreach { case (k, v) => r = r.option(k, v) }
    r.load(dir).select("token").collect().map(_.getString(0)).toSeq
  }

  test("fixed multi-byte regex delimiter straddling a chunk boundary") {
    // "##" at bytes 4-5 straddles the [0,5)/[5,10) boundary
    val dir = writeFile("aaaa##bb##cc")
    val got = tokens(dir, Map("delimiter_regex" -> "#{2}", "chunk_size" -> "5"))
    assert(got.sorted === Seq("aaaa", "bb", "cc"))
  }

  test("variable-length delimiter run crossing the boundary") {
    val dir = writeFile("aa###bb")
    val got = tokens(dir, Map("delimiter_regex" -> "#+", "chunk_size" -> "4"))
    assert(got.sorted === Seq("aa", "bb"))
  }

  test("regex alternation + every chunk size yields the same token set") {
    val content = "alpha, beta;gamma , delta;;epsilon"
    val expect = Seq("alpha", "beta", "gamma", "delta", "", "epsilon")
    val dir = writeFile(content)
    (2 to content.length + 1).foreach { cs =>
      val got = tokens(dir,
        Map("delimiter_regex" -> "\\s*[,;]\\s*", "chunk_size" -> cs.toString))
      assert(got.sorted === expect.sorted, s"at chunk_size=$cs")
    }
  }

  test("whole_file text mode: one partition, all tokens, in order") {
    val dir = writeFile("x1--x2--x3")
    val df = spark.read.format("graftgridfs")
      .option("mode", "text").option("delimiter_regex", "--")
      .option("whole_file", "true").option("chunk_size", "3")
      .load(dir)
    assert(df.rdd.getNumPartitions === 1)
    val rows = df.collect()
    assert(rows.map(_.getAs[String]("token")).toSeq === Seq("x1", "x2", "x3"))
    assert(rows.map(_.getAs[Int]("chunk_id")).distinct.toSeq === Seq(0))
  }

  test("whole_file binary mode: one row holding the entire content") {
    val dir = writeFile("0123456789abcdef")
    val df = spark.read.format("graftgridfs")
      .option("whole_file", "true").option("chunk_size", "4").load(dir)
    val rows = df.collect()
    assert(rows.length === 1)
    assert(new String(rows.head.getAs[Array[Byte]]("content"), "UTF-8")
      === "0123456789abcdef")
  }

  test("utf-8 token content survives the byte-exact matching window") {
    val dir = writeFile("héllo|wörld")
    val got = tokens(dir, Map("delimiter_regex" -> "\\|", "chunk_size" -> "4"))
    assert(got.sorted === Seq("héllo", "wörld"))
  }
}
