package graft.source

import graft.SparkSpec
import graft.bson._
import graft.files.BsonFiles

import java.nio.file.Files

/** Option-level projection (`fields`, the mongo.input.fields analog) and
  * per-partition `limit` (mongo.input.limit analog — a cursor limit per
  * split, deliberately not a global bound).
  */
class OptionSurfaceSpec extends SparkSpec {

  private def fixture(n: Int, splitSize: Option[Long] = None): String = {
    val dir = Files.createTempDirectory("graft-opt").toString
    BsonFiles.write(s"$dir/data.bson",
      (0 until n).iterator.map(i =>
        BDoc("_id" -> BInt32(i), "a" -> BInt32(i * 2), "b" -> BString(s"s$i"))))
    dir
  }

  test("fields option restricts the inferred table schema") {
    val dir = fixture(50)
    val df = spark.read.format("graftbson").option("fields", "_id,b").load(dir)
    assert(df.columns.toSeq === Seq("_id", "b"))
    assert(df.count() === 50)
    intercept[IllegalArgumentException] {
      spark.read.format("graftbson").option("fields", "nope").load(dir).schema
    }
  }

  test("limit option applies per partition, not globally") {
    val dir = fixture(2000)
    // small splits -> several partitions; limit=3 rows from EACH
    val df = spark.read.format("graftbson")
      .option("split_size", "8192").option("limit", "3").load(dir)
    val parts = df.rdd.getNumPartitions
    assert(parts > 1, "fixture must split")
    assert(df.count() === 3L * parts)
  }

  test("option limit composes with pushed limit (min wins per partition)") {
    val dir = fixture(100)
    val df = spark.read.format("graftbson")
      .option("splitter", "single").option("limit", "10").load(dir).limit(4)
    assert(df.count() === 4) // pushed 4 < option 10
    val df2 = spark.read.format("graftbson")
      .option("splitter", "single").option("limit", "2").load(dir).limit(50)
    assert(df2.count() === 2) // option 2 < pushed 50; single split -> global too
  }
}
