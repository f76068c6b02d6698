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

  test("option queries traverse array-of-doc storage like a live server (both transports)") {
    // foreign-shaped docs: `m` is an array of subdocuments — an
    // option-level `{"m.a": ...}` must traverse m's elements
    // (mongo.input.query is shipped VERBATIM to a real server, so the
    // file/fake matcher has to agree with the server's evaluation — r15)
    def docs: Iterator[BDoc] = Iterator(
      BDoc("_id" -> BInt32(1), "m" -> BArray(Vector(
        BDoc("a" -> BInt32(5)), BDoc("b" -> BInt32(2))))),
      BDoc("_id" -> BInt32(2), "m" -> BArray(Vector(
        BDoc("a" -> BInt32(9))))),
      BDoc("_id" -> BInt32(3), "m" -> BArray(Vector(
        BDoc("a" -> BInt32(1))))),
      BDoc("_id" -> BInt32(4), "x" -> BInt32(0)))
    val fileDir = Files.createTempDirectory("graft-trv").toString
    BsonFiles.write(s"$fileDir/data.bson", docs)
    val srvDir = Files.createTempDirectory("graft-trvs").toString
    val coll = new graft.store.BsonCollection(s"$srvDir/db_t")
    coll.bulkWrite(docs.map(d => graft.store.InsertOne(d)), ordered = true)

    def ids(query: String): (Seq[Int], Seq[Int]) = {
      val f = spark.read.format("graftbson")
        .schema("_id INT").option("query", query).load(fileDir)
        .collect().map(_.getInt(0)).sorted.toSeq
      val s = spark.read.format("graftserver")
        .options(Map("server_dir" -> srvDir, "ns" -> "db.t"))
        .schema("_id INT").option("query", query).load()
        .collect().map(_.getInt(0)).sorted.toSeq
      (f, s)
    }
    // equality through the intermediate array
    val (f1, s1) = ids("""{"m.a": 5}""")
    assert(f1 == Seq(1) && s1 == Seq(1), s"$f1 / $s1")
    // range operator through the intermediate array AND leaf brackets
    val (f2, s2) = ids("""{"m.a": {"$gte": 5}}""")
    assert(f2 == Seq(1, 2) && s2 == Seq(1, 2), s"$f2 / $s2")
    // null matches the dead-end slots: doc 1 ({b:2} lacks a) and doc 4
    // (m missing entirely)
    val (f3, s3) = ids("""{"m.a": null}""")
    assert(f3 == Seq(1, 4) && s3 == Seq(1, 4), s"$f3 / $s3")
    // $exists traversal
    val (f4, s4) = ids("""{"m.a": {"$exists": true}}""")
    assert(f4 == Seq(1, 2, 3) && s4 == Seq(1, 2, 3), s"$f4 / $s4")
  }
}
