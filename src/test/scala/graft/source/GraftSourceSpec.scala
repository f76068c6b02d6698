package graft.source

import graft.SparkSpec
import graft.bson._
import graft.files.BsonFiles
import graft.store.BsonCollection

import java.nio.file.Files

/** End-to-end DSv2 tests through spark.read/write.format("graftbson"),
  * including the reference's Hive pushdown goldens
  * (hive/src/test/java/com/mongodb/hadoop/hive/HiveQueryTest.java:33-62:
  * 1000 docs {i, j=i%5}; WHERE i > 20 -> 979; + table query {j:0} -> 195;
  * contradiction -> 0).
  */
class GraftSourceSpec extends SparkSpec {

  private def freshDir(): String =
    Files.createTempDirectory("graft-src").toString

  private def writeHiveFixture(): String = {
    val dir = freshDir()
    val docs = (0 until 1000).map(i => BDoc(
      "_id" -> BInt32(i), "i" -> BInt32(i), "j" -> BInt32(i % 5)))
    BsonFiles.write(s"$dir/data.bson", docs.iterator)
    dir
  }

  test("HiveQueryTest golden 1: WHERE i > 20 -> 979 rows") {
    val dir = writeHiveFixture()
    val df = spark.read.format("graftbson").load(dir)
    assert(df.filter(df("i") > 20).count() == 979)
  }

  test("HiveQueryTest golden 2: pushed filter AND option query {j:0} -> 195") {
    val dir = writeHiveFixture()
    val df = spark.read.format("graftbson").option("query", """{"j": 0}""").load(dir)
    assert(df.filter(df("i") > 20).count() == 195)
  }

  test("HiveQueryTest golden 3: contradictory filters -> 0") {
    val dir = writeHiveFixture()
    val df = spark.read.format("graftbson").load(dir)
    assert(df.filter(df("i") > 20 && df("i") < 10).count() == 0)
  }

  test("filters are genuinely pushed (source-level query, not just Spark re-filter)") {
    val dir = writeHiveFixture()
    val df = spark.read.format("graftbson").load(dir).filter("i > 990")
    val scan = df.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    assert(scan.contains("PushedQuery:") && scan.contains("Gt(i,BInt32(990))"),
      s"scan was: $scan")
    assert(df.count() == 9) // 991..999 in the 0..999 fixture
  }

  test("schema inference: dynamic sampling with numeric widening") {
    val dir = freshDir()
    val docs = Seq(
      BDoc("_id" -> BInt32(1), "x" -> BInt32(5), "s" -> BString("a")),
      BDoc("_id" -> BInt32(2), "x" -> BInt64(1L << 40), "s" -> BString("b")),
      BDoc("_id" -> BInt32(3), "x" -> BDouble(2.5), "extra" -> BBool(true)))
    BsonFiles.write(s"$dir/data.bson", docs.iterator)
    val df = spark.read.format("graftbson").load(dir)
    val types = df.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    assert(types("x") == "double", s"widening failed: $types")
    assert(types("s") == "string")
    assert(types("extra") == "boolean")
    assert(df.count() == 3)
  }

  test("byte-split partitioning parallelizes one file without losing docs") {
    val dir = freshDir()
    val docs = (0 until 5000).map(i => BDoc("_id" -> BInt32(i), "p" -> BString("x" * 50)))
    BsonFiles.write(s"$dir/data.bson", docs.iterator)
    val df = spark.read.format("graftbson").option("split_size", "8192").load(dir)
    assert(df.rdd.getNumPartitions > 4, s"expected many partitions, got ${df.rdd.getNumPartitions}")
    assert(df.count() == 5000)
    assert(df.agg(org.apache.spark.sql.functions.sum("_id")).head.getLong(0)
      == (0 until 5000).map(_.toLong).sum)
  }

  test("key-range splitter strategies read correctly through the planners") {
    val dir = freshDir()
    val docs = (0 until 2000).map(i => BDoc("_id" -> BInt64(i.toLong), "v" -> BInt32(i % 7)))
    BsonFiles.write(s"$dir/data.bson", docs.iterator)
    for (strategy <- Seq("single", "size", "sample", "paginating")) {
      val df = spark.read.format("graftbson")
        .option("splitter", strategy)
        .option("split_size", "16384")
        .option("min_docs", "200")
        .load(dir)
      assert(df.count() == 2000, s"splitter=$strategy lost docs")
    }
  }

  test("insert write + read back (with id_column merge convention)") {
    import spark.implicits._
    val dir = freshDir()
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "name")
      .write.format("graftbson")
      .option("id_column", "k")
      .mode("append").save(dir)
    val back = spark.read.format("graftbson").load(dir)
    assert(back.columns.toSet == Set("_id", "name"))
    assert(back.count() == 3)
  }

  test("upsert + $inc accumulates across two writes (sensors log-count shape)") {
    import spark.implicits._
    val dir = freshDir()
    def writeCounts(): Unit =
      Seq((1L, 5L), (2L, 7L)).toDF("_id", "n")
        .write.format("graftbson")
        .option("mode", "upsert").option("update_op", "inc")
        .mode("append").save(dir)
    writeCounts()
    writeCounts()
    val back = spark.read.format("graftbson").load(dir)
      .selectExpr("_id", "n").as[(Long, Long)].collect().toMap
    assert(back == Map(1L -> 10L, 2L -> 14L), s"got $back")
  }

  test("update $set only touches matching docs; replace swaps the doc body") {
    import spark.implicits._
    val dir = freshDir()
    Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("_id", "name", "v")
      .write.format("graftbson").mode("append").save(dir)
    // $set v for _id=1 only
    Seq((1L, 99L)).toDF("_id", "v")
      .write.format("graftbson")
      .option("mode", "update").option("update_op", "set")
      .mode("append").save(dir)
    val after = spark.read.format("graftbson").load(dir)
      .selectExpr("_id", "name", "v").as[(Long, String, Long)].collect()
      .map { case (id, n, v) => id -> ((n, v)) }.toMap
    assert(after(1L) == (("a", 99L)))
    assert(after(2L) == (("b", 20L)))
    // replace doc 2 entirely (name gone, only w remains)
    Seq((2L, 123L)).toDF("_id", "w")
      .write.format("graftbson")
      .option("mode", "replace")
      .mode("append").save(dir)
    val d2 = new BsonCollection(dir).readAll().find(_.get("_id").contains(BInt64(2L))).get
    assert(d2.get("name").isEmpty && d2.get("w").contains(BInt64(123L)))
  }

  test("$push builds arrays; multi applies to every match") {
    import spark.implicits._
    val dir = freshDir()
    Seq((1L, "g1"), (2L, "g1"), (3L, "g2")).toDF("_id", "grp")
      .write.format("graftbson").mode("append").save(dir)
    // multi $set: everyone in g1 gets flag=true
    Seq(("g1", true)).toDF("grp", "flag")
      .write.format("graftbson")
      .option("mode", "update").option("update_op", "set")
      .option("keys", "grp").option("multi", "true")
      .mode("append").save(dir)
    val flags = spark.read.format("graftbson").load(dir)
      .selectExpr("_id", "flag").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getBoolean(1)))).toMap
    assert(flags(1L).contains(true) && flags(2L).contains(true) && flags(3L).isEmpty)
    // $push tags twice onto _id=1
    for (t <- Seq("x", "y")) {
      Seq((1L, t)).toDF("_id", "tags")
        .write.format("graftbson")
        .option("mode", "update").option("update_op", "push")
        .mode("append").save(dir)
    }
    val d1 = new BsonCollection(dir).readAll().find(_.get("_id").contains(BInt64(1L))).get
    assert(d1.get("tags").contains(BArray(Vector(BString("x"), BString("y")))))
  }

  test("overwrite mode truncates the collection first") {
    import spark.implicits._
    val dir = freshDir()
    Seq((1L, "a")).toDF("_id", "x").write.format("graftbson").mode("append").save(dir)
    Seq((2L, "b")).toDF("_id", "x").write.format("graftbson").mode("overwrite").save(dir)
    val back = spark.read.format("graftbson").load(dir)
    assert(back.count() == 1)
    assert(back.selectExpr("_id").head.getLong(0) == 2L)
  }

  test("ensure_index option records the declared index") {
    import spark.implicits._
    val dir = freshDir()
    Seq((1L, "a")).toDF("_id", "x")
      .write.format("graftbson").option("ensure_index", "x")
      .mode("append").save(dir)
    assert(new BsonCollection(dir).indexes() == Seq(Seq("x")))
  }

  test("nested dump layout: dump/<db>/<collection>.bson is read recursively") {
    val base = freshDir()
    Files.createDirectories(java.nio.file.Paths.get(s"$base/dump/db1"))
    Files.createDirectories(java.nio.file.Paths.get(s"$base/dump/db2"))
    Files.createDirectories(java.nio.file.Paths.get(s"$base/dump/.hiddendb"))
    BsonFiles.write(s"$base/dump/db1/users.bson",
      (1 to 10).iterator.map(i => BDoc("_id" -> BInt32(i))))
    BsonFiles.write(s"$base/dump/db2/events.bson",
      (11 to 30).iterator.map(i => BDoc("_id" -> BInt32(i))))
    BsonFiles.write(s"$base/dump/.hiddendb/x.bson",
      Iterator(BDoc("_id" -> BInt32(99))))
    assert(GraftBsonSource.dataFiles(s"$base/dump") ===
      Seq(s"$base/dump/db1/users.bson", s"$base/dump/db2/events.bson"))
    val df = spark.read.format("graftbson").load(s"$base/dump")
    assert(df.count() === 30, "hidden-dir docs must not leak into the scan")
  }

  test("glob path spec: dump/db*/events.bson selects by pattern") {
    val base = freshDir()
    Files.createDirectories(java.nio.file.Paths.get(s"$base/dump/db1"))
    Files.createDirectories(java.nio.file.Paths.get(s"$base/dump/db2"))
    BsonFiles.write(s"$base/dump/db1/events.bson",
      (1 to 5).iterator.map(i => BDoc("_id" -> BInt32(i))))
    BsonFiles.write(s"$base/dump/db1/users.bson",
      Iterator(BDoc("_id" -> BInt32(100))))
    BsonFiles.write(s"$base/dump/db2/events.bson",
      (6 to 8).iterator.map(i => BDoc("_id" -> BInt32(i))))
    assert(GraftBsonSource.dataFiles(s"$base/dump/db*/events.bson") ===
      Seq(s"$base/dump/db1/events.bson", s"$base/dump/db2/events.bson"))
    val df = spark.read.format("graftbson").load(s"$base/dump/db*/events.bson")
    assert(df.count() === 8)
  }

  test("schema inference samples uniformly: late-file-only field is inferred") {
    val dir = freshDir()
    // 4000 docs; field `late` exists ONLY in the last quarter — head-biased
    // sampling (first 1000 docs) would never see it
    val docs = (0 until 4000).map { i =>
      if (i < 3000) BDoc("_id" -> BInt32(i), "x" -> BInt32(i))
      else BDoc("_id" -> BInt32(i), "x" -> BInt32(i), "late" -> BString(s"v$i"))
    }
    BsonFiles.write(s"$dir/data.bson", docs.iterator)
    val df = spark.read.format("graftbson").load(dir)
    assert(df.schema.fieldNames.contains("late"),
      s"uniform sampling must see tail-only fields; got ${df.schema.fieldNames.mkString(",")}")
  }
}
