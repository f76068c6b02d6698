package graft.source

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths, StandardOpenOption}

/** Scan-level aggregate pushdown (SupportsPushDownAggregates): global
  * COUNT(*)/MIN/MAX land in the source as per-file partial rows — the
  * collstats analog. COUNT(*)-only pushes must read ZERO document bodies
  * (proved here by corrupting a body and counting anyway).
  */
class AggPushdownSpec extends SparkSpec {

  private def freshDir(): String =
    Files.createTempDirectory("graft-aggpush").toString

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("count/min/max push down and match a row-scan aggregate") {
    import spark.implicits._
    val dir = freshDir()
    Seq((1L, 10L, 2.5), (2L, -3L, 9.0), (3L, 7L, -1.5), (4L, 0L, 4.25))
      .toDF("_id", "k", "v")
      .write.format("graftbson").option("shards", "3").mode("append").save(dir)
    val df = spark.read.format("graftbson").load(dir)
      .agg(count(lit(1)).as("n"), min($"k").as("mn"), max($"k").as("mx"),
        max($"v").as("mv"))
    assert(plan(df).contains("PushedAggregates: [COUNT(*), MIN(k), MAX(k), MAX(v)]"),
      s"aggregates not pushed:\n${plan(df)}")
    val r = df.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)) ===
      ((4L, -3L, 10L, 9.0)))
  }

  test("COUNT(*)-only pushdown reads no document bodies") {
    import spark.implicits._
    val dir = freshDir()
    (1 to 200).map(i => (i.toLong, s"payload-$i")).toDF("_id", "s")
      .write.format("graftbson").mode("append").save(dir)
    // corrupt bytes INSIDE the first document's body (past the 4-byte
    // length header): any body decode now sees garbage type tags, but the
    // header walk / .splits count never looks there
    val data = Paths.get(dir, "data.bson")
    val ch = java.nio.channels.FileChannel.open(data, StandardOpenOption.WRITE)
    try ch.write(java.nio.ByteBuffer.wrap(Array.fill[Byte](8)(-1)), 6)
    finally ch.close()
    // explicit schema: inference itself samples documents (and would trip
    // on the corruption) — with it, the count-only path plans and runs
    // without a single body decode
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("s",
        org.apache.spark.sql.types.StringType)))
    val df = spark.read.format("graftbson").schema(schema).load(dir)
      .agg(count(lit(1)).as("n"))
    assert(plan(df).contains("PushedAggregates: [COUNT(*)]"))
    assert(df.head.getLong(0) === 200L,
      "pushed COUNT(*) must come from headers/side file, not body decode")
    // sanity: a real row scan over the same corrupted file DOES fail
    intercept[Throwable] {
      spark.read.format("graftbson").schema(schema).load(dir).collect()
    }
  }

  test("filters, group-by, and option queries leave the probe path for grouped partials") {
    import spark.implicits._
    val dir = freshDir()
    Seq((1L, 5L), (2L, 6L)).toDF("_id", "k")
      .write.format("graftbson").mode("append").save(dir)
    // the zero-IO probe path (PushedAggregates) must refuse all three —
    // side-file counts ignore filters — but each now rides the grouped
    // per-split partial path instead of a full un-pushed scan
    val filtered = spark.read.format("graftbson").load(dir)
      .filter($"k" > 5L).agg(count(lit(1)).as("n"))
    assert(!plan(filtered).contains("PushedAggregates"))
    assert(plan(filtered).contains("PushedGroupedAggregate: GLOBAL"))
    assert(filtered.head.getLong(0) === 1L)
    val grouped = spark.read.format("graftbson").load(dir)
      .groupBy($"k").agg(count(lit(1)).as("n"))
    assert(!plan(grouped).contains("PushedAggregates"))
    assert(plan(grouped).contains("PushedGroupedAggregate: GROUP BY k"))
    assert(grouped.count() === 2L)
    val optionQ = spark.read.format("graftbson")
      .option("query", """{"k": 5}""").load(dir).agg(count(lit(1)).as("n"))
    assert(!plan(optionQ).contains("PushedAggregates"))
    assert(plan(optionQ).contains("PushedGroupedAggregate: GLOBAL"))
    assert(optionQ.head.getLong(0) === 1L)
  }

  // ---- round-12: grouped / filtered-global per-split partials

  test("grouped aggregate pushes per-split partials and matches a plain scan") {
    import spark.implicits._
    val dir = freshDir()
    val src = Seq[(Long, java.lang.Long, String, java.lang.Double)](
      (1L, 10L, "a", 1.5), (2L, 10L, "b", 2.5), (3L, 10L, null, 4.0),
      (4L, 20L, "a", null), (5L, null, "a", 8.0), (6L, null, null, -1.0))
      .toDF("_id", "g", "s", "v")
    src.write.format("graftbson").option("shards", "3").mode("append").save(dir)
    val df = spark.read.format("graftbson")
      .schema("_id LONG, g LONG, s STRING, v DOUBLE").load(dir)
      .groupBy($"g")
      .agg(count(lit(1)).as("n"), count($"v").as("nv"), min($"s").as("mns"),
        max($"v").as("mxv"), sum($"v").as("sv"), avg($"v").as("av"))
    assert(plan(df).contains("PushedGroupedAggregate: GROUP BY g"),
      s"grouped aggregate not pushed:\n${plan(df)}")
    val got = df.collect().map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0))) ->
      r.toSeq.drop(1)).toMap
    val expect = src.groupBy($"g")
      .agg(count(lit(1)), count($"v"), min($"s"), max($"v"), sum($"v"), avg($"v"))
      .collect().map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0))) ->
        r.toSeq.drop(1)).toMap
    assert(got === expect)
    assert(got.contains(None), "the NULL group must survive")
  }

  test("SELECT DISTINCT pushes as a zero-aggregate group-by (per-split distinct keys)") {
    import spark.implicits._
    val dir = freshDir()
    val src = Seq[(Long, java.lang.Long, String)](
      (1L, 10L, "a"), (2L, 10L, "b"), (3L, 20L, "a"),
      (4L, null, "a"), (5L, 20L, null), (6L, null, null))
      .toDF("_id", "g", "s")
    src.write.format("graftbson").option("shards", "3").mode("append").save(dir)
    val one = spark.read.format("graftbson")
      .schema("_id LONG, g LONG, s STRING").load(dir)
      .select($"g").distinct()
    assert(plan(one).contains("PushedGroupedAggregate: GROUP BY g []"),
      s"distinct not pushed:\n${plan(one)}")
    assert(one.collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0))).toSet
      == Set(Some(10L), Some(20L), None))
    // compound distinct, with a pushed filter underneath
    val two = spark.read.format("graftbson")
      .schema("_id LONG, g LONG, s STRING").load(dir)
      .filter($"_id" < 6L)
      .select($"g", $"s").distinct()
    assert(plan(two).contains("PushedGroupedAggregate: GROUP BY g, s []"),
      s"filtered compound distinct not pushed:\n${plan(two)}")
    assert(two.count() == 5L, "(10,a) (10,b) (20,a) (null,a) (20,null)")
  }

  test("grouped COUNT by key decodes ONLY the key column (corrupted subdoc proves it)") {
    import spark.implicits._
    val dir = freshDir()
    (1 to 100).map(i => (i.toLong, (i % 3).toLong, (i.toLong, s"pay-$i")))
      .toDF("_id", "g", "d")
      .write.format("graftbson").mode("append").save(dir)
    // corrupt the INTERIOR of every subdocument 'd' (first inner element's
    // type tag -> 0x7F, an invalid BSON tag): the projected byte-skip
    // jumps the subdoc via its length header and never sees the garbage,
    // while any decode of d dies on the unknown tag
    val data = Paths.get(dir, "data.bson")
    val bytes = Files.readAllBytes(data)
    var i = 0
    var hits = 0
    while (i < bytes.length - 7) {
      // element header: tag 0x03 (embedded doc), name "d\0", then the
      // subdoc's 4-byte length, then the first inner element's tag
      if (bytes(i) == 0x03 && bytes(i + 1) == 'd'.toByte && bytes(i + 2) == 0) {
        bytes(i + 7) = 0x7F
        hits += 1
      }
      i += 1
    }
    assert(hits === 100, s"corruption marker found $hits times")
    Files.write(data, bytes)
    val schema = "_id LONG, g LONG, d STRUCT<_1: LONG, _2: STRING>"
    val df = spark.read.format("graftbson").schema(schema).load(dir)
      .groupBy($"g").agg(count(lit(1)).as("n"))
    assert(plan(df).contains("PushedGroupedAggregate: GROUP BY g"))
    val got = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(0L -> 33L, 1L -> 34L, 2L -> 33L),
      "grouped COUNT must byte-skip the corrupted non-key column")
    // sanity: actually reading d DOES hit the corruption
    intercept[Throwable] {
      spark.read.format("graftbson").schema(schema).load(dir)
        .select($"d").collect()
    }
  }

  test("filtered GLOBAL aggregate over an empty match folds COUNT to 0") {
    import spark.implicits._
    val dir = freshDir()
    Seq((1L, 5L)).toDF("_id", "k")
      .write.format("graftbson").mode("append").save(dir)
    val df = spark.read.format("graftbson")
      .schema("_id LONG, k LONG").load(dir)
      .filter($"k" > 100L)
      .agg(count(lit(1)).as("n"), sum($"k").as("s"), min($"k").as("mn"))
    assert(plan(df).contains("PushedGroupedAggregate: GLOBAL"))
    val r = df.head
    assert(r.getLong(0) === 0L)
    assert(r.isNullAt(1) && r.isNullAt(2))
    // and over an empty COLLECTION (deleted data): same contract via the
    // sentinel partition
    val dir2 = freshDir()
    val df2 = spark.read.format("graftbson")
      .schema("_id LONG, k LONG").load(dir2)
      .agg(count(lit(1)).as("n"))
    // (no filter: the probe path covers this; force the grouped path
    // with a filter instead)
    val df3 = spark.read.format("graftbson")
      .schema("_id LONG, k LONG").load(dir2)
      .filter($"k" > 0L).agg(count(lit(1)).as("n"))
    assert(df2.head.getLong(0) === 0L)
    assert(df3.head.getLong(0) === 0L)
  }

  test("flush-on-cap emits extra partials that still fold exactly") {
    import spark.implicits._
    val dir = freshDir()
    // more distinct groups than the flush cap is impractical here; pin
    // the protocol instead: every row its own group, several splits
    (1 to 1000).map(i => (i.toLong, i.toLong % 7, 1.0 * i))
      .toDF("_id", "g", "v")
      .write.format("graftbson").option("shards", "4").mode("append").save(dir)
    val df = spark.read.format("graftbson")
      .schema("_id LONG, g LONG, v DOUBLE").load(dir)
      .groupBy($"g").agg(count(lit(1)).as("n"), sum($"_id").as("s"))
    assert(plan(df).contains("PushedGroupedAggregate"))
    val got = df.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val expect = (1 to 1000).groupBy(_ % 7).map { case (g, xs) =>
      g.toLong -> (xs.size.toLong, xs.map(_.toLong).sum)
    }
    assert(got === expect)
  }

  test("global aggregate over a sort-option table plans (no stale ordering claim)") {
    import spark.implicits._
    val dir = freshDir()
    Seq((3L, 30L), (1L, 10L), (2L, 20L)).toDF("_id", "k")
      .write.format("graftbson").mode("append").save(dir)
    // with an aggregate pushed, readSchema() is the agg schema — the scan
    // must stop reporting the `sort` column or Spark fails to resolve the
    // SortOrder against the scan output at planning time
    val df = spark.read.format("graftbson").option("sort", "k").load(dir)
      .agg(count(lit(1)).as("n"), max($"k").as("mx"))
    assert(plan(df).contains("PushedAggregates"))
    val r = df.head
    assert((r.getLong(0), r.getLong(1)) === ((3L, 30L)))
    // the ordering claim itself still works when no aggregate is pushed
    val sorted = spark.read.format("graftbson").option("sort", "k").load(dir)
      .sortWithinPartitions($"k")
    assert(sorted.select($"k").as[Long].collect().toSeq === Seq(10L, 20L, 30L))
  }

  test("min/max skip missing fields exactly like a row scan") {
    import spark.implicits._
    val dir = freshDir()
    Seq((1L, Some(4L)), (2L, None), (3L, Some(-9L)))
      .toDF("_id", "k")
      .write.format("graftbson").mode("append").save(dir)
    val pushed = spark.read.format("graftbson").load(dir)
      .agg(min($"k").as("mn"), max($"k").as("mx"), count(lit(1)).as("n")).head
    assert((pushed.getLong(0), pushed.getLong(1), pushed.getLong(2)) ===
      ((-9L, 4L, 3L)))
  }
}
