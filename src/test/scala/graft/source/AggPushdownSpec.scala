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

  test("filters, group-by, and option queries block aggregate pushdown") {
    import spark.implicits._
    val dir = freshDir()
    Seq((1L, 5L), (2L, 6L)).toDF("_id", "k")
      .write.format("graftbson").mode("append").save(dir)
    val filtered = spark.read.format("graftbson").load(dir)
      .filter($"k" > 5L).agg(count(lit(1)).as("n"))
    assert(!plan(filtered).contains("PushedAggregates"))
    assert(filtered.head.getLong(0) === 1L)
    val grouped = spark.read.format("graftbson").load(dir)
      .groupBy($"k").agg(count(lit(1)).as("n"))
    assert(!plan(grouped).contains("PushedAggregates"))
    assert(grouped.count() === 2L)
    val optionQ = spark.read.format("graftbson")
      .option("query", """{"k": 5}""").load(dir).agg(count(lit(1)).as("n"))
    assert(!plan(optionQ).contains("PushedAggregates"))
    assert(optionQ.head.getLong(0) === 1L)
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
