package graft.source

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** TopN (ORDER BY k LIMIT n) pushdown: per-partition sorted top-n at the
  * cursor, folded exactly by Spark's global sort+limit (partial-push
  * contract) — the reference's per-split `cursor.sort().limit()`.
  */
class TopNPushdownSpec extends SparkSpec {

  private def freshDir(): String =
    Files.createTempDirectory("graft-topn").toString

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("orderBy(asc).limit pushes and returns the exact global top-n") {
    import spark.implicits._
    val dir = freshDir()
    // values deliberately scattered so every shard holds some of the top
    (0L until 5000L).map(i => (i, ((i * 2654435761L) % 9973L).toDouble))
      .toDF("_id", "v")
      .write.format("graftbson").option("shards", "4").mode("append").save(dir)
    val df = spark.read.format("graftbson").load(dir)
    val q = df.orderBy($"v").limit(7).select($"_id", $"v")
    assert(planOf(q).contains("PushedTopN: v ASC LIMIT 7"), planOf(q))

    val expected = df.collect().map(r => (r.getLong(0), r.getDouble(1)))
      .sortBy(_._2).take(7).toSeq
    val got = q.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == expected, s"got $got\nexpected $expected")
  }

  test("descending pushes (nulls-last selection); string and option-sort orders refuse") {
    import spark.implicits._
    val dir = freshDir()
    (0L until 500L).map(i => (i, s"s${i % 97}", (i % 13).toInt))
      .toDF("_id", "s", "v")
      .write.format("graftbson").option("shards", "3").mode("append").save(dir)
    val df = spark.read.format("graftbson").load(dir)

    // DESC selects by the read value with nulls last — Spark's default
    val desc = df.orderBy($"v".desc, $"_id".desc).limit(5)
    assert(planOf(desc).contains("PushedTopN: v DESC, _id DESC LIMIT 5"),
      planOf(desc))
    assert(desc.collect().map(_.getLong(0)).toSeq ===
      (0L until 500L).map(i => (i, (i % 13).toInt))
        .sortBy { case (id, v) => (-v, -id) }.take(5).map(_._1))

    // string order: ObjectId/Regex storage reads as a string but sorts in
    // its own BSON bracket — refusal keeps the local top-n exact
    val str = df.orderBy($"s").limit(5)
    assert(!planOf(str).contains("PushedTopN"), "string order must not push")
    assert(str.count() == 5)
    // one string key poisons a compound order too
    val mixed = df.orderBy($"v", $"s").limit(5)
    assert(!planOf(mixed).contains("PushedTopN"))
    assert(mixed.count() == 5)

    val optSorted = spark.read.format("graftbson").option("sort", "v").load(dir)
      .orderBy($"v").limit(5)
    assert(!planOf(optSorted).contains("PushedTopN"),
      "an option-level cursor sort must not be clobbered")
    assert(optSorted.count() == 5)
  }

  test("compound order with ties: the tie-break key decides, nulls per direction") {
    import graft.bson._
    import graft.files.BsonFiles
    val dir = freshDir()
    val docs = Seq(
      BDoc("_id" -> BInt64(1L), "a" -> BInt64(10L), "b" -> BInt64(3L)),
      BDoc("_id" -> BInt64(2L), "a" -> BInt64(10L), "b" -> BInt64(1L)),
      BDoc("_id" -> BInt64(3L), "a" -> BInt64(10L)), // missing b
      BDoc("_id" -> BInt64(4L), "a" -> BInt64(20L), "b" -> BInt64(9L)),
      BDoc("_id" -> BInt64(5L), "a" -> BInt64(5L), "b" -> BInt64(7L)))
    BsonFiles.write(s"$dir/data.bson", docs.iterator)
    import spark.implicits._
    val df = spark.read.format("graftbson").load(dir)
    // a DESC (nulls last), b ASC (nulls first): a=20 first; within a=10
    // the missing-b row leads
    val q = df.orderBy($"a".desc, $"b".asc).limit(4).select($"_id")
    assert(planOf(q).contains("PushedTopN: a DESC, b ASC LIMIT 4"), planOf(q))
    assert(q.collect().map(_.getLong(0)).toSeq === Seq(4L, 3L, 2L, 1L))
  }

  test("longs above 2^53 keep exact order (no double-widened compare)") {
    import graft.bson._
    import graft.files.BsonFiles
    val dir = freshDir()
    // distinct longs that COMPARE EQUAL as doubles — the BSON cross-type
    // order widens longs to double, so selecting with it could keep the
    // wrong row; the pushed top-n must select by the exact read value
    val big = 1L << 53
    val docs = Seq(
      BDoc("_id" -> BInt64(1L), "v" -> BInt64(big + 1L)),
      BDoc("_id" -> BInt64(2L), "v" -> BInt64(big)),
      BDoc("_id" -> BInt64(3L), "v" -> BInt64(big + 3L)))
    BsonFiles.write(s"$dir/data.bson", docs.iterator)
    import spark.implicits._
    val df = spark.read.format("graftbson").load(dir)
    val q = df.orderBy($"v").limit(1).select($"_id", $"v")
    assert(planOf(q).contains("PushedTopN"), planOf(q))
    val row = q.head()
    assert((row.getLong(0), row.getLong(1)) == (2L, big), row.toString)
  }

  test("nulls-first semantics: missing keys come first, matching Spark") {
    import graft.bson._
    import graft.files.BsonFiles
    val dir = freshDir()
    val docs = Seq(
      BDoc("_id" -> BInt64(1L), "v" -> BInt64(5L)),
      BDoc("_id" -> BInt64(2L)), // missing v -> null, sorts first
      BDoc("_id" -> BInt64(3L), "v" -> BInt64(1L)),
      BDoc("_id" -> BInt64(4L), "v" -> BInt64(9L)))
    BsonFiles.write(s"$dir/data.bson", docs.iterator)
    import spark.implicits._
    val df = spark.read.format("graftbson").load(dir)
    val q = df.orderBy($"v").limit(2).select($"_id")
    assert(planOf(q).contains("PushedTopN"), planOf(q))
    assert(q.collect().map(_.getLong(0)).toSeq == Seq(2L, 3L))
  }
}
