package graft.server

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Nested TopN over a pushed join (r14): `ORDER BY meta.score LIMIT n`
  * above a join survives Catalyst's NestedColumnAliasing —
  * [[graft.plans.NestedExtractRelocate]] absorbs the extraction Project
  * into the relation as a `column_mapping`-derived flat column, so the
  * join inputs stay attribute-only (pushable) and the order key reaches
  * the pushed join's `$sort`+`$limit` tail.
  */
class NestedTopnOverJoinSpec extends SparkSpec {

  private def freshDir(): String =
    Files.createTempDirectory("graft-ntj").toString

  private def seed(dir: String): Unit = {
    import spark.implicits._
    (0 until 100).map(i =>
        (i.toLong, (i % 20).toLong, ((i * 37 % 100).toDouble, s"t$i")))
      .toDF("_id", "custkey", "meta")
      .write.format("graftserver")
      .options(Map("server_dir" -> dir, "ns" -> "db.o"))
      .option("id_column", "_id").mode("append").save()
    (0 until 20).map(i => (i.toLong, s"c$i")).toDF("_id", "name")
      .write.format("graftserver")
      .options(Map("server_dir" -> dir, "ns" -> "db.c"))
      .option("id_column", "_id").mode("append").save()
  }

  private def o(dir: String): DataFrame = spark.read.format("graftserver")
    .options(Map("server_dir" -> dir, "ns" -> "db.o",
      "assume_uniform_storage" -> "true"))
    .schema("_id LONG, custkey LONG, meta STRUCT<_1: DOUBLE, _2: STRING>")
    .load()

  private def c(dir: String): DataFrame = spark.read.format("graftserver")
    .options(Map("server_dir" -> dir, "ns" -> "db.c",
      "assume_uniform_storage" -> "true"))
    .schema("_id LONG, name STRING").load()

  test("ORDER BY meta.score LIMIT n over a pushed join: $sort tail survives struct pruning") {
    import spark.implicits._
    val dir = freshDir()
    seed(dir)
    // the struct itself is PRUNED above the TopN — the shape where
    // NestedColumnAliasing used to demote the join
    val oo = o(dir); val cc = c(dir)
    val q = oo.join(cc, oo("custkey") === cc("_id"))
      .select(oo("_id").as("okey"), $"name", oo("meta"))
      .orderBy(oo("meta")("_1").desc)
      .limit(5)
      .select($"okey", $"name")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedJoin: INNER db.c"), plan)
    assert(plan.contains("PushedTopN: ORDER BY _extract_"), plan)
    assert(!plan.contains("HashJoin") && !plan.contains("SortMergeJoin"), plan)
    // i*37 % 100 peaks at 99 for i=27, then 98 @54, 97 @81, 96 @8, 95 @35
    assert(q.collect().map(_.getLong(0)).toSeq == Seq(27L, 54L, 81L, 8L, 35L))
  }

  test("aliased nested order key (select meta.score AS score) pushes too") {
    import spark.implicits._
    val dir = freshDir()
    seed(dir)
    val oo = o(dir); val cc = c(dir)
    val q = oo.join(cc, oo("custkey") === cc("_id"))
      .select(oo("_id").as("okey"), $"name", oo("meta")("_1").as("score"))
      .orderBy($"score".desc).limit(3)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedJoin: INNER db.c") &&
      plan.contains("PushedTopN: ORDER BY _extract_"), plan)
    assert(q.collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq ==
      Seq((27L, 99.0), (54L, 98.0), (81L, 97.0)))
  }

  test("derived column reads ONLY the subpath and composes with existing column_mapping") {
    import spark.implicits._
    val dir = freshDir()
    seed(dir)
    // read `meta` under a RENAMED head (m -> meta): the relocation must
    // compose the alias head through the existing mapping
    val om = spark.read.format("graftserver")
      .options(Map("server_dir" -> dir, "ns" -> "db.o",
        "assume_uniform_storage" -> "true"))
      .option("column_mapping", """{"m": "meta"}""")
      .schema("_id LONG, custkey LONG, m STRUCT<_1: DOUBLE, _2: STRING>")
      .load()
    val cc = c(dir)
    val q = om.join(cc, om("custkey") === cc("_id"))
      .select(om("_id").as("okey"), $"name", om("m")("_1").as("score"))
      .orderBy($"score".desc).limit(2)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedJoin: INNER db.c") &&
      plan.contains("PushedTopN: ORDER BY _extract_"), plan)
    assert(q.collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq ==
      Seq((27L, 99.0), (54L, 98.0)))
  }

  test("plain (non-join) nested queries keep Spark's own nested pruning — rule inert") {
    import spark.implicits._
    val dir = freshDir()
    seed(dir)
    val q = o(dir).select($"_id", $"meta._1".as("score"))
      .orderBy($"score".desc).limit(2)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("_extract_") || !plan.contains("column_mapping"),
      s"no relocation on a plain scan:\n$plan")
    assert(q.collect().map(_.getLong(0)).toSeq == Seq(27L, 54L))
  }
}
