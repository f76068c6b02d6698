package graft.server

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** TABLESAMPLE and OFFSET composition over pushed joins (r14):
  * deterministic keyed sampling commutes with the `$lookup` (each
  * sampled row's join output is kept/dropped atomically), so a sampled
  * side no longer forfeits the pushed join — the window is re-keyed to
  * the joined OUTPUT and applied over the pipeline's rows. OFFSET
  * becomes a `$skip` tail on the single-pipeline plan. Refusal matrix:
  * lookup-side sample under LEFT OUTER, sample keys that do not survive
  * the projection, offset without `splitter=single`.
  */
class JoinSampleOffsetSpec extends SparkSpec {

  private def freshDir(): String = Files.createTempDirectory("graft-jso").toString

  private def seed(dir: String): Unit = {
    import spark.implicits._
    (0 until 200).map(i => (i.toLong, (i % 20).toLong, (i * 3 % 100).toDouble))
      .toDF("_id", "custkey", "price")
      .write.format("graftserver")
      .options(Map("server_dir" -> dir, "ns" -> "db.o"))
      .option("id_column", "_id").mode("append").save()
    (0 until 20).map(i => (i.toLong, s"c$i"))
      .toDF("_id", "name")
      .write.format("graftserver")
      .options(Map("server_dir" -> dir, "ns" -> "db.c"))
      .option("id_column", "_id").mode("append").save()
  }

  private def o(dir: String, extra: (String, String)*): DataFrame =
    spark.read.format("graftserver")
      .options(Map("server_dir" -> dir, "ns" -> "db.o",
        "assume_uniform_storage" -> "true", "sample_key" -> "_id") ++ extra)
      .schema("_id LONG, custkey LONG, price DOUBLE").load()

  private def c(dir: String, extra: (String, String)*): DataFrame =
    spark.read.format("graftserver")
      .options(Map("server_dir" -> dir, "ns" -> "db.c",
        "assume_uniform_storage" -> "true", "sample_key" -> "_id") ++ extra)
      .schema("_id LONG, name STRING").load()

  test("driving-side TABLESAMPLE rides the pushed join; result equals sample-then-join") {
    import spark.implicits._
    val dir = freshDir()
    seed(dir)
    val oo = o(dir).sample(withReplacement = false, 0.4, seed = 7L)
    val cc = c(dir)
    val q = oo.join(cc, oo("custkey") === cc("_id"))
      .select(oo("_id").as("okey"), $"name")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedJoin: INNER db.c"), plan)
    assert(plan.contains("PushedSample: SAMPLE(_id"), plan)
    assert(!plan.contains("Sample "), s"no Spark Sample node expected:\n$plan")

    // baseline: the SAME deterministic sample on a plain scan, joined by
    // Spark over separate reads
    val sampledKeys = o(dir).sample(withReplacement = false, 0.4, seed = 7L)
      .select($"_id").collect().map(_.getLong(0)).toSet
    assert(sampledKeys.nonEmpty && sampledKeys.size < 200)
    val got = q.collect().map(_.getLong(0)).toSet
    assert(got == sampledKeys, s"sampled join keys diverge: ${got.size} vs ${sampledKeys.size}")
  }

  test("lookup-side TABLESAMPLE composes under INNER; refuses under LEFT OUTER") {
    import spark.implicits._
    val dir = freshDir()
    seed(dir)
    val oo = o(dir)
    val cc = c(dir).sample(withReplacement = false, 0.5, seed = 11L)
    val inner = oo.join(cc, oo("custkey") === cc("_id"))
      .select(oo("_id").as("okey"), $"name")
    val innerPlan = inner.queryExecution.executedPlan.toString
    assert(innerPlan.contains("PushedJoin: INNER db.c") &&
      innerPlan.contains("PushedSample:"), innerPlan)
    val keptCust = c(dir).sample(withReplacement = false, 0.5, seed = 11L)
      .select($"_id").collect().map(_.getLong(0)).toSet
    assert(inner.count() == 200L / 20L * keptCust.size,
      "each kept customer contributes its 10 orders")

    // LEFT OUTER with a sampled LOOKUP side: the null-extended rows the
    // join must keep cannot be re-checked post-join — stays in Spark
    val cc2 = c(dir).sample(withReplacement = false, 0.5, seed = 11L)
    val loj = oo.join(cc2, oo("custkey") === cc2("_id"), "left_outer")
      .select(oo("_id").as("okey"), $"name")
    assert(!loj.queryExecution.executedPlan.toString.contains("PushedJoin"),
      loj.queryExecution.executedPlan.toString)
    assert(loj.count() == 200, "LOJ keeps every driving row")
    assert(loj.filter($"name".isNull).count() == 200L - 200L / 20L * keptCust.size)
  }

  test("driving-side sample under LEFT OUTER composes (preserved side)") {
    import spark.implicits._
    val dir = freshDir()
    seed(dir)
    val oo = o(dir).sample(withReplacement = false, 0.3, seed = 3L)
    val cc = c(dir)
    val q = oo.join(cc, oo("custkey") === cc("_id"), "left_outer")
      .select(oo("_id").as("okey"), $"name")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedJoin: LEFT OUTER db.c") &&
      plan.contains("PushedSample:"), plan)
    val sampledKeys = o(dir).sample(withReplacement = false, 0.3, seed = 3L)
      .select($"_id").collect().map(_.getLong(0)).toSet
    assert(q.collect().map(_.getLong(0)).toSet == sampledKeys)
  }

  test("sample key Spark did not request is carried as a HIDDEN projection") {
    import spark.implicits._
    val dir = freshDir()
    seed(dir)
    // _id (the sample key) is NOT projected out of the driving side —
    // the pipeline carries it as __sample0 and the reader checks the
    // window on it; the visible schema never sees it
    val oo = o(dir).sample(withReplacement = false, 0.4, seed = 7L)
    val cc = c(dir)
    val q = oo.join(cc, oo("custkey") === cc("_id"))
      .select($"price", $"name")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedJoin: INNER db.c") &&
      plan.contains("PushedSample: SAMPLE(__sample0"), plan)
    assert(!q.schema.fieldNames.exists(_.startsWith("__sample")))
    // rows exact vs sample-then-join
    val expect = o(dir).sample(withReplacement = false, 0.4, seed = 7L).count()
    assert(q.count() == expect)
  }

  test("OFFSET over a pushed join is a $skip tail on the single pipeline") {
    import spark.implicits._
    val dir = freshDir()
    seed(dir)
    val oo = o(dir, "splitter" -> "single")
    val cc = c(dir)
    val j = oo.join(cc, oo("custkey") === cc("_id"))
      .select(oo("_id").as("okey"), $"name")
      .offset(150)
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("PushedJoin: INNER db.c") &&
      plan.contains("PushedOffset: 150"), plan)
    assert(j.count() == 50)

    // without splitter=single the offset stays in Spark
    val oo2 = o(dir)
    val j2 = oo2.join(cc, oo2("custkey") === cc("_id"))
      .select(oo2("_id").as("okey"), $"name")
      .offset(150)
    assert(!j2.queryExecution.executedPlan.toString.contains("PushedOffset"))
    assert(j2.count() == 50)
  }

  test("a sampled 3-way chain keeps the pushed pipeline (hidden key rides the flatten)") {
    import spark.implicits._
    val dir = freshDir()
    seed(dir)
    (0 until 20).map(i => (i.toLong, (i % 4).toLong))
      .toDF("_id", "regkey")
      .write.format("graftserver")
      .options(Map("server_dir" -> dir, "ns" -> "db.cr"))
      .option("id_column", "_id").mode("append").save()
    (0 until 4).map(i => (i.toLong, s"r$i"))
      .toDF("_id", "rname")
      .write.format("graftserver")
      .options(Map("server_dir" -> dir, "ns" -> "db.r"))
      .option("id_column", "_id").mode("append").save()
    val cr = spark.read.format("graftserver")
      .options(Map("server_dir" -> dir, "ns" -> "db.cr",
        "assume_uniform_storage" -> "true"))
      .schema("_id LONG, regkey LONG").load()
    val rr = spark.read.format("graftserver")
      .options(Map("server_dir" -> dir, "ns" -> "db.r",
        "assume_uniform_storage" -> "true"))
      .schema("_id LONG, rname STRING").load()
    // the sampled base's key (_id) is NOT selected out of the chain's
    // re-projection — r14 refused here and fell back to a Spark join of
    // the sampled base; the hidden carry keeps the whole pipeline
    val oo = o(dir).sample(withReplacement = false, 0.4, seed = 7L)
    val q = oo.join(cr, oo("custkey") === cr("_id"))
      .join(rr, cr("regkey") === rr("_id"))
      .select($"price", $"rname")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedJoin: INNER db.cr") &&
      plan.contains("THEN INNER db.r") &&
      plan.contains("PushedSample: SAMPLE(__sample"), plan)
    assert(!plan.contains("Join ") && !plan.contains("Sample "),
      s"zero Spark join/sample operators expected:\n$plan")
    // exact vs sample-then-join over plain scans
    val exp = {
      val o2 = o(dir).sample(withReplacement = false, 0.4, seed = 7L)
        .select($"price", $"custkey")
      val cr2 = cr.select($"_id".as("ck"), $"regkey")
      val rr2 = rr.select($"_id".as("rk"), $"rname")
      o2.join(cr2, $"custkey" === $"ck").join(rr2, $"regkey" === $"rk")
        .select($"price", $"rname")
        .collect().map(r => (r.getDouble(0), r.getString(1))).sorted.toSeq
    }
    val got = q.collect().map(r => (r.getDouble(0), r.getString(1))).sorted.toSeq
    assert(got == exp && got.nonEmpty, s"got ${got.size} vs exp ${exp.size}")
  }

  test("OFFSET over a MIRRORED join gates on the DRIVING side's splitter") {
    import spark.implicits._
    val dir = freshDir()
    seed(dir)
    // right_outer(o, c) drives from c — the joined scan partitions by
    // c's options, so a `splitter=single` on the Spark-LEFT relation
    // (o) must NOT admit the $skip: each of c's per-split pipelines
    // would skip n and Spark deletes an accepted OFFSET outright
    val ooSingle = o(dir, "splitter" -> "single")
    val ccMulti = c(dir)
    val refuse = ooSingle.join(ccMulti,
        ooSingle("custkey") === ccMulti("_id"), "right_outer")
      .select(ooSingle("price").as("p"), $"name")
      .offset(150)
    val refusePlan = refuse.queryExecution.executedPlan.toString
    assert(refusePlan.contains("PushedJoin: LEFT OUTER db.o"), refusePlan)
    assert(!refusePlan.contains("PushedOffset"),
      s"mirrored join must gate the skip on the DRIVING (c) side:\n$refusePlan")
    assert(refuse.count() == 50)

    // single-splitter on the DRIVING (c) side admits the $skip
    val ooMulti = o(dir)
    val ccSingle = c(dir, "splitter" -> "single")
    val accept = ooMulti.join(ccSingle,
        ooMulti("custkey") === ccSingle("_id"), "right_outer")
      .select(ooMulti("price").as("p"), $"name")
      .offset(150)
    val acceptPlan = accept.queryExecution.executedPlan.toString
    assert(acceptPlan.contains("PushedJoin: LEFT OUTER db.o") &&
      acceptPlan.contains("PushedOffset: 150"), acceptPlan)
    assert(accept.count() == 50)
  }
}
