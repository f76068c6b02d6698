package graft.server

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** `$unwind` composed with the pushed join (r15): `explode(driving.arr)`
  * above an INNER / LEFT OUTER join of two graftserver scans transposes
  * below the join ([[graft.plans.UnwindRelocate.rewriteOverJoin]]) into
  * the driving leg's relation, and the whole
  * `$match`+`$unwind`+`$match(post)`+`$lookup` runs as ONE pipeline —
  * zero Spark Generate/Join operators. Refusal matrix: lookup-side
  * arrays, RIGHT OUTER joins, conditions consuming the array column.
  */
class UnwindJoinSpec extends SparkSpec {

  private def freshDir(): String = Files.createTempDirectory("graft-uwj").toString

  /** orders: _id, custkey, tags; customers: _id, name.
    * order 3 has an empty tags array; order 4 a null one; custkey 99 of
    * order 5 matches no customer.
    */
  private def seed(dir: String): Unit = {
    import spark.implicits._
    Seq(
      (1L, 10L, Seq("x", "y")),
      (2L, 20L, Seq("y")),
      (3L, 10L, Seq.empty[String]),
      (4L, 20L, null.asInstanceOf[Seq[String]]),
      (5L, 99L, Seq("x", "z")))
      .toDF("_id", "custkey", "tags")
      .write.format("graftserver")
      .options(Map("server_dir" -> dir, "ns" -> "db.o"))
      .option("id_column", "_id").mode("append").save()
    Seq((10L, "alice"), (20L, "bob"), (30L, "carol"))
      .toDF("_id", "name")
      .write.format("graftserver")
      .options(Map("server_dir" -> dir, "ns" -> "db.c"))
      .option("id_column", "_id").mode("append").save()
  }

  private def o(dir: String, extra: (String, String)*): DataFrame =
    spark.read.format("graftserver")
      .options(Map("server_dir" -> dir, "ns" -> "db.o",
        "assume_uniform_storage" -> "true") ++ extra)
      .schema("_id LONG, custkey LONG, tags ARRAY<STRING>").load()

  private def c(dir: String, extra: (String, String)*): DataFrame =
    spark.read.format("graftserver")
      .options(Map("server_dir" -> dir, "ns" -> "db.c",
        "assume_uniform_storage" -> "true") ++ extra)
      .schema("_id LONG, name STRING").load()

  private def planOf(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("explode(driving.arr) over an INNER join: one pushed pipeline, zero Spark operators") {
    import spark.implicits._
    val dir = freshDir()
    seed(dir)
    val oo = o(dir)
    val cc = c(dir)
    val q = oo.join(cc, oo("custkey") === cc("_id"))
      .select(oo("_id").as("okey"), $"name", explode(oo("tags")).as("tag"))
    val plan = planOf(q)
    assert(plan.contains("PushedUnwind: tags") &&
      plan.contains("PushedJoin: INNER db.c"), plan)
    assert(!plan.contains("Generate") && !plan.contains("Join "),
      s"no Spark Generate/Join expected:\n$plan")
    // rows: order 1 (cust 10) x,y; order 2 (cust 20) y; orders 3/4 drop
    // (empty/null arrays); order 5 drops (no customer)
    assert(q.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sorted.toSeq ==
      Seq((1L, "alice", "x"), (1L, "alice", "y"), (2L, "bob", "y")))
  }

  test("explode_outer over a LEFT OUTER join composes; rows match Spark's own join") {
    import spark.implicits._
    val dir = freshDir()
    seed(dir)
    val oo = o(dir)
    val cc = c(dir)
    val q = oo.join(cc, oo("custkey") === cc("_id"), "left_outer")
      .select(oo("_id").as("okey"), $"name", explode_outer(oo("tags")).as("tag"))
    val plan = planOf(q)
    assert(plan.contains("PushedUnwind: tags OUTER") &&
      plan.contains("PushedJoin: LEFT OUTER db.c"), plan)
    assert(!plan.contains("Generate") && !plan.contains("Join "), plan)
    val got = q.collect()
      .map(r => (r.getLong(0), Option(r.getString(1)).getOrElse("∅"),
        Option(r.getString(2)).getOrElse("∅"))).sorted.toSeq
    // parity against Spark computing the same plan over plain reads
    val exp = {
      val o2 = o(dir).select($"_id".as("okey"), $"custkey", $"tags")
      val c2 = c(dir).select($"_id".as("ck"), $"name")
      o2.join(c2, $"custkey" === $"ck", "left_outer")
        .select($"okey", $"name", explode_outer($"tags").as("tag"))
        .collect()
        .map(r => (r.getLong(0), Option(r.getString(1)).getOrElse("∅"),
          Option(r.getString(2)).getOrElse("∅"))).sorted.toSeq
    }
    assert(got == exp, s"got $got\nexp $exp")
    assert(got.size == 7,
      "orders 3/4 keep one null-tag row each; order 5 keeps its two tags with a null name")
  }

  test("element filter renders as the pipeline's post-unwind $match with a parent prune") {
    import spark.implicits._
    val dir = freshDir()
    seed(dir)
    CountingServerFactory.reset()
    val oo = o(dir, "client_factory" -> classOf[CountingServerFactory].getName)
    val cc = c(dir, "client_factory" -> classOf[CountingServerFactory].getName)
    val q = oo.join(cc, oo("custkey") === cc("_id"))
      .select(oo("_id").as("okey"), $"name", explode(oo("tags")).as("tag"))
      .filter($"tag" === "x")
    val plan = planOf(q)
    assert(plan.contains("PushedUnwind: tags") &&
      plan.contains("PostUnwindMatch:") &&
      plan.contains("PushedJoin: INNER db.c") &&
      plan.contains("ElemMatch(tags"), plan)
    assert(!plan.contains("Generate") && !plan.contains("Join "), plan)
    assert(q.collect().map(r => (r.getLong(0), r.getString(2))).sorted.toSeq ==
      Seq((1L, "x")))
    assert(CountingServerFactory.count("lookupJoin") == 1 &&
      CountingServerFactory.count("find") == 0,
      s"one pipeline round-trip: ${CountingServerFactory.snapshot()}")
  }

  test("the ELEMENT itself can be the join key (null elements never match under INNER)") {
    import spark.implicits._
    val dir = freshDir()
    // refs arrays point at customer keys; one array carries a gap (55)
    Seq(
      (1L, Seq(10L, 20L)),
      (2L, Seq(20L, 55L)),
      (3L, Seq.empty[Long]))
      .toDF("_id", "refs")
      .write.format("graftserver")
      .options(Map("server_dir" -> dir, "ns" -> "db.o"))
      .option("id_column", "_id").mode("append").save()
    Seq((10L, "alice"), (20L, "bob"))
      .toDF("_id", "name")
      .write.format("graftserver")
      .options(Map("server_dir" -> dir, "ns" -> "db.c"))
      .option("id_column", "_id").mode("append").save()
    val oo = spark.read.format("graftserver")
      .options(Map("server_dir" -> dir, "ns" -> "db.o",
        "assume_uniform_storage" -> "true"))
      .schema("_id LONG, refs ARRAY<LONG>").load()
    val cc = c(dir)
    val e = oo.select($"_id".as("okey"), explode($"refs").as("ref"))
    val q = e.join(cc, e("ref") === cc("_id"))
      .select($"okey", $"ref", $"name")
    val plan = planOf(q)
    assert(plan.contains("PushedUnwind: refs") &&
      plan.contains("PushedJoin: INNER db.c"), plan)
    assert(!plan.contains("Generate") && !plan.contains("Join "), plan)
    assert(q.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sorted.toSeq ==
      Seq((1L, 10L, "alice"), (1L, 20L, "bob"), (2L, 20L, "bob")))
  }

  test("GROUP BY over the unwound join folds in the same single pipeline") {
    import spark.implicits._
    val dir = freshDir()
    seed(dir)
    CountingServerFactory.reset()
    val oo = o(dir, "client_factory" -> classOf[CountingServerFactory].getName)
    val cc = c(dir, "client_factory" -> classOf[CountingServerFactory].getName)
    val q = oo.join(cc, oo("custkey") === cc("_id"))
      .select($"name", explode(oo("tags")).as("tag"))
      .groupBy($"name", $"tag").agg(count(lit(1)).as("n"))
    val plan = planOf(q)
    assert(plan.contains("PushedUnwind: tags") &&
      plan.contains("PushedJoin: INNER db.c") &&
      plan.contains("PushedGroupedAggregate"), plan)
    assert(!plan.contains("Generate") && !plan.contains("Join "), plan)
    assert(q.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .sorted.toSeq ==
      Seq(("alice", "x", 1L), ("alice", "y", 1L), ("bob", "y", 1L)))
    assert(CountingServerFactory.count("lookupJoin") == 1,
      s"one pipeline round-trip: ${CountingServerFactory.snapshot()}")
  }

  test("TopN over the unwound join is a $sort+$limit pipeline tail") {
    import spark.implicits._
    val dir = freshDir()
    seed(dir)
    val oo = o(dir)
    val cc = c(dir)
    val q = oo.join(cc, oo("custkey") === cc("_id"))
      .select(oo("_id").as("okey"), $"name", explode(oo("tags")).as("tag"))
      .orderBy($"okey".asc).limit(3)
    val plan = planOf(q)
    assert(plan.contains("PushedUnwind: tags") &&
      plan.contains("PushedJoin: INNER db.c") &&
      plan.contains("PushedTopN:"), plan)
    // ties within okey 1 are order-free — compare as a set
    assert(q.collect().map(r => (r.getLong(0), r.getString(2))).toSet ==
      Set((1L, "x"), (1L, "y"), (2L, "y")))
  }

  test("an unwound RIGHT relation drives a mirrored right-outer join (r15)") {
    import spark.implicits._
    val dir = freshDir()
    seed(dir)
    // the user unwound the RIGHT relation BEFORE the right-outer join —
    // no transpose involved; the mirror makes the unwound scan drive
    val cc = c(dir)
    val oo = o(dir)
    val e = oo.select(oo("custkey"), explode(oo("tags")).as("tag"))
    val q = cc.join(e, cc("_id") === e("custkey"), "right_outer")
      .select($"name", $"tag")
    val plan = planOf(q)
    assert(plan.contains("PushedUnwind: tags") &&
      plan.contains("PushedJoin: LEFT OUTER db.c"), plan)
    assert(!plan.contains("Generate") && !plan.contains("Join "), plan)
    val got = q.collect()
      .map(r => (Option(r.getString(0)).getOrElse("∅"), r.getString(1)))
      .sorted.toSeq
    // orders 1 (cust 10) x,y; 2 (cust 20) y; 5 (cust 99 — no customer,
    // null-extended) x,z; empty/null arrays drop pre-join
    assert(got == Seq(("alice", "x"), ("alice", "y"), ("bob", "y"),
      ("∅", "x"), ("∅", "z")), got)

    // the REVERSE orientation refuses: the unwound relation as the
    // LOOKUP (left) leg of a right-outer join — element rows are not
    // parent-atomic across the join boundary
    val rq = e.join(cc, e("custkey") === cc("_id"), "right_outer")
      .select($"name", $"tag")
    assert(!planOf(rq).contains("PushedJoin"), planOf(rq))
    assert(rq.count() == 4, "3 matched element rows + carol null-extended")
  }

  test("the unwind_join_pushdown knob leaves the flatten to Spark, join still pushed") {
    import spark.implicits._
    val dir = freshDir()
    seed(dir)
    spark.conf.set(graft.plans.UnwindRelocate.JoinConfKey, "false")
    try {
      val oo = o(dir)
      val cc = c(dir)
      // OUTER explode: no InferFiltersFromGenerate array conjuncts, so
      // the JOIN still pushes and only the fan-out stays a Spark
      // Generate — the wide-parent escape shape
      val qo = oo.join(cc, oo("custkey") === cc("_id"), "left_outer")
        .select(oo("_id").as("okey"), $"name", explode_outer(oo("tags")).as("tag"))
      val planO = planOf(qo)
      assert(planO.contains("Generate") && planO.contains("PushedJoin") &&
        !planO.contains("PushedUnwind"), planO)
      assert(qo.count() == 7)
      // non-OUTER explode: Spark's inferred isnotnull/size conjuncts on
      // the array column are deliberately RESIDUAL (r15 array-null
      // rule) and would forfeit the join push too; retainJoinPush (r17)
      // deletes exactly those Generate-implied conjuncts and pins the
      // generator input, so the TRUE join-only state — PushedJoin under
      // a Spark Generate — is now reachable for non-outer explodes.
      // Rows stay exact.
      val q = oo.join(cc, oo("custkey") === cc("_id"))
        .select(oo("_id").as("okey"), $"name", explode(oo("tags")).as("tag"))
      val plan = planOf(q)
      assert(plan.contains("Generate") && plan.contains("retained_unwind") &&
        plan.contains("PushedJoin: INNER db.c") &&
        !plan.contains("PushedUnwind") && !plan.contains("Join "), plan)
      assert(q.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
        .sorted.toSeq ==
        Seq((1L, "alice", "x"), (1L, "alice", "y"), (2L, "bob", "y")))
    } finally spark.conf.set(graft.plans.UnwindRelocate.JoinConfKey, "true")
  }

  test("refusals: lookup-side arrays, RIGHT OUTER, array consumed above") {
    import spark.implicits._
    val dir = freshDir()
    seed(dir)
    // lookup-side array: explode(c-side array) — the join STILL pushes
    // (retainJoinPush deletes the inferred array conjuncts that used to
    // block it), only the Generate stays in Spark
    val dir2 = freshDir()
    Seq((10L, Seq("p", "q")), (20L, Seq("r")))
      .toDF("_id", "labels")
      .write.format("graftserver")
      .options(Map("server_dir" -> dir2, "ns" -> "db.c2"))
      .option("id_column", "_id").mode("append").save()
    Seq((1L, 10L), (2L, 20L)).toDF("_id", "custkey")
      .write.format("graftserver")
      .options(Map("server_dir" -> dir2, "ns" -> "db.o2"))
      .option("id_column", "_id").mode("append").save()
    val o2 = spark.read.format("graftserver")
      .options(Map("server_dir" -> dir2, "ns" -> "db.o2",
        "assume_uniform_storage" -> "true"))
      .schema("_id LONG, custkey LONG").load()
    val c2 = spark.read.format("graftserver")
      .options(Map("server_dir" -> dir2, "ns" -> "db.c2",
        "assume_uniform_storage" -> "true"))
      .schema("_id LONG, labels ARRAY<STRING>").load()
    val lk = o2.join(c2, o2("custkey") === c2("_id"))
      .select(o2("_id").as("okey"), explode($"labels").as("lab"))
    val lkPlan = planOf(lk)
    assert(lkPlan.contains("Generate"),
      s"lookup-side array must keep Spark's Generate:\n$lkPlan")
    assert(lkPlan.contains("PushedJoin: INNER db.c2") &&
      !lkPlan.contains("Join "),
      s"lookup-side array must not forfeit the join push:\n$lkPlan")
    assert(lk.collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq ==
      Seq((1L, "p"), (1L, "q"), (2L, "r")))

    // RIGHT OUTER: the transpose is unsound — Generate stays
    val oo = o(dir)
    val cc = c(dir)
    val ro = oo.join(cc, oo("custkey") === cc("_id"), "right_outer")
      .select($"name", explode_outer(oo("tags")).as("tag"))
    val roPlan = planOf(ro)
    assert(roPlan.contains("Generate"),
      s"RIGHT OUTER must keep Spark's Generate:\n$roPlan")
    // matched pairs explode_outer to 2+1+1+1 rows; carol (cust 30)
    // matches no order — one null-extended row with a null tag
    assert(ro.count() == 6)

    // array consumed ABOVE the explode: one-path constraint refuses the
    // relocation, but the join still pushes (the array column rides the
    // joined projection; the Generate explodes it Spark-side)
    val both = oo.join(cc, oo("custkey") === cc("_id"))
      .select(oo("tags"), explode(oo("tags")).as("tag"))
    val bothPlan = planOf(both)
    assert(bothPlan.contains("Generate") &&
      bothPlan.contains("PushedJoin: INNER db.c") &&
      !bothPlan.contains("Join "), bothPlan)
    assert(both.count() == 3)
  }

  test("TABLESAMPLE on the unwound driving side stays parent-atomic through the join") {
    import spark.implicits._
    val dir = freshDir()
    import scala.util.Random
    val rnd = new Random(7)
    (0 until 60).map(i => (i.toLong, (i % 3 * 10 + 10).toLong,
        Seq.fill(rnd.nextInt(3) + 1)("t" + rnd.nextInt(5))))
      .toDF("_id", "custkey", "tags")
      .write.format("graftserver")
      .options(Map("server_dir" -> dir, "ns" -> "db.o"))
      .option("id_column", "_id").mode("append").save()
    Seq((10L, "alice"), (20L, "bob"), (30L, "carol"))
      .toDF("_id", "name")
      .write.format("graftserver")
      .options(Map("server_dir" -> dir, "ns" -> "db.c"))
      .option("id_column", "_id").mode("append").save()
    val oo = o(dir, "sample_key" -> "_id")
      .sample(withReplacement = false, 0.4, seed = 11L)
    val cc = c(dir)
    val q = oo.join(cc, oo("custkey") === cc("_id"))
      .select(oo("_id").as("okey"), $"name", explode(oo("tags")).as("tag"))
    val plan = planOf(q)
    assert(plan.contains("PushedUnwind: tags") &&
      plan.contains("PushedJoin: INNER db.c") &&
      plan.contains("PushedSample:"), plan)
    assert(!plan.contains("Generate") && !plan.contains("Join ") &&
      !plan.contains("Sample "), plan)
    // parity: the SAME deterministic window, sample-then-explode-then-join
    val exp = {
      val o2 = o(dir, "sample_key" -> "_id")
        .sample(withReplacement = false, 0.4, seed = 11L)
        .select($"_id".as("okey"), $"custkey", explode($"tags").as("tag"))
      val c2 = c(dir).select($"_id".as("ck"), $"name")
      o2.join(c2, $"custkey" === $"ck")
        .select($"okey", $"name", $"tag")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
        .sorted.toSeq
    }
    val got = q.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sorted.toSeq
    assert(got == exp && got.nonEmpty, s"got ${got.size} vs exp ${exp.size}")
  }

  test("struct-element SUBFIELD group keys and RESIDUAL element filters compose over the unwound join") {
    import spark.implicits._
    val dir = freshDir()
    Seq((1L, 10L, Seq(("en", 3), ("fr", 5))), (2L, 20L, Seq(("de", 9), ("en", 2))))
      .toDF("_id", "ck", "raw")
      .select($"_id", $"ck", expr(
        "transform(raw, x -> named_struct('lang', x._1, 'n', x._2))")
        .as("entries"))
      .write.format("graftserver")
      .options(Map("server_dir" -> dir, "ns" -> "db.o"))
      .option("id_column", "_id").mode("append").save()
    Seq((10L, "a"), (20L, "b")).toDF("_id", "name")
      .write.format("graftserver")
      .options(Map("server_dir" -> dir, "ns" -> "db.c"))
      .option("id_column", "_id").mode("append").save()
    val oo = spark.read.format("graftserver")
      .options(Map("server_dir" -> dir, "ns" -> "db.o",
        "assume_uniform_storage" -> "true"))
      .schema("_id LONG, ck LONG, entries ARRAY<STRUCT<lang: STRING, n: INT>>")
      .load()
    val cc = c(dir)
    // GROUP BY (parent, element-subfield): ONE
    // $unwind+$lookup+$group pipeline, subfield key resolved through
    // the element mapping against the joined output
    val g = oo.join(cc, oo("ck") === cc("_id"))
      .select($"name", explode(oo("entries")).as("entry"))
      .groupBy($"name", $"entry.lang".as("lang")).agg(sum($"entry.n").as("s"))
    val gPlan = planOf(g)
    assert(gPlan.contains("PushedUnwind: entries") &&
      gPlan.contains("PushedJoin: INNER db.c") &&
      gPlan.contains("PushedGroupedAggregate: GROUP BY name, entry.lang"),
      gPlan)
    assert(!gPlan.contains("Generate") && !gPlan.contains("Join "), gPlan)
    assert(g.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .sorted.toSeq ==
      Seq(("a", "en", 3L), ("a", "fr", 5L), ("b", "de", 9L), ("b", "en", 2L)))

    // an UNTRANSLATABLE element predicate hoists to a recheck Filter
    // ABOVE the still-pushed unwound join (ResidualJoinHoist composes)
    val r = oo.join(cc, oo("ck") === cc("_id"))
      .select(oo("_id").as("okey"), $"name", explode(oo("entries")).as("entry"))
      .filter(length($"entry.lang") + $"entry.n" > 4)
    val rPlan = planOf(r)
    assert(rPlan.contains("PushedUnwind: entries") &&
      rPlan.contains("PushedJoin: INNER db.c") &&
      rPlan.contains("recheck("), rPlan)
    assert(!rPlan.contains("Generate") && !rPlan.contains("Join "), rPlan)
    assert(r.collect().map(x => (x.getLong(0), x.getStruct(2).getString(0)))
      .sorted.toSeq == Seq((1L, "en"), (1L, "fr"), (2L, "de")))
  }

  test("struct-element SUBFIELD TopN rides the unwound join's $sort tail") {
    import spark.implicits._
    val dir = freshDir()
    Seq((1L, 10L, Seq(("en", 3), ("fr", 5))), (2L, 20L, Seq(("de", 9))))
      .toDF("_id", "ck", "raw")
      .select($"_id", $"ck", expr(
        "transform(raw, x -> named_struct('lang', x._1, 'n', x._2))")
        .as("entries"))
      .write.format("graftserver")
      .options(Map("server_dir" -> dir, "ns" -> "db.o"))
      .option("id_column", "_id").mode("append").save()
    Seq((10L, "a"), (20L, "b")).toDF("_id", "name")
      .write.format("graftserver")
      .options(Map("server_dir" -> dir, "ns" -> "db.c"))
      .option("id_column", "_id").mode("append").save()
    val oo = spark.read.format("graftserver")
      .options(Map("server_dir" -> dir, "ns" -> "db.o",
        "assume_uniform_storage" -> "true"))
      .schema("_id LONG, ck LONG, entries ARRAY<STRUCT<lang: STRING, n: INT>>")
      .load()
    val cc = c(dir)
    // ORDER BY a struct-element subfield over the unwound join: the
    // nested order key resolves post-unwind (entries.n holds the
    // element's n) and the $sort+$limit tail appends to the SAME
    // pipeline — $unwind + $lookup + $sort + $limit, zero Spark
    // Generate/Join/Sort operators below the final fold
    val q = oo.join(cc, oo("ck") === cc("_id"))
      .select(oo("_id").as("okey"), $"name", explode(oo("entries")).as("entry"))
      .orderBy($"entry.n".desc, $"okey".asc).limit(2)
    val plan = planOf(q)
    assert(plan.contains("PushedUnwind: entries") &&
      plan.contains("PushedJoin: INNER db.c") &&
      plan.contains("PushedTopN: ORDER BY entry.n DESC"), plan)
    assert(!plan.contains("Generate") && !plan.contains("Join "), plan)
    assert(q.collect().map(r => (r.getLong(0), r.getStruct(2).getInt(1)))
      .toSeq == Seq((2L, 9), (1L, 5)))
  }

  test("foreign scalar-at-array-path storage unwinds through the join (mongo's rule)") {
    import spark.implicits._
    val dir = freshDir()
    // two writes with different schemas = mixed storage in ONE
    // collection: docs 1/2 carry arrays, doc 3 a SCALAR at tags
    Seq((1L, 10L, Seq("x", "y")), (2L, 20L, Seq("y")))
      .toDF("_id", "custkey", "tags")
      .write.format("graftserver")
      .options(Map("server_dir" -> dir, "ns" -> "db.o"))
      .option("id_column", "_id").mode("append").save()
    Seq((3L, 10L, "solo")).toDF("_id", "custkey", "tags")
      .write.format("graftserver")
      .options(Map("server_dir" -> dir, "ns" -> "db.o"))
      .option("id_column", "_id").mode("append").save()
    Seq((10L, "alice"), (20L, "bob")).toDF("_id", "name")
      .write.format("graftserver")
      .options(Map("server_dir" -> dir, "ns" -> "db.c"))
      .option("id_column", "_id").mode("append").save()
    val oo = o(dir)
    val cc = c(dir)
    val q = oo.join(cc, oo("custkey") === cc("_id"))
      .select(oo("_id").as("okey"), $"name", explode(oo("tags")).as("tag"))
    assert(q.queryExecution.executedPlan.toString.contains("PushedUnwind"),
      q.queryExecution.executedPlan.toString)
    // the pushed $unwind passes the scalar through as a one-element row
    // (the same rule the plain unwound scan pins) — through the join too
    assert(q.collect().map(r => (r.getLong(0), r.getString(2))).sorted.toSeq ==
      Seq((1L, "x"), (1L, "y"), (2L, "y"), (3L, "solo")))
  }

  test("posexplode over the join keeps original indices; chain composes a 3rd collection") {
    import spark.implicits._
    val dir = freshDir()
    seed(dir)
    val oo = o(dir)
    val cc = c(dir)
    val p = oo.join(cc, oo("custkey") === cc("_id"))
      .select(oo("_id").as("okey"), $"name",
        posexplode(oo("tags")).as(Seq("pos", "tag")))
      .filter($"tag" =!= "y")
    val pPlan = planOf(p)
    assert(pPlan.contains("PushedUnwind: tags") &&
      pPlan.contains("PushedJoin: INNER db.c"), pPlan)
    assert(!pPlan.contains("Generate") && !pPlan.contains("Join "), pPlan)
    assert(p.collect().map(r => (r.getLong(0), r.getInt(2), r.getString(3)))
      .sorted.toSeq == Seq((1L, 0, "x")),
      "original index 0 for x of order 1; order 5 has no customer")

    // 3-way: unwound base + one chained lookup (a regions-style dim)
    Seq((10L, 100L), (20L, 200L)).toDF("_id", "regkey")
      .write.format("graftserver")
      .options(Map("server_dir" -> dir, "ns" -> "db.cr"))
      .option("id_column", "_id").mode("append").save()
    Seq((100L, "east"), (200L, "west")).toDF("_id", "rname")
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
    val chained = oo.join(cr, oo("custkey") === cr("_id"))
      .join(rr, cr("regkey") === rr("_id"))
      .select(oo("_id").as("okey"), $"rname", explode(oo("tags")).as("tag"))
    val chPlan = planOf(chained)
    assert(chPlan.contains("PushedUnwind: tags") &&
      chPlan.contains("THEN INNER db.r"), chPlan)
    assert(!chPlan.contains("Generate") && !chPlan.contains("Join "), chPlan)
    assert(chained.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sorted.toSeq ==
      Seq((1L, "east", "x"), (1L, "east", "y"), (2L, "west", "y")))
  }
}
