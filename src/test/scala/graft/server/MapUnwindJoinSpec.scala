package graft.server

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** MAP explode composed with the pushed join (r16): `explode(driving.m)`
  * for a `map<string,V>` column above an INNER / LEFT OUTER join of two
  * graftserver scans transposes below the join
  * ([[graft.plans.UnwindRelocate]] gives the MAP cases the same
  * `rewriteOverJoin` path arrays got in r15 — the map is computed from
  * the preserved driving leg, so k entries × m joined copies commute),
  * and the whole `$match`+`$set($objectToArray)`+`$unwind`+`$match(post)`
  * +`$lookup` runs as ONE pipeline — zero Spark Generate/Join operators.
  * Also pins the r15 ADVICE refusals: nondeterministic peeled conjuncts
  * refuse the relocation on both the scan and join forms.
  */
class MapUnwindJoinSpec extends SparkSpec {

  private def freshDir(): String = Files.createTempDirectory("graft-muj").toString

  /** orders: _id, custkey, metrics map; doc 3 an empty map; doc 4 a null
    * one; custkey 99 of doc 5 matches no customer. */
  private def seed(dir: String): Unit = {
    import spark.implicits._
    Seq(
      (1L, 10L, Map("a" -> 1L, "b" -> 2L)),
      (2L, 20L, Map("b" -> 3L)),
      (3L, 10L, Map.empty[String, Long]),
      (4L, 20L, null.asInstanceOf[Map[String, Long]]),
      (5L, 99L, Map("a" -> 9L, "c" -> 4L)))
      .toDF("_id", "custkey", "metrics")
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
      .schema("_id LONG, custkey LONG, metrics MAP<STRING, LONG>").load()

  private def c(dir: String, extra: (String, String)*): DataFrame =
    spark.read.format("graftserver")
      .options(Map("server_dir" -> dir, "ns" -> "db.c",
        "assume_uniform_storage" -> "true") ++ extra)
      .schema("_id LONG, name STRING").load()

  private def planOf(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("explode(driving.map) over an INNER join: one pushed pipeline, zero Spark operators") {
    import spark.implicits._
    val dir = freshDir()
    seed(dir)
    val oo = o(dir)
    val cc = c(dir)
    val q = oo.join(cc, oo("custkey") === cc("_id"))
      .select(oo("_id").as("okey"), $"name", explode(oo("metrics")))
    val plan = planOf(q)
    assert(plan.contains("PushedUnwind: metrics MAP") &&
      plan.contains("PushedJoin: INNER db.c"), plan)
    assert(!plan.contains("Generate") && !plan.contains("Join "),
      s"no Spark Generate/Join expected:\n$plan")
    // doc 1 (cust 10) a,b; doc 2 (cust 20) b; docs 3/4 drop (empty/null
    // maps); doc 5 drops (no customer)
    assert(q.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sorted.toSeq ==
      Seq((1L, "alice", "a", 1L), (1L, "alice", "b", 2L),
        (2L, "bob", "b", 3L)))
  }

  test("explode_outer(map) over a LEFT OUTER join composes; rows match Spark's own join") {
    import spark.implicits._
    val dir = freshDir()
    seed(dir)
    val oo = o(dir)
    val cc = c(dir)
    val q = oo.join(cc, oo("custkey") === cc("_id"), "left_outer")
      .select(oo("_id").as("okey"), $"name", explode_outer(oo("metrics")))
    val plan = planOf(q)
    assert(plan.contains("PushedUnwind: metrics MAP OUTER") &&
      plan.contains("PushedJoin: LEFT OUTER db.c"), plan)
    assert(!plan.contains("Generate") && !plan.contains("Join "), plan)
    def render(df: DataFrame): Seq[(Long, String, String, String)] =
      df.collect().map(r => (r.getLong(0),
        Option(r.getString(1)).getOrElse("∅"),
        Option(r.getString(2)).getOrElse("∅"),
        if (r.isNullAt(3)) "∅" else r.getLong(3).toString)).sorted.toSeq
    val exp = {
      val o2 = o(dir).select($"_id".as("okey"), $"custkey", $"metrics")
      val c2 = c(dir).select($"_id".as("ck"), $"name")
      render(o2.join(c2, $"custkey" === $"ck", "left_outer")
        .select($"okey", $"name", explode_outer($"metrics")))
    }
    val got = render(q)
    assert(got == exp, s"got $got\nexp $exp")
    assert(got.size == 7,
      "docs 3/4 keep one null-entry row each; doc 5 keeps both entries null-named")
  }

  test("kv filter is the post-unwind $match; GROUP BY key folds in the same pipeline") {
    import spark.implicits._
    val dir = freshDir()
    seed(dir)
    CountingServerFactory.reset()
    val oo = o(dir, "client_factory" -> classOf[CountingServerFactory].getName)
    val cc = c(dir, "client_factory" -> classOf[CountingServerFactory].getName)
    val q = oo.join(cc, oo("custkey") === cc("_id"))
      .select($"name", explode(oo("metrics")))
      .filter($"value" >= 2L)
      .groupBy($"key").agg(count(lit(1)).as("n"), sum($"value").as("total"))
    val plan = planOf(q)
    assert(plan.contains("PushedUnwind: metrics MAP") &&
      plan.contains("PostUnwindMatch:") &&
      plan.contains("PushedJoin: INNER db.c") &&
      plan.contains("PushedGroupedAggregate"), plan)
    assert(!plan.contains("Generate") && !plan.contains("Join "), plan)
    assert(q.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sorted.toSeq == Seq(("b", 2L, 5L)))
    assert(CountingServerFactory.count("lookupJoin") == 1 &&
      CountingServerFactory.count("find") == 0,
      s"one pipeline round-trip: ${CountingServerFactory.snapshot()}")
  }

  test("the kv VALUE can be the join key (entry values resolve a dimension)") {
    import spark.implicits._
    val dir = freshDir()
    Seq(
      (1L, Map("x" -> 10L, "y" -> 20L)),
      (2L, Map("z" -> 55L)))
      .toDF("_id", "refs")
      .write.format("graftserver")
      .options(Map("server_dir" -> dir, "ns" -> "db.o"))
      .option("id_column", "_id").mode("append").save()
    Seq((10L, "alice"), (20L, "bob"), (30L, "carol"))
      .toDF("_id", "name")
      .write.format("graftserver")
      .options(Map("server_dir" -> dir, "ns" -> "db.c"))
      .option("id_column", "_id").mode("append").save()
    val oo = spark.read.format("graftserver")
      .options(Map("server_dir" -> dir, "ns" -> "db.o",
        "assume_uniform_storage" -> "true"))
      .schema("_id LONG, refs MAP<STRING, LONG>").load()
    val cc = c(dir)
    val e = oo.select(oo("_id").as("okey"), explode($"refs"))
    val q = e.join(cc, e("value") === cc("_id"))
      .select($"okey", $"key", $"name")
    val plan = planOf(q)
    assert(plan.contains("PushedUnwind: refs MAP") &&
      plan.contains("PushedJoin: INNER db.c"), plan)
    assert(!plan.contains("Generate") && !plan.contains("Join "), plan)
    assert(q.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sorted.toSeq ==
      Seq((1L, "x", "alice"), (1L, "y", "bob")))
  }

  test("posexplode(map) over the join rides includeArrayIndex in the pipeline") {
    import spark.implicits._
    val dir = freshDir()
    seed(dir)
    val oo = o(dir)
    val cc = c(dir)
    val q = oo.join(cc, oo("custkey") === cc("_id"))
      .select($"name", posexplode(oo("metrics")))
    val plan = planOf(q)
    assert(plan.contains("PushedUnwind: metrics MAP") &&
      plan.contains("PushedJoin: INNER db.c"), plan)
    assert(!plan.contains("Generate") && !plan.contains("Join "), plan)
    assert(q.collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getLong(3)))
      .sorted.toSeq ==
      Seq(("alice", 0, "a", 1L), ("alice", 1, "b", 2L), ("bob", 0, "b", 3L)))
  }

  test("an unwound-map RIGHT relation drives a mirrored right-outer join") {
    import spark.implicits._
    val dir = freshDir()
    seed(dir)
    val cc = c(dir)
    val oo = o(dir)
    val e = oo.select(oo("custkey"), explode(oo("metrics")))
    val q = cc.join(e, cc("_id") === e("custkey"), "right_outer")
      .select($"name", $"key", $"value")
    val plan = planOf(q)
    assert(plan.contains("PushedUnwind: metrics MAP") &&
      plan.contains("PushedJoin: LEFT OUTER db.c"), plan)
    assert(!plan.contains("Generate") && !plan.contains("Join "), plan)
    val got = q.collect()
      .map(r => (Option(r.getString(0)).getOrElse("∅"), r.getString(1),
        r.getLong(2))).sorted.toSeq
    // doc 1 (cust 10) a,b; doc 2 (cust 20) b; doc 5 (cust 99,
    // null-extended) a,c; empty/null maps drop pre-join
    assert(got == Seq(("alice", "a", 1L), ("alice", "b", 2L),
      ("bob", "b", 3L), ("∅", "a", 9L), ("∅", "c", 4L)), got)
  }

  test("map explode transposes through a CHAINED 3-way join (one pipeline)") {
    import spark.implicits._
    val dir = freshDir()
    seed(dir)
    Seq((100L, "gold"), (200L, "silver")).toDF("_id", "tier")
      .write.format("graftserver")
      .options(Map("server_dir" -> dir, "ns" -> "db.t"))
      .option("id_column", "_id").mode("append").save()
    // customers reference the tier dim: 10 -> 100, 20 -> 200
    Seq((10L, "alice", 100L), (20L, "bob", 200L), (30L, "carol", 100L))
      .toDF("_id", "name", "tid")
      .write.format("graftserver")
      .options(Map("server_dir" -> dir, "ns" -> "db.ct"))
      .option("id_column", "_id").mode("append").save()
    val oo = o(dir)
    val cc = spark.read.format("graftserver")
      .options(Map("server_dir" -> dir, "ns" -> "db.ct",
        "assume_uniform_storage" -> "true"))
      .schema("_id LONG, name STRING, tid LONG").load()
    val tt = spark.read.format("graftserver")
      .options(Map("server_dir" -> dir, "ns" -> "db.t",
        "assume_uniform_storage" -> "true"))
      .schema("_id LONG, tier STRING").load()
    val q = oo.join(cc, oo("custkey") === cc("_id"))
      .join(tt, cc("tid") === tt("_id"))
      .select($"tier", explode(oo("metrics")))
      .groupBy($"tier", $"key").agg(sum($"value").as("total"))
    val plan = planOf(q)
    assert(plan.contains("PushedUnwind: metrics MAP") &&
      plan.contains("PushedJoin: INNER db.ct") &&
      plan.contains("THEN INNER db.t") &&
      plan.contains("PushedGroupedAggregate"), plan)
    assert(!plan.contains("Generate") && !plan.contains("Join "), plan)
    assert(q.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .sorted.toSeq ==
      Seq(("gold", "a", 1L), ("gold", "b", 2L), ("silver", "b", 3L)))
  }

  test("map explode relocates into a FILE join leg (join stays Spark)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-mjf").toString
    Seq(
      (1L, 10L, Map("a" -> 1L, "b" -> 2L)),
      (2L, 20L, Map("b" -> 3L)),
      (3L, 99L, Map("c" -> 4L)))
      .toDF("_id", "ck", "metrics")
      .write.format("graftbson").option("id_column", "_id")
      .mode("append").save(dir)
    val cdir = Files.createTempDirectory("graft-mjfc").toString
    Seq((10L, "alice"), (20L, "bob")).toDF("_id", "name")
      .write.format("graftbson").option("id_column", "_id")
      .mode("append").save(cdir)
    val oo = spark.read.format("graftbson")
      .schema("_id LONG, ck LONG, metrics MAP<STRING, LONG>").load(dir)
    val cc = spark.read.format("graftbson")
      .schema("_id LONG, name STRING").load(cdir)
    val q = oo.join(cc, oo("ck") === cc("_id"))
      .select($"name", explode(oo("metrics")))
    val plan = planOf(q)
    // the file transport has no $lookup — the JOIN stays Spark, but the
    // kv flatten relocates into the leg's scan (entry rows feed the join)
    assert(!plan.contains("Generate"),
      s"the map unwind must relocate into the file leg:\n$plan")
    assert(plan.contains("PushedUnwind: metrics MAP"), plan)
    assert(q.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .sorted.toSeq ==
      Seq(("alice", "a", 1L), ("alice", "b", 2L), ("bob", "b", 3L)))
  }

  test("row tails THROUGH the pushed map-join: TopN/LIMIT/OFFSET count final kv-joined rows (r17)") {
    import spark.implicits._
    val dir = freshDir()
    seed(dir)
    val oo = o(dir)
    val cc = c(dir)
    // TopN: `$sort`+`$limit` after the pipeline's final `$unwind $__j`
    // counts kv-expanded JOINED rows — the q144 analog for maps; the kv
    // VALUE is a bracket-safe long under uniform storage, so the order
    // key passes the joined-TopN gate. Entry rows: (1,a,1) (1,b,2)
    // (2,b,3) under INNER — values are distinct, the order is total.
    val tq = oo.join(cc, oo("custkey") === cc("_id"))
      .select(oo("_id").as("okey"), $"name", explode(oo("metrics")))
      .orderBy($"value".desc, $"okey".asc)
      .limit(2)
    val tPlan = planOf(tq)
    assert(tPlan.contains("PushedUnwind: metrics MAP") &&
      tPlan.contains("PushedJoin: INNER db.c") &&
      tPlan.contains("PushedTopN: ORDER BY value DESC"), tPlan)
    assert(!tPlan.contains("Generate") && !tPlan.contains("Join "), tPlan)
    assert(tq.collect().map(r => (r.getLong(0), r.getString(1),
      r.getString(2), r.getLong(3))).toSeq ==
      Seq((2L, "bob", "b", 3L), (1L, "alice", "b", 2L)))
    // the kv KEY is a string — string order keys refuse the pushed tail
    // (the bracket gate), rows stay exact through Spark's TakeOrdered
    val kq = oo.join(cc, oo("custkey") === cc("_id"))
      .select(oo("_id").as("okey"), $"name", explode(oo("metrics")))
      .orderBy($"key".asc, $"okey".asc).limit(2)
    assert(!planOf(kq).contains("PushedTopN"), planOf(kq))
    assert(kq.collect().map(r => (r.getString(2), r.getLong(0))).toSeq ==
      Seq(("a", 1L), ("b", 1L)))
    // LIMIT: partial `$limit` on the final joined rows (count parity —
    // the global limit re-applies Spark-side)
    val lq = oo.join(cc, oo("custkey") === cc("_id"))
      .select(oo("_id").as("okey"), explode(oo("metrics")))
      .limit(2)
    val lPlan = planOf(lq)
    assert(lPlan.contains("PushedUnwind: metrics MAP") &&
      lPlan.contains("PushedJoin") && lPlan.contains("PushedLimit: 2"), lPlan)
    assert(lq.count() == 2)
    // OFFSET composes only over a single pipeline (splitter=single) —
    // same rule as the plain joined scan; the map unwind rides along
    val so = o(dir, "splitter" -> "single")
    val oq = so.join(cc, so("custkey") === cc("_id"))
      .select(so("_id").as("okey"), explode(so("metrics")))
      .orderBy($"value".desc, $"okey".asc)
      .offset(1).limit(2)
    val oPlan = planOf(oq)
    // Spark plans ORDER BY + OFFSET + LIMIT over a join as a global
    // TakeOrdered with offset — the pushed TopN tail covers sort+limit,
    // the offset applies Spark-side on the folded rows (exact);
    // a bare OFFSET over the unwound join pushes as `$skip` only on
    // the single-pipeline scan (JoinSampleOffsetSpec pins that form)
    assert(oPlan.contains("PushedUnwind: metrics MAP") &&
      oPlan.contains("PushedJoin"), oPlan)
    assert(oq.collect().map(r => (r.getLong(0), r.getLong(2))).toSeq ==
      Seq((1L, 2L), (1L, 1L)))
  }

  test("refusals: lookup-side map, RIGHT OUTER transpose, map consumed above") {
    import spark.implicits._
    val dir = freshDir()
    seed(dir)
    // lookup-side map: the join may still push, the Generate stays
    val dir2 = freshDir()
    Seq((10L, Map("p" -> 1L)), (20L, Map("q" -> 2L, "r" -> 3L)))
      .toDF("_id", "attrs")
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
      .schema("_id LONG, attrs MAP<STRING, LONG>").load()
    val lk = o2.join(c2, o2("custkey") === c2("_id"))
      .select(o2("_id").as("okey"), explode($"attrs"))
    assert(planOf(lk).contains("Generate"),
      s"lookup-side map must keep Spark's Generate:\n${planOf(lk)}")
    assert(planOf(lk).contains("PushedJoin: INNER db.c2") &&
      !planOf(lk).contains("Join "),
      s"lookup-side map must not forfeit the join push (r17):\n${planOf(lk)}")
    assert(lk.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sorted.toSeq ==
      Seq((1L, "p", 1L), (2L, "q", 2L), (2L, "r", 3L)))

    // RIGHT OUTER: the transpose is unsound — Generate stays
    val oo = o(dir)
    val cc = c(dir)
    val ro = oo.join(cc, oo("custkey") === cc("_id"), "right_outer")
      .select($"name", explode_outer(oo("metrics")))
    assert(planOf(ro).contains("Generate"), planOf(ro))
    // matched pairs explode_outer to 2+1+1+1 rows; carol matches no doc
    // — one null-extended row with null kv
    assert(ro.count() == 6)

    // map consumed ABOVE the explode: one-path constraint refuses the
    // relocation; the join still pushes (r17 retainJoinPush)
    val both = oo.join(cc, oo("custkey") === cc("_id"))
      .select(oo("metrics"), explode(oo("metrics")))
    assert(planOf(both).contains("Generate") &&
      planOf(both).contains("PushedJoin: INNER db.c") &&
      !planOf(both).contains("Join "), planOf(both))
    assert(both.count() == 3)
  }

  test("a nondeterministic peeled conjunct refuses the relocation (scan and join forms)") {
    import spark.implicits._
    val dir = freshDir()
    seed(dir)
    // scan form: Filter(rand < p) below the explode would move from
    // per-PARENT to per-ENTRY evaluation — the peel refuses (ADVICE r15;
    // p stays sub-1.0 so Catalyst cannot fold the predicate away)
    val oo = o(dir)
    val scan = oo.filter(rand(7) < 0.999)
      .select($"_id", explode($"metrics"))
    val scanPlan = planOf(scan)
    assert(scanPlan.contains("Generate") &&
      !scanPlan.contains("PushedUnwind"), scanPlan)
    assert(scan.count() <= 5)

    // join form: the kept conjunct above the join is nondeterministic
    val cc = c(dir)
    val j = oo.join(cc, oo("custkey") === cc("_id"))
      .filter(rand(7) < 0.999)
      .select($"name", explode(oo("metrics")))
    val jPlan = planOf(j)
    assert(jPlan.contains("Generate"), jPlan)
    assert(j.count() <= 3)

    // the ARRAY form refuses identically (same peel, same rule)
    val dir2 = freshDir()
    Seq((1L, Seq("x", "y")), (2L, Seq("z")))
      .toDF("_id", "tags")
      .write.format("graftserver")
      .options(Map("server_dir" -> dir2, "ns" -> "db.a"))
      .option("id_column", "_id").mode("append").save()
    val aa = spark.read.format("graftserver")
      .options(Map("server_dir" -> dir2, "ns" -> "db.a",
        "assume_uniform_storage" -> "true"))
      .schema("_id LONG, tags ARRAY<STRING>").load()
    val arr = aa.filter(rand(7) < 0.999).select($"_id", explode($"tags"))
    val arrPlan = planOf(arr)
    assert(arrPlan.contains("Generate") &&
      !arrPlan.contains("PushedUnwind"), arrPlan)
    assert(arr.count() <= 3)
  }
}
