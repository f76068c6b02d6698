package graft.server

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** MAP explode pushdown (r15): `explode(mapCol)` over a graft scan
  * becomes the scan's `$objectToArray`+`$unwind` directive — one kv
  * entry doc per field crosses the decode, the key/value columns read
  * `__graft_kv.k/.v` through column_mapping, key/value filters render
  * as the POST-unwind `$match`, and GROUP BY key folds in ONE pipeline
  * per namespace. BSON has no map type: a map<string, V> column stores
  * as a SUBDOCUMENT (the MongoDB convention for dynamic keys), so this
  * also pins the r15 MapType codec. The map unwind DRIVES pushed joins
  * too (the kv value as the join key), and row-count/-order tails
  * (LIMIT/TopN/OFFSET) ride the unwound ROW pipeline counting kv ENTRY
  * rows (r16). Refusals: non-document storage at the path (fail-loud,
  * the `$objectToArray` rule), string order keys (bracket gate).
  */
class MapUnwindSpec extends SparkSpec {

  private def freshDir(): String = Files.createTempDirectory("graft-muw").toString

  private def seed(dir: String, ns: String = "db.docs"): Unit = {
    import spark.implicits._
    Seq(
      (1L, Map("en" -> 3L, "fr" -> 5L)),
      (2L, Map("de" -> 9L)),
      (3L, Map.empty[String, Long]),
      (4L, null.asInstanceOf[Map[String, Long]]))
      .toDF("_id", "langs")
      .write.format("graftserver")
      .options(Map("server_dir" -> dir, "ns" -> ns))
      .option("id_column", "_id").mode("append").save()
  }

  private def t(dir: String, extra: (String, String)*): DataFrame =
    spark.read.format("graftserver")
      .options(Map("server_dir" -> dir, "ns" -> "db.docs") ++ extra)
      .schema("_id LONG, langs MAP<STRING, LONG>").load()

  test("map columns round-trip as subdocuments (r15 MapType codec)") {
    import spark.implicits._
    val dir = freshDir()
    seed(dir)
    val back = t(dir).collect().map(r =>
      r.getLong(0) -> Option(r.getMap[String, Long](1)).map(_.toMap)).toMap
    assert(back == Map(
      1L -> Some(Map("en" -> 3L, "fr" -> 5L)),
      2L -> Some(Map("de" -> 9L)),
      3L -> Some(Map.empty[String, Long]),
      4L -> None))
  }

  test("explode(map) becomes PushedUnwind MAP; explode_outer keeps empty/null parents") {
    import spark.implicits._
    val dir = freshDir()
    seed(dir)
    val e = t(dir).select($"_id", explode($"langs"))
    val plan = e.queryExecution.executedPlan.toString
    assert(plan.contains("PushedUnwind: langs MAP"), plan)
    assert(!plan.contains("Generate"), s"no Spark Generate expected:\n$plan")
    assert(e.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sorted.toSeq ==
      Seq((1L, "en", 3L), (1L, "fr", 5L), (2L, "de", 9L)))

    val eo = t(dir).select($"_id", explode_outer($"langs"))
    assert(eo.queryExecution.executedPlan.toString
      .contains("PushedUnwind: langs MAP OUTER"))
    val rows = eo.collect().map(r => (r.getLong(0),
      Option(r.getString(1)).getOrElse("∅"))).sorted.toSeq
    assert(rows == Seq((1L, "en"), (1L, "fr"), (2L, "de"), (3L, "∅"), (4L, "∅")),
      rows)
  }

  test("key/value filters are the POST-unwind match; GROUP BY key folds in ONE pipeline") {
    import spark.implicits._
    val dir = freshDir()
    seed(dir)
    val f = t(dir, "assume_uniform_storage" -> "true")
      .select($"_id", explode($"langs"))
      .filter($"key" === "en" && $"value" >= 3L)
    val fPlan = f.queryExecution.executedPlan.toString
    assert(fPlan.contains("PushedUnwind: langs MAP") &&
      fPlan.contains("PostUnwindMatch:") &&
      fPlan.contains("__graft_kv.k"), fPlan)
    assert(f.collect().map(r => (r.getLong(0), r.getLong(2))).toSeq ==
      Seq((1L, 3L)))

    CountingServerFactory.reset()
    val g = t(dir, "assume_uniform_storage" -> "true",
        "client_factory" -> classOf[CountingServerFactory].getName)
      .select(explode($"langs"))
      .groupBy($"key").agg(sum($"value").as("total"))
    val gPlan = g.queryExecution.executedPlan.toString
    assert(gPlan.contains("PushedGroupedAggregate: GROUP BY __graft_kv.k") &&
      gPlan.contains("PushedUnwind: langs MAP"), gPlan)
    assert(g.collect().map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("en" -> 3L, "fr" -> 5L, "de" -> 9L))
    assert(CountingServerFactory.count("groupAggregate") == 1 &&
      CountingServerFactory.count("find") == 0,
      s"one pipeline round-trip: ${CountingServerFactory.snapshot()}")
  }

  test("posexplode(map): entry indices ride includeArrayIndex on the kv unwind") {
    import spark.implicits._
    val dir = freshDir()
    seed(dir)
    val p = t(dir).select($"_id", posexplode($"langs"))
    val plan = p.queryExecution.executedPlan.toString
    assert(plan.contains("PushedUnwind: langs MAP") &&
      !plan.contains("Generate"), plan)
    // entry order = document field order = Spark's map iteration order
    assert(p.collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3)))
      .sorted.toSeq ==
      Seq((1L, 0, "en", 3L), (1L, 1, "fr", 5L), (2L, 0, "de", 9L)))
    // pos filters push as the post-unwind match; outer parents keep a
    // NULL pos
    val f = t(dir).select($"_id", posexplode($"langs")).filter($"pos" === 1)
    assert(f.collect().map(r => (r.getLong(0), r.getString(2))).toSeq ==
      Seq((1L, "fr")), f.queryExecution.executedPlan.toString)
    val po = t(dir).select($"_id", posexplode_outer($"langs"))
    val rows = po.collect().map(r =>
      (r.getLong(0), if (r.isNullAt(1)) -1 else r.getInt(1))).sorted.toSeq
    assert(rows == Seq((1L, 0), (1L, 1), (2L, 0), (3L, -1), (4L, -1)), rows)
  }

  test("a map NESTED under a struct explodes through the same directive (r16 pin)") {
    import spark.implicits._
    val dir = freshDir()
    Seq((1L, ("x1", Map("a" -> 1L, "b" -> 2L))), (2L, ("x2", Map("c" -> 3L))))
      .toDF("_id", "raw")
      .select($"_id", struct($"raw._1".as("tag"), $"raw._2".as("metrics")).as("meta"))
      .write.format("graftserver")
      .options(Map("server_dir" -> dir, "ns" -> "db.nm"))
      .option("id_column", "_id").mode("append").save()
    val q = spark.read.format("graftserver")
      .options(Map("server_dir" -> dir, "ns" -> "db.nm"))
      .schema("_id LONG, meta STRUCT<tag: STRING, metrics: MAP<STRING, LONG>>")
      .load()
      .select($"_id", explode($"meta.metrics"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedUnwind: meta.metrics MAP") &&
      !plan.contains("Generate"), plan)
    assert(q.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sorted.toSeq ==
      Seq((1L, "a", 1L), (1L, "b", 2L), (2L, "c", 3L)))
  }

  test("duplicate map keys refuse the write (subdocuments cannot carry them)") {
    import spark.implicits._
    val dir = freshDir()
    // map_from_arrays can mint duplicate keys Spark never deduplicates —
    // a silent last-wins collapse would change explode() cardinality
    // after the round-trip
    val dup = Seq(1L).toDF("_id")
      .select($"_id", map_from_arrays(
        array(lit("a"), lit("a")), array(lit(1L), lit(2L))).as("langs"))
    // Spark's own map-construction guard (DUPLICATED_MAP_KEY, default
    // mapKeyDedupPolicy=EXCEPTION) fires first here; the codec guard is
    // defense-in-depth for maps arriving from storage formats Spark
    // does not re-check on read
    val ex = intercept[Throwable] {
      dup.write.format("graftserver")
        .options(Map("server_dir" -> dir, "ns" -> "db.dup"))
        .option("id_column", "_id").mode("append").save()
    }
    val msg = String.valueOf(ex) + String.valueOf(ex.getCause)
    assert(msg.toLowerCase.contains("duplicate"), msg)
  }

  test("an ARRAY unwind keeps a genuine parent column named __graft_kv (no map injection)") {
    import spark.implicits._
    val dir = freshDir()
    // the kv field is synthetic ONLY under a MAP unwind; an array
    // unwind over a collection that happens to store __graft_kv must
    // project and decode it verbatim (r15 review fix: the projection
    // filter was unconditional and nulled it)
    Seq((1L, 7L, Seq("x", "y")), (2L, 8L, Seq("z")))
      .toDF("_id", "__graft_kv", "tags")
      .write.format("graftserver")
      .options(Map("server_dir" -> dir, "ns" -> "db.kvp"))
      .option("id_column", "_id").mode("append").save()
    val q = spark.read.format("graftserver")
      .options(Map("server_dir" -> dir, "ns" -> "db.kvp"))
      .schema("_id LONG, __graft_kv LONG, tags ARRAY<STRING>").load()
      .select($"_id", $"__graft_kv", explode($"tags").as("tag"))
    assert(q.queryExecution.executedPlan.toString.contains("PushedUnwind"),
      q.queryExecution.executedPlan.toString)
    assert(q.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sorted.toSeq ==
      Seq((1L, 7L, "x"), (1L, 7L, "y"), (2L, 8L, "z")))
  }

  test("non-document storage at the map path throws ($objectToArray fail-loud rule)") {
    import spark.implicits._
    val dir = freshDir()
    seed(dir)
    Seq((9L, "scalar")).toDF("_id", "langs")
      .write.format("graftserver")
      .options(Map("server_dir" -> dir, "ns" -> "db.docs"))
      .option("id_column", "_id").mode("append").save()
    val e = t(dir).select($"_id", explode($"langs"))
    val ex = intercept[org.apache.spark.SparkException] { e.collect() }
    assert(ex.getCause != null &&
      String.valueOf(ex.getCause.getMessage).contains("$objectToArray"),
      String.valueOf(ex.getCause))
  }

  test("map unwind DRIVES the pushed join (value as key); entry tails push (r16); parent sample composes") {
    import spark.implicits._
    val dir = freshDir()
    seed(dir)
    Seq((3L, "three"), (9L, "nine")).toDF("_id", "lname")
      .write.format("graftserver")
      .options(Map("server_dir" -> dir, "ns" -> "db.dim"))
      .option("id_column", "_id").mode("append").save()
    val dim = spark.read.format("graftserver")
      .options(Map("server_dir" -> dir, "ns" -> "db.dim",
        "assume_uniform_storage" -> "true"))
      .schema("_id LONG, lname STRING").load()
    // the kv VALUE as the join key: `$objectToArray` + `$unwind` +
    // `$lookup` in ONE pipeline; the INNER key non-null prune joins the
    // post-unwind match (__graft_kv exists only after the unwind)
    val e = t(dir, "assume_uniform_storage" -> "true")
      .select($"_id".as("okey"), explode($"langs"))
    val j = e.join(dim, e("value") === dim("_id"))
      .select($"okey", $"key", $"lname")
    val jPlan = j.queryExecution.executedPlan.toString
    assert(jPlan.contains("PushedUnwind: langs MAP") &&
      jPlan.contains("PushedJoin: INNER db.dim"), jPlan)
    assert(!jPlan.contains("Generate") && !jPlan.contains("Join "), jPlan)
    assert(j.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sorted.toSeq == Seq((1L, "en", "three"), (2L, "de", "nine")))

    // pushed tails compose (r16): the unwound ROW pipeline renders
    // $objectToArray+$unwind before the $sort/$skip/$limit tail —
    // LIMIT/TopN count kv ENTRY rows, one pipeline per namespace
    val top = t(dir, "assume_uniform_storage" -> "true")
      .select($"_id", explode($"langs"))
      .orderBy($"value".desc).limit(1)
    val topPlan = top.queryExecution.executedPlan.toString
    assert(topPlan.contains("UnwoundTails") && topPlan.contains("PushedTopN"),
      topPlan)
    assert(top.collect().map(r => (r.getLong(0), r.getLong(2))).toSeq ==
      Seq((2L, 9L)))
    // a LIMIT tail counts entries (3 kv entries across parents 1-2)
    val lim = t(dir).select(explode($"langs")).limit(2)
    assert(lim.queryExecution.executedPlan.toString.contains("UnwoundTails"),
      lim.queryExecution.executedPlan.toString)
    assert(lim.count() == 2)
    // OFFSET: single-pipeline $skip over entry rows
    val off = t(dir, "splitter" -> "single", "assume_uniform_storage" -> "true")
      .select($"_id", explode($"langs"))
      .orderBy($"value".asc).offset(1).limit(2)
    assert(off.collect().map(r => (r.getLong(0), r.getLong(2))).toSeq ==
      Seq((1L, 5L), (2L, 9L)))
    // a STRING order key still refuses (four storage brackets) — the
    // mapKv gate no longer blocks, the bracket gate still does
    val topK = t(dir, "assume_uniform_storage" -> "true")
      .select($"_id", explode($"langs"))
      .orderBy($"key".asc).limit(1)
    assert(!topK.queryExecution.executedPlan.toString.contains("PushedTopN"))
    assert(topK.collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((2L, "de")))

    // a parent-keyed deterministic sample stays parent-atomic
    val s = t(dir, "sample_key" -> "_id")
      .sample(withReplacement = false, 0.5, seed = 3L)
      .select($"_id", explode($"langs"))
    val sPlan = s.queryExecution.executedPlan.toString
    assert(sPlan.contains("PushedSample") &&
      sPlan.contains("PushedUnwind: langs MAP") &&
      !sPlan.contains("Sample ("), sPlan)
    val all = t(dir).select($"_id", explode($"langs")).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    val kept = s.collect().groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    assert(kept.forall { case (id, n) => all(id) == n },
      s"parent atomicity: kept=$kept all=$all")
  }
}
