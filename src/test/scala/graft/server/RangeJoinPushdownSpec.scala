package graft.server

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Inequality/range join pushdown (r17): a join condition of key
  * equalities PLUS attr-vs-attr range comparisons renders as ONE
  * `$lookup` pipeline whose `$expr` carries the ranges — the binned
  * interval / as-of join shape (equi-key on the bin, range residual in
  * the pipeline), never all-pairs. Gated on `assume_uniform_storage`
  * and orderable types on BOTH sides (aggregation `$lt`/`$gt` compare
  * in BSON TOTAL order); null operands never match, mirroring Spark's
  * null comparison, with LEFT OUTER rows null-extending.
  *
  * Parity baselines run over LOCAL copies (no graftserver relation in
  * the baseline plan), so the pushdown cannot mask its own bugs.
  */
class RangeJoinPushdownSpec extends SparkSpec {

  private def freshDir(): String =
    Files.createTempDirectory("graft-range-join").toString

  private def planOf(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  /** events: _id, bkt, v; dims: _id, bkt, lo, hi (per-bin intervals).
    * Some events carry null v; one dim a null lo.
    */
  private def seed(dir: String): Unit = {
    import spark.implicits._
    (0 until 200).map { i =>
      val v: java.lang.Long = if (i % 17 == 0) null else java.lang.Long.valueOf((i * 7) % 100)
      (i.toLong, (i % 5).toLong, v)
    }.toDF("_id", "bkt", "v")
      .write.format("graftserver")
      .options(Map("server_dir" -> dir, "ns" -> "db.e"))
      .option("id_column", "_id").mode("append").save()
    (0 until 15).map { i =>
      val lo: java.lang.Long = if (i == 4) null else java.lang.Long.valueOf((i % 3) * 30)
      (i.toLong, (i % 5).toLong, lo, java.lang.Long.valueOf((i % 3) * 30 + 40))
    }.toDF("_id", "bkt", "lo", "hi")
      .write.format("graftserver")
      .options(Map("server_dir" -> dir, "ns" -> "db.d"))
      .option("id_column", "_id").mode("append").save()
  }

  private def e(dir: String, extra: (String, String)*): DataFrame =
    spark.read.format("graftserver")
      .options(Map("server_dir" -> dir, "ns" -> "db.e",
        "assume_uniform_storage" -> "true") ++ extra)
      .schema("_id LONG, bkt LONG, v LONG").load()

  private def d(dir: String, extra: (String, String)*): DataFrame =
    spark.read.format("graftserver")
      .options(Map("server_dir" -> dir, "ns" -> "db.d",
        "assume_uniform_storage" -> "true") ++ extra)
      .schema("_id LONG, bkt LONG, lo LONG, hi LONG").load()

  private def localCopy(df: DataFrame): DataFrame =
    spark.createDataFrame(
      new java.util.ArrayList(java.util.Arrays.asList(df.collect(): _*)),
      df.schema)

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.toString).sorted.toSeq

  test("binned interval join: equi-key + two ranges push as one $expr pipeline") {
    import spark.implicits._
    val dir = freshDir()
    seed(dir)
    val ee = e(dir)
    val dd = d(dir)
    val q = ee.join(dd,
        ee("bkt") === dd("bkt") && ee("v") >= dd("lo") && ee("v") < dd("hi"))
      .select(ee("_id").as("ekey"), dd("_id").as("dkey"), ee("v"), dd("lo"))
    val plan = planOf(q)
    assert(plan.contains("PushedJoin: INNER db.d"), plan)
    assert(plan.contains(">= lo") && plan.contains("< hi"),
      s"range conjuncts missing from the pushed join:\n$plan")
    assert(!plan.contains("Join ") && !plan.contains("recheck("),
      s"no Spark join / recheck expected:\n$plan")
    val le = localCopy(e(dir)); val ld = localCopy(d(dir))
    val exp = le.join(ld,
        le("bkt") === ld("bkt") && le("v") >= ld("lo") && le("v") < ld("hi"))
      .select(le("_id").as("ekey"), ld("_id").as("dkey"), le("v"), ld("lo"))
    assert(sortedRows(q) == sortedRows(exp))
    assert(q.count() > 0, "fixture must exercise surviving rows")
  }

  test("LEFT OUTER range join: null operands null-extend exactly like Spark") {
    import spark.implicits._
    val dir = freshDir()
    seed(dir)
    val ee = e(dir)
    val dd = d(dir)
    val q = ee.join(dd,
        ee("bkt") === dd("bkt") && ee("v") >= dd("lo") && ee("v") < dd("hi"),
        "left_outer")
      .select(ee("_id").as("ekey"), dd("_id").as("dkey"))
    val plan = planOf(q)
    assert(plan.contains("PushedJoin: LEFT OUTER db.d") &&
      plan.contains(">= lo") && !plan.contains("Join "), plan)
    val le = localCopy(e(dir)); val ld = localCopy(d(dir))
    val exp = le.join(ld,
        le("bkt") === ld("bkt") && le("v") >= ld("lo") && le("v") < ld("hi"),
        "left_outer")
      .select(le("_id").as("ekey"), ld("_id").as("dkey"))
    assert(sortedRows(q) == sortedRows(exp))
    // the null-v events must appear null-extended, not range-matched
    assert(q.filter($"dkey".isNull).count() ==
      exp.filter($"dkey".isNull).count())
    assert(q.filter($"dkey".isNull).count() > 0)
  }

  test("mirrored RIGHT OUTER range join swaps sides and flips ops") {
    import spark.implicits._
    val dir = freshDir()
    seed(dir)
    val dd = d(dir)
    val ee = e(dir)
    val q = dd.join(ee,
        ee("bkt") === dd("bkt") && ee("v") >= dd("lo") && ee("v") < dd("hi"),
        "right_outer")
      .select(ee("_id").as("ekey"), dd("_id").as("dkey"))
    val plan = planOf(q)
    assert(plan.contains("PushedJoin: LEFT OUTER db.d") &&
      !plan.contains("Join "), plan)
    val le = localCopy(e(dir)); val ld = localCopy(d(dir))
    val exp = ld.join(le,
        le("bkt") === ld("bkt") && le("v") >= ld("lo") && le("v") < ld("hi"),
        "right_outer")
      .select(le("_id").as("ekey"), ld("_id").as("dkey"))
    assert(sortedRows(q) == sortedRows(exp))
  }

  test("as-of shape: range join + per-key argmax folds above the pushed pipeline") {
    import spark.implicits._
    val dir = freshDir()
    seed(dir)
    val ee = e(dir)
    val dd = d(dir)
    // latest dim whose [lo, hi) bracket admits the event value — the
    // binned as-of materialization (dims replicated per bin)
    val q = ee.join(dd,
        ee("bkt") === dd("bkt") && ee("v") >= dd("lo") && ee("v") < dd("hi"))
      .groupBy(ee("_id").as("ekey"))
      .agg(max(dd("_id")).as("asof_dim"), count(lit(1)).as("n"))
    val plan = planOf(q)
    assert(plan.contains("PushedJoin: INNER db.d") && !plan.contains("Join "),
      plan)
    val le = localCopy(e(dir)); val ld = localCopy(d(dir))
    val exp = le.join(ld,
        le("bkt") === ld("bkt") && le("v") >= ld("lo") && le("v") < ld("hi"))
      .groupBy(le("_id").as("ekey"))
      .agg(max(ld("_id")).as("asof_dim"), count(lit(1)).as("n"))
    assert(sortedRows(q) == sortedRows(exp))
  }

  test("refusal matrix: non-uniform side, string keys, pure range, OR; arithmetic hoists") {
    import spark.implicits._
    val dir = freshDir()
    seed(dir)
    // non-uniform lookup side: ranges refuse ($expr compares stored
    // values in BSON total order — unsound without the opt-in), and the
    // INNER hoist re-checks the range above a still-pushed equi join
    val ddRaw = spark.read.format("graftserver")
      .options(Map("server_dir" -> dir, "ns" -> "db.d"))
      .schema("_id LONG, bkt LONG, lo LONG, hi LONG").load()
    val ee = e(dir)
    val nu = ee.join(ddRaw, ee("bkt") === ddRaw("bkt") && ee("v") >= ddRaw("lo"))
      .select(ee("_id").as("ekey"), ddRaw("_id").as("dkey"))
    val nuPlan = planOf(nu)
    // the LONG equi key is uniform-gated too, so nothing pushes here —
    // the row population must still be exact via Spark's own join
    assert(!nuPlan.contains("PushedJoin"),
      s"non-uniform side must not push:\n$nuPlan")
    val le = localCopy(e(dir)); val ld = localCopy(d(dir))
    val nuExp = le.join(ld, le("bkt") === ld("bkt") && le("v") >= ld("lo"))
      .select(le("_id").as("ekey"), ld("_id").as("dkey"))
    assert(sortedRows(nu) == sortedRows(nuExp))

    // pure range (no equality): never all-pairs — no pushed join
    val dd = d(dir)
    val pr = ee.join(dd, ee("v") >= dd("lo"))
    assert(!planOf(pr).contains("PushedJoin"), planOf(pr))

    // OR of ranges: not a conjunction — the disjunction never renders
    // into a pushed pipeline (the PushedJoin description, if the equi
    // pushes at all with the OR hoisted, carries no range conjunct)
    val orq = ee.join(dd,
      ee("bkt") === dd("bkt") && (ee("v") >= dd("lo") || ee("v") < dd("hi")))
    assert(!planOf(orq).contains("AND v >= lo"), planOf(orq))

    // STRING range keys refuse (UTF-16 vs UTF-8 order off the ASCII
    // plane); the INNER hoist may still re-check them above
    val dir2 = freshDir()
    Seq((1L, "a", "m"), (2L, "b", "x")).toDF("_id", "k", "s")
      .write.format("graftserver")
      .options(Map("server_dir" -> dir2, "ns" -> "db.sl"))
      .option("id_column", "_id").mode("append").save()
    Seq((1L, "a", "p"), (2L, "b", "c")).toDF("_id", "k", "t")
      .write.format("graftserver")
      .options(Map("server_dir" -> dir2, "ns" -> "db.sr"))
      .option("id_column", "_id").mode("append").save()
    val sl = spark.read.format("graftserver")
      .options(Map("server_dir" -> dir2, "ns" -> "db.sl",
        "assume_uniform_storage" -> "true"))
      .schema("_id LONG, k STRING, s STRING").load()
    val sr = spark.read.format("graftserver")
      .options(Map("server_dir" -> dir2, "ns" -> "db.sr",
        "assume_uniform_storage" -> "true"))
      .schema("_id LONG, k STRING, t STRING").load()
    val sq = sl.join(sr, sl("k") === sr("k") && sl("s") < sr("t"))
      .select(sl("_id").as("a"), sr("_id").as("b"))
    assert(!planOf(sq).contains("AND s < t"),
      s"string range must not render into the pipeline:\n${planOf(sq)}")
    assert(sq.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq ==
      Seq((1L, 1L)))

    // ARITHMETIC cross-side conjunct still hoists to a recheck above a
    // pushed equi join (r14 behavior unchanged by the range arm)
    val ar = ee.join(dd, ee("bkt") === dd("bkt") && ee("v") + dd("lo") > 50L)
      .select(ee("_id").as("ekey"), dd("_id").as("dkey"))
    val arPlan = planOf(ar)
    assert(arPlan.contains("PushedJoin: INNER db.d") &&
      arPlan.contains("recheck(") && !arPlan.contains("Join "), arPlan)
    val arExp = le.join(ld, le("bkt") === ld("bkt") && le("v") + ld("lo") > 50L)
      .select(le("_id").as("ekey"), ld("_id").as("dkey"))
    assert(sortedRows(ar) == sortedRows(arExp))
  }

  test("TIMESTAMP and DATE range keys push under uniform storage (bracket order = read order)") {
    import spark.implicits._
    val dir = freshDir()
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    def dt(s: String) = java.sql.Date.valueOf(s)
    // events at ms-precision wall clocks (BSON datetime stores ms; the
    // engine writes/reads the same ms, so order is exact)
    Seq((1L, 0L, ts("2024-01-01 10:00:00.250"), dt("2024-01-05")),
        (2L, 0L, ts("2024-01-02 09:30:00.0"), dt("2024-01-20")),
        (3L, 0L, null.asInstanceOf[java.sql.Timestamp], dt("2024-01-09")))
      .toDF("_id", "bkt", "t", "day")
      .write.format("graftserver")
      .options(Map("server_dir" -> dir, "ns" -> "db.te"))
      .option("id_column", "_id").mode("append").save()
    Seq((10L, 0L, ts("2024-01-01 00:00:00.0"), ts("2024-01-01 23:59:59.999"),
          dt("2024-01-01"), dt("2024-01-10")),
        (11L, 0L, ts("2024-01-02 00:00:00.0"), ts("2024-01-03 00:00:00.0"),
          dt("2024-01-15"), dt("2024-01-25")))
      .toDF("_id", "bkt", "lo", "hi", "dlo", "dhi")
      .write.format("graftserver")
      .options(Map("server_dir" -> dir, "ns" -> "db.td"))
      .option("id_column", "_id").mode("append").save()
    val ee = spark.read.format("graftserver")
      .options(Map("server_dir" -> dir, "ns" -> "db.te",
        "assume_uniform_storage" -> "true"))
      .schema("_id LONG, bkt LONG, t TIMESTAMP, day DATE").load()
    val dd = spark.read.format("graftserver")
      .options(Map("server_dir" -> dir, "ns" -> "db.td",
        "assume_uniform_storage" -> "true"))
      .schema("_id LONG, bkt LONG, lo TIMESTAMP, hi TIMESTAMP, dlo DATE, dhi DATE")
      .load()
    val q = ee.join(dd, ee("bkt") === dd("bkt") &&
        ee("t") >= dd("lo") && ee("t") < dd("hi"))
      .select(ee("_id").as("ekey"), dd("_id").as("dkey"))
    val plan = planOf(q)
    assert(plan.contains("PushedJoin: INNER db.td") &&
      plan.contains(">= lo") && !plan.contains("Join "), plan)
    // e1 inside dim 10's window; e2 inside dim 11's; null t never joins
    assert(q.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq ==
      Seq((1L, 10L), (2L, 11L)))
    // DATE ranges: canonical midnight millis order = date order
    val dq = ee.join(dd, ee("bkt") === dd("bkt") &&
        ee("day") >= dd("dlo") && ee("day") < dd("dhi"))
      .select(ee("_id").as("ekey"), dd("_id").as("dkey"))
    assert(planOf(dq).contains(">= dlo"), planOf(dq))
    // days 01-05 and 01-09 in [01-01, 01-10); day 01-20 in [01-15, 01-25)
    assert(dq.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq ==
      Seq((1L, 10L), (2L, 11L), (3L, 10L)))
    // parity against local Spark over the SAME served reads
    val le = localCopy(ee); val ld = localCopy(dd)
    val exp = le.join(ld, le("bkt") === ld("bkt") &&
        le("t") >= ld("lo") && le("t") < ld("hi"))
      .select(le("_id").as("ekey"), ld("_id").as("dkey"))
    assert(sortedRows(q) == sortedRows(exp))
  }

  test("NaN range operands follow the SERVER's below-all-numbers rule (documented caveat)") {
    import spark.implicits._
    val dir = freshDir()
    // doubles: e1 real in-bracket, e2 NaN. A real server's total order
    // places NaN BELOW all numbers (the pushed-MIN/MAX caveat's
    // range-join arm) — so NaN >= lo is FALSE and NaN < hi is TRUE,
    // where Spark's own join (NaN above every double) would say the
    // opposite; the fake mirrors the SERVER (LookupJoin.rangeMatches),
    // keeping the sandbox faithful to the live transport. Engine
    // writers emit no NaN; foreign NaN-bearing doubles need a pushed
    // NaN-excluding filter or join pushdown off.
    Seq((1L, 0L, 5.0), (2L, 0L, Double.NaN)).toDF("_id", "bkt", "v")
      .write.format("graftserver")
      .options(Map("server_dir" -> dir, "ns" -> "db.ne"))
      .option("id_column", "_id").mode("append").save()
    Seq((10L, 0L, 0.0, 10.0)).toDF("_id", "bkt", "lo", "hi")
      .write.format("graftserver")
      .options(Map("server_dir" -> dir, "ns" -> "db.nd"))
      .option("id_column", "_id").mode("append").save()
    val ee = spark.read.format("graftserver")
      .options(Map("server_dir" -> dir, "ns" -> "db.ne",
        "assume_uniform_storage" -> "true"))
      .schema("_id LONG, bkt LONG, v DOUBLE").load()
    val dd = spark.read.format("graftserver")
      .options(Map("server_dir" -> dir, "ns" -> "db.nd",
        "assume_uniform_storage" -> "true"))
      .schema("_id LONG, bkt LONG, lo DOUBLE, hi DOUBLE").load()
    val geq = ee.join(dd, ee("bkt") === dd("bkt") && ee("v") >= dd("lo"))
      .select(ee("_id").as("ekey"))
    assert(planOf(geq).contains("PushedJoin"), planOf(geq))
    assert(geq.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L),
      "NaN >= lo must be FALSE under the server's NaN-low order")
    val lt = ee.join(dd, ee("bkt") === dd("bkt") && ee("v") < dd("hi"))
      .select(ee("_id").as("ekey"))
    assert(lt.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L),
      "NaN < hi must be TRUE under the server's NaN-low order")
  }

  test("ASCII-bounded STRING range keys (r18): ascii_columns admits; refusal + fail-loud corners") {
    import spark.implicits._
    val dir = freshDir()
    // docs: bkt + an ASCII string key; dim: per-bkt string brackets
    (0 until 60).map { i =>
      val lang: String = if (i % 11 == 0) null else s"${('a' + i % 20).toChar}x"
      (i.toLong, (i % 3).toLong, lang)
    }.toDF("_id", "bkt", "lang")
      .write.format("graftserver")
      .options(Map("server_dir" -> dir, "ns" -> "db.sd"))
      .option("id_column", "_id").mode("append").save()
    (0 until 6).map(i =>
        (i.toLong, (i % 3).toLong, s"${('a' + (i % 2) * 8).toChar}", s"${('f' + (i % 2) * 8).toChar}"))
      .toDF("_id", "bkt", "s_lo", "s_hi")
      .write.format("graftserver")
      .options(Map("server_dir" -> dir, "ns" -> "db.sb"))
      .option("id_column", "_id").mode("append").save()
    def docs(extra: (String, String)*) = spark.read.format("graftserver")
      .options(Map("server_dir" -> dir, "ns" -> "db.sd",
        "assume_uniform_storage" -> "true") ++ extra)
      .schema("_id LONG, bkt LONG, lang STRING").load()
    def dim(extra: (String, String)*) = spark.read.format("graftserver")
      .options(Map("server_dir" -> dir, "ns" -> "db.sb",
        "assume_uniform_storage" -> "true") ++ extra)
      .schema("_id LONG, bkt LONG, s_lo STRING, s_hi STRING").load()
    val sd = docs("ascii_columns" -> "lang")
    val sb = dim("ascii_columns" -> "s_lo,s_hi")
    val q = sd.join(sb, sd("bkt") === sb("bkt") &&
        sd("lang") >= sb("s_lo") && sd("lang") < sb("s_hi"))
      .select(sd("_id").as("dkey"), sb("_id").as("bkey"), sd("lang"))
    val plan = planOf(q)
    assert(plan.contains("PushedJoin: INNER db.sb") &&
      plan.contains("lang >= s_lo") && plan.contains("lang < s_hi") &&
      !plan.contains("Join ") && !plan.contains("recheck("), plan)
    val ld = localCopy(docs()); val lb = localCopy(dim())
    val exp = ld.join(lb, ld("bkt") === lb("bkt") &&
        ld("lang") >= lb("s_lo") && ld("lang") < lb("s_hi"))
      .select(ld("_id").as("dkey"), lb("_id").as("bkey"), ld("lang"))
    assert(sortedRows(q) == sortedRows(exp))
    assert(q.count() > 0, "the admitted string range join must match rows")
    // null string operands never match (INNER drops) — fixture has them
    assert(ld.filter($"lang".isNull).count() > 0)

    // LEFT OUTER: null/unmatched lang rows null-extend exactly
    val lo = sd.join(sb, sd("bkt") === sb("bkt") &&
        sd("lang") >= sb("s_lo") && sd("lang") < sb("s_hi"), "left_outer")
      .select(sd("_id").as("dkey"), sb("_id").as("bkey"))
    val loExp = ld.join(lb, ld("bkt") === lb("bkt") &&
        ld("lang") >= lb("s_lo") && ld("lang") < lb("s_hi"), "left_outer")
      .select(ld("_id").as("dkey"), lb("_id").as("bkey"))
    assert(sortedRows(lo) == sortedRows(loExp))
    assert(lo.filter($"bkey".isNull).count() > 0)

    // ONE side undeclared -> the string conjunct never enters the
    // pipeline (the r14 hoist may re-check it above the equi join);
    // rows stay exact either way
    val hd = dim()
    val hq = sd.join(hd, sd("bkt") === hd("bkt") &&
        sd("lang") >= hd("s_lo"))
      .select(sd("_id").as("dkey"), hd("_id").as("bkey"))
    val hPlan = planOf(hq)
    assert(!hPlan.contains("lang >= s_lo"), hPlan)
    val hExp = ld.join(lb, ld("bkt") === lb("bkt") &&
        ld("lang") >= lb("s_lo"))
      .select(ld("_id").as("dkey"), lb("_id").as("bkey"))
    assert(sortedRows(hq) == sortedRows(hExp))

    // declared but VIOLATED: non-ASCII stored strings fail loud in the
    // sandbox evaluator (a live server's binary order is Spark-exact
    // regardless — the throw protects sandbox/Spark agreement)
    (0 until 10).map(i => (i.toLong, (i % 3).toLong,
        if (i == 7) "café" else "ok"))
      .toDF("_id", "bkt", "lang")
      .write.format("graftserver")
      .options(Map("server_dir" -> dir, "ns" -> "db.sv"))
      .option("id_column", "_id").mode("append").save()
    val sv = spark.read.format("graftserver")
      .options(Map("server_dir" -> dir, "ns" -> "db.sv",
        "assume_uniform_storage" -> "true", "ascii_columns" -> "lang"))
      .schema("_id LONG, bkt LONG, lang STRING").load()
    val vq = sv.join(sb, sv("bkt") === sb("bkt") &&
        sv("lang") >= sb("s_lo") && sv("lang") < sb("s_hi"))
    assert(planOf(vq).contains("lang >= s_lo"), planOf(vq))
    val err = intercept[Exception] { vq.count() }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: messages(e.getCause))
    assert(messages(err).exists(m =>
      m != null && m.contains("ascii_columns contract violated")), err)
  }

  test("CHAINED range stage pushes (r18): 3-way star with an interval edge stays ONE pipeline") {
    import spark.implicits._
    val dir = freshDir()
    seed(dir)
    Seq((0L, 10L), (1L, 20L), (2L, 30L), (3L, 40L), (4L, 50L))
      .toDF("_id", "w")
      .write.format("graftserver")
      .options(Map("server_dir" -> dir, "ns" -> "db.c3"))
      .option("id_column", "_id").mode("append").save()
    val ee = e(dir)
    val dd = d(dir)
    val cc = spark.read.format("graftserver")
      .options(Map("server_dir" -> dir, "ns" -> "db.c3",
        "assume_uniform_storage" -> "true"))
      .schema("_id LONG, w LONG").load()
    val q = ee.join(dd,
        ee("bkt") === dd("bkt") && ee("v") >= dd("lo") && ee("v") < dd("hi"))
      .join(cc, dd("bkt") === cc("_id") && ee("v") < cc("w"))
      .select(ee("_id").as("ekey"), dd("_id").as("dkey"), cc("w"))
    val plan = planOf(q)
    // r17 refused the stage; since r18 the chain carries its own range
    // conjuncts — the whole 3-way star is ONE pipeline, with the stage's
    // LEFT operands drawn from BOTH origin sides (dd.bkt equi, ee.v
    // range), zero Spark joins
    assert(plan.contains("PushedJoin: INNER db.d") &&
      plan.contains(">= lo"), plan)
    assert(plan.contains("THEN INNER db.c3") && plan.contains("v < w") &&
      !plan.contains("Join "), plan)
    val le = localCopy(e(dir)); val ld = localCopy(d(dir))
    val lc = localCopy(cc)
    val exp = le.join(ld,
        le("bkt") === ld("bkt") && le("v") >= ld("lo") && le("v") < ld("hi"))
      .join(lc, ld("bkt") === lc("_id") && le("v") < lc("w"))
      .select(le("_id").as("ekey"), ld("_id").as("dkey"), lc("w"))
    assert(sortedRows(q) == sortedRows(exp))
    assert(q.count() > 0, "the chained range join must match rows")

    // LEFT OUTER chained range stage: unmatched driving rows null-extend
    // exactly like Spark's null comparison (guard fails -> preserveNull)
    val lo = ee.join(dd,
        ee("bkt") === dd("bkt") && ee("v") >= dd("lo") && ee("v") < dd("hi"))
      .join(cc, dd("bkt") === cc("_id") && ee("v") < cc("w"), "left_outer")
      .select(ee("_id").as("ekey"), dd("_id").as("dkey"), cc("w"))
    val loPlan = planOf(lo)
    assert(loPlan.contains("THEN LEFT OUTER db.c3") &&
      loPlan.contains("v < w") && !loPlan.contains("Join "), loPlan)
    val loExp = le.join(ld,
        le("bkt") === ld("bkt") && le("v") >= ld("lo") && le("v") < ld("hi"))
      .join(lc, ld("bkt") === lc("_id") && le("v") < lc("w"), "left_outer")
      .select(le("_id").as("ekey"), ld("_id").as("dkey"), lc("w"))
    assert(sortedRows(lo) == sortedRows(loExp))
    assert(lo.filter($"w".isNull).count() == loExp.filter($"w".isNull).count())
    assert(lo.filter($"w".isNull).count() > 0,
      "fixture must exercise null-extended chain rows")

    // a STRING range key on the chain still refuses the STAGE (UTF-16
    // matcher vs binary order off the ASCII plane — the r17 gate, see
    // the ascii_columns opt-in for the admitted case); the base
    // pipeline stays pushed, Spark joins the chained collection above
    Seq((0L, "m"), (1L, "q"), (2L, "b"), (3L, "t"), (4L, "z"))
      .toDF("_id", "s")
      .write.format("graftserver")
      .options(Map("server_dir" -> dir, "ns" -> "db.c3s"))
      .option("id_column", "_id").mode("append").save()
    val cs = spark.read.format("graftserver")
      .options(Map("server_dir" -> dir, "ns" -> "db.c3s",
        "assume_uniform_storage" -> "true"))
      .schema("_id LONG, s STRING").load()
    // tag is a STORED string on the driving side, so the chain's lp
    // carries it as a plain attribute — the refusal below is the
    // rangeKeySafe STRING gate itself, not a projection-shape fallback
    (0 until 40).map(i => (i.toLong, (i % 5).toLong, (i * 7 % 100).toLong,
        s"t${i % 9}"))
      .toDF("_id", "bkt", "v", "tag")
      .write.format("graftserver")
      .options(Map("server_dir" -> dir, "ns" -> "db.e2"))
      .option("id_column", "_id").mode("append").save()
    val eeS = spark.read.format("graftserver")
      .options(Map("server_dir" -> dir, "ns" -> "db.e2",
        "assume_uniform_storage" -> "true"))
      .schema("_id LONG, bkt LONG, v LONG, tag STRING").load()
    val sq = eeS.join(dd,
        eeS("bkt") === dd("bkt") && eeS("v") >= dd("lo"))
      .join(cs, dd("bkt") === cs("_id") && eeS("tag") < cs("s"))
      .select(eeS("_id").as("ekey"), cs("s"))
    val sPlan = planOf(sq)
    // the string RANGE conjunct never enters the pipeline (rangeKeySafe
    // refuses strings) — but the r14 hoist still pushes the chain on
    // its equi key and RE-CHECKS the string comparison Spark-side over
    // decoded values (sound under INNER; Spark semantics exactly)
    assert(sPlan.contains("PushedJoin: INNER db.d") &&
      sPlan.contains("THEN INNER db.c3s") &&
      !sPlan.contains("tag < s") && // the ON-clause spelling (exprId-free)
      sPlan.contains("recheck((tag"), sPlan)
    val lcs = localCopy(cs)
    val les = localCopy(eeS)
    val sExp = les.join(ld, les("bkt") === ld("bkt") && les("v") >= ld("lo"))
      .join(lcs, ld("bkt") === lcs("_id") && les("tag") < lcs("s"))
      .select(les("_id").as("ekey"), lcs("s"))
    assert(sortedRows(sq) == sortedRows(sExp))
    assert(sq.count() > 0)
  }
}
