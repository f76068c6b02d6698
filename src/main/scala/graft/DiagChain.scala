package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement main for the r13 join-pipeline additions: times the
  * 3-way CHAINED `$lookup` (q143 shape) and the TopN-through-join
  * (q144 shape) PUSHED vs UNPUSHED on the SAME session and fixtures by
  * toggling the optimizer conf ([[GraftConf.JoinPushdownConf]]) — the
  * r12 ledger protocol. Fixtures are built once; only the read side is
  * timed (min-of-3, count() sink). On the fake transport a `$lookup`
  * probe pays a full store scan per split, so the pushed advantage
  * UNDERSTATES a real server's (index walk per driving doc vs shipping
  * all three collections through Spark exchanges).
  */
object DiagChain {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftConf.tuned(SparkSession.builder())
      .master("local[32]").appName("DiagChain")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")

    val dir = java.nio.file.Files.createTempDirectory("graft-diagchain").toString
    val base = Map("server_dir" -> dir)
    Tables.orders(spark, sf)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .write.format("graftserver").options(base ++ Map("ns" -> "db.ord3"))
      .option("id_column", "o_orderkey").mode("append").save()
    Tables.customer(spark, sf)
      .select($"c_custkey", $"c_nationkey")
      .write.format("graftserver").options(base ++ Map("ns" -> "db.cust3"))
      .option("id_column", "c_custkey").mode("append").save()
    Tables.nation(spark, sf)
      .select($"n_nationkey", $"n_name")
      .write.format("graftserver").options(base ++ Map("ns" -> "db.nat3"))
      .option("id_column", "n_nationkey").mode("append").save()

    def chainQuery() = {
      val o = spark.read.format("graftserver")
        .options(base ++ Map("ns" -> "db.ord3", "assume_uniform_storage" -> "true"))
        .schema("_id LONG, o_custkey LONG, o_totalprice DOUBLE").load()
      val c = spark.read.format("graftserver")
        .options(base ++ Map("ns" -> "db.cust3", "assume_uniform_storage" -> "true"))
        .schema("_id LONG, c_nationkey INT").load()
      val n = spark.read.format("graftserver")
        .options(base ++ Map("ns" -> "db.nat3"))
        .schema("_id INT, n_name STRING").load()
      o.join(c, o("o_custkey") === c("_id"))
        .join(n, c("c_nationkey") === n("_id"))
        .filter(o("o_totalprice") > 500.0)
        .groupBy($"n_name")
        .agg(count(lit(1)).as("n_orders"), max(o("o_totalprice")).as("mx"))
    }

    def topnQuery() = {
      val o = spark.read.format("graftserver")
        .options(base ++ Map("ns" -> "db.ord3", "assume_uniform_storage" -> "true"))
        .option("split_size", (4L * 1024 * 1024).toString)
        .schema("_id LONG, o_custkey LONG, o_totalprice DOUBLE").load()
      val c = spark.read.format("graftserver")
        .options(base ++ Map("ns" -> "db.cust3", "assume_uniform_storage" -> "true"))
        .schema("_id LONG, c_nationkey INT").load()
      o.join(c, o("o_custkey") === c("_id"))
        .select(o("_id").as("okey"), $"o_totalprice".as("price"), $"c_nationkey")
        .orderBy($"price".desc, $"okey".asc).limit(25)
    }

    def time(label: String)(mk: => org.apache.spark.sql.DataFrame): Double = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val n = mk.count()
        val dt = (System.nanoTime() - t0) / 1e9
        require(n > 0, s"$label returned 0 rows")
        dt
      }
      val best = runs.min
      println(f"[diagchain] $label%-22s min=${best}%.3f s  runs=${runs.map(r => f"$r%.3f").mkString(", ")}")
      best
    }

    spark.conf.set(GraftConf.JoinPushdownConf, "true")
    val planChain = chainQuery().queryExecution.executedPlan.toString
    require(planChain.contains("THEN INNER"), s"chain did not push:\n$planChain")
    val pushedChain = time("chain PUSHED")(chainQuery())
    val pushedTopn = time("join-topn PUSHED")(topnQuery())

    spark.conf.set(GraftConf.JoinPushdownConf, "false")
    val unpushedChain = time("chain UNPUSHED")(chainQuery())
    val unpushedTopn = time("join-topn UNPUSHED")(topnQuery())

    println(f"[diagchain] chain ratio unpushed/pushed = ${unpushedChain / pushedChain}%.2f")
    println(f"[diagchain] topn  ratio unpushed/pushed = ${unpushedTopn / pushedTopn}%.2f")

    // ---- skew twin (gate discipline): 90% of driving rows on ONE join
    // key. The pushed join has no Spark-side shuffle a hot key could
    // serialize — the $lookup probes per driving doc — so skewed vs
    // uniform must stay within the noise band.
    spark.conf.set(GraftConf.JoinPushdownConf, "true")
    val nOrders = Tables.orders(spark, sf).count()
    val skewed = Tables.orders(spark, sf)
      .select($"o_orderkey",
        when(rand(7) < 0.9, lit(1L)).otherwise($"o_custkey").as("o_custkey"),
        $"o_totalprice")
    skewed.write.format("graftserver").options(base ++ Map("ns" -> "db.ordskew"))
      .option("id_column", "o_orderkey").mode("append").save()
    def skewQuery(ns: String) = {
      val o = spark.read.format("graftserver")
        .options(base ++ Map("ns" -> ns, "assume_uniform_storage" -> "true"))
        .option("split_size", (4L * 1024 * 1024).toString)
        .schema("_id LONG, o_custkey LONG, o_totalprice DOUBLE").load()
      val c = spark.read.format("graftserver")
        .options(base ++ Map("ns" -> "db.cust3", "assume_uniform_storage" -> "true"))
        .schema("_id LONG, c_nationkey INT").load()
      o.join(c, o("o_custkey") === c("_id"))
        .groupBy($"c_nationkey").agg(count(lit(1)).as("n"))
    }
    val uniformT = time("join grouped UNIFORM")(skewQuery("db.ord3"))
    val skewT = time("join grouped SKEWED")(skewQuery("db.ordskew"))
    println(f"[diagchain] skew/uniform ratio = ${skewT / uniformT}%.2f over $nOrders driving rows")

    // ---- r14 arms: residual-recheck join, sampled join, $unwind ----

    def recheckQuery() = {
      val o = spark.read.format("graftserver")
        .options(base ++ Map("ns" -> "db.ord3", "assume_uniform_storage" -> "true"))
        .option("split_size", (4L * 1024 * 1024).toString)
        .schema("_id LONG, o_custkey LONG, o_totalprice DOUBLE").load()
      val c = spark.read.format("graftserver")
        .options(base ++ Map("ns" -> "db.cust3", "assume_uniform_storage" -> "true"))
        .schema("_id LONG, c_nationkey INT").load()
      // a both-sides arithmetic residual: pre-r14 this forfeited the
      // pushed join entirely
      o.join(c, o("o_custkey") === c("_id"))
        .filter(o("o_totalprice") + c("c_nationkey").cast("double") > 500.0)
        .groupBy($"c_nationkey").agg(count(lit(1)).as("n"))
    }
    def sampledJoinQuery() = {
      val o = spark.read.format("graftserver")
        .options(base ++ Map("ns" -> "db.ord3",
          "assume_uniform_storage" -> "true", "sample_key" -> "_id"))
        .option("split_size", (4L * 1024 * 1024).toString)
        .schema("_id LONG, o_custkey LONG, o_totalprice DOUBLE").load()
        .sample(withReplacement = false, 0.2, seed = 7L)
      val c = spark.read.format("graftserver")
        .options(base ++ Map("ns" -> "db.cust3", "assume_uniform_storage" -> "true"))
        .schema("_id LONG, c_nationkey INT").load()
      o.join(c, o("o_custkey") === c("_id"))
        .groupBy($"c_nationkey").agg(count(lit(1)).as("n"))
    }

    spark.conf.set(GraftConf.JoinPushdownConf, "true")
    val planRe = recheckQuery().queryExecution.executedPlan.toString
    require(planRe.contains("PushedJoin") && planRe.contains("recheck("),
      s"recheck join did not push:\n$planRe")
    val pushedRe = time("recheck-join PUSHED")(recheckQuery())
    val planSj = sampledJoinQuery().queryExecution.executedPlan.toString
    require(planSj.contains("PushedJoin") && planSj.contains("PushedSample"),
      s"sampled join did not push:\n$planSj")
    val pushedSj = time("sampled-join PUSHED")(sampledJoinQuery())
    spark.conf.set(GraftConf.JoinPushdownConf, "false")
    val unpushedRe = time("recheck-join UNPUSHED")(recheckQuery())
    val unpushedSj = time("sampled-join UNPUSHED")(sampledJoinQuery())
    println(f"[diagchain] recheck ratio unpushed/pushed = ${unpushedRe / pushedRe}%.2f")
    println(f"[diagchain] sampled ratio unpushed/pushed = ${unpushedSj / pushedSj}%.2f")
    // recheck skew twin: the added Spark-side filter is row-wise, no
    // shuffle for a hot key to serialize
    spark.conf.set(GraftConf.JoinPushdownConf, "true")
    def recheckSkew(ns: String) = {
      val o = spark.read.format("graftserver")
        .options(base ++ Map("ns" -> ns, "assume_uniform_storage" -> "true"))
        .option("split_size", (4L * 1024 * 1024).toString)
        .schema("_id LONG, o_custkey LONG, o_totalprice DOUBLE").load()
      val c = spark.read.format("graftserver")
        .options(base ++ Map("ns" -> "db.cust3", "assume_uniform_storage" -> "true"))
        .schema("_id LONG, c_nationkey INT").load()
      o.join(c, o("o_custkey") === c("_id"))
        .filter(o("o_totalprice") + c("c_nationkey").cast("double") > 500.0)
        .groupBy($"c_nationkey").agg(count(lit(1)).as("n"))
    }
    val reUniT = time("recheck skew UNIFORM")(recheckSkew("db.ord3"))
    val reSkwT = time("recheck skew SKEWED")(recheckSkew("db.ordskew"))
    println(f"[diagchain] recheck skew/uniform ratio = ${reSkwT / reUniT}%.2f")

    // $unwind grouped: one pipeline vs Spark-side Generate + shuffle
    Tables.documents(spark, sf)
      .select($"doc_id", $"n_chars", array($"lang", $"source").as("tags"))
      .write.format("graftserver")
      .options(base ++ Map("ns" -> "db.uwdiag"))
      .option("id_column", "doc_id").mode("append").save()
    def unwindQuery() = {
      val t = spark.read.format("graftserver")
        .options(base ++ Map("ns" -> "db.uwdiag", "assume_uniform_storage" -> "true"))
        .schema("_id LONG, n_chars LONG, tags ARRAY<STRING>").load()
      t.filter($"n_chars" > 100L).select(explode($"tags").as("tag"))
        .groupBy($"tag").agg(count(lit(1)).as("n"))
    }
    spark.conf.set(graft.plans.UnwindRelocate.ConfKey, "true")
    val planUw = unwindQuery().queryExecution.executedPlan.toString
    require(planUw.contains("PushedUnwind") && planUw.contains("PushedGroupedAggregate"),
      s"unwind+group did not push:\n$planUw")
    val pushedUw = time("unwind-group PUSHED")(unwindQuery())
    spark.conf.set(graft.plans.UnwindRelocate.ConfKey, "false")
    val unpushedUw = time("unwind-group UNPUSHED")(unwindQuery())
    spark.conf.set(graft.plans.UnwindRelocate.ConfKey, "true")
    println(f"[diagchain] unwind  ratio unpushed/pushed = ${unpushedUw / pushedUw}%.2f")

    // $unwind TAIL (r14 session 2): element filter + ORDER BY LIMIT as
    // ONE $match+$unwind+$match+$sort+$limit pipeline (unwoundRead) vs
    // Spark-side Generate + filter + TakeOrdered over shipped arrays
    def unwindTopnQuery() = {
      val t = spark.read.format("graftserver")
        .options(base ++ Map("ns" -> "db.uwdiag", "assume_uniform_storage" -> "true"))
        .schema("_id LONG, n_chars LONG, tags ARRAY<STRING>").load()
      t.select($"_id", $"n_chars", explode($"tags").as("tag"))
        .filter($"tag" >= "c" && $"tag" < "t")
        .orderBy($"n_chars".desc, $"_id".desc).limit(50)
        .select($"_id", $"n_chars")
    }
    val planUt = unwindTopnQuery().queryExecution.executedPlan.toString
    require(planUt.contains("UnwoundTails") && planUt.contains("PostUnwindMatch"),
      s"unwound tail did not push:\n$planUt")
    val pushedUt = time("unwind-topn PUSHED")(unwindTopnQuery())
    spark.conf.set(graft.plans.UnwindRelocate.ConfKey, "false")
    val unpushedUt = time("unwind-topn UNPUSHED")(unwindTopnQuery())
    spark.conf.set(graft.plans.UnwindRelocate.ConfKey, "true")
    println(f"[diagchain] unwind-topn ratio unpushed/pushed = ${unpushedUt / pushedUt}%.2f")

    // ---- r15 arms: $unwind composed INTO the pushed join (q162
    // shape), the sampled 3-way chain (hidden key), and the
    // unwind-over-join skew twin ----

    Tables.orders(spark, sf)
      .select($"o_orderkey", $"o_custkey",
        array($"o_orderpriority", $"o_orderstatus").as("tags"))
      .write.format("graftserver")
      .options(base ++ Map("ns" -> "db.uwjord"))
      .option("id_column", "o_orderkey").mode("append").save()
    def unwindJoinQuery() = {
      val o = spark.read.format("graftserver")
        .options(base ++ Map("ns" -> "db.uwjord", "assume_uniform_storage" -> "true"))
        .option("split_size", (4L * 1024 * 1024).toString)
        .schema("_id LONG, o_custkey LONG, tags ARRAY<STRING>").load()
      val c = spark.read.format("graftserver")
        .options(base ++ Map("ns" -> "db.cust3", "assume_uniform_storage" -> "true"))
        .schema("_id LONG, c_nationkey INT").load()
      o.join(c, o("o_custkey") === c("_id"))
        .select($"c_nationkey", explode(o("tags")).as("tag"))
        .groupBy($"c_nationkey", $"tag").agg(count(lit(1)).as("n"))
    }
    spark.conf.set(GraftConf.JoinPushdownConf, "true")
    val planUj = unwindJoinQuery().queryExecution.executedPlan.toString
    require(planUj.contains("PushedUnwind") && planUj.contains("PushedJoin") &&
      planUj.contains("PushedGroupedAggregate"),
      s"unwind-over-join did not push:\n$planUj")
    val pushedUj = time("unwind-join PUSHED")(unwindJoinQuery())
    // half-pushed: the JOIN still pushes but the flattened rows ship
    // through a Spark Generate + exchange — the r14 state of this shape
    spark.conf.set(graft.plans.UnwindRelocate.ConfKey, "false")
    val halfUj = time("unwind-join JOIN-ONLY")(unwindJoinQuery())
    // fully unpushed: Spark join + Generate + exchange
    spark.conf.set(GraftConf.JoinPushdownConf, "false")
    val unpushedUj = time("unwind-join UNPUSHED")(unwindJoinQuery())
    spark.conf.set(GraftConf.JoinPushdownConf, "true")
    spark.conf.set(graft.plans.UnwindRelocate.ConfKey, "true")
    println(f"[diagchain] unwind-join ratio join-only/pushed = ${halfUj / pushedUj}%.2f")
    println(f"[diagchain] unwind-join ratio unpushed/pushed  = ${unpushedUj / pushedUj}%.2f")

    // sampled 3-way chain: the hidden __sampleN carry keeps the whole
    // pipeline (r14 fell back to a Spark join of the sampled base)
    def sampledChainQuery() = {
      val o = spark.read.format("graftserver")
        .options(base ++ Map("ns" -> "db.ord3",
          "assume_uniform_storage" -> "true", "sample_key" -> "_id"))
        .option("split_size", (4L * 1024 * 1024).toString)
        .schema("_id LONG, o_custkey LONG, o_totalprice DOUBLE").load()
        .sample(withReplacement = false, 0.2, seed = 7L)
      val c = spark.read.format("graftserver")
        .options(base ++ Map("ns" -> "db.cust3", "assume_uniform_storage" -> "true"))
        .schema("_id LONG, c_nationkey INT").load()
      val n = spark.read.format("graftserver")
        .options(base ++ Map("ns" -> "db.nat3"))
        .schema("_id INT, n_name STRING").load()
      o.join(c, o("o_custkey") === c("_id"))
        .join(n, c("c_nationkey") === n("_id"))
        .groupBy($"n_name").agg(count(lit(1)).as("n"))
    }
    val planSc = sampledChainQuery().queryExecution.executedPlan.toString
    require(planSc.contains("THEN INNER") &&
      planSc.contains("PushedSample: SAMPLE(__sample"),
      s"sampled chain did not keep the pushed pipeline:\n$planSc")
    val pushedSc = time("sampled-chain PUSHED")(sampledChainQuery())
    spark.conf.set(GraftConf.JoinPushdownConf, "false")
    val unpushedSc = time("sampled-chain UNPUSHED")(sampledChainQuery())
    spark.conf.set(GraftConf.JoinPushdownConf, "true")
    println(f"[diagchain] sampled-chain ratio unpushed/pushed = ${unpushedSc / pushedSc}%.2f")

    // unwind-over-join skew twin: 90% of driving rows on ONE join key —
    // the pushed pipeline has no Spark-side shuffle a hot key could
    // serialize, and the $unwind multiplies rows uniformly per parent
    Tables.orders(spark, sf)
      .select($"o_orderkey",
        when(rand(7) < 0.9, lit(1L)).otherwise($"o_custkey").as("o_custkey"),
        array($"o_orderpriority", $"o_orderstatus").as("tags"))
      .write.format("graftserver")
      .options(base ++ Map("ns" -> "db.uwjskew"))
      .option("id_column", "o_orderkey").mode("append").save()
    def unwindJoinSkew(ns: String) = {
      val o = spark.read.format("graftserver")
        .options(base ++ Map("ns" -> ns, "assume_uniform_storage" -> "true"))
        .option("split_size", (4L * 1024 * 1024).toString)
        .schema("_id LONG, o_custkey LONG, tags ARRAY<STRING>").load()
      val c = spark.read.format("graftserver")
        .options(base ++ Map("ns" -> "db.cust3", "assume_uniform_storage" -> "true"))
        .schema("_id LONG, c_nationkey INT").load()
      o.join(c, o("o_custkey") === c("_id"))
        .select($"c_nationkey", explode(o("tags")).as("tag"))
        .groupBy($"c_nationkey", $"tag").agg(count(lit(1)).as("n"))
    }
    val ujUniT = time("unwind-join UNIFORM")(unwindJoinSkew("db.uwjord"))
    val ujSkwT = time("unwind-join SKEWED")(unwindJoinSkew("db.uwjskew"))
    println(f"[diagchain] unwind-join skew/uniform ratio = ${ujSkwT / ujUniT}%.2f")

    // ---- r16 arm: MAP explode composed INTO the pushed join (q166
    // shape) — the $objectToArray+$unwind+$lookup+$group pipeline vs
    // join-only (kv rows ship through a Spark Generate) vs unpushed ----
    Tables.orders(spark, sf)
      .select($"o_orderkey", $"o_custkey",
        map(lit("pri"), ($"o_totalprice" % 97L).cast("long"),
          lit("qty"), ($"o_orderkey" % 89L)).as("metrics"))
      .write.format("graftserver")
      .options(base ++ Map("ns" -> "db.mwjord"))
      .option("id_column", "o_orderkey").mode("append").save()
    def mapJoinQuery() = {
      val o = spark.read.format("graftserver")
        .options(base ++ Map("ns" -> "db.mwjord", "assume_uniform_storage" -> "true"))
        .option("split_size", (4L * 1024 * 1024).toString)
        .schema("_id LONG, o_custkey LONG, metrics MAP<STRING, LONG>").load()
      val c = spark.read.format("graftserver")
        .options(base ++ Map("ns" -> "db.cust3", "assume_uniform_storage" -> "true"))
        .schema("_id LONG, c_nationkey INT").load()
      o.join(c, o("o_custkey") === c("_id"))
        .select($"c_nationkey", explode(o("metrics")))
        .filter($"value" >= 10L)
        .groupBy($"c_nationkey", $"key").agg(count(lit(1)).as("n"),
          sum($"value").as("total"))
    }
    spark.conf.set(GraftConf.JoinPushdownConf, "true")
    val planMj = mapJoinQuery().queryExecution.executedPlan.toString
    require(planMj.contains("PushedUnwind") && planMj.contains(" MAP") &&
      planMj.contains("PushedJoin") && planMj.contains("PushedGroupedAggregate"),
      s"map-over-join did not push:\n$planMj")
    val pushedMj = time("map-join PUSHED")(mapJoinQuery())
    spark.conf.set(graft.plans.UnwindRelocate.ConfKey, "false")
    val halfMj = time("map-join JOIN-ONLY")(mapJoinQuery())
    spark.conf.set(GraftConf.JoinPushdownConf, "false")
    val unpushedMj = time("map-join UNPUSHED")(mapJoinQuery())
    spark.conf.set(GraftConf.JoinPushdownConf, "true")
    spark.conf.set(graft.plans.UnwindRelocate.ConfKey, "true")
    println(f"[diagchain] map-join ratio join-only/pushed = ${halfMj / pushedMj}%.2f")
    println(f"[diagchain] map-join ratio unpushed/pushed  = ${unpushedMj / pushedMj}%.2f")

    // map-join skew twin: 90% of driving rows on ONE join key — the
    // pushed pipeline has no Spark-side shuffle a hot key could
    // serialize, and the kv expansion is uniform per parent
    Tables.orders(spark, sf)
      .select($"o_orderkey",
        when(rand(11) < 0.9, lit(1L)).otherwise($"o_custkey").as("o_custkey"),
        map(lit("pri"), ($"o_totalprice" % 97L).cast("long"),
          lit("qty"), ($"o_orderkey" % 89L)).as("metrics"))
      .write.format("graftserver")
      .options(base ++ Map("ns" -> "db.mwjskew"))
      .option("id_column", "o_orderkey").mode("append").save()
    def mapJoinSkew(ns: String) = {
      val o = spark.read.format("graftserver")
        .options(base ++ Map("ns" -> ns, "assume_uniform_storage" -> "true"))
        .option("split_size", (4L * 1024 * 1024).toString)
        .schema("_id LONG, o_custkey LONG, metrics MAP<STRING, LONG>").load()
      val c = spark.read.format("graftserver")
        .options(base ++ Map("ns" -> "db.cust3", "assume_uniform_storage" -> "true"))
        .schema("_id LONG, c_nationkey INT").load()
      o.join(c, o("o_custkey") === c("_id"))
        .select($"c_nationkey", explode(o("metrics")))
        .groupBy($"c_nationkey", $"key").agg(count(lit(1)).as("n"))
    }
    val planMjSkew = mapJoinSkew("db.mwjskew").queryExecution.executedPlan.toString
    require(planMjSkew.contains("PushedUnwind") && planMjSkew.contains(" MAP") &&
      planMjSkew.contains("PushedJoin"),
      s"map-join skew twin did not push:\n$planMjSkew")
    val mjUniT = time("map-join UNIFORM")(mapJoinSkew("db.mwjord"))
    val mjSkwT = time("map-join SKEWED")(mapJoinSkew("db.mwjskew"))
    println(f"[diagchain] map-join skew/uniform ratio = ${mjSkwT / mjUniT}%.2f")

    // ---- r17 arm: RANGE join pushdown — the binned interval join as
    // ONE $lookup pipeline whose $expr carries the range conjuncts
    // (q170 shape) vs the Spark join. The skew twin pins 90% of
    // driving rows on ONE bin key; the pushed pipeline has no
    // Spark-side exchange a hot key could serialize. ----
    Tables.orders(spark, sf)
      .select($"o_orderkey", ($"o_custkey" % 16L).as("bkt"),
        ($"o_totalprice" % 512L).cast("long").as("v"))
      .write.format("graftserver")
      .options(base ++ Map("ns" -> "db.rjord"))
      .option("id_column", "o_orderkey").mode("append").save()
    Tables.orders(spark, sf)
      .select($"o_orderkey",
        when(rand(13) < 0.9, lit(1L)).otherwise($"o_custkey" % 16L).as("bkt"),
        ($"o_totalprice" % 512L).cast("long").as("v"))
      .write.format("graftserver")
      .options(base ++ Map("ns" -> "db.rjskew"))
      .option("id_column", "o_orderkey").mode("append").save()
    spark.range(0, 16L * 6).select($"id".as("_id"), ($"id" % 16L).as("bkt"),
        ($"id" / 16L * 96L).cast("long").as("lo"),
        ($"id" / 16L * 96L + 144L).cast("long").as("hi"))
      .write.format("graftserver")
      .options(base ++ Map("ns" -> "db.rjdim"))
      .option("id_column", "_id").mode("append").save()
    def rangeJoinQuery(ns: String) = {
      val o = spark.read.format("graftserver")
        .options(base ++ Map("ns" -> ns, "assume_uniform_storage" -> "true"))
        .option("split_size", (4L * 1024 * 1024).toString)
        .schema("_id LONG, bkt LONG, v LONG").load()
      val dm = spark.read.format("graftserver")
        .options(base ++ Map("ns" -> "db.rjdim", "assume_uniform_storage" -> "true"))
        .schema("_id LONG, bkt LONG, lo LONG, hi LONG").load()
      o.join(dm, o("bkt") === dm("bkt") && o("v") >= dm("lo") && o("v") < dm("hi"))
        .groupBy(o("bkt").as("b"), dm("lo").as("lo"))
        .agg(count(lit(1)).as("n"), sum(o("v")).as("total"))
    }
    spark.conf.set(GraftConf.JoinPushdownConf, "true")
    val planRj = rangeJoinQuery("db.rjord").queryExecution.executedPlan.toString
    require(planRj.contains("PushedJoin") && planRj.contains(">= lo") &&
      planRj.contains("< hi") && planRj.contains("PushedGroupedAggregate"),
      s"range join did not push:\n$planRj")
    val pushedRj = time("range-join PUSHED")(rangeJoinQuery("db.rjord"))
    spark.conf.set(GraftConf.JoinPushdownConf, "false")
    val unpushedRj = time("range-join UNPUSHED")(rangeJoinQuery("db.rjord"))
    spark.conf.set(GraftConf.JoinPushdownConf, "true")
    println(f"[diagchain] range-join ratio unpushed/pushed = ${unpushedRj / pushedRj}%.2f")
    val planRjSkew = rangeJoinQuery("db.rjskew").queryExecution.executedPlan.toString
    require(planRjSkew.contains("PushedJoin") && planRjSkew.contains(">= lo"),
      s"range-join skew twin did not push:\n$planRjSkew")
    val rjUniT = time("range-join UNIFORM")(rangeJoinQuery("db.rjord"))
    val rjSkwT = time("range-join SKEWED")(rangeJoinQuery("db.rjskew"))
    println(f"[diagchain] range-join skew/uniform ratio = ${rjSkwT / rjUniT}%.2f")

    // ---- r17 arm: COMPUTED bin keys — groupBy(pmod(col, n)) as ONE
    // $match+$set+$group pipeline (q173 shape) vs the Spark aggregate
    // over shipped rows; the derived-bin JOIN rides the same absorb. ----
    def computedGroupQuery() = {
      val o = spark.read.format("graftserver")
        .options(base ++ Map("ns" -> "db.rjord", "assume_uniform_storage" -> "true"))
        .option("split_size", (4L * 1024 * 1024).toString)
        .schema("_id LONG, bkt LONG, v LONG").load()
      o.withColumn("vb", pmod($"v", lit(97L)))
        .groupBy($"vb").agg(count(lit(1)).as("n"), sum($"v").as("total"))
    }
    spark.conf.set(graft.plans.ComputedKeyRelocate.ConfKey, "true")
    val planCk = computedGroupQuery().queryExecution.executedPlan.toString
    require(planCk.contains("PushedComputed") &&
      planCk.contains("PushedGroupedAggregate"),
      s"computed-bin group did not push:\n$planCk")
    val pushedCk = time("computed-group PUSHED")(computedGroupQuery())
    spark.conf.set(graft.plans.ComputedKeyRelocate.ConfKey, "false")
    val unpushedCk = time("computed-group UNPUSHED")(computedGroupQuery())
    spark.conf.set(graft.plans.ComputedKeyRelocate.ConfKey, "true")
    println(f"[diagchain] computed-group ratio unpushed/pushed = ${unpushedCk / pushedCk}%.2f")

    // ---- r16 arm: the UNGROUPED, UNFILTERED explode-over-join — the
    // one shape where nothing bounds the element rows server-side, so
    // the pushed pipeline ships parent/right columns once per ELEMENT.
    // Since r17 the transpose-off state IS true join-only for ARRAYS
    // too: retainJoinPush deletes InferFiltersFromGenerate's array
    // conjuncts under the retained Generate, so the `$lookup` stays
    // pushed and only the flatten runs in Spark (the `require` below
    // pins PushedJoin + Generate). The fake has no wire, so read the
    // ratio as a shape probe, not a verdict on wide parents. ----
    def ungroupedJoinQuery() = {
      val o = spark.read.format("graftserver")
        .options(base ++ Map("ns" -> "db.uwjord", "assume_uniform_storage" -> "true"))
        .option("split_size", (4L * 1024 * 1024).toString)
        .schema("_id LONG, o_custkey LONG, tags ARRAY<STRING>").load()
      val c = spark.read.format("graftserver")
        .options(base ++ Map("ns" -> "db.cust3", "assume_uniform_storage" -> "true"))
        .schema("_id LONG, c_nationkey INT").load()
      o.join(c, o("o_custkey") === c("_id"))
        .select(o("_id").as("okey"), $"c_nationkey", explode(o("tags")).as("tag"))
    }
    spark.conf.set(GraftConf.JoinPushdownConf, "true")
    spark.conf.set(graft.plans.UnwindRelocate.ConfKey, "true")
    val planUg = ungroupedJoinQuery().queryExecution.executedPlan.toString
    require(planUg.contains("PushedUnwind") && planUg.contains("PushedJoin"),
      s"nogroup-join did not push:\n$planUg")
    val pushedUg = time("nogroup-join PUSHED")(ungroupedJoinQuery())
    spark.conf.set(graft.plans.UnwindRelocate.JoinConfKey, "false")
    val planUgOff = ungroupedJoinQuery().queryExecution.executedPlan.toString
    require(planUgOff.contains("Generate") && !planUgOff.contains("PushedUnwind") &&
      planUgOff.contains("PushedJoin") && !planUgOff.contains("Join "),
      s"reloc-off arm is not TRUE join-only (r17):\n$planUgOff")
    val halfUg = time("nogroup-join JOIN-ONLY")(ungroupedJoinQuery())
    spark.conf.set(GraftConf.JoinPushdownConf, "false")
    val unpushedUg = time("nogroup-join UNPUSHED")(ungroupedJoinQuery())
    spark.conf.set(GraftConf.JoinPushdownConf, "true")
    spark.conf.set(graft.plans.UnwindRelocate.JoinConfKey, "true")
    println(f"[diagchain] nogroup-join ratio join-only/pushed = ${halfUg / pushedUg}%.2f")
    println(f"[diagchain] nogroup-join ratio unpushed/pushed  = ${unpushedUg / pushedUg}%.2f")

    // ---- r18 arm: DATE-function bins — the treasury-canonical
    // groupBy(year(date), month(date)) as ONE $match+$set{$year,$month}+
    // $group pipeline (q175 shape) vs the Spark aggregate over shipped
    // rows. Same absorb mechanism as the pmod arm; the date fns are the
    // calendar-exact renderings. ----
    Tables.orders(spark, sf)
      .select($"o_orderkey", $"o_custkey", $"o_orderdate")
      .write.format("graftserver")
      .options(base ++ Map("ns" -> "db.dbord"))
      .option("id_column", "o_orderkey").mode("append").save()
    def dateBinQuery() = {
      val o = spark.read.format("graftserver")
        .options(base ++ Map("ns" -> "db.dbord", "assume_uniform_storage" -> "true"))
        .option("split_size", (4L * 1024 * 1024).toString)
        .schema("_id LONG, o_custkey LONG, o_orderdate TIMESTAMP").load()
      o.groupBy(year($"o_orderdate").as("y"), month($"o_orderdate").as("m"))
        .agg(count(lit(1)).as("n"), sum($"o_custkey").as("total"))
    }
    spark.conf.set(graft.plans.ComputedKeyRelocate.ConfKey, "true")
    val planDb = dateBinQuery().queryExecution.executedPlan.toString
    require(planDb.contains("= year(o_orderdate)") &&
      planDb.contains("= month(o_orderdate)") &&
      planDb.contains("PushedGroupedAggregate"),
      s"date-bin group did not push:\n$planDb")
    val pushedDb = time("date-bin-group PUSHED")(dateBinQuery())
    spark.conf.set(graft.plans.ComputedKeyRelocate.ConfKey, "false")
    val unpushedDb = time("date-bin-group UNPUSHED")(dateBinQuery())
    spark.conf.set(graft.plans.ComputedKeyRelocate.ConfKey, "true")
    println(f"[diagchain] date-bin-group ratio unpushed/pushed = ${unpushedDb / pushedDb}%.2f")

    // ---- r18 arm: RANGE conjuncts through a CHAINED $lookup stage —
    // the 3-way star with one interval edge (q177 shape) as ONE
    // pipeline vs the r17 state (base pushed, chained collection joined
    // Spark-side) vs fully unpushed. The nation-bracket dim keys the
    // chain on c_nationkey with an o_totalprice [lo, hi) interval. ----
    spark.range(0, 25L * 4).select($"id".as("_id"),
        ($"id" % 25L).cast("int").as("nk"),
        ($"id" / 25L * 120000L).cast("double").as("lo"),
        ($"id" / 25L * 120000L + 180000L).cast("double").as("hi"))
      .write.format("graftserver")
      .options(base ++ Map("ns" -> "db.nkbr"))
      .option("id_column", "_id").mode("append").save()
    def chainRangeQuery() = {
      val o = spark.read.format("graftserver")
        .options(base ++ Map("ns" -> "db.ord3", "assume_uniform_storage" -> "true"))
        .option("split_size", (4L * 1024 * 1024).toString)
        .schema("_id LONG, o_custkey LONG, o_totalprice DOUBLE").load()
      val c = spark.read.format("graftserver")
        .options(base ++ Map("ns" -> "db.cust3", "assume_uniform_storage" -> "true"))
        .schema("_id LONG, c_nationkey INT").load()
      val br = spark.read.format("graftserver")
        .options(base ++ Map("ns" -> "db.nkbr", "assume_uniform_storage" -> "true"))
        .schema("_id LONG, nk INT, lo DOUBLE, hi DOUBLE").load()
      o.join(c, o("o_custkey") === c("_id"))
        .join(br, c("c_nationkey") === br("nk") &&
          o("o_totalprice") >= br("lo") && o("o_totalprice") < br("hi"))
        .groupBy($"nk", br("lo").as("lo"))
        .agg(count(lit(1)).as("n"))
    }
    spark.conf.set(GraftConf.JoinPushdownConf, "true")
    val planCr = chainRangeQuery().queryExecution.executedPlan.toString
    require(planCr.contains("THEN INNER db.nkbr") &&
      planCr.contains(">= lo") && planCr.contains("< hi") &&
      !planCr.contains("Join "),
      s"chained range did not push:\n$planCr")
    val pushedCr = time("chain-range PUSHED")(chainRangeQuery())
    spark.conf.set(GraftConf.JoinPushdownConf, "false")
    val unpushedCr = time("chain-range UNPUSHED")(chainRangeQuery())
    spark.conf.set(GraftConf.JoinPushdownConf, "true")
    println(f"[diagchain] chain-range ratio unpushed/pushed = ${unpushedCr / pushedCr}%.2f")
    spark.stop()
  }
}
