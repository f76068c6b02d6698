package graft.operators

import graft.SparkSpec

import java.nio.file.Files

/** Adversarial user-skew for the behavior family: one celebrity user
  * holds ~97% of all events. q72's window partitioning and q73's
  * per-user hash aggregate must stay CORRECT under the skew (a single
  * user's events always land in one task — bounded by per-user volume,
  * the semantics-required co-location), and the reference answers are
  * computed independently here, not via the oracle (the synthetic
  * fixture lives outside the driver's testdata).
  */
class BehaviorSkewSpec extends SparkSpec {

  private def writeSkewedEvents(): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-skew-events").toString
    val day = 86400L * 1000000000L // ns
    val hot = (0 until 30000).map { i =>
      // user 1 cycles view/click/purchase every 3 events, one per hour
      val t = (i.toLong * 3600L * 1000000000L) + 1000000000L
      val ty = Seq("view", "click", "purchase")(i % 3)
      (i.toLong, t, 1L, ty, 1.0, "{}")
    }
    val cold = (0 until 10).flatMap { u =>
      Seq(
        (100000L + u * 3, day * (u + 1) + 1000000000L, 2L + u, "view", 1.0, "{}"),
        (100001L + u * 3, day * (u + 1) + 2000000000L, 2L + u, "click", 1.0, "{}"),
        (100002L + u * 3, day * (u + 40) + 3000000000L, 2L + u, "purchase", 1.0, "{}"))
    }
    (hot ++ cold)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(8)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("q72 funnel is exact under extreme single-user skew") {
    val dir = writeSkewedEvents()
    val out = Catalog.byName("q72_funnel").run(spark, dir).collect().head
    // 11 users; all viewed; user 1 converts within minutes; cold users
    // click within a day (inside the 7-day horizon) but purchase at
    // day*40+ (outside it)
    assert(out.getAs[Long]("n_users") === 11L)
    assert(out.getAs[Long]("n_viewed") === 11L)
    assert(out.getAs[Long]("n_clicked") === 11L)
    assert(out.getAs[Long]("n_purchased") === 1L)
  }

  test("q73 retention is exact under extreme single-user skew") {
    val dir = writeSkewedEvents()
    val rows = Catalog.byName("q73_retention").run(spark, dir).collect()
    // user 1's 30 000 hourly events span 1250 days ≈ 179 active weeks,
    // all in cohort week 0 of the epoch range; every (cohort, offset)
    // count must be ≥1 and user 1's cohort must contribute exactly one
    // user per offset (n_active counts users, not events)
    val u1Cohort = rows.filter(_.getAs[Long]("week_offset") > 60L)
    assert(u1Cohort.nonEmpty, "the hot user's long tail of weeks must appear")
    assert(u1Cohort.forall(_.getAs[Long]("n_active") === 1L),
      "event volume must not inflate user counts")
    val total = rows.map(_.getAs[Long]("n_active")).sum
    // hot user: one row per active week; cold users: 2 weeks each
    assert(total > 150L && total < 250L, s"implausible total $total")
  }

  test("q18 bucketed sessionize matches the naive lag replay, incl. exact-gap edges") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-sess-events").toString
    // hand-placed edges: gap EXACTLY 1800 (no break), 1801 (break),
    // same-bucket small gaps, adjacent-bucket small gap (no break),
    // bucket-skipping gap (break); plus a pseudo-random tail
    val crafted = Seq(
      0L, 1799L,          // same bucket
      1801L,              // adjacent bucket, gap 2 <= 1800: no break
      3601L,              // gap 1800 exactly: NO break
      5402L,              // gap 1801: break
      12000L)             // far bucket: break
    val rand = (0 until 300).map(i =>
      (graft.functions.Md5Util.prefix60(
        org.apache.spark.unsafe.types.UTF8String.fromString(s"t:$i"))
        % 200000L).toLong)
    val evs = (crafted.map((1L, _)) ++ rand.map((2L, _))).zipWithIndex.map {
      case ((u, sec), i) => (i.toLong, sec * 1000000000L, u, "view", 1.0, "{}")
    }
    evs.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(8)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    // naive replay: the original lag rule
    val expected = evs.groupBy(_._3).map { case (u, rows) =>
      val secs = rows.sortBy(r => (r._2, r._1)).map(_._2 / 1000000000L)
      val breaks = 1 + secs.sliding(2).count {
        case Seq(a, b) => b - a > 1800L
        case _ => false
      }
      u -> (breaks.toLong, secs.size.toLong)
    }
    val out = Catalog.byName("q18_sessionize").run(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out == expected, s"got $out expected $expected")
    assert(out(1L) == ((3L, 6L)), "crafted edges: exactly 3 sessions")
  }

  test("q38 bucketed as-of matches the naive last-purchase replay") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-asof-events").toString
    // pseudo-random interleaving of purchases and clicks across many
    // 1800-s buckets, two users, including same-second ties
    val evs = (0 until 400).map { i =>
      val u = (i % 2).toLong + 1L
      val sec = (graft.functions.Md5Util.prefix60(
        org.apache.spark.unsafe.types.UTF8String.fromString(s"a:$i"))
        % 40000L).toLong
      val ty = if (i % 5 == 0) "purchase" else "click"
      (i.toLong, sec * 1000000000L, u, ty, 1.0, "{}")
    }
    evs.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(8)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    // naive replay: sort by (ts, event_id) per user, track last purchase
    val expected = evs.groupBy(_._3).flatMap { case (_, rows) =>
      var lastP: Option[Long] = None
      rows.sortBy(r => (r._2, r._1)).flatMap { r =>
        if (r._4 == "purchase") { lastP = Some(r._2); None }
        else Some(r._1 -> lastP)
      }
    }
    val out = Catalog.byName("q38_asof_event").run(spark, dir).collect()
      .map(r => r.getLong(0) ->
        Option(r.getTimestamp(3)).map(_.getTime * 1000000L)).toMap // ms -> ns
    val exp = expected.toMap // already ns
    assert(out.size == exp.size)
    exp.foreach { case (e, p) =>
      assert(out(e) == p, s"event $e: got ${out(e)} expected $p")
    }
  }

  test("q114 disorder audit matches an independent local replay") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-disorder-events").toString
    // deliberately out-of-order timestamps so the jittered arrival order
    // produces real disorder; two users so the partitioning matters
    val evs = (0 until 400).map { i =>
      val uid = (i % 2).toLong + 1L
      val secs = ((i / 2) * 30L + (if (i % 10 == 3) -120L else 0L)).max(0L)
      (i.toLong, secs * 1000000000L, uid,
        Seq("view", "click")(i % 2), 1.0, "{}")
    }
    evs.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(8)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    // local replay with the same portable jitter
    def arr(e: Long): Long =
      e + (graft.functions.Md5Util.prefix60(
        org.apache.spark.unsafe.types.UTF8String.fromString(s"arr:$e")) % 7) - 3
    val expected = evs.groupBy(_._3).values.flatMap { rows =>
      var hwm = Long.MinValue
      rows.sortBy(r => (arr(r._1), r._1)).map { r =>
        val sec = r._2 / 1000000000L
        hwm = math.max(hwm, sec)
        (r._4, hwm - sec)
      }
    }.toSeq.groupBy(_._1).map { case (ty, ls) =>
      ty -> (ls.size.toLong, ls.count(_._2 > 0).toLong,
        ls.count(_._2 > 60).toLong, ls.map(_._2).max)
    }
    val out = Catalog.byName("q114_disorder_audit").run(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out == expected, s"got $out expected $expected")
    assert(out.values.exists(_._2 > 0), "fixture must exhibit disorder")
  }
}
