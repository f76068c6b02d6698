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
