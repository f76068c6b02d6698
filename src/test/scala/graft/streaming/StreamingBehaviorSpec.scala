package graft.streaming

import graft.SparkSpec
import GraftStreaming.{FunnelEvent, FunnelProgress}

/** Streaming funnel (q72's streaming analog): converges to the batch
  * window-min triple under out-of-order arrival across micro-batches,
  * including the chained-stage case a running min cannot handle (a late,
  * earlier view re-qualifying clicks that predate the old first view).
  */
class StreamingBehaviorSpec extends SparkSpec {

  /** Batch reference semantics (same as q72's window mins). */
  private def ref(evs: Seq[FunnelEvent]): (Option[Long], Option[Long], Option[Long]) = {
    val fv = evs.filter(_.eventType == "view").map(_.sec).minOption
    val fc = fv.flatMap(v =>
      evs.filter(e => e.eventType == "click" && e.sec >= v).map(_.sec).minOption)
    val fp = fc.flatMap(c =>
      evs.filter(e => e.eventType == "purchase" && e.sec >= c).map(_.sec).minOption)
    (fv, fc, fp)
  }

  private def lastPerUser(rows: Seq[FunnelProgress]): Map[Long, (Option[Long], Option[Long], Option[Long])] =
    rows.zipWithIndex
      .groupBy(_._1.userId)
      .map { case (u, rs) =>
        val last = rs.maxBy(_._2)._1
        u -> (last.fv, last.fc, last.fp)
      }

  test("streamingFunnel converges to the batch triple under out-of-order arrival") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val input = MemoryStream[FunnelEvent]
    val q = GraftStreaming.streamingFunnel(input.toDS())
      .writeStream.format("memory").queryName("funnel_progress")
      .outputMode(OutputMode.Append()).start()

    // user 1: in-order view -> click -> purchase, split across batches
    // user 2: click arrives BEFORE any view; the view lands in a later
    //         batch with an EARLIER ts, re-qualifying the buffered click
    // user 3: purchase before click before view, all one batch, reversed
    // user 4: views only — funnel stalls at fv
    val all = Seq(
      FunnelEvent(1, "view", 100), FunnelEvent(1, "click", 150),
      FunnelEvent(1, "purchase", 250),
      FunnelEvent(2, "click", 120), FunnelEvent(2, "purchase", 300),
      FunnelEvent(2, "view", 80),
      FunnelEvent(3, "purchase", 90), FunnelEvent(3, "click", 60),
      FunnelEvent(3, "view", 10),
      FunnelEvent(4, "view", 500), FunnelEvent(4, "view", 400))

    input.addData(
      FunnelEvent(1, "view", 100), FunnelEvent(1, "click", 150),
      FunnelEvent(2, "click", 120),
      FunnelEvent(3, "purchase", 90), FunnelEvent(3, "click", 60),
      FunnelEvent(3, "view", 10),
      FunnelEvent(4, "view", 500))
    q.processAllAvailable()
    input.addData(
      FunnelEvent(1, "purchase", 250),
      FunnelEvent(2, "purchase", 300), FunnelEvent(2, "view", 80),
      FunnelEvent(4, "view", 400))
    q.processAllAvailable()
    q.stop()

    val emitted = spark.table("funnel_progress").as[FunnelProgress].collect().toSeq
    val finals = lastPerUser(emitted)
    for (u <- Seq(1L, 2L, 3L, 4L))
      assert(finals(u) === ref(all.filter(_.userId == u)), s"user $u")
    // user 2's first batch (click+purchase, no view yet) is NOT progress —
    // the buffered events must emit nothing until the late view lands,
    // then resolve in a single emission
    assert(emitted.count(_.userId == 2L) === 1)
  }

  test("streamingFunnel stage reports are exact under buffer eviction") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val input = MemoryStream[FunnelEvent]
    // cap of 2: user 5 gets 4 clicks before the view arrives; the two
    // EARLIEST are retained, and the view (ts 5) re-qualifies the
    // retained min — which is also the true batch answer, since eviction
    // only drops later timestamps
    val q = GraftStreaming.streamingFunnel(input.toDS(), bufferCap = 2)
      .writeStream.format("memory").queryName("funnel_cap")
      .outputMode(OutputMode.Append()).start()
    input.addData(
      FunnelEvent(5, "click", 40), FunnelEvent(5, "click", 20),
      FunnelEvent(5, "click", 30), FunnelEvent(5, "click", 10))
    q.processAllAvailable()
    input.addData(FunnelEvent(5, "view", 5))
    q.processAllAvailable()
    q.stop()

    val finals = lastPerUser(
      spark.table("funnel_cap").as[FunnelProgress].collect().toSeq)
    assert(finals(5L) === ((Some(5L), Some(10L), None)))
  }

  test("streamingCohorts corrects the whole assignment when a late earlier week lands") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import GraftStreaming.{CohortAssignment, CohortEvent}
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val input = MemoryStream[CohortEvent]
    val q = GraftStreaming.streamingCohorts(input.toDS(), maxOffsetWeeks = 4)
      .writeStream.format("memory").queryName("cohort_updates")
      .outputMode(OutputMode.Append()).start()
    // weeks as epoch-day multiples of 7 for readability
    input.addData(CohortEvent(1, 700), CohortEvent(1, 714), CohortEvent(2, 707))
    q.processAllAvailable()
    // late earlier week for user 1: cohort moves 714->700... then ->686,
    // every offset re-derives; duplicate week for user 2: no emission
    input.addData(CohortEvent(1, 686), CohortEvent(2, 707))
    q.processAllAvailable()
    // horizon: week 686 + 4*7 = 714 retained; 721+ would be dropped
    input.addData(CohortEvent(1, 721))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("cohort_updates").as[CohortAssignment].collect().toSeq
    val u1 = rows.filter(_.userId == 1L)
    assert(u1.map(a => (a.cohortWeekDays, a.offsets)) ===
      Seq((700L, Seq(0L, 2L)), (686L, Seq(0L, 2L, 4L))),
      "assignment must be re-derived from the new cohort, horizon applied")
    assert(rows.count(_.userId == 2L) === 1, "duplicate week must not re-emit")
  }
}
