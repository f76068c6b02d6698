package graft.streaming

import graft.SparkSpec

/** Stream-static binned interval join: the streaming form of q63 — an
  * event stream flagged against a static frame of incident windows, as
  * an equi-join on (user_id, bin) so no micro-batch nested-loops the
  * static side.
  */
class StreamingIntervalSpec extends SparkSpec {

  test("events inside a user's incident window are flagged; others pass") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext =
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].sqlContext

    // incidents: user 1 has [1000, 1600); user 2 has [5000, 5600)
    val incidents = Seq((1L, 1000L), (2L, 5000L)).toDF("user_id", "st")
    val input = MemoryStream[(Long, Long, Long)] // (event_id, user_id, sec)
    val flagged = GraftStreaming.streamingIntervalFlag(
      input.toDF().toDF("event_id", "user_id", "sec"), incidents, winSec = 600L)

    val q = flagged.writeStream.format("memory")
      .queryName("flagged_events").outputMode("append").start()
    input.addData(
      (10L, 1L, 999L),   // just before the window
      (11L, 1L, 1000L),  // at open -> flagged
      (12L, 1L, 1599L),  // last second -> flagged (crosses into 2nd bin)
      (13L, 1L, 1600L),  // at close (exclusive)
      (14L, 2L, 1200L),  // other user's window does not apply
      (15L, 2L, 5300L),  // inside own window -> flagged
      (16L, 3L, 1200L))  // user with no incidents
    q.processAllAvailable()
    q.stop()

    val got = spark.table("flagged_events")
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(11L, 12L, 15L), s"got $got")
  }
}
