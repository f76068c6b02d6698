package graft.streaming

import graft.SparkSpec
import graft.bson._
import graft.store.BsonCollection

import java.nio.file.Files
import java.sql.Timestamp

/** Structured-Streaming composition on top of the collection sink: the
  * reference's streaming surface is append-only (flume MongoDBSink), and
  * SURVEY §2.7 notes windows/watermarks/state come from Spark itself —
  * these tests prove that composition actually works end-to-end into the
  * graftbson write path (windowed counts maintained by upsert+$inc, and
  * gap-based sessionization via flatMapGroupsWithState).
  */
class StreamingWindowSpec extends SparkSpec {

  private def freshDir(): String = Files.createTempDirectory("graft-stw").toString

  test("watermarked tumbling-window counts maintained in a collection") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext =
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].sqlContext

    val dir = freshDir()
    val input = MemoryStream[(Timestamp, String)]
    val windowed = input.toDF().toDF("ts", "user")
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "5 minutes"), $"user")
      .count()
      .select(
        concat($"user", lit("@"), date_format($"window.start", "HH:mm")).as("_id"),
        $"count".as("n"))
    // update-mode micro-batches + replace write keep the collection equal
    // to the latest window states
    val q = GraftStreaming.startCollectionSink(
      windowed, dir, Map("mode" -> "upsert", "keys" -> "_id"),
      outputMode = "update")
    input.addData(
      (Timestamp.valueOf("2024-01-01 10:01:00"), "a"),
      (Timestamp.valueOf("2024-01-01 10:02:00"), "a"),
      (Timestamp.valueOf("2024-01-01 10:06:00"), "b"))
    q.processAllAvailable()
    input.addData((Timestamp.valueOf("2024-01-01 10:03:00"), "a")) // late but in watermark
    q.processAllAvailable()
    q.stop()

    val m = new BsonCollection(dir).readAll()
      .map(d => d.get("_id").get.asInstanceOf[BString].v -> d.get("n").get).toMap
    assert(m("a@10:00") === BInt64(3L), s"got $m")
    assert(m("b@10:05") === BInt64(1L))
  }

  test("gap-based sessionization via flatMapGroupsWithState into the sink") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext =
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].sqlContext

    val gapMs = 5 * 60 * 1000L
    val dir = freshDir()
    val input = MemoryStream[(String, Long)] // (user, epoch-ms)

    def update(user: String, events: Iterator[(String, Long)],
        state: GroupState[List[Long]]): Iterator[(String, Long, Long, Long)] = {
      val ts = (state.getOption.getOrElse(Nil) ++ events.map(_._2)).sorted
      // close every session more than one gap older than the newest event
      val sessions = ts.foldLeft(List.empty[List[Long]]) {
        case (acc, t) if acc.nonEmpty && t - acc.head.head <= gapMs =>
          (t :: acc.head) :: acc.tail
        case (acc, t) => List(t) :: acc
      }.map(_.reverse).reverse
      val (closed, open) = sessions.partition(sess =>
        ts.last - sess.last > gapMs)
      state.update(open.flatten)
      closed.iterator.map(sess => (user, sess.head, sess.last, sess.size.toLong))
    }

    val sessions = input.toDS()
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(update)
      .toDF("user", "start_ms", "end_ms", "n_events")

    val q = GraftStreaming.startCollectionSink(
      sessions, dir, Map.empty, outputMode = "append")
    input.addData(("u1", 0L), ("u1", 60000L), ("u2", 0L))
    q.processAllAvailable()
    // u1's next event is 20 min later -> first session closes
    input.addData(("u1", 20 * 60 * 1000L))
    q.processAllAvailable()
    q.stop()

    val rows = new BsonCollection(dir).readAll().toSeq
    val u1 = rows.find(_.get("user").contains(BString("u1"))).get
    assert(u1.get("start_ms").contains(BInt64(0L)))
    assert(u1.get("end_ms").contains(BInt64(60000L)))
    assert(u1.get("n_events").contains(BInt64(2L)))
  }
}
