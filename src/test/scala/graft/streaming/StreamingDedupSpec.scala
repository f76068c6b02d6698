package graft.streaming

import graft.SparkSpec
import graft.bson._
import graft.store.BsonCollection

import java.nio.file.Files
import java.sql.Timestamp

/** Streaming dedup ingest: the watermark-bounded exact-dedup sink and the
  * stateful first-seen/duplicate-accounting variant.
  */
class StreamingDedupSpec extends SparkSpec {

  private def freshDir(): String = Files.createTempDirectory("graft-sdd").toString

  test("startDedupIngest drops within-horizon duplicates before the sink") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = freshDir()
    val ckpt = freshDir()
    val input = MemoryStream[(Timestamp, Long, String)]
    val df = input.toDF().toDF("ts", "doc_id", "text")
    val q = GraftStreaming.startDedupIngest(df, dir,
      hashInput = "text", timestampColumn = "ts",
      watermarkDelay = "1 hour",
      writerOptions = Map("id_column" -> "doc_id"),
      checkpoint = Some(ckpt))
    val t0 = Timestamp.valueOf("2026-01-01 10:00:00")
    def ts(m: Int) = new Timestamp(t0.getTime + m * 60000L)
    input.addData(
      (ts(0), 1L, "alpha beta"),
      (ts(1), 2L, "gamma delta"),
      (ts(2), 3L, "alpha beta"), // dup of doc 1 inside the horizon
      (ts(3), 4L, "epsilon"))
    q.processAllAvailable()
    input.addData(
      (ts(4), 5L, "gamma delta"), // dup again, later batch, same horizon
      (ts(5), 6L, "zeta"))
    q.processAllAvailable()
    q.stop()
    val ids = new BsonCollection(dir).readAll()
      .flatMap(_.get("_id")).collect { case BInt64(v) => v }.toSet
    assert(ids === Set(1L, 2L, 4L, 6L),
      s"within-horizon duplicates must not reach the collection, got $ids")
  }

  test("statefulDedup emits first-seen flags and running duplicate counts") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[GraftStreaming.DedupEvent]
    val verdicts = GraftStreaming.statefulDedup(input.toDS())
    val q = verdicts.writeStream.format("memory")
      .queryName("dedup_verdicts").outputMode(OutputMode.Append()).start()
    input.addData(
      GraftStreaming.DedupEvent("h1", "doc-a"),
      GraftStreaming.DedupEvent("h2", "doc-b"),
      GraftStreaming.DedupEvent("h1", "doc-a2"))
    q.processAllAvailable()
    input.addData(GraftStreaming.DedupEvent("h1", "doc-a3"))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("dedup_verdicts")
      .as[GraftStreaming.DedupVerdict].collect().toSeq
    val h1 = rows.filter(_.key == "h1").sortBy(_.nSeen)
    assert(h1.map(v => (v.isFirst, v.nSeen)) ===
      Seq((true, 1L), (false, 2L), (false, 3L)),
      "state must carry the per-key count across micro-batches")
    assert(rows.filter(_.key == "h2").map(_.isFirst) === Seq(true))
  }
}
