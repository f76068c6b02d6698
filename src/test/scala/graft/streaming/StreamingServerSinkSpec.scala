package graft.streaming

import graft.SparkSpec

import java.nio.file.Files

/** Streaming ingest into a live-server namespace through the graftserver
  * sink (flume MongoDBSink / spark saveToMongoDB parity): micro-batches
  * stream batched bulkWrites, keyed upsert keeps the namespace equal to
  * the latest aggregate state, and the result is readable back through
  * `spark.read.format("graftserver")`.
  */
class StreamingServerSinkSpec extends SparkSpec {

  test("streaming upsert counts maintained in a server namespace") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext =
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].sqlContext

    val dir = Files.createTempDirectory("graft-stream-server").toString
    val serverOpts = Map("server_dir" -> dir, "ns" -> "db.stream_counts")
    val input = MemoryStream[String]
    val counts = input.toDF().toDF("user")
      .groupBy($"user".as("_id")).agg(count(lit(1)).as("n"))

    val q = GraftStreaming.startServerCollectionSink(
      counts, serverOpts,
      Map("mode" -> "upsert", "keys" -> "_id"),
      outputMode = "update")
    input.addData("a", "a", "b")
    q.processAllAvailable()
    input.addData("a", "c")
    q.processAllAvailable()
    q.stop()

    val back = spark.read.format("graftserver").options(serverOpts).load()
      .orderBy($"_id")
      .as[(String, Long)].collect().toSeq
    // update-mode emits the LATEST running count per key; upsert replaces
    assert(back === Seq(("a", 3L), ("b", 1L), ("c", 1L)))
  }
}
