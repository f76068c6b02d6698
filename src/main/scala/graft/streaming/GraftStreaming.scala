package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}

/** Structured Streaming sink parity for the reference's continuous-ingest
  * surface (flume/.../MongoDBSink.java:56-72 — event stream appended to a
  * collection): each micro-batch is written through the graftbson batch
  * writer inside foreachBatch, inheriting all write modes (insert /
  * upsert+$inc / update), so streaming aggregation results can be
  * maintained in a collection exactly like the reference's update
  * reducers. The reference has no windows/watermarks (SURVEY.md §2.7);
  * callers compose Spark's own windowing upstream when needed.
  */
object GraftStreaming {

  /** Start a streaming write of `df` into the collection at `path`.
    *
    * @param writerOptions options for the batch writer (mode, update_op,
    *   keys, multi, id_column, query_template/update_template, ...)
    */
  def startCollectionSink(
      df: DataFrame,
      path: String,
      writerOptions: Map[String, String] = Map.empty,
      outputMode: String = "update",
      checkpoint: Option[String] = None,
      trigger: Option[Trigger] = None): StreamingQuery = {
    var w: DataStreamWriter[org.apache.spark.sql.Row] = df.writeStream
      .outputMode(outputMode)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        var bw = batch.write.format("graftbson").mode("append")
        writerOptions.foreach { case (k, v) => bw = bw.option(k, v) }
        bw.save(path)
      }
    checkpoint.foreach(c => w = w.option("checkpointLocation", c))
    trigger.foreach(t => w = w.trigger(t))
    w.start()
  }
}
