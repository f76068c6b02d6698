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

  /** Time-bucketed sink (flume/.../BucketedMongoDBSink.java:45-62 analog:
    * the sink URL is a per-event template, so events route to a collection
    * per time bucket). Here the bucket is `date_format(timestampColumn,
    * bucketFormat)` and each micro-batch writes every bucket it spans to
    * `<basePath>/<bucket>` through the batch writer. The per-batch driver
    * loop only enumerates DISTINCT buckets (a micro-batch spans a handful
    * of time buckets by construction); the row writes themselves stay
    * fully distributed.
    */
  def startBucketedCollectionSink(
      df: DataFrame,
      basePath: String,
      timestampColumn: String,
      bucketFormat: String = "yyyy-MM-dd-HH",
      writerOptions: Map[String, String] = Map.empty,
      outputMode: String = "append",
      checkpoint: Option[String] = None,
      trigger: Option[Trigger] = None): StreamingQuery = {
    import org.apache.spark.sql.functions.{col, date_format}
    var w: DataStreamWriter[org.apache.spark.sql.Row] = df.writeStream
      .outputMode(outputMode)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        import org.apache.spark.sql.functions.{coalesce, lit}
        // null timestamps route to a dead-letter bucket instead of NPE-ing
        // the query (or writing to a literal "null" path); persist because
        // foreachBatch frames are NOT cached — without it the batch plan
        // re-evaluates once per bucket
        val bucketed = batch.withColumn("__bucket",
          coalesce(date_format(col(timestampColumn), bucketFormat),
            lit("unbucketed"))).persist()
        try {
          val buckets = bucketed.select("__bucket").distinct()
            .collect().map(_.getString(0)).sorted
          buckets.foreach { b =>
            var bw = bucketed.filter(col("__bucket") === b).drop("__bucket")
              .write.format("graftbson").mode("append")
            writerOptions.foreach { case (k, v) => bw = bw.option(k, v) }
            bw.save(s"$basePath/$b")
          }
        } finally bucketed.unpersist()
      }
    checkpoint.foreach(c => w = w.option("checkpointLocation", c))
    trigger.foreach(t => w = w.trigger(t))
    w.start()
  }

  /** Streaming EXACT-dedup ingest: drop every document whose content hash
    * was already seen within the watermark horizon, then append the
    * survivors to the collection — the streaming form of the batch
    * exact-dedup operator (DedupQueries q19), with state bounded by the
    * watermark instead of growing forever. The Spark-native shape:
    * `withWatermark` + `dropDuplicatesWithinWatermark` keeps one state row
    * per distinct hash inside the horizon, evicted automatically.
    *
    * @param hashInput column whose md5 defines document identity
    * @param timestampColumn event-time column the watermark rides on
    */
  def startDedupIngest(
      df: DataFrame,
      path: String,
      hashInput: String,
      timestampColumn: String,
      watermarkDelay: String = "10 minutes",
      writerOptions: Map[String, String] = Map.empty,
      checkpoint: Option[String] = None,
      trigger: Option[Trigger] = None): StreamingQuery = {
    import org.apache.spark.sql.functions.{col, md5}
    val deduped = df
      .withColumn("content_hash", md5(col(hashInput)))
      .withWatermark(timestampColumn, watermarkDelay)
      .dropDuplicatesWithinWatermark("content_hash")
    startCollectionSink(deduped, path, writerOptions,
      outputMode = "append", checkpoint = checkpoint, trigger = trigger)
  }

  /** A dedup event for [[startStatefulDedupIngest]]: `key` is the
    * identity (content hash, URL, …), `payload` the document body.
    */
  final case class DedupEvent(key: String, payload: String)

  /** First-seen/duplicate accounting per key. */
  final case class DedupVerdict(key: String, payload: String,
      isFirst: Boolean, nSeen: Long)

  /** Streaming stateful dedup with DUPLICATE ACCOUNTING: unlike
    * [[startDedupIngest]] (which silently drops repeats), every event is
    * emitted with `isFirst` and the running per-key occurrence count —
    * the shape a training-data pipeline needs to both keep the first copy
    * and measure duplication rates at ingest. Custom state via
    * `flatMapGroupsWithState` (one Long per key, ProcessingTime timeout
    * evicts idle keys after `stateTtl`).
    */
  def statefulDedup(
      events: org.apache.spark.sql.Dataset[DedupEvent],
      stateTtl: Option[String] = None): org.apache.spark.sql.Dataset[DedupVerdict] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    // ProcessingTimeTimeout only when a TTL is requested: the timeout
    // machinery schedules extra no-data micro-batches to fire evictions,
    // which a bounded-key stream doesn't need
    val timeout =
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events.groupByKey(_.key)
      .flatMapGroupsWithState[Long, DedupVerdict](
        OutputMode.Append(), timeout) {
        (key: String, rows: Iterator[DedupEvent], state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var seen = state.getOption.getOrElse(0L)
            val out = rows.map { e =>
              seen += 1
              DedupVerdict(key, e.payload, isFirst = seen == 1, nSeen = seen)
            }.toVector
            state.update(seen)
            stateTtl.foreach(state.setTimeoutDuration)
            out.iterator
          }
      }
  }
}
