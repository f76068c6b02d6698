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

  /** Write one micro-batch through the collection writer at most once
    * per (query, batch): Structured Streaming re-runs a failed batch with
    * the SAME batchId, so a non-idempotent sink would double-apply
    * `$inc`/insert models on every recovery. The last committed batchId
    * is recorded in a marker file (written atomically AFTER the batch's
    * own commit) and replayed batches are skipped — the standard
    * foreachBatch idempotence recipe, kept outside user code. The
    * marker lives in `markerDir` — the CHECKPOINT directory when the
    * query has one, so wiping the checkpoint to reprocess also resets
    * the marker. Honest limits: a crash in the narrow window between
    * the batch's commit and the marker write replays that one batch
    * (at-least-once for that window; true exactly-once would need the
    * data commit and marker to be one atomic operation).
    */
  private[streaming] def writeBatchIdempotent(
      batch: DataFrame, path: String, writerOptions: Map[String, String],
      markerDir: String, queryKey: String, batchId: Long): Unit =
    withBatchMarker(markerDir, queryKey, batchId) {
      var bw = batch.write.format("graftbson").mode("append")
      writerOptions.foreach { case (k, v) => bw = bw.option(k, v) }
      bw.save(path)
    }

  /** Run `body` at most once per (query, batch): skip when the marker
    * already records this batchId, write the marker atomically after the
    * body commits.
    */
  private def withBatchMarker(markerDir: String, queryKey: String,
      batchId: Long)(body: => Unit): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val marker = Paths.get(markerDir, s"_streaming-commit-$queryKey")
    val last: Long =
      if (Files.exists(marker))
        try Files.readString(marker).trim.toLong catch { case _: NumberFormatException => -1L }
      else -1L
    if (batchId <= last) return // replayed batch: already durably applied
    body
    val tmp = marker.resolveSibling(s"._tmp-${marker.getFileName}")
    Files.createDirectories(marker.getParent)
    Files.writeString(tmp, batchId.toString)
    Files.move(tmp, marker, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }

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
    // the marker lives inside the checkpoint dir (the thing that defines
    // "the same query across restarts" — wiping it to reprocess wipes the
    // marker too). Without a checkpoint there is no cross-restart replay,
    // so a per-start key in the collection dir suffices
    val markerDir = checkpoint.getOrElse(path)
    val queryKey =
      if (checkpoint.isDefined) "sink"
      else java.util.UUID.randomUUID().toString.take(8)
    var w: DataStreamWriter[org.apache.spark.sql.Row] = df.writeStream
      .outputMode(outputMode)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeBatchIdempotent(batch, path, writerOptions, markerDir, queryKey, batchId)
      }
    checkpoint.foreach(c => w = w.option("checkpointLocation", c))
    trigger.foreach(t => w = w.trigger(t))
    w.start()
  }

  /** Streaming write into a live-server namespace through the
    * `graftserver` sink — the reference's continuous server ingest
    * (flume/.../MongoDBSink.java:56-72 appends events to a live
    * collection; the spark module's saveToMongoDB streams batches the
    * same way). Each micro-batch goes through the graftserver batch
    * writer, so every write mode applies; on a real server the keyed
    * upsert/update modes are the idempotent ones (the transport has no
    * staging area), and the replay marker is belt-and-braces on top.
    * The marker lives in the checkpoint dir when given (the unit of
    * cross-restart replay); without one replays only happen within this
    * process, so a per-start temp dir suffices.
    */
  def startServerCollectionSink(
      df: DataFrame,
      serverOptions: Map[String, String],
      writerOptions: Map[String, String] = Map.empty,
      outputMode: String = "update",
      checkpoint: Option[String] = None,
      trigger: Option[Trigger] = None): StreamingQuery = {
    val markerDir = checkpoint.getOrElse(
      java.nio.file.Files.createTempDirectory("graft-server-sink").toString)
    val queryKey =
      if (checkpoint.isDefined) "server-sink"
      else java.util.UUID.randomUUID().toString.take(8)
    var w: DataStreamWriter[org.apache.spark.sql.Row] = df.writeStream
      .outputMode(outputMode)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        withBatchMarker(markerDir, queryKey, batchId) {
          var bw = batch.write.format("graftserver").mode("append")
          (serverOptions ++ writerOptions).foreach { case (k, v) => bw = bw.option(k, v) }
          bw.save()
        }
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
    val bucketMarkerDir = checkpoint.getOrElse(basePath)
    val bucketQueryKey =
      if (checkpoint.isDefined) "sink"
      else java.util.UUID.randomUUID().toString.take(8)
    var w: DataStreamWriter[org.apache.spark.sql.Row] = df.writeStream
      .outputMode(outputMode)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
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
            // per-(bucket, batch) idempotence — one marker PER BUCKET: a
            // replayed batch resumes at the first bucket whose commit
            // didn't finish instead of re-appending completed ones (a
            // shared marker would skip the batch's remaining buckets as
            // soon as its first bucket committed)
            val safe = b.replaceAll("[^A-Za-z0-9_-]", "_")
            writeBatchIdempotent(
              bucketed.filter(col("__bucket") === b).drop("__bucket"),
              s"$basePath/$b", writerOptions, bucketMarkerDir,
              s"bucket-$bucketQueryKey-$safe", batchId)
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
    // internal working column, dropped before the sink — it must neither
    // pollute the persisted schema nor clobber a user column
    val hashCol = "__graft_dedup_hash"
    val deduped = df
      .withColumn(hashCol, md5(col(hashInput)))
      .withWatermark(timestampColumn, watermarkDelay)
      .dropDuplicatesWithinWatermark(hashCol)
      .drop(hashCol)
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

  /** A document entering the streaming chunk-level dedup. */
  final case class ChunkedDoc(docId: Long, text: String)

  /** One chunk occurrence: emitted by the chunk-state pass. */
  final case class ChunkHit(docId: Long, chunkHash: Long, isDup: Boolean)

  /** Per-doc chunk-dedup verdict: how much of the doc's chunk mass was
    * already seen (by any earlier doc, or an earlier repeat inside the
    * same doc). `flagged` = more than half the chunks are duplicates.
    */
  final case class ChunkDedupVerdict(docId: Long, nChunks: Long,
      nDupChunks: Long, flagged: Boolean)

  /** Row-local q88 chunking of a doc: hash60 of each `window`-token
    * slice at `stride` offsets — the SAME chunk identity as the batch
    * operator (q88's chunk_hash), so a chunk index built in batch and
    * the streaming state agree on what a chunk IS.
    */
  private[streaming] def chunkHashes(text: String, window: Int, stride: Int): Seq[Long] = {
    // limit -1 keeps trailing empty tokens — Scala's split(char) drops
    // them, which would silently diverge from CharSplit/string_split on
    // any text ending in a separator (parity pinned by spec)
    val t = text.split(" ", -1)
    (0 until t.length by stride).map { off =>
      graft.functions.Md5Util.prefix60(
        org.apache.spark.unsafe.types.UTF8String.fromString(
          t.slice(off, math.min(off + window, t.length)).mkString(" ")))
    }
  }

  /** Streaming CHUNK-level dedup at ingest — the streaming form of the
    * q88→q91 batch pair: each document fans out row-locally into its
    * fixed-window chunk hashes, per-chunk first-seen state marks repeats
    * (the chunk-hash keyed `flatMapGroupsWithState` — state is ONE Long
    * per distinct chunk inside the TTL horizon), and per-chunk hits are
    * emitted for the caller to roll up (see [[chunkVerdicts]]) or sink
    * chunk-filtered. Deterministic at any parallelism: within a
    * micro-batch the smallest docId owns a chunk's first occurrence, so
    * replays and different shuffle layouts produce identical verdicts.
    * The doc-level rollup is deliberately NOT a second stateful operator
    * in the same query (chained flatMapGroupsWithState is outside
    * Spark's supported multi-stateful set); a doc's chunks all live in
    * one micro-batch, so the rollup is a batch-local aggregate in the
    * sink — [[chunkVerdicts]] applied inside foreachBatch.
    *
    * ==State growth — set `stateTtl` in production==
    * `stateTtl = None` (the default, used by the batch-parity specs)
    * keeps one first-seen entry per DISTINCT chunk hash FOREVER: on a
    * real ingest stream the state store grows without bound. Any
    * long-running deployment should pass a TTL sized to its dedup
    * horizon — e.g. `Some("7 days")` dedups against the trailing week
    * and lets the store shed older chunks; with ~16 B per entry, state
    * then caps near (distinct chunks per TTL window) × 16 B per
    * executor share. `None` is only sound for bounded replays/backfills
    * whose distinct-chunk count is known to fit.
    */
  def streamingChunkDedup(
      docs: org.apache.spark.sql.Dataset[ChunkedDoc],
      window: Int = 32,
      stride: Int = 24,
      stateTtl: Option[String] = None): org.apache.spark.sql.Dataset[ChunkHit] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = docs.sparkSession
    import spark.implicits._
    val timeout =
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    docs
      .flatMap(d => chunkHashes(d.text, window, stride)
        .map(h => ChunkHit(d.docId, h, isDup = false)))
      .groupByKey(_.chunkHash)
      .flatMapGroupsWithState[Long, ChunkHit](OutputMode.Append(), timeout) {
        (hash: Long, rows: Iterator[ChunkHit], state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var seen = state.getOption.getOrElse(0L)
            val out = rows.toVector.sortBy(_.docId).map { r =>
              seen += 1
              r.copy(isDup = seen > 1)
            }
            state.update(seen)
            stateTtl.foreach(state.setTimeoutDuration)
            out.iterator
          }
      }
  }

  /** Batch-local doc rollup of [[streamingChunkDedup]] hits — apply to
    * each foreachBatch frame (a doc's chunks always share a micro-batch).
    */
  def chunkVerdicts(hits: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col, count, lit, sum, when}
    hits.groupBy(col("docId"))
      .agg(count(lit(1)).as("nChunks"),
        sum(when(col("isDup"), 1L).otherwise(0L)).as("nDupChunks"))
      .withColumn("flagged", col("nDupChunks") * 2 > col("nChunks"))
  }

  /** A streaming document for near-dup detection. */
  /** Streaming form of the batch binned interval join (q63): flag each
    * incoming event (user_id, sec) that falls inside any STATIC incident
    * window [st, st+winSec) of the same user. Delegates to the shared
    * [[graft.operators.IntervalJoin]] — the stream-static LEFT SEMI
    * equi-join never nested-loops the static side per micro-batch.
    */
  def streamingIntervalFlag(
      events: org.apache.spark.sql.DataFrame,
      incidents: org.apache.spark.sql.DataFrame,
      winSec: Long): org.apache.spark.sql.DataFrame =
    graft.operators.IntervalJoin.flag(events, incidents, winSec)

  final case class NearDupDoc(docId: Long, text: String)

  /** An emitted near-dup candidate: two docs sharing an LSH band bucket
    * (same semantics as the batch q20 candidate generator, incremental).
    */
  final case class NearDupCandidate(docA: Long, docB: Long, band: Int)

  /** Streaming MinHash+LSH near-dup candidate generation: each incoming
    * doc's 16-permutation signature is computed ROW-LOCALLY (one whole
    * doc per row — the codegen'd MinHashSig kernel, same values as the
    * batch groupBy-min), its 4 band-bucket hashes are keyed into
    * flatMapGroupsWithState, and a new arrival emits a candidate pair
    * against every doc already resident in its bucket. State per bucket
    * is the resident doc-id list, CAPPED at [[Portable.BucketCap]] so a
    * degenerate bucket stops emitting (and stops growing) instead of
    * going quadratic. NOTE the cap semantics differ from the batch
    * df-cap by necessity: batch EXCLUDES an over-cap bucket entirely,
    * while a stream cannot retract pairs already emitted — the first
    * BucketCap residents' pairs stand and later arrivals are dropped
    * (prefix-bounded). `stateTtl` evicts idle buckets (processing-time
    * timeout); without it state grows with the number of DISTINCT
    * buckets, which is unbounded on an open-ended stream. The
    * incremental form of DedupQueries q20/q49.
    */
  def streamingNearDupCandidates(
      docs: org.apache.spark.sql.Dataset[NearDupDoc],
      stateTtl: Option[String] = None)
      : org.apache.spark.sql.Dataset[NearDupCandidate] = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import org.apache.spark.sql.graft.Bridge
    import graft.functions.{Portable, ShingleHashes, MinHashSig}
    val spark = docs.sparkSession
    import spark.implicits._
    val sig = Bridge.column(MinHashSig(Bridge.expression(
      Bridge.column(ShingleHashes(Bridge.expression(
        Portable.spaceSplit(col("text"))))))))
    val bands = docs.toDF()
      .withColumn("sig", sig)
      .filter(col("sig").isNotNull)
      .select(col("docId"), explode(array((0 until Portable.NumBands).map { b =>
        val cols = (b * Portable.BandSize until (b + 1) * Portable.BandSize)
          .map(j => col("sig").getItem(j).cast("string"))
        struct(lit(b).as("band"), Portable.hash60(concat_ws(",", cols: _*)).as("bh"))
      }: _*)).as("bb"))
      .select(col("docId"), col("bb.band").as("band"), col("bb.bh").as("bh"))
      .as[(Long, Int, Long)]
    val timeout =
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    bands.groupByKey { case (_, band, bh) => (band, bh) }
      .flatMapGroupsWithState[Seq[Long], NearDupCandidate](
        OutputMode.Append(), timeout) {
        (key: (Int, Long), rows: Iterator[(Long, Int, Long)],
            state: GroupState[Seq[Long]]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var resident = state.getOption.getOrElse(Seq.empty)
            val out = Seq.newBuilder[NearDupCandidate]
            rows.foreach { case (docId, band, _) =>
              if (!resident.contains(docId)) {
                if (resident.size < Portable.BucketCap) {
                  resident.foreach { other =>
                    val (a, b) = if (other < docId) (other, docId) else (docId, other)
                    out += NearDupCandidate(a, b, band)
                  }
                  resident = resident :+ docId
                }
                // at the cap: degenerate bucket — emit nothing, grow nothing
              }
            }
            state.update(resident)
            stateTtl.foreach(state.setTimeoutDuration)
            out.result().iterator
          }
      }
  }

  /** A split-crossing near-dup candidate: a train doc whose near-dup
    * landed in valid/test (oriented to the eval side, batch-q86
    * convention).
    */
  final case class LeakCandidate(trainDoc: Long, evalDoc: Long,
      evalSplit: String, band: Int)

  /** Streaming form of the batch split-leakage audit (q86): flags, AT
    * INGEST TIME, candidate pairs that cross the deterministic 80/10/10
    * hash split — so eval contamination is caught when the duplicate
    * ARRIVES, not at the next full-corpus audit. A stateless row-local
    * map over [[streamingNearDupCandidates]] (the split is a pure
    * function of the doc id — [[graft.functions.Portable.splitAssign]],
    * shared verbatim with q83/q86), so it adds no state and no shuffle
    * beyond the candidate generator's own, and inherits its bounded
    * bucket semantics.
    */
  def streamingSplitLeaks(
      cands: org.apache.spark.sql.Dataset[NearDupCandidate])
      : org.apache.spark.sql.Dataset[LeakCandidate] = {
    import org.apache.spark.sql.functions._
    import graft.functions.Portable
    val spark = cands.sparkSession
    import spark.implicits._
    cands.toDF()
      .withColumn("spA", Portable.splitAssign(col("docA")))
      .withColumn("spB", Portable.splitAssign(col("docB")))
      .filter((col("spA") === "train") =!= (col("spB") === "train"))
      .select(
        when(col("spA") === "train", col("docA")).otherwise(col("docB"))
          .as("trainDoc"),
        when(col("spA") === "train", col("docB")).otherwise(col("docA"))
          .as("evalDoc"),
        when(col("spA") === "train", col("spB")).otherwise(col("spA"))
          .as("evalSplit"),
        col("band"))
      .as[LeakCandidate]
  }

  /** One counter of a streaming heavy-hitters summary. */
  final case class TokenCount(token: String, count: Long)

  /** A bucket's current Misra–Gries summary, re-emitted every batch the
    * bucket receives data (Update-mode semantics). `totalWeight` is the
    * cumulative weight the bucket has absorbed — it defines the summary's
    * error bound (every counter under-estimates by at most
    * totalWeight/(capacity+1)) and orders emissions by recency.
    */
  final case class BucketHitters(bucket: Int, totalWeight: Long,
      counters: Seq[TokenCount])

  /** Streaming heavy hitters with BOUNDED state — the streaming form of
    * the q67 batch sketch ([[graft.functions.MisraGriesSketch]], same
    * decrement-by-min algorithm on the same guarantee). Tokens hash to
    * one of `numBuckets` groups; each group folds its micro-batch
    * (token, count) rows into a Misra–Gries summary of `capacity`
    * counters held in `GroupState`, so TOTAL state is numBuckets×capacity
    * counters at any stream length, and — because a token's entire weight
    * lands in exactly one bucket — every token whose cumulative weight
    * exceeds its bucket's total/(capacity+1) is guaranteed present. The
    * per-batch shuffle carries only that batch's pre-counted rows; the
    * global top-k is a tiny downstream merge over numBuckets×capacity
    * counters, and an exact recount of the emitted candidates (the batch
    * q67 verify step) turns the stream summary into exact counts.
    */
  def streamingHeavyHitters(
      tokens: org.apache.spark.sql.Dataset[TokenCount],
      numBuckets: Int,
      capacity: Int): org.apache.spark.sql.Dataset[BucketHitters] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    require(numBuckets >= 1 && capacity >= 1, "buckets and capacity must be >= 1")
    val spark = tokens.sparkSession
    import spark.implicits._
    tokens.groupByKey(t => math.floorMod(t.token.hashCode, numBuckets))
      .flatMapGroupsWithState[(Seq[TokenCount], Long), BucketHitters](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        (bucket: Int, rows: Iterator[TokenCount],
            state: GroupState[(Seq[TokenCount], Long)]) =>
          val (prev, prevTotal) = state.getOption.getOrElse((Seq.empty, 0L))
          val buf = scala.collection.mutable.HashMap.empty[String, Long]
          prev.foreach(tc => buf.update(tc.token, tc.count))
          var total = prevTotal
          rows.foreach { t =>
            if (t.count > 0) {
              total += t.count
              if (buf.contains(t.token)) buf(t.token) += t.count
              else {
                buf.update(t.token, t.count)
                // decrement-by-min trim back to `capacity` counters
                while (buf.size > capacity) {
                  val m = buf.valuesIterator.min
                  buf.filterInPlace((_, c) => c - m > 0)
                    .mapValuesInPlace((_, c) => c - m)
                }
              }
            }
          }
          val summary = buf.toSeq
            .sortBy { case (tok, c) => (-c, tok) }
            .map { case (tok, c) => TokenCount(tok, c) }
          state.update((summary, total))
          Iterator.single(BucketHitters(bucket, total, summary))
      }
  }

  /** One behavioral event for the streaming funnel. */
  final case class FunnelEvent(userId: Long, eventType: String, sec: Long)

  /** Per-user funnel state: first view + the bufferCap earliest click
    * and purchase timestamps (see [[streamingFunnel]]).
    */
  final case class FunnelState(fv: Option[Long], clicks: Seq[Long],
      purchases: Seq[Long])

  /** A user's funnel progress: first view, first qualifying click
    * (>= fv), first qualifying purchase (>= fc) — absent stages are
    * None. Emitted whenever the triple changes.
    */
  final case class FunnelProgress(userId: Long, fv: Option[Long],
      fc: Option[Long], fp: Option[Long])

  /** Streaming form of the batch ordered-stage funnel (q72): per-user
    * state tracks the first view, the first click at-or-after it, and
    * the first purchase at-or-after that, CONVERGING to the batch
    * window-min answer under out-of-order arrival. Chained stages can't
    * be folded into plain running mins (a late, earlier view can
    * re-qualify clicks that predate the old first view), so the state
    * holds the `bufferCap` EARLIEST click and purchase timestamps and
    * re-derives the qualifying mins per batch. The bound is one-sided,
    * BucketCap-style: a reported stage time is always exact (eviction
    * only drops timestamps later than everything retained), and a stage
    * can only be under-reported (None) when more than `bufferCap` of a
    * user's clicks precede their final first view. State per user is
    * O(bufferCap); `stateTtl` evicts idle users via processing-time
    * timeout. At 1000 executors the per-batch shuffle carries only that
    * batch's events, user-keyed — the same one exchange the batch plan
    * pays.
    */
  def streamingFunnel(
      events: org.apache.spark.sql.Dataset[FunnelEvent],
      bufferCap: Int = 16,
      stateTtl: Option[String] = None): org.apache.spark.sql.Dataset[FunnelProgress] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    require(bufferCap >= 1, "bufferCap must be >= 1")
    val spark = events.sparkSession
    import spark.implicits._
    val timeout =
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events.groupByKey(_.userId)
      .flatMapGroupsWithState[FunnelState, FunnelProgress](
        OutputMode.Append(), timeout) {
        (user: Long, rows: Iterator[FunnelEvent], state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val FunnelState(fv0, clicks0, purchases0) =
              state.getOption.getOrElse(FunnelState(None, Seq.empty, Seq.empty))
            var fv = fv0
            val clicks = scala.collection.mutable.ArrayBuffer(clicks0: _*)
            val purchases = scala.collection.mutable.ArrayBuffer(purchases0: _*)
            rows.foreach { e =>
              e.eventType match {
                case "view" => if (fv.forall(e.sec < _)) fv = Some(e.sec)
                case "click" => clicks += e.sec
                case "purchase" => purchases += e.sec
                case _ => ()
              }
            }
            val ck = clicks.sorted.take(bufferCap).toSeq
            val pk = purchases.sorted.take(bufferCap).toSeq
            def minFrom(buf: Seq[Long], lo: Option[Long]): Option[Long] =
              lo.flatMap(l => buf.find(_ >= l)) // buf sorted ascending
            val fc = minFrom(ck, fv)
            val fp = minFrom(pk, fc)
            state.update(FunnelState(fv, ck, pk))
            stateTtl.foreach(state.setTimeoutDuration)
            val progressed = fv != fv0 ||
              fc != minFrom(clicks0, fv0) || fp != minFrom(purchases0, minFrom(clicks0, fv0))
            if (progressed) Iterator.single(FunnelProgress(user, fv, fc, fp))
            else Iterator.empty
          }
      }
  }

  /** One event for streaming cohort retention: the user and the
    * already-truncated activity week (epoch days of the week start —
    * `date_trunc('week', ts)` upstream, same convention as batch q73).
    */
  final case class CohortEvent(userId: Long, weekDays: Long)

  /** A user's corrected cohort assignment: cohort week + active week
    * offsets. LATEST-state semantics: each emission REPLACES the user's
    * previous one (keyed upsert downstream), because a late, earlier
    * first event moves the whole cohort — increments could never be
    * retracted, assignments can.
    */
  final case class CohortAssignment(userId: Long, cohortWeekDays: Long,
      offsets: Seq[Long])

  /** Streaming form of the batch cohort retention (q73): per-user state
    * is (min week, active-week set) and each change emits the user's
    * full corrected assignment — the downstream collection sink upserts
    * by user key, so the namespace always equals latest state and the
    * retention triangle is a GROUP BY over it (the same
    * "state-maintenance by keyed upsert" contract as the repo's other
    * streaming sinks). Out-of-order arrival is total: a late earlier
    * week lowers the cohort and re-derives every offset. State is
    * bounded by `maxOffsetWeeks` (weeks beyond cohort + horizon are
    * dropped from the set, the standard retention-triangle horizon),
    * so a user's state never grows past horizon/7 entries.
    */
  def streamingCohorts(
      events: org.apache.spark.sql.Dataset[CohortEvent],
      maxOffsetWeeks: Long = 52,
      stateTtl: Option[String] = None): org.apache.spark.sql.Dataset[CohortAssignment] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    require(maxOffsetWeeks >= 0, "maxOffsetWeeks must be >= 0")
    val spark = events.sparkSession
    import spark.implicits._
    val timeout =
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events.groupByKey(_.userId)
      .flatMapGroupsWithState[Seq[Long], CohortAssignment](
        OutputMode.Append(), timeout) {
        (user: Long, rows: Iterator[CohortEvent], state: GroupState[Seq[Long]]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val weeks0 = state.getOption.getOrElse(Seq.empty[Long])
            val weeks = (weeks0 ++ rows.map(_.weekDays)).distinct.sorted
            val bounded =
              if (weeks.isEmpty) weeks
              else weeks.takeWhile(_ <= weeks.head + maxOffsetWeeks * 7)
            state.update(bounded)
            stateTtl.foreach(state.setTimeoutDuration)
            if (bounded != weeks0)
              Iterator.single(CohortAssignment(user, bounded.head,
                bounded.map(w => (w - bounded.head) / 7)))
            else Iterator.empty
          }
      }
  }
}
