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

  test("sink is idempotent under micro-batch replay (same batchId skipped)") {
    import spark.implicits._
    val dir = freshDir()
    val batch = Seq((1L, 10L), (2L, 20L)).toDF("_id", "v")
    val ckpt = freshDir()
    GraftStreaming.writeBatchIdempotent(batch, dir,
      Map("mode" -> "upsert", "update_op" -> "inc", "keys" -> "_id"),
      markerDir = ckpt, queryKey = "qk", batchId = 0L)
    // a recovery replays batch 0: must be a no-op, not a second $inc
    GraftStreaming.writeBatchIdempotent(batch, dir,
      Map("mode" -> "upsert", "update_op" -> "inc", "keys" -> "_id"),
      markerDir = ckpt, queryKey = "qk", batchId = 0L)
    // the NEXT batch applies normally
    GraftStreaming.writeBatchIdempotent(batch, dir,
      Map("mode" -> "upsert", "update_op" -> "inc", "keys" -> "_id"),
      markerDir = ckpt, queryKey = "qk", batchId = 1L)
    // wiping the "checkpoint" resets the marker: batch 0 applies again
    // (the reprocess-from-scratch ops flow)
    val ckpt2 = freshDir()
    GraftStreaming.writeBatchIdempotent(batch, dir,
      Map("mode" -> "upsert", "update_op" -> "inc", "keys" -> "_id"),
      markerDir = ckpt2, queryKey = "qk", batchId = 0L)
    val m = new BsonCollection(dir).readAll()
      .map(d => d.get("_id").get -> d.get("v").get).toMap
    assert(m(BInt64(1L)) === BInt64(30L),
      s"two committed batches + one post-reset batch = 3 increments, got $m")
  }

  test("streaming near-dup candidates: same-bucket docs pair across batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[GraftStreaming.NearDupDoc]
    val cands = GraftStreaming.streamingNearDupCandidates(input.toDS())
    val q = cands.writeStream.format("memory")
      .queryName("neardup_cands").outputMode(OutputMode.Append()).start()
    val base = "alpha beta gamma delta epsilon zeta eta theta"
    input.addData(
      GraftStreaming.NearDupDoc(1L, base),
      GraftStreaming.NearDupDoc(2L, "totally different words entirely here now ok yes"))
    q.processAllAvailable()
    // an identical doc arrives in a LATER batch: must pair with doc 1
    // (every band), not with doc 2
    input.addData(GraftStreaming.NearDupDoc(3L, base))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("neardup_cands")
      .as[GraftStreaming.NearDupCandidate].collect().toSeq
    assert(rows.nonEmpty, "identical docs must collide in band buckets")
    assert(rows.forall(c => c.docA == 1L && c.docB == 3L),
      s"only the identical pair may be emitted, got $rows")
    assert(rows.map(_.band).distinct.sorted ===
      (0 until graft.functions.Portable.NumBands),
      "identical docs collide in every band")
    // a short doc (no 3-token shingles) produces no signature and no pairs
    assert(!rows.exists(c => c.docA == 2L || c.docB == 2L))
  }

  test("row-local MinHashSig matches the batch groupBy-min signature") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.graft.Bridge
    import graft.functions.{Portable, ShingleHashes, MinHashSig}
    import spark.implicits._
    val docs = Seq((1L, "a b c d e f"), (2L, "one two three four")).toDF("doc_id", "text")
    val sigKernel = docs.withColumn("sig",
      Bridge.column(MinHashSig(Bridge.expression(
        Bridge.column(ShingleHashes(Bridge.expression(
          Portable.spaceSplit(col("text")))))))))
      .select($"doc_id", $"sig").as[(Long, Seq[Long])].collect().toMap
    // batch formulation: explode -> hp -> min per perm
    val batch = docs
      .select($"doc_id", explode(Bridge.column(ShingleHashes(Bridge.expression(
        Portable.spaceSplit(col("text")))))).as("h60"))
      .select($"doc_id", ($"h60" % Portable.P).as("hp"))
      .groupBy($"doc_id")
      .agg(array((0 until Portable.NumPerms).map(j =>
        min(Portable.perm(j, col("hp")))): _*).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(sigKernel === batch)
  }

  test("streaming split leaks: cross-split dup flagged at ingest, oriented to eval") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import org.apache.spark.sql.functions._
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // resolve the deterministic split of candidate ids with the SAME
    // helper the monitor uses, then pick one train/eval pair and one
    // train/train pair
    val splits = (0L until 60L).toDF("id")
      .select($"id", graft.functions.Portable.splitAssign($"id").as("sp"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val trainIds = splits.collect { case (i, "train") => i }.toSeq.sorted
    val evalId = splits.collect { case (i, sp) if sp != "train" => i }.min
    val (trainA, trainB) = (trainIds(0), trainIds(1))

    val baseX = "alpha beta gamma delta epsilon zeta eta theta"
    val baseY = "one two three four five six seven eight nine"
    val input = MemoryStream[GraftStreaming.NearDupDoc]
    val leaks = GraftStreaming.streamingSplitLeaks(
      GraftStreaming.streamingNearDupCandidates(input.toDS()))
    val q = leaks.writeStream.format("memory")
      .queryName("split_leaks").outputMode(OutputMode.Append()).start()
    input.addData(
      GraftStreaming.NearDupDoc(trainA, baseX),
      GraftStreaming.NearDupDoc(trainB, baseY))
    q.processAllAvailable()
    // the eval-side duplicate of baseX arrives later: must be flagged,
    // oriented (trainDoc, evalDoc) regardless of id order
    input.addData(
      GraftStreaming.NearDupDoc(evalId, baseX),
      // second train dup of baseY: candidates emitted, but NOT a leak
      GraftStreaming.NearDupDoc(trainIds(2), baseY))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("split_leaks")
      .as[GraftStreaming.LeakCandidate].collect().toSeq
    assert(rows.nonEmpty, "cross-split duplicate must be flagged")
    assert(rows.forall(l => l.trainDoc == trainA && l.evalDoc == evalId
      && l.evalSplit == splits(evalId)), s"bad orientation: $rows")
  }
}
