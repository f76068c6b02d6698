package graft.streaming

import graft.SparkSpec

/** Streaming chunk-level dedup (the q88→q91 batch pair at ingest):
  * chunk-hash first-seen state across micro-batches, deterministic
  * within-batch ownership, and chunk identity shared with the batch
  * chunking operator.
  */
class StreamingChunkDedupSpec extends SparkSpec {
  import GraftStreaming.{ChunkDedupVerdict, ChunkedDoc, ChunkHit}

  private def tokens(n: Int, p: String) = (1 to n).map(i => s"$p$i").mkString(" ")

  test("chunk state flags a later copy and a half-overlapping doc") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[ChunkedDoc]
    // window 8 / stride 8: clean chunk boundaries for hand-computation
    val hits = GraftStreaming.streamingChunkDedup(input.toDS(), window = 8, stride = 8)
    val q = hits.writeStream.format("memory")
      .queryName("chunk_hits").outputMode(OutputMode.Append()).start()
    val a = tokens(16, "a") // chunks: a1..a8, a9..a16
    val fresh = tokens(8, "z")
    input.addData(ChunkedDoc(1L, a))
    q.processAllAvailable()
    input.addData(
      ChunkedDoc(2L, a), // later full copy: both chunks dup
      // half overlap: first chunk = doc 1's first chunk, second fresh
      ChunkedDoc(3L, tokens(8, "a") + " " + fresh))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("chunk_hits").as[ChunkHit].collect().toSeq
    val verdicts = GraftStreaming.chunkVerdicts(spark.table("chunk_hits"))
      .as[ChunkDedupVerdict].collect().map(v => v.docId -> v).toMap
    assert(verdicts(1L) == ChunkDedupVerdict(1L, 2L, 0L, flagged = false))
    assert(verdicts(2L) == ChunkDedupVerdict(2L, 2L, 2L, flagged = true))
    assert(verdicts(3L) == ChunkDedupVerdict(3L, 2L, 1L, flagged = false))
    // cross-batch state: doc 2's dups were seen in batch 1
    assert(rows.count(_.isDup) == 3, s"got $rows")
  }

  test("within one batch the smallest docId owns the first occurrence") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[ChunkedDoc]
    val hits = GraftStreaming.streamingChunkDedup(input.toDS(), window = 4, stride = 4)
    val q = hits.writeStream.format("memory")
      .queryName("chunk_tie").outputMode(OutputMode.Append()).start()
    val body = tokens(4, "t")
    // same single-chunk body, three docs, ONE batch, shuffled arrival order
    input.addData(ChunkedDoc(30L, body), ChunkedDoc(10L, body), ChunkedDoc(20L, body))
    q.processAllAvailable()
    q.stop()
    val byDoc = spark.table("chunk_tie").as[ChunkHit].collect()
      .map(h => h.docId -> h.isDup).toMap
    assert(byDoc == Map(10L -> false, 20L -> true, 30L -> true),
      s"deterministic min-docId ownership violated: $byDoc")
  }

  test("streaming chunk identity equals the batch q88 chunk hash") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // trailing space: the batch tokenizer keeps the empty token, so the
    // streaming side must too (a trailing separator once silently
    // diverged the two — Scala's split(char) drops trailing empties)
    val text = tokens(40, "w") + " " // 2 chunks at q88's window 32 / stride 24
    val streamingHashes =
      GraftStreaming.chunkHashes(text, window = 32, stride = 24)
    // THE batch chunk frame (q88/q96's single source) over the same doc
    val batchHashes = graft.operators.TextQueries
      .chunkFrame(Seq((1L, "s", text)).toDF("doc_id", "source", "text"), 32, 24)
      .orderBy($"chunk_idx")
      .select($"chunk_hash").as[Long].collect().toSeq
    assert(streamingHashes == batchHashes,
      s"stream $streamingHashes != batch $batchHashes")
  }
}
