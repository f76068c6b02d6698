package graft.streaming

import graft.SparkSpec
import graft.streaming.GraftStreaming.{BucketHitters, TokenCount}

/** Streaming Misra–Gries heavy hitters: bounded per-bucket state, the
  * MG presence guarantee across micro-batches, and exactness when the
  * vocabulary fits the capacity.
  */
class StreamingHeavyHittersSpec extends SparkSpec {

  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
  import spark.implicits._

  /** Latest summary per bucket = the emission with the largest cumulative
    * absorbed weight (update-mode memory sink keeps every emission).
    */
  private def latest(rows: Seq[BucketHitters]): Map[Int, Seq[TokenCount]] =
    rows.groupBy(_.bucket)
      .map { case (b, rs) => b -> rs.maxBy(_.totalWeight).counters }

  test("capacity >= vocabulary: streamed counts are exact across batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[TokenCount]
    val q = GraftStreaming.streamingHeavyHitters(input.toDS(), 4, 64)
      .writeStream.outputMode("update").format("memory").queryName("shh_exact").start()
    input.addData((1 to 30).map(i => TokenCount(s"t${i % 5}", 1L)): _*)
    q.processAllAvailable()
    input.addData((1 to 20).map(i => TokenCount(s"t${i % 5}", 2L)): _*)
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("shh_exact").as[BucketHitters].collect().toSeq
    val merged = latest(rows).values.flatten
      .map(tc => tc.token -> tc.count).toMap
    // t0..t4: 6 rows of weight 1 in batch 1, 4 rows of weight 2 in batch 2
    assert(merged == (0 until 5).map(i => s"t$i" -> 14L).toMap, merged.toString)
  }

  test("state stays bounded and a heavy token survives across batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val buckets = 2
    val cap = 16
    val input = MemoryStream[TokenCount]
    val q = GraftStreaming.streamingHeavyHitters(input.toDS(), buckets, cap)
      .writeStream.outputMode("update").format("memory").queryName("shh_bound").start()
    // 3 batches: HEAVY gets 1000 per batch, drowned in 2000 distinct
    // singletons per batch (disjoint across batches)
    for (b <- 0 until 3) {
      val rows = Seq.fill(1000)(TokenCount("HEAVY", 1L)) ++
        (0 until 2000).map(i => TokenCount(s"u${b * 2000 + i}", 1L))
      input.addData(scala.util.Random.shuffle(rows): _*)
      q.processAllAvailable()
    }
    q.stop()
    val all = spark.table("shh_bound").as[BucketHitters].collect().toSeq
    all.foreach(bh => assert(bh.counters.size <= cap,
      s"state grew past cap: ${bh.counters.size}"))
    val byBucket = latest(all)
    // buckets partition the 9000 total weight; each bucket's bound is its
    // own total/(cap+1), which is at most 9000/(cap+1)
    val heavy = byBucket.values.flatten.find(_.token == "HEAVY")
    assert(heavy.isDefined, s"heavy token evicted: $byBucket")
    assert(heavy.get.count <= 3000L && heavy.get.count >= 3000L - 9000L / (cap + 1),
      s"estimate ${heavy.get.count} outside MG bound")
  }
}
