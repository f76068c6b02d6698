package graft.source

import graft.bson._
import graft.query.BQuery
import org.scalatest.funsuite.AnyFunSuite

/** Pure planner unit tests in the style of the reference's
  * ShardChunkMongoSplitterTest (fake stats, no server).
  */
class PlannersSpec extends AnyFunSuite {

  /** Fake stats over keys 0..n-1, fixed doc size. */
  private class FakeStats(n: Long, objSize: Long) extends Planners.CollectionStats {
    override def count: Long = n
    override def avgObjSizeBytes: Long = objSize
    override def sampleKeys(k: Int): Seq[BsonValue] =
      if (k <= 0) Seq.empty
      else {
        val step = math.max(1L, n / k)
        (0L until n by step).take(k).map(BInt64.apply)
      }
    override def keyAtSkip(query: BQuery, skip: Long): Option[BsonValue] = {
      val matching = (0L until n).filter(i => query.matches(BDoc("_id" -> BInt64(i))))
      if (skip < matching.size) Some(BInt64(matching(skip.toInt))) else None
    }
    override def hasAny(query: BQuery): Boolean =
      (0L until n).exists(i => query.matches(BDoc("_id" -> BInt64(i))))
  }

  private def covers(splits: Seq[Planners.KeySplit], keys: Seq[Long]): Boolean = {
    // every key matched by exactly one split
    keys.forall { k =>
      splits.count(_.range.matches(BDoc("_id" -> BInt64(k)))) == 1
    }
  }

  test("single: one unbounded split") {
    val s = Planners.single("_id")
    assert(s.size == 1)
    assert(s.head.range == BQuery.KeyRange("_id", None, None))
  }

  test("size-based: ~totalBytes/target splits, disjoint and covering") {
    val stats = new FakeStats(10000, 1024) // ~10 MB
    val splits = Planners.sizeBased(stats, "_id", targetSplitBytes = 1 << 20)
    assert(splits.size >= 8 && splits.size <= 12, s"got ${splits.size} splits")
    assert(covers(splits, 0L until 10000L))
  }

  test("size-based collapses to single split for small collections") {
    val stats = new FakeStats(10, 100)
    assert(Planners.sizeBased(stats, "_id").size == 1)
  }

  test("sample-based: boundaries every samplesPerSplit-th sample") {
    val stats = new FakeStats(8000, 2048) // 16 MB -> 2 splits at 8 MB
    val splits = Planners.sampleBased(stats, "_id")
    assert(splits.size >= 2)
    assert(covers(splits, 0L until 8000L))
  }

  test("paginating: every split holds >= minDocs matching docs") {
    val stats = new FakeStats(1000, 100)
    // filter: only even keys match
    val even = BQuery.In("_id", (0L until 1000L by 2).map(BInt64.apply))
    val splits = Planners.paginating(stats, "_id", even, minDocs = 100)
    assert(splits.size == 5, s"500 matching / 100 per split, got ${splits.size}")
    assert(covers(splits, 0L until 1000L))
    // each split must contain >= 100 matching docs (except possibly last)
    val sizes = splits.map(s =>
      (0L until 1000L by 2).count(k => s.range.matches(BDoc("_id" -> BInt64(k)))))
    assert(sizes.init.forall(_ >= 100), s"split sizes: $sizes")
  }

  test("chunks: partition per chunk with shard locality") {
    val chunks = Seq(
      Planners.Chunk(None, Some(BInt64(100)), "shardA"),
      Planners.Chunk(Some(BInt64(100)), Some(BInt64(200)), "shardB"),
      Planners.Chunk(Some(BInt64(200)), None, "shardA"))
    val hosts = Map("shardA" -> Seq("hostA:27017"), "shardB" -> Seq("hostB:27017"))
    val splits = Planners.fromChunks("_id", chunks, hosts)
    assert(splits.size == 3)
    assert(splits(0).preferredLocations == Seq("hostA:27017"))
    assert(splits(1).preferredLocations == Seq("hostB:27017"))
    assert(covers(splits, 0L until 300L))
  }

  test("range-query composition ANDs the user query into each split") {
    val splits = Planners.fromBoundaries("_id", Seq(BInt64(50)))
    val composed = Planners.withQuery(splits, BQuery.Gt("v", BInt32(10)))
    assert(composed.size == 2)
    val q0 = composed.head._1
    assert(q0.matches(BDoc("_id" -> BInt64(10), "v" -> BInt32(11))))
    assert(!q0.matches(BDoc("_id" -> BInt64(10), "v" -> BInt32(5))))
    assert(!q0.matches(BDoc("_id" -> BInt64(60), "v" -> BInt32(11))))
  }

  test("empty-split pruning drops splits with no matching docs") {
    val stats = new FakeStats(100, 100)
    val splits = Planners.fromBoundaries("_id",
      Seq(BInt64(50), BInt64(1000), BInt64(2000)))
    assert(splits.size == 4)
    val pruned = Planners.pruneEmpty(splits, stats)
    assert(pruned.size == 2, s"splits beyond key 100 are empty: got ${pruned.size}")
  }

  test("factory: chunk map wins, then explicit strategy, else size-based") {
    val stats = new FakeStats(10000, 1024)
    val chunks = Seq(Planners.Chunk(None, None, "s"))
    assert(Planners.plan(stats, "_id", "size", chunks = chunks).size == 1)
    assert(Planners.plan(stats, "_id", "single").size == 1)
    assert(Planners.plan(stats, "_id", "size", targetSplitBytes = 1 << 20).size >= 8)
  }

  test("ranges partition mixed-type and missing keys exactly once ($min/$max cross-type semantics)") {
    // split boundaries are sampled in BsonOrdering (cross-type) order, so
    // the ranges must use the same total order: a doc whose key sits in a
    // different type bracket than a boundary (or is absent) still belongs
    // to exactly one partition — bracketed $gte/$lt semantics dropped it
    // from ALL of them
    val keys: Seq[BsonValue] = Seq(
      BNull, BInt64(1), BDouble(2.5), BInt32(7),
      BString("a"), BString("z"), BBool(true), BDate(123L))
    val sorted = keys.sorted(BsonOrdering)
    val splits = Planners.fromBoundaries("_id", Seq(sorted(2), sorted(5)))
    for (k <- keys)
      assert(splits.count(_.range.matches(BDoc("_id" -> k))) == 1,
        s"key $k must land in exactly one partition")
    assert(splits.count(_.range.matches(BDoc("other" -> BInt64(9)))) == 1,
      "a doc with no split key belongs to the null-bracket partition")
  }

  test("BTimestamp band probe survives the 2038 Int-seconds boundary (r14)") {
    // a TimestampType runtime value at exactly Int.MaxValue seconds: the
    // old `s + 1` form overflowed to Int.MinValue and pruned a partition
    // holding BTimestamp(Int.MaxValue, *) rows the join would keep
    val maxSecMs = Int.MaxValue.toLong * 1000L
    val band = BQuery.KeyRange("k",
      Some(graft.bson.BTimestamp(Int.MaxValue, 0)),
      Some(graft.bson.BTimestamp(Int.MaxValue, Int.MaxValue)))
    assert(Planners.rangeMayHoldReadEq(band, BDate(maxSecMs)),
      "the max-second band must be kept, not pruned by s+1 overflow")
    // beyond Int seconds: no BTimestamp representation — the band check
    // must not wrap; the value can still match BDate storage only
    val beyondMs = (Int.MaxValue.toLong + 10L) * 1000L
    val tsOnly = BQuery.KeyRange("k",
      Some(graft.bson.BTimestamp(0, 0)),
      Some(graft.bson.BTimestamp(Int.MaxValue, Int.MaxValue)))
    val holdsDate = tsOnly.containsValue(BDate(beyondMs))
    assert(Planners.rangeMayHoldReadEq(tsOnly, BDate(beyondMs)) == holdsDate,
      "seconds beyond Int.MaxValue must not wrap into the band check")
    // sanity: an ordinary second still probes the band
    assert(Planners.rangeMayHoldReadEq(
      BQuery.KeyRange("k", Some(graft.bson.BTimestamp(100, 0)),
        Some(graft.bson.BTimestamp(101, 0))), BDate(100000L)))
  }
}
