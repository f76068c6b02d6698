package graft.source

import graft.bson.{BDate, BDoc, BInt64, BObjectId, BRegex, BString, BsonOrdering, BsonValue}
import graft.query.BQuery

/** Pure partition-planning strategies — the Spark-side analog of the
  * reference's splitter family (core/.../splitter/): size-based bounds
  * (splitVector analog), sample-based bounds, chunk-per-partition with
  * locality, shard-direct, single, filter-aware pagination, range-query
  * composition and empty-split pruning. All pure functions over a
  * [[CollectionStats]] provider so they unit-test without a server and
  * plug into `Batch.planInputPartitions`.
  */
object Planners {

  /** Planning-time stats interface (collstats / splitVector / $sample /
    * config.chunks stand-ins; the file-backed provider computes them from
    * the data, a server-backed one would issue the commands).
    */
  trait CollectionStats {
    def count: Long
    def avgObjSizeBytes: Long
    /** Sorted sample of n split-key values. */
    def sampleKeys(n: Int): Seq[BsonValue]
    /** Split-key value of the `skip`-th doc matching `query` in key order
      * (None = fewer matching docs) — the paginating splitter's probe.
      */
    def keyAtSkip(query: BQuery, skip: Long): Option[BsonValue]
    /** Does any doc match (used by empty-split pruning)? */
    def hasAny(query: BQuery): Boolean
  }

  /** A planned partition: key range + preferred locations. */
  final case class KeySplit(
      range: BQuery.KeyRange,
      preferredLocations: Seq[String] = Seq.empty)

  /** Whole collection as one split (SingleMongoSplitter.java:52). */
  def single(key: String): Seq[KeySplit] =
    Seq(KeySplit(BQuery.KeyRange(key, None, None)))

  /** Boundary list -> splits: (None,b0], [b0,b1) ... [bn,None) —
    * MongoCollectionSplitter.createSplitFromBounds:182-229.
    */
  def fromBoundaries(key: String, bounds: Seq[BsonValue]): Seq[KeySplit] = {
    val sorted = bounds.distinct
    val los = None +: sorted.map(Some(_))
    val his = sorted.map(Some(_)) :+ None
    los.zip(his).map { case (lo, hi) => KeySplit(BQuery.KeyRange(key, lo, hi)) }
  }

  /** Size-based: number of splits from collection bytes / target split
    * size (default 8 MB, the reference's mongo.input.split_size —
    * MongoConfigUtil.java:155), boundaries from evenly spaced sampled keys
    * (the splitVector-index-walk stand-in, StandaloneMongoSplitter.java:66-209).
    */
  def sizeBased(stats: CollectionStats, key: String,
      targetSplitBytes: Long = 8L * 1024 * 1024): Seq[KeySplit] = {
    val totalBytes = stats.count * stats.avgObjSizeBytes
    val nSplits = math.max(1L, (totalBytes + targetSplitBytes - 1) / targetSplitBytes)
    if (nSplits == 1) single(key)
    else {
      // oversample then take every k-th as a boundary
      val oversample = math.min(stats.count, nSplits * 10).toInt
      val sample = stats.sampleKeys(oversample)
      val step = math.max(1, sample.size / nSplits.toInt)
      val bounds = sample.grouped(step).map(_.head).drop(1).toSeq
      fromBoundaries(key, bounds)
    }
  }

  /** Sample-based: samplesPerSplit samples per target split, every
    * samplesPerSplit-th sampled key is a boundary (SampleSplitter.java:43-106).
    */
  def sampleBased(stats: CollectionStats, key: String,
      targetSplitBytes: Long = 8L * 1024 * 1024,
      samplesPerSplit: Int = 10): Seq[KeySplit] = {
    val totalBytes = stats.count * stats.avgObjSizeBytes
    val nSplits = math.max(1L, (totalBytes + targetSplitBytes - 1) / targetSplitBytes).toInt
    if (nSplits == 1) single(key)
    else {
      val sample = stats.sampleKeys(nSplits * samplesPerSplit)
      val bounds = sample.zipWithIndex.collect {
        case (k, i) if i > 0 && i % samplesPerSplit == 0 => k
      }
      fromBoundaries(key, bounds)
    }
  }

  /** Filter-aware pagination: walk matching docs with skip probes so each
    * split holds >= minDocs MATCHING docs (MongoPaginatingSplitter.java:44-117).
    */
  def paginating(stats: CollectionStats, key: String, query: BQuery,
      minDocs: Long = 1000L): Seq[KeySplit] = {
    val bounds = Iterator.from(1)
      .map(i => stats.keyAtSkip(query, i.toLong * minDocs))
      .takeWhile(_.isDefined)
      .flatten
      .toSeq
    fromBoundaries(key, bounds)
  }

  /** One partition per pre-existing chunk, carrying shard locality
    * (ShardChunkMongoSplitter.java:59-148).
    */
  final case class Chunk(min: Option[BsonValue], max: Option[BsonValue], shard: String)

  def fromChunks(key: String, chunks: Seq[Chunk],
      shardHosts: Map[String, Seq[String]]): Seq[KeySplit] =
    chunks.map { c =>
      KeySplit(BQuery.KeyRange(key, c.min, c.max),
        shardHosts.getOrElse(c.shard, Seq.empty))
    }

  /** One partition per shard (ShardMongoSplitter.java:46-69). */
  def perShard(key: String, shardHosts: Map[String, Seq[String]]): Seq[KeySplit] =
    shardHosts.toSeq.sortBy(_._1).map { case (_, hosts) =>
      KeySplit(BQuery.KeyRange(key, None, None), hosts)
    }

  /** Compose a user/pushed query into each split's range — the range-query
    * split (MongoCollectionSplitter.createRangeQuerySplit:243-295). The
    * reference rejects conflicts between the query and the split key; here
    * the AND composition is always sound.
    */
  def withQuery(splits: Seq[KeySplit], query: BQuery): Seq[(BQuery, Seq[String])] =
    splits.map(s => (BQuery.and(s.range, query), s.preferredLocations))

  /** Empty-split pruning (MongoSplitter.filterEmptySplits:54-67; off by
    * default in the reference because it costs one probe per split).
    */
  def pruneEmpty(splits: Seq[KeySplit], stats: CollectionStats,
      query: BQuery = BQuery.True): Seq[KeySplit] =
    splits.filter(s => stats.hasAny(BQuery.and(s.range, query)))

  /** Could a doc whose SPARK-READ key value equals `v` live in range `r`?
    * A string value probes every storage that READS as that string
    * (BString/BSymbol share the string bracket; BObjectId hex; the whole
    * BRegex(s, *) options interval), mirroring BQuery's read-string
    * comparison semantics — pruning must never drop a partition holding a
    * row the join would keep.
    */
  def rangeMayHoldReadEq(r: BQuery.KeyRange, v: BsonValue): Boolean = v match {
    case BString(s) =>
      BQuery.readEqProbes(s).exists(r.containsValue) ||
        (r.lo.forall(l => BsonOrdering.compare(l, BRegex(s, "\uffff")) <= 0) &&
          r.hi.forall(h => BsonOrdering.compare(h, BRegex(s, "")) > 0))
    // a LongType runtime value may match BDate storage (RowCodec reads a
    // date as its milliseconds under a LongType column) \u2014 probe both
    // brackets
    case BInt64(x) => r.containsValue(BInt64(x)) || r.containsValue(BDate(x))
    // a TimestampType runtime value (BDate millis) may also read-equal a
    // BTimestamp(seconds, ANY increment) — keep a partition whose range
    // intersects that whole-second increment band (a different bracket
    // than BDate in the cross-type order)
    case BDate(ms) =>
      // the band check is guarded against Int overflow: seconds beyond
      // Int.MaxValue have no BTimestamp representation (nothing to keep),
      // and at exactly the max second the s+1 upper bound is spelled as
      // an INCLUSIVE compare against BTimestamp(s, Int.MaxValue)
      r.containsValue(BDate(ms)) || (ms % 1000L == 0 && {
        val sec = ms / 1000L
        sec >= Int.MinValue.toLong && sec <= Int.MaxValue.toLong && {
          val s = sec.toInt
          val belowUpper =
            if (s == Int.MaxValue)
              r.lo.forall(l => BsonOrdering.compare(l,
                graft.bson.BTimestamp(s, Int.MaxValue)) <= 0)
            else
              r.lo.forall(l => BsonOrdering.compare(l,
                graft.bson.BTimestamp(s + 1, 0)) < 0)
          belowUpper &&
            r.hi.forall(h => BsonOrdering.compare(h, graft.bson.BTimestamp(s, 0)) > 0)
        }
      })
    case other => r.containsValue(other)
  }

  /** Partition pruning against a runtime IN-set of key values (dynamic
    * filtering: the join-key values observed on the other side). The
    * planning-time analog of the reference's filter-aware splits — a
    * partition whose key range cannot hold any of the values is never
    * scanned.
    */
  def pruneByValues(splits: Seq[KeySplit], values: Seq[BsonValue]): Seq[KeySplit] =
    splits.filter(s => values.exists(v => rangeMayHoldReadEq(s.range, v)))

  /** Strategy selection (MongoSplitterFactory.java:54-129): chunks if a
    * shard map exists, else the requested strategy, else size-based.
    */
  def plan(
      stats: CollectionStats,
      key: String,
      strategy: String,
      query: BQuery = BQuery.True,
      chunks: Seq[Chunk] = Seq.empty,
      shardHosts: Map[String, Seq[String]] = Map.empty,
      targetSplitBytes: Long = 8L * 1024 * 1024,
      minDocs: Long = 1000L,
      filterEmpty: Boolean = false,
      runtimeKeyValues: Option[Seq[BsonValue]] = None): Seq[(BQuery, Seq[String])] = {
    val splits = strategy match {
      case _ if chunks.nonEmpty => fromChunks(key, chunks, shardHosts)
      case "single" => single(key)
      case "sample" => sampleBased(stats, key, targetSplitBytes)
      case "paginating" => paginating(stats, key, query, minDocs)
      case "shard" if shardHosts.nonEmpty => perShard(key, shardHosts)
      case _ => sizeBased(stats, key, targetSplitBytes)
    }
    val valuePruned = runtimeKeyValues match {
      case Some(vs) => pruneByValues(splits, vs)
      case None => splits
    }
    val pruned = if (filterEmpty) pruneEmpty(valuePruned, stats, query) else valuePruned
    withQuery(pruned, query)
  }
}
