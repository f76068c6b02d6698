package graft.server

import graft.bson._
import graft.query.BQuery
import graft.source.Planners
import graft.store.{BsonCollection, BulkResult, InsertOne, WriteModel}

import scala.collection.immutable.ListMap

/** One server read: filter + projection + per-cursor sort + skip/limit —
  * exactly the knobs the reference sets on its per-split cursor
  * (core/src/main/java/com/mongodb/hadoop/input/MongoInputSplit.java:272-299:
  * find(query).projection(fields).sort(sort).skip(n).limit(n)).
  */
final case class Find(
    query: BQuery = BQuery.True,
    projection: Option[Seq[String]] = None,
    sortAscBy: Option[String] = None,
    skip: Long = 0L,
    limit: Long = -1L,
    /** Reverse the `sortAscBy` order — `cursor.sort({k: -1})`, the
      * index-walk-backwards a server runs for MAX(k). */
    sortDescending: Boolean = false,
    /** Secondary sort keys after `sortAscBy`, each (column, descending)
      * — the compound cursor sort doc `{k1: ±1, k2: ±1, ...}` of a
      * tie-broken ORDER BY (the reference's sort doc is a full document,
      * MongoInputSplit.java:281). */
    thenBy: Seq[(String, Boolean)] = Nil) {

  /** The full compound sort spec as (column, descending) pairs; empty =
    * unsorted cursor. */
  def sortSpec: Seq[(String, Boolean)] =
    sortAscBy.map(k => (k, sortDescending)).toSeq ++ thenBy
}

/** The live-server surface the engine needs, as a transport-agnostic
  * trait: every method is one public MongoDB command/driver call, so a
  * production binding is a thin class wrapping the mongo-java-driver
  * (none is linked here — this sandbox has no driver jar and no server;
  * see `docs` in [[ServerClient$]] for the 1:1 mapping). The file-backed
  * engine is unchanged: [[ServerStats]] plugs this into the SAME
  * [[Planners.CollectionStats]] planning interface the file provider
  * implements, and [[ServerCollection]] mirrors the per-split cursor
  * read and bulk-write entry points.
  */
trait ServerClient {

  /** collStats essentials (count + avgObjSize), the reference's sizing
    * input (core/.../splitter/MongoSplitterFactory.java:66-83).
    */
  def collStats(ns: String): ServerClient.CollStats

  /** Server-side cursor. Implementations MUST stream (driver cursor →
    * iterator), never materialize: a split read is unbounded.
    */
  def find(ns: String, q: Find): Iterator[BDoc]

  /** `aggregate([{$sample: {size: n}}, {$project: {key: 1}}])` — the
    * sample-based splitter's boundary source
    * (core/.../splitter/SampleSplitter.java:79-88). Values need not be
    * sorted; the planner sorts.
    */
  def sampleKeys(ns: String, key: String, n: Int): Seq[BsonValue]

  /** `splitVector` admin command: index-walk boundaries at maxChunkBytes
    * (core/.../splitter/StandaloneMongoSplitter.java:94-101). None when
    * the deployment refuses it (mongos, no privileges) — callers fall
    * back to [[sampleKeys]], like the reference falls back to the
    * sample splitter.
    */
  def splitVector(ns: String, key: String, maxChunkBytes: Long): Option[Seq[BsonValue]]

  /** config.chunks + shard host lookup for shard-chunk planning
    * (core/.../splitter/ShardChunkMongoSplitter.java): (lo, hi, hosts)
    * per chunk. Empty for unsharded deployments.
    */
  def chunkRanges(ns: String, key: String): Seq[(Option[BsonValue], Option[BsonValue], Seq[String])]

  /** Ordered/unordered bulkWrite, same models the batch write path
    * streams shard-side. */
  def bulkWrite(ns: String, models: Iterator[WriteModel], ordered: Boolean): BulkResult

  /** Declare a (compound) ascending index BEFORE a write job's tasks run
    * — the reference creates declared indexes pre-insert
    * (core/.../output/MongoRecordWriter.java:128-130; index option
    * parsing pig/.../MongoStorageOptions.java:16-110). One
    * `createIndexes` command round-trip; idempotent (a server treats an
    * existing identical index as a no-op).
    */
  def createIndex(ns: String, fields: Seq[String]): Unit

  /** One server-side grouped aggregation —
    * `aggregate([{$match: query}, {$group: {_id: <keys>, ...}}])`,
    * the same server-side `aggregate()` pattern the reference's sample
    * splitter establishes (core/.../splitter/SampleSplitter.java:79-88)
    * applied to the $group stage. ONE round-trip per call; the result
    * streams one doc per group carrying each group value under its
    * column name and each aggregate under its [[GroupAgg.alias]].
    * `groupKeys` may be empty — a filtered GLOBAL aggregate
    * (`_id: null`): one result doc when any doc matches, NONE otherwise
    * (real `$group` emits nothing over empty input — callers needing a
    * zero-count sentinel add it themselves). Aggregates skip
    * null/missing values (mongo $min/$max/$sum semantics, which match
    * Spark's null-ignoring aggregates) and a SUM over an all-null group
    * is NULL (Spark semantics — a real server's `$sum` says 0 there, so
    * driver bindings must correct it via the
    * [[QueryDocs.sumPresenceAlias]] companion); COUNT counts all
    * matched docs in the group.
    */
  def groupAggregate(ns: String, query: BQuery, groupKeys: Seq[String],
      aggs: Seq[GroupAgg],
      unwind: Option[ServerClient.Unwind] = None,
      postQuery: BQuery = BQuery.True,
      /** DERIVED columns (r17, [[graft.query.ComputedCol]]) the group
        * keys/aggregates may reference: materialized by a `$set` stage
        * after the pre-`$match` (whose query never references them —
        * the scan keeps computed-column filters residual). Never
        * combined with an unwind (the capture rule refuses unwound
        * relations). */
      computed: Seq[graft.query.ComputedCol] = Nil): Iterator[BDoc]

  /** One unwound ROW pipeline ([[QueryDocs.unwoundStages]] is the wire
    * rendering): `$match(pre)` → `$unwind` → `$match(post)` → optional
    * `$sort`/`$skip`/`$limit` tail → `$project`, returning per-element
    * DOCUMENTS (the unwound path holds the element). The plain unwound
    * scan uses this when a row-count/-order tail is pushed — those
    * count UNWOUND rows, which find()'s parent-doc knobs cannot.
    * `sortSpec` is (path, descending) pairs over stored values (BSON
    * `$sort` order — callers gate bracket safety); both queries must
    * render fully server-side (rows may be gone after the tail).
    */
  def unwoundRead(ns: String, query: BQuery, unwind: ServerClient.Unwind,
      postQuery: BQuery, sortSpec: Seq[(String, Boolean)],
      skip: Long, limit: Long,
      projection: Option[Seq[String]]): Iterator[BDoc]

  /** One server-executed equi-join — the `$lookup`+`$unwind` pipeline
    * ([[QueryDocs.lookupStages]] is the wire rendering): driving docs of
    * `ns` matching `j.leftQuery` are projected to `j.leftProject`'s
    * output names, joined against `j.rightNs` docs matching
    * `j.rightQuery` (projected to `j.rightProject`) on the AND of
    * `j.keys` output-name equalities, and stream back FLATTENED — one
    * doc per joined pair carrying every left and right output field at
    * the top level. `j.leftOuter` keeps unmatched driving docs with the
    * right fields missing (they read back as NULL). Null/missing keys
    * never match on either side (SQL equi-join semantics; the right
    * side's pipeline filters them, a null driving key looks up nothing).
    * A [[BQuery.KeyRange]] conjunct in `j.leftQuery` (a split range) is
    * rendered BRACKET-style (`$gte`/`$lt`) inside the pipeline's
    * `$match` — unlike a cursor's min/max bounds this is only exact
    * over uniformly-stored keys, so callers must pass one only under
    * the `assume_uniform_storage` opt-in (the joined scan does).
    */
  def lookupJoin(ns: String, j: LookupJoin): Iterator[BDoc]
}

/** One CHAINED `$lookup` stage above an already-joined pipeline (the
  * 3-way+ star query): `leftProject` re-projects the PREVIOUS stage's
  * flattened output names to this stage's output names (the renderer
  * resolves each to its top-level or pre-flatten `__j.` home), then the
  * usual lookup+unwind joins `rightNs` on `keys` — (new left OUTPUT,
  * right OUTPUT) pairs.
  */
final case class ChainStage(
    leftProject: Seq[(String, String)],
    rightNs: String,
    rightQuery: BQuery,
    rightProject: Seq[(String, String)],
    keys: Seq[(String, String)],
    leftOuter: Boolean,
    /** RANGE conjuncts of THIS stage's join condition (r18): `leftOut OP
      * rightOut` over the stage's output names, rendered into its
      * `$lookup` `$expr` exactly like the base join's ([[LookupJoin]]
      * `ranges`) — so a 3-way star with one interval edge keeps the
      * WHOLE chain pushed. Same dialect gates (uniform storage +
      * orderable types on both sides, per-var null guards; the reader
      * null-prunes the stage's right operands); a null driving operand
      * fails the guard and INNER drops / LEFT OUTER null-extends,
      * matching Spark's null comparison. */
    ranges: Seq[LookupJoin.RangeKey] = Nil) {
  require(ranges.forall(r => LookupJoin.RangeOps.contains(r.op)),
    s"unknown range op in $ranges")
  require(ranges.isEmpty || keys.nonEmpty,
    "a chained range stage needs at least one key equality (never all-pairs)")
}

/** One pushed equi-join, transport-agnostic: field→output-name
  * projections for both sides, the key pairs AS OUTPUT NAMES, and the
  * join flavor; `chain` appends further lookup stages (3-way+ joins) —
  * the whole chain is still ONE pipeline round-trip. Plain data —
  * serializes into the scan's partitions.
  *
  * Exactly one tail may be set:
  *  - `group`: a server-side `$group` over the FINAL joined output
  *    names (an aggregate pushed through the join — only #groups docs
  *    cross the wire); result docs follow the
  *    [[ServerClient.groupAggregate]] contract (group values under
  *    their output names, aggregates under their aliases, all-null SUM
  *    = NULL).
  *  - `limit`: a `$limit` after the last `$unwind` — a PARTIAL row cap
  *    (per pipeline, Spark re-applies the global one).
  *  - `topN`: a `$sort`+`$limit` tail — the per-pipeline local top-n of
  *    `ORDER BY ... LIMIT n` over the joined rows, (output name,
  *    descending) pairs in precedence order; PARTIAL like `limit`
  *    (each pipeline's local top-n is a superset of its contribution
  *    to the global one, which Spark's TakeOrdered folds).
  */
final case class LookupJoin(
    leftQuery: BQuery,
    leftProject: Seq[(String, String)],
    rightNs: String,
    rightQuery: BQuery,
    rightProject: Seq[(String, String)],
    keys: Seq[(String, String)],
    leftOuter: Boolean,
    chain: Seq[ChainStage] = Nil,
    group: Option[(Seq[String], Seq[GroupAgg])] = None,
    limit: Option[Long] = None,
    topN: Option[(Seq[(String, Boolean)], Long)] = None,
    /** `$skip` tail over the FINAL joined rows (single-pipeline OFFSET
      * pushdown — globally exact only when the caller plans one
      * pipeline, which the `splitter=single` gate guarantees). */
    skip: Option[Long] = None,
    /** DRIVING-side `$unwind` (r15): rendered between the left `$match`
      * and the left `$project`, so the per-ELEMENT rows feed the
      * `$lookup` — `explode(driving.arr)` then join runs as ONE
      * pipeline. `unwindPost` is the post-unwind element `$match`
      * (must be fully server-renderable; element rows with
      * untranslatable predicates never push this far). Lookup-side
      * arrays never unwind here (element rows are not parent-atomic
      * across the join boundary). */
    unwind: Option[ServerClient.Unwind] = None,
    unwindPost: BQuery = BQuery.True,
    /** RANGE conjuncts of the join condition (r17): `left OP right`
      * over OUTPUT names, rendered into the `$lookup` pipeline's
      * `$expr` alongside the key equalities — the binned interval /
      * as-of join shape (equi-key on the bin, range residual in the
      * pipeline), never all-pairs. The caller gates operand types on
      * `assume_uniform_storage` (aggregation `$lt`/`$gt` compare in
      * BSON TOTAL order — cross-bracket foreign storage would compare
      * by type where Spark's typed comparison returns null) and
      * null-filters both operands (null/missing sort below every real
      * value in `$expr`, so an unguarded `$lt: [null, x]` would MATCH
      * where Spark's null comparison drops). */
    ranges: Seq[LookupJoin.RangeKey] = Nil,
    /** DERIVED columns (r17, [[graft.query.ComputedCol]]) each side's
      * keys/projections may reference: the driving side's materialize
      * via a `$set` after the left `$match` (which never references
      * them), the lookup side's via a `$set` FIRST in the sub-pipeline
      * (its `$match` may carry the non-null key prune on a computed
      * field). Base join only; chained stages refuse computed sides. */
    leftComputed: Seq[graft.query.ComputedCol] = Nil,
    rightComputed: Seq[graft.query.ComputedCol] = Nil) {
  require(Seq(group.isDefined, limit.isDefined, topN.isDefined,
      skip.isDefined).count(identity) <= 1,
    "a lookup join takes at most one of group/limit/topN/skip")
  require(ranges.forall(r => LookupJoin.RangeOps.contains(r.op)),
    s"unknown range op in $ranges")
  require(ranges.isEmpty || keys.nonEmpty,
    "a range join needs at least one key equality (never all-pairs)")
  /** Output names of the FINAL stage's left projection — where the
    * flatten boundary sits for tail stages and result re-nesting. */
  def finalLeftOuts: Set[String] =
    (chain.lastOption.map(_.leftProject).getOrElse(leftProject)).map(_._2).toSet
}

object ServerClient {
  final case class CollStats(count: Long, avgObjSizeBytes: Long)

  /** One `$unwind` stage: the (possibly dotted) array field to unwind
    * and mongo's `preserveNullAndEmptyArrays` flag (explode_outer).
    * `posField` = mongo's `includeArrayIndex` — the element's ORIGINAL
    * index lands in that field as int64 (NumberLong), null for
    * null/empty/non-array parents; posexplode's pos column reads it.
    * `mapKv` (r15) = a MAP explode: the wire renders `$set:
    * {__graft_kv: {$objectToArray: "$path"}}` then unwinds THAT field
    * — each entry doc carries `{k, v}`, which the key/value columns
    * read through their column_mapping entries. */
  final case class Unwind(path: String, preserveNullAndEmpty: Boolean,
      posField: Option[String] = None, mapKv: Boolean = false)
}

object LookupJoin {
  /** One range conjunct of a pushed join condition: `leftOut OP
    * rightOut` over the two sides' OUTPUT names ("<", "<=", ">", ">="
    * — the driving side on the left; a mirrored right-outer push swaps
    * sides and flips the op before building this). */
  final case class RangeKey(leftOut: String, op: String, rightOut: String) {
    override def toString: String = s"$leftOut $op $rightOut"
  }

  val RangeOps: Set[String] = Set("<", "<=", ">", ">=")

  /** `left OP right` in BSON total order — the `$expr` comparison the
    * wire pipeline runs, shared by the fake transport so the two agree;
    * null/missing operands never match (callers also pre-filter them,
    * mirroring Spark's null comparison semantics).
    *
    * NaN (DoubleType, the min/max/TopN caveat's range-join arm): a real
    * server's total order places NaN BELOW all numbers where Spark
    * orders NaN ABOVE every double — this comparison follows the
    * SERVER's rule (so the sandbox double and the live transport agree
    * with each other), which means a pushed range join treats a
    * foreign NaN operand as smaller-than-everything where the unpushed
    * Spark join would treat it as larger. Engine writers emit no NaN;
    * foreign NaN-bearing doubles need a pushed NaN-excluding filter or
    * join pushdown off — the same stance as the pushed MIN/MAX.
    */
  def rangeMatches(op: String, left: Option[BsonValue],
      right: Option[BsonValue]): Boolean = (left, right) match {
    case (Some(l), Some(r)) if l != BNull && r != BNull =>
      // r18 string range keys ride the `ascii_columns` declaration —
      // the sandbox evaluator's UTF-16 compare is only exact over
      // ASCII, so a non-ASCII operand here is a CONTRACT VIOLATION:
      // fail loud instead of silently diverging from Spark/live binary
      // order (a live server compares UTF-8 bytes = Spark's order, so
      // the declaration can never corrupt live results)
      def asciiGuard(v: BsonValue): Unit = v match {
        case BString(s) if !s.forall(_ < 0x80) =>
          throw new IllegalArgumentException(
            s"ascii_columns contract violated: non-ASCII string range " +
              s"operand '$s' (the sandbox order is only Spark-exact over " +
              "ASCII; remove the column from ascii_columns or clean the data)")
        case _ => ()
      }
      asciiGuard(l); asciiGuard(r)
      def nan(v: BsonValue): Boolean = v match {
        case BDouble(x) => x.isNaN
        case _ => false
      }
      def numericBracket(v: BsonValue): Boolean = v match {
        case _: BInt32 | _: BInt64 | _: BDouble => true
        case _ => false
      }
      val c =
        if (nan(l) && nan(r)) 0
        else if (nan(l) && numericBracket(r)) -1 // NaN below all numbers
        else if (nan(r) && numericBracket(l)) 1
        else BsonOrdering.compare(l, r) // cross-bracket: bracket order

      op match {
        case "<" => c < 0
        case "<=" => c <= 0
        case ">" => c > 0
        case ">=" => c >= 0
        case other => throw new IllegalArgumentException(s"range op $other")
      }
    case _ => false
  }

  /** Resolve a (possibly NESTED) join-key OUTPUT name to its document
    * field path through a (field → output) projection: an exact output
    * match wins; otherwise the dotted HEAD names the projected column
    * and the tail appends to its field (`meta.k` over a projection
    * `m → meta` resolves to `m.k`). Shared by the wire renderer, the
    * fake transport, and the per-split readers so all three agree.
    */
  def fieldOf(spec: Seq[(String, String)], out: String): String =
    spec.collectFirst { case (f, o) if o == out => f }.getOrElse {
      val i = out.indexOf('.')
      require(i > 0, s"unknown join output '$out' in ${spec.map(_._2)}")
      val head = out.substring(0, i)
      spec.collectFirst { case (f, o) if o == head => f + out.substring(i) }
        .getOrElse(throw new IllegalArgumentException(
          s"unknown join output '$out' in ${spec.map(_._2)}"))
    }
}

/** [[Planners.CollectionStats]] over a live server: the planners
  * (size-based, sample-based, paginating, pruning) run unmodified against
  * either this or the file-backed `FileStats` — planning is the same
  * bounded probe sequence, only the transport differs. Every method is a
  * single bounded server round-trip (no full scans):
  *
  *  - count / avgObjSizeBytes: one collStats
  *  - sampleKeys: one \$sample aggregate
  *  - keyAtSkip: `find(query).sort(key).skip(n).limit(1).projection(key)`
  *    — the server walks the index, one doc crosses the wire
  *  - hasAny: `find(query).limit(1)`
  */
final class ServerStats(client: ServerClient, ns: String, key: String)
    extends Planners.CollectionStats {

  private lazy val stats = client.collStats(ns)

  override def count: Long = stats.count
  override def avgObjSizeBytes: Long = stats.avgObjSizeBytes

  override def sampleKeys(n: Int): Seq[BsonValue] =
    client.sampleKeys(ns, key, n).sorted(BsonOrdering)

  override def keyAtSkip(query: BQuery, skip: Long): Option[BsonValue] =
    client.find(ns, Find(query, projection = Some(Seq(key)),
        sortAscBy = Some(key), skip = skip, limit = 1L))
      .toSeq.headOption.flatMap(_.getPath(key))

  override def hasAny(query: BQuery): Boolean =
    client.find(ns, Find(query, projection = Some(Seq("_id")), limit = 1L)).hasNext
}

/** Server-backed collection handle: split planning via the shared
  * planner strategies, per-split cursor reads, and bulk writes. The
  * executor-side analog: a PartitionReader holds one [[readSplit]]
  * cursor, exactly like the reference's split holds one server cursor.
  */
final class ServerCollection(client: ServerClient, ns: String) {

  def stats(key: String): ServerStats = new ServerStats(client, ns, key)

  /** Plan splits with the same strategy factory the file source uses;
    * `splitVector` boundaries win when the server grants them, sampling
    * otherwise (the reference's splitter-factory fallback chain,
    * core/.../splitter/MongoSplitterFactory.java:49-106).
    */
  def planSplits(key: String, targetSplitBytes: Long = 8L * 1024 * 1024): Seq[Planners.KeySplit] = {
    val chunks = client.chunkRanges(ns, key)
    if (chunks.nonEmpty)
      chunks.map { case (lo, hi, hosts) =>
        Planners.KeySplit(BQuery.KeyRange(key, lo, hi), hosts)
      }
    else client.splitVector(ns, key, targetSplitBytes) match {
      case Some(bounds) => Planners.fromBoundaries(key, bounds.sorted(BsonOrdering))
      case None => Planners.sizeBased(stats(key), key, targetSplitBytes)
    }
  }

  /** One split's cursor: range ∧ residual query, with the scan's
    * projection and per-partition sort pushed to the server.
    */
  def readSplit(split: Planners.KeySplit, residual: BQuery = BQuery.True,
      projection: Option[Seq[String]] = None,
      sortAscBy: Option[String] = None): Iterator[BDoc] =
    client.find(ns, Find(BQuery.and(split.range, residual), projection, sortAscBy))

  def bulkWrite(models: Iterator[WriteModel], ordered: Boolean = true): BulkResult =
    client.bulkWrite(ns, models, ordered)
}

/** Builds a [[ServerClient]] from connector options. Resolved by FQCN on
  * the driver AND inside each partition reader/writer — the connection
  * itself never serializes; every task reconstructs its own client from
  * the options, exactly like the reference rebuilding a `MongoClient`
  * from the input URI inside each mapper's split
  * (core/src/main/java/com/mongodb/hadoop/input/MongoInputSplit.java:243-276).
  * A production binding is one class wrapping the mongo-java-driver
  * (`create` = `MongoClients.create(options("uri"))`).
  */
trait ServerClientFactory {
  def create(options: Map[String, String]): ServerClient

  /** True when this factory binds a LIVE server whose own engine
    * evaluates the wire forms (queries ship verbatim — the server's
    * dialect rules are authoritative). False (default) for sandbox /
    * file-backed doubles, whose option queries the ENGINE matcher
    * evaluates client-side — there the client-dialect gates
    * ([[graft.query.NumericNullEdge]]) apply exactly as on the file
    * transport (ADVICE r16: the fake transport silently used the
    * engine's numeric-null rule where the file transport refused). */
  def liveTransport: Boolean = false
}

/** Sandbox factory: a [[FakeServerClient]] rooted at `server_dir`. Stands
  * in for the driver binding (no driver jar / live server here); every
  * task opens the same file-backed store, so the DSv2 plumbing above it —
  * serializable splits, per-task client construction, cursor streaming —
  * runs the real code path.
  */
final class DirServerFactory extends ServerClientFactory {
  override def create(options: Map[String, String]): ServerClient =
    new FakeServerClient(Some(options.getOrElse("server_dir",
      throw new IllegalArgumentException("graftserver: server_dir option required"))))
}

/** In-memory/test double for [[ServerClient]]: each namespace is backed
  * by a real [[BsonCollection]] under a temp dir (or a caller-provided
  * `rootDir`, shared by many client instances — the executor-side mode of
  * [[DirServerFactory]]), so bulk writes get the store's full
  * update/upsert/replace semantics and `find` evaluates the same
  * [[BQuery.matches]] the per-shard apply uses — the trait-level tests
  * exercise real behavior, only the network is fake. Sampling is
  * DETERMINISTIC (every count/n-th doc in key order) so planner tests
  * are reproducible.
  */
final class FakeServerClient(rootDir: Option[String] = None)
    extends ServerClient with AutoCloseable {
  private val ownsRoot = rootDir.isEmpty
  private val root = rootDir match {
    case Some(d) =>
      val p = java.nio.file.Paths.get(d)
      java.nio.file.Files.createDirectories(p)
      p
    case None => java.nio.file.Files.createTempDirectory("graft-fakeserver")
  }
  private val colls = scala.collection.mutable.Map.empty[String, BsonCollection]

  /** Backing-store root, for specs asserting on-store side effects. */
  def rootPath: java.nio.file.Path = root

  /** Delete the backing temp tree; also registered as a JVM shutdown
    * hook so spec instances that never close() don't accrete /tmp
    * garbage across runs. A shared (caller-provided) root is never
    * deleted — its lifetime belongs to the caller.
    */
  override def close(): Unit = if (ownsRoot) {
    import java.nio.file.{Files => F}
    if (F.exists(root)) {
      val stream = F.walk(root)
      try stream.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => F.deleteIfExists(p))
      finally stream.close()
    }
  }
  if (ownsRoot) Runtime.getRuntime.addShutdownHook(new Thread(() => close()))

  private def coll(ns: String): BsonCollection = colls.synchronized {
    colls.getOrElseUpdate(ns, {
      val dir = root.resolve(ns.replace('.', '_'))
      val c = new BsonCollection(dir.toString)
      c.create(1)
      c
    })
  }

  /** Round-trips observed per method — lets tests assert planning IO is
    * bounded (the server analog of FileStats.bytesTouched). */
  val callCounts: scala.collection.mutable.Map[String, Int] =
    scala.collection.mutable.Map.empty.withDefaultValue(0)
  private def tick(m: String): Unit = callCounts(m) = callCounts(m) + 1

  override def collStats(ns: String): ServerClient.CollStats = {
    tick("collStats")
    // count + avgObjSize from one header skim per shard: the file IS the
    // concatenated encoded docs, so its size is the byte total — a real
    // server answers collStats from metadata, not by re-serializing the
    // collection (the former decode+re-encode pass was O(data) CPU on
    // every split planning)
    val (bytes, count) = coll(ns).sizeStats()
    ServerClient.CollStats(count, if (count == 0) 0L else bytes / count)
  }

  override def find(ns: String, q: Find): Iterator[BDoc] = {
    tick("find")
    // stream unless a sort forces materialization — a cursor read must not
    // hold the collection in memory (the contract [[ServerClient.find]]
    // states), and a scan's per-split cursors would otherwise each
    // materialize the whole store
    //
    // projected decode: when the cursor carries a projection, only the
    // fields the projection/query/sort actually touch are decoded — every
    // other field's bytes are skipped (a real server reads full docs but
    // ships only the projection; the stand-in's analog saves the decode)
    val needed: Option[Set[String]] = q.projection.map(p =>
      p.toSet ++ BQuery.fieldPaths(q.query) ++ q.sortSpec.map(_._1))
    val matching = coll(ns).readAll(needed).filter(q.query.matches)
    val docs: Iterator[BDoc] = q.sortSpec match {
      case Seq() => matching
      case spec =>
        // compound cursor sort: later keys break earlier-key ties, each
        // in its own ±1 direction (the server's sort-doc semantics)
        val cmp: Ordering[BDoc] = (a, b) => {
          var r = 0
          val it = spec.iterator
          while (r == 0 && it.hasNext) {
            val (k, desc) = it.next()
            val c = BsonOrdering.compare(
              a.getPath(k).getOrElse(BNull), b.getPath(k).getOrElse(BNull))
            r = if (desc) -c else c
          }
          r
        }
        // a bounded cursor (skip+limit) keeps only that many docs in a
        // heap instead of sorting the whole store — the index-walk cost
        // shape of a real server's sort-with-limit; stability (file
        // order on ties) matches the full stable sort exactly
        val bound =
          if (q.limit >= 0) q.skip + q.limit
          else -1L
        if (bound >= 0 && bound < Int.MaxValue)
          FakeServerClient.stableTopK(matching, cmp, bound.toInt)
        else matching.toVector.sorted(cmp).iterator
    }
    var it: Iterator[BDoc] = docs.drop(
      math.min(q.skip, Int.MaxValue.toLong).toInt)
    if (q.limit >= 0) it = it.take(math.min(q.limit, Int.MaxValue.toLong).toInt)
    q.projection match {
      // dotted paths re-NEST, exactly like a real server's {"a.b": 1}
      // projection (consumers read projected values by path)
      case Some(fields) => it.map(QueryDocs.projector(fields))
      case None => it
    }
  }

  override def sampleKeys(ns: String, key: String, n: Int): Seq[BsonValue] = {
    tick("sampleKeys")
    val keys = coll(ns).readAll(Some(Set(key))).flatMap(_.getPath(key)).toVector
      .sorted(BsonOrdering)
    if (keys.isEmpty || n <= 0) Seq.empty
    else {
      val stride = math.max(1, keys.size / n)
      (keys.indices by stride).take(n).map(keys)
    }
  }

  /** The fake grants splitVector only when asked to (tests cover both
    * arms of the fallback chain). */
  var splitVectorGranted: Boolean = false
  override def splitVector(ns: String, key: String, maxChunkBytes: Long): Option[Seq[BsonValue]] =
    if (!splitVectorGranted) None
    else {
      tick("splitVector")
      val docs = coll(ns).readAll().toVector
        .sortBy(d => d.getPath(key).getOrElse(BNull))(BsonOrdering)
      val bounds = scala.collection.mutable.ArrayBuffer.empty[BsonValue]
      var acc = 0L
      for (d <- docs) {
        acc += BsonCodec.encode(d).length.toLong
        if (acc >= maxChunkBytes) { d.getPath(key).foreach(bounds += _); acc = 0L }
      }
      Some(bounds.toSeq)
    }

  var shardChunks: Map[String, Seq[(Option[BsonValue], Option[BsonValue], Seq[String])]] = Map.empty
  override def chunkRanges(ns: String, key: String): Seq[(Option[BsonValue], Option[BsonValue], Seq[String])] =
    shardChunks.getOrElse(ns, Seq.empty)

  /** The fake's store IS a [[BsonCollection]] — declare the index there
    * (same side file the file source's ensure_index writes), so specs
    * read it back through the store's own `indexes()`. */
  override def createIndex(ns: String, fields: Seq[String]): Unit = {
    tick("createIndex")
    coll(ns).ensureIndex(fields)
  }

  /** Grouped aggregation over the store — what a real server computes
    * from the `$match`+`$group` pipeline, evaluated with the same
    * [[BQuery.matches]] the find path uses. Null/missing values are
    * skipped by min/max/sum (mongo semantics); an empty aggregate is
    * BNull. Sum stays integral while every addend is integral, doubles
    * otherwise (the $sum promotion rule).
    */
  override def groupAggregate(ns: String, query: BQuery, groupKeys: Seq[String],
      aggs: Seq[GroupAgg],
      unwind: Option[ServerClient.Unwind] = None,
      postQuery: BQuery = BQuery.True,
      computed: Seq[graft.query.ComputedCol] = Nil): Iterator[BDoc] = {
    tick("groupAggregate")
    // real-transport renderability mirror (r16) — see lookupJoin
    locally {
      val p = QueryDocs.plan(query); val post = QueryDocs.plan(postQuery)
      require(p.isExact && p.keyBounds.isEmpty,
        s"groupAggregate query not fully server-renderable: $query")
      require(post.isExact && post.keyBounds.isEmpty,
        s"groupAggregate post-unwind query not fully server-renderable: $postQuery")
      require(computed.isEmpty || unwind.isEmpty,
        "computed columns never combine with an unwind (capture rule)")
    }
    // projected decode: only the fields the pipeline touches — queries,
    // group keys, aggregate inputs, the unwind path, computed sources —
    // are materialized; everything else is byte-skipped
    val needed: Set[String] =
      BQuery.fieldPaths(query) ++ BQuery.fieldPaths(postQuery) ++
        groupKeys ++ aggs.collect {
          case GroupAgg.CountCol(c, _) => c
          case GroupAgg.MinOf(c, _) => c
          case GroupAgg.MaxOf(c, _) => c
          case GroupAgg.SumOf(c, _) => c
        } ++ unwind.map(_.path) ++ computed.map(_.field)
    // computed `$set` runs after the pre-$match (which never references
    // the derived fields), mirroring the wire stage order
    val matched = coll(ns).readAll(Some(needed)).filter(query.matches)
      .map(d => graft.query.ComputedCol.injectAll(computed, d))
    val rows = unwind match {
      case Some(u) => matched.flatMap(d => FakeServerClient.unwindDocs(d, u))
      case None => matched
    }
    val post =
      if (postQuery == BQuery.True) rows else rows.filter(postQuery.matches)
    FakeServerClient.groupFold(post, groupKeys, aggs)
  }

  /** The unwound ROW pipeline, evaluated over the store with the same
    * `$unwind` shapes as [[groupAggregate]] and find()'s `$sort`
    * semantics (stored values, BSON cross-type order, compound keys
    * tie-breaking in their own directions). */
  override def unwoundRead(ns: String, query: BQuery, u: ServerClient.Unwind,
      postQuery: BQuery, sortSpec: Seq[(String, Boolean)],
      skip: Long, limit: Long,
      projection: Option[Seq[String]]): Iterator[BDoc] = {
    tick("unwoundRead")
    // real-transport renderability mirror (r16) — see lookupJoin
    locally {
      val p = QueryDocs.plan(query); val post = QueryDocs.plan(postQuery)
      require(p.isExact && p.keyBounds.isEmpty &&
        post.isExact && post.keyBounds.isEmpty,
        s"unwoundRead queries not fully server-renderable: $query / $postQuery")
    }
    // projected decode over the needed fields only (query/unwind/post/
    // sort/projection); a None projection needs the whole doc
    val needed: Option[Set[String]] = projection.map(p =>
      p.toSet ++ BQuery.fieldPaths(query) ++ BQuery.fieldPaths(postQuery) +
        u.path ++ sortSpec.map(_._1))
    val unwound = coll(ns).readAll(needed).filter(query.matches)
      .flatMap(d => FakeServerClient.unwindDocs(d, u))
    val post =
      if (postQuery == BQuery.True) unwound
      else unwound.filter(postQuery.matches)
    val sorted = sortSpec match {
      case Seq() => post
      case spec =>
        val cmp: Ordering[BDoc] = (a, b) => {
          var r = 0
          val it = spec.iterator
          while (r == 0 && it.hasNext) {
            val (k, desc) = it.next()
            val c = BsonOrdering.compare(
              a.getPath(k).getOrElse(BNull), b.getPath(k).getOrElse(BNull))
            r = if (desc) -c else c
          }
          r
        }
        // bounded tail: keep skip+limit rows in a heap, not the full set
        val bound = if (limit >= 0) skip + limit else -1L
        if (bound >= 0 && bound < Int.MaxValue)
          FakeServerClient.stableTopK(post, cmp, bound.toInt)
        else post.toVector.sorted(cmp).iterator
    }
    var it: Iterator[BDoc] = sorted.drop(
      math.min(skip, Int.MaxValue.toLong).toInt)
    if (limit >= 0) it = it.take(math.min(limit, Int.MaxValue.toLong).toInt)
    projection match {
      case Some(fields) => it.map(QueryDocs.projector(fields))
      case None => it
    }
  }

  /** The `$lookup` equi-join, evaluated as a hash join over the store
    * (what a real server computes from [[QueryDocs.lookupStages]]).
    * Key equality is `$expr` `$eq`'s VALUE equality across numeric
    * storages — int32/int64/integral-double of one value match — via a
    * canonical key form; the right side is indexed in memory (the fake
    * is a transport stand-in, not a storage engine — a real server
    * walks the right collection's index per driving doc).
    */
  override def lookupJoin(ns: String, j: LookupJoin): Iterator[BDoc] = {
    tick("lookupJoin")
    // mirror the REAL transport's renderability requires (r16): the
    // fake evaluates BQuery nodes directly, so without these a gate
    // hole (an unrenderable conjunct reaching a pipeline) would pass
    // silently in-sandbox and crash only on a live server
    require(QueryDocs.plan(j.leftQuery).isExact,
      s"lookupJoin left query not fully server-renderable: ${j.leftQuery}")
    locally {
      val rp = QueryDocs.plan(j.rightQuery)
      require(rp.isExact && rp.keyBounds.isEmpty,
        s"lookupJoin right query not fully server-renderable: ${j.rightQuery}")
      val up = QueryDocs.plan(j.unwindPost)
      require(up.isExact && up.keyBounds.isEmpty,
        s"lookupJoin post-unwind query not fully server-renderable: ${j.unwindPost}")
      j.chain.foreach { st =>
        val cp = QueryDocs.plan(st.rightQuery)
        require(cp.isExact && cp.keyBounds.isEmpty,
          s"lookupJoin chained right query not fully server-renderable: ${st.rightQuery}")
      }
    }
    require(j.leftComputed.isEmpty || j.unwind.isEmpty,
      "computed columns never combine with an unwind (capture rule)")
    // driving-side $unwind runs between the pre-match and the
    // projection/join — the same per-element expansion the wire
    // pipeline renders ($match → $unwind → $match(post) → $project →
    // $lookup), so element rows feed the join; computed columns
    // materialize after the pre-match, mirroring the $set position
    //
    // projected decode: only the query/projection/unwind/computed fields
    // materialize (output names landing in the trie are harmless — they
    // never match stored fields)
    val leftNeeded: Set[String] =
      BQuery.fieldPaths(j.leftQuery) ++ BQuery.fieldPaths(j.unwindPost) ++
        j.leftProject.map(_._1) ++ j.unwind.map(_.path) ++
        j.leftComputed.map(_.field)
    val matched = coll(ns).readAll(Some(leftNeeded)).filter(j.leftQuery.matches)
      .map(d => graft.query.ComputedCol.injectAll(j.leftComputed, d))
    val driving = j.unwind match {
      case Some(u) =>
        val unwound = matched.flatMap(d => FakeServerClient.unwindDocs(d, u))
        if (j.unwindPost == BQuery.True) unwound
        else unwound.filter(j.unwindPost.matches)
      case None => matched
    }
    var rows: Iterator[BDoc] = stageJoin(
      driving,
      j.leftProject, j.rightNs, j.rightQuery, j.rightProject,
      j.keys, j.leftOuter, j.ranges, j.rightComputed)
    // chained stages drive off the previous stage's flat joined rows —
    // the same pipeline a real server runs ($project flatten + $lookup
    // per stage), evaluated stage-wise here
    j.chain.foreach { st =>
      rows = stageJoin(rows, st.leftProject, st.rightNs, st.rightQuery,
        st.rightProject, st.keys, st.leftOuter, st.ranges)
    }
    j.skip.foreach(n => rows = rows.drop(math.min(n, Int.MaxValue.toLong).toInt))
    (j.group, j.limit, j.topN) match {
      case (Some((keys, aggs)), _, _) =>
        FakeServerClient.groupFold(rows, keys, aggs)
      case (_, Some(n), _) =>
        rows.take(math.min(n, Int.MaxValue.toLong).toInt)
      case (_, _, Some((spec, n))) =>
        // $sort over the joined output names (missing right side of a
        // left-outer row sorts as null), then the partial $limit — kept
        // bounded: only n rows live in the heap, not the full join
        val cmp: Ordering[BDoc] = (a, b) => {
          var r = 0
          val it = spec.iterator
          while (r == 0 && it.hasNext) {
            val (k, desc) = it.next()
            val c = BsonOrdering.compare(
              a.getPath(k).getOrElse(BNull), b.getPath(k).getOrElse(BNull))
            r = if (desc) -c else c
          }
          r
        }
        if (n < Int.MaxValue)
          FakeServerClient.stableTopK(rows, cmp, math.max(0L, n).toInt)
        else rows.toVector.sorted(cmp).iterator
          .take(math.min(n, Int.MaxValue.toLong).toInt)
      case _ => rows
    }
  }

  /** One lookup stage as a hash join: project the driving docs to their
    * output names, index the right side in memory (the fake is a
    * transport stand-in — a real server walks the right collection's
    * index per driving doc), match on `$expr`-`$eq` VALUE equality
    * across numeric storages via a canonical key form.
    */
  private def stageJoin(driving: Iterator[BDoc],
      leftProject: Seq[(String, String)], rightNs: String,
      rightQuery: BQuery, rightProject: Seq[(String, String)],
      keys: Seq[(String, String)], leftOuter: Boolean,
      /** range conjuncts of the `$expr` (base join r17, chained stages
        * r18): evaluated on the hash-equality hits with
        * [[LookupJoin.rangeMatches]], the same
        * BSON-order comparison the wire pipeline runs; null/missing
        * operands never match, so a LEFT OUTER row whose range operand
        * is null null-extends exactly like Spark. */
      ranges: Seq[LookupJoin.RangeKey] = Nil,
      /** lookup-side derived columns: `$set` FIRST in the sub-pipeline
        * (before the rightQuery `$match`, which may carry the non-null
        * prune on a computed key). */
      rightComputed: Seq[graft.query.ComputedCol] = Nil): Iterator[BDoc] = {
    def canon(v: BsonValue): Any = v match {
      case BInt32(x) => x.toLong
      case BInt64(x) => x
      // integral doubles inside the exact-long window equal their ints
      case BDouble(x) if x == math.rint(x) && math.abs(x) <= 9.007199254740992E15 =>
        x.toLong
      case other => other
    }
    def project(d: BDoc, spec: Seq[(String, String)]): Seq[(String, BsonValue)] =
      spec.flatMap { case (f, o) => d.getPath(f).map(o -> _) }
    // key outputs may be NESTED under a projected struct column
    val rightKeyFields = keys.map { case (_, ro) =>
      LookupJoin.fieldOf(rightProject, ro) }
    // projected decode of the lookup side: query/projection/key/range/
    // computed fields only
    val rightNeeded: Set[String] =
      BQuery.fieldPaths(rightQuery) ++ rightProject.map(_._1) ++
        rightKeyFields ++
        ranges.map(r => LookupJoin.fieldOf(rightProject, r.rightOut)) ++
        rightComputed.map(_.field)
    val index: Map[Seq[Any], Vector[BDoc]] =
      coll(rightNs).readAll(Some(rightNeeded))
        .map(d => graft.query.ComputedCol.injectAll(rightComputed, d))
        .filter(rightQuery.matches)
        .filter(d => rightKeyFields.forall(f => d.getPath(f).exists(_ != BNull)))
        .toVector
        .groupBy(d => rightKeyFields.map(f => canon(d.getPath(f).get)))
    // range operands reference right DOC fields ($expr runs before the
    // right projection), like the key equalities
    val rangeRightFields = ranges.map(r =>
      LookupJoin.fieldOf(rightProject, r.rightOut))
    driving.flatMap { ld =>
      val lFields = project(ld, leftProject)
      // keys are OUTPUT names — look them up on the projected doc
      val projected = BDoc(ListMap(lFields: _*))
      val kvs = keys.map { case (lo, _) =>
        projected.getPath(lo).filter(_ != BNull) }
      val hits: Vector[BDoc] =
        if (kvs.exists(_.isEmpty)) Vector.empty
        else index.getOrElse(kvs.map(v => canon(v.get)), Vector.empty)
          .filter(rd => ranges.zip(rangeRightFields).forall {
            case (r, rf) => LookupJoin.rangeMatches(r.op,
              projected.getPath(r.leftOut), rd.getPath(rf))
          })
      if (hits.isEmpty) {
        if (leftOuter) Iterator.single(projected)
        else Iterator.empty
      } else hits.iterator.map(rd =>
        BDoc(ListMap(lFields ++ project(rd, rightProject): _*)))
    }
  }

  /** A real server serializes concurrent client bulkWrites server-side;
    * the file-backed double serializes in-JVM per namespace directory
    * (sound under local[k], where all "executors" share this JVM — the
    * double is a transport stand-in, not a storage engine).
    *
    * Pure-insert batches APPEND, like a server does — the store's staged
    * read-fold-rewrite apply is all-or-nothing per call, which is both
    * stronger than mongo bulk semantics (documents before an ordered
    * failure stay inserted there) and quadratic when a write job streams
    * hundreds of batches at one collection. Duplicate-key detection uses
    * a JVM-wide per-collection `_id` set — the unique-index stand-in —
    * seeded by one file read and invalidated whenever the staged path
    * (updates/upserts, which can mint ids) runs.
    */
  override def bulkWrite(ns: String, models: Iterator[WriteModel], ordered: Boolean): BulkResult = {
    tick("bulkWrite")
    val c = coll(ns)
    val batch = models.toVector
    if (c.shardCount == 1 && batch.forall(_.isInstanceOf[InsertOne])) {
      // encode OUTSIDE the per-collection lock: concurrent writer tasks
      // otherwise serialize their whole CPU cost (Row→BSON bytes) through
      // one lock, leaving only one core busy during a parallel seed write.
      // The lock then covers only the id-uniqueness check and the append.
      val inserts = batch.asInstanceOf[Vector[InsertOne]]
      val encoded = inserts.map(m => (m.doc.get("_id"), BsonCodec.encode(m.doc)))
      FakeServerClient.lockFor(c.dir).synchronized {
        appendInserts(c, encoded, ordered)
      }
    } else FakeServerClient.lockFor(c.dir).synchronized {
      FakeServerClient.knownIds.remove(c.dir)
      c.bulkWrite(batch.iterator, ordered)
    }
  }

  private def appendInserts(c: BsonCollection,
      encoded: Vector[(Option[BsonValue], Array[Byte])],
      ordered: Boolean): BulkResult = {
    import java.nio.file.{Files => F}
    val dataPath = BsonCollection.shardPath(c.dir, 1, 0)
    val ids = FakeServerClient.knownIds.computeIfAbsent(c.dir, _ => {
      val s = scala.collection.mutable.HashSet.empty[BsonValue]
      if (F.exists(dataPath))
        graft.files.BsonFiles.readAll(dataPath.toString)
          .foreach(d => d.get("_id").foreach(s += _))
      s
    })
    val out = new java.io.BufferedOutputStream(
      new java.io.FileOutputStream(dataPath.toString, true), 1 << 20)
    var inserted = 0L
    val errors = Seq.newBuilder[String]
    try {
      encoded.foreach { case (idOpt, bytes) =>
        idOpt match {
          case Some(id) if ids.contains(id) =>
            if (ordered)
              throw new IllegalStateException(s"duplicate key _id=$id on insert")
            else errors += s"duplicate key _id=$id"
          case _ =>
            out.write(bytes)
            idOpt.foreach(ids += _)
            inserted += 1
        }
      }
    } finally {
      out.close()
      // the .splits side file (written by staged applies) no longer covers
      // the appended tail — drop it; readers fall back to header walks
      F.deleteIfExists(
        dataPath.resolveSibling("." + dataPath.getFileName + ".splits"))
    }
    BulkResult(inserted, 0, 0, 0, errors.result())
  }
}

object FakeServerClient {
  /** The first `k` docs of a STABLE sort under `cmp`, computed with a
    * bounded heap (O(n log k) and k live docs) instead of materializing
    * and sorting the whole input — the cost shape of a real server's
    * index-walk sort-with-limit. Ties keep input order (the sequence
    * number joins the heap key), so the result is element-for-element
    * identical to `input.toVector.sorted(cmp).take(k)`.
    */
  private[server] def stableTopK(docs: Iterator[BDoc], cmp: Ordering[BDoc],
      k: Int): Iterator[BDoc] = {
    if (k <= 0) return Iterator.empty
    val ord = new java.util.Comparator[(BDoc, Long)] {
      override def compare(a: (BDoc, Long), b: (BDoc, Long)): Int = {
        val c = cmp.compare(a._1, b._1)
        if (c != 0) c else java.lang.Long.compare(a._2, b._2)
      }
    }
    // max-heap of the k smallest (cmp, seq) pairs
    val heap = new java.util.PriorityQueue[(BDoc, Long)](k + 1, ord.reversed())
    var seq = 0L
    docs.foreach { d =>
      heap.add((d, seq))
      seq += 1
      if (heap.size > k) heap.poll()
    }
    val arr = new Array[BDoc](heap.size)
    var i = heap.size - 1
    while (i >= 0) { arr(i) = heap.poll()._1; i -= 1 }
    arr.iterator
  }

  /** What a real server computes from a `$group` stage over `docs` —
    * shared by [[FakeServerClient.groupAggregate]] and the grouped arm
    * of [[FakeServerClient.lookupJoin]]. Zero group keys = the
    * `_id: null` global pipeline: one group when anything matched, NO
    * output doc otherwise. Null/missing values are skipped by
    * min/max/sum (mongo semantics); an empty aggregate is BNull; sum
    * stays integral while every addend is integral ($sum promotion).
    */
  /** Streaming SUM state mirroring the Vector spelling exactly: the long
    * sum wraps like `Vector[Long].sum`; once any non-int value appears
    * the result is the DOUBLE left-fold over every value in encounter
    * order — so the double accumulator runs from the first value (its
    * additions are the identical IEEE sequence the materialized
    * `vs.map(toDouble).sum` performed). */
  private final class SumState {
    var any = false
    var allInt = true
    var lsum = 0L
    var dsum = 0.0
    def add(v: BsonValue): Unit = v match {
      case BInt32(x) => any = true; lsum += x.toLong; dsum += x.toDouble
      case BInt64(x) => any = true; lsum += x; dsum += x.toDouble
      case BDouble(x) => any = true; allInt = false; dsum += x
      case _ => any = true; allInt = false; dsum += 0.0
    }
    def result: BsonValue =
      if (!any) BNull else if (allInt) BInt64(lsum) else BDouble(dsum)
  }

  private[server] def groupFold(matched: IterableOnce[BDoc], groupKeys: Seq[String],
      aggs: Seq[GroupAgg]): Iterator[BDoc] = {
    // ONE streaming pass: per-group constant-size aggregate states instead
    // of materializing every row into per-group vectors and re-walking
    // them once per aggregate — the $group memory shape a real server has
    // (O(#groups), not O(#rows))
    val aggsArr = aggs.toArray
    val groups = new java.util.LinkedHashMap[Seq[BsonValue], Array[Any]]()
    val it = matched.iterator
    while (it.hasNext) {
      val d = it.next()
      val key = groupKeys.map(k => d.getPath(k).getOrElse(BNull))
      var st = groups.get(key)
      if (st == null) { st = new Array[Any](aggsArr.length); groups.put(key, st) }
      var i = 0
      while (i < aggsArr.length) {
        aggsArr(i) match {
          case GroupAgg.CountAll(_) =>
            st(i) = (if (st(i) == null) 0L else st(i).asInstanceOf[Long]) + 1L
          case GroupAgg.CountCol(c, _) =>
            val prev = if (st(i) == null) 0L else st(i).asInstanceOf[Long]
            st(i) = prev + (if (d.getPath(c).exists(_ != BNull)) 1L else 0L)
          case GroupAgg.MinOf(c, _) =>
            d.getPath(c) match {
              case Some(v) if v != BNull =>
                val p = st(i).asInstanceOf[BsonValue]
                if (p == null || BsonOrdering.compare(v, p) < 0) st(i) = v
              case _ => ()
            }
          case GroupAgg.MaxOf(c, _) =>
            d.getPath(c) match {
              case Some(v) if v != BNull =>
                val p = st(i).asInstanceOf[BsonValue]
                if (p == null || BsonOrdering.compare(v, p) > 0) st(i) = v
              case _ => ()
            }
          case GroupAgg.SumOf(c, _) =>
            d.getPath(c) match {
              case Some(v) if v != BNull =>
                var s = st(i).asInstanceOf[SumState]
                if (s == null) { s = new SumState; st(i) = s }
                s.add(v)
              case _ => ()
            }
        }
        i += 1
      }
    }
    import scala.jdk.CollectionConverters._
    groups.entrySet().iterator().asScala.map { e =>
      val (gvs, st) = (e.getKey, e.getValue)
      val fields = aggsArr.toSeq.zipWithIndex.map {
        case (GroupAgg.CountAll(a), i) =>
          a -> BInt64(if (st(i) == null) 0L else st(i).asInstanceOf[Long])
        case (GroupAgg.CountCol(_, a), i) =>
          a -> BInt64(if (st(i) == null) 0L else st(i).asInstanceOf[Long])
        case (GroupAgg.MinOf(_, a), i) =>
          a -> (if (st(i) == null) BNull else st(i).asInstanceOf[BsonValue])
        case (GroupAgg.MaxOf(_, a), i) =>
          a -> (if (st(i) == null) BNull else st(i).asInstanceOf[BsonValue])
        case (GroupAgg.SumOf(_, a), i) =>
          a -> (if (st(i) == null) BNull else st(i).asInstanceOf[SumState].result)
      }
      BDoc(ListMap(groupKeys.zip(gvs) ++ fields: _*))
    }
  }

  /** What a real server's `$unwind` emits for one document: one doc per
    * array element with the field REPLACED by the element; null/missing/
    * empty-array docs drop (or pass with a null/absent field under
    * `preserveNullAndEmptyArrays`); a NON-array value passes the doc
    * unchanged (mongo treats it as a one-element array).
    */
  /** [[ServerClient.Unwind]]-dispatched unwind: the array form or the
    * MAP form (`$objectToArray` + `$unwind` — one entry doc per field,
    * `__graft_kv = {k, v}`; a non-document value at the path throws,
    * exactly like a real server's `$objectToArray`). */
  private[server] def unwindDocs(d: BDoc, u: ServerClient.Unwind): Seq[BDoc] =
    if (!u.mapKv) unwindDoc(d, u.path, u.preserveNullAndEmpty, u.posField)
    else graft.plans.UnwindRelocate.mapEntries(d, u.path,
      u.preserveNullAndEmpty,
      // posexplode of a map: the entry index rides includeArrayIndex on
      // the kv $unwind — int64 on entries (NumberLong, like a real
      // server), explicit NULL otherwise
      (doc, i) => u.posField match {
        case Some(f) => graft.query.Updates.setField(doc, f,
          i.map(x => BInt64(x.toLong): BsonValue).getOrElse(BNull))
        case None => doc
      })

  private[server] def unwindDoc(d: BDoc, path: String,
      preserve: Boolean, posField: Option[String] = None): Seq[BDoc] = {
    // includeArrayIndex: int64 index on array elements (a real server
    // emits NumberLong), explicit NULL otherwise — mongo's rule
    def withPos(doc: BDoc, i: Option[Int]): BDoc = posField match {
      case Some(f) => graft.query.Updates.setField(doc, f,
        i.map(x => BInt64(x.toLong): BsonValue).getOrElse(BNull))
      case None => doc
    }
    d.getPath(path) match {
      case Some(BArray(items)) if items.nonEmpty =>
        items.zipWithIndex.map { case (el, i) =>
          withPos(graft.query.Updates.setField(d, path, el), Some(i)) }
      case Some(BArray(_)) => // empty array
        if (preserve)
          Seq(withPos(graft.query.Updates.setField(d, path, BNull), None))
        else Nil
      case Some(BNull) | None =>
        if (preserve) Seq(withPos(d, None)) else Nil
      case Some(_) => Seq(withPos(d, None)) // non-array passes (server rule)
    }
  }

  private val writeLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private[server] def lockFor(dir: String): Object =
    writeLocks.computeIfAbsent(dir, _ => new Object)

  /** Unique-index stand-in: `_id`s present per collection dir, shared
    * JVM-wide so every client instance (one per task) sees one index —
    * valid under local[k] exactly like the write lock above.
    */
  private[server] val knownIds =
    new java.util.concurrent.ConcurrentHashMap[String, scala.collection.mutable.HashSet[BsonValue]]()
}
