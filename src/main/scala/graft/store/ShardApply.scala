package graft.store

import graft.bson._
import graft.files.BsonFiles
import graft.query.{UpdateModel, Updates}

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.collection.immutable.ListMap
import scala.collection.mutable

/** A bulk write model: plain insert or a keyed update/replace/upsert. */
sealed trait WriteModel extends Serializable
final case class InsertOne(doc: BDoc) extends WriteModel
final case class UpdateOp(model: UpdateModel) extends WriteModel

final case class BulkResult(inserted: Long, matched: Long, modified: Long,
    upserted: Long, errors: Seq[String] = Seq.empty) {
  def merge(o: BulkResult): BulkResult =
    BulkResult(inserted + o.inserted, matched + o.matched,
      modified + o.modified, upserted + o.upserted, errors ++ o.errors)
}

object BulkResult { val empty: BulkResult = BulkResult(0, 0, 0, 0) }

/** Shard routing for the sharded store: a model routes to ONE shard when
  * its identity is known (`_id` on an insert, an `_id`-equality conjunct
  * on an update), is broadcast to every shard for multi-updates, and is
  * rejected otherwise — mirroring the real constraint a sharded MongoDB
  * cluster places on writes (updateOne/upsert must carry the shard key;
  * multi-updates are scatter-gathered to all shards).
  */
object ShardRouting {

  /** Route for a model on an `s`-shard store: `Some(k)` = apply on shard
    * k only; `None` = broadcast to every shard. `anonSeed` spreads
    * `_id`-less inserts deterministically.
    */
  def route(m: WriteModel, s: Int, anonSeed: Long): Option[Int] = m match {
    case _ if s == 1 => Some(0)
    case InsertOne(doc) => Some(doc.get("_id") match {
      case Some(id) => idShard(id, s)
      case None => ((anonSeed * 2654435761L >>> 8) % s).toInt
    })
    case UpdateOp(um) => BsonCollection.idEquality(um.query) match {
      case Some(id) => Some(idShard(id, s))
      case None if um.multi && !um.upsert => None
      case None => throw new IllegalArgumentException(
        "updateOne/upsert on a sharded collection requires an _id equality " +
          "in the query (same restriction as a sharded server deployment); " +
          s"got query without routable _id: ${um.query}")
    }
  }

  /** Shard of an `_id` value. Numeric ids are canonicalized first so the
    * cross-width equalities the store honors (BInt32(5) == BInt64(5) ==
    * BDouble(5.0)) land on the same shard; distinct-type collisions are
    * harmless (routing only needs equal values to co-locate).
    */
  def idShard(v: BsonValue, s: Int): Int = {
    val h = v match {
      case BInt32(x) => fnv(longBytes(x.toLong))
      case BInt64(x) => fnv(longBytes(x))
      case BDouble(x) if !x.isNaN && !x.isInfinite && x.isWhole &&
        x >= Long.MinValue.toDouble && x <= Long.MaxValue.toDouble =>
        fnv(longBytes(x.toLong))
      case BDouble(x) => fnv(longBytes(java.lang.Double.doubleToLongBits(x)))
      case BString(x) => fnv(x.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      case BObjectId(hex) => fnv(hex.toLowerCase.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      case BDate(ms) => fnv(longBytes(ms))
      case BBool(b) => fnv(Array(if (b) 1.toByte else 0.toByte))
      case other => fnv(BsonCodec.encode(BDoc("k" -> other)))
    }
    ((h % s) + s).toInt % s
  }

  private def longBytes(x: Long): Array[Byte] =
    Array.tabulate(8)(i => ((x >>> (8 * i)) & 0xff).toByte)

  private def fnv(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) { h ^= bytes(i) & 0xff; h *= 0x100000001b3L; i += 1 }
    h & Long.MaxValue
  }
}

/** One shard's apply work at job commit: the shard's base file plus the
  * committed per-partition segment files that route to it (and the
  * broadcast segments every shard replays). Pure data — it is shipped to
  * an executor and run there, so commit never moves document bytes
  * through the driver.
  */
final case class ShardTask(shardFile: String, shard: Int,
    routedSegs: Seq[(Int, String)], broadcastSegs: Seq[(Int, String)],
    ordered: Boolean) extends Serializable

/** The per-file bulk apply: load ONE shard (bounded by shard size, never
  * the whole collection), apply models in deterministic (partitionId,
  * sequence) order, and commit atomically via temp-file + rename. This is
  * the executor-side analog of the reference applying each task's bulk on
  * the server at task commit (core/.../output/MongoOutputCommitter
  * .java:91-186) — here the "server" is a shard file on shared storage
  * that exactly one task owns during the apply phase.
  */
object ShardApply {

  /** Run one shard's apply: merge the shard's routed segments with the
    * broadcast segments partition-by-partition (interleaved by the
    * per-model `__seq` written by the task writer, so routed and
    * broadcast models from one partition replay in original order).
    */
  def run(t: ShardTask): BulkResult = {
    val routedByPid = t.routedSegs.groupBy(_._1)
    val bcastByPid = t.broadcastSegs.groupBy(_._1)
    val pids = (routedByPid.keySet ++ bcastByPid.keySet).toSeq.sorted
    val models: Iterator[WriteModel] = pids.iterator.flatMap { pid =>
      val r = routedByPid.getOrElse(pid, Nil).sortBy(_._2)
        .iterator.flatMap { case (_, f) => readSeg(f) }
      val b = bcastByPid.getOrElse(pid, Nil).sortBy(_._2)
        .iterator.flatMap { case (_, f) => readSeg(f) }
      mergeBySeq(r.buffered, b.buffered)
        .map { case (_, d) => WriteModels.fromDoc(d) }
    }
    applyModels(Paths.get(t.shardFile), models, t.ordered, t.shard)
  }

  private def readSeg(f: String): Iterator[(Long, BDoc)] =
    BsonFiles.readAll(f).map { d =>
      val seq = d.get("__seq") match {
        case Some(BInt64(n)) => n
        case _ => 0L
      }
      (seq, BDoc(d.fields.removed("__seq")))
    }

  /** Merge two (seq, doc) streams ascending by seq (both are written in
    * seq order, so this is a single-pass two-iterator merge).
    */
  private def mergeBySeq(a: BufferedIterator[(Long, BDoc)],
      b: BufferedIterator[(Long, BDoc)]): Iterator[(Long, BDoc)] =
    new Iterator[(Long, BDoc)] {
      override def hasNext: Boolean = a.hasNext || b.hasNext
      override def next(): (Long, BDoc) =
        if (!b.hasNext) a.next()
        else if (!a.hasNext) b.next()
        else if (a.head._1 <= b.head._1) a.next()
        else b.next()
    }

  /** Apply a bulk of write models in order against one shard file and
    * commit atomically. `ordered = false` continues past per-model errors
    * (duplicate keys) and reports them in the result — the reference's
    * unordered-bulk semantics (MongoConfigUtil.isBulkOrdered:645-647).
    */
  def applyModels(dataPath: Path, models: Iterator[WriteModel],
      ordered: Boolean, shardTag: Int = 0): BulkResult = {
    Files.createDirectories(dataPath.getParent)
    // load current shard state: insertion-ordered, keyed by _id where present
    val byId = mutable.LinkedHashMap[BsonValue, BDoc]()
    val anonymous = mutable.ArrayBuffer[BDoc]()
    if (Files.exists(dataPath))
      BsonFiles.readAll(dataPath.toString).foreach { d =>
        d.get("_id") match {
          case Some(id) => byId(id) = d
          case None => anonymous += d
        }
      }
    var inserted = 0L
    var matched = 0L
    var modified = 0L
    var upserted = 0L
    val errors = Seq.newBuilder[String]

    def allDocs: Iterator[BDoc] = byId.valuesIterator ++ anonymous.iterator

    models.foreach {
      case InsertOne(doc) =>
        doc.get("_id") match {
          case Some(id) =>
            if (byId.contains(id)) {
              if (ordered) throw new IllegalStateException(s"duplicate key _id=$id on insert")
              else errors += s"duplicate key _id=$id"
            } else {
              byId(id) = doc
              inserted += 1
            }
          case None =>
            anonymous += doc
            inserted += 1
        }

      case UpdateOp(UpdateModel(query, update, upsert, multi, replace)) =>
        // point-update fast path: an _id-equality conjunct routes through
        // the byId map (O(1)) instead of scanning every doc per model —
        // the write path's keyed update/upsert modes all hit this
        val hits = BsonCollection.idEquality(query) match {
          case Some(id) =>
            BsonCollection.idLookups(id).flatMap(byId.get)
              .filter(query.matches).toVector
          case None => allDocs.filter(query.matches).toVector
        }
        val targets = if (multi) hits else hits.take(1)
        if (targets.isEmpty) {
          if (upsert) {
            val seed = Updates.upsertSeed(query, update)
            val withId = if (seed.get("_id").isEmpty)
              BDoc(ListMap("_id" -> BObjectId(freshObjectId(shardTag))) ++ seed.fields)
            else seed
            byId(withId.get("_id").get) = withId
            upserted += 1
          }
        } else {
          targets.foreach { old =>
            matched += 1
            val next =
              if (replace || !Updates.isModifierUpdate(update)) {
                // replacement preserves the matched doc's _id
                old.get("_id") match {
                  case Some(id) => BDoc(ListMap("_id" -> id) ++ update.fields.removed("_id"))
                  case None => update
                }
              } else Updates.applyModifiers(old, update)
            if (next != old) modified += 1
            old.get("_id") match {
              case Some(id) => byId(id) = next
              case None =>
                val idx = anonymous.indexOf(old)
                if (idx >= 0) anonymous(idx) = next
            }
          }
        }
    }

    // atomic commit: write (data + .splits side file) under a temp name in
    // the same directory, then rename both into place
    val tmpName = dataPath.toString + ".commit-tmp"
    BsonFiles.write(tmpName, allDocs)
    val tmpPath = Paths.get(tmpName)
    val tmpSide = tmpPath.resolveSibling("." + tmpPath.getFileName + ".splits")
    val side = dataPath.resolveSibling("." + dataPath.getFileName + ".splits")
    Files.move(tmpPath, dataPath, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
    if (Files.exists(tmpSide))
      Files.move(tmpSide, side, StandardCopyOption.REPLACE_EXISTING)
    BulkResult(inserted, matched, modified, upserted, errors.result())
  }

  private val oidCounter = new java.util.concurrent.atomic.AtomicLong()
  /** Generated upsert ids embed the shard index so concurrent per-shard
    * applies can never collide.
    */
  private def freshObjectId(shard: Int): String = {
    val c = oidCounter.incrementAndGet()
    f"${(System.currentTimeMillis() / 1000).toInt}%08x${shard & 0xffff}%04x$c%012x"
  }
}
