package graft.store

import graft.bson._
import graft.files.BsonFiles
import graft.query.{BQuery, UpdateModel, Updates}

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.collection.immutable.ListMap
import scala.collection.mutable

/** A file-backed "collection": one BSON dump file keyed by `_id`, with
  * bulk-write semantics (insert / replace / update / upsert / multi) and
  * commit-time atomicity (write temp, atomic rename) — the sandbox stand-in
  * for a live server, behind which the same writer/reader code would talk
  * to a real backend. Write semantics follow the reference's bulk commit
  * (core/.../output/MongoOutputCommitter.java:91-186).
  */
final class BsonCollection(val dir: String) {
  private def dataPath: Path = Paths.get(dir, "data.bson")
  private def indexPath: Path = Paths.get(dir, "indexes.txt")

  def exists: Boolean = Files.exists(dataPath)

  def readAll(): Iterator[BDoc] =
    if (!exists) Iterator.empty else BsonFiles.readAll(dataPath.toString)

  def count(): Long = readAll().size.toLong

  /** Declared indexes (ensure-index parity: recorded, used as metadata). */
  def ensureIndex(fields: Seq[String]): Unit = {
    Files.createDirectories(Paths.get(dir))
    val existing = indexes()
    if (!existing.contains(fields)) {
      val all = existing :+ fields
      Files.writeString(indexPath, all.map(_.mkString(",")).mkString("\n"))
    }
  }

  def indexes(): Seq[Seq[String]] =
    if (!Files.exists(indexPath)) Seq.empty
    else Files.readString(indexPath).split('\n').filter(_.nonEmpty).toSeq.map(_.split(',').toSeq)

  sealed trait WriteModel
  final case class InsertOne(doc: BDoc) extends WriteModel
  final case class UpdateOp(model: UpdateModel) extends WriteModel

  final case class BulkResult(inserted: Long, matched: Long, modified: Long,
      upserted: Long, errors: Seq[String] = Seq.empty)

  /** Apply a bulk of write models in order and commit atomically.
    * `ordered = false` continues past per-model errors (duplicate keys)
    * and reports them in the result — the reference's unordered-bulk
    * semantics (MongoConfigUtil.isBulkOrdered:645-647).
    */
  def bulkWrite(models: Iterator[WriteModel], ordered: Boolean = true): BulkResult = {
    Files.createDirectories(Paths.get(dir))
    // load current state: insertion-ordered, keyed by _id where present
    val byId = mutable.LinkedHashMap[BsonValue, BDoc]()
    val anonymous = mutable.ArrayBuffer[BDoc]()
    readAll().foreach { d =>
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
              BDoc(ListMap("_id" -> BObjectId(freshObjectId())) ++ seed.fields)
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
    val finalDocs = allDocs.toVector
    val tmpName = dataPath.toString + ".commit-tmp"
    BsonFiles.write(tmpName, finalDocs.iterator)
    val tmpPath = Paths.get(tmpName)
    val tmpSide = tmpPath.resolveSibling("." + tmpPath.getFileName + ".splits")
    val side = dataPath.resolveSibling("." + dataPath.getFileName + ".splits")
    Files.move(tmpPath, dataPath, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
    if (Files.exists(tmpSide))
      Files.move(tmpSide, side, StandardCopyOption.REPLACE_EXISTING)
    BulkResult(inserted, matched, modified, upserted, errors.result())
  }

  private var oidCounter = 0L
  private def freshObjectId(): String = {
    oidCounter += 1
    f"${(System.currentTimeMillis() / 1000).toInt}%08x${oidCounter}%016x"
  }
}

object BsonCollection {
  /** The `_id`-equality conjunct of a query, if any. */
  private[store] def idEquality(q: BQuery): Option[BsonValue] = q match {
    case BQuery.Eq("_id", v) => Some(v)
    case BQuery.And(qs) => qs.iterator.map(idEquality).collectFirst { case Some(v) => v }
    case _ => None
  }

  /** Map keys that could hold a doc whose `_id` EQUALS `v` under BSON
    * comparison semantics: numbers compare cross-width (BInt32(5) ==
    * BInt64(5)), so a point lookup must probe every exactly-equal-valued
    * width; non-numeric ids are exact.
    */
  private[store] def idLookups(v: BsonValue): Seq[BsonValue] = {
    val variants = v match {
      case BInt32(x) => Seq(BInt64(x.toLong), BDouble(x.toDouble))
      case BInt64(x) =>
        (if (x >= Int.MinValue && x <= Int.MaxValue) Seq(BInt32(x.toInt)) else Nil) ++
          (if (x.toDouble.toLong == x) Seq(BDouble(x.toDouble)) else Nil)
      case BDouble(x) if x.isWhole =>
        (if (x >= Int.MinValue && x <= Int.MaxValue) Seq(BInt32(x.toInt)) else Nil) ++
          (if (x >= Long.MinValue.toDouble && x <= Long.MaxValue.toDouble)
            Seq(BInt64(x.toLong)) else Nil)
      case _ => Nil
    }
    v +: variants
  }
}
