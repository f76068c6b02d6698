package graft.store

import graft.bson._
import graft.query.{BQuery, UpdateModel}

import scala.collection.immutable.ListMap

/** Write-model wire shape: insert docs as-is; update ops wrapped as
  * {"__op": mode, "q": {...}, "u": {...}, "upsert": b, "multi": b}.
  * Task writers encode with `toDoc`, the per-shard apply decodes with
  * `fromDoc` — the same doc-shaped envelope the reference streams through
  * its task temp files (core/.../io/MongoUpdateWritable.java:38-64).
  */
object WriteModels {
  def toDoc(mode: String, row: BDoc, keys: Seq[String], updateOp: String,
      multi: Boolean, idColumn: Option[String]): BDoc = {
    val doc = idColumn match {
      case Some(c) if row.get(c).isDefined && c != "_id" =>
        // id_column WINS over a pre-existing _id column (the key-merge
        // convention: the chosen key IS the identity)
        BDoc(ListMap("_id" -> row.get(c).get) ++
          row.fields.removed(c).removed("_id"))
      case _ => row
    }
    mode match {
      case "insert" => doc
      case m =>
        // getPath, not get: keys may be dotted document-space paths
        // (column_mapping nests fields before key extraction)
        val q = BDoc(ListMap(keys.map(k => k -> doc.getPath(k).getOrElse(BNull)): _*))
        val rest = BDoc(doc.fields.filterNot { case (k, _) => keys.contains(k) })
        val u = (m, updateOp) match {
          // replace stores the FULL doc (keys included) — mongo replaceOne
          // semantics; stripping key fields would lose them permanently
          // since the store's replace keeps only the matched _id
          case ("replace", _) => doc
          case (_, "set") => BDoc("$set" -> rest)
          case (_, "inc") => BDoc("$inc" -> rest)
          case (_, "push") => BDoc("$push" -> rest)
          case (_, "pushAll") => BDoc("$pushAll" -> rest)
          case (_, other) => throw new IllegalArgumentException(s"unknown update_op $other")
        }
        BDoc(
          "__op" -> BString(m), "q" -> q, "u" -> u,
          "upsert" -> BBool(m == "upsert"),
          "multi" -> BBool(multi))
    }
  }

  /** One field of a write-model query: plain values mean equality, an
    * all-`$` operator document carries comparison operators — a
    * `query_template` like `{"qty": {"$lt": "$threshold"}}` must become a
    * Lt, not an Eq against the literal operator doc (which compares a BDoc
    * to a number and silently matches nothing).
    */
  private def fieldQuery(k: String, v: BsonValue): BQuery = v match {
    case d: BDoc if d.fields.nonEmpty && d.fields.keys.forall(_.startsWith("$")) =>
      d.fields.foldLeft[BQuery](BQuery.True) {
        case (acc, ("$eq", x)) => BQuery.and(acc, BQuery.Eq(k, x))
        case (acc, ("$gt", x)) => BQuery.and(acc, BQuery.Gt(k, x))
        case (acc, ("$gte", x)) => BQuery.and(acc, BQuery.Gte(k, x))
        case (acc, ("$lt", x)) => BQuery.and(acc, BQuery.Lt(k, x))
        case (acc, ("$lte", x)) => BQuery.and(acc, BQuery.Lte(k, x))
        case (acc, ("$ne", x)) => BQuery.and(acc, BQuery.Ne(k, x))
        case (acc, ("$in", BArray(xs))) => BQuery.and(acc, BQuery.In(k, xs))
        case (acc, ("$nin", BArray(xs))) => BQuery.and(acc, BQuery.Nin(k, xs))
        case (acc, ("$exists", BBool(b))) => BQuery.and(acc, BQuery.Exists(k, b))
        case (_, (op, _)) => throw new IllegalArgumentException(
          s"unsupported operator $op in keyed write query for field $k")
      }
    case _ => BQuery.Eq(k, v)
  }

  def fromDoc(d: BDoc): WriteModel = d.get("__op") match {
    case None => InsertOne(d)
    case Some(BString(mode)) =>
      val q = d.get("q").collect { case qd: BDoc => qd }.getOrElse(BDoc.empty)
      val u = d.get("u").collect { case ud: BDoc => ud }.getOrElse(BDoc.empty)
      val upsert = d.get("upsert").contains(BBool(true))
      val multi = d.get("multi").contains(BBool(true))
      val query = q.fields.foldLeft[BQuery](BQuery.True) {
        case (acc, (k, v)) => BQuery.and(acc, fieldQuery(k, v))
      }
      UpdateOp(UpdateModel(query, u, upsert = upsert, multi = multi,
        replace = mode == "replace"))
    case other => throw new IllegalArgumentException(s"bad __op $other")
  }
}
