package graft.query

import graft.bson._

import scala.collection.immutable.ListMap

/** Update-record semantics: (query, modifiers | replacement, upsert,
  * multi, replace) — the write-mode surface of the reference
  * (core/.../io/MongoUpdateWritable.java:38-123 field set;
  * core/.../output/MongoOutputCommitter.java:127-183 mode dispatch).
  */
final case class UpdateModel(
    query: BQuery,
    update: BDoc,
    upsert: Boolean = false,
    multi: Boolean = false,
    replace: Boolean = false)

object Updates {

  /** Does the update doc use $-modifiers (vs whole-document replacement)? */
  def isModifierUpdate(u: BDoc): Boolean = u.fields.keys.exists(_.startsWith("$"))

  /** Apply $set / $inc / $unset / $push / $pushAll modifiers to a doc. */
  def applyModifiers(doc: BDoc, update: BDoc): BDoc = {
    update.fields.foldLeft(doc) {
      case (acc, ("$set", BDoc(sets))) =>
        sets.foldLeft(acc) { case (a, (k, v)) => setField(a, k, v) }
      case (acc, ("$unset", BDoc(unsets))) =>
        unsets.keys.foldLeft(acc)((a, k) => unsetField(a, k))
      case (acc, ("$inc", BDoc(incs))) =>
        incs.foldLeft(acc) { case (a, (k, v)) =>
          val cur = a.getPath(k)
          setField(a, k, addNumbers(cur, v))
        }
      case (acc, ("$push", BDoc(pushes))) =>
        pushes.foldLeft(acc) { case (a, (k, v)) =>
          val arr = a.getPath(k) match {
            case Some(BArray(items)) => BArray(items :+ v)
            case _ => BArray(Vector(v))
          }
          setField(a, k, arr)
        }
      case (acc, ("$pushAll", BDoc(pushes))) =>
        pushes.foldLeft(acc) { case (a, (k, v)) =>
          val add = v match { case BArray(items) => items; case other => Vector(other) }
          val arr = a.getPath(k) match {
            case Some(BArray(items)) => BArray(items ++ add)
            case _ => BArray(add)
          }
          setField(a, k, arr)
        }
      case (_, (op, _)) if op.startsWith("$") =>
        throw new IllegalArgumentException(s"unsupported update operator $op")
      case (acc, _) => acc
    }
  }

  private def addNumbers(cur: Option[BsonValue], inc: BsonValue): BsonValue = (cur, inc) match {
    case (None | Some(BNull), v) => v
    case (Some(BInt32(a)), BInt32(b)) => BInt32(a + b)
    case (Some(BInt32(a)), BInt64(b)) => BInt64(a + b)
    case (Some(BInt64(a)), BInt32(b)) => BInt64(a + b)
    case (Some(BInt64(a)), BInt64(b)) => BInt64(a + b)
    case (Some(a), b) => BDouble(BsonOrdering.numeric(a) + BsonOrdering.numeric(b))
  }

  /** Set a (possibly dotted) path, creating intermediate documents. */
  def setField(doc: BDoc, path: String, v: BsonValue): BDoc = {
    val segs = path.split('.')
    def rec(d: BDoc, i: Int): BDoc = {
      val seg = segs(i)
      if (i == segs.length - 1) BDoc(d.fields.updated(seg, v))
      else {
        val child = d.get(seg) match {
          case Some(c: BDoc) => c
          case _ => BDoc.empty
        }
        BDoc(d.fields.updated(seg, rec(child, i + 1)))
      }
    }
    rec(doc, 0)
  }

  def unsetField(doc: BDoc, path: String): BDoc = {
    val segs = path.split('.')
    def rec(d: BDoc, i: Int): BDoc = {
      val seg = segs(i)
      if (i == segs.length - 1) BDoc(d.fields.removed(seg))
      else d.get(seg) match {
        case Some(c: BDoc) => BDoc(d.fields.updated(seg, rec(c, i + 1)))
        case _ => d
      }
    }
    rec(doc, 0)
  }

  /** Seed document for an upsert miss: equality fields of the query
    * become the base (MongoDB upsert rule), then modifiers apply.
    */
  def upsertSeed(query: BQuery, update: BDoc): BDoc = {
    val base = equalityFields(query).foldLeft(BDoc.empty) {
      case (d, (k, v)) => setField(d, k, v)
    }
    if (isModifierUpdate(update)) applyModifiers(base, update)
    else {
      // replacement upsert: replacement wins, query _id carried over
      equalityFields(query).collectFirst { case ("_id", v) => v } match {
        case Some(id) if update.get("_id").isEmpty =>
          BDoc(ListMap("_id" -> id) ++ update.fields)
        case _ => update
      }
    }
  }

  private def equalityFields(q: BQuery): Seq[(String, BsonValue)] = q match {
    case BQuery.Eq(p, v) => Seq(p -> v)
    case BQuery.And(qs) => qs.flatMap(equalityFields)
    case _ => Seq.empty
  }
}
