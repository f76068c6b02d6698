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

  /** Apply update modifiers to a doc: $set / $inc / $unset / $push /
    * $pushAll / $addToSet / $pull / $pullAll / $pop / $min / $max / $mul /
    * $rename — the modifier surface the reference ships opaquely to the
    * server (core/.../io/MongoUpdateWritable.java:38-64 carries whatever
    * modifier doc the job emits; semantics follow the published MongoDB
    * update-operator behavior). Unknown operators still fail loudly.
    */
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
      case (acc, ("$addToSet", BDoc(adds))) =>
        adds.foldLeft(acc) { case (a, (k, v)) =>
          // {$each: [...]} adds every element; plain value adds one
          val toAdd = v match {
            case d: BDoc if d.fields.keySet == Set("$each") =>
              d.get("$each") match {
                case Some(BArray(items)) => items
                case other => throw new IllegalArgumentException(
                  s"$$addToSet $$each for $k must be an array, got $other")
              }
            case other => Vector(other)
          }
          val cur = a.getPath(k) match {
            case Some(BArray(items)) => items
            case _ => Vector.empty
          }
          val merged = toAdd.foldLeft(cur)((xs, x) => if (xs.contains(x)) xs else xs :+ x)
          setField(a, k, BArray(merged))
        }
      case (acc, ("$pull", BDoc(pulls))) =>
        pulls.foldLeft(acc) { case (a, (k, v)) =>
          a.getPath(k) match {
            case Some(BArray(items)) =>
              setField(a, k, BArray(items.filterNot(matchesPullCondition(_, k, v))))
            case _ => a
          }
        }
      case (acc, ("$pullAll", BDoc(pulls))) =>
        pulls.foldLeft(acc) { case (a, (k, v)) =>
          val gone = v match { case BArray(items) => items.toSet; case other => Set(other) }
          a.getPath(k) match {
            case Some(BArray(items)) => setField(a, k, BArray(items.filterNot(gone)))
            case _ => a
          }
        }
      case (acc, ("$pop", BDoc(pops))) =>
        pops.foldLeft(acc) { case (a, (k, v)) =>
          a.getPath(k) match {
            case Some(BArray(items)) if items.nonEmpty =>
              val keep = if (BsonOrdering.numeric(v) < 0) items.tail else items.init
              setField(a, k, BArray(keep))
            case _ => a
          }
        }
      case (acc, ("$min", BDoc(mins))) =>
        mins.foldLeft(acc) { case (a, (k, v)) =>
          a.getPath(k) match {
            case Some(cur) if BsonOrdering.compare(cur, v) <= 0 => a
            case _ => setField(a, k, v)
          }
        }
      case (acc, ("$max", BDoc(maxs))) =>
        maxs.foldLeft(acc) { case (a, (k, v)) =>
          a.getPath(k) match {
            case Some(cur) if BsonOrdering.compare(cur, v) >= 0 => a
            case _ => setField(a, k, v)
          }
        }
      case (acc, ("$mul", BDoc(muls))) =>
        muls.foldLeft(acc) { case (a, (k, v)) =>
          val next = a.getPath(k) match {
            case None | Some(BNull) =>
              // missing field: result is 0 of the multiplier's type
              v match {
                case BInt32(_) => BInt32(0)
                case BInt64(_) => BInt64(0L)
                case _ => BDouble(0.0)
              }
            case Some(cur) => mulNumbers(cur, v)
          }
          setField(a, k, next)
        }
      case (acc, ("$rename", BDoc(renames))) =>
        renames.foldLeft(acc) { case (a, (from, to)) =>
          (a.getPath(from), to) match {
            case (Some(v), BString(dest)) => setField(unsetField(a, from), dest, v)
            case _ => a
          }
        }
      case (_, (op, _)) if op.startsWith("$") =>
        throw new IllegalArgumentException(s"unsupported update operator $op")
      case (acc, _) => acc
    }
  }

  /** $pull condition: a plain value pulls equal elements; an operator doc
    * pulls elements matching the condition (evaluated via the query
    * matcher against a one-field wrapper).
    */
  private def matchesPullCondition(elem: BsonValue, field: String, cond: BsonValue): Boolean =
    cond match {
      case d: BDoc if d.fields.nonEmpty && d.fields.keys.forall(_.startsWith("$")) =>
        val q = d.fields.foldLeft[BQuery](BQuery.True) {
          case (acc, ("$eq", x)) => BQuery.and(acc, BQuery.Eq("x", x))
          case (acc, ("$gt", x)) => BQuery.and(acc, BQuery.Gt("x", x))
          case (acc, ("$gte", x)) => BQuery.and(acc, BQuery.Gte("x", x))
          case (acc, ("$lt", x)) => BQuery.and(acc, BQuery.Lt("x", x))
          case (acc, ("$lte", x)) => BQuery.and(acc, BQuery.Lte("x", x))
          case (acc, ("$ne", x)) => BQuery.and(acc, BQuery.Ne("x", x))
          case (acc, ("$in", BArray(xs))) => BQuery.and(acc, BQuery.In("x", xs))
          case (acc, ("$nin", BArray(xs))) => BQuery.and(acc, BQuery.Nin("x", xs))
          case (_, (op, _)) => throw new IllegalArgumentException(
            s"unsupported operator $op in $$pull condition for $field")
        }
        q.matches(BDoc("x" -> elem))
      case plain => elem == plain
    }

  private def mulNumbers(cur: BsonValue, mul: BsonValue): BsonValue = (cur, mul) match {
    case (BInt32(a), BInt32(b)) => BInt32(a * b)
    case (BInt32(a), BInt64(b)) => BInt64(a * b)
    case (BInt64(a), BInt32(b)) => BInt64(a * b)
    case (BInt64(a), BInt64(b)) => BInt64(a * b)
    case (a, b) => BDouble(BsonOrdering.numeric(a) * BsonOrdering.numeric(b))
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
