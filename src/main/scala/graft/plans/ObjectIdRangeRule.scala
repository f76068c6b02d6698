package graft.plans

import graft.functions.{ObjectIdToSeconds, ToObjectId}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}

/** Optimizer rule: a predicate on `objectid_to_seconds(oid)` implies a
  * string-range predicate on the canonical (lowercase-hex) ObjectId
  * itself, because the timestamp is the big-endian prefix. The rule ADDS
  * the implied range as an extra conjunct — the original predicate stays,
  * so semantics are preserved — and the added range is a plain string
  * comparison that the DSv2 source CAN push down (the Spark-side analog of
  * the reference's range-query splits over `_id`,
  * MongoCollectionSplitter.createRangeQuerySplit:243-295; SURVEY.md §4
  * lists exactly this rewrite as the custom-rule candidate).
  *
  * The string range is only numeric-order-correct for CANONICAL lowercase
  * hex (ASCII 'F' < 'f', so an uppercase ObjectId would be silently
  * filtered out by a raw-column range). The rule therefore builds the
  * conjunct over: the child itself when it is `to_objectid(...)` (output
  * provably canonical); the raw column only when
  * `spark.graft.objectid_range.assume_canonical=true` (opt-in, restores
  * full source pushdown for stores known to hold canonical ids); otherwise
  * `lower(column)` — always correct, still useful to Spark's own filter
  * evaluation, not source-pushable.
  */
object ObjectIdRangeRule extends Rule[LogicalPlan] with PredicateHelper {

  val AssumeCanonicalKey = "spark.graft.objectid_range.assume_canonical"

  private val MaxSeconds = 0xffffffffL
  private def hexLow(t: Long): Literal =
    Literal.create(f"$t%08x" + "0" * 16, StringType)

  /** Implied range conjuncts for one predicate (empty = not applicable);
    * `side` builds the case-safe attribute-side expression.
    */
  private def implied(e: Expression, side: Expression => Expression): Seq[Expression] = e match {
    case GreaterThanOrEqual(ObjectIdToSeconds(a), SecondsLit(t)) if t >= 0 && t <= MaxSeconds =>
      Seq(GreaterThanOrEqual(side(a), hexLow(t)))
    case GreaterThan(ObjectIdToSeconds(a), SecondsLit(t)) if t >= 0 && t < MaxSeconds =>
      Seq(GreaterThanOrEqual(side(a), hexLow(t + 1)))
    case LessThan(ObjectIdToSeconds(a), SecondsLit(t)) if t > 0 && t <= MaxSeconds =>
      Seq(LessThan(side(a), hexLow(t)))
    case LessThanOrEqual(ObjectIdToSeconds(a), SecondsLit(t)) if t >= 0 && t < MaxSeconds =>
      Seq(LessThan(side(a), hexLow(t + 1)))
    case EqualTo(ObjectIdToSeconds(a), SecondsLit(t)) if t >= 0 && t < MaxSeconds =>
      Seq(GreaterThanOrEqual(side(a), hexLow(t)), LessThan(side(a), hexLow(t + 1)))
    case _ => Seq.empty
  }

  private object SecondsLit {
    def unapply(e: Expression): Option[Long] = e match {
      case Literal(v: Long, LongType) => Some(v)
      case Literal(v: Int, IntegerType) => Some(v.toLong)
      case Cast(Literal(v: Int, IntegerType), LongType, _, _) => Some(v.toLong)
      case Cast(Literal(v: Long, LongType), _, _, _) => Some(v)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val assumeCanonical =
      conf.getConfString(AssumeCanonicalKey, "false").toBoolean
    def side(a: Expression): Expression = a match {
      case t: ToObjectId => t // normalized by construction
      case _ if assumeCanonical => a
      case other => Lower(other)
    }
    plan.transform {
      case f @ Filter(cond, child) =>
        val conjuncts = splitConjunctivePredicates(cond)
        val extras = conjuncts.flatMap(implied(_, side))
          .filterNot(x => conjuncts.exists(_.semanticEquals(x)))
          .distinct
        if (extras.isEmpty) f
        else Filter((conjuncts ++ extras).reduce(And), child)
    }
  }
}
