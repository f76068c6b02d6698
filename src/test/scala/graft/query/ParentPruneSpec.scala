package graft.query

import graft.bson._
import org.scalatest.funsuite.AnyFunSuite

/** [[BQuery.parentPrune]] unit pins: the pre-unwind parent-pruning
  * superset derived from a post-unwind match. The invariant under test:
  * for every conjunct shape, NO parent that contributes a post-unwind
  * row is pruned (array storage via the `$elemMatch` disjunct, scalar
  * storage via the as-is disjunct), and conjuncts the derivation cannot
  * reason about contribute True (drop-a-conjunct only widens).
  */
class ParentPruneSpec extends AnyFunSuite {
  import BQuery._

  private def doc(v: BsonValue): BDoc = BDoc("tags" -> v, "v" -> BInt32(7))

  test("Eq conjunct: array containing / scalar equal pass; others prune") {
    val prune = parentPrune(Eq("tags", BString("x")), "tags")
    assert(prune != True)
    assert(prune.matches(doc(BArray(Vector(BString("y"), BString("x"))))))
    assert(prune.matches(doc(BString("x")))) // scalar storage, as-is arm
    assert(!prune.matches(doc(BArray(Vector(BString("y"))))))
    assert(!prune.matches(doc(BArray(Vector.empty))))
    assert(!prune.matches(doc(BNull)))
    assert(!prune.matches(BDoc("v" -> BInt32(7)))) // missing path
  }

  test("same-path range conjuncts merge into ONE value-form ElemMatch") {
    val post = And(Seq(
      ReadStrCmp("tags", "c", ReadStrOp.Gte), ReadStrCmp("tags", "t", ReadStrOp.Lt)))
    val prune = parentPrune(post, "tags")
    assert(prune.matches(doc(BArray(Vector(BString("zzz"), BString("dog"))))))
    // same-path conjuncts MERGE into one $elemMatch: "∃ one element
    // satisfying ALL" — one element ≥ c and a DIFFERENT one < t is NOT
    // a contribution, and the merged prune drops the parent (a
    // per-conjunct split would have kept it as a wider superset)
    assert(!prune.matches(doc(BArray(Vector(BString("a"), BString("z"))))))
    assert(!prune.matches(doc(BArray(Vector(BString("u"), BString("z"))))))
    assert(prune.matches(doc(BString("dog"))))
  }

  test("dotted element subfield derives the document-form ElemMatch") {
    val prune = parentPrune(Eq("tags.lang", BString("en")), "tags")
    assert(prune != True)
    assert(prune.matches(doc(BArray(Vector(BDoc("lang" -> BString("en")))))))
    assert(!prune.matches(doc(BArray(Vector(BDoc("lang" -> BString("de")))))))
    // scalar (sub-document) storage passes through the as-is arm
    assert(prune.matches(doc(BDoc("lang" -> BString("en")))))
  }

  test("mixed element-or-parent and foreign-path conjuncts contribute no prune") {
    assert(parentPrune(Or(Seq(Eq("tags", BString("x")), Gt("v", BInt32(3)))),
      "tags") == True)
    assert(parentPrune(Eq("__graft_pos", BInt32(1)), "tags") == True)
    assert(parentPrune(True, "tags") == True)
    // a NotOp conjunct (unrewritten node kind) also contributes True
    assert(parentPrune(NotOp("tags", Eq("tags", BString("x"))), "tags") == True)
  }

  test("IS NULL element filter: null-containing arrays pass, scalar null passes as-is") {
    val prune = parentPrune(Exists("tags", yes = false), "tags")
    assert(prune.matches(doc(BArray(Vector(BString("x"), BNull)))))
    assert(!prune.matches(doc(BArray(Vector(BString("x"))))))
    // tags explicitly null: the as-is arm matches (Exists(false) = null
    // or missing) — a SUPERSET is fine, the exact post match still runs
    assert(prune.matches(doc(BNull)))
  }

  test("the pruned query renders fully server-side for bracket shapes") {
    import graft.server.QueryDocs
    val p1 = QueryDocs.plan(parentPrune(Eq("tags", BString("x")), "tags"))
    assert(p1.isExact && p1.keyBounds.isEmpty)
    val p2 = QueryDocs.plan(parentPrune(
      And(Seq(Gte("tags", BInt32(3)), Lt("tags", BInt32(9)))), "tags"))
    assert(p2.isExact && p2.keyBounds.isEmpty)
    // read-semantics nodes keep their node inside the ElemMatch — the
    // server builder's exact-render gate drops such prunes
    val p3 = QueryDocs.plan(parentPrune(
      ReadStrCmp("tags", "m", ReadStrOp.Gte), "tags"))
    assert(!p3.isExact)
  }
}
