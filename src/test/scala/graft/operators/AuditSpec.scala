package graft.operators

import graft.SparkSpec
import graft.functions.Portable
import org.apache.spark.sql.functions._

/** Contract pins for the dataset-assembly audits (q83/q86) that the
  * oracle gate can't express: the split assignment must be APPEND-STABLE
  * (ingesting new docs never moves an existing doc between splits — the
  * property that makes a hash split usable across corpus versions, where
  * `rand()` or rank-based splits reshuffle everything), and the leak
  * audit must only ever report eval-side docs.
  */
class AuditSpec extends SparkSpec {

  /** The q83 split expression, verbatim. */
  private def splitOf(docIds: Seq[Long]): Map[Long, String] = {
    import spark.implicits._
    docIds.toDF("doc_id")
      .select($"doc_id", Portable.splitAssign($"doc_id").as("split"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
  }

  test("q83 split assignment is append-stable and exhaustive") {
    val before = splitOf(0L until 500L)
    val after = splitOf(0L until 1500L) // 1000 new docs ingested
    for ((id, sp) <- before)
      assert(after(id) == sp, s"doc $id moved $sp -> ${after(id)} on append")
    // every doc lands in exactly one of the three splits, all non-empty
    // at this size (80/10/10 over 1500 ids)
    val counts = after.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(counts.keySet == Set("train", "valid", "test"), s"got $counts")
    assert(counts("train") > counts("valid") && counts("train") > counts("test"))
  }

  test("q86 reports only eval-side docs, never train") {
    val rows = Catalog.byName("q86_split_leak").run(spark, sf0001).collect()
    for (r <- rows) {
      val split = r.getString(r.fieldIndex("eval_split"))
      assert(split == "valid" || split == "test", s"leak row on split $split")
      assert(r.getLong(r.fieldIndex("n_pairs")) >=
        r.getLong(r.fieldIndex("n_eval_docs")))
    }
  }

  test("q81 gate arithmetic is internally consistent") {
    val rows = Catalog.byName("q81_quality_gate").run(spark, sf0001).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val nDocs = r.getLong(r.fieldIndex("n_docs"))
      val nPass = r.getLong(r.fieldIndex("n_pass"))
      val fails = Seq("fail_tok", "fail_len", "fail_stop", "fail_div")
        .map(c => r.getLong(r.fieldIndex(c)))
      assert(nPass <= nDocs)
      assert(fails.forall(_ <= nDocs))
      // a doc passes iff it fails no rule, so fails cover the non-passers
      assert(fails.sum >= nDocs - nPass)
      assert(r.getDouble(r.fieldIndex("pass_rate")) == nPass.toDouble / nDocs)
    }
  }
}
