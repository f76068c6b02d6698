package graft.operators

import graft.SparkSpec

/** Both connected-components paths — exact driver union-find and the
  * distributed min-label-propagation fallback — must produce identical
  * components on the same graph.
  */
class ConnectedComponentsSpec extends SparkSpec {

  // chain 1-2-3-4-5 (diameter 4), triangle 10-11-12, pair 20-21
  private def graph() = {
    import spark.implicits._
    Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L)).toDF("doc_a", "doc_b")
  }

  private val expected = Map(
    1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
    10L -> 10L, 11L -> 10L, 12L -> 10L,
    20L -> 20L, 21L -> 20L)

  test("driver union-find path computes min-label components") {
    val got = DedupQueries.connectedComponents(graph())
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expected)
  }

  test("distributed label-propagation path agrees with union-find") {
    // force the distributed branch with a zero driver bound
    val got = DedupQueries.connectedComponents(graph(), maxDriverEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expected)
  }

  test("long chain (diameter 20) converges across blocks") {
    import spark.implicits._
    val chain = (100L until 120L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val got = DedupQueries.connectedComponents(chain, maxDriverEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size === 21)
    assert(got.values.toSet === Set(100L))
  }

  test("q111 cluster-aware split: zero leaks, full coverage, clusters intact") {
    // Near-dup clusters get duplicated texts so lshPairs links them; the
    // per-DOC hash split (q83's rule) would scatter some cluster across
    // splits, and the cluster-aware assignment must not.
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val dupText = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val rows = (0L until 40L).map { i =>
      val text = if (i < 8) dupText // one 8-doc near-dup cluster
        else s"unique document body number $i with its own tail ${i * 31}"
      (i, text, "en", s"s${i % 2}", text.length.toLong)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_q111").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Catalog.byName("q111_cluster_split").run(spark, dir).collect()
    assert(out.map(_.getLong(3)).forall(_ == 0L), "cluster split leaked pairs")
    assert(out.map(_.getLong(1)).sum == 40L, "every doc assigned exactly once")
    // all 8 cluster members carry the root's split: recompute assignment
    val asg = graft.Tables.documents(spark, dir)
      .select(col("doc_id"),
        graft.functions.Portable.splitAssign(
          org.apache.spark.sql.functions.lit(0L)).as("root_split"))
      .filter(col("doc_id") < 8).collect()
    assert(asg.map(_.getString(1)).toSet.size == 1,
      "near-dup cluster members must share one split")
  }

  test("q116 ROI sweep is monotone in the threshold") {
    val rows = Catalog.byName("q116_dedup_roi")
      .run(spark, "/root/testdata/sf0.01").collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .sortBy(_._1)
    assert(rows.length == 4)
    // tightening the threshold can only shrink pairs, drops, and savings
    rows.toSeq.sliding(2).foreach { w =>
      val (lo, hi) = (w.head, w.last)
      assert(hi._2 <= lo._2, s"n_pairs must not grow: $lo -> $hi")
      assert(hi._4 <= lo._4, s"n_dropped must not grow: $lo -> $hi")
      assert(hi._5 <= lo._5, s"tokens_saved must not grow: $lo -> $hi")
    }
    // every cluster keeps exactly one representative
    rows.foreach { r =>
      assert(r._4 >= 0 && r._5 >= 0)
    }
  }
}
