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
}
