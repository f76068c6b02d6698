package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Fixture-driven contract pins for the round-8 pipeline operators:
  * q91 substring-dup audit, q92 quality-ranked cluster representative,
  * q93 hashed-bigram classifier, q94 range-shard layout planner. Each
  * test builds a documents table whose expected outcome is computable by
  * hand, writes it as parquet (the queries' own input path), and checks
  * the catalog query end-to-end — the properties the oracle gate can't
  * see (flag thresholds firing, representative choice, shard contiguity).
  */
class NewPipelineOpsSpec extends SparkSpec {

  /** Write a documents table to a temp dir and return the dir. */
  private def docsDir(rows: Seq[(Long, String, String, String, Long)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ops_spec").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def run(name: String, dir: String): DataFrame =
    Catalog.byName(name).run(spark, dir)

  test("q91 flags a doc whose whole content is a shared 16-token span") {
    val span = (1 to 16).map(i => s"s$i").mkString(" ")
    val dir = docsDir(Seq(
      // doc 0: the span plus a 3-token unique tail -> 4 windows, 1 shared
      (0L, span + " u1 u2 u3", "en", "a", 1L),
      // doc 1: exactly the span -> 1 window, shared -> flagged (2*1 > 1)
      (1L, span, "en", "a", 1L),
      // doc 2: 16 unique tokens -> 1 window, unshared
      (2L, (1 to 16).map(i => s"z$i").mkString(" "), "en", "b", 1L),
      // doc 3: too short for any window -> excluded entirely
      (3L, "tiny doc", "en", "b", 1L)))
    val out = run("q91_substring_dup", dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    // source a: 2 docs with windows; doc1 flagged, doc0 not (1 of 4 shared)
    assert(out("a") == ((2L, 1L, 5L, 2L)), s"source a got ${out("a")}")
    // source b: only doc2 counts (doc3 has no window), nothing shared
    assert(out("b") == ((1L, 0L, 1L, 0L)), s"source b got ${out("b")}")
  }

  test("q92 keeps the highest-n_chars doc of a near-dup cluster, tie on id") {
    val body = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val dir = docsDir(Seq(
      // identical texts -> same MinHash signature -> one cluster
      (10L, body, "en", "a", 40L),
      (11L, body, "en", "a", 90L), // most content -> the representative
      (12L, body, "en", "b", 90L), // ties 11 on n_chars; 11 wins on id
      // unclustered doc survives untouched
      (13L, "totally different content entirely unrelated words here", "en", "b", 7L)))
    val out = run("q92_cluster_keep_best", dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    // source a: doc 11 kept (rep), doc 10 dropped -> kept_chars = 90
    assert(out("a") == ((2L, 1L, 1L, 90L)), s"source a got ${out("a")}")
    // source b: doc 12 dropped (cluster rep is 11), doc 13 kept
    assert(out("b") == ((2L, 1L, 1L, 7L)), s"source b got ${out("b")}")
  }

  test("q93 scores identical texts identically and skips sub-bigram docs") {
    val text = "one two three four five six"
    val dir = docsDir(Seq(
      (0L, text, "en", "a", 1L),
      (1L, text, "en", "b", 1L), // same text, other source
      (2L, "solo", "en", "b", 1L))) // < 2 tokens -> not scored
    val out = run("q93_quality_classifier", dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out("a")._1 == 1L && out("b")._1 == 1L, s"got $out")
    // identical text -> identical integer score, wherever it lives
    assert(out("a")._3 == out("b")._3, s"same text scored differently: $out")
    // weights are bounded: |score| <= 1000 * n_bigrams = 5000
    assert(math.abs(out("a")._3) <= 5000L)
  }

  test("q96 keeps a duplicated chunk only at its first (doc, idx) occurrence") {
    // window 32 / stride 24: a 32-token doc is exactly 2 chunks (the
    // second covering tokens 25..32, 8 tokens)
    val body = (1 to 32).map(i => s"c$i").mkString(" ")
    val dir = docsDir(Seq(
      (0L, body, "en", "a", 1L),
      (1L, body, "en", "b", 1L), // full copy, later doc -> both chunks dropped
      (2L, (1 to 32).map(i => s"u$i").mkString(" "), "en", "b", 1L)))
    val out = run("q96_chunk_dedup_apply", dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    // source a: doc 0 wins both its chunks (32 + 8 tokens)
    assert(out("a") == ((2L, 2L, 40L, 40L)), s"source a got ${out("a")}")
    // source b: doc 1 keeps nothing, doc 2 keeps everything
    assert(out("b") == ((4L, 2L, 80L, 40L)), s"source b got ${out("b")}")
  }

  test("q97 JL projection preserves distances in expectation") {
    val rows = run("q97_jl_distortion", sf0001).collect()
    assert(rows.length == 20)
    val ratios = rows.filter(!_.isNullAt(3)).map(_.getDouble(3))
    assert(ratios.nonEmpty)
    // E[ratio] = 1 for Rademacher rows; a degenerate projection (all-equal
    // signs, wrong scaling) lands far outside this band
    val mean = ratios.sum / ratios.length
    assert(mean > 0.5 && mean < 1.5, s"mean distortion ratio $mean")
    assert(ratios.forall(r => r > 0.05 && r < 5.0), s"extreme ratio in ${ratios.toSeq}")
  }

  test("q98 dataset card is internally consistent and covers the corpus") {
    val rows = run("q98_dataset_card", sf0001).collect()
    assert(rows.nonEmpty)
    var nDocs = 0L
    for (r <- rows) {
      val (docs, pass, dup) = (r.getLong(2), r.getLong(4), r.getLong(5))
      assert(pass <= docs && dup >= 0 && dup <= docs, s"inconsistent row $r")
      assert(Set("train", "valid", "test")(r.getString(1)))
      nDocs += docs
    }
    assert(nDocs == graft.Tables.documents(spark, sf0001).count())
  }

  test("q99 recall is bounded and ground-truth-joined per query") {
    val rows = run("q99_jl_ann_recall", sf0001).collect()
    assert(rows.length == 10)
    for (r <- rows) {
      val (nHit, recall) = (r.getLong(1), r.getDouble(2))
      assert(nHit >= 0 && nHit <= 5)
      assert(recall == nHit / 5.0)
    }
  }

  test("q120 PCA rotation artifact is well-formed and the audit stays bounded") {
    import graft.functions.Embeddings
    // the trained artifact: 16x64 rows, |coef| <= PcaScale (so every
    // rotated coord/norm/dot stays inside the exactness bounds the
    // cosineBig analysis assumes), and rows are near-unit at the scale
    // (a degenerate all-zero row would silently zero a prefix dim)
    assert(Embeddings.pcaCoef.size == Embeddings.PcaDims)
    for (row <- Embeddings.pcaCoef) {
      assert(row.size == Embeddings.Dims)
      assert(row.forall(c => math.abs(c) <= Embeddings.PcaScale))
      val n2 = row.map(c => c * c).sum.toDouble
      val unit = Embeddings.PcaScale.toDouble * Embeddings.PcaScale
      assert(n2 > 0.8 * unit && n2 < 1.2 * unit,
        s"rotation row norm ${n2 / unit} should be ~1 at PcaScale")
    }
    val rows = run("q120_pca_prefix_recall", sf0001).collect()
    assert(rows.length == 10)
    for (r <- rows) {
      val (nHit, recall) = (r.getLong(1), r.getDouble(2))
      assert(nHit >= 0 && nHit <= 5)
      assert(recall == nHit / 5.0)
    }
  }

  test("q94 shards are contiguous, exhaustive, and key-colocated") {
    val rows = run("q94_range_shard_plan", sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(rows.nonEmpty && rows.forall(t => t._1 >= 0 && t._1 < 8))
    // every doc assigned exactly once
    val total = graft.Tables.documents(spark, sf0001).count()
    assert(rows.map(_._2).sum == total, s"assigned ${rows.map(_._2).sum} of $total")
    // ranges are non-overlapping and ordered: a shard's max key is
    // strictly below the next shard's min key (a key never splits)
    for (w <- rows.sliding(2) if w.length == 2)
      assert(w(0)._4 < w(1)._3, s"shards overlap: ${w(0)} vs ${w(1)}")
    // the planner actually spreads the data (>1 shard at 600 docs)
    assert(rows.length > 1)
  }
}
