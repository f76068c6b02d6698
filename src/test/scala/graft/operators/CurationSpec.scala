package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Fixture-driven pins for the curation operators: q101 distributed
  * k-means (exact convergence, empty-cluster retention, negative-sum
  * floor division), q102 unigram-surprisal scoring (hand-computed bits),
  * and q103 containment detection (the `partial` doc-in-doc class the sf
  * corpus can't exercise — its flagged pairs are all whole-doc copies).
  */
class CurationSpec extends SparkSpec {

  private def docsDir(rows: Seq[(Long, String, String, String, Long)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_cur_spec").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def embDir(rows: Seq[(Long, Seq[Float], Int)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_cur_spec").toString
    rows.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  private def run(name: String, dir: String): DataFrame =
    Catalog.byName(name).run(spark, dir)

  test("q101 converges exactly on two point-masses; empty clusters keep centroids") {
    // 16 vectors = 8 exact copies of p + 8 of q, interleaved so the 8
    // init centroids are 4 copies of each point. Duplicate centroids tie
    // on distance and the struct order breaks ties to the smallest cid,
    // so every p-vector lands in cluster 0 and every q-vector in cluster
    // 4; the other 6 clusters go empty (and must keep their centroids
    // without crashing the update). Means of identical vectors are exact
    // (floorDiv of 8x the point by 8), so final inertia is exactly 0.
    // p's negative coordinate exercises the negative-sum floor division.
    val p = Seq.tabulate(64)(i => if (i == 0) -0.5f else if (i == 1) 0.25f else 0f)
    val q = Seq.tabulate(64)(i => if (i == 2) 0.75f else 0f)
    val rows = (0L until 16L).map { id =>
      val v = if ((id / 4) % 2 == 0) p else q // ids 0-3,8-11 -> p; 4-7,12-15 -> q
      (id, v, 0)
    }
    val out = run("q101_kmeans", embDir(rows)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((0L, 8L, 0L), (4L, 8L, 0L)), s"got ${out.toSeq}")
  }

  test("q101 partitions every vector exactly once on real data") {
    val dir = sf0001
    val total = graft.Tables.embeddings(spark, dir).count()
    val out = run("q101_kmeans", dir).collect()
    assert(out.map(_.getLong(1)).sum == total)
    assert(out.length <= 8 && out.forall(_.getLong(2) >= 0L))
  }

  test("q102 scores hand-computed surprisal buckets") {
    // cf: a=3, b=1, c=1, x=1, y=1 -> N=7, bits(N)=3; bits: a->2, rest->1.
    // d0 "a a b": surp = 2*(3-2) + 1*(3-1) = 4, n=3 -> 4//3 = 1
    // d1 "a c":   surp = 1*(3-2) + 1*(3-1) = 3, n=2 -> 3//2 = 1
    // d2 "x y":   surp = 2*(3-1) = 4, n=2 -> 4//2 = 2 (rare-token doc)
    val dir = docsDir(Seq(
      (0L, "a a b", "en", "s", 5L),
      (1L, "a c", "en", "s", 3L),
      (2L, "x y", "en", "s", 3L)))
    val out = run("q102_surprisal", dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(("s", 1L, 2L), ("s", 2L, 1L)), s"got ${out.toSeq}")
  }

  test("q103 classifies an embedded document as partial containment") {
    val small = (1 to 20).map(i => s"c$i").mkString(" ") // 5 windows of 16
    val prefix = (1 to 30).map(i => s"p$i").mkString(" ")
    val suffix = (1 to 10).map(i => s"u$i").mkString(" ")
    val other = (1 to 40).map(i => s"z$i").mkString(" ")
    val dir = docsDir(Seq(
      // doc 0: the small doc -> its 5 windows all appear inside doc 1
      (0L, small, "en", "web", 1L),
      // doc 1: 60 tokens (45 windows) containing the small doc verbatim:
      // containment 5/5 = 1.0, Jaccard 5/45 < 1/2 -> partial
      (1L, s"$prefix $small $suffix", "en", "books", 1L),
      // docs 2+3: identical -> containment 1.0, Jaccard 1.0 -> near_dup
      (2L, other, "en", "web", 1L),
      (3L, other, "en", "web", 1L)))
    val out = run("q103_containment", dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      ("web", "books", "partial", 1L, 1L),
      ("web", "web", "near_dup", 1L, 1L)), s"got ${out.toSeq}")
  }

  test("q103 df-cap drops boilerplate windows from candidate generation") {
    // 60 docs all sharing one 16-token window: df = 60 > BucketCap = 50,
    // so the window generates no candidates and nothing is flagged.
    val span = (1 to 16).map(i => s"w$i").mkString(" ")
    val rows = (0L until 60L).map(id =>
      (id, s"$span only$id extra$id tail$id", "en", "a", 1L))
    val out = run("q103_containment", docsDir(rows)).collect()
    assert(out.isEmpty, s"expected no flagged pairs, got ${out.length}")
  }

  test("q112 hand-computed conditional surprisal histogram") {
    // Corpus: "x y", "x z", "x y". Prev-token counts: cf(x) = 3 ('11',
    // 2 bits). Bigram counts: bf(x y) = 2 ('10', 2 bits), bf(x z) = 1
    // ('1', 1 bit). Instance scores: (x,"x y") -> 2-2 = 0; (x,"x z") ->
    // 2-1 = 1. Docs 0/2 mean 0; doc 1 mean 1.
    val rows = Seq(
      (0L, "x y", "en", "a", 3L),
      (1L, "x z", "en", "a", 3L),
      (2L, "x y", "en", "b", 3L))
    val out = run("q112_bigram_surprisal", docsDir(rows)).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set(("a", 0L, 1L), ("a", 1L, 1L), ("b", 0L, 1L)),
      s"got $out")
  }

  test("q112 stays correct under celebrity-bigram skew") {
    // One bigram dominates the corpus (boilerplate header). Conditional
    // surprisal must score DETERMINISTIC continuations at 0 (the
    // boilerplate is perfectly predictable) and rank docs where a
    // common context precedes diverse continuations (high cf(prev),
    // bf(pair)=1) strictly above it — the signal a perplexity gate
    // keys on, robust to 97% of the corpus being one hot bigram.
    val header = "the quick brown fox"
    val rows = (0L until 300L).map { i =>
      val body = if (i < 290) header // 97% boilerplate docs
        else s"the rare${i}a the rare${i}b the rare${i}c"
      (i, body, "en", if (i < 290) "boiler" else "tail", 20L)
    }
    val out = run("q112_bigram_surprisal", docsDir(rows)).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val boiler = out.filter(_._1 == "boiler")
    val tail = out.filter(_._1 == "tail")
    assert(boiler.nonEmpty && tail.nonEmpty)
    // boilerplate: every bigram is deterministic -> mean bits exactly 0;
    // tail: (the -> rareNx) pairs pay bits(cf(the)) - 1 each
    assert(boiler.map(_._2).forall(_ == 0L),
      s"deterministic boilerplate must score 0: ${boiler.toSeq}")
    assert(tail.map(_._2).min > 0L,
      s"common-context diverse continuations must score > 0: ${tail.toSeq}")
  }

  test("q112 drops docs without bigrams and clamps OOV scores at zero") {
    // One-token and empty docs produce no bigram instances -> no row;
    // scores never go negative even when the unigram falls out of the
    // vocab while the bigram stays (clamp at 0).
    val rows = Seq(
      (0L, "solo", "en", "a", 4L),
      (1L, "", "en", "a", 0L),
      (2L, "p q p q", "en", "a", 7L))
    val out = run("q112_bigram_surprisal", docsDir(rows)).collect()
    assert(out.forall(_.getLong(1) >= 0L), "mean_bits must be >= 0")
    assert(out.map(_.getLong(2)).sum == 1L,
      s"only the bigram-bearing doc may appear, got ${out.toSeq}")
  }
}
