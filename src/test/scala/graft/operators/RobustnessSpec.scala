package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Degenerate-input pins, locking the round-10 gate findings into
  * `sbt test`: every catalog query must treat an EMPTY corpus (a normal
  * input at scale — an empty source, a fully-filtered subset) and a
  * NULLABLE corpus as data, not as a crash. The python twins
  * (tools/make_empty.py / make_nulls.py) run the full oracle gate;
  * this spec pins the Spark-side behavior the gate found broken so a
  * regression fails the suite, not the next manual sweep.
  */
class RobustnessSpec extends SparkSpec {

  private def run(name: String, dir: String): DataFrame =
    Catalog.byName(name).run(spark, dir)

  private lazy val emptyDir: String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_robust_empty").toString
    Seq.empty[(Long, String, String, String, Long)]
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Seq.empty[(Long, Array[Float])]
      .toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  private lazy val nullDir: String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_robust_null").toString
    Seq[(Long, String, String, String, java.lang.Long)](
      (1L, "aa bb aa", "en", "src1", 8L),
      (2L, null, null, "src1", null),
      (3L, "cc cc cc dd", "fr", "src2", 11L),
      (4L, null, "en", "src2", 0L),
      (5L, "aa bb aa", "en", "src1", 8L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  // the eight queries the round-10 empty sweep crashed, now expected to
  // return ZERO rows (the oracle side agrees — 120/120 on the twin)
  private val emptyCorpusQueries = Seq(
    "q36_knn_ivf", "q67_heavy_hitters", "q77_pq_audit", "q78_pq_adc_recall",
    "q90_semdedup", "q100_clean_corpus_build", "q101_kmeans", "q110_sq8_recall")

  for (q <- emptyCorpusQueries)
    test(s"$q returns an empty result on an empty corpus") {
      assert(run(q, emptyDir).collect().isEmpty)
    }

  test("q60 scrubs a NULL-text doc to an empty cleaned doc, not NULL") {
    val rows = run("q60_repeat_scrub", nullDir).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(rows(2L) == (("", 0L)))
    assert(rows(1L) == (("aa bb aa", 0L)))
    assert(rows(3L) == (("cc dd", 2L)))
  }

  test("q45 keeps the NULL-lang token group (null-safe join)") {
    val langs = run("q45_kmv_distinct", nullDir).collect().map(r =>
      if (r.isNullAt(0)) null else r.getString(0)).toSet
    // doc 4 has NULL text (no tokens) but doc 2 is the NULL-LANG doc —
    // also NULL text, so no tokens: NULL-lang group exists only when a
    // null-lang doc HAS tokens. Add one via en/fr docs check instead:
    assert(langs.contains("en") && langs.contains("fr"))
    // and directly: a null-lang doc with tokens must keep its group
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_robust_null2").toString
    Seq[(Long, String, String, String, java.lang.Long)](
      (1L, "x y z", null, "s", 5L), (2L, "x q", "en", "s", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = run("q45_kmv_distinct", dir).collect()
    assert(out.exists(_.isNullAt(0)),
      "the NULL-lang group must survive the kth/exact join")
  }

  test("q26 never trains a NULL-language profile but still predicts for all docs") {
    val out = run("q26_text_langid", nullDir).collect()
    assert(out.length == 5, "every doc gets a prediction row")
    assert(out.forall(r => !r.isNullAt(2)), "pred_lang is never NULL")
  }

  test("q59 ranks NULL n_chars as 0 (engine-portable order)") {
    val out = run("q59_length_quantiles", nullDir).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    // src1: lengths (8, coalesced-0, 8) sorted -> 0,8,8; p50 = idx ceil(1.5)-1 = 8
    assert(out("src1") == 8L)
  }

  test("q30 derives an empty payload (zero features) for a NULL-text doc") {
    val out = run("q30_multimodal_features", nullDir).collect()
      .map(r => r.getLong(0) -> r.getLong(6)).toMap // doc_id -> byte_len
    assert(out(2L) == 0L && out(4L) == 0L)
    assert(out(1L) == 8L)
  }

  test("q34 keeps NULL-text docs in the gridfs dump as empty payload lines") {
    val out = run("q34_gridfs_text_scan", nullDir).collect()
    assert(out.length == 5, "no doc may vanish from the dump")
    val byId = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId(2L) == 0L && byId(1L) == 8L)
  }
}
