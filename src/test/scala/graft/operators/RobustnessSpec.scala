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

  test("q30 codec rows decode from doc_id-derived streams regardless of NULL text") {
    val out = run("q30_multimodal_features", nullDir).collect()
      .map(r => r.getLong(0) -> r.getLong(6)).toMap // doc_id -> byte_len
    // doc 2 is a VIDEO row: payload is a doc_id-derived real AVI, so a
    // NULL text changes nothing — byte_len = decoded raster bytes
    assert(out(2L) == (2 + 2 % 5) * (8 + 2 % 40) * (8 + (2 / 5) % 40) * 3L)
    // docs 1/4 are AUDIO rows: payload is a doc_id-derived real WAV, so
    // a NULL text (doc 4) changes nothing — byte_len = decoded PCM bytes
    assert(out(1L) == (64 + 1) * 2L && out(4L) == (64 + 4) * 2L)
  }

  test("q34 keeps NULL-text docs in the gridfs dump as empty payload lines") {
    val out = run("q34_gridfs_text_scan", nullDir).collect()
    assert(out.length == 5, "no doc may vanish from the dump")
    val byId = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId(2L) == 0L && byId(1L) == 8L)
  }

  // ---- round-11 pins: the all-tables NULL twin (make_nulls.py now nulls
  // lineitem/orders/customer/events too) surfaced six engine/oracle
  // divergences on the relational surface; each fix is pinned below.

  private def ts(s: String): java.sql.Timestamp = java.sql.Timestamp.valueOf(s)

  /** events fixture: (event_id, ts, user_id, event_type, value, props) */
  private def eventsDir(rows: Seq[(Long, java.sql.Timestamp, Long, String,
      java.lang.Double, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_robust_ev").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("q18 NULL-ts events sort first and open their own session (NULLS FIRST parity)") {
    // user 1: a NULL-ts event then a real one — the NULL sorts first,
    // both rows see a NULL lag, so the user has exactly 2 sessions
    val dir = eventsDir(Seq(
      (1L, null, 1L, "click", 1.0: java.lang.Double, "{}"),
      (2L, ts("2024-01-01 10:00:00"), 1L, "click", 1.0: java.lang.Double, "{}")))
    val out = run("q18_sessionize", dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) == ((2L, 2L)), s"got ${out(1L)}")
  }

  test("q38 a NULL-ts click precedes every purchase, so it sees none") {
    val dir = eventsDir(Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "purchase", 1.0: java.lang.Double, "{}"),
      (2L, null, 1L, "click", 1.0: java.lang.Double, "{}"),
      (3L, ts("2024-01-01 11:00:00"), 1L, "click", 1.0: java.lang.Double, "{}")))
    val out = run("q38_asof_event", dir).collect()
      .map(r => r.getLong(0) -> Option(r.getTimestamp(3))).toMap
    assert(out(2L).isEmpty, "NULL-ts click must see no preceding purchase")
    assert(out(3L).contains(ts("2024-01-01 10:00:00")))
  }

  test("q40 NULL segment trims to empty string, not NULL (portable concat)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_robust_cust").toString
    Seq[(Long, String, Integer, java.lang.Double, String)](
      (50L, "Customer#50", 1, 10.0, null),
      (100L, "Customer#100", 2, 20.0, "BUILDING"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val out = run("q40_string_funcs", dir).collect()
      .map(r => r.getLong(0) -> r.getAs[String]("trimmed")).toMap
    assert(out(50L) == "", s"got '${out(50L)}'")
    assert(out(100L) == "BUILDING")
  }

  test("q63 the NULL event_type group keeps its flagged count (null-safe join)") {
    // user 1: an error opens a 10-min window; a NULL-type event 10 s in
    // MUST be flagged and must keep that flag through the final join
    val dir = eventsDir(Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "error", 1.0: java.lang.Double, "{}"),
      (2L, ts("2024-01-01 10:00:10"), 1L, null, 1.0: java.lang.Double, "{}")))
    val out = run("q63_interval_join", dir).collect()
      .map(r => Option(r.getString(0)) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(None) == ((1L, 1L)), s"got ${out(None)}")
  }

  test("q73 users with only NULL-ts events have no cohort") {
    val dir = eventsDir(Seq(
      (1L, null, 7L, "click", 1.0: java.lang.Double, "{}"),
      (2L, ts("2024-01-01 10:00:00"), 8L, "click", 1.0: java.lang.Double, "{}"),
      (3L, null, 8L, "click", 1.0: java.lang.Double, "{}")))
    val out = run("q73_retention", dir).collect()
    assert(out.forall(!_.isNullAt(0)), "no NULL cohort row may appear")
    // user 8's NULL-ts event contributes no activity: one cohort row,
    // offset 0, exactly one active user
    assert(out.length == 1 && out.head.getLong(1) == 0L &&
      out.head.getLong(2) == 1L, s"got ${out.toSeq}")
  }

  // ---- round-11 pins: the ALL-tables empty twin (make_empty.py `all`
  // mode) crashed 9 queries and diverged 3 — behaviors pinned below.

  private lazy val emptyAllDir: String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_robust_emptyall").toString
    Seq.empty[(Long, String, Integer, java.lang.Double, String)]
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq.empty[(Long, java.sql.Timestamp, Long, String, java.lang.Double, String)]
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    Seq.empty[(Long, Long, Long, java.lang.Double)]
      .toDF("o_orderkey", "o_custkey", "o_totalprice", "x")
      .selectExpr("o_orderkey", "o_custkey",
        "CAST(o_totalprice AS DOUBLE) AS o_totalprice",
        "CAST(NULL AS STRING) AS o_orderstatus",
        "CAST(NULL AS TIMESTAMP) AS o_orderdate",
        "CAST(NULL AS STRING) AS o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    dir
  }

  test("q58 pushed aggregate over an EMPTY collection folds COUNT to 0, not NULL") {
    val out = run("q58_agg_pushdown", emptyAllDir).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(0) == 0L, s"COUNT(*) over empty must be 0, got $r")
    assert(r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3),
      "MIN/MAX over empty must be NULL")
  }

  test("q72 funnel rates are NULL (not a crash) when nobody viewed") {
    val out = run("q72_funnel", emptyAllDir).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(0) == 0L && r.getLong(1) == 0L)
    assert(r.isNullAt(4) && r.isNullAt(5),
      "rates over an empty corpus are NULL, matching the oracle's x/0")
  }

  test("q31 read-back of an empty written collection degrades to empty, not inference failure") {
    assert(run("q31_bson_source_roundtrip", emptyAllDir).collect().isEmpty)
  }

  test("q69/q70 server round-trips degrade to empty/zero on an empty input") {
    assert(run("q69_server_roundtrip", emptyAllDir).collect().isEmpty)
    val probes = run("q70_server_agg_probes", emptyAllDir).collect()
    assert(probes.length == 1 && probes.head.getLong(0) == 0L)
  }

  test("q30/q47 video rows decode doc_id-derived AVI streams, invariant to text content (unicode twin)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_robust_uni").toString
    // doc 2 -> video; multibyte text must be irrelevant now that every
    // modality synthesizes its payload from doc_id (r11's byte-vs-code-
    // point hazard is structurally gone from this family)
    Seq((2L, "café", "fr", "s", 4L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // doc 2: w=10, h=8, n=4 frames, gray v(f) = (2 + 17f) % 256
    val vs = (0 until 4).map(f => (2 + 17 * f) % 256)
    val r30 = run("q30_multimodal_features", dir).collect().head
    assert(r30.getLong(6) == 4L * 10 * 8 * 3, s"decoded raster bytes, got $r30")
    assert(r30.getLong(7) == 10L * 8 * 3 * vs.sum, s"got $r30")
    assert(r30.getLong(8) == (10L * 8 * 3 * (vs(0) + vs(2))) % 997, s"got $r30")
    val r47 = run("q47_multimodal_frames", dir).collect()
    assert(r47.map(_.getLong(2)).toSeq == Seq(0L, 2L), "every 2nd frame sampled")
    assert(r47.head.getLong(4) == 10L * 8 * 3 * vs(0), s"got ${r47.toSeq}")
  }

  test("q77/q78 degrade to a PARTIAL PQ codebook on a sub-K corpus (singleton twin)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_robust_single").toString
    // ONE vector: the codebook convention (contiguous ids from 0) holds
    // with n=1 < K=16, so the kernels must run with a 1-codeword book —
    // the same computation the oracle's `WHERE vec_id < 16` arm does —
    // instead of refusing the corpus
    Seq((0L, Array.fill(64)(0.25f), 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val audit = run("q77_pq_audit", dir).collect()
    // 4 subspaces x 1 codeword, the single vector assigned to code 0
    // with zero reconstruction error (it IS the codeword)
    assert(audit.length == 4, s"got ${audit.toSeq}")
    assert(audit.forall(r => r.getLong(1) == 0L && r.getLong(2) == 1L &&
      r.getLong(3) == 0L), s"got ${audit.toSeq}")
    // the recall audit self-filters (vec_id == qid) to an empty result
    assert(run("q78_pq_adc_recall", dir).collect().isEmpty)
    // non-CONTIGUOUS ids still fail loudly (ids must start at 0)
    Seq((5L, Array.fill(64)(0.25f), 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    intercept[IllegalArgumentException] { run("q77_pq_audit", dir).collect() }
  }

  test("q92 an unknown-length doc never beats a known-length doc as representative") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_robust_rep").toString
    val text = (1 to 40).map(i => s"tok$i").mkString(" ")
    Seq[(Long, String, String, String, java.lang.Long)](
      (1L, text, "en", "sa", null), // NULL n_chars — must NOT be the rep
      (2L, text, "en", "sb", 100L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = run("q92_cluster_keep_best", dir).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    // identical texts cluster together; doc 2 (known length) is kept,
    // doc 1 (NULL n_chars, source sa) is the one dropped
    assert(out("sa") == ((0L, 1L)), s"got ${out("sa")}")
    assert(out("sb") == ((1L, 0L)), s"got ${out("sb")}")
  }
}
