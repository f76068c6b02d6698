package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Fixture pins for the corpus-operations layer: q104 BPE merge-pair
  * induction (hand-computed pair counts, deterministic tie-break,
  * single-char words contribute nothing), q105 CDC snapshot merge
  * (upsert wins over base, deleted keys vanish, untouched keys
  * survive), and q106 compaction planning (next-fit bin arithmetic,
  * every file in exactly one bin).
  */
class OpsSpec extends SparkSpec {

  private def docsDir(rows: Seq[(Long, String, String, String, Long)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ops_spec").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def run(name: String, dir: String): DataFrame =
    Catalog.byName(name).run(spark, dir)

  test("q104 counts weighted char pairs with deterministic tie-break") {
    // vocab: "abab" freq 2, "ab" freq 3, "z" freq 1 (no pairs).
    // pairs: "abab" -> ab, ba, ab (weight 2 each instance);
    //        "ab"   -> ab (weight 3).
    // counts: ab = 2*2 + 3 = 7, ba = 2.
    val dir = docsDir(Seq(
      (0L, "abab ab z", "en", "s", 9L),
      (1L, "abab ab ab", "en", "s", 10L)))
    val out = run("q104_bpe_merge", dir).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq == Seq(("ab", 7L), ("ba", 2L)), s"got ${out.toSeq}")
  }

  test("q104 top-K cut is deterministic under count ties") {
    // All pairs distinct with equal weight: the cut must be the K
    // lexicographically-smallest pairs, stable across partitionings.
    val words = ('a' to 'z').flatMap(a => Seq(s"${a}0")) // 26 words, pairs a0,b0,...
    val dir = docsDir(words.zipWithIndex.map { case (w, i) =>
      (i.toLong, w, "en", "s", w.length.toLong)
    })
    val out = run("q104_bpe_merge", dir).collect().map(_.getString(0))
    assert(out.length == 20 && out.toSeq == out.toSeq.sorted,
      s"expected the 20 smallest pairs in order, got ${out.toSeq}")
  }

  test("q105 merge semantics: upsert wins, delete removes, base survives") {
    import org.apache.spark.sql.functions._
    val dir = sf0001
    val orders = graft.Tables.orders(spark, dir)
    val cdc = graft.functions.Portable.hash60(
      concat(lit("cdc:"), col("o_orderkey").cast("string"))) % 5
    val nBase = orders.count()
    val nUp = orders.filter(cdc < 2).count()
    val nDel = orders.filter(cdc === 2).count()
    val out = run("q105_snapshot_merge", dir)
    val total = out.agg(sum("n_orders")).collect().head.getLong(0)
    // every non-deleted key exactly once
    assert(total == nBase - nDel, s"got $total, want ${nBase - nDel}")
    // upserted keys all carry the 'U' status
    val uRow = out.filter(col("st") === "U").collect()
    assert(uRow.length == 1 && uRow.head.getLong(1) == nUp,
      s"expected $nUp upserted orders, got ${uRow.toSeq}")
  }

  test("q106 next-fit packing: every file in exactly one bin, bins ordered") {
    import org.apache.spark.sql.functions._
    val dir = sf0001
    val out = run("q106_compaction_plan", dir).collect()
    // inventory size: every (source, file) appears in exactly one bin
    val nFiles = out.map(_.getLong(2)).sum
    val inv = graft.Tables.documents(spark, dir)
      .select(col("source"),
        (graft.functions.Portable.hash60(
          concat(lit("file:"), col("doc_id").cast("string"))) % 16)
          .as("file_id"))
      .distinct().count()
    assert(nFiles == inv, s"planned $nFiles files, inventory has $inv")
    // bin ids contiguous from 0 within each source
    out.groupBy(_.getString(0)).foreach { case (_, rows) =>
      val bins = rows.map(_.getLong(1)).sorted.toSeq
      assert(bins == (0L until bins.length.toLong),
        s"bins not contiguous from 0: $bins")
    }
    // total bytes conserved
    val planned = out.map(_.getLong(3)).sum
    val corpus = graft.Tables.documents(spark, dir)
      .agg(sum(coalesce(col("n_chars"), lit(0L)))).collect().head.getLong(0)
    assert(planned == corpus, s"planned $planned bytes, corpus has $corpus")
  }

  test("q107 cap keeps quality-passing docs first, then cuts at the quota") {
    // One source, 35 docs: 5 pass the q81 gate (25 tokens incl. two
    // stopwords, avg clean word length 4.8, all distinct), 30 fail it
    // (3 tokens). Cap = 30 -> all 5 passers survive, 25 failers fill
    // the rest, and n_docs reports the uncapped 35.
    val passing = ("the of" +: (1 to 23).map(i => f"wrd$i%02d")).mkString(" ")
    val rows =
      (0L until 5L).map(i => (i, passing, "en", "s", passing.length.toLong)) ++
      (5L until 35L).map(i => (i, "aa bb cc", "en", "s", 8L))
    val out = run("q107_domain_cap", docsDir(rows)).collect()
    assert(out.length == 1)
    val r = out.head
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((35L, 30L, 5L)),
      s"got ${(r.getLong(1), r.getLong(2), r.getLong(3))}")
  }

  test("q108 winnowing guarantee: docs sharing a 6+-token run share a fingerprint") {
    // Doc A and doc B share an 8-token run (>= W + K - 1 = 6) embedded in
    // otherwise-disjoint token streams; doc C is fully disjoint. The
    // winnowing guarantee forces A and B to share at least one selected
    // fingerprint, so both contribute shared occurrences; C contributes
    // none.
    val runTokens = (1 to 8).map(i => s"run$i").mkString(" ")
    val a = ((1 to 10).map(i => s"a$i") :+ runTokens).mkString(" ")
    val b = (runTokens +: (1 to 10).map(i => s"b$i")).mkString(" ")
    val c = (1 to 20).map(i => s"c$i").mkString(" ")
    val dir = docsDir(Seq(
      (0L, a, "en", "sa", a.length.toLong),
      (1L, b, "en", "sb", b.length.toLong),
      (2L, c, "en", "sc", c.length.toLong)))
    val out = run("q108_winnowing", dir).collect()
      .map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(out("sa") >= 1L && out("sb") >= 1L, s"guarantee violated: $out")
    assert(out("sc") == 0L, s"disjoint doc flagged: $out")
  }

  test("q108 hand-computed selection on a single-window doc") {
    // 6 tokens -> 4 k-gram hashes -> exactly one W=4 window -> one
    // fingerprint per doc; two identical docs share it (2 shared
    // occurrences), and density n_fp/n_kgrams = 1/4 per doc.
    val text = "t1 t2 t3 t4 t5 t6"
    val dir = docsDir(Seq(
      (0L, text, "en", "s", text.length.toLong),
      (1L, text, "en", "s", text.length.toLong)))
    val out = run("q108_winnowing", dir).collect()
    assert(out.length == 1)
    val r = out.head
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((2L, 8L, 2L, 2L)), s"got $r")
  }

  test("q106 next-fit overflow bound: no bin exceeds target + largest file") {
    import org.apache.spark.sql.functions._
    val dir = sf001
    val out = run("q106_compaction_plan", dir).collect()
    val maxFile = graft.Tables.documents(spark, dir)
      .select(col("source"),
        (graft.functions.Portable.hash60(
          concat(lit("file:"), col("doc_id").cast("string"))) % 16)
          .as("file_id"),
        coalesce(col("n_chars"), lit(0L)).as("b"))
      .groupBy("source", "file_id").agg(sum("b").as("bytes"))
      .agg(max("bytes")).collect().head.getLong(0)
    // a bin holds files whose cum_before lies in [k*T, (k+1)*T); only its
    // last file can extend past the boundary, by at most its own size
    out.foreach { r =>
      assert(r.getLong(3) <= 32768L + maxFile,
        s"bin ${r.getLong(1)} of ${r.getString(0)} too large: ${r.getLong(3)}")
    }
  }

  test("q109 diff classification matches the per-bucket derivation") {
    // Bucket of each doc computed locally with the same portable hash the
    // query uses: 0 -> removed, 1 -> changed, 2 -> unchanged + spawns an
    // added doc, else unchanged.
    val rows = (0L until 60L).map(i => (i, s"text of doc $i", "en", s"s${i % 3}", 10L))
    val dir = docsDir(rows)
    def bucket(id: Long): Long =
      (graft.functions.Md5Util.prefix60(
        org.apache.spark.unsafe.types.UTF8String.fromString(s"snap:$id")) %
        graft.functions.Portable.P) % 10
    val expected = rows.groupBy(_._4).map { case (src, rs) =>
      val bs = rs.map(r => bucket(r._1))
      src -> (bs.count(_ == 2).toLong, bs.count(_ == 0).toLong,
        bs.count(_ == 1).toLong, bs.count(b => b != 0 && b != 1).toLong)
    }
    val out = run("q109_snapshot_diff", dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out == expected, s"got $out expected $expected")
  }

  test("q113 profile counts nulls exactly and bounds the KMV estimate") {
    // documents fixture with known nulls and known distincts per column.
    val rows = (0L until 200L).map { i =>
      val lang = if (i % 10 == 0) null else s"l${i % 4}"
      (i, s"tok${i % 50}", lang, s"s${i % 7}", 5L)
    }
    val dir = docsDir(rows.map(r => (r._1, r._2, r._3, r._4, r._5)))
    // the profile also scans lineitem — borrow the tiny sf0.001 one
    java.nio.file.Files.createSymbolicLink(
      java.nio.file.Paths.get(dir, "lineitem.parquet"),
      java.nio.file.Paths.get("/root/testdata/sf0.001/lineitem.parquet"))
    val out = Catalog.byName("q113_table_profile").run(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    val (nRows, nNull, nExact, est) = out("documents.lang")
    assert(nRows == 200L && nNull == 20L && nExact == 4L)
    assert(est == 4.0, "below-K estimates must be exact")
    val (_, tn, tExact, tEst) = out("documents.text")
    assert(tn == 0L && tExact == 50L && tEst == 50.0)
    // sources: 7 distinct, no nulls
    assert(out("documents.source")._3 == 7L)
  }

  test("q117 flags corrupted relationships and clears the intact one") {
    val out = Catalog.byName("q117_fk_audit").run(spark, sf001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    val (nc, no, rate) = out("customer.c_nationkey -> nation.n_nationkey")
    assert(no == 0L && rate == 0.0, "intact FK must audit clean")
    Seq("lineitem.l_orderkey -> orders.o_orderkey",
      "orders.o_custkey -> customer.c_custkey").foreach { rel =>
      val (n, orph, r) = out(rel)
      assert(orph > 0L && r > 0.0 && r < 0.05,
        s"$rel: ~2% hash-corrupted keys must surface as orphans, got $r")
      assert(r == orph.toDouble / n)
    }
  }

  test("q118 flags cells below the anonymity floor and safe cells pass") {
    // cell A: 10 docs (safe, >= 5); cell B: 3 docs (at risk);
    // cell C: 1 doc in its own source (at risk, min_cell = 1)
    val rows =
      (0L until 10L).map(i => (i, "t", "en", "big", 150L)) ++
      (10L until 13L).map(i => (i, "t", "en", "small", 150L)) ++
      Seq((13L, "t", "de", "solo", 50L))
    val out = Catalog.byName("q118_k_anonymity").run(spark, docsDir(rows))
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out("big") == ((1L, 0L, 0L, 10L)), s"got ${out("big")}")
    assert(out("small") == ((1L, 1L, 3L, 3L)), s"got ${out("small")}")
    assert(out("solo") == ((1L, 1L, 1L, 1L)), s"got ${out("solo")}")
  }

  test("q113 KMV sketch is mergeable: min-K of partition unions == whole") {
    // The scale claim behind the estimator: each partition keeps its K
    // smallest distinct hashes; the merged sketch (min-K of the union)
    // must equal the sketch computed over the whole corpus in one pass.
    val K = 64
    val values = (0 until 5000).map(i => s"v${i % 1300}")
    def hash(v: String): Long =
      graft.functions.Md5Util.prefix60(
        org.apache.spark.unsafe.types.UTF8String.fromString(v)) %
        graft.functions.Portable.P
    val whole = values.map(hash).distinct.sorted.take(K)
    val parts = values.grouped(700).toSeq.map(
      _.map(hash).distinct.sorted.take(K))
    val merged = parts.flatten.distinct.sorted.take(K)
    assert(merged == whole, "partition-wise min-K must merge losslessly")
    // and the estimate derived from the merged kth value matches
    val est = (K - 1).toDouble * graft.functions.Portable.P / merged.last
    val estWhole = (K - 1).toDouble * graft.functions.Portable.P / whole.last
    assert(est == estWhole)
  }

  test("q113 keeps a 100%-null column in the report") {
    val rows = (0L until 50L).map(i =>
      (i, s"t$i", null.asInstanceOf[String], s"s${i % 3}", 2L))
    val dir = docsDir(rows)
    java.nio.file.Files.createSymbolicLink(
      java.nio.file.Paths.get(dir, "lineitem.parquet"),
      java.nio.file.Paths.get("/root/testdata/sf0.001/lineitem.parquet"))
    val out = Catalog.byName("q113_table_profile").run(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(out.contains("documents.lang"),
      "an all-null column must not vanish from the profile")
    assert(out("documents.lang") == ((50L, 50L, 0L, 0.0)),
      s"got ${out("documents.lang")}")
  }

  test("q109 identical snapshots diff to all-unchanged totals") {
    // Global invariant: n_added = #bucket2, n_removed = #bucket0, and
    // every base doc is accounted for exactly once across statuses.
    val out = run("q109_snapshot_diff", sf001).collect()
    val nBase = graft.Tables.documents(spark, sf001).count()
    val accounted = out.map(r => r.getLong(2) + r.getLong(3) + r.getLong(4)).sum
    assert(accounted == nBase,
      s"removed+changed+unchanged = $accounted should equal base count $nBase")
  }

  test("q119 stored-manifest diff equals the inline diff and reuses the manifests") {
    val inline = run("q109_snapshot_diff", sf001).collect().toSeq
    val stored1 = run("q119_snapshot_diff_stored", sf001).collect().toSeq
    assert(stored1 == inline,
      "diffing stored fingerprints must reproduce the inline result exactly")
    // second invocation must read the persisted manifests, not rewrite
    // them — the amortized deployment cost a repeated run measures
    val before = manifestMtime(sf001)
    val stored2 = run("q119_snapshot_diff_stored", sf001).collect().toSeq
    assert(stored2 == inline)
    assert(manifestMtime(sf001) == before,
      "a repeated q119 run must not rewrite the stored manifests")
  }

  private def manifestMtime(dir: String): Long =
    new java.io.File(OpsQueries.storedManifestRoot(dir), "_DONE").lastModified()

  test("q119 manifest cache invalidates when the snapshot data changes in place") {
    import spark.implicits._
    // same DIRECTORY throughout — only the parquet under it changes
    val rowsV1 = (0L until 40L).map(i => (i, s"v1 text $i", "en", s"s${i % 2}", 10L))
    val dir = docsDir(rowsV1)
    val v1 = run("q119_snapshot_diff_stored", dir).collect().toSeq
    assert(v1 == run("q109_snapshot_diff", dir).collect().toSeq)
    // regenerate the snapshot under the unchanged path: different rows,
    // different file size/mtime — the content-derived cache key must
    // change, so q119 recomputes instead of serving v1's fingerprints
    val rowsV2 = (0L until 55L).map(i => (i, s"v2 other $i", "de", s"s${i % 3}", 12L))
    rowsV2.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val v2 = run("q119_snapshot_diff_stored", dir).collect().toSeq
    val inline2 = run("q109_snapshot_diff", dir).collect().toSeq
    assert(v2 == inline2,
      "a changed snapshot under an unchanged path must recompute the manifest")
    assert(v2 != v1, "the regenerated data's diff differs from v1 by construction")
  }

  test("writer-side manifests: writeManifest + diffStoredManifests classify correctly") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_manifest_api").toString
    // snapshot A: docs 0-9; snapshot B drops 0-1 (removed), rewrites 2
    // (changed), keeps 3-9 (unchanged), adds 10-11 (added)
    val a = (0L until 10L).map(i => (i, s"text $i", "s0")).toDF("doc_id", "text", "source")
    val b = ((2L to 2L).map(i => (i, s"REWRITTEN $i", "s0")) ++
      (3L until 12L).map(i => (i, s"text $i", "s0"))).toDF("doc_id", "text", "source")
    OpsQueries.writeManifest(a, "text", s"$tmp/a")
    OpsQueries.writeManifest(b, "text", s"$tmp/b")
    val out = OpsQueries.diffStoredManifests(spark, s"$tmp/a", s"$tmp/b").collect()
    assert(out.length == 1)
    val r = out.head
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((2L, 2L, 1L, 7L)), s"(added, removed, changed, unchanged) got $r")
  }
}
