package graft.operators

import graft.Tables
import graft.functions.Portable._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sketching + sampling operators a 100 TB training-data pipeline needs:
  * a KMV (k-minimum-values) distinct-count sketch and deterministic
  * hash-threshold stratified sampling.
  *
  * Both are built on the portable md5-derived hash, so — unlike HLL /
  * reservoir sampling, whose engine implementations differ — every value
  * is bit-identical in the DuckDB oracle: the sketch itself is verified
  * exactly, not just its error bound.
  */
object SamplingQueries {

  /** KMV sketch size. */
  private val K = 64

  val all: Seq[CatalogQuery] = Seq(

    // KMV distinct-token estimate per language (Bar-Yossef '02): keep the
    // K smallest distinct hash values; estimate = (K-1) * P / kth_min.
    // Scale shape: one distinct shuffle on (lang, hp) then ONE exchange on
    // lang that both the window rank and the final aggregate reuse. The
    // exact distinct count rides along to exhibit the estimator's error.
    CatalogQuery(
      "q45_kmv_distinct",
      (s, d) => {
        import s.implicits._
        val tok = Tables.documents(s, d)
          .select($"lang", explode(spaceSplit($"text")).as("tok"))
          .filter($"tok" =!= "")
          .select($"lang", hashP($"tok").as("hp"))
          .distinct()
        // n_exact as a pre-aggregated broadcast join, NOT a full-partition
        // count window: the rank branch gets WindowGroupLimit map-side
        // pruning to K rows/key, the count branch gets partial aggregation,
        // and both reuse the one distinct exchange (ReusedExchange in the
        // plan) — one fewer full Window pass over every distinct token.
        val nExact = tok.groupBy($"lang").agg(count(lit(1)).as("n_exact"))
        val wR = Window.partitionBy($"lang").orderBy($"hp")
        tok
          .withColumn("rk", row_number().over(wR))
          .filter($"rk" <= K)
          .groupBy($"lang")
          .agg(max($"hp").as("kth"))
          // null-safe key: a NULL-lang group is a real group in both
          // engines' aggregates, but a plain equi-join would silently
          // drop it here (NULL never equals NULL in a join key) while
          // the oracle's window shape keeps it
          .join(broadcast(nExact.withColumnRenamed("lang", "lang_e")),
            $"lang" <=> $"lang_e")
          .select($"lang", $"n_exact",
            when($"n_exact" < K, $"n_exact".cast("double"))
              .otherwise(lit((K - 1).toDouble * P) / $"kth".cast("double"))
              .as("est_distinct"))
          .orderBy($"lang")
      },
      Some(s"""
        |WITH tok AS (
        |  SELECT DISTINCT lang, ${hashPSql("tok")} AS hp FROM (
        |    SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents)
        |  WHERE tok <> ''),
        |ranked AS (
        |  SELECT lang, hp,
        |    count(*) OVER (PARTITION BY lang) AS n_exact,
        |    row_number() OVER (PARTITION BY lang ORDER BY hp) AS rk
        |  FROM tok),
        |kmv AS (
        |  SELECT lang, n_exact, max(hp) AS kth
        |  FROM ranked WHERE rk <= $K GROUP BY lang, n_exact)
        |SELECT lang, n_exact,
        |  CASE WHEN n_exact < $K THEN CAST(n_exact AS DOUBLE)
        |       ELSE ${(K - 1).toDouble} * $P / CAST(kth AS DOUBLE) END AS est_distinct
        |FROM kmv ORDER BY lang
        |""".stripMargin)),

    // Deterministic stratified sampling: a doc is sampled iff
    // hash("smpl:" || doc_id) mod 1000 < 100 (~10%), so the sample is
    // reproducible across engines, runs and cluster sizes — the property
    // training-data pipelines need for auditable subsets. Row-local
    // predicate (no shuffle besides the per-stratum aggregate).
    CatalogQuery(
      "q46_sample_stratified",
      (s, d) => {
        import s.implicits._
        val sampled = (hashP(concat(lit("smpl:"), $"doc_id".cast("string"))) % 1000 < 100)
        Tables.documents(s, d)
          .groupBy($"lang")
          .agg(
            count(lit(1)).as("n_total"),
            sum(when(sampled, 1L).otherwise(0L)).as("n_sampled"),
            sum(when(sampled, $"n_chars".cast("long")).otherwise(0L)).as("sampled_chars"))
          .orderBy($"lang")
      },
      Some(s"""
        |SELECT lang,
        |  count(*) AS n_total,
        |  CAST(sum(CASE WHEN sampled THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
        |  CAST(sum(CASE WHEN sampled THEN n_chars ELSE 0 END) AS BIGINT) AS sampled_chars
        |FROM (
        |  SELECT lang, n_chars,
        |    (${hashPSql("'smpl:' || CAST(doc_id AS VARCHAR)")} % 1000) < 100 AS sampled
        |  FROM documents)
        |GROUP BY lang ORDER BY lang
        |""".stripMargin)),

    // Sequence packing: assign docs to fixed token-budget bins (context
    // windows) per language — deterministic next-fit by doc_id order via
    // a cumulative sum, so the packing is reproducible at any cluster
    // size.
    //
    // Skew-immune two-level prefix sum (r11; a raw per-lang running-sum
    // window is structurally serial — one task sorts the whole hottest
    // language, the q18/q38/q114 hazard, even though at the current
    // fixture the skew twin measured it inside the bar). Level 1: a
    // running sum WITHIN each (lang, 8192-doc-id bucket) window —
    // partitions bounded by the id-bucket width however hot the lang.
    // Level 2: per-bucket token sums (map-side combinable) with the
    // prefix of EARLIER buckets cumulated over the data/8192-sized
    // bucket frame; cum(doc) = within-bucket running + earlier-bucket
    // prefix.
    CatalogQuery(
      "q50_pack_sequences",
      (s, d) => {
        import s.implicits._
        val budget = 2048L
        val B = 8192L
        val v = Tables.documents(s, d)
          .select($"doc_id", $"lang", size(spaceSplit($"text")).cast("long").as("n_tok"))
          .withColumn("bkt", floor($"doc_id" / B))
        val wIn = Window.partitionBy($"lang", $"bkt").orderBy($"doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val perB = v.groupBy($"lang", $"bkt").agg(sum($"n_tok").as("bsum"))
        val wB = Window.partitionBy($"lang").orderBy($"bkt")
          .rowsBetween(Window.unboundedPreceding, -1)
        val prevB = perB
          .withColumn("prefix", coalesce(sum($"bsum").over(wB), lit(0L)))
          .select($"lang".as("pl"), $"bkt".as("pb"), $"prefix")
        v.withColumn("cum_in", sum($"n_tok").over(wIn))
          // null-SAFE on lang: a NULL language is a real stratum
          .join(prevB, v("lang") <=> $"pl" && $"bkt" === $"pb")
          .withColumn("cum", $"cum_in" + $"prefix")
          // floor(), not a bare cast: `/` is double division in both
          // engines but DuckDB's CAST(x AS BIGINT) rounds while Spark's
          // truncates — floor() agrees everywhere for non-negative input
          .withColumn("bin", floor(($"cum" - $"n_tok") / budget).cast("long"))
          // every output column explicitly typed (long/long/long/long/long
          // + string) so both engines hand the comparator identical types:
          // DuckDB's sum(BIGINT) is HUGEINT (int128), and a HUGEINT-derived
          // column survives to the output unless cast — some fetch paths
          // (pandas/arrow) then render it as float64 and hash-mismatch.
          .select($"doc_id".cast("long").as("doc_id"), $"lang",
            $"n_tok".cast("long").as("n_tok"), $"bin".cast("long").as("bin"),
            ($"cum" - $"n_tok" - $"bin" * budget).cast("long").as("bin_offset"))
          .orderBy($"doc_id", $"lang")
      },
      Some("""
        |SELECT CAST(doc_id AS BIGINT) AS doc_id, lang,
        |  CAST(n_tok AS BIGINT) AS n_tok,
        |  CAST(floor((cum - n_tok) / 2048) AS BIGINT) AS bin,
        |  CAST((cum - n_tok) - CAST(floor((cum - n_tok) / 2048) AS BIGINT) * 2048
        |       AS BIGINT) AS bin_offset
        |FROM (
        |  SELECT doc_id, lang,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
        |    CAST(sum(CAST(len(string_split(text, ' ')) AS BIGINT))
        |      OVER (PARTITION BY lang ORDER BY doc_id
        |            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |  FROM documents)
        |ORDER BY doc_id, lang
        |""".stripMargin)),

    // Decontamination: flag TRAIN docs sharing any rare shingle with the
    // held-out TEST split (doc_id % 97 = 0) — the n-gram-overlap check
    // run before training. Reuses the hashed-shingle inverted index:
    // candidates come only from shared rare-shingle buckets (df cap keeps
    // boilerplate n-grams from flagging everything), never all-pairs.
    CatalogQuery(
      "q51_decontaminate",
      (s, d) => {
        import s.implicits._
        // packed inverted index (one exchange, df cap in the aggregate);
        // (train, test) co-occurrences generated by a row-local bounded
        // double-explode instead of re-sorting the shingle frame for a
        // window cap + SMJ self-join
        val inv = DedupQueries.shingleIndex(s, d)
        inv.select(explode($"ds").as("tr"), $"ds")
          .select($"tr", explode($"ds").as("te"))
          .filter($"tr" % 97 =!= 0 && $"te" % 97 === 0)
          .groupBy($"tr".as("doc_id"))
          .agg(countDistinct($"te").as("n_test_docs"),
            count(lit(1)).as("n_shared_shingles"))
          .orderBy($"doc_id")
      },
      Some(s"""
        |WITH ${DedupQueries.shinglesSql},
        |shf AS (
        |  SELECT doc_id, hp FROM (
        |    SELECT doc_id, hp, count(*) OVER (PARTITION BY hp) AS df FROM shh)
        |  WHERE df <= ${graft.functions.Portable.BucketCap}),
        |te AS (SELECT doc_id, hp FROM shf WHERE doc_id % 97 = 0),
        |tr AS (SELECT doc_id, hp FROM shf WHERE doc_id % 97 <> 0)
        |SELECT tr.doc_id AS doc_id,
        |  CAST(count(DISTINCT te.doc_id) AS BIGINT) AS n_test_docs,
        |  count(*) AS n_shared_shingles
        |FROM tr JOIN te USING (hp)
        |GROUP BY tr.doc_id ORDER BY doc_id
        |""".stripMargin)),

    // Temperature-sampled source mixing (alpha = 0.5): w_s ∝ n_s^0.5,
    // the standard upweighting of small sources when composing a
    // training mix. Cross-engine float discipline: sqrt is IEEE
    // correctly-rounded in both engines, but a SUM of doubles is
    // order-dependent — so weights are fixed-point floor(sqrt(n)*1e8)
    // BIGINTs, the normalizer is an exact integer sum, and the final
    // ratios are computed in DOUBLE space with the identical op order in
    // both engines (never w*100000 in Long: at extreme corpus sizes that
    // product overflows, wrapping in Spark and erroring in DuckDB).
    // Scale shape: one count aggregate (pre-aggregated map-side), a
    // one-row broadcast normalizer — the corpus is scanned once.
    CatalogQuery(
      "q62_mixture_weights",
      (s, d) => {
        import s.implicits._
        val n = Tables.documents(s, d)
          .groupBy($"source").agg(count(lit(1)).as("n_docs"))
          .withColumn("w", floor(sqrt($"n_docs") * lit(1e8)).cast("long"))
        val tot = n.agg(sum($"w").cast("long").as("tot"))
        n.crossJoin(broadcast(tot))
          .select($"source", $"n_docs",
            ($"w".cast("double") / $"tot".cast("double")).as("weight"),
            (($"w".cast("double") * lit(100000.0)) / $"tot".cast("double"))
              .as("expected_docs_per_100k"))
          .orderBy($"source")
      },
      Some("""
        |WITH n AS (
        |  SELECT source, count(*) AS n_docs,
        |    CAST(floor(sqrt(count(*)) * 1e8) AS BIGINT) AS w
        |  FROM documents GROUP BY source),
        |tot AS (SELECT CAST(sum(w) AS BIGINT) AS tot FROM n)
        |SELECT source, n_docs,
        |  CAST(w AS DOUBLE) / CAST(tot AS DOUBLE) AS weight,
        |  (CAST(w AS DOUBLE) * 100000.0) / CAST(tot AS DOUBLE)
        |    AS expected_docs_per_100k
        |FROM n, tot ORDER BY source
        |""".stripMargin)),

    // Bloom-prefiltered decontamination, sketch-then-verify: build a
    // mergeable Bloom filter over the TEST set's shingle hashes (keys
    // never shuffle — one ≤sketch-size partial per partition, bit-or
    // merge, one-row collect bounded like q67's candidate batch), probe
    // every train shingle ROW-LOCALLY inside codegen, and exact-confirm
    // the survivors with a broadcast join against the true test set — so
    // false positives affect only intermediate volume, never the answer.
    // Contrast with q51's packed inverted index, which exchanges the FULL
    // train shingle frame once: here the corpus side never shuffles
    // (survivors ≈ contaminated docs' shingles + fpp·corpus stream into a
    // broadcast hash join, and only those reach the final doc_id agg). At
    // 100 TB against a benchmark suite of ~1e8 shingles, the sketch is
    // ~120 MB at 1% fpp — broadcastable where the exact hash set is not.
    CatalogQuery(
      "q68_bloom_decontaminate",
      (s, d) => {
        import s.implicits._
        val sh = DedupQueries.hashedShingles(s, d)
        val te = sh.filter($"doc_id" % 97 === 0).select($"hp").distinct()
        val tr = sh.filter($"doc_id" % 97 =!= 0)
        val bf = te.agg(graft.functions.Bloom.agg($"hp", 20000L, 0.001)
          .as("bf")).head().getAs[Array[Byte]](0)
        tr.filter(graft.functions.Bloom.mightContain($"hp", lit(bf)))
          .join(broadcast(te), Seq("hp"))
          .groupBy($"doc_id").agg(count(lit(1)).as("n_shared_shingles"))
          .orderBy($"doc_id")
      },
      Some(s"""
        |WITH ${DedupQueries.shinglesSql},
        |te AS (SELECT DISTINCT hp FROM shh WHERE doc_id % 97 = 0),
        |tr AS (SELECT doc_id, hp FROM shh WHERE doc_id % 97 <> 0)
        |SELECT tr.doc_id AS doc_id, count(*) AS n_shared_shingles
        |FROM tr JOIN te USING (hp)
        |GROUP BY tr.doc_id ORDER BY doc_id
        |""".stripMargin)),

    // Temperature-mixture sample MATERIALIZATION: q62 computes the
    // alpha=0.5 per-source weights; this produces the actual mixed
    // sample — per-source quotas (floor(w·N/tot), exact-in-double fixed
    // point, identical IEEE ops in both engines) filled by the
    // deterministically hash-ranked first quota docs of each source.
    // Scale shape: quotas come off one tiny partial-aggregated exchange
    // and broadcast back; per-source selection is the bounded topk_min
    // aggregate (≤N rows per source through the exchange, map-side
    // partials — never a per-source sort of the corpus); the final
    // slice/posexplode is row-local over ≤N-element arrays. At 100 TB:
    // two map passes + two constant-size exchanges.
    CatalogQuery(
      "q79_mixture_sample",
      (s, d) => {
        import s.implicits._
        val SampleN = 500
        val docs = Tables.documents(s, d)
        val n = docs.groupBy($"source").agg(count(lit(1)).as("n_docs"))
          .withColumn("w", floor(sqrt($"n_docs") * lit(1e8)).cast("long"))
        val tot = n.agg(sum($"w").cast("long").as("tot"))
        val quota = n.crossJoin(broadcast(tot))
          .select($"source",
            floor(($"w" * lit(SampleN.toLong)).cast("double") /
              $"tot".cast("double")).cast("long").as("q"))
        docs
          .select($"source",
            hashP(concat(lit("mix:"), $"doc_id".cast("string"))).as("hv"),
            $"doc_id")
          .groupBy($"source")
          .agg(graft.functions.TopK.topkMin(struct($"hv", $"doc_id"), SampleN).as("top"))
          .join(broadcast(quota), "source")
          .select($"source",
            posexplode(slice(transform($"top", t => t.getField("doc_id")),
              lit(1), $"q".cast("int"))))
          .select($"source", ($"pos" + 1).cast("long").as("rk"),
            $"col".as("doc_id"))
          .orderBy($"source", $"rk")
      },
      Some(s"""
        |WITH n AS (
        |  SELECT source, count(*) AS n_docs,
        |    CAST(floor(sqrt(count(*)) * 1e8) AS BIGINT) AS w
        |  FROM documents GROUP BY source),
        |tot AS (SELECT CAST(sum(w) AS BIGINT) AS tot FROM n),
        |quota AS (
        |  SELECT source,
        |    CAST(floor(CAST(w * 500 AS DOUBLE) / CAST(tot AS DOUBLE)) AS BIGINT) AS q
        |  FROM n, tot),
        |h AS (
        |  SELECT source, doc_id,
        |    ${hashPSql("'mix:' || CAST(doc_id AS VARCHAR)")} AS hv
        |  FROM documents),
        |rked AS (
        |  SELECT source, doc_id,
        |    row_number() OVER (PARTITION BY source ORDER BY hv, doc_id) AS rk
        |  FROM h)
        |SELECT rked.source AS source, CAST(rk AS BIGINT) AS rk, doc_id
        |FROM rked JOIN quota ON rked.source = quota.source
        |WHERE rk <= quota.q
        |ORDER BY rked.source, rk
        |""".stripMargin)),

    // Deterministic train/valid/test split assignment: every doc lands in
    // exactly one split via a salted content-independent hash of its id
    // (80/10/10), and the report audits the realized proportions per
    // source — the standard "is my split leaking / skewed" check before
    // training. The hash (not `rand()`) makes the assignment reproducible
    // across runs, partitionings, and engines, and new docs never move
    // existing ones between splits. Shape: scan → row-local hash bucket →
    // map-side partial agg → ONE (source, split)-keyed exchange carrying
    // ≤ 3 × |sources| rows. No joins; at 100 TB the only data-scale work
    // is the scan.
    CatalogQuery(
      "q83_split_assign",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d)
          .select($"source", $"n_chars",
            graft.functions.Portable.splitAssign($"doc_id").as("split"))
          .groupBy($"source", $"split")
          .agg(count(lit(1)).as("n_docs"),
            sum($"n_chars").cast("long").as("n_chars_total"))
          .orderBy($"source", $"split")
      },
      Some(s"""
        |WITH a AS (
        |  SELECT source, n_chars,
        |    ${graft.functions.Portable.splitAssignSql("doc_id")} AS split
        |  FROM documents)
        |SELECT source, split, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS n_chars_total
        |FROM a GROUP BY source, split ORDER BY source, split
        |""".stripMargin)),

    // Range-shard layout planner: derive R=8 range boundaries over a sort
    // key (per-doc token count) from the key's EXACT histogram, assign
    // every doc a shard row-locally, and report the realized balance
    // (n_docs, min/max key per shard) — the planning step behind writing
    // globally-ordered output shards (repartitionByRange) without ever
    // globally sorting the corpus. shard(v) = floor(R * cum_before(v) /
    // N): identical-key docs always co-locate (a range shard can't split
    // a key), and the rank math is exact integer arithmetic shared with
    // the q59 quantile convention — no sampling nondeterminism, so the
    // oracle mirrors it bit-for-bit. Shape: one corpus pass pre-collapses
    // to the (key → count) histogram (map-side partials emit ≤ |key
    // domain| rows per task); the boundary window runs on that bounded
    // frame only; assignment is a broadcast join back on the key. The
    // planning lives in [[RangeShard.assign]], which swaps the exact
    // histogram for a deterministic reservoir-style sample when the key
    // domain outgrows a bounded exchange (RangeShardSpec pins the
    // sampled path's invariants on a high-cardinality key); the
    // token-count domain here stays under the threshold, so the oracle
    // pins the exact arm bit-for-bit. coalesce(text, ''): a NULL text
    // must tokenize like the empty string on BOTH sides — a NULL n_tok
    // sorts NULLS FIRST in Spark's window but NULLS LAST in DuckDB's,
    // shifting every boundary, and the equi-join back would silently
    // drop the doc, breaking "every doc assigned exactly once".
    CatalogQuery(
      "q94_range_shard_plan",
      (s, d) => {
        import s.implicits._
        val R = 8L
        val v = Tables.documents(s, d)
          .select($"doc_id",
            size(spaceSplit(coalesce($"text", lit("")))).cast("long").as("n_tok"))
        RangeShard.assign(v, "n_tok", "doc_id", R)
          .groupBy($"shard_id")
          .agg(count(lit(1)).as("n_docs"),
            min($"n_tok").as("min_tok"), max($"n_tok").as("max_tok"))
          .orderBy($"shard_id")
      },
      Some("""
        |WITH v AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(coalesce(text, ''), ' ')) AS BIGINT) AS n_tok
        |  FROM documents),
        |h AS (SELECT n_tok, count(*) AS c FROM v GROUP BY 1),
        |b AS (
        |  SELECT n_tok,
        |    CAST((8 * coalesce(sum(c) OVER (ORDER BY n_tok
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0))
        |      // (sum(c) OVER ()) AS BIGINT) AS shard_id
        |  FROM h)
        |SELECT shard_id, count(*) AS n_docs,
        |  min(n_tok) AS min_tok, max(n_tok) AS max_tok
        |FROM v JOIN b USING (n_tok)
        |GROUP BY shard_id ORDER BY shard_id
        |""".stripMargin))
  )
}
