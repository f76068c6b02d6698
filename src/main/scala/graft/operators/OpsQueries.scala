package graft.operators

import graft.Tables
import graft.functions.Portable._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-operations layer: the jobs that keep a 100 TB training corpus
  * SERVICEABLE rather than merely analyzed — tokenizer-vocabulary
  * induction (the distributed half of BPE training), CDC snapshot
  * merge (the lakehouse MERGE INTO shape: upserts + deletes folded into
  * a base snapshot with keep-latest semantics), and small-file
  * compaction planning (bin-packing a file inventory into target-sized
  * output files from metadata alone).
  *
  * House rules as everywhere: exact integer/decimal arithmetic so the
  * DuckDB oracle matches bit-for-bit, no corpus-scale driver collects,
  * and every exchange is either key-bounded or metadata-sized.
  */
object OpsQueries {

  /** Merge-pair candidates reported by the vocab-induction query. */
  private val MergeTopK = 20

  /** Compaction target size (char units at fixture scale; the constant
    * is the API's `targetBytes` in a real deployment).
    */
  private val CompactTarget = 32768L

  /** Simulated files per source in the compaction inventory. */
  private val FilesPerSource = 16

  val all: Seq[CatalogQuery] = Seq(

    // Tokenizer-vocabulary induction: one BPE merge iteration at corpus
    // scale — count adjacent character pairs across the corpus, weighted
    // by word frequency, and report the top-K merge candidates (the pair
    // a BPE trainer would merge next, plus the runners-up).
    //
    // Scale shape — the reason BPE training parallelizes at all: pass 1
    // reduces the corpus to its word-frequency table ((tok, freq): the
    // in-row TokenCounts partials make the exchange vocab-bounded, never
    // token instances); the pair fan-out then runs over the DISTINCT
    // VOCABULARY, not the corpus — a 100 TB corpus and a 100 GB corpus
    // with the same vocabulary do identical pair-counting work after
    // pass 1. The pair aggregate's exchange is pair-vocab-bounded and
    // the top-K is a TakeOrdered (map-side partial top-K), so the
    // driver sees K rows. Ties break on the pair string so the cut is
    // deterministic in both engines.
    CatalogQuery(
      "q104_bpe_merge",
      (s, d) => {
        import s.implicits._
        val cf = Tables.documents(s, d)
          .select(explode(tokenCounts(coalesce($"text", lit("")))).as("t"))
          .groupBy($"t.tok".as("tok"))
          .agg(sum($"t.cnt").as("freq"))
        val pairs = when(length($"tok") >= 2,
          transform(sequence(lit(1), length($"tok") - 1),
            i => $"tok".substr(i, lit(2))))
          .otherwise(typedLit(Seq.empty[String]))
        cf.select(explode(pairs).as("pair"), $"freq")
          .groupBy($"pair")
          .agg(sum($"freq").as("cnt"))
          .orderBy($"cnt".desc, $"pair")
          .limit(MergeTopK)
      },
      Some(s"""
        |WITH inst AS (
        |  SELECT unnest(string_split(coalesce(text, ''), ' ')) AS tok
        |  FROM documents),
        |cf AS (
        |  SELECT tok, CAST(count(*) AS BIGINT) AS freq
        |  FROM inst WHERE tok <> '' GROUP BY 1),
        |pairs AS (
        |  SELECT substr(tok, i, 2) AS pair, freq
        |  FROM (SELECT tok, freq, unnest(range(1, length(tok))) AS i
        |        FROM cf WHERE length(tok) >= 2))
        |SELECT pair, CAST(sum(freq) AS BIGINT) AS cnt
        |FROM pairs GROUP BY 1 ORDER BY cnt DESC, pair LIMIT $MergeTopK
        |""".stripMargin)),

    // CDC snapshot merge — MERGE INTO re-expressed shuffle-minimally:
    // base snapshot ∪ upsert batch → ONE key-partitioned argmax picks
    // the latest version of every key (max(struct(version, payload)):
    // map-side combinable, no window sort over the snapshot), then the
    // delete set drops keys by anti-join. The change batch here is
    // derived deterministically from the orders table (hash-threshold
    // membership, the q79 convention) so the oracle sees the same CDC
    // stream without a fixture table.
    //
    // Scale shape: the only corpus-scale exchange is the argmax's key
    // partitioning, which the anti-join then REUSES (both sides hash on
    // the key; the delete side is the small one). A window-sort spelling
    // (row_number OVER key ORDER BY version) would sort every snapshot
    // partition instead — the oracle uses it because oracles don't have
    // to scale. Versions: base = 0, upsert = 1; a real ingest would
    // carry a change-log sequence number in the same slot.
    CatalogQuery(
      "q105_snapshot_merge",
      (s, d) => {
        import s.implicits._
        val cdc = hash60(concat(lit("cdc:"), $"o_orderkey".cast("string"))) % 5
        val base = Tables.orders(s, d)
          .select($"o_orderkey".as("k"), lit(0L).as("v"),
            $"o_orderstatus".as("st"), $"o_totalprice".as("price"))
        val upserts = Tables.orders(s, d)
          .filter(cdc < 2)
          .select($"o_orderkey".as("k"), lit(1L).as("v"),
            lit("U").as("st"), ($"o_totalprice" + 1.5).as("price"))
        val deletes = Tables.orders(s, d)
          .filter(cdc === 2)
          .select($"o_orderkey".as("k"))
        base.unionByName(upserts)
          .groupBy($"k")
          .agg(max(struct($"v", $"st", $"price")).as("w"))
          .join(deletes, Seq("k"), "left_anti")
          .groupBy($"w.st".as("st"))
          .agg(count(lit(1)).as("n_orders"), Exact.dsum($"w.price").as("sum_price"))
          .orderBy($"st")
      },
      Some {
        val cdc = s"(${hash60Sql("'cdc:' || CAST(o_orderkey AS VARCHAR)")} % 5)"
        s"""
        |WITH base AS (
        |  SELECT o_orderkey AS k, 0 AS v, o_orderstatus AS st,
        |         o_totalprice AS price
        |  FROM orders),
        |up AS (
        |  SELECT o_orderkey AS k, 1 AS v, 'U' AS st,
        |         o_totalprice + 1.5 AS price
        |  FROM orders WHERE $cdc < 2),
        |del AS (SELECT o_orderkey AS k FROM orders WHERE $cdc = 2),
        |latest AS (
        |  SELECT k, st, price FROM (
        |    SELECT k, st, price,
        |      row_number() OVER (PARTITION BY k ORDER BY v DESC) AS rn
        |    FROM (SELECT * FROM base UNION ALL SELECT * FROM up))
        |  WHERE rn = 1),
        |merged AS (
        |  SELECT l.* FROM latest l
        |  WHERE NOT EXISTS (SELECT 1 FROM del WHERE del.k = l.k))
        |SELECT st, CAST(count(*) AS BIGINT) AS n_orders,
        |  ${Exact.dsumSql("price")} AS sum_price
        |FROM merged GROUP BY st ORDER BY st
        |""".stripMargin
      }),

    // Small-file compaction planner — the maintenance job every big
    // corpus lake runs: given a file inventory (per-file byte counts),
    // bin-pack each source partition's files into target-sized output
    // files and report the plan. Packing is next-fit in file order: a
    // running cumulative size, bin = floor(bytes_before / target) —
    // fully deterministic, windowed per source, never a driver loop.
    // The inventory here is simulated by hash-bucketing documents into
    // FilesPerSource files per source; a real deployment feeds the
    // FileStats side-file listing through the same planner.
    //
    // Scale shape: planning runs on METADATA — the only corpus-scale
    // work is the inventory aggregate (key-bounded: sources x files
    // groups, map-side combined); the window and the plan rollup see
    // #sources x #files rows. At 100 TB with millions of files the
    // inventory is still exchange-bounded by the file count, and the
    // per-source window is the file list a single planner must order
    // anyway (a skewed source with millions of files would shard the
    // window by file-id ranges first — the q94 range-shard machinery).
    CatalogQuery(
      "q106_compaction_plan",
      (s, d) => {
        import s.implicits._
        val fid = hash60(concat(lit("file:"), $"doc_id".cast("string"))) %
          FilesPerSource
        val inv = Tables.documents(s, d)
          .select($"source", fid.as("file_id"),
            coalesce($"n_chars", lit(0L)).as("b"))
          .groupBy($"source", $"file_id")
          .agg(sum($"b").as("bytes"), count(lit(1)).as("n_docs"))
        val w = Window.partitionBy($"source").orderBy($"file_id")
          .rowsBetween(Window.unboundedPreceding, -1)
        inv
          .withColumn("cum_before", coalesce(sum($"bytes").over(w), lit(0L)))
          .withColumn("bin", idiv($"cum_before", lit(CompactTarget)))
          .groupBy($"source", $"bin")
          .agg(count(lit(1)).as("n_files"), sum($"bytes").as("bin_bytes"),
            sum($"n_docs").as("n_docs"))
          .orderBy($"source", $"bin")
      },
      Some(s"""
        |WITH inv AS (
        |  SELECT source,
        |    (${hash60Sql("'file:' || CAST(doc_id AS VARCHAR)")} %
        |      $FilesPerSource) AS file_id,
        |    CAST(sum(coalesce(n_chars, 0)) AS BIGINT) AS bytes,
        |    CAST(count(*) AS BIGINT) AS n_docs
        |  FROM documents GROUP BY 1, 2),
        |plan AS (
        |  SELECT source, file_id, bytes, n_docs,
        |    coalesce(sum(bytes) OVER (PARTITION BY source ORDER BY file_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS cum_before
        |  FROM inv)
        |SELECT source, cum_before // $CompactTarget AS bin,
        |  CAST(count(*) AS BIGINT) AS n_files,
        |  CAST(sum(bytes) AS BIGINT) AS bin_bytes,
        |  CAST(sum(n_docs) AS BIGINT) AS n_docs
        |FROM plan GROUP BY 1, 2 ORDER BY 1, 2
        |""".stripMargin))
  )
}
