package graft.operators

import graft.Tables
import graft.functions.Portable
import org.apache.spark.sql.functions._

/** The end-to-end training-corpus cleaning pipeline — the 100 TB use case
  * the individual operators exist for, composed into one verified query:
  *
  *   1. quality gate (token count + lexical diversity),
  *   2. exact dedup (content-hash canonicalization),
  *   3. MinHash/LSH near-dup removal (drop the higher doc_id of every
  *      candidate pair with signature agreement >= 0.5),
  *   4. surviving-corpus statistics per language.
  *
  * Every stage is a keyed shuffle or bucket join; nothing is all-pairs
  * and nothing collects to the driver.
  */
object PipelineQueries {
  import Portable._

  val all: Seq[CatalogQuery] = Seq(
    CatalogQuery(
      "q44_corpus_clean",
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d)
        // 1. quality gate
        val quality = docs
          .withColumn("t", graft.functions.Portable.spaceSplit($"text"))
          .withColumn("n_tok", size($"t").cast("long"))
          .withColumn("n_uniq", size(array_distinct($"t")).cast("long"))
          .filter($"n_tok" >= 20 && $"n_uniq".cast("double") / $"n_tok" >= 0.25)
          .select($"doc_id", $"lang", $"n_chars", $"n_tok", md5($"text").as("h"))
        // 2. exact dedup: keep the min doc_id per content hash
        val exact = quality
          .withColumn("canon", min($"doc_id").over(
            org.apache.spark.sql.expressions.Window.partitionBy($"h")))
          .filter($"doc_id" === $"canon")
          .drop("h", "canon")
        // 3. near-dup removal: LSH candidate pairs from the packed band
        // index (row-local signatures + est_sim — see DedupQueries.lshPairs),
        // drop the higher id
        val dupIds = DedupQueries.lshPairs(DedupQueries.sigRows(s, d), Some(0.5))
          .select($"doc_b".as("doc_id")).distinct()
        val clean = exact.join(dupIds, Seq("doc_id"), "left_anti")
        // 4. surviving-corpus stats
        clean.groupBy($"lang")
          .agg(count(lit(1)).as("n_docs"),
            sum($"n_chars").cast("long").as("total_chars"),
            sum($"n_tok").cast("long").as("total_toks"))
          .orderBy($"lang")
      },
      Some {
        val eqSum = (0 until NumPerms).map(j => s"(sa.m$j = sb.m$j)::INT").mkString(" + ")
        s"""
          |WITH ${DedupQueries.signaturesSql},
          |quality AS (
          |  SELECT doc_id, lang, n_chars,
          |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
          |    md5(text) AS h
          |  FROM documents
          |  WHERE len(string_split(text, ' ')) >= 20
          |    AND CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
          |          / len(string_split(text, ' ')) >= 0.25),
          |exact AS (
          |  SELECT doc_id, lang, n_chars, n_tok FROM (
          |    SELECT *, min(doc_id) OVER (PARTITION BY h) AS canon FROM quality)
          |  WHERE doc_id = canon),
          |${DedupQueries.bandsSql},
          |cand AS (
          |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
          |  FROM bands x JOIN bands y ON x.band = y.band AND x.bh = y.bh
          |  WHERE x.doc_id < y.doc_id),
          |dup_ids AS (
          |  SELECT DISTINCT doc_b AS doc_id
          |  FROM cand
          |  JOIN sig sa ON sa.doc_id = cand.doc_a
          |  JOIN sig sb ON sb.doc_id = cand.doc_b
          |  WHERE CAST($eqSum AS DOUBLE) / $NumPerms.0 >= 0.5),
          |clean AS (
          |  SELECT * FROM exact WHERE doc_id NOT IN (SELECT doc_id FROM dup_ids))
          |SELECT lang, count(*) AS n_docs,
          |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
          |  CAST(sum(n_tok) AS BIGINT) AS total_toks
          |FROM clean GROUP BY lang ORDER BY lang
          |""".stripMargin
      })
  )
}
