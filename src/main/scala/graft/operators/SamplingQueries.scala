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
          .select($"lang", explode(split($"text", " ")).as("tok"))
          .filter($"tok" =!= "")
          .select($"lang", hashP($"tok").as("hp"))
          .distinct()
        val wN = Window.partitionBy($"lang")
        val wR = Window.partitionBy($"lang").orderBy($"hp")
        tok
          .withColumn("n_exact", count(lit(1)).over(wN))
          .withColumn("rk", row_number().over(wR))
          .filter($"rk" <= K)
          .groupBy($"lang", $"n_exact")
          .agg(max($"hp").as("kth"))
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
        |""".stripMargin))
  )
}
