package graft.operators

import graft.Tables
import graft.functions.Embeddings
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over the `embeddings` table.
  *
  * q28 is the exact baseline: a bounded query set broadcast against the
  * full collection (the correct 100 TB shape for small query batches — the
  * big side streams, never shuffles, and top-k is computed in two phases
  * so no single task sorts a whole partition-key's worth of rows).
  *
  * q29 is the scale path: hyperplane-LSH bucket join (4 tables x 4 planes)
  * so each query only scores its bucket collisions. The oracle mirrors the
  * same algorithm, so approximate recall does not affect correctness.
  */
object SimilarityQueries {
  private val NumQueries = 10
  private val TopK = 5

  val all: Seq[CatalogQuery] = Seq(

    CatalogQuery(
      "q28_knn_brute",
      (s, d) => {
        import s.implicits._
        val v = Tables.embeddings(s, d)
          .select($"vec_id", Embeddings.quant("embedding").as("q"))
          .withColumn("nrm", Embeddings.norm2("q"))
          .cache()
        val queries = v.filter($"vec_id" < NumQueries).toDF("qid", "qq", "qn")
        val scored = v.join(broadcast(queries), $"vec_id" =!= $"qid")
          .withColumn("cos", Embeddings.cosine(Embeddings.dot("qq", "q"), $"qn", $"nrm"))
        // top-k per query: the rk <= TopK filter triggers Spark's
        // WindowGroupLimit rank-limit pushdown, pruning map-side to TopK
        // rows per query per partition before the single shuffle
        val w = Window.partitionBy($"qid").orderBy($"cos".desc, $"vec_id")
        scored.withColumn("rk", row_number().over(w)).filter($"rk" <= TopK)
          .select($"qid", $"rk", $"vec_id".as("neighbor"), $"cos")
          .orderBy($"qid", $"rk")
      },
      Some {
        val q = Embeddings.quantSql("embedding")
        s"""
          |WITH v AS (SELECT vec_id, $q AS q FROM embeddings),
          |vn AS (SELECT vec_id, q, ${Embeddings.norm2Sql("q")} AS nrm FROM v),
          |qs AS (SELECT vec_id AS qid, q AS qq, nrm AS qn FROM vn WHERE vec_id < $NumQueries),
          |scored AS (
          |  SELECT qid, vec_id,
          |    ${Embeddings.cosineSql(Embeddings.dotSql("qq", "q"), "qn", "nrm")} AS cos
          |  FROM vn CROSS JOIN qs WHERE vec_id <> qid)
          |SELECT qid, CAST(rk AS INT) AS rk, vec_id AS neighbor, cos FROM (
          |  SELECT qid, vec_id, cos,
          |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rk
          |  FROM scored)
          |WHERE rk <= $TopK ORDER BY qid, rk
          |""".stripMargin
      }),

    CatalogQuery(
      "q29_knn_lsh",
      (s, d) => {
        import s.implicits._
        val v = Tables.embeddings(s, d)
          .select($"vec_id", Embeddings.quant("embedding").as("q"))
          .withColumn("nrm", Embeddings.norm2("q"))
          .cache()
        val buckets = (0 until Embeddings.NumTables).map { t =>
          v.select($"vec_id", lit(t).as("tbl"), Embeddings.bucket("q", t).as("bkt"))
        }.reduce(_ unionByName _)
          .cache()
        val qb = buckets.filter($"vec_id" < NumQueries).toDF("qid", "tbl", "bkt")
        val cand = buckets.join(broadcast(qb), Seq("tbl", "bkt"))
          .filter($"vec_id" =!= $"qid")
          .select($"qid", $"vec_id").distinct()
        val va = v.toDF("qid", "qq", "qn")
        val scored = cand
          .join(broadcast(va), "qid")
          .join(v, "vec_id")
          .withColumn("cos", Embeddings.cosine(Embeddings.dot("qq", "q"), $"qn", $"nrm"))
        val w = Window.partitionBy($"qid").orderBy($"cos".desc, $"vec_id")
        scored.withColumn("rk", row_number().over(w)).filter($"rk" <= TopK)
          .select($"qid", $"rk", $"vec_id".as("neighbor"), $"cos")
          .orderBy($"qid", $"rk")
      },
      Some {
        val q = Embeddings.quantSql("embedding")
        val bucketRows = (0 until Embeddings.NumTables).map { t =>
          s"SELECT vec_id, $t AS tbl, ${Embeddings.bucketSql("q", t)} AS bkt FROM v"
        }.mkString("\n  UNION ALL ")
        s"""
          |WITH v AS (SELECT vec_id, $q AS q FROM embeddings),
          |vn AS (SELECT vec_id, q, ${Embeddings.norm2Sql("q")} AS nrm FROM v),
          |buckets AS (
          |  $bucketRows),
          |qb AS (SELECT vec_id AS qid, tbl, bkt FROM buckets WHERE vec_id < $NumQueries),
          |cand AS (
          |  SELECT DISTINCT qb.qid, b.vec_id
          |  FROM buckets b JOIN qb ON b.tbl = qb.tbl AND b.bkt = qb.bkt
          |  WHERE b.vec_id <> qb.qid),
          |scored AS (
          |  SELECT cand.qid, cand.vec_id,
          |    ${Embeddings.cosineSql(Embeddings.dotSql("a.q", "b.q"), "a.nrm", "b.nrm")} AS cos
          |  FROM cand
          |  JOIN vn a ON a.vec_id = cand.qid
          |  JOIN vn b ON b.vec_id = cand.vec_id)
          |SELECT qid, CAST(rk AS INT) AS rk, vec_id AS neighbor, cos FROM (
          |  SELECT qid, vec_id, cos,
          |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rk
          |  FROM scored)
          |WHERE rk <= $TopK ORDER BY qid, rk
          |""".stripMargin
      })
  )
}
