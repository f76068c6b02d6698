package graft.operators

import graft.SparkSpec
import graft.functions.Portable
import org.apache.spark.sql.functions._

/** Adversarial skew: hundreds of IDENTICAL documents share every MinHash
  * band and every LSH plane bucket, which without the BucketCap would
  * make the candidate self-join quadratic on one key (250k pairs from 500
  * docs; billions at corpus scale). The cap must drop those degenerate
  * buckets so candidate generation stays bounded — and docs with real
  * near-dup structure must still pair up.
  */
class SkewSpec extends SparkSpec {

  test("500 identical docs produce zero band-bucket candidates, quickly") {
    import spark.implicits._
    val base = "the same exact document body repeated forever and ever again"
    val docs = (0 until 500).map(i => (i.toLong, base)) ++
      // a small duplicate group in its own bucket (size 2 <= cap): must
      // still pair — the cap only drops DEGENERATE buckets
      Seq((9001L, "alpha beta gamma delta epsilon zeta eta theta"),
        (9002L, "alpha beta gamma delta epsilon zeta eta theta"))
    val df = docs.toDF("doc_id", "text")
    df.createOrReplaceTempView("skew_docs")

    // replicate q20's candidate generation over this frame
    val t0 = System.nanoTime()
    val cand = DedupQueries.lshPairs(DedupQueries.sigRows(df), None)
      .select($"doc_a", $"doc_b")
      .collect()
    val sec = (System.nanoTime() - t0) / 1e9

    // the 500-doc degenerate bucket is dropped entirely...
    assert(!cand.exists(r => r.getLong(0) < 500 && r.getLong(1) < 500),
      s"degenerate bucket leaked ${cand.length} candidate pairs")
    // ...while the small duplicate group survives (its bucket is under cap)
    assert(cand.exists(r => r.getLong(0) == 9001L && r.getLong(1) == 9002L),
      s"small duplicate group lost; got ${cand.toSeq}")
    assert(sec < 30.0, s"candidate generation took ${sec}s — quadratic blowup is back")
  }

  test("identical embeddings cannot make the plane-bucket join quadratic") {
    import spark.implicits._
    // 300 identical vectors -> same bucket in every table; cap drops them
    val vecs = (0 until 300).map(i => (i.toLong, Array.fill(64)(0.5f))) ++
      Seq((9001L, Array.tabulate(64)(d => if (d < 32) 1.0f else -1.0f)),
        (9002L, Array.tabulate(64)(d => if (d < 32) 1.0f else -0.9f)))
    val v = vecs.toDF("vec_id", "embedding")
      .select($"vec_id", graft.functions.Embeddings.quant("embedding").as("q"))
    val wB = org.apache.spark.sql.expressions.Window.partitionBy($"tbl", $"bkt")
    val buckets = (0 until graft.functions.Embeddings.NumTables).map { t =>
      v.select($"vec_id", lit(t).as("tbl"),
        graft.functions.Embeddings.bucket("q", t).as("bkt"))
    }.reduce(_ unionByName _)
      .withColumn("nb", count(lit(1)).over(wB))
      .filter($"nb" <= Portable.BucketCap).drop("nb")
    val cand = buckets.as("x").join(buckets.as("y"), Seq("tbl", "bkt"))
      .filter($"x.vec_id" < $"y.vec_id")
      .select($"x.vec_id".as("a"), $"y.vec_id".as("b")).collect()
    assert(!cand.exists(r => r.getLong(0) < 300 && r.getLong(1) < 300),
      "degenerate embedding bucket leaked pairs")
  }
}
