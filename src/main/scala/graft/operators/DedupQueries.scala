package graft.operators

import graft.Tables
import graft.functions.{Embeddings, Portable}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines:
  * exact (content-hash), MinHash + banded LSH, SimHash, n-gram Jaccard via
  * an inverted-index join, and embedding-cosine near-dup via hyperplane LSH.
  *
  * Scale design: every candidate-generation step is a bucket join (band
  * hash, shingle inverted index, LSH bucket) — never an all-pairs product —
  * so each operator's shuffles are keyed and bounded at 100 TB. All hashing
  * is the md5-derived portable scheme in [[Portable]], so the DuckDB oracle
  * reproduces the results bit-for-bit.
  */
object DedupQueries {
  import Portable._

  /** Max candidate-pair edges solved by exact driver-side union-find in
    * q48; larger graphs fall through to distributed label propagation.
    * 4M edges ≈ 64 MB of longs — trivially driver-safe.
    */
  private val DriverCCMaxEdges = 4L * 1000 * 1000

  /** Distinct hashed 3-token shingles per document (the MinHash/Jaccard
    * universe). Shingles are hashed to mod-P longs BEFORE the distinct — the
    * dedup shuffle then carries 8-byte keys instead of ~20-byte strings
    * (2.5x smaller exchanges; downstream only ever consumes the hash).
    */
  /** Distinct per-doc shingle hashes, entirely row-local: the codegen'd
    * ShingleHashes kernel emits the doc's h60 array and [[graft.functions.DistinctModP]]
    * dedups the modded values INSIDE the row — since doc_id is unique per
    * input row, per-doc dedup IS `SELECT DISTINCT doc_id, hp`, so set
    * semantics cost zero exchanges (the old formulation shuffled the full
    * shingle frame through a global distinct).
    */
  /** Per-doc DISTINCT shingle-hash array as one row-local column — the
    * single source of the shingle-hash definition ([[hashedShingles]]
    * explodes it; q80 intersects it).
    */
  private[operators] def shingleArrayCol: Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(graft.functions.DistinctModP(
      Bridge.expression(Bridge.column(graft.functions.ShingleHashes(
        Bridge.expression(graft.functions.Portable.spaceSplit(col("text")))))), P))
  }

  private[operators] def hashedShingles(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(col("doc_id"), explode(shingleArrayCol).as("hp"))

  /** DuckDB mirror of [[hashedShingles]] as a WITH-clause body named `shh`. */
  private[operators] val shinglesSql: String =
    s"""toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
      |  WHERE len(string_split(text, ' ')) >= 3),
      |sh0 AS (
      |  SELECT doc_id, concat(t[i], ' ', t[i+1], ' ', t[i+2]) AS sh
      |  FROM (SELECT doc_id, t, unnest(range(1, len(t) - 1)) AS i FROM toks)),
      |shh AS (SELECT DISTINCT doc_id, ${hashPSql("sh")} AS hp FROM sh0)""".stripMargin

  /** (doc_id, sig) with the 16-permutation MinHash signature as an array,
    * computed entirely row-local by the codegen'd [[graft.functions.MinHashSig]]
    * kernel (a whole document's shingles arrive in one row, so the
    * per-permutation min folds inside the row — ZERO exchanges, where the
    * old explode+groupBy formulation shuffled the full shingle frame).
    * Docs with < 3 tokens have no shingles and are dropped, exactly like
    * the groupBy formulation; values are verified identical by
    * StreamingDedupSpec.
    */
  private[operators] def sigRows(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.graft.Bridge
    val sig = Bridge.column(graft.functions.MinHashSig(
      Bridge.expression(Bridge.column(graft.functions.ShingleHashes(
        Bridge.expression(graft.functions.Portable.spaceSplit(col("text"))))))))
    df.select(col("doc_id"), sig.as("sig")).filter(col("sig").isNotNull)
  }

  private[operators] def sigRows(s: SparkSession, d: String): DataFrame =
    sigRows(Tables.documents(s, d))

  private[operators] val signaturesSql: String = {
    val mins = (0 until NumPerms)
      .map(j => s"CAST(min(${permSql(j, "hp")}) AS BIGINT) AS m$j").mkString(", ")
    s"""$shinglesSql,
       |sig AS (SELECT doc_id, $mins FROM shh GROUP BY doc_id)""".stripMargin
  }

  /** Near-dup candidate pairs with their signature-agreement estimate:
    * distinct (doc_a, doc_b, est_sim) from banded-LSH bucket collisions
    * over a [[sigRows]] frame.
    *
    * Scale shape — the packed inverted index: band rows (4 per doc, all
    * row-local from the in-row signature) are aggregated ONCE per
    * (band, bh) into `struct(count, collect_list(doc_id, sig))`; the cap
    * decision rides the count in the SAME aggregate, and candidate pairs
    * + est_sim are then generated row-locally by a bounded double-explode
    * (≤ BucketCap² rows per bucket, inside whole-stage codegen). Total
    * exchanges: the index groupBy and the final pair distinct — where the
    * window-cap + self-join + two signature join-backs this replaces cost
    * a full sort+shuffle of the band frame plus two corpus-sized signature
    * shuffles. Kept buckets carry ≤ BucketCap packed entries; hot buckets
    * (degenerate content) accumulate before the filter drops them, but the
    * object-aggregate falls back to sort-and-spill rather than OOM — the
    * same disk profile the old full-frame window sort always paid, now
    * only on hot keys.
    *
    * `pairCond` picks the pair orientation (a < b for self-dedup; a
    * corpus/batch split predicate for incremental ingest); `minEst`
    * filters on agreement BEFORE the distinct so the exchange only
    * carries surviving pairs. Results are identical to the oracle's
    * window-cap + self-join + join-back formulation ([[bandsSql]]).
    */
  private[operators] def lshPairs(sr: DataFrame, minEst: Option[Double],
      pairCond: (Column, Column) => Column = _ < _): DataFrame = {
    // the packed index wants the hash aggregate to hold >128 keys —
    // that's session construction's job ([[graft.GraftConf.tuned]]), not a
    // query builder's: mutating the shared session here would silently
    // change every unrelated ObjectHashAggregate's memory profile
    val bandCols = (0 until NumBands).map { b =>
      val parts = (0 until BandSize)
        .map(r => element_at(col("sig"), b * BandSize + r + 1).cast("string"))
      hash60(concat_ws(",", parts: _*))
    }
    val bands = sr.select(col("doc_id"), col("sig"),
      posexplode(array(bandCols: _*)).as(Seq("band", "bh")))
    val inv = bands.groupBy(col("band"), col("bh"))
      .agg(count(lit(1)).as("nb"),
        collect_list(struct(col("doc_id").as("i"), col("sig").as("g"))).as("ds"))
      .filter(col("nb") <= BucketCap)
    val est = (0 until NumPerms)
      .map(j => when(element_at(col("a.g"), j + 1) === element_at(col("b.g"), j + 1), 1)
        .otherwise(0))
      .reduce(_ + _).cast("double") / NumPerms.toDouble
    val pairs = inv.select(explode(col("ds")).as("a"), col("ds"))
      .select(col("a"), explode(col("ds")).as("b"))
      .filter(pairCond(col("a.i"), col("b.i")))
      .select(col("a.i").as("doc_a"), col("b.i").as("doc_b"), est.as("est_sim"))
    minEst.fold(pairs)(m => pairs.filter(col("est_sim") >= m)).distinct()
  }

  /** Capped (hp → packed doc list) shingle inverted index: (hp, df, ds).
    * Same packed-index shape as [[lshPairs]] — one exchange builds it,
    * consumers explode row-locally.
    */
  private[operators] def shingleIndex(s: SparkSession, d: String): DataFrame = {
    // packed-index fallback threshold comes from session construction
    // ([[graft.GraftConf.tuned]]); see lshPairs
    hashedShingles(s, d).groupBy(col("hp"))
      .agg(count(lit(1)).as("df"), collect_list(col("doc_id")).as("ds"))
      .filter(col("df") <= BucketCap)
  }

  /** DuckDB mirror of [[bandBuckets]]: WITH-clause body named `bands`,
    * reading from a CTE named `sig`. */
  private[operators] val bandsSql: String = {
    val bandRows = (0 until NumBands).map { b =>
      val cols = (0 until BandSize).map(r => s"m${b * BandSize + r}::VARCHAR").mkString(", ")
      s"SELECT doc_id, $b AS band, ${hash60Sql(s"concat_ws(',', $cols)")} AS bh FROM sig"
    }.mkString("\n  UNION ALL ")
    s"""bands0 AS (
       |  $bandRows),
       |bands AS (
       |  SELECT doc_id, band, bh FROM (
       |    SELECT doc_id, band, bh, count(*) OVER (PARTITION BY band, bh) AS nb
       |    FROM bands0)
       |  WHERE nb <= $BucketCap)""".stripMargin
  }

  /** Connected components over an undirected pair list (doc_a, doc_b):
    * result = (doc_id, label) with label = min doc_id of the component.
    *
    * The candidate graph is orders of magnitude smaller than the corpus
    * (only docs sharing a capped band bucket appear), so:
    *  - under `maxDriverEdges`, solve EXACTLY with union-find on the
    *    collected edge list — one job, no iteration; tens of MB of driver
    *    memory at the bound;
    *  - beyond it, distributed min-label propagation (the GraphX-CC
    *    Pregel shape): 4 unrolled rounds per job, lineage truncated by
    *    localCheckpoint (each round references `next` twice, so the
    *    logical tree would otherwise double per round), converging in
    *    O(cluster diameter) rounds with only the changed-row count on
    *    the driver.
    */
  private[operators] def connectedComponents(pairs: DataFrame,
      maxDriverEdges: Long = DriverCCMaxEdges): DataFrame = {
    val s = pairs.sparkSession
    import s.implicits._
    // size probe and edge fetch in ONE job: collect at most max+1 rows —
    // if the graph fits the driver bound we already hold its edges (no
    // separate count() pass over the candidate join), and on a large
    // graph the limit stops the collection at the bound
    val probeLimit = (maxDriverEdges + 1).min(Int.MaxValue.toLong).toInt
    val probe = pairs.limit(probeLimit).collect()
    if (probe.length <= maxDriverEdges) {
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x
        while (parent.getOrElse(c, c) != r) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      probe.foreach { row =>
        val (a, b) = (row.getLong(0), row.getLong(1))
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val resolved = (parent.keySet ++ parent.values).toSeq
        .map(x => (x, find(x))).distinct
      s.createDataFrame(resolved).toDF("doc_id", "label")
    } else {
      // only the distributed path re-reads the pair list across actions
      pairs.cache()
      val nodes = pairs.select($"doc_a".as("doc_id"))
        .union(pairs.select($"doc_b".as("doc_id"))).distinct()
      val edges = pairs.select($"doc_a".as("src"), $"doc_b".as("dst"))
        .union(pairs.select($"doc_b".as("src"), $"doc_a".as("dst")))
        .cache()
      var lbl = nodes.select($"doc_id", $"doc_id".as("label"))
        .localCheckpoint(true)
      var converged = false
      var block = 0
      while (!converged && block < 8) {
        var next = lbl
        for (_ <- 0 until 4) {
          val nm = edges.join(next, edges("dst") === next("doc_id"))
            .groupBy($"src").agg(min($"label").as("nmin"))
          next = next.join(nm, next("doc_id") === nm("src"), "left")
            .select(next("doc_id"), least(next("label"),
              coalesce($"nmin", next("label"))).as("label"))
        }
        next = next.localCheckpoint(true)
        val changed = next.join(lbl.withColumnRenamed("label", "old"), "doc_id")
          .filter($"label" =!= $"old").count()
        lbl = next
        converged = changed == 0
        block += 1
      }
      // fail LOUDLY on a pathological graph (eccentricity > 32 from the
      // component min) rather than silently returning split clusters
      if (!converged)
        throw new IllegalStateException(
          "connected-components label propagation did not converge in 32 rounds; " +
            "graph has a component with eccentricity > 32 — raise the block cap")
      lbl
    }
  }

  val all: Seq[CatalogQuery] = Seq(

    // Exact dedup: one shuffle on the content hash; min-id canonicalization.
    // The reference has no dedup surface; shape follows the `_id`-merge
    // convention of its write path (core/.../output/MongoRecordWriter.java:91-120)
    // where the key IS the content identity.
    CatalogQuery(
      "q19_dedup_exact",
      (s, d) => {
        import s.implicits._
        val h = Tables.documents(s, d).select($"doc_id", md5($"text").as("content_hash"))
        val canon = h.groupBy($"content_hash").agg(min($"doc_id").as("canonical_id"),
          count(lit(1)).as("n_copies"))
        h.join(canon, "content_hash")
          .select($"doc_id", $"content_hash", $"canonical_id",
            ($"doc_id" =!= $"canonical_id").as("is_dup"), $"n_copies")
          .orderBy($"doc_id")
      },
      Some("""
        |WITH h AS (SELECT doc_id, md5(text) AS content_hash FROM documents),
        |canon AS (SELECT content_hash, min(doc_id) AS canonical_id, count(*) AS n_copies
        |          FROM h GROUP BY content_hash)
        |SELECT doc_id, h.content_hash, canonical_id,
        |       doc_id <> canonical_id AS is_dup, n_copies
        |FROM h JOIN canon USING (content_hash)
        |ORDER BY doc_id
        |""".stripMargin)),

    // MinHash + banded LSH near-dup: 16 perms, 4 bands x 4 rows; candidate
    // pairs ONLY from band-bucket collisions (never all-pairs), then the
    // signature-agreement estimate filters at 0.5.
    CatalogQuery(
      "q20_dedup_minhash",
      (s, d) => {
        import s.implicits._
        lshPairs(sigRows(s, d), Some(0.5))
          .select($"doc_a", $"doc_b", $"est_sim")
          .orderBy($"doc_a", $"doc_b")
      },
      Some {
        val eqSum = (0 until NumPerms).map(j => s"(sa.m$j = sb.m$j)::INT").mkString(" + ")
        s"""
          |WITH $signaturesSql,
          |$bandsSql,
          |cand AS (
          |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
          |  FROM bands x JOIN bands y ON x.band = y.band AND x.bh = y.bh
          |  WHERE x.doc_id < y.doc_id)
          |SELECT doc_a, doc_b, est_sim FROM (
          |  SELECT doc_a, doc_b, CAST($eqSum AS DOUBLE) / $NumPerms.0 AS est_sim
          |  FROM cand
          |  JOIN sig sa ON sa.doc_id = cand.doc_a
          |  JOIN sig sb ON sb.doc_id = cand.doc_b)
          |WHERE est_sim >= 0.5
          |ORDER BY doc_a, doc_b
          |""".stripMargin
      }),

    // SimHash: 16-bit fingerprint from token-hash bit votes; docs sharing a
    // fingerprint are near-dup candidates (single shuffle on doc, then on fp).
    CatalogQuery(
      "q21_dedup_simhash",
      (s, d) => {
        import s.implicits._
        val tok = Tables.documents(s, d)
          .select($"doc_id", explode(array_distinct(graft.functions.Portable.spaceSplit($"text"))).as("tok"))
          .filter($"tok" =!= "")
          .select($"doc_id", hashP($"tok").as("hp"))
        val votes = (0 until SimhashBits).map(b =>
          sum(when(shiftright($"hp", b).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"s$b"))
        val fp = tok.groupBy($"doc_id").agg(votes.head, votes.tail: _*)
          .select($"doc_id",
            (0 until SimhashBits).map(b => when(col(s"s$b") > 0, lit(1 << b)).otherwise(lit(0)))
              .reduce(_ + _).cast("long").as("simhash"))
        val sizes = fp.groupBy($"simhash").agg(count(lit(1)).as("n_bucket"))
        fp.join(sizes, "simhash")
          .select($"doc_id", $"simhash", $"n_bucket")
          .orderBy($"doc_id")
      },
      Some {
        val votes = (0 until SimhashBits).map(b =>
          s"sum(CASE WHEN (hp >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS s$b").mkString(", ")
        val bits = (0 until SimhashBits).map(b =>
          s"(CASE WHEN s$b > 0 THEN ${1 << b} ELSE 0 END)").mkString(" + ")
        s"""
          |WITH tok AS (
          |  SELECT DISTINCT doc_id, tok FROM (
          |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
          |  WHERE tok <> ''),
          |h AS (SELECT doc_id, ${hashPSql("tok")} AS hp FROM tok),
          |votes AS (SELECT doc_id, $votes FROM h GROUP BY doc_id),
          |fp AS (SELECT doc_id, CAST($bits AS BIGINT) AS simhash FROM votes),
          |sizes AS (SELECT simhash, count(*) AS n_bucket FROM fp GROUP BY simhash)
          |SELECT doc_id, simhash, n_bucket FROM fp JOIN sizes USING (simhash)
          |ORDER BY doc_id
          |""".stripMargin
      }),

    // Exact n-gram Jaccard via shingle inverted-index join. Shingles are
    // hashed to 8-byte keys FIRST (the shuffle/join key is a long, not a
    // ~20-byte string — materially smaller exchanges at 100 TB), and
    // stop-shingles (document frequency > 50) are dropped from the
    // universe — the standard trick that keeps the candidate join bounded.
    // Jaccard is over hashed shingle sets (identical definition in the
    // oracle; md5 collisions are deterministic in both engines).
    CatalogQuery(
      "q22_dedup_ngram",
      (s, d) => {
        import s.implicits._
        // df-capped self-join on the hashed-shingle occurrence frame.
        // Round-9 respell: the packed-index double-explode carried the
        // doc array through the first Generate and emitted sum(df^2)
        // rows (28M at 10x for this 3-gram distribution — few distinct
        // keys, high df) before the da<db filter halved them; the
        // self-join emits only the da<db half, its rows are two bare
        // longs, and ONE hp-keyed exchange of the kept occurrences is
        // reused by the df cap, the sizes aggregate and both join sides
        // (ReusedExchange). Cap semantics identical: only buckets with
        // df <= BucketCap enter the candidate join, so nothing is
        // quadratic on a degenerate key at 100 TB. (The packed index
        // remains the right shape where the fan-out is singleton-
        // dominated or metadata must ride each pair — q103, lshPairs.)
        val occ = hashedShingles(s, d)
        val dfk = occ.groupBy($"hp").agg(count(lit(1)).as("df"))
          .filter($"df" <= BucketCap)
          .select($"hp")
        val kept = occ.join(dfk, "hp")
        val sizes = kept.groupBy($"doc_id").agg(count(lit(1)).as("nsh"))
        val shared = kept.as("a")
          .join(kept.as("b"),
            $"a.hp" === $"b.hp" && $"a.doc_id" < $"b.doc_id")
          .groupBy($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
          .agg(count(lit(1)).as("shared"))
        shared
          .join(sizes.toDF("doc_a", "na"), "doc_a")
          .join(sizes.toDF("doc_b", "nb"), "doc_b")
          .withColumn("jaccard", $"shared".cast("double") / ($"na" + $"nb" - $"shared"))
          .filter($"jaccard" >= 0.5)
          .select($"doc_a", $"doc_b", $"jaccard")
          .orderBy($"doc_a", $"doc_b")
      },
      Some(s"""
        |WITH $shinglesSql,
        |shf AS (
        |  SELECT doc_id, hp FROM (
        |    SELECT doc_id, hp, count(*) OVER (PARTITION BY hp) AS df FROM shh)
        |  WHERE df <= $BucketCap),
        |sizes AS (SELECT doc_id, count(*) AS nsh FROM shf GROUP BY doc_id),
        |shared AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
        |  FROM shf a JOIN shf b ON a.hp = b.hp AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT doc_a, doc_b, jaccard FROM (
        |  SELECT doc_a, doc_b,
        |    CAST(shared AS DOUBLE) / (na.nsh + nb.nsh - shared) AS jaccard
        |  FROM shared
        |  JOIN sizes na ON na.doc_id = doc_a
        |  JOIN sizes nb ON nb.doc_id = doc_b)
        |WHERE jaccard >= 0.5
        |ORDER BY doc_a, doc_b
        |""".stripMargin)),

    // Embedding-cosine near-dup: candidates ONLY from hyperplane-LSH bucket
    // collisions (4 tables x 4 planes), exact integer cosine >= 0.4.
    CatalogQuery(
      "q23_dedup_embed",
      (s, d) => {
        import s.implicits._
        // cache: quantized vectors feed 4 bucket branches + 2 join probes
        val v = Tables.embeddings(s, d)
          .select($"vec_id", Embeddings.quant("embedding").as("q"))
          .withColumn("nrm", Embeddings.norm2("q"))
          .cache()
        // cap hot buckets (degenerate directions) via a window count the
        // candidate self-join's exchange then reuses — bounded per key
        // even on adversarial inputs; mirrored in oracle
        val wB = org.apache.spark.sql.expressions.Window.partitionBy($"tbl", $"bkt")
        val buckets = (0 until Embeddings.NumTables).map { t =>
          v.select($"vec_id", lit(t).as("tbl"), Embeddings.bucket("q", t).as("bkt"))
        }.reduce(_ unionByName _)
          .withColumn("nb", count(lit(1)).over(wB))
          .filter($"nb" <= BucketCap).drop("nb")
          .cache()
        val cand = buckets.as("x").join(buckets.as("y"), Seq("tbl", "bkt"))
          .filter($"x.vec_id" < $"y.vec_id")
          .select($"x.vec_id".as("vec_a"), $"y.vec_id".as("vec_b"))
          .distinct()
        val va = v.toDF("vec_a", "qa", "na")
        val vb = v.toDF("vec_b", "qb", "nb")
        cand.join(va, "vec_a").join(vb, "vec_b")
          .withColumn("cos",
            Embeddings.cosine(Embeddings.dot("qa", "qb"), $"na", $"nb"))
          .filter($"cos" >= 0.4)
          .select($"vec_a", $"vec_b", $"cos")
          .orderBy($"vec_a", $"vec_b")
      },
      Some {
        val q = Embeddings.quantSql("embedding")
        val bucketRows = (0 until Embeddings.NumTables).map { t =>
          s"SELECT vec_id, $t AS tbl, ${Embeddings.bucketSql("q", t)} AS bkt FROM v"
        }.mkString("\n  UNION ALL ")
        s"""
          |WITH v AS (
          |  SELECT vec_id, $q AS q FROM embeddings),
          |vn AS (SELECT vec_id, q, ${Embeddings.norm2Sql("q")} AS nrm FROM v),
          |buckets0 AS (
          |  $bucketRows),
          |buckets AS (
          |  SELECT vec_id, tbl, bkt FROM (
          |    SELECT vec_id, tbl, bkt, count(*) OVER (PARTITION BY tbl, bkt) AS nb
          |    FROM buckets0)
          |  WHERE nb <= $BucketCap),
          |cand AS (
          |  SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
          |  FROM buckets x JOIN buckets y ON x.tbl = y.tbl AND x.bkt = y.bkt
          |  WHERE x.vec_id < y.vec_id)
          |SELECT vec_a, vec_b, cos FROM (
          |  SELECT vec_a, vec_b,
          |    ${Embeddings.cosineSql(Embeddings.dotSql("a.q", "b.q"), "a.nrm", "b.nrm")} AS cos
          |  FROM cand
          |  JOIN vn a ON a.vec_id = cand.vec_a
          |  JOIN vn b ON b.vec_id = cand.vec_b)
          |WHERE cos >= 0.4
          |ORDER BY vec_a, vec_b
          |""".stripMargin
      }),

    // Near-dup CLUSTERING: connected components over the MinHash candidate
    // pairs (pair lists over-delete chains A~B~C; real pipelines cluster
    // first, then keep one canonical doc per component). Min-label
    // propagation in DataFrames — the Pregel pattern: each round every doc
    // takes the min label in its neighborhood; converges in O(cluster
    // diameter) rounds (near-dup clusters are shallow), each round ONE
    // keyed shuffle, nothing driver-side but the per-round convergence
    // count. Mirrored by a recursive CTE in the oracle.
    CatalogQuery(
      "q48_dedup_clusters",
      (s, d) => {
        import s.implicits._
        val pairs = lshPairs(sigRows(s, d), None).select($"doc_a", $"doc_b")
        val labels = connectedComponents(pairs)
        val sizes = labels.groupBy($"label").agg(count(lit(1)).as("cluster_size"))
        labels.join(sizes, "label")
          .select($"doc_id", $"label".as("cluster_id"), $"cluster_size")
          .orderBy($"doc_id")
      },
      Some(s"""
        |WITH RECURSIVE $signaturesSql,
        |$bandsSql,
        |pairs AS (
        |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
        |  FROM bands x JOIN bands y ON x.band = y.band AND x.bh = y.bh
        |  WHERE x.doc_id < y.doc_id),
        |edges AS (
        |  SELECT doc_a AS src, doc_b AS dst FROM pairs
        |  UNION ALL SELECT doc_b, doc_a FROM pairs),
        |nodes AS (SELECT DISTINCT src AS doc_id FROM edges),
        |walk(doc_id, label) AS (
        |  SELECT doc_id, doc_id FROM nodes
        |  UNION
        |  SELECT e.src, w.label FROM walk w JOIN edges e ON e.dst = w.doc_id),
        |cc AS (SELECT doc_id, min(label) AS cluster_id FROM walk GROUP BY doc_id),
        |sizes AS (SELECT cluster_id, count(*) AS cluster_size FROM cc GROUP BY cluster_id)
        |SELECT doc_id, cluster_id, cluster_size
        |FROM cc JOIN sizes USING (cluster_id)
        |ORDER BY doc_id
        |""".stripMargin)),

    // INCREMENTAL dedup: a new batch checked against the existing corpus
    // index — the production ingest shape: the corpus side's signatures
    // are computed once and persisted (here: the doc_id < 400 partition
    // stands in for the stored index), each incoming batch only hashes
    // ITSELF and bucket-joins the index. Cost per batch is O(batch), not
    // O(corpus); only cross (index x batch) bucket pairs are generated.
    CatalogQuery(
      "q49_dedup_incremental",
      (s, d) => {
        import s.implicits._
        val CorpusMax = 400L
        // same packed index; the pair condition orients (corpus, batch)
        // instead of (low, high) — only cross pairs are generated
        lshPairs(sigRows(s, d), Some(0.5),
            (a, b) => a < CorpusMax && b >= CorpusMax)
          .select($"doc_b".as("new_id"), $"doc_a".as("corpus_id"), $"est_sim")
          .orderBy($"new_id", $"corpus_id")
      },
      Some {
        val eqSum = (0 until NumPerms).map(j => s"(sa.m$j = sb.m$j)::INT").mkString(" + ")
        s"""
          |WITH $signaturesSql,
          |$bandsSql,
          |cand AS (
          |  SELECT DISTINCT x.doc_id AS corpus_id, y.doc_id AS new_id
          |  FROM bands x JOIN bands y ON x.band = y.band AND x.bh = y.bh
          |  WHERE x.doc_id < 400 AND y.doc_id >= 400)
          |SELECT new_id, corpus_id, est_sim FROM (
          |  SELECT new_id, corpus_id, CAST($eqSum AS DOUBLE) / $NumPerms.0 AS est_sim
          |  FROM cand
          |  JOIN sig sa ON sa.doc_id = cand.corpus_id
          |  JOIN sig sb ON sb.doc_id = cand.new_id)
          |WHERE est_sim >= 0.5
          |ORDER BY new_id, corpus_id
          |""".stripMargin
      }),

    // Dedup APPLY: the step that actually produces the deduplicated
    // corpus. q48 labels near-dup clusters with the component's min
    // doc_id, so the representative IS the label: every doc off the pair
    // graph survives, every clustered doc survives iff it is its
    // cluster's label. Reported as the per-source keep/drop audit a
    // pipeline operator signs off on before retraining. Scale shape: the
    // dropped set is pair-graph-bounded (usually ≪ corpus) and joins the
    // corpus as a broadcast/shuffle LEFT join on doc_id — never a scan
    // of docs × clusters.
    CatalogQuery(
      "q61_dedup_apply",
      (s, d) => {
        import s.implicits._
        val pairs = lshPairs(sigRows(s, d), None).select($"doc_a", $"doc_b")
        val dropped = connectedComponents(pairs)
          .filter($"doc_id" =!= $"label")
          .select($"doc_id", lit(1L).as("is_dup"))
        Tables.documents(s, d)
          .join(dropped, Seq("doc_id"), "left")
          .groupBy($"source")
          .agg(
            count(lit(1)).as("n_docs"),
            sum(coalesce($"is_dup", lit(0L))).cast("long").as("n_dropped"))
          .select($"source", $"n_docs",
            ($"n_docs" - $"n_dropped").as("n_kept"), $"n_dropped")
          .orderBy($"source")
      },
      Some(s"""
        |WITH RECURSIVE $signaturesSql,
        |$bandsSql,
        |pairs AS (
        |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
        |  FROM bands x JOIN bands y ON x.band = y.band AND x.bh = y.bh
        |  WHERE x.doc_id < y.doc_id),
        |edges AS (
        |  SELECT doc_a AS src, doc_b AS dst FROM pairs
        |  UNION ALL SELECT doc_b, doc_a FROM pairs),
        |nodes AS (SELECT DISTINCT src AS doc_id FROM edges),
        |walk(doc_id, label) AS (
        |  SELECT doc_id, doc_id FROM nodes
        |  UNION
        |  SELECT e.src, w.label FROM walk w JOIN edges e ON e.dst = w.doc_id),
        |cc AS (SELECT doc_id, min(label) AS cluster_id FROM walk GROUP BY doc_id),
        |dropped AS (SELECT doc_id FROM cc WHERE doc_id <> cluster_id)
        |SELECT source, count(*) AS n_docs,
        |  CAST(count(*) - count(dr.doc_id) AS BIGINT) AS n_kept,
        |  CAST(count(dr.doc_id) AS BIGINT) AS n_dropped
        |FROM documents LEFT JOIN dropped dr USING (doc_id)
        |GROUP BY source ORDER BY source
        |""".stripMargin)),

    // MinHash estimator-quality audit: for every LSH candidate pair (NO
    // agreement threshold — the estimator itself is under audit), the
    // 16-permutation signature estimate next to the EXACT shingle-set
    // Jaccard and the absolute error — the dedup-side analog of q78's
    // recall audit (both validate a sketch against ground truth before
    // trusting it at scale). Exact Jaccard is row-local: each doc's
    // distinct shingle hashes ride along as ONE array (no shingle
    // explode, no hp-keyed exchange) and `array_intersect` computes the
    // overlap inside codegen; the candidate set is bounded by the capped
    // buckets, so the two doc-keyed joins carry candidate×array rows
    // only. At 100 TB: the audit costs two bounded joins on top of the
    // capped candidate generator — never an all-pairs or a shingle-frame
    // shuffle.
    CatalogQuery(
      "q80_minhash_precision",
      (s, d) => {
        import s.implicits._
        val cand = lshPairs(sigRows(s, d), None)
        val arrs = Tables.documents(s, d)
          .select($"doc_id", shingleArrayCol.as("hs")).filter(size($"hs") > 0)
        cand
          .join(arrs.select($"doc_id".as("doc_a"), $"hs".as("ha")), "doc_a")
          .join(arrs.select($"doc_id".as("doc_b"), $"hs".as("hb")), "doc_b")
          .select($"doc_a", $"doc_b", $"est_sim",
            size(array_intersect($"ha", $"hb")).as("inter"),
            (size($"ha") + size($"hb")).as("ab"))
          .select($"doc_a", $"doc_b", $"est_sim",
            ($"inter".cast("double") / ($"ab" - $"inter").cast("double"))
              .as("exact_jac"))
          .withColumn("abs_err", abs($"est_sim" - $"exact_jac"))
          .orderBy($"doc_a", $"doc_b")
      },
      Some {
        val eqSum = (0 until NumPerms).map(j => s"(sa.m$j = sb.m$j)::INT").mkString(" + ")
        s"""
          |WITH $signaturesSql,
          |$bandsSql,
          |cand AS (
          |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
          |  FROM bands x JOIN bands y ON x.band = y.band AND x.bh = y.bh
          |  WHERE x.doc_id < y.doc_id),
          |est AS (
          |  SELECT doc_a, doc_b, CAST($eqSum AS DOUBLE) / $NumPerms.0 AS est_sim
          |  FROM cand
          |  JOIN sig sa ON sa.doc_id = cand.doc_a
          |  JOIN sig sb ON sb.doc_id = cand.doc_b),
          |nd AS (SELECT doc_id, count(*) AS n FROM shh GROUP BY doc_id),
          |iv AS (
          |  SELECT e.doc_a, e.doc_b, count(b.hp) AS inter
          |  FROM est e
          |  JOIN shh a ON a.doc_id = e.doc_a
          |  LEFT JOIN shh b ON b.doc_id = e.doc_b AND b.hp = a.hp
          |  GROUP BY e.doc_a, e.doc_b)
          |SELECT e.doc_a, e.doc_b, est_sim,
          |  CAST(inter AS DOUBLE) / CAST(na.n + nb.n - inter AS DOUBLE) AS exact_jac,
          |  abs(est_sim - CAST(inter AS DOUBLE) / CAST(na.n + nb.n - inter AS DOUBLE))
          |    AS abs_err
          |FROM est e
          |JOIN iv ON iv.doc_a = e.doc_a AND iv.doc_b = e.doc_b
          |JOIN nd na ON na.doc_id = e.doc_a
          |JOIN nd nb ON nb.doc_id = e.doc_b
          |ORDER BY e.doc_a, e.doc_b
          |""".stripMargin
      }),

    // Cross-source near-dup overlap matrix: which ingestion sources copy
    // from each other — q20's capped LSH candidate pairs rolled up to an
    // unordered (source_a, source_b) matrix with pair counts and mean
    // estimated similarity. The report an operator reads before dropping
    // a mirror/scraper source wholesale. mean_sim is exact cross-engine:
    // est_sim values are multiples of 1/16, so double sums are exact and
    // order-independent. Scale shape: pairs are candidate-bounded (band
    // buckets capped at BucketCap — never all-pairs); the two doc→source
    // enrichment joins key on doc_id with the TINY pair frame on the
    // build side (AQE broadcasts it), and the final matrix exchange
    // carries ≤ |sources|² rows.
    CatalogQuery(
      "q84_source_overlap",
      (s, d) => {
        import s.implicits._
        val pairs = lshPairs(sigRows(s, d), Some(0.5))
        val src = Tables.documents(s, d).select($"doc_id", $"source")
        pairs
          .join(src.select($"doc_id".as("doc_a"), $"source".as("sa")), "doc_a")
          .join(src.select($"doc_id".as("doc_b"), $"source".as("sb")), "doc_b")
          .select(least($"sa", $"sb").as("source_a"),
            greatest($"sa", $"sb").as("source_b"), $"est_sim")
          .groupBy($"source_a", $"source_b")
          .agg(count(lit(1)).as("n_pairs"), avg($"est_sim").as("mean_sim"))
          .orderBy($"source_a", $"source_b")
      },
      Some {
        val eqSum = (0 until NumPerms).map(j => s"(sa.m$j = sb.m$j)::INT").mkString(" + ")
        s"""
          |WITH $signaturesSql,
          |$bandsSql,
          |cand AS (
          |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
          |  FROM bands x JOIN bands y ON x.band = y.band AND x.bh = y.bh
          |  WHERE x.doc_id < y.doc_id),
          |p AS (
          |  SELECT doc_a, doc_b, est_sim FROM (
          |    SELECT doc_a, doc_b, CAST($eqSum AS DOUBLE) / $NumPerms.0 AS est_sim
          |    FROM cand
          |    JOIN sig sa ON sa.doc_id = cand.doc_a
          |    JOIN sig sb ON sb.doc_id = cand.doc_b)
          |  WHERE est_sim >= 0.5),
          |m AS (
          |  SELECT least(da.source, db.source) AS source_a,
          |         greatest(da.source, db.source) AS source_b, est_sim
          |  FROM p
          |  JOIN documents da ON da.doc_id = p.doc_a
          |  JOIN documents db ON db.doc_id = p.doc_b)
          |SELECT source_a, source_b, count(*) AS n_pairs,
          |  avg(est_sim) AS mean_sim
          |FROM m GROUP BY source_a, source_b ORDER BY source_a, source_b
          |""".stripMargin
      }),

    // Train/eval split-leakage audit: near-dup pairs that CROSS q83's
    // deterministic 80/10/10 hash split — a train doc whose near-duplicate
    // landed in valid/test silently inflates eval scores, and this is the
    // check that catches it before training. Pairs where exactly one side
    // is train are oriented to their eval doc and rolled up per
    // (eval source, eval split). Same bounded machinery as q84: candidate
    // pairs from capped LSH buckets, split assignment is a row-local hash
    // (no second corpus pass beyond the doc→(source, split) enrichment),
    // final exchange ≤ |sources|×2 rows.
    CatalogQuery(
      "q86_split_leak",
      (s, d) => {
        import s.implicits._
        val meta = Tables.documents(s, d).select($"doc_id", $"source",
          Portable.splitAssign($"doc_id").as("split"))
        val e = lshPairs(sigRows(s, d), Some(0.5))
          .join(meta.select($"doc_id".as("doc_a"), $"source".as("src_a"),
            $"split".as("sp_a")), "doc_a")
          .join(meta.select($"doc_id".as("doc_b"), $"source".as("src_b"),
            $"split".as("sp_b")), "doc_b")
        e.filter(($"sp_a" === "train") =!= ($"sp_b" === "train"))
          .select(
            when($"sp_a" === "train", $"src_b").otherwise($"src_a").as("eval_source"),
            when($"sp_a" === "train", $"sp_b").otherwise($"sp_a").as("eval_split"),
            when($"sp_a" === "train", $"doc_b").otherwise($"doc_a").as("eval_doc"))
          .groupBy($"eval_source", $"eval_split")
          .agg(count(lit(1)).as("n_pairs"),
            countDistinct($"eval_doc").as("n_eval_docs"))
          .orderBy($"eval_source", $"eval_split")
      },
      Some {
        val eqSum = (0 until NumPerms).map(j => s"(sa.m$j = sb.m$j)::INT").mkString(" + ")
        val splitCase = Portable.splitAssignSql("doc_id")
        s"""
          |WITH $signaturesSql,
          |$bandsSql,
          |cand AS (
          |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
          |  FROM bands x JOIN bands y ON x.band = y.band AND x.bh = y.bh
          |  WHERE x.doc_id < y.doc_id),
          |p AS (
          |  SELECT doc_a, doc_b FROM (
          |    SELECT doc_a, doc_b, CAST($eqSum AS DOUBLE) / $NumPerms.0 AS est_sim
          |    FROM cand
          |    JOIN sig sa ON sa.doc_id = cand.doc_a
          |    JOIN sig sb ON sb.doc_id = cand.doc_b)
          |  WHERE est_sim >= 0.5),
          |meta AS (
          |  SELECT doc_id, source, $splitCase AS split FROM documents),
          |o AS (
          |  SELECT
          |    CASE WHEN ma.split = 'train' THEN mb.source ELSE ma.source END
          |      AS eval_source,
          |    CASE WHEN ma.split = 'train' THEN mb.split ELSE ma.split END
          |      AS eval_split,
          |    CASE WHEN ma.split = 'train' THEN p.doc_b ELSE p.doc_a END
          |      AS eval_doc
          |  FROM p
          |  JOIN meta ma ON ma.doc_id = p.doc_a
          |  JOIN meta mb ON mb.doc_id = p.doc_b
          |  WHERE (ma.split = 'train') <> (mb.split = 'train'))
          |SELECT eval_source, eval_split, count(*) AS n_pairs,
          |  CAST(count(DISTINCT eval_doc) AS BIGINT) AS n_eval_docs
          |FROM o GROUP BY eval_source, eval_split
          |ORDER BY eval_source, eval_split
          |""".stripMargin
      }),

    // SemDeDup-style semantic dedup (the Abbas et al. '23 recipe shape):
    // partition the embedding space with the q36 coarse quantizer
    // (centroids = the first NumCentroids vectors, collected once and
    // embedded as literals, so nearest-centroid assignment is a
    // row-local array_min — zero shuffle), then inside each cluster
    // compare every member against the cluster's CANON PREFIX (its
    // CanonCap smallest vec_ids) and count members within cosine >= 0.4
    // of a smaller-id prefix vector as droppable duplicates. The prefix
    // cap is the same bounded-candidate discipline as BucketCap:
    // candidate pairs are <= CanonCap x cluster size, never
    // cluster-quadratic, and the prefix itself comes from a bounded
    // topk_min aggregate (map-side partials keep <= CanonCap entries per
    // cluster per partition) — NOT a NumCentroids-partition window sort
    // of the corpus. TWO corpus map passes (the bounded byCluster
    // collect, whose topk structs carry the prefix VECTORS, + member
    // scoring), ONE broadcast join of the <= NumCentroids x CanonCap
    // local prefix frame, per-cluster aggregates; nothing data-scale
    // crosses an exchange.
    CatalogQuery(
      "q90_semdedup",
      (s, d) => {
        import s.implicits._
        val NumCentroids = 16
        val CanonCap = 20
        val v = Tables.embeddings(s, d)
          .select($"vec_id", Embeddings.quant("embedding").as("q"))
          .withColumn("nrm", Embeddings.norm2("q"))
        // bounded collect (q36 convention): the coarse quantizer; on an
        // EMPTY corpus substitute one zero centroid so the literal
        // assignment expression still types (the plan then yields an
        // empty result, matching the oracle). The substitution is gated
        // on the CORPUS being empty, not merely the head: a non-empty
        // table whose ids all exceed NumCentroids would otherwise have
        // every vector silently assigned to a fabricated centroid 0
        // while the oracle's empty centroid set yields nothing — fail
        // loudly instead (the codebook convention requires dense ids).
        val centroids = v.filter($"vec_id" < NumCentroids).collect()
          .map(r => (r.getLong(0), r.getSeq[Long](1), r.getLong(2)))
          .sortBy(_._1) match {
          case e if e.isEmpty =>
            require(v.isEmpty, s"q90_semdedup: corpus is non-empty but has " +
              s"no vec_id < $NumCentroids to seed the codebook; refusing a " +
              "fabricated centroid that would silently diverge from the oracle")
            Array((0L, Seq.fill(Embeddings.Dims)(0L): Seq[Long], 0L))
          case cs => cs
        }
        val distStructs = array(centroids.map { case (cid, cq, cn) =>
          struct(($"nrm" + lit(cn) - lit(2L) * Embeddings.dotLit("q", cq)).as("dist"),
            lit(cid).as("cid"))
        }: _*)
        // cache: assigned feeds TWO actions (the byCluster collect below
        // fills it, the member-scoring join reads it), so the corpus is
        // scanned and centroid-assigned ONCE — and, as important, the
        // scoring join's generated code stays SMALL: inlining the 16x64
        // literal assignment expression into the join stage produced a
        // generated method past the JIT's huge-method limit, leaving the
        // whole probe side interpreted (~6 s for a 20 K-row join at 10x;
        // measured, not theorized). Same lifetime rules as q36's corpus
        // cache: harnesses clearCache() per query, eviction bounds a
        // long-lived session.
        val assigned = v
          .withColumn("best", array_min(distStructs))
          .select($"vec_id", $"q", $"nrm", $"best.cid".as("cid"))
          .cache()
        // bounded collect #2: per-cluster member count + the canon prefix
        // WITH its vectors, off one tiny exchange — the topk struct
        // carries (vec_id, q, nrm) so the prefix vectors ride the same
        // aggregate (≤ NumCentroids × CanonCap structs total) instead of
        // joining back into the corpus. Collecting here cuts the main
        // action from three assignment passes (byCluster + prefix join
        // probe + final members re-aggregate) to ONE: the driver holds
        // 16 member counts and ≤320 prefix vectors, both re-entering the
        // plan as local relations.
        val byCluster = assigned.groupBy($"cid").agg(
          count(lit(1)).as("n_members"),
          graft.functions.TopK.topkMin(
            struct($"vec_id", $"q", $"nrm"), CanonCap).as("pfx"))
          .collect()
        val members = byCluster
          .map(r => (r.getLong(0), r.getLong(1))).toSeq.toDF("cid", "n_members")
        val pfxV = byCluster.flatMap { r =>
          r.getSeq[org.apache.spark.sql.Row](2).map(p =>
            (r.getLong(0), p.getLong(0), p.getSeq[Long](1), p.getLong(2)))
        }.toSeq.toDF("cid", "pvec", "pq", "pn")
        val dropped = assigned.join(broadcast(pfxV), "cid")
          .filter($"pvec" < $"vec_id")
          .withColumn("cos",
            Embeddings.cosine(Embeddings.dot("q", "pq"), $"nrm", $"pn"))
          .filter($"cos" >= 0.4)
          .select($"cid", $"vec_id").distinct()
          .groupBy($"cid").agg(count(lit(1)).as("n_dup"))
        members
          .join(dropped, Seq("cid"), "left")
          .select($"cid", $"n_members",
            coalesce($"n_dup", lit(0L)).as("n_dup"))
          .orderBy($"cid")
      },
      Some {
        val q = Embeddings.quantSql("embedding")
        s"""
          |WITH v AS (SELECT vec_id, $q AS q FROM embeddings),
          |vn AS (SELECT vec_id, q, ${Embeddings.norm2Sql("q")} AS nrm FROM v),
          |cent AS (SELECT vec_id AS cid, q AS cq, nrm AS cn FROM vn WHERE vec_id < 16),
          |assign AS (
          |  SELECT vec_id, cid FROM (
          |    SELECT vn.vec_id, cent.cid,
          |      row_number() OVER (PARTITION BY vn.vec_id
          |        ORDER BY vn.nrm + cent.cn - 2 * ${Embeddings.dotSql("vn.q", "cent.cq")}, cent.cid) AS ar
          |    FROM vn CROSS JOIN cent)
          |  WHERE ar = 1),
          |pfx AS (
          |  SELECT cid, vec_id AS pvec FROM (
          |    SELECT cid, vec_id,
          |      row_number() OVER (PARTITION BY cid ORDER BY vec_id) AS rk
          |    FROM assign)
          |  WHERE rk <= 20),
          |hits AS (
          |  SELECT DISTINCT m.cid, m.vec_id
          |  FROM assign m
          |  JOIN pfx p ON p.cid = m.cid AND p.pvec < m.vec_id
          |  JOIN vn a ON a.vec_id = m.vec_id
          |  JOIN vn b ON b.vec_id = p.pvec
          |  WHERE ${Embeddings.cosineSql(Embeddings.dotSql("a.q", "b.q"), "a.nrm", "b.nrm")} >= 0.4),
          |dropped AS (SELECT cid, count(*) AS n_dup FROM hits GROUP BY cid),
          |members AS (SELECT cid, count(*) AS n_members FROM assign GROUP BY cid)
          |SELECT m.cid, m.n_members, CAST(coalesce(d.n_dup, 0) AS BIGINT) AS n_dup
          |FROM members m LEFT JOIN dropped d ON d.cid = m.cid
          |ORDER BY m.cid
          |""".stripMargin
      }),

    // Substring-level duplication audit (the exact-substring dedup signal
    // of Lee et al. '22 "Deduplicating Training Data Makes Language
    // Models Better", re-expressed hash-first): a 16-token window is
    // "duplicated" when its content hash appears in more than one
    // document; each doc reports how much of its distinct-window mass is
    // shared, and docs with > 50% shared mass are flagged (boilerplate /
    // mirrored pages that doc-level MinHash misses because the REST of
    // the page differs). Windows are hashed row-locally by the fused
    // NGramHashes kernel (stride 1, the n-gram string never materializes)
    // and deduped INSIDE the row by array_distinct, so the only
    // data-scale exchanges are (a) the window-hash df aggregate and
    // (b) one semi join of the occurrence frame against the (much
    // smaller) duplicated-hash set — both keyed and linear, never a
    // pair join. At 100 TB this is the same cost class as the shingle
    // family: the corpus crosses the wire once as 8-byte hash partials.
    // A true Lee-style suffix-array would find arbitrary-length repeats;
    // fixed-W windows are the bounded-state Spark-native spelling (any
    // repeat >= W tokens is caught by its windows).
    CatalogQuery(
      "q91_substring_dup",
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.graft.Bridge
        val W = 16
        val wh = Bridge.column(graft.functions.NGramHashes(
          Bridge.expression(spaceSplit($"text")), W))
        // ONE occurrence subtree: a doc's distinct window hashes with its
        // source attached. Every downstream consumer derives from this —
        // the obvious spelling (per-doc base frame + df aggregate +
        // semi-join probe) re-runs the tokenize+hash+distinct kernel
        // three times, and the md5-per-window is the dominant map cost.
        val occ = Tables.documents(s, d)
          .select($"doc_id", $"source",
            explode(array_distinct(wh)).as("wh"))
        val dup = occ.groupBy($"wh").agg(count(lit(1)).as("df"))
          .filter($"df" >= 2).select($"wh", lit(1L).as("isdup"))
        // LEFT join against the (small — only duplicated hashes survive)
        // dup set marks each occurrence in place, so ONE doc-keyed
        // aggregate computes n_win and n_dup together: occ is computed
        // twice total (df build + probe), and the doc-keyed exchange
        // carries map-side-combined partials only. AQE broadcasts the
        // dup side while it fits; beyond that it's a keyed join — never
        // a pair product.
        occ
          .join(dup, Seq("wh"), "left")
          .groupBy($"doc_id", $"source")
          .agg(count(lit(1)).as("n_win"),
            sum(coalesce($"isdup", lit(0L))).as("n_dup"))
          .groupBy($"source")
          .agg(
            count(lit(1)).as("n_docs"),
            sum(when($"n_dup" * 2 > $"n_win", 1L).otherwise(0L))
              .cast("long").as("n_flagged"),
            sum($"n_win").cast("long").as("total_windows"),
            sum($"n_dup").cast("long").as("dup_windows"))
          .orderBy($"source")
      },
      Some(s"""
        |WITH toks AS (
        |  SELECT doc_id, source, string_split(text, ' ') AS t FROM documents
        |  WHERE len(string_split(text, ' ')) >= 16),
        |occ AS (
        |  SELECT DISTINCT doc_id,
        |    ${hash60Sql("array_to_string(list_slice(t, i, i + 15), ' ')")} AS wh
        |  FROM (SELECT doc_id, t, unnest(range(1, len(t) - 14)) AS i FROM toks)),
        |base AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_win FROM occ GROUP BY 1),
        |dup AS (
        |  SELECT wh FROM (SELECT wh, count(*) AS df FROM occ GROUP BY 1)
        |  WHERE df >= 2),
        |dc AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup
        |  FROM occ WHERE wh IN (SELECT wh FROM dup) GROUP BY 1)
        |SELECT d.source,
        |  count(*) AS n_docs,
        |  CAST(sum(CASE WHEN coalesce(dc.n_dup, 0) * 2 > b.n_win
        |                THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
        |  CAST(sum(b.n_win) AS BIGINT) AS total_windows,
        |  CAST(sum(coalesce(dc.n_dup, 0)) AS BIGINT) AS dup_windows
        |FROM base b
        |JOIN documents d USING (doc_id)
        |LEFT JOIN dc USING (doc_id)
        |GROUP BY d.source ORDER BY d.source
        |""".stripMargin)),

    // Quality-ranked cluster representative selection — q61 keeps each
    // near-dup cluster's min-id doc; production pipelines keep the BEST
    // doc (here: most content, n_chars desc, doc_id as the deterministic
    // tie-break). The cluster frame is pair-graph-bounded (orders of
    // magnitude below the corpus), so the representative argmax is a
    // min(struct) aggregate over a bounded frame and the corpus is only
    // touched by one LEFT join against the (bounded) dropped set — the
    // same scale shape as q61 with the representative rule upgraded.
    // kept_chars reports how much content survives the dedup.
    CatalogQuery(
      "q92_cluster_keep_best",
      (s, d) => {
        import s.implicits._
        val pairs = lshPairs(sigRows(s, d), None).select($"doc_a", $"doc_b")
        val meta = Tables.documents(s, d)
          .select($"doc_id", $"source", $"n_chars")
        val cmeta = connectedComponents(pairs).join(meta, "doc_id")
        // NULL n_chars ranks as 0 (unknown content is the WORST keep
        // candidate, not the best): without the coalesce, Spark's struct
        // ordering puts the NULL field first and crowns the unknown-length
        // doc as representative while the oracle's DESC sort (NULLS LAST)
        // buries it — found by the all-tables NULL twin
        val reps = cmeta.groupBy($"label")
          .agg(min(struct((-coalesce($"n_chars", lit(0L))).as("neg"),
            $"doc_id".as("doc_id"))).as("best"))
          .select($"label", $"best.doc_id".as("rep_doc"))
        val dropped = cmeta.join(reps, "label")
          .filter($"doc_id" =!= $"rep_doc")
          .select($"doc_id", lit(1L).as("is_dup"))
        meta
          .join(dropped, Seq("doc_id"), "left")
          .groupBy($"source")
          .agg(
            count(lit(1)).as("n_docs"),
            sum(coalesce($"is_dup", lit(0L))).cast("long").as("n_dropped"),
            sum(when($"is_dup".isNull, $"n_chars").otherwise(0L))
              .cast("long").as("kept_chars"))
          .select($"source", $"n_docs",
            ($"n_docs" - $"n_dropped").as("n_kept"),
            $"n_dropped", $"kept_chars")
          .orderBy($"source")
      },
      Some(s"""
        |WITH RECURSIVE $signaturesSql,
        |$bandsSql,
        |pairs AS (
        |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
        |  FROM bands x JOIN bands y ON x.band = y.band AND x.bh = y.bh
        |  WHERE x.doc_id < y.doc_id),
        |edges AS (
        |  SELECT doc_a AS src, doc_b AS dst FROM pairs
        |  UNION ALL SELECT doc_b, doc_a FROM pairs),
        |nodes AS (SELECT DISTINCT src AS doc_id FROM edges),
        |walk(doc_id, label) AS (
        |  SELECT doc_id, doc_id FROM nodes
        |  UNION
        |  SELECT e.src, w.label FROM walk w JOIN edges e ON e.dst = w.doc_id),
        |cc AS (SELECT doc_id, min(label) AS cluster_id FROM walk GROUP BY doc_id),
        |cm AS (
        |  SELECT cc.doc_id, cc.cluster_id, d.n_chars
        |  FROM cc JOIN documents d USING (doc_id)),
        |reps AS (
        |  SELECT cluster_id, doc_id AS rep_doc FROM (
        |    SELECT cluster_id, doc_id,
        |      row_number() OVER (PARTITION BY cluster_id
        |        ORDER BY coalesce(n_chars, 0) DESC, doc_id) AS rk
        |    FROM cm)
        |  WHERE rk = 1),
        |dropped AS (
        |  SELECT cm.doc_id FROM cm
        |  JOIN reps USING (cluster_id)
        |  WHERE cm.doc_id <> reps.rep_doc)
        |SELECT source, count(*) AS n_docs,
        |  CAST(count(*) - count(dr.doc_id) AS BIGINT) AS n_kept,
        |  CAST(count(dr.doc_id) AS BIGINT) AS n_dropped,
        |  CAST(sum(CASE WHEN dr.doc_id IS NULL THEN n_chars ELSE 0 END)
        |    AS BIGINT) AS kept_chars
        |FROM documents LEFT JOIN dropped dr USING (doc_id)
        |GROUP BY source ORDER BY source
        |""".stripMargin)),

    // Cluster-aware train/valid/test split — the leak-free-by-construction
    // complement to q83 (per-doc hash split) and q86 (the audit that
    // CATCHES near-dup pairs straddling splits): assign every document the
    // split of its near-dup CLUSTER root (component min doc_id; docs off
    // the pair graph are their own root), so no near-dup pair can ever
    // straddle a split boundary. Reports per split: docs, distinct
    // clusters, and the computed (not asserted) count of leaked candidate
    // pairs — zero by construction, and the query proves it.
    //
    // Scale shape: the label frame is pair-graph-bounded (≪ corpus); the
    // corpus touches ONE left join on doc_id and a row-local hash split
    // of the root; per-split stats are map-side-combinable (the distinct-
    // root count carries (split, root) partials, corpus-bounded 8-byte
    // keys). The leak audit joins only the bounded pairs frame against
    // the assignment — never corpus × corpus.
    CatalogQuery(
      "q111_cluster_split",
      (s, d) => {
        import s.implicits._
        // cache: the bounded pair graph feeds BOTH the component probe
        // (a collect) and the leak-audit join below — uncached, the whole
        // signature+band+self-join pipeline evaluated twice per run
        val pairs = lshPairs(sigRows(s, d), None).select($"doc_a", $"doc_b")
          .cache()
        val labels = connectedComponents(pairs)
        val assigned = Tables.documents(s, d).select($"doc_id")
          .join(labels, Seq("doc_id"), "left")
          .select($"doc_id", coalesce($"label", $"doc_id").as("root"))
          .withColumn("split", splitAssign($"root"))
        val stats = assigned.groupBy($"split")
          .agg(count(lit(1)).as("n_docs"),
            countDistinct($"root").as("n_clusters"))
        val sa = assigned.select($"doc_id".as("doc_a"), $"split".as("split_a"))
        val sb = assigned.select($"doc_id".as("doc_b"), $"split".as("split_b"))
        val leaks = pairs.join(sa, "doc_a").join(sb, "doc_b")
          .filter($"split_a" =!= $"split_b")
          .groupBy($"split_a".as("split"))
          .agg(count(lit(1)).as("n_leaked"))
        stats.join(leaks, Seq("split"), "left")
          .select($"split", $"n_docs", $"n_clusters",
            coalesce($"n_leaked", lit(0L)).as("n_leaked_pairs"))
          .orderBy($"split")
      },
      Some(s"""
        |WITH RECURSIVE $signaturesSql,
        |$bandsSql,
        |pairs AS (
        |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
        |  FROM bands x JOIN bands y ON x.band = y.band AND x.bh = y.bh
        |  WHERE x.doc_id < y.doc_id),
        |edges AS (
        |  SELECT doc_a AS src, doc_b AS dst FROM pairs
        |  UNION ALL SELECT doc_b, doc_a FROM pairs),
        |nodes AS (SELECT DISTINCT src AS doc_id FROM edges),
        |walk(doc_id, label) AS (
        |  SELECT doc_id, doc_id FROM nodes
        |  UNION
        |  SELECT e.src, w.label FROM walk w JOIN edges e ON e.dst = w.doc_id),
        |cc AS (SELECT doc_id, min(label) AS label FROM walk GROUP BY doc_id),
        |asg AS (
        |  SELECT d.doc_id, coalesce(cc.label, d.doc_id) AS root,
        |    ${graft.functions.Portable.splitAssignSql(
               "coalesce(cc.label, d.doc_id)")} AS split
        |  FROM documents d LEFT JOIN cc USING (doc_id)),
        |stats AS (
        |  SELECT split, count(*) AS n_docs,
        |    count(DISTINCT root) AS n_clusters
        |  FROM asg GROUP BY split),
        |leaks AS (
        |  SELECT x.split AS split, count(*) AS n_leaked
        |  FROM pairs p
        |  JOIN asg x ON x.doc_id = p.doc_a
        |  JOIN asg y ON y.doc_id = p.doc_b
        |  WHERE x.split <> y.split GROUP BY x.split)
        |SELECT st.split, CAST(n_docs AS BIGINT) AS n_docs,
        |  CAST(n_clusters AS BIGINT) AS n_clusters,
        |  CAST(coalesce(l.n_leaked, 0) AS BIGINT) AS n_leaked_pairs
        |FROM stats st LEFT JOIN leaks l USING (split)
        |ORDER BY st.split
        |""".stripMargin)),

    // Dedup ROI threshold sweep — the planning query run BEFORE choosing
    // a dedup cutoff: for each candidate similarity threshold, how many
    // near-dup pairs survive, how many clusters form, how many documents
    // the min-id keep rule would drop, and how many tokens that saves.
    // Thresholds are exact sixteenths (est_sim is k/16), so the sweep
    // grid is bit-representable in both engines.
    //
    // Scale shape: the corpus is touched exactly TWICE regardless of how
    // many thresholds are swept — once to build signatures (the shared
    // lshPairs machinery, bucket-capped) and once to fetch token counts
    // for the pair-graph members only (a broadcast semi-join against the
    // bounded node set). When the candidate graph fits the driver edge
    // bound (the q48 probe convention), ALL thresholds share one
    // incremental union-find over the est_sim-descending edge list —
    // zero per-threshold Spark actions; otherwise the distributed
    // per-threshold label-propagation sweep runs over the two cached
    // bounded frames.
    CatalogQuery(
      "q116_dedup_roi",
      (s, d) => {
        import s.implicits._
        val thresholds = Seq(8, 10, 12, 14).map(_ / 16.0)
        val pairsDf = lshPairs(sigRows(s, d), Some(thresholds.min))
          .select($"doc_a", $"doc_b", $"est_sim")
        // probe-bounded sweep (the connectedComponents convention): when
        // the candidate graph fits the driver edge bound, the FOUR
        // thresholds share ONE incremental union-find — sort edges by
        // est_sim descending and sweep tightest→loosest, snapshotting
        // stats as the pointer passes each threshold (a threshold's
        // graph is a subgraph of every looser one, and components only
        // merge as edges add). Corpus is touched exactly twice (pairs +
        // member tokens), versus ~16 bounded-but-floor-paying actions
        // for the per-threshold plan (measured 2.6 s → 0.9 s at sf0.1,
        // the old shape's cost being per-action overhead, not data).
        val probeLimit = (DriverCCMaxEdges + 1).min(Int.MaxValue.toLong).toInt
        val probe = pairsDf.limit(probeLimit).collect()
        if (probe.length <= DriverCCMaxEdges) {
          val edges = probe
            .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
            .sortBy(e => (-e._3, e._1, e._2))
          val memberIds = edges.iterator
            .flatMap(e => Iterator(e._1, e._2)).toSet
          val toks: Map[Long, Long] =
            if (memberIds.isEmpty) Map.empty
            else Tables.documents(s, d)
              .select($"doc_id",
                size(spaceSplit(coalesce($"text", lit("")))).cast("long")
                  .as("n_tok"))
              .join(broadcast(memberIds.toSeq.toDF("doc_id")), "doc_id")
              .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
          val parent = scala.collection.mutable.Map[Long, Long]()
          def find(x: Long): Long = {
            var r = x
            while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
            var c = x
            while (parent.getOrElse(c, c) != r) {
              val n = parent(c); parent(c) = r; c = n
            }
            r
          }
          val nodes = scala.collection.mutable.Set[Long]()
          var idx = 0
          val rows = thresholds.sorted.reverse.map { t =>
            while (idx < edges.length && edges(idx)._3 >= t) {
              val (a, b, _) = edges(idx)
              nodes += a += b
              val (ra, rb) = (find(a), find(b))
              if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
              idx += 1
            }
            val dropped = nodes.iterator.filter(n => find(n) != n).toSeq
            val nClusters = nodes.size - dropped.size
            (t, idx.toLong, nClusters.toLong, dropped.size.toLong,
              dropped.iterator.map(toks.getOrElse(_, 0L)).sum)
          }
          rows.sortBy(_._1)
            .toDF("threshold", "n_pairs", "n_clusters", "n_dropped",
              "tokens_saved")
        } else {
          // distributed fallback: per-threshold label propagation over
          // the cached bounded frames (the pre-round-10 shape)
          val pairs = pairsDf.cache()
          val nodes = pairs.select($"doc_a".as("doc_id"))
            .union(pairs.select($"doc_b".as("doc_id"))).distinct()
          val toks = Tables.documents(s, d)
            .select($"doc_id",
              size(spaceSplit(coalesce($"text", lit("")))).cast("long")
                .as("n_tok"))
            .join(nodes, "doc_id").cache()
          val perT = thresholds.map { t =>
            val pt = pairs.filter($"est_sim" >= t)
            val labels = connectedComponents(pt.select($"doc_a", $"doc_b"))
            val dropped = labels.filter($"doc_id" =!= $"label")
            val saved = dropped.join(toks, "doc_id")
              .agg(coalesce(sum($"n_tok"), lit(0L)).as("tokens_saved"))
            val stats = pt.agg(count(lit(1)).as("n_pairs")).crossJoin(
              labels.agg(countDistinct($"label").as("n_clusters"),
                count(lit(1)).as("n_docs_in_clusters")))
            stats.crossJoin(saved)
              .select(lit(t).as("threshold"), $"n_pairs", $"n_clusters",
                ($"n_docs_in_clusters" - $"n_clusters").as("n_dropped"),
                $"tokens_saved".cast("long").as("tokens_saved"))
          }
          perT.reduce(_ unionByName _).orderBy($"threshold")
        }
      },
      Some {
        val eqSum = (0 until NumPerms)
          .map(j => s"(sa.m$j = sb.m$j)::INT").mkString(" + ")
        def sweep(t: Int): String = {
          val tv = t / 16.0
          s"""e$t AS (
             |  SELECT doc_a AS src, doc_b AS dst FROM scored
             |  WHERE est_sim >= $tv
             |  UNION ALL
             |  SELECT doc_b, doc_a FROM scored WHERE est_sim >= $tv),
             |n$t AS (SELECT DISTINCT src AS doc_id FROM e$t),
             |w$t(doc_id, label) AS (
             |  SELECT doc_id, doc_id FROM n$t
             |  UNION
             |  SELECT e.src, w.label FROM w$t w JOIN e$t e ON e.dst = w.doc_id),
             |cc$t AS (SELECT doc_id, min(label) AS label FROM w$t
             |  GROUP BY doc_id),
             |r$t AS (
             |  SELECT CAST($tv AS DOUBLE) AS threshold,
             |    (SELECT count(*) FROM scored WHERE est_sim >= $tv)
             |      AS n_pairs,
             |    (SELECT count(DISTINCT label) FROM cc$t) AS n_clusters,
             |    (SELECT count(*) - count(DISTINCT label) FROM cc$t)
             |      AS n_dropped,
             |    CAST(coalesce((SELECT sum(tk.n_tok) FROM cc$t c
             |      JOIN tk ON tk.doc_id = c.doc_id
             |      WHERE c.doc_id <> c.label), 0) AS BIGINT)
             |      AS tokens_saved)""".stripMargin
        }
        val ts = Seq(8, 10, 12, 14)
        s"""
          |WITH RECURSIVE $signaturesSql,
          |$bandsSql,
          |cand AS (
          |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
          |  FROM bands x JOIN bands y ON x.band = y.band AND x.bh = y.bh
          |  WHERE x.doc_id < y.doc_id),
          |scored AS (
          |  SELECT doc_a, doc_b,
          |    CAST($eqSum AS DOUBLE) / $NumPerms.0 AS est_sim
          |  FROM cand
          |  JOIN sig sa ON sa.doc_id = cand.doc_a
          |  JOIN sig sb ON sb.doc_id = cand.doc_b),
          |tk AS (
          |  SELECT doc_id,
          |    CAST(len(string_split(coalesce(text, ''), ' ')) AS BIGINT)
          |      AS n_tok
          |  FROM documents),
          |${ts.map(sweep).mkString(",\n")}
          |${ts.map(t => s"SELECT * FROM r$t").mkString("\nUNION ALL ")}
          |ORDER BY threshold
          |""".stripMargin
      })
  )
}
