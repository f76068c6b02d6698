package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Portable embedding arithmetic for the similarity/dedup operators.
  *
  * Floats are quantized to integers (`floor(x*1000)`) so every dot product
  * and norm is exact 64-bit integer arithmetic — order-independent and
  * bit-identical between Spark and the DuckDB oracle. Cosine is then ONE
  * double division + sqrt over exact integers, which IEEE-754 defines
  * exactly, so even the floating-point outputs hash-match.
  *
  * The random-hyperplane LSH (SimHash-for-vectors, Charikar '02) uses a
  * deterministic ±1 coefficient matrix derived from md5, embedded as
  * literals in both the Spark plan and the generated oracle SQL. All
  * builders are row-local SQL expressions — they stay inside whole-stage
  * codegen and need no shuffle.
  */
object Embeddings {
  val Dims = 64
  val Scale = 1000

  /** 16 hyperplanes = 4 LSH tables x 4 planes each (banding boosts recall
    * exactly like MinHash bands).
    */
  val NumPlanes = 16
  val PlanesPerTable = 4
  val NumTables: Int = NumPlanes / PlanesPerTable

  /** Deterministic Rademacher (+1/-1) coefficients from md5 parity. */
  lazy val planeCoef: IndexedSeq[IndexedSeq[Int]] = {
    (0 until NumPlanes).map { p =>
      (0 until Dims).map { d =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val h = md.digest(s"hp${p}_$d".getBytes("UTF-8"))
        if ((h(0) & 1) == 0) 1 else -1
      }
    }
  }

  // ---- Spark expression builders (args are column names) ----

  /** array<float> column -> array<bigint> quantized (codegen'd
    * [[QuantFloats]] kernel — same floor(x*scale) definition as the
    * list_transform oracle mirror, no interpreted per-element lambda).
    */
  def quant(c: String): Column =
    org.apache.spark.sql.graft.Bridge.column(QuantFloats(
      org.apache.spark.sql.graft.Bridge.expression(expr(c)), Scale.toDouble))

  private def dotExpr(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(LongArrayDot(
      org.apache.spark.sql.graft.Bridge.expression(a),
      org.apache.spark.sql.graft.Bridge.expression(b)))

  /** Squared norm of a quantized vector column (exact integer). */
  def norm2(q: String): Column = dotExpr(expr(q), expr(q))

  /** Exact integer dot product of two quantized vector columns — a native
    * codegen'd expression ([[LongArrayDot]]), not an interpreted lambda.
    */
  def dot(a: String, b: String): Column = dotExpr(expr(a), expr(b))

  /** Dot with a literal quantized vector (e.g. a collected centroid) —
    * the literal array is embedded in the plan so the product stays
    * row-local inside whole-stage codegen.
    */
  def dotLit(q: String, v: Seq[Long]): Column = {
    val lits = v.map(x => s"CAST($x AS BIGINT)").mkString("array(", ", ", ")")
    dotExpr(expr(q), expr(lits))
  }

  /** Dot with hyperplane p (literal ±1 array; stays inside codegen). */
  def planeDot(q: String, p: Int): Column = {
    val lits = planeCoef(p).map(c => s"CAST($c AS BIGINT)").mkString("array(", ", ", ")")
    dotExpr(expr(q), expr(lits))
  }

  /** JL (Johnson–Lindenstrauss) sign-projection width: 64 → 16 dims. */
  val JlDims = 16

  /** Deterministic Rademacher projection rows for the JL audit — same
    * md5-parity scheme as [[planeCoef]], separate seed family ("jl") so
    * the projection is independent of the LSH planes.
    */
  lazy val jlCoef: IndexedSeq[IndexedSeq[Int]] = {
    (0 until JlDims).map { k =>
      (0 until Dims).map { d =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val h = md.digest(s"jl${k}_$d".getBytes("UTF-8"))
        if ((h(0) & 1) == 0) 1 else -1
      }
    }
  }

  /** Projected coordinate k of a quantized vector (exact integer dot
    * with the literal ±1 row; row-local, inside codegen).
    */
  def jlDot(q: String, k: Int): Column = {
    val lits = jlCoef(k).map(c => s"CAST($c AS BIGINT)").mkString("array(", ", ", ")")
    dotExpr(expr(q), expr(lits))
  }

  /** PCA-rotated prefix width and coefficient scale for the q120 audit.
    * Scale 128 keeps every quantity exactly representable: |coord| <=
    * 64·128·2047 ~ 1.7e7, prefix norms <= 16·coord² ~ 4.6e15 < 2^53, and
    * prefix dots <= 4.6e15 — all exact in BIGINT and in DOUBLE, so both
    * engines compute bit-identical cosines (via [[cosineBig]], which
    * multiplies the norms in double because their 64-bit product would
    * overflow).
    */
  val PcaDims = 16
  val PcaScale = 128

  /** Trained PCA rotation rows (PcaDims × Dims, coefficients scaled by
    * [[PcaScale]]): the top principal axes of the quantized sf0.1
    * embedding sample (vec_id < 1024), computed OFFLINE by
    * `tools/make_pca.py` and shipped as a fixed resource — the
    * deployment shape for a learned rotation (train once on a bounded
    * sample, serve as constants), exactly how [[jlCoef]] ships its
    * data-free counterpart.
    */
  lazy val pcaCoef: IndexedSeq[IndexedSeq[Long]] = {
    val in = getClass.getResourceAsStream("/graft/pca16x64.txt")
    require(in != null, "pca16x64.txt resource missing (run tools/make_pca.py)")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try {
      val rows = src.getLines().filter(_.nonEmpty)
        .map(_.trim.split("\\s+").toIndexedSeq.map(_.toLong)).toIndexedSeq
      require(rows.size == PcaDims && rows.forall(_.size == Dims),
        s"pca16x64.txt must be ${PcaDims}x$Dims")
      rows
    } finally src.close()
  }

  /** Rotated coordinate k of a quantized vector: exact integer dot with
    * the literal PCA row (row-local, inside codegen). */
  def pcaDot(q: String, k: Int): Column = dotLit(q, pcaCoef(k))

  /** LSH bucket id for table t: sign bits of its 4 plane dots. */
  def bucket(q: String, t: Int): Column =
    (0 until PlanesPerTable).map { r =>
      val p = t * PlanesPerTable + r
      when(planeDot(q, p) > 0, lit(1 << r)).otherwise(lit(0))
    }.reduce(_ + _)

  /** Exact cosine from integer dot + norms, as the one double op. */
  def cosine(dot: Column, na: Column, nb: Column): Column =
    dot.cast("double") / sqrt((na * nb).cast("double"))

  /** Cosine for big norms (PCA-rotated prefixes): multiplies the norms
    * in DOUBLE because na·nb would overflow 64 bits. All inputs are
    * < 2^53 (see [[PcaScale]]), so the conversion is exact and the
    * result IEEE-identical across engines.
    */
  def cosineBig(dot: Column, na: Column, nb: Column): Column =
    dot.cast("double") / sqrt(na.cast("double") * nb.cast("double"))

  /** SQ8 reconstruction against corpus-global per-dimension bounds — the
    * row-local codegen'd kernel behind the q110 audit (see
    * [[SqReconstruct]]); bounds are plan constants like PQ's codebook.
    */
  def sqRecon(q: String, mins: Array[Long], spans: Array[Long]): Column =
    org.apache.spark.sql.graft.Bridge.column(SqReconstruct(
      org.apache.spark.sql.graft.Bridge.expression(expr(q)), mins, spans))

  /** PQ nearest-codeword assignment over a flattened literal codebook
    * (m·k·b longs, subspace-major) — one tight codegen'd loop per row
    * (see [[PqAssign]]).
    */
  def pqAssign(q: String, cbFlat: Array[Long], m: Int, b: Int, k: Int): Column =
    org.apache.spark.sql.graft.Bridge.column(PqAssign(
      org.apache.spark.sql.graft.Bridge.expression(expr(q)), cbFlat, m, b, k))

  /** ADC distance of PQ codes against one query's m·k lookup table
    * (see [[PqAdc]]).
    */
  def pqAdc(codes: Column, lut: Array[Long], k: Int): Column =
    org.apache.spark.sql.graft.Bridge.column(PqAdc(
      org.apache.spark.sql.graft.Bridge.expression(codes), lut, k))

  // ---- DuckDB SQL mirrors (args are SQL expressions) ----

  def quantSql(e: String): String =
    s"list_transform($e, x -> CAST(floor(CAST(x AS DOUBLE) * $Scale.0) AS BIGINT))"

  def norm2Sql(q: String): String =
    s"CAST(list_sum(list_transform($q, x -> x * x)) AS BIGINT)"

  /** Positional dot of two list columns (1-based DuckDB indexing). */
  def dotSql(a: String, b: String): String =
    s"CAST(list_sum(list_transform(range(1, ${Dims + 1}), i -> $a[i] * $b[i])) AS BIGINT)"

  def planeDotSql(q: String, p: Int): String = {
    val lits = planeCoef(p).mkString("[", ", ", "]")
    s"CAST(list_sum(list_transform(range(1, ${Dims + 1}), i -> $q[i] * ($lits)[i])) AS BIGINT)"
  }

  /** DuckDB mirror of [[jlDot]]. */
  def jlDotSql(q: String, k: Int): String = {
    val lits = jlCoef(k).mkString("[", ", ", "]")
    s"CAST(list_sum(list_transform(range(1, ${Dims + 1}), i -> $q[i] * ($lits)[i])) AS BIGINT)"
  }

  def bucketSql(q: String, t: Int): String =
    (0 until PlanesPerTable).map { r =>
      val p = t * PlanesPerTable + r
      s"(CASE WHEN ${planeDotSql(q, p)} > 0 THEN ${1 << r} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  def cosineSql(dot: String, na: String, nb: String): String =
    s"(CAST($dot AS DOUBLE) / sqrt(CAST(($na * $nb) AS DOUBLE)))"

  /** DuckDB mirror of [[pcaDot]]. */
  def pcaDotSql(q: String, k: Int): String = {
    val lits = pcaCoef(k).mkString("[", ", ", "]")
    s"CAST(list_sum(list_transform(range(1, ${Dims + 1}), i -> $q[i] * ($lits)[i])) AS BIGINT)"
  }

  /** DuckDB mirror of [[cosineBig]]. */
  def cosineBigSql(dot: String, na: String, nb: String): String =
    s"(CAST($dot AS DOUBLE) / sqrt(CAST($na AS DOUBLE) * CAST($nb AS DOUBLE)))"
}
