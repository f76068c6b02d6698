package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.Bridge

/** Engine-portable deterministic hashing.
  *
  * Correctness of the dedup / fingerprint operators is verified against a
  * DuckDB oracle, so every hash they use must be computable bit-identically
  * in both engines. We derive a 60-bit integer from the md5 hex digest
  * (md5 is identical everywhere), then run small affine permutations mod a
  * 30-bit prime for MinHash, exactly like classic MinHash literature
  * (Broder '97). Constants live here — the single source of truth for both
  * the Spark Column builders and the generated oracle SQL.
  */
object Portable {
  /** 30-bit prime modulus: products a*h stay far below 2^63. */
  val P: Long = 1073741789L

  /** Number of MinHash permutations (4 LSH bands x 4 rows). */
  val NumPerms = 16
  val BandSize = 4
  val NumBands: Int = NumPerms / BandSize

  /** Affine permutation constants; deterministic, co-prime with P. */
  val A: IndexedSeq[Long] = (0 until NumPerms).map(j => 2L * j + 3L)
  val B: IndexedSeq[Long] = (0 until NumPerms).map(j => 5L * j + 7L)

  /** Simhash width in bits (fingerprint fits in an int). */
  val SimhashBits = 16

  /** Max docs per LSH band/plane bucket: larger buckets are degenerate
    * (near-constant content) and would make the candidate self-join
    * quadratic in the hot key; the standard df-cap trick bounds it.
    * Mirrored in the oracle SQL — both engines drop the same buckets.
    */
  val BucketCap = 50

  /** Modulus for the additive content fingerprint. */
  val FpMod: Long = 1000003L

  // ---- Spark Column builders ----

  /** 60-bit portable hash of a string column: first 15 hex chars of md5,
    * computed natively (codegen'd [[Md5Prefix60]] — no hex/conv round-trip;
    * bit-identical to the SQL mirror below).
    */
  def hash60(c: Column): Column = Bridge.column(Md5Prefix60(Bridge.expression(c)))

  /** hash60 reduced mod P (the MinHash universe). */
  def hashP(c: Column): Column = hash60(c) % P

  /** MinHash permutation j applied to an already-mod-P hash column. */
  def perm(j: Int, h: Column): Column = (h * A(j) + B(j)) % P

  /** Whitespace tokenization via the codegen'd [[CharSplit]] kernel —
    * bit-identical to `split(c, " ")` / DuckDB `string_split(c, ' ')`
    * (empties kept) without the per-row java.util.regex cost.
    */
  def spaceSplit(c: Column): Column =
    Bridge.column(CharSplit(Bridge.expression(c), ' '.toByte))

  /** Row-local per-doc term frequency: array<struct<tok,cnt>> over
    * space-separated tokens, empties dropped — `GROUP BY doc, tok`
    * without shuffling token instances.
    */
  def tokenCounts(c: Column): Column =
    Bridge.column(TokenCounts(Bridge.expression(c), ' '.toByte))

  /** Collapse consecutive identical tokens, keeping the first of each
    * run (span-level repetition scrub), row-locally.
    */
  def collapseRuns(c: Column): Column =
    Bridge.column(CollapseRuns(Bridge.expression(c)))

  /** Single-pass PII scrub: struct<n_emails,n_phones,n_ips,scrubbed>,
    * exactly the email→phone→IPv4 sequential regex-chain semantics
    * (see [[ScrubPii]]; `PiiScrubSpec` pins the equivalence).
    */
  def scrubPii(c: Column): Column =
    Bridge.column(ScrubPii(Bridge.expression(c)))

  /** One-pass BPE-ish pretokenizer stats —
    * struct<n_tok,n_alpha,n_num,n_contr> (see [[BpeTokenStats]]).
    */
  def bpeTokenStats(c: Column): Column =
    Bridge.column(BpeTokenStats(Bridge.expression(c)))

  /** Deterministic 80/10/10 train/valid/test split of a doc-id column —
    * the salted content-independent hash shared by q83 (assignment
    * audit), q86 (batch leak audit) and the streaming leak monitor.
    * Append-stable: a doc's split never depends on the rest of the
    * corpus (pinned by `AuditSpec`).
    */
  def splitAssign(idCol: Column): Column = {
    val b = hash60(
      org.apache.spark.sql.functions.concat(
        org.apache.spark.sql.functions.lit("split:"), idCol.cast("string"))) % 100
    org.apache.spark.sql.functions.when(b < 80, "train")
      .when(b < 90, "valid").otherwise("test")
  }

  /** Integer floor division of non-negative long expressions — Catalyst's
    * `DIV` (IntegralDivide), mirrored by DuckDB's `//`. Both truncate
    * toward zero, which equals floor for the non-negative operands the
    * fixed-point scoring queries (q89 BM25) feed it.
    */
  def idiv(a: Column, b: Column): Column =
    Bridge.column(org.apache.spark.sql.catalyst.expressions.IntegralDivide(
      Bridge.expression(a), Bridge.expression(b)))

  // ---- DuckDB SQL builders (must mirror the Column builders exactly) ----

  /** 60-bit portable hash of a string SQL expression, DuckDB dialect.
    * `||` (not `concat`) so NULL propagates: DuckDB's `concat` SKIPS
    * NULL arguments, so `concat('0x', NULL)` is `'0x'` and the CAST
    * errors — whereas `'0x' || NULL` is NULL, matching the Spark side
    * where [[Md5Prefix60]] of NULL is NULL. Identical for non-null
    * inputs.
    */
  def hash60Sql(e: String): String =
    s"CAST('0x' || substr(md5($e), 1, 15) AS BIGINT)"

  def hashPSql(e: String): String = s"(${hash60Sql(e)} % $P)"

  def permSql(j: Int, h: String): String = s"(($h * ${A(j)} + ${B(j)}) % $P)"

  /** DuckDB mirror of [[splitAssign]] over a doc-id SQL expression. */
  def splitAssignSql(id: String): String = {
    val b = s"${hash60Sql(s"'split:' || CAST($id AS VARCHAR)")} % 100"
    s"""CASE WHEN $b < 80 THEN 'train'
       |         WHEN $b < 90 THEN 'valid'
       |         ELSE 'test' END""".stripMargin
  }
}
