package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass PII scrub kernel.
  *
  * Replaces the three-stage regex chain of q74 (count+replace for emails,
  * then phones, then IPv4s) with one linear scan over the document bytes.
  * java.util.regex runs these patterns at ~5 MB/s/core on this corpus —
  * every word triggers an O(len) local-part match that fails at the '@' —
  * which made the scrub 16× the RE2 oracle at 10× scale. The scanner
  * below is exactly equivalent to the sequential three-pass semantics
  * (`PiiScrubSpec` pins it against the java-regex chain property-wise):
  *
  *  - email `[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}`: a match can
  *    only start at a local-class run start (a mid-run start implies the
  *    run-start attempt reached the same '@' and domain first), the local
  *    part never backtracks ('@' is outside the class), and the domain's
  *    backtracking reduces to "last dot followed by ≥2 letters, TLD taken
  *    greedily".
  *  - phone `\+\d{1,2}-\d{3}-\d{4}`: deterministic — the greedy {1,2}
  *    only succeeds with the run length that puts '-' next, and the exact
  *    counts admit no backtracking.
  *  - IPv4 `\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b`: each `\d{1,3}`
  *    followed by '.' or `\b` succeeds only when the whole digit run
  *    (≤3) is consumed, so runs of 4+ digits fail every alternative.
  *
  * Pass ordering folds into one scan because the match sets cannot
  * interleave: email-class characters absorb any phone/IP characters
  * adjacent to an '@'-bearing run (so a later-pass match never overlaps
  * an earlier-pass one), every replacement token starts with '<' and ends
  * with '>' (non-word on both flanks, so `\b` verdicts against scrubbed
  * left context are reproduced by tracking the last *emitted* byte), and
  * the right-hand context of a trailing `\b` is never part of any match.
  * Non-ASCII bytes (≥ 0x80) are simply outside every class and non-word,
  * matching Java's ASCII `\w` without UNICODE_CHARACTER_CLASS.
  */
object PiiKernels {
  private val Email = "<EMAIL>".getBytes
  private val Phone = "<PHONE>".getBytes
  private val Ip = "<IP>".getBytes

  @inline private def isDigit(b: Byte): Boolean = b >= '0' && b <= '9'
  @inline private def isAlpha(b: Byte): Boolean =
    (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')
  @inline private def isWord(b: Byte): Boolean =
    isAlpha(b) || isDigit(b) || b == '_'
  @inline private def inLocal(b: Byte): Boolean =
    isAlpha(b) || isDigit(b) || b == '.' || b == '_' || b == '%' ||
      b == '+' || b == '-'
  @inline private def inDomain(b: Byte): Boolean =
    isAlpha(b) || isDigit(b) || b == '.' || b == '-'

  /** struct<n_emails,n_phones,n_ips,scrubbed> for one document. */
  def scrubPii(s: UTF8String): InternalRow = {
    val b = s.getBytes
    val n = b.length
    val out = new java.io.ByteArrayOutputStream(n + 16)
    var nEmail = 0L
    var nPhone = 0L
    var nIp = 0L
    var i = 0
    var prev: Byte = 0
    var hasPrev = false
    while (i < n) {
      var end = -1 // match end when >= 0
      var tok: Array[Byte] = null
      // ---- email (run starts only) ----
      if (inLocal(b(i)) && !(hasPrev && inLocal(prev))) {
        var e = i
        while (e < n && inLocal(b(e))) e += 1
        if (e < n && b(e) == '@') {
          var f = e + 1
          while (f < n && inDomain(b(f))) f += 1
          if (f > e + 1) {
            var q = f - 3
            while (q >= e + 2 && end < 0) {
              if (b(q) == '.' && isAlpha(b(q + 1)) && isAlpha(b(q + 2))) {
                var p = q + 1
                while (p < n && isAlpha(b(p))) p += 1
                end = p
              }
              q -= 1
            }
            if (end >= 0) { tok = Email; nEmail += 1 }
          }
        }
      }
      // ---- phone ----
      if (end < 0 && b(i) == '+') {
        val j = i + 1
        var d1 = 0
        if (j + 2 < n && isDigit(b(j)) && isDigit(b(j + 1)) && b(j + 2) == '-') d1 = 2
        else if (j + 1 < n && isDigit(b(j)) && b(j + 1) == '-') d1 = 1
        if (d1 > 0) {
          val p0 = j + d1 + 1
          if (p0 + 3 < n && isDigit(b(p0)) && isDigit(b(p0 + 1)) &&
              isDigit(b(p0 + 2)) && b(p0 + 3) == '-') {
            val p1 = p0 + 4
            if (p1 + 3 < n && isDigit(b(p1)) &&
                isDigit(b(p1 + 1)) && isDigit(b(p1 + 2)) && isDigit(b(p1 + 3))) {
              end = p1 + 4; tok = Phone; nPhone += 1
            }
          }
        }
      }
      // ---- IPv4 (word-boundary starts only) ----
      if (end < 0 && isDigit(b(i)) && !(hasPrev && isWord(prev))) {
        var p = i
        var segs = 0
        var ok = true
        while (ok && segs < 4) {
          val st = p
          while (p < n && isDigit(b(p))) p += 1
          val len = p - st
          if (len < 1 || len > 3) ok = false
          else if (segs < 3) {
            if (p < n && b(p) == '.') p += 1 else ok = false
          } else if (p < n && isWord(b(p))) ok = false
          segs += 1
        }
        if (ok) { end = p; tok = Ip; nIp += 1 }
      }
      if (end >= 0) {
        out.write(tok, 0, tok.length)
        prev = '>'
        hasPrev = true
        i = end
      } else {
        out.write(b(i).toInt)
        prev = b(i)
        hasPrev = true
        i += 1
      }
    }
    new GenericInternalRow(Array[Any](nEmail, nPhone, nIp,
      UTF8String.fromBytes(out.toByteArray)))
  }

  /** One-pass BPE-ish pretokenizer stats: token counts per class under
    * `'(?:s|t|re|ve|m|ll|d)|[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]+`, without
    * materializing the token array. The alternation reduces to ordered
    * run-scanning: the contraction branch is only attempted where the
    * scan sits (an apostrophe reached inside a punctuation run is
    * consumed by that run, exactly as the regex's greedy fourth branch
    * does), letter/digit runs are maximal, spaces match no branch and
    * are skipped, and non-ASCII bytes fall into the punctuation class on
    * both sides (the regex matches non-ASCII *chars*, this scanner their
    * bytes — same runs, same boundaries, same counts).
    * Returns struct<n_tok,n_alpha,n_num,n_contr>.
    */
  def bpeTokenStats(s: UTF8String): InternalRow = {
    val b = s.getBytes
    val n = b.length
    var nTok = 0L
    var nAlpha = 0L
    var nNum = 0L
    var nContr = 0L
    @inline def inPunct(c: Byte): Boolean =
      !isAlpha(c) && !isDigit(c) && c != ' '
    var i = 0
    while (i < n) {
      val c = b(i)
      if (c == '\'' && i + 1 < n) {
        val c1 = b(i + 1)
        val two = i + 2 < n
        // ordered suffix alternation: s|t|re|ve|m|ll|d
        if (c1 == 's' || c1 == 't' || c1 == 'm' || c1 == 'd') {
          nContr += 1; nTok += 1; i += 2
        } else if (two && ((c1 == 'r' && b(i + 2) == 'e') ||
            (c1 == 'v' && b(i + 2) == 'e') || (c1 == 'l' && b(i + 2) == 'l'))) {
          nContr += 1; nTok += 1; i += 3
        } else {
          while (i < n && inPunct(b(i))) i += 1
          nTok += 1
        }
      } else if (isAlpha(c)) {
        while (i < n && isAlpha(b(i))) i += 1
        nAlpha += 1; nTok += 1
      } else if (isDigit(c)) {
        while (i < n && isDigit(b(i))) i += 1
        nNum += 1; nTok += 1
      } else if (c == ' ') {
        i += 1
      } else {
        while (i < n && inPunct(b(i))) i += 1
        nTok += 1
      }
    }
    new GenericInternalRow(Array[Any](nTok, nAlpha, nNum, nContr))
  }
}

/** string -> struct<n_emails:bigint,n_phones:bigint,n_ips:bigint,
  * scrubbed:string> — see [[PiiKernels.scrubPii]].
  */
case class ScrubPii(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_emails", LongType, nullable = false),
    StructField("n_phones", LongType, nullable = false),
    StructField("n_ips", LongType, nullable = false),
    StructField("scrubbed", StringType, nullable = false)))
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes() = child.dataType match {
    case StringType =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"scrub_pii expects string, got $other")
  }

  override def nullSafeEval(v: Any): Any =
    PiiKernels.scrubPii(v.asInstanceOf[UTF8String])

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else nullSafeEval(v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = PiiKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $k.scrubPii($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): ScrubPii =
    copy(child = newChild)
}

/** string -> struct<n_tok:bigint,n_alpha:bigint,n_num:bigint,
  * n_contr:bigint> — see [[PiiKernels.bpeTokenStats]].
  */
case class BpeTokenStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_tok", LongType, nullable = false),
    StructField("n_alpha", LongType, nullable = false),
    StructField("n_num", LongType, nullable = false),
    StructField("n_contr", LongType, nullable = false)))
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes() = child.dataType match {
    case StringType =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bpe_token_stats expects string, got $other")
  }

  override def nullSafeEval(v: Any): Any =
    PiiKernels.bpeTokenStats(v.asInstanceOf[UTF8String])

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else nullSafeEval(v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = PiiKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $k.bpeTokenStats($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeTokenStats =
    copy(child = newChild)
}
