package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Row-local array kernels for the dedup/similarity hot paths, as native
  * codegen'd expressions. Spark's higher-order functions (`transform`,
  * `zip_with`) evaluate an interpreted lambda per ELEMENT — profiled at
  * ~0.4 ms/doc for shingling, which dominates the dedup queries. These
  * kernels run the whole per-row loop in one JVM call with no intermediate
  * string/array allocation, while computing bit-identical values to the
  * declarative definition the DuckDB oracle mirrors.
  */
object ArrayKernels {
  private val Space = UTF8String.fromString(" ")


  /** Split on one ASCII byte, keeping empties — see [[CharSplit]]. */
  def splitByte(s: UTF8String, sep: Byte): ArrayData = {
    val bytes = s.getBytes
    var count = 1
    var i = 0
    while (i < bytes.length) { if (bytes(i) == sep) count += 1; i += 1 }
    val out = new Array[Any](count)
    var start = 0
    var k = 0
    i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == sep) {
        out(k) = UTF8String.fromBytes(bytes, start, i - start)
        k += 1
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }


  /** Row-local term frequency: split on one ASCII byte, drop empty
    * tokens, count occurrences — array<struct<tok,cnt>> in first-seen
    * order. A whole document's tokens arrive in one row, so per-doc
    * `GROUP BY doc_id, tok` semantics cost ZERO exchanges: this collapses
    * the token-instance frame (docs × tokens-per-doc rows) to docs ×
    * DISTINCT-tokens-per-doc before anything shuffles — the exchange
    * that dominated tf-idf carried every token instance as a string.
    */
  def tokenCounts(s: UTF8String, sep: Byte): ArrayData = {
    val bytes = s.getBytes
    val counts = new java.util.LinkedHashMap[UTF8String, Array[Long]]()
    var start = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == sep) {
        if (i > start) {
          val tok = UTF8String.fromBytes(bytes, start, i - start)
          val c = counts.get(tok)
          if (c == null) counts.put(tok, Array(1L)) else c(0) += 1L
        }
        start = i + 1
      }
      i += 1
    }
    val out = new Array[Any](counts.size)
    val it = counts.entrySet().iterator()
    var k = 0
    while (it.hasNext) {
      val e = it.next()
      out(k) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](e.getKey, e.getValue()(0)))
      k += 1
    }
    new GenericArrayData(out)
  }

  /** All adjacent character pairs of a string: "abc" -> ["ab","bc"],
    * under-2-char strings -> []. Bit-identical to the
    * `transform(sequence(1, length-1), i -> substr(tok, i, 2))` HOF
    * spelling (positions are codepoint-based via substringSQL, exactly
    * like Column.substr / DuckDB substr) without the per-element
    * interpreted lambda — the q104 vocab pass runs this once per
    * distinct token.
    */
  def charPairs(s: UTF8String): ArrayData = {
    val n = s.numChars()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - 1)
    var i = 1
    while (i < n) {
      out(i - 1) = s.substringSQL(i, 2)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Collapse runs of consecutive identical elements, keeping the first
    * of each run: ["the","the","cat"] -> ["the","cat"]. One JVM call per
    * row — the `filter((x, i) -> ...)` spelling runs an interpreted
    * lambda per ELEMENT plus an element_at probe per step.
    */
  def collapseRuns(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val out = new java.util.ArrayList[Any](n)
    var prev: UTF8String = null
    var i = 0
    while (i < n) {
      val t = arr.getUTF8String(i)
      if (i == 0 || !t.equals(prev)) out.add(t)
      prev = t
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Space-joined n-grams of a token array: ["a","b","c"], n=2 ->
    * ["a b", "b c"]. One JVM call per row — the declarative spellings
    * (posexplode self-join, transform over sequence) either shuffle or
    * run an interpreted lambda per element.
    */
  def ngrams(arr: ArrayData, n: Int): ArrayData = {
    val len = arr.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](len - n + 1)
    var i = 0
    while (i <= len - n) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) { parts(j) = arr.getUTF8String(i + j); j += 1 }
      out(i) = UTF8String.concatWs(Space, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }


  /** 16-permutation MinHash signature of an h60 shingle-hash array, in
    * one row-local JVM call: hp = h60 mod P, sig[j] = min over shingles
    * of (hp * A(j) + B(j)) mod P — identical values to the batch
    * groupBy-min formulation (DedupQueries.signatures), computable
    * row-locally because a whole document's shingles arrive in one row.
    * Empty input (doc under 3 tokens) yields null (no signature).
    */
  def minhashSig(arr: ArrayData): ArrayData = {
    import graft.functions.{Portable => Pf}
    val n = arr.numElements()
    if (n == 0) return null
    val mins = Array.fill(Pf.NumPerms)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val hp = arr.getLong(i) % Pf.P
      var j = 0
      while (j < Pf.NumPerms) {
        val v = (hp * Pf.A(j) + Pf.B(j)) % Pf.P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** Distinct values of (x mod p), sorted ascending — the row-local form
    * of `SELECT DISTINCT doc_id, hp` when a whole document's shingle
    * hashes arrive in one array: dedup within the doc IS the global
    * distinct (doc_id is unique per row), so the set-semantics exchange
    * disappears from every inverted-index consumer. The dedup must run
    * AFTER the mod (two distinct h60 values can collide mod p — the
    * oracle distincts on the modded value).
    */
  def distinctModP(arr: ArrayData, p: Long): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Long])
    val vs = new Array[Long](n)
    var i = 0
    while (i < n) { vs(i) = arr.getLong(i) % p; i += 1 }
    java.util.Arrays.sort(vs)
    var m = 1
    i = 1
    while (i < n) {
      if (vs(i) != vs(i - 1)) { vs(m) = vs(i); m += 1 }
      i += 1
    }
    if (m == n) new GenericArrayData(vs)
    else new GenericArrayData(java.util.Arrays.copyOf(vs, m))
  }

  /** hash60 of every 3-token shingle "t[i] t[i+1] t[i+2]" — identical to
    * mapping [[Md5Util.prefix60]] over concat_ws(' ', ...) triples.
    */
  def shingleHashes60(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n < 3) return new GenericArrayData(Array.empty[Long])
    val out = new Array[Long](n - 2)
    var i = 0
    while (i < n - 2) {
      val s = UTF8String.concatWs(Space,
        arr.getUTF8String(i), arr.getUTF8String(i + 1), arr.getUTF8String(i + 2))
      out(i) = Md5Util.prefix60(s.getBytes)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** floor(x * scale) per element — identical to the transform-lambda
    * quantizer and its DuckDB list_transform mirror, INCLUDING null
    * elements passing through as null (ArrayData.getFloat would silently
    * unbox a null to 0.0).
    */
  def quantFloats(arr: ArrayData, scale: Double): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i))
        out(i) = math.floor(arr.getFloat(i).toDouble * scale).toLong
      i += 1
    }
    new GenericArrayData(out)
  }

  def quantDoubles(arr: ArrayData, scale: Double): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i))
        out(i) = math.floor(arr.getDouble(i) * scale).toLong
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Winnowing selection (Schleimer '03): the DISTINCT set of
    * sliding-window minima over a long array — window w, step 1, fewer
    * than w elements selects nothing. One pass, no per-window slice
    * allocation (the HOF spelling `transform(sequence, i ->
    * array_min(slice(h, i, w)))` this replaces allocated an array per
    * window and ran interpreted — 9-11x DuckDB at scale); dedup via one
    * sort of the ~tokens/1 window-min buffer. Value-set identical to the
    * oracle's `list_distinct(list_transform(...))` (order of a distinct
    * set is irrelevant to every consumer: size + explode).
    */
  def winnowMins(arr: ArrayData, w: Int): ArrayData = {
    val n = arr.numElements()
    if (n < w) return new GenericArrayData(Array.empty[Long])
    val m = n - w + 1
    val mins = new Array[Long](m)
    var i = 0
    while (i < m) {
      var mn = arr.getLong(i)
      var j = 1
      while (j < w) {
        val v = arr.getLong(i + j)
        if (v < mn) mn = v
        j += 1
      }
      mins(i) = mn
      i += 1
    }
    java.util.Arrays.sort(mins)
    var distinct = 1
    i = 1
    while (i < m) { if (mins(i) != mins(i - 1)) distinct += 1; i += 1 }
    val out = new Array[Long](distinct)
    out(0) = mins(0)
    var k = 1
    i = 1
    while (i < m) {
      if (mins(i) != mins(i - 1)) { out(k) = mins(i); k += 1 }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** [[shingleHashes60]] generalized to any gram width: 60-bit hash of
    * each space-joined n-gram, fused — no intermediate n-gram string
    * column ever exists in the plan.
    */
  def ngramHashes60(arr: ArrayData, n: Int): ArrayData = {
    val len = arr.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Long])
    val out = new Array[Long](len - n + 1)
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i <= len - n) {
      var j = 0
      while (j < n) { parts(j) = arr.getUTF8String(i + j); j += 1 }
      out(i) = Md5Util.prefix60(UTF8String.concatWs(Space, parts: _*).getBytes)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** array<string> tokens -> array<bigint> of 60-bit shingle hashes. */
case class ShingleHashes(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes() = child.dataType match {
    case ArrayType(StringType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"shingle_hashes expects array<string>, got $other")
  }

  override def nullSafeEval(v: Any): Any =
    ArrayKernels.shingleHashes60(v.asInstanceOf[ArrayData])

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else nullSafeEval(v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = ArrayKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $k.shingleHashes60($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

/** array<string> tokens -> array<bigint> of 60-bit n-gram hashes —
  * [[ShingleHashes]] for any gram width (bit-identical to
  * `Md5Prefix60(NGrams(tokens, n))` element-wise, without the n-gram
  * string array ever materializing).
  */
case class NGramHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"n must be >= 1, got $n")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes() = child.dataType match {
    case ArrayType(StringType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"ngram_hashes expects array<string>, got $other")
  }

  override def nullSafeEval(v: Any): Any =
    ArrayKernels.ngramHashes60(v.asInstanceOf[ArrayData], n)

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else nullSafeEval(v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = ArrayKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $k.ngramHashes60($c, $n);")
  }

  override protected def withNewChildInternal(newChild: Expression): NGramHashes =
    copy(child = newChild)
}

/** array<bigint> -> distinct sliding-window-min set ([[ArrayKernels.winnowMins]]). */
case class WinnowMins(child: Expression, w: Int) extends UnaryExpression {
  require(w >= 1, s"w must be >= 1, got $w")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes() = child.dataType match {
    case ArrayType(LongType, false) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"winnow_mins expects array<bigint> without nulls, got $other")
  }

  override def nullSafeEval(v: Any): Any =
    ArrayKernels.winnowMins(v.asInstanceOf[ArrayData], w)

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else nullSafeEval(v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = ArrayKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $k.winnowMins($c, $w);")
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowMins =
    copy(child = newChild)
}

/** array<float|double> -> array<bigint> quantized by floor(x * scale). */
case class QuantFloats(child: Expression, scale: Double) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType,
    containsNull = child.dataType match {
      case ArrayType(_, n) => n
      case _ => true
    })
  override def nullable: Boolean = child.nullable

  private def elemIsDouble: Boolean = child.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes() = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"quant_floats expects array<float|double>, got $other")
  }

  override def nullSafeEval(v: Any): Any =
    if (elemIsDouble) ArrayKernels.quantDoubles(v.asInstanceOf[ArrayData], scale)
    else ArrayKernels.quantFloats(v.asInstanceOf[ArrayData], scale)

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else nullSafeEval(v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = ArrayKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val m = if (elemIsDouble) "quantDoubles" else "quantFloats"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $k.$m($c, $scale);")
  }

  override protected def withNewChildInternal(newChild: Expression): QuantFloats =
    copy(child = newChild)
}

/** string -> array<string> split on a single ASCII byte, bit-identical to
  * Spark's regex `split(str, " ", -1)` / DuckDB's `string_split` for a
  * one-char separator (every occurrence splits; leading/trailing/adjacent
  * separators yield empty strings). An ASCII byte never occurs inside a
  * UTF-8 multi-byte sequence, so the byte-level scan is encoding-safe.
  * Exists because Spark's StringSplit always goes through java.util.regex
  * even for a literal one-char pattern — the regex engine dominated every
  * tokenization query in profiles.
  */
case class CharSplit(child: Expression, sep: Byte) extends UnaryExpression {
  require(sep >= 0, "separator must be ASCII")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes() = child.dataType match {
    case StringType =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"char_split expects string, got $other")
  }

  override def nullSafeEval(v: Any): Any =
    ArrayKernels.splitByte(v.asInstanceOf[UTF8String], sep)

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else nullSafeEval(v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = ArrayKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $k.splitByte($c, (byte) $sep);")
  }

  override protected def withNewChildInternal(newChild: Expression): CharSplit =
    copy(child = newChild)
}

/** string -> array<string> of adjacent character pairs — see
  * [[ArrayKernels.charPairs]].
  */
case class CharPairs(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes() = child.dataType match {
    case StringType =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"char_pairs expects string, got $other")
  }

  override def nullSafeEval(v: Any): Any =
    ArrayKernels.charPairs(v.asInstanceOf[UTF8String])

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else nullSafeEval(v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = ArrayKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $k.charPairs($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): CharPairs =
    copy(child = newChild)
}

/** array<string> -> array<string> with consecutive duplicate runs
  * collapsed — see [[ArrayKernels.collapseRuns]].
  */
case class CollapseRuns(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes() = child.dataType match {
    case ArrayType(StringType, false) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"collapse_runs expects array<string>, got $other")
  }

  override def nullSafeEval(v: Any): Any =
    ArrayKernels.collapseRuns(v.asInstanceOf[ArrayData])

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else nullSafeEval(v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = ArrayKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $k.collapseRuns($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): CollapseRuns =
    copy(child = newChild)
}

/** string -> array<struct<tok:string,cnt:bigint>> row-local term
  * frequency (empty tokens dropped) — see [[ArrayKernels.tokenCounts]].
  */
case class TokenCounts(child: Expression, sep: Byte) extends UnaryExpression {
  require(sep >= 0, "separator must be ASCII")
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("tok", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes() = child.dataType match {
    case StringType =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"token_counts expects string, got $other")
  }

  override def nullSafeEval(v: Any): Any =
    ArrayKernels.tokenCounts(v.asInstanceOf[UTF8String], sep)

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else nullSafeEval(v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = ArrayKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $k.tokenCounts($c, (byte) $sep);")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenCounts =
    copy(child = newChild)
}

/** array<string> tokens -> array<string> of space-joined n-grams. */
case class NGrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "n must be >= 1")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  // containsNull = false required: concatWs silently DROPS null parts, so
  // a null-element input would yield grams with fewer than n tokens
  override def checkInputDataTypes() = child.dataType match {
    case ArrayType(StringType, false) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"ngrams expects array<string>, got $other")
  }

  override def nullSafeEval(v: Any): Any =
    ArrayKernels.ngrams(v.asInstanceOf[ArrayData], n)

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else nullSafeEval(v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = ArrayKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $k.ngrams($c, $n);")
  }

  override protected def withNewChildInternal(newChild: Expression): NGrams =
    copy(child = newChild)
}

/** array<bigint> h60 shingle hashes -> array<bigint> MinHash signature
  * (null for shingle-less docs).
  */
/** array<bigint> -> sorted distinct array of (x mod p) — see
  * [[ArrayKernels.distinctModP]].
  */
case class DistinctModP(child: Expression, p: Long) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes() = child.dataType match {
    case ArrayType(LongType, false) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"distinct_mod_p expects array<bigint> (no nulls), got $other")
  }

  override def nullSafeEval(v: Any): Any =
    ArrayKernels.distinctModP(v.asInstanceOf[ArrayData], p)

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else nullSafeEval(v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = ArrayKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $k.distinctModP($c, ${p}L);")
  }

  override protected def withNewChildInternal(newChild: Expression): DistinctModP =
    copy(child = newChild)
}

case class MinHashSig(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes() = child.dataType match {
    case ArrayType(LongType, false) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"minhash_sig expects array<bigint> (no nulls), got $other")
  }

  override def nullSafeEval(v: Any): Any =
    ArrayKernels.minhashSig(v.asInstanceOf[ArrayData])

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else nullSafeEval(v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = ArrayKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = $k.minhashSig($c);
      ${ev.isNull} = (${ev.value} == null);
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}
