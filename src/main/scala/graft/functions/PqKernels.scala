package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization kernels (q77/q78 hot loops).
  *
  * The declarative spelling — `array_min` over M×K literal distance
  * structs, each a `LongArrayDot` over a `slice` — is codegen'd but
  * allocates K struct rows + an array per subspace per row; profiled at
  * ~0.25 ms/vector it dominated both PQ queries. These kernels run the
  * whole codebook scan in one tight loop over the flattened literal
  * codebook, bit-identical to the declarative definition (PqKernelSpec
  * pins the equivalence; the d2/tie-break order matches the oracle's
  * `ORDER BY d2, k`).
  */
object PqKernels {

  /** Nearest codeword per subspace: returns array<struct<code,d2>> of
    * length m, scanning the flattened codebook (m·k·b longs, subspace-
    * major). Tie-break: lowest code wins (strict <).
    */
  def assign(q: ArrayData, cb: Array[Long], m: Int, b: Int, k: Int): ArrayData = {
    val out = new Array[Any](m)
    var mi = 0
    while (mi < m) {
      var bestK = 0L
      var bestD = Long.MaxValue
      var ki = 0
      while (ki < k) {
        val base = (mi * k + ki) * b
        var d = 0L
        var j = 0
        while (j < b) {
          val diff = q.getLong(mi * b + j) - cb(base + j)
          d += diff * diff
          j += 1
        }
        if (d < bestD) { bestD = d; bestK = ki.toLong }
        ki += 1
      }
      out(mi) = new GenericInternalRow(Array[Any](bestK, bestD))
      mi += 1
    }
    new GenericArrayData(out)
  }

  /** Asymmetric-distance sum for ONE query: lut is m·k longs (subspace-
    * major, code-minor); codes is [[assign]]'s output.
    */
  def adc(codes: ArrayData, lut: Array[Long], k: Int): Long = {
    var sum = 0L
    var mi = 0
    val m = codes.numElements()
    while (mi < m) {
      sum += lut(mi * k + codes.getStruct(mi, 2).getLong(0).toInt)
      mi += 1
    }
    sum
  }
}

/** array<bigint> (quantized vector) -> array<struct<code,d2>>: nearest
  * codeword per subspace — see [[PqKernels.assign]]. The codebook is a
  * plan constant (embedded via reference object, not a child).
  */
case class PqAssign(child: Expression, codebook: Array[Long],
    m: Int, b: Int, k: Int) extends UnaryExpression {
  require(codebook.length == m * k * b, "codebook must be m*k*b longs")
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("code", LongType, nullable = false),
    StructField("d2", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes() = child.dataType match {
    case ArrayType(LongType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"pq_assign expects array<bigint>, got $other")
  }

  override def nullSafeEval(v: Any): Any =
    PqKernels.assign(v.asInstanceOf[ArrayData], codebook, m, b, k)

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else nullSafeEval(v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kn = PqKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val cbRef = ctx.addReferenceObj("pqCodebook", codebook, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $kn.assign($c, $cbRef, $m, $b, $k);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqAssign =
    copy(child = newChild)
}

/** array<struct<code,d2>> (PQ codes) -> bigint ADC distance for one
  * query's lookup table — see [[PqKernels.adc]].
  */
case class PqAdc(child: Expression, lut: Array[Long], k: Int)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes() = child.dataType match {
    case ArrayType(_: StructType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"pq_adc expects array<struct>, got $other")
  }

  override def nullSafeEval(v: Any): Any =
    PqKernels.adc(v.asInstanceOf[ArrayData], lut, k)

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else nullSafeEval(v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kn = PqKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val lutRef = ctx.addReferenceObj("pqLut", lut, "long[]")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $kn.adc($c, $lutRef, $k);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqAdc =
    copy(child = newChild)
}

/** Scalar-quantization (SQ8) kernels — the int8-per-dimension compression
  * audit (q110). Each dimension d of a quantized vector is coded into
  * [0, 255] against the corpus-global [min_d, max_d] and reconstructed to
  * the code's representative value, all in exact integer arithmetic
  * (truncating division on non-negative operands == floor — mirrored by
  * DuckDB's `//`), so the audit's distances are bit-identical
  * cross-engine.
  */
object SqKernels {
  /** Reconstruct: r_d = min_d + ((q_d - min_d)*255 / span_d) * span_d / 255
    * (span 0 → the constant min_d). One tight loop per row; the bounds
    * arrays are plan constants.
    */
  def reconstruct(q: ArrayData, mins: Array[Long], spans: Array[Long]): ArrayData = {
    val n = q.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      val mn = mins(i)
      val sp = spans(i)
      out(i) =
        if (sp == 0L) mn
        else mn + ((q.getLong(i) - mn) * 255L / sp) * sp / 255L
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** array<bigint> (quantized vector) -> array<bigint> SQ8-reconstructed
  * vector against corpus-global per-dimension bounds — see
  * [[SqKernels.reconstruct]]. Bounds are plan constants (reference
  * objects), like [[PqAssign]]'s codebook.
  */
case class SqReconstruct(child: Expression, mins: Array[Long],
    spans: Array[Long]) extends UnaryExpression {
  require(mins.length == spans.length, "mins/spans must align")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes() = child.dataType match {
    case ArrayType(LongType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"sq_reconstruct expects array<bigint>, got $other")
  }

  override def nullSafeEval(v: Any): Any =
    SqKernels.reconstruct(v.asInstanceOf[ArrayData], mins, spans)

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else nullSafeEval(v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kn = SqKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val mnRef = ctx.addReferenceObj("sqMins", mins, "long[]")
    val spRef = ctx.addReferenceObj("sqSpans", spans, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $kn.reconstruct($c, $mnRef, $spRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): SqReconstruct =
    copy(child = newChild)
}
