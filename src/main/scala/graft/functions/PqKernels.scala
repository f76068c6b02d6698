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
