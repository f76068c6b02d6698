package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static digest helpers shared by interpreted eval and generated code. */
object Md5Util {
  private val local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Top 60 bits of the md5 digest, i.e. the value of the digest's first 15
    * hex characters parsed base-16. Bit-identical to
    * `conv(substring(md5(c), 1, 15), 16, 10)` (the portable definition shared
    * with the DuckDB oracle: `CAST(concat('0x', substr(md5(e),1,15)) AS
    * BIGINT)`) but with no hex string materialization or string base
    * conversion — one digest over the raw bytes, seven shifts, one `>>> 4`.
    */
  def prefix60(bytes: Array[Byte]): Long = {
    val md = local.get()
    md.reset()
    val d = md.digest(bytes)
    val first8 =
      ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) | ((d(2) & 0xffL) << 40) |
      ((d(3) & 0xffL) << 32) | ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
    first8 >>> 4
  }

  def prefix60(s: UTF8String): Long = prefix60(s.getBytes)
}

/** 60-bit md5-prefix hash of a string/binary column as a native codegen'd
  * Catalyst expression. This is the hot hashing primitive of the dedup /
  * fingerprint operators (one call per shingle/token — billions of rows at
  * 100 TB); the expression form keeps it inside WholeStageCodegen with zero
  * intermediate UTF8String allocations, unlike the equivalent
  * `conv(substring(md5(c),1,15),16,10)` pipeline it replaces.
  */
case class Md5Prefix60(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes() = child.dataType match {
    case StringType | BinaryType =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"md5_prefix60 expects STRING or BINARY, got $other")
  }

  override def nullSafeEval(v: Any): Any = child.dataType match {
    case StringType => Md5Util.prefix60(v.asInstanceOf[UTF8String])
    case _ => Md5Util.prefix60(v.asInstanceOf[Array[Byte]])
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else nullSafeEval(v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = Md5Util.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $util.prefix60($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix60 =
    copy(child = newChild)
}
