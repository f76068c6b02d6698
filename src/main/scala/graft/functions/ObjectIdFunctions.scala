package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.unsafe.types.UTF8String

/** Static helpers shared by interpreted eval and generated code. */
object ObjectIdUtil {
  private val HexChars = "0123456789abcdef"

  /** Is `s` a valid 24-char hex ObjectId (case-insensitive)? */
  def isValidHex(s: UTF8String): Boolean = {
    if (s == null || s.numChars() != 24) return false
    val str = s.toString
    var i = 0
    while (i < 24) {
      val c = Character.toLowerCase(str.charAt(i))
      if (HexChars.indexOf(c) < 0) return false
      i += 1
    }
    true
  }

  /** Normalize to canonical lowercase hex, or null if invalid. */
  def normalize(s: UTF8String): UTF8String =
    if (isValidHex(s)) UTF8String.fromString(s.toString.toLowerCase) else null

  /** Embedded unix timestamp: first 4 bytes (8 hex chars) of the ObjectId.
    * Same semantics as the reference's `ObjectIdToSeconds` Pig UDF
    * (reference: pig/src/main/java/com/mongodb/hadoop/pig/udf/ObjectIdToSeconds.java:1-38).
    */
  def seconds(s: UTF8String): Long =
    java.lang.Long.parseLong(s.toString.substring(0, 8), 16)
}

/** string ObjectId hex -> embedded unix seconds, as a native Catalyst
  * expression (codegen'd; stays inside WholeStageCodegen — no UDF boundary).
  */
case class ObjectIdToSeconds(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes() = child.dataType match {
    case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"objectid_to_seconds expects STRING, got $other")
  }
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String]
    if (ObjectIdUtil.isValidHex(s)) ObjectIdUtil.seconds(s) else null
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else nullSafeEval(v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = ObjectIdUtil.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |if ($util.isValidHex($c)) {
         |  ${ev.value} = $util.seconds($c);
         |} else {
         |  ${ev.isNull} = true;
         |}
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): ObjectIdToSeconds =
    copy(child = newChild)
}

/** Validate/normalize a hex string into a canonical lowercase ObjectId, null
  * if malformed. Analog of the reference's `ToObjectId` Pig UDF
  * (reference: pig/src/main/java/com/mongodb/hadoop/pig/udf/ToObjectId.java:1-28).
  */
case class ToObjectId(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any =
    ObjectIdUtil.normalize(v.asInstanceOf[UTF8String])

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else nullSafeEval(v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = ObjectIdUtil.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = $util.normalize($c);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): ToObjectId =
    copy(child = newChild)
}

/** Column wrappers + SQL registration for the BSON helper functions
  * (SURVEY.md §2.6).
  */
object GraftFunctions {
  def objectid_to_seconds(c: Column): Column =
    Bridge.column(ObjectIdToSeconds(Bridge.expression(c)))
  def to_objectid(c: Column): Column =
    Bridge.column(ToObjectId(Bridge.expression(c)))

  /** Register as SQL functions on a session. */
  def register(spark: SparkSession): Unit = {
    Bridge.registerFunction(spark, "objectid_to_seconds", exprs => ObjectIdToSeconds(exprs.head))
    Bridge.registerFunction(spark, "to_objectid", exprs => ToObjectId(exprs.head))
  }
}
