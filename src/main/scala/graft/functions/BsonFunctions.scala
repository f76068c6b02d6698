package graft.functions

import graft.bson.{BMaxKey, BMinKey, BsonValue}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** The remaining Pig-UDF-surface scalar functions (SURVEY.md §2.6), as
  * Column builders over Spark built-ins (no custom expressions needed):
  *
  *  - to_binary: string -> BSON binary payload (ToBinary.java:1-27)
  *  - to_dbref:  (ref, id) -> DBRef struct {ref, id} (ToDBRef.java:1-43)
  *  - MinKey/MaxKey: the BSON sentinels. In the Spark engine they exist as
  *    [[graft.bson.BMinKey]]/[[BMaxKey]] ADT values with full codec +
  *    ordering support and appear as unbounded partition-range bounds
  *    (GenMinKey.java/GenMaxKey.java parity — a data-type-level literal is
  *    deliberately NOT materialized into DataFrames, matching SURVEY §1.3).
  */
object BsonFunctions {

  /** String (or binary) column -> binary. */
  def to_binary(c: Column): Column = encode(c.cast("string"), "UTF-8")

  /** DBRef struct: {ref: string, id: string}. */
  def to_dbref(ref: Column, id: Column): Column =
    struct(ref.cast("string").as("ref"), id.cast("string").as("id"))

  /** BSON sentinel values for split bounds / cross-type ordering. */
  def minKey: BsonValue = BMinKey
  def maxKey: BsonValue = BMaxKey

  /** SQL registration routes through the SAME Column builders as the
    * Scala API (expression-based, stays in codegen) — a Scala-UDF
    * registration here would silently de-optimize `spark.sql` callers
    * relative to the Column API.
    */
  def register(spark: SparkSession): Unit = {
    import org.apache.spark.sql.catalyst.expressions.{Cast, CreateNamedStruct, Encode, Literal}
    import org.apache.spark.sql.graft.Bridge
    import org.apache.spark.sql.types.StringType
    Bridge.registerFunction(spark, "to_binary",
      args => new Encode(Cast(args.head, StringType), Literal("UTF-8")))
    Bridge.registerFunction(spark, "to_dbref",
      args => CreateNamedStruct(Seq(
        Literal("ref"), Cast(args(0), StringType),
        Literal("id"), Cast(args(1), StringType))))
  }
}
