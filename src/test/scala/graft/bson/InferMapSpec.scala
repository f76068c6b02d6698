package graft.bson

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.nio.file.Files

/** Dynamic-keys schema inference (r16): a nested subdocument whose
  * UNION of sampled keys reaches `infer_map_threshold` (default 128)
  * collapses to `map<string, V>` instead of a pathologically wide
  * struct — at corpus scale the distinct-key set is unbounded, a
  * struct schema must enumerate it, and the engine's whole map surface
  * (`$objectToArray` explode pushdown, kv filters/groups/joins/tails)
  * exists for exactly this column shape. Record-sized subdocuments
  * keep inferring as structs; the TOP level never collapses.
  */
class InferMapSpec extends SparkSpec {

  test("unit: dynamic-keys levels collapse, record levels stay structs") {
    def doc(i: Int): BDoc = BDoc(
      "_id" -> BInt32(i),
      // 200 distinct metric keys across the sample, long values
      "metrics" -> BDoc((0 until 4).map(k =>
        s"m${(i * 4 + k) % 200}" -> (BInt64(i.toLong * k): BsonValue)): _*),
      // a RECORD subdocument: 3 stable fields
      "meta" -> BDoc("lang" -> BString("en"), "n" -> BInt32(i),
        "ok" -> BBool(i % 2 == 0)))
    val schema = RowCodec.inferSchema((1 to 500).iterator.map(doc))
    assert(schema("metrics").dataType ==
      MapType(StringType, LongType, valueContainsNull = true), schema)
    assert(schema("meta").dataType.isInstanceOf[StructType], schema)
    // mixed value types merge (long + string -> string fallback)
    def mixed(i: Int): BDoc = BDoc(
      "_id" -> BInt32(i),
      "metrics" -> BDoc((0 until 4).map(k =>
        s"m${(i * 4 + k) % 200}" ->
          (if (k % 2 == 0) BInt64(k.toLong): BsonValue
           else BString(s"v$k"): BsonValue)): _*))
    val mixedSchema = RowCodec.inferSchema((1 to 500).iterator.map(mixed))
    assert(mixedSchema("metrics").dataType ==
      MapType(StringType, StringType, valueContainsNull = true), mixedSchema)
    // threshold 0 disables; a huge threshold keeps the struct
    val off = RowCodec.inferSchema((1 to 500).iterator.map(doc), mapThreshold = 0)
    assert(off("metrics").dataType.isInstanceOf[StructType])
    // the TOP level never collapses even with many top-level fields
    val wideTop = RowCodec.inferSchema(Iterator(BDoc(
      (0 until 300).map(i => s"c$i" -> (BInt32(i): BsonValue)): _*)),
      mapThreshold = 128)
    assert(wideTop.fields.length == 300)
  }

  test("end-to-end: an inferred map column reads back and explodes with pushdown") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-infmap").toString
    // write 300 docs, each with 3 metric keys from a 200-key universe
    graft.files.BsonFiles.write(s"$dir/data.bson",
      (0 until 300).iterator.map(i => BDoc(
        "_id" -> BInt64(i.toLong),
        "metrics" -> BDoc((0 until 3).map(k =>
          s"m${(i * 3 + k) % 200}" -> (BInt64((i + k).toLong): BsonValue)): _*))))
    val df = spark.read.format("graftbson").load(dir) // inferred schema
    assert(df.schema("metrics").dataType ==
      MapType(StringType, LongType, valueContainsNull = true), df.schema)
    val e = df.select($"_id", explode($"metrics"))
    val plan = e.queryExecution.executedPlan.toString
    assert(plan.contains("PushedUnwind: metrics MAP") &&
      !plan.contains("Generate"), plan)
    assert(e.count() == 900)
    // group-by-key folds over the inferred map
    val g = df.select(explode($"metrics")).groupBy($"key")
      .agg(count(lit(1)).as("n"))
    assert(g.count() == 200)
    // opting out keeps the wide struct
    val wide = spark.read.format("graftbson")
      .option("infer_map_threshold", "0").load(dir)
    assert(wide.schema("metrics").dataType.isInstanceOf[StructType])
  }
}
