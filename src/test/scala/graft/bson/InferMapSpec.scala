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

  test("unit: a WIDE but STABLE record stays a struct (denseness gate, ADVICE r16)") {
    // 160 fixed fields on EVERY document: union == per-doc width, so
    // this is a record — collapsing it would break dotted struct access
    def wideRec(i: Int): BDoc = BDoc(
      "_id" -> BInt32(i),
      "rec" -> BDoc((0 until 160).map(k =>
        s"f$k" -> (BInt64(i.toLong + k): BsonValue)): _*))
    val s = RowCodec.inferSchema((1 to 100).iterator.map(wideRec))
    assert(s("rec").dataType.isInstanceOf[StructType], s)
    assert(s("rec").dataType.asInstanceOf[StructType].fields.length == 160)

    // boundary: union exactly 2x the widest doc collapses; just under
    // does not. 75-key docs over a 150-key union -> ratio 2.0 -> map;
    // 80-key docs over the same 150-key union -> ratio 1.875 -> struct.
    def sparse(perDoc: Int)(i: Int): BDoc = BDoc(
      "_id" -> BInt32(i),
      "m" -> BDoc((0 until perDoc).map(k =>
        s"k${(i * perDoc + k) % 150}" -> (BInt64(k.toLong): BsonValue)): _*))
    val collapses = RowCodec.inferSchema((1 to 200).iterator.map(sparse(75)))
    assert(collapses("m").dataType.isInstanceOf[MapType], collapses)
    val stays = RowCodec.inferSchema((1 to 200).iterator.map(sparse(80)))
    assert(stays("m").dataType.isInstanceOf[StructType], stays)

    // a MIXED population (some docs dense, some sparse): the widest doc
    // governs — one 150-field doc among sparse ones keeps the struct
    def mixedPop(i: Int): BDoc =
      if (i == 7) BDoc("_id" -> BInt32(i), "m" -> BDoc((0 until 150).map(k =>
        s"k$k" -> (BInt64(k.toLong): BsonValue)): _*))
      else sparse(4)(i)
    val mp = RowCodec.inferSchema((1 to 200).iterator.map(mixedPop))
    assert(mp("m").dataType.isInstanceOf[StructType], mp)

    // dynamic keys under an ARRAY of subdocuments collapse too (array
    // elements share the array's path for the denseness stats)
    def arrDyn(i: Int): BDoc = BDoc(
      "_id" -> BInt32(i),
      "xs" -> BArray(Vector(
        BDoc((0 until 3).map(k =>
          s"d${(i * 3 + k) % 200}" -> (BInt64(k.toLong): BsonValue)): _*))))
    val ad = RowCodec.inferSchema((1 to 300).iterator.map(arrDyn))
    assert(ad("xs").dataType ==
      ArrayType(MapType(StringType, LongType, valueContainsNull = true),
        containsNull = true), ad)
  }

  test("interplay: declared schemas, nested pruning, and the read path are collapse-free") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-infmap2").toString
    // every doc: a stable 130-field record + a sparse dynamic bag
    graft.files.BsonFiles.write(s"$dir/data.bson",
      (0 until 200).iterator.map(i => BDoc(
        "_id" -> BInt64(i.toLong),
        "rec" -> BDoc((0 until 130).map(k =>
          s"f$k" -> (BInt64((i + k).toLong): BsonValue)): _*),
        "metrics" -> BDoc((0 until 2).map(k =>
          s"m${(i * 2 + k) % 180}" -> (BInt64(i.toLong): BsonValue)): _*))))
    // inference: the stable record survives as a struct NEXT TO the
    // collapsed dynamic bag — dotted access keeps working
    val df = spark.read.format("graftbson").load(dir)
    assert(df.schema("rec").dataType.isInstanceOf[StructType], df.schema)
    assert(df.schema("metrics").dataType.isInstanceOf[MapType], df.schema)
    val one = df.select($"_id", $"rec.f3".as("f3")).filter($"f3" > 100L)
    // the nested projection reaches the scan (Proj trie prune) — the
    // wide record is not re-read whole for a one-subfield select
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("rec.f3") && !plan.contains("PushedUnwind"), plan)
    assert(one.count() > 0)
    // a DECLARED schema is never second-guessed: declaring the wide
    // record as a struct (or the bag as a map) reads exactly that, at
    // any threshold option
    val declared = spark.read.format("graftbson")
      .schema(new StructType()
        .add("_id", LongType)
        .add("rec", new StructType()
          .add("f0", LongType).add("f1", LongType))
        .add("metrics", MapType(StringType, LongType)))
      .option("infer_map_threshold", "2").load(dir)
    assert(declared.schema("rec").dataType.isInstanceOf[StructType])
    assert(declared.select($"rec.f0").count() == 200)
    assert(declared.select(explode($"metrics")).count() == 400)
    // inferred map + explode still pushes with the record column along
    val e = df.select($"rec.f0".as("f0"), explode($"metrics"))
    val ePlan = e.queryExecution.executedPlan.toString
    assert(ePlan.contains("PushedUnwind: metrics MAP") &&
      !ePlan.contains("Generate"), ePlan)
    assert(e.count() == 400)
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
