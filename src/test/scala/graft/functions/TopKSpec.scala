package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKSpec extends SparkSpec {
  import spark.implicits._

  test("topk_min equals the window row_number spelling across partitions") {
    // rows of each group deliberately scattered over partitions so the
    // merge path (partial buffers combined across tasks) is exercised
    val rows = for (g <- 0 until 7; i <- 0 until 23)
      yield (g, (i * 37 + g * 11) % 100, s"v$i")
    val df = spark.sparkContext.parallelize(rows, 8).toDF("g", "score", "tag")
    val viaTopk = df
      .select($"g", struct($"score", $"tag").as("item"))
      .groupBy($"g").agg(TopK.topkMin($"item", 5).as("top"))
      .select($"g", posexplode($"top"))
      .select($"g", ($"pos" + 1).as("rk"), $"col.score", $"col.tag")
    val w = Window.partitionBy($"g").orderBy($"score", $"tag")
    val viaWindow = df
      .withColumn("rk", row_number().over(w)).filter($"rk" <= 5)
      .select($"g", $"rk", $"score", $"tag")
    assert(viaTopk.collect().toSet === viaWindow.collect().toSet)
  }

  test("k larger than the group returns the whole group sorted") {
    val df = Seq((1, 30L), (1, 10L), (1, 20L)).toDF("g", "v")
    val out = df.groupBy($"g").agg(TopK.topkMin($"v", 10).as("top"))
      .select($"top").head().getSeq[Long](0)
    assert(out === Seq(10L, 20L, 30L))
  }

  test("null inputs are skipped; all-null group yields empty array") {
    val df = Seq((1, Some(5L)), (1, None), (2, None))
      .toDF("g", "v")
    val out = df.groupBy($"g").agg(TopK.topkMin($"v", 3).as("top"))
      .orderBy($"g").collect()
    assert(out(0).getSeq[Long](1) === Seq(5L))
    assert(out(1).getSeq[Long](1) === Seq.empty)
  }

  test("serialize/deserialize round-trips the buffer (spill path)") {
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types._
    val agg = TopKMin(BoundReference(0, LongType, nullable = false), 3)
    val buf = agg.createAggregationBuffer()
    for (v <- Seq(9L, 2L, 7L, 4L))
      agg.update(buf, org.apache.spark.sql.catalyst.InternalRow(v))
    assert(buf.toArray.toSeq === Seq(2L, 4L, 7L))
    val restored = agg.deserialize(agg.serialize(buf))
    assert(restored.toArray.toSeq === Seq(2L, 4L, 7L))
    val other = agg.createAggregationBuffer()
    agg.update(other, org.apache.spark.sql.catalyst.InternalRow(1L))
    val merged = agg.merge(restored, other)
    assert(merged.toArray.toSeq === Seq(1L, 2L, 4L))
  }

  test("topk_min is SQL-callable through the extensions builder shape") {
    import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
    import org.apache.spark.sql.graft.Bridge
    import org.apache.spark.sql.types.IntegerType
    // same builder GraftExtensions injects (shared test session cannot
    // re-run spark.sql.extensions, so register it directly)
    Bridge.registerFunction(spark, "topk_min", {
      case Seq(child: Expression, Literal(k: Int, IntegerType)) => TopKMin(child, k)
      case _ => throw new IllegalArgumentException("topk_min(expr, k)")
    })
    Seq((1, 9L), (1, 2L), (1, 7L), (2, 4L)).toDF("g", "v")
      .createOrReplaceTempView("topk_in")
    val out = spark.sql(
      "SELECT g, topk_min(v, 2) AS top FROM topk_in GROUP BY g ORDER BY g")
      .collect()
    assert(out(0).getSeq[Long](1) === Seq(2L, 7L))
    assert(out(1).getSeq[Long](1) === Seq(4L))
  }

  test("ties broken by later struct fields deterministically") {
    val df = Seq((1, 5, "b"), (1, 5, "a"), (1, 5, "c"), (1, 4, "z"))
      .toDF("g", "s", "t")
    val out = df.select($"g", struct($"s", $"t").as("item"))
      .groupBy($"g").agg(TopK.topkMin($"item", 2).as("top"))
      .select(explode($"top").as("e")).select($"e.s", $"e.t")
      .collect().toSeq
    assert(out === Seq(Row(4, "z"), Row(5, "a")))
  }
}
