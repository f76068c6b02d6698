package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class MisraGriesSpec extends SparkSpec {
  import spark.implicits._

  test("capacity >= vocabulary: counts are exact") {
    val rows = for (i <- 0 until 1000) yield (s"t${i % 7}", 1L)
    val out = spark.sparkContext.parallelize(rows, 6).toDF("tok", "w")
      .agg(MisraGries.sketch($"tok", $"w", 64).as("sk"))
      .select(explode($"sk").as("e")).select($"e.tok", $"e.cnt")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.size == 7)
    assert(out.values.forall(c => c == 1000 / 7 || c == 1000 / 7 + 1), out.toString)
  }

  test("a heavy key survives eviction pressure and is under-estimated by <= N/(c+1)") {
    // 1 heavy key (weight 3000) drowned in 5000 distinct singletons,
    // capacity 16: the summary must still contain the heavy key with
    // count >= 3000 - 8000/17
    val rows = Seq.fill(3000)(("HEAVY", 1L)) ++
      (0 until 5000).map(i => (s"u$i", 1L))
    val out = spark.sparkContext.parallelize(scala.util.Random.shuffle(rows), 8)
      .toDF("tok", "w")
      .agg(MisraGries.sketch($"tok", $"w", 16).as("sk"))
      .select(explode($"sk").as("e")).select($"e.tok", $"e.cnt")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.size <= 16)
    val n = 8000L
    val bound = n / 17
    assert(out.contains("HEAVY"), s"heavy key evicted: $out")
    assert(out("HEAVY") <= 3000L && out("HEAVY") >= 3000L - bound,
      s"estimate ${out("HEAVY")} outside [${3000L - bound}, 3000]")
  }

  test("weighted updates count instances, not rows") {
    val out = Seq(("a", 5L), ("b", 2L), ("a", 4L)).toDF("tok", "w")
      .agg(MisraGries.sketch($"tok", $"w", 8).as("sk"))
      .select(explode($"sk").as("e")).select($"e.tok", $"e.cnt")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("a" -> 9L, "b" -> 2L))
  }

  test("misra_gries is SQL-callable through the extensions builder shape") {
    import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
    import org.apache.spark.sql.graft.Bridge
    import org.apache.spark.sql.types.IntegerType
    // same builder GraftExtensions injects (shared test session cannot
    // re-run spark.sql.extensions, so register it directly)
    Bridge.registerFunction(spark, "misra_gries", {
      case Seq(k: Expression, w: Expression, Literal(c: Int, IntegerType)) =>
        MisraGriesSketch(k, w, c)
      case _ => throw new IllegalArgumentException(
        "misra_gries(key, weight, capacity)")
    })
    Seq(("a", 5L), ("b", 2L), ("a", 4L)).toDF("tok", "w")
      .createOrReplaceTempView("mg_in")
    val out = spark.sql(
      "SELECT explode(misra_gries(tok, w, 8)) AS e FROM mg_in")
      .select("e.tok", "e.cnt").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("a" -> 9L, "b" -> 2L))
  }

  test("serialize/deserialize round-trips the summary (spill/exchange path)") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types._
    val agg = MisraGriesSketch(
      BoundReference(0, StringType, nullable = false),
      BoundReference(1, LongType, nullable = false), 4)
    val buf = agg.createAggregationBuffer()
    for ((t, w) <- Seq(("x", 3L), ("y", 1L), ("x", 2L)))
      agg.update(buf, InternalRow(UTF8String.fromString(t), w))
    val restored = agg.deserialize(agg.serialize(buf))
    val merged = agg.merge(restored, buf) // doubles every count
    assert(merged.get(UTF8String.fromString("x")) == 10L)
    assert(merged.get(UTF8String.fromString("y")) == 2L)
  }
}
