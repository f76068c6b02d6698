package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomSpec extends SparkSpec {
  import spark.implicits._

  private def build(keys: Seq[Long], parts: Int, items: Long, fpp: Double): Array[Byte] =
    spark.sparkContext.parallelize(keys, parts).toDF("k")
      .agg(Bloom.agg($"k", items, fpp).as("bf"))
      .head().getAs[Array[Byte]](0)

  test("no false negatives across a multi-partition (merged) build") {
    val keys = (0L until 5000L).map(_ * 7919L)
    val bf = build(keys, 16, 5000L, 0.01)
    val missed = keys.toDF("k")
      .filter(!Bloom.mightContain($"k", lit(bf)))
      .count()
    assert(missed == 0, s"$missed inserted keys reported absent")
  }

  test("false-positive rate stays near the configured fpp") {
    val bf = build((0L until 5000L).map(_ * 7919L), 8, 5000L, 0.01)
    // probe 20k keys guaranteed NOT inserted (odd values; inserted are even)
    val fps = (0L until 20000L).map(_ * 2L + 1L).toDF("k")
      .filter(Bloom.mightContain($"k", lit(bf)))
      .count()
    assert(fps < 20000 * 0.05, s"fpp ${fps / 20000.0} way above configured 0.01")
  }

  test("exact-confirm join removes every false positive (q68 pattern)") {
    // force a heavy fp rate with an undersized sketch, then confirm
    val inserted = (0L until 200L).map(_ * 31L)
    val bf = build(inserted, 4, 20L, 0.5)
    val universe = (0L until 5000L).toDF("k")
    val survivors = universe.filter(Bloom.mightContain($"k", lit(bf)))
    val confirmed = survivors
      .join(broadcast(inserted.toDF("k")), Seq("k"))
      .as[Long].collect().toSet
    assert(confirmed == inserted.filter(_ < 5000L).toSet)
    // and the prefilter did let false positives through (else the test
    // proves nothing about the confirm step)
    assert(survivors.count() > confirmed.size)
  }
}
