package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter build/probe over Spark's native sketch expressions — the
  * same codegen'd `BloomFilterAggregate` / `BloomFilterMightContain` pair
  * Spark's row-level runtime filtering injects, exposed as first-class
  * Columns so a query can build a filter over one frame and probe it from
  * another. The aggregate is MERGEABLE (bit-or of equal-sized filters), so
  * the build is one map-side partial per partition plus a tiny final merge
  * — the keys themselves never shuffle; the probe is a row-local codegen'd
  * test against a constant binary.
  *
  * This is the candidate pass of the sketch-then-verify decontamination
  * pattern (q68): probe survivors = true matches + a bounded
  * false-positive stream, and an exact confirm join touches only the
  * survivors. The reference has no sketch surface at all (SURVEY §2.8);
  * this sits next to KMV (q45) and Misra–Gries (q67) as the third
  * mergeable summary.
  *
  * Keys are hashed with `xxhash64` on both sides, matching how Spark's
  * own injected filters key the sketch (InjectRuntimeFilter.scala in the
  * Spark source).
  */
object Bloom {
  /** Mergeable Bloom build: one binary-typed sketch sized for
    * `expectedItems` keys at false-positive rate `fpp`.
    */
  def agg(key: Column, expectedItems: Long, fpp: Double): Column = {
    val bits = BloomFilter.optimalNumOfBits(expectedItems, fpp)
    Bridge.column(new BloomFilterAggregate(
      new XxHash64(Seq(Bridge.expression(key))),
      Literal(expectedItems), Literal(bits)).toAggregateExpression())
  }

  /** Row-local probe of `key` against a CONSTANT bloom binary (the
    * expression requires a constant/scalar-subquery sketch — pass
    * `lit(bytes)` from a bounded one-row collect, mirroring how Spark
    * materializes its injected filters driver-side before probing).
    */
  def mightContain(key: Column, bloom: Column): Column =
    Bridge.column(BloomFilterMightContain(
      Bridge.expression(bloom),
      new XxHash64(Seq(Bridge.expression(key)))))
}
