package graft.operators

import graft.functions.Portable
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Range-shard layout planning over a LONG sort key: derive R boundaries,
  * assign every row a shard, never globally sort the corpus — the
  * planning step behind `repartitionByRange`-style ordered output.
  *
  * Two interchangeable paths behind [[assign]]:
  *
  *  - EXACT (small key domains): the key's full histogram pre-collapses
  *    map-side (≤ |domain| rows per task cross one bounded exchange),
  *    a single-partition window computes exact cumulative ranks, and
  *    shard(v) = floor(R · cum_before(v) / N) joins back by broadcast.
  *    Bit-deterministic at any parallelism — the oracle-pinned q94 path.
  *  - SAMPLED (high-cardinality domains, where the histogram frame
  *    itself would be data-scale): the shape of Spark's RangePartitioner
  *    reservoir, made DETERMINISTIC — a hash-threshold row sample
  *    (md5 of the row id, the q79 sampling convention: reproducible
  *    across runs, partitionings, and engines) whose sorted quantiles
  *    become the boundaries; assignment is then a row-local comparison
  *    against ≤ R−1 literal boundaries, no join at all. Balance is
  *    approximate (sampling error ~ 1/√sample per shard) but the
  *    invariants — identical keys co-locate, every row assigned exactly
  *    once, shards contiguous — hold unconditionally.
  *
  * [[assign]] picks the path from an approx-distinct probe of the key
  * (one cheap map-side-sketch pass), so callers state only intent; the
  * threshold is the point where "bounded exchange" stops being true of
  * the histogram.
  */
object RangeShard {

  /** Exact (key → shard_id) frame, bounded by the key domain; broadcast
    * back onto the corpus by the caller (one row per distinct key).
    */
  def exactShards(v: DataFrame, key: String, r: Long): DataFrame = {
    val h = v.groupBy(col(key)).agg(count(lit(1)).as("c"))
    val wBefore = Window.orderBy(col(key))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.orderBy(col(key))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    h.withColumn("cumb", coalesce(sum(col("c")).over(wBefore), lit(0L)))
      .withColumn("tot", sum(col("c")).over(wAll))
      .select(col(key), Portable.idiv(lit(r) * col("cumb"), col("tot")).as("shard_id"))
  }

  /** Deterministic sampled boundaries: ≤ r−1 ascending distinct keys;
    * shard i = keys in [b(i−1), b(i)). Sample membership hashes the ROW
    * id (not the key), so heavy keys are sampled proportionally and the
    * quantiles reflect the actual distribution. Two bounded driver
    * touches: one count, one ≤ ~targetSample-row collect.
    */
  def sampledBoundaries(v: DataFrame, key: String, idCol: String, r: Int,
      targetSample: Int = 4096): Seq[Long] = {
    val n = v.count()
    if (n == 0) return Seq.empty
    val M = 1L << 30
    val thr = math.max(1L, (targetSample.toDouble / n * M).toLong)
    val sample = v
      .filter(Portable.hash60(col(idCol).cast("string")) % M < thr)
      .select(col(key).cast("long")).na.drop()
      .collect().map(_.getLong(0)).sorted
    val s = sample.length
    if (s == 0) Seq.empty
    else (1 until r).map(i => sample(((i.toLong * s) / r).toInt)).distinct
  }

  /** Row-local shard id from explicit boundaries: the count of
    * boundaries ≤ key. Identical keys co-locate by construction; with
    * b ascending the shards are contiguous key ranges.
    */
  def shardOf(key: Column, boundaries: Seq[Long]): Column =
    boundaries.foldLeft(lit(0L)) { (acc, b) =>
      acc + when(key >= b, lit(1L)).otherwise(lit(0L))
    }

  /** `v` plus a `shard_id` column, exact or sampled by key cardinality.
    * `maxExactKeys` marks where the histogram frame stops being a
    * bounded exchange (default 64 K distinct keys ≈ a few MB of
    * (key, count) pairs — comfortably broadcastable).
    *
    * Callers must coalesce NULL keys first (q94 coalesces text before
    * tokenizing): the two arms cannot treat them identically — the
    * exact arm's equi-join DROPS a null-keyed row while the sampled
    * arm's comparison chain sends it to shard 0 — so null keys would
    * make the arm choice observable.
    */
  def assign(v: DataFrame, key: String, idCol: String, r: Long,
      maxExactKeys: Long = 1L << 16, targetSample: Int = 4096): DataFrame = {
    val nKeys = v.agg(approx_count_distinct(col(key))).head().getLong(0)
    if (nKeys <= maxExactKeys)
      v.join(broadcast(exactShards(v, key, r)), key)
    else {
      val bounds = sampledBoundaries(v, key, idCol, r.toInt, targetSample)
      v.withColumn("shard_id", shardOf(col(key), bounds))
    }
  }
}
