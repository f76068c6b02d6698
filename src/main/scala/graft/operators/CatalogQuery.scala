package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** One verifiable operator: a Spark program plus (when SQL-expressible) an
  * equivalent DuckDB oracle query over the same parquet tables. The driver
  * hash-compares values after sorting columns by name, so BOTH sides must
  * agree on column names, types, and row order.
  */
final case class CatalogQuery(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")

/** Exact-arithmetic helpers so double aggregates hash-match the DuckDB
  * oracle bit-for-bit: doubles are summed through DECIMAL (exact, order-
  * independent in both engines) and only converted back to double at the
  * end; averages divide the exact decimal sum as a double by the count.
  */
object Exact {
  private val D = DecimalType(15, 4)
  import org.apache.spark.sql.graft.Bridge
  import org.apache.spark.sql.catalyst.expressions.{MakeDecimal, UnscaledValue}

  /** Operand cast: double -> exact decimal(15,4). */
  def dec(c: Column): Column = c.cast(D)

  /** Unscaled view of a decimal column (value * 10^scale as long). */
  private def unscaled(c: Column): Column =
    Bridge.column(UnscaledValue(Bridge.expression(c)))

  /** Exact decimal of an already-summed unscaled long at `scale`. */
  private def rescale(c: Column, scale: Int): Column =
    Bridge.column(MakeDecimal(Bridge.expression(c), 38, scale,
      nullOnOverflow = false))

  /** Order-independent exact sum of a double column, returned as double.
    *
    * Implemented as a LONG sum over the decimal's unscaled value + one
    * MakeDecimal at the end — the same rewrite Spark's DecimalAggregates
    * rule applies for precision <= 8, extended here to decimal(15,4):
    * a decimal(25,4) accumulator leaves the compact-long representation
    * and pays BigDecimal per row, which dominated every Exact-helper
    * aggregate in profiles. Values are bit-identical (the final
    * decimal -> double conversion is the single correctly-rounded step;
    * the DuckDB mirror converts through the decimal's exact digit string
    * because DuckDB's direct DECIMAL->DOUBLE cast double-rounds — it
    * converts the int128 unscaled value to double FIRST and divides by
    * 10^scale after, so any unscaled sum past 2^53 can land one ULP off.
    * Caught by the round-7 self-gate at sf0.1: q01's scale-8 disc-price
    * sum (unscaled 2.7e17) came back 2706323975.3560996 from DuckDB vs
    * the correctly-rounded 2706323975.3561, while an exact HUGEINT
    * recomputation sided with Spark). Range: exact while
    * a group's sum stays under 2^63 / 10^4 ~ 9.2e14 in value units —
    * beyond any TPC-H scale's per-group sums; callers with wider groups
    * should use [[dsumWide]].
    */
  def dsum(c: Column): Column = rescale(sum(unscaled(dec(c))), 4).cast(DoubleType)

  /** The decimal-accumulator sum for value ranges beyond [[dsum]]'s. */
  def dsumWide(c: Column): Column = sum(dec(c)).cast(DoubleType)

  /** Exact average: decimal sum as double, IEEE-divided by count. */
  def davg(c: Column): Column = dsum(c) / count(c)

  /** Exact sum of `price * (1 - discount)` (the TPC-H disc-price shape).
    * The per-ROW product is two long ops — UnscaledValue(dec(p)) *
    * (10^4 - UnscaledValue(dec(d))) is the scale-8 unscaled product,
    * bounded by ~10^13 per row — instead of a precision-32 BigDecimal
    * multiply; the SUM accumulates as decimal(38,8), because a long
    * accumulator at scale 8 wraps silently once a group's sum passes
    * 2^63/10^8 ~ 9.2e10 value units (TPC-H Q1 groups cross that around
    * SF 3). Bit-identical in both engines at any scale, with the oracle
    * converting via the digit string for the same reason as [[dsumSql]]
    * (scale-8 sums pass 2^53 unscaled around sf0.1 already).
    */
  def dsumDiscPrice(p: Column, d: Column): Column =
    sum(rescale(unscaled(dec(p)) * (lit(10000L) - unscaled(dec(d))), 8))
      .cast(DoubleType)

  /** DuckDB mirror of `dec`. */
  def decSql(e: String): String = s"CAST($e AS DECIMAL(15,4))"

  /** DuckDB mirror of `dsum`. */
  def dsumSql(e: String): String =
    s"CAST(CAST(sum(${decSql(e)}) AS VARCHAR) AS DOUBLE)"

  /** DuckDB mirror of `davg`. */
  def davgSql(e: String): String = s"(${dsumSql(e)} / count($e))"
}
