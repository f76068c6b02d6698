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

  /** Operand cast: double -> exact decimal(15,4). */
  def dec(c: Column): Column = c.cast(D)

  /** Order-independent exact sum of a double column, returned as double. */
  def dsum(c: Column): Column = sum(dec(c)).cast(DoubleType)

  /** Exact average: decimal sum as double, IEEE-divided by count. */
  def davg(c: Column): Column = sum(dec(c)).cast(DoubleType) / count(c)

  /** DuckDB mirror of `dec`. */
  def decSql(e: String): String = s"CAST($e AS DECIMAL(15,4))"

  /** DuckDB mirror of `dsum`. */
  def dsumSql(e: String): String = s"CAST(sum(${decSql(e)}) AS DOUBLE)"

  /** DuckDB mirror of `davg`. */
  def davgSql(e: String): String = s"(${dsumSql(e)} / count($e))"
}
