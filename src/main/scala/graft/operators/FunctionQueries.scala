package graft.operators

import graft.Tables
import org.apache.spark.sql.functions._

/** Broad scalar/aggregate function parity — the function surface a
  * reference user gets from Hive/Pig built-ins, exercised against the
  * oracle. Functions are restricted to ones with bit-identical semantics
  * in both engines (e.g. sqrt IS IEEE-correctly-rounded; exp/ln are
  * libm-dependent and excluded; round has different tie rules and is
  * excluded).
  */
object FunctionQueries {

  val all: Seq[CatalogQuery] = Seq(

    CatalogQuery(
      "q40_string_funcs",
      (s, d) => {
        import s.implicits._
        Tables.customer(s, d)
          .filter($"c_custkey" % 50 === 0)
          .select(
            $"c_custkey",
            upper($"c_name").as("up"),
            lower($"c_mktsegment").as("lo"),
            substring($"c_name", 1, 8).as("sub"),
            lpad($"c_name", 22, "*").as("lp"),
            rpad($"c_mktsegment", 12, ".").as("rp"),
            regexp_replace($"c_name", "[0-9]+", "#").as("repl"),
            reverse($"c_mktsegment").as("rev"),
            concat_ws("|", $"c_mktsegment", $"c_name").as("cw"),
            length($"c_name").cast("long").as("len"),
            $"c_name".startsWith("Customer").as("sw"),
            // coalesce inside concat: Spark concat NULL-propagates while
            // DuckDB's skips NULL args — the portable spelling pins the
            // NULL segment to '' in BOTH engines (all-tables NULL twin)
            ltrim(rtrim(concat(lit("  "), coalesce($"c_mktsegment", lit("")),
              lit("  ")))).as("trimmed"))
          .orderBy($"c_custkey")
      },
      Some("""
        |SELECT c_custkey,
        |  upper(c_name) AS up,
        |  lower(c_mktsegment) AS lo,
        |  substr(c_name, 1, 8) AS sub,
        |  lpad(c_name, 22, '*') AS lp,
        |  rpad(c_mktsegment, 12, '.') AS rp,
        |  regexp_replace(c_name, '[0-9]+', '#', 'g') AS repl,
        |  reverse(c_mktsegment) AS rev,
        |  concat_ws('|', c_mktsegment, c_name) AS cw,
        |  CAST(length(c_name) AS BIGINT) AS len,
        |  starts_with(c_name, 'Customer') AS sw,
        |  ltrim(rtrim(concat('  ', coalesce(c_mktsegment, ''), '  '))) AS trimmed
        |FROM customer WHERE c_custkey % 50 = 0
        |ORDER BY c_custkey
        |""".stripMargin)),

    CatalogQuery(
      "q41_date_funcs",
      (s, d) => {
        import s.implicits._
        Tables.orders(s, d)
          .filter($"o_orderkey" % 500 === 0)
          .select(
            $"o_orderkey",
            year($"o_orderdate").as("y"),
            month($"o_orderdate").as("m"),
            dayofmonth($"o_orderdate").as("dom"),
            quarter($"o_orderdate").as("q"),
            hour($"o_orderdate").as("h"),
            date_trunc("month", $"o_orderdate").as("mon_start"),
            date_trunc("day", $"o_orderdate").as("day_start"),
            $"o_orderdate".cast("date").as("dt"),
            unix_timestamp($"o_orderdate").as("epoch_s"))
          .orderBy($"o_orderkey")
      },
      Some("""
        |SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INT) AS y,
        |  CAST(month(o_orderdate) AS INT) AS m,
        |  CAST(day(o_orderdate) AS INT) AS dom,
        |  CAST(quarter(o_orderdate) AS INT) AS q,
        |  CAST(hour(o_orderdate) AS INT) AS h,
        |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mon_start,
        |  CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day_start,
        |  CAST(o_orderdate AS DATE) AS dt,
        |  CAST(floor(epoch(o_orderdate)) AS BIGINT) AS epoch_s
        |FROM orders WHERE o_orderkey % 500 = 0
        |ORDER BY o_orderkey
        |""".stripMargin)),

    CatalogQuery(
      "q42_numeric_funcs",
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d)
          .filter($"l_orderkey" % 500 === 0)
          .select(
            $"l_orderkey", $"l_linenumber",
            abs($"l_discount" - 0.05).as("ab"),
            ceil($"l_quantity" / 7.0).cast("long").as("ce"),
            floor($"l_extendedprice" / 1000.0).cast("long").as("fl"),
            ($"l_orderkey" % 7).as("md"),
            sqrt($"l_quantity").as("sq"),
            greatest($"l_tax", $"l_discount").as("gr"),
            least($"l_tax", $"l_discount").as("le"),
            signum($"l_discount" - 0.05).as("sg"),
            pow($"l_quantity", 2.0).as("p2"))
          .orderBy($"l_orderkey", $"l_linenumber")
      },
      Some("""
        |SELECT l_orderkey, l_linenumber,
        |  abs(l_discount - 0.05) AS ab,
        |  CAST(ceil(l_quantity / 7.0) AS BIGINT) AS ce,
        |  CAST(floor(l_extendedprice / 1000.0) AS BIGINT) AS fl,
        |  l_orderkey % 7 AS md,
        |  sqrt(l_quantity) AS sq,
        |  greatest(l_tax, l_discount) AS gr,
        |  least(l_tax, l_discount) AS le,
        |  CAST(sign(l_discount - 0.05) AS DOUBLE) AS sg,
        |  pow(l_quantity, 2.0) AS p2
        |FROM lineitem WHERE l_orderkey % 500 = 0
        |ORDER BY l_orderkey, l_linenumber
        |""".stripMargin)),

    CatalogQuery(
      "q43_agg_funcs",
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d)
          .groupBy($"l_returnflag")
          .agg(
            countDistinct($"l_suppkey").as("n_supp"),
            min($"l_quantity").as("min_q"),
            max($"l_quantity").as("max_q"),
            min($"l_shipdate").as("first_ship"),
            max($"l_shipdate").as("last_ship"),
            sum(when($"l_discount" > 0.05, 1).otherwise(0)).cast("long").as("n_disc"),
            bool_and($"l_quantity" > 0).as("all_pos"),
            bool_or($"l_discount" > 0.09).as("any_big_disc"))
          .orderBy($"l_returnflag")
      },
      Some("""
        |SELECT l_returnflag,
        |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supp,
        |  min(l_quantity) AS min_q,
        |  max(l_quantity) AS max_q,
        |  min(l_shipdate) AS first_ship,
        |  max(l_shipdate) AS last_ship,
        |  CAST(sum(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS n_disc,
        |  bool_and(l_quantity > 0) AS all_pos,
        |  bool_or(l_discount > 0.09) AS any_big_disc
        |FROM lineitem GROUP BY 1 ORDER BY 1
        |""".stripMargin))
  )
}
