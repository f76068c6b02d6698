package graft

import graft.operators.Catalog

/** Every catalog query must execute at sf0.001 and produce a stable schema.
  * (Value-level correctness is the DuckDB oracle's job — tools/check.py /
  * the driver's t2 gate; this guards against regressions that crash.)
  */
class CatalogSmokeSpec extends SparkSpec {

  for (q <- Catalog.all) {
    test(s"${q.name} executes at sf0.001") {
      val df = q.run(spark, sf0001)
      val n = df.count()
      assert(n >= 0)
      assert(df.columns.nonEmpty)
      assert(df.columns.distinct.length == df.columns.length,
        s"duplicate column names in ${q.name}: ${df.columns.mkString(",")}")
    }
  }

  test("every query with an oracle has matching sorted column names in SQL") {
    // cheap structural guard: oracle text mentions each output column name
    for (q <- Catalog.all; o <- q.oracle) {
      val df = q.run(spark, sf0001)
      val missing = df.columns.filterNot(c => o.contains(c))
      assert(missing.isEmpty,
        s"${q.name}: oracle SQL never mentions columns ${missing.mkString(",")}")
    }
  }
}
