package graft
import org.apache.spark.sql.SparkSession
import graft.operators.Catalog
/** Ad-hoc per-query profiler: times N noop-sink runs at a given SF dir. */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftConf.tuned(SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warmup
    Tables.lineitem(spark, sfDir).limit(1000).groupBy("l_returnflag").count().count()
    for (name <- args) {
      val times = (1 to 3).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        Catalog.byName(name).run(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROF $name%-26s ${times.map(t => f"$t%.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
