package graft
import org.apache.spark.sql.SparkSession

/** Phase profiler for the server-roundtrip shapes: times the SEED WRITE
  * and the READ QUERY of a q69/q133-style roundtrip separately, so
  * optimization effort lands on the phase that actually dominates
  * (guide §1: measure first). Not part of the driver contract.
  */
object DiagPhase {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftConf.tuned(SparkSession.builder())
      .master("local[32]").appName("DiagPhase")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import org.apache.spark.sql.functions._
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")
    // warmup
    Tables.orders(spark, sf).limit(1000).count()

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"DIAG $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    (1 to 3).foreach { round =>
      println(s"--- round $round ---")
      val dir = java.nio.file.Files.createTempDirectory("graft-diagphase").toString
      val base = Map("server_dir" -> dir, "assume_uniform_storage" -> "true")
      time("write orders (graftserver)") {
        Tables.orders(spark, sf)
          .select($"o_orderkey", $"o_custkey", $"o_totalprice")
          .write.format("graftserver")
          .options(Map("server_dir" -> dir, "ns" -> "db.jorders"))
          .option("id_column", "o_orderkey").mode("append").save()
      }
      time("write orders coalesce(1)") {
        Tables.orders(spark, sf)
          .select($"o_orderkey", $"o_custkey", $"o_totalprice")
          .coalesce(1)
          .write.format("graftserver")
          .options(Map("server_dir" -> dir, "ns" -> "db.jorders1"))
          .option("id_column", "o_orderkey").mode("append").save()
      }
      time("write orders coalesce(4)") {
        Tables.orders(spark, sf)
          .select($"o_orderkey", $"o_custkey", $"o_totalprice")
          .coalesce(4)
          .write.format("graftserver")
          .options(Map("server_dir" -> dir, "ns" -> "db.jorders4"))
          .option("id_column", "o_orderkey").mode("append").save()
      }
      time("write customer (graftserver)") {
        Tables.customer(spark, sf)
          .select($"c_custkey", $"c_mktsegment", $"c_acctbal")
          .write.format("graftserver")
          .options(Map("server_dir" -> dir, "ns" -> "db.jcust"))
          .option("id_column", "c_custkey").mode("append").save()
      }
      time("read: pushed join+agg") {
        val o = spark.read.format("graftserver")
          .options(base ++ Map("ns" -> "db.jorders"))
          .schema("_id LONG, o_custkey LONG, o_totalprice DOUBLE").load()
          .filter($"o_totalprice" > 1000.0)
        val c = spark.read.format("graftserver")
          .options(base ++ Map("ns" -> "db.jcust"))
          .schema("_id LONG, c_mktsegment STRING, c_acctbal DOUBLE").load()
          .filter($"c_acctbal" > 0.0)
        o.join(c, o("o_custkey") === c("_id"))
          .groupBy($"c_mktsegment")
          .agg(count(lit(1)).as("n"))
          .write.format("noop").mode("overwrite").save()
      }
      time("read: plain cursor scan+agg") {
        spark.read.format("graftserver")
          .options(base ++ Map("ns" -> "db.jorders"))
          .option("split_size", (2L * 1024 * 1024).toString)
          .schema("_id LONG, o_custkey LONG, o_totalprice DOUBLE").load()
          .filter($"o_totalprice" > 1000.0)
          .groupBy($"o_custkey" % 16).agg(count(lit(1)))
          .write.format("noop").mode("overwrite").save()
      }
      // write path split: Row->BDoc->bytes vs everything else, measured
      // directly on the codec over the same rows
      val rows = Tables.orders(spark, sf)
        .select($"o_orderkey", $"o_custkey", $"o_totalprice").collect()
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("o_orderkey", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("o_custkey", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("o_totalprice", org.apache.spark.sql.types.DoubleType)))
      val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
      val ser = org.apache.spark.sql.catalyst.encoders.ExpressionEncoder(enc).createSerializer()
      val internal = rows.map(r => ser(r).copy())
      time(s"codec: toBson+encode x${internal.length}") {
        var bytes = 0L
        internal.foreach { ir =>
          val d = graft.bson.RowCodec.toBson(ir, schema)
          bytes += graft.bson.BsonCodec.encode(d).length
        }
        bytes
      }
    }
    spark.stop()
  }
}
