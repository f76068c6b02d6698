package graft.server
import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files
class AliasLegProbe extends SparkSpec {
  test("probe: alias inside leg") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-probe").toString
    Seq((1L, 10L), (2L, 20L)).toDF("_id", "custkey")
      .write.format("graftserver")
      .options(Map("server_dir" -> dir, "ns" -> "db.o"))
      .option("id_column", "_id").mode("append").save()
    Seq((10L, "a"), (20L, "b")).toDF("_id", "name")
      .write.format("graftserver")
      .options(Map("server_dir" -> dir, "ns" -> "db.c"))
      .option("id_column", "_id").mode("append").save()
    val oo = spark.read.format("graftserver")
      .options(Map("server_dir" -> dir, "ns" -> "db.o", "assume_uniform_storage" -> "true"))
      .schema("_id LONG, custkey LONG").load()
      .select($"_id".as("okey"), $"custkey")
    val cc = spark.read.format("graftserver")
      .options(Map("server_dir" -> dir, "ns" -> "db.c", "assume_uniform_storage" -> "true"))
      .schema("_id LONG, name STRING").load()
    val q = oo.join(cc, $"custkey" === cc("_id")).select($"okey", $"name")
    println("=== PROBE PLAN ===")
    println(q.queryExecution.executedPlan.toString)
  }
}
