package graft.source

import graft.SparkSpec
import graft.bson._
import graft.files.BsonFiles
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Provenance metadata columns (SupportsMetadataColumns): `_file` on the
  * file source (the dump file a row decoded from) and `_ns` on the
  * server source (the namespace a row's cursor read from). Pins:
  * selection by name, per-partition constants correct across a
  * multi-file / multi-namespace scan, filters on the metadata column
  * stay residual but evaluate correctly above the scan, and a data
  * column of the same name shadows the metadata (Spark's rule).
  */
class MetadataColumnsSpec extends SparkSpec {

  private def freshDir(): String =
    Files.createTempDirectory("graft-meta").toString

  test("_file names the source dump of every row; filters on it stay residual") {
    import spark.implicits._
    val dir = freshDir()
    BsonFiles.write(s"$dir/even.bson",
      (0L until 20L by 2).iterator.map(k => BDoc("_id" -> BInt64(k))))
    BsonFiles.write(s"$dir/odd.bson",
      (1L until 20L by 2).iterator.map(k => BDoc("_id" -> BInt64(k))))
    val df = spark.read.format("graftbson").schema("_id LONG").load(dir)
      .select($"_id", col("_file"))
    val got = df.collect()
      .map(r => (r.getLong(0), r.getString(1).split('/').last))
    assert(got.length == 20)
    assert(got.forall { case (k, f) =>
      f == (if (k % 2 == 0) "even.bson" else "odd.bson") }, got.mkString(", "))

    // a _file predicate is residual (never a document query) and exact
    val onlyEven = spark.read.format("graftbson").schema("_id LONG").load(dir)
      .select($"_id", col("_file"))
      .filter(col("_file").endsWith("even.bson"))
    val plan = onlyEven.queryExecution.executedPlan.toString
    assert(!plan.contains("PushedQuery: And") && !plan.contains("_file\":"),
      s"_file must not reach the document query:\n$plan")
    assert(onlyEven.collect().map(_.getLong(0)).sorted.toSeq ==
      (0L until 20L by 2).toSeq)

    // grouped provenance report — the lineage query a landing zone runs
    val report = spark.read.format("graftbson").schema("_id LONG").load(dir)
      .groupBy(col("_file")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0).split('/').last, r.getLong(1)))
      .sortBy(_._1).toSeq
    assert(report == Seq(("even.bson", 10L), ("odd.bson", 10L)))
  }

  test("a DATA column named _file shadows the metadata column") {
    import spark.implicits._
    val dir = freshDir()
    BsonFiles.write(s"$dir/d.bson", Iterator(
      BDoc("_id" -> BInt64(1L), "_file" -> BString("stored-value"))))
    val df = spark.read.format("graftbson")
      .schema("_id LONG, _file STRING").load(dir)
      .select($"_id", $"_file")
    assert(df.collect().head.getString(1) == "stored-value")
  }

  test("_ns names the source namespace across a multi-namespace union") {
    import spark.implicits._
    val dir = freshDir()
    def seed(ns: String, keys: Range): Unit =
      keys.map(k => (k.toLong, ns)).toDF("_id", "tag")
        .write.format("graftserver")
        .options(Map("server_dir" -> dir, "ns" -> ns))
        .option("id_column", "_id").mode("append").save()
    seed("db.a", 0 until 6)
    seed("db.b", 100 until 104)
    val df = spark.read.format("graftserver")
      .options(Map("server_dir" -> dir, "ns" -> "db.a,db.b"))
      .schema("_id LONG, tag STRING").load()
      .select($"_id", col("_ns"))
    val got = df.collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.length == 10)
    assert(got.forall { case (k, ns) =>
      ns == (if (k < 100) "db.a" else "db.b") }, got.mkString(", "))
    val counts = df.groupBy(col("_ns")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(counts == Seq(("db.a", 6L), ("db.b", 4L)))
  }
}
