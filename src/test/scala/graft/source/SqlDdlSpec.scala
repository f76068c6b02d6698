package graft.source

import graft.SparkSpec
import graft.bson._
import graft.files.BsonFiles

import java.nio.file.Files

/** SQL-catalog DDL surface (Hive `CREATE TABLE ... STORED BY
  * MongoStorageHandler` parity, hive/.../MongoStorageHandler.java:59-128):
  * `CREATE TABLE ... USING graftbson OPTIONS (path ...)` registers the
  * connector in the session catalog, and the whole query surface —
  * pushdown, option-level queries, writes — works through `spark.sql`.
  * Re-runs the HiveQueryTest goldens (979/195/0) through catalog tables.
  */
class SqlDdlSpec extends SparkSpec {

  private def writeHiveFixture(): String = {
    val dir = Files.createTempDirectory("graft-ddl").toString
    val docs = (0 until 1000).map(i => BDoc(
      "_id" -> BInt32(i), "i" -> BInt32(i), "j" -> BInt32(i % 5)))
    BsonFiles.write(s"$dir/data.bson", docs.iterator)
    dir
  }

  private def withTable(name: String)(body: => Unit): Unit =
    try body finally spark.sql(s"DROP TABLE IF EXISTS $name")

  test("HiveQueryTest goldens 979/195/0 through CREATE TABLE + spark.sql") {
    val dir = writeHiveFixture()
    withTable("hive_docs") {
      spark.sql(s"CREATE TABLE hive_docs USING graftbson OPTIONS (path '$dir')")
      assert(spark.sql("SELECT count(*) FROM hive_docs WHERE i > 20")
        .head.getLong(0) === 979L)
      assert(spark.sql("SELECT count(*) FROM hive_docs WHERE i > 20 AND i < 10")
        .head.getLong(0) === 0L)
    }
    withTable("hive_docs_q") {
      // option-level table query AND-composes with SQL predicates, the
      // mongo.input.query table-property analog
      spark.sql(s"""CREATE TABLE hive_docs_q USING graftbson
        OPTIONS (path '$dir', query '{"j": 0}')""")
      assert(spark.sql("SELECT count(*) FROM hive_docs_q WHERE i > 20")
        .head.getLong(0) === 195L)
    }
  }

  test("SQL predicates reach the source as pushed queries") {
    val dir = writeHiveFixture()
    withTable("push_docs") {
      spark.sql(s"CREATE TABLE push_docs USING graftbson OPTIONS (path '$dir')")
      val df = spark.sql("SELECT i FROM push_docs WHERE i > 990")
      val scan = df.queryExecution.executedPlan.collectLeaves()
        .map(_.toString).mkString
      assert(scan.contains("PushedQuery:") && scan.contains("Gt(i,BInt32(990))"),
        s"scan was: $scan")
      assert(df.count() === 9L)
    }
  }

  test("INSERT INTO a catalog table writes through the connector") {
    val dir = writeHiveFixture()
    withTable("ins_docs") {
      spark.sql(s"CREATE TABLE ins_docs USING graftbson OPTIONS (path '$dir')")
      spark.sql("INSERT INTO ins_docs VALUES (1000, 1000, 0), (1001, 1001, 1)")
      assert(spark.sql("SELECT count(*) FROM ins_docs").head.getLong(0) === 1002L)
      assert(spark.sql("SELECT i FROM ins_docs WHERE _id = 1001")
        .head.getInt(0) === 1001)
    }
  }

  test("aggregate pushdown works through the catalog table") {
    val dir = writeHiveFixture()
    withTable("agg_docs") {
      spark.sql(s"CREATE TABLE agg_docs USING graftbson OPTIONS (path '$dir')")
      val df = spark.sql("SELECT count(*), min(i), max(i) FROM agg_docs")
      assert(df.queryExecution.executedPlan.toString
        .contains("PushedAggregates: [COUNT(*), MIN(i), MAX(i)]"))
      val r = df.head
      assert((r.getLong(0), r.getInt(1), r.getInt(2)) === ((1000L, 0, 999)))
    }
  }
}
