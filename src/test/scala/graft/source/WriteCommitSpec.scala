package graft.source

import graft.SparkSpec
import graft.bson._
import graft.query.{BQuery, UpdateModel}
import graft.store.BsonCollection

import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.catalyst.InternalRow

import java.nio.file.{Files, Paths}

/** Cluster-realism of the write path: task attempt files must live on the
  * SHARED collection path (never executor-local java.io.tmpdir), be
  * promoted to durable segments only by task-side commit, and the driver
  * commit must fail fast — not silently write partial data — when a
  * committed segment is missing.
  */
class WriteCommitSpec extends SparkSpec {

  private def freshDir(): String =
    Files.createTempDirectory("graft-wc").toString

  private val schema = StructType(Seq(
    StructField("_id", LongType), StructField("v", LongType)))

  test("task attempt file lives under the collection dir; commit promotes it") {
    val dir = freshDir()
    val jobDir = Paths.get(dir, ".graft-pending", "q-test-1").toString
    val w = new GraftDataWriter(3, 7L, schema, Map("path" -> dir), jobDir)
    w.write(InternalRow(1L, 10L))
    w.write(InternalRow(2L, 20L))
    // before task commit: only an uncommitted _tmp- attempt file, in jobDir
    val before = Files.list(Paths.get(jobDir)).iterator()
    var sawTmp = false
    while (before.hasNext) {
      val f = before.next().getFileName.toString
      if (f.startsWith("_tmp-")) sawTmp = true
    }
    assert(sawTmp, "attempt file must be under the collection's job dir")
    val msg = w.commit().asInstanceOf[GraftCommitMessage]
    assert(msg.n === 2)
    assert(msg.segment.startsWith(jobDir),
      "committed segment must be inside the shared job dir")
    assert(Files.exists(Paths.get(msg.segment)))
    assert(!Files.exists(Paths.get(jobDir, "_tmp-seg-p3-t7.bson")),
      "attempt file must be renamed away by task commit")
  }

  test("aborted task leaves no segment behind") {
    val dir = freshDir()
    val jobDir = Paths.get(dir, ".graft-pending", "q-test-2").toString
    val w = new GraftDataWriter(0, 1L, schema, Map("path" -> dir), jobDir)
    w.write(InternalRow(1L, 10L))
    w.abort()
    val left = Files.list(Paths.get(jobDir)).count()
    assert(left === 0, "abort must delete the attempt file and side file")
  }

  test("driver commit fails fast when a committed segment is missing") {
    val dir = freshDir()
    val bw = new GraftBatchWrite(schema, "q-test-3", Map("path" -> dir), false)
    val missing = GraftCommitMessage(0, s"$dir/.graft-pending/q-test-3/seg-p0-t0.bson", 1)
    val e = intercept[IllegalStateException] {
      bw.commit(Array(missing))
    }
    assert(e.getMessage.contains("missing"))
  }

  test("multi-partition write: all rows commit, pending dir is cleaned up") {
    import spark.implicits._
    val dir = freshDir()
    (1L to 1000L).map(i => (i, i * 10)).toDF("_id", "v")
      .repartition(8)
      .write.format("graftbson").mode("append").save(dir)
    val back = spark.read.format("graftbson").load(dir)
    assert(back.count() === 1000)
    assert(back.agg(org.apache.spark.sql.functions.sum("v")).head.getLong(0)
      === (1L to 1000L).map(_ * 10).sum)
    assert(!Files.exists(Paths.get(dir, ".graft-pending")) ||
      Files.list(Paths.get(dir, ".graft-pending")).count() === 0,
      "job pending dir must be removed after driver commit")
    // pending dir (even if an empty shell remains) must be invisible to scans
    assert(GraftBsonSource.dataFiles(dir) === Seq(s"$dir/data.bson"))
  }

  test("update-heavy bulk: 20k _id point updates route through the index") {
    val dir = freshDir()
    val coll = new BsonCollection(dir)
    val docs = (0 until 20000).map(i =>
      coll.InsertOne(BDoc("_id" -> BInt32(i), "v" -> BInt64(0L))): coll.WriteModel)
    coll.bulkWrite(docs.iterator)
    val t0 = System.nanoTime()
    val updates = (0 until 20000).map(i =>
      coll.UpdateOp(UpdateModel(BQuery.Eq("_id", BInt32(i)),
        BDoc("$inc" -> BDoc("v" -> BInt64(i.toLong))))): coll.WriteModel)
    val res = coll.bulkWrite(updates.iterator)
    val sec = (System.nanoTime() - t0) / 1e9
    assert(res.matched === 20000 && res.modified === 19999) // _id=0: inc by 0
    assert(sec < 15.0,
      s"20k point updates took ${sec}s — the O(docs x models) scan path is back")
    // spot-check values
    val m = coll.readAll().map(d => d.get("_id").get -> d.get("v").get).toMap
    assert(m(BInt32(12345)) === BInt64(12345L))
  }

  test("_id fast path matches cross-width numeric ids like the scan path") {
    val dir = freshDir()
    val coll = new BsonCollection(dir)
    coll.bulkWrite(Iterator(
      coll.InsertOne(BDoc("_id" -> BInt64(5L), "v" -> BInt32(1))),
      coll.InsertOne(BDoc("_id" -> BString("s"), "v" -> BInt32(2)))))
    // query with BInt32(5) must still find the BInt64(5) doc (BSON numeric
    // equality is cross-width)
    val res = coll.bulkWrite(Iterator(
      coll.UpdateOp(UpdateModel(BQuery.Eq("_id", BInt32(5)),
        BDoc("$set" -> BDoc("v" -> BInt32(42)))))))
    assert(res.matched === 1)
    val m = coll.readAll().map(d => d.get("_id").get -> d.get("v").get).toMap
    assert(m(BInt64(5L)) === BInt32(42))
  }

  test("planned key-range partitions surface preferredLocations to Spark") {
    val chunks = Seq(
      Planners.Chunk(None, Some(BInt32(100)), "shard-a"),
      Planners.Chunk(Some(BInt32(100)), None, "shard-b"))
    val hosts = Map("shard-a" -> Seq("host1", "host2"), "shard-b" -> Seq("host3"))
    val planned = Planners.plan(null, "_id", "chunks",
      chunks = chunks, shardHosts = hosts)
    val parts = planned.map { case (q, locs) =>
      GraftInputPartition("/dev/null", 0L, Long.MaxValue, q, locations = locs)
    }
    assert(parts.map(_.preferredLocations().toSeq) ===
      Seq(Seq("host1", "host2"), Seq("host3")))
  }
}
