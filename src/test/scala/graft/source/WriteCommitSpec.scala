package graft.source

import graft.SparkSpec
import graft.bson._
import graft.query.{BQuery, UpdateModel}
import graft.store.BsonCollection

import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.catalyst.InternalRow

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

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
    val w = new GraftDataWriter(3, 7L, schema, Map("path" -> dir), jobDir, 1)
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
    val seg = msg.routed(0)
    assert(seg.startsWith(jobDir),
      "committed segment must be inside the shared job dir")
    assert(Files.exists(Paths.get(seg)))
    assert(!Files.exists(Paths.get(jobDir, "_tmp-seg-p3-t7-s00000.bson")),
      "attempt file must be renamed away by task commit")
  }

  test("aborted task leaves no segment behind") {
    val dir = freshDir()
    val jobDir = Paths.get(dir, ".graft-pending", "q-test-2").toString
    val w = new GraftDataWriter(0, 1L, schema, Map("path" -> dir), jobDir, 1)
    w.write(InternalRow(1L, 10L))
    w.abort()
    val left = Files.list(Paths.get(jobDir)).count()
    assert(left === 0, "abort must delete the attempt file and side file")
  }

  test("driver commit fails fast when a committed segment is missing") {
    val dir = freshDir()
    val bw = new GraftBatchWrite(schema, "q-test-3", Map("path" -> dir), false)
    val missing = GraftCommitMessage(0,
      Map(0 -> s"$dir/.graft-pending/q-test-3/seg-p0-t0-s00000.bson"), None, 1)
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

  test("sharded multi-partition write: apply is per-shard, driver holds no docs") {
    import spark.implicits._
    val dir = freshDir()
    (1L to 2000L).map(i => (i, i * 10)).toDF("_id", "v")
      .repartition(8)
      .write.format("graftbson").mode("append").option("shards", "4").save(dir)
    // layout: 4 shard files + meta, NO monolithic data.bson
    val coll = new BsonCollection(dir)
    assert(coll.shardCount === 4)
    assert(!Files.exists(Paths.get(dir, "data.bson")))
    val sizes = coll.shardPaths.map(p => graft.files.BsonFiles.readAll(p.toString).size)
    assert(sizes.sum === 2000)
    assert(sizes.forall(_ > 0), s"routing should spread ids, got $sizes")
    val back = spark.read.format("graftbson").load(dir)
    assert(back.count() === 2000)

    // keyed $inc update through the DSv2 write path: inherits the declared
    // shard layout, routes each model to its owning shard
    (1L to 2000L).map(i => (i, i)).toDF("_id", "v")
      .repartition(8)
      .write.format("graftbson").mode("append")
      .option("mode", "update").option("update_op", "inc").save(dir)
    val m = coll.readAll().map(d => d.get("_id").get -> d.get("v").get).toMap
    assert(m(BInt64(7L)) === BInt64(77L))
    assert(m(BInt64(2000L)) === BInt64(22000L))
    assert(!Files.exists(Paths.get(dir, ".graft-pending")) ||
      Files.list(Paths.get(dir, ".graft-pending")).count() === 0)
  }

  test("cross-width numeric ids route to the same shard") {
    import graft.store.ShardRouting
    for (s <- Seq(2, 4, 7, 32)) {
      assert(ShardRouting.idShard(BInt32(5), s) === ShardRouting.idShard(BInt64(5L), s))
      assert(ShardRouting.idShard(BInt64(5L), s) === ShardRouting.idShard(BDouble(5.0), s))
    }
  }

  test("multi-update without _id broadcasts to every shard; updateOne throws") {
    val dir = freshDir()
    val coll = new BsonCollection(dir)
    coll.create(4)
    coll.bulkWrite((1 to 100).iterator.map(i =>
      coll.InsertOne(BDoc("_id" -> BInt32(i), "x" -> BInt32(i % 10)))))
    // broadcast multi-update: matches docs in every shard
    val res = coll.bulkWrite(Iterator(
      coll.UpdateOp(UpdateModel(BQuery.Eq("x", BInt32(3)),
        BDoc("$set" -> BDoc("hit" -> BBool(true))), multi = true))))
    assert(res.matched === 10)
    // updateOne / upsert without a routable _id mirrors the sharded-server
    // restriction: loud failure, not a wrong-shard guess
    val e = intercept[IllegalArgumentException] {
      coll.bulkWrite(Iterator(
        coll.UpdateOp(UpdateModel(BQuery.Eq("x", BInt32(3)),
          BDoc("$set" -> BDoc("y" -> BInt32(1)))))))
    }
    assert(e.getMessage.contains("_id equality"))
  }

  test("ordered insert + broadcast multi-update interleave in write order") {
    import spark.implicits._
    val dir = freshDir()
    // seed sharded collection
    (1L to 100L).map(i => (i, 0L)).toDF("_id", "v")
      .write.format("graftbson").mode("append").option("shards", "3").save(dir)
    // one partition emits: multi $set v=1 (broadcast) THEN inserts 101..110
    // (routed). The late inserts must NOT see the earlier broadcast update.
    val coll = new BsonCollection(dir)
    coll.bulkWrite(Iterator[graft.store.WriteModel](
      graft.store.UpdateOp(UpdateModel(BQuery.Gte("_id", BInt64(1L)),
        BDoc("$set" -> BDoc("v" -> BInt64(1L))), multi = true)) ) ++
      (101L to 110L).iterator.map(i =>
        graft.store.InsertOne(BDoc("_id" -> BInt64(i), "v" -> BInt64(0L)))))
    val m = coll.readAll().map(d => d.get("_id").get -> d.get("v").get).toMap
    assert(m(BInt64(50L)) === BInt64(1L))
    assert(m(BInt64(105L)) === BInt64(0L),
      "insert after the multi-update must keep its own value")
  }

  test("DSv2 broadcast update: multi on non-_id key reaches every shard") {
    import spark.implicits._
    val dir = freshDir()
    (1L to 300L).map(i => (i, i % 7, 0L)).toDF("_id", "grp", "v")
      .repartition(4)
      .write.format("graftbson").mode("append").option("shards", "3").save(dir)
    // multi-update keyed on grp (not _id): writer emits broadcast models,
    // every shard's apply task replays them against its own docs
    Seq((3L, 1L)).toDF("grp", "v")
      .write.format("graftbson").mode("append")
      .option("mode", "update").option("keys", "grp")
      .option("multi", "true").save(dir)
    val coll = new BsonCollection(dir)
    val updated = coll.readAll()
      .filter(_.get("grp").contains(BInt64(3L)))
      .map(_.get("v").get).toSeq
    assert(updated.nonEmpty && updated.forall(_ === BInt64(1L)))
    val untouched = coll.readAll()
      .filter(_.get("grp").contains(BInt64(4L)))
      .map(_.get("v").get).toSeq
    assert(untouched.forall(_ === BInt64(0L)))
  }

  test("shard apply is staged: a retried attempt never double-applies $inc") {
    import graft.store.{ShardApply, ShardTask, BsonCollection => BC}
    val dir = freshDir()
    val coll = new BsonCollection(dir)
    coll.bulkWrite((1 to 10).iterator.map(i =>
      coll.InsertOne(BDoc("_id" -> BInt32(i), "v" -> BInt64(100L)))))
    // a committed segment of $inc models
    val jobDir = Paths.get(dir, ".graft-pending", "q-retry").toString
    Files.createDirectories(Paths.get(jobDir))
    val seg = s"$jobDir/seg-p0-t0-s00000.bson"
    graft.files.BsonFiles.write(seg, (1 to 10).iterator.map(i => BDoc(
      "__op" -> BString("update"),
      "q" -> BDoc("_id" -> BInt32(i)),
      "u" -> BDoc("$inc" -> BDoc("v" -> BInt64(1L))),
      "upsert" -> BBool(false), "multi" -> BBool(false),
      "__seq" -> BInt64(i.toLong))))
    val task = ShardTask(coll.shardPath(0).toString, 0, Seq(0 -> seg), Nil, true)
    // first attempt stages; a RETRY stages again from the SAME base
    val st1 = ShardApply.runStaged(task, "jobA")
    val st2 = ShardApply.runStaged(task, "jobA")
    // only the winning attempt is promoted
    ShardApply.promote(st2)
    ShardApply.cleanupStages(dir, "jobA")
    val m = coll.readAll().map(d => d.get("_id").get -> d.get("v").get).toMap
    assert(m(BInt32(5)) === BInt64(101L),
      "a re-executed apply attempt must not double-apply $inc")
    assert(st1.result.matched === 10 && st2.result.matched === 10)
    // no stage litter left behind
    assert(!Files.list(Paths.get(dir)).iterator().asScala
      .exists(_.getFileName.toString.contains("apply-jobA")))
  }

  test("promote interrupted mid-loop rolls forward to all-or-nothing on next open") {
    import graft.store.{ShardApply, BsonCollection => BC}
    val dir = freshDir()
    val coll = new BsonCollection(dir)
    coll.create(4)
    coll.bulkWrite((1 to 40).iterator.map(i =>
      coll.InsertOne(BDoc("_id" -> BInt32(i), "v" -> BInt64(0L)))))
    // stage a full overwrite of every shard (v -> 1), as a job commit would
    val staged = (0 until 4).map { k =>
      val p = coll.shardPath(k)
      val st = ShardApply.newStagePath(p)
      val models = (1 to 40).iterator
        .filter(i => graft.store.ShardRouting.idShard(BInt32(i), 4) == k)
        .map(i => graft.store.UpdateOp(graft.query.UpdateModel(
          BQuery.Eq("_id", BInt32(i)), graft.bson.BDoc("$set" -> BDoc("v" -> BInt64(1L))),
          upsert = false, multi = false)): graft.store.WriteModel)
      val res = ShardApply.applyToStage(p, st, models, ordered = true, shardTag = k)
      ShardApply.Staged(k, p.toString, st.toString, res)
    }
    // simulate the coordinator crash: manifest written, only shards 0-1
    // renamed, then the process dies before finishing the loop
    ShardApply.writeManifest(dir, staged)
    staged.take(2).foreach(ShardApply.promote)
    assert(Files.exists(Paths.get(dir, ShardApply.PromoteManifest)))
    // next open rolls the remaining renames forward
    val reopened = new BsonCollection(dir)
    assert(!Files.exists(Paths.get(dir, ShardApply.PromoteManifest)),
      "recovery must consume the manifest")
    val vs = reopened.readAll().map(d => d.get("v").get).toVector
    assert(vs.size === 40 && vs.forall(_ === BInt64(1L)),
      s"torn promote must roll forward to the fully-applied state, got $vs")
    // recovery is idempotent: a second open is a no-op
    assert(!ShardApply.recoverPromote(dir))
  }

  test("promoteAll tolerates a concurrent recoverer having finished its renames") {
    import graft.store.ShardApply
    val dir = freshDir()
    val coll = new BsonCollection(dir)
    coll.create(4)
    coll.bulkWrite((1 to 40).iterator.map(i =>
      coll.InsertOne(BDoc("_id" -> BInt32(i), "v" -> BInt64(0L)))))
    val staged = (0 until 4).map { k =>
      val p = coll.shardPath(k)
      val st = ShardApply.newStagePath(p)
      val models = (1 to 40).iterator
        .filter(i => graft.store.ShardRouting.idShard(BInt32(i), 4) == k)
        .map(i => graft.store.UpdateOp(UpdateModel(
          BQuery.Eq("_id", BInt32(i)), BDoc("$set" -> BDoc("v" -> BInt64(1L))),
          upsert = false, multi = false)): graft.store.WriteModel)
      val res = ShardApply.applyToStage(p, st, models, ordered = true, shardTag = k)
      ShardApply.Staged(k, p.toString, st.toString, res)
    }
    // a reader racing the coordinator rolls the whole manifest forward
    // and deletes it before the coordinator's own loop reaches shards
    // 2-3: their stage files are gone. The coordinator's promoteAll must
    // treat "stage missing" as already-promoted, not abort a commit
    // whose data reached the live files.
    staged.drop(2).foreach(ShardApply.promote)
    ShardApply.promoteAll(dir, staged) // must not throw
    assert(!Files.exists(Paths.get(dir, ShardApply.PromoteManifest)))
    val vs = new BsonCollection(dir).readAll().map(_.get("v").get).toVector
    assert(vs.size === 40 && vs.forall(_ === BInt64(1L)))
  }

  test("promoteAll races a concurrent recoverer without losing a commit (stress)") {
    import graft.store.ShardApply
    // the advice scenario: a reader opens the collection mid-promote,
    // recovers the manifest, and deletes it while the coordinator is
    // still inside its rename loop. 20 iterations of a genuinely
    // concurrent recoverer thread; the commit must never throw and the
    // final state must always be fully promoted.
    for (iter <- 1 to 20) {
      val dir = freshDir()
      val coll = new BsonCollection(dir)
      coll.create(8)
      coll.bulkWrite((1 to 80).iterator.map(i =>
        coll.InsertOne(BDoc("_id" -> BInt32(i), "v" -> BInt64(0L)))))
      val staged = (0 until 8).map { k =>
        val p = coll.shardPath(k)
        val st = ShardApply.newStagePath(p)
        val models = (1 to 80).iterator
          .filter(i => graft.store.ShardRouting.idShard(BInt32(i), 8) == k)
          .map(i => graft.store.UpdateOp(UpdateModel(
            BQuery.Eq("_id", BInt32(i)), BDoc("$set" -> BDoc("v" -> BInt64(1L))),
            upsert = false, multi = false)): graft.store.WriteModel)
        val res = ShardApply.applyToStage(p, st, models, ordered = true, shardTag = k)
        ShardApply.Staged(k, p.toString, st.toString, res)
      }
      val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
      val recovererFailed = new java.util.concurrent.atomic.AtomicReference[Throwable]()
      val recoverer = new Thread(() => {
        try while (!stop.get()) ShardApply.recoverPromote(dir)
        catch { case t: Throwable => recovererFailed.set(t) }
      })
      recoverer.start()
      try ShardApply.promoteAll(dir, staged) // must not throw mid-race
      finally { stop.set(true); recoverer.join() }
      assert(recovererFailed.get() === null,
        s"iter $iter: recoverer threw ${recovererFailed.get()}")
      assert(!Files.exists(Paths.get(dir, ShardApply.PromoteManifest)))
      val vs = new BsonCollection(dir).readAll().map(_.get("v").get).toVector
      assert(vs.size === 80 && vs.forall(_ === BInt64(1L)),
        s"iter $iter: torn state after racing promote, got ${vs.count(_ == BInt64(1L))}/80")
    }
  }

  test("glob-path scan also rolls a torn promote forward") {
    import graft.store.ShardApply
    val dir = freshDir()
    val coll = new BsonCollection(dir)
    coll.create(2)
    coll.bulkWrite((1 to 10).iterator.map(i =>
      coll.InsertOne(BDoc("_id" -> BInt32(i), "v" -> BInt64(0L)))))
    val staged = (0 until 2).map { k =>
      val p = coll.shardPath(k)
      val st = ShardApply.newStagePath(p)
      val models = (1 to 10).iterator
        .filter(i => graft.store.ShardRouting.idShard(BInt32(i), 2) == k)
        .map(i => graft.store.UpdateOp(UpdateModel(
          BQuery.Eq("_id", BInt32(i)), BDoc("$set" -> BDoc("v" -> BInt64(1L))),
          upsert = false, multi = false)): graft.store.WriteModel)
      val res = ShardApply.applyToStage(p, st, models, ordered = true, shardTag = k)
      ShardApply.Staged(k, p.toString, st.toString, res)
    }
    // crash: manifest durable, only shard 0 renamed
    ShardApply.writeManifest(dir, staged)
    ShardApply.promote(staged.head)
    val files = GraftBsonSource.dataFiles(s"$dir/shard-*.bson")
    assert(!Files.exists(Paths.get(dir, ShardApply.PromoteManifest)),
      "glob scan must consume the manifest like a directory scan")
    val vs = files.flatMap(f => graft.files.BsonFiles.readAll(f))
      .map(_.get("v").get).toVector
    assert(vs.size === 10 && vs.forall(_ === BInt64(1L)),
      s"glob scan must observe the rolled-forward state, got $vs")
  }

  test("a recoverer that crashed after claiming the manifest leaves a recoverable record") {
    import graft.store.{ShardApply, BsonCollection => _}
    val dir = freshDir()
    val coll = new BsonCollection(dir)
    coll.create(2)
    coll.bulkWrite((1 to 10).iterator.map(i =>
      coll.InsertOne(BDoc("_id" -> BInt32(i), "v" -> BInt64(0L)))))
    val staged = (0 until 2).map { k =>
      val p = coll.shardPath(k)
      val st = ShardApply.newStagePath(p)
      val models = (1 to 10).iterator
        .filter(i => graft.store.ShardRouting.idShard(BInt32(i), 2) == k)
        .map(i => graft.store.UpdateOp(UpdateModel(
          BQuery.Eq("_id", BInt32(i)), BDoc("$set" -> BDoc("v" -> BInt64(1L))),
          upsert = false, multi = false)): graft.store.WriteModel)
      val res = ShardApply.applyToStage(p, st, models, ordered = true, shardTag = k)
      ShardApply.Staged(k, p.toString, st.toString, res)
    }
    // coordinator crashed after one rename; a recoverer then claimed the
    // manifest (canonical -> .recovering) and ALSO crashed before
    // processing — the record must survive under the claimed name
    ShardApply.writeManifest(dir, staged)
    ShardApply.promote(staged.head)
    java.nio.file.Files.move(
      Paths.get(dir, ShardApply.PromoteManifest),
      Paths.get(dir, ShardApply.RecoveringManifest))
    assert(ShardApply.recoverPromote(dir), "claimed record must be processed")
    assert(!Files.exists(Paths.get(dir, ShardApply.RecoveringManifest)))
    val vs = new BsonCollection(dir).readAll().map(_.get("v").get).toVector
    assert(vs.size === 10 && vs.forall(_ === BInt64(1L)))
  }

  test("glob scan recovers a collection that crashed before its FIRST shard rename") {
    import graft.store.{BulkResult, ShardApply}
    val root = freshDir()
    val dir = s"$root/fresh"
    Files.createDirectories(Paths.get(dir))
    // first-ever commit: stage written and manifest durable, crash before
    // ANY rename — no shard file exists, so a glob matches NOTHING and
    // parent-of-matched-files recovery could never find this collection
    val data = s"$dir/shard-00000.bson"
    val stage = s"$dir/.graft-stage-test.bson"
    graft.files.BsonFiles.write(stage,
      Iterator(BDoc("_id" -> BInt32(1), "v" -> BInt64(7L))))
    ShardApply.writeManifest(dir,
      Seq(ShardApply.Staged(0, data, stage, BulkResult.empty)))
    val files = GraftBsonSource.dataFiles(s"$root/*/shard-*.bson")
    assert(files == Seq(data),
      s"zero-match glob must still roll the fresh collection forward, got $files")
    assert(!Files.exists(Paths.get(dir, ShardApply.PromoteManifest)))
  }

  test("a stale recoverer cannot delete a newer claimed record (unique claim names)") {
    import graft.store.{BulkResult, ShardApply}
    val dir = freshDir()
    // an abandoned claim under the legacy fixed name AND a new canonical
    // manifest coexist; recovery must process BOTH without either's
    // deletion erasing the other (claims are taken over under unique
    // names, so no two owners ever share a path)
    val dataA = s"$dir/shard-00000.bson"
    val stageA = s"$dir/.graft-stage-a.bson"
    graft.files.BsonFiles.write(stageA,
      Iterator(BDoc("_id" -> BInt32(1), "v" -> BInt64(1L))))
    Files.writeString(Paths.get(dir, ShardApply.RecoveringManifest),
      s"""[{"data":"$dataA","stage":"$stageA"}]""")
    val dataB = s"$dir/shard-00001.bson"
    val stageB = s"$dir/.graft-stage-b.bson"
    graft.files.BsonFiles.write(stageB,
      Iterator(BDoc("_id" -> BInt32(2), "v" -> BInt64(2L))))
    ShardApply.writeManifest(dir,
      Seq(ShardApply.Staged(1, dataB, stageB, BulkResult.empty)))
    assert(ShardApply.recoverPromote(dir))
    assert(Files.exists(Paths.get(dataA)) && Files.exists(Paths.get(dataB)))
    val leftover = Files.list(Paths.get(dir)).iterator()
    var names = List.empty[String]
    while (leftover.hasNext) names ::= leftover.next().getFileName.toString
    assert(!names.exists(_.startsWith(ShardApply.PromoteManifest)),
      s"all promote records must be consumed, saw $names")
  }

  test("glob spanning several torn collections recovers every parent dir") {
    import graft.store.ShardApply
    val root = freshDir()
    val dirs = Seq("ca", "cb").map { sub =>
      val dir = Paths.get(root, sub).toString
      val coll = new BsonCollection(dir)
      coll.create(1)
      coll.bulkWrite((1 to 5).iterator.map(i =>
        coll.InsertOne(BDoc("_id" -> BInt32(i), "v" -> BInt64(0L)))))
      val p = coll.shardPath(0)
      val st = ShardApply.newStagePath(p)
      val models = (1 to 5).iterator.map(i =>
        graft.store.UpdateOp(UpdateModel(
          BQuery.Eq("_id", BInt32(i)), BDoc("$set" -> BDoc("v" -> BInt64(1L))),
          upsert = false, multi = false)): graft.store.WriteModel)
      val res = ShardApply.applyToStage(p, st, models, ordered = true, shardTag = 0)
      // crash after the manifest, before ANY rename, in BOTH collections
      ShardApply.writeManifest(dir, Seq(
        ShardApply.Staged(0, p.toString, st.toString, res)))
      dir
    }
    val files = GraftBsonSource.dataFiles(s"$root/*/*.bson")
    dirs.foreach { dir =>
      assert(!Files.exists(Paths.get(dir, ShardApply.PromoteManifest)),
        s"every globbed parent must recover, $dir did not")
    }
    val vs = files.flatMap(f => graft.files.BsonFiles.readAll(f))
      .map(_.get("v").get)
    assert(vs.size === 10 && vs.forall(_ === BInt64(1L)))
  }

  test("pushed _id equality scans only the owning shard (mongos routing parity)") {
    import spark.implicits._
    val dir = freshDir()
    (1L to 400L).map(i => (i, i * 10)).toDF("_id", "v")
      .repartition(4)
      .write.format("graftbson").mode("append").option("shards", "4").save(dir)
    val point = spark.read.format("graftbson").load(dir).filter($"_id" === 7L)
    assert(point.rdd.getNumPartitions === 1,
      "an _id point query must plan exactly the owning shard's partition")
    assert(point.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      === Seq((7L, 70L)))
    // conjuncts still route; non-_id predicates still fan out to all shards
    val conj = spark.read.format("graftbson").load(dir)
      .filter($"_id" === 7L && $"v" > 0L)
    assert(conj.rdd.getNumPartitions === 1)
    assert(conj.count() === 1)
    val full = spark.read.format("graftbson").load(dir).filter($"v" === 70L)
    assert(full.rdd.getNumPartitions === 4,
      "a non-_id predicate must still scan every shard")
    assert(full.count() === 1)
  }

  test("ordered sharded bulk is all-or-nothing: dup key aborts every shard") {
    val dir = freshDir()
    val coll = new BsonCollection(dir)
    coll.create(4)
    coll.bulkWrite((1 to 40).iterator.map(i =>
      coll.InsertOne(BDoc("_id" -> BInt32(i), "v" -> BInt64(0L)))))
    val before = coll.readAll().toVector
    // a bulk whose models route to MANY shards but which contains one
    // duplicate-key insert: NOTHING may be durably committed
    intercept[IllegalStateException] {
      coll.bulkWrite(
        (41 to 60).iterator.map(i =>
          coll.InsertOne(BDoc("_id" -> BInt32(i), "v" -> BInt64(1L)))) ++
        Iterator(coll.InsertOne(BDoc("_id" -> BInt32(7), "v" -> BInt64(9L)))))
    }
    assert(coll.readAll().toVector === before,
      "failed ordered bulk must leave every shard exactly as it was")
    assert(!Files.list(Paths.get(dir)).iterator().asScala
      .exists(_.getFileName.toString.contains(".apply-")),
      "failed bulk must not leave stage files behind")
  }
}
