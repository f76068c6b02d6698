package graft.source

import graft.bson._
import graft.files.BsonFiles
import graft.query.BQuery

import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Planning must not read the collection: stats come from the `.splits`
  * side file plus a handful of sampled doc decodes. The reference issues
  * O(#splits) server commands to plan (splitVector / $sample), never a
  * full scan — bytesTouched bounds our file-backed equivalent the same way.
  */
class FileStatsSpec extends AnyFunSuite {

  private def fixture(nDocs: Int, pad: Int): (String, Long) = {
    val dir = Files.createTempDirectory("graft-stats").toString
    val path = s"$dir/data.bson"
    val docs = (0 until nDocs).iterator.map(i =>
      BDoc("_id" -> BInt32(i), "pad" -> BString("x" * pad)))
    BsonFiles.write(path, docs)
    (path, Files.size(java.nio.file.Paths.get(path)))
  }

  test("size-based planning touches <5% of the file's bytes") {
    val (path, size) = fixture(20000, 200) // ~4.4 MB
    val stats = new FileStats(path, "_id")
    val splits = Planners.plan(stats, "_id", "size", targetSplitBytes = 256 * 1024)
    assert(splits.size > 4, "fixture must actually produce multiple splits")
    assert(stats.bytesTouched < size / 20,
      s"planning read ${stats.bytesTouched} of $size bytes — full-scan planning is back")
  }

  test("count and avgObjSize are exact with a side file, no data IO") {
    val (path, size) = fixture(1000, 50)
    val stats = new FileStats(path, "_id")
    assert(stats.count === 1000)
    assert(stats.avgObjSizeBytes === size / 1000)
    // count = stride probe (<= 64 headers) + tail walk (<= 64 headers)
    assert(stats.bytesTouched <= 2 * 64 * 4)
  }

  test("count stays exact for a side file written at a non-default stride") {
    val dir = Files.createTempDirectory("graft-stats").toString
    val path = s"$dir/data.bson"
    graft.files.BsonFiles.write(path,
      (0 until 900).iterator.map(i => BDoc("_id" -> BInt32(i))), splitsEvery = 128)
    val stats = new FileStats(path, "_id")
    assert(stats.count === 900, "stride must be derived, not assumed 64")
  }

  test("count is exact via header walk when the side file is missing") {
    val (path, _) = fixture(777, 30)
    Files.delete(java.nio.file.Paths.get(path).resolveSibling(".data.bson.splits"))
    val stats = new FileStats(path, "_id")
    assert(stats.count === 777)
    assert(stats.bytesTouched === 777 * 4, "header walk reads 4 bytes per doc")
  }

  test("sampleKeys returns sorted keys from evenly spaced positions") {
    val (path, _) = fixture(6400, 20)
    val stats = new FileStats(path, "_id")
    val keys = stats.sampleKeys(10)
    assert(keys.nonEmpty && keys.size <= 10)
    assert(keys === keys.sorted(BsonOrdering))
    // spread: first sample from the head region, last from the tail region
    assert(BsonOrdering.lt(keys.head, keys.last))
  }

  test("paginating probes still work (streaming, not materializing docs)") {
    val (path, _) = fixture(500, 20)
    val stats = new FileStats(path, "_id")
    assert(stats.hasAny(BQuery.Gt("_id", BInt32(498))))
    assert(!stats.hasAny(BQuery.Gt("_id", BInt32(499))))
    assert(stats.keyAtSkip(BQuery.True, 100L) === Some(BInt32(100)))
    assert(stats.keyAtSkip(BQuery.True, 500L) === None)
  }
}
