package graft.files

import graft.bson._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}

class BsonFilesSpec extends AnyFunSuite {

  private def mkDocs(n: Int): Seq[BDoc] =
    (0 until n).map(i => BDoc(
      "_id" -> BInt64(i.toLong),
      "name" -> BString(s"doc-$i-" + ("x" * (i % 37))),
      "v" -> BDouble(i * 0.5)))

  private def tempFile(): String =
    Files.createTempFile("bsonfiles", ".bson").toString

  test("write + readAll round-trips; splits side file written") {
    val path = tempFile()
    val docs = mkDocs(500)
    assert(BsonFiles.write(path, docs.iterator) == 500)
    assert(BsonFiles.readAll(path).toSeq == docs)
    assert(BsonFiles.readSplitsFile(path).exists(_.nonEmpty))
  }

  test("byte splits cover every doc exactly once (boundary resync via side file)") {
    val path = tempFile()
    val docs = mkDocs(1000)
    BsonFiles.write(path, docs.iterator)
    for (splitSize <- Seq(256L, 1024L, 4096L, 1 << 20)) {
      val splits = BsonFiles.planByteSplits(path, splitSize)
      val all = splits.flatMap { case (s, e) => BsonFiles.readRange(path, s, e) }
      assert(all == docs, s"splitSize=$splitSize lost or duplicated docs")
    }
  }

  test("boundary resync works WITHOUT the side file (scan-and-validate)") {
    val path = tempFile()
    val docs = mkDocs(300)
    BsonFiles.write(path, docs.iterator)
    val p = Paths.get(path)
    Files.delete(p.resolveSibling("." + p.getFileName + ".splits"))
    val splits = BsonFiles.planByteSplits(path, 512L)
    val all = splits.flatMap { case (s, e) => BsonFiles.readRange(path, s, e) }
    assert(all == docs)
  }

  test("startingPosition lands exactly on doc boundaries") {
    val path = tempFile()
    val docs = mkDocs(50)
    BsonFiles.write(path, docs.iterator)
    // reconstruct true boundaries
    var bounds = Vector(0L)
    BsonFiles.readAll(path).foreach(d => bounds :+= bounds.last + BsonCodec.encode(d).length)
    for (target <- 1L until Files.size(Paths.get(path)) by 97L) {
      val pos = BsonFiles.startingPosition(path, target)
      assert(bounds.contains(pos), s"resync at $target gave non-boundary $pos")
      assert(pos >= target)
    }
  }
  test("compressed dumps read sequentially; compressed = unsplittable") {
    val path = tempFile()
    val docs = mkDocs(400)
    BsonFiles.write(path, docs.iterator)
    // gzip it
    val gzPath = path + ".gz"
    val gz = new java.util.zip.GZIPOutputStream(Files.newOutputStream(Paths.get(gzPath)))
    try gz.write(Files.readAllBytes(Paths.get(path))) finally gz.close()
    assert(BsonFiles.readAll(gzPath).toSeq == docs)
    assert(BsonFiles.planByteSplits(gzPath, 1024) == Seq((0L, Long.MaxValue)))
    intercept[IllegalArgumentException] {
      BsonFiles.readRange(gzPath, 100L, 200L)
    }
  }

  test("non-gzip codecs: bz2 / zstd / snappy / lz4 dumps round-trip, unsplittable") {
    import org.apache.commons.compress.compressors.bzip2.BZip2CompressorOutputStream
    import org.apache.commons.compress.compressors.lz4.FramedLZ4CompressorOutputStream
    import org.apache.commons.compress.compressors.snappy.FramedSnappyCompressorOutputStream
    import org.apache.commons.compress.compressors.zstandard.ZstdCompressorOutputStream
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("graft-codec").toString
    val docs = (1 to 200).map(i => BDoc("_id" -> BInt32(i), "s" -> BString("x" * i)))
    val plain = s"$dir/plain.bson"
    BsonFiles.write(plain, docs.iterator)
    val raw = Files.readAllBytes(Paths.get(plain))
    def emit(ext: String, wrap: java.io.OutputStream => java.io.OutputStream): String = {
      val out = s"$dir/dump.bson$ext"
      val os = wrap(Files.newOutputStream(Paths.get(out)))
      os.write(raw); os.close(); out
    }
    val files = Seq(
      emit(".bz2", new BZip2CompressorOutputStream(_)),
      emit(".zst", new ZstdCompressorOutputStream(_)),
      emit(".snappy", new FramedSnappyCompressorOutputStream(_)),
      emit(".lz4", new FramedLZ4CompressorOutputStream(_)))
    files.foreach { f =>
      assert(BsonFiles.isCompressed(f), f)
      val got = BsonFiles.readAll(f).toSeq
      assert(got === docs, s"round-trip mismatch for $f")
      assert(BsonFiles.planByteSplits(f, 1024L) === Seq((0L, Long.MaxValue)),
        s"compressed file must be one unsplittable split: $f")
    }
    // a dumped directory mixing codecs is picked up by the source listing
    Files.delete(Paths.get(plain))
    Files.deleteIfExists(Paths.get(s"$dir/.plain.bson.splits"))
    assert(graft.source.GraftBsonSource.dataFiles(dir).size === 4)
  }
}
