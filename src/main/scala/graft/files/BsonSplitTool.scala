package graft.files

import java.nio.file.{Files, Paths}
import java.util.zip.GZIPOutputStream

/** Standalone pre-split tool: cut a BSON dump into per-split files at doc
  * boundaries, optionally gzip-compressing each — the CLI surface of the
  * reference's BSONSplitter Tool (core/.../splitter/BSONSplitter.run:477-585).
  *
  * Usage: BsonSplitTool <input.bson> <outDir> [targetSplitBytes] [gzip]
  */
object BsonSplitTool {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: BsonSplitTool <input.bson> <outDir> [splitBytes] [gzip]")
    val input = args(0)
    val outDir = args(1)
    val target = if (args.length > 2) args(2).toLong else 8L * 1024 * 1024
    val gzip = args.length > 3 && args(3) == "gzip"
    val n = run(input, outDir, target, gzip)
    println(s"wrote $n split files to $outDir")
  }

  def run(input: String, outDir: String, targetSplitBytes: Long, gzip: Boolean): Int = {
    Files.createDirectories(Paths.get(outDir))
    val name = Paths.get(input).getFileName.toString.stripSuffix(".bson")
    var part = 0
    var docs = BsonFiles.readAll(input)
    val buffer = new scala.collection.mutable.ArrayBuffer[graft.bson.BDoc]()
    var bytes = 0L
    def flush(): Unit = if (buffer.nonEmpty) {
      val path = f"$outDir/$name-part-$part%05d.bson"
      BsonFiles.write(path, buffer.iterator)
      if (gzip) {
        val gz = new GZIPOutputStream(Files.newOutputStream(Paths.get(path + ".gz")))
        try gz.write(Files.readAllBytes(Paths.get(path))) finally gz.close()
        Files.delete(Paths.get(path))
        val side = Paths.get(path).resolveSibling("." + Paths.get(path).getFileName + ".splits")
        Files.deleteIfExists(side)
      }
      part += 1
      buffer.clear()
      bytes = 0L
    }
    docs.foreach { d =>
      val enc = graft.bson.BsonCodec.encode(d)
      if (bytes + enc.length > targetSplitBytes && buffer.nonEmpty) flush()
      buffer += d
      bytes += enc.length
    }
    flush()
    part
  }
}
