package graft.source

import graft.SparkSpec
import graft.bson._
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}

/** Nested-subfield projected decode ([[BsonCodec.Proj]]): a dotted path
  * prunes SUBDOCUMENT interiors, not just top-level fields — proven the
  * same way the top-level byte-skip was (AggPushdownSpec): stomp an
  * invalid BSON tag into the sibling subfield and read the wanted one
  * anyway. Also pins that Spark's nestedSchemaPruning hands the scan a
  * pruned inner StructType for `SELECT meta.small`, so the engine-side
  * trie actually fires on plain DataFrame queries.
  */
class NestedPruneSpec extends SparkSpec {

  private def freshDir(): String =
    Files.createTempDirectory("graft-nested").toString

  test("Proj trie: dotted paths recurse, heads subsume, arrays stay whole") {
    import BsonCodec.Proj
    val p = Proj.fromPaths(Seq("a.b", "a.c.d", "e", "e.sub"))
    p match {
      case Proj.Fields(m) =>
        assert(m("e") == Proj.All, "a plain head subsumes its subpaths")
        m("a") match {
          case Proj.Fields(am) =>
            assert(am("b") == Proj.All)
            assert(am("c") == Proj.Fields(Map("d" -> Proj.All)))
          case other => fail(s"expected recursion under a, got $other")
        }
      case other => fail(s"expected Fields, got $other")
    }
    // decode semantics: only the listed subpaths materialize
    val doc = BDoc(
      "a" -> BDoc("b" -> BInt32(1), "x" -> BString("drop"),
        "c" -> BDoc("d" -> BInt32(2), "y" -> BInt32(9))),
      "e" -> BInt32(3), "z" -> BInt32(4))
    val buf = java.nio.ByteBuffer.wrap(BsonCodec.encode(doc))
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val got = BsonCodec.readDocProjected(buf, p)
    assert(got == BDoc(
      "a" -> BDoc("b" -> BInt32(1), "c" -> BDoc("d" -> BInt32(2))),
      "e" -> BInt32(3)))
  }

  private def writeAndStompBig(dir: String, n: Int): Unit = {
    import spark.implicits._
    (1 to n).map(i => (i.toLong, (i.toLong * 3, (i.toLong, s"payload-$i"))))
      .toDF("_id", "meta")
      .withColumn("meta", struct($"meta._1".as("small"),
        struct($"meta._2._1".as("x"), $"meta._2._2".as("y")).as("big")))
      .write.format("graftbson").mode("append").save(dir)
    // stomp the INTERIOR of the meta.big subdocument (its first inner
    // element's tag -> 0x6F, an invalid BSON tag): the nested byte-skip
    // jumps big via its length header without reading the interior —
    // the element HEADER (tag 0x03 + name) stays intact because any
    // list walk must read headers to know what to skip — while any
    // decode of big's VALUE dies on the unknown tag
    val data = Paths.get(dir, "data.bson")
    val bytes = Files.readAllBytes(data)
    var i = 0
    var hits = 0
    while (i < bytes.length - 10) {
      if (bytes(i) == 0x03 && bytes(i + 1) == 'b'.toByte &&
          bytes(i + 2) == 'i'.toByte && bytes(i + 3) == 'g'.toByte &&
          bytes(i + 4) == 0) {
        bytes(i + 9) = 0x6F // tag of big's first inner element
        hits += 1
      }
      i += 1
    }
    assert(hits == n, s"corruption marker found $hits times")
    Files.write(data, bytes)
  }

  test("a pruned nested schema byte-skips the sibling subfield (corruption-proof)") {
    import spark.implicits._
    val dir = freshDir()
    writeAndStompBig(dir, 50)
    // explicit pruned schema: meta.big's bytes are never materialized
    val small = spark.read.format("graftbson")
      .schema("_id LONG, meta STRUCT<small: BIGINT>").load(dir)
      .select($"_id", $"meta.small".as("s"))
    assert(small.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      .toSeq == (1 to 50).map(i => (i.toLong, i.toLong * 3)))
    // sanity: decoding meta.big DOES hit the corruption
    intercept[Throwable] {
      spark.read.format("graftbson")
        .schema("_id LONG, meta STRUCT<small: BIGINT, big: STRUCT<x: BIGINT, y: STRING>>").load(dir)
        .select($"meta.big").collect()
    }
  }

  test("Spark's nestedSchemaPruning reaches the scan: SELECT meta.small works under a FULL schema") {
    import spark.implicits._
    val dir = freshDir()
    writeAndStompBig(dir, 30)
    // the declared schema carries the corrupted column; only the
    // SELECTED subfield should be decoded — this passes iff Spark hands
    // the scan a pruned inner StructType AND the trie skips big's bytes
    val df = spark.read.format("graftbson")
      .schema("_id LONG, meta STRUCT<small: BIGINT, big: STRUCT<x: BIGINT, y: STRING>>").load(dir)
      .select($"_id", $"meta.small".as("s"))
      .filter($"_id" <= 10)
    assert(df.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      .toSeq == (1 to 10).map(i => (i.toLong, i.toLong * 3)))
  }
}
