package graft.server

import graft.{SparkSpec, Tables}
import graft.operators.Catalog

import java.nio.file.Files

/** Catalog operators over the LIVE-SERVER transport: `Tables` resolves a
  * `graftserver:<dir>` data dir through `spark.read.format("graftserver")`
  * instead of parquet, so every catalog query runs unchanged against a
  * served collection — the reference's "same job over mongod instead of
  * BSON dumps" switch. This spec loads the sf0.001 documents table into a
  * server namespace and pins VALUE parity between the parquet run and the
  * server run for a sample spanning dedup, text kernels, the quality
  * gate, and the split audit.
  */
class ServerParitySpec extends SparkSpec {

  private val paritySample = Seq(
    "q19_dedup_exact", "q24_text_tokens", "q81_quality_gate",
    "q83_split_assign", "q39_semi_join", "q07_count_per_key",
    "q87_skew_report", "q88_chunk_docs")

  test("catalog operators return identical values via graftserver") {
    val dir = Files.createTempDirectory("graft-parity").toString
    // no id_column: the natural key stays a document FIELD (the server
    // assigns its own _id), so the served schema is the parquet schema
    // plus _id — catalog queries project explicitly, so the extra column
    // is inert. customer/orders exercise decimal + date round-trips
    // through the BSON codec, not just int64/string.
    // events go through Tables.events (parquet nanos → µs) so the served
    // datetime is the µs wall clock the queries see, ms-truncated by BSON
    for (t <- Seq("documents", "customer", "orders"))
      Tables.load(spark, sf0001, t)
        .write.format("graftserver")
        .option("server_dir", dir).option("ns", s"db.$t")
        .mode("append").save()
    Tables.events(spark, sf0001)
      .write.format("graftserver")
      .option("server_dir", dir).option("ns", "db.events")
      .mode("append").save()

    for (name <- paritySample) {
      val q = Catalog.byName(name)
      val viaParquet = q.run(spark, sf0001)
      val viaServer = q.run(spark, s"${Tables.ServerScheme}$dir")
      // column order is part of the contract; row order is fixed by each
      // query's trailing orderBy
      assert(viaServer.columns.toSeq == viaParquet.columns.toSeq, name)
      val a = viaParquet.collect().map(_.toSeq).toSeq
      val b = viaServer.collect().map(_.toSeq).toSeq
      assert(a == b, s"$name diverged between parquet and graftserver")
    }
  }
}
