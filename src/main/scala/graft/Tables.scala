package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated TPC-H-ish parquet tables (TESTDATA.md).
  *
  * Reads go through `spark.read.parquet` so Catalyst gets full predicate
  * pushdown / column pruning / partition planning on the scan — the
  * Spark-native analog of the reference's cursor-level `mongo.input.query`
  * / `mongo.input.fields` pushdown (reference:
  * core/src/main/java/com/mongodb/hadoop/input/MongoInputSplit.java:272-299).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // Schema cache: every spark.read.parquet without an explicit schema
  // re-reads footers to infer one — tens of ms per call that multiply
  // across a 51-query bench and, on a real cluster, per-job driver RPCs.
  // The testdata files are immutable, so infer once per (dir, table).
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()

  /** Scheme prefix routing a table load through the live-server DSv2
    * transport instead of parquet: `graftserver:<server_dir>` resolves
    * table `name` to namespace `db.<name>` on that (sandbox file-backed)
    * server, and `graftserver:mongodb://host:27017` (r17) binds the
    * REAL driver (`MongoDriverFactory`) with namespace
    * `graft_verify.<name>` — the one-command live-gate replay's
    * full-catalog arm (tools/live_replay.sh seeds the tables there
    * first). Every catalog operator takes its data dir as an opaque
    * string, so ANY query runs unchanged against a live collection this
    * way (`ServerParitySpec` pins value parity for a sample) — the
    * reference's "same job over mongod instead of BSON dumps" story,
    * one prefix away.
    */
  val ServerScheme = "graftserver:"

  /** The database the live replay seeds/reads (`graftserver:mongodb://…`
    * routing); drop it after a replay run. */
  val LiveVerifyDb = "graft_verify"

  private def isLiveUri(target: String): Boolean =
    target.startsWith("mongodb://") || target.startsWith("mongodb+srv://")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (dir.startsWith(ServerScheme)) {
      val target = dir.stripPrefix(ServerScheme)
      if (isLiveUri(target))
        spark.read.format("graftserver")
          .option("client_factory", classOf[graft.server.MongoDriverFactory].getName)
          .option("uri", target)
          .option("ns", s"$LiveVerifyDb.$name").load()
      else
        spark.read.format("graftserver")
          .option("server_dir", target)
          .option("ns", s"db.$name").load()
    } else {
      val path = s"$dir/$name.parquet"
      val schema = schemaCache.computeIfAbsent(path,
        p => spark.read.parquet(p).schema)
      spark.read.schema(schema).parquet(path)
    }

  /** events.parquet's `ts` has shipped as either TIMESTAMP(NANOS) — which
    * Spark 4.x only reads via the nanosAsLong legacy long — or plain
    * TIMESTAMP_NTZ(us). Normalize both to session-zoned TimestampType at
    * microsecond precision: all sessions here pin UTC, so the NTZ cast and
    * the nanos->micros truncation yield the identical micros DuckDB sees
    * reading the same file, keeping oracle comparisons bit-identical.
    */
  private def loadEvents(s: SparkSession, d: String): DataFrame =
    if (d.startsWith(ServerScheme)) {
      // server-held events already carry a proper timestamp column (BSON
      // datetime, ms precision) — nothing to normalize
      load(s, d, "events")
    } else {
      // Only flip the session-global nanosAsLong legacy flag when this
      // events file actually IS TIMESTAMP(NANOS) — Spark 4.x refuses to
      // infer a schema for one otherwise. Current driver files are
      // NTZ(us), so the common path never touches session conf; when the
      // flag is needed it must STAY set for the frame's lifetime (the
      // scan re-reads it at execution), which is then a genuine session
      // requirement, not a silent side effect.
      def mentionsNanos(t: Throwable): Boolean = {
        // visited-set guard: cause chains can cycle (not just self-refer),
        // and a cyclic chain must not hang the guard
        val seen = java.util.Collections.newSetFromMap(
          new java.util.IdentityHashMap[Throwable, java.lang.Boolean]())
        var c = t
        while (c != null && seen.add(c)) {
          val m = c.getMessage
          if (m != null && (m.contains("TIMESTAMP(NANOS") || m.contains("nanosAsLong")))
            return true
          c = c.getCause
        }
        false
      }
      val df =
        try load(s, d, "events")
        catch {
          // walk the cause chain — Spark wraps inference errors, and the
          // top-level message alone may not carry the NANOS marker
          case e: Exception if mentionsNanos(e) =>
            s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            load(s, d, "events")
        }
      import org.apache.spark.sql.functions.{expr, timestamp_micros}
      import org.apache.spark.sql.types.{LongType, TimestampNTZType}
      df.schema("ts").dataType match {
        case LongType => // legacy nanos-as-long file
          // re-assert the flag: a LATER session in the same JVM can reach
          // here via the static schemaCache without ever hitting the
          // inference exception above, and the scan re-reads the flag
          // from ITS session conf at execution
          s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case TimestampNTZType => // micros file, tz-less: same wall == same instant under UTC
          // The cast below reads the NTZ wall time in the SESSION zone;
          // oracle parity (DuckDB reads the same file as naive micros)
          // holds only under UTC. Every entrypoint pins it; fail loudly
          // if a caller built a session without the pin instead of
          // silently shifting every event timestamp.
          require(s.conf.get("spark.sql.session.timeZone") == "UTC",
            s"events NTZ->timestamp normalization requires spark.sql.session.timeZone=UTC " +
              s"(got '${s.conf.get("spark.sql.session.timeZone")}')")
          df.withColumn("ts", df.col("ts").cast("timestamp"))
        case _ => df
      }
    }

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** REQUIRES `spark.sql.session.timeZone=UTC` for parquet-backed dirs:
    * the NTZ→timestamp normalization fails loudly under any other zone
    * (see [[loadEvents]]) rather than silently shifting every event
    * timestamp. Embedders must pin the zone before touching events.
    */
  def events(s: SparkSession, d: String): DataFrame    = loadEvents(s, d)
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
