package graft

import org.apache.spark.sql.SparkSession

/** Seed every TESTDATA table into a graftserver target — the data-prep
  * arm of the one-command live-gate replay (tools/live_replay.sh,
  * RUNBOOK §5): after seeding, `graft.Verify graftserver:<target> …`
  * runs the WHOLE oracle-checked catalog against the served copies
  * while tools/check.py evaluates the same SQL over the parquet
  * originals in DuckDB — value parity across the full catalog is the
  * live analog of the driver's correctness gate.
  *
  * `target` is either a `mongodb://` / `mongodb+srv://` URI (REAL
  * driver binding, namespaces `graft_verify.<table>` — drop that
  * database afterwards) or a directory path (the sandbox file-backed
  * double, namespaces `db.<table>` — the in-sandbox smoke path that
  * proves this plumbing without a server).
  *
  * Events go through [[Tables.events]] (parquet nanos/NTZ → UTC micros)
  * so the served datetimes are the same wall-clock micros the parquet
  * queries see, ms-truncated by BSON — identical to ServerParitySpec's
  * seeding discipline. No `id_column`: natural keys stay document
  * FIELDS (the server assigns `_id`), so the served schema is the
  * parquet schema plus an inert `_id`.
  */
object ServerSeed {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println(
        """usage: graft.ServerSeed <sfDir> <serverDir | mongodb://uri> [table ...]
          |
          |Seeding APPENDS into <target>'s graft_verify.<table> (live) or
          |db.<table> (dir) collections — drop the target database / delete
          |the directory before re-running, or rows duplicate and catalog
          |parity fails confusingly (ADVICE r17).""".stripMargin)
      sys.exit(2)
    }
    val Array(sfDir, target) = args.take(2)
    val only = args.drop(2).toSet
    // dir-mode duplicate-append guard: a non-empty target almost always
    // means a stale previous seed — fail with the drop instruction
    // rather than silently doubling every collection
    if (!target.startsWith("mongodb://") && !target.startsWith("mongodb+srv://")) {
      val p = java.nio.file.Paths.get(target)
      if (java.nio.file.Files.isDirectory(p)) {
        val s = java.nio.file.Files.list(p)
        val nonEmpty = try s.findFirst().isPresent finally s.close()
        if (nonEmpty) {
          System.err.println(s"ServerSeed: target dir $target is non-empty — " +
            "seeding appends (duplicate rows); delete it first")
          sys.exit(2)
        }
      }
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftConf.tuned(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val live = target.startsWith("mongodb://") ||
      target.startsWith("mongodb+srv://")
    for (t <- Tables.names if only.isEmpty || only.contains(t)) {
      val df =
        if (t == "events") Tables.events(spark, sfDir)
        else Tables.load(spark, sfDir, t)
      val w = df.write.format("graftserver").mode("append")
      val bound =
        if (live)
          w.option("client_factory",
              classOf[graft.server.MongoDriverFactory].getName)
            .option("uri", target)
            .option("ns", s"${Tables.LiveVerifyDb}.$t")
        else w.option("server_dir", target).option("ns", s"db.$t")
      bound.save()
      println(s"[seed] $t -> ${if (live) Tables.LiveVerifyDb else "db"}.$t")
    }
    spark.stop()
  }
}
