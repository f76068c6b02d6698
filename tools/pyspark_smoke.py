#!/usr/bin/env python3
"""PySpark smoke test for the graft connector: proves the Python surface the
reference ships as a dedicated module (spark/src/main/python/pymongo_spark.py:74-93,
RDD saveToMongoDB + picklers) needs NO Python-side code here — PySpark talks
to the same DSv2 source natively via format("graftbson").

Exercises, from Python, against sf0.001 parquet inputs:
  1. round-trip: DataFrame write (id_column routing) -> read -> row parity
  2. filter/projection pushdown visible in the Python-side plan
  3. $inc upsert write (mode=upsert, update_op=inc) applied twice -> doubled
  4. SQL DDL: CREATE TABLE ... USING graftbson + spark.sql over it

Usage: python3 tools/pyspark_smoke.py [SFDIR]
Requires `sbt package` first (uses target/scala-2.13/*.jar).
"""
import glob
import os
import shutil
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SFDIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

jars = glob.glob(os.path.join(REPO, "target", "scala-2.13", "*.jar"))
if not jars:
    sys.exit("no jar under target/scala-2.13 — run `sbt package` first")

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

spark = (
    SparkSession.builder.master("local[4]")
    .appName("graft-pyspark-smoke")
    .config("spark.jars", ",".join(jars))
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("WARN")

work = tempfile.mkdtemp(prefix="graft-pysmoke-")
failures = []


def check(name, cond, detail=""):
    status = "ok" if cond else "FAIL"
    print(f"[pyspark-smoke] {name}: {status} {detail}")
    if not cond:
        failures.append(name)


try:
    # 1. round-trip: write customers keyed by c_custkey, read back
    cust = spark.read.parquet(os.path.join(SFDIR, "customer.parquet")).select(
        "c_custkey", "c_name", "c_acctbal"
    )
    n_cust = cust.count()
    coll = os.path.join(work, "customers")
    (
        cust.write.format("graftbson")
        .option("id_column", "c_custkey")
        .mode("append")
        .save(coll)
    )
    back = spark.read.format("graftbson").load(coll)
    check("roundtrip row count", back.count() == n_cust, f"({n_cust} rows)")
    src_keys = sorted(r[0] for r in cust.select("c_custkey").collect())
    got_keys = sorted(r[0] for r in back.select("_id").collect())
    check("roundtrip keys", got_keys == src_keys)

    # 2. pushdown is visible from Python: the pushed query reaches the scan
    filtered = back.filter(F.col("c_acctbal") > 0.0).select("_id")
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    check(
        "filter pushdown in plan",
        "PushedQuery" in plan and "c_acctbal" in plan,
        "(scan shows PushedQuery with the predicate)",
    )

    # 3. upsert with $inc, applied twice -> counters double
    counts = (
        spark.read.parquet(os.path.join(SFDIR, "events.parquet"))
        .groupBy(F.col("user_id").alias("_id"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    sensors = os.path.join(work, "sensors")
    for _ in range(2):
        (
            counts.write.format("graftbson")
            .option("mode", "upsert")
            .option("update_op", "inc")
            .mode("append")
            .save(sensors)
        )
    merged = {r["_id"]: r["n"] for r in spark.read.format("graftbson").load(sensors).collect()}
    want = {r["_id"]: 2 * r["n"] for r in counts.collect()}
    check("double upsert $inc", merged == want, f"({len(want)} keys)")

    # 4. SQL DDL surface from Python
    spark.sql(
        f"CREATE TABLE pysmoke_customers USING graftbson OPTIONS (path '{coll}')"
    )
    sql_n = spark.sql("SELECT count(*) AS n FROM pysmoke_customers").collect()[0]["n"]
    check("CREATE TABLE USING graftbson + count(*)", sql_n == n_cust)

    # 5. live-server transport from Python: write + filtered read through
    # format("graftserver") (sandbox file-rooted transport)
    server_dir = os.path.join(work, "server")
    (
        cust.write.format("graftserver")
        .option("server_dir", server_dir)
        .option("ns", "db.cust")
        .option("id_column", "c_custkey")
        .mode("append")
        .save()
    )
    sback = (
        spark.read.format("graftserver")
        .option("server_dir", server_dir)
        .option("ns", "db.cust")
        .load()
    )
    check("graftserver roundtrip row count", sback.count() == n_cust)
    want_pos = cust.filter(F.col("c_acctbal") > 0.0).count()
    got_pos = sback.filter(F.col("c_acctbal") > 0.0).count()
    check("graftserver filtered read", got_pos == want_pos, f"({want_pos} rows)")
finally:
    # a broken session must not let cleanup mask the real failure or skip
    # stop()/rmtree
    try:
        spark.sql("DROP TABLE IF EXISTS pysmoke_customers")
    except Exception:
        pass
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)

if failures:
    sys.exit(f"pyspark smoke FAILED: {failures}")
print("[pyspark-smoke] all checks passed")
