package graft.operators

import graft.Tables
import graft.functions.GraftFunctions
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** The reference-surface relational operators (SURVEY.md §2.5 checklist):
  * projection incl. pruning, filter, string funcs, date funcs, explode,
  * hash aggregation (partial+final), sort/limit, union, joins (the host
  * engines' contribution in the reference), windowing, and the ObjectId
  * scalar functions of §2.6.
  *
  * Each query is declarative DataFrame code — Catalyst handles pushdown,
  * partial aggregation and join strategy; small dimensions are broadcast
  * explicitly so the plan stays shuffle-free where a 1000-executor cluster
  * would want it.
  */
object RelationalQueries {
  import Exact._

  val all: Seq[CatalogQuery] = Seq(

    // Pricing-summary aggregation (TPC-H Q1 shape). Reference analog:
    // treasury-yield group-by with COUNT/AVG/SUM
    // (examples/treasury_yield/.../TreasuryYieldReducer.java:48-71).
    CatalogQuery(
      "q01_group_agg",
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d)
          .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
          .groupBy($"l_returnflag", $"l_linestatus")
          .agg(
            dsum($"l_quantity").as("sum_qty"),
            dsum($"l_extendedprice").as("sum_base_price"),
            dsumDiscPrice($"l_extendedprice", $"l_discount").as("sum_disc_price"),
            davg($"l_quantity").as("avg_qty"),
            davg($"l_extendedprice").as("avg_price"),
            count(lit(1)).as("n_rows"))
          .orderBy($"l_returnflag", $"l_linestatus")
      },
      Some(s"""
        |SELECT l_returnflag, l_linestatus,
        |  ${dsumSql("l_quantity")} AS sum_qty,
        |  ${dsumSql("l_extendedprice")} AS sum_base_price,
        |  CAST(CAST(sum(${decSql("l_extendedprice")} * (CAST(1 AS DECIMAL(15,4)) - ${decSql("l_discount")})) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
        |  ${davgSql("l_quantity")} AS avg_qty,
        |  ${davgSql("l_extendedprice")} AS avg_price,
        |  count(*) AS n_rows
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus
        |""".stripMargin)),

    // Filter + projection pushdown to the scan. Reference analog: Hive
    // `WHERE i > 20` pushdown (hive/.../HiveQueryTest.java:33-62) and
    // mongo.input.query (core/.../MongoInputSplit.java:281).
    CatalogQuery(
      "q02_filter_pushdown",
      (s, d) => {
        import s.implicits._
        Tables.events(s, d)
          .filter($"event_type" === "click" && $"value" > 100.0)
          .select($"event_id", $"ts", $"user_id", $"value")
          .orderBy($"event_id")
      },
      Some("""
        |SELECT event_id, ts, user_id, value FROM events
        |WHERE event_type = 'click' AND value > 100.0
        |ORDER BY event_id
        |""".stripMargin)),

    // Column pruning: 3 of 11 lineitem columns should reach the parquet
    // scan's ReadSchema. Reference analog: mongo.input.fields projection
    // (core/.../MongoConfigUtil.java:108,734-750).
    CatalogQuery(
      "q03_project_prune",
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d)
          .filter($"l_orderkey" % 100 === 0)
          .select($"l_orderkey", $"l_linenumber", $"l_quantity")
          .orderBy($"l_orderkey", $"l_linenumber")
      },
      Some("""
        |SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_orderkey % 100 = 0
        |ORDER BY l_orderkey, l_linenumber
        |""".stripMargin)),

    // Date-extraction group-by: the treasury-yield canonical query
    // (examples/treasury_yield/.../TreasuryYieldMapper.java:47-53).
    CatalogQuery(
      "q04_year_group",
      (s, d) => {
        import s.implicits._
        Tables.orders(s, d)
          .groupBy(year($"o_orderdate").as("o_year"))
          .agg(
            count(lit(1)).as("n_orders"),
            dsum($"o_totalprice").as("sum_price"),
            davg($"o_totalprice").as("avg_price"))
          .orderBy($"o_year")
      },
      Some(s"""
        |SELECT CAST(year(o_orderdate) AS INT) AS o_year, count(*) AS n_orders,
        |  ${dsumSql("o_totalprice")} AS sum_price,
        |  ${davgSql("o_totalprice")} AS avg_price
        |FROM orders GROUP BY 1 ORDER BY 1
        |""".stripMargin)),

    // Tokenize + flatten + count: the enron mail query
    // (examples/enron/.../EnronMailMapper.java:26-56 — split To on ",",
    // trim, flatten, group-by, count).
    CatalogQuery(
      "q05_explode_tokens",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d)
          .select($"doc_id", explode(graft.functions.Portable.spaceSplit($"text")).as("t0"))
          .select(trim($"t0").as("token"))
          .filter($"token" =!= "")
          .groupBy($"token").agg(count(lit(1)).as("n"))
          .orderBy($"token")
      },
      Some("""
        |SELECT token, count(*) AS n FROM (
        |  SELECT trim(t0) AS token FROM (
        |    SELECT unnest(string_split(text, ' ')) AS t0 FROM documents))
        |WHERE token <> ''
        |GROUP BY token ORDER BY token
        |""".stripMargin)),

    // Group + collect_list: the sensors device grouping
    // (examples/sensors/.../DeviceReducer.java:28-40 builds the id array
    // per (owner,type) key). Array emitted as sorted CSV for a stable hash.
    // Two-phase (salted) aggregation: phase 1 collects per (key, salt) so no
    // single aggregation buffer holds a whole hot key's ids; phase 2 merges
    // the ≤16 sub-arrays per key. Same answer, skew-safe at 100 TB.
    CatalogQuery(
      "q06_group_collect",
      (s, d) => {
        import s.implicits._
        Tables.customer(s, d)
          .groupBy($"c_nationkey", $"c_mktsegment", ($"c_custkey" % 16).as("salt"))
          .agg(collect_list($"c_custkey").as("part_ids"), count(lit(1)).as("pn"))
          .groupBy($"c_nationkey", $"c_mktsegment")
          .agg(
            expr("array_join(transform(sort_array(flatten(collect_list(part_ids))), x -> cast(x AS string)), ',')").as("ids"),
            sum($"pn").as("n"))
          .orderBy($"c_nationkey", $"c_mktsegment")
      },
      Some("""
        |SELECT c_nationkey, c_mktsegment,
        |  array_to_string(list_sort(list(c_custkey)), ',') AS ids,
        |  count(*) AS n
        |FROM customer GROUP BY 1, 2 ORDER BY 1, 2
        |""".stripMargin)),

    // Count per key with map-side partial agg — the sensors log-count
    // workload incl. combiner (examples/sensors/.../LogReducer.java:31-49,
    // LogCombiner.java). Catalyst's partial/final agg is the combiner.
    CatalogQuery(
      "q07_count_per_key",
      (s, d) => {
        import s.implicits._
        Tables.events(s, d)
          .groupBy($"user_id").agg(count(lit(1)).as("n"))
          .orderBy($"user_id")
      },
      Some("SELECT user_id, count(*) AS n FROM events GROUP BY 1 ORDER BY 1")),

    // Union of collections — the multi-collection scan
    // (core/.../splitter/MultiMongoCollectionSplitter.java:47-141).
    CatalogQuery(
      "q08_union_collections",
      (s, d) => {
        import s.implicits._
        val c = Tables.customer(s, d)
          .select($"c_name".as("name"), $"c_nationkey".cast(IntegerType).as("nationkey"),
            $"c_acctbal".as("acctbal"), lit("customer").as("kind"))
        val p = Tables.supplier(s, d)
          .select($"s_name".as("name"), $"s_nationkey".cast(IntegerType).as("nationkey"),
            $"s_acctbal".as("acctbal"), lit("supplier").as("kind"))
        c.unionByName(p).orderBy($"name")
      },
      Some("""
        |SELECT c_name AS name, c_nationkey AS nationkey, c_acctbal AS acctbal, 'customer' AS kind FROM customer
        |UNION ALL
        |SELECT s_name, s_nationkey, s_acctbal, 'supplier' FROM supplier
        |ORDER BY name
        |""".stripMargin)),

    // Global sort + limit (top-k). The reference can only push
    // sort/limit per-split (MongoInputSplit.java:281-296); Spark's
    // TakeOrderedAndProject gives the global semantics.
    CatalogQuery(
      "q09_topk_orders",
      (s, d) => {
        import s.implicits._
        Tables.orders(s, d)
          .select($"o_orderkey", $"o_custkey", $"o_totalprice")
          .orderBy($"o_totalprice".desc, $"o_orderkey")
          .limit(10)
      },
      Some("""
        |SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
        |""".stripMargin)),

    // Join + aggregate with an explicitly broadcast dimension.
    CatalogQuery(
      "q10_join_agg",
      (s, d) => {
        import s.implicits._
        Tables.orders(s, d)
          .join(broadcast(Tables.customer(s, d)), $"o_custkey" === $"c_custkey")
          .groupBy($"c_mktsegment")
          .agg(count(lit(1)).as("n_orders"),
            dsum($"o_totalprice").as("sum_price"),
            davg($"o_totalprice").as("avg_price"))
          .orderBy($"c_mktsegment")
      },
      Some(s"""
        |SELECT c_mktsegment, count(*) AS n_orders,
        |  ${dsumSql("o_totalprice")} AS sum_price,
        |  ${davgSql("o_totalprice")} AS avg_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1
        |""".stripMargin)),

    // Multi-way star join (TPC-H Q5 shape): fact table joined to a chain
    // of broadcast dims; revenue per nation within one region/date range.
    CatalogQuery(
      "q11_join_multi",
      (s, d) => {
        import s.implicits._
        val li = Tables.lineitem(s, d)
        val o = Tables.orders(s, d)
          .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
            $"o_orderdate" < lit("1998-01-01").cast("timestamp"))
        val c = Tables.customer(s, d)
        val n = Tables.nation(s, d)
        val r = Tables.region(s, d).filter($"r_name" === "ASIA")
        li.join(o, $"l_orderkey" === $"o_orderkey")
          .join(broadcast(c), $"o_custkey" === $"c_custkey")
          .join(broadcast(n), $"c_nationkey" === $"n_nationkey")
          .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
          .groupBy($"n_name")
          .agg(
            dsumDiscPrice($"l_extendedprice", $"l_discount").as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy($"n_name")
      },
      Some(s"""
        |SELECT n_name,
        |  CAST(CAST(sum(${decSql("l_extendedprice")} * (CAST(1 AS DECIMAL(15,4)) - ${decSql("l_discount")})) AS VARCHAR) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY n_name ORDER BY n_name
        |""".stripMargin)),

    // Regex extraction + cast — the treasury Pig year-extract
    // (examples/treasury_yield/pig/pig_mongo_test.pig:8-16).
    CatalogQuery(
      "q12_regexp_extract",
      (s, d) => {
        import s.implicits._
        Tables.orders(s, d)
          .select(regexp_extract($"o_orderpriority", "^([0-9]+)", 1).cast(IntegerType).as("prio"))
          .groupBy($"prio").agg(count(lit(1)).as("n"))
          .orderBy($"prio")
      },
      Some("""
        |SELECT CAST(regexp_extract(o_orderpriority, '^([0-9]+)', 1) AS INT) AS prio, count(*) AS n
        |FROM orders GROUP BY 1 ORDER BY 1
        |""".stripMargin)),

    // Anti join: keys on one side absent from the other (NOT EXISTS).
    CatalogQuery(
      "q13_anti_join",
      (s, d) => {
        import s.implicits._
        val bigSpenders = Tables.orders(s, d).filter($"o_totalprice" > 300000.0)
        Tables.customer(s, d)
          .join(bigSpenders, $"c_custkey" === $"o_custkey", "left_anti")
          .select($"c_custkey", $"c_name", $"c_mktsegment")
          .orderBy($"c_custkey")
      },
      Some("""
        |SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
        |ORDER BY c_custkey
        |""".stripMargin)),

    // DISTINCT (hash de-duplication of a projection).
    CatalogQuery(
      "q14_distinct",
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d)
          .select($"l_returnflag", $"l_linestatus").distinct()
          .orderBy($"l_returnflag", $"l_linestatus")
      },
      Some("""
        |SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus
        |""".stripMargin)),

    // Aggregate + HAVING filter over groups.
    CatalogQuery(
      "q15_having",
      (s, d) => {
        import s.implicits._
        Tables.part(s, d)
          .groupBy($"p_brand")
          .agg(count(lit(1)).as("n_parts"), davg($"p_retailprice").as("avg_price"))
          .filter($"n_parts" >= 5)
          .orderBy($"p_brand")
      },
      Some(s"""
        |SELECT p_brand, count(*) AS n_parts, ${davgSql("p_retailprice")} AS avg_price
        |FROM part GROUP BY 1 HAVING count(*) >= 5 ORDER BY 1
        |""".stripMargin)),

    // Window function: top-3 orders per market segment by price.
    // Scale note: the 5-value partition key would be a single-task sort at
    // 100 TB if the window ran raw, but Spark's rank-limit pushdown
    // (WindowGroupLimit, applied because of the rnk <= 3 filter) prunes to
    // ≤3 rows per segment per input partition map-side BEFORE the shuffle —
    // the two-phase top-n, done by the optimizer with a single exchange
    // (verified in PLANS_r02.md).
    CatalogQuery(
      "q16_window_topn",
      (s, d) => {
        import s.implicits._
        val j = Tables.orders(s, d)
          .join(broadcast(Tables.customer(s, d)), $"o_custkey" === $"c_custkey")
        val w = Window.partitionBy($"c_mktsegment")
          .orderBy($"o_totalprice".desc, $"o_orderkey")
        j.withColumn("rnk", row_number().over(w))
          .filter($"rnk" <= 3)
          .select($"c_mktsegment", $"rnk", $"o_orderkey", $"o_totalprice")
          .orderBy($"c_mktsegment", $"rnk")
      },
      Some("""
        |SELECT c_mktsegment, CAST(rnk AS INT) AS rnk, o_orderkey, o_totalprice FROM (
        |  SELECT c_mktsegment, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY c_mktsegment
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        |  FROM orders JOIN customer ON o_custkey = c_custkey)
        |WHERE rnk <= 3 ORDER BY c_mktsegment, rnk
        |""".stripMargin)),

    // ObjectId scalar functions (SURVEY.md §2.6): synthesize a canonical
    // ObjectId hex from the order key, then extract its embedded unix
    // seconds via the native Catalyst expression.
    CatalogQuery(
      "q17_objectid",
      (s, d) => {
        import s.implicits._
        Tables.orders(s, d)
          .filter($"o_orderkey" % 1000 === 0)
          .select($"o_orderkey",
            GraftFunctions.to_objectid(lpad(lower(hex($"o_orderkey")), 24, "0")).as("oid"))
          .select($"o_orderkey", $"oid",
            GraftFunctions.objectid_to_seconds($"oid").as("oid_seconds"))
          .orderBy($"o_orderkey")
      },
      Some("""
        |SELECT o_orderkey, oid,
        |  CAST(concat('0x', substr(oid, 1, 8)) AS BIGINT) AS oid_seconds
        |FROM (SELECT o_orderkey, lpad(lower(to_hex(o_orderkey)), 24, '0') AS oid FROM orders
        |      WHERE o_orderkey % 1000 = 0)
        |ORDER BY o_orderkey
        |""".stripMargin)),

    // Sessionization: 30-minute inactivity gap opens a new session
    // (events table; deterministic integer-second arithmetic).
    //
    // Skew-immune spelling (r11; the lag-window original serialized a
    // 90%-hot user into one task — measured 4.7x on the skew twin). The
    // key fact: with time buckets exactly as wide as the gap (1800 s),
    // two events in the SAME bucket can never be >1800 s apart, so a
    // session break only ever occurs between consecutive OCCUPIED
    // buckets — and buckets >=2 apart always break. The corpus-scale
    // pass therefore collapses to a (user, bucket) min/max/count
    // aggregate (map-side combinable — a hot user's events partial-
    // aggregate inside every task before the exchange), and the lag
    // window runs over the bucket frame, whose size per user is bounded
    // by TIME SPAN / 1800, not by data. NULL-ts events keep the pinned
    // semantics (each opens its own session, and the first real event
    // after them starts a new one): the NULL bucket sorts first,
    // contributes its row count, and hands a NULL prev-hi to the first
    // real bucket.
    CatalogQuery(
      "q18_sessionize",
      (s, d) => {
        import s.implicits._
        val W = 1800L
        val perB = Tables.events(s, d)
          .select($"user_id", $"ts".cast("long").as("sec"))
          .withColumn("bkt", floor($"sec" / W))
          .groupBy($"user_id", $"bkt")
          .agg(min($"sec").as("lo"), max($"sec").as("hi"), count(lit(1)).as("n"))
        val wB = Window.partitionBy($"user_id").orderBy($"bkt".asc_nulls_first)
        perB
          .withColumn("prev_hi", lag($"hi", 1).over(wB))
          .withColumn("contrib", when($"bkt".isNull, $"n")
            .otherwise(when($"prev_hi".isNull || $"lo" - $"prev_hi" > W, 1L)
              .otherwise(0L)))
          .groupBy($"user_id")
          .agg(sum($"contrib").cast("long").as("n_sessions"),
            sum($"n").cast("long").as("n_events"))
          .orderBy($"user_id")
      },
      Some("""
        |SELECT user_id, CAST(sum(new_s) AS BIGINT) AS n_sessions, count(*) AS n_events FROM (
        |  SELECT user_id,
        |    CASE WHEN prev_ts IS NULL
        |           OR (CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch(prev_ts)) AS BIGINT)) > 1800
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM (SELECT user_id, ts,
        |          -- NULLS FIRST: Spark's ascending default; DuckDB defaults
        |          -- to NULLS LAST, which re-orders NULL-ts events and
        |          -- shifts every lag chain (found by the all-tables NULL twin)
        |          lag(ts) OVER (PARTITION BY user_id
        |                        ORDER BY ts NULLS FIRST, event_id) AS prev_ts
        |        FROM events))
        |GROUP BY user_id ORDER BY user_id
        |""".stripMargin)),

    // Nested / semi-structured access: parse the JSON props column with a
    // declared schema and aggregate the extracted field — the dotted-path
    // document access of the reference (MongoPathRetriever.java:11-23,
    // nested Hive STRUCT access BSONSerDe.java:294-333) over a dynamic
    // payload column.
    CatalogQuery(
      "q35_nested_json",
      (s, d) => {
        import s.implicits._
        Tables.events(s, d)
          .withColumn("k",
            from_json($"props", org.apache.spark.sql.types.StructType.fromDDL("k INT"))
              .getField("k"))
          .groupBy($"event_type")
          .agg(
            count(lit(1)).as("n"),
            sum($"k").cast("long").as("sum_k"),
            min($"k").cast("int").as("min_k"),
            max($"k").cast("int").as("max_k"))
          .orderBy($"event_type")
      },
      Some("""
        |SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
        |  min(CAST(json_extract_string(props, '$.k') AS INT)) AS min_k,
        |  max(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
        |FROM events GROUP BY 1 ORDER BY 1
        |""".stripMargin)),

    // ROLLUP hierarchy totals (region -> nation -> grand total). One of the
    // operator classes the reference lacks entirely (SURVEY §2.8) that the
    // Spark rebuild gets natively.
    CatalogQuery(
      "q37_rollup",
      (s, d) => {
        import s.implicits._
        Tables.customer(s, d)
          .join(broadcast(Tables.nation(s, d)), $"c_nationkey" === $"n_nationkey")
          .join(broadcast(Tables.region(s, d)), $"n_regionkey" === $"r_regionkey")
          .rollup($"r_name", $"n_name")
          .agg(count(lit(1)).as("n_cust"), dsum($"c_acctbal").as("sum_bal"))
          .orderBy($"r_name".asc_nulls_first, $"n_name".asc_nulls_first)
      },
      Some(s"""
        |SELECT r_name, n_name, count(*) AS n_cust, ${dsumSql("c_acctbal")} AS sum_bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |-- no-op on any non-empty input; on an EMPTY join it drops the
        |-- grand-total row DuckDB emits (Spark's rollup yields none)
        |HAVING count(*) > 0
        |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST
        |""".stripMargin)),

    // As-of style event join: for every click, the most recent preceding
    // purchase by the same user — an operator Spark has no physical node
    // for, composed from existing ops.
    //
    // Skew-immune two-level spelling (r11; the single unbounded-
    // preceding window serialized a 90%-hot user into one task —
    // measured 14x on the skew twin). Level 1: a running last-purchase
    // window WITHIN each (user, 1800-s time bucket) — partitions are
    // bounded by events-per-user-per-half-hour, so a hot user splits
    // across its time buckets. Level 2: the best purchase ts of each
    // EARLIER bucket, a running max over the per-(user, bucket) frame —
    // whose size is bounded by time span, not data. A row's answer is
    // its within-bucket running value if any, else the earlier-bucket
    // max ("most recent preceding purchase" = max purchase ts among
    // earlier rows, so max-per-bucket loses nothing). NULL-ts rows sit
    // in the NULL bucket (sorted first, sees nothing, contributes
    // nothing) — the pinned NULLS FIRST semantics.
    CatalogQuery(
      "q38_asof_event",
      (s, d) => {
        import s.implicits._
        val W = 1800L
        val ev = Tables.events(s, d)
          .select($"event_id", $"user_id", $"ts", $"event_type")
          .withColumn("bkt", floor($"ts".cast("long") / W))
        val wIn = Window.partitionBy($"user_id", $"bkt")
          .orderBy($"ts".asc_nulls_first, $"event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val withIn = ev.withColumn("p_in",
          last(when($"event_type" === "purchase", $"ts"), ignoreNulls = true)
            .over(wIn))
        // one row per occupied (user, bucket): the bucket's best purchase
        // ts (NULL when none) — map-side combinable
        val buckets = ev.groupBy($"user_id", $"bkt")
          .agg(max(when($"event_type" === "purchase", $"ts")).as("bp"))
        val wB = Window.partitionBy($"user_id").orderBy($"bkt".asc_nulls_first)
          .rowsBetween(Window.unboundedPreceding, -1)
        val prevB = buckets.withColumn("p_prev", max($"bp").over(wB))
          .select($"user_id".as("pu"), $"bkt".as("pb"), $"p_prev")
        withIn
          // null-SAFE on bkt: the NULL bucket (NULL-ts rows) must keep
          // its rows through the join, not vanish on a NULL equi-key
          .join(prevB, withIn("user_id") === $"pu" && withIn("bkt") <=> $"pb")
          .filter($"event_type" === "click")
          .select($"event_id", $"user_id", $"ts",
            coalesce($"p_in", $"p_prev").as("last_purchase_ts"))
          .orderBy($"event_id")
      },
      Some("""
        |SELECT event_id, user_id, ts, last_purchase_ts FROM (
        |  SELECT event_id, user_id, ts, event_type,
        |    -- ts NULLS FIRST matches Spark's ascending default (DuckDB's is
        |    -- NULLS LAST): an unknown-time event orders before the epoch,
        |    -- so it sees no preceding purchase in either engine
        |    last_value(CASE WHEN event_type = 'purchase' THEN ts END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_purchase_ts
        |  FROM events)
        |WHERE event_type = 'click'
        |ORDER BY event_id
        |""".stripMargin)),

    // Semi join (EXISTS): customers who placed at least one urgent order.
    CatalogQuery(
      "q39_semi_join",
      (s, d) => {
        import s.implicits._
        val urgent = Tables.orders(s, d).filter($"o_orderpriority" === "1-URGENT")
        Tables.customer(s, d)
          .join(urgent, $"c_custkey" === $"o_custkey", "left_semi")
          .select($"c_custkey", $"c_name")
          .orderBy($"c_custkey")
      },
      Some("""
        |SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey
        |""".stripMargin)),

    // Interval (range) join, binned: flag events that fall inside any
    // 10-minute incident window opened by an error event of the same
    // user. Spark has no inequality-join physical operator — a naive
    // spelling becomes a per-user cross join (quadratic on hot users).
    // The scale-safe shape: bin the time axis at the window length, so a
    // window overlaps AT MOST TWO bins and the join becomes an
    // equi-join on (user_id, bin) plus a residual range filter — shuffle
    // keyed on bounded buckets, never all-pairs. The DuckDB oracle
    // spells the same semantics as a correlated EXISTS (its IEJoin
    // handles inequality joins natively).
    CatalogQuery(
      "q63_interval_join",
      (s, d) => {
        import s.implicits._
        val winSec = 600L
        val ev = Tables.events(s, d)
          .select($"event_id", $"user_id", $"event_type",
            $"ts".cast("long").as("sec"))
        val inc = ev.filter($"event_type" === "error")
          .select($"user_id", $"sec".as("st"))
        val flagged = IntervalJoin.flag(ev, inc, winSec)
        val tot = ev.groupBy($"event_type").agg(count(lit(1)).as("n_events"))
        val flg = flagged.groupBy($"event_type").agg(count(lit(1)).as("n_flagged"))
        // null-SAFE join key: event_type is a GROUP here, and a NULL group
        // is a real group — a plain equi-join would drop the NULL-type
        // events' flag count on the floor (found by the all-tables NULL
        // twin: the oracle computes per-group sums without any join)
        tot.join(flg, tot("event_type") <=> flg("event_type"), "left")
          .select(tot("event_type"), $"n_events",
            coalesce($"n_flagged", lit(0L)).as("n_flagged"))
          .orderBy(tot("event_type"))
      },
      Some("""
        |WITH ev AS (
        |  SELECT event_id, user_id, event_type,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS sec
        |  FROM events),
        |inc AS (SELECT user_id, sec AS st FROM ev WHERE event_type = 'error')
        |SELECT event_type, count(*) AS n_events,
        |  CAST(sum(CASE WHEN EXISTS (
        |    SELECT 1 FROM inc i
        |    WHERE i.user_id = e.user_id AND e.sec >= i.st AND e.sec < i.st + 600)
        |  THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
        |FROM ev e GROUP BY event_type ORDER BY event_type
        |""".stripMargin)),

    // Salted fact-to-fact join: enrich every event with its user's total
    // event count. The dimension here is itself user-keyed BIG data (an
    // aggregate of the fact table), so at 100 TB neither side broadcasts
    // and a hot user would pin one shuffle task. Salting bounds that:
    // the per-user rows replicate across 8 salt values and each fact row
    // picks one deterministically, so a hot key's rows spread over 8
    // tasks. Results are identical to the unsalted join (the oracle IS
    // the unsalted join). AQE's skew-split covers the probe side of a
    // sort-merge join automatically; explicit salting is the portable
    // form that also splits the build side and survives hash joins.
    CatalogQuery(
      "q64_salted_join",
      (s, d) => {
        import s.implicits._
        val saltN = 8L
        val ev = Tables.events(s, d)
          .select($"event_id", $"user_id", $"event_type")
        val userN = ev.groupBy($"user_id").agg(count(lit(1)).as("user_n"))
        val salted = userN.select($"user_id", $"user_n",
          explode(sequence(lit(0L), lit(saltN - 1L))).as("salt"))
        ev.withColumn("salt", pmod($"event_id", lit(saltN)))
          .join(salted, Seq("user_id", "salt"))
          .groupBy($"event_type")
          .agg(count(lit(1)).as("n_events"), sum($"user_n").as("sum_user_n"))
          .orderBy($"event_type")
      },
      Some("""
        |WITH un AS (SELECT user_id, count(*) AS user_n FROM events GROUP BY user_id)
        |SELECT event_type, count(*) AS n_events,
        |  CAST(sum(user_n) AS BIGINT) AS sum_user_n
        |FROM events JOIN un USING (user_id)
        |GROUP BY event_type ORDER BY event_type
        |""".stripMargin)),

    // Join-key skew diagnosis: per event_type, how concentrated the
    // user_id key is — max-key share vs the uniform mean, and whether a
    // shuffle join on it should be salted (the report that decides when
    // to reach for q64's salting, or to let AQE's skew-join handle it).
    // skew_ratio = max_user_rows / (n_rows / n_users): 1.0 = perfectly
    // uniform; the > 1.7 threshold splits this corpus. Two keyed
    // aggregates, the first collapsing (type, user) map-side — the
    // events stream crosses the wire once as pre-counted partials, and
    // the second exchange carries ≤ types × users rows.
    CatalogQuery(
      "q87_skew_report",
      (s, d) => {
        import s.implicits._
        Tables.events(s, d)
          .groupBy($"event_type", $"user_id").agg(count(lit(1)).as("n"))
          .groupBy($"event_type")
          .agg(sum($"n").cast("long").as("n_rows"),
            count(lit(1)).as("n_users"),
            max($"n").as("max_user_rows"))
          .withColumn("skew_ratio",
            ($"max_user_rows" * $"n_users").cast("double") / $"n_rows")
          .withColumn("salt_recommended", $"skew_ratio" > 1.7)
          .orderBy($"event_type")
      },
      Some("""
        |WITH c AS (
        |  SELECT event_type, user_id, count(*) AS n
        |  FROM events GROUP BY event_type, user_id)
        |SELECT event_type,
        |  CAST(sum(n) AS BIGINT) AS n_rows,
        |  count(*) AS n_users,
        |  max(n) AS max_user_rows,
        |  CAST(max(n) * count(*) AS DOUBLE) / sum(n) AS skew_ratio,
        |  CAST(max(n) * count(*) AS DOUBLE) / sum(n) > 1.7 AS salt_recommended
        |FROM c GROUP BY event_type ORDER BY event_type
        |""".stripMargin)),

    // CUBE over order status × priority with per-dimension GROUPING
    // flags — completes the grouping-sets family next to q37's ROLLUP
    // (both operator classes the reference lacks, SURVEY §2.8). The
    // grouping flags disambiguate rolled-up NULLs from data NULLs.
    CatalogQuery(
      "q65_cube",
      (s, d) => {
        import s.implicits._
        Tables.orders(s, d)
          .cube($"o_orderstatus", $"o_orderpriority")
          .agg(count(lit(1)).as("n_orders"), dsum($"o_totalprice").as("sum_price"),
            grouping($"o_orderstatus").cast("long").as("g_status"),
            grouping($"o_orderpriority").cast("long").as("g_prio"))
          .orderBy($"o_orderstatus".asc_nulls_first,
            $"o_orderpriority".asc_nulls_first)
      },
      Some(s"""
        |SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
        |  ${dsumSql("o_totalprice")} AS sum_price,
        |  CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
        |  CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_prio
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |-- no-op on any non-empty input (every group has >=1 row); on an
        |-- EMPTY table it drops the grand-total row DuckDB emits, which
        |-- Spark's cube does not produce — empty input => empty report
        |HAVING count(*) > 0
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
        |""".stripMargin))
  )
}
