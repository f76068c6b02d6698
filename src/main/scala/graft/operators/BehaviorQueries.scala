package graft.operators

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-behavior analytics over the `events` stream: funnel conversion
  * and cohort retention — the product-analytics queries a pipeline runs
  * next to sessionization (q18) and interval joins (q63). Both are
  * single-exchange shapes: all per-user logic runs inside one user-keyed
  * partitioning, and only tiny per-user / per-cohort rows leave it.
  */
object BehaviorQueries {

  val all: Seq[CatalogQuery] = Seq(

    // Ordered-stage funnel: first view -> first click AFTER that view ->
    // first purchase AFTER that click, converting within 7 days of the
    // first view.
    //
    // Skew-immune spelling (r11; the original's three chained
    // per-user-partition windows serialized a 90%-hot user into one
    // task — measured 7x on the skew twin). Each stage is a per-user
    // MIN — a map-side-combinable groupBy, so a hot user's events
    // collapse inside every scan task and the exchanges carry one row
    // per user. The stage chaining (click >= first view, purchase >=
    // first click) becomes a join of the per-type event subset against
    // the previous stage's per-user frame: the frame is users-sized
    // (broadcast while it fits; beyond that, a shuffled join whose
    // probe-side hot key AQE skew-splits — unlike a window partition,
    // which can never split). Final summary is a one-row aggregate of
    // the per-user frame.
    CatalogQuery(
      "q72_funnel",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d).select($"user_id", $"event_type", $"ts")
        val users = ev.groupBy($"user_id").agg(
          min(when($"event_type" === "view", $"ts")).as("fv"))
        val fc = ev.filter($"event_type" === "click")
          .join(users.filter($"fv".isNotNull).select($"user_id", $"fv".as("jfv")),
            Seq("user_id"))
          .filter($"ts" >= $"jfv")
          .groupBy($"user_id").agg(min($"ts").as("fc"))
        // shuffle_hash: the default SMJ SORTS the event-side probe — a
        // hot user's partition pays O(n log n) in one task below AQE's
        // skew-split threshold; a hash probe streams it linearly (and
        // above the threshold AQE splits either join the same way)
        val fp = ev.filter($"event_type" === "purchase")
          .join(fc.select($"user_id", $"fc".as("jfc")).hint("shuffle_hash"),
            Seq("user_id"))
          .filter($"ts" >= $"jfc")
          .groupBy($"user_id").agg(min($"ts").as("fp"))
        val horizon = $"fv" + expr("INTERVAL 7 DAYS")
        users
          .join(fc, Seq("user_id"), "left")
          .join(fp, Seq("user_id"), "left")
          .agg(
            count(lit(1)).as("n_users"),
            count($"fv").as("n_viewed"),
            count(when($"fc" <= horizon, 1)).as("n_clicked"),
            count(when($"fp" <= horizon, 1)).as("n_purchased"))
          .select($"n_users", $"n_viewed", $"n_clicked", $"n_purchased",
            // NULL rate when nobody viewed (DuckDB's x/0 is NULL; Spark's
            // ANSI division would throw on the empty-corpus twin)
            when($"n_viewed" === 0, lit(null).cast("double"))
              .otherwise($"n_clicked".cast("double") / $"n_viewed")
              .as("click_rate"),
            when($"n_viewed" === 0, lit(null).cast("double"))
              .otherwise($"n_purchased".cast("double") / $"n_viewed")
              .as("purchase_rate"))
      },
      Some("""
        |WITH s1 AS (
        |  SELECT user_id, event_type, ts,
        |    min(CASE WHEN event_type = 'view' THEN ts END)
        |      OVER (PARTITION BY user_id) AS fv
        |  FROM events),
        |s2 AS (
        |  SELECT *, min(CASE WHEN event_type = 'click' AND ts >= fv THEN ts END)
        |      OVER (PARTITION BY user_id) AS fc
        |  FROM s1),
        |s3 AS (
        |  SELECT *, min(CASE WHEN event_type = 'purchase' AND ts >= fc THEN ts END)
        |      OVER (PARTITION BY user_id) AS fp
        |  FROM s2),
        |u AS (SELECT user_id, max(fv) AS fv, max(fc) AS fc, max(fp) AS fp
        |      FROM s3 GROUP BY user_id),
        |f AS (
        |  SELECT count(*) AS n_users,
        |    count(fv) AS n_viewed,
        |    count(CASE WHEN fc <= fv + INTERVAL 7 DAY THEN 1 END) AS n_clicked,
        |    count(CASE WHEN fp <= fv + INTERVAL 7 DAY THEN 1 END) AS n_purchased
        |  FROM u)
        |SELECT n_users, n_viewed, n_clicked, n_purchased,
        |  CAST(n_clicked AS DOUBLE) / n_viewed AS click_rate,
        |  CAST(n_purchased AS DOUBLE) / n_viewed AS purchase_rate
        |FROM f
        |""".stripMargin)),

    // Weekly cohort retention triangle: users grouped by the week of
    // their first event, counted active per week offset. Week bounds are
    // date_trunc('week') in both engines (ISO Monday), so the day
    // difference between two week starts is an exact multiple of 7 and
    // the offset division is exact. date_trunc is monotonic, so the
    // cohort week (trunc of the user's min ts) equals the min of the
    // user's active weeks — events collapse row-locally to (user, week)
    // BEFORE any wide operator: the map-side partial of ONE user-keyed
    // hash aggregate (min week + collect_set of active weeks) is the
    // only pass that sees event-scale data, and nothing is ever sorted
    // at event scale. The exchange carries at most users x active-weeks
    // rows; offsets explode from the tiny per-user set; the final
    // (cohort, offset) aggregate is constant-size. (A first cut windowed
    // min(ts) over user and distinct-ed after — that sorted the full
    // event frame per partition and was 7x the oracle at 10M events;
    // this shape is the one that survives 100 TB.)
    CatalogQuery(
      "q73_retention",
      (s, d) => {
        import s.implicits._
        Tables.events(s, d)
          .select($"user_id",
            date_trunc("week", $"ts").cast("date").as("wk"))
          .groupBy($"user_id")
          .agg(min($"wk").as("cohort_week"), collect_set($"wk").as("wks"))
          .select($"cohort_week", explode($"wks").as("wk"))
          .select($"cohort_week",
            (datediff($"wk", $"cohort_week") / 7).cast("long").as("week_offset"))
          .groupBy($"cohort_week", $"week_offset")
          .agg(count(lit(1)).as("n_active"))
          .orderBy($"cohort_week", $"week_offset")
      },
      Some("""
        |WITH f AS (
        |  -- NULL-ts events carry no week: excluded here exactly as the
        |  -- engine's collect_set/min drop NULL weeks (a user with only
        |  -- NULL-ts events has no cohort in either engine)
        |  SELECT user_id, ts, min(ts) OVER (PARTITION BY user_id) AS first_ts
        |  FROM events WHERE ts IS NOT NULL),
        |w AS (
        |  SELECT DISTINCT user_id,
        |    CAST(date_trunc('week', first_ts) AS DATE) AS cohort_week,
        |    CAST(date_diff('day', CAST(date_trunc('week', first_ts) AS DATE),
        |                   CAST(date_trunc('week', ts) AS DATE)) / 7 AS BIGINT)
        |      AS week_offset
        |  FROM f)
        |SELECT cohort_week, week_offset, count(*) AS n_active
        |FROM w GROUP BY cohort_week, week_offset
        |ORDER BY cohort_week, week_offset
        |""".stripMargin)),

    // Event-disorder / watermark-planning audit: before configuring a
    // Structured Streaming watermark, measure HOW out-of-order the
    // stream actually is — per event type: how many events arrive after
    // a later-timestamped event of the same user (disordered), how many
    // arrive more than the candidate watermark delay behind the user's
    // high-water mark (these a watermark of D would DROP), and the worst
    // observed lateness. The fixture's events carry no arrival column
    // (they are perfectly ordered by event_id), so arrival order is
    // SYNTHESIZED by a deterministic hash jitter of the event id — the
    // q105/q109 derivation convention, mirrored exactly in the oracle;
    // the OPERATOR is everything downstream of the arrival column.
    //
    // Scale shape (r11 skew-immune respell; the single per-user running-
    // max window serialized a 90%-hot user into one task — measured
    // 3.5x on the skew twin): the running high-water mark is split in
    // two levels on ARRIVAL-ORDER buckets. Level 1: a running max
    // WITHIN each (user, arr-bucket) window — a bucket spans a fixed
    // arrival-id width, so its partition holds at most that many events
    // regardless of how hot the user is. Level 2: each bucket's max sec,
    // a map-side-combinable aggregate, with the running max over EARLIER
    // buckets computed on the per-(user, bucket) frame (data/4096 rows).
    // high-water(row) = greatest(within-bucket running, earlier-bucket
    // max); the report stays a map-side-combinable per-type aggregate.
    // Timestamps compare in whole seconds (the epoch()-floor convention
    // of q18/q72).
    CatalogQuery(
      "q114_disorder_audit",
      (s, d) => {
        import s.implicits._
        import graft.functions.Portable.hash60
        val D = 60L // candidate watermark: 1 minute
        val B = 4096L // arrival-bucket width (events per bucket bound)
        val ev = Tables.events(s, d)
          .select($"user_id", $"event_id", $"event_type",
            $"ts".cast("long").as("sec"),
            ($"event_id" +
              (hash60(concat(lit("arr:"), $"event_id".cast("string"))) % 7)
              - 3).as("arr"))
          .withColumn("abkt", floor($"arr" / B))
        val wIn = Window.partitionBy($"user_id", $"abkt")
          .orderBy($"arr", $"event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val withIn = ev.withColumn("hw_in", max($"sec").over(wIn))
        val buckets = ev.groupBy($"user_id", $"abkt")
          .agg(max($"sec").as("bmax"))
        val wB = Window.partitionBy($"user_id").orderBy($"abkt")
          .rowsBetween(Window.unboundedPreceding, -1)
        val prevB = buckets.withColumn("hw_prev", max($"bmax").over(wB))
          .select($"user_id".as("pu"), $"abkt".as("pb"), $"hw_prev")
        withIn
          // null-safe keys (q38's convention): correctness must not hang
          // on the fixture's NOT-NULL key columns — a null user_id/arr
          // would silently drop rows from the audit under a plain `===`
          .join(prevB, withIn("user_id") <=> $"pu" && withIn("abkt") <=> $"pb")
          .withColumn("late_s", greatest($"hw_in", $"hw_prev") - $"sec")
          .groupBy($"event_type")
          .agg(count(lit(1)).as("n_events"),
            sum(when($"late_s" > 0, 1L).otherwise(0L)).cast("long")
              .as("n_disordered"),
            sum(when($"late_s" > D, 1L).otherwise(0L)).cast("long")
              .as("n_dropped_at_watermark"),
            max($"late_s").as("max_late_s"))
          .orderBy($"event_type")
      },
      Some(s"""
        |WITH e AS (
        |  SELECT user_id, event_id, event_type,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS sec,
        |    event_id +
        |      (${graft.functions.Portable.hash60Sql(
               "'arr:' || CAST(event_id AS VARCHAR)")} % 7) - 3 AS arr
        |  FROM events),
        |h AS (
        |  SELECT event_type,
        |    max(sec) OVER (PARTITION BY user_id ORDER BY arr, event_id
        |      ROWS UNBOUNDED PRECEDING) - sec AS late_s
        |  FROM e)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CASE WHEN late_s > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_disordered,
        |  CAST(sum(CASE WHEN late_s > 60 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_dropped_at_watermark,
        |  CAST(max(late_s) AS BIGINT) AS max_late_s
        |FROM h GROUP BY event_type ORDER BY event_type
        |""".stripMargin)))
}
