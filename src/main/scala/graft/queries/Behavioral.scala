package graft.queries

import graft.{Num, QueryDef, Tables}
import graft.aggregates.{Retention, WindowFunnel}
import graft.operators.AsofJoin
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics over the `events` table: sessionization, funnel,
  * retention, sequence matching (the reference's behavioral aggregate
  * family, SURVEY §2.4), tumbling/session windows (our Structured-
  * Streaming-compatible capability extension, SURVEY §2.10), ASOF join,
  * and JSON property extraction
  * (/root/reference/src/Functions/FunctionsJSON.cpp).
  *
  * All timestamps are compared in exact integer microseconds
  * (`unix_micros` ≡ DuckDB `epoch_us`) so no float drift can enter.
  */
object Behavioral {
  import Num._

  private val GapUs = 1800L * 1000000 // 30 min session gap
  private val DayUs = 86400L * 1000000

  val defs: Seq[QueryDef] = Seq(
    // Sessionization: split each user's stream at >30 min silences
    // (reference sessionSplit, AggregateFunctionSessionSplit.cpp), then
    // per-user session stats. Window + cumulative-sum rewrite — one
    // shuffle on user_id, no collect.
    QueryDef(
      "sessionize_stats",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables(s, dir, "events")
          .withColumn("us", Tables.tsUs(col("ts")))
          .withColumn("new_s",
            when(col("us") - lag(col("us"), 1).over(w) > GapUs, 1)
              .when(lag(col("us"), 1).over(w).isNull, 1).otherwise(0))
          .withColumn("session_id", sum(col("new_s")).over(wRun))
          .groupBy(col("user_id"), col("session_id"))
          .agg(count(lit(1)).as("n_events"),
               (max(col("us")) - min(col("us"))).as("dur_us"))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_sessions"),
               sum(col("n_events")).as("n_events"),
               (sum(col("dur_us")).cast("double") / count(lit(1))).as("avg_session_dur_us"),
               max(col("n_events")).as("max_session_events"))
          .orderBy(col("user_id"))
      },
      Some("""
        WITH marked AS (
          SELECT user_id, EPOCH_US(ts) AS us,
            CASE WHEN EPOCH_US(ts) - LAG(EPOCH_US(ts)) OVER w > 1800000000 THEN 1
                 WHEN LAG(EPOCH_US(ts)) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        sessions AS (
          SELECT user_id, session_id, COUNT(*) AS n_events,
            MAX(us) - MIN(us) AS dur_us
          FROM (SELECT user_id, us,
                  SUM(new_s) OVER (PARTITION BY user_id ORDER BY us
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
                FROM marked) t
          GROUP BY user_id, session_id)
        SELECT user_id, COUNT(*) AS n_sessions,
          CAST(SUM(n_events) AS BIGINT) AS n_events,
          CAST(SUM(dur_us) AS DOUBLE) / COUNT(*) AS avg_session_dur_us,
          CAST(MAX(n_events) AS BIGINT) AS max_session_events
        FROM sessions
        GROUP BY user_id
        ORDER BY user_id""")),

    // windowFunnel: signup → click → purchase within 7 days (custom
    // Aggregator, reference getEventLevel semantics: depth >= k iff a
    // ts-non-decreasing chain of steps 1..k exists whose every event is
    // within the window of that chain's own step-1 anchor). Depth
    // histogram across users.
    QueryDef(
      "funnel_signup_click_purchase",
      (s, dir) => {
        val funnel = graft.aggregates.WindowFunnelAgg.funnel(7 * DayUs, 3) _
        Tables(s, dir, "events")
          .withColumn("step",
            when(col("event_type") === "signup", 1)
              .when(col("event_type") === "click", 2)
              .when(col("event_type") === "purchase", 3).otherwise(0))
          .filter(col("step") > 0)
          .groupBy(col("user_id"))
          .agg(funnel(Tables.tsUs(col("ts")), col("step")).as("depth"))
          .agg(count(when(col("depth") >= 1, 1)).as("reached_signup"),
               count(when(col("depth") >= 2, 1)).as("reached_click"),
               count(when(col("depth") >= 3, 1)).as("reached_purchase"))
      },
      // Oracle is the linear window form of the same chain semantics (the
      // triple self-join formulation took 75 s at sf0.1; this takes 80 ms):
      // run_s = latest signup at-or-before each event; a click matches if
      // its best anchor is within the window; run_sc = best anchor over
      // clicks at-or-before each event, so a purchase matches if some
      // s <= c <= p chain has p within the anchor's window (c <= p implies
      // c is inside the window too). RANGE frames include same-us peers,
      // matching the reference's ts-non-decreasing chains.
      Some("""
        WITH e AS (SELECT user_id, EPOCH_US(ts) AS us, event_type FROM events
                   WHERE event_type IN ('signup', 'click', 'purchase')),
        w1 AS (
          SELECT user_id, us, event_type,
            MAX(CASE WHEN event_type = 'signup' THEN us END) OVER
              (PARTITION BY user_id ORDER BY us
               RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_s
          FROM e),
        w2 AS (
          SELECT user_id, us, event_type, run_s,
            MAX(CASE WHEN event_type = 'click' THEN run_s END) OVER
              (PARTITION BY user_id ORDER BY us
               RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_sc
          FROM w1),
        f AS (
          SELECT user_id,
            MAX(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS d1,
            MAX(CASE WHEN event_type = 'click' AND run_s IS NOT NULL
                     AND us - run_s <= 604800000000 THEN 1 ELSE 0 END) AS d2,
            MAX(CASE WHEN event_type = 'purchase' AND run_sc IS NOT NULL
                     AND us - run_sc <= 604800000000 THEN 1 ELSE 0 END) AS d3
          FROM w2 GROUP BY user_id)
        SELECT CAST(SUM(d1) AS BIGINT) AS reached_signup,
               CAST(SUM(d2) AS BIGINT) AS reached_click,
               CAST(SUM(d3) AS BIGINT) AS reached_purchase
        FROM f""")),

    // retention: signed up; signed up & purchased; signed up & errored.
    QueryDef(
      "retention_cohort",
      (s, dir) => {
        val ret = Retention()
        Tables(s, dir, "events")
          .groupBy(col("user_id"))
          .agg(ret(col("event_type") === "signup",
                   col("event_type") === "purchase",
                   col("event_type") === "error").as("r"))
          .agg(sum(col("r").getItem(0)).as("n_signup"),
               sum(col("r").getItem(1)).as("n_signup_purchase"),
               sum(col("r").getItem(2)).as("n_signup_error"))
      },
      Some("""
        WITH per_user AS (
          SELECT user_id,
            MAX(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS s,
            MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS p,
            MAX(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS e
          FROM events GROUP BY user_id)
        SELECT CAST(SUM(s) AS BIGINT) AS n_signup,
          CAST(SUM(s * p) AS BIGINT) AS n_signup_purchase,
          CAST(SUM(s * e) AS BIGINT) AS n_signup_error
        FROM per_user""")),

    // sequenceMatch '(?1).*(?2)': signup followed by error within 1 day.
    QueryDef(
      "sequence_match_signup_error",
      (s, dir) => {
        val funnel = graft.aggregates.WindowFunnelAgg.funnel(DayUs, 2) _
        Tables(s, dir, "events")
          .withColumn("step",
            when(col("event_type") === "signup", 1)
              .when(col("event_type") === "error", 2).otherwise(0))
          .filter(col("step") > 0)
          .groupBy(col("user_id"))
          .agg(funnel(Tables.tsUs(col("ts")), col("step")).as("depth"))
          .agg(count(when(col("depth") === 2, 1)).as("n_matched_users"),
               count(lit(1)).as("n_users_considered"))
      },
      Some("""
        WITH u AS (SELECT user_id, EPOCH_US(ts) AS us, event_type FROM events),
        s AS (SELECT user_id, us FROM u WHERE event_type = 'signup'),
        e AS (SELECT user_id, us FROM u WHERE event_type = 'error'),
        t2 AS (SELECT DISTINCT s.user_id FROM s JOIN e ON e.user_id = s.user_id
               AND e.us >= s.us AND e.us <= s.us + 86400000000)
        SELECT (SELECT COUNT(*) FROM t2) AS n_matched_users,
          COUNT(DISTINCT user_id) AS n_users_considered
        FROM u WHERE event_type IN ('signup', 'error')""")),

    // Tumbling 6-hour windows (Structured-Streaming-shaped aggregation;
    // window() is epoch-aligned, ≡ integer-µs bucketing).
    QueryDef(
      "event_tumbling_counts",
      (s, dir) =>
        Tables(s, dir, "events")
          .groupBy(window(col("ts"), "6 hours").as("w"), col("event_type"))
          .agg(count(lit(1)).as("n_events"), dsum6(col("value")).as("sum_value"))
          .select(col("w.start").as("bucket"), col("event_type"),
                  col("n_events"), col("sum_value"))
          .orderBy(col("bucket"), col("event_type")),
      Some("""
        SELECT MAKE_TIMESTAMP((EPOCH_US(ts) // 21600000000) * 21600000000) AS bucket,
          event_type, COUNT(*) AS n_events,
          CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        FROM events
        GROUP BY 1, 2
        ORDER BY bucket, event_type""")),

    // Sliding windows: 6-hour windows sliding every 3 hours — each event
    // lands in 2 buckets (Expand in Spark; UNNEST of both starts in SQL).
    QueryDef(
      "event_sliding_counts",
      (s, dir) =>
        Tables(s, dir, "events")
          .groupBy(window(col("ts"), "6 hours", "3 hours").as("w"), col("event_type"))
          .agg(count(lit(1)).as("n_events"))
          .select(col("w.start").as("bucket"), col("event_type"), col("n_events"))
          .orderBy(col("bucket"), col("event_type")),
      Some("""
        WITH e AS (
          SELECT event_type,
            (EPOCH_US(ts) // 10800000000) * 10800000000 AS grid_us
          FROM events),
        expanded AS (
          SELECT event_type, UNNEST([grid_us - 10800000000, grid_us]) AS bucket_us
          FROM e)
        SELECT MAKE_TIMESTAMP(bucket_us) AS bucket, event_type,
          COUNT(*) AS n_events
        FROM expanded
        GROUP BY 1, 2
        ORDER BY bucket, event_type""")),

    // Session windows (session_window(), gap 30 min) — per-session rows.
    QueryDef(
      "event_session_windows",
      (s, dir) =>
        Tables(s, dir, "events")
          .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
          .agg(count(lit(1)).as("n_events"))
          .select(col("user_id"), Tables.tsUs(col("w.start")).as("session_start_us"),
                  col("n_events"))
          .orderBy(col("user_id"), col("session_start_us")),
      Some("""
        WITH marked AS (
          SELECT user_id, EPOCH_US(ts) AS us,
            CASE WHEN EPOCH_US(ts) - LAG(EPOCH_US(ts)) OVER w >= 1800000000 THEN 1
                 WHEN LAG(EPOCH_US(ts)) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        SELECT user_id, MIN(us) AS session_start_us, COUNT(*) AS n_events
        FROM (SELECT user_id, us,
                SUM(new_s) OVER (PARTITION BY user_id ORDER BY us
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
              FROM marked) t
        GROUP BY user_id, session_id
        ORDER BY user_id, session_start_us""")),

    // ASOF join: each purchase ← latest click at-or-before it, per user.
    QueryDef(
      "asof_purchase_click",
      (s, dir) => {
        // r15 (guide §2.4): both as-of sides are the SAME events table —
        // the tagged single-scan variant reads it once (2 parquet passes
        // → 1; the `event_type IN (click, purchase)` filter still pushes
        // down). Window semantics unchanged (AsofRewriteSpec equivalence).
        val ev = Tables(s, dir, "events")
          .filter(col("event_type").isin("click", "purchase"))
          .withColumn("us", Tables.tsUs(col("ts")))
        AsofJoin.backwardSameSource(ev,
            isLeft = col("event_type") === "purchase",
            isRight = col("event_type") === "click",
            key = "user_id", time = "us",
            leftCols = Seq("event_id"), rightCols = Seq("us"))
          .select(col("event_id"),
                  (col("us") - col("asof_us")).as("us_since_click"))
          .orderBy(col("event_id"))
      },
      Some("""
        SELECT p.event_id, EPOCH_US(p.ts) - EPOCH_US(c.ts) AS us_since_click
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON p.user_id = c.user_id AND p.ts >= c.ts
        ORDER BY p.event_id""")),

    // Attribution (reference AggregateFunctionAttribution family):
    // last-touch — each purchase credits the latest preceding click/view
    // within 3 days, else 'direct'. One window pass per user, no joins.
    QueryDef(
      "attribution_last_touch",
      (s, dir) => {
        val wPrev = Window.partitionBy(col("user_id"))
          .orderBy(col("us"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val touch = col("event_type").isin("click", "view")
        Tables(s, dir, "events")
          .withColumn("us", Tables.tsUs(col("ts")))
          .withColumn("attr_us", last(when(touch, col("us")), ignoreNulls = true).over(wPrev))
          .withColumn("attr_type", last(when(touch, col("event_type")), ignoreNulls = true).over(wPrev))
          .filter(col("event_type") === "purchase")
          .withColumn("channel",
            when(col("attr_us").isNotNull && col("us") - col("attr_us") <= 3 * DayUs,
              col("attr_type")).otherwise(lit("direct")))
          .groupBy(col("channel"))
          .agg(count(lit(1)).as("n_purchases"),
               (sum(when(col("channel") =!= "direct", col("us") - col("attr_us"))
                 .otherwise(lit(0L))).cast("double") /
                 nullif(count(when(col("channel") =!= "direct", 1)), lit(0L)))
                 .as("avg_gap_us"))
          .orderBy(col("channel"))
      },
      Some("""
        WITH t AS (
          SELECT user_id, event_id, event_type, EPOCH_US(ts) AS us,
            LAST_VALUE(CASE WHEN event_type IN ('click', 'view') THEN EPOCH_US(ts) END
              IGNORE NULLS) OVER w AS attr_us,
            LAST_VALUE(CASE WHEN event_type IN ('click', 'view') THEN event_type END
              IGNORE NULLS) OVER w AS attr_type
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        p AS (
          SELECT CASE WHEN attr_us IS NOT NULL AND us - attr_us <= 259200000000
                      THEN attr_type ELSE 'direct' END AS channel,
                 us, attr_us
          FROM t WHERE event_type = 'purchase')
        SELECT channel, COUNT(*) AS n_purchases,
          CAST(SUM(CASE WHEN channel <> 'direct' THEN us - attr_us ELSE 0 END) AS DOUBLE)
            / NULLIF(COUNT(CASE WHEN channel <> 'direct' THEN 1 END), 0) AS avg_gap_us
        FROM p
        GROUP BY channel
        ORDER BY channel""")),

    // Same ASOF semantics through the SQL front door: the asof_le marker
    // + AsofJoinRewrite rule (graft.plans) replace the Join with the
    // union+window plan during optimization — no hand-written pipeline.
    // Inner strictness: unmatched purchases drop.
    QueryDef(
      "asof_sql_rewrite",
      (s, dir) => {
        Tables(s, dir, "events").createOrReplaceTempView("events")
        s.sql("""
          SELECT p.event_id, p.us - c.us AS us_since_click
          FROM (SELECT event_id, user_id, unix_micros(ts) AS us FROM events
                WHERE event_type = 'purchase') p
          JOIN (SELECT user_id AS c_user, unix_micros(ts) AS us FROM events
                WHERE event_type = 'click') c
            ON p.user_id = c.c_user AND asof_le(c.us, p.us)
          ORDER BY p.event_id""")
      },
      Some("""
        SELECT p.event_id, EPOCH_US(p.ts) - EPOCH_US(c.ts) AS us_since_click
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON p.user_id = c.user_id AND p.ts >= c.ts
        ORDER BY p.event_id""")),

    // JSON property extraction from the props column.
    QueryDef(
      "json_extract_props",
      (s, dir) =>
        Tables(s, dir, "events")
          .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
          .groupBy((col("k") % 10).as("k_mod"))
          .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
          .orderBy(col("k_mod")),
      Some("""
        SELECT (CAST(props->>'$.k' AS BIGINT) % 10) AS k_mod, COUNT(*) AS n,
          CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k
        FROM events
        GROUP BY 1
        ORDER BY k_mod""")),

    // Partition top-N over the stream: 2 highest-value events per user.
    QueryDef(
      "top_events_per_user",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("value").desc, col("event_id"))
        Tables(s, dir, "events")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 2)
          .select(col("user_id"), col("rn"), col("event_id"), col("value"))
          .orderBy(col("user_id"), col("rn"))
      },
      Some("""
        SELECT user_id, rn, event_id, value FROM (
          SELECT user_id, event_id, value,
            ROW_NUMBER() OVER (PARTITION BY user_id
              ORDER BY value DESC, event_id) AS rn
          FROM events) t
        WHERE rn <= 2
        ORDER BY user_id, rn""")),

    // PIVOT: per-user event-type counts as columns.
    QueryDef(
      "pivot_event_counts",
      (s, dir) =>
        Tables(s, dir, "events")
          .groupBy(col("user_id"))
          .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
          .agg(count(lit(1)))
          .na.fill(0L, Seq("click", "error", "purchase", "signup", "view"))
          .orderBy(col("user_id")),
      Some("""
        SELECT user_id,
          COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
          COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error,
          COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
          COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
          COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view
        FROM events
        GROUP BY user_id
        ORDER BY user_id""")),

    // approx_count_distinct (HLL++, reference uniq/uniqHLL12 family,
    // AggregateFunctionUniq.h:69) — sketch internals differ from any
    // oracle, so the estimate column is golden-vector pinned below.
    QueryDef(
      "approx_distinct_users",
      (s, dir) =>
        Tables(s, dir, "events")
          .groupBy(col("event_type"))
          .agg(approx_count_distinct(col("user_id")).as("approx_users"),
               countDistinct(col("user_id")).as("exact_users"))
          .orderBy(col("event_type")),
      // HYBRID oracle: exact_users is genuinely recomputed by DuckDB;
      // only the deterministic HLL++ estimate column is pinned from the
      // sf0.01 run (sketch internals have no SQL counterpart; the
      // estimator's error bound is spec-gated). sf0.01 ONLY.
      Some("""
        SELECT e.event_type, CAST(v.approx_users AS BIGINT) AS approx_users,
          COUNT(DISTINCT e.user_id) AS exact_users
        FROM events e JOIN (VALUES
          ('click',151), ('error',151), ('purchase',151), ('signup',151), ('view',151)) AS v(event_type, approx_users) ON e.event_type = v.event_type
        GROUP BY e.event_type, v.approx_users
        ORDER BY e.event_type"""))
  )
}
